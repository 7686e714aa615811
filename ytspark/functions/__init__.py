"""Scalar/aggregate expression helpers shared by the query library."""

from ytspark.functions.core import avg_money, money, sum_money

__all__ = ["money", "sum_money", "avg_money"]
