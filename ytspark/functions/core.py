"""Cross-engine-deterministic expression helpers.

Floating-point SUMs are order-dependent: Spark's partial aggregation and
DuckDB's parallel aggregation can each produce different last-bit
results run to run, which breaks value-hash comparison between engines
(and between runs). Monetary aggregates therefore go through
``DECIMAL``: per-row cast (deterministic, and never on a representable
rounding midpoint for real-world doubles), exact order-independent
decimal SUM, then one cast back to double. The same pattern is used in
the oracle SQL, so both engines produce bit-identical doubles.

This is not just a test trick — at cluster scale exact decimal
aggregation is also the correct semantics for money (no drift across
partition counts, rerenders identically under AQE re-partitioning).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MONEY = "decimal(18,2)"


def money(col: Column | str) -> Column:
    """Row-level monetary value as DECIMAL(18,2)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(MONEY)


def sum_money(col: Column | str, alias: str) -> Column:
    """Exact decimal SUM surfaced as double (order-independent bits)."""
    return F.sum(money(col)).cast("double").alias(alias)


def avg_money(col: Column | str, alias: str) -> Column:
    """Deterministic average: exact decimal sum → double ÷ count."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(money(c)).cast("double") / F.count(c)).alias(alias)
