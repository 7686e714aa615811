"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship query; ``queries``/``oracle_sql`` expose the
full registered query surface of the ytspark engine (see
``ytspark.queries.registry``): the reference-pipeline operators
(cast+union mart, append, snapshot analytics), the relational battery
(joins/aggregates/windows/set-ops/rollup/pivot), the LLM-data-pipeline
operators (dedup, similarity, text analysis), and a real Structured
Streaming query.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Top revenue customers — exercises the scan→broadcast-join→aggregate→
    top-k spine of the engine.
    """
    from ytspark.queries import registry

    return registry()["top_revenue_customers"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ the
    large-scale pipeline operators). Each callable takes (spark, sf_dir)
    and returns a DataFrame with columns aliased to match the oracle."""
    from ytspark.queries import registry

    return {name: q.fn for name, q in registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query. Since r12 EVERY registered
    query has one (the last hash-seeded MinHash/SimHash holdouts were
    re-keyed on the DuckDB-exact portable_hash64), so the driver
    hash-certifies the full registry — no rows-only entries remain."""
    from ytspark.queries import registry

    return {name: q.oracle for name, q in registry().items() if q.oracle is not None}
