"""Reporting layer over the snapshot mart (SURVEY §2.10).

The reference has no queries of its own — the mart exists to feed
Power BI / Snowflake Cortex (architecture diagram only). These are the
natural analytics over a (channel, timestamp) snapshot fact table, all
built-ins so Catalyst/Tungsten own the physical plan:

- latest snapshot per entity   (window row_number, or max-ts semi-join)
- growth deltas per entity     (window lag)
- rankings / top-k             (orderBy + limit; window rank per group)
- period rollups               (date_trunc groupBy)

They are generic over any "entity + timestamp + counters" table, so the
driver testdata ``events`` table exercises them (FIXTURES.md §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_snapshot(
    df: DataFrame, entity: str, ts: str = "timestamp", tiebreak: tuple[str, ...] = ()
) -> DataFrame:
    """Most recent row per entity.

    Window row_number (one shuffle on entity) — scales to any entity
    cardinality. Pass ``tiebreak`` (a unique column) whenever ``ts``
    can repeat within an entity: without it the winner under AQE
    re-partitioning is arbitrary.
    """
    order = [F.col(ts).desc()] + [F.col(c).desc() for c in tiebreak]
    w = Window.partitionBy(entity).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def growth(
    df: DataFrame,
    entity: str,
    metric: str,
    ts: str = "timestamp",
    tiebreak: tuple[str, ...] = (),
) -> DataFrame:
    """Per-snapshot delta of ``metric`` vs the previous snapshot of the
    same entity — "views gained per tick". Window lag; one shuffle."""
    w = Window.partitionBy(entity).orderBy(F.col(ts), *[F.col(c) for c in tiebreak])
    return df.withColumn(
        f"{metric}_delta", F.col(metric) - F.lag(metric).over(w)
    )


def top_k(df: DataFrame, metric: str, k: int) -> DataFrame:
    """Global top-k by metric. orderBy+limit = TakeOrderedAndProject:
    per-partition heaps + single-reduce merge, no full sort shuffle."""
    return df.orderBy(F.col(metric).desc()).limit(k)


def top_k_per_group(
    df: DataFrame, group: str, metric: str, k: int, tiebreak: tuple[str, ...] = ()
) -> DataFrame:
    """Top-k within each group via rank window; ``tiebreak`` makes the
    cut deterministic when metric values repeat."""
    w = Window.partitionBy(group).orderBy(
        F.col(metric).desc(), *[F.col(c) for c in tiebreak]
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= k)
        .drop("__rk")
    )


def period_rollup(
    df: DataFrame,
    period: str,
    aggs: dict[str, str],
    ts: str = "timestamp",
    keys: list[str] | None = None,
) -> DataFrame:
    """Tumbling calendar-period aggregate: date_trunc + groupBy.

    ``aggs`` maps column → agg fn name ("sum"/"avg"/"max"/...). Partial
    (map-side) aggregation is automatic for all these."""
    exprs = [getattr(F, fn)(c).alias(f"{fn}_{c}") for c, fn in aggs.items()]
    gcols = [F.date_trunc(period, F.col(ts)).alias("period"), *(keys or [])]
    return df.groupBy(*gcols).agg(*exprs)
