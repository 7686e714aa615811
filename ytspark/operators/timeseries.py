"""Time-series operators: exponential smoothing and robust anomaly
detection over the event stream.

A 100 TB event log is consumed as per-key ordered series (a user's
activity, a metric's daily roll-up), and two operations dominate
monitoring pipelines over it: smoothing (EWMA — the state behind every
alerting baseline) and robust outlier flagging (median/MAD — immune to
the heavy tails that break z-scores). Both are expressed Spark-first:

- EWMA is an ordered fold. Spark has no running-product window
  aggregate, so the per-key series is folded with the ``aggregate``
  higher-order function over a ``sort_array(collect_list(...))`` —
  entirely JVM-side (whole-stage codegen, no Python), one shuffle on
  the key. Per-key series are bounded (a user's events, a day count),
  so the collected array is small by construction; the 100 TB scale
  axis is the KEY count, which this partitions on. The DuckDB oracle
  replays the identical fold as a recursive CTE, certifying the
  smoothed values cross-engine.

- MAD needs two dependent medians (median of deviations from the
  median), i.e. two aggregation passes with a broadcast-joined scalar
  between them — the canonical "aggregate, rejoin, re-aggregate"
  shape whose shuffles are all on the (low-cardinality) group key.
  DuckDB's native ``MEDIAN``/``MAD`` aggregates certify Spark's
  two-pass construction against a different implementation.

Reference parity: the reference pipeline has no time-series layer
(its marts stop at per-video counters —
/root/reference/dags/dbt/dbt_ytanalytics/models/marts/YT_Facts_stg.sql);
these operators are part of the beyond-reference analytics surface the
engine adds for monitoring corpus-scale ingest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ytspark.queries import register
from ytspark.session import load_tables

EWMA_ALPHA = 0.3  # smoothing weight for the newest observation
MAD_K = 1.4826  # normal-consistency constant for MAD -> sigma
MAD_Z = 3.5  # robust z threshold (Iglewicz-Hoaglin recommendation)


_EWMA_ORACLE = f"""
WITH seq AS (
  SELECT user_id, value,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY user_id) AS n
  FROM events WHERE value IS NOT NULL
),
folded AS (
  WITH RECURSIVE r AS (
    SELECT user_id, rn, n, value AS ewma FROM seq WHERE rn = 1
    UNION ALL
    SELECT s.user_id, s.rn, s.n,
           {EWMA_ALPHA} * s.value + (1 - {EWMA_ALPHA}) * r.ewma
    FROM r JOIN seq s ON s.user_id = r.user_id AND s.rn = r.rn + 1
  )
  SELECT * FROM r
)
SELECT user_id,
       CAST(n AS BIGINT) AS n_obs,
       ROUND(ewma, 6) AS ewma_last
FROM folded WHERE rn = n
"""


@register(
    "events_value_ewma",
    oracle=_EWMA_ORACLE,
    doc=f"Per-user exponentially weighted moving average (alpha="
        f"{EWMA_ALPHA}, seeded with the first observation) over each "
        "user's ts-ordered value series — the smoothing state every "
        "alerting baseline carries. The ordered fold runs as the "
        "``aggregate`` higher-order function over a sorted "
        "collect_list: pure JVM expressions, ONE shuffle on user_id, "
        "array size bounded by per-user activity (the scale axis is "
        "user count, which partitions). The oracle replays the "
        "identical fold as a DuckDB recursive CTE, so the smoothed "
        "values are value-certified cross-engine (same fold order -> "
        "same float ops; 6 dp rounding absorbs ulp drift).",
    tags=("time", "window", "aggregate", "hof"),
)
def events_value_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        load_tables(spark, sf_dir, "events")["events"]
        .where(F.col("value").isNotNull())
        .select("user_id", "ts", "event_id", "value")
    )
    # (ts, event_id) is a total order per user; sort_array on the
    # struct gives the fold its deterministic sequence
    series = ev.groupBy("user_id").agg(
        F.sort_array(
            F.collect_list(F.struct("ts", "event_id", "value"))
        ).alias("seq")
    )
    a = F.lit(float(EWMA_ALPHA))
    vals = F.col("seq.value")
    ewma = F.aggregate(
        F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))),
        F.element_at(vals, 1),
        lambda acc, v: a * v + (F.lit(1.0) - a) * acc,
    )
    return series.select(
        "user_id",
        F.size("seq").cast("long").alias("n_obs"),
        F.round(ewma, 6).alias("ewma_last"),
    )


_MAD_ORACLE = f"""
WITH scored AS (
  SELECT event_type, value,
         MEDIAN(value) OVER (PARTITION BY event_type) AS med,
         MAD(value) OVER (PARTITION BY event_type) AS mad
  FROM events WHERE value IS NOT NULL
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(MIN(med), 6) AS med,
       ROUND(MIN(mad), 6) AS mad,
       CAST(SUM(CASE WHEN ABS(value - med) > {MAD_Z} * {MAD_K} * mad
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       ROUND(MAX(CASE WHEN ABS(value - med) > {MAD_Z} * {MAD_K} * mad
                      THEN ABS(value - med) / ({MAD_K} * mad)
                 END), 6) AS worst_robust_z
FROM scored
GROUP BY event_type
"""


@register(
    "value_outlier_mad_battery",
    oracle=_MAD_ORACLE,
    doc="Robust anomaly profile per event type: median, MAD, the "
        f"count of |robust z| > {MAD_Z} outliers (z = |x - med| / "
        f"({MAD_K} * MAD), the Iglewicz-Hoaglin modified z-score), "
        "and the worst score — the outlier screen heavy-tailed "
        "metrics need where mean/stddev z-scores break. Spark builds "
        "MAD as the canonical two-pass aggregate-rejoin-reaggregate "
        "(median per group, broadcast back, median of absolute "
        "deviations), all shuffles on the 5-value group key; DuckDB "
        "certifies with its NATIVE median/mad aggregates — two "
        "different constructions, one hash. Exact interpolating "
        "medians on both sides; 6 dp rounding absorbs ulp drift.",
    tags=("time", "statistics", "aggregate", "quality"),
)
def value_outlier_mad_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        load_tables(spark, sf_dir, "events")["events"]
        .where(F.col("value").isNotNull())
        .select("event_type", "value")
    )
    med = ev.groupBy("event_type").agg(F.median("value").alias("med"))
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(F.median("adev").alias("mad"))
    scored = dev.join(F.broadcast(mad), "event_type")
    thresh = F.lit(MAD_Z) * F.lit(MAD_K) * F.col("mad")
    robust_z = F.col("adev") / (F.lit(MAD_K) * F.col("mad"))
    return scored.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("med"), 6).alias("med"),
        F.round(F.min("mad"), 6).alias("mad"),
        F.sum(
            F.when(F.col("adev") > thresh, F.lit(1)).otherwise(F.lit(0))
        ).alias("n_outliers"),
        F.round(
            F.max(F.when(F.col("adev") > thresh, robust_z)), 6
        ).alias("worst_robust_z"),
    )
