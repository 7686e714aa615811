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
from pyspark.sql.window import Window

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


HOLT_ALPHA = 0.5  # level smoothing
HOLT_BETA = 0.3  # trend smoothing
HOLT_H = 3  # forecast horizon (steps ahead)


_HOLT_ORACLE = f"""
WITH seq AS (
  SELECT user_id, value,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY user_id) AS n
  FROM events WHERE value IS NOT NULL
),
eligible AS (SELECT * FROM seq WHERE n >= 2),
folded AS (
  WITH RECURSIVE r AS (
    SELECT a.user_id, a.n, 2 AS rn,
           a.value AS l, b.value - a.value AS b
    FROM eligible a JOIN eligible b
      ON b.user_id = a.user_id AND a.rn = 1 AND b.rn = 2
    UNION ALL
    SELECT r.user_id, r.n, r.rn + 1,
           {HOLT_ALPHA} * s.value + (1 - {HOLT_ALPHA}) * (r.l + r.b),
           {HOLT_BETA} * (({HOLT_ALPHA} * s.value
                           + (1 - {HOLT_ALPHA}) * (r.l + r.b)) - r.l)
             + (1 - {HOLT_BETA}) * r.b
    FROM r JOIN eligible s
      ON s.user_id = r.user_id AND s.rn = r.rn + 1
  )
  SELECT * FROM r
)
SELECT user_id,
       CAST(n AS BIGINT) AS n_obs,
       ROUND(l, 6) AS level_last,
       ROUND(b, 6) AS trend_last,
       ROUND(l + {HOLT_H} * b, 6) AS forecast_h3
FROM folded WHERE rn = n
"""


@register(
    "events_value_holt",
    oracle=_HOLT_ORACLE,
    doc=f"Holt double-exponential (level+trend) smoothing per user "
        f"(alpha={HOLT_ALPHA}, beta={HOLT_BETA}; classic init l1=v1, "
        "b1=v2-v1), with the h-step linear forecast l + h*b — the "
        "trending twin of events_value_ewma, and a showcase of the "
        "STRUCT-STATE ordered fold: the aggregate higher-order "
        "function carries a (level, trend) struct accumulator "
        "through the sorted per-user series, entirely JVM-side, one "
        "shuffle on user_id. The level expression is deliberately "
        "duplicated inside the trend update (expression languages "
        "have no let-binding) — the SQL oracle's recursive CTE "
        "duplicates it identically, so every float op matches and "
        "the smoothed states are value-certified cross-engine. "
        "Users with a single observation are excluded (the trend "
        "needs two seeds) in both engines.",
    tags=("time", "window", "aggregate", "hof", "forecast"),
)
def events_value_holt(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        load_tables(spark, sf_dir, "events")["events"]
        .where(F.col("value").isNotNull())
        .select("user_id", "ts", "event_id", "value")
    )
    series = (
        ev.groupBy("user_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("ts", "event_id", "value"))
            ).alias("seq")
        )
        .where(F.size("seq") >= 2)
    )
    a = F.lit(float(HOLT_ALPHA))
    bta = F.lit(float(HOLT_BETA))
    vals = F.col("seq.value")
    v1 = F.element_at(vals, 1)
    v2 = F.element_at(vals, 2)
    init = F.struct(v1.alias("l"), (v2 - v1).alias("b"))

    def step(acc, v):
        new_l = a * v + (F.lit(1.0) - a) * (acc["l"] + acc["b"])
        # the level expression repeats inside the trend update: no
        # let-binding in the expression language; the oracle repeats
        # it identically so the float sequence matches bit-for-bit
        new_b = (
            bta * ((a * v + (F.lit(1.0) - a) * (acc["l"] + acc["b"])) - acc["l"])
            + (F.lit(1.0) - bta) * acc["b"]
        )
        return F.struct(new_l.alias("l"), new_b.alias("b"))

    state = F.aggregate(
        F.slice(vals, 3, F.greatest(F.size(vals) - 2, F.lit(0))),
        init,
        step,
    )
    return series.select(
        "user_id",
        F.size("seq").cast("long").alias("n_obs"),
        F.round(state["l"], 6).alias("level_last"),
        F.round(state["b"], 6).alias("trend_last"),
        F.round(state["l"] + F.lit(float(HOLT_H)) * state["b"], 6).alias(
            "forecast_h3"
        ),
    )


WINSOR_LO = 0.05  # lower clamp quantile
WINSOR_HI = 0.95  # upper clamp quantile


_WINSOR_ORACLE = f"""
WITH bounds AS (
  SELECT event_type,
         QUANTILE_CONT(value, {WINSOR_LO}) AS lo,
         QUANTILE_CONT(value, {WINSOR_HI}) AS hi
  FROM events WHERE value IS NOT NULL
  GROUP BY event_type
)
SELECT e.event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(MIN(b.lo), 6) AS p_lo,
       ROUND(MIN(b.hi), 6) AS p_hi,
       CAST(SUM(CASE WHEN e.value < b.lo THEN 1 ELSE 0 END) AS BIGINT)
         AS n_clamped_lo,
       CAST(SUM(CASE WHEN e.value > b.hi THEN 1 ELSE 0 END) AS BIGINT)
         AS n_clamped_hi,
       ROUND(AVG(e.value), 6) AS mean_before,
       ROUND(AVG(GREATEST(b.lo, LEAST(b.hi, e.value))), 6) AS mean_after
FROM events e JOIN bounds b USING (event_type)
WHERE e.value IS NOT NULL
GROUP BY e.event_type
"""


@register(
    "value_winsorize_stats",
    oracle=_WINSOR_ORACLE,
    doc=f"Winsorization audit per event type: exact p{int(WINSOR_LO * 100):02d}/"
        f"p{int(WINSOR_HI * 100)} bounds (linear-interpolation "
        "percentiles — Spark's percentile == DuckDB's QUANTILE_CONT), "
        "clamp counts on each side, and the mean before/after "
        "clamping — the outlier-capping transform feature pipelines "
        "apply before normalization, certified as its accounting "
        "summary. The aggregate-rejoin-reaggregate shape: one "
        "percentile pass per group, broadcast the 5-row bounds back, "
        "one clamped re-aggregate. At extreme group cardinality the "
        "sketch fallback is approx_percentile with the GK rank-bound "
        "certificate (approx_quantile_rank_bounds).",
    tags=("statistics", "quality", "aggregate", "time"),
)
def value_winsorize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        load_tables(spark, sf_dir, "events")["events"]
        .where(F.col("value").isNotNull())
        .select("event_type", "value")
    )
    bounds = ev.groupBy("event_type").agg(
        F.percentile("value", WINSOR_LO).alias("lo"),
        F.percentile("value", WINSOR_HI).alias("hi"),
    )
    j = ev.join(F.broadcast(bounds), "event_type")
    clamped = F.greatest(F.col("lo"), F.least(F.col("hi"), F.col("value")))
    return j.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("lo"), 6).alias("p_lo"),
        F.round(F.min("hi"), 6).alias("p_hi"),
        F.sum(F.when(F.col("value") < F.col("lo"), 1).otherwise(0)).alias(
            "n_clamped_lo"
        ),
        F.sum(F.when(F.col("value") > F.col("hi"), 1).otherwise(0)).alias(
            "n_clamped_hi"
        ),
        F.round(F.avg("value"), 6).alias("mean_before"),
        F.round(F.avg(clamped), 6).alias("mean_after"),
    )


# ---------------------------------------------------------------------------
# CUSUM changepoint detection + autocorrelation — integer-exact series
# ---------------------------------------------------------------------------

# Both operators run on the calendar-densified daily EVENT COUNT
# series per event type (zero-filled missing days), which keeps every
# aggregate INTEGER-EXACT: the CUSUM statistic is computed scaled by
# n (S'_t = n*C_t - t*T, same argmax as S_t = C_t - t*mean) and the
# ACF numerator/denominator as sums of products of the n-scaled
# deviations d_t = n*c_t - T — no float accumulates anywhere, so the
# argmax/ratios are bit-identical across engines, partitionings and
# retries; floats appear only in the final reported ratios.

_CUSUM_SPINE_SQL = """
b AS (
  SELECT MIN(CAST(ts AS DATE)) AS d0, MAX(CAST(ts AS DATE)) AS d1
  FROM events
),
spine AS (
  SELECT CAST(UNNEST(generate_series(b.d0, b.d1, INTERVAL 1 DAY))
              AS DATE) AS day
  FROM b
),
grid AS (
  SELECT t.event_type, s.day
  FROM (SELECT DISTINCT event_type FROM events) t CROSS JOIN spine s
),
cnt AS (
  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS c
  FROM events GROUP BY 1, 2
),
daily AS (
  SELECT g.event_type, g.day, COALESCE(cnt.c, 0) AS c,
         DATE_DIFF('day', b.d0, g.day) + 1 AS t
  FROM grid g
  LEFT JOIN cnt ON g.event_type = cnt.event_type AND g.day = cnt.day
  CROSS JOIN b
),
tot AS (
  SELECT event_type, COUNT(*) AS n, SUM(c) AS tc
  FROM daily GROUP BY event_type
)"""

_CUSUM_ORACLE = f"""
WITH {_CUSUM_SPINE_SQL},
s AS (
  SELECT d.event_type, d.day, d.t, tot.n, tot.tc,
         tot.n * SUM(d.c) OVER (PARTITION BY d.event_type
                                ORDER BY d.day) - d.t * tot.tc AS sp,
         SUM(d.c) OVER (PARTITION BY d.event_type ORDER BY d.day)
           AS ct
  FROM daily d JOIN tot ON d.event_type = tot.event_type
),
r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                               ORDER BY ABS(sp) DESC, day) AS rk
  FROM s
)
SELECT event_type,
       CAST(n AS BIGINT) AS n_days,
       day AS cp_day,
       ROUND(CAST(ABS(sp) AS DOUBLE) / n, 6) AS cusum_peak,
       ROUND(CAST(ct AS DOUBLE) / t, 6) AS mean_before,
       CASE WHEN t = n THEN NULL
            ELSE ROUND(CAST(tc - ct AS DOUBLE) / (n - t), 6)
       END AS mean_after
FROM r WHERE rk = 1
"""


@register(
    "cusum_changepoint_daily",
    oracle=_CUSUM_ORACLE,
    doc="CUSUM changepoint detection on the daily event-count series "
        "per event type (calendar-densified, so quiet days count as "
        "zero): the change day is argmax_t |S_t|, S_t = sum_(i<=t) "
        "(c_i - mean) — reported with the peak CUSUM value and the "
        "mean level on each side of the detected change. The whole "
        "statistic is INTEGER arithmetic: S_t is computed scaled by "
        "n (S'_t = n*C_t - t*T has the same argmax), so the argmax "
        "and its (|S'| desc, day asc) tiebreak are exact on both "
        "engines — no float accumulation anywhere, the property that "
        "makes the answer reproducible under any partitioning. Scale "
        "shape: one groupBy to daily counts (the only shuffle that "
        "sees raw events), then windows over <= |days| rows per "
        "event type.",
    tags=("time", "changepoint", "statistics", "window", "aggregate"),
)
def cusum_changepoint_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    b = ev.agg(
        F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
    )
    spine = b.select(
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day"),
        "d0",
    )
    grid = ev.select("event_type").distinct().crossJoin(F.broadcast(spine))
    cnt = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("c"))
    daily = (
        grid.join(cnt, ["event_type", "day"], "left")
        .select(
            "event_type",
            "day",
            F.coalesce("c", F.lit(0)).alias("c"),
            (F.datediff("day", "d0") + 1).cast("long").alias("t"),
        )
    )
    tot = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("c").alias("tc")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    s = daily.join(tot, "event_type").select(
        "event_type",
        "day",
        "t",
        "n",
        "tc",
        (F.col("n") * F.sum("c").over(w) - F.col("t") * F.col("tc")).alias(
            "sp"
        ),
        F.sum("c").over(w).alias("ct"),
    )
    rk = F.row_number().over(
        Window.partitionBy("event_type").orderBy(
            F.abs(F.col("sp")).desc(), F.col("day")
        )
    )
    return (
        s.withColumn("rk", rk)
        .where(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("n").cast("long").alias("n_days"),
            # timestamp, not date: DuckDB DATE arrives in pandas as
            # datetime64, so both sides report the midnight instant
            F.col("day").cast("timestamp").alias("cp_day"),
            F.round(F.abs("sp").cast("double") / F.col("n"), 6).alias(
                "cusum_peak"
            ),
            F.round(F.col("ct").cast("double") / F.col("t"), 6).alias(
                "mean_before"
            ),
            F.when(F.col("t") == F.col("n"), F.lit(None).cast("double"))
            .otherwise(
                F.round(
                    (F.col("tc") - F.col("ct")).cast("double")
                    / (F.col("n") - F.col("t")),
                    6,
                )
            )
            .alias("mean_after"),
        )
    )


ACF_LAGS = (1, 7)  # daily and weekly autocorrelation

_ACF_ORACLE = f"""
WITH {_CUSUM_SPINE_SQL},
dev AS (
  SELECT d.event_type, d.day, tot.n,
         tot.n * d.c - tot.tc AS dv,
         LEAD(tot.n * d.c - tot.tc, 1) OVER (
           PARTITION BY d.event_type ORDER BY d.day) AS dv1,
         LEAD(tot.n * d.c - tot.tc, 7) OVER (
           PARTITION BY d.event_type ORDER BY d.day) AS dv7
  FROM daily d JOIN tot ON d.event_type = tot.event_type
)
SELECT event_type,
       CAST(MAX(n) AS BIGINT) AS n_days,
       ROUND(CAST(SUM(dv * dv1) AS DOUBLE) / SUM(dv * dv), 6)
         AS r_lag1,
       ROUND(CAST(SUM(dv * dv7) AS DOUBLE) / SUM(dv * dv), 6)
         AS r_lag7,
       ROUND(1.96 / SQRT(MAX(n)), 6) AS band95,
       ABS(CAST(SUM(dv * dv1) AS DOUBLE) / SUM(dv * dv))
         > 1.96 / SQRT(MAX(n)) AS sig_lag1,
       ABS(CAST(SUM(dv * dv7) AS DOUBLE) / SUM(dv * dv))
         > 1.96 / SQRT(MAX(n)) AS sig_lag7
FROM dev
GROUP BY event_type
"""


@register(
    "acf_daily_counts",
    oracle=_ACF_ORACLE,
    doc="Autocorrelation of the daily event-count series per event "
        "type at lags 1 and 7 (the daily-persistence and weekly-"
        "seasonality probes), with the 95% white-noise band "
        "1.96/sqrt(n) and significance flags. Runs on the same "
        "calendar-densified integer series as the CUSUM query, and "
        "the estimator r_k = sum(d_t*d_(t+k))/sum(d_t^2) is computed "
        "over the n-SCALED integer deviations d_t = n*c_t - T (the "
        "scale factor cancels in the ratio), so numerator and "
        "denominator are EXACT integers on both engines and only the "
        "final division is float. Null-lead tails drop out of the "
        "sums identically on both sides. One shuffle sees raw "
        "events; the lag windows run over <= |days| rows per group.",
    tags=("time", "acf", "statistics", "window", "aggregate"),
)
def acf_daily_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    b = ev.agg(
        F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
    )
    spine = b.select(
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day")
    )
    grid = ev.select("event_type").distinct().crossJoin(F.broadcast(spine))
    cnt = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("c"))
    daily = grid.join(cnt, ["event_type", "day"], "left").select(
        "event_type", "day", F.coalesce("c", F.lit(0)).alias("c")
    )
    tot = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("c").alias("tc")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    dv = (F.col("n") * F.col("c") - F.col("tc")).alias("dv")
    dev = daily.join(tot, "event_type").select(
        "event_type",
        "n",
        dv,
        F.lead(dv, 1).over(w).alias("dv1"),
        F.lead(dv, 7).over(w).alias("dv7"),
    )
    den = F.sum(F.col("dv") * F.col("dv"))
    r1 = F.sum(F.col("dv") * F.col("dv1")).cast("double") / den
    r7 = F.sum(F.col("dv") * F.col("dv7")).cast("double") / den
    band = F.lit(1.96) / F.sqrt(F.max("n"))
    return dev.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n_days"),
        F.round(r1, 6).alias("r_lag1"),
        F.round(r7, 6).alias("r_lag7"),
        F.round(band, 6).alias("band95"),
        (F.abs(r1) > band).alias("sig_lag1"),
        (F.abs(r7) > band).alias("sig_lag7"),
    )


# ---------------------------------------------------------------------------
# Seasonal decomposition (weekday indices over a detrended series)
# ---------------------------------------------------------------------------

_SEASONAL_ORACLE = f"""
WITH {_CUSUM_SPINE_SQL},
tr AS (
  SELECT d.event_type, d.day, d.c,
         CASE WHEN COUNT(*) OVER w = 7
              THEN CAST(SUM(d.c) OVER w AS DOUBLE) / 7 END AS trend
  FROM daily d
  WINDOW w AS (PARTITION BY d.event_type ORDER BY d.day
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
detr AS (
  SELECT event_type, isodow(day) - 1 AS weekday, c - trend AS dv
  FROM tr WHERE trend IS NOT NULL
)
SELECT event_type,
       CAST(weekday AS BIGINT) AS weekday,
       CAST(COUNT(*) AS BIGINT) AS n_obs,
       ROUND(AVG(dv), 6) AS seasonal_idx
FROM detr
GROUP BY event_type, weekday
"""


@register(
    "seasonal_decompose_weekday",
    oracle=_SEASONAL_ORACLE,
    doc="Classical seasonal decomposition, the moving-average "
        "flavor: the calendar-densified daily count series per event "
        "type is detrended by a centered 7-day moving average "
        "(computed only where the full window exists — no edge "
        "bias), and the weekday seasonal index is the mean detrended "
        "value per (event type, Monday-based weekday) — the "
        "operator behind 'is Tuesday really our slow day' and the "
        "deseasonalized inputs anomaly detectors want. The trend is "
        "an exact-integer 7-day sum divided once; the seasonal mean "
        "averages deterministic doubles (6 dp rounding absorbs "
        "cross-engine summation-order ulps, the repo-wide policy). "
        "Windows run per event type ordered by day — co-partitioned, "
        "never global.",
    tags=("time", "seasonal", "window", "aggregate"),
)
def seasonal_decompose_weekday(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    b = ev.agg(
        F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
    )
    spine = b.select(
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day")
    )
    grid = ev.select("event_type").distinct().crossJoin(F.broadcast(spine))
    cnt = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("c"))
    daily = grid.join(cnt, ["event_type", "day"], "left").select(
        "event_type", "day", F.coalesce("c", F.lit(0)).alias("c")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-3, 3)
    )
    tr = daily.select(
        "event_type",
        "day",
        "c",
        F.when(
            F.count(F.lit(1)).over(w) == 7,
            F.sum("c").over(w).cast("double") / 7,
        ).alias("trend"),
    )
    detr = tr.where(F.col("trend").isNotNull()).select(
        "event_type",
        F.weekday("day").cast("long").alias("weekday"),
        (F.col("c") - F.col("trend")).alias("dv"),
    )
    return detr.groupBy("event_type", "weekday").agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.round(F.avg("dv"), 6).alias("seasonal_idx"),
    )


# ---------------------------------------------------------------------------
# Token-bucket rate limiter replay (capped running balance fold)
# ---------------------------------------------------------------------------

# Unit system chosen so the WHOLE replay is integer arithmetic with no
# division anywhere: 1 unit == the refill earned per MICROSECOND of
# gap. At 1 token per 1000 s, one token = 1e9 units; capacity is 100
# tokens; an event costs floor(value * 1e9) units (~value tokens,
# value <= ~500 so every intermediate stays far below 2^63).
BUCKET_TOKEN_U = 1_000_000_000  # units per token
BUCKET_CAP_U = 100 * BUCKET_TOKEN_U


_BUCKET_ORACLE = f"""
WITH seq AS (
  SELECT user_id,
         epoch_us(ts) AS t,
         CAST(FLOOR(value * {BUCKET_TOKEN_U}) AS BIGINT) AS cost,
         ROW_NUMBER() OVER w AS rn,
         COUNT(*) OVER (PARTITION BY user_id) AS n
  FROM events WHERE value IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
folded AS (
  WITH RECURSIVE r AS (
    SELECT user_id, rn, n, t,
           CASE WHEN cost <= {BUCKET_CAP_U}
                THEN {BUCKET_CAP_U} - cost ELSE {BUCKET_CAP_U} END AS tok,
           CASE WHEN cost <= {BUCKET_CAP_U} THEN 1 ELSE 0 END AS acc,
           CASE WHEN cost <= {BUCKET_CAP_U} THEN 0 ELSE 1 END AS rej
    FROM seq WHERE rn = 1
    UNION ALL
    SELECT s.user_id, s.rn, s.n, s.t,
           CASE WHEN s.cost <= LEAST({BUCKET_CAP_U}, r.tok + s.t - r.t)
                THEN LEAST({BUCKET_CAP_U}, r.tok + s.t - r.t) - s.cost
                ELSE LEAST({BUCKET_CAP_U}, r.tok + s.t - r.t) END,
           r.acc + CASE WHEN s.cost <= LEAST({BUCKET_CAP_U},
                                             r.tok + s.t - r.t)
                        THEN 1 ELSE 0 END,
           r.rej + CASE WHEN s.cost <= LEAST({BUCKET_CAP_U},
                                             r.tok + s.t - r.t)
                        THEN 0 ELSE 1 END
    FROM r JOIN seq s ON s.user_id = r.user_id AND s.rn = r.rn + 1
  )
  SELECT * FROM r
)
SELECT user_id,
       CAST(n AS BIGINT) AS n_events,
       CAST(acc AS BIGINT) AS n_accepted,
       CAST(rej AS BIGINT) AS n_rejected,
       CAST(tok AS BIGINT) AS tokens_left_u
FROM folded WHERE rn = n
"""


@register(
    "rate_limit_token_bucket",
    oracle=_BUCKET_ORACLE,
    doc="Token-bucket rate limiter REPLAY per user — the capped "
        "running balance no plain window can express (the clamp "
        "makes each step depend on the clamped previous step): "
        "capacity 100 tokens, refill 1 token per 1000 s of gap, each "
        "event consumes ~value tokens if available, else it is "
        "rejected and consumes nothing. Audit-replaying a limiter "
        "over the event log answers 'what would this quota have "
        "rejected' before deploying it. The fold runs as the "
        "aggregate HOF over each user's (ts, event_id)-sorted struct "
        "array — the EWMA/Holt machinery generalized to struct state "
        "with a clamp — and the unit system (1 unit per microsecond "
        "of refill) makes the ENTIRE replay integer arithmetic with "
        "no division: bit-identical to the oracle's recursive-CTE "
        "replay, no rounding anywhere. One shuffle on user_id; "
        "per-user arrays bounded by activity.",
    tags=("time", "fold", "statebased", "aggregate", "hof"),
)
def rate_limit_token_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        load_tables(spark, sf_dir, "events")["events"]
        .where(F.col("value").isNotNull())
        .select(
            "user_id",
            F.unix_micros("ts").alias("t"),
            "event_id",
            F.floor(F.col("value") * BUCKET_TOKEN_U)
            .cast("long")
            .alias("cost"),
        )
    )
    series = ev.groupBy("user_id").agg(
        F.sort_array(
            F.collect_list(F.struct("t", "event_id", "cost"))
        ).alias("seq")
    )
    cap = F.lit(BUCKET_CAP_U).cast("long")
    init = F.struct(
        cap.alias("tok"),
        F.lit(0).cast("long").alias("acc"),
        F.lit(0).cast("long").alias("rej"),
        F.lit(None).cast("long").alias("t"),
    )

    def step(acc, s):
        avail = F.least(
            cap,
            acc["tok"]
            + F.coalesce(s["t"] - acc["t"], F.lit(0).cast("long")),
        )
        ok = s["cost"] <= avail
        return F.struct(
            F.when(ok, avail - s["cost"]).otherwise(avail).alias("tok"),
            (acc["acc"] + ok.cast("long")).alias("acc"),
            (acc["rej"] + (~ok).cast("long")).alias("rej"),
            s["t"].alias("t"),
        )

    folded = series.select(
        "user_id",
        F.size("seq").cast("long").alias("n_events"),
        F.aggregate(F.col("seq"), init, step).alias("st"),
    )
    return folded.select(
        "user_id",
        "n_events",
        F.col("st.acc").alias("n_accepted"),
        F.col("st.rej").alias("n_rejected"),
        F.col("st.tok").alias("tokens_left_u"),
    )


# ---------------------------------------------------------------------------
# Seasonal-adjusted anomaly detection (trend + weekday + robust z)
# ---------------------------------------------------------------------------

ANOM_Z = 3.0  # flag days with |residual z| above this
ANOM_TOP_K = 20


_ANOM_ORACLE = f"""
WITH {_CUSUM_SPINE_SQL},
tr AS (
  SELECT d.event_type, d.day, d.c,
         CASE WHEN COUNT(*) OVER w = 7
              THEN CAST(SUM(d.c) OVER w AS DOUBLE) / 7 END AS trend
  FROM daily d
  WINDOW w AS (PARTITION BY d.event_type ORDER BY d.day
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
detr AS (
  SELECT event_type, day, c, trend, isodow(day) - 1 AS weekday,
         c - trend AS dv
  FROM tr WHERE trend IS NOT NULL
),
seas AS (
  SELECT event_type, weekday, AVG(dv) AS sidx
  FROM detr GROUP BY event_type, weekday
),
resid AS (
  SELECT d.event_type, d.day, d.c, d.dv - s.sidx AS r
  FROM detr d JOIN seas s
    ON d.event_type = s.event_type AND d.weekday = s.weekday
),
sd AS (
  SELECT event_type, STDDEV_SAMP(r) AS sigma FROM resid GROUP BY event_type
)
SELECT r.event_type, r.day AS anomaly_day,
       CAST(r.c AS BIGINT) AS n_events,
       ROUND(r.r / sd.sigma, 6) AS resid_z,
       ABS(r.r / sd.sigma) > {ANOM_Z} AS is_anomaly
FROM resid r JOIN sd ON r.event_type = sd.event_type
ORDER BY ABS(ROUND(r.r / sd.sigma, 6)) DESC, r.event_type, r.day
LIMIT {ANOM_TOP_K}
"""


@register(
    "seasonal_adjusted_anomalies",
    oracle=_ANOM_ORACLE,
    doc="Seasonal-adjusted anomaly detection — the composition the "
        "decomposition stack exists for: daily counts minus the "
        "centered 7-day trend minus the weekday seasonal index leave "
        "residuals whose z-scores flag the days that are anomalous "
        f"AFTER accounting for growth and weekly rhythm (|z| > "
        f"{ANOM_Z}; a raw-count threshold would page on every "
        "Saturday). Same calendar-densified integer series and "
        "per-group windows as the CUSUM/seasonal queries — nothing "
        "concentrates; residual sigma is a per-group sample stddev "
        "(6 dp rounding absorbs summation-order ulps). The ordered "
        "top-k over ROUNDED |z| with (event_type, day) tiebreaks is "
        "total, so both engines select identical anomaly sets.",
    tags=("time", "anomaly", "seasonal", "window", "aggregate"),
)
def seasonal_adjusted_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    b = ev.agg(
        F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
    )
    spine = b.select(
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day")
    )
    grid = ev.select("event_type").distinct().crossJoin(F.broadcast(spine))
    cnt = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("c"))
    daily = grid.join(cnt, ["event_type", "day"], "left").select(
        "event_type", "day", F.coalesce("c", F.lit(0)).alias("c")
    )
    w = Window.partitionBy("event_type").orderBy("day").rowsBetween(-3, 3)
    detr = (
        daily.select(
            "event_type",
            "day",
            "c",
            F.when(
                F.count(F.lit(1)).over(w) == 7,
                F.sum("c").over(w).cast("double") / 7,
            ).alias("trend"),
        )
        .where(F.col("trend").isNotNull())
        .select(
            "event_type",
            "day",
            "c",
            F.weekday("day").alias("weekday"),
            (F.col("c") - F.col("trend")).alias("dv"),
        )
    )
    seas = detr.groupBy("event_type", "weekday").agg(
        F.avg("dv").alias("sidx")
    )
    resid = detr.join(F.broadcast(seas), ["event_type", "weekday"]).select(
        "event_type", "day", "c", (F.col("dv") - F.col("sidx")).alias("r")
    )
    sd = resid.groupBy("event_type").agg(F.stddev_samp("r").alias("sigma"))
    z = F.col("r") / F.col("sigma")
    return (
        resid.join(F.broadcast(sd), "event_type")
        .select(
            "event_type",
            F.col("day").cast("timestamp").alias("anomaly_day"),
            F.col("c").cast("long").alias("n_events"),
            F.round(z, 6).alias("resid_z"),
            (F.abs(z) > ANOM_Z).alias("is_anomaly"),
        )
        .orderBy(F.abs(F.col("resid_z")).desc(), "event_type", "anomaly_day")
        .limit(ANOM_TOP_K)
    )


# ---------------------------------------------------------------------------
# Kaplan-Meier survival estimator (user lifetime with right-censoring)
# ---------------------------------------------------------------------------

KM_CENSOR_TAIL_DAYS = 3  # users active in the final window are censored


@register(
    "kaplan_meier_survival",
    oracle=f"""
WITH ev AS (
  SELECT user_id, DATE_TRUNC('day', ts) AS day FROM events
),
w AS (SELECT MAX(day) AS wmax FROM ev),
u AS (
  SELECT user_id,
         DATE_DIFF('day', MIN(day), MAX(day)) AS t,
         MAX(day) >= (SELECT wmax FROM w)
                     - INTERVAL {KM_CENSOR_TAIL_DAYS} DAY AS censored
  FROM ev GROUP BY user_id
),
byt AS (
  SELECT t,
         SUM(CASE WHEN censored THEN 0 ELSE 1 END) AS d,
         SUM(CASE WHEN censored THEN 1 ELSE 0 END) AS c
  FROM u GROUP BY t
),
risk AS (
  SELECT t, d, c,
         SUM(d + c) OVER (ORDER BY t DESC) AS n_risk
  FROM byt
),
surv AS (
  SELECT t, d, c, n_risk,
         EXP(SUM(CASE WHEN d > 0 THEN LN(1.0 - d * 1.0 / n_risk)
                      ELSE 0.0 END)
             OVER (ORDER BY t)) AS s
  FROM risk
)
SELECT CAST(t AS BIGINT) AS lifetime_days,
       CAST(n_risk AS BIGINT) AS n_risk,
       CAST(d AS BIGINT) AS n_deaths,
       CAST(c AS BIGINT) AS n_censored,
       ROUND(s, 6) AS survival
FROM surv
""",
    doc="KAPLAN-MEIER survival curve of user lifetime (days between "
        "first and last event) with RIGHT-CENSORING — the churn/"
        "retention estimator that, unlike a naive lifetime histogram, "
        "does not bias downward from users still active at the "
        f"window edge (last event within {KM_CENSOR_TAIL_DAYS} days "
        "of the window end = censored: they exit the risk set "
        "without counting as churned). S(t) = prod over death times "
        "u <= t of (1 - d_u / n_risk_u), computed in log space over "
        "the O(days) per-lifetime rollup (the only data-sized work "
        "is the per-user min/max aggregate). Both engines run the "
        "identical EXP/LN expression on exact integer ratios and "
        "round to 6 dp (the MI-battery precedent for transcendental "
        "batteries). Windows run over the bounded lifetime table "
        "(allowlisted). The standard deaths-before-censoring tie "
        "convention at equal t holds in both engines by "
        "construction (censored users stay in n_risk at their t).",
    tags=("time", "statistics", "retention", "aggregate", "window"),
)
def kaplan_meier_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"].select(
        "user_id", F.date_trunc("day", "ts").alias("day")
    )
    w = ev.agg(F.max("day").alias("wmax"))
    u = (
        ev.groupBy("user_id")
        .agg(F.min("day").alias("fd"), F.max("day").alias("ld"))
        .crossJoin(F.broadcast(w))
        .select(
            F.datediff("ld", "fd").alias("t"),
            (
                F.col("ld")
                >= F.col("wmax") - F.expr(
                    f"INTERVAL {KM_CENSOR_TAIL_DAYS} DAY"
                )
            ).alias("censored"),
        )
    )
    byt = u.groupBy("t").agg(
        F.sum(F.when(F.col("censored"), 0).otherwise(1)).alias("d"),
        F.sum(F.when(F.col("censored"), 1).otherwise(0)).alias("c"),
    )
    wdesc = Window.orderBy(F.col("t").desc()).rangeBetween(
        Window.unboundedPreceding, 0
    )
    wasc = Window.orderBy("t").rangeBetween(Window.unboundedPreceding, 0)
    risk = byt.select(
        "t", "d", "c", F.sum(F.col("d") + F.col("c")).over(wdesc).alias("n_risk")
    )
    surv = risk.select(
        "t",
        "d",
        "c",
        "n_risk",
        F.exp(
            F.sum(
                F.when(
                    F.col("d") > 0,
                    F.log(F.lit(1.0) - F.col("d") * 1.0 / F.col("n_risk")),
                ).otherwise(F.lit(0.0))
            ).over(wasc)
        ).alias("s"),
    )
    return surv.select(
        F.col("t").cast("long").alias("lifetime_days"),
        F.col("n_risk").cast("long").alias("n_risk"),
        F.col("d").cast("long").alias("n_deaths"),
        F.col("c").cast("long").alias("n_censored"),
        F.round("s", 6).alias("survival"),
    )


# ---------------------------------------------------------------------------
# Theil-Sen-style robust trend: exact median of consecutive-day slopes
# ---------------------------------------------------------------------------


@register(
    "theil_sen_trend_robust",
    oracle="""
WITH daily AS (
  SELECT o_orderdate AS d,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS y
  FROM orders GROUP BY o_orderdate
),
mind AS (SELECT MIN(d) AS d0 FROM daily),
pts AS (
  SELECT DATE_DIFF('day', mind.d0, daily.d) AS x, y
  FROM daily CROSS JOIN mind
),
sl AS (
  SELECT x,
         (LEAD(y) OVER (ORDER BY x) - y)
           / (LEAD(x) OVER (ORDER BY x) - x) AS slope
  FROM pts
  QUALIFY slope IS NOT NULL
),
n AS (SELECT COUNT(*) AS n FROM sl),
k AS (SELECT n, CAST(CEIL(n / 2.0) AS BIGINT) AS k FROM n),
r AS (SELECT slope, ROW_NUMBER() OVER (ORDER BY slope, x) AS rn FROM sl),
ols AS (SELECT REGR_SLOPE(y, x) AS b FROM pts)
SELECT CAST(k.n AS BIGINT) AS n_slopes, k.k,
       ROUND(r.slope, 6) AS median_slope,
       ROUND(ols.b, 6) AS ols_slope
FROM k JOIN r ON r.rn = k.k CROSS JOIN ols
""",
    doc="Robust daily-revenue trend: the EXACT MEDIAN of consecutive-"
        "day slopes (the bounded-pair Theil-Sen variant — the full "
        "estimator medians all O(n^2) pairs; consecutive pairs keep "
        "the breakdown robustness a monitoring trend needs at O(n) "
        "cost) side by side with the native OLS slope, so one row "
        "quantifies how far outlier days pull the least-squares fit. "
        "Slopes are exact IEEE divisions of DECIMAL-exact daily "
        "sums; the median is the k-th smallest with a full (slope, "
        "day) tiebreak over the O(days) slope table (allowlisted "
        "bound — at data-sized inputs the two-pass bucket selection "
        "replaces it). Cross-engine: Spark's regr_slope certifies "
        "against DuckDB's (the revenue_trend_ols precedent).",
    tags=("time", "statistics", "learn", "aggregate", "window"),
)
def theil_sen_trend_robust(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir, "orders")["orders"]
    daily = orders.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("y")
    )
    mind = daily.agg(F.min("d").alias("d0"))
    pts = daily.crossJoin(F.broadcast(mind)).select(
        F.datediff("d", "d0").alias("x"), "y"
    )
    wx = Window.orderBy("x")
    sl = (
        pts.select(
            "x",
            (
                (F.lead("y").over(wx) - F.col("y"))
                / (F.lead("x").over(wx) - F.col("x"))
            ).alias("slope"),
        )
        .where(F.col("slope").isNotNull())
    )
    n = sl.agg(F.count(F.lit(1)).alias("n"))
    k = n.select("n", F.ceil(F.col("n") / 2.0).cast("long").alias("k"))
    wr = Window.orderBy("slope", "x")
    r = sl.withColumn("rn", F.row_number().over(wr))
    ols = pts.agg(F.regr_slope("y", "x").alias("b"))
    return (
        r.crossJoin(F.broadcast(k))
        .where(F.col("rn") == F.col("k"))
        .crossJoin(F.broadcast(ols))
        .select(
            F.col("n").cast("long").alias("n_slopes"),
            "k",
            F.round("slope", 6).alias("median_slope"),
            F.round("b", 6).alias("ols_slope"),
        )
    )


# ---------------------------------------------------------------------------
# Holt-Winters additive (7-day season) on the daily revenue series
# ---------------------------------------------------------------------------

HW_ALPHA = 0.3  # level smoothing
HW_BETA = 0.1  # trend smoothing
HW_GAMMA = 0.2  # season smoothing
HW_M = 7  # season length (weekly)
HW_H = 3  # forecast horizons reported


def _hw_season_case(slot: str) -> str:
    """SQL CASE selecting the season slot ``slot`` (1..m) from s1..sm."""
    return (
        f"CASE {slot} "
        + " ".join(f"WHEN {k} THEN s{k}" for k in range(1, HW_M + 1))
        + " END"
    )


def _hw_sql_core(stop: str) -> str:
    """Shared WITH-prefix (daily/seq/f/folded) of the Holt-Winters
    oracles: the recursive-CTE fold over the daily revenue series.
    ``stop`` is the fold position (SQL expression in ``n``) whose state
    the ``folded`` CTE exposes — ``n`` for the full-series fit,
    ``n - m`` for the backtest that holds out the last season."""
    m, a, b, g = HW_M, HW_ALPHA, HW_BETA, HW_GAMMA
    # init: l = mean(first m), b = (mean(second m) - mean(first m))/m,
    # s_k = y_k - mean(first m)
    init_s = ",\n           ".join(
        f"(SELECT y FROM seq WHERE rn = {k}) - f.l0 AS s{k}"
        for k in range(1, m + 1)
    )
    l_new = f"{a} * (s.y - CASE (r.i % {m}) + 1 " + " ".join(
        f"WHEN {k} THEN r.s{k}" for k in range(1, m + 1)
    ) + f" END) + (1 - {a}) * (r.l + r.b)"
    s_updates = ",\n           ".join(
        f"CASE WHEN (r.i % {m}) + 1 = {k} THEN "
        f"{g} * (s.y - ({l_new})) + (1 - {g}) * r.s{k} "
        f"ELSE r.s{k} END AS s{k}"
        for k in range(1, m + 1)
    )
    return f"""
WITH daily AS (
  SELECT o_orderdate AS d,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS y
  FROM orders GROUP BY o_orderdate
),
seq AS (
  SELECT y, ROW_NUMBER() OVER (ORDER BY d) AS rn,
         COUNT(*) OVER () AS n
  FROM daily
),
f AS (
  SELECT (SELECT AVG(y) FROM seq WHERE rn <= {m}) AS l0,
         ((SELECT AVG(y) FROM seq WHERE rn > {m} AND rn <= {2 * m})
          - (SELECT AVG(y) FROM seq WHERE rn <= {m})) / {m} AS b0
),
folded AS (
  WITH RECURSIVE r AS (
    SELECT (SELECT MAX(n) FROM seq) AS n, {2 * m} AS i,
           f.l0 AS l, f.b0 AS b,
           {init_s}
    FROM f
    UNION ALL
    SELECT r.n, r.i + 1,
           {l_new} AS l,
           {b} * (({l_new}) - r.l) + (1 - {b}) * r.b AS b,
           {s_updates}
    FROM r JOIN seq s ON s.rn = r.i + 1
  )
  SELECT * FROM r WHERE i = {stop}
)"""


def _hw_oracle() -> str:
    # 2 dp report grain: the sequential fold compounds per-step FMA /
    # contraction differences between builds to ~1e-8 at the ~1e7
    # level magnitude; 6 dp sat within one boundary-crossing of that
    # (tools/env_sensitivity_audit.py class SIGDIG), 2 dp leaves
    # ~5e5x slack
    m = HW_M
    fc = ",\n       ".join(
        f"ROUND(l + {h} * b + "
        + _hw_season_case(f"((n + {h} - 1) % {m}) + 1")
        + f", 2) AS forecast_h{h}"
        for h in range(1, HW_H + 1)
    )
    return _hw_sql_core("n") + f"""
SELECT CAST(n AS BIGINT) AS n_days,
       ROUND(l, 2) AS level_last,
       ROUND(b, 2) AS trend_last,
       {", ".join(f"ROUND(s{k}, 2) AS season_{k}" for k in range(1, m + 1))},
       {fc}
FROM folded
"""


@register(
    "holt_winters_weekly_revenue",
    oracle=_hw_oracle(),
    doc="HOLT-WINTERS ADDITIVE triple-exponential smoothing "
        f"(alpha={HW_ALPHA}, beta={HW_BETA}, gamma={HW_GAMMA}, "
        f"season m={HW_M}) on the daily order-revenue series — the "
        "forecaster that beats Holt whenever the series has a weekly "
        "pulse, completing the EWMA -> Holt -> Holt-Winters ladder. "
        "The ordered fold carries an 11-field struct state (level, "
        f"trend, {HW_M} season slots, position) through the "
        "aggregate HOF; the touched season slot is selected by a "
        "CASE over the position mod m, and the level expression is "
        "duplicated inside the trend and season updates exactly as "
        "the recursive-CTE oracle duplicates it, so every float op "
        "matches (the events_value_holt precedent, widened). "
        "Classic init: l = mean of week 1, b = (mean week 2 - mean "
        "week 1)/m, s_k = y_k - l. The only data-sized work is the "
        "per-day DECIMAL aggregate; the fold runs over the bounded "
        "O(days) rollup (allowlisted), as any single-series "
        f"forecaster must. Reports the final state and h=1..{HW_H} "
        "seasonal forecasts l + h*b + s[(n+h-1) mod m].",
    tags=("time", "forecast", "aggregate", "hof", "window"),
)
def holt_winters_weekly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    m, al, bt, gm = HW_M, HW_ALPHA, HW_BETA, HW_GAMMA
    orders = load_tables(spark, sf_dir, "orders")["orders"]
    daily = orders.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("y")
    )
    series = daily.agg(
        F.sort_array(F.collect_list(F.struct("d", "y"))).alias("seq")
    ).select(F.col("seq.y").alias("ys"), F.size("seq").alias("n"))
    ys = F.col("ys")
    wk1 = F.aggregate(
        F.slice(ys, 1, m), F.lit(0.0), lambda acc, v: acc + v
    ) / float(m)
    wk2 = F.aggregate(
        F.slice(ys, m + 1, m), F.lit(0.0), lambda acc, v: acc + v
    ) / float(m)
    init = F.struct(
        wk1.alias("l"),
        ((wk2 - wk1) / float(m)).alias("b"),
        *[
            (F.element_at(ys, k) - wk1).alias(f"s{k}")
            for k in range(1, m + 1)
        ],
        F.lit(2 * m).alias("i"),
    )

    def step(acc, y):
        # season slot of the INCOMING element (position acc.i + 1):
        # ((i + 1) - 1) % m + 1 == (i % m) + 1
        idx = (acc["i"] % m) + 1
        s_cur = F.lit(None).cast("double")
        for k in range(m, 0, -1):
            s_cur = F.when(idx == k, acc[f"s{k}"]).otherwise(s_cur)

        def l_new():
            return al * (y - s_cur) + (1.0 - al) * (acc["l"] + acc["b"])

        fields = [
            l_new().alias("l"),
            (bt * (l_new() - acc["l"]) + (1.0 - bt) * acc["b"]).alias("b"),
        ]
        for k in range(1, m + 1):
            fields.append(
                F.when(
                    idx == k,
                    gm * (y - l_new()) + (1.0 - gm) * acc[f"s{k}"],
                )
                .otherwise(acc[f"s{k}"])
                .alias(f"s{k}")
            )
        fields.append((acc["i"] + 1).alias("i"))
        return F.struct(*fields)

    state = F.aggregate(
        F.slice(ys, 2 * m + 1, F.greatest(F.size(ys) - 2 * m, F.lit(0))),
        init,
        step,
    )
    out = [
        F.col("n").cast("long").alias("n_days"),
        F.round(state["l"], 2).alias("level_last"),
        F.round(state["b"], 2).alias("trend_last"),
    ]
    for k in range(1, m + 1):
        out.append(F.round(state[f"s{k}"], 2).alias(f"season_{k}"))
    for h in range(1, HW_H + 1):
        slot = ((F.col("n") + h - 1) % m) + 1
        s_h = F.lit(None).cast("double")
        for k in range(m, 0, -1):
            s_h = F.when(slot == k, state[f"s{k}"]).otherwise(s_h)
        out.append(
            F.round(state["l"] + float(h) * state["b"] + s_h, 2).alias(
                f"forecast_h{h}"
            )
        )
    return series.select(*out)


# ---------------------------------------------------------------------------
# Forecast backtesting: seasonal-naive vs naive, MAE / MASE
# ---------------------------------------------------------------------------

BT_SEASON = 7  # weekly seasonality
BT_HOLDOUT = 28  # final days scored as the holdout


@register(
    "forecast_backtest_mase",
    oracle=f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
  FROM orders GROUP BY 1
),
lagged AS (
  SELECT d, rev,
         LAG(rev, {BT_SEASON}) OVER (ORDER BY d) AS rev_sn,
         LAG(rev, 1) OVER (ORDER BY d) AS rev_naive,
         MAX(d) OVER () AS dmax
  FROM daily
),
holdout AS (
  SELECT * FROM lagged WHERE d > dmax - {BT_HOLDOUT}
),
train AS (
  SELECT * FROM lagged WHERE d <= dmax - {BT_HOLDOUT}
    AND rev_naive IS NOT NULL
)
SELECT CAST((SELECT COUNT(*) FROM holdout) AS BIGINT) AS n_holdout_days,
       CAST((SELECT SUM(ABS(rev - rev_sn)) FROM holdout) AS DOUBLE)
         / (SELECT COUNT(*) FROM holdout) AS mae_seasonal_naive,
       CAST((SELECT SUM(ABS(rev - rev_naive)) FROM holdout) AS DOUBLE)
         / (SELECT COUNT(*) FROM holdout) AS mae_naive,
       ROUND((CAST((SELECT SUM(ABS(rev - rev_sn)) FROM holdout) AS DOUBLE)
              / (SELECT COUNT(*) FROM holdout))
             / (CAST((SELECT SUM(ABS(rev - rev_naive)) FROM train)
                     AS DOUBLE) / (SELECT COUNT(*) FROM train)), 6)
         AS mase,
       (CAST((SELECT SUM(ABS(rev - rev_sn)) FROM holdout) AS DOUBLE)
        <= CAST((SELECT SUM(ABS(rev - rev_naive)) FROM holdout) AS DOUBLE))
         AS seasonal_beats_naive
FROM (SELECT 1)
""",
    doc=f"FORECAST BACKTEST: seasonal-naive (value {BT_SEASON} days "
        f"prior) scored against the final {BT_HOLDOUT}-day holdout of "
        "daily revenue, with MAE, the one-step-naive MAE, and MASE "
        "(Hyndman-Koehler: holdout seasonal-naive MAE scaled by the "
        "TRAIN-period naive MAE) — the evaluation layer for the "
        "forecasting family (Holt, Holt-Winters, conformal): a "
        "forecaster that cannot beat seasonal-naive on MASE should "
        "not ship, and this query measures that in-engine. All "
        "absolute errors accumulate in exact DECIMAL before the two "
        "final divisions; the lag features are two LAGs over one "
        "date-ordered window on the O(days) rollup (bounded input, "
        "allowlisted). seasonal_beats_naive certifies the expected "
        "ordering on this data.",
    tags=("time", "forecast", "evaluation", "window", "aggregate"),
)
def forecast_backtest_mase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = load_tables(spark, sf_dir, "orders")["orders"]
    daily = orders.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev")
    )
    w = Window.orderBy("d")
    lagged = daily.select(
        "d",
        "rev",
        F.lag("rev", BT_SEASON).over(w).alias("rev_sn"),
        F.lag("rev", 1).over(w).alias("rev_naive"),
        F.max("d").over(Window.partitionBy()).alias("dmax"),
    ).localCheckpoint(eager=True)  # O(days) rows, read by both splits
    holdout = lagged.where(
        F.col("d") > F.date_sub(F.col("dmax"), BT_HOLDOUT)
    )
    train = lagged.where(
        (F.col("d") <= F.date_sub(F.col("dmax"), BT_HOLDOUT))
        & F.col("rev_naive").isNotNull()
    )
    h = holdout.agg(
        F.count(F.lit(1)).alias("nh"),
        F.sum(F.abs(F.col("rev") - F.col("rev_sn"))).alias("sae_sn"),
        F.sum(F.abs(F.col("rev") - F.col("rev_naive"))).alias("sae_nv"),
    )
    t = train.agg(
        F.count(F.lit(1)).alias("nt"),
        F.sum(F.abs(F.col("rev") - F.col("rev_naive"))).alias("sae_tr"),
    )
    mae_sn = F.col("sae_sn").cast("double") / F.col("nh")
    mae_nv = F.col("sae_nv").cast("double") / F.col("nh")
    scale = F.col("sae_tr").cast("double") / F.col("nt")
    return h.crossJoin(F.broadcast(t)).select(
        F.col("nh").cast("long").alias("n_holdout_days"),
        mae_sn.alias("mae_seasonal_naive"),
        mae_nv.alias("mae_naive"),
        F.round(mae_sn / scale, 6).alias("mase"),
        (
            F.col("sae_sn").cast("double") <= F.col("sae_nv").cast("double")
        ).alias("seasonal_beats_naive"),
    )


# ---------------------------------------------------------------------------
# Croston's method: intermittent-demand forecasting
# ---------------------------------------------------------------------------

CROSTON_ALPHA = 0.1
CROSTON_QTY = 49  # "demand" = lineitems with quantity >= this (rare)


@register(
    "croston_intermittent_demand",
    oracle=f"""
WITH demand AS (
  SELECT p.p_brand AS brand,
         DATE_TRUNC('week', CAST(l.l_shipdate AS DATE)) AS wk,
         COUNT(*) AS v
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  WHERE l.l_quantity >= {CROSTON_QTY}
  GROUP BY 1, 2
),
seq AS (
  SELECT brand, wk, v,
         ROW_NUMBER() OVER (PARTITION BY brand ORDER BY wk) AS j,
         COUNT(*) OVER (PARTITION BY brand) AS k,
         DATEDIFF('day', LAG(wk) OVER (PARTITION BY brand ORDER BY wk),
                  wk) // 7 AS gap
  FROM demand
),
z AS (
  SELECT brand, MAX(k) AS k,
         CAST(SUM(CAST(ROUND(CASE WHEN j >= 2 THEN
               {CROSTON_ALPHA} * v * POWER(1 - {CROSTON_ALPHA}, k - j)
             ELSE POWER(1 - {CROSTON_ALPHA}, k - 1) * v END, 9)
             AS DECIMAL(28,12))) AS DOUBLE) AS z_hat,
         CAST(SUM(v) AS BIGINT) AS total_units
  FROM seq GROUP BY brand
),
ivals AS (
  SELECT brand, gap,
         ROW_NUMBER() OVER (PARTITION BY brand ORDER BY j) AS m,
         COUNT(*) OVER (PARTITION BY brand) AS mm
  FROM seq WHERE j >= 2
),
p AS (
  SELECT brand,
         CAST(SUM(CAST(ROUND(CASE WHEN m >= 2 THEN
               {CROSTON_ALPHA} * gap * POWER(1 - {CROSTON_ALPHA}, mm - m)
             ELSE POWER(1 - {CROSTON_ALPHA}, mm - 1) * gap END, 9)
             AS DECIMAL(28,12))) AS DOUBLE) AS p_hat
  FROM ivals GROUP BY brand
)
SELECT z.brand, CAST(z.k AS BIGINT) AS n_demand_points, z.total_units,
       ROUND(z.z_hat, 6) AS z_hat, ROUND(p.p_hat, 6) AS p_hat,
       ROUND(z.z_hat / p.p_hat, 6) AS forecast_per_week
FROM z JOIN p ON p.brand = z.brand
""",
    doc="CROSTON'S METHOD for intermittent demand — the standard "
        "forecaster when most periods are ZERO (spare parts, rare "
        "SKUs, long-tail content) where Holt-Winters and moving "
        "averages systematically understate: exponential smoothing "
        "runs ONLY at demand points, separately over demand SIZES "
        f"(alpha={CROSTON_ALPHA}) and inter-demand INTERVALS (weeks "
        "between consecutive demand weeks — no dense calendar spine "
        "needed), and the rate forecast is size/interval. Demand "
        f"here: weekly counts of quantity >= {CROSTON_QTY} line "
        "items per brand (~78% zero weeks). The SES recursions are "
        "UNROLLED to their closed form — z_K = alpha * sum v_j * "
        "(1-alpha)^(K-j) + (1-alpha)^(K-1) * v_1 — so each series "
        "needs one partitioned rank window and one aggregate, no "
        "iteration; the weighted terms are rounded to 9 dp and "
        "summed through DECIMAL(28,12), making the float fold "
        "order-independent and bit-identical cross-engine (the "
        "embedding_pq discipline). Scale: the demand table is one "
        "aggregate over the scan; everything after is per-series "
        "windows over |demand points| rows — intermittency itself "
        "keeps that small.",
    tags=("time", "forecast", "window", "aggregate"),
)
def croston_intermittent_demand(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    t = load_tables(spark, sf_dir, "lineitem", "part")
    a = CROSTON_ALPHA
    demand = (
        t["lineitem"]
        .where(F.col("l_quantity") >= CROSTON_QTY)
        .join(
            F.broadcast(t["part"].select("p_partkey", "p_brand")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.date_trunc("week", F.to_date("l_shipdate")).alias("wk"),
        )
        .agg(F.count(F.lit(1)).alias("v"))
    )
    wb = Window.partitionBy("brand").orderBy("wk")
    wk_all = Window.partitionBy("brand")
    seq = demand.select(
        "brand",
        "wk",
        "v",
        F.row_number().over(wb).alias("j"),
        F.count(F.lit(1)).over(wk_all).alias("k"),
        F.expr(
            "datediff(wk, lag(wk) over "
            "(partition by brand order by wk)) div 7"
        ).alias("gap"),
    )

    def folded(term, idx, total):
        """alpha-weighted closed-form SES fold, DECIMAL-summed."""
        w = F.when(
            idx >= 2, F.lit(a) * term * F.pow(F.lit(1 - a), total - idx)
        ).otherwise(F.pow(F.lit(1 - a), total - 1) * term)
        return F.sum(F.round(w, 9).cast("decimal(28,12)")).cast("double")

    z = seq.groupBy("brand").agg(
        F.max("k").alias("k"),
        folded(F.col("v"), F.col("j"), F.col("k")).alias("z_hat"),
        F.sum("v").cast("long").alias("total_units"),
    )
    ivals = seq.where(F.col("j") >= 2).select(
        "brand",
        "gap",
        F.row_number().over(wb.orderBy("j")).alias("m"),
        F.count(F.lit(1)).over(wk_all).alias("mm"),
    )
    p = ivals.groupBy("brand").agg(
        folded(F.col("gap"), F.col("m"), F.col("mm")).alias("p_hat")
    )
    return z.join(p, "brand").select(
        "brand",
        F.col("k").cast("long").alias("n_demand_points"),
        "total_units",
        F.round("z_hat", 6).alias("z_hat"),
        F.round("p_hat", 6).alias("p_hat"),
        F.round(F.col("z_hat") / F.col("p_hat"), 6).alias(
            "forecast_per_week"
        ),
    )


# ---------------------------------------------------------------------------
# Mann-Kendall trend test (the significance test beside Theil-Sen)
# ---------------------------------------------------------------------------

MK_Z_CRIT = 1.959964  # two-sided 5% normal critical value


@register(
    "mann_kendall_trend",
    oracle=f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS x
  FROM orders GROUP BY 1
),
pairs AS (
  SELECT CASE WHEN b.x > a.x THEN 1 WHEN b.x < a.x THEN -1 ELSE 0 END AS sg
  FROM daily a JOIN daily b ON a.day < b.day
),
sstat AS (SELECT CAST(SUM(sg) AS BIGINT) AS s FROM pairs),
ties AS (
  SELECT COALESCE(SUM(CAST(t AS DOUBLE) * (t - 1) * (2 * t + 5)), 0) AS tsum
  FROM (SELECT COUNT(*) AS t FROM daily GROUP BY x) WHERE t > 1
),
nrow AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM daily),
var AS (
  SELECT n, s,
         (CAST(n AS DOUBLE) * (n - 1) * (2 * n + 5) - tsum) / 18.0 AS var_s
  FROM nrow CROSS JOIN sstat CROSS JOIN ties
)
SELECT n AS n_days, s AS s_stat,
       ROUND(var_s, 4) AS var_s,
       ROUND(CASE WHEN s > 0 THEN (s - 1) / SQRT(var_s)
                  WHEN s < 0 THEN (s + 1) / SQRT(var_s)
                  ELSE 0.0 END, 6) AS z_score,
       CASE WHEN s > 0 AND (s - 1) / SQRT(var_s) > {MK_Z_CRIT}
              THEN 'increasing'
            WHEN s < 0 AND (s + 1) / SQRT(var_s) < -{MK_Z_CRIT}
              THEN 'decreasing'
            ELSE 'no_trend' END AS trend
FROM var
""",
    doc="MANN-KENDALL trend test over daily revenue — the "
        "distribution-free significance test that pairs with "
        "theil_sen_trend_robust (Theil-Sen estimates the slope, "
        "Mann-Kendall decides whether a monotone trend EXISTS): "
        "S = sum over day pairs i<j of sign(x_j - x_i), tie-corrected "
        "Var(S) = (n(n-1)(2n+5) - sum t(t-1)(2t+5))/18, continuity-"
        "corrected z, verdict at the two-sided 5% level. Daily values "
        "are exact DECIMAL sums so the sign comparisons cannot "
        "diverge cross-engine. Scale: the pair join is over the "
        "CALENDAR-BOUNDED daily pre-aggregate (~2.4k days here; "
        "bounded by the date range, never by row count — at 100 TB "
        "the O(days^2) pair volume is unchanged while the daily "
        "rollup is one map-side-combinable aggregate).",
    tags=("statistics", "time", "trend", "aggregate"),
)
def mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir, "orders")["orders"]
    daily = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("decimal(38,2)")
        .alias("x")
    ).localCheckpoint(eager=True)
    a, bb = daily.alias("a"), daily.alias("b")
    sstat = (
        a.join(bb, F.col("a.day") < F.col("b.day"))
        .select(
            F.when(F.col("b.x") > F.col("a.x"), 1)
            .when(F.col("b.x") < F.col("a.x"), -1)
            .otherwise(0)
            .alias("sg")
        )
        .agg(F.sum("sg").cast("long").alias("s"))
    )
    ties = (
        daily.groupBy("x")
        .agg(F.count(F.lit(1)).alias("t"))
        .where(F.col("t") > 1)
        .agg(
            F.coalesce(
                F.sum(
                    F.col("t").cast("double")
                    * (F.col("t") - 1)
                    * (2 * F.col("t") + 5)
                ),
                F.lit(0.0),
            ).alias("tsum")
        )
    )
    nrow = daily.agg(F.count(F.lit(1)).cast("long").alias("n"))
    var_s = (
        F.col("n").cast("double")
        * (F.col("n") - 1)
        * (2 * F.col("n") + 5)
        - F.col("tsum")
    ) / 18.0
    z = (
        F.when(F.col("s") > 0, (F.col("s") - 1) / F.sqrt(F.col("var_s")))
        .when(F.col("s") < 0, (F.col("s") + 1) / F.sqrt(F.col("var_s")))
        .otherwise(0.0)
    )
    return (
        nrow.crossJoin(F.broadcast(sstat))
        .crossJoin(F.broadcast(ties))
        .withColumn("var_s", var_s)
        .select(
            F.col("n").alias("n_days"),
            F.col("s").alias("s_stat"),
            F.round("var_s", 4).alias("var_s"),
            F.round(z, 6).alias("z_score"),
            F.when(
                (F.col("s") > 0)
                & ((F.col("s") - 1) / F.sqrt(F.col("var_s")) > MK_Z_CRIT),
                "increasing",
            )
            .when(
                (F.col("s") < 0)
                & ((F.col("s") + 1) / F.sqrt(F.col("var_s")) < -MK_Z_CRIT),
                "decreasing",
            )
            .otherwise("no_trend")
            .alias("trend"),
        )
    )


# ---------------------------------------------------------------------------
# Kendall tau-b rank correlation between two daily series
# ---------------------------------------------------------------------------


@register(
    "kendall_tau_daily",
    oracle="""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS x,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS y
  FROM orders GROUP BY 1
),
pairs AS (
  SELECT (CASE WHEN b.x > a.x THEN 1 WHEN b.x < a.x THEN -1 ELSE 0 END)
           * (CASE WHEN b.y > a.y THEN 1 WHEN b.y < a.y THEN -1 ELSE 0 END)
           AS prod,
         CASE WHEN a.x = b.x THEN 1 ELSE 0 END AS tx,
         CASE WHEN a.y = b.y THEN 1 ELSE 0 END AS ty
  FROM daily a JOIN daily b ON a.day < b.day
),
agg AS (
  SELECT SUM(CASE WHEN prod = 1 THEN 1 ELSE 0 END) AS c,
         SUM(CASE WHEN prod = -1 THEN 1 ELSE 0 END) AS d,
         SUM(tx) AS nx, SUM(ty) AS ny, COUNT(*) AS n0
  FROM pairs
)
SELECT CAST((SELECT COUNT(*) FROM daily) AS BIGINT) AS n_days,
       CAST(c AS BIGINT) AS concordant,
       CAST(d AS BIGINT) AS discordant,
       CAST(nx AS BIGINT) AS tied_x_pairs,
       CAST(ny AS BIGINT) AS tied_y_pairs,
       ROUND((c - d) / SQRT(CAST(n0 - nx AS DOUBLE) * (n0 - ny)), 6)
         AS tau_b
FROM agg
""",
    doc="KENDALL TAU-B between daily order count and daily revenue — "
        "the rank correlation that, unlike spearman_rank_correlation, "
        "is a direct function of concordant/discordant PAIRS and "
        "handles ties by the tau-b normalizer "
        "(C-D)/sqrt((n0-nx)(n0-ny)). Counts are integers and revenue "
        "is an exact DECIMAL sum, so every comparison is exact and "
        "the only float is the final normalizer. Scale: same "
        "calendar-bounded pair join as mann_kendall_trend — O(days^2) "
        "on the daily pre-aggregate, invariant to row count.",
    tags=("statistics", "time", "correlation", "aggregate"),
)
def kendall_tau_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir, "orders")["orders"]
    daily = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("x"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("decimal(38,2)")
        .alias("y"),
    ).localCheckpoint(eager=True)
    a, bb = daily.alias("a"), daily.alias("b")
    sgx = (
        F.when(F.col("b.x") > F.col("a.x"), 1)
        .when(F.col("b.x") < F.col("a.x"), -1)
        .otherwise(0)
    )
    sgy = (
        F.when(F.col("b.y") > F.col("a.y"), 1)
        .when(F.col("b.y") < F.col("a.y"), -1)
        .otherwise(0)
    )
    pairs = a.join(bb, F.col("a.day") < F.col("b.day")).select(
        (sgx * sgy).alias("prod"),
        F.when(F.col("a.x") == F.col("b.x"), 1).otherwise(0).alias("tx"),
        F.when(F.col("a.y") == F.col("b.y"), 1).otherwise(0).alias("ty"),
    )
    agg = pairs.agg(
        F.sum(F.when(F.col("prod") == 1, 1).otherwise(0)).alias("c"),
        F.sum(F.when(F.col("prod") == -1, 1).otherwise(0)).alias("d"),
        F.sum("tx").alias("nx"),
        F.sum("ty").alias("ny"),
        F.count(F.lit(1)).alias("n0"),
    )
    nd = daily.agg(F.count(F.lit(1)).cast("long").alias("n_days"))
    return nd.crossJoin(F.broadcast(agg)).select(
        "n_days",
        F.col("c").cast("long").alias("concordant"),
        F.col("d").cast("long").alias("discordant"),
        F.col("nx").cast("long").alias("tied_x_pairs"),
        F.col("ny").cast("long").alias("tied_y_pairs"),
        F.round(
            (F.col("c") - F.col("d"))
            / F.sqrt(
                (F.col("n0") - F.col("nx")).cast("double")
                * (F.col("n0") - F.col("ny"))
            ),
            6,
        ).alias("tau_b"),
    )


# ---------------------------------------------------------------------------
# Kleinberg burst detection (2-state Viterbi over the day spine)
# ---------------------------------------------------------------------------

KB_TARGET = "purchase"  # the event type whose rate is monitored
KB_S = 2.0  # burst-state rate multiplier p1 = S * p0
KB_GAMMA = 1.0  # state-entry cost coefficient (gamma * ln T)
_KB_INF = 1e18


@register(
    "kleinberg_burst_days",
    oracle=f"""
WITH RECURSIVE daily AS (
  SELECT CAST(ts AS DATE) AS day,
         SUM(CASE WHEN event_type = '{KB_TARGET}' THEN 1 ELSE 0 END) AS r,
         COUNT(*) AS d
  FROM events GROUP BY 1
),
idx AS (
  SELECT day, r, d, ROW_NUMBER() OVER (ORDER BY day) AS t FROM daily
),
params AS (
  SELECT CAST(SUM(r) AS DOUBLE) / SUM(d) AS pp0,
         LEAST(CAST({KB_S} AS DOUBLE) * SUM(r) / SUM(d),
               CAST(0.9999 AS DOUBLE)) AS pp1,
         CAST({KB_GAMMA} AS DOUBLE) * LN(COUNT(*)) AS glt
  FROM daily
),
dp AS (
  SELECT 0 AS t, CAST(0 AS DOUBLE) AS c0, CAST({_KB_INF} AS DOUBLE) AS c1,
         '' AS p0, '' AS p1
  UNION ALL
  SELECT i.t,
         LEAST(dp.c0, dp.c1)
           - (i.r * LN(pp0) + (i.d - i.r) * LN(1 - pp0)),
         LEAST(dp.c0 + glt, dp.c1)
           - (i.r * LN(pp1) + (i.d - i.r) * LN(1 - pp1)),
         (CASE WHEN dp.c0 <= dp.c1 THEN dp.p0 ELSE dp.p1 END) || '0',
         (CASE WHEN dp.c0 + glt < dp.c1 THEN dp.p0 ELSE dp.p1 END) || '1'
  FROM dp JOIN idx i ON i.t = dp.t + 1 CROSS JOIN params
),
fin AS (
  SELECT CASE WHEN c0 <= c1 THEN p0 ELSE p1 END AS path
  FROM dp WHERE t = (SELECT MAX(t) FROM dp)
)
SELECT STRFTIME(i.day, '%Y-%m-%d') AS day,
       CAST(i.r AS BIGINT) AS n_target,
       CAST(i.d AS BIGINT) AS n_total,
       ROUND(i.r * 1.0 / i.d, 6) AS rate,
       CAST(SUBSTR(fin.path, CAST(i.t AS INT), 1) AS INT) AS burst
FROM idx i CROSS JOIN fin
""",
    doc=f"KLEINBERG BURST DETECTION (Kleinberg 2002, 'Bursty and "
        f"Hierarchical Structure in Streams' — the 2-state batch "
        f"automaton): days emit '{KB_TARGET}' counts r_t of d_t "
        f"events; the base state emits at the corpus rate p0, the "
        f"burst state at p1 = {KB_S}*p0; entering the burst state "
        f"costs gamma*ln T and the VITERBI minimum-cost state path "
        f"labels each day burst/quiet — the principled alternative "
        f"to threshold alerts (CUSUM/Page-Hinkley detect ONE shift; "
        f"Kleinberg segments ARBITRARY burst episodes). The DP is an "
        f"ordered fold: Spark runs it as the ``aggregate`` HOF over "
        f"the sorted day array carrying (cost0, cost1, path0, path1) "
        f"— pure JVM expressions, the events_value_ewma pattern with "
        f"a 4-field Viterbi state — and DuckDB replays the IDENTICAL "
        f"sequential recursion as a recursive CTE, so the burst "
        f"labels are hash-certified. Scale: the daily rollup is the "
        f"only data-sized aggregate; the fold is O(days) on the "
        f"calendar-bounded spine (a year of days folds in "
        f"microseconds; per-key burst detection would partition the "
        f"same fold by key).",
    tags=("time", "drift", "hof", "aggregate"),
)
def kleinberg_burst_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.sum(
            F.when(F.col("event_type") == KB_TARGET, 1).otherwise(0)
        ).alias("r"),
        F.count(F.lit(1)).alias("d"),
    )
    one = daily.agg(
        F.sort_array(F.collect_list(F.struct("day", "r", "d"))).alias("seq"),
        (F.sum("r") * 1.0 / F.sum("d")).alias("pp0"),
        F.least(
            F.lit(KB_S) * F.sum("r") / F.sum("d"), F.lit(0.9999)
        ).alias("pp1"),
        (F.lit(KB_GAMMA) * F.log(F.count(F.lit(1)).cast("double"))).alias(
            "glt"
        ),
    )

    def step(acc, e):
        r = e["r"].cast("double")
        d = e["d"].cast("double")
        cost0 = -(r * F.log(F.col("pp0")) + (d - r) * F.log(1 - F.col("pp0")))
        cost1 = -(r * F.log(F.col("pp1")) + (d - r) * F.log(1 - F.col("pp1")))
        c0, c1 = acc["c0"], acc["c1"]
        return F.struct(
            (F.least(c0, c1) + cost0).alias("c0"),
            (F.least(c0 + F.col("glt"), c1) + cost1).alias("c1"),
            F.concat(
                F.when(c0 <= c1, acc["p0"]).otherwise(acc["p1"]), F.lit("0")
            ).alias("p0"),
            F.concat(
                F.when(c0 + F.col("glt") < c1, acc["p0"]).otherwise(
                    acc["p1"]
                ),
                F.lit("1"),
            ).alias("p1"),
        )

    init = F.struct(
        F.lit(0.0).alias("c0"),
        F.lit(_KB_INF).alias("c1"),
        F.lit("").alias("p0"),
        F.lit("").alias("p1"),
    )
    folded = one.select(
        "seq",
        F.aggregate(F.col("seq"), init, step).alias("st"),
    ).select(
        "seq",
        F.when(F.col("st.c0") <= F.col("st.c1"), F.col("st.p0"))
        .otherwise(F.col("st.p1"))
        .alias("path"),
    )
    zipped = folded.select(
        F.explode(
            F.arrays_zip(
                F.col("seq"),
                F.split(F.col("path"), "").alias("burst"),
            )
        ).alias("z")
    )
    return zipped.select(
        F.date_format(F.col("z.seq.day"), "yyyy-MM-dd").alias("day"),
        F.col("z.seq.r").cast("long").alias("n_target"),
        F.col("z.seq.d").cast("long").alias("n_total"),
        F.round(F.col("z.seq.r") * 1.0 / F.col("z.seq.d"), 6).alias("rate"),
        F.col("z.burst").cast("int").alias("burst"),
    )


# ---------------------------------------------------------------------------
# Quantile-forecast pinball evaluation (seasonal-naive quantile baseline)
# ---------------------------------------------------------------------------

QFP_TEST_DAYS = 7  # holdout horizon
QFP_QUANTILES = (0.5, 0.9)


@register(
    "quantile_forecast_pinball",
    oracle=f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2))
              AS DOUBLE) AS y,
         DAYOFWEEK(CAST(o_orderdate AS DATE)) AS dow
  FROM orders GROUP BY 1
),
cutoff AS (
  SELECT MAX(day) - INTERVAL {QFP_TEST_DAYS} DAY AS cut FROM daily
),
train AS (SELECT * FROM daily CROSS JOIN cutoff WHERE day <= cut),
test AS (SELECT * FROM daily CROSS JOIN cutoff WHERE day > cut),
fc AS (
  SELECT dow, 0.5 AS q, QUANTILE_CONT(y, 0.5) AS yhat
  FROM train GROUP BY dow
  UNION ALL
  SELECT dow, 0.9, QUANTILE_CONT(y, 0.9) FROM train GROUP BY dow
),
scored AS (
  SELECT fc.q,
         CASE WHEN t.y >= fc.yhat THEN fc.q * (t.y - fc.yhat)
              ELSE (fc.q - 1) * (t.y - fc.yhat) END AS pinball,
         CASE WHEN t.y <= fc.yhat THEN 1 ELSE 0 END AS covered
  FROM test t JOIN fc ON fc.dow = t.dow AND TRUE
)
SELECT q AS quantile,
       CAST(COUNT(*) AS BIGINT) AS n_test_days,
       ROUND(AVG(pinball), 4) AS mean_pinball_loss,
       ROUND(AVG(CAST(covered AS DOUBLE)), 6) AS empirical_coverage
FROM scored GROUP BY q
""",
    doc=f"QUANTILE-FORECAST EVALUATION with PINBALL loss — the "
        f"scoring rule that makes quantile forecasts honest (MASE "
        f"scores the point forecast; pinball L_q = max(q(y-yhat), "
        f"(q-1)(y-yhat)) is MINIMIZED in expectation exactly by the "
        f"true q-quantile, so systematic over/under-forecasting "
        f"shows up as loss): a seasonal-naive quantile baseline "
        f"(per-weekday exact interpolated q-quantile of the training "
        f"days) is scored on the last {QFP_TEST_DAYS} held-out days "
        f"at q={QFP_QUANTILES}, with empirical coverage beside the "
        f"loss (a good q=0.9 forecast covers ~90% of test days). "
        f"Exact DECIMAL daily sums; Spark percentile() and DuckDB "
        f"quantile_cont share linear-interpolation semantics "
        f"(the funnel_latency precedent). Scale: one daily rollup, "
        f"7-row-bounded quantile groups, O(days) everything else.",
    tags=("time", "evaluation", "learn", "aggregate"),
)
def quantile_forecast_pinball(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir, "orders")["orders"]
    daily = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("decimal(38,2)")
        .cast("double")
        .alias("y")
    ).withColumn("dow", F.dayofweek("day")).localCheckpoint(eager=True)
    cutoff = daily.agg(
        F.date_sub(F.max("day"), QFP_TEST_DAYS).alias("cut")
    )
    train = daily.crossJoin(F.broadcast(cutoff)).where(
        F.col("day") <= F.col("cut")
    )
    test = daily.crossJoin(F.broadcast(cutoff)).where(
        F.col("day") > F.col("cut")
    )
    fcs = [
        train.groupBy("dow").agg(
            F.lit(q).alias("q"),
            F.expr(f"percentile(y, {q})").alias("yhat"),
        )
        for q in QFP_QUANTILES
    ]
    fc = fcs[0].unionByName(fcs[1])
    scored = test.join(F.broadcast(fc), "dow").select(
        "q",
        F.when(
            F.col("y") >= F.col("yhat"),
            F.col("q") * (F.col("y") - F.col("yhat")),
        )
        .otherwise((F.col("q") - 1) * (F.col("y") - F.col("yhat")))
        .alias("pinball"),
        F.when(F.col("y") <= F.col("yhat"), 1).otherwise(0).alias("covered"),
    )
    return scored.groupBy(F.col("q").alias("quantile")).agg(
        F.count(F.lit(1)).cast("long").alias("n_test_days"),
        F.round(F.avg("pinball"), 4).alias("mean_pinball_loss"),
        F.round(F.avg(F.col("covered").cast("double")), 6).alias(
            "empirical_coverage"
        ),
    )


# ---------------------------------------------------------------------------
# Periodogram (DFT power over candidate periods — seasonality detection)
# ---------------------------------------------------------------------------

PGRAM_PERIODS = tuple(range(2, 15))  # candidate periods in days


@register(
    "periodogram_daily_revenue",
    oracle=f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2))
              AS DOUBLE) AS x
  FROM orders GROUP BY 1
),
idx AS (
  SELECT x, ROW_NUMBER() OVER (ORDER BY day) - 1 AS t,
         COUNT(*) OVER () AS n, AVG(x) OVER () AS mu
  FROM daily
),
grid AS (SELECT UNNEST({list(PGRAM_PERIODS)!r}) AS period),
terms AS (
  SELECT g.period,
         SUM((i.x - i.mu) * COS(2 * PI() * i.t / g.period)) AS re,
         SUM((i.x - i.mu) * SIN(2 * PI() * i.t / g.period)) AS im,
         MAX(i.n) AS n
  FROM grid g CROSS JOIN idx i
  GROUP BY g.period
),
power AS (
  SELECT period, (re * re + im * im) / n AS pwr FROM terms
),
tot AS (SELECT SUM(pwr) AS tp, MAX(pwr) AS mx FROM power)
SELECT CAST(period AS BIGINT) AS period_days,
       -- log-scale the raw power: pwr is O(1e13) where one cross-build
       -- ulp exceeds a 2 dp ROUND grain (the r7 vopt failure mode);
       -- log10 compresses it to O(10) where 4 dp is ~1e11 ulps of slack
       ROUND(LOG10(pwr), 4) AS log10_power,
       ROUND(pwr / tp, 6) AS power_share,
       pwr = mx AS dominant
FROM power CROSS JOIN tot
""",
    doc=f"PERIODOGRAM over daily revenue — seasonality DETECTION "
        f"where acf_daily_counts measures one lag at a time: the "
        f"demeaned series' DFT power |sum x_t e^(-2 pi i t / P)|^2/n "
        f"is evaluated at candidate periods {PGRAM_PERIODS[0]}-"
        f"{PGRAM_PERIODS[-1]} days as EXPLICIT cos/sin sums — no FFT "
        f"library on either engine, the transform IS two aggregates "
        f"per period — and the dominant period is flagged (weekly "
        f"data peaks at 7). This is the test that should precede "
        f"every seasonal_decompose_weekday-style hardcoded period. "
        f"Scale: the day spine is calendar-bounded, the period grid "
        f"is a {len(PGRAM_PERIODS)}-row broadcast, so the whole "
        f"transform is O(days x periods) after one data-sized "
        f"grouped aggregate. Raw DFT power is O(1e13) where one "
        f"cross-build ulp exceeds any fixed ROUND grain, so the "
        f"report carries log10(power) at 4 dp and the O(1) power "
        f"share at 6 dp — both orders of magnitude inside the "
        f"9-significant-digit hash-stability budget "
        f"(tools/env_sensitivity_audit.py).",
    tags=("time", "statistics", "aggregate"),
)
def periodogram_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = load_tables(spark, sf_dir, "orders")["orders"]
    daily = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("decimal(38,2)")
        .cast("double")
        .alias("x")
    )
    w = Window.orderBy("day")
    wall = Window.partitionBy()
    idx = daily.select(
        "x",
        (F.row_number().over(w) - 1).alias("t"),
        F.count(F.lit(1)).over(wall).alias("n"),
        F.avg("x").over(wall).alias("mu"),
    ).localCheckpoint(eager=True)
    grid = spark.createDataFrame(
        [(p,) for p in PGRAM_PERIODS], "period int"
    )
    two_pi = 2 * 3.141592653589793
    terms = (
        F.broadcast(grid)
        .crossJoin(idx)
        .groupBy("period")
        .agg(
            F.sum(
                (F.col("x") - F.col("mu"))
                * F.cos(F.lit(two_pi) * F.col("t") / F.col("period"))
            ).alias("re"),
            F.sum(
                (F.col("x") - F.col("mu"))
                * F.sin(F.lit(two_pi) * F.col("t") / F.col("period"))
            ).alias("im"),
            F.max("n").alias("n"),
        )
    )
    power = terms.select(
        "period",
        (
            (F.col("re") * F.col("re") + F.col("im") * F.col("im"))
            / F.col("n")
        ).alias("pwr"),
    )
    tot = power.agg(F.sum("pwr").alias("tp"), F.max("pwr").alias("mx"))
    return power.crossJoin(F.broadcast(tot)).select(
        F.col("period").cast("long").alias("period_days"),
        F.round(F.log10("pwr"), 4).alias("log10_power"),
        F.round(F.col("pwr") / F.col("tp"), 6).alias("power_share"),
        (F.col("pwr") == F.col("mx")).alias("dominant"),
    )


# ---------------------------------------------------------------------------
# Log-rank test (two-group survival comparison)
# ---------------------------------------------------------------------------

LR_CHI2_CRIT = 3.841459  # 5% chi-squared critical value, df=1


@register(
    "logrank_test_purchasers",
    oracle=f"""
WITH ev AS (
  SELECT user_id, DATE_TRUNC('day', ts) AS day, event_type FROM events
),
w AS (SELECT MAX(day) AS wmax FROM ev),
u AS (
  SELECT user_id,
         DATE_DIFF('day', MIN(day), MAX(day)) AS t,
         MAX(day) >= (SELECT wmax FROM w)
                     - INTERVAL {KM_CENSOR_TAIL_DAYS} DAY AS censored,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS grp
  FROM ev GROUP BY user_id
),
byt AS (
  SELECT t,
         SUM(CASE WHEN grp = 1 AND NOT censored THEN 1 ELSE 0 END) AS d1,
         SUM(CASE WHEN grp = 0 AND NOT censored THEN 1 ELSE 0 END) AS d0,
         SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS a1,
         SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS a0
  FROM u GROUP BY t
),
risk AS (
  SELECT t, d1, d0,
         SUM(a1) OVER (ORDER BY t DESC) AS n1,
         SUM(a0) OVER (ORDER BY t DESC) AS n0
  FROM byt
),
terms AS (
  SELECT SUM(d1) AS o1,
         SUM(CAST(d1 + d0 AS DOUBLE) * n1 / (n1 + n0)) AS e1,
         SUM(CASE WHEN n1 + n0 > 1 THEN
               CAST(d1 + d0 AS DOUBLE) * n1 * n0
                 * (n1 + n0 - d1 - d0)
                 / (CAST(n1 + n0 AS DOUBLE) * (n1 + n0) * (n1 + n0 - 1))
             ELSE 0 END) AS v
  FROM risk WHERE d1 + d0 > 0
),
grps AS (
  SELECT SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS ng1,
         SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS ng0
  FROM u
)
SELECT CAST(ng1 AS BIGINT) AS n_purchasers,
       CAST(ng0 AS BIGINT) AS n_non_purchasers,
       CAST(o1 AS BIGINT) AS observed_events_g1,
       ROUND(e1, 4) AS expected_events_g1,
       CASE WHEN v > 0 THEN ROUND(POW(o1 - e1, 2) / v, 6) END
         AS logrank_chi2,
       COALESCE(POW(o1 - e1, 2) / NULLIF(v, 0) > {LR_CHI2_CRIT}, FALSE)
         AS reject_equal_survival
FROM terms CROSS JOIN grps
""",
    doc="LOG-RANK TEST between purchasers and non-purchasers — the "
        "significance test kaplan_meier_survival needs (KM draws two "
        "curves; log-rank decides whether they differ): at each "
        "event time, observed group-1 deaths vs the hypergeometric "
        "expectation d * n1/n, variance-weighted into the df=1 "
        "chi-squared. Lifetime and censoring follow the exact "
        "KM definitions (last activity inside the censor tail = "
        "censored), and the risk sets are reverse cumulative sums "
        "over the CALENDAR-BOUNDED lifetime spine — same shape, one "
        "extra group dimension. Every count is integer-exact; the "
        "only floats are the final expectation/variance divisions.",
    tags=("statistics", "time", "retention", "aggregate", "window"),
)
def logrank_test_purchasers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_tables(spark, sf_dir, "events")["events"]
    e = ev.select(
        "user_id",
        F.date_trunc("day", "ts").alias("day"),
        "event_type",
    )
    wmax = e.agg(F.max("day").alias("wmax"))
    u = (
        e.groupBy("user_id")
        .agg(
            F.datediff(F.max("day"), F.min("day")).alias("t"),
            F.max("day").alias("last_day"),
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("grp"),
        )
        .crossJoin(F.broadcast(wmax))
        .select(
            "t",
            "grp",
            (
                F.col("last_day")
                >= F.col("wmax") - F.expr(f"INTERVAL {KM_CENSOR_TAIL_DAYS} DAY")
            ).alias("censored"),
        )
    ).localCheckpoint(eager=True)
    byt = u.groupBy("t").agg(
        F.sum(
            F.when((F.col("grp") == 1) & ~F.col("censored"), 1).otherwise(0)
        ).alias("d1"),
        F.sum(
            F.when((F.col("grp") == 0) & ~F.col("censored"), 1).otherwise(0)
        ).alias("d0"),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0)).alias("a1"),
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0)).alias("a0"),
    )
    wrev = Window.orderBy(F.col("t").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    risk = byt.select(
        "t",
        "d1",
        "d0",
        F.sum("a1").over(wrev).alias("n1"),
        F.sum("a0").over(wrev).alias("n0"),
    )
    d = F.col("d1") + F.col("d0")
    n = F.col("n1") + F.col("n0")
    terms = risk.where(d > 0).agg(
        F.sum("d1").alias("o1"),
        F.sum(d.cast("double") * F.col("n1") / n).alias("e1"),
        F.sum(
            F.when(
                n > 1,
                d.cast("double")
                * F.col("n1")
                * F.col("n0")
                * (n - d)
                / (n.cast("double") * n * (n - 1)),
            ).otherwise(0.0)
        ).alias("v"),
    )
    grps = u.agg(
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0)).alias("ng1"),
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0)).alias("ng0"),
    )
    # degenerate designs (a one-sided risk set at every event time,
    # e.g. every user in one group) have v == 0: report NULL chi2 and
    # a FALSE rejection instead of a division error
    chi2 = F.pow(F.col("o1") - F.col("e1"), 2) / F.nullif(
        F.col("v"), F.lit(0.0)
    )
    return terms.crossJoin(F.broadcast(grps)).select(
        F.col("ng1").cast("long").alias("n_purchasers"),
        F.col("ng0").cast("long").alias("n_non_purchasers"),
        F.col("o1").cast("long").alias("observed_events_g1"),
        F.round("e1", 4).alias("expected_events_g1"),
        F.when(F.col("v") > 0, F.round(chi2, 6)).alias("logrank_chi2"),
        F.coalesce(chi2 > LR_CHI2_CRIT, F.lit(False)).alias(
            "reject_equal_survival"
        ),
    )


# ---------------------------------------------------------------------------
# Nelson-Aalen cumulative hazard (companion to Kaplan-Meier)
# ---------------------------------------------------------------------------


@register(
    "nelson_aalen_hazard",
    oracle="""
WITH ev AS (
  SELECT user_id, DATE_TRUNC('day', ts) AS day FROM events
),
w AS (SELECT MAX(day) AS wmax FROM ev),
u AS (
  SELECT user_id,
         DATE_DIFF('day', MIN(day), MAX(day)) AS t,
         MAX(day) >= (SELECT wmax FROM w)
                     - INTERVAL 3 DAY AS censored
  FROM ev GROUP BY user_id
),
byt AS (
  SELECT t,
         SUM(CASE WHEN censored THEN 0 ELSE 1 END) AS d,
         SUM(CASE WHEN censored THEN 1 ELSE 0 END) AS c
  FROM u GROUP BY t
),
risk AS (
  SELECT t, d, c,
         SUM(d + c) OVER (ORDER BY t DESC) AS n_risk
  FROM byt
),
na AS (
  SELECT t, d, c, n_risk,
         SUM(d * 1.0 / n_risk) OVER (ORDER BY t) AS h,
         SUM(d * 1.0 / (n_risk * CAST(n_risk AS DOUBLE)))
           OVER (ORDER BY t) AS var_h
  FROM risk
)
SELECT CAST(t AS BIGINT) AS lifetime_days,
       CAST(n_risk AS BIGINT) AS n_risk,
       CAST(d AS BIGINT) AS n_deaths,
       ROUND(h, 6) AS cum_hazard,
       ROUND(EXP(-h), 6) AS survival_fleming_harrington,
       ROUND(var_h, 8) AS hazard_variance
FROM na
""",
    doc="NELSON-AALEN cumulative hazard — the estimator survival "
        "analysis pairs with Kaplan-Meier (same lifetimes, same "
        "censoring rule, SAME risk-set spine): H(t) = sum d_i/n_i "
        "with its variance sum d_i/n_i^2, plus the Fleming-"
        "Harrington survival exp(-H) that beats the KM product at "
        "small risk sets. Hazard increments are exact-count "
        "rationals; the cumulative windows run over the O(distinct "
        "lifetimes) rollup in lifetime order on both engines "
        "(kaplan_meier precedent). Reading H(t)'s slope IS the "
        "hazard-rate trend — the churn-acceleration readout "
        "retention curves hide.",
    tags=("time", "retention", "statistics", "window"),
)
def nelson_aalen_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_tables(spark, sf_dir, "events")["events"]
    days = ev.select("user_id", F.date_trunc("day", "ts").alias("day"))
    wmax = days.agg(F.max("day").alias("wmax"))
    u = (
        days.groupBy("user_id")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .crossJoin(F.broadcast(wmax))
        .select(
            F.datediff("d1", "d0").alias("t"),
            (
                F.col("d1")
                >= F.col("wmax") - F.expr("INTERVAL 3 DAY")
            ).alias("censored"),
        )
    )
    byt = u.groupBy("t").agg(
        F.sum(F.when(F.col("censored"), 0).otherwise(1)).alias("d"),
        F.sum(F.when(F.col("censored"), 1).otherwise(0)).alias("c"),
    )
    wd = Window.orderBy(F.desc("t")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = byt.select(
        "t", "d", "c", F.sum(F.col("d") + F.col("c")).over(wd).alias("n_risk")
    )
    wa = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    na = risk.select(
        "t",
        "d",
        "n_risk",
        F.sum(F.col("d") * 1.0 / F.col("n_risk")).over(wa).alias("h"),
        F.sum(
            F.col("d") * 1.0 / (F.col("n_risk") * F.col("n_risk").cast("double"))
        )
        .over(wa)
        .alias("var_h"),
    )
    return na.select(
        F.col("t").cast("long").alias("lifetime_days"),
        F.col("n_risk").cast("long").alias("n_risk"),
        F.col("d").cast("long").alias("n_deaths"),
        F.round("h", 6).alias("cum_hazard"),
        F.round(F.exp(-F.col("h")), 6).alias(
            "survival_fleming_harrington"
        ),
        F.round("var_h", 8).alias("hazard_variance"),
    )
