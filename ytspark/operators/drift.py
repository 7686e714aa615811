"""Distribution-drift detection — binned KS and PSI.

The monitoring layer every training-data pipeline needs: did the
feature/value distribution shift between two cohorts (early vs late
data, train vs serve, yesterday vs today)? Two standard statistics
over ONE shared binned-histogram pass:

- **Two-sample Kolmogorov-Smirnov** (binned): max ECDF gap between
  the cohorts, with the asymptotic alpha=0.05 critical value
  1.358*sqrt((n1+n2)/(n1*n2)).
- **Population Stability Index**: sum over bins of
  (p_late - p_early) * ln(p_late / p_early), additively smoothed so
  empty-on-one-side bins stay finite (industry rule of thumb:
  PSI > 0.2 = significant shift).

Spark-first scale shape: the EXACT KS statistic needs a global sort
(one partition — the WindowExec warning at any size); the BINNED
variant replaces it with a (cohort, bin) aggregate + a per-group
window over <= B rows, so at 100 TB the whole computation is two
shuffles keyed on (event_type, bucket) and nothing ever concentrates.
Binning underestimates the sup by at most the probability mass of the
heaviest bin (the ECDF gap at an interior point differs from the gap
at the bin boundary by at most that bin's mass in each cohort) — a
DATA-DEPENDENT bound, not 1/B, since equi-width bins concentrate on
skewed values; the query therefore reports the realized bound as
``max_bin_share`` so every run carries its own error certificate,
and the test suite checks |KS_exact - KS_binned| <= max_bin_share.

Cross-engine determinism: bucket assignment is the exactly-rounded
IEEE expression chain the histogram query pioneered (sub, div, mul,
floor — identical on both engines), ECDF shares are integer/integer
divisions, and the KS max is over identical double sets. Only PSI's
ln() is a libm call (correctly rounded to ~1 ulp, not exactly); the
6 dp rounding absorbs it, same policy as the Zipf/entropy queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ytspark.queries import register
from ytspark.session import load_tables

KS_BINS = 512  # ECDF resolution: KS error <= 1/KS_BINS
KS_CRIT = 1.358  # asymptotic alpha=0.05 coefficient
PSI_SMOOTH = 0.5  # additive smoothing pseudo-count per (cohort, bin)

_DRIFT_ORACLE = f"""
WITH mid AS (
  SELECT MIN(epoch_us(ts))
         + (MAX(epoch_us(ts)) - MIN(epoch_us(ts))) // 2 AS mid
  FROM events
),
vb AS (
  SELECT event_type, MIN(value) AS lo, MAX(value) AS hi
  FROM events GROUP BY event_type
),
tagged AS (
  SELECT e.event_type,
         CASE WHEN epoch_us(e.ts) < m.mid THEN 0 ELSE 1 END AS half,
         CASE WHEN v.hi = v.lo THEN 0
              ELSE LEAST(CAST(FLOOR((e.value - v.lo) / (v.hi - v.lo)
                                    * {KS_BINS}) AS BIGINT),
                         {KS_BINS - 1}) END AS bucket
  FROM events e CROSS JOIN mid m
  JOIN vb v ON e.event_type = v.event_type
),
g AS (
  SELECT event_type, bucket,
         SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS c0,
         SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS c1
  FROM tagged GROUP BY 1, 2
),
c AS (
  SELECT event_type, bucket, c0, c1,
         SUM(c0) OVER (PARTITION BY event_type ORDER BY bucket) AS cum0,
         SUM(c1) OVER (PARTITION BY event_type ORDER BY bucket) AS cum1,
         SUM(c0) OVER (PARTITION BY event_type) AS t0,
         SUM(c1) OVER (PARTITION BY event_type) AS t1
  FROM g
),
s AS (
  SELECT event_type,
         MAX(t0) AS n_early, MAX(t1) AS n_late,
         MAX(ABS(CAST(cum0 AS DOUBLE) / t0
                 - CAST(cum1 AS DOUBLE) / t1)) AS ks_raw,
         MAX(CAST(c0 AS DOUBLE) / t0 + CAST(c1 AS DOUBLE) / t1)
           AS max_bin_share,
         SUM((CAST(c1 + {PSI_SMOOTH} AS DOUBLE)
                / (t1 + {PSI_SMOOTH} * {KS_BINS})
              - CAST(c0 + {PSI_SMOOTH} AS DOUBLE)
                / (t0 + {PSI_SMOOTH} * {KS_BINS}))
             * LN((CAST(c1 + {PSI_SMOOTH} AS DOUBLE)
                     / (t1 + {PSI_SMOOTH} * {KS_BINS}))
                  / (CAST(c0 + {PSI_SMOOTH} AS DOUBLE)
                       / (t0 + {PSI_SMOOTH} * {KS_BINS})))) AS psi_raw
  FROM c GROUP BY event_type
)
SELECT event_type,
       CAST(n_early AS BIGINT) AS n_early,
       CAST(n_late AS BIGINT) AS n_late,
       ROUND(ks_raw, 6) AS ks_stat,
       ROUND({KS_CRIT} * SQRT(CAST(n_early + n_late AS DOUBLE)
                              / (n_early * n_late)), 6) AS crit_05,
       ks_raw > {KS_CRIT} * SQRT(CAST(n_early + n_late AS DOUBLE)
                                 / (n_early * n_late)) AS drift,
       ROUND(psi_raw, 6) AS psi,
       ROUND(max_bin_share, 6) AS max_bin_share
FROM s
"""


@register(
    "ks_psi_drift_events",
    oracle=_DRIFT_ORACLE,
    doc="Distribution-drift monitor per event type: two-sample "
        "Kolmogorov-Smirnov (binned ECDF, B=512) + Population "
        "Stability Index between the early and late halves of the "
        "event stream (split at the midpoint timestamp, integer "
        "microsecond arithmetic). The binned formulation is the "
        "100 TB shape: the exact KS needs a one-partition global "
        "sort, the binned one is two aggregates keyed on (event_type, "
        "bucket) plus a per-group window over <= B rows — nothing "
        "concentrates; the binning error is bounded by the heaviest "
        "bin's probability mass, which the query reports per group "
        "as max_bin_share — every run carries its own error "
        "certificate beside the alpha=0.05 critical value. Bucket "
        "assignment reuses the histogram query's exactly-rounded IEEE "
        "expression chain; ECDF shares are int/int divisions; PSI is "
        "additively smoothed so one-sided bins stay finite, and its "
        "ln() libm drift is absorbed by 6 dp rounding (the Zipf/"
        "entropy policy). DuckDB replays the identical pipeline.",
    tags=("drift", "statistics", "quality", "aggregate", "window"),
)
def ks_psi_drift_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    mid = ev.agg(
        (
            F.min(F.unix_micros("ts"))
            + F.expr(
                "(MAX(unix_micros(ts)) - MIN(unix_micros(ts))) div 2"
            )
        ).alias("mid")
    )
    vb = ev.groupBy("event_type").agg(
        F.min("value").alias("lo"), F.max("value").alias("hi")
    )
    b = F.lit(KS_BINS)
    tagged = (
        ev.crossJoin(F.broadcast(mid))
        .join(F.broadcast(vb), "event_type")
        .select(
            "event_type",
            F.when(F.unix_micros("ts") < F.col("mid"), 0)
            .otherwise(1)
            .alias("half"),
            F.when(F.col("hi") == F.col("lo"), F.lit(0).cast("long"))
            .otherwise(
                F.least(
                    F.floor(
                        (F.col("value") - F.col("lo"))
                        / (F.col("hi") - F.col("lo"))
                        * b
                    ),
                    F.lit(KS_BINS - 1).cast("long"),
                )
            )
            .alias("bucket"),
        )
    )
    g = tagged.groupBy("event_type", "bucket").agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).alias("c0"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).alias("c1"),
    )
    wcum = Window.partitionBy("event_type").orderBy("bucket")
    wall = Window.partitionBy("event_type")
    sm, smb = float(PSI_SMOOTH), float(PSI_SMOOTH) * KS_BINS
    c = g.select(
        "event_type",
        "c0",
        "c1",
        F.sum("c0").over(wcum).alias("cum0"),
        F.sum("c1").over(wcum).alias("cum1"),
        F.sum("c0").over(wall).alias("t0"),
        F.sum("c1").over(wall).alias("t1"),
    )
    p0 = (F.col("c0") + F.lit(sm)).cast("double") / (
        F.col("t0") + F.lit(smb)
    )
    p1 = (F.col("c1") + F.lit(sm)).cast("double") / (
        F.col("t1") + F.lit(smb)
    )
    s = c.groupBy("event_type").agg(
        F.max("t0").alias("n_early"),
        F.max("t1").alias("n_late"),
        F.max(
            F.abs(
                F.col("cum0").cast("double") / F.col("t0")
                - F.col("cum1").cast("double") / F.col("t1")
            )
        ).alias("ks_raw"),
        F.max(
            F.col("c0").cast("double") / F.col("t0")
            + F.col("c1").cast("double") / F.col("t1")
        ).alias("max_bin_share"),
        F.sum((p1 - p0) * F.log(p1 / p0)).alias("psi_raw"),
    )
    crit = F.lit(KS_CRIT) * F.sqrt(
        (F.col("n_early") + F.col("n_late")).cast("double")
        / (F.col("n_early") * F.col("n_late"))
    )
    return s.select(
        "event_type",
        F.col("n_early").cast("long").alias("n_early"),
        F.col("n_late").cast("long").alias("n_late"),
        F.round("ks_raw", 6).alias("ks_stat"),
        F.round(crit, 6).alias("crit_05"),
        (F.col("ks_raw") > crit).alias("drift"),
        F.round("psi_raw", 6).alias("psi"),
        F.round("max_bin_share", 6).alias("max_bin_share"),
    )


# ---------------------------------------------------------------------------
# Week-over-week distribution drift: Jensen-Shannon divergence series
# ---------------------------------------------------------------------------

JSD_ALERT = 0.1  # nats; flag threshold for the weekly series


@register(
    "weekly_jsd_drift",
    oracle=f"""
WITH wt AS (
  SELECT CAST(DATE_TRUNC('week', ts) AS DATE) AS wk, event_type,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
tot AS (SELECT wk, CAST(SUM(c) AS BIGINT) AS t FROM wt GROUP BY wk),
p AS (
  SELECT wt.wk, wt.event_type, CAST(wt.c AS DOUBLE) / tot.t AS p
  FROM wt JOIN tot USING (wk)
),
pairs AS (
  SELECT cur.wk, cur.event_type, cur.p AS pc, prv.p AS pp
  FROM p cur JOIN p prv
    ON prv.event_type = cur.event_type
   AND prv.wk = cur.wk - INTERVAL 7 DAY
)
SELECT STRFTIME(wk, '%Y-%m-%d') AS week,
       CAST(COUNT(*) AS BIGINT) AS n_types,
       ROUND(SUM(
         0.5 * pc * LN(pc / ((pc + pp) / 2))
         + 0.5 * pp * LN(pp / ((pc + pp) / 2))), 6) AS jsd,
       SUM(0.5 * pc * LN(pc / ((pc + pp) / 2))
           + 0.5 * pp * LN(pp / ((pc + pp) / 2))) > {JSD_ALERT}
         AS drift_alert
FROM pairs GROUP BY wk
""",
    doc="WEEK-OVER-WEEK distribution drift as a Jensen-Shannon "
        "divergence SERIES: each week's event-type distribution is "
        "compared to the previous week's (consecutive weeks aligned "
        "by an exact 7-day join on the week key — no window needed) "
        f"and weeks beyond {JSD_ALERT} nats are flagged — the "
        "time-resolved complement of the half-vs-half KS/PSI monitor: "
        "a single global test cannot say WHEN the mix shifted, the "
        "weekly series can. JSD is symmetric and bounded (<= ln 2), "
        "the right default for categorical mix monitoring; terms fold "
        "from exact count ratios with one rounding at the report "
        "edge. Types present in only one of the two weeks drop from "
        "the pair join (documented simplification — the event-type "
        "vocabulary here is closed; open vocabularies add a smoothing "
        "floor).",
    tags=("drift", "statistics", "time", "aggregate"),
)
def weekly_jsd_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    wt = ev.groupBy(
        F.date_trunc("week", "ts").cast("date").alias("wk"), "event_type"
    ).agg(F.count(F.lit(1)).alias("c"))
    tot = wt.groupBy("wk").agg(F.sum("c").alias("t"))
    p = wt.join(tot, "wk").select(
        "wk", "event_type", (F.col("c").cast("double") / F.col("t")).alias("p")
    )
    cur = p.select("wk", "event_type", F.col("p").alias("pc"))
    prv = p.select(
        F.date_add("wk", 7).alias("wk"),
        "event_type",
        F.col("p").alias("pp"),
    )
    pairs = cur.join(prv, ["wk", "event_type"])
    m = (F.col("pc") + F.col("pp")) / 2
    term = 0.5 * F.col("pc") * F.log(F.col("pc") / m) + 0.5 * F.col(
        "pp"
    ) * F.log(F.col("pp") / m)
    return pairs.groupBy(
        F.date_format("wk", "yyyy-MM-dd").alias("week")
    ).agg(
        F.count(F.lit(1)).alias("n_types"),
        F.round(F.sum(term), 6).alias("jsd"),
        (F.sum(term) > JSD_ALERT).alias("drift_alert"),
    )


# ---------------------------------------------------------------------------
# Page-Hinkley change detection over the daily mean
# ---------------------------------------------------------------------------

PH_DELTA = 0.5  # magnitude tolerance (units of event value)
PH_LAMBDA = 5.0  # alarm threshold on the PH statistic


@register(
    "page_hinkley_daily_mean",
    oracle=f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
              / COUNT(*) AS DOUBLE) AS xbar
  FROM events WHERE value IS NOT NULL GROUP BY 1
),
run AS (
  SELECT day, xbar,
         SUM(xbar) OVER (ORDER BY day) / ROW_NUMBER() OVER (ORDER BY day)
           AS rmean
  FROM daily
),
cum AS (
  SELECT day, xbar, rmean,
         SUM(xbar - rmean - {PH_DELTA}) OVER (ORDER BY day) AS ct
  FROM run
),
ph AS (
  SELECT day, xbar, ct,
         MIN(ct) OVER (ORDER BY day) AS mt
  FROM cum
)
SELECT STRFTIME(day, '%Y-%m-%d') AS day,
       ROUND(xbar, 6) AS daily_mean,
       ROUND(ct - mt, 6) AS ph_stat,
       ct - mt > {PH_LAMBDA} AS alarm
FROM ph
""",
    doc=f"PAGE-HINKLEY change detection — the sequential drift "
        f"detector beside the distributional pair (ks_psi / "
        f"weekly_jsd) and the CUSUM changepoint: over the daily mean "
        f"event value, PH_t = C_t - min_s C_s with "
        f"C_t = sum (x_i - xbar_i - delta), xbar_i the RUNNING mean "
        f"— the statistic streaming monitors maintain in O(1) state "
        f"per metric; an alarm fires when the positive excursion "
        f"exceeds lambda={PH_LAMBDA}. Daily means come from exact "
        f"DECIMAL sums (identical doubles cross-engine); the three "
        f"cumulative windows run over the CALENDAR-BOUNDED day spine "
        f"(EXPECTED_GLOBAL_WINDOW — O(days), invariant to row "
        f"count), and at 100 TB the daily rollup is the only "
        f"data-sized aggregate.",
    tags=("drift", "time", "window", "aggregate"),
)
def page_hinkley_daily_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    daily = ev.where(F.col("value").isNotNull()).groupBy(
        F.col("ts").cast("date").alias("day")
    ).agg(
        (
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        )
        .cast("double")
        .alias("xbar")
    )
    wc = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    run = daily.select(
        "day",
        "xbar",
        (F.sum("xbar").over(wc) / F.row_number().over(Window.orderBy("day")))
        .alias("rmean"),
    )
    cum = run.select(
        "day",
        "xbar",
        F.sum(F.col("xbar") - F.col("rmean") - PH_DELTA).over(wc).alias("ct"),
    )
    ph = cum.select(
        "day",
        "xbar",
        "ct",
        F.min("ct").over(wc).alias("mt"),
    )
    return ph.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.round("xbar", 6).alias("daily_mean"),
        F.round(F.col("ct") - F.col("mt"), 6).alias("ph_stat"),
        (F.col("ct") - F.col("mt") > PH_LAMBDA).alias("alarm"),
    )


# ---------------------------------------------------------------------------
# Covariate-shift importance weighting + effective sample size
# ---------------------------------------------------------------------------

CS_SPLIT_DAY = 16  # reference = days < 16, current = days >= 16
CS_BUCKETS = 20  # equal-width value buckets over [0, 500]
CS_LO, CS_HI = 0.0, 500.0


@register(
    "covariate_shift_ess",
    oracle=f"""
WITH b AS (
  SELECT CASE WHEN CAST(STRFTIME(CAST(ts AS DATE), '%d') AS INT)
              < {CS_SPLIT_DAY} THEN 'ref' ELSE 'cur' END AS win,
         LEAST(CAST(FLOOR((value - {CS_LO})
               / (({CS_HI} - {CS_LO}) / {CS_BUCKETS})) AS INT),
               {CS_BUCKETS} - 1) AS bkt
  FROM events WHERE value IS NOT NULL
),
per AS (
  SELECT bkt,
         SUM(CASE WHEN win = 'ref' THEN 1 ELSE 0 END) AS nr,
         SUM(CASE WHEN win = 'cur' THEN 1 ELSE 0 END) AS nc
  FROM b GROUP BY bkt
),
tot AS (SELECT SUM(nr) AS tr, SUM(nc) AS tc FROM per),
w AS (
  SELECT bkt, nr, nc,
         ((nc + 1.0) / (tc + {CS_BUCKETS}))
           / ((nr + 1.0) / (tr + {CS_BUCKETS})) AS wgt
  FROM per CROSS JOIN tot
),
ess AS (
  SELECT SUM(nr) AS n_ref, (SELECT tc FROM tot) AS n_cur,
         POW(SUM(nr * wgt), 2) / SUM(nr * wgt * wgt) AS ess,
         MAX(wgt) AS max_w, MIN(wgt) AS min_w
  FROM w
)
SELECT CAST(n_ref AS BIGINT) AS n_ref,
       CAST(n_cur AS BIGINT) AS n_cur,
       -- 2 dp: ess is an engine-ordered SUM of weighted doubles at
       -- ~n_ref magnitude; the coarser grain keeps the rounded value
       -- inside the 9-significant-digit hash-stability budget
       ROUND(ess, 2) AS effective_sample_size,
       ROUND(ess / n_ref, 6) AS ess_fraction,
       ROUND(max_w, 6) AS max_weight,
       ROUND(min_w, 6) AS min_weight,
       ess / n_ref < 0.5 AS severe_shift
FROM ess
""",
    doc=f"COVARIATE-SHIFT importance weighting + EFFECTIVE SAMPLE "
        f"SIZE — the reweighting feasibility check run before "
        f"training on yesterday's data to serve today's "
        f"distribution: density ratio w(b) = p_cur(b)/p_ref(b) on "
        f"{CS_BUCKETS} fixed value buckets (add-1 smoothed — the "
        f"DSIR estimator on the numeric axis), then Kish ESS = "
        f"(sum n_b w_b)^2 / sum n_b w_b^2 over the reference rows. "
        f"ESS/n < 0.5 means reweighting throws away over half the "
        f"sample — retrain, don't reweight (severe_shift verdict). "
        f"Complements the DETECTORS (KS/PSI/JSD/Page-Hinkley) with "
        f"the remediation-cost number. One scan into a {CS_BUCKETS}-"
        f"bucket aggregate; everything downstream is O(buckets).",
    tags=("drift", "learn", "aggregate"),
)
def covariate_shift_ess(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    width = (CS_HI - CS_LO) / CS_BUCKETS
    b = ev.where(F.col("value").isNotNull()).select(
        F.when(F.dayofmonth(F.col("ts").cast("date")) < CS_SPLIT_DAY, "ref")
        .otherwise("cur")
        .alias("win"),
        F.least(
            F.floor((F.col("value") - CS_LO) / width).cast("int"),
            F.lit(CS_BUCKETS - 1),
        ).alias("bkt"),
    )
    per = b.groupBy("bkt").agg(
        F.sum(F.when(F.col("win") == "ref", 1).otherwise(0)).alias("nr"),
        F.sum(F.when(F.col("win") == "cur", 1).otherwise(0)).alias("nc"),
    )
    tot = per.agg(F.sum("nr").alias("tr"), F.sum("nc").alias("tc"))
    w = per.crossJoin(F.broadcast(tot)).select(
        "nr",
        "nc",
        "tc",
        (
            ((F.col("nc") + 1.0) / (F.col("tc") + CS_BUCKETS))
            / ((F.col("nr") + 1.0) / (F.col("tr") + CS_BUCKETS))
        ).alias("wgt"),
    )
    ess = w.agg(
        F.sum("nr").alias("n_ref"),
        F.max("tc").alias("n_cur"),
        (
            F.pow(F.sum(F.col("nr") * F.col("wgt")), 2)
            / F.sum(F.col("nr") * F.col("wgt") * F.col("wgt"))
        ).alias("ess"),
        F.max("wgt").alias("max_w"),
        F.min("wgt").alias("min_w"),
    )
    return ess.select(
        F.col("n_ref").cast("long").alias("n_ref"),
        F.col("n_cur").cast("long").alias("n_cur"),
        F.round("ess", 2).alias("effective_sample_size"),
        F.round(F.col("ess") / F.col("n_ref"), 6).alias("ess_fraction"),
        F.round("max_w", 6).alias("max_weight"),
        F.round("min_w", 6).alias("min_weight"),
        (F.col("ess") / F.col("n_ref") < 0.5).alias("severe_shift"),
    )


# ---------------------------------------------------------------------------
# X-bar control chart (Shewhart SPC over daily means)
# ---------------------------------------------------------------------------

XBAR_BASELINE_DAYS = 14  # control limits estimated from the first 2 weeks
XBAR_SIGMAS = 3.0


@register(
    "xbar_control_chart",
    oracle=f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
              / COUNT(*) AS DOUBLE) AS xbar,
         COUNT(*) AS n
  FROM events WHERE value IS NOT NULL GROUP BY 1
),
base AS (
  SELECT AVG(xbar) AS center,
         SQRT(SUM(xbar * xbar) / COUNT(*) - AVG(xbar) * AVG(xbar))
           AS sigma
  FROM (
    SELECT xbar, ROW_NUMBER() OVER (ORDER BY day) AS t FROM daily
  ) WHERE t <= {XBAR_BASELINE_DAYS}
)
SELECT STRFTIME(day, '%Y-%m-%d') AS day,
       CAST(n AS BIGINT) AS n_obs,
       ROUND(xbar, 6) AS daily_mean,
       ROUND(center, 6) AS center_line,
       ROUND(center - {XBAR_SIGMAS} * sigma, 6) AS lcl,
       ROUND(center + {XBAR_SIGMAS} * sigma, 6) AS ucl,
       xbar < center - {XBAR_SIGMAS} * sigma
         OR xbar > center + {XBAR_SIGMAS} * sigma AS out_of_control
FROM daily CROSS JOIN base
""",
    doc=f"X-BAR CONTROL CHART (Shewhart SPC) over the daily mean "
        f"event value: the center line and +/-{XBAR_SIGMAS}-sigma "
        f"control limits are FROZEN from the first "
        f"{XBAR_BASELINE_DAYS}-day baseline window (the SPC "
        f"phase-I/phase-II discipline — limits estimated from "
        f"in-control history, then every day judged against them), "
        f"and each day is flagged out-of-control. Completes the "
        f"monitoring spectrum: Shewhart catches LARGE sudden shifts "
        f"immediately, CUSUM/Page-Hinkley accumulate small drifts, "
        f"Kleinberg segments episodes. Exact DECIMAL daily sums; "
        f"the baseline rank runs over the calendar-bounded spine "
        f"(EXPECTED_GLOBAL_WINDOW); one data-sized aggregate total.",
    tags=("drift", "time", "quality", "aggregate"),
)
def xbar_control_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    daily = ev.where(F.col("value").isNotNull()).groupBy(
        F.col("ts").cast("date").alias("day")
    ).agg(
        (
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        )
        .cast("double")
        .alias("xbar"),
        F.count(F.lit(1)).alias("n"),
    ).localCheckpoint(eager=True)
    ranked = daily.select(
        "xbar", F.row_number().over(Window.orderBy("day")).alias("t")
    ).where(F.col("t") <= XBAR_BASELINE_DAYS)
    base = ranked.agg(
        F.avg("xbar").alias("center"),
        F.sqrt(
            F.sum(F.col("xbar") * F.col("xbar")) / F.count(F.lit(1))
            - F.avg("xbar") * F.avg("xbar")
        ).alias("sigma"),
    )
    lcl = F.col("center") - XBAR_SIGMAS * F.col("sigma")
    ucl = F.col("center") + XBAR_SIGMAS * F.col("sigma")
    return daily.crossJoin(F.broadcast(base)).select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("n").cast("long").alias("n_obs"),
        F.round("xbar", 6).alias("daily_mean"),
        F.round("center", 6).alias("center_line"),
        F.round(lcl, 6).alias("lcl"),
        F.round(ucl, 6).alias("ucl"),
        ((F.col("xbar") < lcl) | (F.col("xbar") > ucl)).alias(
            "out_of_control"
        ),
    )
