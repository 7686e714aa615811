"""Sketch operators: approximate distinct counts (HyperLogLog) and
approximate quantiles (Greenwald-Khanna), with re-aggregatable
(mergeable) rollups and cross-engine-certified error bounds.

At 100 TB, COUNT(DISTINCT) and exact percentiles are the two
aggregates whose memory is unbounded in the naive plan: distinct needs
a shuffle of every key, percentiles a sort of every value. Sketches
replace both with constant-size mergeable state — and mergeability is
the actual scale feature: a per-partition/per-day sketch table can be
rolled up to ANY grouping later without rescanning the raw data
(register-max for HLL, summary-merge for GK), which is how a
1000-executor cluster serves distinct-count dashboards over historical
parquet.

Certification strategy: a sketch estimate has no cross-engine twin
(DuckDB's HLL is a different implementation), but its ERROR BOUND is a
theorem, not an implementation detail. Each query therefore emits the
exact answer (hash-checkable) plus a boolean "estimate within bound";
the oracle recomputes the exact answer and emits literal TRUE. Both
sketches are merge-order independent (HLL state merges by per-register
max; GK merge preserves the rank-error invariant), so the booleans are
deterministic under any partitioning and the driver's value-hash gate
certifies, on every run, both the exact semantics and that the sketch
kept its contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ytspark.plans.scale import finish
from ytspark.queries import register
from ytspark.session import load_tables

HLL_RSD = 0.05  # relative standard deviation for approx_count_distinct
# acceptance bound: 4 sigma. P(|err| > 4*rsd) ~ 6e-5 per group under
# the HLL normal approximation; the gate runs a handful of groups, and
# the boolean is deterministic for a FIXED dataset anyway — the margin
# only needs to absorb estimator bias, not randomness.
HLL_BOUND = 4 * HLL_RSD

QUANTILE_ACCURACY = 1000  # GK rank error epsilon = 1/accuracy


_APPROX_DISTINCT_ORACLE = """
SELECT event_type,
       COUNT(DISTINCT user_id) AS exact_users,
       COUNT(*) AS n_events,
       TRUE AS hll_within_bound
FROM events
GROUP BY event_type
"""


@register(
    "approx_distinct_users_bounds",
    oracle=_APPROX_DISTINCT_ORACLE,
    doc="Per-event-type distinct users: the exact count (hash-"
        f"certified) alongside a boolean asserting HLL (rsd={HLL_RSD}) "
        f"landed within {HLL_BOUND:.0%} of it. The oracle recomputes "
        "the exact count and expects TRUE, so every driver run "
        "re-certifies the sketch's error contract cross-engine. HLL "
        "state is a per-register max -> merge-order independent -> "
        "the boolean is deterministic under any partitioning.",
    tags=("sketch", "approx", "aggregate"),
)
def approx_distinct_users_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    agg = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_users"),
        F.count(F.lit(1)).alias("n_events"),
        F.approx_count_distinct("user_id", rsd=HLL_RSD).alias("approx_users"),
    )
    err = F.abs(F.col("approx_users") - F.col("exact_users")) / F.col(
        "exact_users"
    )
    return agg.select(
        "event_type",
        "exact_users",
        "n_events",
        (err <= F.lit(HLL_BOUND)).alias("hll_within_bound"),
    )


_HLL_ROLLUP_ORACLE = """
WITH daily AS (
  SELECT event_type, DATE_TRUNC('day', ts) AS d, user_id
  FROM events
)
SELECT event_type,
       COUNT(DISTINCT user_id) AS exact_users,
       CAST(COUNT(DISTINCT d) AS BIGINT) AS n_days_merged,
       TRUE AS union_within_bound
FROM daily
GROUP BY event_type
"""


@register(
    "hll_union_rollup_bounds",
    oracle=_HLL_ROLLUP_ORACLE,
    doc="The mergeable-sketch rollup pattern itself: build one HLL "
        "sketch per (event_type, day) with hll_sketch_agg, then UNION "
        "the daily sketches per event_type (hll_union_agg) and "
        "estimate — distinct users over any date range without "
        "rescanning raw events, the way a sketch table amortizes "
        "distinct-count serving at 100 TB. Certified like the plain "
        "sketch: exact count hash-checked, estimate asserted within "
        "the lgConfigK=12 bound (~1.6% rsd, 4-sigma margin), TRUE "
        "expected by the oracle.",
    tags=("sketch", "approx", "aggregate", "rollup"),
)
def hll_union_rollup_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("d")
    ).agg(F.hll_sketch_agg("user_id", 12).alias("sk"))
    merged = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk", True)).alias(
            "approx_users"
        ),
        F.count(F.lit(1)).alias("n_days_merged"),
    )
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_users")
    )
    # Datasketches HLL with lgConfigK=12: rsd ~= 1.04/sqrt(2^12) ~ 1.6%
    bound = 4 * 1.04 / (2 ** 12) ** 0.5
    joined = merged.join(exact, "event_type")
    err = F.abs(F.col("approx_users") - F.col("exact_users")) / F.col(
        "exact_users"
    )
    return joined.select(
        "event_type",
        "exact_users",
        "n_days_merged",
        (err <= F.lit(bound)).alias("union_within_bound"),
    )


_QUANTILE_ORACLE = """
SELECT event_type, COUNT(*) AS n_values,
       TRUE AS p50_within_rank_bound
FROM events WHERE value IS NOT NULL
GROUP BY event_type
"""


@register(
    "approx_quantile_rank_bounds",
    oracle=_QUANTILE_ORACLE,
    doc="Approximate median per event_type (percentile_approx, "
        f"accuracy={QUANTILE_ACCURACY}) asserted inside its "
        "Greenwald-Khanna guarantee: the returned value must lie "
        "between the exact order statistics at rank 0.5*n +/- "
        "ceil(n/accuracy). The exact rank window is computed Spark-"
        "side (certification apparatus, not the serving path); the "
        "oracle recomputes the group sizes and expects TRUE. The GK "
        "invariant survives any merge order, so the boolean is "
        "deterministic — the gate certifies the sketch contract, not "
        "a bit pattern.",
    tags=("sketch", "approx", "window", "aggregate"),
)
def approx_quantile_rank_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = (
        load_tables(spark, sf_dir, "events")["events"]
        .where(F.col("value").isNotNull())
        .select("event_type", "value")
    )
    approx = ev.groupBy("event_type").agg(
        F.percentile_approx("value", 0.5, QUANTILE_ACCURACY).alias("p50_est"),
        F.count(F.lit(1)).alias("n_values"),
    )
    w = Window.partitionBy("event_type").orderBy("value")
    ranked = ev.select(
        "event_type",
        "value",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy("event_type")).alias("n"),
    )
    eps = F.ceil(F.col("n").cast("double") / QUANTILE_ACCURACY).cast("long")
    target = F.greatest(F.lit(1), F.ceil(F.lit(0.5) * F.col("n")).cast("long"))
    bounds = ranked.groupBy("event_type").agg(
        F.min(
            F.when(
                F.col("rk") == F.greatest(F.lit(1), target - eps), F.col("value")
            )
        ).alias("lo"),
        F.min(
            F.when(
                F.col("rk") == F.least(F.col("n"), target + eps), F.col("value")
            )
        ).alias("hi"),
    )
    return (
        approx.join(bounds, "event_type")
        .select(
            "event_type",
            "n_values",
            (
                (F.col("p50_est") >= F.col("lo"))
                & (F.col("p50_est") <= F.col("hi"))
            ).alias("p50_within_rank_bound"),
        )
    )


# ---------------------------------------------------------------------------
# Count-Min sketch: mergeable heavy-hitter serving
# ---------------------------------------------------------------------------

CMS_D = 4  # hash rows
CMS_W = 512  # counter columns per row
CMS_SALT = 97003  # per-row key perturbation (keeps key + r*salt in int64)
CMS_TOP_K = 20


def _cms_hashes_col(key):
    """The CMS_D (row, column) probes for ``key`` — column r uses the
    shared overflow-free Knuth hash on key + r*salt, mod CMS_W."""
    from ytspark.operators.text import knuth_hash_col

    return F.array(
        *[
            F.struct(
                F.lit(r).alias("r"),
                F.pmod(
                    knuth_hash_col(F.col(key) + F.lit(r * CMS_SALT)),
                    F.lit(CMS_W),
                ).cast("long").alias("col"),
            )
            for r in range(CMS_D)
        ]
    )


def _cms_hash_sql(r: int) -> str:
    from ytspark.operators.text import knuth_hash_sql

    return f"({knuth_hash_sql(f'user_id + {r * CMS_SALT}')}) % {CMS_W}"


_CMS_ORACLE = f"""
WITH probes AS (
  {" UNION ALL ".join(
      f"SELECT user_id, {r} AS r, {_cms_hash_sql(r)} AS col FROM events"
      for r in range(CMS_D)
  )}
),
counters AS (
  SELECT r, col, COUNT(*) AS cnt FROM probes GROUP BY r, col
),
exact AS (
  SELECT user_id, COUNT(*) AS exact_cnt FROM events GROUP BY user_id
),
keyed AS (
  SELECT DISTINCT user_id, r, col FROM probes
),
est AS (
  SELECT k.user_id, MIN(c.cnt) AS est_cnt
  FROM keyed k JOIN counters c ON c.r = k.r AND c.col = k.col
  GROUP BY k.user_id
)
SELECT e.user_id,
       CAST(x.exact_cnt AS BIGINT) AS exact_cnt,
       CAST(e.est_cnt AS BIGINT) AS est_cnt,
       CAST(e.est_cnt - x.exact_cnt AS BIGINT) AS overcount
FROM est e JOIN exact x USING (user_id)
ORDER BY est_cnt DESC, user_id
LIMIT {CMS_TOP_K}
"""


@register(
    "cms_heavy_hitters",
    oracle=_CMS_ORACLE,
    doc=f"Count-Min sketch heavy hitters: a {CMS_D}x{CMS_W} counter "
        "matrix built DISTRIBUTED (each event fans out to its "
        f"{CMS_D} (row, column) probes via one explode, then ONE "
        "count aggregate — counters are sums, so per-partition/"
        "per-day sketch tables merge by addition, the property that "
        "lets a 1000-executor cluster maintain rolling heavy-hitter "
        f"state without rescanning). Serving: top-{CMS_TOP_K} keys by "
        "sketch estimate (min over rows), reported beside the exact "
        "count and the overcount (>= 0 always — CMS never "
        "underestimates). Certified by FULL REPLAY, not a "
        "probabilistic bound: the overflow-free Knuth row hashes are "
        "SQL-expressible, so the oracle rebuilds the identical "
        "sketch and the driver hash-checks estimates, exacts, and "
        "overcounts value-for-value.",
    tags=("sketch", "approx", "aggregate", "skew"),
)
def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"].select("user_id")
    hashes = _cms_hashes_col("user_id")
    counters = (
        ev.select(F.explode(hashes).alias("h"))
        .groupBy(F.col("h.r").alias("r"), F.col("h.col").alias("col"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_cnt"))
    keyed = exact.select(
        "user_id", "exact_cnt", F.explode(hashes).alias("h")
    ).select("user_id", "exact_cnt", "h.r", "h.col")
    est = (
        keyed.join(counters, ["r", "col"])
        .groupBy("user_id", "exact_cnt")
        .agg(F.min("cnt").alias("est_cnt"))
    )
    return (
        est.select(
            "user_id",
            "exact_cnt",
            "est_cnt",
            (F.col("est_cnt") - F.col("exact_cnt")).alias("overcount"),
        )
        .orderBy(F.col("est_cnt").desc(), "user_id")
        .limit(CMS_TOP_K)
    )


# ---------------------------------------------------------------------------
# Sketch set algebra: HLL intersection by inclusion-exclusion
# ---------------------------------------------------------------------------

_HLL_INTERSECT_ORACLE = """
WITH f AS (
  SELECT user_id,
         MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS a,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS b
  FROM events GROUP BY user_id
)
SELECT CAST(SUM(a) AS BIGINT) AS exact_view_users,
       CAST(SUM(b) AS BIGINT) AS exact_purchase_users,
       CAST(SUM(a * b) AS BIGINT) AS exact_both,
       TRUE AS estimate_within_bound
FROM f
"""


@register(
    "hll_intersection_bounds",
    oracle=_HLL_INTERSECT_ORACLE,
    doc="Sketch SET ALGEBRA: |viewers intersect purchasers| estimated "
        "by inclusion-exclusion over three HLL sketches (|A| + |B| - "
        "|A u B|) — the only way mergeable sketches answer "
        "intersection questions, and the serving pattern that avoids "
        "rescanning raw events for audience-overlap dashboards at "
        "100 TB (the union sketch merges from the same stored "
        "per-cohort sketches the rollup queries maintain). "
        "Intersection error compounds: each term carries rsd*|term| "
        "absolute error, so the reported bound is rsd * (|A| + |B| + "
        "|A u B|) with a 2x margin — certified like the other sketch "
        "queries: exact counts hash-checked (one per-user flag "
        "aggregate), the within-bound boolean expected TRUE by the "
        "oracle on every driver run.",
    tags=("sketch", "approx", "aggregate", "setop"),
)
def hll_intersection_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    flags = ev.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "view", 1).otherwise(0)
        ).alias("a"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("b"),
    )
    exact = flags.agg(
        F.sum("a").cast("long").alias("exact_view_users"),
        F.sum("b").cast("long").alias("exact_purchase_users"),
        F.sum(F.col("a") * F.col("b")).cast("long").alias("exact_both"),
    )
    est = ev.agg(
        F.approx_count_distinct(
            F.when(F.col("event_type") == "view", F.col("user_id")),
            rsd=HLL_RSD,
        ).alias("ea"),
        F.approx_count_distinct(
            F.when(F.col("event_type") == "purchase", F.col("user_id")),
            rsd=HLL_RSD,
        ).alias("eb"),
        F.approx_count_distinct(
            F.when(
                F.col("event_type").isin("view", "purchase"),
                F.col("user_id"),
            ),
            rsd=HLL_RSD,
        ).alias("eu"),
    )
    j = exact.crossJoin(F.broadcast(est))
    est_inter = F.col("ea") + F.col("eb") - F.col("eu")
    bound = (
        F.lit(2.0 * HLL_RSD)
        * (F.col("ea") + F.col("eb") + F.col("eu")).cast("double")
    )
    return j.select(
        "exact_view_users",
        "exact_purchase_users",
        "exact_both",
        (
            F.abs(est_inter - F.col("exact_both")).cast("double") <= bound
        ).alias("estimate_within_bound"),
    )


@register(
    "hll_retention_estimate_bounds",
    oracle="""
WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
act AS (SELECT d, COUNT(*) AS n FROM ud GROUP BY d),
pairs AS (
  SELECT a.d, a.n AS n_day, b.n AS n_next
  FROM act a JOIN act b ON b.d = a.d + INTERVAL 1 DAY
),
ret AS (
  SELECT a.d, COUNT(*) AS retained
  FROM ud a JOIN ud b
    ON b.user_id = a.user_id AND b.d = a.d + INTERVAL 1 DAY
  GROUP BY a.d
)
SELECT STRFTIME(p.d, '%Y-%m-%d') AS day,
       CAST(p.n_day AS BIGINT) AS active_users,
       CAST(p.n_next AS BIGINT) AS active_next_day,
       CAST(COALESCE(r.retained, 0) AS BIGINT) AS retained_next_day,
       ROUND(COALESCE(r.retained, 0) * 1.0 / p.n_day, 6) AS retention_rate,
       TRUE AS estimate_within_bound
FROM pairs p LEFT JOIN ret r ON r.d = p.d
""",
    doc="SKETCH-SERVED RETENTION — the application the HLL sketch "
        "table exists for: day-over-day retained users estimated by "
        "inclusion-exclusion over per-day HLL sketches (est(A) + "
        "est(B) - est(A union B), the union via hll_union — three "
        "sketch reads, NO raw-event rescan, which is how a 100 TB "
        "events table serves retention dashboards), certified two "
        "ways like the other sketch queries: the exact per-day "
        "activity, retained counts and rates hash-match the oracle, "
        "and the HLL estimate is asserted within the compounded "
        "4-sigma bound (sum of the three estimates' tolerances, the "
        "hll_intersection_bounds convention) with TRUE expected by "
        "the oracle — a sketch-accuracy regression fails the gate. "
        "The exact side needs one distinct (user, day) table and one "
        "self-join shifted by a day; the sketch side is "
        "|days|-sized after the one sketch-building aggregate.",
    tags=("sketch", "approx", "retention", "aggregate", "join"),
)
def hll_retention_estimate_bounds(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    ud = ev.select("user_id", F.to_date("ts").alias("d")).distinct().persist()
    act = ud.groupBy("d").agg(
        F.count(F.lit(1)).alias("n"),
        F.hll_sketch_agg("user_id", 12).alias("sk"),
    )
    nxt = act.select(
        F.date_sub("d", 1).alias("d"),
        F.col("n").alias("n_next"),
        F.col("sk").alias("sk_next"),
    )
    pairs = act.join(nxt, "d")
    shifted = ud.select("user_id", F.date_sub("d", 1).alias("d"))
    ret = (
        ud.join(shifted, ["user_id", "d"])
        .groupBy("d")
        .agg(F.count(F.lit(1)).alias("retained"))
    )
    est_a = F.hll_sketch_estimate("sk")
    est_b = F.hll_sketch_estimate("sk_next")
    est_u = F.hll_sketch_estimate(F.hll_union("sk", "sk_next"))
    est_inter = est_a + est_b - est_u
    # lgConfigK=12: rsd ~= 1.04/sqrt(2^12); 4-sigma per estimate,
    # compounded over the three estimates entering the identity
    bound = 4 * 1.04 / (2 ** 12) ** 0.5
    retained = F.coalesce(F.col("retained"), F.lit(0))
    union_exact = F.col("n") + F.col("n_next") - retained
    tolerance = F.lit(bound) * (F.col("n") + F.col("n_next") + union_exact)
    # |days|-row result; release the distinct (user, day) cache
    return finish(
        pairs.join(ret, "d", "left")
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            F.col("n").cast("long").alias("active_users"),
            F.col("n_next").cast("long").alias("active_next_day"),
            retained.cast("long").alias("retained_next_day"),
            F.round(retained * 1.0 / F.col("n"), 6).alias("retention_rate"),
            (F.abs(est_inter - retained) <= tolerance).alias(
                "estimate_within_bound"
            ),
        ),
        ud,
    )


# ---------------------------------------------------------------------------
# CMS inner-product join-size estimation (the AMS/CMS application)
# ---------------------------------------------------------------------------

JSZ_E = 2.718281828459045  # Euler's number for the (e/W)·N1·N2 bound


def _jsz_hash_sql(key_expr: str, r: int) -> str:
    from ytspark.operators.text import knuth_hash_sql

    return f"({knuth_hash_sql(f'{key_expr} + {r * CMS_SALT}')}) % {CMS_W}"


_JSZ_ORACLE = f"""
WITH co AS (
  {" UNION ALL ".join(
      f"SELECT {r} AS r, {_jsz_hash_sql('o_orderkey', r)} AS col,"
      f" COUNT(*) AS cnt FROM orders GROUP BY 1, 2"
      for r in range(CMS_D)
  )}
),
cl AS (
  {" UNION ALL ".join(
      f"SELECT {r} AS r, {_jsz_hash_sql('l_orderkey', r)} AS col,"
      f" COUNT(*) AS cnt FROM lineitem GROUP BY 1, 2"
      for r in range(CMS_D)
  )}
),
ip AS (
  SELECT co.r, SUM(co.cnt * cl.cnt) AS prod
  FROM co JOIN cl ON co.r = cl.r AND co.col = cl.col
  GROUP BY co.r
),
est AS (SELECT MIN(prod) AS cms_estimate FROM ip),
exact AS (
  SELECT COUNT(*) AS exact_join_rows
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
ns AS (
  SELECT (SELECT COUNT(*) FROM orders) AS n_orders,
         (SELECT COUNT(*) FROM lineitem) AS n_lineitem
)
SELECT CAST(n_orders AS BIGINT) AS n_orders,
       CAST(n_lineitem AS BIGINT) AS n_lineitem,
       CAST(exact_join_rows AS BIGINT) AS exact_join_rows,
       CAST(cms_estimate AS BIGINT) AS cms_estimate,
       CAST(cms_estimate - exact_join_rows AS BIGINT) AS overcount,
       cms_estimate >= exact_join_rows AS never_underestimates,
       CAST(CEIL({JSZ_E} / {CMS_W} * n_orders * n_lineitem) AS BIGINT)
         AS error_bound,
       cms_estimate - exact_join_rows
         <= CEIL({JSZ_E} / {CMS_W} * n_orders * n_lineitem)
         AS within_bound
FROM est CROSS JOIN exact CROSS JOIN ns
"""


@register(
    "join_size_estimate_cms",
    oracle=_JSZ_ORACLE,
    doc="JOIN-SIZE ESTIMATION WITHOUT RUNNING THE JOIN — the classic "
        "Count-Min/AMS inner-product application an optimizer or "
        "admission controller runs before committing a shuffle: "
        "|R join S on k| = sum_k n_R(k)*n_S(k), estimated as the "
        f"minimum over the {CMS_D} sketch rows of the inner product "
        "of the two tables' counter rows. Each side costs one "
        "map-side-combinable count aggregate over its scan (the "
        f"sketches are {CMS_D}x{CMS_W} — constant size, mergeable by "
        "addition across partitions/days); the inner product joins "
        "two constant-size tables. The estimate NEVER underestimates "
        "(every colliding pair adds a nonnegative product) and "
        "overshoots by at most (e/W)*|R|*|S| w.h.p. — both "
        "properties emitted as checked booleans. Certified by FULL "
        "sketch replay: the overflow-free Knuth row hashes are "
        "SQL-expressible, so the oracle rebuilds both sketches and "
        "the estimate/overcount/bound match value-for-value. At "
        "100 TB this is how you price a join before paying for it.",
    tags=("sketch", "approx", "join", "aggregate", "scale"),
)
def join_size_estimate_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "orders", "lineitem")
    orders, lineitem = t["orders"], t["lineitem"]

    def counters(df: DataFrame, key: str) -> DataFrame:
        return (
            df.select(F.explode(_cms_hashes_col(key)).alias("h"))
            .groupBy(F.col("h.r").alias("r"), F.col("h.col").alias("col"))
            .agg(F.count(F.lit(1)).alias("cnt"))
        )

    co = counters(orders.select(F.col("o_orderkey").alias("k")), "k")
    cl = counters(lineitem.select(F.col("l_orderkey").alias("k")), "k")
    ip = (
        co.alias("co")
        .join(
            cl.alias("cl"),
            (F.col("co.r") == F.col("cl.r"))
            & (F.col("co.col") == F.col("cl.col")),
        )
        .groupBy(F.col("co.r"))
        .agg(F.sum(F.col("co.cnt") * F.col("cl.cnt")).alias("prod"))
    )
    est = ip.agg(F.min("prod").alias("cms_estimate"))
    exact = (
        orders.join(
            lineitem, orders["o_orderkey"] == lineitem["l_orderkey"]
        ).agg(F.count(F.lit(1)).alias("exact_join_rows"))
    )
    ns = orders.agg(F.count(F.lit(1)).alias("n_orders")).crossJoin(
        F.broadcast(lineitem.agg(F.count(F.lit(1)).alias("n_lineitem")))
    )
    bound = F.ceil(F.lit(JSZ_E) / CMS_W * F.col("n_orders") * F.col("n_lineitem"))
    return (
        est.crossJoin(F.broadcast(exact))
        .crossJoin(F.broadcast(ns))
        .select(
            F.col("n_orders").cast("long"),
            F.col("n_lineitem").cast("long"),
            F.col("exact_join_rows").cast("long"),
            F.col("cms_estimate").cast("long"),
            (F.col("cms_estimate") - F.col("exact_join_rows"))
            .cast("long")
            .alias("overcount"),
            (F.col("cms_estimate") >= F.col("exact_join_rows")).alias(
                "never_underestimates"
            ),
            bound.cast("long").alias("error_bound"),
            (
                F.col("cms_estimate") - F.col("exact_join_rows")
                <= bound
            ).alias("within_bound"),
        )
    )


# ---------------------------------------------------------------------------
# Feature-hashing (hashing trick) collision accounting
# ---------------------------------------------------------------------------

FH_BITS = 12  # 4096 hash buckets — the hashing-trick feature width


@register(
    "feature_hashing_collision_stats",
    oracle=f"""
WITH vocab AS (
  SELECT DISTINCT t AS term
  FROM (SELECT UNNEST(STRING_SPLIT(text, ' ')) AS t FROM documents)
),
hashed AS (
  SELECT term,
         (((((((LIST_REDUCE(LIST_PREPEND(CAST(7 AS BIGINT), LIST_TRANSFORM(STRING_SPLIT(term, ''), c -> CAST(UNICODE(c) AS BIGINT))), (acc, x) -> (acc * 131 + x) % 2147483647)) % 4294967296) + 4294967296) % 4294967296) // 65536) * 2654435761) % 4294967296 * 65536 + (((((LIST_REDUCE(LIST_PREPEND(CAST(7 AS BIGINT), LIST_TRANSFORM(STRING_SPLIT(term, ''), c -> CAST(UNICODE(c) AS BIGINT))), (acc, x) -> (acc * 131 + x) % 2147483647)) % 4294967296) + 4294967296) % 4294967296) % 65536) * 2654435761) % 4294967296 % {1 << FH_BITS} AS bucket
  FROM vocab
),
buckets AS (
  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_terms
  FROM hashed GROUP BY bucket
)
SELECT CAST((SELECT COUNT(*) FROM vocab) AS BIGINT) AS vocab_size,
       CAST({1 << FH_BITS} AS BIGINT) AS n_buckets,
       CAST(COUNT(*) AS BIGINT) AS buckets_used,
       CAST(SUM(CASE WHEN n_terms > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS buckets_with_collisions,
       CAST(SUM(CASE WHEN n_terms > 1 THEN n_terms ELSE 0 END)
            - SUM(CASE WHEN n_terms > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS terms_collided,
       CAST(MAX(n_terms) AS BIGINT) AS max_bucket_terms,
       ROUND(CAST((SELECT COUNT(*) FROM vocab) AS DOUBLE)
             / {1 << FH_BITS}, 6) AS load_factor
FROM buckets
""",
    doc=f"HASHING-TRICK accounting for the corpus vocabulary: every "
        f"distinct term maps to one of 2^{FH_BITS} feature buckets via "
        "the cross-engine Knuth hash of its rolling term hash, and the "
        "report quantifies what the dimensionality reduction costs — "
        "buckets used, buckets with collisions, terms sharing a "
        "bucket, worst bucket, load factor. This is the measurement a "
        "pipeline runs before replacing an unbounded vocabulary with "
        "fixed-width hashed features (the scalability trade the "
        "hashing trick makes at 100 TB, where exact vocabularies "
        "outgrow the driver). Plan: one distinct over exploded terms "
        "(map-side combinable), one bucket aggregate over the vocab — "
        "data is touched once.",
    tags=("sketch", "features", "hashing", "text", "aggregate"),
)
def feature_hashing_collision_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ytspark.operators.text import knuth_hash_col

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    vocab = (
        docs.select(F.explode(F.split("text", " ")).alias("term")).distinct()
    )
    # term -> integer via the rolling char hash (SQL-expressible),
    # then Knuth-mixed into 2^FH_BITS buckets
    tv = F.aggregate(
        F.split(F.col("term"), ""),
        F.lit(7).cast("bigint"),
        lambda acc, c: F.pmod(
            acc * F.lit(131) + F.ascii(c), F.lit(2147483647)
        ),
    )
    hashed = vocab.select(
        F.pmod(knuth_hash_col(tv), F.lit(1 << FH_BITS)).alias("bucket")
    )
    buckets = hashed.groupBy("bucket").agg(F.count(F.lit(1)).alias("n_terms"))
    nv = vocab.agg(F.count(F.lit(1)).alias("vocab_size"))
    return buckets.agg(
        F.count(F.lit(1)).alias("buckets_used"),
        F.sum(F.when(F.col("n_terms") > 1, 1).otherwise(0)).alias("bwc"),
        F.sum(
            F.when(F.col("n_terms") > 1, F.col("n_terms") - 1).otherwise(0)
        ).alias("tc"),
        F.max("n_terms").alias("max_bucket_terms"),
    ).crossJoin(F.broadcast(nv)).select(
        F.col("vocab_size").cast("long").alias("vocab_size"),
        F.lit(1 << FH_BITS).cast("long").alias("n_buckets"),
        F.col("buckets_used").cast("long").alias("buckets_used"),
        F.col("bwc").cast("long").alias("buckets_with_collisions"),
        F.col("tc").cast("long").alias("terms_collided"),
        F.col("max_bucket_terms").cast("long").alias("max_bucket_terms"),
        F.round(
            F.col("vocab_size").cast("double") / (1 << FH_BITS), 6
        ).alias("load_factor"),
    )


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct sketch with per-group error certificate
# ---------------------------------------------------------------------------

from ytspark.operators.text import knuth_hash_col, knuth_hash_sql  # noqa: E402

KMV_K = 64  # sketch size: estimate = (k-1) / u_(k)


@register(
    "kmv_distinct_sketch_eval",
    oracle=f"""
WITH h AS (
  SELECT DISTINCT c_mktsegment AS seg,
         {knuth_hash_sql('c_custkey')} AS hv
  FROM customer
),
rk AS (
  SELECT seg, hv,
         ROW_NUMBER() OVER (PARTITION BY seg ORDER BY hv) AS r,
         COUNT(*) OVER (PARTITION BY seg) AS n_hashes
  FROM h
),
ex AS (
  SELECT c_mktsegment AS seg,
         CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS exact_distinct
  FROM customer GROUP BY 1
)
SELECT rk.seg,
       ex.exact_distinct,
       CAST(rk.n_hashes AS BIGINT) AS n_hashes,
       CASE WHEN rk.n_hashes < {KMV_K} THEN CAST(rk.n_hashes AS DOUBLE)
            ELSE ROUND(({KMV_K} - 1) * 4294967296.0 / (rk.hv + 1), 4)
       END AS kmv_estimate,
       ROUND(CASE WHEN rk.n_hashes < {KMV_K} THEN CAST(rk.n_hashes AS DOUBLE)
                  ELSE ({KMV_K} - 1) * 4294967296.0 / (rk.hv + 1)
             END / ex.exact_distinct, 6) AS est_over_exact
FROM rk JOIN ex USING (seg)
WHERE rk.r = LEAST({KMV_K}, rk.n_hashes)
""",
    doc=f"KMV (k-minimum-values) DISTINCT sketch, k={KMV_K}, with a "
        f"per-group error certificate against the exact count — the "
        f"third mergeable cardinality sketch beside HLL (bit-pattern) "
        f"and the CMS-based estimates: keep the {KMV_K} smallest "
        f"hash values per group; the estimate is (k-1)/u_(k) with "
        f"u_(k) the k-th minimum normalized hash, falling back to "
        f"the exact hash count when a group is smaller than k "
        f"(standard KMV exactness property). KMV's union-merge is "
        f"just 'merge and keep the k smallest', which makes it THE "
        f"sketch for distributed distinct counts with set algebra. "
        f"Deterministic cross-engine: the shared overflow-safe Knuth "
        f"hash, distinct-hash dedup, and rank selection all replay "
        f"exactly in SQL — so unlike HLL (whose engine-internal hash "
        f"the oracle can only bound), the KMV estimate itself is "
        f"hash-certified. One distinct aggregate + one partitioned "
        f"rank window; at 100 TB per-partition top-k pre-aggregation "
        f"bounds the shuffle to k rows per group per partition.",
    tags=("sketch", "aggregate", "window", "evaluation"),
)
def kmv_distinct_sketch_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    cust = load_tables(spark, sf_dir, "customer")["customer"]
    h = cust.select(
        F.col("c_mktsegment").alias("seg"),
        knuth_hash_col(F.col("c_custkey")).alias("hv"),
    ).dropDuplicates(["seg", "hv"])
    wr = Window.partitionBy("seg").orderBy("hv")
    wn = Window.partitionBy("seg")
    rk = h.select(
        "seg",
        "hv",
        F.row_number().over(wr).alias("r"),
        F.count(F.lit(1)).over(wn).alias("n_hashes"),
    ).where(F.col("r") == F.least(F.lit(KMV_K), F.col("n_hashes")))
    ex = cust.groupBy(F.col("c_mktsegment").alias("seg")).agg(
        F.count_distinct("c_custkey").cast("long").alias("exact_distinct")
    )
    est = F.when(
        F.col("n_hashes") < KMV_K, F.col("n_hashes").cast("double")
    ).otherwise((KMV_K - 1) * 4294967296.0 / (F.col("hv") + 1))
    return rk.join(ex, "seg").select(
        "seg",
        "exact_distinct",
        F.col("n_hashes").cast("long").alias("n_hashes"),
        F.round(est, 4).alias("kmv_estimate"),
        F.round(est / F.col("exact_distinct"), 6).alias("est_over_exact"),
    )


# ---------------------------------------------------------------------------
# KMV set algebra (union / intersection / Jaccard estimates + certificates)
# ---------------------------------------------------------------------------

KMV_SET_A, KMV_SET_B = "click", "purchase"  # compared user sets


@register(
    "kmv_set_operations",
    oracle=f"""
WITH tagged AS (
  SELECT 'a' AS tag, user_id FROM events WHERE event_type = '{KMV_SET_A}'
  UNION ALL
  SELECT 'b', user_id FROM events WHERE event_type = '{KMV_SET_B}'
  UNION ALL
  SELECT 'u', user_id FROM events
  WHERE event_type IN ('{KMV_SET_A}', '{KMV_SET_B}')
),
h AS (
  SELECT DISTINCT tag, {knuth_hash_sql('user_id')} AS hv FROM tagged
),
rk AS (
  SELECT tag, hv,
         ROW_NUMBER() OVER (PARTITION BY tag ORDER BY hv) AS r,
         COUNT(*) OVER (PARTITION BY tag) AS nh
  FROM h
),
est AS (
  SELECT tag,
         CASE WHEN nh < {KMV_K} THEN CAST(nh AS DOUBLE)
              ELSE ({KMV_K} - 1) * 4294967296.0 / (hv + 1) END AS e
  FROM rk WHERE r = LEAST({KMV_K}, nh)
),
p AS (
  SELECT MAX(CASE WHEN tag = 'a' THEN e END) AS ea,
         MAX(CASE WHEN tag = 'b' THEN e END) AS eb,
         MAX(CASE WHEN tag = 'u' THEN e END) AS eu
  FROM est
),
ex AS (
  SELECT (SELECT COUNT(DISTINCT user_id) FROM events
          WHERE event_type = '{KMV_SET_A}') AS xa,
         (SELECT COUNT(DISTINCT user_id) FROM events
          WHERE event_type = '{KMV_SET_B}') AS xb,
         (SELECT COUNT(DISTINCT user_id) FROM events
          WHERE event_type IN ('{KMV_SET_A}', '{KMV_SET_B}')) AS xu
)
SELECT CAST(xa AS BIGINT) AS exact_a,
       CAST(xb AS BIGINT) AS exact_b,
       CAST(xu AS BIGINT) AS exact_union,
       CAST(xa + xb - xu AS BIGINT) AS exact_intersection,
       ROUND(ea, 4) AS est_a,
       ROUND(eb, 4) AS est_b,
       ROUND(eu, 4) AS est_union,
       ROUND(GREATEST(ea + eb - eu, 0), 4) AS est_intersection,
       ROUND(GREATEST(ea + eb - eu, 0) / eu, 6) AS est_jaccard,
       ROUND(CAST(xa + xb - xu AS DOUBLE) / xu, 6) AS exact_jaccard
FROM p CROSS JOIN ex
""",
    doc=f"KMV SET ALGEBRA over the '{KMV_SET_A}' and '{KMV_SET_B}' "
        f"user sets — the reason KMV earns its place beside HLL: "
        f"union merge is 'keep the {KMV_K} smallest of the merged "
        f"hashes' (EXACTLY a KMV sketch of the union, no error "
        f"inflation), intersection follows by inclusion-exclusion "
        f"(clamped at 0), Jaccard from their ratio — the distributed "
        f"set-overlap workflow (audience overlap, dedup-rate "
        f"estimation) in three mergeable scalars per set. Every "
        f"estimate ships beside its exact certificate (same scan), "
        f"so the sketch error is measured, not asserted. "
        f"Deterministic cross-engine via the shared Knuth hash; one "
        f"distinct + one per-tag rank (per-partition top-k bounds "
        f"the shuffle to k rows per tag at 100 TB).",
    tags=("sketch", "setop", "aggregate", "window", "evaluation"),
)
def kmv_set_operations(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_tables(spark, sf_dir, "events")["events"]
    aset = ev.where(F.col("event_type") == KMV_SET_A).select("user_id")
    bset = ev.where(F.col("event_type") == KMV_SET_B).select("user_id")
    tagged = (
        aset.select(F.lit("a").alias("tag"), "user_id")
        .unionAll(bset.select(F.lit("b").alias("tag"), "user_id"))
        .unionAll(
            aset.unionAll(bset).select(F.lit("u").alias("tag"), "user_id")
        )
    )
    h = tagged.select(
        "tag", knuth_hash_col(F.col("user_id")).alias("hv")
    ).dropDuplicates(["tag", "hv"])
    wr = Window.partitionBy("tag").orderBy("hv")
    wn = Window.partitionBy("tag")
    rk = h.select(
        "tag",
        "hv",
        F.row_number().over(wr).alias("r"),
        F.count(F.lit(1)).over(wn).alias("nh"),
    )
    est = rk.where(
        F.col("r") == F.least(F.lit(KMV_K), F.col("nh"))
    ).select(
        "tag",
        F.when(F.col("nh") < KMV_K, F.col("nh").cast("double"))
        .otherwise((KMV_K - 1) * 4294967296.0 / (F.col("hv") + 1))
        .alias("e"),
    )
    p = est.agg(
        *[
            F.max(F.when(F.col("tag") == t, F.col("e"))).alias(f"e{t}")
            for t in ("a", "b", "u")
        ]
    )
    ex = (
        aset.agg(F.count_distinct("user_id").alias("xa"))
        .crossJoin(
            F.broadcast(bset.agg(F.count_distinct("user_id").alias("xb")))
        )
        .crossJoin(
            F.broadcast(
                aset.unionAll(bset).agg(
                    F.count_distinct("user_id").alias("xu")
                )
            )
        )
    )
    inter = F.greatest(F.col("ea") + F.col("eb") - F.col("eu"), F.lit(0.0))
    return p.crossJoin(F.broadcast(ex)).select(
        F.col("xa").cast("long").alias("exact_a"),
        F.col("xb").cast("long").alias("exact_b"),
        F.col("xu").cast("long").alias("exact_union"),
        (F.col("xa") + F.col("xb") - F.col("xu"))
        .cast("long")
        .alias("exact_intersection"),
        F.round("ea", 4).alias("est_a"),
        F.round("eb", 4).alias("est_b"),
        F.round("eu", 4).alias("est_union"),
        F.round(inter, 4).alias("est_intersection"),
        F.round(inter / F.col("eu"), 6).alias("est_jaccard"),
        F.round(
            (F.col("xa") + F.col("xb") - F.col("xu")).cast("double")
            / F.col("xu"),
            6,
        ).alias("exact_jaccard"),
    )


# ---------------------------------------------------------------------------
# AMS F2 (second frequency moment) sketch with exact certificate
# ---------------------------------------------------------------------------

AMS_K = 16  # estimators: 4 groups x 4 -> median of means
AMS_GROUPS = 4
_AMS_SALT = 1_000_003  # estimator-index salt in the sign hash


def _ams_sign_sql(j: int) -> str:
    return (
        f"(1 - 2 * ((({knuth_hash_sql(f'user_id + {j} * {_AMS_SALT}')})"
        f" // 65536) % 2))"
    )


@register(
    "ams_f2_sketch_eval",
    oracle=f"""
WITH z AS (
  SELECT {", ".join(f"SUM({_ams_sign_sql(j)}) AS z{j}" for j in range(AMS_K))}
  FROM events
),
est AS (
  {" UNION ALL ".join(f"SELECT {j} AS j, CAST(z{j} AS DOUBLE) * z{j} AS e FROM z" for j in range(AMS_K))}
),
means AS (
  SELECT j // {AMS_K // AMS_GROUPS} AS g, AVG(e) AS m
  FROM est GROUP BY 1
),
mom AS (SELECT MEDIAN(m) AS ams FROM means),
exact AS (
  SELECT SUM(CAST(c AS DOUBLE) * c) AS f2
  FROM (SELECT COUNT(*) AS c FROM events GROUP BY user_id)
)
SELECT CAST(f2 AS BIGINT) AS exact_f2,
       ROUND(ams, 1) AS ams_estimate,
       ROUND(ABS(ams - f2) / f2, 6) AS rel_error,
       CAST({AMS_K} AS BIGINT) AS n_estimators,
       ABS(ams - f2) / f2 < 1.0 AS within_2x
FROM mom CROSS JOIN exact
""",
    doc=f"AMS F2 SKETCH (Alon-Matias-Szegedy 1996 — the second "
        f"frequency moment, i.e. the SELF-JOIN SIZE of the user_id "
        f"frequency vector): {AMS_K} independent +/-1 sign estimators "
        f"Z_j = sum_events s_j(user), est_j = Z_j^2, combined by "
        f"median-of-means ({AMS_GROUPS} groups) — the third "
        f"join-size estimator beside the CMS inner product "
        f"(join_size_estimate_cms) and the exact count, and the one "
        f"with O(1) state per estimator (a streaming monitor keeps "
        f"{AMS_K} running integers). Signs come from bit 16 of the "
        f"shared Knuth hash salted by estimator index, so the sketch "
        f"replays EXACTLY in SQL and the estimate itself is "
        f"hash-certified beside its exact certificate. Scale: ONE "
        f"events scan computing {AMS_K} conditional sums (map-side "
        f"combinable); the exact F2 costs the user groupBy the "
        f"sketch exists to avoid.",
    tags=("sketch", "aggregate", "evaluation"),
)
def ams_f2_sketch_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]

    def sign(j: int):
        h = knuth_hash_col(F.col("user_id") + j * _AMS_SALT)
        return 1 - 2 * F.pmod((h / 65536).cast("long"), F.lit(2))

    z = ev.agg(
        *[F.sum(sign(j)).alias(f"z{j}") for j in range(AMS_K)]
    )
    est_rows = z.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        (
                            F.col(f"z{j}").cast("double") * F.col(f"z{j}")
                        ).alias("e"),
                    )
                    for j in range(AMS_K)
                ]
            )
        ).alias("s")
    ).select(F.col("s.j").alias("j"), F.col("s.e").alias("e"))
    means = est_rows.groupBy(
        (F.col("j") / (AMS_K // AMS_GROUPS)).cast("long").alias("g")
    ).agg(F.avg("e").alias("m"))
    mom = means.agg(F.median("m").alias("ams"))
    exact = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.sum(F.col("c").cast("double") * F.col("c")).alias("f2"))
    )
    return mom.crossJoin(F.broadcast(exact)).select(
        F.col("f2").cast("long").alias("exact_f2"),
        F.round("ams", 1).alias("ams_estimate"),
        F.round(F.abs(F.col("ams") - F.col("f2")) / F.col("f2"), 6).alias(
            "rel_error"
        ),
        F.lit(AMS_K).cast("long").alias("n_estimators"),
        (F.abs(F.col("ams") - F.col("f2")) / F.col("f2") < 1.0).alias(
            "within_2x"
        ),
    )
