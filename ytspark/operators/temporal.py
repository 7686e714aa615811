"""Temporal join operators over the ``events`` table: as-of join and
range (interval) join — the two time-series joins the reference's
snapshot data model implies but delegates to its warehouse (SURVEY
§2.10: joins absent in reference code; these are the time-series
variants Spark lacks as built-ins).

Scale design:

- **As-of join** is NOT implemented as an inequality join (which would
  degenerate to a per-key sort + backward scan in the executor anyway)
  but as the classic *union + ordered window* plan: tag both sides,
  union them, and carry the latest right-side payload forward with
  ``last(..., ignorenulls=True)`` over a per-key ordered window. Cost
  is ONE shuffle on the key (same as any join) plus a per-partition
  sort — no candidate-pair blowup, no range explosion; it scales to
  arbitrarily many right rows per key. This is the standard
  points-in-time join used by feature-store backfills.
- **Range join** keeps the user_id equi-key as the join carrier (a
  plain shuffled hash/sort-merge join); the time-interval predicate is
  a residual filter evaluated inside the join — so cost is bounded by
  per-user event counts, never |L|×|R|. At 100 TB you'd additionally
  bucket both sides by a coarse time bucket and join on
  (key, bucket) to bound the residual further.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ytspark.queries import register
from ytspark.session import load_tables


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload: list[str],
    *,
    direction: str = "backward",
) -> DataFrame:
    """Point-in-time as-of join. ``direction="backward"`` (default):
    for each left row, attach the payload of the LATEST right row with
    ``right.ts <= left.ts`` for the same key. ``direction="forward"``:
    the EARLIEST right row with ``right.ts >= left.ts``. Left rows
    with no matching right row keep NULLs.

    Implemented as union + ordered window (one shuffle on ``key``);
    right rows at the exact same timestamp as a left row ARE visible
    in both directions (<= / >=, matching DuckDB/kdb ASOF semantics),
    enforced by the (ts, tag) sort order: backward sorts rights before
    lefts at equal ts and carries with last() over the preceding
    frame; forward sorts lefts first and takes first() over the
    following frame.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    lcols = left.columns
    # backward: right(0) sorts before left(1) at equal ts → visible in
    # the preceding frame. forward: left(0) before right(1) → visible
    # in the following frame.
    l_tag, r_tag = (1, 0) if direction == "backward" else (0, 1)
    tagged_l = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(l_tag).alias("__tag"),
        F.lit(1).alias("__is_left"),
        F.struct(*lcols).alias("__lrow"),
        F.lit(None).cast(
            right.select(F.struct(*payload).alias("p")).schema["p"].dataType
        ).alias("__payload"),
    )
    tagged_r = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(r_tag).alias("__tag"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(
            left.select(F.struct(*lcols).alias("l")).schema["l"].dataType
        ).alias("__lrow"),
        F.struct(*payload).alias("__payload"),
    )
    base = Window.partitionBy("__k").orderBy("__ts", "__tag")
    if direction == "backward":
        w = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        carry = F.last("__payload", ignorenulls=True).over(w)
    else:
        w = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        carry = F.first("__payload", ignorenulls=True).over(w)
    carried = (
        tagged_l.unionByName(tagged_r)
        .withColumn("__asof", carry)
        .where(F.col("__is_left") == 1)
    )
    out = [F.col(f"__lrow.{c}").alias(c) for c in lcols] + [
        F.col(f"__asof.{p}").alias(f"asof_{p}") for p in payload
    ]
    return carried.select(*out)


@register(
    "asof_last_click_before_purchase",
    oracle="""
SELECT p.event_id AS purchase_id,
       p.user_id,
       p.ts AS purchase_ts,
       c.ts AS asof_ts,
       c.value AS asof_value
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
""",
    doc="As-of (point-in-time) join: each purchase picks up the latest "
        "click at-or-before it per user. Union+window plan — one shuffle, "
        "no pair blowup. Oracle is DuckDB's native ASOF JOIN.",
    tags=("join", "asof", "temporal"),
)
def asof_last_click_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    clicks = ev.where(F.col("event_type") == "click").select("user_id", "ts", "value")
    return asof_join(
        purchases, clicks, key="user_id", left_ts="purchase_ts", right_ts="ts",
        payload=["ts", "value"],
    )


@register(
    "range_join_clicks_after_purchase",
    oracle="""
SELECT p.event_id AS purchase_id,
       COUNT(c.event_id) AS n_clicks_next_hour,
       CAST(COALESCE(SUM(CAST(c.value AS DECIMAL(18,2))), 0) AS DOUBLE)
         AS click_value_next_hour
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id
 AND c.ts > p.ts
 AND c.ts <= p.ts + INTERVAL 1 HOUR
GROUP BY p.event_id
""",
    doc="Range (interval) join: clicks within the hour following each "
        "purchase, per user. The user_id equi-key carries the join; the "
        "interval predicate is a residual — no cross product.",
    tags=("join", "range", "temporal"),
)
def range_join_clicks_after_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    p = ev.where(F.col("event_type") == "purchase").alias("p")
    c = ev.where(F.col("event_type") == "click").alias("c")
    joined = p.join(
        c,
        (F.col("p.user_id") == F.col("c.user_id"))
        & (F.col("c.ts") > F.col("p.ts"))
        & (F.col("c.ts") <= F.col("p.ts") + F.expr("INTERVAL 1 HOUR")),
        "left",
    )
    return joined.groupBy(F.col("p.event_id").alias("purchase_id")).agg(
        F.count(F.col("c.event_id")).alias("n_clicks_next_hour"),
        F.coalesce(
            F.sum(F.col("c.value").cast("decimal(18,2)")), F.lit(0).cast("decimal(18,2)")
        )
        .cast("double")
        .alias("click_value_next_hour"),
    )


@register(
    "asof_next_click_after_purchase",
    oracle="""
SELECT p.event_id AS purchase_id,
       p.user_id,
       p.ts AS purchase_ts,
       c.ts AS asof_ts,
       c.value AS asof_value
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts <= c.ts
""",
    doc="FORWARD as-of join: each purchase picks up the earliest click "
        "at-or-after it per user (the follow-up-attribution direction). "
        "Same union+window plan as the backward form with the frame and "
        "tie-tag mirrored; oracle is DuckDB's native forward ASOF JOIN.",
    tags=("join", "asof", "temporal"),
)
def asof_next_click_after_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    clicks = ev.where(F.col("event_type") == "click").select("user_id", "ts", "value")
    return asof_join(
        purchases, clicks, key="user_id", left_ts="purchase_ts", right_ts="ts",
        payload=["ts", "value"], direction="forward",
    )


ATTR_WINDOW_DAYS = 3  # look-back window for touch credit
ATTR_TOUCHES = ("click", "signup", "view")


_ATTR_ORACLE = f"""
WITH purchases AS (
  SELECT event_id AS pid, user_id, ts AS pts
  FROM events WHERE event_type = 'purchase'
),
touches AS (
  SELECT user_id, event_type AS touch, ts, event_id
  FROM events WHERE event_type IN ('click', 'signup', 'view')
),
paired AS (
  SELECT p.pid, t.touch, t.ts, t.event_id,
         COUNT(*) OVER (PARTITION BY p.pid) AS n_touches,
         ROW_NUMBER() OVER (PARTITION BY p.pid
                            ORDER BY t.ts, t.event_id) AS rk_first,
         ROW_NUMBER() OVER (PARTITION BY p.pid
                            ORDER BY t.ts DESC, t.event_id DESC) AS rk_last
  FROM purchases p
  JOIN touches t
    ON t.user_id = p.user_id
   AND t.ts <= p.pts
   AND t.ts > p.pts - INTERVAL {ATTR_WINDOW_DAYS} DAY
)
SELECT touch,
       ROUND(SUM(1.0 / n_touches), 6) AS linear_credit,
       CAST(SUM(CASE WHEN rk_first = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS first_touch_purchases,
       CAST(SUM(CASE WHEN rk_last = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS last_touch_purchases,
       CAST(COUNT(*) AS BIGINT) AS n_touch_events
FROM paired
GROUP BY touch
"""


@register(
    "purchase_touch_attribution",
    oracle=_ATTR_ORACLE,
    doc=f"Multi-touch attribution over the event stream: every "
        f"purchase splits credit across the user's view/click/signup "
        f"touches in the prior {ATTR_WINDOW_DAYS} days — linear "
        "(1/n each), first-touch, and last-touch models side by side, "
        "aggregated per touch type. The purchase-to-touch pairing is "
        "the bounded-interval range join (same shape as "
        "range_join_clicks_after_purchase — at 100 TB it buckets by "
        "day so each purchase probes only adjacent buckets); credit "
        "computation is two per-purchase windows (count + the "
        "(ts, event_id)-total-ordered first/last ranks) and one "
        "final aggregate. Purchases with no in-window touches drop "
        "out in both engines (inner join).",
    tags=("temporal", "join", "window", "aggregate", "attribution"),
)
def purchase_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_tables(spark, sf_dir, "events")["events"]
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("pts"),
    )
    touches = ev.where(F.col("event_type").isin(*ATTR_TOUCHES)).select(
        F.col("user_id").alias("t_user"),
        F.col("event_type").alias("touch"),
        F.col("ts").alias("tts"),
        F.col("event_id").alias("tid"),
    )
    paired = purchases.join(
        touches,
        (F.col("p_user") == F.col("t_user"))
        & (F.col("tts") <= F.col("pts"))
        & (
            F.col("tts")
            > F.col("pts") - F.expr(f"INTERVAL {ATTR_WINDOW_DAYS} DAYS")
        ),
    ).select("pid", "touch", "tts", "tid")
    wp = Window.partitionBy("pid")
    wf = Window.partitionBy("pid").orderBy("tts", "tid")
    wl = Window.partitionBy("pid").orderBy(
        F.col("tts").desc(), F.col("tid").desc()
    )
    scored = paired.select(
        "touch",
        F.count(F.lit(1)).over(wp).alias("n_touches"),
        F.row_number().over(wf).alias("rk_first"),
        F.row_number().over(wl).alias("rk_last"),
    )
    return scored.groupBy("touch").agg(
        F.round(F.sum(F.lit(1.0) / F.col("n_touches")), 6).alias(
            "linear_credit"
        ),
        F.sum(F.when(F.col("rk_first") == 1, 1).otherwise(0)).alias(
            "first_touch_purchases"
        ),
        F.sum(F.when(F.col("rk_last") == 1, 1).otherwise(0)).alias(
            "last_touch_purchases"
        ),
        F.count(F.lit(1)).alias("n_touch_events"),
    )


OVERLAP_TOP_K = 50

# Assertable routing threshold for the exact interval-overlap join: the
# blocked candidate-pair volume (sum over blocks of n*(n-1)/2) the
# operator is sized for. user_activity_overlap_pairs ENFORCES it with a
# pre-flight aggregate; above it, dense co-presence questions route to
# the sketch/heavy-hitter family instead of the exact join.
OVERLAP_PAIR_BUDGET = 100_000_000


class PairBudgetExceededError(RuntimeError):
    """A blocked pairwise operator refused to run: its exact pre-flight
    candidate-pair count exceeded the routing budget."""


def enforce_pair_budget(
    spans: DataFrame, block_col: str, op_name: str, budget: int
) -> None:
    """ENFORCED pre-flight (not advisory) for blocked pairwise
    operators: the exact candidate-pair volume the blocked join will
    evaluate — sum over blocks of n*(n-1)/2, one tiny aggregate over
    the span table — must fit the routing budget, else the dense-data
    question belongs to the sketch/heavy-hitter family and the
    operator refuses to run it. overlap_pair_explosion_guard is the
    queryable form of the same aggregate (check-then-run as a
    user-visible report)."""
    total = (
        spans.groupBy(block_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.sum(F.expr("n * (n - 1) div 2")).alias("t"))
        .first()["t"]
    ) or 0
    if total > budget:
        raise PairBudgetExceededError(
            f"{op_name}: blocked interval join would evaluate "
            f"{total:,} candidate pairs > budget {budget:,}; route "
            "dense co-presence to the sketch/heavy-hitter family "
            "(e.g. cms_heavy_hitters / approx_distinct_users_bounds) "
            "or raise the budget explicitly."
        )


def enforce_grid_budget(grid: DataFrame, op_name: str, budget: int) -> None:
    """ENFORCED pre-flight for value-histogram kernel grids (r9 VERDICT
    item 3): a grid-squared aggregate (MMD kernel sums, Cliff's-delta
    gt/lt mass) crossJoins the per-value count table with itself, so
    its cost is |distinct values|^2 — row-count-invariant, but squared
    in the value DOMAIN. Bounded value enums (cent-quantized prices)
    keep it tiny; an open-ended domain at 100 TB squares the grid
    itself. One cheap count() decides: over budget, the operator
    refuses and the caller coarsens the quantization grain (cents ->
    dollars shrinks the grid 1e4x) or routes to a sketch."""
    n = grid.count()
    if n * n > budget:
        raise PairBudgetExceededError(
            f"{op_name}: kernel grid would evaluate {n:,}^2 = "
            f"{n * n:,} value-pair products > budget {budget:,}; "
            "coarsen the quantization grain (e.g. cents -> whole "
            "units) or route the comparison to a sketch family."
        )


_OVERLAP_ORACLE = f"""
WITH spans AS (
  SELECT user_id, CAST(ts AS DATE) AS d,
         MIN(ts) AS s, MAX(ts) AS e
  FROM events GROUP BY user_id, CAST(ts AS DATE)
),
pairs AS (
  SELECT a.user_id AS ua, b.user_id AS ub,
         EPOCH_US(LEAST(a.e, b.e)) - EPOCH_US(GREATEST(a.s, b.s)) AS ov
  FROM spans a
  JOIN spans b ON a.d = b.d AND a.user_id < b.user_id
  WHERE a.s <= b.e AND b.s <= a.e
)
SELECT ua, ub,
       CAST(COUNT(*) AS BIGINT) AS days_overlapped,
       CAST(SUM(ov) AS BIGINT) AS total_overlap_us
FROM pairs
GROUP BY ua, ub
ORDER BY total_overlap_us DESC, ua, ub
LIMIT {OVERLAP_TOP_K}
"""


@register(
    "user_activity_overlap_pairs",
    oracle=_OVERLAP_ORACLE,
    doc=f"INTERVAL OVERLAP JOIN: each user's daily activity span "
        "[first event, last event] joined against every other user's "
        "span for overlap-in-time, aggregated to the top-"
        f"{OVERLAP_TOP_K} co-active user pairs by total overlapping "
        "time — the concurrency/co-presence probe (ad attribution "
        "windows, fraud co-activity, resource contention) that plain "
        "equi- and as-of joins can't express. The join is TEMPORALLY "
        "BLOCKED: the equality conjunct on the day key carries the "
        "shuffle (intervals here are day-bounded by construction; "
        "cross-boundary intervals would explode into their covered "
        "days and dedupe, the standard interval-blocking recipe), so "
        "the overlap predicate filters WITHIN day-partitions instead "
        "of planning a cartesian nested loop. Overlap is exact "
        "integer microsecond epoch arithmetic — no rounding needed; "
        "the (total, ua, ub) ordering makes the top-k membership "
        "total. Density note: daily spans here are DENSE (every "
        "user, every day), so sf0.1 evaluates ~33M candidate pairs "
        "in ~7 s — inherent to the exact all-pairs answer; at 100 TB "
        "this operator is for SPARSE interval sets (sessions, "
        "incidents, deploy windows) where per-block populations are "
        "small, and dense co-presence questions route to the "
        "sketch/heavy-hitter family instead — a rule this operator "
        "ENFORCES: a pre-flight aggregate computes the exact blocked "
        "candidate-pair volume and raises PairBudgetExceededError "
        "over OVERLAP_PAIR_BUDGET (overlap_pair_explosion_guard is "
        "the same aggregate as a queryable report).",
    tags=("temporal", "join", "interval", "aggregate"),
)
def user_activity_overlap_pairs(
    spark: SparkSession, sf_dir: str, budget: int | None = None
) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    spans = ev.groupBy(
        "user_id", F.to_date("ts").alias("d")
    ).agg(F.min("ts").alias("s"), F.max("ts").alias("e"))
    budget = OVERLAP_PAIR_BUDGET if budget is None else budget
    enforce_pair_budget(spans, "d", "user_activity_overlap_pairs", budget)
    # r12 (guide §2.5/§2.6): the probe side is tiny BEFORE the join
    # (one span row per user-day) but expands ~|day population|x inside
    # it, so AQE coalesces it to a single post-agg partition and the
    # whole pair expansion runs as one task. Spread the probe side
    # across the executor pool first — round-robin, scale-adaptive via
    # defaultParallelism, cheap at span cardinality — so the expansion
    # and the map-side partial aggregation parallelize. The build side
    # is broadcast, so probe partitioning is unconstrained.
    a = spans.repartition(spans.sparkSession.sparkContext.defaultParallelism).select(
        F.col("user_id").alias("ua"), F.col("d"),
        F.col("s").alias("sa"), F.col("e").alias("ea"),
    )
    b = spans.select(
        F.col("user_id").alias("ub"), F.col("d"),
        F.col("s").alias("sb"), F.col("e").alias("eb"),
    )
    pairs = a.join(
        b,
        ["d"],
    ).where(
        (F.col("ua") < F.col("ub"))
        & (F.col("sa") <= F.col("eb"))
        & (F.col("sb") <= F.col("ea"))
    )
    ov = F.unix_micros(F.least("ea", "eb")) - F.unix_micros(
        F.greatest("sa", "sb")
    )
    return (
        pairs.select("ua", "ub", ov.alias("ov"))
        .groupBy("ua", "ub")
        .agg(
            F.count(F.lit(1)).alias("days_overlapped"),
            F.sum("ov").alias("total_overlap_us"),
        )
        .orderBy(F.col("total_overlap_us").desc(), "ua", "ub")
        .limit(OVERLAP_TOP_K)
    )


@register(
    "overlap_pair_explosion_guard",
    oracle=f"""
WITH pop AS (
  SELECT CAST(ts AS DATE) AS d, COUNT(DISTINCT user_id) AS n
  FROM events GROUP BY 1
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(MAX(n) AS BIGINT) AS max_day_users,
       CAST(MAX(n * (n - 1) // 2) AS BIGINT) AS max_day_pairs,
       CAST(SUM(n * (n - 1) // 2) AS BIGINT) AS total_candidate_pairs,
       SUM(n * (n - 1) // 2) <= {OVERLAP_PAIR_BUDGET} AS within_budget
FROM pop
""",
    doc="Pair-explosion guard for user_activity_overlap_pairs: the "
        "exact per-day candidate-pair count the temporally-blocked "
        "interval join WILL evaluate (sum over day blocks of "
        "n*(n-1)/2), computed from per-block populations BEFORE "
        "running the join — one tiny aggregate over the span table. "
        f"within_budget asserts the {OVERLAP_PAIR_BUDGET:,}-pair "
        "routing threshold: below it the exact join is the right "
        "plan; above it (dense co-presence at 100 TB) the question "
        "routes to the sketch/heavy-hitter family. This is the "
        "check-then-run pattern for any blocked pairwise operator — "
        "the same shape join_explosion_profile applies to equi-join "
        "keys, specialized to the interval-blocking day key.",
    tags=("temporal", "guard", "scale", "aggregate"),
)
def overlap_pair_explosion_guard(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    pop = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.count_distinct("user_id").alias("n")
    )
    pairs = F.expr("n * (n - 1) div 2")
    return pop.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.max("n").cast("long").alias("max_day_users"),
        F.max(pairs).cast("long").alias("max_day_pairs"),
        F.sum(pairs).cast("long").alias("total_candidate_pairs"),
        (F.sum(pairs) <= F.lit(OVERLAP_PAIR_BUDGET)).alias("within_budget"),
    )


# ---------------------------------------------------------------------------
# Session path mining: top paths and their conversion rates
# ---------------------------------------------------------------------------

PATH_MAX_EVENTS = 8  # truncate paths: bounds state AND cardinality
PATH_TOP_K = 25


_PATH_ORACLE = f"""
WITH seq AS (
  SELECT user_id, CAST(ts AS DATE) AS day, event_type,
         ROW_NUMBER() OVER (
           PARTITION BY user_id, CAST(ts AS DATE)
           ORDER BY ts, event_id) AS rn
  FROM events
),
paths AS (
  SELECT user_id, day,
         STRING_AGG(event_type, '>' ORDER BY rn) AS path,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           AS converted
  FROM seq WHERE rn <= {PATH_MAX_EVENTS}
  GROUP BY user_id, day
)
SELECT path,
       COUNT(*) AS n_sessions,
       CAST(SUM(converted) AS BIGINT) AS n_converting,
       ROUND(CAST(SUM(converted) AS DOUBLE) / COUNT(*), 6)
         AS conversion_rate
FROM paths
GROUP BY path
ORDER BY n_sessions DESC, path
LIMIT {PATH_TOP_K}
"""


@register(
    "session_path_conversion",
    oracle=_PATH_ORACLE,
    doc=f"Session path mining — the funnel-discovery operator: each "
        "(user, day) session becomes its ordered event-type path "
        f"(first {PATH_MAX_EVENTS} events by (ts, event_id) — the "
        "truncation that bounds both per-session state and path-"
        f"space cardinality at 100 TB), and the top-{PATH_TOP_K} "
        "paths report session counts and conversion rate (sessions "
        "containing a purchase among the kept events). One shuffle "
        "keys the sessionization, one the path rollup; the path "
        "string is built by an ORDER-deterministic aggregation "
        "((ts, event_id) is a total order), so both engines "
        "concatenate identical sequences. Ranking is over exact "
        "integer counts with a path tiebreak.",
    tags=("temporal", "funnel", "path", "aggregate", "topk"),
)
def session_path_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_tables(spark, sf_dir, "events")["events"]
    w = Window.partitionBy("user_id", F.to_date("ts")).orderBy(
        "ts", "event_id"
    )
    seq = ev.select(
        "user_id",
        F.to_date("ts").alias("day"),
        "event_type",
        F.row_number().over(w).alias("rn"),
    ).where(F.col("rn") <= PATH_MAX_EVENTS)
    paths = seq.groupBy("user_id", "day").agg(
        F.concat_ws(
            ">",
            F.array_sort(
                F.collect_list(F.struct("rn", "event_type"))
            ).getField("event_type"),
        ).alias("path"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted"),
    )
    return (
        paths.groupBy("path")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("converted").cast("long").alias("n_converting"),
            F.round(
                F.sum("converted").cast("double") / F.count(F.lit(1)), 6
            ).alias("conversion_rate"),
        )
        .orderBy(F.col("n_sessions").desc(), "path")
        .limit(PATH_TOP_K)
    )


# ---------------------------------------------------------------------------
# Interval union (merged coverage) — the sweep-line complement of the
# overlap join
# ---------------------------------------------------------------------------

COVERAGE_WINDOW_S = 300  # each event opens a 5-minute activity span
COVERAGE_TOP_K = 50


_COVERAGE_ORACLE = f"""
WITH iv AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         epoch_us(ts) AS s, epoch_us(ts) + {COVERAGE_WINDOW_S} * 1000000
           AS e,
         event_id
  FROM events
),
marked AS (
  SELECT user_id, day, s, e,
         CASE WHEN s > COALESCE(MAX(e) OVER (
                PARTITION BY user_id, day ORDER BY s, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
              -1) THEN 1 ELSE 0 END AS new_seg
  FROM iv
),
seg AS (
  SELECT user_id, day, s, e,
         SUM(new_seg) OVER (
           PARTITION BY user_id, day ORDER BY s, e
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seg_id
  FROM marked
),
cov AS (
  SELECT user_id, day,
         SUM(seg_e - seg_s) AS covered_us,
         COUNT(*) AS n_segments
  FROM (
    SELECT user_id, day, seg_id, MIN(s) AS seg_s, MAX(e) AS seg_e
    FROM seg GROUP BY user_id, day, seg_id
  ) GROUP BY user_id, day
)
SELECT user_id,
       CAST(SUM(covered_us) // 1000000 AS BIGINT) AS active_seconds,
       CAST(SUM(n_segments) AS BIGINT) AS n_sessions,
       CAST(COUNT(*) AS BIGINT) AS n_days
FROM cov
GROUP BY user_id
ORDER BY active_seconds DESC, user_id
LIMIT {COVERAGE_TOP_K}
"""


@register(
    "interval_union_coverage",
    oracle=_COVERAGE_ORACLE,
    doc=f"INTERVAL UNION by sweep line — the merged-coverage "
        "complement of the overlap join: each event opens a "
        f"{COVERAGE_WINDOW_S}-second activity span; overlapping "
        "spans per (user, day) merge into segments (a span starts a "
        "new segment iff it begins after the running max end of all "
        "earlier spans — one ordered window pass, the classic "
        "O(n log n) sweep), and the top-{COVERAGE_TOP_K} users "
        "report total covered seconds, merged session count, and "
        "active days. This is how billing meters, SLA uptime, and "
        "screen-time products compute 'actual time covered' without "
        "double-counting overlaps. All arithmetic is exact integer "
        "microseconds; the sweep windows run per (user, day) "
        "partition — co-partitioned, no global sort; the final "
        "top-k is a partial TakeOrdered. The oracle replays the "
        "identical sweep.",
    tags=("temporal", "interval", "sweep", "window", "aggregate"),
)
def interval_union_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_tables(spark, sf_dir, "events")["events"]
    iv = ev.select(
        "user_id",
        F.to_date("ts").alias("day"),
        F.unix_micros("ts").alias("s"),
        (F.unix_micros("ts") + F.lit(COVERAGE_WINDOW_S * 1_000_000)).alias(
            "e"
        ),
        "event_id",
    )
    wprev = (
        Window.partitionBy("user_id", "day")
        .orderBy("s", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = iv.select(
        "user_id",
        "day",
        "s",
        "e",
        F.when(
            F.col("s") > F.coalesce(F.max("e").over(wprev), F.lit(-1)), 1
        )
        .otherwise(0)
        .alias("new_seg"),
    )
    wseg = (
        Window.partitionBy("user_id", "day")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    seg = marked.withColumn("seg_id", F.sum("new_seg").over(wseg))
    cov = (
        seg.groupBy("user_id", "day", "seg_id")
        .agg(F.min("s").alias("seg_s"), F.max("e").alias("seg_e"))
        .groupBy("user_id", "day")
        .agg(
            F.sum(F.col("seg_e") - F.col("seg_s")).alias("covered_us"),
            F.count(F.lit(1)).alias("n_segments"),
        )
    )
    return (
        cov.groupBy("user_id")
        .agg(
            # `div`, not `/`: float division + cast would truncate on
            # Spark but round on DuckDB — integer division agrees
            F.expr("sum(covered_us) div 1000000")
            .cast("long")
            .alias("active_seconds"),
            F.sum("n_segments").cast("long").alias("n_sessions"),
            F.count(F.lit(1)).cast("long").alias("n_days"),
        )
        .orderBy(F.col("active_seconds").desc(), "user_id")
        .limit(COVERAGE_TOP_K)
    )


# ---------------------------------------------------------------------------
# Sequence pattern matching over encoded event strings
# ---------------------------------------------------------------------------

SEQPAT_STRICT = "vcp"  # view, click, purchase — consecutive
SEQPAT_GAPPED = "v.*c.*p"  # same funnel, any events between
SEQPAT_TOP_K = 25


_SEQPAT_ORACLE = f"""
WITH seq AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         SUBSTR(event_type, 1, 1) AS ch,
         ROW_NUMBER() OVER (
           PARTITION BY user_id, CAST(ts AS DATE)
           ORDER BY ts, event_id) AS rn
  FROM events
),
paths AS (
  SELECT user_id, day, STRING_AGG(ch, '' ORDER BY rn) AS path
  FROM seq GROUP BY user_id, day
),
scored AS (
  SELECT user_id,
         LEN(regexp_extract_all(path, '{SEQPAT_STRICT}')) AS strict_n,
         CASE WHEN regexp_matches(path, '{SEQPAT_GAPPED}')
              THEN 1 ELSE 0 END AS gapped
  FROM paths
)
SELECT user_id,
       CAST(SUM(strict_n) AS BIGINT) AS strict_matches,
       CAST(SUM(gapped) AS BIGINT) AS days_with_funnel,
       CAST(COUNT(*) AS BIGINT) AS n_days
FROM scored
GROUP BY user_id
ORDER BY strict_matches DESC, user_id
LIMIT {SEQPAT_TOP_K}
"""


@register(
    "sequence_pattern_funnel",
    oracle=_SEQPAT_ORACLE,
    doc="MATCH_RECOGNIZE-style sequence pattern matching, the "
        "regex-over-encoded-events technique: each (user, day) "
        "session becomes a string of event-type initials in strict "
        "(ts, event_id) order, then the strict funnel "
        f"'{SEQPAT_STRICT}' (view-click-purchase CONSECUTIVE) is "
        "counted by non-overlapping regex extraction and the gapped "
        f"funnel '{SEQPAT_GAPPED}' as a per-day boolean — the "
        "pattern layer (abandonment, bot signatures, compliance "
        "sequences) that row-per-event SQL struggles to express. "
        "Both engines count left-to-right non-overlapping matches "
        "identically, so exact integer counts certify cross-engine. "
        "Scale: string length is bounded by daily activity; the "
        "regex runs data-parallel per session string, one shuffle to "
        "sessionize, one to roll up per user.",
    tags=("temporal", "pattern", "regex", "aggregate", "topk"),
)
def sequence_pattern_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_tables(spark, sf_dir, "events")["events"]
    w = Window.partitionBy("user_id", F.to_date("ts")).orderBy(
        "ts", "event_id"
    )
    seq = ev.select(
        "user_id",
        F.to_date("ts").alias("day"),
        F.substring("event_type", 1, 1).alias("ch"),
        F.row_number().over(w).alias("rn"),
    )
    paths = seq.groupBy("user_id", "day").agg(
        F.concat_ws(
            "",
            F.array_sort(F.collect_list(F.struct("rn", "ch"))).getField(
                "ch"
            ),
        ).alias("path")
    )
    scored = paths.select(
        "user_id",
        F.size(
            F.expr(f"regexp_extract_all(path, '{SEQPAT_STRICT}', 0)")
        ).alias("strict_n"),
        F.col("path").rlike(SEQPAT_GAPPED).cast("long").alias("gapped"),
    )
    return (
        scored.groupBy("user_id")
        .agg(
            F.sum("strict_n").cast("long").alias("strict_matches"),
            F.sum("gapped").cast("long").alias("days_with_funnel"),
            F.count(F.lit(1)).cast("long").alias("n_days"),
        )
        .orderBy(F.col("strict_matches").desc(), "user_id")
        .limit(SEQPAT_TOP_K)
    )


# ---------------------------------------------------------------------------
# Funnel latency distribution (as-of gap percentiles)
# ---------------------------------------------------------------------------

_FUNNEL_LAT_ORACLE = """
WITH g AS (
  SELECT epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
  FROM (SELECT * FROM events WHERE event_type = 'purchase') p
  ASOF JOIN (SELECT * FROM events WHERE event_type = 'view') c
    ON p.user_id = c.user_id AND p.ts >= c.ts
),
n AS (
  SELECT COUNT(*) AS n_purchases FROM events WHERE event_type = 'purchase'
)
SELECT n.n_purchases,
       CAST(COUNT(*) AS BIGINT) AS n_matched,
       -- den-scaled interpolated quantiles are exact integers
       -- (lo*(den-rem) + hi*rem over integer microsecond gaps); both
       -- engines' float interpolation sits within ~1e-2 of that
       -- integer at 1e12 magnitude, so ROUND recovers it exactly —
       -- no engine-interpolated float ever reaches the hash (the r7
       -- cogroup-median lesson)
       CAST(ROUND(2 * quantile_cont(gap_us, 0.5)) AS BIGINT)
         AS p50_us_x2,
       CAST(ROUND(10 * quantile_cont(gap_us, 0.9)) AS BIGINT)
         AS p90_us_x10,
       CAST(ROUND(100 * quantile_cont(gap_us, 0.99)) AS BIGINT)
         AS p99_us_x100,
       CAST(MAX(gap_us) AS BIGINT) AS max_gap_us
FROM g CROSS JOIN n
GROUP BY n.n_purchases
"""


@register(
    "funnel_latency_percentiles",
    oracle=_FUNNEL_LAT_ORACLE,
    doc="Funnel LATENCY distribution: for every purchase, the gap to "
        "the latest preceding view by the same user (the engine's "
        "as-of join — union + ordered window, one shuffle), "
        "summarized as den-scaled interpolated p50/p90/p99 "
        "microsecond integers — 'how long does consideration take', "
        "the metric funnel COUNTS can't answer. Gaps are exact "
        "integer microseconds; scaling the interpolated quantile by "
        "its denominator (x2/x10/x100) lands on an exact integer "
        "that BOTH engines' float interpolation rounds to, so no "
        "engine-divergent float reaches the value hash "
        "(tools/env_sensitivity_audit.py class MEDIAN_INTERP). At "
        "extreme volumes the percentile step swaps for the GK "
        "sketch with its rank-error certificate "
        "(approx_quantile_rank_bounds pattern).",
    tags=("temporal", "funnel", "asof", "percentile", "aggregate"),
)
def funnel_latency_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    views = ev.where(F.col("event_type") == "view").select(
        "user_id", "ts"
    )
    j = asof_join(
        purchases,
        views,
        key="user_id",
        left_ts="purchase_ts",
        right_ts="ts",
        payload=["ts"],
    )
    g = j.select(
        (F.unix_micros("purchase_ts") - F.unix_micros("asof_ts")).alias(
            "gap_us"
        )
    )
    n = g.agg(F.count(F.lit(1)).alias("n_purchases"))
    matched = g.where(F.col("gap_us").isNotNull())
    agg = matched.agg(
        F.count(F.lit(1)).alias("n_matched"),
        F.round(F.expr("percentile(gap_us, 0.5)") * 2)
        .cast("long")
        .alias("p50_us_x2"),
        F.round(F.expr("percentile(gap_us, 0.9)") * 10)
        .cast("long")
        .alias("p90_us_x10"),
        F.round(F.expr("percentile(gap_us, 0.99)") * 100)
        .cast("long")
        .alias("p99_us_x100"),
        F.max("gap_us").cast("long").alias("max_gap_us"),
    )
    return n.crossJoin(F.broadcast(agg)).select(
        "n_purchases",
        "n_matched",
        "p50_us_x2",
        "p90_us_x10",
        "p99_us_x100",
        "max_gap_us",
    )


# ---------------------------------------------------------------------------
# Time-in-state accounting (telemetry state-duration rollup)
# ---------------------------------------------------------------------------


@register(
    "state_duration_accounting",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type, epoch_us(ts) AS t,
         LEAD(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS next_t
  FROM events
)
SELECT event_type AS state,
       CAST(COUNT(next_t) AS BIGINT) AS n_intervals,
       CAST(SUM(next_t - t) // 1000000 AS BIGINT) AS total_seconds,
       CAST(SUM(next_t - t) // COUNT(next_t) AS BIGINT)
         AS mean_interval_us
FROM seq WHERE next_t IS NOT NULL
GROUP BY event_type
""",
    doc="Time-in-state accounting — the telemetry rollup behind "
        "'how long do users sit in each status': each event opens a "
        "state that lasts until the user's NEXT event (lead over the "
        "(ts, event_id) total order), and durations roll up per "
        "state — device fleets, ticket workflows, and session "
        "analysis all reduce to this lag-attribution shape. Exact "
        "integer microseconds end to end (integer division for the "
        "reported seconds/means — both engines floor identically; "
        "float division would round differently on the CAST). One "
        "window shuffle on user_id, one rollup on the 5-value state "
        "key.",
    tags=("temporal", "state", "window", "aggregate"),
)
def state_duration_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_tables(spark, sf_dir, "events")["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.unix_micros("ts").alias("t"),
        F.lead(F.unix_micros("ts")).over(w).alias("next_t"),
    ).where(F.col("next_t").isNotNull())
    return seq.groupBy(F.col("event_type").alias("state")).agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.expr("sum(next_t - t) div 1000000").cast("long").alias(
            "total_seconds"
        ),
        F.expr("sum(next_t - t) div count(1)").cast("long").alias(
            "mean_interval_us"
        ),
    )


# ---------------------------------------------------------------------------
# Peak concurrency by day: distributed sweep line (two-pass prefix sum)
# ---------------------------------------------------------------------------


@register(
    "peak_concurrency_by_day",
    oracle="""
WITH iv AS (
  SELECT user_id, DATE_TRUNC('day', ts) AS day, MIN(ts) AS s, MAX(ts) AS e
  FROM events GROUP BY user_id, DATE_TRUNC('day', ts)
),
d AS (
  SELECT day, s AS ts, 1 AS delta FROM iv
  UNION ALL
  SELECT day, e AS ts, -1 AS delta FROM iv
),
r AS (
  SELECT day, ts,
         SUM(delta) OVER (PARTITION BY day ORDER BY ts, delta DESC) AS running
  FROM d
),
p AS (SELECT day, MAX(running) AS peak FROM r GROUP BY day),
sel AS (
  SELECT r.day, MIN(r.ts) AS peak_ts
  FROM r JOIN p ON r.day = p.day AND r.running = p.peak
  GROUP BY r.day
),
cnt AS (SELECT day, COUNT(*) AS n_intervals FROM iv GROUP BY day)
SELECT cnt.day AS day,
       CAST(cnt.n_intervals AS BIGINT) AS n_intervals,
       CAST(p.peak AS BIGINT) AS peak_concurrency,
       sel.peak_ts AS peak_ts
FROM cnt JOIN p ON p.day = cnt.day JOIN sel ON sel.day = cnt.day
""",
    doc="Per-day PEAK CONCURRENCY of user activity intervals (per-user "
        "daily [first event, last event] spans) by the sweep-line "
        "+1/-1 running sum — the max-concurrent-sessions / capacity "
        "planning primitive. Spark computes the running sum as a "
        "DISTRIBUTED TWO-PASS PREFIX SUM (the generalization of the "
        "bucketed-offsets rank): pass 1 aggregates net deltas per "
        "(day, hour) and computes cumulative hour offsets with a "
        "window over each day's <=24-row hour list; pass 2 runs the "
        "running sum only WITHIN (day, hour) partitions and adds the "
        "offset — so no partition ever exceeds one hour of one day "
        "regardless of total scale, where a naive per-day window "
        "would concentrate a full day of a 100 TB stream on one "
        "executor. Tie handling is deterministic by construction: "
        "the default RANGE frame gives every row of a (ts, delta) "
        "tie block the block-end prefix value in both engines, and "
        "starts sort before ends (delta DESC) so intervals touching "
        "at an instant count as concurrent. The oracle runs the "
        "textbook single-window sweep — feasible at gate scale, "
        "which is exactly why the two-pass form exists at real "
        "scale. Output: per day, the interval count, the peak, and "
        "the earliest instant attaining it.",
    tags=("temporal", "window", "aggregate", "scale"),
)
def peak_concurrency_by_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    iv = ev.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).agg(F.min("ts").alias("s"), F.max("ts").alias("e"))
    d = iv.select(
        "day", F.col("s").alias("ts"), F.lit(1).alias("delta")
    ).unionAll(
        iv.select("day", F.col("e").alias("ts"), F.lit(-1).alias("delta"))
    ).withColumn("hr", F.hour("ts"))
    # pass 1: net delta per (day, hour); cumulative offsets over each
    # day's <=24-row hour list — bounded by construction
    hourly = d.groupBy("day", "hr").agg(F.sum("delta").alias("net"))
    ow = (
        Window.partitionBy("day")
        .orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off = hourly.select(
        "day", "hr", F.coalesce(F.sum("net").over(ow), F.lit(0)).alias("off")
    )
    # pass 2: running sum within (day, hour) only + the hour offset.
    # Default RANGE frame: every row of a (ts, delta) tie block gets
    # the block-end value — deterministic per row in both engines.
    rw = Window.partitionBy("day", "hr").orderBy(
        F.col("ts").asc(), F.col("delta").desc()
    )
    r = d.join(off, ["day", "hr"]).select(
        "day", "ts", (F.col("off") + F.sum("delta").over(rw)).alias("running")
    )
    p = r.groupBy("day").agg(F.max("running").alias("peak"))
    sel = (
        r.join(p, "day")
        .where(F.col("running") == F.col("peak"))
        .groupBy("day")
        .agg(F.min("ts").alias("peak_ts"))
    )
    cnt = iv.groupBy("day").agg(F.count(F.lit(1)).alias("n_intervals"))
    return (
        cnt.join(p, "day")
        .join(sel, "day")
        .select(
            "day",
            F.col("n_intervals").cast("long").alias("n_intervals"),
            F.col("peak").cast("long").alias("peak_concurrency"),
            "peak_ts",
        )
    )


# ---------------------------------------------------------------------------
# Markov-chain attribution: removal effect of each touch channel
# ---------------------------------------------------------------------------

MARKOV_ITERS = 8  # fixed absorption iterations: deterministic replay
MARKOV_CHANNELS = ("click", "error", "signup", "view")


def _markov_transitions_sql() -> str:
    """Journey -> transition-count CTEs shared by the oracle."""
    return """
ev AS (
  SELECT user_id, DATE_TRUNC('day', ts) AS day, ts, event_id, event_type
  FROM events
),
fp AS (
  SELECT user_id, day, MIN(ts) AS pts
  FROM ev WHERE event_type = 'purchase' GROUP BY user_id, day
),
j AS (
  SELECT e.user_id, e.day, e.ts, e.event_id, e.event_type, fp.pts
  FROM ev e LEFT JOIN fp ON fp.user_id = e.user_id AND fp.day = e.day
  WHERE e.event_type <> 'purchase' AND (fp.pts IS NULL OR e.ts < fp.pts)
),
seq AS (
  SELECT *,
         LEAD(event_type) OVER w AS nxt,
         ROW_NUMBER() OVER w AS rn
  FROM j
  WINDOW w AS (PARTITION BY user_id, day ORDER BY ts, event_id)
),
trans AS (
  SELECT 'START' AS src, event_type AS dst FROM seq WHERE rn = 1
  UNION ALL
  SELECT event_type, nxt FROM seq WHERE nxt IS NOT NULL
  UNION ALL
  SELECT event_type,
         CASE WHEN pts IS NOT NULL THEN 'CONV' ELSE 'DROP' END
  FROM seq WHERE nxt IS NULL
  UNION ALL
  SELECT 'START', 'CONV'
  FROM fp LEFT JOIN (SELECT DISTINCT user_id, day FROM j) jj
    ON jj.user_id = fp.user_id AND jj.day = fp.day
  WHERE jj.user_id IS NULL
),
cnt AS (SELECT src, dst, COUNT(*) AS c FROM trans GROUP BY src, dst),
norm AS (
  SELECT src, dst,
         c * 1.0 / SUM(c) OVER (PARTITION BY src) AS p
  FROM cnt
),
variants(v) AS (VALUES ('base'), ('click'), ('error'), ('signup'), ('view')),
pv AS (
  SELECT v, src,
         CASE WHEN v <> 'base' AND dst = v THEN 'DROP' ELSE dst END AS dst,
         p
  FROM norm CROSS JOIN variants
  WHERE v = 'base' OR src <> v
)"""


def _markov_oracle() -> str:
    cur = "p0 AS (SELECT v, src, 0.0 AS p FROM pv GROUP BY v, src)"
    ctes = [cur]
    prev = "p0"
    for k in range(1, MARKOV_ITERS + 1):
        ctes.append(f"""
p{k} AS (
  SELECT pv.v, pv.src,
         SUM(pv.p * CASE WHEN pv.dst = 'CONV' THEN 1.0
                         WHEN pv.dst = 'DROP' THEN 0.0
                         ELSE COALESCE(q.p, 0.0) END) AS p
  FROM pv LEFT JOIN {prev} q ON q.v = pv.v AND q.src = pv.dst
  GROUP BY pv.v, pv.src
)""")
        prev = f"p{k}"
    return f"""
WITH {_markov_transitions_sql()},
{','.join(ctes)},
base AS (SELECT p FROM {prev} WHERE v = 'base' AND src = 'START'),
rem AS (
  SELECT v AS channel, p AS conv_wo_channel
  FROM {prev} WHERE v <> 'base' AND src = 'START'
),
re AS (
  SELECT channel, conv_wo_channel,
         1.0 - conv_wo_channel / (SELECT p FROM base) AS effect
  FROM rem
)
SELECT channel,
       ROUND((SELECT p FROM base), 6) AS base_conv_prob,
       ROUND(conv_wo_channel, 6) AS conv_wo_channel,
       ROUND(effect, 6) AS removal_effect,
       ROUND(effect / SUM(effect) OVER (), 6) AS attribution_share
FROM re
"""


@register(
    "markov_attribution_removal",
    oracle=_markov_oracle(),
    doc=f"Markov-chain multi-touch attribution by REMOVAL EFFECT — the "
        "data-driven attribution model that replaces heuristic "
        "linear/first/last credit: per (user, day) journeys (events "
        "before the first purchase, truncated there) become a "
        "START/channel/CONV/DROP transition matrix; conversion "
        "probability from START is the absorbing-chain fixpoint, "
        f"estimated by {MARKOV_ITERS} fixed iterations; each "
        "channel's removal effect is 1 - conv(chain with that "
        "channel's inbound mass redirected to DROP)/conv(base), "
        "normalized into attribution shares. Scale shape: the ONLY "
        "data-sized work is the journey/transition extraction (one "
        "partitioned LEAD window + one groupBy); the matrix is "
        "<= (|channels|+1) x (|channels|+2) rows, so all 5 chain "
        "variants iterate TOGETHER as one variant-keyed tiny "
        "DataFrame (localCheckpointed once; "
        f"{MARKOV_ITERS} broadcast join+agg rounds touch only it). "
        "The DuckDB oracle replays the identical iterations as "
        "generated chained CTEs (the PageRank replay pattern), so "
        "the hash match certifies journey extraction, normalization, "
        "redirect, and every absorption round cross-engine.",
    tags=("temporal", "attribution", "learn", "iterative", "aggregate"),
)
def markov_attribution_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"].select(
        "user_id",
        F.date_trunc("day", "ts").alias("day"),
        "ts",
        "event_id",
        "event_type",
    )
    fp = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id", "day")
        .agg(F.min("ts").alias("pts"))
    )
    j = (
        ev.join(fp, ["user_id", "day"], "left")
        .where(
            (F.col("event_type") != "purchase")
            & (F.col("pts").isNull() | (F.col("ts") < F.col("pts")))
        )
    )
    w = Window.partitionBy("user_id", "day").orderBy("ts", "event_id")
    seq = j.select(
        "user_id",
        "day",
        "event_type",
        "pts",
        F.lead("event_type").over(w).alias("nxt"),
        F.row_number().over(w).alias("rn"),
    )
    trans = (
        seq.where(F.col("rn") == 1)
        .select(F.lit("START").alias("src"), F.col("event_type").alias("dst"))
        .unionAll(
            seq.where(F.col("nxt").isNotNull()).select(
                F.col("event_type").alias("src"), F.col("nxt").alias("dst")
            )
        )
        .unionAll(
            seq.where(F.col("nxt").isNull()).select(
                F.col("event_type").alias("src"),
                F.when(F.col("pts").isNotNull(), F.lit("CONV"))
                .otherwise(F.lit("DROP"))
                .alias("dst"),
            )
        )
        .unionAll(  # purchase-only journeys: START -> CONV directly
            fp.join(
                j.select("user_id", "day").distinct(),
                ["user_id", "day"],
                "left_anti",
            ).select(F.lit("START").alias("src"), F.lit("CONV").alias("dst"))
        )
    )
    cnt = trans.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("c"))
    sw = Window.partitionBy("src")
    norm = cnt.select(
        "src", "dst", (F.col("c") * 1.0 / F.sum("c").over(sw)).alias("p")
    )
    variants = spark.createDataFrame(
        [("base",)] + [(c,) for c in MARKOV_CHANNELS], "v string"
    )
    # tiny variant-keyed matrix, materialized ONCE for all iterations
    pv = (
        norm.crossJoin(F.broadcast(variants))
        .where((F.col("v") == "base") | (F.col("src") != F.col("v")))
        .select(
            "v",
            "src",
            F.when(
                (F.col("v") != "base") & (F.col("dst") == F.col("v")),
                F.lit("DROP"),
            )
            .otherwise(F.col("dst"))
            .alias("dst"),
            "p",
        )
        .localCheckpoint()
    )
    p = pv.groupBy("v", "src").agg(F.lit(0.0).alias("p"))
    for _ in range(MARKOV_ITERS):
        q = p.select(
            F.col("v").alias("qv"),
            F.col("src").alias("qs"),
            F.col("p").alias("qp"),
        )
        p = (
            pv.join(
                F.broadcast(q),
                (F.col("qv") == F.col("v")) & (F.col("qs") == F.col("dst")),
                "left",
            )
            .groupBy("v", "src")
            .agg(
                F.sum(
                    F.col("p")
                    * F.when(F.col("dst") == "CONV", F.lit(1.0))
                    .when(F.col("dst") == "DROP", F.lit(0.0))
                    .otherwise(F.coalesce(F.col("qp"), F.lit(0.0)))
                ).alias("p")
            )
        )
    start = p.where(F.col("src") == "START")
    base = start.where(F.col("v") == "base").select(F.col("p").alias("base_p"))
    rem = start.where(F.col("v") != "base").select(
        F.col("v").alias("channel"), F.col("p").alias("conv_wo_channel")
    )
    re_ = rem.crossJoin(F.broadcast(base)).select(
        "channel",
        "base_p",
        "conv_wo_channel",
        (F.lit(1.0) - F.col("conv_wo_channel") / F.col("base_p")).alias(
            "effect"
        ),
    )
    tw = Window.partitionBy()  # 4-row normalizer over the channel list
    return re_.select(
        "channel",
        F.round("base_p", 6).alias("base_conv_prob"),
        F.round("conv_wo_channel", 6).alias("conv_wo_channel"),
        F.round("effect", 6).alias("removal_effect"),
        F.round(F.col("effect") / F.sum("effect").over(tw), 6).alias(
            "attribution_share"
        ),
    )


# ---------------------------------------------------------------------------
# Feature-store point-in-time join: one spine, several feature tables
# ---------------------------------------------------------------------------


@register(
    "feature_store_pit_join",
    oracle="""
SELECT p.event_id AS purchase_id,
       p.user_id,
       p.ts AS purchase_ts,
       c.ts AS click_ts,
       c.value AS click_value,
       EPOCH_US(p.ts) - EPOCH_US(c.ts) AS click_staleness_us,
       v.ts AS view_ts,
       v.value AS view_value,
       EPOCH_US(p.ts) - EPOCH_US(v.ts) AS view_staleness_us
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON p.user_id = v.user_id AND p.ts >= v.ts
""",
    doc="Feature-store POINT-IN-TIME join: every purchase (the label "
        "spine) picks up the latest value of TWO feature tables "
        "(clicks, views) as of its own timestamp, plus per-feature "
        "staleness in exact microseconds — the no-future-leakage "
        "training-set assembly every ML backfill needs. Composition "
        "of the engine's union+window as-of join, once per feature "
        "table: each feature adds ONE shuffle on the entity key "
        "(never a pair blowup), features with no history stay NULL, "
        "and the whole plan co-partitions on user_id so N feature "
        "tables cost N co-located window passes at 100 TB. The "
        "oracle is DuckDB's native chained ASOF LEFT JOIN, so the "
        "hash match certifies the at-or-before semantics (equal "
        "timestamps visible) for both features and the staleness "
        "arithmetic.",
    tags=("temporal", "asof", "join", "pipeline"),
)
def feature_store_pit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    spine = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.col("ts").alias("click_ts"),
        F.col("value").alias("click_value"),
    )
    views = ev.where(F.col("event_type") == "view").select(
        "user_id",
        "ts",
        F.col("ts").alias("view_ts"),
        F.col("value").alias("view_value"),
    )
    out = asof_join(
        spine, clicks, "user_id", "purchase_ts", "ts",
        ["click_ts", "click_value"],
    )
    out = asof_join(
        out, views, "user_id", "purchase_ts", "ts",
        ["view_ts", "view_value"],
    )
    return out.select(
        "purchase_id",
        "user_id",
        "purchase_ts",
        F.col("asof_click_ts").alias("click_ts"),
        F.col("asof_click_value").alias("click_value"),
        (
            F.unix_micros("purchase_ts") - F.unix_micros("asof_click_ts")
        ).alias("click_staleness_us"),
        F.col("asof_view_ts").alias("view_ts"),
        F.col("asof_view_value").alias("view_value"),
        (
            F.unix_micros("purchase_ts") - F.unix_micros("asof_view_ts")
        ).alias("view_staleness_us"),
    )


# ---------------------------------------------------------------------------
# TWAP: time-weighted average value per (event_type, day)
# ---------------------------------------------------------------------------


@register(
    "twap_value_by_type_day",
    oracle="""
WITH e AS (
  SELECT event_type, DATE_TRUNC('day', ts) AS day,
         EPOCH_US(ts) AS us,
         CAST(ROUND(value * 100) AS BIGINT) AS cents,
         event_id
  FROM events
),
seg AS (
  SELECT event_type, day, cents,
         LEAD(us) OVER (PARTITION BY event_type, day
                        ORDER BY us, event_id) - us AS dur
  FROM e
),
agg AS (
  SELECT event_type, day,
         COUNT(*) AS n_events,
         SUM(CASE WHEN dur IS NULL THEN 0
                  ELSE CAST(cents AS HUGEINT) * dur END) AS wsum,
         SUM(COALESCE(dur, 0)) AS span_us
  FROM seg GROUP BY event_type, day
)
SELECT event_type, day,
       CAST(n_events AS BIGINT) AS n_events,
       CAST(span_us AS BIGINT) AS span_us,
       ROUND(CAST(wsum AS DOUBLE) / CAST(span_us AS DOUBLE) / 100.0, 6)
         AS twap
FROM agg WHERE span_us > 0
""",
    doc="TWAP (time-weighted average value) per (event_type, day): "
        "each observation's value holds until the next observation "
        "(piecewise-constant carry), so the average weights values "
        "by their holding DURATION, not their count — the standard "
        "metric wherever sampling is irregular (price feeds, gauge "
        "metrics, queue depths) and the plain AVG over-weights bursts. "
        "Exact arithmetic end to end: values are 2-dp (integer "
        "cents), durations are integer microseconds from one "
        "partitioned LEAD window, and the weighted sum accumulates "
        "as DECIMAL(38,0)/HUGEINT — only the final ratio drops to "
        "double (two correctly-rounded ops, identical cross-engine). "
        "Groups whose observations all share one instant (zero "
        "span) are excluded by both engines. Scale: one window + "
        "one aggregate, both partitioned by (type, day).",
    tags=("temporal", "window", "aggregate", "time"),
)
def twap_value_by_type_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    e = ev.select(
        "event_type",
        F.date_trunc("day", "ts").alias("day"),
        F.unix_micros("ts").alias("us"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        "event_id",
    )
    w = Window.partitionBy("event_type", "day").orderBy("us", "event_id")
    seg = e.select(
        "event_type",
        "day",
        "cents",
        (F.lead("us").over(w) - F.col("us")).alias("dur"),
    )
    agg = seg.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(
            F.when(F.col("dur").isNull(), F.lit(0).cast("decimal(38,0)"))
            .otherwise(
                F.col("cents").cast("decimal(38,0)") * F.col("dur")
            )
        ).alias("wsum"),
        F.sum(F.coalesce("dur", F.lit(0))).alias("span_us"),
    )
    return agg.where(F.col("span_us") > 0).select(
        "event_type",
        "day",
        F.col("n_events").cast("long").alias("n_events"),
        F.col("span_us").cast("long").alias("span_us"),
        F.round(
            F.col("wsum").cast("double")
            / F.col("span_us").cast("double")
            / 100.0,
            6,
        ).alias("twap"),
    )


# ---------------------------------------------------------------------------
# Exact Shapley-value channel attribution (coalition-coverage model)
# ---------------------------------------------------------------------------

SHAP_ROUND = 6

# factorials 0!..8! — the coalition grid is 2^n for n = |channels|
# (bounded by the event-type vocabulary), so a CASE over bit_count
# keeps every weight an exact integer on both engines
_FACT = [1, 1, 2, 6, 24, 120, 720, 5040, 40320]


def _fact_case(expr: str) -> str:
    return (
        "CASE " + " ".join(
            f"WHEN {expr} = {k} THEN {v}" for k, v in enumerate(_FACT)
        ) + " END"
    )


_SHAPLEY_ORACLE = f"""
WITH ch AS (
  SELECT c, ROW_NUMBER() OVER (ORDER BY c) - 1 AS ci
  FROM (SELECT DISTINCT event_type AS c FROM events
        WHERE event_type <> 'purchase')
),
n AS (SELECT COUNT(*) AS n FROM ch),
touch AS (
  SELECT user_id, CAST(ts AS DATE) AS d,
         CAST(SUM(DISTINCT 1 << ci) AS BIGINT) AS mask
  FROM (SELECT DISTINCT user_id, CAST(ts AS DATE) AS ts, event_type
        FROM events WHERE event_type <> 'purchase') e
  JOIN ch ON ch.c = e.event_type
  GROUP BY 1, 2
),
conv AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
  FROM events WHERE event_type = 'purchase'
),
mstats AS (
  SELECT t.mask, CAST(COUNT(*) AS BIGINT) AS n_paths,
         CAST(SUM(CASE WHEN conv.user_id IS NULL THEN 0 ELSE 1 END)
              AS BIGINT) AS n_conv
  FROM touch t LEFT JOIN conv ON conv.user_id = t.user_id AND conv.d = t.d
  GROUP BY 1
),
coal AS (
  SELECT UNNEST(RANGE(0, 1 << n)) AS t FROM n
),
v AS (
  SELECT coal.t,
         CAST(COALESCE(SUM(m.n_conv), 0) AS BIGINT) AS vt
  FROM coal LEFT JOIN mstats m ON (m.mask & coal.t) = m.mask
  GROUP BY 1
),
contrib AS (
  SELECT ch.c AS channel, n.n,
         {_fact_case("BIT_COUNT(v0.t)")}
           * {_fact_case("n.n - 1 - BIT_COUNT(v0.t)")}
           * (v1.vt - v0.vt) AS w
  FROM ch CROSS JOIN n
  JOIN v v0 ON ((v0.t >> ch.ci) & 1) = 0
  JOIN v v1 ON v1.t = (v0.t | (1 << ch.ci))
)
SELECT channel,
       CAST(MIN(n) AS BIGINT) AS n_channels,
       CAST(SUM(w) AS BIGINT) AS shapley_num,
       ROUND(CAST(SUM(w) AS DOUBLE) / {_fact_case("MIN(n)")},
             {SHAP_ROUND}) AS shapley_conversions
FROM contrib
GROUP BY channel
"""


@register(
    "shapley_attribution_exact",
    oracle=_SHAPLEY_ORACLE,
    doc="EXACT Shapley-value attribution of conversions to touch "
        "channels under the coalition-coverage value function "
        "v(T) = converted (user, day) paths whose touched-channel set "
        "is a subset of T — the game-theoretic gold standard the "
        "Markov removal-effect model approximates. Exactness is "
        "affordable because the coalition lattice is 2^|channels| "
        "(channels = the bounded event-type vocabulary, never users "
        "or rows): ONE distinct-aggregate over events folds every "
        "path to a channel BITMASK, per-mask conversion counts are a "
        "tiny table, v(T) is a subset-sum over that table, and the "
        "Shapley sum Σ |T|!(n-1-|T|)!(v(T∪c)-v(T)) runs over the "
        "n·2^(n-1) lattice rows entirely in exact integer math (the "
        "factorial weights via a CASE over bit_count) — one exactly- "
        "rounded division by n! at the end. At 100 TB only the mask "
        "fold touches data; everything after is O(2^n) broadcast "
        "rows. shapley_num certifies the integer numerator "
        "bit-for-bit; shapley_conversions is the conventional "
        "report.",
    tags=("temporal", "attribution", "statistics", "aggregate"),
)
def shapley_attribution_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    ch = (
        ev.where(F.col("event_type") != "purchase")
        .select(F.col("event_type").alias("c"))
        .distinct()
    )
    # bit index per channel: window over the <=|event types| channel
    # dim. Eagerly checkpointed — chx is reused by the mask fold, the
    # count, and the final lattice join, and without materialization
    # each reuse re-plans a full events scan (10 scans of the fact
    # table in the naive plan; 3 with the two bounded checkpoints).
    wc = Window.orderBy("c")
    chx = ch.select(
        "c", (F.row_number().over(wc) - 1).alias("ci")
    ).localCheckpoint(eager=True)
    n_df = chx.agg(F.count(F.lit(1)).alias("n"))
    touch = (
        ev.where(F.col("event_type") != "purchase")
        .select(
            "user_id",
            F.to_date("ts").alias("d"),
            F.col("event_type").alias("c"),
        )
        .distinct()
        .join(F.broadcast(chx), "c")
        .groupBy("user_id", "d")
        .agg(F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), ci)")).alias("mask"))
    )
    conv = (
        ev.where(F.col("event_type") == "purchase")
        .select("user_id", F.to_date("ts").alias("d"))
        .distinct()
        .withColumn("cv", F.lit(1))
    )
    # <= 2^n rows; checkpointed so the subset-sum and both lattice
    # sides read a leaf instead of re-scanning events
    mstats = (
        touch.join(conv, ["user_id", "d"], "left")
        .groupBy("mask")
        .agg(
            F.count(F.lit(1)).alias("n_paths"),
            F.sum(F.coalesce(F.col("cv"), F.lit(0))).alias("n_conv"),
        )
        .localCheckpoint(eager=True)
    )
    # coalition lattice: 2^n rows from the one-row channel count
    coal = n_df.select(
        F.explode(
            F.sequence(F.lit(0), F.expr("shiftleft(CAST(1 AS BIGINT), n) - 1"))
        ).alias("t")
    )
    v = (
        coal.join(
            F.broadcast(mstats),
            F.expr("(mask & t) = mask"),
            "left",
        )
        .groupBy("t")
        .agg(F.coalesce(F.sum("n_conv"), F.lit(0)).cast("long").alias("vt"))
    )
    v0 = v.select(F.col("t"), F.col("vt").alias("v0"))
    v1 = v.select(F.col("t").alias("t1"), F.col("vt").alias("v1"))
    fact = "CASE " + " ".join(
        f"WHEN {{0}} = {k} THEN {w}" for k, w in enumerate(_FACT)
    ) + " END"
    contrib = (
        chx.crossJoin(F.broadcast(n_df))
        .join(F.broadcast(v0), F.expr("((t >> ci) & 1) = 0"))
        .join(
            F.broadcast(v1),
            F.expr("t1 = (t | shiftleft(CAST(1 AS BIGINT), ci))"),
        )
        .select(
            F.col("c").alias("channel"),
            "n",
            (
                F.expr(fact.format("bit_count(t)"))
                * F.expr(fact.format("n - 1 - bit_count(t)"))
                * (F.col("v1") - F.col("v0"))
            ).alias("w"),
        )
    )
    return contrib.groupBy("channel").agg(
        F.min("n").cast("long").alias("n_channels"),
        F.sum("w").cast("long").alias("shapley_num"),
        F.round(
            F.sum("w").cast("double") / F.expr(fact.format("MIN(n)")),
            SHAP_ROUND,
        ).alias("shapley_conversions"),
    )


# ---------------------------------------------------------------------------
# Allen interval-algebra relation census over daily activity spans
# ---------------------------------------------------------------------------

_ALLEN_CASE_SQL = """CASE
  WHEN ea < sb THEN 'precedes'
  WHEN ea = sb THEN 'meets'
  WHEN sa = sb AND ea = eb THEN 'equals'
  WHEN sa = sb AND ea < eb THEN 'starts'
  WHEN sa = sb THEN 'started_by'
  WHEN ea = eb AND sa < sb THEN 'finished_by'
  WHEN ea = eb THEN 'finishes'
  WHEN sa < sb AND ea > eb THEN 'contains'
  WHEN sa > sb AND ea < eb THEN 'during'
  ELSE 'overlaps'
END"""


_ALLEN_ORACLE = f"""
WITH spans AS (
  SELECT user_id, CAST(ts AS DATE) AS d, MIN(ts) AS s, MAX(ts) AS e
  FROM events GROUP BY 1, 2
),
pairs AS (
  SELECT {_ALLEN_CASE_SQL} AS relation
  FROM (SELECT a.d, a.s AS sa, a.e AS ea, b.s AS sb, b.e AS eb
        FROM spans a JOIN spans b
          ON a.d = b.d AND a.user_id < b.user_id)
)
SELECT relation, CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM pairs GROUP BY relation
"""


@register(
    "allen_interval_relations",
    oracle=_ALLEN_ORACLE,
    doc="ALLEN INTERVAL-ALGEBRA census: every same-day (user a < user "
        "b) pair of daily activity spans is classified into its Allen "
        "relation (precedes/meets/overlaps/starts/during/finishes, "
        "their inverses collapsed onto the a<b orientation, and "
        "equals) by a single CASE over the four endpoints — the "
        "temporal-reasoning primitive behind conflict detection, "
        "schedule validation, and co-presence typing that a plain "
        "overlap predicate flattens into one bit. Same TEMPORALLY "
        "BLOCKED join as user_activity_overlap_pairs (the day-key "
        "equality carries the shuffle; no cartesian) and the same "
        "ENFORCED pair budget: the shared enforce_pair_budget "
        "pre-flight raises PairBudgetExceededError on dense interval "
        "sets before any pair is evaluated. Output is bounded: one "
        "row per realized relation (<= 10 under this orientation).",
    tags=("temporal", "interval", "join", "aggregate"),
)
def allen_interval_relations(
    spark: SparkSession, sf_dir: str, budget: int | None = None
) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    spans = ev.groupBy(
        "user_id", F.to_date("ts").alias("d")
    ).agg(F.min("ts").alias("s"), F.max("ts").alias("e"))
    budget = OVERLAP_PAIR_BUDGET if budget is None else budget
    enforce_pair_budget(spans, "d", "allen_interval_relations", budget)
    # r12 (guide §2.5/§2.6): same probe-side spread as
    # user_activity_overlap_pairs — the span table is tiny pre-join
    # and AQE coalesces it to one partition, serializing the day-
    # blocked pair expansion (2.3 s single-task stage at sf0.1); the
    # build side broadcasts, so probe partitioning is free to choose.
    a = spans.repartition(spans.sparkSession.sparkContext.defaultParallelism).select(
        F.col("user_id").alias("ua"), "d",
        F.col("s").alias("sa"), F.col("e").alias("ea"),
    )
    b = spans.select(
        F.col("user_id").alias("ub"), "d",
        F.col("s").alias("sb"), F.col("e").alias("eb"),
    )
    pairs = a.join(b, ["d"]).where(F.col("ua") < F.col("ub"))
    return (
        pairs.select(F.expr(_ALLEN_CASE_SQL).alias("relation"))
        .groupBy("relation")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


# ---------------------------------------------------------------------------
# Training-label construction: return-within-window (churn) labels
# ---------------------------------------------------------------------------

CHURN_WINDOW_DAYS = 7


@register(
    "label_return_within_window",
    oracle=f"""
WITH active AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
),
lab AS (
  SELECT user_id, d,
         LEAD(d) OVER (PARTITION BY user_id ORDER BY d) AS next_d
  FROM active
)
SELECT CAST(SUM(CASE WHEN next_d IS NOT NULL
                 AND next_d - d <= {CHURN_WINDOW_DAYS}
                THEN 1 ELSE 0 END) AS BIGINT) AS n_returned,
       CAST(SUM(CASE WHEN next_d IS NOT NULL
                 AND next_d - d > {CHURN_WINDOW_DAYS}
                THEN 1 ELSE 0 END) AS BIGINT) AS n_churned,
       CAST(SUM(CASE WHEN next_d IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_censored,
       CAST(COUNT(*) AS BIGINT) AS n_examples,
       ROUND(CAST(SUM(CASE WHEN next_d IS NOT NULL
                       AND next_d - d <= {CHURN_WINDOW_DAYS}
                      THEN 1 ELSE 0 END) AS DOUBLE)
             / NULLIF(SUM(CASE WHEN next_d IS NOT NULL THEN 1 ELSE 0 END), 0),
             6) AS return_rate
FROM lab
""",
    doc=f"TRAINING-LABEL BUILDER for churn modeling: each (user, "
        "active-day) example gets the label 'returned within "
        f"{CHURN_WINDOW_DAYS} days' from the user's NEXT active day "
        "(one LEAD over a per-user window — the label join every "
        "churn/retention model needs, built without self-joining the "
        "fact table). Examples whose observation window is still open "
        "(no next activity at all) are CENSORED, counted separately "
        "rather than silently labeled churned — the right-censoring "
        "discipline Kaplan-Meier formalizes, applied at label-"
        "construction time where most pipelines get it wrong. Output "
        "is the label distribution (returned/churned/censored + "
        "return rate) — the class-balance report read before "
        "training; the per-example label table is the same plan "
        "minus the final aggregate. One distinct + one partitioned "
        "window + one aggregate; no global window, no self-join.",
    tags=("temporal", "labels", "retention", "window", "aggregate"),
)
def label_return_within_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    active = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    lab = active.withColumn("next_d", F.lead("d").over(w))
    gap = F.datediff("next_d", "d")
    returned = (F.col("next_d").isNotNull() & (gap <= CHURN_WINDOW_DAYS)).cast(
        "int"
    )
    churned = (F.col("next_d").isNotNull() & (gap > CHURN_WINDOW_DAYS)).cast(
        "int"
    )
    censored = F.col("next_d").isNull().cast("int")
    return lab.agg(
        F.sum(returned).cast("long").alias("n_returned"),
        F.sum(churned).cast("long").alias("n_churned"),
        F.sum(censored).cast("long").alias("n_censored"),
        F.count(F.lit(1)).alias("n_examples"),
        F.round(
            F.sum(returned).cast("double")
            / F.nullif(F.sum(returned + churned), F.lit(0)),
            6,
        ).alias("return_rate"),
    )


# ---------------------------------------------------------------------------
# Session featurization: per-session training feature vectors
# ---------------------------------------------------------------------------

SESS_GAP_MIN = 30  # session break: >30 min inactivity


@register(
    "session_feature_vectors",
    oracle=f"""
WITH seq AS (
  SELECT user_id, ts, event_type, value,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts,
                                      event_id)
                   > INTERVAL {SESS_GAP_MIN} MINUTE
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 IS NULL
              THEN 1 ELSE 0 END AS brk,
         event_id
  FROM events
),
sess AS (
  SELECT user_id, ts, event_type, value,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sid
  FROM seq
),
feat AS (
  SELECT user_id, sid,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
         CAST(DATEDIFF('second', MIN(ts), MAX(ts)) AS BIGINT)
           AS duration_s,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_purchases,
         COALESCE(SUM(CAST(value AS DECIMAL(18,2))), 0) AS total_value
  FROM sess GROUP BY 1, 2
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(n_events) AS BIGINT) AS total_events,
       CAST(MAX(n_events) AS BIGINT) AS max_session_events,
       CAST(SUM(CASE WHEN n_purchases > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS sessions_with_purchase,
       CAST(MAX(duration_s) AS BIGINT) AS max_duration_s,
       CAST(SUM(n_types) AS BIGINT) AS sum_types,
       CAST(SUM(total_value) AS DOUBLE) AS sum_value
FROM feat
""",
    doc=f"SESSION FEATURIZER: events split into sessions at "
        f">{SESS_GAP_MIN}-minute gaps (the standard sessionization "
        "fold: one LAG + one cumulative SUM over the same per-user "
        "window spec, one sort+shuffle), then each session is reduced "
        "to the training feature vector (event count, distinct types, "
        "duration, purchases, summed value) — the example-assembly "
        "step of every session-level model. The certified output is "
        "the corpus-level checksum view of the feature table (counts, "
        "sums, maxima — exact integers and DECIMAL-rounded value "
        "sums certify every per-session vector without emitting "
        "O(sessions) rows through the gate); the per-session table "
        "is the same plan minus the final aggregate. No global "
        "window, no self-join, value sums in DECIMAL before the "
        "single rounding.",
    tags=("temporal", "features", "sessionize", "window", "aggregate"),
)
def session_feature_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    brk = (
        prev.isNull()
        | (F.unix_micros("ts") - F.unix_micros(prev) > SESS_GAP_MIN * 60_000_000)
    ).cast("int")
    sess = ev.select(
        "user_id", "ts", "event_type", "value", "event_id"
    ).withColumn("brk", brk).withColumn(
        "sid",
        F.sum("brk").over(
            Window.partitionBy("user_id")
            .orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    feat = sess.groupBy("user_id", "sid").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count_distinct("event_type").alias("n_types"),
        (
            F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))
        ).alias("dur_us"),
        F.sum(
            (F.col("event_type") == "purchase").cast("int")
        ).alias("n_purchases"),
        F.coalesce(
            F.sum(F.col("value").cast("decimal(18,2)")), F.lit(0)
        ).alias("total_value"),
    )
    return feat.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n_events").cast("long").alias("total_events"),
        F.max("n_events").cast("long").alias("max_session_events"),
        F.sum((F.col("n_purchases") > 0).cast("int"))
        .cast("long")
        .alias("sessions_with_purchase"),
        F.max(F.expr("dur_us div 1000000")).cast("long").alias(
            "max_duration_s"
        ),
        F.sum("n_types").cast("long").alias("sum_types"),
        F.sum("total_value").cast("double").alias("sum_value"),
    )


# ---------------------------------------------------------------------------
# Sessionization parameter sweep: session counts across gap thresholds
# ---------------------------------------------------------------------------

GAP_SWEEP_MIN = (15, 30, 60)  # candidate inactivity gaps (minutes)


def _gap_sweep_sql(gap_min: int) -> str:
    return f"""
SELECT CAST({gap_min} AS BIGINT) AS gap_minutes,
       CAST(COUNT(*) AS BIGINT) + CAST((
         SELECT COUNT(DISTINCT user_id) FROM events) AS BIGINT) AS n_sessions,
       CAST((SELECT COUNT(*) FROM events) AS BIGINT) AS n_events
FROM (
  SELECT user_id, ts,
         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
)
WHERE prev IS NOT NULL
  AND ts - prev > INTERVAL {gap_min} MINUTE
"""


@register(
    "sessionization_gap_sweep",
    oracle=" UNION ALL ".join(_gap_sweep_sql(g) for g in GAP_SWEEP_MIN),
    doc="SESSIONIZATION PARAMETER SWEEP: the session count each "
        f"candidate inactivity gap {GAP_SWEEP_MIN} would produce, "
        "computed in ONE pass — sessions(gap) = users + breaks(gap), "
        "and all three break counts are conditional sums over the "
        "same LAG column, so sweeping the parameter costs one window "
        "+ one aggregate, not one sessionization per candidate (the "
        "elbow-finding run every pipeline does before fixing its gap; "
        "a 3x pass-per-candidate sweep is the naive shape this "
        "replaces). The identity sessions = users + breaks is exact "
        "because every user's first event opens a session and every "
        "gap violation opens exactly one more.",
    tags=("temporal", "sessionize", "window", "aggregate", "scale"),
)
def sessionization_gap_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lagged = ev.select(
        "user_id",
        "ts",
        F.lag("ts").over(w).alias("prev"),
    )
    gap_us = [
        (
            g,
            F.sum(
                (
                    F.col("prev").isNotNull()
                    & (
                        F.unix_micros("ts") - F.unix_micros("prev")
                        > g * 60_000_000
                    )
                ).cast("long")
            ),
        )
        for g in GAP_SWEEP_MIN
    ]
    agg = lagged.agg(
        F.count_distinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
        *[b.alias(f"breaks_{g}") for g, b in gap_us],
    )
    out = None
    for g in GAP_SWEEP_MIN:
        row = agg.select(
            F.lit(g).cast("long").alias("gap_minutes"),
            (F.col(f"breaks_{g}") + F.col("n_users"))
            .cast("long")
            .alias("n_sessions"),
            F.col("n_events").cast("long").alias("n_events"),
        )
        out = row if out is None else out.unionByName(row)
    return out


# ---------------------------------------------------------------------------
# Inter-arrival time profile: exact grouped median via the two-pass rank
# ---------------------------------------------------------------------------

IAT_BUCKET_S = 600  # 10-minute histogram buckets for the locator pass


@register(
    "interarrival_profile",
    oracle=f"""
WITH gaps AS (
  SELECT event_type,
         (EPOCH_US(ts) - EPOCH_US(LAG(ts) OVER (
           PARTITION BY user_id, event_type
           ORDER BY ts, event_id))) // 1000000 AS gap_s
  FROM events
),
g AS (SELECT event_type, gap_s FROM gaps WHERE gap_s IS NOT NULL),
r AS (
  SELECT event_type, gap_s,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY gap_s) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM g
)
SELECT event_type,
       CAST(MIN(n) AS BIGINT) AS n_gaps,
       CAST(MIN(CASE WHEN rn = CAST(CEIL(0.5 * n) AS BIGINT)
                THEN gap_s END) AS BIGINT) AS median_gap_s,
       CAST(MIN(CASE WHEN rn = CAST(CEIL(0.9 * n) AS BIGINT)
                THEN gap_s END) AS BIGINT) AS p90_gap_s,
       CAST(MIN(gap_s) AS BIGINT) AS min_gap_s,
       CAST(MAX(gap_s) AS BIGINT) AS max_gap_s
FROM r GROUP BY event_type
""",
    doc="INTER-ARRIVAL TIME profile: per event type, the EXACT median "
        "and p90 of the gaps between a user's consecutive events of "
        "that type (integer epoch-second arithmetic) — the base rates "
        "behind session-gap choices, anomaly thresholds, and queueing "
        "assumptions (exponential inter-arrivals would put p90 ~ "
        "3.3x median; heavier tails shift it). The engine side "
        "computes the order statistics with the two-pass bucket "
        "locator (10-minute histogram buckets, cumulative offsets "
        "over the tiny per-type bucket table, within-bucket "
        "row_number over ~1/bucket of the data) — no full sort; the "
        "oracle is the naive full-rank definition, feasible at gate "
        "scale, which is exactly why the two-pass form exists for "
        "the real one.",
    tags=("temporal", "statistics", "percentile", "window", "aggregate"),
)
def interarrival_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gaps = ev.select(
        "event_type",
        F.expr(
            "(unix_micros(ts) - unix_micros(lag(ts) OVER "
            "(PARTITION BY user_id, event_type ORDER BY ts, event_id)))"
            " div 1000000"
        ).alias("gap_s"),
    ).where(F.col("gap_s").isNotNull())
    d = gaps.withColumn(
        "bucket", F.expr(f"gap_s div {IAT_BUCKET_S}")
    ).localCheckpoint(eager=True)  # read by hist, extremes AND rank pass
    hist = d.groupBy("event_type", "bucket").agg(
        F.count(F.lit(1)).alias("c")
    )
    ow = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = hist.select(
        "event_type", "bucket", "c",
        F.coalesce(F.sum("c").over(ow), F.lit(0)).alias("off"),
    )
    stats = d.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("gap_s").alias("min_gap_s"),
        F.max("gap_s").alias("max_gap_s"),
    )
    out = None
    for pname, p in (("median_gap_s", 0.5), ("p90_gap_s", 0.9)):
        k = stats.select(
            "event_type",
            F.ceil(F.lit(p) * F.col("n")).cast("long").alias("k"),
        )
        located = k.join(cum, "event_type").where(
            (F.col("k") > F.col("off"))
            & (F.col("k") <= F.col("off") + F.col("c"))
        ).select("event_type", "k", "bucket", "off")
        wv = Window.partitionBy("event_type").orderBy("gap_s")
        sel = (
            d.join(F.broadcast(located), ["event_type", "bucket"])
            .withColumn("rn", F.row_number().over(wv))
            .where(F.col("rn") == F.col("k") - F.col("off"))
            .select("event_type", F.col("gap_s").alias(pname))
        )
        out = sel if out is None else out.join(sel, "event_type")
    return stats.join(out, "event_type").select(
        "event_type",
        F.col("n").cast("long").alias("n_gaps"),
        "median_gap_s",
        "p90_gap_s",
        "min_gap_s",
        "max_gap_s",
    )


# ---------------------------------------------------------------------------
# Activity streaks: gaps-and-islands over per-user active days
# ---------------------------------------------------------------------------


@register(
    "activity_streak_histogram",
    oracle="""
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
r AS (
  SELECT user_id, day,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS rn
  FROM days
),
s AS (
  SELECT user_id, day - CAST(rn AS INTEGER) AS island,
         CAST(COUNT(*) AS BIGINT) AS len
  FROM r GROUP BY 1, 2
)
SELECT len AS streak_days,
       CAST(COUNT(*) AS BIGINT) AS n_streaks,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM s GROUP BY 1
""",
    doc="ACTIVITY STREAKS via the gaps-and-islands idiom: a user's "
        "consecutive-active-day runs collapse to a constant island "
        "key (day minus the user-ordered row number — consecutive "
        "days advance both by one), so streak extraction is ONE "
        "per-user window + ONE aggregate; the output is the streak- "
        "length histogram (how many runs of each length, how many "
        "distinct users have one) that powers engagement/retention "
        "dashboards and streak-badge features. Scale: the window "
        "partitions by user_id (no global sort), the distinct and "
        "both aggregates shuffle on keys with map-side combine; "
        "cardinality after the first distinct is |user x active-day|, "
        "already << |events|.",
    tags=("temporal", "window", "aggregate", "sessionize"),
)
def activity_streak_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    days = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    islands = days.select(
        "user_id",
        F.date_sub(F.col("day"), F.row_number().over(w)).alias("island"),
    )
    streaks = islands.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("streak_days")
    )
    return streaks.groupBy("streak_days").agg(
        F.count(F.lit(1)).alias("n_streaks"),
        F.count_distinct("user_id").alias("n_users"),
    )


# ---------------------------------------------------------------------------
# Nearest-event temporal join (bidirectional as-of, min |gap|)
# ---------------------------------------------------------------------------

NEAREST_WINDOW_S = 3600  # candidate clicks within +/- 1 hour


@register(
    "asof_nearest_click_join",
    oracle=f"""
WITH p AS (
  SELECT event_id AS purchase_id, user_id, ts AS p_ts
  FROM events WHERE event_type = 'purchase'
),
c AS (
  SELECT event_id AS click_id, user_id, ts AS c_ts
  FROM events WHERE event_type = 'click'
),
cand AS (
  SELECT p.purchase_id, c.click_id,
         ABS(EPOCH_US(p.p_ts) - EPOCH_US(c.c_ts)) AS gap_us,
         CASE WHEN c.c_ts <= p.p_ts THEN 0 ELSE 1 END AS side
  FROM p JOIN c ON p.user_id = c.user_id
   AND c.c_ts >= p.p_ts - INTERVAL {NEAREST_WINDOW_S} SECONDS
   AND c.c_ts <= p.p_ts + INTERVAL {NEAREST_WINDOW_S} SECONDS
)
SELECT purchase_id,
       ARG_MIN(click_id,
               gap_us * 200000000 + side * 100000000 + click_id)
         AS nearest_click_id,
       CAST(MIN(gap_us * 200000000 + side * 100000000 + click_id)
            // 200000000 AS BIGINT) AS gap_micros,
       CAST((MIN(gap_us * 200000000 + side * 100000000 + click_id)
             % 200000000) // 100000000 AS BIGINT) AS after_purchase
FROM cand GROUP BY purchase_id
""",
    doc="NEAREST-event temporal join — the third as-of direction "
        "(backward picks the last-before, forward the first-after; "
        "this picks whichever click is CLOSEST in time, before "
        f"preferred on exact ties, within +/-{NEAREST_WINDOW_S}s): "
        "the sensor-alignment / log-correlation join shape. Plan: "
        "the bounded range join generates per-purchase candidates "
        "(user-key equi join + time band, the certified "
        "range_join_clicks shape), then ONE selector aggregate picks "
        "the winner per purchase by minimizing a single packed "
        "integer (gap, side, click_id) — no window over candidates, "
        "no second shuffle; min_by/arg_min is map-side combinable, "
        "so the nearest-neighbor choice costs the same as a COUNT at "
        "100 TB. The packed key is exact int64 (gap <= 3.6e9 us, x2e8 "
        "< 2^63; ids below 1e8 by the generator contract); gaps "
        "compare in exact integer MICROSECONDS on both engines "
        "(EPOCH_US / unix_micros — fractional-second safe).",
    tags=("join", "asof", "temporal", "selector"),
)
def asof_nearest_click_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
    )
    c = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    cand = p.join(
        c,
        (F.col("user_id") == F.col("c_user"))
        & (
            F.col("c_ts")
            >= F.col("p_ts") - F.expr(f"INTERVAL {NEAREST_WINDOW_S} SECONDS")
        )
        & (
            F.col("c_ts")
            <= F.col("p_ts") + F.expr(f"INTERVAL {NEAREST_WINDOW_S} SECONDS")
        ),
    ).select(
        "purchase_id",
        "click_id",
        # exact integer MICROSECONDS on both engines (EPOCH_US /
        # unix_micros) — DuckDB's EPOCH keeps fractional seconds while
        # Spark's unix_timestamp truncates, a sub-second divergence
        F.abs(
            F.unix_micros("p_ts") - F.unix_micros("c_ts")
        ).alias("gap_us"),
        F.when(F.col("c_ts") <= F.col("p_ts"), F.lit(0))
        .otherwise(F.lit(1))
        .alias("side"),
    )
    key = (
        F.col("gap_us") * F.lit(200_000_000)
        + F.col("side") * F.lit(100_000_000)
        + F.col("click_id")
    )
    return cand.groupBy("purchase_id").agg(
        F.min_by("click_id", key).alias("nearest_click_id"),
        (F.min(key) / F.lit(200_000_000)).cast("long").alias("gap_micros"),
        (
            F.pmod(F.min(key), F.lit(200_000_000)) / F.lit(100_000_000)
        )
        .cast("long")
        .alias("after_purchase"),
    )


# ---------------------------------------------------------------------------
# Watermark lateness profile (distributed prefix-max out-of-orderness)
# ---------------------------------------------------------------------------

WM_BLOCK = 4096  # arrival-sequence block size for the two-level scan
WM_THRESH_S = (60, 300, 3600)  # reporting thresholds: 1m / 5m / 1h


@register(
    "watermark_lateness_profile",
    oracle=f"""
WITH seq AS (
  SELECT event_id, EPOCH_US(ts) AS tus,
         MAX(EPOCH_US(ts)) OVER (ORDER BY event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS wm
  FROM events
),
late AS (SELECT event_id, wm - tus AS lateness_us FROM seq)
SELECT CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN lateness_us > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_late,
       ROUND(CAST(SUM(CASE WHEN lateness_us > 0 THEN 1 ELSE 0 END)
                  AS DOUBLE) / COUNT(*), 6) AS late_frac,
       CAST(SUM(lateness_us) AS BIGINT) AS sum_lateness_us,
       CAST(MAX(lateness_us) AS BIGINT) AS max_lateness_us,
       CAST(SUM(CASE WHEN lateness_us > CAST({WM_THRESH_S[0]} AS BIGINT) * 1000000
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_beyond_1m,
       CAST(SUM(CASE WHEN lateness_us > CAST({WM_THRESH_S[1]} AS BIGINT) * 1000000
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_beyond_5m,
       CAST(SUM(CASE WHEN lateness_us > CAST({WM_THRESH_S[2]} AS BIGINT) * 1000000
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_beyond_1h,
       CAST(CEIL(MAX(lateness_us) / 60000000.0) * 60 AS BIGINT)
         AS watermark_recommendation_s
FROM late
""",
    doc=f"WATERMARK LATENESS PROFILE — the measurement that should "
        f"precede every Structured Streaming withWatermark() choice "
        f"in this repo: treating event_id as the arrival sequence, "
        f"an event's lateness is (max event-time seen so far - its "
        f"event time), i.e. how far behind the watermark front it "
        f"arrived; the profile reports the late fraction, total/max "
        f"lateness, threshold exceedances (1m/5m/1h), and the "
        f"minute-rounded max as the zero-drop watermark delay. The "
        f"prefix max runs as the classic TWO-LEVEL SCAN "
        f"decomposition, not a single-partition window: within-block "
        f"running max (window PARTITIONED by event_id div {WM_BLOCK}) "
        f"+ per-block maxes with an exclusive prefix max across the "
        f"{WM_BLOCK}x-smaller block table, combined with GREATEST — "
        f"the same recursion applies again if the block table is "
        f"ever too large (EXPECTED_GLOBAL_WINDOW on the block level "
        f"only). The oracle runs the naive global-window definition, "
        f"so the decomposition is certified equivalent row-for-row.",
    tags=("temporal", "streaming", "window", "aggregate", "profiling"),
)
def watermark_lateness_profile(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    seq = ev.select(
        "event_id",
        F.unix_micros("ts").alias("tus"),
        (F.col("event_id") / WM_BLOCK).cast("long").alias("blk"),
    )
    win_in = Window.partitionBy("blk").orderBy("event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    within = seq.select(
        "event_id",
        "tus",
        "blk",
        F.max("tus").over(win_in).alias("in_blk_max"),
    )
    blocks = seq.groupBy("blk").agg(F.max("tus").alias("blk_max"))
    win_blk = Window.orderBy("blk").rowsBetween(
        Window.unboundedPreceding, -1
    )
    prev = blocks.select(
        "blk", F.max("blk_max").over(win_blk).alias("prev_max")
    )
    late = (
        within.join(prev, "blk")
        .select(
            (
                F.greatest(
                    F.col("in_blk_max"),
                    F.coalesce(F.col("prev_max"), F.lit(-(1 << 62))),
                )
                - F.col("tus")
            ).alias("lateness_us")
        )
    )
    thresholds = [
        F.sum(
            F.when(F.col("lateness_us") > t * 1_000_000, 1).otherwise(0)
        )
        .cast("long")
        .alias(f"n_beyond_{label}")
        for t, label in zip(WM_THRESH_S, ("1m", "5m", "1h"))
    ]
    return late.agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(F.when(F.col("lateness_us") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_late"),
        F.round(
            F.sum(F.when(F.col("lateness_us") > 0, 1).otherwise(0)).cast(
                "double"
            )
            / F.count(F.lit(1)),
            6,
        ).alias("late_frac"),
        F.sum("lateness_us").cast("long").alias("sum_lateness_us"),
        F.max("lateness_us").cast("long").alias("max_lateness_us"),
        *thresholds,
        (F.ceil(F.max("lateness_us") / 60_000_000.0) * 60)
        .cast("long")
        .alias("watermark_recommendation_s"),
    )


# ---------------------------------------------------------------------------
# Time-bounded funnel: view -> click (<=1h) -> purchase (<=24h)
# ---------------------------------------------------------------------------

TBF_VC_US = 3_600_000_000        # view->click window: 1 hour
TBF_CP_US = 86_400_000_000       # click->purchase window: 24 hours


@register(
    "funnel_time_bounded",
    oracle=f"""
WITH v AS (SELECT user_id, epoch_us(ts) AS t FROM events
           WHERE event_type = 'view'),
c AS (SELECT user_id, epoch_us(ts) AS t FROM events
      WHERE event_type = 'click'),
p AS (SELECT user_id, epoch_us(ts) AS t FROM events
      WHERE event_type = 'purchase'),
vc AS (
  SELECT DISTINCT v.user_id
  FROM v JOIN c ON c.user_id = v.user_id
   AND c.t > v.t AND c.t - v.t <= {TBF_VC_US}
),
vcp AS (
  SELECT DISTINCT vc.user_id
  FROM vc
  JOIN c ON c.user_id = vc.user_id
  JOIN v ON v.user_id = vc.user_id
   AND c.t > v.t AND c.t - v.t <= {TBF_VC_US}
  JOIN p ON p.user_id = vc.user_id
   AND p.t > c.t AND p.t - c.t <= {TBF_CP_US}
)
SELECT CAST((SELECT COUNT(DISTINCT user_id) FROM v) AS BIGINT)
         AS n_viewers,
       CAST((SELECT COUNT(*) FROM vc) AS BIGINT) AS n_clicked_1h,
       CAST((SELECT COUNT(*) FROM vcp) AS BIGINT)
         AS n_purchased_24h,
       CAST((SELECT COUNT(*) FROM vc) * 1000
            // (SELECT COUNT(DISTINCT user_id) FROM v) AS BIGINT)
         AS click_rate_pm,
       CAST((SELECT COUNT(*) FROM vcp) * 1000
            // GREATEST((SELECT COUNT(*) FROM vc), 1) AS BIGINT)
         AS purchase_rate_pm
FROM (SELECT 1)
""",
    doc="TIME-BOUNDED FUNNEL — the conversion-window semantics plain "
        "funnel COUNTS ignore: a user converts only if a click lands "
        "within 1 HOUR of some view AND a purchase within 24 HOURS "
        "of a qualifying click (marketing attribution contracts are "
        "written in exactly these windows). Stage membership is per "
        "USER (distinct), rates in exact integer per-mille. The "
        "oracle certifies the chained interval joins; the engine "
        "side blocks each stage join by user_id so the time "
        "predicates never see a cartesian. Complements "
        "funnel_view_click_purchase (unbounded ordering) and "
        "funnel_latency_percentiles (gap distribution). Scale: three "
        "user-keyed equi-joins; per-user event lists bound the "
        "interval checks.",
    tags=("funnel", "temporal", "join", "aggregate"),
)
def funnel_time_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]

    def stage(et):
        return ev.where(F.col("event_type") == et).select(
            "user_id", F.unix_micros("ts").alias("t")
        )

    v, c, p = stage("view"), stage("click"), stage("purchase")
    vt = v.select("user_id", F.col("t").alias("vt"))
    ct = c.select("user_id", F.col("t").alias("ct"))
    pt = p.select("user_id", F.col("t").alias("pt"))
    vc = (
        vt.join(ct, "user_id")
        .where(
            (F.col("ct") > F.col("vt"))
            & (F.col("ct") - F.col("vt") <= TBF_VC_US)
        )
        .select("user_id")
        .distinct()
        .persist()
    )
    qualified_clicks = (
        vt.join(ct, "user_id")
        .where(
            (F.col("ct") > F.col("vt"))
            & (F.col("ct") - F.col("vt") <= TBF_VC_US)
        )
        .select("user_id", "ct")
        .distinct()
    )
    vcp = (
        qualified_clicks.join(pt, "user_id")
        .where(
            (F.col("pt") > F.col("ct"))
            & (F.col("pt") - F.col("ct") <= TBF_CP_US)
        )
        .select("user_id")
        .distinct()
    )
    n_viewers = v.select("user_id").distinct().count()
    n_vc = vc.count()
    n_vcp = vcp.count()
    vc.unpersist()
    return spark.createDataFrame(
        [
            (
                n_viewers,
                n_vc,
                n_vcp,
                n_vc * 1000 // n_viewers,
                n_vcp * 1000 // max(n_vc, 1),
            )
        ],
        "n_viewers long, n_clicked_1h long, n_purchased_24h long, "
        "click_rate_pm long, purchase_rate_pm long",
    )


# ---------------------------------------------------------------------------
# Business-day shipping lag (closed-form weekend exclusion)
# ---------------------------------------------------------------------------

BDL_SLA_BDAYS = 5  # ship-within SLA measured in business days


@register(
    "business_day_shipping_lag",
    oracle=f"""
WITH lag AS (
  SELECT o.o_orderpriority AS pri,
         DATEDIFF('day', DATE '1970-01-01', CAST(o.o_orderdate AS DATE))
           AS e0,
         DATEDIFF('day', CAST(o.o_orderdate AS DATE),
                  CAST(l.l_shipdate AS DATE)) AS n
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  WHERE l.l_shipdate >= o.o_orderdate
),
bd AS (
  -- weekday index 0=Mon..6=Sun: epoch day 0 (1970-01-01) was a
  -- Thursday, so wd = (epoch_days + 3) % 7. Business days in
  -- [order, ship): full weeks x 5 plus the partial-week count of
  -- positions wd0..wd0+rem-1 (mod 7) that land on Mon..Fri —
  -- closed-form integer arithmetic, no calendar UDF on either engine
  SELECT pri, n,
         (n // 7) * 5
         + GREATEST(0, LEAST(5 - ((e0 + 3) % 7), n % 7))
         + GREATEST(0, LEAST((n % 7) - (7 - ((e0 + 3) % 7)), 5))
           AS bdays
  FROM lag
)
SELECT pri,
       CAST(COUNT(*) AS BIGINT) AS n_lineitems,
       CAST(SUM(bdays) * 100 // COUNT(*) AS BIGINT)
         AS mean_bdays_x100,
       CAST(MAX(bdays) AS BIGINT) AS max_bdays,
       CAST(SUM(CASE WHEN bdays <= {BDL_SLA_BDAYS} THEN 1 ELSE 0 END)
            * 1000 // COUNT(*) AS BIGINT) AS within_sla_pm
FROM bd GROUP BY pri
""",
    doc=f"BUSINESS-DAY SHIPPING LAG — SLA accounting in the calendar "
        f"operations actually contract on (weekends excluded): the "
        f"order->ship gap converts to business days by CLOSED-FORM "
        f"integer arithmetic (full weeks x 5 + a two-term partial-"
        f"week count over the Monday-anchored weekday index), no "
        f"calendar table and no per-day explode, which is what keeps "
        f"the conversion O(1) per row at any scale. Per priority: "
        f"mean lag (x100 integer), worst case, and the share shipped "
        f"within the {BDL_SLA_BDAYS}-business-day SLA in exact "
        f"per-mille. A holiday calendar would swap in as a broadcast "
        f"anti-join on the same integer day spine. One equi-join + "
        f"one aggregate.",
    tags=("temporal", "calendar", "join", "aggregate"),
)
def business_day_shipping_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "orders", "lineitem")
    lag = (
        t["orders"]
        .join(
            t["lineitem"].select("l_orderkey", "l_shipdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .where(F.col("l_shipdate") >= F.col("o_orderdate"))
        .select(
            F.col("o_orderpriority").alias("pri"),
            F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01"))
            .alias("e0"),
            F.datediff(
                F.to_date("l_shipdate"), F.to_date("o_orderdate")
            ).alias("n"),
        )
    )
    wd0 = (F.col("e0") + 3) % 7
    rem = F.col("n") % 7
    bdays = (
        (F.col("n") / 7).cast("long") * 5
        + F.greatest(F.lit(0), F.least(F.lit(5) - wd0, rem))
        + F.greatest(F.lit(0), F.least(rem - (F.lit(7) - wd0), F.lit(5)))
    )
    bd = lag.select("pri", bdays.alias("bdays"))
    return bd.groupBy("pri").agg(
        F.count(F.lit(1)).cast("long").alias("n_lineitems"),
        F.expr("sum(bdays) * 100 div count(1)")
        .cast("long")
        .alias("mean_bdays_x100"),
        F.max("bdays").cast("long").alias("max_bdays"),
        F.expr(
            f"sum(case when bdays <= {BDL_SLA_BDAYS} then 1 else 0 end)"
            " * 1000 div count(1)"
        )
        .cast("long")
        .alias("within_sla_pm"),
    )
