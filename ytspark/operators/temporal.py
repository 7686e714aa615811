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
