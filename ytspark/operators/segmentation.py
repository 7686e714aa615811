"""Customer segmentation operators.

RFM (recency / frequency / monetary) quintile scoring — the classic
marketing segmentation the reference's warehouse layer exists to feed
(``/root/reference/dags/dbt/dbt_ytanalytics/models/marts`` materializes
exactly this kind of per-entity mart). Spark-first shape: one
per-customer aggregate over the orders scan, then THREE independent
distributed ranks computed with the bucketed-offsets two-pass recipe
(``packing.py::corpus_global_shuffle`` precedent) — per-metric value
buckets are bounded by the VALUE RANGE (days / order counts / price
bands), never by row count, so the ordered window only ever sees the
tiny bucket table and the quintile assignment survives a 1000-executor
100 TB run with three bounded shuffles of the customer-sized table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ytspark.plans.scale import finish
from ytspark.queries import register
from ytspark.session import load_tables

RFM_MONETARY_BUCKET = 10000.0  # monetary histogram band width
RFM_QUANTILES = 5  # quintiles


def _rank_sql(metric: str, alias: str) -> str:
    """Oracle-side deterministic rank of a per-customer metric."""
    return (
        f"SELECT custkey, CEIL({RFM_QUANTILES}.0 * ROW_NUMBER() OVER "
        f"(ORDER BY {metric}, custkey) / (SELECT COUNT(*) FROM rfm)) "
        f"AS {alias} FROM rfm"
    )


_RFM_ORACLE = f"""
WITH mx AS (SELECT MAX(o_orderdate) AS dmax FROM orders),
rfm AS (
  SELECT o_custkey AS custkey,
         DATE_DIFF('day', MAX(o_orderdate), (SELECT dmax FROM mx)) AS r_days,
         COUNT(*) AS f_cnt,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS m_sum
  FROM orders GROUP BY o_custkey
),
rq AS ({_rank_sql('r_days', 'q')}),
fq AS ({_rank_sql('f_cnt', 'q')}),
mq AS ({_rank_sql('m_sum', 'q')}),
scored AS (
  SELECT rfm.custkey,
         {RFM_QUANTILES + 1} - rq.q AS r_score,
         fq.q AS f_score,
         mq.q AS m_score,
         rfm.m_sum
  FROM rfm
  JOIN rq ON rq.custkey = rfm.custkey
  JOIN fq ON fq.custkey = rfm.custkey
  JOIN mq ON mq.custkey = rfm.custkey
)
SELECT CAST(r_score AS BIGINT) AS r_score,
       CAST(f_score AS BIGINT) AS f_score,
       CAST(m_score AS BIGINT) AS m_score,
       CASE WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4
              THEN 'champions'
            WHEN r_score <= 2 AND f_score >= 4 THEN 'at_risk'
            WHEN r_score <= 2 AND f_score <= 2 THEN 'hibernating'
            WHEN r_score >= 4 AND f_score <= 2 THEN 'new'
            ELSE 'core' END AS segment,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(m_sum) AS DOUBLE) AS revenue
FROM scored
GROUP BY 1, 2, 3, 4
"""


@register(
    "rfm_customer_segments",
    oracle=_RFM_ORACLE,
    doc="RFM SEGMENTATION: per-customer recency (days since last "
        "order, vs the corpus max date), frequency (order count) and "
        "monetary (DECIMAL-exact revenue) quintile scores, rolled up "
        "into the classic segment grid (champions / at-risk / "
        "hibernating / new / core). Quintile q = ceil(5*rank/n) with "
        "rank by (metric, custkey) — computed per metric with the "
        "bucketed-offsets two-pass distributed rank (value-bounded "
        "buckets: days for recency, counts for frequency, "
        f"{RFM_MONETARY_BUCKET:.0f}-wide price bands for monetary), "
        "so NO unpartitioned data-sized window exists anywhere; the "
        "recency score is inverted (recent = 5). The oracle computes "
        "the same ranks with the naive global ROW_NUMBER — feasible "
        "at gate scale, which is exactly why the two-pass form "
        "exists for the real one. Revenue sums stay DECIMAL until the "
        "final exact-to-double report cast (the maintenance-module "
        "precedent).",
    tags=("segmentation", "aggregate", "window", "pipeline", "scale"),
)
def rfm_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir, "orders")["orders"]
    mx = orders.agg(F.max("o_orderdate").alias("dmax"))
    rfm = (
        orders.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count(F.lit(1)).alias("f_cnt"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("m_sum"),
        )
        .crossJoin(F.broadcast(mx))
        .select(
            "custkey",
            F.datediff("dmax", "last_order").alias("r_days"),
            "f_cnt",
            "m_sum",
        )
        .persist()  # read by the count + three rank passes
    )
    n_df = rfm.agg(F.count(F.lit(1)).alias("n"))

    def quintile(metric: str, bucket_col, alias: str) -> DataFrame:
        """Distributed quintile of ``metric``: value-bounded bucket
        histogram -> cumulative offsets -> within-bucket row_number."""
        d = rfm.select("custkey", metric, bucket_col.alias("bucket"))
        counts = d.groupBy("bucket").agg(F.count(F.lit(1)).alias("c"))
        off_w = Window.orderBy("bucket").rowsBetween(
            Window.unboundedPreceding, -1
        )
        offsets = counts.select(
            "bucket",
            F.coalesce(F.sum("c").over(off_w), F.lit(0)).alias("off"),
        )
        rn_w = Window.partitionBy("bucket").orderBy(metric, "custkey")
        return (
            d.join(F.broadcast(offsets), "bucket")
            .crossJoin(F.broadcast(n_df))
            .select(
                "custkey",
                F.ceil(
                    F.lit(float(RFM_QUANTILES))
                    * (F.col("off") + F.row_number().over(rn_w))
                    / F.col("n")
                )
                .cast("long")
                .alias(alias),
            )
        )

    rq = quintile("r_days", F.col("r_days"), "rq")
    fq = quintile("f_cnt", F.col("f_cnt"), "fq")
    mq = quintile(
        "m_sum",
        F.floor(F.col("m_sum") / F.lit(RFM_MONETARY_BUCKET)).cast("long"),
        "mq",
    )
    scored = (
        rfm.join(rq, "custkey")
        .join(fq, "custkey")
        .join(mq, "custkey")
        .select(
            (F.lit(RFM_QUANTILES + 1) - F.col("rq")).alias("r_score"),
            F.col("fq").alias("f_score"),
            F.col("mq").alias("m_score"),
            "m_sum",
        )
    )
    seg = (
        F.when(
            (F.col("r_score") >= 4)
            & (F.col("f_score") >= 4)
            & (F.col("m_score") >= 4),
            F.lit("champions"),
        )
        .when((F.col("r_score") <= 2) & (F.col("f_score") >= 4), F.lit("at_risk"))
        .when(
            (F.col("r_score") <= 2) & (F.col("f_score") <= 2),
            F.lit("hibernating"),
        )
        .when((F.col("r_score") >= 4) & (F.col("f_score") <= 2), F.lit("new"))
        .otherwise(F.lit("core"))
    )
    # <=125-cell result; release the RFM base cache (4 consumers)
    return finish(
        scored.withColumn("segment", seg)
        .groupBy("r_score", "f_score", "m_score", "segment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.sum("m_sum").cast("double").alias("revenue"),
        ),
        rfm,
    )


# ---------------------------------------------------------------------------
# Engagement-recency lifecycle segments
# ---------------------------------------------------------------------------

ERS_ACTIVE_D = 7
ERS_LAPSED_D = 30


@register(
    "engagement_recency_segments",
    oracle=f"""
WITH anchor AS (SELECT MAX(CAST(ts AS DATE)) AS a FROM events),
per_user AS (
  SELECT user_id,
         DATEDIFF('day', MAX(CAST(ts AS DATE)), anchor.a) AS rec_days,
         COUNT(*) AS n_events,
         CAST(SUM(CAST(ROUND(COALESCE(value, 0) * 100) AS BIGINT))
              AS BIGINT) AS value_cents
  FROM events CROSS JOIN anchor
  GROUP BY user_id, anchor.a
)
SELECT CASE WHEN rec_days <= {ERS_ACTIVE_D} THEN 'active'
            WHEN rec_days <= {ERS_LAPSED_D} THEN 'lapsed'
            ELSE 'churned' END AS segment,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(n_events) AS BIGINT) AS n_events,
       CAST(SUM(value_cents) AS BIGINT) AS total_value_cents,
       CAST(SUM(value_cents) // SUM(n_events) AS BIGINT)
         AS cents_per_event,
       CAST(MIN(rec_days) AS BIGINT) AS min_recency_days,
       CAST(MAX(rec_days) AS BIGINT) AS max_recency_days
FROM per_user
GROUP BY 1
""",
    doc=f"LIFECYCLE SEGMENTATION by engagement recency — the "
        f"active(<= {ERS_ACTIVE_D}d) / lapsed(<= {ERS_LAPSED_D}d) / "
        f"churned cut every growth dashboard leads with, anchored to "
        f"the corpus max date so the segmentation is replayable "
        f"(wall-clock anchors would drift between engine runs). "
        f"Complements rfm_customer_segments (value tiers on orders) "
        f"with the TIME axis on events. Integer day arithmetic, "
        f"cent-exact value sums, integer-division rates. One grouped "
        f"aggregate per user then a 3-row census.",
    tags=("segmentation", "retention", "temporal", "aggregate"),
)
def engagement_recency_segments(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    anchor = ev.agg(F.max(F.to_date("ts")).alias("a"))
    per_user = (
        ev.crossJoin(F.broadcast(anchor))
        .groupBy("user_id", "a")
        .agg(
            F.datediff("a", F.max(F.to_date("ts"))).alias("rec_days"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.round(F.coalesce(F.col("value"), F.lit(0)) * 100).cast(
                    "long"
                )
            ).alias("value_cents"),
        )
    )
    seg = (
        F.when(F.col("rec_days") <= ERS_ACTIVE_D, "active")
        .when(F.col("rec_days") <= ERS_LAPSED_D, "lapsed")
        .otherwise("churned")
    )
    return per_user.groupBy(seg.alias("segment")).agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("n_events").cast("long").alias("n_events"),
        F.sum("value_cents").cast("long").alias("total_value_cents"),
        # `div` (trunc) pairs with DuckDB `//` (floor): agreement
        # relies on value cents being nonnegative — if refunds
        # (negative cents) ever appear, use (a - pmod(a, b)) / b
        F.expr("sum(value_cents) div sum(n_events)")
        .cast("long")
        .alias("cents_per_event"),
        F.min("rec_days").cast("long").alias("min_recency_days"),
        F.max("rec_days").cast("long").alias("max_recency_days"),
    )
