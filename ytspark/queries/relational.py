"""Relational query battery (SURVEY §2.10 — the operator categories the
reference delegates to Snowflake, re-expressed as Spark built-ins).

Each query is declared with the DataFrame API so Catalyst owns the
physical plan: filters/projections push into the parquet scan, small
dimensions broadcast, aggregates get map-side partials, top-k compiles
to TakeOrderedAndProject. Oracles are ANSI SQL for DuckDB.

Determinism contract for cross-engine hashing: monetary aggregates go
through DECIMAL (see ``ytspark.functions.core``); every output column
is aliased identically in both implementations; ties in rankings are
broken by a unique key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ytspark.queries import register
from ytspark.plans.scale import maybe_broadcast
from ytspark.session import load_tables

# ---------------------------------------------------------------- helpers

# revenue = extendedprice * (1 - discount), exact decimal per row
_REV_SQL = "CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(4,2))"


def _rev() -> F.Column:
    return F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(4,2)")


def _dsum(col: F.Column, alias: str) -> F.Column:
    return F.sum(col).cast("double").alias(alias)


# ---------------------------------------------------------------- queries


@register(
    "q1_pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM({rev}) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1999-01-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
""".format(rev=_REV_SQL),
    doc="TPC-H Q1-style pricing summary: filtered scan + grouped aggregate "
        "with map-side partials; exact decimal money math.",
    tags=("aggregate", "filter"),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    return (
        li.where(F.col("l_shipdate") <= F.lit("1999-01-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum(F.col("l_quantity").cast("decimal(18,2)"), "sum_qty"),
            _dsum(F.col("l_extendedprice").cast("decimal(18,2)"), "sum_base_price"),
            _dsum(_rev(), "sum_disc_price"),
            (F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double") / F.count(F.lit(1))).alias("avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q3_top_orders",
    oracle="""
SELECT o.o_orderkey, o.o_orderdate,
       CAST(SUM({rev}) AS DOUBLE) AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
GROUP BY o.o_orderkey, o.o_orderdate
ORDER BY revenue DESC, o_orderkey
LIMIT 10
""".format(rev=_REV_SQL),
    doc="TPC-H Q3-style: selective dim filter broadcast-joined into the fact, "
        "grouped revenue, global top-k (TakeOrderedAndProject).",
    tags=("join", "aggregate", "topk"),
)
def q3_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "customer", "orders", "lineitem")
    cutoff = F.lit("1998-06-01 00:00:00").cast("timestamp")
    cust = t["customer"].where(F.col("c_mktsegment") == "BUILDING")
    orders = t["orders"].where(F.col("o_orderdate") < cutoff)
    li = t["lineitem"].where(F.col("l_shipdate") > cutoff)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(maybe_broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(_dsum(_rev(), "revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@register(
    "q5_regional_revenue",
    oracle="""
SELECT n.n_name,
       CAST(SUM({rev}) AS DOUBLE) AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n.n_name
""".format(rev=_REV_SQL),
    doc="TPC-H Q5-style multi-way join: fact-fact shuffle join + broadcast "
        "dims (supplier/nation/region), local-supplier predicate.",
    tags=("join", "aggregate"),
)
def q5_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(
        spark, sf_dir, "customer", "orders", "lineitem", "supplier", "nation", "region"
    )
    o = t["orders"].where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    return (
        t["lineitem"]
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(maybe_broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            maybe_broadcast(t["supplier"]),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(_dsum(_rev(), "revenue"))
    )


@register(
    "q6_revenue_forecast",
    oracle="""
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
""",
    doc="TPC-H Q6-style scalar aggregate: all predicates push to the parquet "
        "scan; single-stage partial+final agg.",
    tags=("aggregate", "filter", "pushdown"),
)
def q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount").between(0.03, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            _dsum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * F.col("l_discount").cast("decimal(4,2)"),
                "revenue",
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q4_order_priority",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
  )
GROUP BY o_orderpriority
""",
    doc="TPC-H Q4-style EXISTS as a left-semi join, then grouped count.",
    tags=("join", "semi", "aggregate"),
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "orders", "lineitem")
    o = t["orders"].where(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = t["lineitem"]
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "top_revenue_customers",
    oracle="""
SELECT c.c_custkey, c.c_name,
       CAST(SUM({rev}) AS DOUBLE) AS revenue,
       COUNT(DISTINCT o.o_orderkey) AS n_orders
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY c.c_custkey, c.c_name
ORDER BY revenue DESC, c_custkey
LIMIT 10
""".format(rev=_REV_SQL),
    doc="Customer lifetime revenue ranking: two joins, per-order "
        "pre-aggregation, top-k via ordered LIMIT (certifies the limit "
        "family in-window). The lineitem side pre-aggregates revenue "
        "per orderkey BEFORE the join, so (a) the join input shrinks "
        "to one row per order and (b) the per-customer distinct order "
        "count becomes a plain COUNT — no countDistinct expand phase. "
        "Decimal partial sums stay exact, so the two-level sum equals "
        "the oracle's single-level sum.",
    tags=("join", "aggregate", "topk", "distinct", "limit"),
)
def top_revenue_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "customer", "orders", "lineitem")
    per_order = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.sum(_rev()).alias("order_rev"))
    )
    return (
        per_order.join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(maybe_broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name")
        .agg(
            F.sum("order_rev").cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(10)
    )


@register(
    "nation_customer_stats",
    oracle="""
SELECT r.r_name, n.n_name,
       COUNT(*) AS n_customers,
       CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal,
       CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_acctbal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name, n.n_name
""",
    doc="Dimension-chain broadcast joins + grouped stats (the Power BI-style "
        "reporting query over the reference's architecture diagram).",
    tags=("join", "aggregate"),
)
def nation_customer_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "customer", "nation", "region")
    bal = F.col("c_acctbal").cast("decimal(18,2)")
    return (
        t["customer"]
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            _dsum(bal, "total_acctbal"),
            (F.sum(bal).cast("double") / F.count(F.lit(1))).alias("avg_acctbal"),
        )
    )


@register(
    "rollup_order_status",
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders
GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
""",
    doc="GROUP BY ROLLUP hierarchy totals (absent in reference; built-in).",
    tags=("aggregate", "rollup"),
)
def rollup_order_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, "orders")["orders"]
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        _dsum(F.col("o_totalprice").cast("decimal(18,2)"), "total_price"),
    )


@register(
    "pivot_segment_status",
    oracle="""
SELECT c.c_mktsegment,
       COUNT(*) FILTER (WHERE o.o_orderstatus = 'F') AS n_f,
       COUNT(*) FILTER (WHERE o.o_orderstatus = 'O') AS n_o,
       COUNT(*) FILTER (WHERE o.o_orderstatus = 'P') AS n_p
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
""",
    doc="Pivot (status columns per segment) = conditional aggregation.",
    tags=("aggregate", "pivot"),
)
def pivot_segment_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "orders", "customer")
    joined = t["orders"].join(
        maybe_broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey")
    )
    pivoted = (
        joined.groupBy("c_mktsegment")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return pivoted.select(
        "c_mktsegment",
        F.coalesce("F", F.lit(0)).alias("n_f"),
        F.coalesce("O", F.lit(0)).alias("n_o"),
        F.coalesce("P", F.lit(0)).alias("n_p"),
    )


@register(
    "nations_without_suppliers",
    oracle="""
SELECT n_name FROM nation JOIN customer ON c_nationkey = n_nationkey
WHERE c_acctbal > 9000
EXCEPT
SELECT n_name FROM nation JOIN supplier ON s_nationkey = n_nationkey
WHERE s_acctbal > 5000
""",
    doc="Set difference (EXCEPT DISTINCT): nations with a high-balance "
        "customer but no high-balance supplier.",
    tags=("setop",),
)
def nations_without_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "nation", "customer", "supplier")
    with_cust = (
        t["nation"]
        .join(t["customer"], F.col("c_nationkey") == F.col("n_nationkey"))
        .where(F.col("c_acctbal") > 9000)
        .select("n_name")
    )
    with_supp = (
        t["nation"]
        .join(t["supplier"], F.col("s_nationkey") == F.col("n_nationkey"))
        .where(F.col("s_acctbal") > 5000)
        .select("n_name")
    )
    # subtract == EXCEPT DISTINCT (bag-removing exceptAll would be wrong here)
    return with_cust.subtract(with_supp)


@register(
    "full_outer_daily_activity",
    oracle="""
WITH od AS (
  SELECT STRFTIME(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS day,
         COUNT(*) AS n_orders
  FROM orders GROUP BY 1
),
ed AS (
  SELECT STRFTIME(CAST(ts AS DATE), '%Y-%m-%d') AS day,
         COUNT(*) AS n_events
  FROM events GROUP BY 1
)
SELECT COALESCE(od.day, ed.day) AS day,
       COALESCE(od.n_orders, 0) AS n_orders,
       COALESCE(ed.n_events, 0) AS n_events
FROM od FULL OUTER JOIN ed ON od.day = ed.day
""",
    doc="FULL OUTER join of two day-grain activity rollups (order days ∪ "
        "event days; either side may be absent) — completes the join-type "
        "battery next to inner/left/semi/anti/cross. Both inputs are "
        "pre-aggregated to day grain, so the outer join runs on "
        "dimension-sized inputs regardless of fact scale.",
    tags=("join", "outer", "aggregate"),
)
def full_outer_daily_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "orders", "events")
    od = (
        t["orders"]
        .groupBy(F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_day"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    ed = (
        t["events"]
        .groupBy(F.date_format("ts", "yyyy-MM-dd").alias("e_day"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    return od.join(ed, F.col("o_day") == F.col("e_day"), "full_outer").select(
        F.coalesce(F.col("o_day"), F.col("e_day")).alias("day"),
        F.coalesce(F.col("n_orders"), F.lit(0)).alias("n_orders"),
        F.coalesce(F.col("n_events"), F.lit(0)).alias("n_events"),
    )


@register(
    "salted_skew_join_revenue",
    oracle="""
SELECT c.c_mktsegment,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
""",
    doc="Deterministic-salt skew-join (ytspark.plans.scale.salted_join, "
        "8 salts): the orders side is salted from its unique order key, "
        "the customer side replicated 8 ways, restoring balance when one "
        "customer dominates the key distribution. The oracle is the "
        "PLAIN join — the driver gate proves row-identical results, the "
        "property that makes salting safe to deploy. (Salt from a "
        "column, never rand(): AQE retries must be deterministic.)",
    tags=("join", "skew", "salt", "aggregate"),
)
def salted_skew_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ytspark.plans.scale import salted_join

    t = load_tables(spark, sf_dir, "orders", "customer")
    orders = t["orders"].withColumnRenamed("o_custkey", "custkey")
    cust = t["customer"].withColumnRenamed("c_custkey", "custkey")
    joined = salted_join(
        orders, cust, "custkey", salt_col="o_orderkey", n_salts=8
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_price"),
    )


@register(
    "salted_events_hot_key_join",
    oracle="""
SELECT c.c_mktsegment, e.event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY c.c_mktsegment, e.event_type
""",
    doc="Salted enrichment join on the EVENTS fact's user key — the "
        "one join key the skew-amplified certification sweep "
        "(tools/gen_skew_data.py) re-draws Zipf(1), putting ~9.5% of "
        "all rows on a single key (~142x uniform). The events side is "
        "salted deterministically from event_id (16 salts), the "
        "customer dim replicated 16 ways, so the hot user's rows "
        "spread across 16 shuffle partitions instead of one straggler "
        "task; the oracle is the PLAIN join, so the driver gate (and "
        "the skew sweep) prove row-identical results under real hot "
        "keys — the property that makes salting safe to deploy at "
        "100 TB. Partial aggregation then collapses each salt "
        "partition map-side before the 5x|event_type| group shuffle.",
    tags=("join", "skew", "salt", "aggregate", "events"),
)
def salted_events_hot_key_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ytspark.plans.scale import salted_join

    t = load_tables(spark, sf_dir, "events", "customer")
    ev = t["events"].withColumnRenamed("user_id", "custkey")
    cust = t["customer"].withColumnRenamed("c_custkey", "custkey")
    joined = salted_join(ev, cust, "custkey", salt_col="event_id", n_salts=16)
    return joined.groupBy("c_mktsegment", "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_value"),
    )


@register(
    "intersect_all_segments",
    oracle="""
SELECT c_mktsegment FROM customer WHERE c_acctbal > 8000
INTERSECT ALL
SELECT c_mktsegment FROM customer WHERE c_acctbal < 2000
""",
    doc="INTERSECT ALL (bag semantics — each segment appears "
        "min(count_left, count_right) times, unlike the distinct "
        "intersect in intersect_active_nations). Spark plans it as a "
        "grouped count on each side + generator replication.",
    tags=("setop", "bag"),
)
def intersect_all_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_tables(spark, sf_dir, "customer")["customer"]
    rich = c.where(F.col("c_acctbal") > 8000).select("c_mktsegment")
    poor = c.where(F.col("c_acctbal") < 2000).select("c_mktsegment")
    return rich.intersectAll(poor)


@register(
    "except_all_order_priorities",
    oracle="""
SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'O'
EXCEPT ALL
SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
""",
    doc="EXCEPT ALL (bag difference — multiplicities subtract, rows "
        "survive count_left - count_right times; the distinct EXCEPT in "
        "nations_without_suppliers would collapse them).",
    tags=("setop", "bag"),
)
def except_all_order_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, "orders")["orders"]
    open_p = o.where(F.col("o_orderstatus") == "O").select("o_orderpriority")
    done_p = o.where(F.col("o_orderstatus") == "F").select("o_orderpriority")
    return open_p.exceptAll(done_p)


@register(
    "scalar_function_battery",
    oracle="""
SELECT o_orderkey,
       UPPER(o_orderpriority) AS pri_upper,
       LOWER(o_orderstatus) AS status_lower,
       SUBSTRING(o_orderpriority, 1, 1) AS pri_code,
       CAST(LENGTH(o_orderpriority) AS INTEGER) AS pri_len,
       REPLACE(o_orderpriority, '-', '_') AS pri_snake,
       CONCAT(o_orderstatus, ':', o_orderpriority) AS status_pri,
       ABS(o_totalprice - 100000.0) AS dist_from_100k,
       MOD(o_orderkey, 7) AS key_mod7,
       CAST(FLOOR(o_totalprice / 1000.0) AS BIGINT) AS price_k_floor,
       CAST(CEIL(o_totalprice / 1000.0) AS BIGINT) AS price_k_ceil,
       CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS y,
       CAST(EXTRACT(MONTH FROM o_orderdate) AS INTEGER) AS m,
       CAST(EXTRACT(DAY FROM o_orderdate) AS INTEGER) AS d,
       STRFTIME(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date,
       CASE WHEN o_totalprice > 200000 THEN 'big'
            WHEN o_totalprice > 50000 THEN 'mid'
            ELSE 'small' END AS size_band
FROM orders
WHERE o_orderkey <= 500
""",
    doc="Scalar-function parity battery (SURVEY §2.10 'scalar function "
        "library'): string (upper/lower/substring/length/replace/"
        "concat), numeric (abs/mod/floor/ceil), datetime (extract, "
        "interval arithmetic, formatting), and conditional CASE — one "
        "projected row per order, every value hash-checked cross-engine. "
        "All whole-stage-codegen'd column expressions; no UDFs.",
    tags=("functions", "scalar"),
)
def scalar_function_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, "orders")["orders"].where(
        F.col("o_orderkey") <= 500
    )
    return o.select(
        "o_orderkey",
        F.upper("o_orderpriority").alias("pri_upper"),
        F.lower("o_orderstatus").alias("status_lower"),
        F.substring("o_orderpriority", 1, 1).alias("pri_code"),
        F.length("o_orderpriority").alias("pri_len"),
        F.replace(
            F.col("o_orderpriority"), F.lit("-"), F.lit("_")
        ).alias("pri_snake"),
        F.concat(
            F.col("o_orderstatus"), F.lit(":"), F.col("o_orderpriority")
        ).alias("status_pri"),
        F.abs(F.col("o_totalprice") - 100000.0).alias("dist_from_100k"),
        F.pmod(F.col("o_orderkey"), F.lit(7)).alias("key_mod7"),
        F.floor(F.col("o_totalprice") / 1000.0).alias("price_k_floor"),
        F.ceil(F.col("o_totalprice") / 1000.0).alias("price_k_ceil"),
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        F.date_format(
            F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"), "yyyy-MM-dd"
        ).alias("due_date"),
        F.when(F.col("o_totalprice") > 200000, "big")
        .when(F.col("o_totalprice") > 50000, "mid")
        .otherwise("small")
        .alias("size_band"),
    )


@register(
    "limit_head",
    oracle="SELECT o_orderkey, o_custkey, o_orderstatus FROM orders ORDER BY o_orderkey LIMIT 5",
    doc="T12 (v2 load truncation, dags/optimized_extract.py:106) as a "
        "deterministic ordered LIMIT.",
    tags=("limit",),
)
def limit_head(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, "orders")["orders"]
    return (
        o.select("o_orderkey", "o_custkey", "o_orderstatus")
        .orderBy("o_orderkey")
        .limit(5)
    )


@register(
    "top3_orders_per_priority",
    oracle="""
SELECT o_orderpriority, o_orderkey, o_totalprice FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey) AS rk
  FROM orders
) WHERE rk <= 3
""",
    doc="Top-k per group via rank window; deterministic key tiebreak.",
    tags=("window", "topk"),
)
def top3_orders_per_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ytspark.analytics import top_k_per_group

    o = load_tables(spark, sf_dir, "orders")["orders"]
    return top_k_per_group(
        o, "o_orderpriority", "o_totalprice", 3, tiebreak=("o_orderkey",)
    ).select("o_orderpriority", "o_orderkey", "o_totalprice")


@register(
    "segment_price_percentiles",
    oracle="""
SELECT c.c_mktsegment,
       ROUND(QUANTILE_CONT(o.o_totalprice, 0.5), 4) AS median_price,
       ROUND(QUANTILE_CONT(o.o_totalprice, 0.9), 4) AS p90_price,
       COUNT(*) AS n_orders
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
""",
    doc="Exact percentiles (linear interpolation) per segment — Spark's "
        "exact percentile aggregate, same interpolation as QUANTILE_CONT.",
    tags=("aggregate", "percentile"),
)
def segment_price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "orders", "customer")
    return (
        t["orders"]
        .join(maybe_broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
            F.round(F.percentile("o_totalprice", 0.5), 4).alias("median_price"),
            F.round(F.percentile("o_totalprice", 0.9), 4).alias("p90_price"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@register(
    "segment_price_approx_quantiles",
    oracle="""
SELECT c_mktsegment,
       ROUND(MEDIAN(CAST(o_totalprice AS DOUBLE)), 4) AS exact_median,
       COUNT(*) AS n_orders,
       TRUE AS median_within_rank_bound,
       TRUE AS p90_within_rank_bound
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
""",
    doc="Approximate percentiles via Spark's mergeable quantile sketch "
        "(approx_percentile, Greenwald-Khanna variant, accuracy=100) "
        "— the sketch path that replaces the exact per-group sort at "
        "100 TB (partials merge map-side, the exchange carries one "
        "sketch per group, not the rows). HASH-CERTIFIED via the "
        "bound pattern: each estimate is asserted between the exact "
        "order statistics at target rank ± ceil(n/accuracy) — the GK "
        "guarantee, merge-order independent — and the oracle "
        "recomputes the exact median and expects TRUE twice.",
    tags=("aggregate", "percentile", "sketch", "approx"),
)
def segment_price_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "orders", "customer")
    joined = t["orders"].join(
        maybe_broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey")
    ).select("c_mktsegment", F.col("o_totalprice").cast("double").alias("v"))
    approx = joined.groupBy("c_mktsegment").agg(
        F.percentile_approx("v", 0.5, 100).alias("approx_median"),
        F.percentile_approx("v", 0.9, 100).alias("approx_p90"),
        F.round(F.percentile("v", 0.5), 4).alias("exact_median"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    w = Window.partitionBy("c_mktsegment").orderBy("v")
    ranked = joined.select(
        "c_mktsegment",
        "v",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy("c_mktsegment")).alias("n"),
    )
    eps = F.ceil(F.col("n").cast("double") / 100).cast("long")

    def rank_window(p):
        target = F.greatest(
            F.lit(1), F.ceil(F.lit(p) * F.col("n")).cast("long")
        )
        lo = F.min(
            F.when(F.col("rk") == F.greatest(F.lit(1), target - eps), F.col("v"))
        )
        hi = F.min(
            F.when(F.col("rk") == F.least(F.col("n"), target + eps), F.col("v"))
        )
        return lo, hi

    lo50, hi50 = rank_window(0.5)
    lo90, hi90 = rank_window(0.9)
    bounds = ranked.groupBy("c_mktsegment").agg(
        lo50.alias("lo50"), hi50.alias("hi50"),
        lo90.alias("lo90"), hi90.alias("hi90"),
    )
    return (
        approx.join(bounds, "c_mktsegment")
        .select(
            "c_mktsegment",
            "exact_median",
            "n_orders",
            (
                (F.col("approx_median") >= F.col("lo50"))
                & (F.col("approx_median") <= F.col("hi50"))
            ).alias("median_within_rank_bound"),
            (
                (F.col("approx_p90") >= F.col("lo90"))
                & (F.col("approx_p90") <= F.col("hi90"))
            ).alias("p90_within_rank_bound"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "brand_revenue_share",
    oracle="""
WITH brand_rev AS (
  SELECT p.p_type, p.p_brand,
         SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
             * CAST(1 - l.l_discount AS DECIMAL(4,2))) AS rev
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY p.p_type, p.p_brand
)
SELECT p_type, p_brand,
       CAST(rev AS DOUBLE) AS revenue,
       CAST(rev AS DOUBLE) / CAST(SUM(rev) OVER (PARTITION BY p_type) AS DOUBLE)
         AS share_of_type
FROM brand_rev
""",
    doc="Ratio-to-report: each brand's share of its part-type's revenue "
        "via an unframed partition window over the grouped aggregate — "
        "the window input is one row per (type, brand), so the window "
        "cost is dimension-sized regardless of fact scale. Exact decimal "
        "sums; the double division happens on identical operands in both "
        "engines.",
    tags=("window", "aggregate", "ratio"),
)
def brand_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "lineitem", "part")
    brand_rev = (
        t["lineitem"]
        .join(maybe_broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_type", "p_brand")
        .agg(F.sum(_rev()).alias("rev"))
    )
    w = Window.partitionBy("p_type")
    return brand_rev.select(
        "p_type",
        "p_brand",
        F.col("rev").cast("double").alias("revenue"),
        (F.col("rev").cast("double") / F.sum("rev").over(w).cast("double")).alias(
            "share_of_type"
        ),
    )


@register(
    "events_user_reach_sketch",
    oracle="""
SELECT event_type,
       COUNT(DISTINCT user_id) AS exact_users,
       TRUE AS hll_within_bound
FROM events GROUP BY event_type
""",
    doc="Approximate distinct users per event type via HyperLogLog "
        "(approx_count_distinct, rsd=2%) next to the exact count — the "
        "sketch path that replaces the exact shuffle at 100 TB (the "
        "sketch is mergeable: map-side partials, tiny exchange). "
        "HASH-CERTIFIED via the bound pattern: the estimate is "
        "asserted within 4 sigma (8%) of the exact count, which the "
        "oracle recomputes, expecting TRUE — deterministic because "
        "HLL register state is merge-order independent.",
    tags=("aggregate", "sketch", "approx"),
)
def events_user_reach_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    agg = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.02).alias("approx_users"),
        F.countDistinct("user_id").alias("exact_users"),
    )
    err = F.abs(F.col("approx_users") - F.col("exact_users")) / F.col(
        "exact_users"
    )
    return agg.select(
        "event_type",
        "exact_users",
        (err <= F.lit(4 * 0.02)).alias("hll_within_bound"),
    ).orderBy("event_type")


@register(
    "customer_running_revenue",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS running_total
FROM orders
WHERE o_custkey <= 50
""",
    doc="Cumulative windowed sum per entity (exact decimal accumulator).",
    tags=("window",),
)
def customer_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, "orders")["orders"].where(F.col("o_custkey") <= 50)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("running_total"),
    )


@register(
    "daily_revenue_moving_avg",
    oracle="""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS day_rev
  FROM orders GROUP BY 1
)
SELECT STRFTIME(day, '%Y-%m-%d') AS day,
       CAST(day_rev AS DOUBLE) AS day_revenue,
       CAST(SUM(day_rev) OVER w AS DOUBLE) / COUNT(*) OVER w AS ma7
FROM daily
WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
""",
    doc="7-day trailing moving average of daily revenue: sliding ROWS "
        "frame over the day-grain pre-aggregate. The global (unpartitioned) "
        "window runs on ONE row per day — the fact-size shuffle happens in "
        "the grouped aggregate, so the single-partition window step is "
        "O(days), fine at any fact scale.",
    tags=("window", "frame", "aggregate"),
)
def daily_revenue_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, "orders")["orders"]
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("day_rev")
    )
    w = Window.orderBy("day").rowsBetween(-6, Window.currentRow)
    return daily.select(
        # string day: DateType round-trips as midnight timestamps through
        # pandas, which breaks the cross-engine value-hash
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("day_rev").cast("double").alias("day_revenue"),
        (F.sum("day_rev").over(w).cast("double") / F.count(F.lit(1)).over(w)).alias(
            "ma7"
        ),
    )


@register(
    "customer_balance_quartiles",
    oracle="""
SELECT quartile, COUNT(*) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
FROM (SELECT c_acctbal,
             NTILE(4) OVER (ORDER BY c_acctbal, c_custkey) AS quartile
      FROM customer)
GROUP BY quartile
""",
    doc="NTILE(4) balance quartiles with a unique-key tiebreak, then "
        "per-quartile totals — computed WITHOUT a customer-sized "
        "single-partition window: balances are range-bucketed, "
        "per-bucket counts become cumulative offsets (one tiny "
        "window over |buckets| rows), global rank = offset + "
        "within-bucket row_number (equal balances share a bucket so "
        "the custkey tiebreak stays local), and the tile comes from "
        "the exact NTILE arithmetic (first N%4 tiles get one extra "
        "row) against the broadcast total — the distributed two-pass "
        "rank, certified against the oracle's literal NTILE.",
    tags=("window", "ntile", "aggregate"),
)
def customer_balance_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_tables(spark, sf_dir, "customer")["customer"]
    d = c.select(
        "c_acctbal",
        "c_custkey",
        F.col("c_acctbal").cast("decimal(18,2)").alias("bal"),
        # acctbal spans [-999.99, 9999.99]: ~55 buckets of width 200;
        # at 100 TB the bucket bounds come from range statistics
        F.floor((F.col("c_acctbal") + F.lit(1000.0)) / F.lit(200.0))
        .cast("long")
        .alias("bucket"),
    )
    counts = d.groupBy("bucket").agg(F.count(F.lit(1)).alias("n"))
    off_w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "bucket", F.coalesce(F.sum("n").over(off_w), F.lit(0)).alias("off")
    )
    total = d.agg(F.count(F.lit(1)).alias("n_total"))
    rn_w = Window.partitionBy("bucket").orderBy("c_acctbal", "c_custkey")
    ranked = (
        d.join(F.broadcast(offsets), "bucket")
        .crossJoin(F.broadcast(total))
        .select(
            "bal",
            "n_total",
            (F.col("off") + F.row_number().over(rn_w)).alias("r"),
        )
    )
    base = F.floor(F.col("n_total") / 4)
    rem = F.col("n_total") % 4
    cut = rem * (base + 1)
    tile = (
        F.when(F.col("r") <= cut, F.ceil(F.col("r") / (base + 1)))
        .otherwise(rem + F.ceil((F.col("r") - cut) / base))
        .cast("long")
    )
    return (
        ranked.select(tile.alias("quartile"), "bal")
        .groupBy("quartile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("bal").cast("double").alias("total_bal"),
        )
    )


@register(
    "segment_balance_moments",
    oracle="""
SELECT c_mktsegment,
       COUNT(*) AS n_customers,
       CAST(SUM(b) AS DOUBLE) / COUNT(*) AS mean_bal,
       SQRT((CAST(SUM(b * b) AS DOUBLE)
             - CAST(SUM(b) AS DOUBLE) * CAST(SUM(b) AS DOUBLE) / COUNT(*))
            / (COUNT(*) - 1)) AS stddev_bal
FROM (SELECT c_mktsegment, CAST(c_acctbal AS DECIMAL(18,2)) AS b FROM customer)
GROUP BY c_mktsegment
""",
    doc="Mean/stddev of balances per segment computed from EXACT decimal "
        "power sums (Σx, Σx²) cast to double only at the end — native "
        "stddev_samp aggregates doubles in partition order, which is not "
        "reproducible across engines or even across runs; the moment form "
        "is deterministic and still one map-side-partial aggregate.",
    tags=("aggregate", "stats"),
)
def segment_balance_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_tables(spark, sf_dir, "customer")["customer"]
    b = F.col("c_acctbal").cast("decimal(18,2)")
    n = F.count(F.lit(1))
    sum_b = F.sum(b).cast("double")
    sum_b2 = F.sum(b * b).cast("double")
    return c.groupBy("c_mktsegment").agg(
        n.alias("n_customers"),
        (sum_b / n).alias("mean_bal"),
        F.sqrt((sum_b2 - sum_b * sum_b / n) / (n - F.lit(1))).alias("stddev_bal"),
    )


@register(
    "event_type_first_last",
    oracle="""
SELECT event_type,
       COUNT(*) AS n_events,
       ARG_MIN(value, event_id) AS first_value,
       ARG_MAX(value, event_id) AS last_value
FROM events
GROUP BY event_type
""",
    doc="min_by/max_by selector aggregates keyed on the unique event_id "
        "(deterministic — no ordering ties possible): first/last observed "
        "value per event type without a window or self-join.",
    tags=("aggregate", "selector"),
)
def event_type_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min_by("value", "event_id").alias("first_value"),
        F.max_by("value", "event_id").alias("last_value"),
    )


@register(
    "grouping_sets_segment_priority",
    oracle="""
SELECT c.c_mktsegment, o.o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY GROUPING SETS ((c_mktsegment), (o_orderpriority), ())
""",
    doc="Explicit GROUP BY GROUPING SETS (two one-dim rollups + grand "
        "total — a set CUBE/ROLLUP can't express) through the engine's "
        "Spark SQL surface: the joined frame is exposed as a temp view "
        "and the grouping-set expansion happens in Catalyst's Aggregate "
        "(Expand) node, same as the DataFrame cube/rollup path.",
    tags=("aggregate", "grouping-sets", "sql"),
)
def grouping_sets_segment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "orders", "customer")
    t["orders"].join(
        maybe_broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey")
    ).createOrReplaceTempView("__gs_orders_customers")
    return spark.sql(
        """
        SELECT c_mktsegment, o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS total_price
        FROM __gs_orders_customers
        GROUP BY GROUPING SETS ((c_mktsegment), (o_orderpriority), ())
        """
    )


@register(
    "priority_price_rank_stats",
    oracle="""
SELECT o_orderkey, o_orderpriority,
       PERCENT_RANK() OVER w AS pct_rank,
       CUME_DIST() OVER w AS cume_dist,
       DENSE_RANK() OVER w AS drank
FROM orders
WHERE o_orderkey <= 300
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
""",
    doc="Rank-statistics windows (percent_rank / cume_dist / "
        "dense_rank) per priority group with a unique-key tiebreak so "
        "every rank value is engine-deterministic.",
    tags=("window", "rank"),
)
def priority_price_rank_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, "orders")["orders"].where(
        F.col("o_orderkey") <= 300
    )
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume_dist"),
        F.dense_rank().over(w).cast("long").alias("drank"),
    )


@register(
    "window_navigation_battery",
    oracle="""
SELECT o_orderkey, o_orderpriority,
       LAG(o_totalprice, 1, 0.0) OVER w AS prev_price,
       LEAD(o_totalprice, 2) OVER w AS next2_price,
       FIRST_VALUE(o_orderkey) OVER w AS first_key,
       LAST_VALUE(o_orderkey) OVER wfull AS last_key,
       NTH_VALUE(o_orderkey, 3) OVER wfull AS third_key
FROM orders
WHERE o_orderkey <= 300
WINDOW w AS (PARTITION BY o_orderpriority
             ORDER BY o_totalprice, o_orderkey),
       wfull AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING
                          AND UNBOUNDED FOLLOWING)
""",
    doc="Navigation-window battery (lag-with-default / multi-step lead "
        "/ first_value / last_value / nth_value): last_value and "
        "nth_value run over an EXPLICIT unbounded ROWS frame on both "
        "engines — the default frame ends at CURRENT ROW, which would "
        "make last_value a no-op and is the classic cross-engine "
        "window gotcha. Unique-key tiebreak keeps every navigated "
        "value deterministic.",
    tags=("window", "navigation"),
)
def window_navigation_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, "orders")["orders"].where(
        F.col("o_orderkey") <= 300
    )
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.lag("o_totalprice", 1, 0.0).over(w).alias("prev_price"),
        F.lead("o_totalprice", 2).over(w).alias("next2_price"),
        F.first("o_orderkey").over(w).alias("first_key"),
        F.last("o_orderkey").over(wfull).alias("last_key"),
        F.nth_value("o_orderkey", 3).over(wfull).alias("third_key"),
    )


@register(
    "calendar_zero_fill",
    oracle="""
WITH bounds AS (
  SELECT MIN(CAST(o_orderdate AS DATE)) AS lo,
         MAX(CAST(o_orderdate AS DATE)) AS hi
  FROM orders
),
cal AS (
  SELECT CAST(UNNEST(GENERATE_SERIES(lo, hi, INTERVAL 1 DAY)) AS DATE) AS d
  FROM bounds
),
daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS n
  FROM orders GROUP BY 1
)
SELECT STRFTIME(c.d, '%Y-%m-%d') AS day,
       CAST(COALESCE(daily.n, 0) AS BIGINT) AS n_orders,
       CASE WHEN daily.n IS NULL THEN 1 ELSE 0 END AS is_gap
FROM cal c LEFT JOIN daily ON daily.d = c.d
""",
    doc="Calendar-spine zero-fill — the densification every BI/time-"
        "series consumer needs over an activity table: generate the "
        "full day range from the data's own bounds (one-row aggregate "
        "-> sequence -> explode, no driver loop, no external calendar "
        "table), left-join the daily counts, and surface gap days "
        "explicitly. The spine is tiny so the join broadcasts; the "
        "orders side arrives pre-aggregated — the shuffle carries "
        "|days| rows, not |orders|.",
    tags=("time", "calendar", "densify", "join"),
)
def calendar_zero_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, "orders")["orders"].select(
        F.to_date("o_orderdate").alias("d")
    )
    bounds = o.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    cal = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("d")
    )
    daily = o.groupBy("d").agg(F.count(F.lit(1)).alias("n"))
    return cal.join(daily, "d", "left").select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n_orders"),
        F.when(F.col("n").isNull(), 1).otherwise(0).alias("is_gap"),
    )


@register(
    "gap_fill_linear_interpolation",
    oracle="""
WITH sparse AS (
  SELECT o_orderpriority AS pri, CAST(o_orderdate AS DATE) AS d,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
           AS rev_c
  FROM orders WHERE o_orderkey % 50 < 3
  GROUP BY 1, 2
),
bounds AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM sparse),
cal AS (
  SELECT CAST(UNNEST(GENERATE_SERIES(lo, hi, INTERVAL 1 DAY)) AS DATE) AS d
  FROM bounds
),
spine AS (
  SELECT p.pri, c.d
  FROM (SELECT DISTINCT pri FROM sparse) p CROSS JOIN cal c
),
joined AS (
  SELECT s.pri, s.d,
         DATEDIFF('day', DATE '1992-01-01', s.d) AS di,
         sp.rev_c
  FROM spine s LEFT JOIN sparse sp ON sp.pri = s.pri AND sp.d = s.d
),
ctx AS (
  SELECT pri, d, di, rev_c,
         LAST_VALUE(rev_c IGNORE NULLS) OVER wp AS prev_v,
         LAST_VALUE(CASE WHEN rev_c IS NOT NULL THEN di END IGNORE NULLS)
           OVER wp AS prev_d,
         FIRST_VALUE(rev_c IGNORE NULLS) OVER wn AS next_v,
         FIRST_VALUE(CASE WHEN rev_c IS NOT NULL THEN di END IGNORE NULLS)
           OVER wn AS next_d
  FROM joined
  WINDOW wp AS (PARTITION BY pri ORDER BY di
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wn AS (PARTITION BY pri ORDER BY di
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT pri, STRFTIME(d, '%Y-%m-%d') AS day,
       CASE WHEN rev_c IS NOT NULL THEN 'obs'
            WHEN prev_v IS NOT NULL AND next_v IS NOT NULL THEN 'interp'
            ELSE 'edge' END AS fill_kind,
       -- all-integer interpolation in cents with floor division: a
       -- float midpoint of two cent values lands exactly on a
       -- half-grain boundary where the engines' ROUND of the inexact
       -- double disagrees; integer cents never reach a float
       CAST(CASE
         WHEN rev_c IS NOT NULL THEN rev_c
         WHEN prev_v IS NOT NULL AND next_v IS NOT NULL
           THEN (prev_v * (next_d - di) + next_v * (di - prev_d))
                // (next_d - prev_d)
         ELSE COALESCE(prev_v, next_v) END AS BIGINT)
         AS revenue_filled_cents
FROM ctx
""",
    doc="Time-series gap repair by linear interpolation: a sparse "
        "daily revenue series per order priority (deterministically "
        "thinned so real gaps exist) is densified onto a calendar "
        "spine, then each gap day is filled by interpolating between "
        "the "
        "nearest observations on each side — last_value/first_value "
        "with IGNORE NULLS over two frames of ONE partitioning, so "
        "the plan shuffles/sorts once per direction pair. Edges hold "
        "the nearest value. Interpolation arithmetic is the same "
        "expression tree on both engines; the 2 dp report grain "
        "keeps ~1e4 interpolated rows clear of FMA-contraction "
        "boundary flips (env_sensitivity_audit class SIGDIG).",
    tags=("time", "calendar", "densify", "window", "interpolation"),
)
def gap_fill_linear_interpolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, "orders")["orders"]
    sparse = (
        o.where(F.col("o_orderkey") % 50 < 3)
        .groupBy(
            F.col("o_orderpriority").alias("pri"),
            F.to_date("o_orderdate").alias("d"),
        )
        .agg(
            (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
            .cast("long")
            .alias("rev_c")
        )
    )
    bounds = sparse.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    cal = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("d")
    )
    spine = sparse.select("pri").distinct().crossJoin(F.broadcast(cal))
    joined = spine.join(sparse, ["pri", "d"], "left").select(
        "pri",
        "d",
        F.datediff("d", F.lit("1992-01-01")).alias("di"),
        "rev_c",
    )
    wp = (
        Window.partitionBy("pri")
        .orderBy("di")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = (
        Window.partitionBy("pri")
        .orderBy("di")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_d = F.when(F.col("rev_c").isNotNull(), F.col("di"))
    ctx = joined.select(
        "pri",
        "d",
        "di",
        "rev_c",
        F.last("rev_c", ignorenulls=True).over(wp).alias("prev_v"),
        F.last(obs_d, ignorenulls=True).over(wp).alias("prev_d"),
        F.first("rev_c", ignorenulls=True).over(wn).alias("next_v"),
        F.first(obs_d, ignorenulls=True).over(wn).alias("next_d"),
    )
    both = F.col("prev_v").isNotNull() & F.col("next_v").isNotNull()
    # all-integer interpolation in cents with floor division (see
    # oracle note): float midpoints of cent values land exactly on
    # rounding half-boundaries where the engines disagree.
    # PRECONDITION: the dividend is NONNEGATIVE (revenue cents; both
    # interpolation endpoints >= 0). Spark `div` truncates toward zero
    # while DuckDB `//` floors — they agree only on nonnegative
    # operands; if refunds/credits (negative cents) ever enter this
    # table, switch both engines to (a - pmod(a, b)) / b.
    interp = F.expr(
        "(prev_v * (next_d - di) + next_v * (di - prev_d))"
        " div (next_d - prev_d)"
    )
    return ctx.select(
        "pri",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.when(F.col("rev_c").isNotNull(), F.lit("obs"))
        .when(both, F.lit("interp"))
        .otherwise(F.lit("edge"))
        .alias("fill_kind"),
        F.when(F.col("rev_c").isNotNull(), F.col("rev_c"))
        .when(both, interp)
        .otherwise(F.coalesce("prev_v", "next_v"))
        .cast("long")
        .alias("revenue_filled_cents"),
    )


HIST_BUCKETS = 16


@register(
    "histogram_profile_totalprice",
    oracle=f"""
WITH bounds AS (
  SELECT MIN(CAST(o_totalprice AS DOUBLE)) AS lo,
         MAX(CAST(o_totalprice AS DOUBLE)) AS hi
  FROM orders
)
SELECT CAST(LEAST(FLOOR((CAST(o_totalprice AS DOUBLE) - lo) / (hi - lo)
                        * {HIST_BUCKETS}), {HIST_BUCKETS - 1}) AS BIGINT)
         + 1 AS bucket,
       COUNT(*) AS n_rows,
       ROUND(MIN(CAST(o_totalprice AS DOUBLE)), 2) AS bucket_min,
       ROUND(MAX(CAST(o_totalprice AS DOUBLE)), 2) AS bucket_max
FROM orders CROSS JOIN bounds
GROUP BY 1
""",
    doc=f"Equi-width histogram profile ({HIST_BUCKETS} buckets) of the "
        "order-price distribution — the column-profiling primitive "
        "behind data-quality dashboards and optimizer statistics. "
        "Bounds come from a broadcast one-row aggregate. The bucket "
        "id is an explicit least(floor((v-lo)/(hi-lo)*N), N-1)+1 "
        "expression rather than width_bucket (absent in DuckDB): "
        "every step is an exactly-rounded IEEE op evaluated in the "
        "same order on both engines, so assignment — including the "
        "v==hi clamp into the top bucket — is bit-identical. Two "
        "aggregates, one of them one row; the histogram shuffle "
        "carries only bucket ids.",
    tags=("quality", "profiling", "histogram", "aggregate"),
)
def histogram_profile_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, "orders")["orders"].select(
        F.col("o_totalprice").cast("double").alias("v")
    )
    bounds = F.broadcast(o.agg(F.min("v").alias("lo"), F.max("v").alias("hi")))
    return (
        o.crossJoin(bounds)
        .groupBy(
            (
                F.least(
                    F.floor(
                        (F.col("v") - F.col("lo"))
                        / (F.col("hi") - F.col("lo"))
                        * HIST_BUCKETS
                    ),
                    F.lit(HIST_BUCKETS - 1),
                ).cast("bigint")
                + 1
            ).alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.min("v"), 2).alias("bucket_min"),
            F.round(F.max("v"), 2).alias("bucket_max"),
        )
    )


@register(
    "unpivot_order_metrics",
    oracle="""
WITH wide AS (
  SELECT o_orderpriority AS pri,
         COUNT(*) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
           AS total_price,
         CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers
  FROM orders GROUP BY 1
)
SELECT pri, metric, CAST(value AS DOUBLE) AS value
FROM wide
UNPIVOT (value FOR metric IN (n_orders, total_price, n_customers))
""",
    doc="UNPIVOT/melt — the inverse of the pivot operator the engine "
        "already ships: a wide per-priority metrics row unpivots to "
        "(pri, metric, value) long form, the shape every metrics "
        "store and plotting layer wants. Spark's unpivot/melt emits "
        "one Expand node (no join, no shuffle beyond the source "
        "aggregate); metric values are cast to a common double type "
        "on both engines since UNPIVOT requires homogeneous value "
        "columns.",
    tags=("unpivot", "aggregate", "reshape"),
)
def unpivot_order_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, "orders")["orders"]
    wide = o.groupBy(F.col("o_orderpriority").alias("pri")).agg(
        F.count(F.lit(1)).cast("double").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_price"),
        F.count_distinct("o_custkey").cast("double").alias("n_customers"),
    )
    return wide.unpivot(
        ids=["pri"],
        values=["n_orders", "total_price", "n_customers"],
        variableColumnName="metric",
        valueColumnName="value",
    )


@register(
    "null_semantics_battery",
    oracle="""
WITH t AS (
  SELECT o_orderkey AS k,
         NULLIF(o_orderpriority, '3-MEDIUM') AS pri,
         CASE WHEN o_orderkey % 7 = 0 THEN NULL
              ELSE CAST(o_totalprice AS DOUBLE) END AS price
  FROM orders WHERE o_orderkey <= 2000
)
SELECT COALESCE(pri, '<null>') AS pri_group,
       COUNT(*) AS n_rows,
       COUNT(price) AS n_price_nonnull,
       CAST(SUM(CASE WHEN price IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_price_null,
       -- exact-decimal sum / count, cast once: AVG(double) accumulates
       -- in engine-specific order (env_sensitivity_audit class SIGDIG)
       ROUND(CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE)
             / COUNT(price), 6) AS avg_price_ignoring_nulls,
       CAST(SUM(CASE WHEN pri IS NOT DISTINCT FROM NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_nullsafe_eq_null,
       MIN(CASE WHEN price IS NOT NULL THEN k END) AS first_priced_key,
       COALESCE(CONCAT_WS('|', pri, CAST(k % 2 AS VARCHAR)), '') AS concat_ws_skip_null
FROM t
GROUP BY pri, k % 2
ORDER BY 1
""",
    doc="Null-semantics battery over a deterministically nulled "
        "projection: grouping BY a nullable key (null forms its own "
        "group on both engines), count(col) vs count(*) (ignores "
        "nulls vs not), avg ignoring nulls, the null-safe equality "
        "operator (Spark <=> / SQL IS NOT DISTINCT FROM), "
        "conditional aggregation over null flags, and concat_ws's "
        "null-skipping — the edge cases that silently diverge "
        "between engines if any default is assumed. Hash-certified "
        "so every gate run re-proves the engine's null contract.",
    tags=("nulls", "semantics", "aggregate"),
)
def null_semantics_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, "orders")["orders"]
    t = o.where(F.col("o_orderkey") <= 2000).select(
        F.col("o_orderkey").alias("k"),
        F.nullif(F.col("o_orderpriority"), F.lit("3-MEDIUM")).alias("pri"),
        F.when(F.col("o_orderkey") % 7 == 0, F.lit(None))
        .otherwise(F.col("o_totalprice").cast("double"))
        .alias("price"),
    )
    return (
        t.groupBy("pri", (F.col("k") % 2).alias("_k2"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("price").alias("n_price_nonnull"),
            F.sum(
                F.when(F.col("price").isNull(), 1).otherwise(0)
            ).alias("n_price_null"),
            F.round(
                F.sum(F.col("price").cast("decimal(18,2)")).cast("double")
                / F.count("price"),
                6,
            ).alias("avg_price_ignoring_nulls"),
            F.sum(
                F.when(F.col("pri").eqNullSafe(F.lit(None)), 1).otherwise(0)
            ).alias("n_nullsafe_eq_null"),
            F.min(
                F.when(F.col("price").isNotNull(), F.col("k"))
            ).alias("first_priced_key"),
        )
        .select(
            F.coalesce(F.col("pri"), F.lit("<null>")).alias("pri_group"),
            "n_rows",
            "n_price_nonnull",
            "n_price_null",
            "avg_price_ignoring_nulls",
            "n_nullsafe_eq_null",
            "first_priced_key",
            F.coalesce(
                F.concat_ws("|", F.col("pri"), F.col("_k2").cast("string")),
                F.lit(""),
            ).alias("concat_ws_skip_null"),
        )
    )


@register(
    "range_frame_trailing_week",
    oracle="""
WITH daily AS (
  SELECT o_orderpriority AS pri,
         DATEDIFF('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))
           AS day_no,
         -- keep DECIMAL through the frame sum: sliding-frame double
         -- accumulation orders differ across engines (segment tree vs
         -- incremental add/remove), DECIMAL window sums are exact
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
  FROM orders WHERE o_orderkey <= 20000
  GROUP BY 1, 2
)
SELECT pri, day_no,
       ROUND(CAST(SUM(rev) OVER (PARTITION BY pri ORDER BY day_no
                            RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
                  AS DOUBLE), 6)
         AS trailing_7d_rev,
       CAST(COUNT(*) OVER (PARTITION BY pri ORDER BY day_no
                           RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
            AS BIGINT) AS n_days_in_frame
FROM daily
""",
    doc="RANGE window frame over VALUES, not rows: per priority, the "
        "trailing-7-calendar-day revenue sum — the frame bound is a "
        "day-number OFFSET (RANGE BETWEEN 6 PRECEDING), so days "
        "missing from the data correctly shrink the frame, which a "
        "ROWS frame gets wrong on sparse series. Complements the "
        "existing ROWS-frame moving average; n_days_in_frame exposes "
        "the frame width so the sparse-day semantics are themselves "
        "hash-certified. One partitioning, one sort; the pre-"
        "aggregation to daily grain keeps the window input at "
        "O(days), not O(orders).",
    tags=("window", "range-frame", "time", "aggregate"),
)
def range_frame_trailing_week(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, "orders")["orders"]
    daily = (
        o.where(F.col("o_orderkey") <= 20000)
        .groupBy(
            F.col("o_orderpriority").alias("pri"),
            # long: the oracle's day arithmetic is BIGINT (width parity)
            F.datediff(F.to_date("o_orderdate"), F.lit("1992-01-01"))
            .cast("long")
            .alias("day_no"),
        )
        .agg(
            # DECIMAL through the frame sum (see oracle note): exact
            # window arithmetic on both engines, cast only at output
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev")
        )
    )
    w = (
        Window.partitionBy("pri")
        .orderBy("day_no")
        .rangeBetween(-6, Window.currentRow)
    )
    return daily.select(
        "pri",
        "day_no",
        F.round(F.sum("rev").over(w).cast("double"), 6).alias(
            "trailing_7d_rev"
        ),
        F.count(F.lit(1)).over(w).alias("n_days_in_frame"),
    )


@register(
    "window_rank_battery",
    oracle="""
SELECT o_orderkey, o_orderpriority,
       RANK() OVER w AS rnk,
       DENSE_RANK() OVER w AS dense_rnk,
       ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
       ROUND(CUME_DIST() OVER w, 6) AS cume
FROM orders
WHERE o_orderkey <= 1000
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderstatus)
""",
    doc="Rank-function battery over a deliberately TIE-HEAVY ordering "
        "(status has 3 values, so rank/dense_rank gaps and the "
        "percent_rank/cume_dist plateaus are all exercised): rank "
        "with gaps, dense_rank without, percent_rank = (rank-1)/(n-1) "
        "and cume_dist = peers<=x / n — both exact rationals "
        "evaluated on identical operands, rounded 6 dp. One window "
        "spec, one shuffle+sort.",
    tags=("window", "rank", "functions"),
)
def window_rank_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, "orders")["orders"].where(
        F.col("o_orderkey") <= 1000
    )
    w = Window.partitionBy("o_orderpriority").orderBy("o_orderstatus")
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        # cast long: DuckDB RANK/DENSE_RANK are BIGINT — width parity
        # keeps the oracle gate warning-free (r4 zorder precedent)
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("dense_rnk"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@register(
    "corr_covar_battery",
    oracle="""
WITH m AS (
  SELECT l_returnflag,
         COUNT(*) AS n,
         SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sq,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS sp,
         SUM(CAST(l_discount AS DECIMAL(18,2))) AS sd,
         SUM(CAST(l_quantity AS DECIMAL(18,2))
             * CAST(l_quantity AS DECIMAL(18,2))) AS sqq,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2))
             * CAST(l_extendedprice AS DECIMAL(18,2))) AS spp,
         SUM(CAST(l_discount AS DECIMAL(18,2))
             * CAST(l_discount AS DECIMAL(18,2))) AS sdd,
         SUM(CAST(l_quantity AS DECIMAL(18,2))
             * CAST(l_extendedprice AS DECIMAL(18,2))) AS sqp,
         SUM(CAST(l_quantity AS DECIMAL(18,2))
             * CAST(l_discount AS DECIMAL(18,2))) AS sqd
  FROM lineitem GROUP BY l_returnflag
),
d AS (
  SELECT l_returnflag, CAST(n AS DOUBLE) AS n,
         CAST(sq AS DOUBLE) AS sq, CAST(sp AS DOUBLE) AS sp,
         CAST(sd AS DOUBLE) AS sd, CAST(sqq AS DOUBLE) AS sqq,
         CAST(spp AS DOUBLE) AS spp, CAST(sdd AS DOUBLE) AS sdd,
         CAST(sqp AS DOUBLE) AS sqp, CAST(sqd AS DOUBLE) AS sqd
  FROM m
)
SELECT l_returnflag,
       CAST(n AS BIGINT) AS n,
       ROUND((n * sqp - sq * sp)
             / (SQRT(n * sqq - sq * sq) * SQRT(n * spp - sp * sp)), 6)
         AS corr_qty_price,
       ROUND((n * sqd - sq * sd)
             / (SQRT(n * sqq - sq * sq) * SQRT(n * sdd - sd * sd)), 6)
         AS corr_qty_disc,
       ROUND((sqp - sq * sp / n) / (n - 1), 4) AS covar_qty_price,
       ROUND(SQRT((spp - sp * sp / n) / (n - 1)), 4) AS std_price
FROM d
""",
    doc="Bivariate-statistics battery per return flag: Pearson "
        "correlation, sample covariance, and sample stddev — the "
        "column-relationship profile a feature-engineering pass "
        "computes before training. The native CORR/COVAR/STDDEV "
        "aggregates use engine-specific one-pass comoment merges "
        "whose merge ORDER differs across builds, so the battery "
        "computes explicit DECIMAL-exact power sums instead and "
        "derives the moments as deterministic scalar expression "
        "trees after one cast (env_sensitivity_audit class SIGDIG "
        "repair; IEEE +,-,*,/ and SQRT are correctly rounded, so "
        "identical trees give identical doubles). One map-side-"
        "combinable aggregate, exactly as before.",
    tags=("aggregate", "statistics", "quality"),
)
def corr_covar_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    # pre-project the casts and products ONCE: repeating the decimal
    # expression trees inside each aggregate is not CSE'd and measured
    # 1.99 s vs 0.44 s at sf0.1 for the identical values
    pre = li.select(
        "l_returnflag",
        dec("l_quantity").alias("q"),
        dec("l_extendedprice").alias("p"),
        dec("l_discount").alias("d"),
        (dec("l_quantity") * dec("l_quantity")).alias("qq"),
        (dec("l_extendedprice") * dec("l_extendedprice")).alias("pp"),
        (dec("l_discount") * dec("l_discount")).alias("dd"),
        (dec("l_quantity") * dec("l_extendedprice")).alias("qp"),
        (dec("l_quantity") * dec("l_discount")).alias("qd"),
    )
    m = pre.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("q").alias("sq"),
        F.sum("p").alias("sp"),
        F.sum("d").alias("sd"),
        F.sum("qq").alias("sqq"),
        F.sum("pp").alias("spp"),
        F.sum("dd").alias("sdd"),
        F.sum("qp").alias("sqp"),
        F.sum("qd").alias("sqd"),
    )
    dbl = lambda c: F.col(c).cast("double")  # noqa: E731
    d = m.select(
        "l_returnflag",
        dbl("n").alias("nd"),
        F.col("n").cast("long").alias("n"),
        dbl("sq").alias("sq"),
        dbl("sp").alias("sp"),
        dbl("sd").alias("sd"),
        dbl("sqq").alias("sqq"),
        dbl("spp").alias("spp"),
        dbl("sdd").alias("sdd"),
        dbl("sqp").alias("sqp"),
        dbl("sqd").alias("sqd"),
    )
    nd = F.col("nd")
    return d.select(
        "l_returnflag",
        "n",
        F.round(
            (nd * F.col("sqp") - F.col("sq") * F.col("sp"))
            / (
                F.sqrt(nd * F.col("sqq") - F.col("sq") * F.col("sq"))
                * F.sqrt(nd * F.col("spp") - F.col("sp") * F.col("sp"))
            ),
            6,
        ).alias("corr_qty_price"),
        F.round(
            (nd * F.col("sqd") - F.col("sq") * F.col("sd"))
            / (
                F.sqrt(nd * F.col("sqq") - F.col("sq") * F.col("sq"))
                * F.sqrt(nd * F.col("sdd") - F.col("sd") * F.col("sd"))
            ),
            6,
        ).alias("corr_qty_disc"),
        F.round(
            (F.col("sqp") - F.col("sq") * F.col("sp") / nd) / (nd - 1), 4
        ).alias("covar_qty_price"),
        F.round(
            F.sqrt(
                (F.col("spp") - F.col("sp") * F.col("sp") / nd) / (nd - 1)
            ),
            4,
        ).alias("std_price"),
    )


@register(
    "key_skew_profile",
    oracle="""
WITH per_key AS (
  SELECT l_orderkey AS k, COUNT(*) AS cnt FROM lineitem GROUP BY 1
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(SUM(cnt) AS BIGINT) AS total_rows,
       CAST(MAX(cnt) AS BIGINT) AS top_key_rows,
       ROUND(CAST(MAX(cnt) AS DOUBLE) / SUM(cnt), 6) AS top_key_share,
       CAST(MAX(cnt) AS BIGINT) AS max_per_key,
       CAST(MIN(cnt) AS BIGINT) AS min_per_key,
       ROUND(AVG(cnt), 6) AS avg_per_key
FROM per_key
""",
    doc="Shuffle-key skew diagnostic: the per-key row-count "
        "distribution of the join/agg key (orderkey here) — key "
        "count, hottest key's absolute and relative share, min/max/"
        "mean per key. This is the measurement that DECIDES between "
        "the engine's three skew strategies (AQE skew-join, salting, "
        "df-capped blocking): you profile before you pick. One "
        "aggregate; the per-key table is |keys| rows, the final "
        "summary one row (top_key_rows is by definition MAX(cnt), so "
        "no second aggregate or crossJoin is needed).",
    tags=("aggregate", "skew", "scale", "quality"),
)
def key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    per_key = li.groupBy(F.col("l_orderkey").alias("k")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    summary = per_key.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("cnt").alias("total_rows"),
        F.max("cnt").alias("max_per_key"),
        F.min("cnt").alias("min_per_key"),
        F.round(F.avg("cnt"), 6).alias("avg_per_key"),
    )
    return summary.select(
        "n_keys",
        "total_rows",
        F.col("max_per_key").alias("top_key_rows"),
        F.round(
            F.col("max_per_key").cast("double") / F.col("total_rows"), 6
        ).alias("top_key_share"),
        "max_per_key",
        "min_per_key",
        "avg_per_key",
    )


@register(
    "revenue_gini_by_segment",
    oracle="""
WITH rev AS (
  SELECT c.c_mktsegment AS seg, c.c_custkey AS k,
         SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS r
  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
),
ranked AS (
  SELECT seg, r, CAST(r AS DOUBLE) AS rd,
         ROW_NUMBER() OVER (PARTITION BY seg ORDER BY r, k) AS i,
         COUNT(*) OVER (PARTITION BY seg) AS n
  FROM rev
)
SELECT seg,
       CAST(MAX(n) AS BIGINT) AS n_customers,
       ROUND(CAST(SUM(r) AS DOUBLE), 2) AS total_revenue,
       ROUND(2.0 * SUM(i * rd) / (MAX(n) * SUM(rd))
             - (MAX(n) + 1.0) / MAX(n), 6) AS gini
FROM ranked
GROUP BY seg
""",
    doc="Revenue concentration per market segment: the exact Gini "
        "coefficient of per-customer revenue via the rank formula "
        "G = 2*sum(i*r_i)/(n*sum(r)) - (n+1)/n over the "
        "revenue-ascending ranking (custkey tiebreak makes the rank "
        "total) — the inequality diagnostic that tells a pipeline "
        "whether a segment's revenue (or a corpus source's token "
        "mass) is head-heavy before choosing skew strategies. Two "
        "shuffles (customer rollup, per-segment window), one final "
        "5-row aggregate; the double product-sum is partial-order "
        "sensitive only at the ulp level, absorbed by rounding.",
    tags=("aggregate", "statistics", "window", "skew"),
)
def revenue_gini_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir, "customer", "orders")
    rev = (
        t["customer"]
        .join(
            t["orders"],
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.col("c_custkey").alias("k"),
        )
        # DECIMAL money determinism (repo policy, ADVICE r4): the
        # per-customer sum is exact, so the rank order and the total
        # cannot flip at a .005 boundary under summation reorder
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("r"))
    )
    w = Window.partitionBy("seg").orderBy("r", "k")
    ranked = rev.select(
        "seg",
        "r",
        F.col("r").cast("double").alias("rd"),
        F.row_number().over(w).alias("i"),
        F.count(F.lit(1)).over(Window.partitionBy("seg")).alias("n"),
    )
    return ranked.groupBy("seg").agg(
        F.max("n").cast("long").alias("n_customers"),
        F.round(F.sum("r").cast("double"), 2).alias("total_revenue"),
        F.round(
            F.lit(2.0) * F.sum(F.col("i") * F.col("rd"))
            / (F.max("n") * F.sum("rd"))
            - (F.max("n") + F.lit(1.0)) / F.max("n"),
            6,
        ).alias("gini"),
    )


# ---------------------------------------------------------------------------
# Join-explosion profile: predict join output size WITHOUT running it
# ---------------------------------------------------------------------------

EXPLOSION_TOP_K = 10


@register(
    "join_explosion_profile",
    oracle=f"""
WITH k AS (
  SELECT l_partkey, COUNT(*) AS n FROM lineitem GROUP BY l_partkey
),
t AS (SELECT SUM(n * n) AS total_out, SUM(n) AS total_in FROM k)
SELECT k.l_partkey AS part_key,
       CAST(k.n AS BIGINT) AS n_rows,
       CAST(k.n * k.n AS BIGINT) AS contribution,
       CAST(t.total_out AS BIGINT) AS join_rows_total,
       CAST(t.total_in AS BIGINT) AS input_rows_total,
       ROUND(CAST(k.n * k.n AS DOUBLE) * 100 / t.total_out, 6)
         AS share_pct
FROM k CROSS JOIN t
ORDER BY contribution DESC, part_key
LIMIT {EXPLOSION_TOP_K}
""",
    doc="Join-explosion profile — predict a join's output size "
        "WITHOUT running it: |A JOIN B on k| = sum_k a_k*b_k exactly, "
        "so one per-key count aggregate prices the self-join of "
        "lineitem on partkey (the classic accidental fan-out) and "
        f"names the top-{EXPLOSION_TOP_K} exploding keys with their "
        "row contributions and share — the pre-flight check a "
        "planner (or an on-call engineer) runs before joining two "
        "100 TB tables, costing one scan instead of the blow-up. "
        "The identity is re-proven by the test suite against the "
        "materialized join at small scale; every reported number is "
        "exact integer arithmetic off one aggregate.",
    tags=("aggregate", "join", "skew", "diagnostics", "scale"),
)
def join_explosion_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    k = li.groupBy(F.col("l_partkey").alias("part_key")).agg(
        F.count(F.lit(1)).alias("n")
    )
    t = k.agg(
        F.sum(F.col("n") * F.col("n")).alias("total_out"),
        F.sum("n").alias("total_in"),
    )
    return (
        k.crossJoin(F.broadcast(t))
        .select(
            "part_key",
            F.col("n").cast("long").alias("n_rows"),
            (F.col("n") * F.col("n")).cast("long").alias("contribution"),
            F.col("total_out").cast("long").alias("join_rows_total"),
            F.col("total_in").cast("long").alias("input_rows_total"),
            F.round(
                (F.col("n") * F.col("n")).cast("double")
                * 100
                / F.col("total_out"),
                6,
            ).alias("share_pct"),
        )
        .orderBy(F.col("contribution").desc(), "part_key")
        .limit(EXPLOSION_TOP_K)
    )


# ---------------------------------------------------------------------------
# Sliding-window distinct users (the exact WAU metric)
# ---------------------------------------------------------------------------


@register(
    "sliding_distinct_users_7d",
    oracle="""
WITH ud AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
spine AS (SELECT DISTINCT day FROM ud)
SELECT s.day,
       CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS wau,
       CAST((SELECT COUNT(DISTINCT user_id) FROM ud u2
             WHERE u2.day = s.day) AS BIGINT) AS dau
FROM spine s
JOIN ud u ON u.day <= s.day AND u.day > s.day - 7
GROUP BY s.day
""",
    doc="EXACT trailing-7-day distinct users per day (WAU beside "
        "DAU) — the dashboard metric windows cannot express "
        "(count_distinct over a sliding frame is not an aggregate "
        "Spark or any engine supports directly): computed by "
        "deduplicating activity to (user, day) FIRST — so everything "
        "downstream is |users x active days|, never raw events — "
        "then joining each spine day to its trailing week of "
        "activity rows and count-distinct-ing per day. Cost is 7x "
        "the dedup'd activity table, exact at any scale; when even "
        "that is too much, the engine's HLL union rollup "
        "(hll_union_rollup_bounds) is the sketch path with an error "
        "certificate. The day-range join carries the day equi-ish "
        "band as its condition; integer date arithmetic both "
        "engines.",
    tags=("aggregate", "window", "distinct", "time", "join"),
)
def sliding_distinct_users_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    ud = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    spine = ud.select("day").distinct().withColumnRenamed("day", "sday")
    j = spine.join(
        ud,
        (F.col("day") <= F.col("sday"))
        & (F.col("day") > F.date_sub(F.col("sday"), 7)),
    )
    wau = j.groupBy("sday").agg(
        F.count_distinct("user_id").alias("wau")
    )
    dau = ud.groupBy("day").agg(F.count_distinct("user_id").alias("dau"))
    return (
        wau.join(dau, wau.sday == dau.day)
        .select(
            # timestamp, not date: DuckDB DATE arrives as datetime64
            F.col("sday").cast("timestamp").alias("day"),
            "wau",
            "dau",
        )
    )


# ---------------------------------------------------------------------------
# Referential-integrity audit across the star schema
# ---------------------------------------------------------------------------

RI_EDGES = (
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
)


def _ri_sql(child: str, fk: str, parent: str, pk: str) -> str:
    return f"""
SELECT '{child}.{fk}' AS fk_edge, '{parent}.{pk}' AS references,
       CAST((SELECT COUNT(*) FROM {child}) AS BIGINT) AS n_child_rows,
       CAST((SELECT COUNT(*) FROM {child} c
             WHERE c.{fk} IS NOT NULL
               AND c.{fk} NOT IN (SELECT {pk} FROM {parent}))
            AS BIGINT) AS n_orphans,
       (SELECT COUNT(*) FROM {child} c
        WHERE c.{fk} IS NOT NULL
          AND c.{fk} NOT IN (SELECT {pk} FROM {parent})) = 0 AS intact
"""


@register(
    "referential_integrity_audit",
    oracle="\nUNION ALL\n".join(_ri_sql(*e) for e in RI_EDGES),
    doc="Referential-integrity audit of the full star schema: every "
        "FK edge (lineitem->orders/part/supplier, orders->customer, "
        "customer/supplier->nation, nation->region) is checked by a "
        "LEFT ANTI join counting orphaned child rows — the "
        "load-bearing data-quality check after any ingest/backfill, "
        "here returning the per-edge orphan count (the alert metric) "
        "and verdict. Each edge is one anti join shuffling only the "
        "key column (dims broadcast under the size gate); exact "
        "integer counting; seven edges union into the tiny report.",
    tags=("quality", "integrity", "join", "aggregate", "profiling"),
)
def referential_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    tables = load_tables(spark, sf_dir)
    out = None
    for child, fk, parent, pk in RI_EDGES:
        c, p = tables[child], tables[parent]
        orphans = c.where(F.col(fk).isNotNull()).join(
            p.select(pk), F.col(fk) == F.col(pk), "left_anti"
        )
        row = (
            orphans.agg(F.count(F.lit(1)).alias("n_orphans"))
            .crossJoin(
                F.broadcast(
                    c.agg(F.count(F.lit(1)).alias("n_child_rows"))
                )
            )
            .select(
                F.lit(f"{child}.{fk}").alias("fk_edge"),
                F.lit(f"{parent}.{pk}").alias("references"),
                "n_child_rows",
                "n_orphans",
                (F.col("n_orphans") == 0).alias("intact"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


@register(
    "try_arithmetic_battery",
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_orderkey % 10 = 0 THEN NULL
            ELSE CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                 // (o_orderkey % 10)
       END AS try_div,
       CASE WHEN o_orderkey % 3 = 0
            THEN CAST(9223372036854775807 AS BIGINT)
            ELSE o_orderkey + 1 END AS try_add_guarded,
       CASE WHEN o_orderkey % 3 = 0 THEN NULL
            ELSE o_orderkey + 1 END AS try_add_overflow,
       TRY_CAST(CASE WHEN o_orderkey % 2 = 0
                     THEN CAST(o_orderkey AS VARCHAR)
                     ELSE o_orderstatus || 'x' END AS BIGINT) AS try_cast_int,
       CASE WHEN LEN(STRING_SPLIT(o_orderpriority, '-')) >= 3
            THEN STRING_SPLIT(o_orderpriority, '-')[3] END AS try_elem
FROM orders WHERE o_orderkey <= 1000
""",
    doc="ANSI ERROR-SAFETY battery: with spark.sql.ansi.enabled=true "
        "(this engine's default) bad arithmetic RAISES, and the "
        "try_* family is the lenient contract — this query certifies "
        "each lenient form returns NULL exactly where strict mode "
        "would error: try_divide by a cycling 0 divisor, try_add at "
        "BIGINT max (overflow -> NULL, proven against a guarded "
        "replay), try_cast of non-numeric strings, try_element_at "
        "past the array end. The oracle replays every NULL site "
        "relationally (CASE guards / TRY_CAST), so the engine's "
        "error-handling SEMANTICS — not just happy-path values — "
        "are hash-certified. Pure projections, one scan, no shuffle.",
    tags=("functions", "scalar", "ansi", "nulls"),
)
def try_arithmetic_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, "orders")["orders"].where(
        F.col("o_orderkey") <= 1000
    )
    big = F.lit(9223372036854775807).cast("long")
    return o.select(
        "o_orderkey",
        F.try_divide(
            (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"),
            F.col("o_orderkey") % 10,
        ).cast("long").alias("try_div"),
        # guarded twin: what the overflow operand WAS (proves the
        # overflow branch is the one exercised)
        F.when(F.col("o_orderkey") % 3 == 0, big)
        .otherwise(F.col("o_orderkey") + 1)
        .alias("try_add_guarded"),
        F.try_add(
            F.when(F.col("o_orderkey") % 3 == 0, big).otherwise(
                F.col("o_orderkey")
            ),
            F.lit(1),
        ).alias("try_add_overflow"),
        F.when(
            F.col("o_orderkey") % 2 == 0,
            F.col("o_orderkey").cast("string"),
        )
        .otherwise(F.concat(F.col("o_orderstatus"), F.lit("x")))
        .try_cast("long")
        .alias("try_cast_int"),
        F.try_element_at(
            F.split("o_orderpriority", "-"), F.lit(3)
        ).alias("try_elem"),
    )


# ---------------------------------------------------------------------------
# Window TIE-semantics battery: rank vs dense_rank vs ntile under ties
# ---------------------------------------------------------------------------


@register(
    "window_ties_battery",
    oracle="""
WITH d AS (
  SELECT o_orderpriority AS pri,
         CAST(FLOOR(o_totalprice / 1000) AS BIGINT) AS pb
  FROM orders
),
r AS (
  SELECT pri, pb,
         RANK()       OVER (PARTITION BY pri ORDER BY pb) AS rk,
         DENSE_RANK() OVER (PARTITION BY pri ORDER BY pb) AS dr,
         NTILE(4)     OVER (PARTITION BY pri ORDER BY pb) AS nt,
         COUNT(*)     OVER (PARTITION BY pri) AS n
  FROM d
)
SELECT pri,
       CAST(MIN(n) AS BIGINT) AS n_rows,
       CAST(MAX(dr) AS BIGINT) AS n_distinct_buckets,
       CAST(SUM(rk) AS BIGINT) AS sum_rank,
       CAST(SUM(dr) AS BIGINT) AS sum_dense_rank,
       CAST(SUM(nt) AS BIGINT) AS sum_ntile4,
       SUM(rk) < MIN(n) * (MIN(n) + 1) // 2 AS has_ties
FROM r GROUP BY pri
""",
    doc="Tie-semantics battery for the ranking window functions: "
        "prices are bucketed to thousands (guaranteeing ties), then "
        "RANK (gaps after ties), DENSE_RANK (no gaps) and NTILE(4) "
        "(SQL-standard uneven-tile rule) run over one per-priority "
        "window spec. Whole columns are certified via EXACT integer "
        "checksums — sum(rank), sum(dense_rank), sum(ntile), and "
        "max(dense_rank) = distinct buckets — so the gate "
        "value-checks every row's rank without emitting per-row "
        "output; has_ties pins that sum(rank) < n(n+1)/2, i.e. ties "
        "actually exercised the gap semantics. One window partitioned "
        "by priority (no global window), one aggregate.",
    tags=("window", "rank", "ties", "aggregate"),
)
def window_ties_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = load_tables(spark, sf_dir, "orders")["orders"]
    d = orders.select(
        F.col("o_orderpriority").alias("pri"),
        F.floor(F.col("o_totalprice") / 1000).cast("long").alias("pb"),
    )
    w = Window.partitionBy("pri").orderBy("pb")
    wn = Window.partitionBy("pri")
    r = d.select(
        "pri",
        F.rank().over(w).alias("rk"),
        F.dense_rank().over(w).alias("dr"),
        F.ntile(4).over(w).alias("nt"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    return r.groupBy("pri").agg(
        F.min("n").cast("long").alias("n_rows"),
        F.max("dr").cast("long").alias("n_distinct_buckets"),
        F.sum("rk").cast("long").alias("sum_rank"),
        F.sum("dr").cast("long").alias("sum_dense_rank"),
        F.sum("nt").cast("long").alias("sum_ntile4"),
        (
            F.sum("rk") < F.min("n") * (F.min("n") + 1) / 2
        ).alias("has_ties"),
    )


# ---------------------------------------------------------------------------
# Relational division: customers whose orders cover EVERY priority
# ---------------------------------------------------------------------------


@register(
    "relational_division_priorities",
    oracle="""
WITH cover AS (
  SELECT o_custkey AS k
  FROM orders
  GROUP BY o_custkey
  HAVING COUNT(DISTINCT o_orderpriority) = 5
)
SELECT c.c_nationkey AS nation,
       CAST(COUNT(*) AS BIGINT) AS n_complete_customers,
       CAST(MIN(cover.k) AS BIGINT) AS min_custkey,
       CAST(MAX(cover.k) AS BIGINT) AS max_custkey
FROM cover JOIN customer c ON c.c_custkey = cover.k
GROUP BY c.c_nationkey
""",
    doc="RELATIONAL DIVISION — the textbook operator SQL lacks a "
        "keyword for ('customers who ordered at EVERY priority "
        "level'): expressed by the counting idiom, one grouped "
        "aggregate with COUNT(DISTINCT divisor-key) equal to the "
        "divisor cardinality, which is the division plan that "
        "SCALES (the double-NOT-EXISTS textbook form plans two "
        "correlated anti-joins). Per-nation census of the complete "
        "customers with key-range fingerprints. One aggregate + one "
        "broadcast dim join.",
    tags=("relational", "aggregate", "join"),
)
def relational_division_priorities(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    t = load_tables(spark, sf_dir, "orders", "customer")
    cover = (
        t["orders"]
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(F.count_distinct("o_orderpriority").alias("npri"))
        .where(F.col("npri") == 5)
    )
    return (
        cover.join(
            F.broadcast(t["customer"].select("c_custkey", "c_nationkey")),
            F.col("k") == F.col("c_custkey"),
        )
        .groupBy(F.col("c_nationkey").alias("nation"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_complete_customers"),
            F.min("k").cast("long").alias("min_custkey"),
            F.max("k").cast("long").alias("max_custkey"),
        )
    )


# ---------------------------------------------------------------------------
# Pivot -> unpivot roundtrip identity certificate
# ---------------------------------------------------------------------------

_PIVOT_PRIS = (
    "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW",
)


@register(
    "pivot_unpivot_roundtrip",
    oracle=f"""
WITH direct AS (
  SELECT o_orderstatus AS status, o_orderpriority AS pri,
         COUNT(*) AS n
  FROM orders GROUP BY 1, 2
),
wide AS (
  SELECT status,
         {", ".join(
             'SUM(CASE WHEN pri = ' + repr(p) + ' THEN n ELSE 0 END)'
             + ' AS c' + str(i) for i, p in enumerate(_PIVOT_PRIS))}
  FROM direct GROUP BY status
),
tall AS (
  {" UNION ALL ".join(
      'SELECT status, ' + repr(p) + ' AS pri, c' + str(i) + ' AS n'
      + ' FROM wide' for i, p in enumerate(_PIVOT_PRIS))}
)
SELECT t.status, t.pri,
       CAST(t.n AS BIGINT) AS n_roundtrip,
       CAST(COALESCE(d.n, 0) AS BIGINT) AS n_direct,
       t.n = COALESCE(d.n, 0) AS identical
FROM tall t
LEFT JOIN direct d ON d.status = t.status AND d.pri = t.pri
""",
    doc="PIVOT -> UNPIVOT ROUNDTRIP certificate: grouped counts are "
        "pivoted to one column per priority (the reporting shape) "
        "and melted back with stack(), then certified cell-for-cell "
        "against the direct aggregate — the identity that proves the "
        "engine's reshape pair is lossless INCLUDING the zero-fill "
        "cells pivot materializes for absent (status, priority) "
        "combinations, which a naive melt silently drops or "
        "NULL-fills. Exact integer counts; one aggregate plus "
        "bounded-width reshapes.",
    tags=("unpivot", "pivot", "relational", "aggregate"),
)
def pivot_unpivot_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, "orders")["orders"]
    direct = o.groupBy(
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderpriority").alias("pri"),
    ).agg(F.count(F.lit(1)).alias("n"))
    wide = (
        direct.groupBy("status")
        .pivot("pri", list(_PIVOT_PRIS))
        .agg(F.coalesce(F.sum("n"), F.lit(0)))
        .na.fill(0)
    )
    cols = ", ".join(
        f"'{p}', `{p}`" for p in _PIVOT_PRIS
    )
    tall = wide.selectExpr(
        "status",
        f"stack({len(_PIVOT_PRIS)}, {cols}) AS (pri, n)",
    )
    d2 = direct.select(
        F.col("status").alias("d_status"),
        F.col("pri").alias("d_pri"),
        F.col("n").alias("d_n"),
    )
    return (
        tall.join(
            d2,
            (F.col("status") == F.col("d_status"))
            & (F.col("pri") == F.col("d_pri")),
            "left",
        )
        .select(
            "status",
            "pri",
            F.col("n").cast("long").alias("n_roundtrip"),
            F.coalesce(F.col("d_n"), F.lit(0))
            .cast("long")
            .alias("n_direct"),
            (F.col("n") == F.coalesce(F.col("d_n"), F.lit(0))).alias(
                "identical"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Null-key JOIN semantics battery
# ---------------------------------------------------------------------------


@register(
    "null_join_semantics_battery",
    oracle="""
WITH l AS (
  SELECT o_orderkey AS k,
         CASE WHEN o_orderkey % 7 = 0 THEN NULL
              ELSE o_custkey END AS ck
  FROM orders WHERE o_orderkey <= 4000
),
r AS (
  SELECT c_custkey AS ck2,
         CASE WHEN c_custkey % 5 = 0 THEN NULL
              ELSE c_custkey END AS ck_null
  FROM customer
)
SELECT CAST((SELECT COUNT(*) FROM l) AS BIGINT) AS n_left,
       CAST((SELECT COUNT(*) FROM l WHERE ck IS NULL) AS BIGINT)
         AS n_left_null_keys,
       CAST((SELECT COUNT(*) FROM l JOIN r ON l.ck = r.ck2) AS BIGINT)
         AS n_inner,
       CAST((SELECT COUNT(*) FROM l LEFT JOIN r ON l.ck = r.ck2)
            AS BIGINT) AS n_left_join,
       CAST((SELECT COUNT(*) FROM l
             WHERE NOT EXISTS (SELECT 1 FROM r WHERE r.ck2 = l.ck))
            AS BIGINT) AS n_anti,
       CAST((SELECT COUNT(*) FROM l JOIN r
             ON l.ck IS NOT DISTINCT FROM r.ck_null) AS BIGINT)
         AS n_nullsafe_join
FROM (SELECT 1)
""",
    doc="NULL-KEY JOIN SEMANTICS battery — the contract every "
        "warehouse migration re-proves: NULL keys match NOTHING in "
        "inner joins (they vanish), survive as unmatched rows in "
        "LEFT joins, count as 'no match' in anti-joins (NOT EXISTS "
        "with a non-nullable probe side), and match EACH OTHER only "
        "under the null-safe operator (<=> / IS NOT DISTINCT FROM) — "
        "where every null-left row pairs with every null-right row. "
        "Deterministically nulled keys on both sides; all six counts "
        "exact integers in one row, so any engine default that "
        "diverges flips the hash. Scale: each count is one "
        "equi-join/aggregate; the null-safe join keys a shuffle on "
        "the coalesced key exactly like a regular equi-join.",
    tags=("nulls", "join", "semantics", "aggregate"),
)
def null_join_semantics_battery(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    t = load_tables(spark, sf_dir, "orders", "customer")
    l = (
        t["orders"]
        .where(F.col("o_orderkey") <= 4000)
        .select(
            F.col("o_orderkey").alias("k"),
            F.when(F.col("o_orderkey") % 7 == 0, F.lit(None))
            .otherwise(F.col("o_custkey"))
            .alias("ck"),
        )
        .persist()
    )
    r = t["customer"].select(
        F.col("c_custkey").alias("ck2"),
        F.when(F.col("c_custkey") % 5 == 0, F.lit(None))
        .otherwise(F.col("c_custkey"))
        .alias("ck_null"),
    ).persist()
    n_left = l.count()
    n_left_null = l.where(F.col("ck").isNull()).count()
    n_inner = l.join(r, F.col("ck") == F.col("ck2")).count()
    n_left_join = l.join(r, F.col("ck") == F.col("ck2"), "left").count()
    n_anti = l.join(
        r, F.col("ck") == F.col("ck2"), "left_anti"
    ).count()
    n_nullsafe = l.join(r, F.col("ck").eqNullSafe(F.col("ck_null"))).count()
    l.unpersist()
    r.unpersist()
    return spark.createDataFrame(
        [
            (
                n_left,
                n_left_null,
                n_inner,
                n_left_join,
                n_anti,
                n_nullsafe,
            )
        ],
        "n_left long, n_left_null_keys long, n_inner long, "
        "n_left_join long, n_anti long, n_nullsafe_join long",
    )


# ---------------------------------------------------------------------------
# Keyset pagination vs OFFSET pagination equivalence
# ---------------------------------------------------------------------------

PAGE_SIZE = 20


@register(
    "keyset_pagination_battery",
    oracle=f"""
WITH ranked AS (
  SELECT o_orderkey AS k,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           AS price_c,
         ROW_NUMBER() OVER (
           ORDER BY CAST(o_totalprice AS DECIMAL(18,2)) DESC,
                    o_orderkey) AS rn
  FROM orders
),
page2_offset AS (
  SELECT k, price_c FROM ranked
  WHERE rn > {PAGE_SIZE} AND rn <= 2 * {PAGE_SIZE}
),
anchor AS (
  SELECT price_c AS ap, k AS ak FROM ranked WHERE rn = {PAGE_SIZE}
),
page2_keyset AS (
  SELECT r.k, r.price_c
  FROM ranked r CROSS JOIN anchor a
  WHERE (r.price_c < a.ap OR (r.price_c = a.ap AND r.k > a.ak))
  ORDER BY r.price_c DESC, r.k
  LIMIT {PAGE_SIZE}
)
SELECT CAST(2 AS BIGINT) AS page,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(MIN(o.k) AS BIGINT) AS min_key,
       CAST(MAX(o.k) AS BIGINT) AS max_key,
       CAST(SUM(o.price_c) AS BIGINT) AS sum_cents,
       CAST((SELECT COUNT(*) FROM page2_offset po
             JOIN page2_keyset pk ON pk.k = po.k) AS BIGINT)
         AS n_agreeing
FROM page2_offset o
""",
    doc=f"KEYSET (seek-method) PAGINATION certified against OFFSET "
        f"pagination: page 2 of the price-ranked orders is computed "
        f"both ways — OFFSET/LIMIT via a rank window, and the "
        f"seek-predicate (price, key) < anchor form that real APIs "
        f"use because OFFSET re-scans and re-sorts everything it "
        f"skips — and the battery certifies the two pages are the "
        f"SAME {PAGE_SIZE} rows (n_agreeing = n_rows). The total "
        f"order ties on the unique key, the precondition that makes "
        f"keyset pagination correct at all. Prices carried as exact "
        f"integer cents. Scale: the keyset page is a pushed-down "
        f"filter + top-k (TakeOrderedAndProject); OFFSET is the "
        f"anti-pattern being measured against.",
    tags=("limit", "topk", "relational", "window"),
)
def keyset_pagination_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    o = load_tables(spark, sf_dir, "orders")["orders"]
    ranked = o.select(
        F.col("o_orderkey").alias("k"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("price_c"),
    )
    w = Window.orderBy(F.desc("price_c"), "k")
    rn = ranked.withColumn("rn", F.row_number().over(w))
    page2_offset = rn.where(
        (F.col("rn") > PAGE_SIZE) & (F.col("rn") <= 2 * PAGE_SIZE)
    ).select("k", "price_c")
    anchor = rn.where(F.col("rn") == PAGE_SIZE).select(
        F.col("price_c").alias("ap"), F.col("k").alias("ak")
    )
    page2_keyset = (
        ranked.crossJoin(F.broadcast(anchor))
        .where(
            (F.col("price_c") < F.col("ap"))
            | ((F.col("price_c") == F.col("ap")) & (F.col("k") > F.col("ak")))
        )
        .orderBy(F.desc("price_c"), "k")
        .limit(PAGE_SIZE)
        .select(F.col("k").alias("kk"))
    )
    agree = page2_offset.join(
        page2_keyset, F.col("k") == F.col("kk")
    ).count()
    return page2_offset.agg(
        F.lit(2).cast("long").alias("page"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.min("k").cast("long").alias("min_key"),
        F.max("k").cast("long").alias("max_key"),
        F.sum("price_c").cast("long").alias("sum_cents"),
        F.lit(agree).cast("long").alias("n_agreeing"),
    )
