"""Decision-support battery: the TPC-H query shapes the reference's
warehouse (Snowflake) would serve over this star schema, adapted to the
driver testdata columns (no partsupp/shipmode/comment columns — each
query notes its adaptation). SURVEY §2.10: joins/aggregations are
absent in reference code and delegated to the warehouse; this module is
that capability, Spark-first.

Plan-shape notes (verified via .explain("formatted")):
- dimension joins broadcast (customer/supplier/nation/region/part at
  these scales; at 100 TB part/customer graduate to shuffle joins and
  AQE picks that automatically since broadcast() is only a hint);
- fact-fact joins (lineitem ⨝ orders) shuffle on the order key with
  both sides' filters pushed into the parquet scan;
- every aggregate gets map-side partials; decimal money math keeps
  cross-engine hash equality (see ytspark/queries/relational.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ytspark.queries import register
from ytspark.session import load_tables

_REV_SQL = "CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(4,2))"


def _rev() -> F.Column:
    return F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(4,2)")


@register(
    "q2_min_cost_supplier",
    oracle="""
WITH unit AS (
  SELECT p.p_partkey, p.p_name, s.s_suppkey, s.s_name,
         ROUND(MIN(l.l_extendedprice / l.l_quantity), 6) AS unit_cost
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  WHERE p.p_size <= 5
  GROUP BY p.p_partkey, p.p_name, s.s_suppkey, s.s_name
)
SELECT p_partkey, p_name, s_suppkey, s_name, unit_cost FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY p_partkey
                               ORDER BY unit_cost, s_suppkey) AS rk
  FROM unit
) WHERE rk = 1
""",
    doc="TPC-H Q2 shape (no partsupp table: supply cost derived from "
        "observed lineitem unit prices): cheapest supplier per small part "
        "via grouped min + per-part rank window.",
    tags=("join", "window", "aggregate"),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "lineitem", "part", "supplier")
    p = t["part"].where(F.col("p_size") <= 5)
    unit = (
        t["lineitem"]
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("p_partkey", "p_name", "s_suppkey", "s_name")
        .agg(
            F.round(F.min(F.col("l_extendedprice") / F.col("l_quantity")), 6).alias(
                "unit_cost"
            )
        )
    )
    w = Window.partitionBy("p_partkey").orderBy("unit_cost", "s_suppkey")
    return (
        unit.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("p_partkey", "p_name", "s_suppkey", "s_name", "unit_cost")
    )


@register(
    "q7_nation_trade",
    oracle=f"""
SELECT sn.n_name AS supp_nation,
       cn.n_name AS cust_nation,
       EXTRACT(YEAR FROM l.l_shipdate) AS ship_year,
       CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation sn ON s.s_nationkey = sn.n_nationkey
JOIN nation cn ON c.c_nationkey = cn.n_nationkey
WHERE sn.n_nationkey <> cn.n_nationkey
  AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
GROUP BY sn.n_name, cn.n_name, EXTRACT(YEAR FROM l.l_shipdate)
""",
    doc="TPC-H Q7 shape: cross-nation trade volume by (supplier nation, "
        "customer nation, year); two fact joins + two broadcast uses of "
        "the same nation dim under different aliases.",
    tags=("join", "aggregate"),
)
def q7_nation_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "lineitem", "orders", "customer", "supplier", "nation")
    sn = t["nation"].select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = t["nation"].select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    li = t["lineitem"].where(
        F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp")
    )
    return (
        li.join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .where(F.col("sn_key") != F.col("cn_key"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("ship_year"))
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
    )


@register(
    "q9_product_profit",
    oracle=f"""
SELECT n.n_name AS nation,
       EXTRACT(YEAR FROM o.o_orderdate) AS order_year,
       CAST(SUM({_REV_SQL}
                - CAST(l.l_quantity AS DECIMAL(18,2))
                  * CAST(p.p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS profit
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE p.p_type = 'STANDARD'
GROUP BY n.n_name, EXTRACT(YEAR FROM o.o_orderdate)
""",
    doc="TPC-H Q9 shape (no partsupp: cost = quantity × part retail "
        "price): profit per supplier nation per order year; exact decimal "
        "arithmetic end to end.",
    tags=("join", "aggregate"),
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "lineitem", "part", "supplier", "nation", "orders")
    p = t["part"].where(F.col("p_type") == "STANDARD")
    cost = F.col("l_quantity").cast("decimal(18,2)") * F.col("p_retailprice").cast(
        "decimal(18,2)"
    )
    return (
        t["lineitem"]
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("order_year"),
        )
        .agg(F.sum(_rev() - cost).cast("double").alias("profit"))
    )


@register(
    "q10_returned_items",
    oracle=f"""
SELECT c.c_custkey, c.c_name, n.n_name,
       CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c.c_custkey
LIMIT 20
""",
    doc="TPC-H Q10 shape: revenue lost to returned items per customer in "
        "a half-year window, top 20 (TakeOrderedAndProject).",
    tags=("join", "aggregate", "topk"),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "customer", "orders", "lineitem", "nation")
    o = t["orders"].where(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    )
    li = t["lineitem"].where(F.col("l_returnflag") == "R")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "q14_promo_share",
    oracle=f"""
SELECT CAST(100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
                             THEN {_REV_SQL} ELSE CAST(0 AS DECIMAL(18,2)) END)
            / SUM({_REV_SQL}) AS DOUBLE) AS promo_revenue_pct,
       COUNT(*) AS n_items
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
  AND l.l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
""",
    doc="TPC-H Q14 shape: promo revenue share for one month — conditional "
        "aggregation ratio, decimal-exact numerator/denominator.",
    tags=("join", "aggregate"),
)
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "lineitem", "part")
    li = t["lineitem"].where(
        (F.col("l_shipdate") >= F.lit("1997-03-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    promo = F.when(F.col("p_type") == "PROMO", _rev()).otherwise(
        F.lit(0).cast("decimal(18,2)")
    )
    return (
        li.join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (F.lit(100.0) * F.sum(promo) / F.sum(_rev()))
            .cast("double")
            .alias("promo_revenue_pct"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q16_part_supplier_counts",
    oracle="""
SELECT p.p_brand, p.p_size,
       COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#1'
  AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p.p_brand, p.p_size
""",
    doc="TPC-H Q16 shape (supplier exclusion by negative balance instead "
        "of the absent comment column): NOT IN → broadcast left-anti "
        "join, distinct-count per (brand, size).",
    tags=("join", "anti", "aggregate", "distinct"),
)
def q16_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "lineitem", "part", "supplier")
    p = t["part"].where(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
    )
    bad = t["supplier"].where(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        t["lineitem"]
        .join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
WITH part_avg AS (
  SELECT l_partkey, AVG(l_quantity) AS avg_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
         AS avg_yearly,
       COUNT(*) AS n_items
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
JOIN part_avg a ON a.l_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#3'
  AND l.l_quantity < 0.5 * a.avg_qty
""",
    doc="TPC-H Q17 shape: correlated per-part average-quantity subquery "
        "decorrelated into a grouped aggregate + self-join (exactly what "
        "Catalyst does to the correlated form).",
    tags=("join", "subquery", "aggregate"),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "lineitem", "part")
    li = t["lineitem"]
    part_avg = li.groupBy(F.col("l_partkey").alias("pa_partkey")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    p = t["part"].where(F.col("p_brand") == "Brand#3")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(part_avg, F.col("l_partkey") == F.col("pa_partkey"))
        .where(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            (F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double") / 7.0)
            .alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q18_large_orders",
    oracle="""
SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice,
       CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
FROM orders o
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE o.o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING SUM(l_quantity) > 150
)
GROUP BY c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
""",
    doc="TPC-H Q18 shape: large-volume orders via grouped HAVING subquery "
        "as a left-semi join into the fact.",
    tags=("join", "semi", "aggregate", "having"),
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "orders", "lineitem", "customer")
    li = t["lineitem"]
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .where(F.col("sq") > 150)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    return (
        t["orders"]
        .join(big, F.col("o_orderkey") == F.col("big_orderkey"), "left_semi")
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("total_qty"))
    )


@register(
    "q19_bracket_revenue",
    oracle=f"""
SELECT CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 20 AND 30)
""",
    doc="TPC-H Q19 shape: disjunctive multi-bracket predicate evaluated "
        "inside the join — Catalyst pushes the common join key and keeps "
        "the OR residual.",
    tags=("join", "filter"),
)
def q19_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "lineitem", "part")
    j = t["lineitem"].join(
        F.broadcast(t["part"]), F.col("p_partkey") == F.col("l_partkey")
    )
    bracket = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return j.where(bracket).agg(
        F.sum(_rev()).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@register(
    "q22_idle_customers",
    oracle="""
WITH threshold AS (
  SELECT AVG(c_acctbal) AS avg_bal FROM customer WHERE c_acctbal > 0
)
SELECT c.c_mktsegment,
       COUNT(*) AS n_customers,
       CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
FROM customer c, threshold t
WHERE c.c_acctbal > t.avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
GROUP BY c.c_mktsegment
""",
    doc="TPC-H Q22 shape: high-balance customers with no recent orders. "
        "Scalar aggregate subquery (global average balance) as a "
        "broadcast cross join — stays in-plan, no driver collect — plus "
        "NOT EXISTS as a left-anti join on the filtered fact.",
    tags=("join", "anti", "subquery", "aggregate"),
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "customer", "orders")
    cust = t["customer"]
    avg_bal = cust.where(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    recent = t["orders"].where(
        F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double").alias("total_bal"),
        )
    )


@register(
    "cube_segment_priority",
    oracle="""
SELECT c.c_mktsegment, o.o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY CUBE(c.c_mktsegment, o.o_orderpriority)
""",
    doc="GROUP BY CUBE over two dimensions (all four grouping sets) after "
        "a broadcast dim join.",
    tags=("aggregate", "cube"),
)
def cube_segment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "orders", "customer")
    return (
        t["orders"]
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .cube("c_mktsegment", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total_price"),
        )
    )


@register(
    "intersect_active_nations",
    oracle="""
SELECT n_name FROM nation JOIN customer ON c_nationkey = n_nationkey
WHERE c_acctbal > 7000
INTERSECT
SELECT n_name FROM nation JOIN supplier ON s_nationkey = n_nationkey
WHERE s_acctbal > 7000
""",
    doc="INTERSECT (distinct set intersection → left-semi over distinct): "
        "nations with both a high-balance customer and supplier.",
    tags=("setop",),
)
def intersect_active_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "nation", "customer", "supplier")
    cust_n = (
        t["nation"]
        .join(t["customer"], F.col("c_nationkey") == F.col("n_nationkey"))
        .where(F.col("c_acctbal") > 7000)
        .select("n_name")
    )
    supp_n = (
        t["nation"]
        .join(t["supplier"], F.col("s_nationkey") == F.col("n_nationkey"))
        .where(F.col("s_acctbal") > 7000)
        .select("n_name")
    )
    return cust_n.intersect(supp_n)
