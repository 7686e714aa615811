"""Decision-support battery: the TPC-H query shapes the reference's
warehouse (Snowflake) would serve over this star schema, adapted to the
driver testdata columns (no partsupp/shipmode/comment columns — each
query notes its adaptation). SURVEY §2.10: joins/aggregations are
absent in reference code and delegated to the warehouse; this module is
that capability, Spark-first.

Plan-shape notes (verified via .explain("formatted")):
- dimension joins broadcast, but with two distinct mechanisms: an
  explicit F.broadcast() hint is FORCED (neither the threshold nor AQE
  demotes it — verified), so it is reserved for catalog-known-tiny dims
  (region/nation, one-row scalar subqueries); growable dims
  (customer/supplier/part and their filtered slices) go through
  ytspark.plans.scale.maybe_broadcast, which applies the hint only
  while the estimated size is under the session broadcast threshold —
  at 100 TB those joins degrade safely to shuffle joins (or AQE's
  runtime broadcast when the true size is small) with no code change;
- fact-fact joins (lineitem ⨝ orders) shuffle on the order key with
  both sides' filters pushed into the parquet scan;
- every aggregate gets map-side partials; decimal money math keeps
  cross-engine hash equality (see ytspark/queries/relational.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ytspark.queries import register
from ytspark.plans.scale import maybe_broadcast
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
        .join(maybe_broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(maybe_broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
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
        .join(maybe_broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(maybe_broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .where(F.col("sn_key") != F.col("cn_key"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            # long: DuckDB EXTRACT(YEAR ...) is BIGINT (width parity)
            F.year("l_shipdate").cast("long").alias("ship_year"),
        )
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
        .join(maybe_broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(maybe_broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            # long: DuckDB EXTRACT(YEAR ...) is BIGINT (width parity)
            F.year("o_orderdate").cast("long").alias("order_year"),
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
        .join(maybe_broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
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
        li.join(maybe_broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
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
        .join(maybe_broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(maybe_broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
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
        li.join(maybe_broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
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
        .join(maybe_broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
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
        maybe_broadcast(t["part"]), F.col("p_partkey") == F.col("l_partkey")
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
    "q8_market_share",
    oracle=f"""
WITH trade AS (
  SELECT EXTRACT(YEAR FROM o.o_orderdate) AS order_year,
         {_REV_SQL} AS rev,
         sn.n_name AS supp_nation
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation cn ON c.c_nationkey = cn.n_nationkey
  JOIN region r ON cn.n_regionkey = r.r_regionkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation sn ON s.s_nationkey = sn.n_nationkey
  JOIN part p ON l.l_partkey = p.p_partkey
  WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
)
SELECT order_year,
       CAST(SUM(CASE WHEN supp_nation = 'NATION_7' THEN rev
                     ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
            / CAST(SUM(rev) AS DOUBLE) AS mkt_share
FROM trade
GROUP BY order_year
""",
    doc="TPC-H Q8 shape: NATION_7's share of ECONOMY-part revenue sold "
        "into the ASIA customer market, per order year. Seven-table "
        "star join — every dimension broadcast, single shuffle on the "
        "orderkey for the fact-fact join, conditional-sum ratio in "
        "exact decimals cast to double at the end.",
    tags=("join", "aggregate"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(
        spark, sf_dir,
        "lineitem", "orders", "customer", "supplier", "nation", "region", "part",
    )
    asia = (
        t["nation"]
        .join(
            F.broadcast(t["region"].where(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select(F.col("n_nationkey").alias("cn_key"))
    )
    sn = t["nation"].select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    p = t["part"].where(F.col("p_type") == "ECONOMY").select("p_partkey")
    nation7_rev = F.when(F.col("supp_nation") == "NATION_7", _rev()).otherwise(
        F.lit(0).cast("decimal(18,2)")
    )
    return (
        t["lineitem"]
        .join(maybe_broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(maybe_broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(asia), F.col("c_nationkey") == F.col("cn_key"))
        .join(maybe_broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").cast("long").alias("order_year"))
        .agg(
            (F.sum(nation7_rev).cast("double") / F.sum(_rev()).cast("double")).alias(
                "mkt_share"
            )
        )
    )


@register(
    "q11_important_parts",
    oracle="""
WITH part_value AS (
  SELECT l.l_partkey,
         SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
             * CAST(l.l_quantity AS DECIMAL(18,2))) AS val
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  WHERE n.n_regionkey = 2
  GROUP BY l.l_partkey
)
SELECT l_partkey AS p_partkey, CAST(val AS DOUBLE) AS stock_value
FROM part_value, (SELECT SUM(val) AS total FROM part_value) t
WHERE val > 0.001 * total
""",
    doc="TPC-H Q11 shape (no partsupp table: inventory value proxied by "
        "extendedprice x quantity of observed shipments from region-2 "
        "suppliers): parts holding > 0.1% of the region's total value. "
        "The scalar global-total subquery stays in-plan as a broadcast "
        "cross join over the reused grouped aggregate — no driver "
        "collect, and the grouped agg is computed once and reused on "
        "both sides.",
    tags=("join", "aggregate", "subquery", "having"),
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "lineitem", "supplier", "nation")
    region2_supp = (
        t["supplier"]
        .join(
            F.broadcast(t["nation"].where(F.col("n_regionkey") == 2)),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    val = F.col("l_extendedprice").cast("decimal(18,2)") * F.col("l_quantity").cast(
        "decimal(18,2)"
    )
    part_value = (
        t["lineitem"]
        .join(maybe_broadcast(region2_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(val).alias("val"))
    )
    total = part_value.agg(F.sum("val").alias("total"))
    return (
        part_value.crossJoin(F.broadcast(total))
        .where(F.col("val") > F.lit(0.001) * F.col("total"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("val").cast("double").alias("stock_value"),
        )
    )


@register(
    "q12_late_lines_by_class",
    oracle="""
SELECT l.l_linestatus AS ship_class,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= o.o_orderdate + INTERVAL 30 DAY
  AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l.l_linestatus
""",
    doc="TPC-H Q12 shape (no shipmode/commitdate columns: linestatus "
        "stands in for shipmode; 'late' = shipped 30+ days after the "
        "order date): priority mix of late lines per class. The "
        "shipdate range predicate pushes into the parquet scan; the "
        "date-vs-date comparison is a post-join residual.",
    tags=("join", "aggregate", "filter"),
)
def q12_late_lines_by_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "orders", "lineitem")
    li = t["lineitem"].where(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        t["orders"]
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
        .groupBy(F.col("l_linestatus").alias("ship_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q13_customer_order_distribution",
    oracle="""
WITH c_orders AS (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o ON c.c_custkey = o.o_custkey
       AND o.o_orderpriority <> '4-NOT SPECIFIED'
  GROUP BY c.c_custkey
)
SELECT c_count, COUNT(*) AS custdist
FROM c_orders
GROUP BY c_count
""",
    doc="TPC-H Q13 shape (priority filter stands in for the absent "
        "comment-pattern exclusion): distribution of customers by order "
        "count, including zero-order customers via the outer join. Two "
        "cascaded aggregations; the second groups on the first's output "
        "so AQE coalesces its tiny shuffle.",
    tags=("join", "outer", "aggregate"),
)
def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "customer", "orders")
    c_orders = (
        t["customer"]
        .join(
            t["orders"].where(F.col("o_orderpriority") != "4-NOT SPECIFIED"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return c_orders.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q15_top_supplier",
    oracle=f"""
WITH revenue AS (
  SELECT l_suppkey, CAST(SUM({_REV_SQL}) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s
JOIN revenue r ON s.s_suppkey = r.l_suppkey
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
""",
    doc="TPC-H Q15 shape: the supplier(s) with maximum quarterly revenue. "
        "The revenue 'view' is computed once; the scalar MAX subquery is "
        "a broadcast cross join against it (in-plan, no collect). Sums "
        "are exact decimals cast to double only at the end, so the "
        "max-equality comparison is engine-stable.",
    tags=("join", "aggregate", "subquery", "window"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "lineitem", "supplier")
    revenue = (
        t["lineitem"]
        .where(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(_rev()).cast("double").alias("total_revenue"))
    )
    top = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        revenue.crossJoin(F.broadcast(top))
        .where(F.col("total_revenue") == F.col("max_revenue"))
        .join(maybe_broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q20_potential_promotion",
    oracle="""
SELECT s.s_suppkey, s.s_name, n.n_name
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE n.n_regionkey = 1
  AND s.s_suppkey IN (
    SELECT q.l_suppkey
    FROM (SELECT l_suppkey, l_partkey, SUM(l_quantity) AS qty
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
          GROUP BY l_suppkey, l_partkey) q
    JOIN part p ON q.l_partkey = p.p_partkey
    WHERE p.p_name LIKE 'blue%' AND q.qty > 50
  )
""",
    doc="TPC-H Q20 shape (no partsupp/availqty: the excess-stock "
        "predicate becomes 'shipped > 50 units of one blue part in "
        "1996'): region-1 suppliers who moved heavy volume of "
        "blue-named parts — grouped fact aggregate, broadcast part "
        "filter, IN -> left-semi join into the supplier dim.",
    tags=("join", "semi", "aggregate"),
)
def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "supplier", "nation", "lineitem", "part")
    qty = (
        t["lineitem"]
        .where(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        )
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    blue = t["part"].where(F.col("p_name").like("blue%")).select("p_partkey")
    heavy = (
        qty.join(maybe_broadcast(blue), F.col("l_partkey") == F.col("p_partkey"))
        .where(F.col("qty") > 50)
        .select("l_suppkey")
    )
    return (
        t["supplier"]
        .join(
            F.broadcast(t["nation"].where(F.col("n_regionkey") == 1)),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(heavy, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name", "n_name")
    )


@register(
    "q21_waiting_suppliers",
    oracle="""
SELECT s.s_name, COUNT(*) AS numwait
FROM supplier s
JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
WHERE o.o_orderstatus = 'F'
  AND l1.l_shipdate > o.o_orderdate + INTERVAL 45 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o.o_orderdate + INTERVAL 45 DAY)
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
LIMIT 20
""",
    doc="TPC-H Q21 shape (no commit/receipt dates: 'kept waiting' = "
        "shipped 45+ days after the order date on a finished order): "
        "suppliers who were the sole late supplier on a multi-supplier "
        "order. The correlated EXISTS/NOT EXISTS pair is decorrelated "
        "into one per-order aggregate (distinct suppliers, distinct "
        "late suppliers) joined back to the late lines — one pass over "
        "the fact instead of two correlated probes, the same rewrite "
        "Catalyst cannot do automatically across the DataFrame API.",
    tags=("join", "semi", "anti", "aggregate", "topk"),
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "supplier", "lineitem", "orders")
    o_f = t["orders"].where(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    li = (
        t["lineitem"]
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(o_f, F.col("l_orderkey") == F.col("o_orderkey"))
        .withColumn(
            "is_late",
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 45 DAYS"),
        )
    )
    per_order = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.countDistinct(F.when(F.col("is_late"), F.col("l_suppkey"))).alias(
            "n_late_supps"
        ),
    )
    late_lines = li.where(F.col("is_late")).select(
        F.col("l_orderkey").alias("ll_orderkey"), "l_suppkey"
    )
    return (
        late_lines.join(
            per_order.where((F.col("n_supps") > 1) & (F.col("n_late_supps") == 1)),
            F.col("ll_orderkey") == F.col("l_orderkey"),
        )
        .join(maybe_broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(20)
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
        .join(maybe_broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
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
