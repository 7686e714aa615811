"""Skyline (Pareto frontier) operator — sort-based 2-D sweep.

The multi-criteria shortlist every catalog/procurement/model-selection
pipeline needs: the set of rows not DOMINATED by any other (here:
parts where no other part is both cheaper-or-equal AND
larger-or-equal with at least one strict). The naive formulation is
the quadratic NOT EXISTS self-join; the 2-D skyline collapses to a
SORT-BASED SWEEP: aggregate to one row per distinct price (max size
per price — anything below its price-group max is dominated within
the group unless tied), prefix-max the sizes in price order, and keep
a point iff its size strictly exceeds every cheaper price's best size
and is not strictly below its own price's best.

Spark-first scale shape: one aggregate to |distinct prices| rows, one
per-price-table window (tiny), one broadcast join back — O(n) data
work + O(p log p) on the price table, vs the O(n^2) pair join that
dies at 100 TB. The DuckDB oracle IS the quadratic NOT EXISTS
definition (feasible at gate scale), so the hash match proves the
sweep implements exactly the dominance semantics, ties included
(equal (price, size) pairs dominate nothing — both survive).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ytspark.plans.scale import finish
from ytspark.queries import register
from ytspark.session import load_tables

_SKYLINE_ORACLE = """
SELECT p_partkey, p_retailprice, CAST(p_size AS BIGINT) AS p_size
FROM part a
WHERE NOT EXISTS (
  SELECT 1 FROM part b
  WHERE b.p_retailprice <= a.p_retailprice
    AND b.p_size >= a.p_size
    AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size)
)
"""


@register(
    "skyline_pareto_parts",
    oracle=_SKYLINE_ORACLE,
    doc="Pareto frontier of the part catalog on (minimize "
        "retailprice, maximize size) via the SORT-BASED 2-D SWEEP: "
        "aggregate to max-size-per-distinct-price, prefix-max over "
        "the price order (lag-shifted so only STRICTLY cheaper "
        "prices count), join back, and keep rows neither beaten by a "
        "cheaper price's best size nor by a larger same-price size — "
        "O(n) data work plus a window over |distinct prices| rows, "
        "where the textbook formulation is the O(n^2) dominance "
        "self-join. The oracle IS that quadratic NOT EXISTS "
        "definition, so the hash match proves the sweep implements "
        "exact dominance semantics including ties (equal "
        "(price, size) pairs dominate nothing and both survive). "
        "Comparisons only, no float arithmetic — bit-exact on both "
        "engines.",
    tags=("pareto", "skyline", "window", "aggregate", "scale"),
)
def skyline_pareto_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_tables(spark, sf_dir, "part")["part"]
    pts = part.select("p_partkey", "p_retailprice", "p_size")
    per_price = pts.groupBy("p_retailprice").agg(
        F.max("p_size").alias("best_at")
    )
    w = Window.orderBy("p_retailprice")
    # best size among STRICTLY cheaper prices: prefix max shifted one
    # row (the price table is tiny — the one-partition window is on
    # |distinct prices| rows, never on the data)
    price_tbl = per_price.withColumn(
        "run_max",
        F.max("best_at").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    ).withColumn("best_below", F.lag("run_max").over(w))
    return (
        pts.join(F.broadcast(price_tbl), "p_retailprice")
        .where(
            (
                F.col("best_below").isNull()
                | (F.col("p_size") > F.col("best_below"))
            )
            & (F.col("p_size") == F.col("best_at"))
        )
        .select(
            "p_partkey",
            "p_retailprice",
            F.col("p_size").cast("long").alias("p_size"),
        )
    )


# ---------------------------------------------------------------------------
# ABC (Pareto 80/95) inventory classification per brand
# ---------------------------------------------------------------------------

_ABC_REV = "CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(4,2))"


@register(
    "abc_pareto_classes",
    oracle=f"""
WITH pr AS (
  SELECT p.p_brand, l.l_partkey, SUM({_ABC_REV}) AS rev
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY 1, 2
),
c AS (
  SELECT p_brand, l_partkey, rev,
         SUM(rev) OVER (PARTITION BY p_brand
                        ORDER BY rev DESC, l_partkey
                        ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(rev) OVER (PARTITION BY p_brand) AS total
  FROM pr
),
k AS (
  SELECT p_brand,
         CASE WHEN cum * 100 <= total * 80 THEN 'A'
              WHEN cum * 100 <= total * 95 THEN 'B'
              ELSE 'C' END AS abc_class,
         rev
  FROM c
)
SELECT p_brand, abc_class,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(SUM(rev) AS DOUBLE) AS class_revenue
FROM k GROUP BY 1, 2
""",
    doc="ABC / PARETO 80-95 CLASSIFICATION per brand: parts ranked by "
        "exact DECIMAL revenue within their brand, classified A while "
        "the running total stays within 80% of the brand total, B to "
        "95%, C beyond — the standard inventory-stratification cut "
        "('A-items get daily counts, C-items yearly'). All boundary "
        "comparisons are pure DECIMAL (cum*100 <= total*80), so both "
        "engines classify the boundary part identically — no float "
        "share ever computed. Scale: one key-shuffled aggregate to "
        "|brand x part| rows, then a window PARTITIONED BY brand "
        "(never global) over that already-reduced table; the part "
        "dim join is broadcast-eligible and the class rollup is a "
        "map-side-combinable aggregate.",
    tags=("relational", "window", "aggregate", "pareto"),
)
def abc_pareto_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "lineitem", "part")
    li, part = t["lineitem"], t["part"]
    rev = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1) - F.col("l_discount")).cast("decimal(4,2)")
    )
    pr = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "l_partkey")
        .agg(F.sum(rev).alias("rev"))
    )
    wcum = (
        Window.partitionBy("p_brand")
        .orderBy(F.col("rev").desc(), F.col("l_partkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy("p_brand")
    c = pr.select(
        "p_brand",
        "rev",
        F.sum("rev").over(wcum).alias("cum"),
        F.sum("rev").over(wtot).alias("total"),
    )
    k = c.select(
        "p_brand",
        F.when(F.col("cum") * 100 <= F.col("total") * 80, F.lit("A"))
        .when(F.col("cum") * 100 <= F.col("total") * 95, F.lit("B"))
        .otherwise(F.lit("C"))
        .alias("abc_class"),
        "rev",
    )
    return k.groupBy("p_brand", "abc_class").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.sum("rev").cast("double").alias("class_revenue"),
    )


# ---------------------------------------------------------------------------
# Multi-layer Pareto frontier (skyline peeling)
# ---------------------------------------------------------------------------

PFL_LAYERS = 2


def _pfl_layer_sql(src: str) -> str:
    # a part is dominated if another part is <= price AND >= size with
    # at least one strict inequality
    return f"""
  SELECT s.*
  FROM {src} s
  WHERE NOT EXISTS (
    SELECT 1 FROM {src} d
    WHERE d.price_c <= s.price_c AND d.size >= s.size
      AND (d.price_c < s.price_c OR d.size > s.size)
  )"""


@register(
    "pareto_frontier_layers",
    oracle=f"""
WITH pts AS (
  SELECT p_partkey AS k,
         CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           AS price_c,
         CAST(p_size AS BIGINT) AS size
  FROM part WHERE p_partkey % 10 = 0
),
l1 AS ({_pfl_layer_sql("pts")}),
rest AS (SELECT * FROM pts WHERE k NOT IN (SELECT k FROM l1)),
l2 AS ({_pfl_layer_sql("rest")}),
tagged AS (
  SELECT 1 AS layer, * FROM l1
  UNION ALL SELECT 2, * FROM l2
)
SELECT CAST(layer AS BIGINT) AS layer,
       CAST(COUNT(*) AS BIGINT) AS n_points,
       CAST(MIN(price_c) AS BIGINT) AS min_price_cents,
       CAST(MAX(size) AS BIGINT) AS max_size,
       CAST(SUM(k) AS BIGINT) AS key_checksum
FROM tagged GROUP BY layer
""",
    doc=f"MULTI-LAYER PARETO FRONTIER (skyline peeling, {PFL_LAYERS} "
        f"layers): layer 1 is the classic minimize-price / "
        f"maximize-size skyline, layer 2 is the skyline of what "
        f"remains — the 'next-best frontier' a buyer falls back to "
        f"when layer 1 is out of stock, and the onion-peeling "
        f"primitive behind depth-based multivariate ranking. "
        f"Dominance via anti-join per layer over the thinned part "
        f"sample (the skyline_pareto_parts sweep-line is the "
        f"single-layer scale path; peeling composes it). All-integer "
        f"cents/sizes with per-layer key checksums so the exact "
        f"layer MEMBERSHIP is hash-certified, not just counts.",
    tags=("pareto", "relational", "join", "aggregate"),
)
def pareto_frontier_layers(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_tables(spark, sf_dir, "part")["part"]
    pts = (
        part.where(F.col("p_partkey") % 10 == 0)
        .select(
            F.col("p_partkey").alias("k"),
            (F.col("p_retailprice").cast("decimal(18,2)") * 100)
            .cast("long")
            .alias("price_c"),
            F.col("p_size").cast("long").alias("size"),
        )
        .persist()
    )

    def skyline(df: DataFrame) -> DataFrame:
        d = df.select(
            F.col("k").alias("dk"),
            F.col("price_c").alias("dp"),
            F.col("size").alias("ds"),
        )
        dominated = (
            (F.col("dp") <= F.col("price_c"))
            & (F.col("ds") >= F.col("size"))
            & ((F.col("dp") < F.col("price_c")) | (F.col("ds") > F.col("size")))
        )
        return df.join(d, dominated, "left_anti")

    l1 = skyline(pts).persist()
    rest = pts.join(
        l1.select(F.col("k").alias("k1")), F.col("k") == F.col("k1"),
        "left_anti",
    )
    l2 = skyline(rest)
    tagged = l1.select(F.lit(1).alias("layer"), "k", "price_c", "size").unionByName(
        l2.select(F.lit(2).alias("layer"), "k", "price_c", "size")
    )
    out = tagged.groupBy("layer").agg(
        F.count(F.lit(1)).cast("long").alias("n_points"),
        F.min("price_c").cast("long").alias("min_price_cents"),
        F.max("size").cast("long").alias("max_size"),
        F.sum("k").cast("long").alias("key_checksum"),
    ).select(F.col("layer").cast("long").alias("layer"), "n_points",
             "min_price_cents", "max_size", "key_checksum")
    return finish(out, pts, l1)
