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
