"""Data-layout optimization operators: Z-order (Morton) multi-
dimensional clustering with per-file skipping statistics.

At 100 TB, scan cost is dominated by how much data the reader can SKIP
using per-file column min/max footers. Sorting by one column gives
perfect skipping on that column and none on any other; interleaving
the bits of two key columns (a Z-order / Morton curve) bounds BOTH
columns' value ranges within every contiguous run of the sort order,
so range-partitioned files prune on either predicate. This is what
Delta OPTIMIZE ZORDER BY and Iceberg's sort-order rewrite do; with no
table format in the sandbox (SCALE.md environment blocker) the engine
exposes the curve itself as a pure, exactly-checkable projection —
``repartitionByRange(z).sortWithinPartitions(z)`` + parquet write IS
the clustered rewrite.

The z-value is integer bit-math only (shift/and/or), so Spark and
DuckDB agree bit-for-bit and the driver hash-certifies the curve. The
registered query buckets the curve (a bucket models one output file)
and reports each bucket's row count and per-dimension min/max span —
the exact statistics a reader's skipping decision would use. The test
suite additionally pins the layout property: z-bucketed files bound
both dimensions, single-column sorting does not.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ytspark.queries import register
from ytspark.session import load_tables

ZBITS = 8  # bits per dimension -> 16-bit z-value
ZBUCKET_SHIFT = 6  # z >> 6 -> 1024 buckets (models ~1024 output files)


def zorder_col(x: Column, y: Column, bits: int = ZBITS) -> Column:
    """Morton-interleave the low ``bits`` of two non-negative ints:
    bit i of x lands at position 2i, bit i of y at 2i+1."""
    parts = [
        F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        + F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        for i in range(bits)
    ]
    return reduce(lambda a, b: a + b, parts)


def zorder_sql(x: str, y: str, bits: int = ZBITS) -> str:
    """DuckDB twin of ``zorder_col`` (same bit positions, `>>`/`&`/
    `<<` operators)."""
    parts = [
        f"(((({x}) >> {i}) & 1) << {2 * i})"
        f" + (((({y}) >> {i}) & 1) << {2 * i + 1})"
        for i in range(bits)
    ]
    return " + ".join(parts)


_ZORDER_ORACLE = f"""
WITH pts AS (
  SELECT o_custkey % {1 << ZBITS} AS x,
         DATEDIFF('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))
           % {1 << ZBITS} AS y
  FROM orders
),
z AS (
  SELECT x, y, ({zorder_sql("x", "y")}) >> {ZBUCKET_SHIFT} AS z_bucket
  FROM pts
)
SELECT z_bucket,
       COUNT(*) AS n_rows,
       MIN(x) AS x_min, MAX(x) AS x_max,
       MIN(y) AS y_min, MAX(y) AS y_max
FROM z
GROUP BY z_bucket
"""


@register(
    "zorder_layout_stats",
    oracle=_ZORDER_ORACLE,
    doc="Z-order clustering of orders on (custkey, order-day): Morton-"
        "interleave the low 8 bits of both dimensions, bucket the "
        "curve (each bucket models one output file of a "
        "repartitionByRange(z) rewrite), and report per-bucket row "
        "counts and min/max spans of BOTH dimensions — the footer "
        "statistics that let a reader skip files for predicates on "
        "either column. Pure integer bit-math, map-only + one "
        "aggregate; bit-for-bit identical cross-engine.",
    tags=("layout", "zorder", "aggregate", "scale"),
)
def zorder_layout_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir, "orders")["orders"]
    side = F.lit(1 << ZBITS)
    pts = orders.select(
        F.pmod(F.col("o_custkey"), side).alias("x"),
        F.pmod(
            F.datediff(F.col("o_orderdate"), F.lit("1992-01-01")), side
        ).alias("y"),
    )
    z = pts.withColumn(
        "z_bucket",
        F.shiftright(zorder_col(F.col("x"), F.col("y")), ZBUCKET_SHIFT),
    )
    return z.groupBy("z_bucket").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("x").alias("x_min"),
        F.max("x").alias("x_max"),
        # datediff yields int32; widen to long so the dtype matches the
        # oracle's BIGINT exactly (clears the gate's width warning)
        F.min("y").cast("long").alias("y_min"),
        F.max("y").cast("long").alias("y_max"),
    )
