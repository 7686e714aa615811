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

from ytspark.operators.text import knuth_hash_sql
from ytspark.plans.scale import finish
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


# ---------------------------------------------------------------------------
# Hilbert curve: the locality-optimal alternative to Z-order
# ---------------------------------------------------------------------------

# 4-state Hilbert state machine (derived from the classic xy2d
# rotate-and-swap algorithm and verified bit-for-bit against it over
# the full grid in tests/test_round4_operators.py). States: 0=identity,
# 1=swap, 2=antiswap (complement+swap), 3=rot180. Index = st*4+bx*2+by.
HILBERT_DIGIT = (0, 1, 3, 2, 0, 3, 1, 2, 2, 1, 3, 0, 2, 3, 1, 0)
HILBERT_NEXT = (1, 0, 2, 0, 0, 3, 1, 1, 2, 2, 0, 3, 3, 1, 3, 2)
HBITS = ZBITS  # same 8-bit grid as the Z-order query
N_FILES = 256  # equal-row file cuts (models repartitionByRange output)


def hilbert_col(x: Column, y: Column, bits: int = HBITS) -> Column:
    """Hilbert index of (x, y) via the 4-state machine folded over the
    bit positions MSB->LSB — a struct-state ``aggregate`` HOF, so the
    expression stays LINEAR in ``bits`` (the classic rotate-and-swap
    loop inlined as expressions grows ~5^bits under projection
    collapse and is unplannable past ~6 bits)."""
    dig = F.array(*[F.lit(v) for v in HILBERT_DIGIT])
    nxt = F.array(*[F.lit(v) for v in HILBERT_NEXT])
    init = F.struct(F.lit(0).alias("st"), F.lit(0).alias("d"))
    # bit pairs MSB->LSB, built with a Python loop (shift amounts are
    # plan-time constants); the fold then consumes one struct per step
    pairs = F.array(
        *[
            F.struct(
                F.shiftright(x, i).bitwiseAND(F.lit(1)).alias("bx"),
                F.shiftright(y, i).bitwiseAND(F.lit(1)).alias("by"),
            )
            for i in range(bits - 1, -1, -1)
        ]
    )

    def step(acc, p):
        k = acc["st"] * F.lit(4) + p["bx"] * F.lit(2) + p["by"]  # 0-based
        return F.struct(
            F.get(nxt, k).alias("st"),
            (acc["d"] * F.lit(4) + F.get(dig, k)).alias("d"),
        )

    return F.aggregate(pairs, init, step)["d"]


def _hilbert_step_sql(k: int, i: int) -> str:
    dig = list(HILBERT_DIGIT)
    nxt = list(HILBERT_NEXT)
    idx = f"(h{k}.st * 4 + ((h{k}.x >> {i}) & 1) * 2 + ((h{k}.y >> {i}) & 1) + 1)"
    return f"""
h{k + 1} AS MATERIALIZED (
  SELECT x, y,
         ({nxt}[{idx}]) AS st,
         (h{k}.d * 4 + ({dig}[{idx}])) AS d
  FROM h{k}
)"""


def _hilbert_oracle() -> str:
    steps = ",".join(
        _hilbert_step_sql(k, HBITS - 1 - k) for k in range(HBITS)
    )
    return f"""
WITH pts AS MATERIALIZED (
  SELECT o_custkey % {1 << HBITS} AS x,
         DATEDIFF('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))
           % {1 << HBITS} AS y
  FROM orders
),
h0 AS MATERIALIZED (SELECT x, y, 0 AS st, 0 AS d FROM pts),
{steps}
SELECT f AS file_id,
       COUNT(*) AS n_rows,
       MIN(x) AS x_min, MAX(x) AS x_max,
       CAST(MIN(y) AS BIGINT) AS y_min, CAST(MAX(y) AS BIGINT) AS y_max
FROM (
  SELECT x, y, NTILE({N_FILES}) OVER (ORDER BY d, x, y) AS f
  FROM h{HBITS}
)
GROUP BY f
"""


@register(
    "hilbert_layout_stats",
    oracle=_hilbert_oracle(),
    doc="Hilbert-curve clustering of orders on (custkey, order-day) — "
        "the locality-OPTIMAL alternative to Z-order (every unit step "
        "of the Hilbert curve is distance 1, so contiguous runs bound "
        "both dimensions tighter than Morton's diagonal jumps; the "
        "test suite asserts the per-bucket span area is strictly "
        "smaller than zorder_layout_stats' on the same points). The "
        "index is computed by a 4-STATE MACHINE folded over bit "
        "positions with a struct-state aggregate HOF — linear "
        "expression size, where inlining the classic rotate-and-swap "
        "loop grows ~5^bits and is unplannable — and the oracle "
        "replays the identical machine as chained CTEs with the same "
        "literal transition tables. Files are modeled as EQUAL-ROW "
        "curve cuts (exact NTILE — what repartitionByRange(d) "
        "produces), where the locality difference is real: measured "
        "mean bucket area 366 vs Z-order's 704 at sf0.01 (aligned "
        "power-of-4 buckets would be identical quadrants for both "
        "curves). Pure integer math, bit-for-bit cross-engine.",
    tags=("layout", "hilbert", "aggregate", "scale", "hof"),
)
def hilbert_layout_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir, "orders")["orders"]
    side = F.lit(1 << HBITS)
    pts = orders.select(
        F.pmod(F.col("o_custkey"), side).alias("x"),
        F.pmod(
            F.datediff(F.col("o_orderdate"), F.lit("1992-01-01")), side
        ).alias("y"),
    )
    from pyspark.sql.window import Window

    # r12 (guide §2.6): the orders scan is one split, so the state-
    # machine fold (the expensive per-row expression) ran as one task
    # (1.4 s at sf0.1); spread the (x, y) points across the pool BEFORE
    # computing d — downstream re-shuffles by bucket anyway, so the
    # layout of the fold's input is free.
    par = orders.sparkSession.sparkContext.defaultParallelism
    h = pts.repartition(par).withColumn(
        "d", hilbert_col(F.col("x"), F.col("y"))
    )
    # equal-row file cuts via the exact NTILE arithmetic computed with
    # the bucketed-offsets distributed rank (the quartiles recipe) —
    # NO data-sized single-partition window: curve distances bucket by
    # their top bits (256 order-aligned buckets; ties of d share a
    # bucket so the (x, y) tiebreak stays local), per-bucket counts
    # become cumulative offsets over the tiny bucket table, global
    # rank = offset + within-bucket row_number, and the file id comes
    # from the exact NTILE rule (first N%k tiles get one extra row)
    # against the broadcast total. This IS the certification twin of
    # the production repartitionByRange(d).sortWithinPartitions(d)
    # rewrite — per-file value multisets, hence min/max spans, are
    # deterministic because tied (d, x, y) rows are interchangeable.
    # eager localCheckpoint: the 4-state-machine curve fold is the
    # expensive expression and THREE consumers (bucket counts, total,
    # rank pass) would otherwise each recompute it over the full scan;
    # the checkpoint materializes it once AND truncates its lineage so
    # every consumer plans against a leaf (faster than persist for
    # multi-branch plans — same measurement as the PPR inputs). Blocks
    # are swept by release_all_cached between queries.
    hb = h.withColumn(
        "bucket", (F.col("d") / F.lit(1 << HBITS)).cast("long")
    ).localCheckpoint(eager=True)
    counts = hb.groupBy("bucket").agg(F.count(F.lit(1)).alias("c"))
    ow = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "bucket", F.coalesce(F.sum("c").over(ow), F.lit(0)).alias("off")
    )
    total = hb.agg(F.count(F.lit(1)).alias("n_total"))
    rw = Window.partitionBy("bucket").orderBy("d", "x", "y")
    ranked = (
        hb.join(F.broadcast(offsets), "bucket")
        .crossJoin(F.broadcast(total))
        .select(
            "x", "y", "n_total",
            (F.col("off") + F.row_number().over(rw)).alias("r"),
        )
    )
    base = F.floor(F.col("n_total") / N_FILES)
    rem = F.col("n_total") % N_FILES
    cut = rem * (base + 1)
    f = (
        F.when(F.col("r") <= cut, F.ceil(F.col("r") / (base + 1)))
        .otherwise(rem + F.ceil((F.col("r") - cut) / base))
        .cast("long")
    )
    # curve-fold input is checkpointed (no persisted cache to release)
    return (
        ranked.select("x", "y", f.alias("file_id"))
        .groupBy("file_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("x").alias("x_min"),
            F.max("x").alias("x_max"),
            F.min("y").cast("long").alias("y_min"),
            F.max("y").cast("long").alias("y_max"),
        )
    )


# ---------------------------------------------------------------------------
# Data-skipping effectiveness: per-file min/max pruning, clustered vs random
# ---------------------------------------------------------------------------

# Week-bucket origin for the time-clustered layout.  Chosen BEFORE the
# earliest TPC-H shipdate (1992-01-02) so datediff is always >= 0 and
# Spark's `div` (truncate toward zero) agrees with DuckDB's `//`
# (floor) — they differ on negatives.
SKIP_EPOCH = "1992-01-01"
SKIP_N_HASH_FILES = 128
# one-month probe predicates, half-open [lo, hi)
SKIP_PREDICATES = (
    ("1996-03", "1996-03-01", "1996-04-01"),
    ("1997-06", "1997-06-01", "1997-07-01"),
    ("1998-09", "1998-09-01", "1998-10-01"),
    ("2000-01", "2000-01-01", "2000-02-01"),
)


def _skip_oracle() -> str:
    layouts = (
        ("time_clustered",
         f"DATEDIFF('day', DATE '{SKIP_EPOCH}', day) // 7"),
        ("hash_random", f"l_orderkey % {SKIP_N_HASH_FILES}"),
    )
    parts = []
    for lname, fk in layouts:
        match_cols = ", ".join(
            f"SUM(CASE WHEN day >= DATE '{lo}' AND day < DATE '{hi}' "
            f"THEN 1 ELSE 0 END) AS m_{i}"
            for i, (_, lo, hi) in enumerate(SKIP_PREDICATES)
        )
        stats = f"""
  SELECT {fk} AS fk, MIN(day) AS mn, MAX(day) AS mx,
         COUNT(*) AS c, {match_cols}
  FROM (SELECT CAST(l_shipdate AS DATE) AS day, l_orderkey FROM lineitem)
  GROUP BY 1
"""
        for i, (pname, lo, hi) in enumerate(SKIP_PREDICATES):
            scan = f"(mn < DATE '{hi}' AND mx >= DATE '{lo}')"
            parts.append(f"""
SELECT '{lname}' AS layout, '{pname}' AS predicate,
       CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(SUM(CASE WHEN {scan} THEN 1 ELSE 0 END) AS BIGINT)
         AS files_scanned,
       CAST(SUM(CASE WHEN {scan} THEN c ELSE 0 END) AS BIGINT)
         AS rows_scanned,
       CAST(SUM(m_{i}) AS BIGINT) AS rows_matched
FROM ({stats})
""")
    return " UNION ALL ".join(parts)


@register(
    "file_skipping_stats",
    oracle=_skip_oracle(),
    doc="DATA-SKIPPING EFFECTIVENESS: simulate the lakehouse min/max "
        "zone-map pruning that Delta/Iceberg/parquet row groups give "
        "you, under two physical layouts of lineitem — time-clustered "
        "(file = ship week, what a sorted/partitioned table produces) "
        "vs hash-random (file = orderkey % "
        f"{SKIP_N_HASH_FILES}, what unclustered ingest produces) — "
        "probed by four one-month predicates. A file must be scanned "
        "iff its [min,max] ship-date span overlaps the predicate; the "
        "output (files scanned, rows scanned, rows actually matching) "
        "quantifies why clustering matters: the clustered layout "
        "scans ~predicate-width/total-span of the data, the random "
        "layout scans everything for the same answer. This is the "
        "measurement behind every OPTIMIZE/ZORDER decision; the "
        "z-order and Hilbert queries compute the layouts, this one "
        "prices them. Scale: ONE aggregate per layout to |files| "
        "rows carrying per-predicate match counters (the sweep "
        "pattern — parameters as conditional sums, not passes), then "
        "constant-size selects over the tiny stats tables.",
    tags=("layout", "scale", "aggregate", "profiling"),
)
def file_skipping_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    base = li.select(
        F.to_date("l_shipdate").alias("day"),
        F.col("l_orderkey"),
    )
    layouts = (
        (
            "time_clustered",
            F.expr(f"datediff(day, DATE '{SKIP_EPOCH}') div 7"),
        ),
        ("hash_random", F.col("l_orderkey") % SKIP_N_HASH_FILES),
    )
    out = None
    for lname, fk in layouts:
        stats = base.groupBy(fk.alias("fk")).agg(
            F.min("day").alias("mn"),
            F.max("day").alias("mx"),
            F.count(F.lit(1)).alias("c"),
            *[
                F.sum(
                    (
                        (F.col("day") >= F.lit(lo).cast("date"))
                        & (F.col("day") < F.lit(hi).cast("date"))
                    ).cast("long")
                ).alias(f"m_{i}")
                for i, (_, lo, hi) in enumerate(SKIP_PREDICATES)
            ],
        ).localCheckpoint(eager=True)  # read once per predicate below
        for i, (pname, lo, hi) in enumerate(SKIP_PREDICATES):
            scan = (F.col("mn") < F.lit(hi).cast("date")) & (
                F.col("mx") >= F.lit(lo).cast("date")
            )
            row = stats.agg(
                F.count(F.lit(1)).alias("n_files"),
                F.sum(scan.cast("long")).alias("files_scanned"),
                F.sum(F.when(scan, F.col("c")).otherwise(F.lit(0)))
                .cast("long")
                .alias("rows_scanned"),
                F.sum(f"m_{i}").cast("long").alias("rows_matched"),
            ).select(
                F.lit(lname).alias("layout"),
                F.lit(pname).alias("predicate"),
                "n_files",
                "files_scanned",
                "rows_scanned",
                "rows_matched",
            )
            out = row if out is None else out.unionByName(row)
    return out


# ---------------------------------------------------------------------------
# Rendezvous (HRW) consistent-hashing rebalance audit
# ---------------------------------------------------------------------------

HRW_NODES = 12  # shard count before the scale-out
HRW_MIX = 1_000_003  # key-side mixing prime for the (key, node) weight


def _hrw_oracle() -> str:
    from ytspark.operators.text import knuth_hash_sql

    n1 = HRW_NODES + 1
    w = knuth_hash_sql(f"c_custkey * {HRW_MIX} + node")
    return f"""
WITH grid AS (
  SELECT c_custkey, node, ({w}) * 16 + node AS wk
  FROM customer CROSS JOIN (
    SELECT UNNEST(RANGE({n1})) AS node
  )
),
assign AS (
  SELECT c_custkey,
         MAX(wk) FILTER (WHERE node < {HRW_NODES}) % 16 AS node_before,
         MAX(wk) % 16 AS node_after
  FROM grid GROUP BY c_custkey
)
SELECT node,
       CAST(COUNT(*) FILTER (WHERE node_before = node) AS BIGINT)
         AS load_before,
       CAST(COUNT(*) FILTER (WHERE node_after = node) AS BIGINT)
         AS load_after,
       CAST(COUNT(*) FILTER (WHERE node_before = node
                             AND node_after <> node) AS BIGINT)
         AS moved_out
FROM assign CROSS JOIN (SELECT UNNEST(RANGE({n1})) AS node)
GROUP BY node
"""


@register(
    "rendezvous_rebalance_audit",
    oracle=_hrw_oracle(),
    doc="RENDEZVOUS (highest-random-weight) CONSISTENT-HASHING "
        "rebalance audit — the shard-planning operator behind "
        "minimal-movement scale-out: every key's shard is the argmax "
        f"over nodes of a portable per-(key, node) hash; adding node "
        f"{HRW_NODES} to a {HRW_NODES}-node ring can, by the HRW "
        "property, only move keys TO the new node, so the audit "
        "reports per node the load before, the load after, and the "
        "keys that moved out — certifying both the ~1/(N+1) expected "
        "movement and that no key moved between surviving nodes "
        "(moved_out = 0 everywhere except the donors' share to the "
        "newcomer; modulo-hashing would reshuffle ~all keys). "
        "Spark-first shape: the keys x (N+1) weight grid is ONE "
        "projection (the broadcast node spine multiplies the scan by "
        "N+1 — HRW's inherent per-key O(N) cost, disclosed; jump "
        "hash is the O(log N) variant when N is large), both "
        "before/after argmaxes fold in ONE map-side-combinable "
        "integer MAX per key (weight*16+node encodes argmax with a "
        "node-id tiebreak in a single BIGINT), and the per-node report is a "
        "second tiny aggregate. The weight hash is the repo's "
        "overflow-free Knuth mix, bit-identical in DuckDB, and "
        "argmax ties break on node id — fully deterministic. "
        "All-integer output.",
    tags=("layout", "scale", "aggregate", "join"),
)
def rendezvous_rebalance_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ytspark.operators.text import knuth_hash_col

    n1 = HRW_NODES + 1
    cust = load_tables(spark, sf_dir, "customer")["customer"]
    nodes = F.broadcast(
        spark.range(n1).select(F.col("id").cast("long").alias("node"))
    )
    grid = cust.select("c_custkey").crossJoin(nodes).select(
        "c_custkey",
        "node",
        # weight*16 + node: one BIGINT whose max IS the argmax with a
        # node-id tiebreak (weight < 2^32, node < 16 -> fits easily)
        (
            knuth_hash_col(
                F.col("c_custkey") * F.lit(HRW_MIX) + F.col("node")
            )
            * F.lit(16)
            + F.col("node")
        ).alias("wk"),
    )
    assign = grid.groupBy("c_custkey").agg(
        (
            F.max(F.when(F.col("node") < HRW_NODES, F.col("wk"))) % 16
        ).alias("node_before"),
        (F.max("wk") % 16).alias("node_after"),
    )
    report = assign.crossJoin(nodes).groupBy("node").agg(
        F.sum((F.col("node_before") == F.col("node")).cast("long"))
        .alias("load_before"),
        F.sum((F.col("node_after") == F.col("node")).cast("long"))
        .alias("load_after"),
        F.sum(
            (
                (F.col("node_before") == F.col("node"))
                & (F.col("node_after") != F.col("node"))
            ).cast("long")
        ).alias("moved_out"),
    )
    return report


# ---------------------------------------------------------------------------
# Partition-skew simulator (hash vs salted load under P reducers)
# ---------------------------------------------------------------------------

PSK_PARTS = 32  # simulated reducer count
PSK_SALTS = 8  # salt fan-out for the salted strategy


@register(
    "partition_skew_simulator",
    oracle=f"""
WITH keyed AS (
  SELECT l_suppkey AS k,
         {knuth_hash_sql('l_suppkey')} % {PSK_PARTS} AS part_raw,
         {knuth_hash_sql(f'l_suppkey * {PSK_SALTS} + ((l_orderkey % {PSK_SALTS}) + {PSK_SALTS}) % {PSK_SALTS}')} % {PSK_PARTS} AS part_salted
  FROM lineitem
),
raw AS (
  SELECT part_raw AS part, COUNT(*) AS n FROM keyed GROUP BY 1
),
salted AS (
  SELECT part_salted AS part, COUNT(*) AS n FROM keyed GROUP BY 1
),
stats AS (
  SELECT 'hash' AS strategy, MAX(n) AS max_rows,
         CAST(SUM(n) AS DOUBLE) / {PSK_PARTS} AS mean_rows
  FROM raw
  UNION ALL
  SELECT 'salted', MAX(n), CAST(SUM(n) AS DOUBLE) / {PSK_PARTS}
  FROM salted
)
SELECT strategy,
       CAST({PSK_PARTS} AS BIGINT) AS n_partitions,
       CAST(max_rows AS BIGINT) AS max_partition_rows,
       ROUND(mean_rows, 4) AS mean_partition_rows,
       ROUND(max_rows / mean_rows, 6) AS skew_ratio,
       ROUND(max_rows / mean_rows, 6) <= 1.5 AS balanced
FROM stats
""",
    doc=f"PARTITION-SKEW SIMULATOR — the measurement behind this "
        f"repo's salting advice (plans/scale.py salted_join): "
        f"simulate the reducer loads a shuffle on l_suppkey would "
        f"produce under {PSK_PARTS} partitions, hash-partitioned raw "
        f"vs salted x{PSK_SALTS} (key + a row-deterministic salt "
        f"from the orderkey, exactly the salted-join layout), and "
        f"report max/mean load and the skew ratio per strategy — "
        f"the straggler forecast BEFORE running the join. The "
        f"simulation is the same overflow-safe Knuth hash both "
        f"engines share, so the loads replay exactly in SQL. One "
        f"scan, two {PSK_PARTS}-cell aggregates; at 100 TB this "
        f"costs one pass over the key column (prune everything "
        f"else) and is the cheap insurance against a 1000-executor "
        f"job shipping 40% of its rows to one reducer.",
    tags=("layout", "profiling", "aggregate"),
)
def partition_skew_simulator(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ytspark.operators.text import knuth_hash_col

    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    keyed = li.select(
        F.pmod(knuth_hash_col(F.col("l_suppkey")), F.lit(PSK_PARTS)).alias(
            "part_raw"
        ),
        F.pmod(
            knuth_hash_col(
                F.col("l_suppkey") * PSK_SALTS
                + F.pmod(F.col("l_orderkey"), F.lit(PSK_SALTS))
            ),
            F.lit(PSK_PARTS),
        ).alias("part_salted"),
    )
    raw = keyed.groupBy("part_raw").agg(F.count(F.lit(1)).alias("n"))
    salted = keyed.groupBy("part_salted").agg(F.count(F.lit(1)).alias("n"))
    stats = raw.agg(
        F.lit("hash").alias("strategy"),
        F.max("n").alias("max_rows"),
        (F.sum("n").cast("double") / PSK_PARTS).alias("mean_rows"),
    ).unionByName(
        salted.agg(
            F.lit("salted").alias("strategy"),
            F.max("n").alias("max_rows"),
            (F.sum("n").cast("double") / PSK_PARTS).alias("mean_rows"),
        )
    )
    return stats.select(
        "strategy",
        F.lit(PSK_PARTS).cast("long").alias("n_partitions"),
        F.col("max_rows").cast("long").alias("max_partition_rows"),
        F.round("mean_rows", 4).alias("mean_partition_rows"),
        F.round(F.col("max_rows") / F.col("mean_rows"), 6).alias(
            "skew_ratio"
        ),
        (
            F.round(F.col("max_rows") / F.col("mean_rows"), 6) <= 1.5
        ).alias("balanced"),
    )


# ---------------------------------------------------------------------------
# Join-strategy advisor (broadcast / shuffle / salted recommendation)
# ---------------------------------------------------------------------------

JSA_BC_BYTES = 10 << 20  # broadcast the build side below 10 MiB
JSA_SKEW_RATIO = 4.0  # salt / AQE-skew above this max/mean key ratio
# deterministic per-dtype row-width estimates — the derivation of
# JSA_DIM_WIDTH below (sum over each dim schema); pinned per-dim so
# the SQL oracle carries the identical size model
JSA_WIDTHS = {"bigint": 8, "int": 4, "integer": 4, "double": 8,
              "float": 4, "string": 24, "timestamp": 8,
              "timestamp_ntz": 8, "date": 4, "boolean": 1}

# dim-side modeled widths (sum of JSA_WIDTHS over each schema; pinned
# as constants so the SQL oracle carries the identical size model)
JSA_DIM_WIDTH = {"orders": 80, "part": 92, "supplier": 44,
                 "customer": 68, "nation": 32}

JSA_CANDIDATES = (
    ("lineitem_orders", "lineitem", "l_orderkey", "orders"),
    ("lineitem_part", "lineitem", "l_partkey", "part"),
    ("lineitem_supplier", "lineitem", "l_suppkey", "supplier"),
    ("orders_customer", "orders", "o_custkey", "customer"),
    ("customer_nation", "customer", "c_nationkey", "nation"),
    ("events_customer", "events", "user_id", "customer"),
)


@register(
    "join_strategy_advisor",
    oracle="\nUNION ALL\n".join(
        f"""
SELECT '{name}' AS join_name,
       CAST((SELECT COUNT(*) FROM {fact}) AS BIGINT) AS fact_rows,
       CAST((SELECT COUNT(*) FROM {dim}) AS BIGINT) AS dim_rows,
       CAST((SELECT COUNT(*) FROM {dim}) * {JSA_DIM_WIDTH[dim]} AS BIGINT)
         AS dim_est_bytes,
       ROUND((SELECT MAX(c) FROM
               (SELECT COUNT(*) AS c FROM {fact} GROUP BY {key}))
             / ((SELECT CAST(COUNT(*) AS DOUBLE) FROM {fact})
                / (SELECT COUNT(DISTINCT {key}) FROM {fact})), 4)
         AS key_skew_ratio,
       CASE WHEN (SELECT COUNT(*) FROM {dim}) * {JSA_DIM_WIDTH[dim]}
                 <= {JSA_BC_BYTES} THEN 'broadcast'
            WHEN (SELECT MAX(c) FROM
                   (SELECT COUNT(*) AS c FROM {fact} GROUP BY {key}))
                 / ((SELECT CAST(COUNT(*) AS DOUBLE) FROM {fact})
                    / (SELECT COUNT(DISTINCT {key}) FROM {fact}))
                 > {JSA_SKEW_RATIO} THEN 'shuffle_salted'
            ELSE 'shuffle_hash' END AS strategy
""".strip()
        for name, fact, key, dim in JSA_CANDIDATES
    ),
    doc=f"JOIN-STRATEGY ADVISOR — the planning table this repo's own "
        f"scale notes hand-derive, emitted as a query: for each "
        f"candidate fact-dim join, the dim side's modeled bytes "
        f"(row count x documented per-dtype width constants — a size "
        f"MODEL both engines reproduce, deliberately not file bytes), "
        f"the fact key's max/mean skew ratio, and the verdict — "
        f"BROADCAST below {JSA_BC_BYTES >> 20} MiB build side, "
        f"SHUFFLE+SALT above a {JSA_SKEW_RATIO}x skew ratio (the "
        f"salted_join / AQE-skew path), plain shuffle-hash otherwise. "
        f"This mechanizes exactly the decisions maybe_broadcast and "
        f"plans/scale.py make, so a user can ASK the engine why a "
        f"join got its strategy. Scale: per candidate, one key-count "
        f"aggregate on the fact (map-side combinable) + two row "
        f"counts; the advisor itself is O(candidates).",
    tags=("layout", "join", "profiling", "aggregate"),
)
def join_strategy_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    tables = load_tables(
        spark, sf_dir,
        *sorted({t for c in JSA_CANDIDATES for t in (c[1], c[3])}),
    )
    outs = []
    for name, fact, key, dim in JSA_CANDIDATES:
        fdf, ddf = tables[fact], tables[dim]
        width = JSA_DIM_WIDTH[dim]
        keyc = fdf.groupBy(key).agg(F.count(F.lit(1)).alias("c"))
        stats = keyc.agg(
            F.max("c").alias("mx"),
            F.sum("c").alias("n"),
            F.count(F.lit(1)).alias("nd"),
        )
        drows = ddf.agg(F.count(F.lit(1)).alias("dn"))
        skew = F.col("mx") / (F.col("n").cast("double") / F.col("nd"))
        est_bytes = F.col("dn") * width
        outs.append(
            stats.crossJoin(F.broadcast(drows)).select(
                F.lit(name).alias("join_name"),
                F.col("n").cast("long").alias("fact_rows"),
                F.col("dn").cast("long").alias("dim_rows"),
                est_bytes.cast("long").alias("dim_est_bytes"),
                F.round(skew, 4).alias("key_skew_ratio"),
                F.when(est_bytes <= JSA_BC_BYTES, "broadcast")
                .when(skew > JSA_SKEW_RATIO, "shuffle_salted")
                .otherwise("shuffle_hash")
                .alias("strategy"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out
