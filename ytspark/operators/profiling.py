"""Schema profiling: functional-dependency discovery.

The data-profiling primitive behind key detection, normalization
advice, and silent-corruption alarms: a functional dependency A -> B
holds iff every A-group carries exactly one distinct B — equivalently
COUNT(DISTINCT A) == COUNT(DISTINCT A, B). The profile checks a fixed
candidate list and reports, per candidate, the group count, how many
groups VIOLATE (carry >1 distinct B), and the verdict — the violation
count is what monitoring wants (an FD that held yesterday and has 3
violating groups today is a data incident, not a schema fact).

Scale shape: one groupBy(lhs) + count_distinct(rhs) per candidate —
map-side combinable, shuffling only group keys; candidates run as
independent aggregates unioned into the tiny report. Everything is
exact integer counting — bit-identical cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ytspark.plans.scale import finish
from ytspark.queries import register
from ytspark.session import load_tables

# (table, lhs, rhs) — mix of true FDs (key-determined) and violations
FD_CANDIDATES = (
    ("orders", "o_orderkey", "o_custkey"),
    ("orders", "o_orderkey", "o_totalprice"),
    ("orders", "o_custkey", "o_orderpriority"),
    ("orders", "o_orderdate", "o_orderstatus"),
    ("lineitem", "l_partkey", "l_suppkey"),
)


def _fd_sql(table: str, lhs: str, rhs: str) -> str:
    return f"""
SELECT '{table}' AS tbl, '{lhs}' AS lhs, '{rhs}' AS rhs,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_violating,
       SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) = 0 AS holds
FROM (
  SELECT {lhs}, COUNT(DISTINCT {rhs}) AS nd FROM {table} GROUP BY {lhs}
)"""


_FD_ORACLE = "\nUNION ALL\n".join(_fd_sql(*c) for c in FD_CANDIDATES)


@register(
    "fd_discovery_profile",
    oracle=_FD_ORACLE,
    doc="Functional-dependency discovery over a fixed candidate list "
        "(orderkey->custkey/totalprice: true key FDs; custkey->"
        "priority, orderdate->status, partkey->suppkey: violated) — "
        "the profiling primitive behind key detection and silent-"
        "corruption alarms. Per candidate: lhs group count, the "
        "number of VIOLATING groups (>1 distinct rhs — the metric a "
        "monitor alerts on, not just the boolean), and the verdict. "
        "Each candidate is one map-side-combinable "
        "groupBy+count_distinct shuffling only group keys; exact "
        "integer counting throughout, replayed identically by the "
        "oracle.",
    tags=("profiling", "quality", "fd", "aggregate"),
)
def fd_discovery_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    tables = load_tables(
        spark, sf_dir, *sorted({t for t, _, _ in FD_CANDIDATES})
    )
    out = None
    for table, lhs, rhs in FD_CANDIDATES:
        g = tables[table].groupBy(lhs).agg(
            F.count_distinct(rhs).alias("nd")
        )
        row = g.agg(
            F.lit(table).alias("tbl"),
            F.lit(lhs).alias("lhs"),
            F.lit(rhs).alias("rhs"),
            F.count(F.lit(1)).alias("n_groups"),
            F.sum(F.when(F.col("nd") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_violating"),
        ).withColumn("holds", F.col("n_violating") == 0)
        out = row if out is None else out.unionByName(row)
    return out


# ---------------------------------------------------------------------------
# FD repair by majority vote (constraint-based cleaning)
# ---------------------------------------------------------------------------

_FD_REPAIR_ORACLE = """
WITH votes AS (
  SELECT o_custkey, o_orderpriority, COUNT(*) AS n
  FROM orders GROUP BY o_custkey, o_orderpriority
),
winner AS (
  SELECT o_custkey, o_orderpriority AS win, n AS win_n, total_n
  FROM (
    SELECT *,
           SUM(n) OVER (PARTITION BY o_custkey) AS total_n,
           ROW_NUMBER() OVER (
             PARTITION BY o_custkey ORDER BY n DESC, o_orderpriority) AS rk
    FROM votes
  ) WHERE rk = 1
)
SELECT win AS repaired_priority,
       CAST(COUNT(*) AS BIGINT) AS n_groups_won,
       CAST(SUM(total_n - win_n) AS BIGINT) AS n_rows_flipped
FROM winner
GROUP BY win
"""


@register(
    "fd_repair_majority",
    oracle=_FD_REPAIR_ORACLE,
    doc="Constraint-based repair for a violated functional "
        "dependency (custkey -> orderpriority, flagged by "
        "fd_discovery_profile): each violating group is repaired to "
        "its MAJORITY value with a deterministic (count desc, value "
        "asc) tiebreak, and the report shows, per winning value, how "
        "many groups it won and how many rows the repair would flip "
        "— the damage assessment run before any cleaning job "
        "rewrites 100 TB. Two aggregates + one per-group window over "
        "|distinct values| rows; exact integer counting throughout.",
    tags=("profiling", "repair", "fd", "window", "aggregate"),
)
def fd_repair_majority(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = load_tables(spark, sf_dir, "orders")["orders"]
    votes = orders.groupBy("o_custkey", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )
    wtot = Window.partitionBy("o_custkey")
    rk = F.row_number().over(
        Window.partitionBy("o_custkey").orderBy(
            F.col("n").desc(), "o_orderpriority"
        )
    )
    winner = (
        votes.withColumn("total_n", F.sum("n").over(wtot))
        .withColumn("rk", rk)
        .where(F.col("rk") == 1)
    )
    return winner.groupBy(
        F.col("o_orderpriority").alias("repaired_priority")
    ).agg(
        F.count(F.lit(1)).alias("n_groups_won"),
        F.sum(F.col("total_n") - F.col("n")).cast("long").alias(
            "n_rows_flipped"
        ),
    )


# ---------------------------------------------------------------------------
# Categorical association battery: chi-square, Cramér's V, mutual info
# ---------------------------------------------------------------------------

ASSOC_PAIRS = (
    ("orders", "o_orderpriority", "o_orderstatus"),
    ("customer", "c_mktsegment", "c_nationkey"),
)


def _assoc_sql(table: str, ca: str, cb: str) -> str:
    return f"""
SELECT '{ca}' AS col_a, '{cb}' AS col_b,
       CAST(MAX(n) AS BIGINT) AS n,
       CAST((COUNT(DISTINCT a) - 1) * (COUNT(DISTINCT b) - 1) AS BIGINT)
         AS dof,
       ROUND(SUM(POWER(nij - na * nb / n, 2) / (na * nb / n)), 6)
         AS chi2,
       ROUND(SQRT(SUM(POWER(nij - na * nb / n, 2) / (na * nb / n))
                  / (MAX(n) * LEAST(COUNT(DISTINCT a) - 1,
                                    COUNT(DISTINCT b) - 1))), 6)
         AS cramers_v,
       ROUND(SUM(CASE WHEN nij > 0
                      THEN nij / n * LN(nij * n / (na * nb)) END), 6)
         AS mi
FROM (
  SELECT a, b, nij,
         SUM(nij) OVER (PARTITION BY a) AS na,
         SUM(nij) OVER (PARTITION BY b) AS nb,
         SUM(nij) OVER () AS n
  FROM (
    SELECT ra.a, rb.b, COALESCE(c.nij, 0) AS nij
    FROM (SELECT DISTINCT {ca} AS a FROM {table}) ra
    CROSS JOIN (SELECT DISTINCT {cb} AS b FROM {table}) rb
    LEFT JOIN (
      SELECT {ca} AS a, {cb} AS b, CAST(COUNT(*) AS DOUBLE) AS nij
      FROM {table} GROUP BY 1, 2
    ) c ON c.a = ra.a AND c.b = rb.b
  )
)"""


_ASSOC_ORACLE = "\nUNION ALL\n".join(_assoc_sql(*p) for p in ASSOC_PAIRS)


@register(
    "categorical_association_battery",
    oracle=_ASSOC_ORACLE,
    doc="Categorical-association battery over column pairs: Pearson "
        "chi-square with degrees of freedom, Cramér's V (the "
        "normalized effect size dashboards actually compare), and "
        "mutual information in nats — the dependence screen a "
        "profiler runs to find redundant or leaking columns before "
        "feature selection. Everything derives from ONE contingency "
        "aggregate per pair (cells shuffle on the pair key; marginals "
        "are windows over |cells| rows, never over data), with exact "
        "integer cell counts feeding deterministic float expressions "
        "(6 dp rounding absorbs cell-summation order, the repo "
        "policy). Observed-cell MI convention: absent cells "
        "contribute zero, identically on both engines.",
    tags=("profiling", "statistics", "association", "aggregate", "window"),
)
def categorical_association_battery(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql.window import Window

    tables = load_tables(
        spark, sf_dir, *sorted({t for t, _, _ in ASSOC_PAIRS})
    )
    out = None
    for table, ca, cb in ASSOC_PAIRS:
        observed = tables[table].groupBy(
            F.col(ca).alias("a"), F.col(cb).alias("b")
        ).agg(F.count(F.lit(1)).cast("double").alias("nij"))
        # densified grid: empty cells contribute (0-e)^2/e = e to chi2
        ra = tables[table].select(F.col(ca).alias("a")).distinct()
        rb = tables[table].select(F.col(cb).alias("b")).distinct()
        cells = (
            ra.crossJoin(F.broadcast(rb))
            .join(observed, ["a", "b"], "left")
            .select("a", "b", F.coalesce("nij", F.lit(0.0)).alias("nij"))
        )
        m = cells.select(
            "a",
            "b",
            "nij",
            F.sum("nij").over(Window.partitionBy("a")).alias("na"),
            F.sum("nij").over(Window.partitionBy("b")).alias("nb"),
            F.sum("nij").over(
                Window.partitionBy()
            ).alias("n"),
        )
        e = F.col("na") * F.col("nb") / F.col("n")
        chi2 = F.sum(F.pow(F.col("nij") - e, 2) / e)
        row = m.agg(
            F.lit(ca).alias("col_a"),
            F.lit(cb).alias("col_b"),
            F.max("n").cast("long").alias("n"),
            (
                (F.count_distinct("a") - 1) * (F.count_distinct("b") - 1)
            ).alias("dof"),
            F.round(chi2, 6).alias("chi2"),
            F.round(
                F.sqrt(
                    chi2
                    / (
                        F.max("n")
                        * F.least(
                            F.count_distinct("a") - 1,
                            F.count_distinct("b") - 1,
                        )
                    )
                ),
                6,
            ).alias("cramers_v"),
            F.round(
                F.sum(
                    F.when(
                        F.col("nij") > 0,
                        F.col("nij")
                        / F.col("n")
                        * F.log(
                            F.col("nij")
                            * F.col("n")
                            / (F.col("na") * F.col("nb"))
                        ),
                    )
                ),
                6,
            ).alias("mi"),
        )
        out = row if out is None else out.unionByName(row)
    return out


# ---------------------------------------------------------------------------
# Benford first-digit audit (fraud/fabrication screen)
# ---------------------------------------------------------------------------


@register(
    "benford_digit_audit",
    oracle="""
WITH d AS (
  SELECT CAST(SUBSTR(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR),
              1, 1) AS BIGINT) AS digit
  FROM orders WHERE o_totalprice > 0
),
g AS (
  SELECT digit, COUNT(*) AS n,
         SUM(COUNT(*)) OVER () AS total
  FROM d GROUP BY digit
)
SELECT digit,
       CAST(n AS BIGINT) AS n_orders,
       ROUND(CAST(n AS DOUBLE) / total, 6) AS observed_p,
       ROUND(LOG10(1.0 + 1.0 / digit), 6) AS benford_p,
       ROUND(POWER(CAST(n AS DOUBLE) / total
                   - LOG10(1.0 + 1.0 / digit), 2)
             / LOG10(1.0 + 1.0 / digit) * total, 3)
         AS chi2_term
FROM g
""",
    doc="Benford first-digit audit of order values — the classic "
        "fabricated-data screen (naturally occurring multi-scale "
        "amounts follow P(d) = log10(1 + 1/d); fabricated or "
        "constrained values don't): observed vs expected first-digit "
        "shares plus each digit's chi-square contribution, so an "
        "auditor sees WHICH digit deviates, not just that the total "
        "does. The first digit is taken from the DECIMAL(18,2) "
        "string rendering — exact and identical on both engines "
        "(float log10-based extraction would risk boundary ulps). "
        "One aggregate over the scan; 9 output rows.",
    tags=("profiling", "quality", "benford", "aggregate"),
)
def benford_digit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = load_tables(spark, sf_dir, "orders")["orders"]
    d = orders.where(F.col("o_totalprice") > 0).select(
        F.substring(
            F.col("o_totalprice").cast("decimal(18,2)").cast("string"), 1, 1
        )
        .cast("long")
        .alias("digit")
    )
    g = d.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    g = g.withColumn("total", F.sum("n").over(Window.partitionBy()))
    obs = F.col("n").cast("double") / F.col("total")
    ben = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    return g.select(
        "digit",
        F.col("n").cast("long").alias("n_orders"),
        F.round(obs, 6).alias("observed_p"),
        F.round(ben, 6).alias("benford_p"),
        # 3 dp: chi2 terms reach ~1e4-1e5 (TPC-H prices are far from
        # Benford) and log10's libm differs by a ulp across builds;
        # the coarser grain keeps the value inside the 9-significant-
        # digit hash-stability budget
        F.round(F.pow(obs - ben, 2) / ben * F.col("total"), 3).alias(
            "chi2_term"
        ),
    )


# ---------------------------------------------------------------------------
# Mutual information / entropy battery (the chi2 battery's twin in nats)
# ---------------------------------------------------------------------------


def _mi_sql(table: str, ca: str, cb: str) -> str:
    return f"""
SELECT '{ca}' AS col_a, '{cb}' AS col_b, CAST(MAX(n) AS BIGINT) AS n,
       ROUND(-SUM(pij * LN(na * 1.0 / n)), 6) AS h_a,
       ROUND(-SUM(pij * LN(nb * 1.0 / n)), 6) AS h_b,
       ROUND(-SUM(pij * LN(nij * 1.0 / n)), 6) AS h_ab,
       ROUND(SUM(pij * LN(nij * 1.0 * n / (na * nb))), 6) AS mi
FROM (
  SELECT nij, na, nb, n, nij * 1.0 / n AS pij
  FROM (
    SELECT {ca} AS a, {cb} AS b, COUNT(*) AS nij FROM {table} GROUP BY 1, 2
  ) j
  JOIN (SELECT {ca} AS a, COUNT(*) AS na FROM {table} GROUP BY 1) ra USING (a)
  JOIN (SELECT {cb} AS b, COUNT(*) AS nb FROM {table} GROUP BY 1) rb USING (b)
  CROSS JOIN (SELECT COUNT(*) AS n FROM {table})
)"""


@register(
    "column_mutual_information",
    oracle="\nUNION ALL\n".join(_mi_sql(*p) for p in ASSOC_PAIRS),
    doc="Column-dependence battery in INFORMATION units: per column "
        "pair, the marginal entropies H(a)/H(b), the joint entropy "
        "H(a,b), and the mutual information I(a;b) = H(a)+H(b)-H(a,b) "
        "in nats — the schema-discovery signal (near-zero MI: safe to "
        "model independently; MI near min(H): one column determines "
        "the other, the soft-FD detector complementing the exact "
        "fd_discovery_profile and the chi2 battery's significance "
        "view). Everything derives from EXACT integer cell counts: "
        "the marginal sums ride along each joint cell (sum over b of "
        "nij = na), so one grid-sized join + one aggregate computes "
        "all four statistics — no second scan, no windows; the table "
        "count is a broadcast one-row scalar (allowlisted BNLJ). "
        "Logs over identical exact rationals round identically at "
        "6 dp on both engines.",
    tags=("profiling", "statistics", "entropy", "aggregate"),
)
def column_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    tables = load_tables(
        spark, sf_dir, *sorted({t for t, _, _ in ASSOC_PAIRS})
    )
    out = None
    for table, ca, cb in ASSOC_PAIRS:
        tbl = tables[table]
        joint = tbl.groupBy(
            F.col(ca).alias("a"), F.col(cb).alias("b")
        ).agg(F.count(F.lit(1)).alias("nij"))
        ra = tbl.groupBy(F.col(ca).alias("a")).agg(
            F.count(F.lit(1)).alias("na")
        )
        rb = tbl.groupBy(F.col(cb).alias("b")).agg(
            F.count(F.lit(1)).alias("nb")
        )
        tot = tbl.agg(F.count(F.lit(1)).alias("n"))
        m = (
            joint.join(ra, "a")
            .join(rb, "b")
            .crossJoin(F.broadcast(tot))
            .select(
                "nij", "na", "nb", "n",
                (F.col("nij") * 1.0 / F.col("n")).alias("pij"),
            )
        )
        pij = F.col("pij")
        row = m.agg(
            F.lit(ca).alias("col_a"),
            F.lit(cb).alias("col_b"),
            F.max("n").cast("long").alias("n"),
            F.round(
                -F.sum(pij * F.log(F.col("na") * 1.0 / F.col("n"))), 6
            ).alias("h_a"),
            F.round(
                -F.sum(pij * F.log(F.col("nb") * 1.0 / F.col("n"))), 6
            ).alias("h_b"),
            F.round(
                -F.sum(pij * F.log(F.col("nij") * 1.0 / F.col("n"))), 6
            ).alias("h_ab"),
            F.round(
                F.sum(
                    pij
                    * F.log(
                        F.col("nij") * 1.0 * F.col("n")
                        / (F.col("na") * F.col("nb"))
                    )
                ),
                6,
            ).alias("mi"),
        )
        out = row if out is None else out.unionByName(row)
    return out


# ---------------------------------------------------------------------------
# Exact order statistics via two-pass bucket histogram (no global sort)
# ---------------------------------------------------------------------------

PCTL_TARGETS = (("p50", 0.5), ("p90", 0.9), ("p99", 0.99))
PCTL_BUCKET_WIDTH = 1000.0


@register(
    "exact_percentiles_two_pass",
    oracle="""
WITH d AS (SELECT CAST(o_totalprice AS DECIMAL(18,2)) AS v FROM orders),
n AS (SELECT COUNT(*) AS n FROM d),
t(pname, p) AS (VALUES ('p50', 0.5), ('p90', 0.9), ('p99', 0.99)),
k AS (SELECT pname, p, CAST(CEIL(p * n.n) AS BIGINT) AS k FROM t CROSS JOIN n),
r AS (SELECT v, ROW_NUMBER() OVER (ORDER BY v) AS rn FROM d)
SELECT pname, p, k, CAST(v AS DOUBLE) AS value
FROM k JOIN r ON r.rn = k.k
""",
    doc="EXACT percentiles (k-th smallest, k = ceil(p*N)) computed "
        "WITHOUT a global sort — the two-pass distributed selection "
        "that replaces approx_percentile when the answer must be "
        "exact at 100 TB: pass 1 histograms values into fixed-width "
        "buckets (one map-side-combinable aggregate; cumulative "
        "counts over the tiny bucket table locate each target's "
        "bucket and its within-bucket rank), pass 2 ranks ONLY the "
        "rows of the ~3 target buckets (a partitioned window over "
        "1/width of the data) and picks the k - offset smallest. "
        "DECIMAL values make the order exact cross-engine; ties "
        "share a value so the selected order statistic is "
        "deterministic under any tiebreak. The oracle is the naive "
        "full-sort ROW_NUMBER definition — feasible at gate scale, "
        "which is exactly why the two-pass form exists for the real "
        "one. The 3 x |buckets| target-location theta join is a "
        "broadcast of the tiny cumulative histogram (allowlisted).",
    tags=("profiling", "percentile", "statistics", "scale", "aggregate"),
)
def exact_percentiles_two_pass(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = load_tables(spark, sf_dir, "orders")["orders"]
    d = orders.select(
        F.col("o_totalprice").cast("decimal(18,2)").alias("v"),
        F.floor(F.col("o_totalprice") / F.lit(PCTL_BUCKET_WIDTH))
        .cast("long")
        .alias("bucket"),
    )
    hist = d.groupBy("bucket").agg(F.count(F.lit(1)).alias("c"))
    # cumulative offsets over the bucket table: bounded (|value
    # range| / width rows), never data-sized
    ow = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    cum = hist.select(
        "bucket", "c", F.coalesce(F.sum("c").over(ow), F.lit(0)).alias("off")
    )
    tot = d.agg(F.count(F.lit(1)).alias("n"))
    targets = (
        spark.createDataFrame(list(PCTL_TARGETS), "pname string, p double")
        .crossJoin(F.broadcast(tot))
        .select(
            "pname", "p", F.ceil(F.col("p") * F.col("n")).cast("long").alias("k")
        )
    )
    located = targets.join(
        F.broadcast(cum),
        (F.col("k") > F.col("off")) & (F.col("k") <= F.col("off") + F.col("c")),
    ).select("pname", "p", "k", "bucket", "off")
    wv = Window.partitionBy("pname").orderBy("v")
    return (
        d.join(F.broadcast(located), "bucket")
        .withColumn("rn", F.row_number().over(wv))
        .where(F.col("rn") == F.col("k") - F.col("off"))
        .select("pname", "p", "k", F.col("v").cast("double").alias("value"))
    )


@register(
    "grouped_exact_median_two_pass",
    oracle="""
WITH d AS (
  SELECT o_orderpriority AS pri, CAST(o_totalprice AS DECIMAL(18,2)) AS v
  FROM orders
),
n AS (SELECT pri, COUNT(*) AS n FROM d GROUP BY pri),
k AS (SELECT pri, n, CAST(CEIL(0.5 * n) AS BIGINT) AS k FROM n),
r AS (SELECT pri, v, ROW_NUMBER() OVER (PARTITION BY pri ORDER BY v) AS rn
      FROM d)
SELECT k.pri, CAST(k.n AS BIGINT) AS n_orders, k.k,
       CAST(r.v AS DOUBLE) AS median_price
FROM k JOIN r ON r.pri = k.pri AND r.rn = k.k
""",
    doc="PER-GROUP exact median (k-th smallest, k = ceil(n/2)) via "
        "the two-pass bucket histogram, fully partitioned: with a "
        "group key every step partitions naturally — per-(group, "
        "bucket) counts, cumulative offsets per group over its own "
        "tiny bucket list, and a rank pass over only each group's "
        "target bucket — so unlike the global exact_percentiles_"
        "two_pass there is NO unpartitioned window anywhere, and "
        "group skew splits across buckets. DECIMAL values make the "
        "order exact cross-engine; the oracle is the naive per-group "
        "full-sort definition. This is the exact-median-per-segment "
        "query a 100 TB fact table answers with two aggregate-shaped "
        "passes instead of a per-group sort.",
    tags=("profiling", "percentile", "statistics", "scale", "window"),
)
def grouped_exact_median_two_pass(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql.window import Window

    orders = load_tables(spark, sf_dir, "orders")["orders"]
    d = orders.select(
        F.col("o_orderpriority").alias("pri"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("v"),
        F.floor(F.col("o_totalprice") / F.lit(PCTL_BUCKET_WIDTH))
        .cast("long")
        .alias("bucket"),
    )
    hist = d.groupBy("pri", "bucket").agg(F.count(F.lit(1)).alias("c"))
    ow = (
        Window.partitionBy("pri")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = hist.select(
        "pri",
        "bucket",
        "c",
        F.coalesce(F.sum("c").over(ow), F.lit(0)).alias("off"),
    )
    n = d.groupBy("pri").agg(F.count(F.lit(1)).alias("n"))
    k = n.select(
        "pri", "n", F.ceil(F.lit(0.5) * F.col("n")).cast("long").alias("k")
    )
    located = k.join(cum, "pri").where(
        (F.col("k") > F.col("off")) & (F.col("k") <= F.col("off") + F.col("c"))
    ).select("pri", "n", "k", "bucket", "off")
    wv = Window.partitionBy("pri").orderBy("v")
    return (
        d.join(F.broadcast(located), ["pri", "bucket"])
        .withColumn("rn", F.row_number().over(wv))
        .where(F.col("rn") == F.col("k") - F.col("off"))
        .select(
            "pri",
            F.col("n").cast("long").alias("n_orders"),
            "k",
            F.col("v").cast("double").alias("median_price"),
        )
    )


# ---------------------------------------------------------------------------
# Spearman rank correlation via bounded-cardinality average ranks
# ---------------------------------------------------------------------------


@register(
    "spearman_rank_correlation",
    oracle="""
WITH d AS (
  SELECT CAST(l_quantity AS BIGINT) AS q,
         CAST(ROUND(l_discount * 100) AS BIGINT) AS dc
  FROM lineitem
),
joint AS (SELECT q, dc, COUNT(*) AS c FROM d GROUP BY q, dc),
mq AS (SELECT q, SUM(c) AS cq FROM joint GROUP BY q),
rq AS (SELECT q, 2 * (SUM(cq) OVER (ORDER BY q) - cq) + cq + 1 AS x FROM mq),
md AS (SELECT dc, SUM(c) AS cd FROM joint GROUP BY dc),
rd AS (SELECT dc, 2 * (SUM(cd) OVER (ORDER BY dc) - cd) + cd + 1 AS y
       FROM md),
s AS (
  SELECT SUM(c) AS n,
         SUM(CAST(c AS HUGEINT) * x) AS sx,
         SUM(CAST(c AS HUGEINT) * y) AS sy,
         SUM(CAST(c AS HUGEINT) * x * x) AS sxx,
         SUM(CAST(c AS HUGEINT) * y * y) AS syy,
         SUM(CAST(c AS HUGEINT) * x * y) AS sxy
  FROM joint JOIN rq USING (q) JOIN rd USING (dc)
)
SELECT CAST(n AS BIGINT) AS n,
       CAST((SELECT COUNT(*) FROM mq) AS BIGINT) AS n_qty_levels,
       CAST((SELECT COUNT(*) FROM md) AS BIGINT) AS n_disc_levels,
       ROUND(
         (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         / SQRT(
             (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
             * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))),
         6) AS rho_spearman
FROM s
""",
    doc="EXACT tie-corrected Spearman rank correlation (quantity vs "
        "discount) with NO data-sized sort or rank anywhere: both "
        "columns have bounded cardinality (<=50 quantity levels, 11 "
        "discount percents), so the average rank of every value is "
        "derived from the per-value counts alone — avg_rank(v) = "
        "#less(v) + (#eq(v)+1)/2, kept integer as 2*rank — via a "
        "cumulative window over the TINY distinct-value table "
        "(allowlisted; <=50 rows by construction). One groupBy over "
        "the data builds the joint (q, dc, count) contingency table "
        "(<=550 rows); every rank/sum after that is arithmetic on "
        "that table. Sums of c*x*y are exact DECIMAL(38,0) (Spark) / "
        "HUGEINT (DuckDB) — 4n^3 fits to n ~ 1e12 rows — and only "
        "the final Pearson-on-ranks combination drops to double, an "
        "identical fixed expression tree in both engines, rounded to "
        "6 dp. This is the rank-correlation monitor a 100 TB fact "
        "table answers with one aggregate-shaped pass.",
    tags=("statistics", "profiling", "aggregate", "scale"),
)
def spearman_rank_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    d = li.select(
        F.col("l_quantity").cast("long").alias("q"),
        F.round(F.col("l_discount") * 100).cast("long").alias("dc"),
    )
    joint = d.groupBy("q", "dc").agg(F.count(F.lit(1)).alias("c")).persist()
    # marginal counts: <=50 / <=11 rows — the cumulative windows below
    # run over these tiny pre-aggregates, never over data-sized input
    mq = joint.groupBy("q").agg(F.sum("c").alias("cq"))
    md = joint.groupBy("dc").agg(F.sum("c").alias("cd"))
    wq = Window.orderBy("q").rowsBetween(Window.unboundedPreceding, -1)
    wd = Window.orderBy("dc").rowsBetween(Window.unboundedPreceding, -1)
    # 2*average-rank stays integer: 2*#less + #eq + 1
    rq = mq.select(
        "q",
        (2 * F.coalesce(F.sum("cq").over(wq), F.lit(0)) + F.col("cq") + 1)
        .cast("decimal(13,0)")
        .alias("x"),
    )
    rd = md.select(
        "dc",
        (2 * F.coalesce(F.sum("cd").over(wd), F.lit(0)) + F.col("cd") + 1)
        .cast("decimal(13,0)")
        .alias("y"),
    )
    cd_ = F.col("c").cast("decimal(18,0)")
    s = (
        joint.join(F.broadcast(rq), "q")
        .join(F.broadcast(rd), "dc")
        .agg(
            F.sum("c").alias("n"),
            F.sum(cd_ * F.col("x")).alias("sx"),
            F.sum(cd_ * F.col("y")).alias("sy"),
            F.sum(cd_ * F.col("x") * F.col("x")).alias("sxx"),
            F.sum(cd_ * F.col("y") * F.col("y")).alias("syy"),
            F.sum(cd_ * F.col("x") * F.col("y")).alias("sxy"),
        )
    )
    nq = mq.agg(F.count(F.lit(1)).cast("long").alias("n_qty_levels"))
    nd = md.agg(F.count(F.lit(1)).cast("long").alias("n_disc_levels"))
    dbl = lambda c: F.col(c).cast("double")  # noqa: E731
    # one-row result; release the joint-histogram cache (3 consumers)
    return finish(
        s.crossJoin(F.broadcast(nq))
        .crossJoin(F.broadcast(nd))
        .select(
            F.col("n").cast("long").alias("n"),
            "n_qty_levels",
            "n_disc_levels",
            F.round(
                (dbl("n") * dbl("sxy") - dbl("sx") * dbl("sy"))
                / F.sqrt(
                    (dbl("n") * dbl("sxx") - dbl("sx") * dbl("sx"))
                    * (dbl("n") * dbl("syy") - dbl("sy") * dbl("sy"))
                ),
                6,
            ).alias("rho_spearman"),
        ),
        joint,
    )


# ---------------------------------------------------------------------------
# Grouped WEIGHTED median via the two-pass bucket histogram
# ---------------------------------------------------------------------------


@register(
    "grouped_weighted_median_two_pass",
    oracle="""
WITH d AS (
  SELECT l_linestatus AS g,
         CAST(l_extendedprice AS DECIMAL(18,2)) AS v,
         CAST(l_quantity AS BIGINT) AS w,
         l_orderkey AS ok, l_linenumber AS ln
  FROM lineitem
),
tot AS (SELECT g, SUM(w) AS tw FROM d GROUP BY g),
k AS (SELECT g, tw, CAST(CEIL(tw / 2.0) AS BIGINT) AS k FROM tot),
r AS (
  SELECT g, v, w,
         SUM(w) OVER (PARTITION BY g ORDER BY v, ok, ln
                      ROWS UNBOUNDED PRECEDING) AS cumw
  FROM d
)
SELECT k.g AS linestatus,
       CAST(k.tw AS BIGINT) AS total_weight,
       k.k,
       CAST(r.v AS DOUBLE) AS wmedian_price
FROM k JOIN r ON r.g = k.g AND r.cumw >= k.k AND r.cumw - r.w < k.k
""",
    doc="Per-group WEIGHTED median (smallest v whose cumulative "
        "weight reaches ceil(W/2), weights = line quantities) via "
        "the same two-pass bucket histogram as the exact median — "
        "the robust central-tendency statistic when rows carry "
        "unequal mass (units, durations, bytes): pass 1 sums WEIGHTS "
        "per (group, bucket) instead of counting rows, cumulative "
        "offsets locate each group's target bucket, pass 2 runs the "
        "weighted running sum over only that bucket's rows. Fully "
        "partitioned, no unpartitioned window anywhere; ties in v "
        "are harmless (every boundary row shares the same v) but "
        "the running sum still totally orders on (v, orderkey, "
        "linenumber) so exactly ONE row satisfies the boundary "
        "predicate in both engines. The oracle is the naive "
        "single-window definition — feasible at gate scale, which "
        "is why the two-pass form exists at real scale.",
    tags=("profiling", "percentile", "statistics", "scale", "window"),
)
def grouped_weighted_median_two_pass(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql.window import Window

    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    d = li.select(
        F.col("l_linestatus").alias("g"),
        F.col("l_extendedprice").cast("decimal(18,2)").alias("v"),
        F.col("l_quantity").cast("long").alias("w"),
        F.col("l_orderkey").alias("ok"),
        F.col("l_linenumber").alias("ln"),
        F.floor(F.col("l_extendedprice") / F.lit(PCTL_BUCKET_WIDTH))
        .cast("long")
        .alias("bucket"),
    )
    hist = d.groupBy("g", "bucket").agg(F.sum("w").alias("c"))
    ow = (
        Window.partitionBy("g")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = hist.select(
        "g", "bucket", "c",
        F.coalesce(F.sum("c").over(ow), F.lit(0)).alias("off"),
    )
    tot = d.groupBy("g").agg(F.sum("w").alias("tw"))
    k = tot.select(
        "g", "tw", F.ceil(F.col("tw") / 2.0).cast("long").alias("k")
    )
    located = (
        k.join(cum, "g")
        .where((F.col("k") > F.col("off")) & (F.col("k") <= F.col("off") + F.col("c")))
        .select("g", "tw", "k", "bucket", "off")
    )
    wv = (
        Window.partitionBy("g")
        .orderBy("v", "ok", "ln")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    t = F.col("k") - F.col("off")  # target weighted rank within bucket
    return (
        d.join(F.broadcast(located), ["g", "bucket"])
        .withColumn("cumw", F.sum("w").over(wv))
        .where((F.col("cumw") >= t) & (F.col("cumw") - F.col("w") < t))
        .select(
            F.col("g").alias("linestatus"),
            F.col("tw").cast("long").alias("total_weight"),
            "k",
            F.col("v").cast("double").alias("wmedian_price"),
        )
    )


# ---------------------------------------------------------------------------
# ANALYZE-style column statistics battery (CBO inputs)
# ---------------------------------------------------------------------------

ANALYZE_COLS = (
    "l_orderkey",
    "l_suppkey",
    "l_quantity",
    "l_returnflag",
    "l_shipdate",
)


def _analyze_sql(col: str) -> str:
    return f"""
SELECT '{col}' AS col_name,
       CAST(COUNT(*) - COUNT({col}) AS BIGINT) AS n_nulls,
       CAST(COUNT(DISTINCT {col}) AS BIGINT) AS ndv,
       CAST(MIN({col}) AS VARCHAR) AS min_str,
       CAST(MAX({col}) AS VARCHAR) AS max_str,
       ROUND(AVG(LEN(CAST({col} AS VARCHAR))), 4) AS avg_len
FROM lineitem"""


@register(
    "analyze_column_stats",
    oracle=" UNION ALL ".join(_analyze_sql(c) for c in ANALYZE_COLS),
    doc="ANALYZE TABLE column statistics — the inputs a cost-based "
        "optimizer (and this repo's own broadcast/skew heuristics) "
        "feeds on: per column, the null count, EXACT distinct count, "
        "min/max (string form, stable across engines for integer/"
        "date/varchar columns), and mean rendered length (the row-"
        "width estimate that sizes shuffles). Each column is one "
        "map-side-combinable aggregate over the fact table; at "
        "100 TB you'd swap the exact NDV for the engine's HLL "
        "(approx_count_distinct — the sketch family here certifies "
        "its bounds separately) and keep everything else unchanged. "
        "All-integer/string outputs hash bit-identically.",
    tags=("profiling", "quality", "aggregate", "statistics"),
)
def analyze_column_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    out = None
    for c in ANALYZE_COLS:
        s = F.col(c).cast("string")
        row = li.agg(
            F.lit(c).alias("col_name"),
            (F.count(F.lit(1)) - F.count(c)).cast("long").alias("n_nulls"),
            F.countDistinct(c).cast("long").alias("ndv"),
            # min/max in the column's NATIVE order, rendered after
            # (string-order min of integers would be lexicographic)
            F.min(F.col(c)).cast("string").alias("min_str"),
            F.max(F.col(c)).cast("string").alias("max_str"),
            F.round(F.avg(F.length(s)), 4).alias("avg_len"),
        )
        out = row if out is None else out.unionByName(row)
    return out


# ---------------------------------------------------------------------------
# k-anonymity / l-diversity privacy audit
# ---------------------------------------------------------------------------

KANON_K = 5  # the k in "k-anonymous" the audit certifies against
KANON_ROUND = 6


@register(
    "k_anonymity_audit",
    oracle=f"""
WITH q AS (
  SELECT c_nationkey AS nation, c_mktsegment AS segment,
         CASE WHEN c_acctbal < 0 THEN 'delinquent'
              WHEN c_acctbal < 5000 THEN 'standard'
              ELSE 'premium' END AS sensitive
  FROM customer
),
cls AS (
  SELECT nation, segment,
         COUNT(*) AS class_size,
         COUNT(DISTINCT sensitive) AS l_distinct
  FROM q GROUP BY nation, segment
),
tops AS (
  SELECT nation, segment, MAX(cnt) AS top_cnt FROM (
    SELECT nation, segment, sensitive, COUNT(*) AS cnt
    FROM q GROUP BY nation, segment, sensitive
  ) GROUP BY nation, segment
)
SELECT CAST(cls.nation AS BIGINT) AS nation, cls.segment,
       CAST(class_size AS BIGINT) AS class_size,
       CAST(l_distinct AS BIGINT) AS l_distinct,
       ROUND(top_cnt * 1.0 / class_size, {KANON_ROUND}) AS top_sensitive_share,
       class_size >= {KANON_K} AS k_anonymous,
       l_distinct >= 2 AS l_diverse
FROM cls JOIN tops
  ON cls.nation = tops.nation AND cls.segment = tops.segment
""",
    doc="PRIVACY AUDIT of a release candidate: treating (nation, "
        "market segment) as the quasi-identifier and the account-"
        "balance tier as the sensitive attribute, report every "
        "equivalence class's size (k-anonymity: a class below "
        f"k={KANON_K} makes its members re-identifiable), distinct "
        "sensitive values (l-diversity: l=1 means the QI alone "
        "discloses the attribute), and the top sensitive-value share "
        "(the t-closeness-style skew signal — a class can be "
        "l-diverse yet 99% one value). Training-data pipelines run "
        "exactly this gate before shipping a de-identified corpus. "
        "Two map-side-combinable groupBys over one scan — the class "
        "report is O(|QI cardinality|), so the audit costs a scan at "
        "100 TB regardless of row count. Exact integer counts; the "
        "one ratio is rounded.",
    tags=("profiling", "privacy", "quality", "aggregate"),
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_tables(spark, sf_dir, "customer")["customer"]
    q = cust.select(
        F.col("c_nationkey").cast("long").alias("nation"),
        F.col("c_mktsegment").alias("segment"),
        F.when(F.col("c_acctbal") < 0, F.lit("delinquent"))
        .when(F.col("c_acctbal") < 5000, F.lit("standard"))
        .otherwise(F.lit("premium"))
        .alias("sensitive"),
    )
    per_sens = q.groupBy("nation", "segment", "sensitive").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    cls = per_sens.groupBy("nation", "segment").agg(
        F.sum("cnt").alias("class_size"),
        F.count(F.lit(1)).alias("l_distinct"),
        F.max("cnt").alias("top_cnt"),
    )
    return cls.select(
        "nation",
        "segment",
        F.col("class_size").cast("long").alias("class_size"),
        F.col("l_distinct").cast("long").alias("l_distinct"),
        F.round(F.col("top_cnt") * 1.0 / F.col("class_size"), KANON_ROUND)
        .alias("top_sensitive_share"),
        (F.col("class_size") >= KANON_K).alias("k_anonymous"),
        (F.col("l_distinct") >= 2).alias("l_diverse"),
    )


# ---------------------------------------------------------------------------
# approx_percentile error certification (rank-error bound evaluation)
# ---------------------------------------------------------------------------

APPROX_PCTL_ACCURACY = 1000  # Spark's accuracy knob: rank err <= N/accuracy


@register(
    "percentile_sketch_error_eval",
    oracle=f"""
WITH d AS (SELECT CAST(o_totalprice AS DECIMAL(18,2)) AS v FROM orders),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM d),
t(pname, p) AS (VALUES ('p50', 0.5), ('p90', 0.9), ('p99', 0.99)),
k AS (SELECT pname, p, CAST(CEIL(p * n.n) AS BIGINT) AS k, n.n
      FROM t CROSS JOIN n),
r AS (SELECT v, ROW_NUMBER() OVER (ORDER BY v) AS rn FROM d)
SELECT pname, p, k.n,
       CAST(r.v AS DOUBLE) AS exact_value,
       CAST(CEIL(CAST(k.n AS DOUBLE) / {APPROX_PCTL_ACCURACY}) AS BIGINT)
         AS rank_tolerance,
       TRUE AS within_bound
FROM k JOIN r ON r.rn = k.k
""",
    doc="CERTIFIES Spark's approx_percentile (Greenwald-Khanna-style "
        f"quantile summary, accuracy={APPROX_PCTL_ACCURACY}) against "
        "its own published guarantee: for each target p the sketch "
        "value's TRUE rank interval [count(<v)+1, count(<=v)] must "
        f"come within N/{APPROX_PCTL_ACCURACY} of the target rank "
        "ceil(p*N). The exact side (value + tolerance) is recomputed "
        "from first principles and hash-checked; within_bound is the "
        "engine-side assertion the oracle pins to TRUE — a violated "
        "bound hash-mismatches and fails the gate (same pattern as "
        "hll_retention_estimate_bounds). This is the missing "
        "evaluation-family member for ORDER STATISTICS: the engine "
        "measures its own sketch error in-engine, the precondition "
        "for choosing sketch-vs-two-pass-exact per query at 100 TB. "
        "Plan: one approx_percentile aggregate (map-side mergeable "
        "summaries), one rank-counting aggregate conditioned on the "
        "3 broadcast sketch values, the exact two-pass locator for "
        "the exact values — no global sort, no collect.",
    tags=("profiling", "evaluation", "percentile", "sketch", "aggregate"),
)
def percentile_sketch_error_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = load_tables(spark, sf_dir, "orders")["orders"]
    d = orders.select(
        F.col("o_totalprice").cast("decimal(18,2)").alias("v"),
        F.floor(F.col("o_totalprice") / F.lit(PCTL_BUCKET_WIDTH))
        .cast("long")
        .alias("bucket"),
    )
    # sketch side: one mergeable-summary aggregate, 3 values out
    approx = orders.agg(
        *[
            F.percentile_approx(
                F.col("o_totalprice"), p, APPROX_PCTL_ACCURACY
            ).alias(f"a_{pname}")
            for pname, p in PCTL_TARGETS
        ]
    )
    # true rank interval of each sketch value: one conditional-count
    # aggregate against the 3 broadcast values
    ranks = d.crossJoin(F.broadcast(approx)).agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.sum(
                (F.col("v") < F.col(f"a_{pname}")).cast("long")
            ).alias(f"lt_{pname}")
            for pname, _ in PCTL_TARGETS
        ],
        *[
            F.sum(
                (F.col("v") <= F.col(f"a_{pname}")).cast("long")
            ).alias(f"le_{pname}")
            for pname, _ in PCTL_TARGETS
        ],
    )
    # exact side: the two-pass locator (shared shape with
    # exact_percentiles_two_pass)
    hist = d.groupBy("bucket").agg(F.count(F.lit(1)).alias("c"))
    ow = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    cum = hist.select(
        "bucket", "c", F.coalesce(F.sum("c").over(ow), F.lit(0)).alias("off")
    )
    tot = d.agg(F.count(F.lit(1)).alias("n"))
    targets = (
        spark.createDataFrame(list(PCTL_TARGETS), "pname string, p double")
        .crossJoin(F.broadcast(tot))
        .select(
            "pname", "p", F.ceil(F.col("p") * F.col("n")).cast("long").alias("k")
        )
    )
    located = targets.join(
        F.broadcast(cum),
        (F.col("k") > F.col("off")) & (F.col("k") <= F.col("off") + F.col("c")),
    ).select("pname", "p", "k", "bucket", "off")
    wv = Window.partitionBy("pname").orderBy("v")
    exact = (
        d.join(F.broadcast(located), "bucket")
        .withColumn("rn", F.row_number().over(wv))
        .where(F.col("rn") == F.col("k") - F.col("off"))
        .select("pname", "p", "k", F.col("v").cast("double").alias("exact_value"))
    )
    # per-target bound check from the one-row rank frame
    checks = None
    for pname, _p in PCTL_TARGETS:
        row = ranks.select(
            F.lit(pname).alias("pname"),
            F.col("n"),
            F.col(f"lt_{pname}").alias("lt"),
            F.col(f"le_{pname}").alias("le"),
        )
        checks = row if checks is None else checks.unionByName(row)
    tol = F.ceil(F.col("n").cast("double") / APPROX_PCTL_ACCURACY).cast("long")
    return (
        exact.join(F.broadcast(checks), "pname")
        .select(
            "pname",
            "p",
            F.col("n").cast("long").alias("n"),
            "exact_value",
            tol.alias("rank_tolerance"),
            # the sketch value's rank interval must intersect
            # [k - tol, k + tol]
            (
                (F.col("lt") + 1 <= F.col("k") + tol)
                & (F.col("le") >= F.col("k") - tol)
            ).alias("within_bound"),
        )
    )


# ---------------------------------------------------------------------------
# Deterministic subsample-bootstrap confidence interval
# ---------------------------------------------------------------------------

BOOT_B = 40  # bootstrap replicates
BOOT_LO_K = 1  # ceil(0.025 * B): 2.5th percentile order statistic
BOOT_HI_K = 39  # ceil(0.975 * B)


def _boot_oracle() -> str:
    from ytspark.operators.text import SPLIT_MOD, knuth_hash_sql

    half = SPLIT_MOD // 2
    stats = ", ".join(
        f"ROUND(CAST(SUM(CASE WHEN {knuth_hash_sql(f'o_orderkey * 131 + {b}')}"
        f" < {half} THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE)"
        f" / SUM(CASE WHEN {knuth_hash_sql(f'o_orderkey * 131 + {b}')}"
        f" < {half} THEN 1 END), 6)"
        for b in range(1, BOOT_B + 1)
    )
    return f"""
WITH agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
         ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(*), 6) AS mean_full,
         LIST_SORT([{stats}]) AS reps
  FROM orders
)
SELECT n_orders,
       CAST({BOOT_B} AS BIGINT) AS n_replicates,
       mean_full,
       reps[{BOOT_LO_K}] AS ci_lo,
       reps[{BOOT_HI_K}] AS ci_hi,
       mean_full >= reps[{BOOT_LO_K}] AND mean_full <= reps[{BOOT_HI_K}]
         AS ci_contains_mean
FROM agg
"""


@register(
    "bootstrap_ci_revenue",
    oracle=_boot_oracle(),
    doc=f"DETERMINISTIC bootstrap confidence interval for mean order "
        f"value: {BOOT_B} half-subsample replicates (m-out-of-n "
        "bootstrap), each membership decided by the overflow-safe "
        "cross-engine Knuth hash of (orderkey*131 + replicate) — no "
        "RNG state, so retries/AQE re-execution and the DuckDB replay "
        "all see identical samples. The whole thing is ONE aggregate "
        f"pass: {2 * BOOT_B} conditional SUM/COUNT expressions with "
        "map-side combine — never a B-fold explode of the data, which "
        "is what makes resampling affordable at 100 TB (B x data "
        "replication is the naive shape). Replicate means are rounded "
        "then sorted INSIDE a one-row array (array_sort + "
        "element_at), so the percentile selection needs no window at "
        "all. Reports the 95% percentile-bootstrap interval and "
        "whether it brackets the full-sample mean.",
    tags=("statistics", "bootstrap", "profiling", "aggregate", "scale"),
)
def bootstrap_ci_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ytspark.operators.text import SPLIT_MOD, knuth_hash_col

    half = SPLIT_MOD // 2
    # r12 (guide §2.6 idle capacity, §2.3 project early): the orders
    # scan is one parquet split, so the 40-replicate hash-inclusion
    # aggregate (40 x |orders| Knuth-hash evaluations) ran in ONE
    # partial-agg task (measured 3.2-4.6 s at sf0.1). Project to the
    # two needed columns and spread the scan across the pool; the
    # replicate sums are decimal/long (exact, order-free), the divide
    # and round happen once in the merged result, so the output is
    # bit-identical.
    orders = (
        load_tables(spark, sf_dir, "orders")["orders"]
        .select("o_orderkey", "o_totalprice")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    v = F.col("o_totalprice").cast("decimal(18,2)")

    def incl(b: int):
        return knuth_hash_col(F.col("o_orderkey") * F.lit(131) + F.lit(b)) < half

    rep_means = [
        F.round(
            F.sum(F.when(incl(b), v)).cast("double")
            / F.sum(F.when(incl(b), F.lit(1))),
            6,
        )
        for b in range(1, BOOT_B + 1)
    ]
    agg = orders.agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum(v).cast("double") / F.count(F.lit(1)), 6).alias(
            "mean_full"
        ),
        F.array_sort(F.array(*rep_means)).alias("reps"),
    )
    return agg.select(
        F.col("n_orders").cast("long").alias("n_orders"),
        F.lit(BOOT_B).cast("long").alias("n_replicates"),
        "mean_full",
        F.element_at("reps", BOOT_LO_K).alias("ci_lo"),
        F.element_at("reps", BOOT_HI_K).alias("ci_hi"),
        (
            (F.col("mean_full") >= F.element_at("reps", BOOT_LO_K))
            & (F.col("mean_full") <= F.element_at("reps", BOOT_HI_K))
        ).alias("ci_contains_mean"),
    )


# ---------------------------------------------------------------------------
# Count overdispersion check: variance/mean ratio of daily event counts
# ---------------------------------------------------------------------------


@register(
    "count_overdispersion_check",
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_days,
       ROUND(AVG(c), 6) AS mean_daily,
       ROUND(GREATEST(AVG(c * c) - AVG(c) * AVG(c), 0)
             * COUNT(*) / (COUNT(*) - 1), 6) AS var_daily,
       ROUND(GREATEST(AVG(c * c) - AVG(c) * AVG(c), 0)
             * COUNT(*) / (COUNT(*) - 1) / AVG(c), 6) AS dispersion,
       GREATEST(AVG(c * c) - AVG(c) * AVG(c), 0)
         * COUNT(*) / (COUNT(*) - 1) / AVG(c) > 1.5 AS overdispersed
FROM daily
GROUP BY event_type
""",
    doc="OVERDISPERSION check for daily event counts: per event type, "
        "the sample variance/mean ratio (index of dispersion) of the "
        "daily-count series with a >1.5 flag — the screen that decides "
        "whether a count-model assumption (Poisson: dispersion = 1) "
        "holds before rates, anomaly thresholds, or A/B variance "
        "estimates are built on it; overdispersed streams need "
        "negative-binomial-width intervals, and this measures the "
        "need in-engine. Sample variance from the two-moment identity "
        "with the n/(n-1) correction and a float-cancellation guard; "
        "one rollup aggregate + one tiny per-type aggregate — counts "
        "exact, ratios exactly-rounded.",
    tags=("statistics", "profiling", "quality", "aggregate"),
)
def count_overdispersion_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    daily = ev.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).alias("c")
    )
    n = F.count(F.lit(1))
    var = (
        F.greatest(
            F.avg(F.col("c") * F.col("c")) - F.avg("c") * F.avg("c"),
            F.lit(0.0),
        )
        * n
        / (n - 1)
    )
    disp = var / F.avg("c")
    return daily.groupBy("event_type").agg(
        n.cast("long").alias("n_days"),
        F.round(F.avg("c"), 6).alias("mean_daily"),
        F.round(var, 6).alias("var_daily"),
        F.round(disp, 6).alias("dispersion"),
        (disp > 1.5).alias("overdispersed"),
    )


# ---------------------------------------------------------------------------
# Rare-category collapse: min-support bucketing for categorical features
# ---------------------------------------------------------------------------

RARE_MIN_FRAC = 0.039  # categories below this corpus share collapse


@register(
    "rare_category_collapse",
    oracle=f"""
WITH counts AS (
  SELECT c_nationkey AS cat, CAST(COUNT(*) AS BIGINT) AS n
  FROM customer GROUP BY 1
),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM counts),
mapped AS (
  SELECT CASE WHEN CAST(n AS DOUBLE) / t >= {RARE_MIN_FRAC}
              THEN CAST(cat AS VARCHAR) ELSE '__other__' END AS mapped_cat,
         n, CASE WHEN CAST(n AS DOUBLE) / t >= {RARE_MIN_FRAC}
                 THEN 0 ELSE 1 END AS collapsed
  FROM counts CROSS JOIN tot
)
SELECT mapped_cat,
       CAST(SUM(n) AS BIGINT) AS n_rows,
       CAST(COUNT(*) AS BIGINT) AS n_source_cats,
       CAST(MIN(collapsed) AS BIGINT) AS is_collapsed_bucket,
       ROUND(CAST(SUM(n) AS DOUBLE) / MIN(t), 6) AS frac
FROM mapped CROSS JOIN tot
GROUP BY mapped_cat
""",
    doc=f"RARE-CATEGORY COLLAPSE for categorical features: nation keys "
        f"whose corpus share falls below {RARE_MIN_FRAC:.1%} map to a "
        "single __other__ bucket — the standard cardinality control "
        "applied before one-hot/target encoding so tail categories "
        "cannot blow up feature width or leak single-row groups (the "
        "k-anonymity failure mode the audit flags). The report is the "
        "resulting category mapping with per-bucket row counts, how "
        "many source categories merged, and corpus fractions — the "
        "feature dictionary a training pipeline persists. One count "
        "aggregate + a broadcast one-row total; exact integers, "
        "exactly-rounded shares.",
    tags=("profiling", "features", "encoding", "aggregate"),
)
def rare_category_collapse(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_tables(spark, sf_dir, "customer")["customer"]
    counts = cust.groupBy(F.col("c_nationkey").alias("cat")).agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = counts.agg(F.sum("n").alias("t"))
    keep = F.col("n").cast("double") / F.col("t") >= RARE_MIN_FRAC
    mapped = counts.crossJoin(F.broadcast(tot)).select(
        F.when(keep, F.col("cat").cast("string"))
        .otherwise(F.lit("__other__"))
        .alias("mapped_cat"),
        "n",
        F.when(keep, F.lit(0)).otherwise(F.lit(1)).alias("collapsed"),
        "t",
    )
    return mapped.groupBy("mapped_cat").agg(
        F.sum("n").cast("long").alias("n_rows"),
        F.count(F.lit(1)).alias("n_source_cats"),
        F.min("collapsed").cast("long").alias("is_collapsed_bucket"),
        F.round(
            F.sum("n").cast("double") / F.min("t"), 6
        ).alias("frac"),
    )


# ---------------------------------------------------------------------------
# t-closeness audit: exact EMD between class and global sensitive dist.
# ---------------------------------------------------------------------------

TCLOSE_INV_T = 5  # certify t-closeness at t = 1/5 = 0.2


@register(
    "t_closeness_emd_audit",
    oracle=f"""
WITH q AS (
  SELECT c_nationkey AS nation, c_mktsegment AS segment,
         CASE WHEN c_acctbal < 0 THEN 0
              WHEN c_acctbal < 5000 THEN 1
              ELSE 2 END AS tier
  FROM customer
),
cls AS (
  SELECT nation, segment, COUNT(*) AS n,
         SUM(CASE WHEN tier <= 0 THEN 1 ELSE 0 END) AS c1,
         SUM(CASE WHEN tier <= 1 THEN 1 ELSE 0 END) AS c2
  FROM q GROUP BY nation, segment
),
tot AS (
  SELECT COUNT(*) AS nn,
         SUM(CASE WHEN tier <= 0 THEN 1 ELSE 0 END) AS g1,
         SUM(CASE WHEN tier <= 1 THEN 1 ELSE 0 END) AS g2
  FROM q
)
SELECT CAST(nation AS BIGINT) AS nation, segment,
       CAST(n AS BIGINT) AS class_size,
       CAST(ABS(c1 * nn - g1 * n) + ABS(c2 * nn - g2 * n) AS BIGINT)
         AS emd_num,
       CAST(2 * n * nn AS BIGINT) AS emd_den,
       {TCLOSE_INV_T} * (ABS(c1 * nn - g1 * n) + ABS(c2 * nn - g2 * n))
         <= 2 * n * nn AS t_close
FROM cls CROSS JOIN tot
""",
    doc="T-CLOSENESS privacy audit — the third rung of the "
        "de-identification ladder after k-anonymity and l-diversity "
        "(both in `k_anonymity_audit`): a class can be large AND "
        "diverse yet still leak because its sensitive DISTRIBUTION "
        "differs from the table's. For the ordered account-balance "
        "tiers (delinquent < standard < premium) the right distance "
        "is the Earth Mover's Distance, which for ordered categories "
        "is the mean |cumulative-share difference|. Computed EXACTLY "
        "in integers: with class cumulative counts C_i (size n) and "
        "global G_i (size N), EMD = (|C1*N-G1*n| + |C2*N-G2*n|) / "
        "(2*n*N) — emitted as numerator/denominator BIGINTs so the "
        "cross-engine hash has no float rounding to disagree on, and "
        f"the t <= 1/{TCLOSE_INV_T} verdict is the integer comparison "
        f"{TCLOSE_INV_T}*num <= den. Scale: one groupBy to |QI| rows "
        "+ one global aggregate broadcast as a single row — a scan "
        "and a map-side join at 100 TB. (BIGINT n*N overflows past "
        "~3e9 rows; promote to DECIMAL(38,0) there.)",
    tags=("profiling", "privacy", "statistics", "aggregate"),
)
def t_closeness_emd_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_tables(spark, sf_dir, "customer")["customer"]
    q = cust.select(
        F.col("c_nationkey").cast("long").alias("nation"),
        F.col("c_mktsegment").alias("segment"),
        F.when(F.col("c_acctbal") < 0, F.lit(0))
        .when(F.col("c_acctbal") < 5000, F.lit(1))
        .otherwise(F.lit(2))
        .alias("tier"),
    )
    cls = q.groupBy("nation", "segment").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("tier") <= 0).cast("long")).alias("c1"),
        F.sum((F.col("tier") <= 1).cast("long")).alias("c2"),
    )
    glob = q.agg(
        F.count(F.lit(1)).alias("nn"),
        F.sum((F.col("tier") <= 0).cast("long")).alias("g1"),
        F.sum((F.col("tier") <= 1).cast("long")).alias("g2"),
    )
    # one-row global distribution: broadcast cross join is a map-side
    # enrich, never a shuffle (audit-allowlisted scalar pattern)
    num = F.abs(F.col("c1") * F.col("nn") - F.col("g1") * F.col("n")) + F.abs(
        F.col("c2") * F.col("nn") - F.col("g2") * F.col("n")
    )
    den = F.lit(2) * F.col("n") * F.col("nn")
    return cls.crossJoin(F.broadcast(glob)).select(
        "nation",
        "segment",
        F.col("n").cast("long").alias("class_size"),
        num.cast("long").alias("emd_num"),
        den.cast("long").alias("emd_den"),
        (F.lit(TCLOSE_INV_T) * num <= den).alias("t_close"),
    )


# ---------------------------------------------------------------------------
# Cross-source quantile normalization map (exact two-pass order stats)
# ---------------------------------------------------------------------------

QNORM_TARGETS = (
    ("p10", 0.10),
    ("p25", 0.25),
    ("p50", 0.50),
    ("p75", 0.75),
    ("p90", 0.90),
)
QNORM_BUCKET = 50  # n_chars histogram bucket width
QNORM_ALL = "__all__"

_QNORM_TARGET_SQL = ", ".join(f"('{n}', {p})" for n, p in QNORM_TARGETS)


@register(
    "quantile_normalize_sources",
    oracle=f"""
WITH d AS (SELECT source, n_chars AS v FROM documents),
a AS (
  SELECT source, v FROM d
  UNION ALL SELECT '{QNORM_ALL}' AS source, v FROM d
),
n AS (SELECT source, COUNT(*) AS n FROM a GROUP BY source),
t(pname, p) AS (VALUES {_QNORM_TARGET_SQL}),
k AS (
  SELECT source, pname, p, CAST(CEIL(p * n) AS BIGINT) AS k
  FROM n CROSS JOIN t
),
r AS (
  SELECT source, v,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY v) AS rn
  FROM a
),
q AS (
  SELECT k.source, k.pname, k.p, k.k, r.v
  FROM k JOIN r ON r.source = k.source AND r.rn = k.k
)
SELECT q.source, q.pname, q.p, q.k AS k_source,
       CAST(q.v AS BIGINT) AS source_value,
       CAST(pool.v AS BIGINT) AS pooled_value,
       CAST(pool.v - q.v AS BIGINT) AS shift
FROM q JOIN q AS pool ON pool.source = '{QNORM_ALL}'
                     AND pool.pname = q.pname
WHERE q.source <> '{QNORM_ALL}'
""",
    doc="CROSS-SOURCE QUANTILE-NORMALIZATION MAP — the calibration "
        "table a corpus-mixing pipeline needs before it can compare "
        "per-source quality/length scores on one scale: for each "
        "source and each target percentile, the source's EXACT "
        "order-statistic value next to the POOLED corpus's value at "
        "the same percentile (and their shift). Remapping a row is "
        "then a broadcast lookup: within-source value -> within-"
        "source percentile -> pooled value. Exactness comes from the "
        "repo's two-pass distributed selection (no global sort): one "
        "histogram aggregate per (source, bucket), cumulative offsets "
        "over each source's tiny bucket list, and a rank pass over "
        "only the located target buckets, all windows PARTITIONED by "
        "source — the pooled distribution rides along as one synthetic "
        f"'{QNORM_ALL}' group (its rank pass touches ~|targets|/width "
        "of the data, the disclosed pooled-selection cost). Output is "
        "|sources| x |targets| rows — a broadcastable mapping table "
        "regardless of corpus size. All-integer output hashes "
        "bit-identically; k = ceil(p*n) makes ties deterministic "
        "under any tiebreak. Oracle: the naive per-group full-sort "
        "ROW_NUMBER definition.",
    tags=("profiling", "percentile", "scale", "statistics", "text"),
)
def quantile_normalize_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    d0 = docs.select("source", F.col("n_chars").alias("v"))
    d = d0.unionByName(
        d0.select(F.lit(QNORM_ALL).alias("source"), "v")
    ).withColumn(
        "bucket", F.floor(F.col("v") / F.lit(QNORM_BUCKET)).cast("long")
    )
    hist = d.groupBy("source", "bucket").agg(F.count(F.lit(1)).alias("c"))
    ow = (
        Window.partitionBy("source")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = hist.select(
        "source",
        "bucket",
        "c",
        F.coalesce(F.sum("c").over(ow), F.lit(0)).alias("off"),
    )
    n = d.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    targets = (
        n.crossJoin(
            F.broadcast(
                spark.createDataFrame(
                    list(QNORM_TARGETS), "pname string, p double"
                )
            )
        ).select(
            "source",
            "pname",
            "p",
            F.ceil(F.col("p") * F.col("n")).cast("long").alias("k"),
        )
    )
    located = targets.join(
        cum,
        (targets.source == cum.source)
        & (F.col("k") > F.col("off"))
        & (F.col("k") <= F.col("off") + F.col("c")),
    ).select(targets.source, "pname", "p", "k", "bucket", "off")
    wv = Window.partitionBy("source", "pname").orderBy("v")
    q = (
        d.join(located, ["source", "bucket"])
        .withColumn("rn", F.row_number().over(wv))
        .where(F.col("rn") == F.col("k") - F.col("off"))
        .select("source", "pname", "p", "k", "v")
    )
    pool = q.where(F.col("source") == QNORM_ALL).select(
        F.col("pname").alias("pp"), F.col("v").alias("pooled_value")
    )
    return (
        q.where(F.col("source") != QNORM_ALL)
        .join(F.broadcast(pool), F.col("pname") == F.col("pp"))
        .select(
            "source",
            "pname",
            "p",
            F.col("k").alias("k_source"),
            F.col("v").cast("long").alias("source_value"),
            F.col("pooled_value").cast("long").alias("pooled_value"),
            (F.col("pooled_value") - F.col("v")).cast("long").alias("shift"),
        )
    )


@register(
    "quantile_normalize_apply",
    oracle=f"""
WITH d AS (
  SELECT doc_id, source, n_chars AS v,
         PERCENT_RANK() OVER (PARTITION BY source
                              ORDER BY n_chars, doc_id) AS pr
  FROM documents
),
pooled AS (
  SELECT n_chars AS v,
         ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) AS rn,
         COUNT(*) OVER () AS n
  FROM documents
),
grid AS (
  SELECT CAST(g AS BIGINT) AS g, v AS pooled_value
  FROM (SELECT UNNEST(RANGE(0, 101)) AS g)
  JOIN pooled
    ON rn = GREATEST(1, CAST(CEIL(g / 100.0 * n) AS BIGINT))
)
SELECT d.doc_id, d.source, CAST(d.v AS BIGINT) AS n_chars,
       CAST(ROUND(d.pr * 100) AS BIGINT) AS grid_pct,
       CAST(grid.pooled_value AS BIGINT) AS normalized
FROM d JOIN grid ON grid.g = CAST(ROUND(d.pr * 100) AS BIGINT)
""",
    doc="APPLY step of cross-source quantile normalization — the "
        "row-level companion of quantile_normalize_sources' mapping "
        "table: every document's length is replaced by the POOLED "
        "corpus value at the document's within-source percentile "
        "(percent_rank with a doc_id tiebreak, snapped to a 0..100 "
        "grid), so after the transform every source's distribution "
        "is the pooled one and per-source quality thresholds become "
        "comparable. The pooled quantile function is evaluated once "
        "at the 101 grid points — the exact k = max(1, ceil(p*N))-th "
        "order statistic — and joined back BROADCAST, so the "
        "data-sized work is one partitioned rank window (by source) "
        "plus a map-side lookup; the pooled 101-point grid is the "
        "only global structure and is O(1). (The grid build here "
        "ranks the pooled table directly — at 100 TB you'd swap that "
        "one step for the two-pass bucket selection the mapping-"
        "table query uses; the apply join is unchanged.) All-integer "
        "output: doc, source, raw value, grid percentile, normalized "
        "value.",
    tags=("profiling", "percentile", "text", "join"),
)
def quantile_normalize_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    ws = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    d = docs.select(
        "doc_id",
        "source",
        F.col("n_chars").alias("v"),
        F.percent_rank().over(ws).alias("pr"),
    )
    # pooled order statistics at the 101 grid points (global rank over
    # the pooled table — see docstring for the 100 TB two-pass swap;
    # EXPECTED_GLOBAL_WINDOW carries the justification)
    wp = Window.orderBy("n_chars", "doc_id")
    pooled = docs.select(
        F.col("n_chars").alias("pv"), F.row_number().over(wp).alias("rn")
    ).crossJoin(F.broadcast(docs.agg(F.count(F.lit(1)).alias("n"))))
    grid = (
        spark.range(101)
        .select(F.col("id").cast("long").alias("g"))
        .join(
            pooled,
            F.col("rn")
            == F.greatest(
                F.lit(1),
                F.ceil(F.col("g") / 100.0 * F.col("n")).cast("long"),
            ),
        )
        .select("g", F.col("pv").alias("normalized"))
    )
    return d.select(
        "doc_id",
        "source",
        F.col("v").cast("long").alias("n_chars"),
        F.round(F.col("pr") * 100).cast("long").alias("grid_pct"),
    ).join(F.broadcast(grid), F.col("grid_pct") == F.col("g")).select(
        "doc_id",
        "source",
        "n_chars",
        "grid_pct",
        F.col("normalized").cast("long").alias("normalized"),
    )


# ---------------------------------------------------------------------------
# Distribution-free median confidence interval via order statistics
# ---------------------------------------------------------------------------

MEDCI_Z = "1.959964"  # two-sided 95% normal quantile (shared text)


@register(
    "grouped_median_ci_order_stats",
    oracle=f"""
WITH r AS (
  SELECT c_nationkey AS nation,
         CAST(c_acctbal AS DECIMAL(18,2)) AS bal,
         ROW_NUMBER() OVER (
           PARTITION BY c_nationkey
           ORDER BY CAST(c_acctbal AS DECIMAL(18,2)), c_custkey
         ) AS rn,
         COUNT(*) OVER (PARTITION BY c_nationkey) AS n
  FROM customer
),
b AS (
  SELECT nation, bal, rn, n,
         (n + 1) // 2 AS med_rank,
         GREATEST(CAST(FLOOR((n - {MEDCI_Z} * SQRT(n)) / 2) AS BIGINT), 1)
           AS lo_rank,
         LEAST(CAST(CEIL((n + {MEDCI_Z} * SQRT(n)) / 2 + 1) AS BIGINT), n)
           AS hi_rank
  FROM r
)
SELECT CAST(nation AS BIGINT) AS nation,
       CAST(MAX(n) AS BIGINT) AS n,
       CAST(MAX(CASE WHEN rn = med_rank THEN bal END) AS DOUBLE)
         AS median_lower,
       CAST(MAX(CASE WHEN rn = lo_rank THEN bal END) AS DOUBLE) AS ci_lo,
       CAST(MAX(CASE WHEN rn = hi_rank THEN bal END) AS DOUBLE) AS ci_hi
FROM b GROUP BY nation
""",
    doc="DISTRIBUTION-FREE median confidence interval per nation — "
        "the order-statistic (sign-test inversion) CI every robust "
        "reporting pipeline should attach to a median instead of a "
        "normal-theory stderr: with ranks from ONE partitioned sort, "
        "the 95% bounds are simply the values at ranks "
        "floor((n - z*sqrt(n))/2) and ceil((n + z*sqrt(n))/2 + 1) "
        "(normal approximation to the binomial(n, 1/2) rank "
        "distribution, clamped to [1, n]), and the point estimate is "
        "the exact lower median at rank (n+1)//2. No resampling: "
        "where bootstrap_ci_revenue pays B conditional folds for a "
        "mean CI, the median CI is CLOSED FORM in the ranks. Scale: "
        "one nation-partitioned window (rank + count), one grouped "
        "conditional aggregate — rank selection never leaves the "
        "group's partition. DECIMAL-exact values; the only doubles "
        "are the rank cutoffs, computed from the identical "
        "expression text on both engines (integer n, so sqrt/floor "
        "agree to the ulp).",
    tags=("statistics", "profiling", "window", "aggregate"),
)
def grouped_median_ci_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    cust = load_tables(spark, sf_dir, "customer")["customer"]
    base = cust.select(
        F.col("c_nationkey").cast("long").alias("nation"),
        F.col("c_acctbal").cast("decimal(18,2)").alias("bal"),
        F.col("c_custkey").alias("ck"),
    )
    wq = Window.partitionBy("nation").orderBy("bal", "ck")
    wn = Window.partitionBy("nation")
    z = MEDCI_Z
    r = base.select(
        "nation",
        "bal",
        F.row_number().over(wq).cast("long").alias("rn"),
        F.count(F.lit(1)).over(wn).cast("long").alias("n"),
    ).selectExpr(
        "nation",
        "bal",
        "rn",
        "n",
        "(n + 1) div 2 AS med_rank",
        f"GREATEST(CAST(FLOOR((n - {z} * SQRT(n)) / 2) AS BIGINT), 1)"
        " AS lo_rank",
        f"LEAST(CAST(CEIL((n + {z} * SQRT(n)) / 2 + 1) AS BIGINT), n)"
        " AS hi_rank",
    )
    return r.groupBy("nation").agg(
        F.max("n").cast("long").alias("n"),
        F.max(F.when(F.col("rn") == F.col("med_rank"), F.col("bal")))
        .cast("double")
        .alias("median_lower"),
        F.max(F.when(F.col("rn") == F.col("lo_rank"), F.col("bal")))
        .cast("double")
        .alias("ci_lo"),
        F.max(F.when(F.col("rn") == F.col("hi_rank"), F.col("bal")))
        .cast("double")
        .alias("ci_hi"),
    )


# ---------------------------------------------------------------------------
# Candidate-key discovery (uniqueness profiling over column combos)
# ---------------------------------------------------------------------------

CKEY_COMBOS = (
    ("o_orderkey",),
    ("o_custkey",),
    ("o_orderdate",),
    ("o_custkey", "o_orderdate"),
    ("o_custkey", "o_orderdate", "o_totalprice"),
)


@register(
    "candidate_key_profile",
    oracle="\nUNION ALL\n".join(
        f"""SELECT '{"+".join(c)}' AS combo,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT ({", ".join(c) if len(c) > 1 else c[0]})) AS BIGINT)
         AS n_distinct,
       COUNT(*) = COUNT(DISTINCT ({", ".join(c) if len(c) > 1 else c[0]}))
         AS is_unique,
       ROUND(COUNT(DISTINCT ({", ".join(c) if len(c) > 1 else c[0]})) * 1.0
             / COUNT(*), 6) AS uniqueness
FROM orders"""
        for c in CKEY_COMBOS
    ),
    doc="CANDIDATE-KEY DISCOVERY — uniqueness profiling of column "
        "combinations, the schema-inference companion to functional-"
        "dependency discovery (fd_discovery_profile finds value "
        "IMPLICATIONS; this finds IDENTITY): for each candidate "
        "combo, exact row count, distinct count, uniqueness ratio, "
        "and the is-key verdict. This is what a cataloging pipeline "
        "runs before choosing merge keys, bucketing columns, or CDC "
        "primary keys. Each combo is one count-distinct aggregate "
        "over a single scan (Spark computes them as a union of "
        "grouped aggregates; at 100 TB the distinct counts can "
        "downgrade to the certified KMV/HLL sketches with the same "
        "output contract).",
    tags=("profiling", "quality", "aggregate"),
)
def candidate_key_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir, "orders")["orders"]
    outs = []
    for combo in CKEY_COMBOS:
        cols = (
            F.struct(*[F.col(c) for c in combo]) if len(combo) > 1
            else F.col(combo[0])
        )
        outs.append(
            orders.agg(
                F.lit("+".join(combo)).alias("combo"),
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.count_distinct(cols).cast("long").alias("n_distinct"),
                (
                    F.count(F.lit(1)) == F.count_distinct(cols)
                ).alias("is_unique"),
                F.round(
                    F.count_distinct(cols) * 1.0 / F.count(F.lit(1)), 6
                ).alias("uniqueness"),
            )
        )
    out = outs[0]
    for df in outs[1:]:
        out = out.unionByName(df)
    return out


# ---------------------------------------------------------------------------
# Welch's unequal-variance t-test across segments
# ---------------------------------------------------------------------------


@register(
    "welch_ttest_segments",
    oracle="""
WITH s AS (
  SELECT CASE WHEN c_mktsegment = 'BUILDING' THEN 'a' ELSE 'b' END AS grp,
         CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS x
  FROM customer
),
m AS (
  SELECT grp,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(x AS DECIMAL(18,2)) * CAST(x AS DECIMAL(18,2)))
              AS DOUBLE) AS sxx
  FROM s GROUP BY grp
),
w AS (
  SELECT a.n AS na, b.n AS nb,
         a.sx / a.n AS ma, b.sx / b.n AS mb,
         (a.sxx - a.sx * a.sx / a.n) / (a.n - 1) AS va,
         (b.sxx - b.sx * b.sx / b.n) / (b.n - 1) AS vb
  FROM (SELECT * FROM m WHERE grp = 'a') a
  CROSS JOIN (SELECT * FROM m WHERE grp = 'b') b
)
SELECT CAST(na AS BIGINT) AS n_building,
       CAST(nb AS BIGINT) AS n_rest,
       ROUND(ma - mb, 6) AS mean_diff,
       ROUND((ma - mb) / SQRT(va / na + vb / nb), 6) AS t_stat,
       ROUND(POW(va / na + vb / nb, 2)
             / (POW(va / na, 2) / (na - 1) + POW(vb / nb, 2) / (nb - 1)),
             2) AS welch_dof
FROM w
""",
    doc="WELCH'S UNEQUAL-VARIANCE t-TEST — the parametric mean-shift "
        "test completing the two-sample battery (z-test assumes "
        "pooled proportions, Mann-Whitney is rank-based; Welch is "
        "the default recommendation for continuous outcomes with "
        "unequal variances): BUILDING-segment balances vs the rest, "
        "with the t statistic and the Welch-Satterthwaite effective "
        "degrees of freedom, all derived from ONE conditional "
        "aggregate of exact DECIMAL power sums (the same "
        "bit-reproducible moment trick as the regression family) — "
        "one scan at any scale, two 1-row sides cross-joined. "
        "Statistics round at 6 dp (dof at 2) over identical "
        "expression text.",
    tags=("statistics", "profiling", "aggregate", "experiment"),
)
def welch_ttest_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_tables(spark, sf_dir, "customer")["customer"]
    s = cust.select(
        F.when(F.col("c_mktsegment") == "BUILDING", "a")
        .otherwise("b")
        .alias("grp"),
        F.col("c_acctbal").cast("decimal(18,2)").alias("x"),
    )
    m = s.groupBy("grp").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
    )
    a = m.where(F.col("grp") == "a").select(
        F.col("n").alias("na"), F.col("sx").alias("sxa"), F.col("sxx").alias("sxxa")
    )
    b = m.where(F.col("grp") == "b").select(
        F.col("n").alias("nb"), F.col("sx").alias("sxb"), F.col("sxx").alias("sxxb")
    )
    w = a.crossJoin(F.broadcast(b)).select(
        "na",
        "nb",
        (F.col("sxa") / F.col("na")).alias("ma"),
        (F.col("sxb") / F.col("nb")).alias("mb"),
        (
            (F.col("sxxa") - F.col("sxa") * F.col("sxa") / F.col("na"))
            / (F.col("na") - 1)
        ).alias("va"),
        (
            (F.col("sxxb") - F.col("sxb") * F.col("sxb") / F.col("nb"))
            / (F.col("nb") - 1)
        ).alias("vb"),
    )
    se2 = F.col("va") / F.col("na") + F.col("vb") / F.col("nb")
    return w.select(
        F.col("na").cast("long").alias("n_building"),
        F.col("nb").cast("long").alias("n_rest"),
        F.round(F.col("ma") - F.col("mb"), 6).alias("mean_diff"),
        F.round((F.col("ma") - F.col("mb")) / F.sqrt(se2), 6).alias("t_stat"),
        F.round(
            F.pow(se2, 2)
            / (
                F.pow(F.col("va") / F.col("na"), 2) / (F.col("na") - 1)
                + F.pow(F.col("vb") / F.col("nb"), 2) / (F.col("nb") - 1)
            ),
            2,
        ).alias("welch_dof"),
    )


# ---------------------------------------------------------------------------
# Inclusion-dependency discovery (foreign-key profiling across tables)
# ---------------------------------------------------------------------------

# candidate (child table.column  REFERENCES  parent table.column) pairs:
# the true TPC-H foreign keys, the partial events->customer link, and a
# deliberate negative control that containment must reject.
IND_CANDIDATES = (
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
    ("events", "user_id", "customer", "c_custkey"),
    ("orders", "o_orderkey", "customer", "c_custkey"),  # negative control
)


@register(
    "inclusion_dependency_profile",
    oracle="\nUNION ALL\n".join(
        f"""
SELECT '{ct}.{cc}' AS child, '{pt}.{pc}' AS parent,
       CAST((SELECT COUNT(DISTINCT {cc}) FROM {ct}) AS BIGINT)
         AS n_child_distinct,
       CAST((SELECT COUNT(*) FROM (
              SELECT DISTINCT {cc} FROM {ct} WHERE {cc} IS NOT NULL) c
             WHERE NOT EXISTS (
              SELECT 1 FROM {pt} p WHERE p.{pc} = c.{cc})) AS BIGINT)
         AS n_violations,
       ROUND(1.0 - CAST((SELECT COUNT(*) FROM (
              SELECT DISTINCT {cc} FROM {ct} WHERE {cc} IS NOT NULL) c
             WHERE NOT EXISTS (
              SELECT 1 FROM {pt} p WHERE p.{pc} = c.{cc})) AS DOUBLE)
             / (SELECT COUNT(DISTINCT {cc}) FROM {ct}), 6) AS containment,
       (SELECT COUNT(*) FROM (
              SELECT DISTINCT {cc} FROM {ct} WHERE {cc} IS NOT NULL) c
             WHERE NOT EXISTS (
              SELECT 1 FROM {pt} p WHERE p.{pc} = c.{cc})) = 0
         AS is_inclusion
""".strip()
        for ct, cc, pt, pc in IND_CANDIDATES
    ),
    doc="INCLUSION-DEPENDENCY discovery — the cross-table half of "
        "schema profiling (candidate_key_profile finds the keys, this "
        "finds the FOREIGN keys): for each candidate child->parent "
        "column pair, the distinct child values not present in the "
        "parent (left ANTI join on the deduplicated child side), the "
        "containment fraction, and the inclusion verdict. The battery "
        "covers every true TPC-H FK, the deliberately-partial "
        "events.user_id->customer link, and a negative control "
        "(orderkey in custkey) that must reject. Scale: each pair "
        "costs one distinct on the child column (map-side "
        "combinable, shrinking the anti-join probe to key "
        "cardinality) + one anti join on the parent key — the "
        "dimension side broadcasts when small, and the verdict "
        "short-circuits at the first violation only in the SQL "
        "formulation; the engine computes the full count because the "
        "profiler WANTS the violation magnitude (1 missing key vs a "
        "disjoint column).",
    tags=("profiling", "quality", "join", "aggregate"),
)
def inclusion_dependency_profile(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    tables = load_tables(
        spark, sf_dir, *sorted({t for c in IND_CANDIDATES for t in (c[0], c[2])})
    )
    outs = []
    for ct, cc, pt, pc in IND_CANDIDATES:
        child = (
            tables[ct].where(F.col(cc).isNotNull()).select(cc).distinct()
        )
        parent = tables[pt].select(F.col(pc).alias(cc)).distinct()
        viol = child.join(parent, cc, "left_anti").agg(
            F.count(F.lit(1)).alias("n_violations")
        )
        nd = child.agg(F.count(F.lit(1)).alias("n_child_distinct"))
        outs.append(
            nd.crossJoin(F.broadcast(viol)).select(
                F.lit(f"{ct}.{cc}").alias("child"),
                F.lit(f"{pt}.{pc}").alias("parent"),
                F.col("n_child_distinct").cast("long"),
                F.col("n_violations").cast("long"),
                F.round(
                    1.0
                    - F.col("n_violations").cast("double")
                    / F.col("n_child_distinct"),
                    6,
                ).alias("containment"),
                (F.col("n_violations") == 0).alias("is_inclusion"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


# ---------------------------------------------------------------------------
# Simpson's-paradox audit (pooled vs per-stratum slope reversal)
# ---------------------------------------------------------------------------

_SLOPE = (
    "(n * sxy - sx * sy) / (n * sxx - sx * sx)"
)


@register(
    "simpson_paradox_audit",
    oracle=f"""
WITH d AS (
  SELECT l_returnflag AS grp,
         CAST(l_quantity AS DECIMAL(18,2)) AS x,
         CAST(l_extendedprice AS DECIMAL(18,2)) AS y
  FROM lineitem
),
per AS (
  SELECT grp, CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
         CAST(SUM(x * x) AS DOUBLE) AS sxx,
         CAST(SUM(x * y) AS DOUBLE) AS sxy
  FROM d GROUP BY grp
),
pooled AS (
  SELECT SUM(n) AS n, SUM(sx) AS sx, SUM(sy) AS sy,
         SUM(sxx) AS sxx, SUM(sxy) AS sxy
  FROM per
),
ps AS (SELECT {_SLOPE} AS pooled_slope FROM pooled)
SELECT grp,
       CAST(n AS BIGINT) AS n,
       ROUND({_SLOPE}, 6) AS group_slope,
       ROUND(pooled_slope, 6) AS pooled_slope,
       SIGN({_SLOPE}) <> SIGN(pooled_slope) AS sign_reversal
FROM per CROSS JOIN ps
""",
    doc="SIMPSON'S-PARADOX audit — the aggregation-bias probe every "
        "metrics platform needs before trusting a pooled trend: the "
        "OLS slope of extended price on quantity is fit pooled AND "
        "per return-flag stratum from the same exact-DECIMAL "
        "sufficient statistics (the regression_normal_equations "
        "five-sum shape, grouped), and each stratum is flagged when "
        "its slope sign CONTRADICTS the pooled sign — the textbook "
        "reversal that means the pooled number answers the wrong "
        "question. The pooled moments are the SUM of the per-group "
        "moments (additivity of sufficient statistics — no second "
        "scan). Scale: one map-side-combinable grouped aggregate; "
        "everything downstream is arithmetic over |strata| rows.",
    tags=("profiling", "statistics", "quality", "aggregate"),
)
def simpson_paradox_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    d = li.select(
        F.col("l_returnflag").alias("grp"),
        F.col("l_quantity").cast("decimal(18,2)").alias("x"),
        F.col("l_extendedprice").cast("decimal(18,2)").alias("y"),
    )
    per = d.groupBy("grp").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
    ).localCheckpoint(eager=True)
    pooled = per.agg(
        F.sum("n").alias("n"),
        F.sum("sx").alias("sx"),
        F.sum("sy").alias("sy"),
        F.sum("sxx").alias("sxx"),
        F.sum("sxy").alias("sxy"),
    )
    slope = (
        F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    ) / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
    ps = pooled.select(slope.alias("pooled_slope"))
    return per.crossJoin(F.broadcast(ps)).select(
        "grp",
        F.col("n").cast("long").alias("n"),
        F.round(slope, 6).alias("group_slope"),
        F.round("pooled_slope", 6).alias("pooled_slope"),
        (F.signum(slope) != F.signum(F.col("pooled_slope"))).alias(
            "sign_reversal"
        ),
    )


# ---------------------------------------------------------------------------
# V-optimal histogram (DP over the day spine — optimizer statistics)
# ---------------------------------------------------------------------------

VOPT_B = 4  # histogram buckets

# r8 env-invariance rework (r7 driver hash mismatch): the DP argmin
# ranked RAW double costs, and FMA contraction / evaluation-order
# differences between builds can flip a near-tie, silently moving a
# cut. The comparison key is now FLOOR(1e6 * cost / total_SS) — a
# BIGINT quantization whose grain (1e-6 relative) is ~1e10x the ulp
# noise — with ties broken on the smaller cut index, so both engines
# pick identical cuts. Outputs are integer-exact from DECIMAL cents
# prefix sums (the old ROUND(sse, 2) rounded a ~1e17 double whose
# cross-build ulp is ~16 — far coarser than the 0.01 grain).


def _vopt_level_cte(name: str, prev: str, min_j: int) -> str:
    """One DP level as a DuckDB CTE: extend every level-(b-1) state
    by a segment (s, j], ranking candidates by the quantized key."""
    seg = (
        "(pj.p2d - ps.p2d) - (pj.p1d - ps.p1d) * (pj.p1d - ps.p1d)"
        " / (pj.td - ps.td)"
    )
    return f"""
{name} AS (
  SELECT j, cost, path FROM (
    SELECT pj.t AS j,
           s.cost + {seg} AS cost,
           s.path || ',' || s.j AS path,
           ROW_NUMBER() OVER (PARTITION BY pj.t ORDER BY
             CAST(FLOOR((s.cost + {seg}) / ssv.v
                        * CAST(1000000 AS DOUBLE)) AS BIGINT), s.j) AS rk
    FROM {prev} s JOIN pred ps ON ps.t = s.j
    JOIN pred pj ON pj.t > s.j AND s.j >= {min_j}
    CROSS JOIN ss ssv
  ) WHERE rk = 1
)"""


@register(
    "vopt_histogram_weekly_revenue",
    oracle=f"""
WITH weekly AS (
  SELECT CAST(DATE_TRUNC('week', CAST(o_orderdate AS DATE)) AS DATE) AS wk,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100
              AS DECIMAL(18,0)) AS xc
  FROM orders GROUP BY 1
),
idx AS (
  SELECT wk, xc, ROW_NUMBER() OVER (ORDER BY wk) AS t FROM weekly
),
pre AS (
  SELECT t, wk,
         CAST(SUM(xc) OVER (ORDER BY t) AS DECIMAL(38,0)) AS p1,
         CAST(SUM(CAST(xc AS DECIMAL(19,0)) * CAST(xc AS DECIMAL(19,0)))
              OVER (ORDER BY t) AS DECIMAL(38,0)) AS p2
  FROM idx
),
pred AS (
  SELECT t, wk, p1, p2,
         CAST(p1 AS DOUBLE) AS p1d, CAST(p2 AS DOUBLE) AS p2d,
         CAST(t AS DOUBLE) AS td
  FROM pre
),
ss AS (
  SELECT CASE WHEN s0 <= 0 THEN CAST(1 AS DOUBLE) ELSE s0 END AS v
  FROM (SELECT p2d - p1d * p1d / td AS s0 FROM pred
        WHERE t = (SELECT MAX(t) FROM pred))
),
c1 AS (
  SELECT t AS j, p2d - p1d * p1d / td AS cost, '' AS path FROM pred
),{_vopt_level_cte("c2", "c1", 1)},{_vopt_level_cte("c3", "c2", 2)},{_vopt_level_cte("c4", "c3", 3)},
fin AS (
  SELECT path || ',' || j AS cuts FROM c4
  WHERE j = (SELECT MAX(t) FROM pred)
),
bounds AS (
  SELECT CAST(b.sp AS BIGINT) AS end_t,
         ROW_NUMBER() OVER (ORDER BY CAST(b.sp AS BIGINT)) AS bucket
  FROM fin, UNNEST(STRING_SPLIT(SUBSTR(fin.cuts, 2), ',')) AS b(sp)
),
seg AS (
  SELECT bucket, end_t,
         COALESCE(LAG(end_t) OVER (ORDER BY bucket), 0) + 1 AS start_t
  FROM bounds
)
SELECT s.bucket,
       STRFTIME(pa.wk, '%Y-%m-%d') AS start_week,
       STRFTIME(pb.wk, '%Y-%m-%d') AS end_week,
       CAST(s.end_t - s.start_t + 1 AS BIGINT) AS n_weeks,
       CAST(pb.p1 - COALESCE(pa2.p1, 0) AS BIGINT) AS sum_cents,
       CAST(
         CAST(CAST(s.end_t - s.start_t + 1 AS DECIMAL(4,0))
              * CAST(pb.p2 - COALESCE(pa2.p2, 0) AS DECIMAL(34,0))
              AS DECIMAL(37,0))
         - CAST(CAST(pb.p1 - COALESCE(pa2.p1, 0) AS DECIMAL(19,0))
                * CAST(pb.p1 - COALESCE(pa2.p1, 0) AS DECIMAL(19,0))
                AS DECIMAL(37,0))
         AS VARCHAR) AS sse_num_cents2
FROM seg s
JOIN pred pa ON pa.t = s.start_t
JOIN pred pb ON pb.t = s.end_t
LEFT JOIN pred pa2 ON pa2.t = s.start_t - 1
""",
    doc=f"V-OPTIMAL HISTOGRAM over weekly revenue, {VOPT_B} buckets — "
        f"the variance-minimal segmentation query optimizers build "
        f"their statistics from (Jagadish et al. 1998, VLDB — "
        f"public) and the changepoint story's exact counterpart "
        f"(CUSUM finds ONE shift, Kleinberg labels episodes, V-opt "
        f"finds the GLOBALLY optimal {VOPT_B}-piece constant fit): "
        f"DP c_b(j) = min_s c_(b-1)(s) + SSE(s+1, j), with O(1) "
        f"segment SSE from cumulative prefix sums. The engine runs "
        f"each DP level as a bounded s<j pair join over the "
        f"calendar-bounded WEEKLY spine (~350 points for 7 years — the "
        f"granularity optimizer statistics actually use; the daily DP was "
        f"measured at 10 s vs ~1 s weekly at sf0.1, same algorithm) with a per-j argmin (PARTITIONED "
        f"rank ordered by a QUANTIZED key FLOOR(1e6*cost/total_SS), "
        f"ties on the smaller cut — the r7 driver window proved raw "
        f"double-cost ranking is FMA/eval-order sensitive across "
        f"builds), {VOPT_B - 1} levels chained through "
        f"localCheckpoints; the oracle replays the identical levels "
        f"as chained CTEs. Prefix sums are exact DECIMAL cents, and "
        f"the outputs are integer-exact (per-bucket sum_cents BIGINT "
        f"and the length-scaled SSE numerator n*P2-P1^2 in cents^2, "
        f"DECIMAL-computed and emitted as an exact digit string "
        f"since it exceeds BIGINT) — no rounded float ever crosses the "
        f"engine boundary. Scale: O(weeks^2) "
        f"pairs per level (~60k weekly), invariant to row count — the data-sized "
        f"work is one grouped aggregate.",
    tags=("profiling", "time", "aggregate", "window"),
)
def vopt_histogram_weekly_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql.window import Window

    orders = load_tables(spark, sf_dir, "orders")["orders"]
    weekly = orders.groupBy(
        F.date_trunc("week", F.col("o_orderdate").cast("date"))
        .cast("date")
        .alias("wk")
    ).agg(
        (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
        .cast("decimal(18,0)")
        .alias("xc")
    )
    wt = Window.orderBy("wk")
    wc = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    pre = (
        weekly.withColumn("t", F.row_number().over(wt))
        .select(
            "t",
            "wk",
            F.sum("xc").over(wc).cast("decimal(38,0)").alias("p1"),
            F.sum(F.col("xc") * F.col("xc"))
            .over(wc)
            .cast("decimal(38,0)")
            .alias("p2"),
        )
        .withColumn("p1d", F.col("p1").cast("double"))
        .withColumn("p2d", F.col("p2").cast("double"))
        .withColumn("td", F.col("t").cast("double"))
        .localCheckpoint(eager=True)
    )
    tmax = pre.agg(F.max("t").alias("mt"))
    # total-SS scale for the quantized comparison key (guard the
    # degenerate all-equal spine: costs are then all 0 and ties
    # break on the cut index identically on both engines)
    s0 = F.col("p2d") - F.col("p1d") * F.col("p1d") / F.col("td")
    ss = (
        pre.join(F.broadcast(tmax), pre["t"] == F.col("mt"))
        .select(
            F.when(s0 <= 0, F.lit(1.0)).otherwise(s0).alias("ssv")
        )
    )
    c = pre.select(
        F.col("t").alias("j"),
        (F.col("p2d") - F.col("p1d") * F.col("p1d") / F.col("td")).alias(
            "cost"
        ),
        F.lit("").alias("path"),
    ).localCheckpoint(eager=True)
    ps = pre.select(
        F.col("t").alias("s_t"), F.col("p1d").alias("s_p1"),
        F.col("p2d").alias("s_p2"), F.col("td").alias("s_td"),
    )
    pj = pre.select(
        F.col("t").alias("j_t"), F.col("p1d").alias("j_p1"),
        F.col("p2d").alias("j_p2"), F.col("td").alias("j_td"),
    )
    for level in range(2, VOPT_B + 1):
        seg_cost = (
            (F.col("j_p2") - F.col("s_p2"))
            - (F.col("j_p1") - F.col("s_p1"))
            * (F.col("j_p1") - F.col("s_p1"))
            / (F.col("j_td") - F.col("s_td"))
        )
        cand = (
            c.join(ps, c["j"] == ps["s_t"])
            .join(
                pj,
                (F.col("j_t") > F.col("s_t"))
                & (F.col("s_t") >= level - 1),
            )
            .crossJoin(F.broadcast(ss))
            .select(
                F.col("j_t").alias("jj"),
                (F.col("cost") + seg_cost).alias("ncost"),
                # quantized BIGINT ranking key: 1e-6 relative grain
                # absorbs cross-build FMA/eval-order ulp noise
                F.floor(
                    (F.col("cost") + seg_cost) / F.col("ssv") * 1000000.0
                )
                .cast("long")
                .alias("ckey"),
                F.concat(
                    F.col("path"), F.lit(","), F.col("j").cast("string")
                ).alias("npath"),
                F.col("j").alias("cut"),
            )
        )
        wmin = Window.partitionBy("jj").orderBy("ckey", "cut")
        c = (
            cand.withColumn("rk", F.row_number().over(wmin))
            .where(F.col("rk") == 1)
            .select(
                F.col("jj").alias("j"),
                F.col("ncost").alias("cost"),
                F.col("npath").alias("path"),
            )
            .localCheckpoint(eager=True)
        )
    fin = c.join(F.broadcast(tmax), c["j"] == F.col("mt")).select(
        F.concat(F.col("path"), F.lit(","), F.col("j").cast("string")).alias(
            "cuts"
        )
    )
    bounds = fin.select(
        F.posexplode(F.split(F.expr("substr(cuts, 2)"), ",")).alias(
            "pos", "sp"
        )
    ).select(
        (F.col("pos") + 1).alias("bucket"),
        F.col("sp").cast("long").alias("end_t"),
    )
    wlag = Window.orderBy("bucket")
    seg = bounds.select(
        "bucket",
        "end_t",
        (F.coalesce(F.lag("end_t").over(wlag), F.lit(0)) + 1).alias(
            "start_t"
        ),
    )
    pa = pre.select(F.col("t").alias("start_t"), F.col("wk").alias("sday"))
    pb = pre.select(
        F.col("t").alias("end_t"),
        F.col("wk").alias("eday"),
        F.col("p1").alias("e_p1"),
        F.col("p2").alias("e_p2"),
    )
    pa2 = pre.select(
        (F.col("t") + 1).alias("start_t"),
        F.col("p1").alias("a_p1"),
        F.col("p2").alias("a_p2"),
    )
    n_days = F.col("end_t") - F.col("start_t") + 1
    dzero = F.lit(0).cast("decimal(38,0)")
    sp1 = F.col("e_p1") - F.coalesce(F.col("a_p1"), dzero)
    sp2 = F.col("e_p2") - F.coalesce(F.col("a_p2"), dzero)
    # integer-exact outputs: per-bucket cents sum and the
    # length-scaled SSE numerator n*P2 - P1^2 (cents^2) — both
    # DECIMAL-exact, immune to cross-build double ulp drift
    sse_num = (
        (n_days.cast("decimal(4,0)") * sp2.cast("decimal(34,0)"))
        .cast("decimal(37,0)")
        - (sp1.cast("decimal(19,0)") * sp1.cast("decimal(19,0)"))
        .cast("decimal(37,0)")
    )
    return (
        seg.join(pa, "start_t")
        .join(pb, "end_t")
        .join(pa2, "start_t", "left")
        .select(
            F.col("bucket").cast("long").alias("bucket"),
            F.date_format("sday", "yyyy-MM-dd").alias("start_week"),
            F.date_format("eday", "yyyy-MM-dd").alias("end_week"),
            n_days.cast("long").alias("n_weeks"),
            sp1.cast("long").alias("sum_cents"),
            sse_num.cast("decimal(38,0)")
            .cast("string")
            .alias("sse_num_cents2"),
        )
    )


# ---------------------------------------------------------------------------
# Mahalanobis outlier screen (multivariate z-score, explicit 2x2 inverse)
# ---------------------------------------------------------------------------

MAHA_CHI2_2_999 = 13.815511  # chi-squared df=2 99.9% critical value


@register(
    "mahalanobis_outliers_2d",
    oracle=f"""
WITH d AS (
  SELECT CAST(l_quantity AS DECIMAL(18,2)) AS x1,
         CAST(l_extendedprice AS DECIMAL(18,2)) AS x2
  FROM lineitem
),
mo AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(x1) AS DOUBLE) AS s1, CAST(SUM(x2) AS DOUBLE) AS s2,
         CAST(SUM(x1 * x1) AS DOUBLE) AS s11,
         CAST(SUM(x1 * x2) AS DOUBLE) AS s12,
         CAST(SUM(x2 * x2) AS DOUBLE) AS s22
  FROM d
),
fit AS (
  SELECT n, s1 / n AS m1, s2 / n AS m2,
         s11 / n - (s1 / n) * (s1 / n) AS c11,
         s12 / n - (s1 / n) * (s2 / n) AS c12,
         s22 / n - (s2 / n) * (s2 / n) AS c22
  FROM mo
),
scored AS (
  SELECT (c22 * (x1 - m1) * (x1 - m1)
          - 2 * c12 * (x1 - m1) * (x2 - m2)
          + c11 * (x2 - m2) * (x2 - m2))
           / (c11 * c22 - c12 * c12) AS d2
  FROM d CROSS JOIN fit
)
SELECT CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN d2 > {MAHA_CHI2_2_999} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers,
       ROUND(CAST(SUM(CASE WHEN d2 > {MAHA_CHI2_2_999} THEN 1 ELSE 0 END)
                  AS DOUBLE) / COUNT(*), 6) AS outlier_frac,
       ROUND(MAX(d2), 4) AS max_d2,
       ROUND(AVG(d2), 6) AS mean_d2
FROM scored
""",
    doc="MAHALANOBIS OUTLIER SCREEN on (quantity, extended price) — "
        "the MULTIVARIATE z-score the univariate batteries "
        "(MAD/winsorize) cannot express: a point can be ordinary on "
        "each axis but wildly off the joint correlation structure; "
        "d^2 = (x-mu)' Sigma^-1 (x-mu) with the 2x2 covariance "
        "inverted EXPLICITLY from the same six exact-DECIMAL "
        "sufficient statistics fisher_lda_classifier uses, flagged "
        "against the df=2 chi-squared 99.9% contour. A useful "
        "identity check: mean_d2 == 2 exactly in-sample (trace of "
        "identity), which the certified output exhibits. Plan: one "
        "moment aggregate, one broadcast 1-row fit back onto the "
        "scan — no shuffle of the fact table.",
    tags=("profiling", "statistics", "quality", "aggregate"),
)
def mahalanobis_outliers_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    d = li.select(
        F.col("l_quantity").cast("decimal(18,2)").alias("x1"),
        F.col("l_extendedprice").cast("decimal(18,2)").alias("x2"),
    )
    mo = d.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x1").cast("double").alias("s1"),
        F.sum("x2").cast("double").alias("s2"),
        F.sum(F.col("x1") * F.col("x1")).cast("double").alias("s11"),
        F.sum(F.col("x1") * F.col("x2")).cast("double").alias("s12"),
        F.sum(F.col("x2") * F.col("x2")).cast("double").alias("s22"),
    )
    fit = mo.selectExpr(
        "n",
        "s1 / n AS m1",
        "s2 / n AS m2",
        "s11 / n - (s1 / n) * (s1 / n) AS c11",
        "s12 / n - (s1 / n) * (s2 / n) AS c12",
        "s22 / n - (s2 / n) * (s2 / n) AS c22",
    )
    scored = d.crossJoin(F.broadcast(fit)).selectExpr(
        "(c22 * (x1 - m1) * (x1 - m1)"
        " - 2 * c12 * (x1 - m1) * (x2 - m2)"
        " + c11 * (x2 - m2) * (x2 - m2))"
        " / (c11 * c22 - c12 * c12) AS d2"
    )
    out = F.when(F.col("d2") > MAHA_CHI2_2_999, 1).otherwise(0)
    return scored.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(out).cast("long").alias("n_outliers"),
        F.round(
            F.sum(out).cast("double") / F.count(F.lit(1)), 6
        ).alias("outlier_frac"),
        F.round(F.max("d2"), 4).alias("max_d2"),
        F.round(F.avg("d2"), 6).alias("mean_d2"),
    )
