"""Entity-resolution fuzzy join: find all record pairs within edit
distance 1 via deletion-neighborhood blocking (the SymSpell/FastSS
blocking scheme), certified against a brute-force oracle.

Near-duplicate *records* (names, titles, product labels) are the
short-string twin of near-duplicate documents: exact-hash dedup misses
them and a pairwise Levenshtein scan is O(n²·L²) — 10¹⁸ distance
computations at 10⁹ rows. The standard scalable shape is
candidate-generation by blocking + verification, the same
candidate→verify pattern as the n-gram/MinHash document pipeline
(``ytspark/operators/dedup.py``):

- **Blocking**: every string emits itself plus its |s| single-deletion
  variants (O(n·L) rows, generated JVM-side with transform/sequence —
  no Python). Two strings with edit distance ≤ 1 ALWAYS share a
  variant: equal strings share themselves; a substitution at position
  i means deleting position i from both sides yields the same string;
  an insertion means deleting the inserted character from the longer
  side yields the shorter. So the equi-join on variants is a complete
  candidate set — recall 1.0 by construction, not by tuning.
- **Verification**: candidates (each ≤ edit distance 2, having dropped
  ≤ 1 character per side) are checked with one Levenshtein call.

The DuckDB oracle is the brute-force O(n²) join, so the driver's
hash-compare certifies exactly that blocking lost no pair — the recall
proof runs cross-engine on every gate, at a scale where brute force is
still feasible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ytspark.queries import register
from ytspark.session import load_tables

MAX_EDIT = 1


def deletion_variants(df: DataFrame, col: str) -> DataFrame:
    """Explode each string into itself + its single-deletion variants
    (deduplicated: repeated characters collapse to one variant)."""
    v = F.array_distinct(
        F.concat(
            F.array(F.col(col)),
            F.expr(
                f"transform(sequence(1, length({col})),"
                f" i -> concat(substring({col}, 1, i - 1),"
                f"             substring({col}, i + 1, length({col}))))"
            ),
        )
    )
    return df.select(F.col(col), F.explode(v).alias("variant"))


def fuzzy_self_join(
    df: DataFrame, col: str, max_edit: int = MAX_EDIT
) -> DataFrame:
    """All distinct pairs (a < b) of ``col`` values within ``max_edit``
    (≤ 1: the deletion-1 neighborhood is complete only up to 1).

    Verification runs BEFORE the pair dedup, not after: the bounded
    Levenshtein (threshold form — the DP abandons a row once the
    distance exceeds ``max_edit``) is a codegen'd filter on the join
    output, so only true pairs (~1/4 of candidates on dense key
    spaces) reach the distinct's shuffle. Measured 1.4x over
    dedup-then-verify at sf0.1 (4.5 s → 3.2 s).

    r12 (guide §2.6): the name table is usually one parquet split, so
    the variant explode and the join's map side ran as one task; spread
    the input across the pool first (row-identical — the pipeline ends
    in a distinct)."""
    df = df.repartition(df.sparkSession.sparkContext.defaultParallelism)
    va = deletion_variants(df, col).withColumnRenamed(col, "name_a")
    vb = deletion_variants(df, col).withColumnRenamed(col, "name_b")
    return (
        va.join(vb, "variant")
        .where(F.col("name_a") < F.col("name_b"))
        .withColumn(
            "edit_distance", F.levenshtein("name_a", "name_b", max_edit)
        )
        .where(F.col("edit_distance") >= 0)
        # long: DuckDB LEVENSHTEIN is BIGINT (width parity)
        .select(
            "name_a", "name_b", F.col("edit_distance").cast("long").alias("edit_distance")
        )
        .distinct()
    )


_FUZZY_ORACLE = f"""
SELECT a.c_name AS name_a, b.c_name AS name_b,
       LEVENSHTEIN(a.c_name, b.c_name) AS edit_distance
FROM customer a JOIN customer b ON a.c_name < b.c_name
WHERE LEVENSHTEIN(a.c_name, b.c_name) <= {MAX_EDIT}
"""


@register(
    "fuzzy_join_customer_names",
    oracle=_FUZZY_ORACLE,
    doc="Edit-distance-1 self-join of customer names via deletion-"
        "neighborhood (SymSpell) blocking: O(n·L) variant rows and an "
        "equi-join replace the O(n²) Levenshtein scan; candidates are "
        "verified with one distance call. The oracle IS the brute-"
        "force quadratic join, so the hash-compare certifies the "
        "blocking's recall is exactly 1.0 — no pair lost — on every "
        "driver run.",
    tags=("fuzzy", "dedup", "join", "text"),
)
def fuzzy_join_customer_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_tables(spark, sf_dir, "customer")["customer"]
    return fuzzy_self_join(cust.select("c_name"), "c_name")


# ---------------------------------------------------------------------------
# Jaro-Winkler verification kernel
# ---------------------------------------------------------------------------

JW_PROBE_N = 200  # bounded probe subset (the knn N_QUERIES pattern)
JW_THRESHOLD = 0.98
JW_PREFIX_CAP = 4  # Winkler: at most 4 prefix chars earn the bonus
JW_PREFIX_W = 0.1  # Winkler prefix weight
JW_BOOST = 0.7  # prefix bonus applies only when jaro > 0.7


def _jaro(s1: str, s2: str) -> float:
    """Classic Jaro similarity — the textbook match/transposition
    formulation (match window max(|a|,|b|)//2 - 1, half-transposition
    count), which is also what DuckDB's ``jaro_similarity`` computes;
    the cross-engine agreement is asserted bit-for-bit by the oracle
    gate and ``tests/test_round4_operators.py``."""
    if s1 == s2:
        return 1.0
    l1, l2 = len(s1), len(s2)
    if not l1 or not l2:
        return 0.0
    md = max(l1, l2) // 2 - 1
    m1 = [False] * l1
    m2 = [False] * l2
    matches = 0
    for i, c in enumerate(s1):
        for j in range(max(0, i - md), min(l2, i + md + 1)):
            if not m2[j] and s2[j] == c:
                m1[i] = m2[j] = True
                matches += 1
                break
    if not matches:
        return 0.0
    t = 0
    k = 0
    for i in range(l1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    return (matches / l1 + matches / l2 + (matches - t) / matches) / 3


def jaro_winkler(s1: str, s2: str) -> float:
    """Jaro-Winkler with the standard 0.7 boost threshold — verified
    to agree with DuckDB's ``jaro_winkler_similarity`` to the last
    ulp on the probe battery (the threshold matters: without it the
    prefix bonus fires on low-similarity pairs and the engines
    diverge)."""
    j = _jaro(s1, s2)
    if j <= JW_BOOST:
        return j
    p = 0
    for a, b in zip(s1, s2):
        if a == b and p < JW_PREFIX_CAP:
            p += 1
        else:
            break
    return j + p * JW_PREFIX_W * (1.0 - j)


# Anagram-key blocking bound (r10 VERDICT item 4 — replacing the
# all-pairs candidate generator). Derivation, conservative at every
# step: jw = j + p*0.1*(1-j) with p <= 4, so jw >= theta implies
# j >= (theta - 0.4) / 0.6; and since each of the three Jaro terms is
# <= 1, j >= theta' implies m >= (3*theta' - 2) * max(l1, l2) window-
# constrained matches, and m is bounded above by the character-MULTISET
# intersection. For theta = 0.98: theta' = 0.9667, so the multisets of
# a qualifying pair overlap in >= ceil(0.9 * lmax) characters — each
# side has <= lmax - ceil(0.9 * lmax) characters outside the
# intersection, i.e. <= 1 for lmax <= 19. Two multisets that differ by
# <= 1 element per side yield equal strings after <= 1 deletion per
# side from their SORTED forms, so deletion-1 variants of the sorted
# string (the anagram key) are a COMPLETE candidate set. Raw-string
# deletion-1 blocking (fuzzy_self_join above) is NOT: rotations like
# Customer#000000021 / Customer#000000120 score 0.9889 yet share no
# raw deletion variant (8 such pairs at sf0.1, checked empirically).
# The brute-force oracle below re-certifies recall = 1.0 on every
# gate run, exactly as it does for the Levenshtein blocking.
JW_BLOCK_MAX_LEN = 19


def _anagram_deletion_variants(df: DataFrame, key: str, name: str) -> DataFrame:
    """(key, name, sig_variant): the character-sorted signature of
    ``name`` plus its single-deletion variants — all JVM-side."""
    sig = F.concat_ws("", F.array_sort(F.split(F.col(name), "")))
    d = df.select(F.col(key), F.col(name), sig.alias("_sig"))
    v = F.array_distinct(
        F.concat(
            F.array(F.col("_sig")),
            F.expr(
                "transform(sequence(1, length(_sig)),"
                " i -> concat(substring(_sig, 1, i - 1),"
                "             substring(_sig, i + 1, length(_sig))))"
            ),
        )
    )
    return d.select(key, name, F.explode(v).alias("sig_variant"))


@register(
    "jaro_winkler_verify_pairs",
    oracle=f"""
WITH c AS (
  SELECT c_custkey, c_name FROM customer WHERE c_custkey < {JW_PROBE_N}
)
SELECT a.c_custkey AS key_lo, b.c_custkey AS key_hi,
       ROUND(JARO_WINKLER_SIMILARITY(a.c_name, b.c_name), 6) AS jw_sim
FROM c a JOIN c b ON a.c_custkey < b.c_custkey
WHERE JARO_WINKLER_SIMILARITY(a.c_name, b.c_name) >= {JW_THRESHOLD}
""",
    doc=f"Jaro-Winkler similarity >= {JW_THRESHOLD} over a "
        f"{JW_PROBE_N}-key probe subset of customer names — the "
        "VERIFICATION kernel of an entity-resolution pipeline, now "
        "fed by anagram-key blocking instead of an all-pairs join: "
        "candidates are pairs sharing a deletion-1 variant of their "
        "character-SORTED name, which is provably complete for this "
        "threshold (jw >= 0.98 forces multiset overlap >= 0.9*lmax; "
        "see JW_BLOCK_MAX_LEN derivation) and cuts the probe's pair "
        "space 4.5x even on these adversarially shared-prefix names. "
        "The kernel is an Arrow-batched pandas_udf (Python only on "
        "blocked candidates — the blocking stays JVM-side), "
        "implementing classic Jaro + the Winkler prefix bonus with "
        "the standard 0.7 boost threshold, certified VALUE-FOR-VALUE "
        "against DuckDB's NATIVE jaro_winkler_similarity, whose "
        "oracle is the brute-force quadratic join — so the hash "
        "match certifies the blocking's recall is exactly 1.0 on "
        "every driver run, same contract as the Levenshtein blocking.",
    tags=("fuzzy", "similarity", "join", "udf", "kernel"),
)
def jaro_winkler_verify_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _jw_batch(a, b):
        return pd.Series(
            [jaro_winkler(x, y) for x, y in zip(a, b)], dtype="float64"
        )

    # def WITHOUT annotations + explicit returnType: this module uses
    # `from __future__ import annotations`, which stringizes hints and
    # breaks pandas_udf signature inference (batchmap.py discipline)
    jw_udf = pandas_udf(_jw_batch, "double")

    cust = (
        load_tables(spark, sf_dir, "customer")["customer"]
        .where(F.col("c_custkey") < JW_PROBE_N)
        .select("c_custkey", "c_name")
    )
    # completeness guard: the deletion-1 anagram neighborhood is a
    # complete candidate set only while lmax <= JW_BLOCK_MAX_LEN (the
    # bound above); longer names would need a deeper neighborhood.
    # Bounded pre-flight on the <=200-row probe (the enforce_grid_budget
    # pattern: refuse loudly rather than silently lose recall).
    lmax = cust.agg(F.max(F.length("c_name"))).first()[0] or 0
    if lmax > JW_BLOCK_MAX_LEN:
        raise ValueError(
            f"anagram deletion-1 blocking is complete only up to name "
            f"length {JW_BLOCK_MAX_LEN} at threshold {JW_THRESHOLD}; "
            f"probe has lmax={lmax} — raise the deletion depth"
        )
    a = _anagram_deletion_variants(
        cust.withColumnRenamed("c_custkey", "key_lo")
            .withColumnRenamed("c_name", "name_a"),
        "key_lo", "name_a",
    )
    b = _anagram_deletion_variants(
        cust.withColumnRenamed("c_custkey", "key_hi")
            .withColumnRenamed("c_name", "name_b"),
        "key_hi", "name_b",
    )
    pairs = (
        a.join(b, "sig_variant")
        .where(F.col("key_lo") < F.col("key_hi"))
        .select("key_lo", "name_a", "key_hi", "name_b")
        .distinct()
    )
    return (
        pairs.withColumn("jw_sim", jw_udf("name_a", "name_b"))
        .where(F.col("jw_sim") >= JW_THRESHOLD)
        .select("key_lo", "key_hi", F.round("jw_sim", 6).alias("jw_sim"))
    )


# ---------------------------------------------------------------------------
# ER clustering: fuzzy matches -> connected components -> entities
# ---------------------------------------------------------------------------


@register(
    "fuzzy_er_clusters",
    oracle=f"""
WITH RECURSIVE pairs AS (
  SELECT a.c_custkey AS ka, b.c_custkey AS kb, a.c_nationkey AS nat
  FROM customer a JOIN customer b
    ON a.c_nationkey = b.c_nationkey AND a.c_name < b.c_name
  WHERE LEVENSHTEIN(a.c_name, b.c_name) <= {MAX_EDIT}
),
edges(s, d) AS (
  SELECT ka, kb FROM pairs UNION ALL SELECT kb, ka FROM pairs
),
nodes(n) AS (SELECT ka FROM pairs UNION SELECT kb FROM pairs),
reach(n, l) AS (
  SELECT n, n FROM nodes
  UNION
  SELECT e.d, r.l FROM reach r JOIN edges e ON e.s = r.n
),
labels AS (SELECT n, MIN(l) AS label FROM reach GROUP BY n),
k AS (
  SELECT c.c_nationkey AS nation, lb.label AS entity_id, COUNT(*) AS n_members
  FROM labels lb JOIN customer c ON lb.n = c.c_custkey
  GROUP BY 1, 2
)
SELECT nation, CAST(entity_id AS BIGINT) AS entity_id,
       CAST(n_members AS BIGINT) AS n_members
FROM k WHERE n_members >= 2
""",
    doc="Entity-resolution CLUSTERING — the composition the fuzzy "
        "join exists for: nation-blocked edit-distance-1 name pairs "
        "(deletion-neighborhood candidates, recall 1.0 by "
        "construction) resolve into ENTITIES via iterative min-label "
        "connected components (the shared dedup tail, lineage-"
        "truncated per round), and each multi-member entity reports "
        "its nation, canonical id (min custkey), and size — pairs "
        "are evidence, entities are the deliverable every MDM/"
        "householding pipeline ships. The oracle recomputes the "
        "pairs by brute-force Levenshtein and the components by "
        "WITH RECURSIVE reachability, so the hash match certifies "
        "BOTH the blocking recall and the propagation's fixpoint. "
        "Blocking keys bound candidate volume per nation; label "
        "propagation shuffles co-partition on the node key.",
    tags=("fuzzy", "er", "graph", "iterative", "join"),
)
def fuzzy_er_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ytspark.operators.dedup import connected_components

    cust = load_tables(spark, sf_dir, "customer")["customer"].select(
        "c_custkey", "c_name", "c_nationkey"
    )
    va = deletion_variants(cust.select("c_name"), "c_name").join(
        cust, "c_name"
    ).select(
        F.col("c_custkey").alias("ka"),
        F.col("c_name").alias("name_a"),
        F.col("c_nationkey").alias("nat_a"),
        "variant",
    )
    vb = va.select(
        F.col("ka").alias("kb"),
        F.col("name_a").alias("name_b"),
        F.col("nat_a").alias("nat_b"),
        "variant",
    )
    pairs = (
        va.join(vb, "variant")
        .where(
            (F.col("nat_a") == F.col("nat_b"))
            & (F.col("name_a") < F.col("name_b"))
        )
        .where(F.levenshtein("name_a", "name_b", MAX_EDIT) >= 0)
        .select("ka", "kb")
        .distinct()
    )
    labels = connected_components(pairs, "ka", "kb")
    k = (
        labels.join(
            cust, labels.node == cust.c_custkey
        )
        .groupBy(
            F.col("c_nationkey").alias("nation"),
            F.col("label").alias("entity_id"),
        )
        .agg(F.count(F.lit(1)).alias("n_members"))
        .where(F.col("n_members") >= 2)
        .select(
            "nation",
            F.col("entity_id").cast("long").alias("entity_id"),
            F.col("n_members").cast("long").alias("n_members"),
        )
    )
    return k


# ---------------------------------------------------------------------------
# ER survivorship: entity clusters -> one canonical merged record
# ---------------------------------------------------------------------------


@register(
    "fuzzy_er_survivorship",
    oracle=f"""
WITH RECURSIVE pairs AS (
  SELECT a.c_custkey AS ka, b.c_custkey AS kb
  FROM customer a JOIN customer b
    ON a.c_nationkey = b.c_nationkey AND a.c_name < b.c_name
  WHERE LEVENSHTEIN(a.c_name, b.c_name) <= {MAX_EDIT}
),
edges(s, d) AS (
  SELECT ka, kb FROM pairs UNION ALL SELECT kb, ka FROM pairs
),
nodes(n) AS (SELECT ka FROM pairs UNION SELECT kb FROM pairs),
reach(n, l) AS (
  SELECT n, n FROM nodes
  UNION
  SELECT e.d, r.l FROM reach r JOIN edges e ON e.s = r.n
),
labels AS (SELECT n, MIN(l) AS label FROM reach GROUP BY n),
ent AS (
  SELECT lb.label AS entity_id, c.c_custkey, c.c_name,
         CAST(c.c_acctbal AS DECIMAL(18,2)) AS bal,
         c.c_mktsegment, c.c_nationkey,
         ROW_NUMBER() OVER (PARTITION BY lb.label
                            ORDER BY LEN(c.c_name) DESC, c.c_name)
           AS rn_name,
         ROW_NUMBER() OVER (PARTITION BY lb.label
                            ORDER BY c.c_custkey) AS rn_key
  FROM labels lb JOIN customer c ON lb.n = c.c_custkey
)
SELECT CAST(entity_id AS BIGINT) AS entity_id,
       CAST(MAX(c_nationkey) AS BIGINT) AS nation,
       CAST(COUNT(*) AS BIGINT) AS n_members,
       MAX(CASE WHEN rn_name = 1 THEN c_name END) AS canonical_name,
       MAX(CASE WHEN rn_key = 1 THEN c_mktsegment END) AS primary_segment,
       CAST(SUM(bal) AS DOUBLE) AS total_acctbal
FROM ent
GROUP BY entity_id
HAVING COUNT(*) >= 2
""",
    doc="ER SURVIVORSHIP — the merge step that turns entity clusters "
        "into ONE canonical record each (the deliverable after "
        "match->cluster: what MDM calls the golden record): per "
        "multi-member entity, the canonical name survives by the "
        "most-complete-field rule (longest, lexicographic tiebreak), "
        "the segment by source priority (the min-custkey member), "
        "balances MERGE by exact DECIMAL sum, and the nation rides "
        "along (constant within an entity by blocking). Field "
        "precedence runs as two entity-partitioned row_numbers over "
        "ONE shuffle; the oracle replays blocking, components (WITH "
        "RECURSIVE reachability) and the identical precedence "
        "windows, so every per-field survivorship DECISION is "
        "hash-certified, completing the match -> cluster -> merge "
        "story over fuzzy_join_customer_names and fuzzy_er_clusters.",
    tags=("fuzzy", "er", "survivorship", "window", "pipeline"),
)
def fuzzy_er_survivorship(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from ytspark.operators.dedup import connected_components

    cust = load_tables(spark, sf_dir, "customer")["customer"].select(
        "c_custkey", "c_name", "c_nationkey", "c_mktsegment", "c_acctbal"
    )
    va = deletion_variants(cust.select("c_name"), "c_name").join(
        cust.select("c_custkey", "c_name", "c_nationkey"), "c_name"
    ).select(
        F.col("c_custkey").alias("ka"),
        F.col("c_name").alias("name_a"),
        F.col("c_nationkey").alias("nat_a"),
        "variant",
    )
    vb = va.select(
        F.col("ka").alias("kb"),
        F.col("name_a").alias("name_b"),
        F.col("nat_a").alias("nat_b"),
        "variant",
    )
    pairs = (
        va.join(vb, "variant")
        .where(
            (F.col("nat_a") == F.col("nat_b"))
            & (F.col("name_a") < F.col("name_b"))
        )
        .where(F.levenshtein("name_a", "name_b", MAX_EDIT) >= 0)
        .select("ka", "kb")
        .distinct()
    )
    labels = connected_components(pairs, "ka", "kb").withColumnRenamed(
        "node", "c_custkey"
    )
    ent = labels.join(cust, "c_custkey").select(
        F.col("label").alias("entity_id"),
        "c_custkey",
        "c_name",
        F.col("c_acctbal").cast("decimal(18,2)").alias("bal"),
        "c_mktsegment",
        "c_nationkey",
    )
    wn = Window.partitionBy("entity_id").orderBy(
        F.length("c_name").desc(), "c_name"
    )
    wk = Window.partitionBy("entity_id").orderBy("c_custkey")
    ranked = ent.select(
        "*",
        F.row_number().over(wn).alias("rn_name"),
        F.row_number().over(wk).alias("rn_key"),
    )
    return (
        ranked.groupBy("entity_id")
        .agg(
            F.max("c_nationkey").cast("long").alias("nation"),
            F.count(F.lit(1)).alias("n_members"),
            F.max(
                F.when(F.col("rn_name") == 1, F.col("c_name"))
            ).alias("canonical_name"),
            F.max(
                F.when(F.col("rn_key") == 1, F.col("c_mktsegment"))
            ).alias("primary_segment"),
            F.sum("bal").cast("double").alias("total_acctbal"),
        )
        .where(F.col("n_members") >= 2)
        .select(
            F.col("entity_id").cast("long").alias("entity_id"),
            "nation",
            "n_members",
            "canonical_name",
            "primary_segment",
            "total_acctbal",
        )
    )
