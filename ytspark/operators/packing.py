"""Training-set assembly operators: sequence packing, deterministic
global shuffle, and mixture upsampling over the ``documents`` table.

These are the operations that turn a curated corpus into model-ready
training data (the step after the dedup/curation families in this
package). None of them exist in the reference (its pipeline ends at
warehouse marts — dags/dbt/dbt_ytanalytics/models/marts/
YT_Facts_stg.sql); they extend the engine the way SURVEY §2.10 commits
to for LLM-scale data preparation.

Design rules shared by every operator here:

- **Determinism over rand().** Grouping, shuffling, and fractional
  upsampling all derive from the overflow-safe multiplicative hash
  (``text.knuth_hash_col``) so results are identical across engines,
  retries, partitionings, and AQE re-execution — and therefore
  oracle-checkable, unlike ``rand()``/``sample()``.
- **No global sequential state.** Packing is sequential by nature;
  scalable form = hash-partition the corpus into independent pack
  groups, run the sequential pass per group (bounded rows per task),
  never across groups. At 100 TB raise ``PACK_GROUPS`` so each group
  fits one task; bins never cross groups, so quality is unaffected.
- **JVM-side token math.** Token counts are computed with built-in
  column functions before any Python kernel sees a row; the pandas
  kernel in the greedy packer only walks a per-group int array.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ytspark.queries import register
from ytspark.session import load_tables
from ytspark.operators.text import (
    SPLIT_MOD,
    knuth_hash_col,
    knuth_hash_sql,
    token_count,
)

# Context-window token budget per packed training sequence. 512 keeps
# several bins per group at test scale; production would use the model
# context length (2k/8k/128k) — semantics are budget-independent.
PACK_BUDGET = 512

# Independent pack groups. Each group is one sequential packing task;
# size it so a group's documents fit one executor task (at 100 TB:
# thousands of groups — the constant is a floor, the semantics don't
# change with the count because bins never span groups).
PACK_GROUPS = 8

# Range-bucket count for the distributed total-order shuffle rank.
SHUFFLE_BUCKETS = 16
_BUCKET_WIDTH = SPLIT_MOD // SHUFFLE_BUCKETS  # exact: both powers of 2


def _grouped_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (g, doc_id, t): pack group + whitespace token count."""
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    return docs.select(
        F.pmod(knuth_hash_col(F.col("doc_id")), F.lit(PACK_GROUPS)).alias("g"),
        "doc_id",
        token_count(F.col("text")).alias("t"),
    )


_GROUP_SQL = f"({knuth_hash_sql('doc_id')}) % {PACK_GROUPS}"


@register(
    "sequence_pack_blocks",
    oracle=f"""
WITH tok AS (
  SELECT {_GROUP_SQL} AS g, doc_id,
         LEN(STRING_SPLIT(text, ' ')) AS t
  FROM documents
),
c AS (
  SELECT g, doc_id, t,
         CAST(SUM(t) OVER (PARTITION BY g ORDER BY doc_id
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
  FROM tok
)
SELECT g,
       (cum - t) // {PACK_BUDGET} AS bin,
       COUNT(*) AS n_docs,
       CAST(SUM(t) AS BIGINT) AS tokens_started,
       CAST(SUM(CASE WHEN (cum - t) // {PACK_BUDGET} <> (cum - 1) // {PACK_BUDGET}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_straddle
FROM c
GROUP BY g, bin
""",
    doc="Block sequence packing: concatenate each pack group's token "
        "stream in doc_id order and cut it into fixed "
        f"{PACK_BUDGET}-token blocks; a document belongs to the block "
        "where it STARTS, and n_straddle counts documents crossing a "
        "block boundary (they would be split in the emitted stream). "
        "Pure window arithmetic — prefix-sum per group, no Python, one "
        "shuffle on the group key — so it scales with the scan. This "
        "is the GPT-style packing used when documents may be split "
        "across sequences; see sequence_pack_greedy for the "
        "no-split variant.",
    tags=("packing", "text", "window", "pipeline"),
)
def sequence_pack_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    tok = _grouped_tokens(spark, sf_dir)
    w = (
        Window.partitionBy("g")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = tok.withColumn("cum", F.sum("t").over(w))
    start_bin = F.floor((F.col("cum") - F.col("t")) / F.lit(PACK_BUDGET))
    end_bin = F.floor((F.col("cum") - 1) / F.lit(PACK_BUDGET))
    return (
        c.select(
            "g",
            "t",
            start_bin.alias("bin"),
            (start_bin != end_bin).cast("long").alias("straddle"),
        )
        .groupBy("g", "bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("t").alias("tokens_started"),
            F.sum("straddle").alias("n_straddle"),
        )
    )


def greedy_pack_bins(
    token_counts, budget: int = PACK_BUDGET
) -> list[tuple[int, int, int, int]]:
    """Pure greedy walk: (bin, n_docs, fill_tokens, n_oversize) per bin.

    Close the current bin when the next document would exceed
    ``budget``; a document larger than the budget occupies a bin alone
    (counted in n_oversize). Property-tested against an independent
    reference in tests/test_packing_graph.py; the Spark kernel and the
    recursive-CTE oracle both implement exactly this walk.
    """
    out: list[tuple[int, int, int, int]] = []
    bin_id, fill, n_docs, oversize_ct = 0, 0, 0, 0
    for t in token_counts:
        t = int(t)
        if n_docs > 0 and fill + t > budget:
            out.append((bin_id, n_docs, fill, oversize_ct))
            bin_id += 1
            fill, n_docs, oversize_ct = 0, 0, 0
        fill += t
        n_docs += 1
        if t > budget:
            oversize_ct += 1
    if n_docs > 0:
        out.append((bin_id, n_docs, fill, oversize_ct))
    return out


@register(
    "sequence_pack_greedy",
    oracle=f"""
WITH RECURSIVE tok AS (
  SELECT {_GROUP_SQL} AS g, doc_id,
         LEN(STRING_SPLIT(text, ' ')) AS t
  FROM documents
),
seq AS (
  SELECT g, doc_id, t,
         ROW_NUMBER() OVER (PARTITION BY g ORDER BY doc_id) AS rn
  FROM tok
),
walk AS (
  SELECT g, rn, t, 0 AS bin, t AS fill FROM seq WHERE rn = 1
  UNION ALL
  SELECT s.g, s.rn, s.t,
         CASE WHEN w.fill + s.t <= {PACK_BUDGET} THEN w.bin ELSE w.bin + 1 END,
         CASE WHEN w.fill + s.t <= {PACK_BUDGET} THEN w.fill + s.t ELSE s.t END
  FROM walk w JOIN seq s ON s.g = w.g AND s.rn = w.rn + 1
)
SELECT g, CAST(bin AS BIGINT) AS bin,
       COUNT(*) AS n_docs, CAST(SUM(t) AS BIGINT) AS fill_tokens,
       CAST(SUM(CASE WHEN t > {PACK_BUDGET} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_oversize
FROM walk
GROUP BY g, bin
""",
    doc="Greedy no-split sequence packing: within each pack group, walk "
        "documents in doc_id order and close the current bin when the "
        f"next document would push it past {PACK_BUDGET} tokens (a "
        "document larger than the budget gets a bin of its own, counted "
        "in n_oversize). The walk is inherently sequential, so the "
        "scalable shape is hash-partitioned independence: one "
        "applyInPandas task per group walks a bounded int array that "
        "the JVM already tokenized — Python never touches document "
        "text. The DuckDB oracle replays the exact walk with a "
        "recursive CTE, making this sequential operator value-checkable "
        "cross-engine, not just row-counted.",
    tags=("packing", "text", "udf", "applyinpandas", "pipeline"),
)
def sequence_pack_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    tok = _grouped_tokens(spark, sf_dir)

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        out = greedy_pack_bins(pdf["t"].to_numpy())
        g = int(pdf["g"].iloc[0])
        return pd.DataFrame(
            out, columns=["bin", "n_docs", "fill_tokens", "n_oversize"]
        ).assign(g=g)[["g", "bin", "n_docs", "fill_tokens", "n_oversize"]]

    return tok.groupBy("g").applyInPandas(
        pack,
        schema="g long, bin long, n_docs long, fill_tokens long, n_oversize long",
    )


@register(
    "corpus_global_shuffle",
    oracle=f"""
SELECT doc_id,
       {knuth_hash_sql('doc_id')} AS hv,
       ROW_NUMBER() OVER (ORDER BY {knuth_hash_sql('doc_id')}, doc_id)
         AS shuffle_rank
FROM documents
""",
    doc="Deterministic global training shuffle: every document gets a "
        "total-order rank by (key hash, key) — the reproducible, "
        "engine-independent replacement for ORDER BY rand() when fixing "
        "a training data order. The rank is computed WITHOUT a "
        "single-partition global window: hash values are range-bucketed "
        f"({SHUFFLE_BUCKETS} buckets here; thousands at scale), "
        "per-bucket counts (one tiny aggregate) become cumulative "
        "offsets, and rank = bucket offset + within-bucket row_number. "
        "Equal hash values land in one bucket, so the doc_id tiebreak "
        "stays local and the result equals the oracle's global "
        "ROW_NUMBER.",
    tags=("text", "shuffle", "window", "pipeline"),
)
def corpus_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    d = docs.select(
        "doc_id", knuth_hash_col(F.col("doc_id")).alias("hv")
    ).withColumn("bucket", F.floor(F.col("hv") / F.lit(_BUCKET_WIDTH)))
    counts = d.groupBy("bucket").agg(F.count(F.lit(1)).alias("n"))
    # SHUFFLE_BUCKETS rows: the ordered window is bounded and tiny by
    # construction — this is the two-pass distributed rank, not a
    # global sort.
    off_w = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.select(
        "bucket", F.coalesce(F.sum("n").over(off_w), F.lit(0)).alias("off")
    )
    rn_w = Window.partitionBy("bucket").orderBy("hv", "doc_id")
    return (
        d.join(F.broadcast(offsets), "bucket")
        .select(
            "doc_id",
            "hv",
            (F.col("off") + F.row_number().over(rn_w)).alias("shuffle_rank"),
        )
    )


# Per-source mixture weight: deterministic function of the source name
# so both engines agree without a shared literal map. Weights cycle
# through {0.5, 1.25, 2.0, 2.75} — exercising downsampling (w<1),
# exact repeats (integer w), and fractional upsampling in one query.
def _w_spark():
    # built lazily: Column construction needs an active SparkContext
    return 0.5 + (F.substring("source", 4, 10).cast("int") % 4) * 0.75


_W_SQL = "0.5 + (CAST(SUBSTRING(source, 4) AS INTEGER) % 4) * 0.75"
_UPSAMPLE_SALT = 7919


@register(
    "corpus_mixture_upsample",
    oracle=f"""
WITH base AS (
  SELECT source,
         LEN(STRING_SPLIT(text, ' ')) AS t,
         CAST(FLOOR({_W_SQL}) AS BIGINT)
           + CASE WHEN {knuth_hash_sql(f'doc_id + {_UPSAMPLE_SALT}')}
                    < (({_W_SQL}) - FLOOR({_W_SQL})) * {SPLIT_MOD}
                  THEN 1 ELSE 0 END AS n_copies
  FROM documents
),
exploded AS (
  SELECT source, t, UNNEST(GENERATE_SERIES(1, n_copies)) AS i FROM base
),
inn AS (SELECT source, COUNT(*) AS n_docs_in FROM base GROUP BY source),
e AS (
  SELECT source, COUNT(*) AS n_out, SUM(t) AS tokens_out
  FROM exploded GROUP BY source
)
SELECT i.source, i.n_docs_in,
       CAST(COALESCE(e.n_out, 0) AS BIGINT) AS n_docs_out,
       CAST(COALESCE(e.tokens_out, 0) AS BIGINT) AS tokens_out
FROM inn i LEFT JOIN e ON e.source = i.source
""",
    doc="Deterministic mixture upsampling: each source's sampling "
        "weight w yields floor(w) guaranteed copies per document plus "
        "one more iff hash(doc_id+salt) < frac(w)·2^32 — so the "
        "realized corpus converges to the target mixture with zero "
        "RNG state, and any row's copy count can be recomputed from "
        "its key alone (replay-safe under retries, auditable, and "
        "streamable: late documents sample correctly on arrival). "
        "Copies materialize via sequence+explode (JVM generator, no "
        "Python); the output reports per-source in/out document and "
        "token accounting.",
    tags=("text", "sampling", "mixture", "pipeline"),
)
def corpus_mixture_upsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    w = _w_spark()
    frac = w - F.floor(w)
    extra = (
        knuth_hash_col(F.col("doc_id") + F.lit(_UPSAMPLE_SALT))
        < frac * F.lit(SPLIT_MOD)
    ).cast("long")
    base = docs.select(
        "source",
        "doc_id",
        token_count(F.col("text")).alias("t"),
        (F.floor(w).cast("long") + extra).alias("n_copies"),
    )
    exploded = base.where(F.col("n_copies") >= 1).select(
        "source",
        "t",
        F.explode(F.sequence(F.lit(1), F.col("n_copies"))).alias("i"),
    )
    out = exploded.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs_out"),
        F.sum("t").alias("tokens_out"),
    )
    n_in = base.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs_in"))
    return n_in.join(out, "source", "left").select(
        "source",
        "n_docs_in",
        F.coalesce("n_docs_out", F.lit(0)).alias("n_docs_out"),
        F.coalesce("tokens_out", F.lit(0)).alias("tokens_out"),
    )


# ---------------------------------------------------------------------------
# Deterministic negative sampling for contrastive training pairs
# ---------------------------------------------------------------------------

NEG_K = 3  # negatives sampled per positive pair
_NEG_SALT = 7919


@register(
    "negative_sample_pairs",
    oracle=f"""
WITH pos AS (
  SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderkey <= 20000
),
mx AS (SELECT MAX(p_partkey) AS max_pk FROM part),
neg AS (
  SELECT pos.c, j,
         ({knuth_hash_sql(f"pos.c * 31 + pos.p * 17 + j * {_NEG_SALT}")})
           % mx.max_pk + 1 AS np
  FROM pos
  CROSS JOIN (SELECT UNNEST(RANGE(1, {NEG_K} + 1)) AS j)
  CROSS JOIN mx
)
SELECT j,
       CAST(COUNT(*) AS BIGINT) AS n_samples,
       CAST(SUM(CASE WHEN q.c IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_accidental_pos,
       ROUND(SUM(CASE WHEN q.c IS NOT NULL THEN 1 ELSE 0 END) * 1.0
             / COUNT(*), 6) AS accidental_rate,
       CAST(SUM(np) AS BIGINT) AS sample_checksum
FROM neg
LEFT JOIN pos q ON q.c = neg.c AND q.p = neg.np
GROUP BY j
""",
    doc=f"Deterministic NEGATIVE SAMPLING — the contrastive-training "
        f"data-prep step (recommendation / embedding / reranker "
        f"training needs k negatives per positive pair): for every "
        f"observed (customer, part) purchase pair, {NEG_K} pseudo-"
        f"random negative part ids are drawn via the overflow-safe "
        f"Knuth hash over (pair, slot) — no RNG state, replay-safe "
        f"under retries, identical across engines — and the battery "
        f"reports, per slot, the sample count, the ACCIDENTAL-"
        f"POSITIVE count (sampled negatives that are actually "
        f"observed pairs — the contamination metric a contrastive "
        f"pipeline must track, since uncorrected false negatives "
        f"poison the loss), the rate, and a membership checksum that "
        f"certifies the exact sampled ids cross-engine. Scale shape: "
        f"hash projection + one broadcast scalar (max part id) + one "
        f"equi-join back to the positives on the sampled key — no "
        f"shuffle beyond the positive-pair distinct and the "
        f"accidental-hit join, both on natural keys.",
    tags=("packing", "sampling", "negatives", "join", "pipeline"),
)
def negative_sample_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "orders", "lineitem", "part")
    pos = (
        t["orders"]
        .where(F.col("o_orderkey") <= 20000)
        .join(
            t["lineitem"],
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    mx = t["part"].agg(F.max("p_partkey").alias("max_pk"))
    # long literals: DuckDB RANGE yields BIGINT (width parity)
    slots = F.explode(
        F.array(*[F.lit(j).cast("long") for j in range(1, NEG_K + 1)])
    ).alias("j")
    neg = (
        pos.select("c", "p", slots)
        .crossJoin(F.broadcast(mx))
        .select(
            "c",
            "j",
            (
                F.pmod(
                    knuth_hash_col(
                        F.col("c") * 31 + F.col("p") * 17 + F.col("j") * _NEG_SALT
                    ),
                    F.col("max_pk"),
                )
                + 1
            ).alias("np"),
        )
    )
    q = pos.select(F.col("c"), F.col("p").alias("np"), F.lit(1).alias("hit"))
    return (
        neg.join(q, ["c", "np"], "left")
        .groupBy("j")
        .agg(
            F.count(F.lit(1)).alias("n_samples"),
            F.sum(F.coalesce("hit", F.lit(0)))
            .cast("long")
            .alias("n_accidental_pos"),
            F.round(
                F.sum(F.coalesce("hit", F.lit(0))) * 1.0 / F.count(F.lit(1)), 6
            ).alias("accidental_rate"),
            F.sum("np").cast("long").alias("sample_checksum"),
        )
    )
