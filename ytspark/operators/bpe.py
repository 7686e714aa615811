"""BPE tokenizer induction inside the engine: iterative most-frequent
adjacent-pair merges over the frequency-weighted word-type table.

Byte-pair-encoding training is THE tokenizer-prep computation of an
LLM data pipeline, and its scale shape fits the engine naturally:
training never touches the raw corpus after one aggregation — it runs
on the (word-type, frequency) vocabulary table, which is what every
production BPE trainer consumes. At 100 TB the corpus→vocabulary
aggregate is the only big shuffle; each merge iteration is then an
explode + weighted count + argmax + map-side merge application over
the vocabulary, whose size is millions of types, not billions of
documents.

Spark-first mechanics per iteration:
- pair statistics: zip_with over two array slices pairs each symbol
  with its successor (JVM, no positional self-join), explode, one
  weighted count aggregate;
- the winning pair is the (count DESC, left, right) argmax — a 1-row
  bounded collect (the trained artifact, like IVF centroids);
- merge application is a left-to-right greedy fold with the
  ``aggregate`` HOF: append each symbol, or replace the accumulator's
  tail when it ends with (left) and the next symbol is (right) —
  single-pass greedy is exact because a merged symbol can never equal
  its own left constituent.

The DuckDB oracle replays every iteration as chained CTEs; greedy
left-to-right application is replayed WITHOUT recursion via the match-
island parity rule: in a run of consecutive overlapping matches (which
only happens when left == right), exactly the even-offset matches
merge. The merge table itself — step, pair, weighted count — is the
hash-certified output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ytspark.queries import register
from ytspark.session import load_tables

N_MERGES = 6
# truncate the vocab DataFrame's lineage every K merges: each merge
# stacks an F.aggregate rewrite on the plan, and a real tokenizer
# build (10k+ merges) would otherwise blow up analysis/optimization
# time long before execution does. An eager localCheckpoint
# materializes the current vocab (vocabulary-sized, not corpus-sized)
# and restarts the plan from it.
CHECKPOINT_EVERY = 16


def _bpe_iter_sql(k: int) -> str:
    return f"""
p{k} AS MATERIALIZED (
  SELECT pr[1] AS l, pr[2] AS r, SUM(freq) AS c
  FROM (SELECT freq, UNNEST(LIST_ZIP(s[:-2], s[2:])) AS pr FROM v{k})
  GROUP BY 1, 2
),
b{k} AS MATERIALIZED (SELECT l, r, c FROM p{k} ORDER BY c DESC, l, r LIMIT 1),
pos{k} AS MATERIALIZED (
  SELECT tok, freq, UNNEST(s) AS sym,
         UNNEST(RANGE(1, LEN(s) + 1)) AS ord
  FROM v{k}
),
mm{k} AS MATERIALIZED (
  SELECT tok, ord FROM (
    SELECT p.tok, p.ord, p.sym,
           LEAD(p.sym) OVER (PARTITION BY p.tok ORDER BY p.ord) AS nxt,
           b.l, b.r
    FROM pos{k} p CROSS JOIN b{k} b
  ) WHERE sym = l AND nxt = r
),
kk{k} AS MATERIALIZED (
  SELECT tok, ord FROM (
    SELECT tok, ord,
           ROW_NUMBER() OVER (PARTITION BY tok, ord - rn
                              ORDER BY ord) AS island_rn
    FROM (SELECT tok, ord,
                 ROW_NUMBER() OVER (PARTITION BY tok ORDER BY ord) AS rn
          FROM mm{k})
  ) WHERE (island_rn - 1) % 2 = 0
),
v{k + 1} AS MATERIALIZED (
  SELECT p.tok, p.freq,
         LIST(CASE WHEN m.tok IS NOT NULL THEN b.l || b.r
                   ELSE p.sym END ORDER BY p.ord) AS s
  FROM pos{k} p
  CROSS JOIN b{k} b
  LEFT JOIN kk{k} m ON m.tok = p.tok AND m.ord = p.ord
  LEFT JOIN kk{k} cons ON cons.tok = p.tok AND cons.ord = p.ord - 1
  WHERE cons.tok IS NULL
  GROUP BY p.tok, p.freq
)"""


def _bpe_oracle() -> str:
    iters = ",".join(_bpe_iter_sql(k) for k in range(N_MERGES))
    finals = "\nUNION ALL\n".join(
        f"SELECT {k + 1} AS step, l AS left_sym, r AS right_sym, "
        f"CAST(c AS BIGINT) AS pair_weight FROM b{k}"
        for k in range(N_MERGES)
    )
    return f"""
WITH v0 AS MATERIALIZED (
  SELECT tok, COUNT(*) AS freq,
         LIST_TRANSFORM(RANGE(1, LEN(tok) + 1), i -> tok[i]) AS s
  FROM (SELECT UNNEST(STRING_SPLIT(text, ' ')) AS tok FROM documents)
  GROUP BY tok
),
{iters}
{finals}
"""


def bpe_train(docs: DataFrame, n_merges: int = N_MERGES):
    """Run ``n_merges`` BPE iterations over the corpus vocabulary.

    Returns (merge_table, final_vocab): the list of
    (step, left, right, weighted_count) merges — each iteration's
    argmax is a 1-row bounded collect — and the vocabulary DataFrame
    with merged symbol lists.

    Cost envelope per merge: one vocabulary-sized job (pair explode +
    weighted count + 1-row argmax collect) = one driver round trip —
    n_merges round trips total, inherent to BPE's sequential
    dependency (merge k+1's statistics depend on merge k's rewrite).
    Lineage is truncated by an eager localCheckpoint every
    ``CHECKPOINT_EVERY`` merges so plan depth stays bounded at any
    merge budget; between checkpoints the plan carries at most
    CHECKPOINT_EVERY stacked aggregate-HOF rewrites.
    """
    vocab = (
        docs.select(F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    v = vocab.select("tok", "freq", F.split("tok", "").alias("s"))
    merges = []
    for step in range(1, n_merges + 1):
        s = F.col("s")
        n1 = F.size(s) - F.lit(1)
        zipped = F.zip_with(
            F.slice(s, 1, n1),
            F.slice(s, 2, n1),
            lambda a, b: F.struct(a.alias("l"), b.alias("r")),
        )
        best = (
            v.select("freq", F.explode(zipped).alias("p"))
            .groupBy("p.l", "p.r")
            .agg(F.sum("freq").alias("c"))
            .orderBy(F.col("c").desc(), "l", "r")
            .limit(1)
            .collect()[0]  # bounded: the single winning pair
        )
        left, right, cnt = best["l"], best["r"], int(best["c"])
        merges.append((step, left, right, cnt))
        ll, rr, mm = F.lit(left), F.lit(right), F.lit(left + right)
        merged = F.aggregate(
            s,
            F.array().cast("array<string>"),
            lambda acc, x: F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == ll)
                & (x == rr),
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1), F.array(mm)
                ),
            ).otherwise(F.concat(acc, F.array(x))),
        )
        v = v.select("tok", "freq", merged.alias("s"))
        if step % CHECKPOINT_EVERY == 0:
            v = v.localCheckpoint(eager=True)
    return merges, v


@register(
    "bpe_merge_table",
    oracle=_bpe_oracle(),
    doc=f"BPE tokenizer induction: the first {N_MERGES} merge rules "
        "(most frequent adjacent symbol pair, weighted by word-type "
        "frequency, ties to the lexicographically first pair) learned "
        "over the corpus vocabulary — training runs on the word-type "
        "table exactly like production BPE trainers, so after the one "
        "corpus->vocabulary aggregate every iteration is vocabulary-"
        "sized: a zip_with pair explode, a weighted count, a 1-row "
        "argmax collect (the trained artifact), and a greedy "
        "left-to-right merge fold via the aggregate HOF. The oracle "
        "replays all iterations as chained CTEs, replaying the greedy "
        "fold without recursion through the match-island parity rule "
        "(overlapping matches exist only when left == right; even "
        "offsets merge). The merge table is hash-certified end to "
        "end — tokenizer training as a certified query.",
    tags=("text", "bpe", "iterative", "aggregate", "hof"),
)
def bpe_merge_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    merges, _ = bpe_train(docs)
    return spark.createDataFrame(
        merges, "step int, left_sym string, right_sym string, pair_weight long"
    )


def _bpe_encode_oracle() -> str:
    iters = ",".join(_bpe_iter_sql(k) for k in range(N_MERGES))
    return f"""
WITH v0 AS MATERIALIZED (
  SELECT tok, COUNT(*) AS freq,
         LIST_TRANSFORM(RANGE(1, LEN(tok) + 1), i -> tok[i]) AS s
  FROM (SELECT UNNEST(STRING_SPLIT(text, ' ')) AS tok FROM documents)
  GROUP BY tok
),
{iters},
enc AS (SELECT tok, LEN(s) AS n_sym, LEN(tok) AS n_chars
        FROM v{N_MERGES}),
toks AS (
  SELECT source, UNNEST(STRING_SPLIT(text, ' ')) AS tok FROM documents
)
SELECT t.source,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(e.n_sym) AS BIGINT) AS n_symbols,
       CAST(SUM(e.n_chars) AS BIGINT) AS n_chars,
       ROUND(CAST(SUM(e.n_chars) AS DOUBLE) / SUM(e.n_sym), 6)
         AS chars_per_symbol
FROM toks t JOIN enc e ON t.tok = e.tok
GROUP BY t.source
"""


@register(
    "bpe_encode_stats",
    oracle=_bpe_encode_oracle(),
    doc=f"BPE ENCODE — the serving half of the tokenizer pair: the "
        f"{N_MERGES} learned merges are APPLIED to every word type "
        "(the same greedy left-to-right fold training uses), and "
        "each source reports its corpus token count, post-merge "
        "symbol count, character count, and chars-per-symbol "
        "compression — how a tokenizer's effective compression is "
        "audited per data source before training. Scale shape is "
        "the tokenizer serving pattern itself: encode runs on the "
        "WORD-TYPE table (millions of types, not billions of "
        "tokens) and the corpus only joins the tiny encoded "
        "vocabulary by token — at 100 TB that join broadcasts. The "
        "oracle replays training AND application as chained CTEs, "
        "so every merged symbol list is value-certified through the "
        "per-source sums.",
    tags=("text", "bpe", "tokenizer", "join", "aggregate"),
)
def bpe_encode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    _, vocab = bpe_train(docs)
    enc = vocab.select(
        "tok",
        F.size("s").alias("n_sym"),
        F.length("tok").alias("n_chars"),
    )
    toks = docs.select(
        "source", F.explode(F.split("text", " ")).alias("tok")
    )
    return (
        toks.join(F.broadcast(enc), "tok")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("n_sym").cast("long").alias("n_symbols"),
            F.sum("n_chars").cast("long").alias("n_chars"),
            F.round(
                F.sum("n_chars").cast("double") / F.sum("n_sym"), 6
            ).alias("chars_per_symbol"),
        )
    )
