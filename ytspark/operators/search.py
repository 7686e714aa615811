"""Full-text search operators: inverted index build, TF-IDF term
weighting, and BM25 ranked retrieval over the ``documents`` table.

A training-data pipeline needs keyword search over its corpus (corpus
exploration, targeted decontamination, quality forensics: "show me the
documents that mention X"). The reference delegates all text handling
to warehouse SQL (reference ``dags/dbt/.../YT_Facts_stg.sql`` only
projects and casts), so this family is engine-native surface beyond
the reference, built the Spark-first way:

- **inverted_index_stats** — the index build is ONE explode + ONE
  groupBy(term): tf per (doc, term) folds map-side, then per-term
  postings statistics (document frequency, total term frequency, an
  order-independent postings certificate) aggregate with map-side
  combine. No collect, no driver state; at 100 TB the index is just
  another partitioned table keyed by term.
- **tfidf_top_terms** — per-document top-k characteristic terms.
  Corpus size N enters as a broadcast one-row scalar (crossJoin of a
  1-row aggregate — same pattern as the scalar subqueries elsewhere in
  the engine), document frequency joins on term, and the top-k is a
  rank window partitioned by doc_id, so the plan is two shuffles
  (term, then doc) regardless of corpus size.
- **bm25_search** — ranked retrieval for a literal query. The crucial
  scale property: the posting table is filtered to the query's terms
  BEFORE any join or shuffle (predicate pushdown straight onto the
  exploded terms), so serving cost is O(postings of the query terms),
  not O(corpus). Per-term IDF stats are a handful of rows and
  broadcast; document length joins co-keyed on doc_id.

Scores are rounded (6 dp) before ranking and comparison: both engines
evaluate the same IEEE-double expression tree, and rounding absorbs
the libm ulp-level differences (same policy as token_zipf_slope).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ytspark.operators.text import knuth_hash_col, knuth_hash_sql, tokens
from ytspark.plans.scale import finish
from ytspark.queries import register
from ytspark.session import load_tables

# postings-certificate modulus: sum(knuth_hash % POST_MOD) stays far
# below int64 even for trillion-document corpora
POST_MOD = 1_000_003

BM25_K1 = 1.2
BM25_B = 0.75
BM25_QUERY = ("table", "join", "window")
BM25_TOP = 20


def doc_terms(docs: DataFrame) -> DataFrame:
    """(doc_id, term, tf) — one explode, one partial-agg groupBy."""
    return (
        docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def _corpus_scalars(docs: DataFrame) -> DataFrame:
    """One-row (n_docs, avg_dl) frame for broadcast crossJoin."""
    return docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.array_size(tokens(F.col("text")))).alias("avg_dl"),
    )


_INDEX_ORACLE = f"""
WITH dt AS (
  SELECT doc_id, t AS term, COUNT(*) AS tf
  FROM (SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS t FROM documents)
  GROUP BY doc_id, t
)
SELECT term,
       COUNT(*) AS doc_freq,
       CAST(SUM(tf) AS BIGINT) AS total_tf,
       MIN(doc_id) AS first_doc,
       MAX(doc_id) AS last_doc,
       CAST(SUM({knuth_hash_sql("doc_id")} % {POST_MOD}) AS BIGINT)
         AS postings_hash
FROM dt
GROUP BY term
"""


@register(
    "inverted_index_stats",
    oracle=_INDEX_ORACLE,
    doc="Inverted-index build over the corpus: per term, document "
        "frequency, total term frequency, first/last posting and an "
        "order-independent postings certificate (sum of the overflow-"
        "safe cross-engine Knuth hash of each posting doc_id, the hash "
        "already oracle-proven by train_val_test_split). Certifies the "
        "full posting lists value-exactly without emitting array "
        "columns. Plan: one explode + two hash aggregates, both "
        "map-side combinable; the index is an ordinary partitioned "
        "table at scale.",
    tags=("search", "text", "index", "aggregate"),
)
def inverted_index_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    return doc_terms(docs).groupBy("term").agg(
        F.count(F.lit(1)).alias("doc_freq"),
        F.sum("tf").alias("total_tf"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
        F.sum(F.pmod(knuth_hash_col(F.col("doc_id")), F.lit(POST_MOD))).alias(
            "postings_hash"
        ),
    )


TFIDF_TOP = 3

_TFIDF_ORACLE = f"""
WITH dt AS (
  SELECT doc_id, t AS term, COUNT(*) AS tf
  FROM (SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS t FROM documents)
  GROUP BY doc_id, t
),
df AS (SELECT term, COUNT(*) AS doc_freq FROM dt GROUP BY term),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT dt.doc_id, dt.term,
         ROUND(dt.tf * LN(CAST(n.n_docs AS DOUBLE) / df.doc_freq), 6)
           AS tfidf,
         ROW_NUMBER() OVER (
           PARTITION BY dt.doc_id
           ORDER BY ROUND(dt.tf * LN(CAST(n.n_docs AS DOUBLE) / df.doc_freq),
                          6) DESC,
                    dt.term
         ) AS rk
  FROM dt JOIN df USING (term) CROSS JOIN n
)
SELECT doc_id, rk, term, tfidf FROM scored WHERE rk <= {TFIDF_TOP}
"""


@register(
    "tfidf_top_terms",
    oracle=_TFIDF_ORACLE,
    doc=f"Top-{TFIDF_TOP} characteristic terms per document by TF-IDF "
        "(tf * ln(N/df)), ranked on the ROUNDED score with a term "
        "tiebreak so both engines select identically. N is a broadcast "
        "one-row scalar; df joins on term; the top-k is one rank "
        "window partitioned by doc_id — two shuffles total, "
        "corpus-size independent.",
    tags=("search", "text", "window", "join"),
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    dt = doc_terms(docs)
    df = dt.groupBy("term").agg(F.count(F.lit(1)).alias("doc_freq"))
    n = F.broadcast(docs.agg(F.count(F.lit(1)).alias("n_docs")))
    scored = (
        dt.join(df, "term")
        .crossJoin(n)
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf")
                * F.log(F.col("n_docs").cast("double") / F.col("doc_freq")),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        # long: DuckDB ROW_NUMBER is BIGINT (width parity)
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= TFIDF_TOP)
        .select("doc_id", "rk", "term", "tfidf")
    )


def _bm25_score() -> Column:
    """BM25 term contribution from (tf, doc_freq, dl, n_docs, avg_dl)."""
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("doc_freq") + F.lit(0.5))
        / (F.col("doc_freq") + F.lit(0.5))
    )
    tf = F.col("tf").cast("double")
    norm = F.lit(BM25_K1) * (
        F.lit(1.0 - BM25_B)
        + F.lit(BM25_B) * F.col("dl") / F.col("avg_dl")
    )
    return idf * tf * F.lit(BM25_K1 + 1.0) / (tf + norm)


_BM25_QUERY_SQL = ", ".join(f"'{t}'" for t in BM25_QUERY)

_BM25_ORACLE = f"""
WITH dt AS (
  SELECT doc_id, t AS term, COUNT(*) AS tf
  FROM (SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS t FROM documents)
  WHERE t IN ({_BM25_QUERY_SQL})
  GROUP BY doc_id, t
),
stats AS (
  SELECT term, COUNT(*) AS doc_freq FROM dt GROUP BY term
),
dl AS (
  SELECT doc_id, LEN(STRING_SPLIT(text, ' ')) AS dl FROM documents
),
n AS (
  SELECT COUNT(*) AS n_docs,
         AVG(LEN(STRING_SPLIT(text, ' '))) AS avg_dl
  FROM documents
),
scored AS (
  SELECT dt.doc_id,
         SUM(
           LN(1.0 + (n.n_docs - s.doc_freq + 0.5) / (s.doc_freq + 0.5))
           * dt.tf * ({BM25_K1} + 1.0)
           / (dt.tf + {BM25_K1}
              * (1.0 - {BM25_B} + {BM25_B} * dl.dl / n.avg_dl))
         ) AS score,
         COUNT(*) AS n_terms_hit
  FROM dt
  JOIN stats s USING (term)
  JOIN dl USING (doc_id)
  CROSS JOIN n
  GROUP BY dt.doc_id
)
SELECT doc_id, ROUND(score, 6) AS bm25, n_terms_hit
FROM scored
ORDER BY ROUND(score, 6) DESC, doc_id
LIMIT {BM25_TOP}
"""

@register(
    "bm25_search",
    oracle=_BM25_ORACLE,
    doc=f"BM25 (k1={BM25_K1}, b={BM25_B}) ranked retrieval of the "
        f"top-{BM25_TOP} documents for the query {BM25_QUERY}. The "
        "posting table is filtered to the query terms BEFORE any "
        "shuffle, so serving is O(query-term postings) not O(corpus); "
        "the per-term IDF table (|query| rows) broadcasts, document "
        "length joins on doc_id, and ranking sorts the rounded score "
        "with a doc_id tiebreak so both engines pick the same top-k.",
    tags=("search", "text", "join", "topk"),
)
def bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    scored = bm25_scores(docs)
    return scored.orderBy(F.desc("bm25"), F.asc("doc_id")).limit(BM25_TOP)


def bm25_scores(docs: DataFrame) -> DataFrame:
    """(doc_id, bm25, n_terms_hit) for every doc matching ≥1 query
    term; shared by bm25_search and the hybrid RRF fusion."""
    # postings restricted to query terms before the tf aggregation:
    # the IN filter sits directly on the exploded term column
    dt = (
        docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
        .where(F.col("term").isin(*BM25_QUERY))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    stats = F.broadcast(
        dt.groupBy("term").agg(F.count(F.lit(1)).alias("doc_freq"))
    )
    dl = docs.select(
        "doc_id", F.array_size(tokens(F.col("text"))).cast("double").alias("dl")
    )
    n = F.broadcast(_corpus_scalars(docs))

    return (
        dt.join(stats, "term")
        .join(dl, "doc_id")
        .crossJoin(n)
        .groupBy("doc_id")
        .agg(
            F.sum(_bm25_score()).alias("score"),
            F.count(F.lit(1)).alias("n_terms_hit"),
        )
        .select(
            "doc_id",
            F.round(F.col("score"), 6).alias("bm25"),
            "n_terms_hit",
        )
    )


RRF_K = 60  # standard reciprocal-rank-fusion constant
RRF_LIST = 50  # per-retriever candidate list length
RRF_TOP = 20
HYBRID_QUERY_VEC = 0  # vec_id of the query embedding (= doc_id 0)

_HYBRID_ORACLE = f"""
WITH dt AS (
  SELECT doc_id, t AS term, COUNT(*) AS tf
  FROM (SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS t FROM documents)
  WHERE t IN ({_BM25_QUERY_SQL})
  GROUP BY doc_id, t
),
stats AS (SELECT term, COUNT(*) AS doc_freq FROM dt GROUP BY term),
dl AS (SELECT doc_id, LEN(STRING_SPLIT(text, ' ')) AS dl FROM documents),
n AS (SELECT COUNT(*) AS n_docs,
             AVG(LEN(STRING_SPLIT(text, ' '))) AS avg_dl FROM documents),
bm AS (
  SELECT dt.doc_id, ROUND(SUM(
           LN(1.0 + (n.n_docs - s.doc_freq + 0.5) / (s.doc_freq + 0.5))
           * dt.tf * ({BM25_K1} + 1.0)
           / (dt.tf + {BM25_K1}
              * (1.0 - {BM25_B} + {BM25_B} * dl.dl / n.avg_dl))), 6) AS bm25
  FROM dt JOIN stats s USING (term) JOIN dl USING (doc_id) CROSS JOIN n
  WHERE dt.doc_id <> {HYBRID_QUERY_VEC}
  GROUP BY dt.doc_id
),
bm_rank AS (
  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS rb
  FROM bm QUALIFY rb <= {RRF_LIST}
),
q AS (
  SELECT embedding::DOUBLE[] AS qv FROM embeddings
  WHERE vec_id = {HYBRID_QUERY_VEC}
),
cos AS (
  SELECT e.vec_id AS doc_id,
         ROUND(LIST_DOT_PRODUCT(q.qv, e.embedding::DOUBLE[])
               / (SQRT(LIST_DOT_PRODUCT(q.qv, q.qv))
                  * SQRT(LIST_DOT_PRODUCT(e.embedding::DOUBLE[],
                                          e.embedding::DOUBLE[]))), 6)
           AS cos_sim
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id <> {HYBRID_QUERY_VEC}
),
cos_rank AS (
  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY cos_sim DESC, doc_id) AS rc
  FROM cos QUALIFY rc <= {RRF_LIST}
),
fused AS (
  SELECT COALESCE(b.doc_id, c.doc_id) AS doc_id,
         ROUND(COALESCE(1.0 / ({RRF_K} + b.rb), 0.0)
               + COALESCE(1.0 / ({RRF_K} + c.rc), 0.0), 6) AS rrf,
         b.rb AS bm25_rank, c.rc AS cos_rank
  FROM bm_rank b FULL OUTER JOIN cos_rank c ON b.doc_id = c.doc_id
)
SELECT doc_id, rrf, bm25_rank, cos_rank
FROM fused
ORDER BY rrf DESC, doc_id
LIMIT {RRF_TOP}
"""


@register(
    "hybrid_search_rrf",
    oracle=_HYBRID_ORACLE,
    doc=f"Hybrid retrieval with reciprocal-rank fusion: the BM25 "
        f"top-{RRF_LIST} (lexical) and embedding-cosine top-{RRF_LIST} "
        "(semantic, query = the corpus embedding paired with doc 0) "
        "candidate lists fuse by RRF score 1/(k+rank), k=60 — the "
        "standard two-retriever serving stack. Ranks are taken over "
        "ROUNDED scores with doc_id tiebreaks so both engines select "
        "identical lists; the fusion arithmetic is two exact-rounded "
        "IEEE divisions. Each retriever keeps its own scale path "
        "(query-term-pruned postings; ANN index instead of the "
        "brute-force scorer at corpus scale) because RRF consumes "
        "only ranks — fusion cost is O(list length), independent of "
        "corpus size.",
    tags=("search", "similarity", "join", "topk"),
)
def hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from ytspark.operators.similarity import as_double, cosine

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    emb = load_tables(spark, sf_dir, "embeddings")["embeddings"]

    # top-RRF_LIST via orderBy+limit (TakeOrderedAndProject: per-
    # partition partial top-k, no global sort), THEN rank — the
    # unpartitioned window runs over ≤RRF_LIST rows, never the corpus
    bm = bm25_scores(docs).where(F.col("doc_id") != HYBRID_QUERY_VEC)
    wb = Window.orderBy(F.desc("bm25"), F.asc("doc_id"))
    bm_rank = (
        bm.orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(RRF_LIST)
        .withColumn("rb", F.row_number().over(wb))
        .select("doc_id", "rb")
    )

    corpus = emb.select("vec_id", as_double(F.col("embedding")).alias("v"))
    qv = F.broadcast(
        corpus.where(F.col("vec_id") == HYBRID_QUERY_VEC).select(
            F.col("v").alias("qv")
        )
    )
    cos = (
        corpus.where(F.col("vec_id") != HYBRID_QUERY_VEC)
        .crossJoin(qv)
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(cosine(F.col("qv"), F.col("v")), 6).alias("cos_sim"),
        )
    )
    wc = Window.orderBy(F.desc("cos_sim"), F.asc("doc_id"))
    cos_rank = (
        cos.orderBy(F.desc("cos_sim"), F.asc("doc_id"))
        .limit(RRF_LIST)
        .withColumn("rc", F.row_number().over(wc))
        .select(F.col("doc_id").alias("c_doc_id"), "rc")
    )

    fused = bm_rank.join(
        cos_rank, bm_rank["doc_id"] == cos_rank["c_doc_id"], "full_outer"
    ).select(
        F.coalesce(F.col("doc_id"), F.col("c_doc_id")).alias("doc_id"),
        F.round(
            F.coalesce(F.lit(1.0) / (F.lit(RRF_K) + F.col("rb")), F.lit(0.0))
            + F.coalesce(
                F.lit(1.0) / (F.lit(RRF_K) + F.col("rc")), F.lit(0.0)
            ),
            6,
        ).alias("rrf"),
        F.col("rb").alias("bm25_rank"),
        F.col("rc").alias("cos_rank"),
    )
    return fused.orderBy(F.desc("rrf"), F.asc("doc_id")).limit(RRF_TOP)


# ---------------------------------------------------------------------------
# Positional phrase search: consecutive-position posting intersection
# ---------------------------------------------------------------------------


@register(
    "phrase_search_positional",
    oracle="""
WITH toks AS (
  SELECT doc_id,
         UNNEST(STRING_SPLIT(text, ' ')) AS term,
         UNNEST(RANGE(0, LEN(STRING_SPLIT(text, ' ')))) AS pos
  FROM documents
),
big AS (
  SELECT t1.term AS w1, t2.term AS w2, COUNT(*) AS c
  FROM toks t1 JOIN toks t2
    ON t2.doc_id = t1.doc_id AND t2.pos = t1.pos + 1
  GROUP BY t1.term, t2.term
),
top AS (SELECT w1, w2 FROM big ORDER BY c DESC, w1, w2 LIMIT 1),
occ AS (
  SELECT t1.doc_id, COUNT(*) AS n_occurrences
  FROM toks t1
  JOIN top ON t1.term = top.w1
  JOIN toks t2 ON t2.doc_id = t1.doc_id
             AND t2.pos = t1.pos + 1 AND t2.term = top.w2
  GROUP BY t1.doc_id
)
SELECT occ.doc_id, top.w1, top.w2,
       CAST(occ.n_occurrences AS BIGINT) AS n_occurrences
FROM occ CROSS JOIN top
""",
    doc="PHRASE search over a positional inverted index — exact "
        "consecutive-word match, the IR capability bag-of-words "
        "retrieval (TF-IDF/BM25 above) cannot express. The index is "
        "(doc, term, position) postings from one posexplode; the "
        "query phrase is data-derived (the corpus's most frequent "
        "bigram, fully tie-broken) so the query is deterministic at "
        "every scale; matching is the classic positional-intersect: "
        "filter postings to the phrase's terms FIRST (predicate "
        "pushdown to the explode — serving cost is O(postings of "
        "the two terms), not O(corpus)), then equi-join on (doc_id, "
        "pos + 1). The phrase-selection top-1 is a "
        "TakeOrderedAndProject (no global window); the 1-row phrase "
        "broadcasts into both posting filters. Output: every "
        "matching doc with its occurrence count.",
    tags=("search", "text", "join", "aggregate"),
)
def phrase_search_positional(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("pos", "term"),
    ).persist()
    t1, t2 = toks.alias("t1"), toks.alias("t2")
    big = (
        t1.join(
            t2,
            (F.col("t2.doc_id") == F.col("t1.doc_id"))
            & (F.col("t2.pos") == F.col("t1.pos") + 1),
        )
        .groupBy(F.col("t1.term").alias("w1"), F.col("t2.term").alias("w2"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    top = big.orderBy(F.desc("c"), "w1", "w2").limit(1).select("w1", "w2")
    m1 = toks.join(F.broadcast(top), F.col("term") == F.col("w1")).select(
        "doc_id", "pos", "w1", "w2"
    )
    occ = (
        m1.alias("m")
        .join(
            t2,
            (F.col("t2.doc_id") == F.col("m.doc_id"))
            & (F.col("t2.pos") == F.col("m.pos") + 1)
            & (F.col("t2.term") == F.col("m.w2")),
        )
        .groupBy(F.col("m.doc_id").alias("doc_id"), "w1", "w2")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
    # bounded (matching docs only); release the postings cache
    return finish(
        occ.select(
            "doc_id", "w1", "w2", F.col("n_occurrences").cast("long")
            .alias("n_occurrences")
        ),
        toks,
    )


# ---------------------------------------------------------------------------
# Retriever agreement evaluation: BM25 vs embedding ranking concordance
# ---------------------------------------------------------------------------

AGREE_AT = 10  # head-overlap depth


_AGREE_ORACLE = f"""
WITH dt AS (
  SELECT doc_id, t AS term, COUNT(*) AS tf
  FROM (SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS t FROM documents)
  WHERE t IN ({_BM25_QUERY_SQL})
  GROUP BY doc_id, t
),
stats AS (SELECT term, COUNT(*) AS doc_freq FROM dt GROUP BY term),
dl AS (SELECT doc_id, LEN(STRING_SPLIT(text, ' ')) AS dl FROM documents),
n AS (SELECT COUNT(*) AS n_docs,
             AVG(LEN(STRING_SPLIT(text, ' '))) AS avg_dl FROM documents),
bm AS (
  SELECT dt.doc_id, ROUND(SUM(
           LN(1.0 + (n.n_docs - s.doc_freq + 0.5) / (s.doc_freq + 0.5))
           * dt.tf * ({BM25_K1} + 1.0)
           / (dt.tf + {BM25_K1}
              * (1.0 - {BM25_B} + {BM25_B} * dl.dl / n.avg_dl))), 6) AS bm25
  FROM dt JOIN stats s USING (term) JOIN dl USING (doc_id) CROSS JOIN n
  WHERE dt.doc_id <> {HYBRID_QUERY_VEC}
  GROUP BY dt.doc_id
),
bm_rank AS (
  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS rb
  FROM bm QUALIFY rb <= {RRF_LIST}
),
q AS (
  SELECT embedding::DOUBLE[] AS qv FROM embeddings
  WHERE vec_id = {HYBRID_QUERY_VEC}
),
cos AS (
  SELECT e.vec_id AS doc_id,
         ROUND(LIST_DOT_PRODUCT(q.qv, e.embedding::DOUBLE[])
               / (SQRT(LIST_DOT_PRODUCT(q.qv, q.qv))
                  * SQRT(LIST_DOT_PRODUCT(e.embedding::DOUBLE[],
                                          e.embedding::DOUBLE[]))), 6)
           AS cos_sim
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id <> {HYBRID_QUERY_VEC}
),
cos_rank AS (
  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY cos_sim DESC, doc_id) AS rc
  FROM cos QUALIFY rc <= {RRF_LIST}
),
common AS (
  SELECT b.doc_id, b.rb, c.rc
  FROM bm_rank b JOIN cos_rank c ON b.doc_id = c.doc_id
),
pairs AS (
  SELECT CAST(SUM(CASE WHEN (a.rb - b.rb) * (a.rc - b.rc) > 0
                  THEN 1 ELSE 0 END) AS BIGINT) AS concordant,
         CAST(SUM(CASE WHEN (a.rb - b.rb) * (a.rc - b.rc) < 0
                  THEN 1 ELSE 0 END) AS BIGINT) AS discordant
  FROM common a JOIN common b ON a.doc_id < b.doc_id
)
SELECT CAST((SELECT COUNT(*) FROM common) AS BIGINT) AS n_common,
       CAST((SELECT COUNT(*) FROM common
             WHERE rb <= {AGREE_AT} AND rc <= {AGREE_AT}) AS BIGINT)
         AS overlap_at_{AGREE_AT},
       concordant, discordant,
       CASE WHEN concordant + discordant = 0 THEN NULL
            ELSE ROUND(CAST(concordant - discordant AS DOUBLE)
                       / (concordant + discordant), 6) END AS kendall_tau
FROM pairs
"""


@register(
    "search_rank_agreement_eval",
    oracle=_AGREE_ORACLE,
    doc=f"RETRIEVER AGREEMENT evaluation for the hybrid-search family: "
        f"the BM25 top-{RRF_LIST} and embedding-cosine top-{RRF_LIST} "
        "lists that hybrid_search_rrf fuses are compared directly — "
        f"head overlap at {AGREE_AT}, common-list size, and Kendall "
        "tau over the commonly-retrieved docs (concordant minus "
        "discordant rank pairs over their total; ranks are distinct "
        "integers so tau is exact-integer arithmetic with one rounded "
        "division). LOW agreement is the justification for fusion — "
        "RRF only helps when the retrievers disagree — and this "
        "measures it in-engine, the same closing-the-loop move as "
        "ann_recall_eval for the ANN index. Cost after the two "
        f"retrievals is pairs over a <= {RRF_LIST}-doc common list — "
        "nothing data-sized; the retrievals themselves reuse the "
        "certified BM25 and cosine pipelines.",
    tags=("search", "evaluation", "statistics", "join", "aggregate"),
)
def search_rank_agreement_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from ytspark.operators.similarity import as_double, cosine

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    emb = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    bm = bm25_scores(docs).where(F.col("doc_id") != HYBRID_QUERY_VEC)
    wb = Window.orderBy(F.desc("bm25"), F.asc("doc_id"))
    bm_rank = (
        bm.orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(RRF_LIST)
        .withColumn("rb", F.row_number().over(wb))
        .select("doc_id", "rb")
    )
    corpus = emb.select("vec_id", as_double(F.col("embedding")).alias("v"))
    qv = F.broadcast(
        corpus.where(F.col("vec_id") == HYBRID_QUERY_VEC).select(
            F.col("v").alias("qv")
        )
    )
    cos = (
        corpus.where(F.col("vec_id") != HYBRID_QUERY_VEC)
        .crossJoin(qv)
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(cosine(F.col("qv"), F.col("v")), 6).alias("cos_sim"),
        )
    )
    wc = Window.orderBy(F.desc("cos_sim"), F.asc("doc_id"))
    cos_rank = (
        cos.orderBy(F.desc("cos_sim"), F.asc("doc_id"))
        .limit(RRF_LIST)
        .withColumn("rc", F.row_number().over(wc))
        .select("doc_id", "rc")
    )
    common = bm_rank.join(cos_rank, "doc_id").localCheckpoint(eager=True)
    a = common.select(
        F.col("doc_id").alias("da"), F.col("rb").alias("rba"),
        F.col("rc").alias("rca"),
    )
    b = common.select(
        F.col("doc_id").alias("db"), F.col("rb").alias("rbb"),
        F.col("rc").alias("rcb"),
    )
    prod = (F.col("rba") - F.col("rbb")) * (F.col("rca") - F.col("rcb"))
    pairs = (
        a.join(b, F.col("da") < F.col("db"))
        .agg(
            F.sum((prod > 0).cast("int")).alias("concordant"),
            F.sum((prod < 0).cast("int")).alias("discordant"),
        )
    )
    nstats = common.agg(
        F.count(F.lit(1)).alias("n_common"),
        # COALESCE: the overlap is a COUNT — over an EMPTY common list
        # (the retrievers can fully disagree; they do at sf0.1) it must
        # be 0 like the oracle's COUNT(*), not SUM's NULL
        F.coalesce(
            F.sum(
                (
                    (F.col("rb") <= AGREE_AT) & (F.col("rc") <= AGREE_AT)
                ).cast("int")
            ),
            F.lit(0),
        ).alias("ov"),
    )
    tau_den = F.col("concordant") + F.col("discordant")
    return nstats.crossJoin(F.broadcast(pairs)).select(
        F.col("n_common").cast("long").alias("n_common"),
        F.col("ov").cast("long").alias(f"overlap_at_{AGREE_AT}"),
        F.col("concordant").cast("long").alias("concordant"),
        F.col("discordant").cast("long").alias("discordant"),
        F.when(tau_den == 0, F.lit(None).cast("double"))
        .otherwise(
            F.round(
                (F.col("concordant") - F.col("discordant")).cast("double")
                / tau_den,
                6,
            )
        )
        .alias("kendall_tau"),
    )


# ---------------------------------------------------------------------------
# Pseudo-relevance-feedback (PRF) query expansion for BM25
# ---------------------------------------------------------------------------

PRF_FEEDBACK_K = 10  # base-retrieval docs used as feedback
PRF_EXPANSION_E = 3  # expansion terms added to the query
PRF_MIN_FEEDBACK_DF = 2  # expansion term must appear in >= 2 feedback docs
PRF_TOP = 20


_PRF_ORACLE = f"""
WITH dt_all AS (
  SELECT doc_id, t AS term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS t FROM documents)
  GROUP BY doc_id, t
),
stats_all AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS doc_freq
  FROM dt_all GROUP BY term
),
dl AS (SELECT doc_id, LEN(STRING_SPLIT(text, ' ')) AS dl FROM documents),
n AS (SELECT COUNT(*) AS n_docs,
             AVG(LEN(STRING_SPLIT(text, ' '))) AS avg_dl FROM documents),
base AS (
  SELECT dt.doc_id, ROUND(SUM(
           LN(1.0 + (n.n_docs - s.doc_freq + 0.5) / (s.doc_freq + 0.5))
           * dt.tf * ({BM25_K1} + 1.0)
           / (dt.tf + {BM25_K1}
              * (1.0 - {BM25_B} + {BM25_B} * dl.dl / n.avg_dl))), 6) AS bm25
  FROM dt_all dt JOIN stats_all s USING (term)
  JOIN dl USING (doc_id) CROSS JOIN n
  WHERE dt.term IN ({_BM25_QUERY_SQL})
  GROUP BY dt.doc_id
),
feedback AS (
  SELECT doc_id FROM base
  ORDER BY bm25 DESC, doc_id LIMIT {PRF_FEEDBACK_K}
),
exp_terms AS (
  SELECT term FROM (
    SELECT dt.term,
           ROUND(SUM(dt.tf * LN(CAST(n.n_docs AS DOUBLE) / s.doc_freq)), 6)
             AS w,
           COUNT(*) AS fb_df
    FROM dt_all dt
    JOIN feedback f USING (doc_id)
    JOIN stats_all s USING (term)
    CROSS JOIN n
    WHERE dt.term NOT IN ({_BM25_QUERY_SQL})
    GROUP BY dt.term
  )
  WHERE fb_df >= {PRF_MIN_FEEDBACK_DF}
  ORDER BY w DESC, term LIMIT {PRF_EXPANSION_E}
),
qterms AS (
  SELECT UNNEST([{_BM25_QUERY_SQL}]) AS term
  UNION SELECT term FROM exp_terms
),
expanded AS (
  SELECT dt.doc_id, ROUND(SUM(
           LN(1.0 + (n.n_docs - s.doc_freq + 0.5) / (s.doc_freq + 0.5))
           * dt.tf * ({BM25_K1} + 1.0)
           / (dt.tf + {BM25_K1}
              * (1.0 - {BM25_B} + {BM25_B} * dl.dl / n.avg_dl))), 6)
           AS bm25_expanded
  FROM dt_all dt
  JOIN qterms q USING (term)
  JOIN stats_all s USING (term)
  JOIN dl USING (doc_id) CROSS JOIN n
  GROUP BY dt.doc_id
),
terms_str AS (
  SELECT STRING_AGG(term, ',' ORDER BY term) AS exp_terms FROM exp_terms
)
SELECT e.doc_id, e.bm25_expanded,
       b.bm25 IS NOT NULL AS was_in_base,
       t.exp_terms
FROM expanded e
LEFT JOIN base b ON b.doc_id = e.doc_id
CROSS JOIN terms_str t
ORDER BY e.bm25_expanded DESC, e.doc_id
LIMIT {PRF_TOP}
"""


@register(
    "bm25_prf_expansion",
    oracle=_PRF_ORACLE,
    doc=f"PSEUDO-RELEVANCE-FEEDBACK query expansion (Rocchio-style "
        f"PRF): the BM25 top-{PRF_FEEDBACK_K} for the literal query "
        f"become feedback docs, the top-{PRF_EXPANSION_E} non-query "
        "terms by feedback TF-IDF mass (appearing in >= "
        f"{PRF_MIN_FEEDBACK_DF} feedback docs, rounded-weight + term "
        "tiebreak so selection is a cross-engine total order) join "
        "the query, and BM25 re-runs over the expanded term set — "
        "the classic recall lever when literal queries miss "
        "vocabulary variants. Every ranked row carries the chosen "
        "expansion terms and whether it was reachable by the base "
        "query, so the gate certifies the term SELECTION and the "
        "re-ranking in one result. Serving cost stays O(postings of "
        "query+expansion terms): the term filter lands on the "
        "exploded postings before any join, feedback is a bounded "
        "top-k, and expansion scoring touches only feedback-doc "
        "postings.",
    tags=("search", "text", "prf", "join", "topk"),
)
def bm25_prf_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    dt_all = (
        docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    stats_all = dt_all.groupBy("term").agg(
        F.count(F.lit(1)).alias("doc_freq")
    )
    dl = docs.select(
        "doc_id", F.array_size(tokens(F.col("text"))).cast("double").alias("dl")
    )
    n = F.broadcast(_corpus_scalars(docs))

    def bm25_over(terms_df):
        return (
            dt_all.join(F.broadcast(terms_df), "term")
            .join(stats_all, "term")
            .join(dl, "doc_id")
            .crossJoin(n)
            .groupBy("doc_id")
            .agg(F.round(F.sum(_bm25_score()), 6).alias("score"))
        )

    qterms = spark.createDataFrame(
        [(t,) for t in BM25_QUERY], "term string"
    )
    base = bm25_over(qterms)
    feedback = (
        base.orderBy(F.desc("score"), "doc_id")
        .limit(PRF_FEEDBACK_K)
        .select("doc_id")
    )
    exp_terms = (
        dt_all.join(F.broadcast(feedback), "doc_id")
        .where(~F.col("term").isin(*BM25_QUERY))
        .join(stats_all, "term")
        .crossJoin(n)
        .groupBy("term")
        .agg(
            F.round(
                F.sum(
                    F.col("tf")
                    * F.log(F.col("n_docs").cast("double") / F.col("doc_freq"))
                ),
                6,
            ).alias("w"),
            F.count(F.lit(1)).alias("fb_df"),
        )
        .where(F.col("fb_df") >= PRF_MIN_FEEDBACK_DF)
        .orderBy(F.desc("w"), "term")
        .limit(PRF_EXPANSION_E)
        .select("term")
        .localCheckpoint(eager=True)  # bounded; read by union + string agg
    )
    all_terms = qterms.unionByName(exp_terms).distinct()
    expanded = bm25_over(all_terms).withColumnRenamed(
        "score", "bm25_expanded"
    )
    terms_str = exp_terms.agg(
        F.concat_ws(",", F.array_sort(F.collect_list("term"))).alias(
            "exp_terms"
        )
    )
    return (
        expanded.join(
            base.select("doc_id").withColumn("ib", F.lit(1)), "doc_id", "left"
        )
        .crossJoin(F.broadcast(terms_str))
        .select(
            "doc_id",
            "bm25_expanded",
            F.col("ib").isNotNull().alias("was_in_base"),
            "exp_terms",
        )
        .orderBy(F.desc("bm25_expanded"), "doc_id")
        .limit(PRF_TOP)
    )


# ---------------------------------------------------------------------------
# Query-likelihood retrieval with Dirichlet smoothing
# ---------------------------------------------------------------------------

QL_MU = 2000.0  # Dirichlet prior mass (standard default)
QL_TOP = 20

_QL_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS t FROM documents
),
dt AS (
  SELECT doc_id, t AS term, COUNT(*) AS tf
  FROM toks WHERE t IN ({_BM25_QUERY_SQL}) GROUP BY doc_id, t
),
ctf AS (
  SELECT t AS term, COUNT(*) AS ctf
  FROM toks WHERE t IN ({_BM25_QUERY_SQL}) GROUP BY t
),
coll AS (SELECT COUNT(*) AS clen FROM toks),
dl AS (
  SELECT doc_id, LEN(STRING_SPLIT(text, ' ')) AS dl FROM documents
),
cand AS (SELECT DISTINCT doc_id FROM dt),
scored AS (
  SELECT cand.doc_id,
         SUM(LN((COALESCE(dt.tf, 0) + {QL_MU} * ctf.ctf / coll.clen)
                / (dl.dl + {QL_MU}))) AS score,
         CAST(SUM(CASE WHEN dt.tf IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_terms_hit
  FROM cand
  CROSS JOIN ctf
  CROSS JOIN coll
  JOIN dl ON dl.doc_id = cand.doc_id
  LEFT JOIN dt ON dt.doc_id = cand.doc_id AND dt.term = ctf.term
  GROUP BY cand.doc_id
)
SELECT doc_id, ROUND(score, 6) AS ql_score, n_terms_hit
FROM scored
ORDER BY ROUND(score, 6) DESC, doc_id
LIMIT {QL_TOP}
"""


@register(
    "query_likelihood_dirichlet",
    oracle=_QL_ORACLE,
    doc="QUERY-LIKELIHOOD retrieval with Dirichlet smoothing (mu="
        f"{QL_MU:g}) for the query {BM25_QUERY} — the language-model "
        "ranking family (Ponte-Croft / Zhai-Lafferty) that complements "
        "BM25's probabilistic-relevance family: score(d) = sum over "
        "query terms of log((tf + mu*P(t|C)) / (dl + mu)). Unlike "
        "BM25, ABSENT query terms still contribute (the smoothed "
        "background mass), so each candidate is scored against the "
        "full |query|-row term grid: candidates (docs hitting >=1 "
        "term, found by filtering postings BEFORE any shuffle) "
        "cross-join the broadcast 3-row collection-frequency table "
        "and LEFT-join their own tf. Serving cost is O(query-term "
        "postings) x |query| — independent of corpus size; collection "
        "stats (ctf per term, total token count) are one extra "
        "aggregate pass each, amortized across a query workload in "
        "practice by keeping them as a tiny stats table. Scores "
        "rounded to 6 dp before ranking with a doc_id tiebreak (the "
        "BM25 cross-engine float policy).",
    tags=("search", "text", "join", "topk"),
)
def query_likelihood_dirichlet(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    toks = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("term")
    )
    qtoks = toks.where(F.col("term").isin(*BM25_QUERY))
    dt = qtoks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    ctf = F.broadcast(
        qtoks.groupBy("term").agg(F.count(F.lit(1)).alias("ctf"))
    )
    coll = F.broadcast(toks.agg(F.count(F.lit(1)).alias("clen")))
    dl = docs.select(
        "doc_id", F.array_size(tokens(F.col("text"))).cast("double").alias("dl")
    )
    cand = dt.select("doc_id").distinct()
    term_ll = F.log(
        (F.coalesce(F.col("tf"), F.lit(0)) + F.lit(QL_MU) * F.col("ctf") / F.col("clen"))
        / (F.col("dl") + F.lit(QL_MU))
    )
    return (
        cand.crossJoin(ctf)  # |cand| x |query| grid, 3-row broadcast side
        .crossJoin(coll)
        .join(dl, "doc_id")
        .join(dt, ["doc_id", "term"], "left")
        .groupBy("doc_id")
        .agg(
            F.sum(term_ll).alias("score"),
            F.sum(F.col("tf").isNotNull().cast("long")).alias("n_terms_hit"),
        )
        .select(
            "doc_id",
            F.round(F.col("score"), 6).alias("ql_score"),
            "n_terms_hit",
        )
        .orderBy(F.desc("ql_score"), F.asc("doc_id"))
        .limit(QL_TOP)
    )


# ---------------------------------------------------------------------------
# Ranking-quality evaluation: nDCG@k of the BM25 ranking
# ---------------------------------------------------------------------------

NDCG_K = 10


@register(
    "ndcg_eval",
    oracle=f"""
WITH base AS ({_BM25_ORACLE}),
ranked AS (
  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS r
  FROM base
),
rel AS (
  SELECT doc_id, COUNT(DISTINCT t) AS rel
  FROM (SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS t FROM documents)
  WHERE t IN ({_BM25_QUERY_SQL})
  GROUP BY doc_id
),
dcg AS (
  SELECT SUM((POW(2, rel.rel) - 1.0) / LOG2(ranked.r + 1.0)) AS dcg
  FROM ranked JOIN rel USING (doc_id)
  WHERE ranked.r <= {NDCG_K}
),
ideal AS (
  SELECT rel, ROW_NUMBER() OVER (ORDER BY rel DESC, doc_id) AS r FROM rel
),
idcg AS (
  SELECT SUM((POW(2, rel) - 1.0) / LOG2(r + 1.0)) AS idcg
  FROM ideal WHERE r <= {NDCG_K}
)
SELECT CAST({NDCG_K} AS BIGINT) AS k,
       CAST((SELECT COUNT(*) FROM rel) AS BIGINT) AS n_rated,
       ROUND(dcg.dcg, 6) AS dcg,
       ROUND(idcg.idcg, 6) AS idcg,
       ROUND(dcg.dcg / idcg.idcg, 6) AS ndcg
FROM dcg CROSS JOIN idcg
""",
    doc=f"nDCG@{NDCG_K} of the BM25 ranking — the standard graded "
        f"ranking-quality metric, closing the eval loop for the "
        f"search family (rank-agreement/Kendall-tau measures "
        f"retriever CONSISTENCY; nDCG measures retriever QUALITY "
        f"against a relevance standard). Graded relevance is the "
        f"distinct-query-term coverage of each document (0..3, exact "
        f"integers), the ranking is BM25's rounded-score/doc_id "
        f"order, and the ideal ranking re-sorts the relevance grades "
        f"— ties contribute identical gain so IDCG is deterministic. "
        f"Scale: relevance is one filtered explode + groupBy "
        f"(O(query-term postings), same pushdown as bm25_search); "
        f"DCG windows run over bounded inputs (the top-{BM25_TOP} "
        f"list; the rated set, bounded by query-term document "
        f"frequency). Both engines evaluate the identical gain "
        f"expression; 6 dp rounding absorbs libm ulps.",
    tags=("search", "evaluation", "text", "topk"),
)
def ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    ranked = (
        bm25_scores(docs)
        .select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.desc("bm25"), F.asc("doc_id")))
            .alias("r"),
        )
        .where(F.col("r") <= NDCG_K)
    )
    rel = (
        docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("t"))
        .where(F.col("t").isin(*BM25_QUERY))
        .groupBy("doc_id")
        .agg(F.count_distinct("t").alias("rel"))
    )
    gain = (F.pow(F.lit(2.0), F.col("rel")) - 1.0) / F.log2(F.col("r") + 1.0)
    dcg = ranked.join(rel, "doc_id").agg(F.sum(gain).alias("dcg"))
    ideal = rel.select(
        "rel",
        F.row_number()
        .over(Window.orderBy(F.desc("rel"), F.asc("doc_id")))
        .alias("r"),
    ).where(F.col("r") <= NDCG_K)
    idcg = ideal.agg(F.sum(gain).alias("idcg"))
    n_rated = rel.agg(F.count(F.lit(1)).cast("long").alias("n_rated"))
    return (
        dcg.crossJoin(F.broadcast(idcg))
        .crossJoin(F.broadcast(n_rated))
        .select(
            F.lit(NDCG_K).cast("long").alias("k"),
            "n_rated",
            F.round("dcg", 6).alias("dcg"),
            F.round("idcg", 6).alias("idcg"),
            F.round(F.col("dcg") / F.col("idcg"), 6).alias("ndcg"),
        )
    )


# ---------------------------------------------------------------------------
# Sparse TF-IDF document-document cosine neighbors via posting lists
# ---------------------------------------------------------------------------

DOC_COS_DFCAP = 30  # vocabulary restricted to terms with df <= this
DOC_COS_TOPK = 5


def _doc_cos_cte() -> str:
    return f"""
dt AS (
  SELECT doc_id, t AS term, COUNT(*) AS tf
  FROM (SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS t FROM documents)
  GROUP BY doc_id, t
),
stats AS (
  SELECT term, COUNT(*) AS df FROM dt GROUP BY term
  HAVING COUNT(*) <= {DOC_COS_DFCAP}
),
nn AS (SELECT COUNT(*) AS n_docs FROM documents),
w AS (
  SELECT dt.doc_id, dt.term,
         dt.tf * LN(1.0 + nn.n_docs / stats.df) AS w
  FROM dt JOIN stats USING (term) CROSS JOIN nn
),
norms AS (
  SELECT doc_id, SQRT(SUM(w * w)) AS nrm FROM w GROUP BY doc_id
),
dots AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, SUM(a.w * b.w) AS dot
  FROM w a JOIN w b ON a.term = b.term AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
cos AS (
  SELECT doc_a, doc_b,
         ROUND(dot / (na.nrm * nb.nrm), 6) AS cosine
  FROM dots
  JOIN norms na ON na.doc_id = doc_a
  JOIN norms nb ON nb.doc_id = doc_b
),
mirrored AS (
  SELECT doc_a AS doc_id, doc_b AS neighbor_id, cosine FROM cos
  UNION ALL
  SELECT doc_b AS doc_id, doc_a AS neighbor_id, cosine FROM cos
)"""


@register(
    "doc_cosine_sparse_topk",
    oracle=f"""
WITH {_doc_cos_cte()}
SELECT doc_id, neighbor_id, cosine,
       CAST(rk AS BIGINT) AS rank
FROM (
  SELECT doc_id, neighbor_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY cosine DESC, neighbor_id) AS rk
  FROM mirrored
) WHERE rk <= {DOC_COS_TOPK}
""",
    doc=f"SPARSE TF-IDF document-document cosine top-{DOC_COS_TOPK} "
        f"neighbors via POSTING-LIST self-join — the lexical "
        f"counterpart of the embedding KNN family (same output "
        f"contract, totally different index): the vocabulary is "
        f"restricted to terms with df <= {DOC_COS_DFCAP} (the "
        f"standard stop-term cut — and the SCALE BOUND: pair volume "
        f"is sum(df^2) <= {DOC_COS_DFCAP} x corpus postings, so the "
        f"self-join is linear in postings with a constant factor, "
        f"never |docs|^2), weights are tf x ln(1 + N/df), cosine is "
        f"EXACT within the filtered space (norms use the same "
        f"vocabulary as the dot products — self-consistent, not a "
        f"truncated estimate), and per-doc top-k ranks on a "
        f"doc_id-partitioned window with a rounded-score/neighbor-id "
        f"tiebreak. At 100 TB this is the classic 'more-like-this' "
        f"serving shape: one term-keyed shuffle for dots, one "
        f"doc-keyed for norms and ranking.",
    tags=("search", "similarity", "text", "topk", "join"),
)
def doc_cosine_sparse_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    dt = doc_terms(docs)
    stats = (
        dt.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") <= DOC_COS_DFCAP)
    )
    nn = F.broadcast(docs.agg(F.count(F.lit(1)).alias("n_docs")))
    w = (
        dt.join(stats, "term")
        .crossJoin(nn)
        .select(
            "doc_id",
            "term",
            (
                F.col("tf")
                * F.log(F.lit(1.0) + F.col("n_docs") / F.col("df"))
            ).alias("w"),
        )
    )
    # w feeds the norms aggregate AND both sides of the self-join —
    # persist once, released via finish() on the bounded result below
    w = w.persist()
    norms = w.groupBy("doc_id").agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm"))
    a, b = w.alias("a"), w.alias("b")
    dots = (
        a.join(
            b,
            (F.col("a.term") == F.col("b.term"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.sum(F.col("a.w") * F.col("b.w")).alias("dot"))
    )
    na = norms.select(F.col("doc_id").alias("doc_a"), F.col("nrm").alias("na"))
    nb = norms.select(F.col("doc_id").alias("doc_b"), F.col("nrm").alias("nb"))
    cos = (
        dots.join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(F.col("dot") / (F.col("na") * F.col("nb")), 6).alias(
                "cosine"
            ),
        )
    )
    both = cos.select(
        F.col("doc_a").alias("doc_id"),
        F.col("doc_b").alias("neighbor_id"),
        "cosine",
    ).unionByName(
        cos.select(
            F.col("doc_b").alias("doc_id"),
            F.col("doc_a").alias("neighbor_id"),
            "cosine",
        )
    )
    wdoc = Window.partitionBy("doc_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    out = both.select(
        "doc_id",
        "neighbor_id",
        "cosine",
        F.row_number().over(wdoc).cast("long").alias("rank"),
    ).where(F.col("rank") <= DOC_COS_TOPK)
    return finish(out, w)


# ---------------------------------------------------------------------------
# Maximal Marginal Relevance (MMR) diversified top-k
# ---------------------------------------------------------------------------

MMR_LAMBDA = "0.7"  # relevance weight (1 - this weighs redundancy)
MMR_K = 5  # diversified results returned
MMR_POOL = BM25_TOP  # candidate pool = the BM25 top-20


def _mmr_oracle() -> str:
    lam = MMR_LAMBDA
    cte = [
        f"cand AS (SELECT doc_id, bm25 AS rel FROM ({_BM25_ORACLE}))",
        """sims AS (
  SELECT a.doc_id AS a, b.doc_id AS b,
         ROUND(LIST_DOT_PRODUCT(ea.embedding::DOUBLE[], eb.embedding::DOUBLE[])
               / (SQRT(LIST_DOT_PRODUCT(ea.embedding::DOUBLE[],
                                        ea.embedding::DOUBLE[]))
                  * SQRT(LIST_DOT_PRODUCT(eb.embedding::DOUBLE[],
                                          eb.embedding::DOUBLE[]))), 6)
           AS sim
  FROM cand a JOIN cand b ON a.doc_id <> b.doc_id
  JOIN embeddings ea ON ea.vec_id = a.doc_id
  JOIN embeddings eb ON eb.vec_id = b.doc_id
)""",
        f"""s1 AS (
  SELECT doc_id, rel, ROUND({lam} * rel, 6) AS mmr
  FROM cand ORDER BY rel DESC, doc_id LIMIT 1
)""",
        "sel1 AS (SELECT doc_id, rel, mmr FROM s1)",
    ]
    for i in range(2, MMR_K + 1):
        cte.append(f"""s{i} AS (
  SELECT c.doc_id, c.rel,
         ROUND({lam} * c.rel - (1 - {lam}) * MAX(s.sim), 6) AS mmr
  FROM cand c JOIN sims s ON s.a = c.doc_id
  WHERE s.b IN (SELECT doc_id FROM sel{i - 1})
    AND c.doc_id NOT IN (SELECT doc_id FROM sel{i - 1})
  GROUP BY c.doc_id, c.rel
  ORDER BY ROUND({lam} * c.rel - (1 - {lam}) * MAX(s.sim), 6) DESC, c.doc_id
  LIMIT 1
)""")
        cte.append(
            f"sel{i} AS (SELECT * FROM sel{i - 1} UNION ALL SELECT * FROM s{i})"
        )
    picks = "\nUNION ALL\n".join(
        f"SELECT CAST({i} AS BIGINT) AS pick_order, doc_id, rel, mmr FROM s{i}"
        for i in range(1, MMR_K + 1)
    )
    return "WITH " + ",\n".join(cte) + "\n" + picks


@register(
    "mmr_diversified_topk",
    oracle=_mmr_oracle(),
    doc=f"MAXIMAL MARGINAL RELEVANCE — diversified retrieval, the "
        f"post-ranking stage production search serves after BM25: "
        f"from the top-{MMR_POOL} BM25 pool, greedily select "
        f"{MMR_K} results maximizing lambda*relevance - "
        f"(1-lambda)*max-similarity-to-already-selected "
        f"(lambda={MMR_LAMBDA}; redundancy measured by embedding "
        f"cosine between candidates — the hybrid lexical-relevance/"
        f"semantic-diversity combination real systems run). The "
        f"greedy recursion unrolls into {MMR_K} chained bounded "
        f"argmax selections (each an aggregate + LIMIT 1 over the "
        f"<= {MMR_POOL}-row pool with rounded-score/doc_id "
        f"tiebreaks, eagerly checkpointed so the plan stays linear "
        f"in k); candidate generation is the certified bm25_scores "
        f"pushdown and the {MMR_POOL}x{MMR_POOL} sim matrix "
        f"broadcasts. At 100 TB the pool stays k-bounded, so MMR "
        f"costs O(pool^2) AFTER retrieval — independent of corpus "
        f"size.",
    tags=("search", "similarity", "topk", "iterative"),
)
def mmr_diversified_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ytspark.operators.similarity import as_double, cosine

    lam = float(MMR_LAMBDA)
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    emb = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    cand = (
        bm25_scores(docs)
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(MMR_POOL)
        .select("doc_id", F.col("bm25").alias("rel"))
        .localCheckpoint(eager=True)
    )
    ev = emb.select("vec_id", as_double(F.col("embedding")).alias("v"))
    ca = cand.join(ev, cand.doc_id == ev.vec_id).select(
        F.col("doc_id").alias("a"), F.col("v").alias("va")
    )
    cb = cand.join(ev, cand.doc_id == ev.vec_id).select(
        F.col("doc_id").alias("b"), F.col("v").alias("vb")
    )
    sims = (
        ca.join(F.broadcast(cb), F.col("a") != F.col("b"))
        .select(
            "a",
            "b",
            F.round(cosine(F.col("va"), F.col("vb")), 6).alias("sim"),
        )
        .localCheckpoint(eager=True)
    )
    picks = []
    selected = None
    for i in range(1, MMR_K + 1):
        if selected is None:
            pick = (
                cand.orderBy(F.desc("rel"), F.asc("doc_id"))
                .limit(1)
                .select(
                    "doc_id", "rel", F.round(lam * F.col("rel"), 6).alias("mmr")
                )
            )
        else:
            sel_ids = selected.select(F.col("doc_id").alias("b"))
            pick = (
                cand.join(
                    selected.select("doc_id"), "doc_id", "left_anti"
                )
                .join(sims, F.col("doc_id") == F.col("a"))
                .join(F.broadcast(sel_ids), "b", "left_semi")
                .groupBy("doc_id", "rel")
                .agg(
                    F.round(
                        lam * F.col("rel") - (1 - lam) * F.max("sim"), 6
                    ).alias("mmr")
                )
                .orderBy(F.desc("mmr"), F.asc("doc_id"))
                .limit(1)
            )
        # eager 1-row checkpoint keeps the unrolled plan linear in k
        pick = pick.localCheckpoint(eager=True)
        picks.append(pick.select(F.lit(i).cast("long").alias("pick_order"), "*"))
        selected = (
            pick if selected is None else selected.unionByName(pick)
        )
    out = picks[0]
    for p in picks[1:]:
        out = out.unionByName(p)
    return out


# ---------------------------------------------------------------------------
# Binary retrieval-metric battery: MRR, recall@k, precision@k
# ---------------------------------------------------------------------------

RME_KS = (5, 10, 20)      # cutoffs reported
RME_REL_MIN = 2           # relevant = covers >= 2 distinct query terms


@register(
    "retrieval_metrics_battery",
    oracle=f"""
WITH base AS ({{base}}),
ranked AS (
  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS r
  FROM base
),
rel AS (
  SELECT doc_id
  FROM (
    SELECT doc_id, COUNT(DISTINCT t) AS g
    FROM (SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS t
          FROM documents)
    WHERE t IN ({_BM25_QUERY_SQL})
    GROUP BY doc_id
  ) WHERE g >= {RME_REL_MIN}
),
nrel AS (SELECT COUNT(*) AS n_rel FROM rel),
firsthit AS (
  SELECT MIN(r.r) AS first_rank
  FROM ranked r JOIN rel ON rel.doc_id = r.doc_id
),
ks AS (SELECT UNNEST({list(RME_KS)!r}) AS k),
hits AS (
  SELECT ks.k,
         COUNT(CASE WHEN rel.doc_id IS NOT NULL THEN 1 END) AS n_hits
  FROM ks
  LEFT JOIN ranked r ON r.r <= ks.k
  LEFT JOIN rel ON rel.doc_id = r.doc_id
  GROUP BY ks.k
)
SELECT CAST(h.k AS BIGINT) AS k,
       CAST(h.n_hits AS BIGINT) AS n_hits,
       CAST(n.n_rel AS BIGINT) AS n_relevant,
       CAST(h.n_hits * 1000 // h.k AS BIGINT) AS precision_per_mille,
       CAST(h.n_hits * 1000 // n.n_rel AS BIGINT) AS recall_per_mille,
       CAST(f.first_rank AS BIGINT) AS first_relevant_rank,
       ROUND(1.0 / f.first_rank, 6) AS mrr
FROM hits h CROSS JOIN nrel n CROSS JOIN firsthit f
""".format(base=_BM25_ORACLE),
    doc=f"BINARY RETRIEVAL-METRIC BATTERY over the BM25 ranking: "
        f"precision@k and recall@k at k={RME_KS} plus MRR — the "
        f"set-based complements to ndcg_eval's graded metric, and "
        f"the numbers a RAG retriever ships or doesn't ship on. "
        f"Relevant = covers >= {RME_REL_MIN} distinct query terms "
        f"(the ndcg relevance grades, binarized). Counts are exact "
        f"integers, precision/recall exact integer per-mille, MRR "
        f"the deterministic reciprocal of an integer rank. Scale: "
        f"identical postings pushdown to bm25_search; the metric "
        f"joins run over the bounded top-{max(RME_KS)} list and the "
        f"df-bounded relevant set.",
    tags=("search", "evaluation", "topk", "aggregate"),
)
def retrieval_metrics_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    ranked = bm25_scores(docs).select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("bm25"), F.asc("doc_id")))
        .alias("r"),
    )
    rel = (
        docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("t"))
        .where(F.col("t").isin(*BM25_QUERY))
        .groupBy("doc_id")
        .agg(F.count_distinct("t").alias("g"))
        .where(F.col("g") >= RME_REL_MIN)
        .select("doc_id")
    )
    nrel = rel.agg(F.count(F.lit(1)).alias("n_rel"))
    firsthit = ranked.join(rel, "doc_id").agg(
        F.min("r").alias("first_rank")
    )
    ks = spark.createDataFrame([(k,) for k in RME_KS], "k int")
    hits = (
        F.broadcast(ks)
        .join(ranked, ranked.r <= F.col("k"), "left")
        .join(rel.withColumnRenamed("doc_id", "rel_doc"),
              F.col("doc_id") == F.col("rel_doc"), "left")
        .groupBy("k")
        .agg(F.count("rel_doc").alias("n_hits"))
    )
    return (
        hits.crossJoin(F.broadcast(nrel))
        .crossJoin(F.broadcast(firsthit))
        .select(
            F.col("k").cast("long").alias("k"),
            F.col("n_hits").cast("long").alias("n_hits"),
            F.col("n_rel").cast("long").alias("n_relevant"),
            # `div` (trunc-toward-zero) pairs with DuckDB `//` (floor):
            # they agree only because hit/size counts are nonnegative
            F.expr("n_hits * 1000 div k").cast("long").alias(
                "precision_per_mille"
            ),
            F.expr("n_hits * 1000 div n_rel").cast("long").alias(
                "recall_per_mille"
            ),
            F.col("first_rank").cast("long").alias("first_relevant_rank"),
            F.round(F.lit(1.0) / F.col("first_rank"), 6).alias("mrr"),
        )
    )
