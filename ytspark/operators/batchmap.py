"""Grouped-map batch operators (``groupBy().applyInPandas``).

This rounds out the engine's Python-kernel surface alongside
``mapInPandas`` (ytspark/operators/multimodal.py — stateless batch
flatMap) and ``applyInPandasWithState`` (ytspark/streaming/queries.py —
streaming state machine): ``applyInPandas`` is the batch grouped-map
shape — one Arrow-backed pandas frame per group key, for per-entity
kernels that genuinely need the whole group in memory (model scoring,
per-entity curve fitting). The reference has no such operator (its only
Python transforms are row flattening, SURVEY §2.10 "UDF surface"); this
is part of the engine's large-scale-pipeline charter.

Scale notes:

- The grouped-map shuffle is one exchange on the group key; each group
  must fit in one task's memory — per-user event history here, bounded
  by per-entity activity, not corpus size. A group that can't fit
  (celebrity-user skew) is exactly the case to pre-aggregate or salt.
- Anything expressible as window/aggregate built-ins should be (they
  stay JVM-side); the pandas kernel is for logic that isn't. The
  min-max normalization below IS window-expressible — it doubles as the
  oracle-checkable proof that the grouped-map plumbing (schema, Arrow
  batches, group iteration) is correct, the same pattern the multimodal
  module uses for its stubbed decode kernels.
- Determinism contract: the kernel uses only exact selections (min/max)
  and per-row IEEE arithmetic on identical operands, so results are
  bit-identical to the SQL window formulation — no rounding slop in the
  cross-engine hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ytspark.queries import register
from ytspark.session import load_tables


def minmax_normalize(
    df: DataFrame, key_cols: list[str], value_col: str, out_col: str
) -> DataFrame:
    """Per-group min-max normalization via ``applyInPandas``.

    norm = (v - min) / (max - min), 0.5 when the group is constant
    (min == max — avoids ANSI divide-by-zero and is symmetric).
    """
    import pandas as pd

    out_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    schema = f"{out_fields}, {out_col} double"

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf[value_col]
        lo, hi = v.min(), v.max()
        pdf[out_col] = (v - lo) / (hi - lo) if hi > lo else 0.5
        return pdf

    # r12 (guide §2.5): the grouped-map exchange is small enough that
    # AQE coalesces it to ONE partition, serializing every per-group
    # Python call (measured 3.2 s single-task stage at sf0.1). An
    # explicit repartition on the group key with a pinned width
    # satisfies the groupBy's required distribution (no extra
    # exchange) and is exempt from AQE coalescing, so the kernel runs
    # across the pool. Group-to-partition placement never affects the
    # per-group result.
    par = df.sparkSession.sparkContext.defaultParallelism
    return (
        df.repartition(par, *key_cols)
        .groupBy(*key_cols)
        .applyInPandas(kernel, schema=schema)
    )


@register(
    "events_user_minmax_norm",
    oracle="""
SELECT event_id, user_id, value,
       CASE WHEN MAX(value) OVER w > MIN(value) OVER w
            THEN (value - MIN(value) OVER w)
                 / (MAX(value) OVER w - MIN(value) OVER w)
            ELSE 0.5 END AS norm_value
FROM events
WINDOW w AS (PARTITION BY user_id)
""",
    doc="Per-user min-max normalization of event values through the "
        "grouped-map applyInPandas path; the SQL-window equivalent is "
        "the oracle, proving the Arrow group-iteration plumbing exact.",
    tags=("udf", "applyinpandas", "normalize"),
)
def events_user_minmax_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    return minmax_normalize(
        ev.select("event_id", "user_id", "value"),
        key_cols=["user_id"],
        value_col="value",
        out_col="norm_value",
    ).select("event_id", "user_id", "value", "norm_value")


@register(
    "token_entropy_pandas_udf",
    oracle="""
WITH counts AS (
  SELECT doc_id,
         LIST_SORT(LIST_TRANSFORM(
           LIST_DISTINCT(STRING_SPLIT(text, ' ')),
           t -> LEN(LIST_FILTER(STRING_SPLIT(text, ' '), x -> x = t))
         )) AS cnts,
         LEN(STRING_SPLIT(text, ' ')) AS n
  FROM documents
)
SELECT doc_id,
       ROUND(LIST_SUM(LIST_TRANSFORM(
               cnts, c -> (CAST(c AS DOUBLE) / n) * LN(CAST(n AS DOUBLE) / c)
             )), 6) AS token_entropy
FROM counts
""",
    doc="Shannon entropy of each document's token distribution via a "
        "SCALAR Arrow pandas_udf (vectorized numpy per batch) — the "
        "third Python-kernel shape next to mapInPandas and "
        "applyInPandas: one column in, one column out, usable inside "
        "any projection. Counts are summed in ascending sorted order "
        "in both engines so the float reduction is order-identical; "
        "rounded to 6 dp (libm log implementations may differ in the "
        "last ulp).",
    tags=("udf", "pandas-udf", "text", "entropy"),
)
def token_entropy_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    import collections

    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _entropy_batch(texts):
        out = []
        for t in texts:
            toks = t.split(" ")
            n = len(toks)
            counts = np.sort(
                np.asarray(list(collections.Counter(toks).values()))
            ).astype("float64")
            p = counts / n
            out.append(round(float(np.sum(p * np.log(n / counts))), 6))
        return pd.Series(out)

    # lambda/def WITHOUT annotations + explicit returnType: this module
    # uses `from __future__ import annotations`, which stringizes type
    # hints and breaks pandas_udf signature inference
    entropy = pandas_udf(_entropy_batch, "double")

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    return docs.select("doc_id", entropy(F.col("text")).alias("token_entropy"))


@register(
    "top_tokens_udtf",
    oracle="""
WITH tok AS (
  SELECT doc_id, t AS token, COUNT(*) AS cnt
  FROM (SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS t FROM documents)
  GROUP BY doc_id, t
)
SELECT doc_id, token, cnt FROM (
  SELECT doc_id, token, cnt,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY cnt DESC, token) AS rk
  FROM tok
) WHERE rk <= 2
""",
    doc="Python UDTF (table function) surface: per-document top-2 "
        "tokens, emitted as rows by a @udtf class applied LATERALly in "
        "SQL — the fourth Python-kernel shape (scalar pandas_udf / "
        "mapInPandas / applyInPandas / UDTF). Deterministic tiebreak "
        "(count desc, token asc) keeps it oracle-checkable. The UDTF "
        "runs per row with no shuffle; the SQL-window oracle needs a "
        "full explode + grouped count + rank — same answer, heavier "
        "plan, which is exactly when a UDTF earns its place.",
    tags=("udf", "udtf", "text"),
)
def top_tokens_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    import collections

    from pyspark.sql.functions import udtf

    class TopTokens:
        def eval(self, text, k):
            counts = collections.Counter(text.split(" "))
            ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
            for token, cnt in ranked[:k]:
                yield token, cnt

    top_tokens = udtf(TopTokens, returnType="token string, cnt bigint", useArrow=True)
    spark.udtf.register("top_tokens", top_tokens)
    load_tables(spark, sf_dir, "documents")["documents"].createOrReplaceTempView(
        "__udtf_documents"
    )
    return spark.sql(
        """
        SELECT d.doc_id, t.token, t.cnt
        FROM __udtf_documents d,
             LATERAL top_tokens(d.text, 2) t
        """
    )


_COGROUP_ORACLE = """
WITH purchases AS (
  SELECT user_id, ts, event_id
  FROM events WHERE event_type = 'purchase'
),
clicks AS (
  SELECT user_id, ts, event_id
  FROM events WHERE event_type = 'click'
),
matched AS (
  SELECT p.user_id, p.ts AS pts, c.ts AS cts
  FROM purchases p
  ASOF LEFT JOIN clicks c
    ON c.user_id = p.user_id AND c.ts <= p.ts
),
click_counts AS (
  SELECT user_id, COUNT(*) AS n_clicks FROM clicks GROUP BY user_id
),
gaps AS (
  SELECT user_id,
         EPOCH_US(pts) - EPOCH_US(cts) AS gap_us,
         ROW_NUMBER() OVER (
           PARTITION BY user_id ORDER BY EPOCH_US(pts) - EPOCH_US(cts)
         ) AS rn,
         COUNT(*) OVER (PARTITION BY user_id) AS n
  FROM matched WHERE cts IS NOT NULL
),
med AS (
  -- integer-exact 2x median: odd n -> 2*mid, even n -> lo+hi.
  -- No float ever crosses the engine boundary (r7 driver lesson:
  -- ROUND(MEDIAN(epoch_seconds),6) diverged by one ulp across builds).
  SELECT user_id,
         CASE WHEN MAX(n) % 2 = 1
              THEN 2 * SUM(CASE WHEN rn = (n + 1) // 2
                                THEN gap_us ELSE 0 END)
              ELSE SUM(CASE WHEN rn = n // 2 OR rn = n // 2 + 1
                            THEN gap_us ELSE 0 END)
         END AS median_gap_us2
  FROM gaps GROUP BY user_id
)
SELECT m.user_id,
       CAST(COUNT(*) AS BIGINT) AS n_purchases,
       CAST(COALESCE(MAX(cc.n_clicks), 0) AS BIGINT) AS n_clicks,
       CAST(SUM(CASE WHEN m.cts IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_unmatched,
       CAST(MAX(md.median_gap_us2) AS BIGINT) AS median_gap_us2
FROM matched m
LEFT JOIN click_counts cc ON cc.user_id = m.user_id
LEFT JOIN med md ON md.user_id = m.user_id
GROUP BY m.user_id
"""


@register(
    "cogroup_purchase_click_gap",
    oracle=_COGROUP_ORACLE,
    doc="The COGROUPED Arrow kernel — "
        "``groupBy().cogroup().applyInArrow`` — completing the "
        "Python-kernel matrix (scalar pandas_udf, grouped-map "
        "applyInPandas, mapInPandas, UDTF, applyInPandasWithState): "
        "per user, the purchase and click histories arrive as TWO "
        "aligned pyarrow Tables and a numpy searchsorted computes "
        "each purchase's gap to its last preceding click, reduced to "
        "per-user stats (purchase/click counts, unmatched purchases, "
        "2x-median gap in integer microseconds — doubling keeps the "
        "even-count midpoint exact so NO float ever crosses the "
        "engine boundary; the r7 driver window proved a rounded "
        "float median diverges by one ulp across builds). The Arrow "
        "variant skips per-group pandas construction, the measured "
        "floor of the pandas twin (5.3 s -> 0.9 s at sf0.1 for the "
        "same 1500 groups). One co-partitioned shuffle on user_id; "
        "each side of a group is bounded by per-entity activity. The "
        "kernel is window-expressible on purpose — DuckDB's native "
        "ASOF LEFT JOIN + MEDIAN recompute certifies the cogrouped "
        "plumbing (key alignment, empty sides, Arrow batching) "
        "value-for-value, the same proof pattern the grouped-map and "
        "multimodal kernels use. Cost note: a NO-OP cogroup over the "
        "same inputs measures ~4 s at sf0.1 on local[32] — the "
        "two-sided shuffle + per-group Python round-trip is the "
        "framework floor, per-task not per-row, so it amortizes with "
        "data volume; the numpy searchsorted kernel adds ~2 s.",
    tags=("udf", "cogroup", "kernel", "temporal", "aggregate"),
)
def cogroup_purchase_click_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa

    ev = load_tables(spark, sf_dir, "events")["events"]
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    # NOTE: the click side's columns are renamed to be DISTINCT from
    # the purchase side's. Spark 4's cogroup attribute deduplication
    # prunes shadowed same-name columns from the right side when the
    # consumer doesn't reference them (e.g. a bare .count()), and the
    # kernel then receives a frame missing 'ts' — distinct names keep
    # the full schema flowing regardless of downstream projection.
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("cts"),
        F.col("event_id").alias("cid"),
    )

    _empty = pa.table(
        {
            "user_id": pa.array([], pa.int64()),
            "n_purchases": pa.array([], pa.int64()),
            "n_clicks": pa.array([], pa.int64()),
            "n_unmatched": pa.array([], pa.int64()),
            "median_gap_us2": pa.array([], pa.int64()),
        }
    )

    def gap_stats(p: "pa.Table", c: "pa.Table") -> "pa.Table":
        if p.num_rows == 0:  # clicks-only user: no output row
            return _empty
        import numpy as np

        # numpy searchsorted on raw Arrow buffers — the pandas twin's
        # per-group DataFrame construction was the measured floor
        # (5.3 s for 1500 groups at sf0.1; Arrow tables cut it to
        # ~0.9 s), and merge_asof before that was 10.2 s
        pts = np.sort(p.column("ts").to_numpy(zero_copy_only=False))
        if c.num_rows:
            cts = np.sort(c.column("cts").to_numpy(zero_copy_only=False))
            idx = np.searchsorted(cts, pts, side="right") - 1
            matched = idx >= 0
        else:
            cts = None
            matched = np.zeros(len(pts), dtype=bool)
        if matched.any():
            gaps = np.sort(
                (pts[matched] - cts[idx[matched]])
                .astype("timedelta64[us]")
                .astype("int64")
            )
            n = len(gaps)
            # integer-exact 2x median (odd: 2*mid, even: lo+hi) —
            # pure int64, bit-identical on every platform
            med = int(gaps[(n - 1) // 2]) + int(gaps[n // 2])
        else:
            med = None
        return pa.table(
            {
                "user_id": pa.array(
                    [p.column("user_id")[0].as_py()], pa.int64()
                ),
                "n_purchases": pa.array([p.num_rows], pa.int64()),
                "n_clicks": pa.array([c.num_rows], pa.int64()),
                "n_unmatched": pa.array(
                    [int(len(pts) - matched.sum())], pa.int64()
                ),
                "median_gap_us2": pa.array([med], pa.int64()),
            }
        )

    # r12 (guide §2.5): same AQE-coalesce-to-one fix as
    # minmax_normalize — pin the cogroup exchanges' width so the
    # per-group Arrow kernel parallelizes (2.1 s single-task stage at
    # sf0.1 otherwise).
    par = spark.sparkContext.defaultParallelism
    return (
        purchases.repartition(par, "user_id").groupBy("user_id")
        .cogroup(clicks.repartition(par, "user_id").groupBy("user_id"))
        .applyInArrow(
            gap_stats,
            "user_id long, n_purchases long, n_clicks long, "
            "n_unmatched long, median_gap_us2 long",
        )
    )
