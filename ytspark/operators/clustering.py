"""Embedding clustering / compression operators: k-means cell
assignment (cross-engine value-checkable) and product quantization.

Complements the similarity module's IVF/LSH serving indexes: the same
nearest-centroid kernel, but exposed as first-class clustering and
compression operators with corpus-level accounting.

Scale shape shared by both: centroids/codebooks are tiny (K·dim
floats) and BROADCAST; assignment is map-only against the embedding
scan (no shuffle before the final small aggregate). Training samples
are bounded deterministic hash-strided subsets — the driver never
holds more than ``similarity.IVF_TRAIN_CAP`` vectors regardless of
corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ytspark.queries import register
from ytspark.session import load_tables

KM_K = 8  # fixed seed centroids: embeddings with vec_id < KM_K
DIST_ROUND = 6


@register(
    "embedding_kmeans_assign",
    oracle=f"""
WITH c AS (
  SELECT vec_id AS centroid_id, embedding AS cv
  FROM embeddings WHERE vec_id < {KM_K}
),
p AS (
  SELECT e.vec_id, c.centroid_id,
         ROUND(LIST_REDUCE(
           LIST_TRANSFORM(GENERATE_SERIES(1, LEN(e.embedding)),
             i -> (CAST(e.embedding[i] AS DOUBLE) - CAST(c.cv[i] AS DOUBLE))
                * (CAST(e.embedding[i] AS DOUBLE) - CAST(c.cv[i] AS DOUBLE))),
           (a, x) -> a + x), {DIST_ROUND}) AS dist_r
  FROM embeddings e CROSS JOIN c
),
r AS (
  SELECT vec_id, centroid_id, dist_r,
         ROW_NUMBER() OVER (PARTITION BY vec_id
                            ORDER BY dist_r, centroid_id) AS rk
  FROM p
)
SELECT centroid_id, COUNT(*) AS n_assigned,
       ROUND(AVG(dist_r), {DIST_ROUND}) AS avg_dist2
FROM r WHERE rk = 1
GROUP BY centroid_id
""",
    doc="Nearest-centroid (k-means E-step) assignment of every "
        f"embedding to {KM_K} fixed seed centroids (the vectors with "
        f"vec_id < {KM_K}), reporting cluster sizes and mean squared "
        "distance. Distances are LEFT-FOLDED in index order in double "
        "precision on both engines — bit-identical sums — then rounded "
        "before the (distance, centroid_id) argmin rank, so the "
        "assignment itself is value-certified cross-engine (ties "
        "break on centroid_id deterministically). Plan: centroids "
        "broadcast, map-only distance + per-vector top-1 window, one "
        "small aggregate — the embedding scan is the only big input.",
    tags=("clustering", "kmeans", "similarity", "embedding"),
)
def embedding_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    cents = emb.where(F.col("vec_id") < KM_K).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("cv")
    )
    diff2 = F.zip_with(
        "embedding",
        "cv",
        lambda x, y: (x.cast("double") - y.cast("double"))
        * (x.cast("double") - y.cast("double")),
    )
    dist2 = F.aggregate(diff2, F.lit(0.0), lambda a, x: a + x)
    pairs = emb.crossJoin(F.broadcast(cents)).select(
        "vec_id", "centroid_id", F.round(dist2, DIST_ROUND).alias("dist_r")
    )
    w = Window.partitionBy("vec_id").orderBy("dist_r", "centroid_id")
    assign = (
        pairs.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
    )
    return assign.groupBy("centroid_id").agg(
        F.count(F.lit(1)).alias("n_assigned"),
        F.round(F.avg("dist_r"), DIST_ROUND).alias("avg_dist2"),
    )


PQ_SUBSPACES = 8  # 64-dim embeddings → 8 subspaces × 8 dims
PQ_CODES = 16  # codes per subspace codebook (4 bits)


def build_pq_codebooks(emb: DataFrame, m: int = PQ_SUBSPACES, k: int = PQ_CODES):
    """Deterministic per-subspace codebooks: bounded hash-strided
    sample (same discipline as ``similarity.build_ivf_centroids`` — the
    driver holds ~IVF_TRAIN_CAP vectors max), evenly-strided seeds, one
    Lloyd refinement per subspace. Returns ndarray (m, k, dim//m)."""
    import numpy as np

    from ytspark.operators.similarity import IVF_TRAIN_CAP

    n = emb.count()
    stride = max(1, n // IVF_TRAIN_CAP)
    train = emb
    if stride > 1:
        train = emb.where(F.pmod(F.xxhash64("vec_id"), F.lit(stride)) == 0)
    mat = np.stack(
        train.select("embedding").toPandas()["embedding"].to_numpy()
    ).astype("float64")
    dim = mat.shape[1]
    sub = dim // m
    books = np.empty((m, k, sub))
    for s in range(m):
        block = mat[:, s * sub : (s + 1) * sub]
        seed_stride = max(1, len(block) // k)
        cents = block[::seed_stride][:k].copy()
        # one Lloyd iteration (deterministic)
        d2 = ((block[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for c in range(len(cents)):
            members = block[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
        books[s] = cents
    return books


@register(
    "embedding_pq",
    oracle=None,  # kmeans-trained codebooks have no SQL twin — rows-only
    doc="Product quantization: embeddings split into "
        f"{PQ_SUBSPACES} subspaces, each encoded to the nearest of "
        f"{PQ_CODES} codebook entries (4 bits/subspace — a 64-dim "
        "float32 vector compresses 256 B → 4 B, 64×). Codebooks train "
        "on a bounded hash-strided sample (driver holds ≤ "
        "IVF_TRAIN_CAP vectors at any corpus size) and broadcast; "
        "encoding + reconstruction-error measurement run as one "
        "Arrow-batched mapInPandas GEMM over the embedding scan — "
        "map-only, no shuffle before the per-subspace accounting "
        "aggregate. Output: per-subspace codes-used and mean squared "
        "reconstruction error. Rows-only check (trained centroids "
        "have no cross-engine twin); determinism and error bounds are "
        "unit-tested.",
    tags=("clustering", "quantization", "similarity", "embedding"),
)
def embedding_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    emb = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    books = build_pq_codebooks(emb)
    m, k, sub = books.shape
    bbooks = spark.sparkContext.broadcast(books)

    def encode(batches):
        import numpy as np

        bk = bbooks.value
        for pdf in batches:
            mat = np.stack(pdf["embedding"].to_numpy()).astype("float64")
            out = []
            for s in range(m):
                block = mat[:, s * sub : (s + 1) * sub]
                d2 = ((block[:, None, :] - bk[s][None, :, :]) ** 2).sum(axis=2)
                codes = d2.argmin(axis=1)
                err = d2[np.arange(len(block)), codes]
                out.append(
                    pd.DataFrame(
                        {
                            "subspace": s,
                            "code": codes.astype("int64"),
                            "sq_err": err,
                        }
                    )
                )
            yield pd.concat(out, ignore_index=True)

    encoded = emb.mapInPandas(
        encode, schema="subspace int, code long, sq_err double"
    )
    return encoded.groupBy("subspace").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.countDistinct("code").alias("codes_used"),
        F.round(F.avg("sq_err"), 6).alias("avg_sq_err"),
    )
