"""Multimodal (binary-column) pipeline plumbing: images/audio/video as
opaque ``binary`` payloads with typed metadata, processed by
Arrow-batched ``mapInPandas`` kernels.

The container ships no image/audio codecs, so the actual codec call is
STUBBED (``decode_image`` raises ``NotImplementedError`` unless PIL is
importable); everything Spark-side — schema, partitioning, UDF
signatures, Arrow batch shapes, the 1→N frame-sampling explosion — is
real and tested. Swapping the stub for a real decoder changes no plan.

Scale design:

- Payload bytes never pass through a JVM expression: they move
  parquet → Arrow → pandas in columnar batches; the Python kernel is
  vectorized per batch, not per row.
- Feature extraction is embarrassingly parallel over partitions: no
  shuffle at all until the (tiny) per-format aggregate.
- Frame sampling emits multiple rows per asset from one batch
  (mapInPandas is a flatMap over batches) — the standard video →
  frame-table expansion; at 100 TB you'd repartition by asset id first
  so one asset's frames land together.
- Metadata travels as a typed struct column next to the payload, so
  pruning a query to metadata-only NEVER reads the bytes (columnar
  projection pushdown; verified in tests via ReadSchema).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ytspark.queries import register
from ytspark.session import load_tables

THUMB_BOX = 64  # thumbnail bounding box (px)
FRAME_BYTES = 256  # fake "frame" stride in payload bytes
FRAME_STEP = 4  # sample every 4th frame

_FORMATS = ["jpeg", "png", "webp"]


def attach_fake_media(docs: DataFrame) -> DataFrame:
    """Deterministically derive a binary payload + typed metadata from
    the documents table (the container has no real media files): payload
    is the UTF-8 text bytes, metadata (format, width, height) is a pure
    function of doc_id. Stand-in for ``spark.read.format("binaryFile")``
    which yields the same (path, length, content) shape.
    """
    fmt = F.element_at(
        F.array(*[F.lit(f) for f in _FORMATS]),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    meta = F.struct(
        fmt.alias("format"),
        (64 + (F.col("doc_id") % 8) * 32).cast("int").alias("width"),
        (48 + (F.col("doc_id") % 6) * 32).cast("int").alias("height"),
    )
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("media"),
        meta.alias("meta"),
    )


def decode_image(payload: bytes, fmt: str):
    """REAL image decode — stubbed: the runtime has no codecs.

    Returns a PIL image when PIL is available; otherwise raises
    NotImplementedError (callers that only need metadata/features use
    the deterministic kernels below and never hit this).
    """
    try:
        from io import BytesIO

        from PIL import Image  # noqa: F401 — not installed in this container
    except ImportError as exc:  # pragma: no cover - exercised when PIL absent
        raise NotImplementedError(
            "image codec not available in this environment; "
            "decode_image is a stub (see module docstring)"
        ) from exc
    return Image.open(BytesIO(payload))  # pragma: no cover


def media_features(df: DataFrame) -> DataFrame:
    """Per-asset features via one mapInPandas pass: byte length, md5
    checksum, thumbnail dims (fit into THUMB_BOX, aspect preserved,
    floor semantics — integer math identical across engines)."""
    import pandas as pd

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            payloads = pdf["media"]
            meta = pdf["meta"]
            w = meta.map(lambda m: m["width"]).astype("int64")
            h = meta.map(lambda m: m["height"]).astype("int64")
            box = w.combine(h, max)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "format": meta.map(lambda m: m["format"]),
                    "n_bytes": payloads.map(len).astype("int64"),
                    "checksum": payloads.map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                    "thumb_w": (w * THUMB_BOX // box).astype("int32"),
                    "thumb_h": (h * THUMB_BOX // box).astype("int32"),
                }
            )

    return df.mapInPandas(
        kernel,
        schema=(
            "doc_id bigint, format string, n_bytes bigint, "
            "checksum string, thumb_w int, thumb_h int"
        ),
    )


def sample_frames(df: DataFrame) -> DataFrame:
    """Video-style frame sampling: slice the payload into FRAME_BYTES
    chunks, keep every FRAME_STEP-th, emit one row per kept frame
    (1→N batch expansion inside mapInPandas)."""
    import pandas as pd

    def kernel(batches):
        for pdf in batches:
            ids, idxs, sizes, sums = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["media"]):
                raw = bytes(payload)
                n_frames = (len(raw) + FRAME_BYTES - 1) // FRAME_BYTES
                for fi in range(0, n_frames, FRAME_STEP):
                    chunk = raw[fi * FRAME_BYTES : (fi + 1) * FRAME_BYTES]
                    ids.append(doc_id)
                    idxs.append(fi)
                    sizes.append(len(chunk))
                    sums.append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_idx": idxs,
                    "frame_bytes": sizes,
                    "frame_md5": sums,
                }
            )

    return df.mapInPandas(
        kernel,
        schema="doc_id bigint, frame_idx int, frame_bytes bigint, frame_md5 string",
    )


@register(
    "multimodal_decode_stats",
    oracle=f"""
WITH feat AS (
  SELECT doc_id,
         ['jpeg', 'png', 'webp'][(doc_id % 3 + 1)::INT] AS format,
         OCTET_LENGTH(ENCODE(text)) AS n_bytes,
         MD5(text) AS checksum,
         64 + (doc_id % 8) * 32 AS w,
         48 + (doc_id % 6) * 32 AS h
  FROM documents
)
SELECT format,
       COUNT(*) AS n_assets,
       CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
       COUNT(DISTINCT checksum) AS n_unique,
       CAST(SUM((w * {THUMB_BOX}) // GREATEST(w, h)) AS BIGINT) AS sum_thumb_w
FROM feat
GROUP BY format
""",
    doc="Binary media pipeline: attach payload+typed metadata, extract "
        "features (bytes, md5, thumbnail dims) in ONE Arrow-batched "
        "mapInPandas pass, aggregate per format. The decode itself is a "
        "stub; the Spark plumbing (schema, batch shape, no shuffle before "
        "the final tiny aggregate) is the real 100 TB design.",
    tags=("multimodal", "binary", "pandas-udf"),
)
def multimodal_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    feats = media_features(attach_fake_media(docs))
    return feats.groupBy("format").agg(
        F.count(F.lit(1)).alias("n_assets"),
        F.sum("n_bytes").alias("total_bytes"),
        F.countDistinct("checksum").alias("n_unique"),
        F.sum("thumb_w").cast("bigint").alias("sum_thumb_w"),
    )


@register(
    "multimodal_frame_sample",
    oracle=f"""
WITH frames AS (
  SELECT doc_id,
         UNNEST(RANGE(0, (OCTET_LENGTH(ENCODE(text)) + {FRAME_BYTES - 1}) // {FRAME_BYTES}, {FRAME_STEP}))
           AS frame_idx,
         OCTET_LENGTH(ENCODE(text)) AS n_bytes
  FROM documents
)
SELECT doc_id,
       COUNT(*) AS n_sampled_frames,
       CAST(SUM(LEAST(n_bytes - frame_idx * {FRAME_BYTES}, {FRAME_BYTES}))
            AS BIGINT) AS sampled_bytes
FROM frames
GROUP BY doc_id
""",
    doc="Video-style frame sampling: payload sliced into fixed-byte "
        "frames, every 4th kept, one output row per frame (1→N "
        "mapInPandas expansion), then per-asset accounting.",
    tags=("multimodal", "binary", "pandas-udf"),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    frames = sample_frames(attach_fake_media(docs))
    return frames.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_sampled_frames"),
        F.sum("frame_bytes").alias("sampled_bytes"),
    )
