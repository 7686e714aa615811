"""Ingestion dataflow: source → flatten → drop → timestamp → channel key
(SURVEY §2 S1, T5–T7).

The reference polls the YouTube Data API per channel in a Python loop
(``dags/extract.py:146-148``). Here the fetch boundary is a pluggable
callable returning API-shaped payloads (network access is out of scope
for the engine; a deterministic fixture generator stands in — see
``ytspark.sources.youtube``). Everything downstream of the fetch is one
DataFrame lineage: at cluster scale, N channels become N rows in one
partitioned DataFrame, not N sequential loops.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ytspark import schemas
from ytspark.flatten import flatten


def payloads_to_df(spark: SparkSession, payloads: Iterable[dict]) -> DataFrame:
    """API-response dicts → one DataFrame of channel items.

    Each payload is a ``channels().list`` response; ``items`` is exploded
    so one row = one channel snapshot (reference takes ``items[0]``,
    ``dags/extract.py:81-83``).
    """
    df = spark.createDataFrame(list(payloads), schema=schemas.API_RESPONSE)
    return df.select(F.explode("items").alias("item")).select("item.*")


def channel_key(col: F.Column) -> F.Column:
    """Stable channel slug from the title (SURVEY §2 T7).

    Reference (``dags/extract.py:115``): ``replace('-',' ')``, split on
    ``/``, take segment 0, join whitespace-split words with ``_`` —
    "Cocomelon - Nursery Rhymes" → ``Cocomelon___Nursery_Rhymes``.
    Faithful Spark reimplementation as column expressions: the
    double-space left by ``'-'→' '`` produces the empty split tokens
    that yield the triple underscore, so split on single space, not \\s+.
    """
    no_dash = F.regexp_replace(col, "-", " ")
    first_seg = F.split(no_dash, "/").getItem(0)
    # split on the single-space LITERAL (not \s+): the reference uses
    # ``.split(' ')`` so empty tokens are kept — that's what yields
    # ``Cocomelon___Nursery_Rhymes`` (yt_sources.yml:9).
    return F.array_join(F.split(first_seg, " "), "_")


def transform_responses(
    responses: DataFrame,
    *,
    list_policy: str = "drop",
    drop_columns: tuple[str, ...] = schemas.V1_DROP_COLUMNS,
    ingest_ts: str | None = None,
) -> DataFrame:
    """The pure-DataFrame ingest transform: explode items → flatten
    (T1–T4) → drop (T5) → ingestion ``timestamp`` (T6) →
    ``channel_key`` partition column (T7).

    Works identically on a batch DataFrame and a streaming DataFrame
    (the Structured Streaming path reuses it unchanged). ``ingest_ts``
    pins the stamp for deterministic tests; production uses
    ``current_timestamp()``.
    """
    items = responses.select(F.explode("items").alias("item")).select("item.*")
    flat = flatten(items, list_policy=list_policy)
    flat = flat.drop(*[c for c in drop_columns if c in flat.columns])
    ts = F.lit(ingest_ts).cast("timestamp") if ingest_ts else F.current_timestamp()
    return (
        flat.withColumn("timestamp", ts)
        .withColumn("channel_key", channel_key(F.col("title")))
    )


def ingest(
    spark: SparkSession,
    payloads: Iterable[dict],
    *,
    list_policy: str = "drop",
    drop_columns: tuple[str, ...] = schemas.V1_DROP_COLUMNS,
    ingest_ts: str | None = None,
) -> DataFrame:
    """Full ingest transform for one poll tick of API payload dicts."""
    responses = spark.createDataFrame(list(payloads), schema=schemas.API_RESPONSE)
    return transform_responses(
        responses,
        list_policy=list_policy,
        drop_columns=drop_columns,
        ingest_ts=ingest_ts,
    )
