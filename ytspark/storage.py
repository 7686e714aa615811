"""Bronze storage layer (SURVEY §2 T8, S2–S5).

The reference's physical model is one CSV per channel in S3, rewritten
in full every poll (``dags/extract.py:118-129``) and truncate-reloaded
into one Snowflake table per channel (``:167-169``) — O(history) I/O per
tick. The engine's layout is the same LOGICAL table with O(delta)
physics: append-only Parquet partitioned by ``channel_key``.

At 100 TB the partitioning choice is the whole game: per-entity
partition pruning makes per-channel reads O(channel), appends never
rewrite history, and the snapshot fact table stays sorted-by-arrival
within partitions for cheap latest-snapshot queries.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def append_bronze(df: DataFrame, path: str) -> None:
    """Incremental append (T8). Union semantics identical to the
    reference's ``pd.concat([new, existing])`` + full rewrite, with
    O(delta) instead of O(history) I/O."""
    df.write.mode("append").partitionBy("channel_key").parquet(path)


def overwrite_bronze(df: DataFrame, path: str) -> None:
    """Full-refresh mode — the reference's truncate-and-reload semantics
    (S4, ``dags/extract.py:167-169``) as an explicit option."""
    df.write.mode("overwrite").partitionBy("channel_key").parquet(path)


def read_bronze(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def save_table(df: DataFrame, name: str, *, mode: str = "overwrite") -> None:
    """Warehouse-table sink analogue (S4/S5): ``saveAsTable`` with
    schema derived from the DataFrame (the reference's
    ``write_pandas(auto_create_table=True)``, ``dags/extract.py:171``)."""
    df.write.mode(mode).saveAsTable(name)


def compact_bronze(
    spark: SparkSession, path: str, *, files_per_partition: int = 1
) -> None:
    """Compact the append-only bronze table in place.

    Every poll appends one small file per channel partition; at a
    5-minute cadence that is ~100k files/channel/year — death by
    metadata at 100 TB. Compaction rewrites each ``channel_key``
    partition to ``files_per_partition`` files. The rewrite is
    atomic-enough for a single-writer pipeline (the reference's model);
    a multi-writer deployment would put Delta/Iceberg under this call
    and get real transactionality with the same engine code above it.
    """
    from pyspark.sql import functions as F

    df = spark.read.parquet(path)
    if files_per_partition == 1:
        compacted = df.repartition("channel_key")
    else:
        # salt splits each channel across exactly files_per_partition
        # writer tasks (salt determinism is irrelevant for file layout)
        compacted = (
            df.withColumn(
                "__salt",
                F.pmod(F.monotonically_increasing_id(), F.lit(files_per_partition)),
            )
            .repartition("channel_key", "__salt")
            .drop("__salt")
        )
    # stage → swap: never read and overwrite the same location in one job
    staging = path.rstrip("/") + "__compact_tmp"
    compacted.write.mode("overwrite").partitionBy("channel_key").parquet(staging)
    import shutil

    shutil.rmtree(path)
    shutil.move(staging, path)


def read_csv(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """CSV source (S2 — the reference's accumulated per-channel CSV,
    ``dags/extract.py:119-120``). With ``schema=None`` this infers like
    ``pd.read_csv`` did (schema-on-read regime, SURVEY §1.3); passing an
    explicit schema is the engine default — inference costs an extra
    full scan and types drift between polls."""
    reader = spark.read.option("header", True)
    if schema is not None:
        return reader.schema(schema).csv(path)
    return reader.option("inferSchema", True).csv(path)


def write_csv(df: DataFrame, path: str, *, mode: str = "overwrite") -> None:
    """CSV sink (S3 — interchange/export only). The bronze layer is
    parquet; CSV remains for compatibility with the reference's S3
    object layout (``dags/extract.py:122-129``)."""
    df.write.mode(mode).option("header", True).csv(path)


def upsert_latest(
    spark: SparkSession,
    new_df: DataFrame,
    path: str,
    *,
    key: str = "channel_key",
    order_col: str = "timestamp",
) -> None:
    """Keyed upsert (SCD-1 'current state' table): merge the incoming
    snapshot batch into the table at ``path``, keeping only the latest
    row per ``key`` (by ``order_col``; arrival order breaks ties —
    incoming wins, matching the reference's overwrite intent).

    The bronze history table stays append-only (``append_bronze``);
    this maintains the separate latest-state view some consumers want
    (the role the truncate-and-reload RAW tables played,
    ``dags/extract.py:167-169``) without rewriting history. Plan: union
    + one window over |keys| + staged overwrite — cost is O(current
    table + batch), independent of bronze history depth. On Delta/
    Iceberg this call becomes MERGE INTO; the engine code above it is
    unchanged.

    Visibility: the final rmtree+move swap is NOT atomic for concurrent
    readers — without a transactional table format there is a brief
    window where the path is absent, so readers must tolerate ENOENT
    and retry (single-writer is assumed throughout; see SCALE.md).
    """
    from pyspark.sql import Window

    # First-batch is decided by the path's existence, NOT by whether the
    # read raises: a transient IO error or corrupt footer must propagate
    # rather than silently replacing the accumulated current state with
    # only the incoming batch.
    if os.path.exists(path):
        current = spark.read.parquet(path)
        merged = current.withColumn("__src", F.lit(0)).unionByName(
            new_df.withColumn("__src", F.lit(1)), allowMissingColumns=True
        )
    else:  # first batch — nothing to merge
        merged = new_df.withColumn("__src", F.lit(1))
    w = Window.partitionBy(key).orderBy(
        F.col(order_col).desc(), F.col("__src").desc()
    )
    latest = (
        merged.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn", "__src")
    )
    staging = path.rstrip("/") + "__upsert_tmp"
    latest.write.mode("overwrite").parquet(staging)
    import shutil

    if os.path.exists(path):
        shutil.rmtree(path)
    shutil.move(staging, path)


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    *,
    mode: str = "overwrite",
    truncate: bool = True,
    batchsize: int = 10_000,
    num_partitions: int | None = None,
    driver: str | None = None,
    properties: dict[str, str] | None = None,
) -> None:
    """External-warehouse sink over JDBC — the engine twin of the
    reference's Snowflake load (S4/S5, ``dags/extract.py:167-171``).

    ``mode="overwrite", truncate=True`` maps S4 exactly: Spark issues
    ``TRUNCATE TABLE`` then bulk-inserts, preserving the target's DDL
    (the reference's ``TRUNCATE`` + ``write_pandas``). With
    ``truncate=False`` the table is dropped and re-created from the
    DataFrame schema — S5's ``auto_create_table=True``. ``mode=
    "append"`` is the incremental T8 shape.

    Scale: each write partition opens one connection and inserts
    ``batchsize`` rows per round trip; cap ``num_partitions`` so the
    warehouse sees a bounded connection fan-in (1000 executors hitting
    one warehouse with 1000 connections is a DDoS, not a load).

    No JDBC driver ships in this sandbox, so this path is exercised at
    the builder level in tests (the call reaches Spark's JDBC source
    and fails only on driver resolution); against a real warehouse,
    pass ``driver=`` and the jar on the classpath.
    """
    out = df.repartition(num_partitions) if num_partitions else df
    writer = (
        out.write.format("jdbc")
        .mode(mode)
        .option("url", url)
        .option("dbtable", table)
        .option("truncate", str(truncate).lower())
        .option("batchsize", batchsize)
    )
    if driver:
        writer = writer.option("driver", driver)
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.save()


def read_json(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """JSONL source — the reference's native payload shape (the YouTube
    API returns nested JSON, ``dags/extract.py:77-83``); reading saved
    response files through this path then ``flatten.flatten`` reproduces
    the v1 ``pd.json_normalize`` pipeline without pandas. Explicit
    schema skips Spark's inference scan AND pins nested struct field
    order — inference sorts keys alphabetically, which silently changes
    the first-wins column-collision outcome (SURVEY §7.4)."""
    reader = spark.read
    if schema is not None:
        return reader.schema(schema).json(path)
    return reader.json(path)


def write_json(df: DataFrame, path: str, *, mode: str = "overwrite") -> None:
    """JSONL sink (interchange/export; one JSON object per line)."""
    df.write.mode(mode).json(path)


def write_warehouse(
    df: DataFrame,
    table: str,
    secrets=None,
    **kwargs,
) -> None:
    """``write_jdbc`` with connection details resolved through the
    S7 secrets chain (``ytspark.config.Secrets``) — the engine twin
    of the reference wiring Snowflake creds from the
    ``snowflake_data`` secret into its writer
    (``dags/extract.py:47-60,167-171``). The ``warehouse`` secret
    supplies url/user/password (+ optional driver); explicit kwargs
    win over secret-derived values."""
    from ytspark.config import Secrets

    blob = (secrets or Secrets()).warehouse_jdbc()
    props = dict(kwargs.pop("properties", None) or {})
    for k in ("user", "password"):
        if k in blob and k not in props:
            props[k] = blob[k]
    kwargs.setdefault("driver", blob.get("driver"))
    write_jdbc(df, blob["url"], table, properties=props, **kwargs)


def save_mart_table(
    df: DataFrame,
    name: str,
    *,
    length_mode: str = "error",
    mode: str = "overwrite",
) -> None:
    """Materialize the typed mart as a TABLE with the reference's
    bounded varchar(n) DDL (SURVEY §7.4; ``YT_Facts_stg.sql:3-7``).

    Unlike :func:`save_table` (schema inferred from the DataFrame, so
    strings land as unbounded StringType), this creates the table with
    explicit ``varchar(50/50/300/10)`` columns and routes the write
    through :func:`ytspark.facts.enforce_varchar_lengths`:
    ``length_mode='error'`` reproduces Snowflake INSERT semantics
    (over-length raises, distributed), ``'truncate'`` clips to the
    declared width. Spark's native CHAR/VARCHAR length check on the
    created table is a second, engine-level gate behind the explicit
    one.
    """
    from ytspark.facts import (
        MART_COLUMN_ORDER,
        MART_DDL,
        enforce_varchar_lengths,
    )

    spark = df.sparkSession
    checked = enforce_varchar_lengths(df, mode=length_mode)
    # insertInto resolves POSITIONALLY against the table DDL; with four
    # adjacent string columns a reordered caller frame would silently
    # column-swap, so re-select by name into DDL order first (missing
    # columns raise here instead of corrupting the table)
    checked = checked.select(*MART_COLUMN_ORDER)
    if mode == "overwrite":
        spark.sql(f"DROP TABLE IF EXISTS {name}")
    spark.sql(f"CREATE TABLE IF NOT EXISTS {name} ({MART_DDL}) USING parquet")
    checked.write.mode("append").insertInto(name)
