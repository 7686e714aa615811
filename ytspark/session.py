"""SparkSession factory tuned for this engine.

Local-mode testing runs on ``local[N]`` (one JVM); the conf is still
written for a multi-executor cluster: AQE on (runtime re-planning,
skew-join splitting, partition coalescing), shuffle partitions sized by
env, Arrow enabled for the Pandas-UDF slow path.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

DEFAULT_SHUFFLE_PARTITIONS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(app_name: str = "ytspark", *, session_tz: str = "UTC") -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    ``session_tz`` defaults to UTC so timestamp results are stable across
    engines; the reference's ingestion stamps are Toronto wall-clock
    (reference ``dags/extract.py:109-111``) — pass
    ``session_tz="America/Toronto"`` to reproduce that faithfully.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", DEFAULT_SHUFFLE_PARTITIONS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", session_tz)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    # Deployment-specific overrides without code edits (the guide §9
    # posture: configs are parameterised, never baked for one host).
    # Format: "key=value;key=value". Applied LAST so an experiment or a
    # cluster profile can override any default above.
    extra = os.environ.get("SPARK_GRAFT_EXTRA_CONF", "")
    for kv in filter(None, (s.strip() for s in extra.split(";"))):
        k, _, v = kv.partition("=")
        builder = builder.config(k.strip(), v.strip())
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def load_tables(spark: SparkSession, sf_dir: str, *names: str):
    """Read driver testdata parquet tables, returning a dict of DataFrames.

    The ``events`` table is written with nanosecond parquet timestamps,
    which Spark's vectorized reader rejects; it is read via the
    nanos-as-long legacy mode and truncated to microseconds (matching
    DuckDB's read of the same file).
    """
    if not names:
        names = (
            "region", "nation", "customer", "supplier", "part",
            "orders", "lineitem", "events", "documents", "embeddings",
        )
    out = {}
    for n in names:
        path = os.path.join(sf_dir, f"{n}.parquet")
        if n == "events":
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            df = spark.read.parquet(path)
            if dict(df.dtypes).get("ts") == "bigint":
                df = df.withColumn(
                    "ts", F.timestamp_micros(F.expr("ts div 1000"))
                )
            elif dict(df.dtypes).get("ts") == "timestamp_ntz":
                # micro-precision files infer as TIMESTAMP_NTZ; with the
                # session tz pinned to UTC this cast is wall-clock
                # preserving and keeps ts usable as an event-time
                # (watermark) column, matching the nanos-era semantics
                df = df.withColumn("ts", F.col("ts").cast("timestamp"))
            out[n] = df
        else:
            out[n] = spark.read.parquet(path)
    return out
