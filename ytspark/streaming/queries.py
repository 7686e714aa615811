"""Streaming queries registered in the engine query surface.

``streaming_hourly_counts`` runs a REAL Structured Streaming job
(file-source readStream over the events parquet, watermark + tumbling
window, availableNow trigger, memory sink) and returns the materialized
result — which must equal the batch date_trunc rollup, so it is fully
oracle-checkable. This pins the streaming/batch unification the engine
claims (same semantics in both modes).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ytspark.queries import register


@register(
    "streaming_hourly_counts",
    oracle="""
SELECT DATE_TRUNC('hour', ts) AS hour, event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
""",
    doc="Structured Streaming tumbling 1-hour window with 1-hour watermark "
        "over a file-source stream, availableNow trigger, memory sink — "
        "result provably equal to the batch rollup (oracle-checked).",
    tags=("streaming", "window", "aggregate"),
)
def streaming_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = os.path.join(sf_dir, "events.parquet")
    # events.parquet carries nanosecond timestamps: read nanos-as-long,
    # truncate to micros (same treatment as the batch path in
    # ytspark.session.load_tables).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(path).schema
    # the file-stream source needs a DIRECTORY; stage a symlink to the
    # single parquet file in a scratch dir
    stage = tempfile.mkdtemp(prefix="ytspark_stream_")
    link = os.path.join(stage, "events.parquet")
    if not os.path.exists(link):
        os.symlink(path, link)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 8)
        .parquet(stage)
    )
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    windowed = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
    )
    sink = f"stream_hourly_{abs(hash(sf_dir)) % 10_000_000}"
    q = (
        windowed.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink).select(
        F.col("w.start").alias("hour"),
        "event_type",
        "n_events",
        "total_value",
    )
