"""State-store configuration for stateful streaming at scale.

The default HDFS-backed state store keeps every key's state in
executor JVM heap — fine for thousands of keys, fatal for the 1e9-key
states real sessionization/dedup carry at 100 TB. The RocksDB provider
(bundled with Spark since 3.2) keeps state off-heap with incremental
checkpointing; flipping it changes NO query code, which is the point:
state backend is deployment configuration, not pipeline logic.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

PROVIDER_CONF = "spark.sql.streaming.stateStore.providerClass"
ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)
DEFAULT_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
)


def use_rocksdb_state_store(spark: SparkSession, enable: bool = True) -> None:
    """Route all subsequently-started streaming queries' state through
    RocksDB (``enable=False`` restores the default heap-backed store).
    Applies per-session; running queries keep their provider."""
    spark.conf.set(PROVIDER_CONF, ROCKSDB_PROVIDER if enable else DEFAULT_PROVIDER)


def current_state_store(spark: SparkSession) -> str:
    try:
        return spark.conf.get(PROVIDER_CONF)
    except Exception:  # conf unset → Spark default
        return DEFAULT_PROVIDER
