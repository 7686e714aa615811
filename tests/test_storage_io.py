"""CSV source/sink compatibility paths (SURVEY §2 S2/S3)."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from ytspark import storage
from ytspark.session import load_tables


def test_csv_roundtrip_inferred(spark, sf_dir):
    nation = load_tables(spark, sf_dir, "nation")["nation"]
    path = tempfile.mkdtemp(prefix="ytspark_csv_") + "/nation"
    storage.write_csv(nation, path)
    back = storage.read_csv(spark, path)
    assert back.count() == nation.count()
    assert set(back.columns) == set(nation.columns)
    # schema-on-read inference recovers integer types (the reference's
    # pd.read_csv regime, SURVEY §1.3 regime 1)
    assert dict(back.dtypes)["n_nationkey"] in ("int", "bigint")


def test_compact_bronze_collapses_files(spark):
    import glob
    import tempfile

    from ytspark import ingest
    from ytspark.sources.youtube import poll_tick

    path = tempfile.mkdtemp(prefix="ytspark_compact_") + "/bronze"
    for tick in range(5):
        storage.append_bronze(
            ingest.ingest(spark, poll_tick(tick=tick),
                          ingest_ts=f"2026-01-01 0{tick}:00:00"),
            path,
        )
    before_rows = spark.read.parquet(path).count()
    files_before = len(glob.glob(path + "/channel_key=*/*.parquet"))
    storage.compact_bronze(spark, path)
    files_after = len(glob.glob(path + "/channel_key=*/*.parquet"))
    n_partitions = len(glob.glob(path + "/channel_key=*"))
    assert spark.read.parquet(path).count() == before_rows  # lossless
    assert files_after == n_partitions  # exactly one file per partition
    assert files_after < files_before


def test_json_roundtrip_nested(spark):
    """JSONL round-trip preserves nested structs end to end, and the
    explicit-schema read keeps field order (the first-wins flatten
    contract depends on it; inference would alphabetize)."""
    from ytspark import flatten
    from ytspark.sources.youtube import poll_tick
    from ytspark.ingest import payloads_to_df

    raw = payloads_to_df(spark, poll_tick(tick=0))
    path = tempfile.mkdtemp(prefix="ytspark_json_") + "/payloads"
    storage.write_json(raw, path)
    back = storage.read_json(spark, path, schema=raw.schema)
    assert back.schema == raw.schema
    assert back.count() == raw.count()
    # flatten over the round-tripped frame gives the same columns
    assert flatten.flatten(back).columns == flatten.flatten(raw).columns


def test_csv_explicit_schema(spark, sf_dir):
    nation = load_tables(spark, sf_dir, "nation")["nation"]
    path = tempfile.mkdtemp(prefix="ytspark_csv_") + "/nation"
    storage.write_csv(nation, path)
    back = storage.read_csv(spark, path, schema=nation.schema)
    assert back.schema == nation.schema
    a = sorted(r["n_name"] for r in back.select("n_name").collect())
    b = sorted(r["n_name"] for r in nation.select("n_name").collect())
    assert a == b


def test_upsert_latest_keeps_one_current_row_per_key(spark, tmp_path):
    from ytspark import ingest
    from ytspark.sources.youtube import REFERENCE_CHANNEL_TITLES, poll_tick

    path = str(tmp_path / "current")
    for tick in range(3):
        batch = ingest.ingest(
            spark, poll_tick(tick=tick), ingest_ts=f"2026-01-01 0{tick}:00:00"
        )
        storage.upsert_latest(spark, batch, path)
    cur = spark.read.parquet(path)
    # exactly one current row per channel, and it is the tick-2 snapshot
    assert cur.count() == len(REFERENCE_CHANNEL_TITLES)
    ts = {str(r["timestamp"]) for r in cur.select("timestamp").collect()}
    assert ts == {"2026-01-01 02:00:00"}

    # replaying an OLDER batch must not regress the current state
    old = ingest.ingest(
        spark, poll_tick(tick=0), ingest_ts="2026-01-01 00:00:00"
    )
    storage.upsert_latest(spark, old, path)
    cur2 = spark.read.parquet(path)
    assert cur2.count() == len(REFERENCE_CHANNEL_TITLES)
    ts2 = {str(r["timestamp"]) for r in cur2.select("timestamp").collect()}
    assert ts2 == {"2026-01-01 02:00:00"}


def test_write_jdbc_reaches_jdbc_source(spark):
    """No JDBC driver ships in this sandbox; the wrapper must still be
    wired through Spark's JDBC sink — the call fails on DRIVER
    RESOLUTION (proving format/options reached the source), never on
    our option plumbing."""
    import pytest

    from ytspark.storage import write_jdbc

    df = spark.range(3).selectExpr("id", "id * 2 AS v")
    with pytest.raises(Exception, match="(?i)driver|jdbc"):
        write_jdbc(
            df,
            "jdbc:postgresql://localhost:1/nope",
            "t_raw",
            num_partitions=2,
            properties={"user": "u"},
        )
