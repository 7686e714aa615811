"""Ingest → bronze → mart pipeline tests (SURVEY §2 T5–T13)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ytspark import facts, ingest, staging
from ytspark.sources.youtube import REFERENCE_CHANNEL_TITLES, poll_tick


@pytest.fixture(scope="module")
def bronze(spark):
    ticks = [
        ingest.ingest(spark, poll_tick(tick=i), ingest_ts=f"2026-01-01 0{i}:00:00")
        for i in range(3)
    ]
    df = ticks[0]
    for t in ticks[1:]:
        df = df.unionByName(t)
    return df.cache()


def test_channel_key_slug(spark):
    rows = (
        spark.createDataFrame(
            [("Cocomelon - Nursery Rhymes",), ("T-Series",), ("Jungle Toons-Kids TV",), ("A/B name",)],
            ["title"],
        )
        .select(ingest.channel_key(F.col("title")).alias("k"))
        .collect()
    )
    assert [r["k"] for r in rows] == [
        "Cocomelon___Nursery_Rhymes",
        "T_Series",
        "Jungle_Toons_Kids_TV",
        "A",
    ]


def test_ingest_drops_and_stamps(bronze):
    cols = bronze.columns
    for dropped in ("kind", "description", "etag", "id"):
        assert dropped not in cols
    assert "timestamp" in cols and "channel_key" in cols
    assert bronze.count() == 3 * len(REFERENCE_CHANNEL_TITLES)
    # all reference slugs present (staging.REFERENCE_CHANNELS parity)
    keys = {r["channel_key"] for r in bronze.select("channel_key").distinct().collect()}
    assert keys == set(staging.REFERENCE_CHANNELS)


def test_mart_schema_and_types(bronze):
    mart = facts.build_mart(bronze)
    got = {f.name: f.dataType for f in mart.schema.fields}
    assert got["view_count"] == T.LongType()
    assert got["subscriberCount"] == T.LongType()
    assert got["PublishedAt"] == T.TimestampType()
    assert got["madeForKids"] == T.BooleanType()
    assert list(got) == [
        "title", "customUrl", "PublishedAt", "url_", "Country",
        "view_count", "subscriberCount", "videoCount", "madeForKids", "timestamp",
    ]
    # long view counts survive (> int32)
    assert mart.agg(F.max("view_count")).first()[0] > 2**31


def test_mart_union_shape_equals_single_scan(bronze):
    single = facts.build_mart(bronze)
    unioned = facts.build_mart_union(bronze, list(staging.REFERENCE_CHANNELS))
    a = sorted(map(tuple, single.collect()))
    b = sorted(map(tuple, unioned.collect()))
    assert a == b


def test_union_all_preserves_duplicates(bronze):
    mart = facts.build_mart(bronze)
    doubled = facts.union_all([mart, mart])
    assert doubled.count() == 2 * mart.count()


def test_lenient_cast_nulls_bad_values(spark):
    df = spark.createDataFrame(
        [("t", "c", "2020-01-01T00:00:00Z", "u", "US", "notanumber", "5", "3", True, "2026-01-01 00:00:00")],
        ["title", "customUrl", "publishedAt", "url", "country",
         "viewCount", "subscriberCount", "videoCount", "madeForKids", "timestamp"],
    )
    row = facts.cast_projection(df, lenient=True).first()
    assert row["view_count"] is None and row["subscriberCount"] == 5


def test_staging_views(spark, bronze):
    views = staging.create_staging_views(bronze)
    assert len(views) == 7
    mb = spark.table(staging.staging_view_name("MrBeast"))
    assert mb.count() == 3
    assert mb.select("channel_key").distinct().first()[0] == "MrBeast"
