"""Unit tests for the schema-driven flatten (SURVEY §2 T1–T4)."""

from __future__ import annotations

from pyspark.sql import types as T

from ytspark import schemas
from ytspark.flatten import flat_column_names, flatten, flatten_fields
from ytspark.sources.youtube import channel_payload


def _items_df(spark, titles=("MrBeast",), tick=0):
    payloads = [channel_payload(t, tick=tick) for t in titles]
    df = spark.createDataFrame(payloads, schema=schemas.API_RESPONSE)
    from pyspark.sql import functions as F

    return df.select(F.explode("items").alias("item")).select("item.*")


def test_flatten_fields_order_and_paths():
    fields = flatten_fields(schemas.CHANNEL_ITEM)
    paths = [f.path for f in fields]
    # depth-first declaration order: snippet.title before
    # snippet.localized.title before statistics.*
    assert paths.index("snippet.title") < paths.index("snippet.localized.title")
    assert paths.index("snippet.thumbnails.default.url") < paths.index(
        "snippet.thumbnails.medium.url"
    )
    assert "statistics.viewCount" in paths


def test_keep_first_dedup_title_and_url(spark):
    flat = flatten(_items_df(spark), list_policy="drop")
    assert flat.columns.count("title") == 1
    assert flat.columns.count("url") == 1
    row = flat.first()
    # snippet.title wins over snippet.localized.title
    assert row["title"] == "MrBeast"
    # thumbnails.default.url wins over medium/high
    assert row["url"].endswith("s88.jpg")
    assert row["width"] == 88


def test_list_policy_drop_removes_arrays(spark):
    flat = flatten(_items_df(spark), list_policy="drop")
    assert "topicIds" not in flat.columns
    assert "topicCategories" not in flat.columns


def test_list_policy_positional(spark):
    flat = flatten(_items_df(spark), list_policy="positional", list_width=3)
    assert "topicIds_0" in flat.columns and "topicIds_2" in flat.columns
    row = flat.first()
    assert row["topicIds_0"].startswith("/m/topic")
    assert row["topicIds_2"] is None  # NULL past end of 2-element list


def test_list_policy_keep(spark):
    flat = flatten(_items_df(spark), list_policy="keep")
    assert isinstance(flat.schema["topicIds"].dataType, T.ArrayType)


def test_flat_column_names_matches_flatten(spark):
    df = _items_df(spark)
    assert flat_column_names(df.schema) == flatten(df).columns
    assert (
        flat_column_names(df.schema, list_policy="positional", list_width=2)
        == flatten(df, list_policy="positional", list_width=2).columns
    )


def test_no_dedup_keeps_duplicates(spark):
    flat = flatten(_items_df(spark), dedup=False)
    # snippet.title + snippet.localized.title (localizations is a MapType leaf)
    assert flat.columns.count("title") == 2
