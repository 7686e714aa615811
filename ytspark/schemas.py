"""Explicit StructTypes for the pipeline (SURVEY §1.3/§1.4).

The reference lets pandas/CSV/Snowflake infer schemas at every boundary
(``dags/extract.py:93,120,171``); this engine declares them once. The
API payload shape is the public YouTube Data API v3 ``channels().list``
response with parts ``id,localizations,snippet,statistics,status,
topicDetails`` (reference ``dags/extract.py:77-81``; FIXTURES.md §1).
"""

from __future__ import annotations

from pyspark.sql import types as T


def _s(name: str, dtype: T.DataType, nullable: bool = True) -> T.StructField:
    return T.StructField(name, dtype, nullable)


THUMBNAIL = T.StructType([
    _s("url", T.StringType()),
    _s("width", T.IntegerType()),
    _s("height", T.IntegerType()),
])

SNIPPET = T.StructType([
    _s("title", T.StringType()),
    _s("description", T.StringType()),
    _s("customUrl", T.StringType()),
    _s("publishedAt", T.StringType()),  # ISO-8601 string, cast at the mart
    _s("thumbnails", T.StructType([
        _s("default", THUMBNAIL),
        _s("medium", THUMBNAIL),
        _s("high", THUMBNAIL),
    ])),
    _s("localized", T.StructType([
        _s("title", T.StringType()),
        _s("description", T.StringType()),
    ])),
    _s("country", T.StringType()),
])

# All statistics counters arrive as STRINGS from the API (FIXTURES.md §1);
# real view counts exceed int32 (T-Series ≈ 2.4e11) so the typed layer
# uses LongType, never IntegerType (SURVEY §7.4).
STATISTICS = T.StructType([
    _s("viewCount", T.StringType()),
    _s("subscriberCount", T.StringType()),
    _s("hiddenSubscriberCount", T.BooleanType()),
    _s("videoCount", T.StringType()),
])

STATUS = T.StructType([
    _s("privacyStatus", T.StringType()),
    _s("isLinked", T.BooleanType()),
    _s("longUploadsStatus", T.StringType()),
    _s("madeForKids", T.BooleanType()),
])

TOPIC_DETAILS = T.StructType([
    _s("topicIds", T.ArrayType(T.StringType())),
    _s("topicCategories", T.ArrayType(T.StringType())),
])

CHANNEL_ITEM = T.StructType([
    _s("kind", T.StringType()),
    _s("etag", T.StringType()),
    _s("id", T.StringType()),
    _s("snippet", SNIPPET),
    _s("statistics", STATISTICS),
    _s("topicDetails", TOPIC_DETAILS),
    _s("status", STATUS),
    # `localizations` is a language→{title,description} map
    # (requested at dags/extract.py:78, collapsed by flatten+dedup)
    _s("localizations", T.MapType(
        T.StringType(),
        T.StructType([_s("title", T.StringType()), _s("description", T.StringType())]),
    )),
])

API_RESPONSE = T.StructType([
    _s("kind", T.StringType()),
    _s("etag", T.StringType()),
    _s("items", T.ArrayType(CHANNEL_ITEM)),
])

# Columns v1 drops after flattening (reference dags/extract.py:113).
V1_DROP_COLUMNS = ("kind", "description", "etag", "id")

# Typed mart schema — cast list models/marts/YT_Facts_stg.sql:3-12
# (FIXTURES.md §3). Column names exactly as the reference aliases them.
FACT_SCHEMA = T.StructType([
    _s("title", T.StringType()),
    _s("customUrl", T.StringType()),
    _s("PublishedAt", T.TimestampType()),
    _s("url_", T.StringType()),
    _s("Country", T.StringType()),
    _s("view_count", T.LongType()),
    _s("subscriberCount", T.LongType()),
    _s("videoCount", T.LongType()),
    _s("madeForKids", T.BooleanType()),
    _s("timestamp", T.TimestampType()),
])
