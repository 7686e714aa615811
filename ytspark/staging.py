"""Staging views (SURVEY §2 T10, S6).

Reference: 7 pass-through dbt views, one per ``<Channel>_RAW`` table
(``models/staging/MrBeast_.sql:1-2`` et al., sources declared in
``models/staging/yt_sources.yml:8-14``). With bronze as ONE partitioned
table, each staging view is a partition-pruned slice — Catalyst inlines
views at analysis time, so downstream plans read only their partition
(the same effect Snowflake view expansion gave the reference).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# The 7 channel slugs of the reference deployment (yt_sources.yml:8-14).
REFERENCE_CHANNELS = (
    "Jungle_Toons_Kids_TV",
    "MrBeast",
    "PewDiePie",
    "T_Series",
    "Madan_Gowri",
    "Cocomelon___Nursery_Rhymes",
    "Vj_Siddhu_Vlogs",
)


def staging_view_name(channel_key: str) -> str:
    return f"stg_{channel_key.lower()}"


def create_staging_views(bronze: DataFrame, channel_keys=REFERENCE_CHANNELS) -> dict[str, DataFrame]:
    """Register one pass-through temp view per channel slice.

    ``select * from source`` with a partition predicate; returns the
    slice DataFrames keyed by view name.
    """
    views: dict[str, DataFrame] = {}
    for key in channel_keys:
        slice_df = bronze.where(F.col("channel_key") == key)
        name = staging_view_name(key)
        slice_df.createOrReplaceTempView(name)
        views[name] = slice_df
    return views
