"""SQL model-DAG runner (SURVEY §2 O4): dependency ordering, ref/source
rendering, and reference-shaped staging→mart execution."""

from __future__ import annotations

import pytest

from ytspark.models import Model, model_deps, render, run_models, topo_order


def test_topo_orders_refs_before_dependents():
    models = [
        Model("mart", "SELECT * FROM {{ ref('stg_a') }} UNION ALL SELECT * FROM {{ ref('stg_b') }}"),
        Model("stg_b", "SELECT * FROM {{ source('yt', 'raw_b') }}"),
        Model("stg_a", "SELECT * FROM {{ source('yt', 'raw_a') }}"),
    ]
    names = [m.name for m in topo_order(models)]
    assert names.index("stg_a") < names.index("mart")
    assert names.index("stg_b") < names.index("mart")
    assert model_deps(models[0]) == {"stg_a", "stg_b"}


def test_unknown_ref_and_cycle_rejected():
    with pytest.raises(ValueError, match="unknown"):
        topo_order([Model("a", "SELECT * FROM {{ ref('missing') }}")])
    with pytest.raises(ValueError, match="cycle"):
        topo_order(
            [
                Model("a", "SELECT * FROM {{ ref('b') }}"),
                Model("b", "SELECT * FROM {{ ref('a') }}"),
            ]
        )


def test_render_resolves_jinja_calls():
    sql = "SELECT * FROM {{ source('yt', 'raw_x') }} JOIN {{ ref('stg_y') }} USING (k)"
    assert render(sql) == "SELECT * FROM raw_x JOIN stg_y USING (k)"


def test_reference_shaped_model_dag(spark):
    """The reference's dbt project shape end-to-end: per-channel
    pass-through staging views over bronze slices + a cast+union mart
    TABLE — results must equal the DataFrame-API mart builder."""
    from ytspark import facts, ingest
    from ytspark.sources.youtube import poll_tick

    bronze = ingest.ingest(spark, poll_tick(tick=0), ingest_ts="2026-01-01 00:00:00")
    bronze.createOrReplaceTempView("bronze_raw")

    channels = ["MrBeast", "PewDiePie"]
    cast_cols = """
        CAST(title AS STRING) AS title,
        CAST(customUrl AS STRING) AS customUrl,
        CAST(publishedAt AS TIMESTAMP) AS PublishedAt,
        CAST(url AS STRING) AS url_,
        CAST(country AS STRING) AS Country,
        CAST(viewCount AS LONG) AS view_count,
        CAST(subscriberCount AS LONG) AS subscriberCount,
        CAST(videoCount AS LONG) AS videoCount,
        CAST(madeForKids AS BOOLEAN) AS madeForKids,
        CAST(timestamp AS TIMESTAMP) AS timestamp
    """
    models = [
        Model(
            f"stg_{c.lower()}",
            "SELECT * FROM {{ source('yt', 'bronze_raw') }} "
            f"WHERE channel_key = '{c}'",
        )
        for c in channels
    ] + [
        Model(
            "yt_facts_model_test",
            " UNION ALL ".join(
                f"SELECT {cast_cols} FROM {{{{ ref('stg_{c.lower()}') }}}}"
                for c in channels
            ),
            materialized="table",
        )
    ]
    out = run_models(spark, models)
    mart_sql = out["yt_facts_model_test"]
    try:
        from pyspark.sql import functions as F

        mart_df = facts.build_mart(
            bronze.where(F.col("channel_key").isin(channels))
        )
        assert sorted(map(tuple, mart_sql.collect())) == sorted(
            map(tuple, mart_df.collect())
        )
        assert mart_sql.columns == mart_df.columns
    finally:
        spark.sql("DROP TABLE IF EXISTS yt_facts_model_test")
