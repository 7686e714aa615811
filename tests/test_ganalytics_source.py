"""The GA-shaped second source and the two-source merge (the
reference's north-star sentence: 'merging Google Analytics with
YouTube API data'; its architecture diagram shows the GA box but
ships no GA code, so the fixture shape is the spec)."""

from __future__ import annotations

from ytspark.sources.ganalytics import (
    GA_DAYS,
    channel_seeds,
    run_report,
    sessions_frame,
    sessions_metrics,
)
from ytspark.sources.youtube import REFERENCE_CHANNEL_TITLES, channel_payload


def test_run_report_shape_matches_ga4():
    rows = run_report()
    assert len(rows) == 7 * GA_DAYS
    r = rows[0]
    # GA4 Data API v1 shape: string-typed dimension/metric values
    assert [d["value"] for d in r["dimensionValues"]][0].startswith("2026-")
    assert all(isinstance(m["value"], str) for m in r["metricValues"])
    assert r["property"].startswith("properties/")


def test_metrics_deterministic_and_positive():
    for _, _, seed in channel_seeds():
        for d in range(GA_DAYS):
            s, pv, eng = sessions_metrics(seed, d)
            assert sessions_metrics(seed, d) == (s, pv, eng)
            assert 0 < s and s * 3 <= pv and eng >= s * 45


def test_custom_url_bridges_to_youtube_source():
    # the join key the merge uses must match the YouTube side exactly
    yt_urls = {
        channel_payload(t)["items"][0]["snippet"]["customUrl"]
        for t in REFERENCE_CHANNEL_TITLES
    }
    ga_urls = {url for _, url, _ in channel_seeds()}
    assert ga_urls == yt_urls


def test_sessions_frame_typed(spark):
    df = sessions_frame(spark)
    assert dict(df.dtypes)["sessions"] == "bigint"
    assert df.count() == 7 * GA_DAYS
    assert df.where("sessions <= 0").count() == 0


def test_join_mart_covers_every_channel(spark):
    from ytspark.queries.pipeline import ga_youtube_join_mart

    out = ga_youtube_join_mart(spark, "/root/testdata/sf0.001").collect()
    assert len(out) == 7
    by_channel = {r["channel"]: r for r in out}
    assert set(by_channel) == set(REFERENCE_CHANNEL_TITLES)
    for r in out:
        assert r["n_days"] == GA_DAYS
        # the YouTube fixture gains 9_871_000 views/day and 97 subs/day
        assert r["yt_view_gain"] == (GA_DAYS - 1) * 9_871_000
        assert r["yt_sub_gain"] == (GA_DAYS - 1) * 97
        assert r["views_per_session_x1000"] > 0
