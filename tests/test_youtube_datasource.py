"""PySpark 4 Python DataSource for the YouTube source (SURVEY §2 S1)."""

from __future__ import annotations

from ytspark.ingest import transform_responses
from ytspark.sources.youtube import REFERENCE_CHANNEL_TITLES
from ytspark.sources.youtube_datasource import read_youtube, register_youtube_source


def test_format_read_one_row_per_channel(spark):
    register_youtube_source(spark)
    df = (
        spark.read.format("youtube")
        .option("channels", "MrBeast,PewDiePie")
        .option("tick", "3")
        .load()
    )
    rows = df.collect()
    assert sorted(r["channel"] for r in rows) == ["MrBeast", "PewDiePie"]
    assert all(r["tick"] == 3 for r in rows)
    # one input partition per channel (the fan-out property)
    assert df.rdd.getNumPartitions() == 2


def test_typed_read_feeds_ingest_transform(spark):
    responses = read_youtube(spark, tick=1)
    bronze = transform_responses(responses, ingest_ts="2026-01-01 00:00:00")
    rows = bronze.collect()
    assert len(rows) == len(REFERENCE_CHANNEL_TITLES)
    by_key = {r["channel_key"]: r for r in rows}
    # the reference's slug semantics survive the DataSource path
    assert "Cocomelon___Nursery_Rhymes" in by_key
    assert by_key["MrBeast"]["subscriberCount"] is not None


def test_stream_read_advances_tick_offsets(spark, tmp_path):
    """The streaming face: each micro-batch is one poll tick across all
    channels; offsets checkpoint as tick numbers."""
    import time
    import uuid

    register_youtube_source(spark)
    sink = f"yt_stream_{uuid.uuid4().hex[:8]}"
    q = (
        spark.readStream.format("youtube")
        .option("channels", "MrBeast,PewDiePie")
        .load()
        .writeStream.format("memory")
        .queryName(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            ticks = {r["tick"] for r in spark.table(sink).collect()}
            if {0, 1} <= ticks:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    rows = spark.table(sink).collect()
    by_tick = {}
    for r in rows:
        by_tick.setdefault(r["tick"], set()).add(r["channel"])
    # every processed tick polled BOTH channels exactly once
    assert {0, 1} <= set(by_tick)
    assert by_tick[0] == {"MrBeast", "PewDiePie"}
    assert by_tick[1] == {"MrBeast", "PewDiePie"}


class TestLiveFetchSeam:
    def test_fetch_live_builds_reference_request(self):
        """The live path must request the reference's exact part list
        (dags/extract.py:78) with id+key, and parse the JSON body."""
        import io
        import json
        from contextlib import contextmanager

        from ytspark.sources.youtube_datasource import API_PARTS, fetch_live

        seen = {}

        @contextmanager
        def fake_urlopen(url, timeout=None):
            seen["url"] = url
            seen["timeout"] = timeout
            yield io.BytesIO(json.dumps({"items": [{"id": "UC123"}]}).encode())

        out = fetch_live("UC123", "sekret", transport=fake_urlopen)
        assert out == {"items": [{"id": "UC123"}]}
        assert seen["url"].startswith("https://www.googleapis.com/youtube/v3/channels?")
        from urllib.parse import parse_qs, urlparse

        qs = parse_qs(urlparse(seen["url"]).query)
        assert qs["part"] == [API_PARTS]
        assert qs["id"] == ["UC123"]
        assert qs["key"] == ["sekret"]
        assert seen["timeout"] == 30.0

    def test_fetch_dispatch_and_validation(self):
        import pytest

        from ytspark.sources.youtube_datasource import _fetch

        fx = _fetch("MrBeast", 0)  # fixture default
        assert fx["items"][0]["snippet"]["title"] == "MrBeast"
        with pytest.raises(ValueError, match="api_key"):
            _fetch("MrBeast", 0, mode="live")

    def test_live_mode_option_validated_at_reader_build(self):
        import pytest

        from ytspark.sources.youtube_datasource import YouTubeReader

        with pytest.raises(ValueError, match="api_key"):
            YouTubeReader({"mode": "live"})

    def test_live_mode_rejects_display_titles(self):
        """channels().list id= ignores display titles (returns empty
        items with HTTP 200) — a title in live mode must fail at plan
        time, not land empty payloads silently."""
        import pytest

        from ytspark.sources.youtube_datasource import (
            YouTubeReader,
            YouTubeStreamReader,
            _fetch,
        )

        with pytest.raises(ValueError, match="UC"):
            YouTubeReader(
                {"mode": "live", "api_key": "k", "channels": "MrBeast"}
            )
        with pytest.raises(ValueError, match="UC"):
            YouTubeStreamReader(
                {"mode": "live", "api_key": "k", "channels": "MrBeast,UC1"}
            )
        with pytest.raises(ValueError, match="UC"):
            _fetch("MrBeast", 0, mode="live", api_key="k")

    def test_live_mode_defaults_to_reference_channel_ids(self):
        from ytspark.sources.youtube_datasource import (
            REFERENCE_CHANNEL_IDS,
            YouTubeReader,
        )

        r = YouTubeReader({"mode": "live", "api_key": "k"})
        assert tuple(r.titles) == REFERENCE_CHANNEL_IDS  # dags/extract.py:36

    def test_fetch_live_fails_loudly_on_empty_items(self):
        """The API signals an unknown id via an EMPTY items list, not an
        HTTP error — the seam must surface that instead of landing an
        empty payload."""
        import io
        import json
        import pytest
        from contextlib import contextmanager

        from ytspark.sources.youtube_datasource import fetch_live

        @contextmanager
        def fake_urlopen(url, timeout=None):
            yield io.BytesIO(json.dumps({"items": []}).encode())

        with pytest.raises(RuntimeError, match="no items"):
            fetch_live("UCdoesnotexist0000000000", "k", transport=fake_urlopen)
