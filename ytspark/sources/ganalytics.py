"""Deterministic Google-Analytics-shaped fixture source.

The reference's architecture diagram (``Architecutral_Diagram.png``)
shows Google Analytics as the SECOND source feeding the warehouse next
to the YouTube API ("merging Google Analytics with YouTube API data"),
but ships no GA extraction code — so this module supplies the
GA4-shaped half of that merge the same way ``sources/youtube.py``
supplies the API half: a network-free, deterministic fixture with the
real payload shape (GA4 ``runReport`` rows: string-typed
dimensionValues/metricValues), so the downstream parse/typed-cast/join
path is exercised end to end.

Join key: each GA web property corresponds to one channel's site and
carries the channel's ``customUrl`` as a custom dimension — the
realistic warehouse-side bridge between a GA property and a YouTube
channel.

All metrics are small integer formulas of (channel seed, day index),
so a DuckDB oracle can regenerate the exact frame from a literal
channel table plus ``RANGE(days)`` — the fixture is hash-certifiable.
"""

from __future__ import annotations

from ytspark.sources.youtube import REFERENCE_CHANNEL_TITLES

GA_DAYS = 28  # one report month
GA_START_DATE = "2026-01-01"


def _seed(title: str) -> int:
    # the same per-channel seed rule as sources/youtube.py
    return sum(ord(c) for c in title)


def custom_url(title: str) -> str:
    # the same rule as channel_payload's snippet.customUrl
    return "@" + title.replace(" ", "").lower()


def channel_seeds() -> list[tuple[str, str, int]]:
    """(title, customUrl, seed) for the 7 reference channels — also the
    literal table the DuckDB oracle embeds."""
    return [
        (t, custom_url(t), _seed(t)) for t in REFERENCE_CHANNEL_TITLES
    ]


def sessions_metrics(seed: int, day: int) -> tuple[int, int, int]:
    """(sessions, pageviews, engaged_seconds) for one property-day.

    Pure integer arithmetic so both engines regenerate it exactly:
    a per-channel base plus a deterministic daily wobble, pageviews a
    per-session multiple plus remainder traffic, engagement seconds a
    per-session rate.
    """
    sessions = 500 + seed % 700 + (seed * 131 + day * 37) % 400
    pageviews = sessions * 3 + (seed * 17 + day * 11) % 97
    engaged_seconds = sessions * (45 + (seed + day) % 30)
    return sessions, pageviews, engaged_seconds


def run_report(*, days: int = GA_DAYS) -> list[dict]:
    """GA4 ``properties.runReport``-shaped rows: one dict per
    (property, date) with string-typed dimension/metric values, exactly
    as the Data API v1 returns them."""
    import datetime

    start = datetime.date.fromisoformat(GA_START_DATE)
    out = []
    for title, url, seed in channel_seeds():
        for d in range(days):
            sessions, pageviews, engaged = sessions_metrics(seed, d)
            out.append(
                {
                    "dimensionValues": [
                        # real date arithmetic: days > 31 rolls into the
                        # next month instead of emitting '2026-01-32'
                        # for ANSI to_date to throw on downstream
                        {
                            "value": (
                                start + datetime.timedelta(days=d)
                            ).isoformat()
                        },
                        {"value": url},
                    ],
                    "metricValues": [
                        {"value": str(sessions)},
                        {"value": str(pageviews)},
                        {"value": str(engaged)},
                    ],
                    "property": f"properties/{seed}",
                    "channel_title": title,
                }
            )
    return out


def sessions_frame(spark, *, days: int = GA_DAYS):
    """Parse the GA payloads into the typed sessions-by-day frame —
    the GA half of the reference's two-source merge. String metric
    values cast under ANSI (the S1 ingest discipline)."""
    from pyspark.sql import functions as F

    rows = [
        (
            r["dimensionValues"][0]["value"],
            r["dimensionValues"][1]["value"],
            r["channel_title"],
            r["metricValues"][0]["value"],
            r["metricValues"][1]["value"],
            r["metricValues"][2]["value"],
        )
        for r in run_report(days=days)
    ]
    raw = spark.createDataFrame(
        rows,
        "date string, customUrl string, channel_title string, "
        "sessions string, pageviews string, engaged_seconds string",
    )
    return raw.select(
        F.to_date("date").alias("date"),
        F.col("customUrl"),
        F.col("channel_title"),
        F.col("sessions").cast("long").alias("sessions"),
        F.col("pageviews").cast("long").alias("pageviews"),
        F.col("engaged_seconds").cast("long").alias("engaged_seconds"),
    )
