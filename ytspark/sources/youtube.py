"""Deterministic YouTube-API-shaped fixture source (SURVEY §2 S1;
FIXTURES.md §1).

The reference fetches ``channels().list`` with parts
``id,localizations,snippet,statistics,status,topicDetails``
(``dags/extract.py:77-81``). This module generates payloads of exactly
that shape without the network: same nested structure, duplicate leaf
names across paths (``snippet.title`` vs ``snippet.localized.title``,
three ``thumbnails.*.url``), list-valued ``topicIds``, and numeric
strings above int32 — everything the flatten/cast path must survive.

A real connector would implement the PySpark 4 Python DataSource API;
the transform surface downstream is identical either way.
"""

from __future__ import annotations

REFERENCE_CHANNEL_TITLES = (
    "Jungle Toons-Kids TV",
    "MrBeast",
    "PewDiePie",
    "T-Series",
    "Madan Gowri",
    "Cocomelon - Nursery Rhymes",
    "Vj Siddhu Vlogs",
)


def channel_payload(
    title: str,
    *,
    tick: int = 0,
    channel_id: str | None = None,
) -> dict:
    """One ``channels().list`` response for one channel at poll ``tick``.

    Counters grow deterministically with ``tick`` (monotone snapshots,
    FIXTURES.md §2). All statistics are strings, as the real API sends.
    """
    seed = sum(ord(c) for c in title)
    cid = channel_id or f"UC{seed:022d}"
    views = (seed * 1_000_003 + tick * 9_871) * 1_000  # > int32 for real titles
    subs = seed * 10_007 + tick * 97
    videos = seed % 900 + tick
    thumb = lambda px: {  # noqa: E731
        "url": f"https://yt3.example/{cid}/s{px}.jpg",
        "width": px,
        "height": px,
    }
    return {
        "kind": "youtube#channelListResponse",
        "etag": f"etag-{seed}-{tick}",
        "items": [{
            "kind": "youtube#channel",
            "etag": f"etag-item-{seed}-{tick}",
            "id": cid,
            "snippet": {
                "title": title,
                "description": f"Channel {title} description",
                "customUrl": "@" + title.replace(" ", "").lower(),
                "publishedAt": f"20{seed % 20 + 6:02d}-03-{seed % 27 + 1:02d}T04:30:00Z",
                "thumbnails": {
                    "default": thumb(88),
                    "medium": thumb(240),
                    "high": thumb(800),
                },
                "localized": {
                    "title": f"{title} (localized)",
                    "description": f"Localized description {seed}",
                },
                "country": ["US", "IN", "SE", "CA"][seed % 4],
            },
            "statistics": {
                "viewCount": str(views),
                "subscriberCount": str(subs),
                "hiddenSubscriberCount": False,
                "videoCount": str(videos),
            },
            "topicDetails": {
                "topicIds": [f"/m/topic{seed % 5}", f"/m/topic{seed % 7}"],
                "topicCategories": [
                    f"https://en.wikipedia.org/wiki/Category{seed % 3}"
                ],
            },
            "status": {
                "privacyStatus": "public",
                "isLinked": True,
                "longUploadsStatus": "longUploadsUnspecified",
                "madeForKids": seed % 2 == 0,
            },
            "localizations": {
                "en": {"title": title, "description": f"desc {seed}"},
            },
        }],
    }


def poll_tick(titles=REFERENCE_CHANNEL_TITLES, *, tick: int = 0) -> list[dict]:
    """One poll over all channels — the reference's per-channel fan-out
    loop (``dags/extract.py:146-148``) as a payload batch."""
    return [channel_payload(t, tick=tick) for t in titles]
