"""Cast-failure semantics (SURVEY §7.4): ANSI strict mode must raise on
bad casts (Snowflake `::int` parity); lenient mode must NULL them."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from ytspark.facts import cast_projection


def _bad_row_df(spark):
    return spark.createDataFrame(
        [
            Row(
                title="T", customUrl="@t", publishedAt="not-a-date",
                url="http://x", country="US", viewCount="not-a-number",
                subscriberCount="5", videoCount="1", madeForKids=True,
                timestamp="2026-01-01 00:00:00",
            )
        ]
    )


def test_strict_cast_raises_on_garbage(spark):
    assert spark.conf.get("spark.sql.ansi.enabled") == "true"
    df = cast_projection(_bad_row_df(spark), lenient=False)
    with pytest.raises(Exception) as exc:
        df.collect()
    assert "CAST_INVALID_INPUT" in str(exc.value) or "CANNOT_PARSE" in str(exc.value)


def test_lenient_cast_nulls_garbage(spark):
    rows = cast_projection(_bad_row_df(spark), lenient=True).collect()
    assert len(rows) == 1
    assert rows[0]["view_count"] is None          # bad int -> NULL
    assert rows[0]["PublishedAt"] is None          # bad ts -> NULL
    assert rows[0]["subscriberCount"] == 5         # good values survive
