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


def _good_row_df(spark, *, country="US"):
    return spark.createDataFrame(
        [
            Row(
                title="T", customUrl="@t",
                publishedAt="2026-01-01 00:00:00",
                url="http://x", country=country, viewCount="7",
                subscriberCount="5", videoCount="1", madeForKids=True,
                timestamp="2026-01-01 00:00:00",
            )
        ]
    )


class TestVarcharLengthGate:
    """SURVEY §7.4 / YT_Facts_stg.sql:3-7: the mart's varchar(n)
    widths are ENFORCED on materialization, not just documented."""

    def test_error_mode_raises_on_overflow(self, spark):
        from ytspark.facts import enforce_varchar_lengths

        mart = cast_projection(_good_row_df(spark, country="X" * 11))
        with pytest.raises(Exception) as exc:
            enforce_varchar_lengths(mart, mode="error").collect()
        assert "varchar(10) overflow" in str(exc.value)

    def test_truncate_mode_clips_to_width(self, spark):
        from ytspark.facts import enforce_varchar_lengths

        mart = cast_projection(_good_row_df(spark, country="X" * 11))
        (row,) = enforce_varchar_lengths(mart, mode="truncate").collect()
        assert row["Country"] == "X" * 10
        assert row["title"] == "T"  # in-bounds values untouched

    def test_in_bounds_passes_error_mode(self, spark):
        from ytspark.facts import enforce_varchar_lengths

        mart = cast_projection(_good_row_df(spark))
        (row,) = enforce_varchar_lengths(mart, mode="error").collect()
        assert row["Country"] == "US"

    def test_mart_table_ddl_carries_varchar(self, spark, tmp_path):
        """save_mart_table creates the table with bounded varchar DDL
        (not unbounded StringType) and loads the typed rows."""
        from ytspark.storage import save_mart_table

        mart = cast_projection(_good_row_df(spark))
        save_mart_table(mart, "yt_facts_ddl_test")
        try:
            ddl = spark.sql(
                "SHOW CREATE TABLE yt_facts_ddl_test"
            ).collect()[0][0]
            assert "VARCHAR(50)" in ddl.upper()
            assert "VARCHAR(300)" in ddl.upper()
            assert "VARCHAR(10)" in ddl.upper()
            out = spark.table("yt_facts_ddl_test").collect()
            assert len(out) == 1 and out[0]["Country"] == "US"
        finally:
            spark.sql("DROP TABLE IF EXISTS yt_facts_ddl_test")

    def test_mart_write_resolves_columns_by_name(self, spark):
        """r9 (advisor finding): insertInto resolves positionally, and
        four adjacent string columns would silently column-swap on a
        reordered caller frame — save_mart_table must write correct
        values regardless of the input column order, and must raise on
        a missing column rather than corrupt."""
        import pytest

        from ytspark.facts import MART_COLUMN_ORDER
        from ytspark.storage import save_mart_table

        mart = cast_projection(_good_row_df(spark))
        # adversarial order: reverse the DDL order entirely
        shuffled = mart.select(*reversed(MART_COLUMN_ORDER))
        save_mart_table(shuffled, "yt_facts_order_test")
        try:
            (row,) = spark.table("yt_facts_order_test").collect()
            ref = mart.collect()[0]
            for c in MART_COLUMN_ORDER:
                assert row[c] == ref[c], f"column {c} corrupted"
        finally:
            spark.sql("DROP TABLE IF EXISTS yt_facts_order_test")
        with pytest.raises(Exception, match="url_|UNRESOLVED|cannot"):
            save_mart_table(mart.drop("url_"), "yt_facts_missing_test")
        spark.sql("DROP TABLE IF EXISTS yt_facts_missing_test")
