"""Edge-case battery for the round-4 operator machinery: empty
inputs, singletons, and all-ties — the shapes that break operators
whose tests only ever see well-populated data."""

from __future__ import annotations

from pyspark.sql import functions as F


class TestBloomEdges:
    def test_empty_build_side_rejects_everything(self, spark):
        """An empty dim yields an empty bitmap: every probe must fail
        (definitionally no false negatives are possible), and the
        one-row bitmap frame must still exist for the crossJoin."""
        from ytspark.operators.bloom import bloom_build, bloom_filter_fact

        empty = spark.createDataFrame([], "key long")
        bloom = bloom_build(empty, "key")
        assert bloom.count() == 1  # one-row empty-map state
        fact = spark.range(100).withColumnRenamed("id", "key")
        assert bloom_filter_fact(fact, bloom, "key").count() == 0

    def test_single_key_filter(self, spark):
        from ytspark.operators.bloom import bloom_build, bloom_filter_fact

        one = spark.createDataFrame([(42,)], "key long")
        bloom = bloom_build(one, "key")
        fact = spark.range(1000).withColumnRenamed("id", "key")
        passed = {
            r["key"] for r in bloom_filter_fact(fact, bloom, "key").collect()
        }
        assert 42 in passed  # never a false negative
        # 3 bits set out of 4096: false positives should be rare
        assert len(passed) < 20


class TestFoldEdges:
    def test_token_bucket_single_event(self, spark, monkeypatch):
        """One event: accepted iff it fits a full bucket; no refill
        term can apply (the null-prev-timestamp branch)."""
        import ytspark.operators.timeseries as ts

        df = spark.createDataFrame(
            [(1, "2026-01-01 00:00:00", 1, 50.0)],
            "user_id long, ts string, event_id long, value double",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        df = df.withColumn("event_type", F.lit("view"))
        import tempfile

        d = tempfile.mkdtemp()
        df.write.mode("overwrite").parquet(f"{d}/events.parquet")
        (r,) = ts.rate_limit_token_bucket(spark, d).collect()
        assert (r["n_events"], r["n_accepted"], r["n_rejected"]) == (1, 1, 0)
        assert r["tokens_left_u"] == ts.BUCKET_CAP_U - int(
            50.0 * ts.BUCKET_TOKEN_U
        )

    def test_token_bucket_oversized_event_rejected(self, spark):
        import tempfile

        import ytspark.operators.timeseries as ts

        cap_tokens = ts.BUCKET_CAP_U / ts.BUCKET_TOKEN_U
        df = spark.createDataFrame(
            [
                (1, "2026-01-01 00:00:00", 1, cap_tokens + 1.0),
                (1, "2026-01-01 00:00:01", 2, 1.0),
            ],
            "user_id long, ts string, event_id long, value double",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        df = df.withColumn("event_type", F.lit("view"))
        d = tempfile.mkdtemp()
        df.write.mode("overwrite").parquet(f"{d}/events.parquet")
        (r,) = ts.rate_limit_token_bucket(spark, d).collect()
        # oversized event rejected and consumes nothing; the next
        # small event is accepted from a still-full bucket
        assert (r["n_accepted"], r["n_rejected"]) == (1, 1)


class TestSweepEdges:
    def test_interval_union_single_event(self, spark):
        import tempfile

        from ytspark.operators.temporal import (
            COVERAGE_WINDOW_S,
            interval_union_coverage,
        )

        df = spark.createDataFrame(
            [(7, "2026-01-01 10:00:00", 1, "view", 1.0)],
            "user_id long, ts string, event_id long, event_type string,"
            " value double",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        d = tempfile.mkdtemp()
        df.write.mode("overwrite").parquet(f"{d}/events.parquet")
        (r,) = interval_union_coverage(spark, d).collect()
        assert r["active_seconds"] == COVERAGE_WINDOW_S
        assert (r["n_sessions"], r["n_days"]) == (1, 1)

    def test_interval_union_exact_tangency_merges(self, spark):
        """Spans that touch exactly (next start == prev end) merge:
        the sweep's strict > keeps tangent intervals in one segment."""
        import tempfile

        from ytspark.operators.temporal import (
            COVERAGE_WINDOW_S,
            interval_union_coverage,
        )

        t0 = "2026-01-01 10:00:00"
        t1 = "2026-01-01 10:05:00"  # exactly at the first span's end
        df = spark.createDataFrame(
            [(7, t0, 1, "view", 1.0), (7, t1, 2, "view", 1.0)],
            "user_id long, ts string, event_id long, event_type string,"
            " value double",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        d = tempfile.mkdtemp()
        df.write.mode("overwrite").parquet(f"{d}/events.parquet")
        (r,) = interval_union_coverage(spark, d).collect()
        assert r["n_sessions"] == 1
        assert r["active_seconds"] == 2 * COVERAGE_WINDOW_S


class TestAllocationEdges:
    def test_largest_remainder_exactness_on_skew(self, spark):
        """Extreme skew (one giant + many tiny strata): allocations
        still sum exactly to the target and no stratum overdraws
        beyond ceil(quota)."""
        import tempfile

        from ytspark.operators.text import STRAT_TOTAL, stratified_sample_exact

        rows = [(i, f"tok{i}", "en", "big", 10) for i in range(10_000)]
        rows += [
            (10_000 + j, f"t{j}", "en", f"tiny{j}", 10) for j in range(9)
        ]
        df = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string,"
            " n_chars long"
        )
        d = tempfile.mkdtemp()
        df.write.mode("overwrite").parquet(f"{d}/documents.parquet")
        out = stratified_sample_exact(spark, d).collect()
        assert sum(r["n_alloc"] for r in out) == STRAT_TOTAL
        n = 10_009
        for r in out:
            quota = STRAT_TOTAL * r["n_docs"] / n
            assert quota - 1 < r["n_alloc"] <= quota + 1


class TestSkylineEdges:
    def test_all_identical_points_all_survive(self, spark):
        """Identical rows dominate nothing — the whole set is the
        frontier (no strict inequality exists)."""
        import tempfile

        from ytspark.operators.pareto import skyline_pareto_parts

        df = spark.createDataFrame(
            [(i, "n", "b", "t", 5, 10.0) for i in range(8)],
            "p_partkey long, p_name string, p_brand string, p_type string,"
            " p_size int, p_retailprice double",
        )
        d = tempfile.mkdtemp()
        df.write.mode("overwrite").parquet(f"{d}/part.parquet")
        assert skyline_pareto_parts(spark, d).count() == 8
