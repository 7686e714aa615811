"""Tests for the search (inverted index / TF-IDF / BM25), fuzzy-join,
z-order layout, and gap-fill interpolation operators.

Cross-engine value certification lives in tools/oracle_check.py; these
pin the semantics on crafted inputs and the plan/layout properties the
oracles can't see.
"""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ytspark.operators.fuzzy import deletion_variants, fuzzy_self_join
from ytspark.operators.layout import ZBITS, zorder_col
from ytspark.operators.search import (
    BM25_B,
    BM25_K1,
    BM25_QUERY,
    bm25_search,
    doc_terms,
)


class TestSearch:
    def test_doc_terms_tf(self, spark):
        docs = spark.createDataFrame(
            [(1, "a b a"), (2, "b")], "doc_id long, text string"
        )
        got = sorted(tuple(r) for r in doc_terms(docs).collect())
        assert got == [(1, "a", 2), (1, "b", 1), (2, "b", 1)]

    def test_bm25_hand_computed(self, spark, tmp_path):
        # corpus crafted so doc 1 repeats a query term, doc 2 mentions
        # two query terms once, doc 3 has none
        docs = [
            (1, "table table table x"),
            (2, "table join y z"),
            (3, "q r s t"),
        ]
        spark.createDataFrame(
            docs, "doc_id long, text string"
        ).write.parquet(f"{tmp_path}/documents.parquet")
        out = {
            r["doc_id"]: (r["bm25"], r["n_terms_hit"])
            for r in bm25_search(spark, str(tmp_path)).collect()
        }
        assert set(out) == {1, 2}  # doc 3 matches nothing

        def idf(df, n=3):
            return math.log(1.0 + (n - df + 0.5) / (df + 0.5))

        def term(tf, df, dl, avg=4.0):
            return (
                idf(df)
                * tf
                * (BM25_K1 + 1.0)
                / (tf + BM25_K1 * (1 - BM25_B + BM25_B * dl / avg))
            )

        assert out[1][1] == 1 and out[2][1] == 2
        assert abs(out[1][0] - round(term(3, 2, 4), 6)) < 1e-6
        assert abs(out[2][0] - round(term(1, 2, 4) + term(1, 1, 4), 6)) < 1e-6

    def test_bm25_prunes_before_shuffle(self, spark, sf_dir):
        """The query-term filter must sit below the first exchange —
        serving cost is O(query-term postings), not O(corpus)."""
        plan = (
            bm25_search(spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        first_exchange = plan.find("Exchange")
        term_filter = plan.find("Filter")
        assert first_exchange != -1 and term_filter != -1
        # the plan string prints operators top-down (root first), so a
        # LARGER offset means DEEPER in the tree: the filter must
        # appear after (deeper than) the first exchange
        assert term_filter > first_exchange
        assert str(tuple(BM25_QUERY)) != ""  # query is a fixed literal


class TestFuzzyJoin:
    def test_deletion_variants(self, spark):
        df = spark.createDataFrame([("abc",)], "s string")
        got = sorted(
            r["variant"] for r in deletion_variants(df, "s").collect()
        )
        assert got == ["ab", "abc", "ac", "bc"]

    def test_repeated_chars_dedup(self, spark):
        df = spark.createDataFrame([("aa",)], "s string")
        got = sorted(
            r["variant"] for r in deletion_variants(df, "s").collect()
        )
        assert got == ["a", "aa"]

    @settings(max_examples=25, deadline=None)
    @given(
        st.lists(
            st.text(alphabet="abc", min_size=1, max_size=5),
            min_size=2,
            max_size=8,
            unique=True,
        )
    )
    def test_blocking_recall_equals_bruteforce(self, spark, strings):
        """SymSpell blocking must find EXACTLY the edit-distance-<=1
        pairs a quadratic scan finds, on arbitrary short strings."""

        def lev(a, b):
            dp = list(range(len(b) + 1))
            for i, ca in enumerate(a, 1):
                prev, dp[0] = dp[0], i
                for j, cb in enumerate(b, 1):
                    prev, dp[j] = dp[j], min(
                        dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                    )
            return dp[len(b)]

        expect = sorted(
            (a, b)
            for i, a in enumerate(strings)
            for b in strings[i + 1 :]
            if lev(a, b) <= 1
        )
        expect = [(min(a, b), max(a, b)) for a, b in expect]
        df = spark.createDataFrame([(s,) for s in strings], "c_name string")
        got = sorted(
            (r["name_a"], r["name_b"])
            for r in fuzzy_self_join(df, "c_name").collect()
        )
        assert got == sorted(expect)


class TestZorder:
    @settings(max_examples=30, deadline=None)
    @given(st.integers(0, 255), st.integers(0, 255))
    def test_interleave_matches_reference(self, spark, x, y):
        def morton(a, b):
            z = 0
            for i in range(ZBITS):
                z |= ((a >> i) & 1) << (2 * i)
                z |= ((b >> i) & 1) << (2 * i + 1)
            return z

        df = spark.createDataFrame([(x, y)], "x int, y int")
        got = df.select(
            zorder_col(F.col("x"), F.col("y")).alias("z")
        ).collect()[0]["z"]
        assert got == morton(x, y)

    def test_zorder_bounds_both_dims_single_sort_does_not(self, spark):
        """The layout property itself: bucketing the z-curve bounds the
        value span of BOTH dimensions per bucket; bucketing a single-
        column sort leaves the other dimension unbounded. This is why a
        z-ordered rewrite lets footer stats prune on either column."""
        n, side, buckets = 1 << 14, 1 << ZBITS, 64
        rows_per = n // buckets
        df = spark.range(n).select(
            F.pmod(F.col("id") * 7919, F.lit(side)).alias("x"),
            F.pmod(F.col("id") * 104729, F.lit(side)).alias("y"),
        )

        def max_span(ordered_col):
            w = F.floor(
                (
                    F.row_number().over(Window.orderBy(ordered_col, "x", "y"))
                    - 1
                )
                / rows_per
            )
            spans = (
                df.withColumn("b", w)
                .groupBy("b")
                .agg(
                    (F.max("x") - F.min("x")).alias("sx"),
                    (F.max("y") - F.min("y")).alias("sy"),
                )
                .agg(F.max("sx").alias("mx"), F.max("sy").alias("my"))
                .collect()[0]
            )
            return spans["mx"], spans["my"]

        zx, zy = max_span(zorder_col(F.col("x"), F.col("y")))
        sx, sy = max_span(F.col("x"))
        # single-column sort: x tightly bounded, y unbounded (~full side)
        assert sx < side // 4 and sy > side * 3 // 4
        # z-order: BOTH dims bounded well below the full side
        assert zx < side // 2 and zy < side // 2
        assert max(zx, zy) < sy


class TestGapFill:
    def test_interpolation_semantics(self, spark, sf_dir):
        from ytspark.queries import registry

        out = registry()["gap_fill_linear_interpolation"].fn(
            spark, sf_dir
        ).toPandas()
        kinds = set(out["fill_kind"])
        assert "obs" in kinds and "interp" in kinds  # gaps really exist
        assert out["revenue_filled_cents"].notna().all()
        # every (pri, day) appears exactly once — dense spine
        assert not out.duplicated(["pri", "day"]).any()


class TestFileSkipping:
    def test_clustered_layout_skips_random_does_not(self, spark, sf_dir):
        """The operator's whole point: under min/max zone-map pruning a
        time-clustered layout scans a small fraction of files for a
        one-month predicate while a hash-random layout scans ~all of
        them — and both layouts agree on rows_matched (pruning never
        changes the answer)."""
        from ytspark.operators.layout import file_skipping_stats

        out = file_skipping_stats(spark, sf_dir).toPandas()
        piv = out.set_index(["layout", "predicate"])
        for pred in out["predicate"].unique():
            clus = piv.loc[("time_clustered", pred)]
            rand = piv.loc[("hash_random", pred)]
            # same answer regardless of layout
            assert clus["rows_matched"] == rand["rows_matched"] > 0
            # scanning is sound: matched rows only come from scanned files
            assert clus["rows_scanned"] >= clus["rows_matched"]
            assert rand["rows_scanned"] >= rand["rows_matched"]
            # random layout: ~every file overlaps every month (at tiny
            # test SF a sparse bucket can squeak through — allow 5%)
            assert rand["files_scanned"] >= rand["n_files"] * 0.95
            # clustered layout: a month predicate prunes >70% of files
            assert clus["files_scanned"] < clus["n_files"] * 0.3
