"""Round-6 operators: semantic properties beyond the oracle hash gate.

Each new operator's value-correctness is certified by its DuckDB
oracle (tools/oracle_check.py); these tests pin the SEMANTIC claims
the docstrings make — the winnowing guarantee, the Shapley efficiency
axiom, the compaction target property, RAKE's ranking contract, and
the quantile-sketch bound.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


class TestWinnowing:
    def test_guarantee_shared_run_yields_shared_fingerprint(self, spark):
        from ytspark.operators.dedup import (
            WIN_K,
            WIN_W,
            dedup_winnowing_fingerprints,
        )

        # two docs sharing a LONG run of distinct tokens must share
        # fingerprints (the winnowing guarantee: any shared substring
        # of >= K+W-1 tokens shares >= 1; a 2(K+W)-token run spans
        # enough windows that >= WIN_MIN_SHARED distinct fingerprints
        # are selected); doc 2 is disjoint and must not pair
        shared = " ".join(f"s{i}" for i in range(2 * (WIN_K + WIN_W)))
        rows = [
            (0, "alpha beta " + shared + " gamma delta epsilon zeta", "a", "en"),
            (1, shared + " other words here now whatever indeed", "a", "en"),
            (2, "completely different tokens nothing in common at all x y z",
             "a", "en"),
        ]
        docs = spark.createDataFrame(
            rows, "doc_id bigint, text string, source string, lang string"
        )
        import os
        import tempfile

        d = tempfile.mkdtemp()
        docs.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
        out = {
            (r["doc_a"], r["doc_b"])
            for r in dedup_winnowing_fingerprints(spark, d).collect()
        }
        assert (0, 1) in out
        assert all(2 not in p for p in out)

    def test_density_bound(self, spark, sf_dir):
        # fingerprints per doc <= n_grams - W + 1 and >= 1 window min
        from ytspark.operators.dedup import WIN_W
        from ytspark.queries import registry

        df = registry()["dedup_winnowing_fingerprints"].fn(spark, sf_dir)
        assert df.columns == ["doc_a", "doc_b", "n_shared"]
        assert df.where(F.col("doc_a") >= F.col("doc_b")).count() == 0


class TestShapley:
    def test_efficiency_axiom(self, spark, sf_dir):
        """Shapley values sum exactly to v(grand coalition) = total
        converted paths — the efficiency axiom, checked in exact
        integer math: sum(shapley_num) == v_full * n!."""
        from ytspark.operators.temporal import _FACT
        from ytspark.queries import registry

        rows = registry()["shapley_attribution_exact"].fn(
            spark, sf_dir
        ).collect()
        n = rows[0]["n_channels"]
        total_num = sum(r["shapley_num"] for r in rows)
        # v(full) = converted (user, day) paths that touched >=1 channel
        from ytspark.session import load_tables

        ev = load_tables(spark, sf_dir, "events")["events"]
        touched = (
            ev.where(F.col("event_type") != "purchase")
            .select("user_id", F.to_date("ts").alias("d"))
            .distinct()
        )
        conv = (
            ev.where(F.col("event_type") == "purchase")
            .select("user_id", F.to_date("ts").alias("d"))
            .distinct()
        )
        v_full = touched.join(conv, ["user_id", "d"]).count()
        assert total_num == v_full * _FACT[n]

    def test_symmetry_of_output(self, spark, sf_dir):
        from ytspark.queries import registry

        df = registry()["shapley_attribution_exact"].fn(spark, sf_dir)
        rows = df.collect()
        assert len(rows) == rows[0]["n_channels"]
        assert all(r["shapley_num"] >= 0 for r in rows)


class TestCompaction:
    def test_bins_meet_target_except_last(self, spark, sf_dir):
        from ytspark.operators.maintenance import COMPACT_TARGET_ROWS
        from ytspark.queries import registry

        rows = registry()["compaction_plan_bins"].fn(spark, sf_dir).collect()
        assert all(r["meets_target"] for r in rows)
        last = max(r["bin_id"] for r in rows)
        for r in rows:
            if r["bin_id"] != last:
                assert r["total_rows"] >= COMPACT_TARGET_ROWS
        # date locality: bins tile the day range in order
        by_bin = sorted(rows, key=lambda r: r["bin_id"])
        for a, b in zip(by_bin, by_bin[1:]):
            assert a["last_day"] <= b["first_day"]


class TestRake:
    def test_topk_ranked_and_scored(self, spark, sf_dir):
        from ytspark.operators.text import RAKE_STOPS, RAKE_TOP_K
        from ytspark.queries import registry

        rows = registry()["rake_keywords"].fn(spark, sf_dir).collect()
        assert 0 < len(rows) <= RAKE_TOP_K
        scores = [r["score"] for r in rows]
        assert scores == sorted(scores, reverse=True)
        # no phrase contains a stopword (they are the delimiters)
        for r in rows:
            assert not set(r["phrase"].split()) & set(RAKE_STOPS)
            assert r["n_words"] >= 1 and r["score"] > 0


class TestPercentileErrorEval:
    def test_bound_holds_and_is_meaningful(self, spark, sf_dir):
        from ytspark.queries import registry

        rows = registry()["percentile_sketch_error_eval"].fn(
            spark, sf_dir
        ).collect()
        assert {r["pname"] for r in rows} == {"p50", "p90", "p99"}
        for r in rows:
            assert r["within_bound"] is True
            assert r["rank_tolerance"] >= 1
            assert r["exact_value"] > 0


class TestSemanticDedup:
    def test_pairs_are_within_cluster_and_thresholded(self, spark, sf_dir):
        from ytspark.operators.dedup import SEM_THRESHOLD
        from ytspark.queries import registry

        df = registry()["dedup_semantic_clusters"].fn(spark, sf_dir)
        rows = df.collect()
        assert rows, "expected semantic dup pairs at this threshold"
        for r in rows:
            assert r["cos_sim"] >= SEM_THRESHOLD
            assert r["vec_a"] < r["vec_b"]


class TestWinnowingClusters:
    def test_clusters_are_min_label_and_nontrivial(self, spark, sf_dir):
        from ytspark.queries import registry

        rows = registry()["dedup_winnowing_clusters"].fn(
            spark, sf_dir
        ).collect()
        assert rows
        for r in rows:
            assert r["n_docs"] >= 2


class TestBootstrapCI:
    def test_interval_brackets_mean_and_is_ordered(self, spark, sf_dir):
        from ytspark.queries import registry

        row = registry()["bootstrap_ci_revenue"].fn(spark, sf_dir).first()
        assert row["ci_lo"] <= row["ci_hi"]
        assert row["ci_contains_mean"] is True
        assert row["n_replicates"] == 40
        # half-subsampling keeps the CI in the data's ballpark
        assert 0 < row["ci_lo"] < 2 * row["mean_full"]


class TestAllenRelations:
    def test_relations_partition_the_pair_set(self, spark, sf_dir):
        from ytspark.operators.temporal import (
            PairBudgetExceededError,
            allen_interval_relations,
        )
        from ytspark.queries import registry
        import pytest

        rows = registry()["allen_interval_relations"].fn(
            spark, sf_dir
        ).collect()
        names = {r["relation"] for r in rows}
        allowed = {
            "precedes", "meets", "equals", "starts", "started_by",
            "finished_by", "finishes", "contains", "during", "overlaps",
        }
        assert names <= allowed
        total = sum(r["n_pairs"] for r in rows)
        # must equal the blocked pair count from the guard query
        guard = registry()["overlap_pair_explosion_guard"].fn(
            spark, sf_dir
        ).first()
        assert total == guard["total_candidate_pairs"]
        # shares the enforced budget
        with pytest.raises(PairBudgetExceededError):
            allen_interval_relations(spark, sf_dir, budget=5)


class TestWindowTies:
    def test_tie_semantics_invariants(self, spark, sf_dir):
        from ytspark.queries import registry

        rows = registry()["window_ties_battery"].fn(spark, sf_dir).collect()
        assert rows
        for r in rows:
            n, nd = r["n_rows"], r["n_distinct_buckets"]
            assert r["has_ties"] is True and nd < n
            # dense_rank sums below rank sums exactly when ties exist
            assert r["sum_dense_rank"] <= r["sum_rank"]
            # ntile sums to the exact SQL-standard allocation:
            # tile t gets base(+1) rows; sum = sum over tiles t*size_t
            base, rem = divmod(n, 4)
            expected = sum(
                t * (base + (1 if t <= rem else 0)) for t in range(1, 5)
            )
            assert r["sum_ntile4"] == expected


class TestLangConfusion:
    def test_cells_partition_corpus(self, spark, sf_dir):
        from ytspark.queries import registry
        from ytspark.session import load_tables

        rows = registry()["lang_id_confusion_matrix"].fn(
            spark, sf_dir
        ).collect()
        n_docs = load_tables(spark, sf_dir, "documents")["documents"].count()
        assert sum(r["n_docs"] for r in rows) == n_docs
        assert abs(sum(r["frac"] for r in rows) - 1.0) < 1e-4
        preds = {r["lang_pred"] for r in rows}
        assert preds <= {"en", "de", "und"}


class TestDecisionStump:
    def test_split_is_proper_and_gain_maximal(self, spark, sf_dir):
        from ytspark.queries import registry

        row = registry()["decision_stump_train"].fn(spark, sf_dir).first()
        assert row["n_left"] > 0 and row["n_right"] > 0
        assert 0 <= row["gain"] <= 1.0  # binary entropy gain bound (nats<=ln2)
        n = row["n_left"] + row["n_right"]
        pos = row["pos_left"] + row["pos_right"]
        # accuracy at least the majority-class baseline
        assert row["train_accuracy"] * n >= max(pos, n - pos) - 1


class TestTargetEncoding:
    def test_no_leakage_and_smoothing_bounds(self, spark, sf_dir):
        from ytspark.operators.learn import TE_FOLDS
        from ytspark.queries import registry

        rows = registry()["target_encode_oof"].fn(spark, sf_dir).collect()
        assert rows
        # every encoding is a proper rate in (0, 1) pulled toward the
        # prior; folds are the configured count
        assert {r["held_out_fold"] for r in rows} <= set(range(TE_FOLDS))
        for r in rows:
            assert 0.0 < r["te_smoothed"] < 1.0
            assert r["pos_in"] <= r["n_in"]


class TestFeatureHashing:
    def test_collision_accounting_identities(self, spark, sf_dir):
        from ytspark.operators.sketch import FH_BITS
        from ytspark.queries import registry

        r = registry()["feature_hashing_collision_stats"].fn(
            spark, sf_dir
        ).first()
        assert r["n_buckets"] == 1 << FH_BITS
        assert r["buckets_used"] <= min(r["vocab_size"], r["n_buckets"])
        # vocab = singleton buckets + collided terms + one rep per
        # collided bucket
        singles = r["buckets_used"] - r["buckets_with_collisions"]
        assert (
            singles + r["buckets_with_collisions"] + r["terms_collided"]
            == r["vocab_size"]
        )
        assert r["max_bucket_terms"] >= 1


class TestLabelBuilder:
    def test_labels_partition_examples(self, spark, sf_dir):
        from ytspark.queries import registry
        from ytspark.session import load_tables

        r = registry()["label_return_within_window"].fn(spark, sf_dir).first()
        assert (
            r["n_returned"] + r["n_churned"] + r["n_censored"]
            == r["n_examples"]
        )
        # one censored example per user (their last active day)
        ev = load_tables(spark, sf_dir, "events")["events"]
        n_users = ev.select("user_id").distinct().count()
        assert r["n_censored"] == n_users
        assert 0.0 <= r["return_rate"] <= 1.0


class TestSessionFeatures:
    def test_checksums_conserve_events(self, spark, sf_dir):
        from ytspark.queries import registry
        from ytspark.session import load_tables

        r = registry()["session_feature_vectors"].fn(spark, sf_dir).first()
        ev = load_tables(spark, sf_dir, "events")["events"]
        assert r["total_events"] == ev.count()
        assert 1 <= r["max_session_events"] <= r["total_events"]
        assert r["sessions_with_purchase"] <= r["n_sessions"]
        assert r["sum_value"] > 0


class TestHuberIRLS:
    def test_robust_fit_properties(self, spark, sf_dir):
        from ytspark.queries import registry

        r = registry()["huber_trend_irls"].fn(spark, sf_dir).first()
        assert r["n_days"] > 10
        assert r["n_downweighted"] >= 0
        # the robust slope exists and is finite; when days are
        # downweighted the fit moved (or the data had no outliers)
        assert r["slope_huber"] is not None
        assert abs(r["slope_huber"]) < 1e6


class TestWeightedJaccard:
    def test_weighted_matches_set_jaccard_on_distinct_multisets(
        self, spark, sf_dir
    ):
        from ytspark.operators.dedup import WJ_THRESHOLD
        from ytspark.queries import registry

        rows = registry()["dedup_weighted_jaccard"].fn(
            spark, sf_dir
        ).collect()
        assert rows
        for r in rows:
            assert r["weighted_jaccard"] >= WJ_THRESHOLD - 1e-9
            assert r["doc_a"] < r["doc_b"]
            assert r["min_sum"] >= 1


class TestImageDhash:
    def test_blocking_is_lossless_and_thresholded(self, spark, sf_dir):
        from ytspark.operators.multimodal import DHASH_HAMMING
        from ytspark.queries import registry

        rows = registry()["multimodal_image_dhash_dedup"].fn(
            spark, sf_dir
        ).collect()
        assert rows
        for r in rows[:50]:
            assert 0 <= r["hamming"] <= DHASH_HAMMING
            assert r["doc_a"] < r["doc_b"]


class TestAudioFingerprint:
    def test_blocking_thresholded(self, spark, sf_dir):
        from ytspark.operators.multimodal import AFP_HAMMING
        from ytspark.queries import registry

        rows = registry()["multimodal_audio_fingerprint_dedup"].fn(
            spark, sf_dir
        ).collect()
        assert rows
        for r in rows[:50]:
            assert 0 <= r["hamming"] <= AFP_HAMMING
            assert r["doc_a"] < r["doc_b"]


class TestLinkPrediction:
    def test_candidates_are_nonedges_with_shared_neighbors(
        self, spark, sf_dir
    ):
        from ytspark.operators.graph import LP_MIN_COMMON, LP_TOP_K
        from ytspark.queries import registry

        rows = registry()["copurchase_link_prediction"].fn(
            spark, sf_dir
        ).collect()
        assert 0 < len(rows) <= LP_TOP_K
        jacs = [r["jaccard"] for r in rows]
        assert jacs == sorted(jacs, reverse=True)
        for r in rows:
            assert r["common"] >= LP_MIN_COMMON
            assert 0 < r["jaccard"] <= 1.0
            assert r["part_a"] < r["part_b"]


class TestForecastBacktest:
    def test_mase_identities(self, spark, sf_dir):
        from ytspark.operators.timeseries import BT_HOLDOUT
        from ytspark.queries import registry

        r = registry()["forecast_backtest_mase"].fn(spark, sf_dir).first()
        # small SFs span fewer distinct days than the configured window
        assert 0 < r["n_holdout_days"] <= BT_HOLDOUT
        assert r["mae_seasonal_naive"] > 0 and r["mae_naive"] > 0
        assert r["mase"] > 0


class TestEmbeddingNorms:
    def test_moment_identities(self, spark, sf_dir):
        from ytspark.queries import registry
        from ytspark.session import load_tables

        r = registry()["embedding_norm_outliers"].fn(spark, sf_dir).first()
        n = load_tables(spark, sf_dir, "embeddings")["embeddings"].count()
        assert r["n_vectors"] == n
        assert r["min_norm"] <= r["mean_norm"] <= r["max_norm"]
        assert r["std_norm"] >= 0
        # unit-normalized fixture: degenerate spread flags nothing
        assert 0 <= r["n_outliers"] < n
        assert r["n_zero"] == 0  # corpus fixture has no corrupt rows


class TestSearchAgreement:
    def test_tau_bounds_and_overlap(self, spark, sf_dir):
        from ytspark.queries import registry

        r = registry()["search_rank_agreement_eval"].fn(
            spark, sf_dir
        ).first()
        assert 0 <= r["overlap_at_10"] <= min(10, r["n_common"])
        if r["kendall_tau"] is not None:
            assert -1.0 <= r["kendall_tau"] <= 1.0
            npairs = r["n_common"] * (r["n_common"] - 1) // 2
            assert r["concordant"] + r["discordant"] <= npairs


class TestOverdispersion:
    def test_dispersion_identity(self, spark, sf_dir):
        from ytspark.queries import registry

        rows = registry()["count_overdispersion_check"].fn(
            spark, sf_dir
        ).collect()
        assert len(rows) == 5  # one per event type
        for r in rows:
            assert r["mean_daily"] > 0 and r["var_daily"] >= 0
            assert abs(
                r["dispersion"] - r["var_daily"] / r["mean_daily"]
            ) < 1e-3


class TestNBCrossval:
    def test_folds_partition_and_beat_chance(self, spark, sf_dir):
        from ytspark.operators.learn import CV_FOLDS
        from ytspark.queries import registry
        from ytspark.session import load_tables

        rows = registry()["nb_crossval_metrics"].fn(spark, sf_dir).collect()
        assert {r["fold"] for r in rows} == set(range(CV_FOLDS))
        n_docs = load_tables(spark, sf_dir, "documents")["documents"].count()
        assert sum(r["n_test"] for r in rows) == n_docs
        for r in rows:
            assert r["n_correct"] <= r["n_test"]
            # 4 language classes: NB must beat uniform chance per fold
            assert r["accuracy"] > 0.25


class TestScd2Integrity:
    def test_compaction_output_holds_invariants(self, spark, sf_dir):
        from ytspark.queries import registry

        r = registry()["scd2_integrity_audit"].fn(spark, sf_dir).first()
        assert r["integrity_ok"] is True
        assert r["keys_one_current"] == r["n_keys"]
        assert r["inverted_intervals"] == 0 and r["regime_gaps"] == 0
        assert r["n_regimes"] >= r["n_keys"]


class TestRareCategoryCollapse:
    def test_collapse_partitions_rows(self, spark, sf_dir):
        from ytspark.queries import registry
        from ytspark.session import load_tables

        rows = registry()["rare_category_collapse"].fn(
            spark, sf_dir
        ).collect()
        n = load_tables(spark, sf_dir, "customer")["customer"].count()
        assert sum(r["n_rows"] for r in rows) == n
        other = [r for r in rows if r["mapped_cat"] == "__other__"]
        assert len(other) == 1 and other[0]["n_source_cats"] >= 2
        for r in rows:
            if r["mapped_cat"] != "__other__":
                assert r["n_source_cats"] == 1


class TestCohortLTV:
    def test_curves_monotone_per_cohort(self, spark, sf_dir):
        from ytspark.queries import registry

        rows = registry()["cohort_ltv_curves"].fn(spark, sf_dir).collect()
        assert rows
        by_cohort = {}
        for r in rows:
            by_cohort.setdefault(r["cohort_week"], []).append(r)
        for cw, cells in by_cohort.items():
            cells.sort(key=lambda r: r["age_weeks"])
            vals = [c["cum_value"] for c in cells]
            assert vals == sorted(vals)  # cumulative: nondecreasing
            assert all(c["ltv_per_user"] > 0 for c in cells)


class TestOOVRate:
    def test_rates_partition_tokens(self, spark, sf_dir):
        from ytspark.queries import registry

        rows = registry()["token_oov_rate_eval"].fn(spark, sf_dir).collect()
        assert rows
        for r in rows:
            assert 0.0 <= r["oov_rate"] < 1.0
            assert r["n_oov"] <= r["n_tokens"]


class TestMinhashError:
    def test_error_bounded_by_construction(self, spark, sf_dir):
        from ytspark.queries import registry

        r = registry()["minhash_estimate_error_eval"].fn(
            spark, sf_dir
        ).first()
        assert r["n_pairs"] > 0
        assert 0 <= r["mean_abs_err"] <= r["max_abs_err"] <= 1.0


class TestConstraintSuite:
    def test_all_rules_pass_on_clean_fixtures(self, spark, sf_dir):
        from ytspark.queries import registry

        rows = registry()["constraint_suite_report"].fn(
            spark, sf_dir
        ).collect()
        assert len(rows) == 7
        assert all(r["passed"] for r in rows)
        assert {r["tbl"] for r in rows} == {
            "events", "orders", "documents", "lineitem", "customer"
        }

    def test_rules_catch_injected_violations(self, spark, tmp_path):
        """The suite must FAIL on bad data, not just pass on good:
        inject nulls and an out-of-range price, re-evaluate."""
        import os

        from pyspark.sql import functions as F

        from ytspark.checks import constraint_suite
        from ytspark.session import load_tables

        src = "/root/testdata/sf0.001"
        t = load_tables(
            spark, src, "events", "orders", "documents", "lineitem",
            "customer",
        )
        bad_ev = t["events"].withColumn(
            "value",
            F.when(F.col("event_id") % 2 == 0, F.lit(None)).otherwise(
                F.col("value")
            ),
        )
        bad_orders = t["orders"].withColumn(
            "o_totalprice",
            F.when(F.col("o_orderkey") == 1, F.lit(9e9)).otherwise(
                F.col("o_totalprice")
            ),
        )
        report = constraint_suite(
            {**t, "events": bad_ev, "orders": bad_orders}
        ).collect()
        by_rule = {r["rule"]: r for r in report}
        assert by_rule["null_rate:value<=0.05"]["passed"] is False
        assert by_rule["range:o_totalprice[0,600000]"]["passed"] is False
        # untouched tables still pass
        assert by_rule["cardinality:c_mktsegment[3,10]"]["passed"] is True


class TestIvfIncremental:
    def test_append_is_invisible_vs_full_index(self, spark, sf_dir):
        from ytspark.operators.similarity import IVF_INCR_SPLIT
        from ytspark.queries import registry
        from ytspark.session import load_tables

        rows = registry()["ivf_index_incremental_add"].fn(
            spark, sf_dir
        ).collect()
        n = load_tables(spark, sf_dir, "embeddings")["embeddings"].count()
        assert sum(r["n_vectors"] for r in rows) == n
        appended = sum(r["n_appended"] for r in rows)
        assert appended == max(0, n - IVF_INCR_SPLIT)
        assert appended > 0  # the append path actually exercised


class TestWinnowingIncremental:
    def test_store_matches_direct_cross_region_pairs(self, spark, sf_dir):
        from ytspark.operators.dedup import INCR_SPLIT
        from ytspark.queries import registry

        rows = registry()["dedup_winnowing_incremental"].fn(
            spark, sf_dir
        ).collect()
        assert rows
        for r in rows[:50]:
            assert r["new_doc_id"] >= INCR_SPLIT
            assert r["existing_doc_id"] < INCR_SPLIT
            assert r["n_shared"] >= 2


class TestNoveltyCurve:
    def test_rates_and_attribution(self, spark, sf_dir):
        from ytspark.queries import registry

        rows = registry()["ngram_novelty_curve"].fn(spark, sf_dir).collect()
        assert rows
        for r in rows:
            assert 0.0 < r["novelty_rate"] <= 1.0
            assert r["novel_grams"] <= r["total_grams"]


class TestStreamingDQ:
    def test_counters_collapse_to_batch(self, spark, sf_dir):
        from ytspark.queries import registry
        from ytspark.session import load_tables

        r = registry()["streaming_dq_monitor"].fn(spark, sf_dir).first()
        n = load_tables(spark, sf_dir, "events")["events"].count()
        assert r["n_rows"] == n
        assert r["n_batches"] == 4
        assert r["all_clean"] is True  # fixtures carry no violations


class TestPRFExpansion:
    def test_expansion_widens_reach(self, spark, sf_dir):
        from ytspark.operators.search import BM25_QUERY, PRF_EXPANSION_E
        from ytspark.queries import registry

        rows = registry()["bm25_prf_expansion"].fn(spark, sf_dir).collect()
        assert rows
        terms = rows[0]["exp_terms"].split(",")
        assert 1 <= len(terms) <= PRF_EXPANSION_E
        assert not set(terms) & set(BM25_QUERY)  # genuinely new terms
        # reach flag is well-formed (whether expansion ADDS docs is
        # data-dependent: common query terms may already reach all)
        assert all(isinstance(r["was_in_base"], bool) for r in rows)
        scores = [r["bm25_expanded"] for r in rows]
        assert scores == sorted(scores, reverse=True)


class TestWeeklyJSD:
    def test_jsd_bounds(self, spark, sf_dir):
        import math

        from ytspark.queries import registry

        rows = registry()["weekly_jsd_drift"].fn(spark, sf_dir).collect()
        assert rows
        for r in rows:
            assert 0.0 <= r["jsd"] <= math.log(2) + 1e-9
            assert r["n_types"] >= 1


class TestGapSweep:
    def test_sweep_agrees_with_full_sessionization(self, spark, sf_dir):
        """Cross-operator consistency: the sweep's 30-minute count must
        equal the session featurizer's actual session count."""
        from ytspark.queries import registry

        sweep = {
            r["gap_minutes"]: r["n_sessions"]
            for r in registry()["sessionization_gap_sweep"].fn(
                spark, sf_dir
            ).collect()
        }
        full = registry()["session_feature_vectors"].fn(spark, sf_dir).first()
        assert sweep[30] == full["n_sessions"]
        # monotone: larger gaps merge sessions
        assert sweep[15] >= sweep[30] >= sweep[60]


class TestInterarrival:
    def test_order_statistics_sane(self, spark, sf_dir):
        from ytspark.queries import registry

        rows = registry()["interarrival_profile"].fn(spark, sf_dir).collect()
        assert len(rows) == 5
        for r in rows:
            assert (
                r["min_gap_s"]
                <= r["median_gap_s"]
                <= r["p90_gap_s"]
                <= r["max_gap_s"]
            )
            assert r["n_gaps"] > 0
