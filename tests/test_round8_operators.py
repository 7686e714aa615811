"""Round-8 operator semantics: boilerplate chunk dedup, Matryoshka
truncation recall, Neyman sampling, retrieval metrics, chi-square
independence, label propagation."""

from __future__ import annotations

import tempfile

import pandas as pd
import pytest

SF = "/root/testdata/sf0.01"  # stratified/chi2 need the bigger sample


@pytest.fixture()
def tmp_sf(spark):
    """Write micro-tables into a temp dir shaped like an sf_dir."""
    with tempfile.TemporaryDirectory() as d:

        def write(table, rows, schema):
            spark.createDataFrame(rows, schema).write.mode(
                "overwrite"
            ).parquet(f"{d}/{table}.parquet")

        yield d, write


def test_boilerplate_flags_cross_doc_chunks(spark, sf_dir):
    from ytspark.operators.text import (
        BP_CHUNK_TOKENS,
        boilerplate_chunk_removal,
    )

    out = boilerplate_chunk_removal(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    assert len(out) == len(docs)
    # chunk accounting: ceil(n_tokens / width) per doc
    ntok = docs.set_index("doc_id").text.str.split(" ").str.len()
    want_chunks = (-(-ntok // BP_CHUNK_TOKENS)).astype(int)
    got = out.set_index("doc_id")
    assert (got.n_chunks == want_chunks.reindex(got.index)).all()
    assert (got.n_boilerplate <= got.n_chunks).all()
    assert (
        got.retained_per_mille
        == (got.n_chunks - got.n_boilerplate) * 1000 // got.n_chunks
    ).all()


def test_boilerplate_detects_planted_duplicate_chunk(spark, tmp_sf):
    from ytspark.operators.text import boilerplate_chunk_removal

    d, write = tmp_sf
    banner = "accept cookies to continue using this site today ok"
    rows = []
    for i in range(6):
        unique = " ".join(f"w{i}x{j}" for j in range(8))
        # banner chunk (8 tokens) + unique chunk (8 tokens)
        rows.append((i, " ".join(banner.split()[:8]) + " " + unique,
                     "en", "srcA", 100))
    rows.append((99, " ".join(f"solo{j}" for j in range(16)),
                 "en", "srcB", 100))
    write("documents", rows,
          "doc_id long, text string, lang string, source string, "
          "n_chars long")
    out = {r["doc_id"]: r for r in
           boilerplate_chunk_removal(spark, d).collect()}
    for i in range(6):  # banner shared by 6 docs -> boilerplate
        assert out[i]["n_chunks"] == 2
        assert out[i]["n_boilerplate"] == 1
        assert out[i]["retained_per_mille"] == 500
    assert out[99]["n_boilerplate"] == 0
    assert out[99]["retained_per_mille"] == 1000


def test_matryoshka_recall_bounds_and_self_consistency(spark, sf_dir):
    from ytspark.operators.similarity import (
        N_QUERIES,
        TOP_K,
        matryoshka_truncation_recall,
    )

    out = matryoshka_truncation_recall(spark, sf_dir).toPandas()
    assert len(out) == N_QUERIES
    assert ((out.n_overlap >= 0) & (out.n_overlap <= TOP_K)).all()
    assert (out.recall_per_mille == out.n_overlap * 1000 // TOP_K).all()
    # 16 of 64 dims should retain SOME signal but not be perfect
    assert out.n_overlap.sum() > 0


def test_neyman_allocation_sums_to_budget(spark):
    from ytspark.queries.pipeline import (
        NEYMAN_BUDGET,
        stratified_neyman_sample,
    )

    out = stratified_neyman_sample(spark, SF).toPandas()
    assert out.n_alloc.sum() == NEYMAN_BUDGET
    assert (out.n_sampled == out.n_alloc).all()  # population large enough
    # Neyman: bigger n_h * s_h gets at least as much budget
    out["priority"] = out.n_pop * out.pop_stddev
    srt = out.sort_values("priority")
    assert srt.n_alloc.is_monotonic_increasing or len(out) < 2


def test_retrieval_metrics_consistency(spark, sf_dir):
    from ytspark.operators.search import (
        RME_KS,
        retrieval_metrics_battery,
    )

    rows = {r["k"]: r for r in
            retrieval_metrics_battery(spark, sf_dir).collect()}
    assert set(rows) == set(RME_KS)
    prev_hits = 0
    for k in sorted(rows):
        r = rows[k]
        assert r["n_hits"] >= prev_hits  # hits monotone in k
        prev_hits = r["n_hits"]
        assert r["precision_per_mille"] == r["n_hits"] * 1000 // k
        assert r["recall_per_mille"] == (
            r["n_hits"] * 1000 // r["n_relevant"]
        )
        assert r["mrr"] == pytest.approx(
            1.0 / r["first_relevant_rank"], abs=1e-6
        )


def test_chi2_independent_by_construction(spark):
    from ytspark.queries.pipeline import chi2_independence_cramers_v

    (r,) = chi2_independence_cramers_v(spark, SF).collect()
    assert r["n_cells"] == 25 and r["dof"] == 16
    # TPC-H segment and priority are independent: V should be tiny
    assert r["cramers_v"] < 0.05
    assert not r["significant_5pct"]


def test_label_propagation_census(spark, sf_dir):
    from ytspark.operators.graph import label_propagation_communities

    out = label_propagation_communities(spark, sf_dir).toPandas()
    # seeds exist, some labels spread, and the census partitions nodes
    labeled = out[out.label != "<unlabeled>"]
    assert len(labeled) >= 1
    assert (out.n_nodes > 0).all()
    assert (out.min_node <= out.max_node).all()


def test_kneser_ney_discount_mass_conserved(spark, tmp_sf):
    """On a micro-corpus, p_KN(.|w1) sums to 1 over observed+unseen
    continuations when evaluated over the full vocab."""
    from ytspark.operators.text import KN_DISCOUNT

    d, write = tmp_sf
    write("documents",
          [(0, "a b a b a c", "en", "s0", 11),
           (1, "b c a b", "en", "s1", 7)],
          "doc_id long, text string, lang string, source string, "
          "n_chars long")
    import collections
    toks0, toks1 = "a b a b a c".split(), "b c a b".split()
    bigrams = list(zip(toks0, toks0[1:])) + list(zip(toks1, toks1[1:]))
    cbg = collections.Counter(bigrams)
    cw1 = collections.Counter(w1 for w1, _ in bigrams)
    nfollow = collections.Counter(
        w1 for w1, _ in set(bigrams))
    nprec = collections.Counter(w2 for _, w2 in set(bigrams))
    t = len(set(bigrams))
    # full-vocab sum of the interpolated estimate for each context
    vocab = set(toks0) | set(toks1)
    for w1 in cw1:
        total = 0.0
        for w2 in vocab:
            disc = max(cbg.get((w1, w2), 0) - KN_DISCOUNT, 0) / cw1[w1]
            lam = KN_DISCOUNT * nfollow[w1] / cw1[w1]
            total += disc + lam * nprec.get(w2, 0) / t
        assert total == pytest.approx(1.0, abs=1e-9)

    from ytspark.operators.text import kneser_ney_bigram_perplexity
    out = {r["source"]: r for r in
           kneser_ney_bigram_perplexity(spark, d).collect()}
    assert set(out) == {"s0", "s1"}
    assert all(r["perplexity"] > 1.0 for r in out.values())


def test_aexpj_sample_is_size_biased(spark):
    from ytspark.queries.pipeline import AEXP_K, weighted_sample_aexpj

    out = weighted_sample_aexpj(spark, SF).toPandas()
    assert out.n_sampled.sum() == AEXP_K
    # mean sampled order value should exceed the population mean
    pop = pd.read_parquet(
        f"{SF}/orders.parquet", columns=["o_totalprice"]
    ).o_totalprice
    sample_mean = out.sample_weight_cents.sum() / 100 / AEXP_K
    assert sample_mean > pop.mean() * 1.1


def test_loo_influence_sums_and_pinning(spark):
    from ytspark.queries.pipeline import loo_group_influence

    out = loo_group_influence(spark, SF).toPandas()
    assert len(out) == 5
    # influence rounds the UNROUNDED difference; recomputing from the
    # rounded columns can differ in the last digit
    assert (
        (out.influence
         - (out.slope_without_group - out.slope_cents_per_day)).abs()
        < 2e-6
    ).all()
    # removing one of five similar cohorts cannot flip the trend sign
    assert (
        (out.slope_without_group > 0) == (out.slope_cents_per_day > 0)
    ).all()


def test_patchify_counts(spark, sf_dir):
    from ytspark.operators.multimodal import (
        PATCH_P,
        multimodal_image_patchify,
    )

    out = multimodal_image_patchify(spark, sf_dir).toPandas()
    assert len(out) == 200
    for _, r in out.iterrows():
        d = int(r.doc_id)
        w, h = 4 + d % 5, 3 + d % 4
        assert r.n_patches == (w // PATCH_P) * (h // PATCH_P)
        assert r.min_patch_sum <= r.max_patch_sum
        assert r.total_sum <= 255 * PATCH_P * PATCH_P * r.n_patches


def test_bradley_terry_scores_normalized(spark, sf_dir):
    from ytspark.queries.pipeline import bradley_terry_priorities

    out = bradley_terry_priorities(spark, sf_dir).toPandas()
    assert len(out) == 5
    assert out.bt_score.sum() == pytest.approx(1.0, abs=1e-4)
    assert sorted(out["rank"]) == [1, 2, 3, 4, 5]
    # TPC-H priorities are balanced: no score should dominate
    assert out.bt_score.max() < 0.35


def test_propensity_ate_near_zero_on_random_assignment(spark):
    from ytspark.queries.pipeline import propensity_stratification_ate

    (r,) = propensity_stratification_ate(spark, SF).collect()
    assert r["n_strata"] >= 8
    assert r["n_treated"] > 0 and r["n_control"] > 0
    # segment is assigned independently of order value in TPC-H:
    # adjusted and unadjusted effects should both be a small fraction
    # of the ~1.5e6-dollar mean lifetime value (sampling noise only)
    orders = pd.read_parquet(
        f"{SF}/orders.parquet", columns=["o_totalprice"]
    )
    customers = pd.read_parquet(f"{SF}/customer.parquet")
    mean_ltv = orders.o_totalprice.sum() / len(customers)
    assert abs(r["ate_dollars"]) < 0.10 * mean_ltv
    assert abs(r["unadjusted_diff_dollars"]) < 0.10 * mean_ltv


def test_dpo_pairs_margin_and_blocking(spark, sf_dir):
    from ytspark.operators.text import (
        DPO_MARGIN_PM,
        DPO_PAIRS_PER_SOURCE,
        dpo_preference_pairs,
    )

    out = dpo_preference_pairs(spark, sf_dir).toPandas()
    assert len(out) > 0
    assert (out.margin_pm >= DPO_MARGIN_PM).all()
    assert (out.chosen_q_pm > out.rejected_q_pm).all()
    assert (out.chosen_doc != out.rejected_doc).all()
    assert (out.groupby("source").size() <= DPO_PAIRS_PER_SOURCE).all()


def test_relational_division_counting_idiom(spark, sf_dir):
    from ytspark.queries.relational import relational_division_priorities

    out = relational_division_priorities(spark, sf_dir).toPandas()
    o = pd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_custkey", "o_orderpriority"])
    complete = (
        o.groupby("o_custkey").o_orderpriority.nunique() == 5
    ).sum()
    assert out.n_complete_customers.sum() == complete


def test_pivot_unpivot_identity(spark, sf_dir):
    from ytspark.queries.relational import pivot_unpivot_roundtrip

    out = pivot_unpivot_roundtrip(spark, sf_dir).toPandas()
    assert out.identical.all()
    assert (out.n_roundtrip == out.n_direct).all()


def test_null_join_counts(spark, sf_dir):
    from ytspark.queries.relational import null_join_semantics_battery

    (r,) = null_join_semantics_battery(spark, sf_dir).collect()
    # null keys never inner-match; left join >= inner + null rows
    assert r["n_inner"] + r["n_anti"] + r["n_left_null_keys"] >= r["n_left"]
    assert r["n_left_join"] >= r["n_left"]
    assert r["n_nullsafe_join"] >= r["n_inner"]


def test_keyset_equals_offset_page(spark, sf_dir):
    from ytspark.queries.relational import (
        PAGE_SIZE,
        keyset_pagination_battery,
    )

    (r,) = keyset_pagination_battery(spark, sf_dir).collect()
    assert r["n_rows"] == PAGE_SIZE
    assert r["n_agreeing"] == PAGE_SIZE  # both methods: same page


def test_time_bounded_funnel_monotone(spark, sf_dir):
    from ytspark.operators.temporal import funnel_time_bounded

    (r,) = funnel_time_bounded(spark, sf_dir).collect()
    assert r["n_viewers"] >= r["n_clicked_1h"] >= r["n_purchased_24h"]
    assert 0 <= r["click_rate_pm"] <= 1000


def test_brand_lift_ordering(spark, sf_dir):
    from ytspark.operators.affinity import BAL_TOP, brand_affinity_lift

    out = brand_affinity_lift(spark, sf_dir).toPandas()
    assert len(out) == BAL_TOP
    assert (out.lift.values == sorted(out.lift.values)[::-1]).all()
    assert (out.n_both <= out[["n_a", "n_b"]].min(axis=1)).all()


def test_recommendations_exclude_owned(spark, sf_dir):
    from ytspark.operators.affinity import (
        REC_TOP_N,
        user_topn_recommendations,
    )

    out = user_topn_recommendations(spark, sf_dir).toPandas()
    assert (out.groupby("custkey").size() <= REC_TOP_N).all()
    o = pd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_orderkey", "o_custkey"])
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey"])
    owned = o.merge(li, left_on="o_orderkey", right_on="l_orderkey")
    owned_set = set(zip(owned.o_custkey, owned.l_partkey))
    assert not any(
        (u, p) in owned_set for u, p in zip(out.custkey, out.part_rec)
    )


def test_recency_segments_partition_users(spark, sf_dir):
    from ytspark.operators.segmentation import engagement_recency_segments

    out = engagement_recency_segments(spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    assert out.n_users.sum() == ev.user_id.nunique()
    assert set(out.segment) <= {"active", "lapsed", "churned"}


def test_pareto_layers_disjoint_and_dominant(spark, sf_dir):
    from ytspark.operators.pareto import pareto_frontier_layers

    out = {r["layer"]: r for r in
           pareto_frontier_layers(spark, sf_dir).collect()}
    assert set(out) == {1, 2}
    assert out[1]["n_points"] > 0 and out[2]["n_points"] > 0
    # layer 1 contains the global min price and max size by definition
    assert out[1]["min_price_cents"] <= out[2]["min_price_cents"]
    assert out[1]["max_size"] >= out[2]["max_size"]


def test_bloom_fpr_within_bound(spark, sf_dir):
    from ytspark.operators.bloom import bloom_fpr_calibration

    (r,) = bloom_fpr_calibration(spark, sf_dir).collect()
    assert r["n_false_pos"] <= r["n_probes"]
    assert r["within_bound"]
    assert r["n_set_bits"] <= 4096


def test_business_day_formula_vs_bruteforce(spark, sf_dir):
    from ytspark.operators.temporal import (
        BDL_SLA_BDAYS,
        business_day_shipping_lag,
    )

    # the closed form must equal the day-by-day weekend count
    def brute(e0, n):
        return sum(1 for k in range(n) if (e0 + k + 3) % 7 < 5)

    def closed(e0, n):
        wd0 = (e0 + 3) % 7
        rem = n % 7
        return (
            (n // 7) * 5
            + max(0, min(5 - wd0, rem))
            + max(0, min(rem - (7 - wd0), 5))
        )

    for e0 in range(14):
        for n in range(40):
            assert closed(e0, n) == brute(e0, n)

    out = business_day_shipping_lag(spark, sf_dir).toPandas()
    assert len(out) == 5
    assert (out.within_sla_pm <= 1000).all()
    # business days never exceed calendar days: mean lag sanity
    assert (out.mean_bdays_x100 >= 0).all()


def test_curation_pipeline_monotone_stages(spark, sf_dir):
    from ytspark.operators.text import curation_pipeline_report

    out = curation_pipeline_report(spark, sf_dir).toPandas()
    assert (out.n_after_quality <= out.n_docs_in).all()
    assert (out.n_after_lang <= out.n_after_quality).all()
    assert (out.n_after_dedup <= out.n_after_lang).all()
    assert (out.tokens_retained <= out.tokens_in).all()
    assert (out.doc_retention_pm <= 1000).all()


def test_curation_pipeline_dedup_among_passers(spark, tmp_sf):
    """A rejected duplicate must not absorb rank 1 from a passing
    twin: two identical GOOD docs keep exactly one; an identical BAD
    doc earlier in doc_id order must not evict both."""
    from ytspark.operators.text import curation_pipeline_report

    d, write = tmp_sf
    good = " ".join(["the", "a", "of"]
                    + [f"tok{i:03d}" for i in range(60)])
    write("documents",
          [(0, good, "de", "s0", 100),   # fails lang gate, same text
           (1, good, "en", "s0", 100),   # passes -> kept
           (2, good, "en", "s0", 100)],  # passes -> duplicate, dropped
          "doc_id long, text string, lang string, source string, "
          "n_chars long")
    (r,) = curation_pipeline_report(spark, d).collect()
    assert r["n_docs_in"] == 3
    assert r["n_after_lang"] == 2
    assert r["n_after_dedup"] == 1  # the doc_id=1 passer survives


def test_map_hof_reductions(spark, sf_dir):
    from ytspark.operators.text import map_hof_battery

    out = map_hof_battery(spark, sf_dir).toPandas()
    assert len(out) > 0
    assert (out.n_entries <= 5).all()  # 5 priorities max
    assert (out.n_after_filter <= out.n_entries).all()
    # zip-with-self of positive ints is >= doubled iff every c >= 2;
    # globally the totals obey sum(c*c) >= sum(2c) - n (AM-GM-ish)
    assert (
        out.total_self_zipped >= out.total_doubled - out.n_entries
    ).all()


def test_theil_decomposition_identity(spark, sf_dir):
    from ytspark.queries.pipeline import theil_inequality_decomposition

    out = theil_inequality_decomposition(spark, sf_dir).toPandas()
    assert len(out) == 5
    # decomposition identity: T = within + between, computed directly
    import numpy as np
    o = pd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_custkey", "o_totalprice"])
    c = pd.read_parquet(f"{sf_dir}/customer.parquet",
                        columns=["c_custkey", "c_mktsegment"])
    y = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    v = y.o_totalprice.round(2).to_numpy()
    mu = v.mean()
    t_total = float(np.mean(v / mu * np.log(v / mu)))
    got = out.theil_within_total.iloc[0] + out.theil_between_total.iloc[0]
    assert got == pytest.approx(t_total, abs=1e-4)
    # Theil components are non-negative
    assert (out.theil_within_group >= 0).all()


def test_ece_brier_identity(spark, sf_dir):
    from ytspark.queries.pipeline import ece_brier_decomposition

    (r,) = ece_brier_decomposition(spark, sf_dir).collect()
    assert r["n_bins"] >= 2
    assert 0 <= r["ece"] <= 1
    assert r["reliability"] >= 0 and r["resolution"] >= 0
    assert 0 <= r["uncertainty"] <= 0.25
    # Murphy identity reconstruction is internally consistent
    assert r["brier_reconstructed"] == pytest.approx(
        r["reliability"] - r["resolution"] + r["uncertainty"], abs=2e-6
    )


def test_nelson_aalen_monotone_and_bounds(spark, sf_dir):
    from ytspark.operators.timeseries import nelson_aalen_hazard

    out = nelson_aalen_hazard(spark, sf_dir).toPandas()
    out = out.sort_values("lifetime_days")
    assert (out.cum_hazard.diff().fillna(out.cum_hazard) >= -1e-12).all()
    assert (out.survival_fleming_harrington <= 1.0).all()
    assert out.n_risk.iloc[0] == out.n_risk.max()  # risk set shrinks


def test_dbscan_labels_partition_points(spark, sf_dir):
    from ytspark.operators.spatial import dbscan_core_census

    out = dbscan_core_census(spark, sf_dir).toPandas()
    c = pd.read_parquet(f"{sf_dir}/customer.parquet",
                        columns=["c_custkey"])
    assert out.n_points.sum() == len(c)
    by = out.set_index("label")
    if "core" in by.index:
        # every core point has >= minPts neighbors -> degree_sum bound
        assert by.loc["core"].degree_sum >= 3 * by.loc["core"].n_points
    if "noise" in by.index and "core" in by.index:
        assert by.loc["noise"].n_points > 0
