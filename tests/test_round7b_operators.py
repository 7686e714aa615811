"""Round-7 (second wave) operators: DSIR importance selection, the
Gopher rule battery, Mann-Kendall / Kendall tau-b / Kruskal-Wallis —
semantics pinned on hand-checkable micro-fixtures."""

from __future__ import annotations

import tempfile

import pytest


@pytest.fixture()
def tmp_sf(spark):
    """Write micro-tables into a temp dir shaped like an sf_dir."""
    with tempfile.TemporaryDirectory() as d:

        def write(table, rows, schema):
            spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
                f"{d}/{table}.parquet"
            )

        yield d, write


def test_gopher_rules_hand_corpus(spark, tmp_sf):
    from ytspark.operators.text import gopher_quality_rules

    d, write = tmp_sf
    good = " ".join(["the", "a", "of"] + [f"tok{i:02d}" for i in range(60)])
    # 10 tokens => fails the 50-token band; passes alpha/stopword rules
    short = "the a of and to tok1 tok2 tok3 tok4 tok5"
    # one token repeated 60x in 63 => fails max_token_share AND mwl
    # (mean word length 2.9 < 3) but passes word count + stopwords
    reps = "the a of " + " ".join(["xx"] * 60)
    write(
        "documents",
        [(1, good, "en", "s", 1), (2, short, "en", "s", 1), (3, reps, "en", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    rows = {r["rule"]: r for r in gopher_quality_rules(spark, d).collect()}
    assert rows["word_count_band"]["n_pass"] == 2  # good + reps
    assert rows["stopword_hits"]["n_pass"] == 3
    assert rows["max_token_share"]["n_fail"] == 1  # reps
    assert rows["alpha_word_frac"]["n_pass"] == 3
    assert rows["all_rules"]["n_pass"] == 1  # only good survives
    assert rows["all_rules"]["n_fail"] == 2


def test_gopher_sorted_run_max_equals_multiplicity_max(spark, tmp_sf):
    """r12: max_token_share is computed as the max RUN length over the
    sorted token array (O(n log n)) instead of the quadratic
    distinct-x-filter scan. Pin equality against a brute-force Python
    count on adversarial shapes: all-same, all-distinct, interleaved
    duplicates, a doc whose max-share token sits exactly ON the 0.2
    boundary (5 of 25 -> share 0.2, rule passes <=), and one just over."""
    import collections

    from ytspark.operators.text import GOPHER_MAXTOK_FRAC, gopher_quality_rules

    d, write = tmp_sf
    docs = {
        1: " ".join(["same"] * 60),                        # share 1.0
        2: " ".join(f"t{i}" for i in range(60)),           # share 1/60
        3: " ".join(["a b c"] * 20),                       # interleaved, 1/3
        4: " ".join(["hot"] * 5 + [f"u{i}" for i in range(20)]),  # 5/25 = .2
        5: " ".join(["hot"] * 6 + [f"u{i}" for i in range(19)]),  # 6/25 > .2
    }
    write(
        "documents",
        [(i, t, "en", "s", 1) for i, t in docs.items()],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    expected_fail = 0
    for t in docs.values():
        toks = t.split(" ")
        share = max(collections.Counter(toks).values()) / len(toks)
        if share > GOPHER_MAXTOK_FRAC:
            expected_fail += 1
    rows = {r["rule"]: r for r in gopher_quality_rules(spark, d).collect()}
    assert rows["max_token_share"]["n_fail"] == expected_fail == 3


def test_dsir_ranks_target_like_docs_first(spark, tmp_sf):
    """Docs made of target-language tokens must outscore docs made of
    tokens the target never uses."""
    from ytspark.operators.text import dsir_importance_selection

    d, write = tmp_sf
    en_text = "alpha beta gamma delta alpha beta"
    de_text = "zork blub quux zork blub quux"
    rows = [(i, en_text, "en", "s0", 1) for i in range(4)]
    rows += [(10 + i, de_text, "de", "s1", 1) for i in range(4)]
    # a raw-pool doc that LOOKS like the target: should be selected high
    rows += [(20, en_text, "fr", "s2", 1), (21, de_text, "fr", "s2", 1)]
    write(
        "documents",
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = dsir_importance_selection(spark, d).collect()
    w = {r["doc_id"]: r["dsir_log_weight"] for r in got}
    assert w[20] > w[21]  # target-like beats target-unlike
    assert w[0] == w[20]  # weight depends only on the token multiset


def test_mann_kendall_monotone_series(spark, tmp_sf):
    from ytspark.operators.timeseries import mann_kendall_trend

    d, write = tmp_sf
    import datetime

    rows = [
        (i, 1, "O", 100.0 + 10 * i, datetime.datetime(2024, 1, 1 + i), "1-URGENT")
        for i in range(12)
    ]
    write(
        "orders",
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    row = mann_kendall_trend(spark, d).collect()[0]
    n = 12
    assert row["n_days"] == n
    assert row["s_stat"] == n * (n - 1) // 2  # all pairs increasing
    assert row["trend"] == "increasing"


def test_kendall_tau_perfect_and_inverse(spark, tmp_sf):
    from ytspark.operators.timeseries import kendall_tau_daily

    d, write = tmp_sf
    import datetime

    # k orders on day i, each priced so revenue DECREASES with count
    rows = []
    key = 0
    for i in range(6):
        for _ in range(i + 1):
            rows.append(
                (
                    key,
                    1,
                    "O",
                    1000.0 / (i + 1) ** 2,
                    datetime.datetime(2024, 2, 1 + i),
                    "1-URGENT",
                )
            )
            key += 1
    write(
        "orders",
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    row = kendall_tau_daily(spark, d).collect()[0]
    assert row["n_days"] == 6
    assert row["concordant"] == 0 and row["discordant"] == 15
    assert row["tau_b"] == -1.0


def test_kruskal_wallis_identical_groups_accepts(spark, tmp_sf):
    from ytspark.queries.pipeline import kruskal_wallis_priority

    d, write = tmp_sf
    import datetime

    # every priority sees the SAME value multiset => H == 0
    rows = []
    key = 0
    for pri in ["1-URGENT", "2-HIGH", "3-MEDIUM"]:
        for v in [10.0, 20.0, 30.0, 40.0]:
            rows.append((key, 1, "O", v, datetime.datetime(2024, 3, 1), pri))
            key += 1
    write(
        "orders",
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    row = kruskal_wallis_priority(spark, d).collect()[0]
    assert row["k_groups"] == 3
    assert row["h_stat"] == 0.0
    assert not row["reject_h0"]


def test_kruskal_wallis_separated_groups_rejects(spark, tmp_sf):
    from ytspark.queries.pipeline import kruskal_wallis_priority

    d, write = tmp_sf
    import datetime

    # fully separated value ranges across 3 groups, n=60: H near max
    rows = []
    key = 0
    for gi, pri in enumerate(["1-URGENT", "2-HIGH", "3-MEDIUM"]):
        for j in range(20):
            rows.append(
                (
                    key,
                    1,
                    "O",
                    100.0 * gi + j,
                    datetime.datetime(2024, 3, 1),
                    pri,
                )
            )
            key += 1
    write(
        "orders",
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    row = kruskal_wallis_priority(spark, d).collect()[0]
    assert row["reject_h0"]
    assert row["tie_correction"] == 1.0  # all 60 values distinct


def test_bayes_ab_symmetric_arms_near_half(spark, tmp_sf):
    from ytspark.queries.pipeline import bayes_ab_beta_posterior

    d, write = tmp_sf
    import datetime

    rows = []
    eid = 0
    for et in ("click", "purchase"):
        for i in range(40):
            # identical success pattern in both arms: 20/40 above 50
            rows.append(
                (eid, datetime.datetime(2024, 1, 1), 1, et,
                 80.0 if i % 2 == 0 else 20.0, "{}")
            )
            eid += 1
    write(
        "events",
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    row = bayes_ab_beta_posterior(spark, d).collect()[0]
    assert row["n_a"] == row["n_b"] == 40
    assert row["s_a"] == row["s_b"] == 20
    assert row["expected_lift"] == 0.0
    # identical posteriors: P(B>A) = 0.5 + half the diagonal mass
    assert abs(row["prob_b_beats_a"] - 0.5) < 0.05


def test_bayes_ab_dominant_arm_near_one(spark, tmp_sf):
    from ytspark.queries.pipeline import bayes_ab_beta_posterior

    d, write = tmp_sf
    import datetime

    rows = []
    eid = 0
    for i in range(60):  # A: 5/60 convert
        rows.append((eid, datetime.datetime(2024, 1, 1), 1, "click",
                     80.0 if i < 5 else 20.0, "{}"))
        eid += 1
    for i in range(60):  # B: 55/60 convert
        rows.append((eid, datetime.datetime(2024, 1, 1), 1, "purchase",
                     80.0 if i < 55 else 20.0, "{}"))
        eid += 1
    write(
        "events",
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    row = bayes_ab_beta_posterior(spark, d).collect()[0]
    assert row["prob_b_beats_a"] > 0.999


def test_fisher_lda_separable_classes(spark, tmp_sf):
    from ytspark.operators.learn import fisher_lda_classifier

    d, write = tmp_sf
    import datetime

    rows = []
    for i in range(30):  # class 0 ('N'): low qty, low price
        rows.append((i, 1, 1, 1, 5.0 + (i % 3), 100.0 + i, 0.0, 0.0,
                     "N", "O", datetime.datetime(2024, 1, 1)))
    for i in range(30):  # class 1 ('R'): high qty, high price
        rows.append((100 + i, 1, 1, 1, 40.0 + (i % 3), 900.0 + i, 0.0, 0.0,
                     "R", "F", datetime.datetime(2024, 1, 1)))
    write(
        "lineitem",
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    )
    row = fisher_lda_classifier(spark, d).collect()[0]
    assert row["n_class0"] == row["n_class1"] == 30
    assert row["train_accuracy"] == 1.0  # linearly separable
    assert row["mean_gap_x1"] == 35.0


def test_inclusion_dependency_verdicts(spark, tmp_sf):
    from ytspark.operators.profiling import inclusion_dependency_profile

    d, write = tmp_sf
    import datetime

    write("region", [(0, "R0")], "r_regionkey long, r_name string")
    write(
        "nation",
        [(0, "N0", 0), (1, "N1", 0)],
        "n_nationkey int, n_name string, n_regionkey long",
    )
    write(
        "customer",
        [(1, "C1", 0, 0.0, "A"), (2, "C2", 1, 0.0, "B")],
        "c_custkey long, c_name string, c_nationkey int, "
        "c_acctbal double, c_mktsegment string",
    )
    write(
        "supplier",
        [(1, "S1", 0, 0.0)],
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    )
    write(
        "part",
        [(1, "P1", "B", "T", 1, 1.0)],
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    )
    write(
        "orders",
        [(10, 1, "O", 1.0, datetime.datetime(2024, 1, 1), "1-URGENT"),
         (11, 2, "O", 1.0, datetime.datetime(2024, 1, 1), "1-URGENT")],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    write(
        "lineitem",
        [(10, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O",
          datetime.datetime(2024, 1, 1))],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    )
    write(
        "events",
        [(0, datetime.datetime(2024, 1, 1), 1, "view", 1.0, "{}"),
         (1, datetime.datetime(2024, 1, 1), 99, "view", 1.0, "{}")],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    rows = {r["child"]: r for r in inclusion_dependency_profile(spark, d).collect()}
    assert rows["orders.o_custkey"]["is_inclusion"]
    assert rows["nation.n_regionkey"]["is_inclusion"]
    # events has user 99 with no customer: 1 of 2 contained
    ev = rows["events.user_id"]
    assert not ev["is_inclusion"] and ev["n_violations"] == 1
    assert ev["containment"] == 0.5
    # negative control: orderkeys 10,11 are not custkeys
    neg = rows["orders.o_orderkey"]
    assert not neg["is_inclusion"] and neg["n_violations"] == 2


def test_mips_differs_from_cosine_on_unnormalized(spark, tmp_sf):
    """MIPS must pick the LARGE-norm vector cosine would rank lower."""
    from ytspark.operators.similarity import knn_mips_norm_augmented

    d, write = tmp_sf
    rows = [
        (0, [1.0, 0.0], 0),        # query
        (1, [0.9, 0.0], 0),        # perfectly aligned, small norm
        (2, [10.0, -1.0], 0),      # slightly off-axis, huge norm
        (3, [0.5, 0.5], 0),
    ]
    write("embeddings", rows, "vec_id long, embedding array<float>, label int")
    got = knn_mips_norm_augmented(spark, d).collect()
    top = sorted(
        (r for r in got if r["query_id"] == 0),
        key=lambda r: -r["inner_product"],
    )
    assert top[0]["neighbor_id"] == 2  # dot = 10 beats dot = 0.9
    assert top[1]["neighbor_id"] == 1


def test_audio_zcr_matches_formula_replay(spark, tmp_sf):
    from ytspark.operators.multimodal import ZCR_FRAME, multimodal_audio_zcr_frames

    d, write = tmp_sf
    ids = [1, 2, 64]
    write(
        "documents",
        [(i, "t", "en", "s", 1) for i in ids],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {r["doc_id"]: r for r in multimodal_audio_zcr_frames(spark, d).collect()}
    for did in ids:
        n = 64 + did % 64
        v = [(did * 31 + i * 17) % 4096 - 2048 for i in range(n)]
        crossings = sum(
            1
            for i in range(1, n)
            if i % ZCR_FRAME != 0 and v[i - 1] * v[i] < 0
        )
        energies = [
            sum(x * x for x in v[f : f + ZCR_FRAME])
            for f in range(0, n, ZCR_FRAME)
        ]
        r = got[did]
        assert r["n_samples"] == n
        assert r["total_crossings"] == crossings
        assert r["max_frame_energy"] == max(energies)
        assert r["peak_frame"] == energies.index(max(energies))


def test_page_hinkley_level_shift_alarms(spark, tmp_sf):
    from ytspark.operators.drift import page_hinkley_daily_mean

    d, write = tmp_sf
    import datetime

    rows = []
    eid = 0
    for day in range(20):
        level = 50.0 if day < 10 else 58.0  # +8 shift on day 10
        for _ in range(5):
            rows.append(
                (eid, datetime.datetime(2024, 1, 1 + day), 1, "view",
                 level, "{}")
            )
            eid += 1
    write(
        "events",
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = sorted(page_hinkley_daily_mean(spark, d).collect(),
                 key=lambda r: r["day"])
    assert not any(r["alarm"] for r in out[:10])  # flat prefix quiet
    assert any(r["alarm"] for r in out[10:])  # shift detected
    assert all(r["ph_stat"] >= 0 for r in out)


def test_simpson_reversal_detected(spark, tmp_sf):
    from ytspark.operators.profiling import simpson_paradox_audit

    d, write = tmp_sf
    import datetime

    rows = []
    key = 0
    # within each stratum y falls with x (slope -1), but the R stratum
    # sits up-and-right of N so the POOLED slope is positive
    for grp, x0, y0 in (("N", 1, 10), ("R", 11, 30)):
        for i in range(5):
            x = x0 + i
            rows.append((key, 1, 1, 1, float(x), float(y0 - x), 0.0, 0.0,
                         grp, "O", datetime.datetime(2024, 1, 1)))
            key += 1
    write(
        "lineitem",
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    )
    got = {r["grp"]: r for r in simpson_paradox_audit(spark, d).collect()}
    assert got["N"]["group_slope"] == -1.0
    assert got["R"]["group_slope"] == -1.0
    assert got["N"]["pooled_slope"] > 0
    assert got["N"]["sign_reversal"] and got["R"]["sign_reversal"]


def test_assortativity_star_is_minus_one(spark, tmp_sf):
    from ytspark.operators.graph import graph_degree_assortativity

    d, write = tmp_sf
    import datetime

    # five orders, each pairing hub part 0 with a distinct leaf => star
    rows = []
    for i in range(1, 6):
        for p in (0, i):
            rows.append((i, p, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O",
                         datetime.datetime(2024, 1, 1)))
    write(
        "lineitem",
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    )
    row = graph_degree_assortativity(spark, d).collect()[0]
    assert row["n_nodes"] == 6 and row["n_edges"] == 5
    assert row["assortativity"] == -1.0  # pure star: perfectly disassortative
    assert row["mixing"] == "disassortative"


def test_effect_size_separated_groups(spark, tmp_sf):
    from ytspark.queries.pipeline import effect_size_battery

    d, write = tmp_sf
    import datetime

    rows = []
    eid = 0
    for i in range(20):  # click low, purchase high, tiny within-var
        rows.append((eid, datetime.datetime(2024, 1, 1), 1, "click",
                     20.0 + (i % 2), "{}")); eid += 1
        rows.append((eid, datetime.datetime(2024, 1, 1), 1, "purchase",
                     80.0 + (i % 2), "{}")); eid += 1
    write(
        "events",
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    row = effect_size_battery(spark, d).collect()[0]
    assert row["mean_diff"] == -60.0
    assert row["cliffs_delta"] == -1.0  # every click value < every purchase
    assert row["magnitude"] == "large"
    assert abs(row["hedges_g"]) < abs(row["cohens_d"])


def test_kmv_set_ops_exact_below_k(spark, tmp_sf):
    from ytspark.operators.sketch import kmv_set_operations

    d, write = tmp_sf
    import datetime

    rows = []
    eid = 0
    for u in range(1, 31):
        rows.append((eid, datetime.datetime(2024, 1, 1), u, "click", 1.0, "{}")); eid += 1
    for u in range(21, 51):
        rows.append((eid, datetime.datetime(2024, 1, 1), u, "purchase", 1.0, "{}")); eid += 1
    write(
        "events",
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    row = kmv_set_operations(spark, d).collect()[0]
    assert (row["exact_a"], row["exact_b"]) == (30, 30)
    assert row["exact_union"] == 50 and row["exact_intersection"] == 10
    # below k=64 the KMV estimate is the exact hash count
    assert row["est_a"] == 30.0 and row["est_union"] == 50.0
    assert row["est_jaccard"] == row["exact_jaccard"] == 0.2


def test_srm_check_consistency(spark, tmp_sf):
    from ytspark.queries.pipeline import ab_srm_check

    d, write = tmp_sf
    import datetime

    rows = [(u, datetime.datetime(2024, 1, 1), u, "view", 1.0, "{}")
            for u in range(200)]
    write(
        "events",
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    row = ab_srm_check(spark, d).collect()[0]
    assert row["n_a"] + row["n_b"] == 200
    assert row["srm_detected"] == (row["chi2"] > 3.841459)


def test_kleinberg_flat_series_no_burst(spark, tmp_sf):
    from ytspark.operators.timeseries import kleinberg_burst_days

    d, write = tmp_sf
    import datetime

    rows = []
    eid = 0
    for day in range(14):
        for i in range(20):
            et = "purchase" if i < 2 else "view"  # constant 10% rate
            rows.append((eid, datetime.datetime(2024, 1, 1 + day), 1, et,
                         1.0, "{}")); eid += 1
    write(
        "events",
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = kleinberg_burst_days(spark, d).collect()
    assert len(out) == 14
    assert all(r["burst"] == 0 for r in out)


def test_kleinberg_burst_episode_segmented(spark, tmp_sf):
    from ytspark.operators.timeseries import kleinberg_burst_days

    d, write = tmp_sf
    import datetime

    rows = []
    eid = 0
    for day in range(21):
        hot = 7 <= day < 12
        for i in range(40):
            et = "purchase" if i < (30 if hot else 4) else "view"
            rows.append((eid, datetime.datetime(2024, 2, 1 + day), 1, et,
                         1.0, "{}")); eid += 1
    write(
        "events",
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = sorted(kleinberg_burst_days(spark, d).collect(),
                 key=lambda r: r["day"])
    bursts = [r["burst"] for r in out]
    assert bursts[7:12] == [1] * 5  # the hot episode is labeled burst
    assert all(b == 0 for b in bursts[:7]) and all(b == 0 for b in bursts[12:])


def test_watermark_lateness_cross_block(spark, tmp_sf):
    from ytspark.operators.temporal import watermark_lateness_profile

    d, write = tmp_sf
    import datetime

    base = datetime.datetime(2024, 1, 1)
    rows = []
    for i in range(5000):
        ts = base + datetime.timedelta(seconds=i)
        if i == 4500:  # arrives 4500s late (block 1; its max is in block 0)
            ts = base
        rows.append((i, ts, 1, "view", 1.0, "{}"))
    write(
        "events",
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    row = watermark_lateness_profile(spark, d).collect()[0]
    assert row["n_events"] == 5000
    assert row["n_late"] == 1
    assert row["max_lateness_us"] == 4499 * 1_000_000
    assert row["n_beyond_5m"] == 1 and row["n_beyond_1h"] == 1
    assert row["n_beyond_1m"] == 1
    assert row["watermark_recommendation_s"] == 4500


def test_hard_negative_mining_excludes_same_label(spark, tmp_sf):
    from ytspark.operators.similarity import hard_negative_mining

    d, write = tmp_sf
    rows = [
        (0, [1.0, 0.0], 0),   # query, label 0
        (1, [1.0, 0.01], 0),  # nearly identical but SAME label: excluded
        (2, [0.9, 0.1], 1),   # close, different label: the hard negative
        (3, [-1.0, 0.0], 1),  # far, different label
    ]
    write("embeddings", rows, "vec_id long, embedding array<float>, label int")
    got = [r for r in hard_negative_mining(spark, d).collect()
           if r["query_id"] == 0]
    ids = [r["neighbor_id"] for r in got]
    assert 1 not in ids  # same-label near-dup never mined
    best = max(got, key=lambda r: r["cos_sim"])
    assert best["neighbor_id"] == 2 and best["negative_label"] == 1


def test_mixed_language_detection(spark, tmp_sf):
    from ytspark.operators.text import mixed_language_docs

    d, write = tmp_sf
    write(
        "documents",
        [
            (1, "the a of and to cat dog", "en", "s", 1),       # pure en
            (2, "the a der die und ist of", "en", "s", 1),      # en+de mix
            (3, "xyz qqq zzz www", "und", "s", 1),              # no hits
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {r["doc_id"]: r for r in mixed_language_docs(spark, d).collect()}
    assert got[1]["primary_lang"] == "en" and not got[1]["mixed"]
    assert got[2]["mixed"] and got[2]["n_langs_detected"] == 2
    assert got[3]["n_langs_detected"] == 0 and not got[3]["mixed"]


def test_covariate_shift_identical_windows_full_ess(spark, tmp_sf):
    from ytspark.operators.drift import covariate_shift_ess

    d, write = tmp_sf
    import datetime

    rows = []
    eid = 0
    for day in (1, 20):  # ref day and cur day get IDENTICAL values
        for i in range(50):
            rows.append((eid, datetime.datetime(2024, 1, day), 1, "view",
                         10.0 * (i % 10) + 5.0, "{}")); eid += 1
    write(
        "events",
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    row = covariate_shift_ess(spark, d).collect()[0]
    assert row["n_ref"] == row["n_cur"] == 50
    # identical distributions: every bucket weight == 1 => ESS == n
    assert row["max_weight"] == row["min_weight"] == 1.0
    assert row["effective_sample_size"] == 50.0
    assert not row["severe_shift"]


def test_holm_rejects_subset_of_bh(spark, sf_dir):
    """Holm (FWER) is never more liberal than BH (FDR) on the same tests."""
    from ytspark.queries.pipeline import (
        benjamini_hochberg_nations,
        holm_bonferroni_nations,
    )

    bh = {r["nation"]: r["rejected"]
          for r in benjamini_hochberg_nations(spark, sf_dir).collect()}
    holm = {r["nation"]: r["rejected"]
            for r in holm_bonferroni_nations(spark, sf_dir).collect()}
    assert set(holm) == set(bh)
    for nation, rej in holm.items():
        if rej:
            assert bh[nation]  # holm-rejected => bh-rejected


def test_ctfidf_surfaces_source_specific_term(spark, tmp_sf):
    from ytspark.operators.text import ctfidf_source_keywords

    d, write = tmp_sf
    common = "data table row column"
    write(
        "documents",
        [
            (1, f"{common} zebra zebra zebra", "en", "srcA", 1),
            (2, f"{common} {common}", "en", "srcB", 1),
            (3, f"{common} quokka quokka", "en", "srcC", 1),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = ctfidf_source_keywords(spark, d).collect()
    topA = next(r for r in got if r["source"] == "srcA" and r["rk"] == 1)
    topC = next(r for r in got if r["source"] == "srcC" and r["rk"] == 1)
    assert topA["term"] == "zebra"  # the source-exclusive term wins
    assert topC["term"] == "quokka"


def test_partition_skew_simulator_consistency(spark, sf_dir):
    from ytspark.operators.layout import PSK_PARTS, partition_skew_simulator

    rows = {r["strategy"]: r for r in
            partition_skew_simulator(spark, sf_dir).collect()}
    assert set(rows) == {"hash", "salted"}
    for r in rows.values():
        assert r["n_partitions"] == PSK_PARTS
        assert r["skew_ratio"] >= 1.0
        assert r["max_partition_rows"] >= r["mean_partition_rows"]


def test_vopt_recovers_piecewise_constant_segments(spark, tmp_sf):
    from ytspark.operators.profiling import vopt_histogram_weekly_revenue

    d, write = tmp_sf
    import datetime

    rows = []
    key = 0
    levels = [100.0, 500.0, 100.0, 900.0]  # 4 true segments, 5 WEEKS each
    for seg, lvl in enumerate(levels):
        for i in range(5):
            wk = seg * 5 + i  # consecutive Mondays (2024-01-01 is one)
            rows.append((key, 1, "O", lvl,
                         datetime.datetime(2024, 1, 1)
                         + datetime.timedelta(days=7 * wk), "1-URGENT"))
            key += 1
    write(
        "orders",
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    out = sorted(vopt_histogram_weekly_revenue(spark, d).collect(),
                 key=lambda r: r["bucket"])
    assert len(out) == 4
    assert [r["n_weeks"] for r in out] == [5, 5, 5, 5]
    # exact piecewise recovery: zero SSE numerator per bucket
    assert all(int(r["sse_num_cents2"]) == 0 for r in out)
    assert [r["sum_cents"] for r in out] == [
        int(lvl * 100) * 5 for lvl in levels
    ]


def test_streaming_watermark_monitor_ticks(spark, tmp_sf):
    from ytspark.streaming.queries import streaming_watermark_monitor

    d, write = tmp_sf
    import datetime

    base = datetime.datetime(2024, 1, 1)
    rows = []
    for i in range(100):
        ts = base + datetime.timedelta(seconds=i)
        if i == 60:  # slice 2 event arriving 60s behind the front
            ts = base
        rows.append((i, ts, 1, "view", 1.0, "{}"))
    write(
        "events",
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    got = {r["batch_id"]: r for r in
           streaming_watermark_monitor(spark, d).collect()}
    assert set(got) == {0, 1, 2, 3}
    assert got[0]["n_late"] == 0  # no front before the first tick
    assert got[2]["n_late"] == 1
    # front after tick 1 = ts of id 49 = base+49s; event 60 has ts=base
    assert got[2]["max_lateness_us"] == 49 * 1_000_000
    assert sum(r["n_events"] for r in got.values()) == 100


def test_dedup_threshold_sweep_monotone(spark, tmp_sf):
    from ytspark.operators.dedup import dedup_threshold_sweep

    d, write = tmp_sf
    rows = [
        (0, [1.0, 0.0], 0),
        (1, [1.0, 0.001], 0),   # ~1.0 cosine with 0
        (2, [0.8, 0.6], 0),     # 0.8 cosine with 0
        (3, [0.0, 1.0], 0),     # orthogonal to 0
    ]
    write("embeddings", rows, "vec_id long, embedding array<float>, label int")
    out = sorted(dedup_threshold_sweep(spark, d).collect(),
                 key=lambda r: r["threshold"])
    pairs = [r["n_pairs"] for r in out]
    assert pairs == sorted(pairs, reverse=True)  # monotone non-increasing
    at9 = next(r for r in out if r["threshold"] == 0.9)
    assert at9["n_pairs"] == 1 and at9["n_docs_affected"] == 2
    assert at9["affected_frac"] == 0.5


def test_quantile_pinball_perfect_forecast(spark, tmp_sf):
    from ytspark.operators.timeseries import quantile_forecast_pinball

    d, write = tmp_sf
    import datetime

    rows = []
    key = 0
    for day in range(28):  # 4 weeks, constant value per weekday
        v = 100.0 + (day % 7) * 10
        rows.append((key, 1, "O", v,
                     datetime.datetime(2024, 1, 1 + day), "1-URGENT"))
        key += 1
    write(
        "orders",
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    out = {r["quantile"]: r for r in
           quantile_forecast_pinball(spark, d).collect()}
    for q in (0.5, 0.9):
        r = out[q]
        assert r["n_test_days"] == 7
        assert r["mean_pinball_loss"] == 0.0  # per-weekday constant series
        assert r["empirical_coverage"] == 1.0


def test_ccnet_buckets_rank_rare_docs_worse(spark, tmp_sf):
    from ytspark.operators.text import ccnet_perplexity_buckets

    d, write = tmp_sf
    common = "data " * 40  # one dominant token => very low perplexity
    rare = " ".join(f"rare{i}" for i in range(40))  # all singletons
    write(
        "documents",
        [(1, common.strip(), "en", "s", 1), (2, rare, "en", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {r["doc_id"]: r for r in ccnet_perplexity_buckets(spark, d).collect()}
    assert got[1]["perplexity"] < got[2]["perplexity"]
    assert got[1]["ccnet_bucket"] == "head"
    assert got[2]["ccnet_bucket"] == "tail"


def test_xbar_flags_spike_after_baseline(spark, tmp_sf):
    from ytspark.operators.drift import xbar_control_chart

    d, write = tmp_sf
    import datetime

    rows = []
    eid = 0
    for day in range(20):
        mean = 50.0 + (1.0 if day % 2 == 0 else -1.0)  # tame baseline
        if day == 17:
            mean = 200.0  # massive spike well past 3 sigma
        for _ in range(4):
            rows.append((eid, datetime.datetime(2024, 1, 1 + day), 1,
                         "view", mean, "{}")); eid += 1
    write(
        "events",
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = sorted(xbar_control_chart(spark, d).collect(),
                 key=lambda r: r["day"])
    flags = [r["out_of_control"] for r in out]
    assert flags[17] is True
    assert not any(flags[:14])  # baseline days inside their own limits
    assert out[0]["center_line"] == 50.0


def test_thompson_dominant_arm_takes_allocation(spark, tmp_sf):
    from ytspark.queries.pipeline import thompson_allocation_grid

    d, write = tmp_sf
    import datetime

    rows = []
    eid = 0
    for arm in ("click", "error", "purchase", "signup", "view"):
        for i in range(60):
            # purchase converts 55/60; everyone else 5/60
            hot = 55 if arm == "purchase" else 5
            rows.append((eid, datetime.datetime(2024, 1, 1), 1, arm,
                         80.0 if i < hot else 20.0, "{}")); eid += 1
    write(
        "events",
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    got = {r["arm"]: r for r in thompson_allocation_grid(spark, d).collect()}
    assert got["purchase"]["p_best"] > 0.999
    total = sum(r["p_best"] for r in got.values())
    assert abs(total - 1.0) < 0.01  # grid-discretized probabilities


def test_periodogram_finds_weekly_cycle(spark, tmp_sf):
    from ytspark.operators.timeseries import periodogram_daily_revenue

    d, write = tmp_sf
    import math
    import datetime

    rows = []
    for day in range(56):  # 8 clean weekly cycles
        v = 1000.0 + 500.0 * math.sin(2 * math.pi * day / 7)
        rows.append((day, 1, "O", v,
                     datetime.datetime(2024, 1, 1 + day % 28)
                     + datetime.timedelta(days=28 * (day // 28)),
                     "1-URGENT"))
    write(
        "orders",
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    out = {r["period_days"]: r for r in
           periodogram_daily_revenue(spark, d).collect()}
    assert out[7]["dominant"]
    assert out[7]["power_share"] > 0.9


def test_ols_diagnostics_clean_trend(spark, tmp_sf):
    from ytspark.operators.learn import ols_residual_diagnostics

    d, write = tmp_sf
    import datetime

    rows = []
    for day in range(30):  # exact linear trend + tiny alternating noise
        v = 1000.0 + 10.0 * day + (1.0 if day % 2 == 0 else -1.0)
        rows.append((day, 1, "O", v,
                     datetime.datetime(2024, 1, 1 + day % 28)
                     + datetime.timedelta(days=28 * (day // 28)),
                     "1-URGENT"))
    write(
        "orders",
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    row = ols_residual_diagnostics(spark, d).collect()[0]
    assert row["r_squared"] > 0.999
    # alternating residuals: strong NEGATIVE lag-1 autocorrelation
    assert row["dw_verdict"] == "negative_autocorr"
    assert row["resid_lag1_autocorr"] < -0.9


def test_ams_f2_exact_certificate(spark, sf_dir):
    from ytspark.operators.sketch import ams_f2_sketch_eval

    row = ams_f2_sketch_eval(spark, sf_dir).collect()[0]
    assert row["exact_f2"] > 0
    assert row["n_estimators"] == 16
    assert row["ams_estimate"] >= 0
    assert row["rel_error"] >= 0


def test_image_entropy_flags_flat_images(spark, tmp_sf):
    from ytspark.operators.multimodal import (
        multimodal_image_histogram_entropy,
    )

    d, write = tmp_sf
    # doc 0: w=4, h=3 with pixel (x*3 + y*5) % 256 — varied levels
    write(
        "documents",
        [(0, "t", "en", "s", 1), (5, "t", "en", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {r["doc_id"]: r for r in
           multimodal_image_histogram_entropy(spark, d).collect()}
    for did, r in got.items():
        w, h = 4 + did % 5, 3 + did % 4
        vals = {(did * 7 + x * 3 + y * 5) % 256
                for y in range(h) for x in range(w)}
        assert r["n_pixels"] == w * h
        assert r["distinct_levels"] == len(vals)
        assert r["entropy_nats"] >= 0


def test_join_strategy_advisor_verdicts(spark, sf_dir):
    from ytspark.operators.layout import join_strategy_advisor

    rows = {r["join_name"]: r for r in
            join_strategy_advisor(spark, sf_dir).collect()}
    # tiny dims at test SF: everything broadcasts
    assert rows["customer_nation"]["strategy"] == "broadcast"
    assert rows["lineitem_orders"]["dim_est_bytes"] == \
        rows["lineitem_orders"]["dim_rows"] * 80
    for r in rows.values():
        assert r["key_skew_ratio"] >= 1.0


def test_mmd_zero_for_identical_samples(spark, tmp_sf):
    from ytspark.queries.pipeline import mmd_rbf_two_sample

    d, write = tmp_sf
    import datetime

    rows = []
    eid = 0
    for et in ("click", "purchase"):  # identical value multisets
        for i in range(30):
            rows.append((eid, datetime.datetime(2024, 1, 1), 1, et,
                         10.0 * (i % 5) + 7.0, "{}")); eid += 1
    write(
        "events",
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    row = mmd_rbf_two_sample(spark, d).collect()[0]
    assert row["mmd2_biased"] == 0.0  # identical empirical distributions


def test_mmd_positive_for_shifted_samples(spark, tmp_sf):
    from ytspark.queries.pipeline import mmd_rbf_two_sample

    d, write = tmp_sf
    import datetime

    rows = []
    eid = 0
    for i in range(30):
        rows.append((eid, datetime.datetime(2024, 1, 1), 1, "click",
                     20.0, "{}")); eid += 1
        rows.append((eid, datetime.datetime(2024, 1, 1), 1, "purchase",
                     200.0, "{}")); eid += 1
    write(
        "events",
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    row = mmd_rbf_two_sample(spark, d).collect()[0]
    assert row["mmd2_biased"] > 0.5  # far-separated point masses


def test_logrank_consistency(spark, sf_dir):
    from ytspark.operators.timeseries import logrank_test_purchasers

    row = logrank_test_purchasers(spark, sf_dir).collect()[0]
    assert row["n_purchasers"] + row["n_non_purchasers"] > 0
    if row["logrank_chi2"] is None:  # degenerate one-group design
        assert row["reject_equal_survival"] is False
    else:
        assert row["logrank_chi2"] >= 0
        assert row["reject_equal_survival"] == (
            row["logrank_chi2"] > 3.841459
        )


def test_mahalanobis_mean_d2_identity(spark, sf_dir):
    """In-sample mean Mahalanobis d^2 equals the dimension (2)."""
    from ytspark.operators.profiling import mahalanobis_outliers_2d

    row = mahalanobis_outliers_2d(spark, sf_dir).collect()[0]
    assert abs(row["mean_d2"] - 2.0) < 1e-3
    assert row["max_d2"] > row["mean_d2"]
    assert 0 <= row["outlier_frac"] < 0.05
