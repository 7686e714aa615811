"""Tests for the round-4 operator additions: PMI collocations,
Count-Min heavy hitters, and the PPJoin prefix-filtered Jaccard join.

Each is checked against an independent recomputation (pandas fold, the
existing blocked-join operator, or the CMS no-underestimate theorem)
rather than against its own oracle SQL."""

from __future__ import annotations

import math
from collections import Counter

from pyspark.sql import functions as F

from ytspark.operators.dedup import (
    PP_THRESHOLD,
    dedup_jaccard_ppjoin,
    ngram_jaccard_pairs,
)
from ytspark.operators.sketch import cms_heavy_hitters
from ytspark.operators.text import (
    PMI_MIN_COUNT,
    PMI_TOP_K,
    token_pmi_bigrams,
)


class TestPmiBigrams:
    def test_matches_pandas_recompute(self, spark, sf_dir):
        import pandas as pd

        docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
        uni, bi = Counter(), Counter()
        for text in docs.text:
            toks = text.split(" ")
            uni.update(toks)
            bi.update(zip(toks, toks[1:]))
        n_uni, n_bi = sum(uni.values()), sum(bi.values())
        scored = [
            (
                round(
                    math.log2(
                        (c / n_bi)
                        / ((uni[w1] / n_uni) * (uni[w2] / n_uni))
                    ),
                    6,
                ),
                w1,
                w2,
                c,
            )
            for (w1, w2), c in bi.items()
            if c >= PMI_MIN_COUNT
        ]
        scored.sort(key=lambda r: (-r[0], r[1], r[2]))
        want = {(w1, w2): (c, pmi) for pmi, w1, w2, c in scored[:PMI_TOP_K]}

        got = {
            (r["w1"], r["w2"]): (r["c_xy"], r["pmi"])
            for r in token_pmi_bigrams(spark, sf_dir).collect()
        }
        assert got.keys() == want.keys()
        for k in want:
            assert got[k][0] == want[k][0]
            assert abs(got[k][1] - want[k][1]) < 1e-6


class TestCmsHeavyHitters:
    def test_never_underestimates_and_top_k_exactness(self, spark, sf_dir):
        rows = cms_heavy_hitters(spark, sf_dir).collect()
        assert rows, "expected heavy hitters"
        for r in rows:
            # CMS theorem: the min-over-rows estimate >= the true count
            assert r["overcount"] >= 0, r
            assert r["est_cnt"] == r["exact_cnt"] + r["overcount"]

    def test_deterministic_under_partitioning(self, spark, sf_dir):
        import ytspark.operators.sketch as sk

        base = sorted(map(tuple, cms_heavy_hitters(spark, sf_dir).collect()))
        ev = (
            spark.read.parquet(f"{sf_dir}/events.parquet")
            .repartition(11)
            .cache()
        )
        orig = sk.load_tables
        sk.load_tables = lambda s, d, *t: {"events": ev}
        try:
            shuffled = sorted(
                map(tuple, cms_heavy_hitters(spark, sf_dir).collect())
            )
        finally:
            sk.load_tables = orig
            ev.unpersist()
        assert base == shuffled


class TestPpjoin:
    def test_equals_blocked_exact_join(self, spark, sf_dir):
        """Prefix filtering must return EXACTLY the pairs the complete
        shingle-blocked exact join returns at the same threshold — the
        recall-1.0 theorem, asserted pairwise including scores."""
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        want = {
            (r["doc_a"], r["doc_b"]): round(r["jaccard"], 6)
            for r in ngram_jaccard_pairs(
                docs, threshold=PP_THRESHOLD, max_df=None
            ).collect()
        }
        got = {
            (r["doc_lo"], r["doc_hi"]): r["jaccard"]
            for r in dedup_jaccard_ppjoin(spark, sf_dir).collect()
        }
        assert got.keys() == want.keys()
        for k in want:
            assert abs(got[k] - want[k]) < 1e-6

    def test_prefix_candidates_shrink_vs_blocking(self, spark, sf_dir):
        """The point of the operator: candidate volume from prefix
        postings must be strictly smaller than full shingle-blocking
        candidate volume (hot shingles never generate candidates)."""
        from ytspark.operators.dedup import shingle_rows

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        sh = shingle_rows(docs)
        posting = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
        full_cands = posting.agg(
            F.sum(F.col("df") * (F.col("df") - 1) / 2).alias("c")
        ).collect()[0]["c"]
        n = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
        prefix_rows = n.select(
            (
                F.col("n")
                - F.ceil(F.lit(PP_THRESHOLD) * F.col("n")).cast("int")
                + F.lit(1)
            ).alias("p")
        ).agg(F.sum("p").alias("p")).collect()[0]["p"]
        total_rows = sh.count()
        assert prefix_rows < total_rows * 0.3
        assert full_cands > 0


class TestPcaPower:
    def test_rayleigh_quotient_near_top_eigenvalue(self, spark, sf_dir):
        """The synthetic embeddings are near-isotropic (eigengap ratio
        ~0.93), so a fixed-iteration power method cannot pin the exact
        top eigenvector — the honest contract is variational: the
        learned direction's Rayleigh quotient must sit well above the
        spectrum mean and near the top eigenvalue, the estimate must
        never exceed the top eigenvalue, and v must be unit-norm."""
        import numpy as np

        from ytspark.operators.clustering import _pca_train

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        mu, v, eigval = _pca_train(emb)
        pdf = emb.orderBy("vec_id").toPandas()
        X = np.array([np.asarray(r, float) for r in pdf.embedding])
        # same sample the trainer saw: stride is 1 at test scale
        B = X - X.mean(axis=0)
        cov = B.T @ B / len(X)
        evals = np.linalg.eigvalsh(cov)
        top_val, mean_val = evals[-1], float(evals.mean())
        rq = float(v @ cov @ v)
        assert abs(float(np.dot(v, v)) - 1.0) < 1e-12
        assert np.allclose(mu, X.mean(axis=0))
        assert eigval <= top_val * (1 + 1e-9)
        assert rq > 0.8 * top_val > mean_val
        assert 0.8 * top_val < eigval

    def test_projection_stats_deterministic(self, spark, sf_dir):
        from ytspark.operators.clustering import embedding_pca_power

        a = sorted(map(tuple, embedding_pca_power(spark, sf_dir).collect()))
        b = sorted(map(tuple, embedding_pca_power(spark, sf_dir).collect()))
        assert a == b


class TestJaroWinkler:
    PAIRS = [
        ("MARTHA", "MARHTA"),
        ("DWAYNE", "DUANE"),
        ("DIXON", "DICKSONX"),
        ("JELLYFISH", "SMELLYFISH"),
        ("ABCDEF", "ABZZZZ"),  # jaro < 0.7: boost threshold must gate
        ("AB", "CDEFAB"),
        ("xyz", "zyx"),
        ("a", "a"),
        ("", "abc"),
        ("hello", "hel"),
        ("Customer#000000001", "Customer#000000010"),
    ]

    def test_kernel_matches_duckdb_native_bitwise(self):
        """The Python kernel and DuckDB's native implementation must
        agree to the last ulp — including the 0.7 boost-threshold
        case where a naive always-bonus Winkler diverges."""
        import duckdb

        from ytspark.operators.fuzzy import jaro_winkler

        con = duckdb.connect()
        for s1, s2 in self.PAIRS:
            want = con.execute(
                "SELECT JARO_WINKLER_SIMILARITY(?, ?)", [s1, s2]
            ).fetchone()[0]
            assert jaro_winkler(s1, s2) == want, (s1, s2)
            assert jaro_winkler(s2, s1) == want, (s2, s1)

    def test_pair_query_bounded_and_thresholded(self, spark, sf_dir):
        from ytspark.operators.fuzzy import (
            JW_PROBE_N,
            JW_THRESHOLD,
            jaro_winkler_verify_pairs,
        )

        rows = jaro_winkler_verify_pairs(spark, sf_dir).collect()
        for r in rows:
            assert r["key_lo"] < r["key_hi"] < JW_PROBE_N
            assert r["jw_sim"] >= JW_THRESHOLD


class TestNaiveBayes:
    def test_confusion_matrix_partitions_corpus(self, spark, sf_dir):
        """Every document lands in exactly one confusion cell, and the
        per-true-lang row sums equal the corpus label counts."""
        from ytspark.operators.learn import lang_nb_classifier

        rows = lang_nb_classifier(spark, sf_dir).collect()
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        want = {
            r["lang"]: r["n"]
            for r in docs.groupBy("lang").agg(
                F.count(F.lit(1)).alias("n")
            ).collect()
        }
        got = {}
        for r in rows:
            got[r["true_lang"]] = got.get(r["true_lang"], 0) + r["n"]
        assert got == want

    def test_matches_sklearn_free_recompute(self, spark, sf_dir):
        """Predictions must equal a driver-side multinomial-NB
        recompute (Laplace alpha=1) done with plain dict arithmetic."""
        import math
        from collections import Counter, defaultdict

        import pandas as pd

        from ytspark.operators.learn import NB_ROUND, lang_nb_classifier

        docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
        class_tok = defaultdict(Counter)
        toks_c = Counter()
        n_docs = Counter()
        vocab = set()
        for _, r in docs.iterrows():
            ts = r.text.split(" ")
            class_tok[r.lang].update(ts)
            toks_c[r.lang] += len(ts)
            n_docs[r.lang] += 1
            vocab.update(ts)
        v, n = len(vocab), len(docs)
        conf = Counter()
        for _, r in docs.iterrows():
            ts = Counter(r.text.split(" "))
            n_d = sum(ts.values())
            best = None
            for c in sorted(n_docs):
                s = (
                    math.log(n_docs[c] / n)
                    - n_d * math.log(toks_c[c] + v)
                    + sum(
                        k * math.log(class_tok[c][t] + 1)
                        for t, k in ts.items()
                        if class_tok[c][t]
                    )
                )
                s = round(s, NB_ROUND)
                if best is None or s > best[0]:
                    best = (s, c)
            conf[(r.lang, best[1])] += 1
        got = {
            (r["true_lang"], r["pred_lang"]): r["n"]
            for r in lang_nb_classifier(spark, sf_dir).collect()
        }
        assert got == dict(conf)


class TestTriangleCount:
    def test_known_graph(self, spark, sf_dir):
        """Two orders sharing two parts: edges (1,2)(1,3)(2,3)(2,4)
        (3,4) -> triangles {1,2,3} and {2,3,4}, wedges 8, gcc 0.75."""
        import ytspark.operators.graph as g

        li = spark.createDataFrame(
            [(1, 1), (1, 2), (1, 3), (2, 2), (2, 3), (2, 4)],
            "l_orderkey long, l_partkey long",
        )
        orig = g.load_tables
        g.load_tables = lambda s, d, *t: {"lineitem": li}
        try:
            row = g.copurchase_triangle_count(spark, sf_dir).collect()[0]
        finally:
            g.load_tables = orig
        assert row["n_nodes"] == 4
        assert row["n_edges"] == 5
        assert row["n_triangles"] == 2
        assert row["max_degree"] == 3
        assert abs(row["global_clustering"] - 0.75) < 1e-9

    def test_degree_ordering_counts_match_id_ordering(self, spark, sf_dir):
        """The orientation argument: counting by (degree, id) rank must
        equal counting by plain id order (each triangle has exactly one
        minimal vertex under ANY total order)."""
        from pyspark.sql import functions as F

        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        op = li.select(
            F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
        ).distinct()
        a, b = op.alias("a"), op.alias("b")
        e = (
            a.join(
                b,
                (F.col("a.o") == F.col("b.o"))
                & (F.col("a.p") < F.col("b.p")),
            )
            .select(F.col("a.p").alias("pa"), F.col("b.p").alias("pb"))
            .distinct()
        )
        e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
        naive = (
            e1.join(e2, F.col("e2.pa") == F.col("e1.pb"))
            .join(
                e3,
                (F.col("e3.pa") == F.col("e1.pa"))
                & (F.col("e3.pb") == F.col("e2.pb")),
            )
            .count()
        )
        from ytspark.operators.graph import copurchase_triangle_count

        got = copurchase_triangle_count(spark, sf_dir).collect()[0]
        assert got["n_triangles"] == naive


class TestBpe:
    def test_matches_pure_python_bpe(self, spark, sf_dir):
        """The merge table must equal a from-scratch Python BPE
        trainer over the same frequency-weighted vocabulary."""
        from collections import Counter

        import pandas as pd

        from ytspark.operators.bpe import N_MERGES, bpe_merge_table

        docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
        vocab = Counter()
        for text in docs.text:
            vocab.update(text.split(" "))
        symbols = {tok: list(tok) for tok in vocab}
        want = []
        for step in range(1, N_MERGES + 1):
            pairs = Counter()
            for tok, freq in vocab.items():
                s = symbols[tok]
                for i in range(len(s) - 1):
                    pairs[(s[i], s[i + 1])] += freq
            (l, r), c = min(
                pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
            )
            want.append((step, l, r, c))
            for tok in vocab:
                s = symbols[tok]
                out, i = [], 0
                while i < len(s):
                    if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                        out.append(l + r)
                        i += 2
                    else:
                        out.append(s[i])
                        i += 1
                symbols[tok] = out
        got = [
            (r["step"], r["left_sym"], r["right_sym"], r["pair_weight"])
            for r in bpe_merge_table(spark, sf_dir)
            .orderBy("step")
            .collect()
        ]
        assert got == want

    def test_greedy_fold_overlap_semantics(self, spark, sf_dir):
        """Self-overlapping pair (l == r): 'aaaa' must merge to
        ['aa','aa'] and 'aaa' to ['aa','a'] — the parity rule."""
        from pyspark.sql import functions as F

        import ytspark.operators.bpe as bpe

        docs = spark.createDataFrame(
            [("aaaa aaa aa",)], "text string"
        )
        merges, v = bpe.bpe_train(docs, n_merges=1)
        assert merges[0][1:3] == ("a", "a")
        out = {r["tok"]: r["s"] for r in v.collect()}
        assert out["aaaa"] == ["aa", "aa"]
        assert out["aaa"] == ["aa", "a"]
        assert out["aa"] == ["aa"]


class TestAttribution:
    def test_matches_pandas_recompute(self, spark, sf_dir):
        import pandas as pd

        from ytspark.operators.temporal import (
            ATTR_TOUCHES,
            ATTR_WINDOW_DAYS,
            purchase_touch_attribution,
        )

        ev = pd.read_parquet(f"{sf_dir}/events.parquet")
        purchases = ev[ev.event_type == "purchase"]
        touches = ev[ev.event_type.isin(ATTR_TOUCHES)]
        lin, first, last, cnt = {}, {}, {}, {}
        for _, p in purchases.iterrows():
            w = touches[
                (touches.user_id == p.user_id)
                & (touches.ts <= p.ts)
                & (touches.ts > p.ts - pd.Timedelta(days=ATTR_WINDOW_DAYS))
            ].sort_values(["ts", "event_id"])
            if not len(w):
                continue
            n = len(w)
            for t in w.event_type:
                lin[t] = lin.get(t, 0.0) + 1.0 / n
                cnt[t] = cnt.get(t, 0) + 1
            ft, lt = w.iloc[0].event_type, w.iloc[-1].event_type
            first[ft] = first.get(ft, 0) + 1
            last[lt] = last.get(lt, 0) + 1
        got = {
            r["touch"]: r
            for r in purchase_touch_attribution(spark, sf_dir).collect()
        }
        assert got.keys() == set(cnt)
        for t in cnt:
            assert got[t]["n_touch_events"] == cnt[t]
            assert got[t]["first_touch_purchases"] == first.get(t, 0)
            assert got[t]["last_touch_purchases"] == last.get(t, 0)
            assert abs(got[t]["linear_credit"] - round(lin[t], 6)) < 1e-5


class TestCogroupKernel:
    def test_matches_pandas_global_recompute(self, spark, sf_dir):
        import pandas as pd

        from ytspark.operators.batchmap import cogroup_purchase_click_gap

        ev = pd.read_parquet(f"{sf_dir}/events.parquet")
        p = ev[ev.event_type == "purchase"]
        c = ev[ev.event_type == "click"]
        got = {
            r["user_id"]: r
            for r in cogroup_purchase_click_gap(spark, sf_dir).collect()
        }
        assert set(got) == set(p.user_id.unique())
        for uid, pg in p.groupby("user_id"):
            cg = c[c.user_id == uid].sort_values(["ts", "event_id"])
            gaps = []
            unmatched = 0
            for _, row in pg.iterrows():
                prior = cg[cg.ts <= row.ts]
                if len(prior):
                    # exact integer microseconds (Timedelta.value is ns)
                    gaps.append((row.ts - prior.ts.iloc[-1]).value // 1000)
                else:
                    unmatched += 1
            r = got[uid]
            assert r["n_purchases"] == len(pg)
            assert r["n_clicks"] == len(cg)
            assert r["n_unmatched"] == unmatched
            if gaps:
                g = sorted(gaps)
                n = len(g)
                want2 = g[(n - 1) // 2] + g[n // 2]
                assert r["median_gap_us2"] == want2
            else:
                assert r["median_gap_us2"] is None

    def test_count_only_projection_survives_pruning(self, spark, sf_dir):
        """Regression: with same-name columns on both cogroup sides,
        Spark 4's attribute dedup pruned the right side's 'ts' under a
        bare .count() and the kernel crashed with KeyError. Distinct
        right-side names keep the full schema flowing."""
        from ytspark.operators.batchmap import cogroup_purchase_click_gap

        assert cogroup_purchase_click_gap(spark, sf_dir).count() > 0

    def test_edge_users(self, spark, sf_dir):
        """Clicks-only users emit no row; purchase-without-click users
        emit an unmatched row with NULL median."""
        import ytspark.operators.batchmap as bm

        ev = spark.createDataFrame(
            [
                (1, "2026-01-01 10:00:00", 10, "click"),
                (2, "2026-01-02 09:00:00", 11, "purchase"),
                (3, "2026-01-02 09:30:00", 12, "purchase"),
                (3, "2026-01-02 09:00:00", 13, "click"),
            ],
            "user_id long, ts string, event_id long, event_type string",
        ).selectExpr(
            "user_id", "CAST(ts AS TIMESTAMP) ts", "event_id", "event_type"
        )
        orig = bm.load_tables
        bm.load_tables = lambda s, d, *t: {"events": ev}
        try:
            rows = {
                r["user_id"]: r
                for r in bm.cogroup_purchase_click_gap(
                    spark, sf_dir
                ).collect()
            }
        finally:
            bm.load_tables = orig
        assert set(rows) == {2, 3}
        assert rows[2]["n_unmatched"] == 1
        assert rows[2]["median_gap_us2"] is None
        assert rows[3]["median_gap_us2"] == 2 * 1800 * 1_000_000


class TestWinsorize:
    def test_matches_numpy(self, spark, sf_dir):
        import numpy as np
        import pandas as pd

        from ytspark.operators.timeseries import (
            WINSOR_HI,
            WINSOR_LO,
            value_winsorize_stats,
        )

        ev = pd.read_parquet(f"{sf_dir}/events.parquet")
        ev = ev[ev.value.notna()]
        got = {
            r["event_type"]: r
            for r in value_winsorize_stats(spark, sf_dir).collect()
        }
        for et, grp in ev.groupby("event_type"):
            v = grp.value.to_numpy()
            lo = np.quantile(v, WINSOR_LO)  # linear interpolation
            hi = np.quantile(v, WINSOR_HI)
            r = got[et]
            assert r["n"] == len(v)
            assert abs(r["p_lo"] - round(lo, 6)) < 1e-6
            assert abs(r["p_hi"] - round(hi, 6)) < 1e-6
            assert r["n_clamped_lo"] == int((v < lo).sum())
            assert r["n_clamped_hi"] == int((v > hi).sum())
            assert abs(r["mean_after"] - round(v.clip(lo, hi).mean(), 6)) < 2e-6
            assert r["mean_after"] != r["mean_before"]


class TestOverlapJoin:
    def test_overlaps_nonnegative_and_symmetric_free(self, spark, sf_dir):
        from ytspark.operators.temporal import user_activity_overlap_pairs

        rows = user_activity_overlap_pairs(spark, sf_dir).collect()
        assert rows
        for r in rows:
            assert r["ua"] < r["ub"]
            assert r["total_overlap_us"] >= 0
            assert r["days_overlapped"] >= 1

    def test_matches_pandas_on_one_day(self, spark, sf_dir):
        """Exact overlap check for the busiest day, computed by hand."""
        import pandas as pd

        from ytspark.operators.temporal import user_activity_overlap_pairs

        ev = pd.read_parquet(f"{sf_dir}/events.parquet")
        ev["d"] = ev.ts.dt.date
        day = ev.groupby("d").size().idxmax()
        spans = (
            ev[ev.d == day]
            .groupby("user_id")
            .ts.agg(["min", "max"])
            .reset_index()
        )
        want = {}
        recs = spans.to_dict("records")
        for i, a in enumerate(recs):
            for b in recs[i + 1 :]:
                ua, ub = sorted([a, b], key=lambda r: r["user_id"])
                if ua["min"] <= ub["max"] and ub["min"] <= ua["max"]:
                    ov = (
                        min(ua["max"], ub["max"]) - max(ua["min"], ub["min"])
                    ).value // 1000  # ns -> us
                    want[(ua["user_id"], ub["user_id"])] = ov
        got_all = user_activity_overlap_pairs(spark, sf_dir).collect()
        # every reported pair that overlapped on this day must include
        # at least this day's overlap in its total
        for r in got_all:
            k = (r["ua"], r["ub"])
            if k in want:
                assert r["total_overlap_us"] >= want[k]


class TestHilbert:
    @staticmethod
    def _xy2d(n, x, y):
        d, s = 0, n // 2
        while s > 0:
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x, y = s - 1 - x, s - 1 - y
                x, y = y, x
            s //= 2
        return d

    def test_state_machine_equals_classic_algorithm(self, spark, sf_dir):
        """The 4-state machine must reproduce the classic
        rotate-and-swap xy2d for every point of the 8-bit grid
        (sampled grid stripes + exhaustive 16x16 corner)."""
        from pyspark.sql import functions as F

        from ytspark.operators.layout import HBITS, hilbert_col

        n = 1 << HBITS
        pts = [(x, y) for x in range(0, n, 17) for y in range(0, n, 13)]
        pts += [(x, y) for x in range(16) for y in range(16)]
        df = spark.createDataFrame(pts, "x int, y int")
        got = {
            (r["x"], r["y"]): r["h"]
            for r in df.select(
                "x", "y", hilbert_col(F.col("x"), F.col("y")).alias("h")
            ).collect()
        }
        for (x, y), h in got.items():
            assert h == self._xy2d(n, x, y), (x, y)

    def test_hilbert_beats_zorder_locality(self, spark, sf_dir):
        """The reason to prefer Hilbert: under the SAME equal-row
        file cuts, mean per-file bounding-box area (the footer-span
        product a reader skips on) must be smaller than Z-order's.
        (Aligned power-of-4 buckets would tie — both curves' aligned
        runs are exact quadrants; arbitrary cuts expose Morton's
        diagonal jumps.)"""
        from pyspark.sql import functions as F
        from pyspark.sql.window import Window

        from ytspark.operators.layout import (
            N_FILES,
            ZBITS,
            hilbert_layout_stats,
            zorder_col,
        )

        def mean_area(rows):
            areas = [
                (r["x_max"] - r["x_min"] + 1) * (r["y_max"] - r["y_min"] + 1)
                for r in rows
            ]
            return sum(areas) / len(areas)

        hz = mean_area(hilbert_layout_stats(spark, sf_dir).collect())

        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        side = F.lit(1 << ZBITS)
        pts = orders.select(
            F.pmod(F.col("o_custkey"), side).alias("x"),
            F.pmod(
                F.datediff(F.col("o_orderdate"), F.lit("1992-01-01")), side
            ).alias("y"),
        ).withColumn("d", zorder_col(F.col("x"), F.col("y")))
        f = F.ntile(N_FILES).over(Window.orderBy("d", "x", "y"))
        zrows = (
            pts.select("x", "y", f.alias("file_id"))
            .groupBy("file_id")
            .agg(
                F.min("x").alias("x_min"),
                F.max("x").alias("x_max"),
                F.min("y").alias("y_min"),
                F.max("y").alias("y_max"),
            )
            .collect()
        )
        zz = mean_area(zrows)
        assert hz < zz, (hz, zz)
