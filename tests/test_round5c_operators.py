"""Round-5 third-batch operators: HITS hubs/authorities, the
k-anonymity/l-diversity privacy audit, the CMS join-size estimate, and
the Kaplan-Meier / Theil-Sen statistics pair — each recomputed from
scratch in pandas/numpy/pure Python (independent of both the Spark
implementation and the DuckDB oracle)."""

from __future__ import annotations

import collections

import numpy as np
import pandas as pd
import pytest


def _transition_edges(sf_dir):
    ev = pd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"],
    ).sort_values(["user_id", "ts", "event_id"])
    edges = collections.Counter()
    for _, grp in ev.groupby("user_id"):
        types = grp.event_type.tolist()
        for a, b in zip(types, types[1:]):
            edges[(a, b)] += 1
    return edges


class TestHits:
    def test_matches_numpy_power_iteration(self, spark, sf_dir):
        from ytspark.operators.graph import HITS_ITERS, events_hits_hubs_authorities

        edges = _transition_edges(sf_dir)
        nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
        idx = {n: i for i, n in enumerate(nodes)}
        W = np.zeros((len(nodes), len(nodes)))
        for (u, v), w in edges.items():
            W[idx[u], idx[v]] = w
        h = np.full(len(nodes), 1.0 / len(nodes))
        for _ in range(HITS_ITERS):
            a = W.T @ h
            a /= a.sum()
            h = W @ a
            h /= h.sum()

        rows = {
            r["node"]: r
            for r in events_hits_hubs_authorities(spark, sf_dir).collect()
        }
        assert set(rows) == set(nodes)
        for n in nodes:
            assert rows[n]["authority"] == pytest.approx(a[idx[n]], abs=1e-8)
            assert rows[n]["hub"] == pytest.approx(h[idx[n]], abs=1e-8)

    def test_scores_are_distributions(self, spark, sf_dir):
        from ytspark.operators.graph import events_hits_hubs_authorities

        df = events_hits_hubs_authorities(spark, sf_dir).toPandas()
        assert df.authority.sum() == pytest.approx(1.0, abs=1e-6)
        assert df.hub.sum() == pytest.approx(1.0, abs=1e-6)
        assert (df.authority >= 0).all() and (df.hub >= 0).all()


class TestKAnonymity:
    def test_matches_pandas_groupby(self, spark, sf_dir):
        from ytspark.operators.profiling import KANON_K, k_anonymity_audit

        cust = pd.read_parquet(f"{sf_dir}/customer.parquet")
        sens = np.where(
            cust.c_acctbal < 0,
            "delinquent",
            np.where(cust.c_acctbal < 5000, "standard", "premium"),
        )
        cust = cust.assign(sensitive=sens)
        got = k_anonymity_audit(spark, sf_dir).toPandas()
        grouped = cust.groupby(["c_nationkey", "c_mktsegment"])
        assert len(got) == grouped.ngroups
        for row in got.itertuples():
            grp = grouped.get_group((row.nation, row.segment))
            assert row.class_size == len(grp)
            assert row.l_distinct == grp.sensitive.nunique()
            top = grp.sensitive.value_counts().iloc[0]
            assert row.top_sensitive_share == pytest.approx(
                top / len(grp), abs=1e-6
            )
            assert row.k_anonymous == (len(grp) >= KANON_K)
            assert row.l_diverse == (grp.sensitive.nunique() >= 2)


class TestJoinSizeCms:
    def test_estimate_brackets_exact(self, spark, sf_dir):
        from ytspark.operators.sketch import join_size_estimate_cms

        row = join_size_estimate_cms(spark, sf_dir).collect()[0]
        li = pd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey"])
        od = pd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey"])
        exact = (
            od.o_orderkey.value_counts()
            .to_frame("no")
            .join(li.l_orderkey.value_counts().to_frame("nl"), how="inner")
            .eval("no * nl")
            .sum()
        )
        assert row["exact_join_rows"] == exact
        assert row["never_underestimates"]
        assert row["within_bound"]
        assert row["cms_estimate"] >= exact
        assert row["overcount"] == row["cms_estimate"] - exact


class TestKaplanMeier:
    def test_matches_pure_python_km(self, spark, sf_dir):
        from ytspark.operators.timeseries import (
            KM_CENSOR_TAIL_DAYS,
            kaplan_meier_survival,
        )

        ev = pd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
        ev["day"] = ev.ts.dt.floor("D")
        per = ev.groupby("user_id").day.agg(["min", "max"])
        wmax = ev.day.max()
        t = (per["max"] - per["min"]).dt.days
        censored = per["max"] >= wmax - pd.Timedelta(days=KM_CENSOR_TAIL_DAYS)
        tbl = (
            pd.DataFrame({"t": t, "c": censored})
            .groupby("t")
            .agg(d=("c", lambda s: int((~s).sum())), c=("c", "sum"))
            .sort_index()
        )
        n_risk = (tbl.d + tbl.c)[::-1].cumsum()[::-1]
        s, surv = 1.0, {}
        for ti in tbl.index:
            if tbl.d[ti] > 0:
                s *= 1.0 - tbl.d[ti] / n_risk[ti]
            surv[ti] = s

        rows = {r["lifetime_days"]: r for r in kaplan_meier_survival(spark, sf_dir).collect()}
        assert set(rows) == set(tbl.index)
        for ti in tbl.index:
            assert rows[ti]["n_risk"] == n_risk[ti]
            assert rows[ti]["n_deaths"] == tbl.d[ti]
            assert rows[ti]["n_censored"] == tbl.c[ti]
            assert rows[ti]["survival"] == pytest.approx(surv[ti], abs=1e-6)

    def test_survival_monotone_nonincreasing(self, spark, sf_dir):
        from ytspark.operators.timeseries import kaplan_meier_survival

        df = (
            kaplan_meier_survival(spark, sf_dir)
            .toPandas()
            .sort_values("lifetime_days")
        )
        assert (df.survival.diff().dropna() <= 1e-12).all()
        assert (df.survival > 0).all() and (df.survival <= 1).all()


class TestTheilSen:
    def test_matches_numpy_median_of_consecutive_slopes(self, spark, sf_dir):
        from ytspark.operators.timeseries import theil_sen_trend_robust

        od = pd.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
        )
        daily = (
            od.assign(y=od.o_totalprice.round(2))
            .groupby("o_orderdate")
            .y.sum()
            .sort_index()
        )
        x = (pd.Series(daily.index) - daily.index.min()).dt.days.to_numpy()
        y = daily.to_numpy()
        slopes = np.diff(y) / np.diff(x)
        k = int(np.ceil(len(slopes) / 2.0))
        median = np.sort(slopes)[k - 1]
        ols = np.polyfit(x, y, 1)[0]

        row = theil_sen_trend_robust(spark, sf_dir).collect()[0]
        assert row["n_slopes"] == len(slopes)
        assert row["k"] == k
        assert row["median_slope"] == pytest.approx(median, abs=1e-4)
        assert row["ols_slope"] == pytest.approx(ols, rel=1e-6)


class TestRfm:
    def test_matches_pandas_quintiles(self, spark, sf_dir):
        from ytspark.operators.segmentation import rfm_customer_segments

        od = pd.read_parquet(f"{sf_dir}/orders.parquet")
        dmax = od.o_orderdate.max()
        rfm = od.groupby("o_custkey").agg(
            last_order=("o_orderdate", "max"),
            f_cnt=("o_orderkey", "count"),
            m_sum=("o_totalprice", lambda s: s.round(2).sum()),
        )
        rfm["r_days"] = (dmax - rfm.last_order).dt.days
        n = len(rfm)

        def quint(series, tiebreak):
            order = series.to_frame("v").assign(ck=tiebreak).sort_values(["v", "ck"])
            rank = pd.Series(
                np.arange(1, n + 1), index=order.index
            )
            return np.ceil(5.0 * rank / n).astype(int)

        ck = rfm.index.to_series()
        rfm["r_score"] = 6 - quint(rfm.r_days, ck)
        rfm["f_score"] = quint(rfm.f_cnt, ck)
        rfm["m_score"] = quint(rfm.m_sum, ck)

        got = rfm_customer_segments(spark, sf_dir).toPandas()
        want = (
            rfm.groupby(["r_score", "f_score", "m_score"])
            .agg(n_customers=("m_sum", "size"), revenue=("m_sum", "sum"))
            .reset_index()
        )
        assert got.n_customers.sum() == n
        merged = got.merge(
            want, on=["r_score", "f_score", "m_score"], how="outer",
            suffixes=("", "_want"),
        )
        assert not merged.n_customers.isna().any()
        assert not merged.n_customers_want.isna().any()
        assert (merged.n_customers == merged.n_customers_want).all()
        assert merged.revenue.astype(float).values == pytest.approx(
            merged.revenue_want.astype(float).values, rel=1e-9
        )

    def test_segment_labels(self, spark, sf_dir):
        from ytspark.operators.segmentation import rfm_customer_segments

        got = rfm_customer_segments(spark, sf_dir).toPandas()
        for row in got.itertuples():
            r, f = row.r_score, row.f_score
            if r >= 4 and f >= 4 and row.m_score >= 4:
                assert row.segment == "champions"
            elif r <= 2 and f >= 4:
                assert row.segment == "at_risk"
            elif r <= 2 and f <= 2:
                assert row.segment == "hibernating"
            elif r >= 4 and f <= 2:
                assert row.segment == "new"
            else:
                assert row.segment == "core"


class TestMannWhitney:
    def test_matches_scipy_style_recompute(self, spark, sf_dir):
        from ytspark.queries.pipeline import MWU_A, MWU_B, mann_whitney_value_shift

        ev = pd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "value"])
        ev = ev[ev.event_type.isin([MWU_A, MWU_B]) & ev.value.notna()]
        v = (ev.value * 100).round().astype("int64")
        ranks = v.rank(method="average")
        n1 = int((ev.event_type == MWU_A).sum())
        n2 = len(ev) - n1
        r1 = float(ranks[ev.event_type == MWU_A].sum())
        u1 = r1 - n1 * (n1 + 1) / 2.0
        n = n1 + n2
        t = v.value_counts()
        tie3 = float((t.astype(float) ** 3 - t).sum())
        sigma = np.sqrt(n1 * n2 / 12.0 * ((n + 1) - tie3 / (n * (n - 1))))

        row = mann_whitney_value_shift(spark, sf_dir).collect()[0]
        assert row["n1"] == n1 and row["n2"] == n2
        assert row["u1"] == pytest.approx(u1, abs=0.11)
        assert row["sigma"] == pytest.approx(sigma, abs=1e-4)
        assert row["z_score"] == pytest.approx(
            (u1 - n1 * n2 / 2.0) / sigma, abs=1e-4
        )


class TestKneserNey:
    def test_matches_pure_python_kn(self, spark, sf_dir):
        from ytspark.operators.text import KN_DISCOUNT, kneser_ney_bigram_lm

        docs = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
        bi = collections.Counter()
        for text in docs.text:
            toks = text.split(" ")
            for a, b in zip(toks, toks[1:]):
                bi[(a, b)] += 1
        ctx_tot = collections.Counter()
        n_follow = collections.Counter()
        n_precede = collections.Counter()
        for (a, b), c in bi.items():
            ctx_tot[a] += c
            n_follow[a] += 1
            n_precede[b] += 1
        n_types = len(bi)

        got = kneser_ney_bigram_lm(spark, sf_dir).toPandas()
        assert len(got) == 25
        # rows are the top-25 by count with (w1, w2) tiebreak
        want_order = sorted(bi.items(), key=lambda kv: (-kv[1], kv[0]))[:25]
        assert [ (r.w1, r.w2) for r in got.itertuples() ] == [k for k, _ in want_order]
        for r in got.itertuples():
            c = bi[(r.w1, r.w2)]
            assert r.c_bigram == c
            assert r.c_context == ctx_tot[r.w1]
            assert r.n_follow == n_follow[r.w1]
            assert r.n_precede == n_precede[r.w2]
            p_cont = n_precede[r.w2] / n_types
            p_kn = (
                max(c - KN_DISCOUNT, 0) / ctx_tot[r.w1]
                + KN_DISCOUNT * n_follow[r.w1] / ctx_tot[r.w1] * p_cont
            )
            assert r.p_kn == pytest.approx(p_kn, abs=1e-8)
            # KN probabilities over a context sum to <= 1 by construction;
            # spot-check the interpolation weight is positive
            assert 0 < r.p_kn <= 1


class TestTruncationRecall:
    def test_matches_numpy_recompute(self, spark, sf_dir):
        from ytspark.operators.similarity import N_QUERIES, TOP_K, TRUNC_DIMS
        from ytspark.queries import registry

        embedding_truncation_recall = registry()["embedding_truncation_recall"].fn

        emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
        V = np.stack(emb.embedding.to_numpy()).astype(float)
        ids = emb.vec_id.to_numpy()

        def topk(M):
            sims = {}
            for qi in range(len(ids)):
                if ids[qi] >= N_QUERIES:
                    continue
                q = M[qi]
                cos = (M @ q) / (
                    np.linalg.norm(M, axis=1) * np.linalg.norm(q) + 0.0
                )
                cos = np.round(cos, 6)
                order = sorted(
                    [
                        (float(-cos[j]), int(ids[j]))
                        for j in range(len(ids))
                        if ids[j] != ids[qi]
                    ]
                )[:TOP_K]
                sims[int(ids[qi])] = {nid for _, nid in order}
            return sims

        full = topk(V)
        trunc = topk(V[:, :TRUNC_DIMS])
        got = embedding_truncation_recall(spark, sf_dir).toPandas()
        assert len(got) == N_QUERIES
        for row in got.itertuples():
            hits = len(full[row.query_id] & trunc[row.query_id])
            assert row.n_hits == hits
            assert row.recall_truncated == pytest.approx(hits / TOP_K, abs=1e-6)
            assert -1 <= row.avg_sim_truncated_picks <= row.avg_sim_full_topk + 1e-9


class TestBenjaminiHochberg:
    def test_matches_scipy_free_recompute(self, spark, sf_dir):
        from ytspark.queries.pipeline import BH_ALPHA, benjamini_hochberg_nations

        cust = pd.read_parquet(f"{sf_dir}/customer.parquet")
        mu = cust.c_acctbal.mean()
        var_g = (cust.c_acctbal**2).sum() / len(cust) - mu * mu
        per = cust.groupby("c_nationkey").c_acctbal.agg(["count", "mean"])
        z = (per["mean"] - mu) / np.sqrt(var_g / per["count"])
        # A&S 7.1.26 two-sided p (same approximation as the engine)
        t = 1.0 / (1.0 + 0.3275911 * z.abs())
        poly = (
            0.254829592 * t - 0.284496736 * t**2 + 1.421413741 * t**3
            - 1.453152027 * t**4 + 1.061405429 * t**5
        )
        p = 2.0 * np.exp(-z.abs() ** 2 / 2.0) / np.sqrt(2 * np.pi) * poly
        p = p.round(8)
        m = len(p)
        order = p.to_frame("p").assign(nation=p.index).sort_values(["p", "nation"])
        order["rk"] = np.arange(1, m + 1)
        passing = order[order.p <= order.rk * BH_ALPHA / m]
        kstar = int(passing.rk.max()) if len(passing) else 0
        rejected = set(order[order.rk <= kstar].nation)

        got = benjamini_hochberg_nations(spark, sf_dir).toPandas()
        assert len(got) == m
        for row in got.itertuples():
            assert row.p_value == pytest.approx(p[row.nation], abs=1e-8)
            assert row.rejected == (row.nation in rejected)
        # step-up property: the rejection set is a prefix of the p-order
        rej = got[got.rejected]
        if len(rej):
            assert rej.p_rank.max() == len(rej)


class TestTextRank:
    def test_matches_numpy_pagerank(self, spark, sf_dir):
        from ytspark.operators.graph import PR_DAMPING, PR_ITERS
        from ytspark.operators.text import TEXTRANK_TOP_K
        from ytspark.queries import registry

        textrank_keywords = registry()["textrank_keywords"].fn

        docs = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
        edges = collections.Counter()
        for text in docs.text:
            toks = text.split(" ")
            for a, b in zip(toks, toks[1:]):
                edges[(a, b)] += 1
                edges[(b, a)] += 1
        nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
        idx = {n: i for i, n in enumerate(nodes)}
        N = len(nodes)
        out_w = collections.Counter()
        for (u, _), w in edges.items():
            out_w[u] += w
        pr = np.full(N, 1.0 / N)
        for _ in range(PR_ITERS):
            nxt = np.full(N, (1.0 - PR_DAMPING) / N)
            for (u, v), w in edges.items():
                nxt[idx[v]] += PR_DAMPING * pr[idx[u]] * w / out_w[u]
            pr = nxt
        want = sorted(
            ((round(pr[idx[n]], 8), n) for n in nodes),
            key=lambda kv: (-kv[0], kv[1]),
        )[:TEXTRANK_TOP_K]

        got = textrank_keywords(spark, sf_dir).toPandas()
        assert [(r.textrank, r.token) for r in got.itertuples()] == [
            (pytest.approx(s, abs=1e-8), n) for s, n in want
        ]


class TestHoltWinters:
    def test_matches_pure_python_fold(self, spark, sf_dir):
        from ytspark.operators.timeseries import (
            HW_ALPHA,
            HW_BETA,
            HW_GAMMA,
            HW_H,
            HW_M,
            holt_winters_weekly_revenue,
        )

        od = pd.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
        )
        y = (
            od.assign(v=od.o_totalprice.round(2))
            .groupby("o_orderdate")
            .v.sum()
            .sort_index()
            .to_numpy()
            .astype(float)
        )
        m = HW_M
        l = y[:m].sum() / m
        b = (y[m : 2 * m].sum() / m - y[:m].sum() / m) / m
        s = [y[k] - l for k in range(m)]
        for i in range(2 * m, len(y)):
            k = i % m
            l_new = HW_ALPHA * (y[i] - s[k]) + (1 - HW_ALPHA) * (l + b)
            b = HW_BETA * (l_new - l) + (1 - HW_BETA) * b
            s[k] = HW_GAMMA * (y[i] - l_new) + (1 - HW_GAMMA) * s[k]
            l = l_new

        row = holt_winters_weekly_revenue(spark, sf_dir).collect()[0]
        assert row["n_days"] == len(y)
        # 2 dp report grain (env-sensitivity audit): compare at half-
        # grain absolute tolerance
        assert row["level_last"] == pytest.approx(l, abs=0.011)
        assert row["trend_last"] == pytest.approx(b, abs=0.011)
        for k in range(m):
            assert row[f"season_{k + 1}"] == pytest.approx(s[k], abs=0.011)
        for h in range(1, HW_H + 1):
            want = l + h * b + s[(len(y) + h - 1) % m]
            assert row[f"forecast_h{h}"] == pytest.approx(want, abs=0.011)
