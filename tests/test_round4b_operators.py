"""Tests for the Bloom semi-join reduction, k-core peeling, and the
KS/PSI drift monitor — each checked against an independent local
recomputation or a structural theorem, not its own oracle SQL."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from ytspark.operators.bloom import (
    M_BITS,
    N_HASHES,
    bloom_build,
    bloom_filter_fact,
    bloom_semijoin_reduction,
)
from ytspark.operators.drift import KS_BINS, ks_psi_drift_events
from ytspark.operators.graph import KCORE_K, KCORE_W_MIN, kcore_copurchase


class TestBloomSemijoin:
    def test_no_false_negatives_and_fp_accounting(self, spark, sf_dir):
        """A Bloom filter can never drop a true match: every matched
        order must pass the filter, so per priority
        n_match <= n_pass_bloom and n_false_pos = pass - match."""
        rows = bloom_semijoin_reduction(spark, sf_dir).collect()
        assert rows
        for r in rows:
            assert r["n_match"] <= r["n_pass_bloom"]
            assert r["n_false_pos"] == r["n_pass_bloom"] - r["n_match"]
            assert r["n_pass_bloom"] <= r["n_orders"]

    def test_every_dim_key_passes_its_own_filter(self, spark, sf_dir):
        """Probing the build keys themselves must pass 100% — the
        no-false-negative property, directly."""
        dim = (
            spark.read.parquet(f"{sf_dir}/customer.parquet")
            .where(F.col("c_acctbal") < 0)
            .select(F.col("c_custkey").alias("key"))
            .distinct()
        )
        bloom = bloom_build(dim, "key")
        passed = bloom_filter_fact(dim, bloom, "key").count()
        assert passed == dim.count()

    def test_bitmap_state_is_constant_size(self, spark, sf_dir):
        """The filter state is <= M_BITS/64 packed words no matter
        how many keys — the property that distinguishes a Bloom
        filter from a broadcast hash set."""
        dim = (
            spark.read.parquet(f"{sf_dir}/customer.parquet")
            .select(F.col("c_custkey").alias("key"))
            .distinct()
        )
        (row,) = bloom_build(dim, "key").collect()
        assert len(row["bloom"]) <= M_BITS // 64
        assert N_HASHES >= 2


class TestKcore:
    def _local_edges(self, spark, sf_dir):
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        op = li.select(
            F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
        ).distinct()
        a, b = op.alias("a"), op.alias("b")
        pairs = (
            a.join(
                b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p"))
            )
            .groupBy(F.col("a.p").alias("pa"), F.col("b.p").alias("pb"))
            .agg(F.count(F.lit(1)).alias("w"))
            .where(F.col("w") >= KCORE_W_MIN)
            .collect()
        )
        return [(r["pa"], r["pb"]) for r in pairs]

    def test_matches_sequential_peel_to_fixpoint(self, spark, sf_dir):
        """The fixed-round distributed peel must equal the sequential
        peel run to FIXPOINT — proving the round budget suffices at
        this scale — including the within-core degrees."""
        edges = self._local_edges(spark, sf_dir)
        alive = {n for e in edges for n in e}
        while True:
            deg = Counter()
            for u, v in edges:
                if u in alive and v in alive:
                    deg[u] += 1
                    deg[v] += 1
            new = {n for n in alive if deg[n] >= KCORE_K}
            if new == alive:
                break
            alive = new
        want = {
            n: c for n, c in deg.items() if n in alive and c > 0
        }
        got = {
            r["part_key"]: r["core_deg"]
            for r in kcore_copurchase(spark, sf_dir).collect()
        }
        assert got == want

    def test_core_degrees_meet_threshold(self, spark, sf_dir):
        """At fixpoint every member has within-core degree >= k."""
        for r in kcore_copurchase(spark, sf_dir).collect():
            assert r["core_deg"] >= KCORE_K


class TestDrift:
    def test_invariants_and_binned_vs_exact_ks(self, spark, sf_dir):
        """0 <= KS <= 1; the binned KS is a lower bound of the exact
        KS (max over bin boundaries vs sup over all points) and
        within 2/B of it; PSI >= 0 (it is an f-divergence)."""
        import numpy as np
        import pandas as pd

        rows = ks_psi_drift_events(spark, sf_dir).collect()
        assert rows
        ev = pd.read_parquet(f"{sf_dir}/events.parquet")
        us = ev.ts.astype("int64")
        mid = us.min() + (us.max() - us.min()) // 2
        for r in rows:
            assert 0.0 <= r["ks_stat"] <= 1.0
            assert r["psi"] >= 0.0
            assert r["drift"] == (r["ks_stat"] > r["crit_05"]) or abs(
                r["ks_stat"] - r["crit_05"]
            ) < 1e-5
            sub = ev[ev.event_type == r["event_type"]]
            sub_us = us[sub.index]
            a = np.sort(sub[sub_us < mid].value.to_numpy())
            b = np.sort(sub[sub_us >= mid].value.to_numpy())
            # exact two-sample KS by merged ECDF scan
            grid = np.unique(np.concatenate([a, b]))
            fa = np.searchsorted(a, grid, side="right") / len(a)
            fb = np.searchsorted(b, grid, side="right") / len(b)
            exact = float(np.max(np.abs(fa - fb)))
            # ks_stat is reported rounded to 6 dp — allow that slack;
            # the binning error is bounded by the query's own
            # a-posteriori certificate, the heaviest bin's mass
            assert r["ks_stat"] <= exact + 5e-7
            assert exact - r["ks_stat"] <= r["max_bin_share"] + 5e-7


class TestNormalEquations:
    def test_matches_numpy_lstsq(self, spark, sf_dir):
        """The distributed Gram solve must agree with numpy's QR
        least squares on the same features."""
        import numpy as np
        import pandas as pd

        li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
        orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
        feats = li.groupby("l_orderkey").agg(
            x1=("l_partkey", "size"), x2=("l_quantity", "sum")
        )
        d = orders.join(feats, on="o_orderkey", how="inner")
        X = np.column_stack(
            [np.ones(len(d)), d.x1.to_numpy(), d.x2.to_numpy()]
        )
        beta, *_ = np.linalg.lstsq(X, d.o_totalprice.to_numpy(), rcond=None)

        from ytspark.operators.learn import regression_normal_equations

        (row,) = regression_normal_equations(spark, sf_dir).collect()
        assert row["n_orders"] == len(d)
        for got, want in zip(
            (row["beta0"], row["beta1"], row["beta2"]), beta
        ):
            assert abs(got - want) < 1e-3 * max(1.0, abs(want))
        assert 0.0 <= row["r2"] <= 1.0


class TestCusumAcf:
    def _daily(self, sf_dir):
        import pandas as pd

        ev = pd.read_parquet(f"{sf_dir}/events.parquet")
        ev["day"] = ev.ts.dt.normalize()
        spine = pd.date_range(ev.day.min(), ev.day.max(), freq="D")
        out = {}
        for et, sub in ev.groupby("event_type"):
            c = sub.groupby("day").size().reindex(spine, fill_value=0)
            out[et] = c.to_numpy()
        return out, spine

    def test_cusum_matches_sequential_recompute(self, spark, sf_dir):
        import numpy as np

        from ytspark.operators.timeseries import cusum_changepoint_daily

        daily, spine = self._daily(sf_dir)
        rows = cusum_changepoint_daily(spark, sf_dir).collect()
        assert {r["event_type"] for r in rows} == set(daily)
        for r in rows:
            c = daily[r["event_type"]]
            n, T = len(c), c.sum()
            sp = n * np.cumsum(c) - np.arange(1, n + 1) * T
            i = int(np.lexsort((np.arange(n), -np.abs(sp)))[0])
            assert r["n_days"] == n
            assert r["cp_day"] == spine[i].to_pydatetime()
            assert abs(r["cusum_peak"] - abs(sp[i]) / n) < 1e-5

    def test_acf_matches_numpy(self, spark, sf_dir):
        import numpy as np

        from ytspark.operators.timeseries import acf_daily_counts

        daily, _ = self._daily(sf_dir)
        rows = acf_daily_counts(spark, sf_dir).collect()
        for r in rows:
            c = daily[r["event_type"]].astype(float)
            d = c - c.mean()
            den = (d * d).sum()
            for lag, col in ((1, "r_lag1"), (7, "r_lag7")):
                want = (d[:-lag] * d[lag:]).sum() / den
                assert abs(r[col] - want) < 1e-5, (r["event_type"], lag)


class TestStratifiedSample:
    def test_exact_allocation_and_membership(self, spark, sf_dir):
        """Allocations sum exactly to the target; sampled counts hit
        min(alloc, stratum size); the checksum matches a local
        recompute of the hash-ranked membership."""
        import pandas as pd

        from ytspark.operators.text import (
            _KNUTH,
            SPLIT_MOD,
            STRAT_TOTAL,
            stratified_sample_exact,
        )

        rows = stratified_sample_exact(spark, sf_dir).collect()
        assert sum(r["n_alloc"] for r in rows) == STRAT_TOTAL
        docs = pd.read_parquet(f"{sf_dir}/documents.parquet")

        def khash(k):
            k = k % SPLIT_MOD
            return ((k // 65536) * _KNUTH % SPLIT_MOD * 65536
                    + (k % 65536) * _KNUTH) % SPLIT_MOD

        for r in rows:
            sub = docs[docs.source == r["source"]].copy()
            assert r["n_docs"] == len(sub)
            assert r["n_sampled"] == min(r["n_alloc"], len(sub))
            sub["h"] = sub.doc_id.map(khash)
            picked = sub.sort_values(["h", "doc_id"]).head(r["n_alloc"])
            assert r["sample_checksum"] == int(picked.doc_id.sum())


class TestIncrementalJoinView:
    def test_four_term_identity_equals_direct_join(self, spark, sf_dir):
        """The delta-join union must be row-identical to the direct
        join (the IVM identity), not just aggregate-equal."""
        from ytspark.operators.maintenance import incremental_join_view

        got = {
            r["segment"]: (r["n_rows"], r["revenue"], r["n_from_delta"])
            for r in incremental_join_view(spark, sf_dir).collect()
        }
        o = spark.read.parquet(f"{sf_dir}/orders.parquet")
        c = spark.read.parquet(f"{sf_dir}/customer.parquet")
        direct = (
            o.join(c, o.o_custkey == c.c_custkey)
            .groupBy("c_mktsegment")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                .cast("double")
                .alias("rev"),
            )
            .collect()
        )
        assert {r["c_mktsegment"]: (r["n"], r["rev"]) for r in direct} == {
            k: (v[0], v[1]) for k, v in got.items()
        }
        # deltas are ~1/20 of each side; provenance must be nonzero
        # but a minority of rows
        total = sum(v[0] for v in got.values())
        from_delta = sum(v[2] for v in got.values())
        assert 0 < from_delta < total / 2


class TestScd2Asof:
    def test_matches_last_order_at_or_before_d(self, spark, sf_dir):
        """As-of status must equal the status of the last order at or
        before D (by the (date, orderkey) total order), and
        effective_from the start of that status run."""
        import pandas as pd

        from ytspark.operators.maintenance import ASOF_DATE, scd2_asof_snapshot

        rows = scd2_asof_snapshot(spark, sf_dir).collect()
        o = pd.read_parquet(f"{sf_dir}/orders.parquet")
        d = pd.Timestamp(ASOF_DATE)
        want = {}
        for ck, sub in o.groupby("o_custkey"):
            sub = sub.sort_values(["o_orderdate", "o_orderkey"])
            upto = sub[sub.o_orderdate <= d]
            if upto.empty:
                continue
            status = upto.o_orderstatus.iloc[-1]
            # walk back the trailing run of equal statuses
            run = upto[
                upto.o_orderstatus.ne(status)[::-1].cummax()[::-1] == False  # noqa: E712
            ]
            want[ck] = (status, run.o_orderdate.iloc[0])
        got = {
            r["o_custkey"]: (r["status_at"], pd.Timestamp(r["effective_from"]))
            for r in rows
        }
        assert got == want


class TestSkyline:
    def test_matches_bruteforce_dominance(self, spark, sf_dir):
        import pandas as pd

        from ytspark.operators.pareto import skyline_pareto_parts

        got = {
            r["p_partkey"]
            for r in skyline_pareto_parts(spark, sf_dir).collect()
        }
        p = pd.read_parquet(f"{sf_dir}/part.parquet")
        pts = list(zip(p.p_partkey, p.p_retailprice, p.p_size))
        want = set()
        for k, pr, sz in pts:
            dominated = any(
                (pr2 <= pr and sz2 >= sz and (pr2 < pr or sz2 > sz))
                for _, pr2, sz2 in pts
            )
            if not dominated:
                want.add(k)
        assert got == want

    def test_ties_both_survive(self, spark):
        """Equal (price, size) pairs dominate nothing — both stay."""
        from ytspark.operators.pareto import skyline_pareto_parts  # noqa: F401
        # covered by the bruteforce test when ties exist; assert the
        # semantics directly on a synthetic frame via the same sweep
        from pyspark.sql.window import Window
        import ytspark.operators.pareto as pareto

        df = spark.createDataFrame(
            [(1, 10.0, 5), (2, 10.0, 5), (3, 9.0, 4), (4, 11.0, 6)],
            "p_partkey int, p_retailprice double, p_size int",
        )
        per_price = df.groupBy("p_retailprice").agg(
            F.max("p_size").alias("best_at")
        )
        w = Window.orderBy("p_retailprice")
        tbl = per_price.withColumn(
            "run_max",
            F.max("best_at").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        ).withColumn("best_below", F.lag("run_max").over(w))
        sky = (
            df.join(tbl, "p_retailprice")
            .where(
                (
                    F.col("best_below").isNull()
                    | (F.col("p_size") > F.col("best_below"))
                )
                & (F.col("p_size") == F.col("best_at"))
            )
            .select("p_partkey")
        )
        assert {r["p_partkey"] for r in sky.collect()} == {1, 2, 3, 4}


class TestHllIntersection:
    def test_bounds_and_lattice(self, spark, sf_dir):
        from ytspark.operators.sketch import hll_intersection_bounds

        (r,) = hll_intersection_bounds(spark, sf_dir).collect()
        assert r["estimate_within_bound"] is True
        assert r["exact_both"] <= min(
            r["exact_view_users"], r["exact_purchase_users"]
        )


class TestMarketBasket:
    def test_rules_match_pandas_recompute(self, spark, sf_dir):
        import pandas as pd
        from itertools import combinations
        from collections import Counter

        from ytspark.operators.affinity import (
            MIN_PAIR_SUPPORT,
            RULES_TOP_K,
            market_basket_rules,
        )

        li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
        baskets = li.groupby("l_orderkey").l_partkey.apply(
            lambda s: sorted(set(s))
        )
        n = len(baskets)
        item = Counter()
        pair = Counter()
        for items in baskets:
            item.update(items)
            pair.update(combinations(items, 2))
        rules = []
        for (i, j), nij in pair.items():
            if nij < MIN_PAIR_SUPPORT:
                continue
            for a, c in ((i, j), (j, i)):
                rules.append(
                    (
                        round(nij * n / (item[a] * item[c]), 6),
                        round(nij / n, 6),
                        a,
                        c,
                        nij,
                        item[a],
                        round(nij / item[a], 6),
                    )
                )
        rules.sort(key=lambda r: (-r[0], -r[1], r[2], r[3]))
        want = rules[:RULES_TOP_K]
        got = market_basket_rules(spark, sf_dir).collect()
        assert len(got) == min(RULES_TOP_K, len(rules))
        for g, w in zip(got, want):
            assert (
                g["antecedent"],
                g["consequent"],
                g["n_pair"],
                g["n_ante"],
            ) == (w[2], w[3], w[4], w[5])
            assert abs(g["lift"] - w[0]) < 1e-9
            assert abs(g["confidence"] - w[6]) < 1e-9


class TestFdDiscovery:
    def test_key_fds_hold_and_violations_counted(self, spark, sf_dir):
        import pandas as pd

        from ytspark.operators.profiling import fd_discovery_profile

        rows = {
            (r["tbl"], r["lhs"], r["rhs"]): r
            for r in fd_discovery_profile(spark, sf_dir).collect()
        }
        # key-determined FDs must hold
        assert rows[("orders", "o_orderkey", "o_custkey")]["holds"]
        assert rows[("orders", "o_orderkey", "o_totalprice")]["holds"]
        # recompute one violated candidate exactly
        o = pd.read_parquet(f"{sf_dir}/orders.parquet")
        nd = o.groupby("o_custkey").o_orderpriority.nunique()
        r = rows[("orders", "o_custkey", "o_orderpriority")]
        assert r["n_groups"] == len(nd)
        assert r["n_violating"] == int((nd > 1).sum())
        assert r["holds"] == bool((nd <= 1).all())


class TestSessionPaths:
    def test_paths_match_pandas_recompute(self, spark, sf_dir):
        import pandas as pd

        from ytspark.operators.temporal import (
            PATH_MAX_EVENTS,
            PATH_TOP_K,
            session_path_conversion,
        )

        ev = pd.read_parquet(f"{sf_dir}/events.parquet")
        ev["day"] = ev.ts.dt.normalize()
        ev = ev.sort_values(["user_id", "day", "ts", "event_id"])
        ev["rn"] = ev.groupby(["user_id", "day"]).cumcount() + 1
        kept = ev[ev.rn <= PATH_MAX_EVENTS]
        paths = kept.groupby(["user_id", "day"]).agg(
            path=("event_type", lambda s: ">".join(s)),
            converted=("event_type", lambda s: int((s == "purchase").any())),
        )
        agg = paths.groupby("path").agg(
            n_sessions=("converted", "size"), n_converting=("converted", "sum")
        )
        agg = agg.sort_values(
            ["n_sessions", "path"], ascending=[False, True]
        ).head(PATH_TOP_K)
        got = session_path_conversion(spark, sf_dir).collect()
        assert [(r["path"], r["n_sessions"], r["n_converting"]) for r in got] == [
            (p, int(r.n_sessions), int(r.n_converting))
            for p, r in agg.iterrows()
        ]


class TestLabelCentroids:
    def test_matches_numpy_centroids(self, spark, sf_dir):
        import numpy as np
        import pandas as pd

        from ytspark.operators.clustering import label_centroid_similarity

        emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
        cents = {}
        for lab, sub in emb.groupby("label"):
            m = np.stack(sub.embedding.to_numpy()).astype(np.float64)
            cents[lab] = (m.mean(axis=0), len(sub))
        rows = label_centroid_similarity(spark, sf_dir).collect()
        labels = sorted(cents)
        assert len(rows) == len(labels) * (len(labels) - 1) // 2
        for r in rows:
            ca, na = cents[r["label_a"]]
            cb, nb = cents[r["label_b"]]
            assert (r["n_a"], r["n_b"]) == (na, nb)
            want = float(
                ca @ cb / (np.linalg.norm(ca) * np.linalg.norm(cb))
            )
            assert abs(r["cos_sim"] - want) < 1e-5


class TestIntervalCoverage:
    def test_matches_sequential_merge(self, spark, sf_dir):
        import pandas as pd

        from ytspark.operators.temporal import (
            COVERAGE_TOP_K,
            COVERAGE_WINDOW_S,
            interval_union_coverage,
        )

        ev = pd.read_parquet(f"{sf_dir}/events.parquet")
        ev["day"] = ev.ts.dt.normalize()
        ev["s"] = ev.ts.astype("int64")
        ev["e"] = ev.s + COVERAGE_WINDOW_S * 1_000_000
        per_user = {}
        for (u, _), sub in ev.groupby(["user_id", "day"]):
            spans = sorted(zip(sub.s, sub.e))
            covered, nseg, cur_e = 0, 0, None
            cur_s = None
            for s, e in spans:
                if cur_e is None or s > cur_e:
                    if cur_e is not None:
                        covered += cur_e - cur_s
                    cur_s, cur_e = s, e
                    nseg += 1
                else:
                    cur_e = max(cur_e, e)
            covered += cur_e - cur_s
            acc = per_user.setdefault(u, [0, 0, 0])
            acc[0] += covered
            acc[1] += nseg
            acc[2] += 1
        want = sorted(
            (
                (us // 1_000_000, ns, nd, u)
                for u, (us, ns, nd) in per_user.items()
            ),
            key=lambda t: (-t[0], t[3]),
        )[:COVERAGE_TOP_K]
        got = interval_union_coverage(spark, sf_dir).collect()
        assert [
            (r["active_seconds"], r["n_sessions"], r["n_days"], r["user_id"])
            for r in got
        ] == want


class TestJoinExplosion:
    def test_identity_against_materialized_join(self, spark, sf_dir):
        """sum_k n_k^2 must equal the actual self-join row count."""
        from ytspark.queries.relational import join_explosion_profile

        rows = join_explosion_profile(spark, sf_dir).collect()
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        a = li.select(F.col("l_partkey").alias("k"))
        actual = a.join(a.withColumnRenamed("k", "k2"),
                        F.col("k") == F.col("k2")).count()
        assert rows[0]["join_rows_total"] == actual
        assert rows[0]["input_rows_total"] == li.count()
        for r in rows:
            assert r["contribution"] == r["n_rows"] ** 2


class TestSeasonalDecompose:
    def test_matches_pandas_recompute(self, spark, sf_dir):
        import numpy as np
        import pandas as pd

        from ytspark.operators.timeseries import seasonal_decompose_weekday

        ev = pd.read_parquet(f"{sf_dir}/events.parquet")
        ev["day"] = ev.ts.dt.normalize()
        spine = pd.date_range(ev.day.min(), ev.day.max(), freq="D")
        got = {
            (r["event_type"], r["weekday"]): (r["n_obs"], r["seasonal_idx"])
            for r in seasonal_decompose_weekday(spark, sf_dir).collect()
        }
        for et, sub in ev.groupby("event_type"):
            c = sub.groupby("day").size().reindex(spine, fill_value=0)
            trend = c.rolling(7, center=True).sum() / 7
            detr = (c - trend).dropna()
            for wd, vals in detr.groupby(detr.index.weekday):
                n, idx = got[(et, wd)]
                assert n == len(vals)
                assert abs(idx - vals.mean()) < 1e-5


class TestFdRepair:
    def test_majority_accounting(self, spark, sf_dir):
        import pandas as pd

        from ytspark.operators.profiling import fd_repair_majority

        rows = fd_repair_majority(spark, sf_dir).collect()
        o = pd.read_parquet(f"{sf_dir}/orders.parquet")
        # flips sum = total rows - rows already holding their group's
        # majority value
        kept = 0
        groups = 0
        for _, sub in o.groupby("o_custkey"):
            counts = sub.o_orderpriority.value_counts()
            top = counts.max()
            winners = sorted(counts[counts == top].index)
            kept += counts[winners[0]]
            groups += 1
        assert sum(r["n_groups_won"] for r in rows) == groups
        assert sum(r["n_rows_flipped"] for r in rows) == len(o) - kept


class TestStreamingCms:
    def test_streamed_sketch_equals_batch_sketch(self, spark, sf_dir):
        """Counter addition is exact and order-free, so the streamed
        CMS result must be row-identical to the batch query."""
        from ytspark.operators.sketch import cms_heavy_hitters
        from ytspark.streaming.queries import streaming_cms_heavy_hitters

        got = streaming_cms_heavy_hitters(spark, sf_dir).collect()
        want = cms_heavy_hitters(spark, sf_dir).collect()
        assert [tuple(r) for r in got] == [tuple(r) for r in want]


class TestBigramLm:
    def test_matches_pandas_recompute(self, spark, sf_dir):
        import math
        from collections import Counter

        import pandas as pd

        from ytspark.operators.text import (
            LM_SMOOTH_K,
            LM_TOP_K,
            bigram_lm_perplexity,
        )

        docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
        bi_by_doc = {}
        bc, uc, vocab = Counter(), Counter(), set()
        for _, r in docs.iterrows():
            ws = r.text.split(" ")
            vocab.update(ws)
            pairs = list(zip(ws, ws[1:]))
            bi_by_doc[r.doc_id] = pairs
            bc.update(pairs)
            uc.update(w for w, _ in pairs)
        vs = len(vocab)
        want = []
        for d, pairs in bi_by_doc.items():
            if not pairs:
                continue
            nll = -sum(
                math.log(
                    (bc[p] + LM_SMOOTH_K) / (uc[p[0]] + LM_SMOOTH_K * vs)
                )
                for p in pairs
            ) / len(pairs)
            want.append((round(nll, 6), d, len(pairs)))
        want.sort()
        got = bigram_lm_perplexity(spark, sf_dir).collect()
        assert len(got) == min(LM_TOP_K, len(want))
        for g, w in zip(got, want):
            assert g["doc_id"] == w[1]
            assert g["n_bigrams"] == w[2]
            assert abs(g["nll_per_bigram"] - w[0]) < 1e-5


class TestCategoricalAssociation:
    def test_matches_scipy_free_recompute(self, spark, sf_dir):
        import math

        import pandas as pd

        from ytspark.operators.profiling import (
            ASSOC_PAIRS,
            categorical_association_battery,
        )

        rows = {
            (r["col_a"], r["col_b"]): r
            for r in categorical_association_battery(spark, sf_dir).collect()
        }
        for table, ca, cb in ASSOC_PAIRS:
            df = pd.read_parquet(f"{sf_dir}/{table}.parquet")
            ct = pd.crosstab(df[ca], df[cb])
            n = ct.to_numpy().sum()
            chi2 = 0.0
            mi = 0.0
            rowm = ct.sum(axis=1)
            colm = ct.sum(axis=0)
            for a in ct.index:
                for b in ct.columns:
                    o = ct.loc[a, b]
                    e = rowm[a] * colm[b] / n
                    chi2 += (o - e) ** 2 / e
                    if o > 0:
                        mi += o / n * math.log(o * n / (rowm[a] * colm[b]))
            r = rows[(ca, cb)]
            assert r["n"] == n
            assert r["dof"] == (len(ct.index) - 1) * (len(ct.columns) - 1)
            assert abs(r["chi2"] - chi2) < 1e-3
            v = math.sqrt(
                chi2 / (n * min(len(ct.index) - 1, len(ct.columns) - 1))
            )
            assert abs(r["cramers_v"] - v) < 1e-6
            assert abs(r["mi"] - mi) < 1e-6


class TestModularity:
    def test_contributions_sum_to_newman_q(self, spark, sf_dir):
        """Sum of per-brand contributions must equal Newman's Q
        computed by a networkx-free recompute, and intra edges can
        never exceed total degree / 2."""
        import pandas as pd
        from collections import Counter
        from itertools import combinations

        from ytspark.operators.graph import graph_modularity_brands

        rows = graph_modularity_brands(spark, sf_dir).collect()
        li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
        part = pd.read_parquet(f"{sf_dir}/part.parquet")
        brand = dict(zip(part.p_partkey, part.p_brand))
        edges = set()
        for _, sub in li.groupby("l_orderkey"):
            for x, y in combinations(sorted(set(sub.l_partkey)), 2):
                edges.add((x, y))
        m = len(edges)
        e_in, d = Counter(), Counter()
        for x, y in edges:
            bx, by = brand[x], brand[y]
            d[bx] += 1
            d[by] += 1
            if bx == by:
                e_in[bx] += 1
        q = sum(
            e_in[b] / m - (d[b] / (2 * m)) ** 2 for b in d
        )
        got_q = sum(r["modularity_contrib"] for r in rows)
        assert abs(got_q - q) < 1e-4
        for r in rows:
            assert r["intra_edges"] * 2 <= r["total_degree"]
            assert r["intra_edges"] == e_in[r["brand"]]


class TestTokenBucket:
    def test_matches_sequential_replay(self, spark, sf_dir):
        import math

        import pandas as pd

        from ytspark.operators.timeseries import (
            BUCKET_CAP_U,
            BUCKET_TOKEN_U,
            rate_limit_token_bucket,
        )

        ev = pd.read_parquet(f"{sf_dir}/events.parquet").dropna(
            subset=["value"]
        )
        ev["t"] = ev.ts.astype("int64")
        ev["cost"] = (ev.value * BUCKET_TOKEN_U).apply(math.floor)
        got = {
            r["user_id"]: (
                r["n_events"],
                r["n_accepted"],
                r["n_rejected"],
                r["tokens_left_u"],
            )
            for r in rate_limit_token_bucket(spark, sf_dir).collect()
        }
        rejected_total = 0
        for u, sub in ev.groupby("user_id"):
            sub = sub.sort_values(["ts", "event_id"])
            tok, acc, rej, prev_t = BUCKET_CAP_U, 0, 0, None
            for _, r in sub.iterrows():
                if prev_t is not None:
                    tok = min(BUCKET_CAP_U, tok + (r.t - prev_t))
                if r.cost <= tok:
                    tok -= r.cost
                    acc += 1
                else:
                    rej += 1
                prev_t = r.t
            assert got[u] == (len(sub), acc, rej, tok), u
            rejected_total += rej
        assert rejected_total > 0  # the limiter actually bites


class TestSequencePattern:
    def test_matches_python_regex_replay(self, spark, sf_dir):
        import re

        import pandas as pd

        from ytspark.operators.temporal import (
            SEQPAT_GAPPED,
            SEQPAT_STRICT,
            SEQPAT_TOP_K,
            sequence_pattern_funnel,
        )

        ev = pd.read_parquet(f"{sf_dir}/events.parquet")
        ev["day"] = ev.ts.dt.normalize()
        ev = ev.sort_values(["user_id", "day", "ts", "event_id"])
        ev["ch"] = ev.event_type.str[0]
        per_user = {}
        for (u, _), sub in ev.groupby(["user_id", "day"]):
            path = "".join(sub.ch)
            strict = len(re.findall(SEQPAT_STRICT, path))
            gapped = int(re.search(SEQPAT_GAPPED, path) is not None)
            a = per_user.setdefault(u, [0, 0, 0])
            a[0] += strict
            a[1] += gapped
            a[2] += 1
        want = sorted(
            ((v[0], u, v[1], v[2]) for u, v in per_user.items()),
            key=lambda t: (-t[0], t[1]),
        )[:SEQPAT_TOP_K]
        got = sequence_pattern_funnel(spark, sf_dir).collect()
        assert [
            (r["strict_matches"], r["user_id"], r["days_with_funnel"], r["n_days"])
            for r in got
        ] == want


class TestFunnelLatency:
    def test_matches_numpy_percentiles(self, spark, sf_dir):
        import numpy as np
        import pandas as pd

        from ytspark.operators.temporal import funnel_latency_percentiles

        (r,) = funnel_latency_percentiles(spark, sf_dir).collect()
        ev = pd.read_parquet(f"{sf_dir}/events.parquet")
        p = ev[ev.event_type == "purchase"]
        v = ev[ev.event_type == "view"].sort_values("ts")
        gaps = []
        n_purch = len(p)
        vt = v.groupby("user_id").ts.apply(lambda s: s.values)
        for _, row in p.iterrows():
            arr = vt.get(row.user_id)
            if arr is None:
                continue
            idx = np.searchsorted(arr, np.datetime64(row.ts), side="right") - 1
            if idx >= 0:
                gaps.append(
                    (np.datetime64(row.ts) - arr[idx])
                    .astype("timedelta64[us]")
                    .astype("int64")
                )
        gaps = np.array(gaps)
        assert r["n_purchases"] == n_purch
        assert r["n_matched"] == len(gaps)
        assert r["max_gap_us"] == int(gaps.max())
        for q, col, den in (
            (0.5, "p50_us_x2", 2),
            (0.9, "p90_us_x10", 10),
            (0.99, "p99_us_x100", 100),
        ):
            # den-scaled interpolated quantile is an exact integer
            want = float(np.quantile(gaps, q, method="linear")) * den
            assert r[col] == int(round(want))


class TestGroupedOls:
    def test_matches_numpy_polyfit(self, spark, sf_dir):
        import numpy as np
        import pandas as pd

        from ytspark.operators.learn import trend_by_priority_ols

        o = pd.read_parquet(f"{sf_dir}/orders.parquet")
        o["x"] = (o.o_orderdate - pd.Timestamp("1992-01-01")).dt.days
        daily = (
            o.groupby(["o_orderpriority", "x"]).o_totalprice.sum() / 1e6
        ).reset_index()
        rows = {r["pri"]: r for r in trend_by_priority_ols(spark, sf_dir).collect()}
        for pri, sub in daily.groupby("o_orderpriority"):
            m, b = np.polyfit(sub.x, sub.o_totalprice, 1)
            r = rows[pri]
            assert r["n_days"] == len(sub)
            assert abs(r["slope_m_per_day"] - m) < 1e-4
            assert abs(r["intercept_m"] - b) < 1e-3
            assert 0.0 <= r["r2"] <= 1.0


class TestWau:
    def test_matches_pandas_rolling_distinct(self, spark, sf_dir):
        import pandas as pd

        from ytspark.queries.relational import sliding_distinct_users_7d

        ev = pd.read_parquet(f"{sf_dir}/events.parquet")
        ev["day"] = ev.ts.dt.normalize()
        ud = ev[["user_id", "day"]].drop_duplicates()
        got = {
            pd.Timestamp(r["day"]): (r["wau"], r["dau"])
            for r in sliding_distinct_users_7d(spark, sf_dir).collect()
        }
        for d in ud.day.unique():
            d = pd.Timestamp(d)
            wau = ud[(ud.day <= d) & (ud.day > d - pd.Timedelta(days=7))][
                "user_id"
            ].nunique()
            dau = ud[ud.day == d]["user_id"].nunique()
            assert got[d] == (wau, dau), d


class TestRiAudit:
    def test_clean_schema_and_orphan_detection(self, spark, sf_dir):
        from ytspark.queries.relational import referential_integrity_audit

        rows = referential_integrity_audit(spark, sf_dir).collect()
        assert len(rows) == 7
        # the generated star schema is referentially intact
        for r in rows:
            assert r["intact"] and r["n_orphans"] == 0
        # the check itself detects orphans: corrupt one FK in memory
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(100)
        bad = li.withColumn(
            "l_partkey", F.col("l_partkey") + F.lit(10_000_000)
        )
        part = spark.read.parquet(f"{sf_dir}/part.parquet")
        n_orph = bad.join(
            part.select("p_partkey"),
            bad.l_partkey == F.col("p_partkey"),
            "left_anti",
        ).count()
        assert n_orph == 100


class TestVocabOverlap:
    def test_matches_python_set_jaccard(self, spark, sf_dir):
        import pandas as pd

        from ytspark.operators.text import source_vocab_overlap

        docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
        vocab = {
            s: set(" ".join(sub.text).split(" "))
            for s, sub in docs.groupby("source")
        }
        rows = source_vocab_overlap(spark, sf_dir).collect()
        srcs = sorted(vocab)
        assert len(rows) == len(srcs) * (len(srcs) - 1) // 2
        for r in rows:
            va, vb = vocab[r["source_a"]], vocab[r["source_b"]]
            inter = len(va & vb)
            assert (r["vocab_a"], r["vocab_b"], r["vocab_shared"]) == (
                len(va),
                len(vb),
                inter,
            )
            assert abs(r["jaccard"] - inter / len(va | vb)) < 1e-6


class TestSeasonalAnomalies:
    def test_matches_pandas_pipeline(self, spark, sf_dir):
        import numpy as np
        import pandas as pd

        from ytspark.operators.timeseries import (
            ANOM_TOP_K,
            ANOM_Z,
            seasonal_adjusted_anomalies,
        )

        ev = pd.read_parquet(f"{sf_dir}/events.parquet")
        ev["day"] = ev.ts.dt.normalize()
        spine = pd.date_range(ev.day.min(), ev.day.max(), freq="D")
        cand = []
        for et, sub in ev.groupby("event_type"):
            c = sub.groupby("day").size().reindex(spine, fill_value=0)
            trend = c.rolling(7, center=True).sum() / 7
            dv = (c - trend).dropna()
            sidx = dv.groupby(dv.index.weekday).transform("mean")
            r = dv - sidx
            sigma = r.std(ddof=1)
            z = r / sigma
            for d, zz in z.items():
                cand.append((round(zz, 6), et, d, int(c[d])))
        cand.sort(key=lambda t: (-abs(t[0]), t[1], t[2]))
        want = cand[:ANOM_TOP_K]
        got = seasonal_adjusted_anomalies(spark, sf_dir).collect()
        assert len(got) == len(want)
        for g, w in zip(got, want):
            assert (g["event_type"], pd.Timestamp(g["anomaly_day"]), g["n_events"]) == (
                w[1],
                w[2],
                w[3],
            )
            assert abs(g["resid_z"] - w[0]) < 1e-5
            assert g["is_anomaly"] == (abs(w[0]) > ANOM_Z)


class TestBenford:
    def test_digit_extraction_and_chi2(self, spark, sf_dir):
        import math
        from collections import Counter

        import pandas as pd

        from ytspark.operators.profiling import benford_digit_audit

        o = pd.read_parquet(f"{sf_dir}/orders.parquet")
        digits = Counter(
            str(round(v, 2))[0] for v in o.o_totalprice if v > 0
        )
        total = sum(digits.values())
        rows = {r["digit"]: r for r in benford_digit_audit(spark, sf_dir).collect()}
        assert sum(r["n_orders"] for r in rows.values()) == total
        for d, n in digits.items():
            r = rows[int(d)]
            assert r["n_orders"] == n
            p = math.log10(1 + 1 / int(d))
            assert abs(r["benford_p"] - p) < 1e-6
            assert abs(
                r["chi2_term"] - (n / total - p) ** 2 / p * total
            ) < 1e-3


class TestStateDuration:
    def test_matches_pandas_lag_attribution(self, spark, sf_dir):
        import pandas as pd

        from ytspark.operators.temporal import state_duration_accounting

        ev = pd.read_parquet(f"{sf_dir}/events.parquet")
        ev = ev.sort_values(["user_id", "ts", "event_id"])
        ev["t"] = ev.ts.astype("int64")
        ev["next_t"] = ev.groupby("user_id").t.shift(-1)
        ev = ev.dropna(subset=["next_t"])
        ev["dur"] = (ev.next_t - ev.t).astype("int64")
        got = {
            r["state"]: (r["n_intervals"], r["total_seconds"], r["mean_interval_us"])
            for r in state_duration_accounting(spark, sf_dir).collect()
        }
        for st, sub in ev.groupby("event_type"):
            total = int(sub.dur.sum())
            assert got[st] == (
                len(sub),
                total // 1_000_000,
                total // len(sub),
            )


class TestBpeEncode:
    def test_matches_reference_bpe_implementation(self, spark, sf_dir):
        """Train + encode must match a from-scratch python BPE."""
        from collections import Counter

        import pandas as pd

        from ytspark.operators.bpe import N_MERGES, bpe_encode_stats

        docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
        vocab = Counter()
        for t in docs.text:
            vocab.update(t.split(" "))
        words = {w: list(w) for w in vocab}
        for _ in range(N_MERGES):
            pairs = Counter()
            for w, syms in words.items():
                f = vocab[w]
                for a, b in zip(syms, syms[1:]):
                    pairs[(a, b)] += f
            (l, r), _c = min(
                pairs.items(), key=lambda kv: (-kv[1], kv[0])
            )
            for w, syms in words.items():
                out = []
                for x in syms:
                    if out and out[-1] == l and x == r:
                        out[-1] = l + r
                    else:
                        out.append(x)
                words[w] = out
        per_source = {}
        for _, row in docs.iterrows():
            a = per_source.setdefault(row.source, [0, 0, 0])
            for w in row.text.split(" "):
                a[0] += 1
                a[1] += len(words[w])
                a[2] += len(w)
        rows = bpe_encode_stats(spark, sf_dir).collect()
        for r in rows:
            want = per_source[r["source"]]
            assert (r["n_tokens"], r["n_symbols"], r["n_chars"]) == tuple(
                want
            )
            assert abs(
                r["chars_per_symbol"] - want[2] / want[1]
            ) < 1e-6


class TestFuzzyErClusters:
    def test_matches_union_find_over_bruteforce_pairs(self, spark, sf_dir):
        import pandas as pd

        from ytspark.operators.fuzzy import MAX_EDIT, fuzzy_er_clusters

        def lev1(a, b):
            if a == b:
                return 0
            la, lb = len(a), len(b)
            if abs(la - lb) > MAX_EDIT:
                return 99
            if la == lb:
                return sum(x != y for x, y in zip(a, b))
            if la > lb:
                a, b, la, lb = b, a, lb, la
            # one insertion: skip exactly one char of b
            i = 0
            while i < la and a[i] == b[i]:
                i += 1
            return 1 if a[i:] == b[i + 1:] else 99

        cust = pd.read_parquet(f"{sf_dir}/customer.parquet")
        parent = {k: k for k in cust.c_custkey}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for _, sub in cust.groupby("c_nationkey"):
            recs = list(zip(sub.c_custkey, sub.c_name))
            for i in range(len(recs)):
                for j in range(i + 1, len(recs)):
                    if lev1(recs[i][1], recs[j][1]) <= MAX_EDIT:
                        ra, rb = find(recs[i][0]), find(recs[j][0])
                        if ra != rb:
                            parent[max(ra, rb)] = min(ra, rb)
        from collections import Counter

        nat = dict(zip(cust.c_custkey, cust.c_nationkey))
        sizes = Counter(find(k) for k in cust.c_custkey)
        want = {
            (nat[root], root): n for root, n in sizes.items() if n >= 2
        }
        got = {
            (r["nation"], r["entity_id"]): r["n_members"]
            for r in fuzzy_er_clusters(spark, sf_dir).collect()
        }
        assert got == want
