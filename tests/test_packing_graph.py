"""Unit tests for the training-set-assembly and graph operators.

The registered queries are value-checked against DuckDB by
tools/oracle_check.py; these tests pin the operator INVARIANTS the
oracle comparison can't express — packing feasibility, permutation
properties, and PageRank against an independent numpy power iteration.
"""

from __future__ import annotations

import numpy as np
import pytest

from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from ytspark.operators.graph import PR_DAMPING, PR_ITERS, pagerank
from ytspark.operators.packing import (
    PACK_BUDGET,
    corpus_global_shuffle,
    corpus_mixture_upsample,
    greedy_pack_bins,
    sequence_pack_blocks,
    sequence_pack_greedy,
)


class TestGreedyPackKernel:
    """Pure-function walk shared by the Spark kernel; no session needed."""

    @given(
        st.lists(st.integers(min_value=1, max_value=300), max_size=200),
        st.integers(min_value=1, max_value=500),
    )
    @settings(max_examples=300, deadline=None)
    def test_against_independent_reference(self, toks, budget):
        got = greedy_pack_bins(toks, budget)

        # independent reference: explicit per-document assignment
        assignments = []
        fill = None
        for t in toks:
            if fill is None or fill + t > budget:
                assignments.append([t])
                fill = t
            else:
                assignments[-1].append(t)
                fill += t
        expected = [
            (i, len(b), sum(b), sum(1 for t in b if t > budget))
            for i, b in enumerate(b for b in assignments)
        ]
        assert got == expected

    @given(st.lists(st.integers(min_value=1, max_value=100), max_size=100))
    @settings(max_examples=100, deadline=None)
    def test_invariants(self, toks):
        bins = greedy_pack_bins(toks, 64)
        assert sum(b[1] for b in bins) == len(toks)
        assert sum(b[2] for b in bins) == sum(toks)
        for bin_id, n_docs, fill, oversize in bins:
            assert n_docs >= 1
            if fill > 64:
                # only an oversize doc overflows, and it sits alone
                assert n_docs == 1 and oversize == 1
        assert [b[0] for b in bins] == list(range(len(bins)))


class TestSequencePacking:
    def test_greedy_bins_respect_budget(self, spark, sf_dir):
        rows = sequence_pack_greedy(spark, sf_dir).collect()
        assert rows
        for r in rows:
            # a bin only exceeds the budget when it holds an oversized
            # document — and then it holds exactly that document
            if r.fill_tokens > PACK_BUDGET:
                assert r.n_oversize >= 1

    def test_greedy_and_blocks_conserve_documents_and_tokens(
        self, spark, sf_dir
    ):
        greedy = sequence_pack_greedy(spark, sf_dir).agg(
            F.sum("n_docs").alias("d"), F.sum("fill_tokens").alias("t")
        ).first()
        blocks = sequence_pack_blocks(spark, sf_dir).agg(
            F.sum("n_docs").alias("d"), F.sum("tokens_started").alias("t")
        ).first()
        # both packings partition the same corpus: identical totals
        assert greedy.d == blocks.d
        assert greedy.t == blocks.t

    def test_greedy_bins_are_dense_per_group(self, spark, sf_dir):
        df = sequence_pack_greedy(spark, sf_dir)
        per_g = (
            df.groupBy("g")
            .agg(F.min("bin").alias("lo"), F.max("bin").alias("hi"),
                 F.count(F.lit(1)).alias("n"))
            .collect()
        )
        for r in per_g:
            assert r.lo == 0
            assert r.hi == r.n - 1  # bins 0..n-1, no gaps


class TestGlobalShuffle:
    def test_rank_is_a_permutation(self, spark, sf_dir):
        df = corpus_global_shuffle(spark, sf_dir)
        n = df.count()
        stats = df.agg(
            F.countDistinct("shuffle_rank").alias("d"),
            F.min("shuffle_rank").alias("lo"),
            F.max("shuffle_rank").alias("hi"),
        ).first()
        assert (stats.d, stats.lo, stats.hi) == (n, 1, n)

    def test_rank_orders_by_hash_then_key(self, spark, sf_dir):
        rows = corpus_global_shuffle(spark, sf_dir).orderBy("shuffle_rank").collect()
        keys = [(r.hv, r.doc_id) for r in rows]
        assert keys == sorted(keys)

    def test_no_single_partition_global_sort(self, spark, sf_dir):
        # the per-document rank must come from bucket offsets + a
        # window PARTITIONED BY bucket; a naive global row_number would
        # show an unpartitioned window spec over the full input. (The
        # offsets window runs over the SHUFFLE_BUCKETS-row aggregate —
        # bounded by construction.)
        plan = (
            corpus_global_shuffle(spark, sf_dir)
            ._jdf.queryExecution()
            .optimizedPlan()
            .toString()
        )
        rn_lines = [ln for ln in plan.splitlines() if "row_number" in ln]
        assert rn_lines, plan
        for ln in rn_lines:
            assert "bucket" in ln, ln


class TestMixtureUpsample:
    def test_copy_counts_match_weights(self, spark, sf_dir):
        rows = {r.source: r for r in corpus_mixture_upsample(spark, sf_dir).collect()}
        for source, r in rows.items():
            idx = int(source[3:])
            w = 0.5 + (idx % 4) * 0.75
            lo, hi = int(np.floor(w)) * r.n_docs_in, int(np.ceil(w)) * r.n_docs_in
            assert lo <= r.n_docs_out <= hi, (source, w, r)
            if w == int(w):  # integer weight: exact replication
                assert r.n_docs_out == int(w) * r.n_docs_in

    def test_deterministic_across_runs(self, spark, sf_dir):
        a = sorted(map(tuple, corpus_mixture_upsample(spark, sf_dir).collect()))
        b = sorted(map(tuple, corpus_mixture_upsample(spark, sf_dir).collect()))
        assert a == b


class TestPageRank:
    @pytest.fixture(scope="class")
    def random_graph(self, spark):
        rng = np.random.default_rng(42)
        n_nodes, n_edges = 200, 2000
        src = rng.integers(0, n_nodes, n_edges)
        dst = rng.integers(0, n_nodes, n_edges)
        w = rng.integers(1, 10, n_edges)
        edges = spark.createDataFrame(
            [(int(s), int(d), int(x)) for s, d, x in zip(src, dst, w)],
            "src long, dst long, w long",
        )
        return edges, src, dst, w

    def test_matches_numpy_power_iteration(self, spark, random_graph):
        edges, src, dst, w = random_graph
        got = {r.node: r.pr for r in pagerank(edges, weight="w").collect()}

        # independent dense reference implementation
        nodes = sorted(set(src.tolist()) | set(dst.tolist()))
        idx = {v: i for i, v in enumerate(nodes)}
        n = len(nodes)
        M = np.zeros((n, n))
        agg: dict[tuple[int, int], float] = {}
        for s, d, x in zip(src, dst, w):
            agg[(idx[s], idx[d])] = agg.get((idx[s], idx[d]), 0.0) + float(x)
        outw = np.zeros(n)
        for (i, j), x in agg.items():
            outw[i] += x
        for (i, j), x in agg.items():
            M[j, i] = x / outw[i]
        pr = np.full(n, 1.0 / n)
        for _ in range(PR_ITERS):
            pr = (1 - PR_DAMPING) / n + PR_DAMPING * (M @ pr)

        assert len(got) == n
        for v, i in idx.items():
            assert got[v] == pytest.approx(pr[i], abs=1e-7)

    def test_uniform_on_symmetric_cycle(self, spark):
        # a directed cycle is doubly stochastic: PageRank stays uniform
        n = 6
        edges = spark.createDataFrame(
            [(i, (i + 1) % n) for i in range(n)], "src long, dst long"
        )
        rows = pagerank(edges).collect()
        assert len(rows) == n
        for r in rows:
            # scores are rounded to PR_ROUND=8 decimals by design
            assert r.pr == pytest.approx(1.0 / n, abs=1e-8)

    def test_sink_heavy_node_ranks_highest(self, spark):
        # star graph: everything points at node 0
        edges = spark.createDataFrame(
            [(i, 0) for i in range(1, 8)], "src long, dst long"
        )
        rows = {r.node: r.pr for r in pagerank(edges).collect()}
        assert rows[0] == max(rows.values())


class TestPointerDoubling:
    def test_all_nodes_resolve_to_forest_roots(self, spark, sf_dir):
        from ytspark.operators.graph import (
            HIER_ROOT_LIMIT,
            hierarchy_pointer_doubling,
        )

        out = hierarchy_pointer_doubling(spark, sf_dir).toPandas()
        n_cust = spark.read.parquet(f"{sf_dir}/customer.parquet").count()
        # every customer resolved exactly once, every root is a root
        assert int(out["n_nodes"].sum()) == n_cust
        assert (out["root"] < HIER_ROOT_LIMIT).all()
        # depth of node k under parent(k)=k div 2 is known in closed
        # form: halvings until < HIER_ROOT_LIMIT
        import math

        max_key = n_cust  # custkeys are 1..n
        expect_max_depth = 0
        k = max_key
        while k >= HIER_ROOT_LIMIT:
            k //= 2
            expect_max_depth += 1
        assert int(out["depth"].max()) == expect_max_depth
        # and the log-round budget genuinely covers it
        from ytspark.operators.graph import PD_ROUNDS

        assert expect_max_depth <= 2 ** PD_ROUNDS
