"""Unit tests for the table-maintenance operators (CDC changelog apply,
SCD-2 compaction, incremental rollup merge).

These pin the *semantics* on tiny hand-built frames where the expected
answer is computable by eye; the registered queries are additionally
value-certified against DuckDB full-recompute oracles by
tools/oracle_check.py / the driver gate.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from ytspark.operators.maintenance import (
    apply_changelog,
    merge_rollup,
    scd2_compact,
)


def _rows(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


class TestApplyChangelog:
    def test_latest_wins_and_deletes_drop(self, spark):
        log = spark.createDataFrame(
            [
                # key 1: U then U — latest value survives
                (1, 1, "U", "a"),
                (1, 2, "U", "b"),
                # key 2: U then D — dropped entirely
                (2, 1, "U", "x"),
                (2, 2, "D", "x"),
                # key 3: D then U — delete is NOT latest, so key survives
                (3, 1, "D", "y"),
                (3, 2, "U", "z"),
            ],
            "k int, seq int, op string, v string",
        )
        out = apply_changelog(log, key=["k"], seq=["seq"])
        assert _rows(out, "k", "n_ops", "v") == [(1, 2, "b"), (3, 2, "z")]
        # op column is consumed, not emitted
        assert "op" not in out.columns

    def test_seq_tiebreak_uses_all_columns(self, spark):
        log = spark.createDataFrame(
            [(1, 5, 1, "U", "lo"), (1, 5, 2, "U", "hi")],
            "k int, ts int, sub int, op string, v string",
        )
        out = apply_changelog(log, key=["k"], seq=["ts", "sub"])
        assert _rows(out, "v") == [("hi",)]

    def test_plan_is_single_aggregate_no_window(self, spark):
        """The changelog collapse must be a map-side-combinable aggregate
        (partial HashAggregate before the shuffle), not a window sort."""
        log = spark.createDataFrame(
            [(1, 1, "U", "a")], "k int, seq int, op string, v string"
        )
        plan = (
            apply_changelog(log, key=["k"], seq=["seq"])
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Window" not in plan
        assert plan.count("ObjectHashAggregate") + plan.count(
            "HashAggregate"
        ) + plan.count("SortAggregate") >= 2  # partial + final


class TestChangelogStateMerge:
    def test_merge_equals_whole_log_collapse_any_slicing(self, spark):
        """The streaming foundation: collapsed slices merged in ANY
        grouping/order must equal collapsing the whole log at once —
        including a delete in one slice resurrected by a later upsert
        in another (tombstones carry their op counts through)."""
        from ytspark.operators.maintenance import (
            collapse_changelog,
            merge_changelog_states,
        )

        rows = [
            (1, 1, "U", "a"),
            (1, 2, "D", "a"),  # delete in slice 1...
            (1, 3, "U", "c"),  # ...resurrected in slice 2: n_ops = 3
            (2, 1, "U", "x"),
            (2, 4, "D", "x"),  # delete stays latest -> tombstoned
            (3, 9, "U", "z"),
        ]
        schema = "k int, seq int, op string, v string"
        whole = collapse_changelog(
            spark.createDataFrame(rows, schema), ["k"], ["seq"]
        )

        def merged(slices):
            parts = [
                collapse_changelog(
                    spark.createDataFrame(s, schema), ["k"], ["seq"]
                )
                for s in slices
            ]
            out = parts[0]
            for p in parts[1:]:
                out = merge_changelog_states(out, p, ["k"], ["seq"])
            return out

        def snap(df):
            return sorted(
                (r["k"], r["n_ops"], r["_last"]["op"], r["_last"]["v"])
                for r in df.collect()
            )

        expect = snap(whole)
        # two different slicings, one of them out of seq order
        assert snap(merged([rows[:2], rows[2:4], rows[4:]])) == expect
        assert snap(merged([rows[4:], rows[2:4], rows[:2]])) == expect
        # key 2's tombstone is IN the merged state (op 'D', n_ops 2)
        # but would drop at the final delete filter
        assert (2, 2, "D", "x") in expect
        assert 2 not in {r[0] for r in expect if r[2] != "D"}


class TestScd2Compact:
    def test_regimes_effective_dating(self, spark):
        hist = spark.createDataFrame(
            [
                (1, "A", 10),
                (1, "A", 11),  # no change — folded into first regime
                (1, "B", 12),
                (1, "A", 13),  # back to A — NEW regime, not merged
                (2, "Z", 10),
            ],
            "k int, status string, d int",
        )
        out = scd2_compact(
            hist, key=["k"], attr="status", seq=["d"], effective_col="d"
        )
        got = _rows(out, "k", "status", "effective_from", "effective_to", "is_current")
        assert got == [
            (1, "A", 10, 12, False),
            (1, "A", 13, None, True),
            (1, "B", 12, 13, False),
            (2, "Z", 10, None, True),
        ]

    def test_single_shuffle_single_sort(self, spark):
        """lag + lead share one window spec → exactly one exchange and
        one sort in the physical plan."""
        hist = spark.createDataFrame([(1, "A", 10)], "k int, status string, d int")
        plan = (
            scd2_compact(hist, key=["k"], attr="status", seq=["d"], effective_col="d")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("Exchange") == 1
        assert plan.count("Sort ") + plan.count("Sort\n") <= 2  # one logical sort (AQE may re-print)


class TestScd2Properties:
    @settings(max_examples=20, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.integers(1, 3),  # key
                st.sampled_from("AB"),  # attr
                st.integers(0, 9),  # seq/effective
            ),
            min_size=1,
            max_size=12,
        )
    )
    def test_matches_sequential_reference(self, spark, rows):
        """scd2_compact must equal a straight sequential walk: sort
        each key's history, open a regime on every attr change, close
        it at the next regime's start."""
        from ytspark.operators.maintenance import scd2_compact

        # unique seq per key: dedupe (k, d) keeping first occurrence
        seen, uniq = set(), []
        for k, a, d in rows:
            if (k, d) not in seen:
                seen.add((k, d))
                uniq.append((k, a, d))
        expect = []
        for k in sorted({k for k, _, _ in uniq}):
            hist = sorted(
                [(d, a) for kk, a, d in uniq if kk == k]
            )
            regimes = []
            for d, a in hist:
                if not regimes or regimes[-1][1] != a:
                    regimes.append([d, a])
            for i, (d, a) in enumerate(regimes):
                nxt = regimes[i + 1][0] if i + 1 < len(regimes) else None
                expect.append((k, a, d, nxt, nxt is None))

        df = spark.createDataFrame(uniq, "k int, status string, d int")
        got = sorted(
            tuple(r)
            for r in scd2_compact(
                df, key=["k"], attr="status", seq=["d"], effective_col="d"
            )
            .select("k", "status", "effective_from", "effective_to", "is_current")
            .collect()
        )
        assert got == sorted(expect)


class TestMergeRollup:
    def test_base_plus_delta_equals_full(self, spark, sf_dir):
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        cut = F.lit("1995-01-01").cast("timestamp")

        def roll(df):
            return df.groupBy(
                F.date_trunc("day", "o_orderdate").alias("d")
            ).agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("tp"),
            )

        merged = merge_rollup(
            roll(orders.where(F.col("o_orderdate") < cut)),
            roll(orders.where(F.col("o_orderdate") >= cut)),
            keys=["d"],
            sums=["n", "tp"],
            # decimal division scale depends on operand precision, which
            # the extra sum-of-sums widens — divide in double instead
            derived={"avg": F.col("tp").cast("double") / F.col("n")},
        )
        full = roll(orders).withColumn(
            "avg", F.col("tp").cast("double") / F.col("n")
        )
        assert _rows(merged, "d", "n", "tp", "avg") == _rows(
            full, "d", "n", "tp", "avg"
        )

    def test_disjoint_and_overlapping_keys(self, spark):
        base = spark.createDataFrame([("a", 2, 10.0), ("b", 1, 5.0)], "k string, n long, s double")
        delta = spark.createDataFrame([("b", 3, 7.0), ("c", 1, 1.0)], "k string, n long, s double")
        out = merge_rollup(base, delta, keys=["k"], sums=["n", "s"])
        assert _rows(out, "k", "n", "s") == [
            ("a", 2, 10.0),
            ("b", 4, 12.0),
            ("c", 1, 1.0),
        ]
