"""Pins the driver contract (__spark_entry__): the three functions, the
registry's shape, and the invariants the correctness gate relies on."""

from __future__ import annotations

import importlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _entry_module():
    return importlib.import_module("__spark_entry__")


def test_contract_functions_exist_and_align():
    m = _entry_module()
    qs = m.queries()
    oracles = m.oracle_sql()
    assert len(qs) >= 100
    assert set(oracles) <= set(qs)  # every oracle belongs to a query
    assert all(callable(fn) for fn in qs.values())
    assert all(isinstance(sql, str) and sql.strip() for sql in oracles.values())
    # r12 closed the last rows-only gap: the three xxhash64-keyed
    # MinHash/SimHash production variants were re-keyed on the
    # md5-derived portable_hash64 (as strongly mixed, DuckDB-exact) and
    # given full replay oracles — every registered query is now
    # hash-gated. Keep it that way: a new rows-only registration needs
    # a documented reason here, not a silent set-membership change.
    rows_only = set(qs) - set(oracles)
    assert rows_only == set(), sorted(rows_only)


def test_registry_docs_and_tags_complete():
    from ytspark.queries import registry

    for name, q in registry().items():
        assert q.doc, f"{name} has no doc"
        assert q.tags, f"{name} has no tags"


def test_entry_returns_nonempty_dataframe(spark):
    m = _entry_module()
    df = m.entry(spark)
    assert df.count() > 0
    assert len(df.columns) > 0


def test_bench_covers_full_registry():
    """r5 VERDICT item 5: the bench list must equal the registry —
    every registered query gets an sf0.1 timing each round, no silent
    n_queries < len(registry()) gaps."""
    import bench
    from ytspark.queries import registry

    reg = registry()
    names = bench.bench_names(reg)
    assert len(names) == len(reg)
    assert set(names) == set(reg)
    assert len(set(names)) == len(names)  # no duplicates double-timed


def test_committed_inventory_matches_registry():
    """r5 VERDICT item 4: the committed QUERIES.md must be regenerated
    after the last registration — its row count equals the registry."""
    from ytspark.queries import registry

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "QUERIES.md")
    with open(path) as fh:
        n_rows = sum(1 for line in fh if line.startswith("| `"))
    assert n_rows == len(registry()), (
        f"QUERIES.md lists {n_rows} queries but the registry holds "
        f"{len(registry())} — rerun tools/gen_query_inventory.py"
    )


def test_committed_oracle_local_matches_registry():
    """Round-6 freshness contract, the ORACLE_LOCAL counterpart of the
    QUERIES.md check: every registration must be certified into the
    committed artifact (tools/oracle_check.py merges named runs), so
    its query count always equals the registry and nothing ships
    uncertified."""
    import json

    from ytspark.queries import registry

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "ORACLE_LOCAL.json")
    with open(path) as fh:
        data = json.load(fh)
    assert data["n_queries"] == len(registry()), (
        f"ORACLE_LOCAL.json records {data['n_queries']} queries but the "
        f"registry holds {len(registry())} — run tools/oracle_check.py "
        "(full, or named for the new queries: named runs merge)"
    )
    assert data["n_fail"] == 0
    assert set(data["results"]) == set(registry())


def test_cross_round_bench_baseline_committed():
    """Round-7 contract (r6 VERDICT item 2): bench.py diffs every run
    against the FROZEN previous-round close. The baseline artifact must
    exist, parse, and carry the fields the guard reads — a missing or
    malformed file silently disables cross-round regression detection."""
    import json

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_BASELINE_ROUND.json")
    with open(path) as fh:
        base = json.load(fh)
    assert base["origin"], "baseline must state which round close it froze"
    assert isinstance(base["sf"], float)
    assert base["queries"] and all(
        isinstance(v, (int, float)) and v >= 0 for v in base["queries"].values()
    )
