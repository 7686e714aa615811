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
    # the rows-only set stays small and intentional. Round 4 converted
    # the two store-lifecycle incremental dedups (checkable-hash store
    # + batch-recompute oracles). What remains is genuinely non-SQL:
    # xxhash64-keyed MinHash/SimHash production variants (their
    # cross-engine-checkable twins ARE hash-gated) and iterative
    # label propagation.
    rows_only = set(qs) - set(oracles)
    assert rows_only == {
        "dedup_minhash_clusters",
        "dedup_minhash_lsh",
        "dedup_simhash",
    }, sorted(rows_only)


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
