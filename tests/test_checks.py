"""Data-quality check layer (the dbt-tests capability the reference
declares but leaves empty — SURVEY §5)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ytspark import checks
from ytspark.session import load_tables


def test_testdata_contract_checks_pass(spark, sf_dir):
    """The driver testdata satisfies the schema.yml-shaped contract."""
    t = load_tables(spark, sf_dir, "orders", "customer")
    results = checks.run_checks(
        t["orders"],
        {
            "not_null": ["o_orderkey", "o_custkey", "o_orderdate"],
            "unique": [["o_orderkey"]],
            "accepted_values": {"o_orderstatus": ["F", "O", "P"]},
        },
    )
    assert all(r.passed for r in results), [r for r in results if not r.passed]
    rel = checks.relationships(t["orders"], "o_custkey", t["customer"], "c_custkey")
    assert rel.passed


def test_checks_count_violations_exactly(spark):
    df = spark.createDataFrame(
        [(1, "F", 10), (2, "X", None), (2, "O", 30), (3, None, 40)],
        "k int, status string, v int",
    )
    assert checks.not_null(df, "v").n_violations == 1
    assert checks.not_null(df, "status").n_violations == 1
    assert checks.unique(df, "k").n_violations == 1  # k=2 twice -> 1 extra
    assert (
        checks.accepted_values(df, "status", ["F", "O", "P"]).n_violations == 1
    )  # NULL is exempt, 'X' is not
    bad = checks.violations(df, F.col("v") > 15)
    # rows with v <= 15 OR v NULL violate the expectation
    assert sorted(r["k"] for r in bad.collect()) == [1, 2]


def test_relationships_counts_orphans(spark):
    child = spark.createDataFrame([(1,), (2,), (99,), (None,)], "fk int")
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk int")
    r = checks.relationships(child, "fk", parent, "pk")
    assert r.n_violations == 1  # 99 is an orphan; NULL fk is exempt
