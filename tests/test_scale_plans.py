"""Plan-shape tests for the scale utilities: bucketed joins must not
shuffle; salted joins must match the plain join exactly."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from ytspark.plans.scale import bucketed_join, salted_join, write_bucketed
from ytspark.session import load_tables


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture()
def no_broadcast(spark):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_has_no_exchange(spark, sf_dir, no_broadcast):
    t = load_tables(spark, sf_dir, "orders", "lineitem")
    suffix = uuid.uuid4().hex[:8]
    lt, rt = f"li_b_{suffix}", f"ord_b_{suffix}"
    li = t["lineitem"].select(F.col("l_orderkey").alias("okey"), "l_quantity")
    od = t["orders"].select(F.col("o_orderkey").alias("okey"), "o_totalprice")
    try:
        write_bucketed(li, lt, "okey", n_buckets=8)
        write_bucketed(od, rt, "okey", n_buckets=8)
        joined = bucketed_join(spark, lt, rt, "okey")
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: no shuffle either side
        # sanity: same result as the plain (shuffling) join
        plain = li.join(od, on="okey").count()
        assert joined.count() == plain
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {lt}")
        spark.sql(f"DROP TABLE IF EXISTS {rt}")


def test_unbucketed_join_does_exchange(spark, sf_dir, no_broadcast):
    t = load_tables(spark, sf_dir, "orders", "lineitem")
    joined = t["lineitem"].join(
        t["orders"], F.col("l_orderkey") == F.col("o_orderkey")
    )
    assert "Exchange" in _plan(joined)  # the baseline the buckets remove


def test_salted_join_matches_plain_join(spark, sf_dir):
    t = load_tables(spark, sf_dir, "orders", "customer")
    orders = t["orders"].withColumnRenamed("o_custkey", "custkey")
    cust = t["customer"].withColumnRenamed("c_custkey", "custkey")
    salted = salted_join(
        orders, cust, "custkey", salt_col="o_orderkey", n_salts=4
    )
    plain = orders.join(cust, on="custkey")
    assert salted.count() == plain.count()
    a = sorted(
        (r["o_orderkey"], r["c_name"]) for r in salted.select("o_orderkey", "c_name").collect()
    )
    b = sorted(
        (r["o_orderkey"], r["c_name"]) for r in plain.select("o_orderkey", "c_name").collect()
    )
    assert a == b


def test_q5_plan_broadcasts_dims_and_pushes_filters(spark, sf_dir):
    """Plan-regression pin for the join-heavy family: dims broadcast,
    order-date predicate reaches the parquet scan, columns pruned."""
    import io
    import contextlib

    from ytspark.queries import registry

    df = registry()["q5_regional_revenue"].fn(spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "GreaterThanOrEqual(o_orderdate" in plan  # pushed filter
    # lineitem scan pruned to the 4 referenced columns
    assert "struct<l_orderkey:bigint,l_suppkey:bigint,l_extendedprice:double,l_discount:double>" in plan


def test_q1_scan_agg_pushes_predicate(spark, sf_dir):
    import io
    import contextlib

    from ytspark.queries import registry

    df = registry()["q1_pricing_summary"].fn(spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "LessThanOrEqual(l_shipdate" in plan  # predicate at the scan
    assert "Exchange" in plan  # exactly the one agg shuffle
    assert plan.count("Exchange hashpartitioning") <= 2  # partial->final only


def _formatted_plan(spark, sf_dir, name: str) -> str:
    import io
    import contextlib

    from ytspark.queries import registry

    df = registry()[name].fn(spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_q8_seven_table_star_broadcasts_all_dims(spark, sf_dir):
    """Q8's seven-table star: every dim side broadcast, the p_type
    filter pushed to the part scan, exactly one fact-fact shuffle
    join (lineitem ⨝ orders on the orderkey)."""
    plan = _formatted_plan(spark, sf_dir, "q8_market_share")
    assert plan.count("BroadcastHashJoin") >= 5
    assert "CartesianProduct" not in plan
    assert "EqualTo(p_type,ECONOMY)" in plan  # pushed to the part scan
    assert plan.count("SortMergeJoin") <= 1  # only lineitem ⨝ orders may shuffle


def test_q21_decorrelated_single_fact_pass(spark, sf_dir):
    """Q21's EXISTS/NOT EXISTS pair is decorrelated into one per-order
    aggregate: the plan must not contain a cartesian product or a
    per-row correlated subquery, and the supplier dim broadcasts."""
    plan = _formatted_plan(spark, sf_dir, "q21_waiting_suppliers")
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    assert "EqualTo(o_orderstatus,F)" in plan  # pushed to the orders scan


def test_salt_distribution_balanced(spark, sf_dir):
    t = load_tables(spark, sf_dir, "orders")
    salted = t["orders"].withColumn(
        "__salt", F.pmod(F.xxhash64(F.col("o_orderkey")), F.lit(8)).cast("int")
    )
    counts = [r["count"] for r in salted.groupBy("__salt").count().collect()]
    assert len(counts) == 8
    assert max(counts) < 2 * min(counts)  # roughly uniform split
