"""Plan-shape tests for the scale utilities: bucketed joins must not
shuffle; salted joins must match the plain join exactly."""

from __future__ import annotations

import os
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


def test_forced_hint_vs_size_gated_broadcast(spark, sf_dir, no_broadcast):
    """Pins the load-bearing physical-planning facts:
    1. an explicit broadcast() hint is FORCED — threshold=-1 does NOT
       demote it (so unconditional hints on growable dims are a
       100 TB hazard);
    2. maybe_broadcast is the size-gated form: under threshold=-1 it
       degrades to the planner's choice (shuffle join);
    3. either physical strategy produces identical results (decimal
       aggregates are partition-order invariant)."""
    from ytspark.plans.scale import maybe_broadcast
    from ytspark.session import load_tables

    t = load_tables(spark, sf_dir, "orders", "customer")
    forced = t["orders"].join(
        F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey")
    )
    assert "BroadcastHashJoin" in _plan(forced)  # hint wins over threshold=-1

    gated = t["orders"].join(
        maybe_broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey")
    )
    assert "BroadcastHashJoin" not in _plan(gated)  # gate respects the -1

    agg = lambda df: {  # noqa: E731
        tuple(r)
        for r in df.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("tp"),
        )
        .collect()
    }
    assert agg(forced) == agg(gated)


def test_maybe_broadcast_applies_hint_under_threshold(spark, sf_dir):
    from ytspark.plans.scale import maybe_broadcast
    from ytspark.session import load_tables

    t = load_tables(spark, sf_dir, "orders", "nation")
    joined = t["orders"].join(
        maybe_broadcast(t["nation"]),
        F.pmod(F.col("o_orderkey"), F.lit(25)) == F.col("n_nationkey"),
    )
    # nation is tiny: the gate applies the hint and the plan broadcasts
    assert "BroadcastHashJoin" in _plan(joined)


def test_salt_distribution_balanced(spark, sf_dir):
    t = load_tables(spark, sf_dir, "orders")
    salted = t["orders"].withColumn(
        "__salt", F.pmod(F.xxhash64(F.col("o_orderkey")), F.lit(8)).cast("int")
    )
    counts = [r["count"] for r in salted.groupBy("__salt").count().collect()]
    assert len(counts) == 8
    assert max(counts) < 2 * min(counts)  # roughly uniform split


@pytest.mark.skipif(
    os.environ.get("YTSPARK_BENCH_TESTS") != "1",
    reason="wall-clock assertion on a host with 2-3x timing variance; "
    "opt in with YTSPARK_BENCH_TESTS=1 (the correctness half is "
    "covered unconditionally by test_salted_join_matches_plain_join)",
)
def test_salted_join_beats_skewed_plain_join_wallclock(spark):
    """Skew realism: on a zipf-ish fact (90% of rows share ONE key) a
    plain shuffle join stalls on the hot partition's straggler task;
    salting splits the hot key n_salts ways. Assert row-identical
    results AND a measured wall-clock win (best-of-2 per variant to
    damp host noise; the skew penalty is engineered to dominate it)."""
    import time

    from ytspark.plans.scale import salted_join

    n, hot_share, n_dims = 8_000_000, 20, 1_000  # 19/20 rows hit key 0
    fact = spark.range(n).select(
        F.when(F.col("id") % hot_share < hot_share - 1, F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(n_dims)) + 1)
        .alias("k"),
        (F.col("id") % 97).alias("v"),
        F.col("id"),
    )
    dim = spark.range(n_dims + 1).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("w")
    )
    confs = {
        "spark.sql.adaptive.enabled": spark.conf.get("spark.sql.adaptive.enabled"),
        "spark.sql.autoBroadcastJoinThreshold": spark.conf.get(
            "spark.sql.autoBroadcastJoinThreshold"
        ),
    }
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plain = fact.join(dim, "k")
        salted = salted_join(fact, dim, "k", salt_col="id", n_salts=32)

        def wall(df):
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            return best

        t_plain, t_salted = wall(plain), wall(salted)
        # row-identical results (checksum aggregate, order-free)
        def sig(df):
            return df.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("v") * F.col("w")).alias("s"),
            ).collect()[0]

        assert sig(plain) == sig(salted)
    finally:
        for key, val in confs.items():
            spark.conf.set(key, val)
    speedup = t_plain / t_salted
    print(f"skew-join speedup: {speedup:.2f}x (plain {t_plain:.2f}s, salted {t_salted:.2f}s)")
    assert speedup > 1.2, (t_plain, t_salted)


def test_runtime_bloom_filter_prunes_fact_side(spark, sf_dir, no_broadcast):
    """Spark's runtime bloom-filter join pruning: a selective filter on
    the build side injects bloom_filter_agg / might_contain onto the
    fact-side scan, dropping non-matching rows before the shuffle. The
    application-side size threshold defaults to 10 GB — sized for real
    clusters, so at test scale we lower it to prove the mechanism the
    100 TB deployment gets for free; results must equal the plain join."""
    key = "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    prev = spark.conf.get(key)
    spark.conf.set(key, "1KB")
    try:
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        filtered = orders.where(F.col("o_orderpriority") == "1-URGENT")
        j = li.join(filtered, li.l_orderkey == filtered.o_orderkey).agg(
            F.sum("l_extendedprice").alias("rev")
        )
        plan = _plan(j)
        assert "might_contain" in plan, plan
        assert "bloom_filter_agg" in plan
        with_bloom = j.first().rev
    finally:
        spark.conf.set(key, prev)
    no_bloom = (
        li.join(filtered, li.l_orderkey == filtered.o_orderkey)
        .agg(F.sum("l_extendedprice").alias("rev"))
        .first()
        .rev
    )
    assert with_bloom == no_bloom


def test_explicit_bloom_prefilter_cuts_join_input(spark, sf_dir, no_broadcast):
    """The engine's explicit Bloom operator (ytspark.operators.bloom)
    must cut the fact rows entering the join shuffle to near the true
    match set: with a selective dim (negative-balance customers,
    ~9% of keys), the bloom-surviving fact fraction must be < 2x the
    true match fraction, and the probe must run as a Filter over the
    scan side (bit arithmetic, pre-exchange) — the shape that saves
    the shuffle at 100 TB. Results must equal the plain semi-join."""
    from ytspark.operators.bloom import bloom_build, bloom_filter_fact

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    dim = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .where(F.col("c_acctbal") < 0)
        .select(F.col("c_custkey").alias("key"))
        .distinct()
    )
    bloom = bloom_build(dim, "key")
    reduced = bloom_filter_fact(orders, bloom, "o_custkey")
    n_total = orders.count()
    n_reduced = reduced.count()
    n_match = orders.join(
        dim, orders.o_custkey == dim.key, "leftsemi"
    ).count()
    assert n_match <= n_reduced  # no false negatives
    assert n_reduced <= 2 * n_match  # fp rate keeps reduction tight
    assert n_reduced < n_total / 2  # the shuffle saving is real
    # the probe is a pre-exchange Filter over the scan side
    plan = reduced._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan.split("Filter")[0] or "shiftleft" in plan
    # reduced-then-exact equals plain semi-join
    exact_after_bloom = reduced.join(
        dim, reduced.o_custkey == dim.key, "leftsemi"
    ).count()
    assert exact_after_bloom == n_match


def test_write_bucketed_overwrites_orphaned_location(spark, sf_dir):
    """A warehouse directory left by a dead process (pid-reused scratch
    name, crashed writer) must not block saveAsTable in a fresh
    catalog — write_bucketed drops the orphan and proceeds."""
    import shutil
    import uuid as _uuid

    t = load_tables(spark, sf_dir, "orders")
    od = t["orders"].select(F.col("o_orderkey").alias("okey"), "o_totalprice")
    table = f"orphan_bkt_{_uuid.uuid4().hex[:8]}"
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    orphan = os.path.join(wh, table)
    os.makedirs(orphan)
    with open(os.path.join(orphan, "stale-part"), "w") as f:
        f.write("left behind by a dead writer")
    try:
        assert not spark.catalog.tableExists(table)
        write_bucketed(od, table, "okey", n_buckets=4)
        assert spark.table(table).count() == od.count()
        assert not os.path.exists(os.path.join(orphan, "stale-part"))
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        shutil.rmtree(orphan, ignore_errors=True)


def test_winnowing_plan_is_blocked_not_cartesian(spark, sf_dir):
    """Winnowing: the fingerprint join must be an equi-join on fh
    (hash-partitioned), never a nested loop; the gram windows stay
    doc_id-partitioned (no global WindowExec)."""
    from ytspark.queries import registry

    df = registry()["dedup_winnowing_fingerprints"].fn(spark, sf_dir)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan


def test_shapley_single_data_aggregate(spark, sf_dir):
    """Shapley: only the mask fold touches events; everything after is
    bounded-lattice joins. The executed plan must contain no more than
    the expected handful of scans of the fact table."""
    from ytspark.queries import registry

    df = registry()["shapley_attribution_exact"].fn(spark, sf_dir)
    plan = _plan(df)
    # events parquet is scanned for touches, conversions and the
    # channel dim — bounded, never once per coalition (which would be
    # 2^n scans)
    assert plan.count("events.parquet") <= 4
    assert "BatchEvalPython" not in plan


def test_compaction_plan_metadata_sized(spark, sf_dir):
    """Compaction planning scans the fact table exactly once (the
    stats aggregate); the bin assignment runs over the pre-aggregate."""
    from ytspark.queries import registry

    df = registry()["compaction_plan_bins"].fn(spark, sf_dir)
    plan = _plan(df)
    assert plan.count("events.parquet") <= 2  # stats + last-bin scalar
    assert "BatchEvalPython" not in plan


def test_bootstrap_single_pass_no_explode(spark, sf_dir):
    """The bootstrap must be ONE aggregate pass with conditional
    sums — no Generate (explode) node replicating the data B times."""
    from ytspark.queries import registry

    df = registry()["bootstrap_ci_revenue"].fn(spark, sf_dir)
    plan = _plan(df)
    assert "Generate" not in plan  # no B-fold explode
    assert plan.count("orders.parquet") == 1
    assert "HashAggregate" in plan


def test_stump_cumulative_over_histogram_only(spark, sf_dir):
    """The stump's global cumulative window must run over the bucket
    histogram (post-aggregate), so the scan feeds exactly one
    HashAggregate before any WindowExec."""
    from ytspark.queries import registry

    df = registry()["decision_stump_train"].fn(spark, sf_dir)
    plan = _plan(df)
    assert plan.count("orders.parquet") == 1
    assert "TakeOrderedAndProject" in plan  # argmax is top-1, no sort-all


def test_salted_join_spreads_zipf_hot_key(spark):
    """The skew-amplified dataset (tools/gen_skew_data.py) is the
    adversarial case salting exists for: one user carries ~9.5% of all
    events. The salted join must (a) return row-identical results on
    that data and (b) actually SPREAD the hot key across every salt
    bucket — otherwise the straggler task just moved."""
    import os
    import subprocess
    import sys as _sys

    import pyspark.sql.functions as F

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    skew = os.path.join(root, "testdata_skew")
    if not os.path.exists(os.path.join(skew, "events.parquet")):
        # derived + gitignored: regenerate deterministically on demand
        subprocess.run(
            [_sys.executable, os.path.join(root, "tools", "gen_skew_data.py")],
            cwd=root, check=True, capture_output=True,
        )
    ev = (
        spark.read.parquet(os.path.join(skew, "events.parquet"))
        .withColumnRenamed("user_id", "custkey")
    )
    cust = (
        spark.read.parquet(os.path.join(skew, "customer.parquet"))
        .withColumnRenamed("c_custkey", "custkey")
    )
    hot = ev.groupBy("custkey").count().orderBy(F.desc("count")).first()
    total = ev.count()
    assert hot["count"] > 0.05 * total, "skew dataset lost its hot key"
    salted = salted_join(ev, cust, "custkey", salt_col="event_id", n_salts=16)
    plain = ev.join(cust, on="custkey")
    assert salted.count() == plain.count()
    spread = (
        ev.where(F.col("custkey") == hot["custkey"])
        .select(F.pmod(F.xxhash64("event_id"), F.lit(16)).alias("salt"))
        .distinct()
        .count()
    )
    assert spread == 16, "hot key did not reach every salt bucket"


def test_concurrent_jobs_returns_in_order_and_propagates_errors():
    """r12: concurrent_jobs overlaps independent driver actions
    (guide §2.6). Results come back in thunk order; a failing thunk
    raises only after every thread has finished, so no write can race
    the caller's cleanup."""
    import threading
    import time

    from ytspark.plans.scale import concurrent_jobs

    order = []

    def slow():
        time.sleep(0.2)
        order.append("slow")
        return "a"

    def fast():
        order.append("fast")
        return "b"

    assert concurrent_jobs(slow, fast) == ["a", "b"]
    assert order == ["fast", "slow"]  # they really overlapped

    done = threading.Event()

    def boom():
        raise ValueError("boom")

    def finishes_anyway():
        time.sleep(0.2)
        done.set()
        return 1

    try:
        concurrent_jobs(boom, finishes_anyway)
    except ValueError as e:
        assert "boom" in str(e)
    else:  # pragma: no cover
        raise AssertionError("exception was swallowed")
    assert done.is_set()  # the raise waited for the other thread
