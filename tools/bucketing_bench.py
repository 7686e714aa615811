#!/usr/bin/env python
"""Measure the bucketing payoff: lineitem ⨝ orders on the order key,
plain (shuffles both sides every query) vs pre-bucketed tables
(co-located, exchange-free). Prints one JSON line.

This is the write-once/join-many trade SCALE.md describes: at 100 TB
the per-query win multiplies by every query that joins on the bucket
key. Usage: python tools/bucketing_bench.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    from pyspark.sql import functions as F

    from ytspark import get_spark
    from ytspark.plans.scale import bucketed_join, write_bucketed
    from ytspark.session import load_tables

    spark = get_spark("bucketing-bench")
    # isolate the join strategy: no broadcast path, no AQE re-planning
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    t = load_tables(spark, sf_dir, "lineitem", "orders")
    li = t["lineitem"].select(F.col("l_orderkey").alias("okey"), "l_quantity")
    od = t["orders"].select(F.col("o_orderkey").alias("okey"), "o_totalprice")

    def force(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    def best_of(n, fn) -> float:
        best = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return round(best, 3)

    plain_join = lambda: force(  # noqa: E731
        li.join(od, on="okey").groupBy().agg(F.sum("l_quantity"))
    )
    plain_sec = best_of(3, plain_join)

    suffix = uuid.uuid4().hex[:8]
    lt, rt = f"li_bb_{suffix}", f"od_bb_{suffix}"
    t0 = time.perf_counter()
    write_bucketed(li, lt, "okey", n_buckets=32)
    write_bucketed(od, rt, "okey", n_buckets=32)
    write_sec = round(time.perf_counter() - t0, 3)
    try:
        bucketed = lambda: force(  # noqa: E731
            bucketed_join(spark, lt, rt, "okey")
            .groupBy()
            .agg(F.sum("l_quantity"))
        )
        bucketed_sec = best_of(3, bucketed)
        plan = (
            bucketed_join(spark, lt, rt, "okey")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        exchange_free = "Exchange" not in plan
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {lt}")
        spark.sql(f"DROP TABLE IF EXISTS {rt}")

    print(
        json.dumps(
            {
                "metric": "bucketed_vs_plain_join",
                "sf_dir": sf_dir,
                "plain_join_sec": plain_sec,
                "bucketed_join_sec": bucketed_sec,
                "one_time_bucket_write_sec": write_sec,
                "bucketed_join_exchange_free": exchange_free,
                "speedup": round(plain_sec / bucketed_sec, 2)
                if bucketed_sec
                else None,
            }
        )
    )


if __name__ == "__main__":
    main()
