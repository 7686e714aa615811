#!/usr/bin/env python
"""Per-query micro-profiler for optimization work (guide §1).

For each named query: time the PLAN CONSTRUCTION (the ``q.fn`` call —
py4j round-trips, schema reads, any driver-side pre-flight jobs) apart
from the EXECUTION (noop-sink force, guide §1.4), run N repeats of
each, and optionally dump ``explain("formatted")`` to a file.

Usage:
  python tools/profile_query.py [--sf DIR] [--runs N] [--explain-dir D] q1 q2 ...
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--suffix", default="", help="filename suffix for explain dumps, e.g. _before")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    from ytspark import get_spark
    from ytspark.plans.scale import release_all_cached
    from ytspark.queries import registry

    spark = get_spark("ytspark-profile")
    reg = registry()

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    # warm-up
    force(reg["limit_head"].fn(spark, args.sf))
    release_all_cached(spark)

    for name in args.queries:
        q = reg[name]
        plan_ts, exec_ts = [], []
        for i in range(args.runs):
            spark.sparkContext.setJobDescription(f"{name} run {i}")
            t0 = time.perf_counter()
            df = q.fn(spark, args.sf)
            t1 = time.perf_counter()
            force(df)
            t2 = time.perf_counter()
            plan_ts.append(t1 - t0)
            exec_ts.append(t2 - t1)
            release_all_cached(spark)
        spark.sparkContext.setJobDescription(None)
        print(
            f"{name}: plan min={min(plan_ts):.3f} all={[round(t, 3) for t in plan_ts]} | "
            f"exec min={min(exec_ts):.3f} all={[round(t, 3) for t in exec_ts]} | "
            f"total min={min(p + e for p, e in zip(plan_ts, exec_ts)):.3f}",
            flush=True,
        )
        if args.explain_dir:
            os.makedirs(args.explain_dir, exist_ok=True)
            df = q.fn(spark, args.sf)
            out = os.path.join(args.explain_dir, f"{name}{args.suffix}.txt")
            with open(out, "w") as fh:
                fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
            release_all_cached(spark)
            print(f"  explain -> {out}", flush=True)


if __name__ == "__main__":
    main()
