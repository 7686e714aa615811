#!/usr/bin/env python
"""Per-query job/stage census via the Spark event log (guide §1/§7).

For each named query: run once to warm (JIT, parquet footers), then run
once timed under an isolated job group while tailing the event log, and
report

  wall  — fn() + noop force, warm
  jobs / stages — how many driver-sequenced jobs and executed stages
  task  — summed task time (executor compute, all cores)
  span  — summed wall span of the stages (submission→completion)
  gap   — wall - span: driver-side time OUTSIDE any running stage
          (Catalyst analysis/optimization, py4j, codegen compile,
          scheduling gaps) — the per-query machinery floor

One-task stages >= 0.3 s and max/median task skew >= 8x are flagged.

Usage: python tools/stage_census.py [--sf DIR] q1 q2 ...
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    evdir = "/tmp/spark-events"
    os.makedirs(evdir, exist_ok=True)
    extra = (
        "spark.eventLog.enabled=true;spark.eventLog.compress=false;"
        "spark.eventLog.dir=" + evdir
    )
    prev = os.environ.get("SPARK_GRAFT_EXTRA_CONF", "")
    os.environ["SPARK_GRAFT_EXTRA_CONF"] = (
        prev + ";" + extra if prev else extra
    )

    from ytspark import get_spark
    from ytspark.plans.scale import release_all_cached
    from ytspark.queries import registry

    spark = get_spark("ytspark-census")
    sc = spark.sparkContext
    app_id = sc.applicationId
    log_path = os.path.join(
        evdir, f"eventlog_v2_{app_id}", f"events_1_{app_id}"
    )
    reg = registry()

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    force(reg["limit_head"].fn(spark, args.sf))
    release_all_cached(spark)

    def read_events(from_pos):
        evs = []
        with open(log_path) as fh:
            fh.seek(from_pos)
            for line in fh:
                try:
                    evs.append(json.loads(line))
                except ValueError:
                    pass
            pos = fh.tell()
        return evs, pos

    _, pos = read_events(0)
    for name in args.queries:
        q = reg[name]
        # warm pass
        force(q.fn(spark, args.sf))
        release_all_cached(spark)
        time.sleep(0.3)
        _, pos = read_events(pos)  # drop the warm pass's events
        # timed pass
        t0 = time.perf_counter()
        force(q.fn(spark, args.sf))
        wall = time.perf_counter() - t0
        release_all_cached(spark)
        # event log is written asynchronously; give it a beat
        time.sleep(0.5)
        evs, pos = read_events(pos)
        jobs = [e for e in evs if e["Event"] == "SparkListenerJobStart"]
        stages = {}
        tasks = {}
        for e in evs:
            if e["Event"] == "SparkListenerStageCompleted":
                si = e["Stage Info"]
                sid = si["Stage ID"]
                sub = si.get("Submission Time")
                com = si.get("Completion Time")
                stages[sid] = {
                    "span": (com - sub) / 1000.0 if sub and com else 0.0,
                    "n_tasks": si.get("Number of Tasks", 0),
                }
            elif e["Event"] == "SparkListenerTaskEnd":
                sid = e["Stage ID"]
                ti = e.get("Task Info", {})
                dur = (
                    ti.get("Finish Time", 0) - ti.get("Launch Time", 0)
                ) / 1000.0
                tasks.setdefault(sid, []).append(dur)
        n_stages = len(stages)
        span = sum(s["span"] for s in stages.values())
        task_sum = sum(sum(v) for v in tasks.values())
        one_task_slow = [
            (sid, round(stages[sid]["span"], 2))
            for sid in stages
            if stages[sid]["n_tasks"] == 1 and stages[sid]["span"] >= 0.3
        ]
        skewed = []
        for sid, ds in tasks.items():
            if len(ds) >= 4:
                ds2 = sorted(ds)
                med = ds2[len(ds2) // 2]
                if med > 0 and ds2[-1] / med >= 8 and ds2[-1] >= 0.3:
                    skewed.append((sid, round(ds2[-1], 2), round(med, 3)))
        print(
            f"{name}: wall={wall:.2f} jobs={len(jobs)} stages={n_stages} "
            f"span={span:.2f} task={task_sum:.2f} gap={wall - span:.2f}"
            + (f" ONE-TASK{one_task_slow}" if one_task_slow else "")
            + (f" SKEW{skewed}" if skewed else ""),
            flush=True,
        )


if __name__ == "__main__":
    main()
