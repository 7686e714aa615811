#!/usr/bin/env python
"""Measure the Structured Streaming FRAMEWORK floor (r6 VERDICT item 3).

The bench's slowest queries are streaming jobs; before calling their
cost a plan problem, measure what an availableNow micro-batch run costs
with NO kernel at all:

- ``floor_4tick_noop``: the exact harness shape of
  ``streaming_incremental_dedup`` — the documents batch region staged
  as 4 range-sliced files, maxFilesPerTrigger=1, foreachBatch whose
  tick only forces the batch with a noop write (full source read, zero
  kernel, zero sink I/O).
- ``floor_1tick_memory``: the harness shape of the single-micro-batch
  memory-sink streams (``streaming_stream_stream_join`` et al.) — the
  events stream projected untouched into a memory sink.

Then it times the two real queries in the same session and prints the
framework-vs-kernel split as ONE JSON line. Numbers land in the query
docstrings + SCALE.md; re-run after any streaming-plan change.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, *a):
    t0 = time.perf_counter()
    fn(*a)
    return round(time.perf_counter() - t0, 3)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    from pyspark.sql import functions as F

    from ytspark import get_spark
    from ytspark.plans.scale import release_all_cached
    from ytspark.plans.scratch import scratch_dir
    from ytspark.queries import registry
    from ytspark.session import load_tables
    from ytspark.streaming.queries import _events_stream, _run_to_memory

    spark = get_spark("streaming-floor")
    reg = registry()

    # warm-up: session + codegen + parquet footers (match bench.py)
    reg["limit_head"].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    def floor_4tick_noop():
        from ytspark.operators.dedup import INCR_SPLIT

        docs = load_tables(spark, sf_dir, "documents")["documents"]
        stage = os.path.join(scratch_dir(f"stream_floor_{sf_dir}"), "stage")
        shutil.rmtree(stage, ignore_errors=True)
        batch = docs.where(F.col("doc_id") >= INCR_SPLIT)
        batch.repartitionByRange(4, "doc_id").write.parquet(stage)
        schema = spark.read.parquet(stage).schema

        def tick(batch_df, batch_id):
            batch_df.write.format("noop").mode("overwrite").save()

        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(stage)
            .writeStream.foreachBatch(tick)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def floor_1tick_memory():
        stream = _events_stream(spark, sf_dir).select("user_id", "ts")
        _run_to_memory(stream, "floor_sink", output_mode="append")

    out: dict[str, object] = {"metric": "streaming_floor", "sf_dir": sf_dir}
    # min-of-3, matching bench.py's estimator
    for key, fn in (
        ("floor_4tick_noop", floor_4tick_noop),
        ("floor_1tick_memory", floor_1tick_memory),
    ):
        samples = []
        for _ in range(3):
            samples.append(timed(fn))
            release_all_cached(spark)
        out[key] = min(samples)
    for name in ("streaming_incremental_dedup", "streaming_stream_stream_join"):
        samples = []
        for _ in range(3):
            samples.append(
                timed(
                    lambda: reg[name]
                    .fn(spark, sf_dir)
                    .write.format("noop")
                    .mode("overwrite")
                    .save()
                )
            )
            release_all_cached(spark)
        out[name] = min(samples)
    out["incremental_dedup_kernel_share"] = round(
        1 - out["floor_4tick_noop"] / out["streaming_incremental_dedup"], 3
    )
    out["ss_join_kernel_share"] = round(
        1 - out["floor_1tick_memory"] / out["streaming_stream_stream_join"], 3
    )
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
