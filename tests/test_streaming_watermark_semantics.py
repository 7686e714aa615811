"""Pin Spark's OBSERVED watermark semantics for streaming
aggregations — the rules a correctness argument about late data must
actually rest on (they differ from the folk model in subtle ways):

1. The watermark used during micro-batch b derives from data seen in
   batches BEFORE b (wm_b = max event ts so far - delay), never from
   batch b's own data.
2. A late row whose window state still EXISTS is merged, not dropped
   — the watermark is a lower bound on dropping, not a filter: a row
   older than the watermark still counts if its window has not been
   evicted yet.
3. A late row arriving AFTER its window was evicted is dropped
   (numRowsDroppedByWatermark) — no duplicate window emission in
   append mode.
4. Eviction at the end of batch b uses wm_b (the start-of-batch
   value), so a window fed and closed within the data of one batch
   pair emits exactly once with all merged rows.

These are load-bearing for the engine's streaming queries (the
incremental dedup and CDC paths reason about replay and lateness);
asserting them against the real Structured Streaming machinery means
an engine upgrade that changes the semantics fails HERE, loudly,
instead of corrupting downstream results silently.
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from pyspark.sql import functions as F


def _run_windowed(spark, batches, name, delay="100 seconds"):
    """One parquet FILE per batch, with EXPLICIT mtimes 10 s apart and
    lexicographic names: the file-stream source orders by (mtime,
    path), so batch order is deterministic on any filesystem — no
    sleep()-derived mtimes that coarse timestamps or clock skew could
    collapse (r4 ADVICE)."""
    d = tempfile.mkdtemp() + "/stage"
    os.makedirs(d)
    base_mtime = 1_000_000_000  # fixed epoch; only relative order matters
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(
            rows, "event_id long, sec long"
        ).withColumn("ts", F.timestamp_seconds(F.col("sec")))
        tmp = tempfile.mkdtemp()
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        dst = os.path.join(d, f"batch-{i:04d}.parquet")
        shutil.move(glob.glob(tmp + "/part-*.parquet")[0], dst)
        t = base_mtime + i * 10
        os.utime(dst, (t, t))
    schema = spark.read.parquet(d).schema
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
        .withWatermark("ts", delay)
        .groupBy(F.window("ts", "60 seconds").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        src.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wins = {
        int(r["start"].timestamp()): r["n"]
        for r in spark.sql(f"SELECT w.start, n FROM {name}").collect()
    }
    dropped = sum(
        p["stateOperators"][0]["numRowsDroppedByWatermark"]
        for p in q.recentProgress
        if p["stateOperators"]
    )
    return wins, dropped


class TestWatermarkSemantics:
    def test_late_row_merges_while_state_alive(self, spark):
        """Rule 1+2: batch 1 carries rows far below the watermark
        (wm=200 from batch 0's max ts 300), yet they merge into
        still-alive windows — nothing is dropped."""
        wins, dropped = _run_windowed(
            spark,
            [[(0, 0), (2, 100), (4, 200), (6, 300)],
             [(1, 50), (3, 60), (5, 250), (7, 199)]],
            "wm_sem_merge",
        )
        assert dropped == 0
        assert wins[0] == 2  # ts 0 (batch 0) + LATE ts 50 (batch 1)
        assert wins[60] == 2  # ts 100 + late ts 60
        # windows past the final watermark (200) never emit
        assert 240 not in wins and 300 not in wins

    def test_late_row_after_eviction_is_dropped(self, spark):
        """Rule 3+4: window [0,60) is evicted at the end of batch 1
        (wm=200); the batch-2 straggler for it is counted in
        numRowsDroppedByWatermark and no duplicate window appears."""
        wins, dropped = _run_windowed(
            spark,
            [[(0, 300), (1, 10)], [(2, 301)], [(3, 20)]],
            "wm_sem_drop",
        )
        assert dropped == 1
        assert wins[0] == 1  # only the batch-0 row; straggler dropped
