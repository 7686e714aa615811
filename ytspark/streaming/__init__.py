"""Structured Streaming mode (SURVEY §2 O1–O3, §7.5).

The reference's "streaming" is an externally re-scheduled batch DAG
(hourly / every 5 min). Here the same pipeline body runs as real
micro-batches: file-source ``readStream`` → the identical ingest
transform → ``foreachBatch`` append into the partitioned bronze layout,
with ``availableNow`` (catch-up under an external scheduler — the O2
cadence) or ``processingTime`` triggers.
"""
