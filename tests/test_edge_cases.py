"""Empty-input and boundary behavior for the custom operators — the
failure modes a 100 TB run WILL hit somewhere in some partition."""

from __future__ import annotations

import os

from pyspark.sql import Row
from pyspark.sql import functions as F


def _docs(spark, tmp_path, rows):
    docs = spark.createDataFrame(
        rows, "doc_id bigint, text string"
    ).withColumns(
        {"lang": F.lit("en"), "source": F.lit("t"), "n_chars": F.length("text")}
    )
    sf_dir = str(tmp_path / "edge")
    os.makedirs(sf_dir, exist_ok=True)
    docs.write.mode("overwrite").parquet(os.path.join(sf_dir, "documents.parquet"))
    return sf_dir


def test_short_docs_produce_no_shingles_or_pairs(spark):
    """Docs under the shingle width contribute nothing to MinHash or
    Jaccard — and must not crash the pipeline."""
    from ytspark.operators.dedup import minhash_signatures_df, ngram_jaccard_pairs

    docs = spark.createDataFrame(
        [Row(doc_id=1, text="one two"), Row(doc_id=2, text="a")]
    )
    assert minhash_signatures_df(docs).count() == 0
    assert ngram_jaccard_pairs(docs).count() == 0


def test_chunking_single_and_empty_token_docs(spark, tmp_path):
    from ytspark.operators.text import doc_overlap_chunks

    sf_dir = _docs(spark, tmp_path, [(1, "solo"), (2, "")])
    out = {r["doc_id"]: r for r in doc_overlap_chunks(spark, sf_dir).collect()}
    assert out[1]["n_chunk_tokens"] == 1 and out[1]["chunk_text"] == "solo"
    # empty string splits to one empty token — still exactly one chunk
    assert out[2]["n_chunk_tokens"] == 1 and out[2]["chunk_text"] == ""


def test_asof_join_empty_right_side_keeps_left_rows(spark):
    from ytspark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00")], "k bigint, lts string"
    ).withColumn("lts", F.col("lts").cast("timestamp"))
    right = spark.createDataFrame(
        [], "k bigint, rts timestamp, payload double"
    )
    for direction in ("backward", "forward"):
        out = asof_join(
            left, right, key="k", left_ts="lts", right_ts="rts",
            payload=["payload"], direction=direction,
        ).collect()
        assert len(out) == 1 and out[0]["asof_payload"] is None


def test_connected_components_empty_and_self_pairs(spark):
    from ytspark.operators.dedup import connected_components

    empty = spark.createDataFrame([], "doc_a bigint, doc_b bigint")
    assert connected_components(empty, "doc_a", "doc_b").count() == 0
    # a self-loop must not hang the propagation loop
    loops = spark.createDataFrame([(5, 5)], "doc_a bigint, doc_b bigint")
    labels = connected_components(loops, "doc_a", "doc_b").collect()
    assert len(labels) == 1 and labels[0]["label"] == 5


def test_curation_pipeline_all_filtered_out(spark, tmp_path):
    """A partition where every doc fails the quality gate yields an
    empty report, not an error."""
    from ytspark.operators.text import corpus_curation_pipeline

    sf_dir = _docs(spark, tmp_path, [(1, "tiny doc"), (2, "x y z")])
    assert corpus_curation_pipeline(spark, sf_dir).count() == 0
