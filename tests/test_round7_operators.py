"""Round-7 operators: exact-substring dedup (suffix-array corpus-prep
mode) — span semantics pinned on a hand-checkable micro-corpus."""

from __future__ import annotations

from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_substring_spans_hand_corpus(spark):
    """Two docs share a 10-token run; K=8 ⇒ covered seed positions are
    the 3 windows inside the run, merging to ONE maximal span of 10."""
    from ytspark.operators.dedup import EXSUB_K, _exsub_spans

    assert EXSUB_K == 8
    shared = " ".join(f"s{i}" for i in range(10))
    docs = _docs(
        spark,
        [
            (1, f"a1 a2 a3 {shared} z1 z2"),
            (2, f"b1 {shared} y1 y2 y3"),
            (3, "lone words that never repeat anywhere at all ok"),
        ],
    )
    spans = {
        r["doc_id"]: (r["span_start"], r["span_end"], r["span_len"])
        for r in _exsub_spans(docs).collect()
    }
    # doc 1: run occupies 1-based positions 4..13; doc 2: 2..11
    assert spans == {1: (4, 13, 10), 2: (2, 11, 10)}


def test_exact_substring_same_doc_repeats_count(spark):
    """ALL occurrences count (unlike the cross-doc df operator): a
    doc repeating its own 8-gram is covered."""
    from ytspark.operators.dedup import _exsub_spans

    run = " ".join(f"r{i}" for i in range(8))
    docs = _docs(spark, [(1, f"{run} mid1 mid2 {run}")])
    got = sorted(
        (r["span_start"], r["span_len"])
        for r in _exsub_spans(docs).collect()
    )
    assert got == [(1, 8), (11, 8)]


def test_exact_substring_apply_accounting(spark):
    from ytspark.operators.dedup import _exsub_spans

    # reuse the spans fixture through the registered apply shape
    shared = " ".join(f"s{i}" for i in range(10))
    docs = _docs(spark, [(1, f"a1 {shared}"), (2, f"{shared} z9")])
    spans = _exsub_spans(docs)
    per = spans.groupBy("doc_id").agg(
        F.sum("span_len").alias("dup")
    ).collect()
    assert {r["doc_id"]: r["dup"] for r in per} == {1: 10, 2: 10}


def test_lds_no_repeats_returns_zero_row(spark):
    from ytspark.queries import registry  # ensure registration

    registry()
    import tempfile

    from ytspark.operators.dedup import longest_duplicate_substring

    with tempfile.TemporaryDirectory() as d:
        _docs(
            spark, [(1, "only unique tokens here"), (2, "and more of them")]
        ).write.parquet(d + "/documents.parquet")
        row = longest_duplicate_substring(spark, d).collect()[0]
    # "of"/"and" unique across docs too — every token distinct
    assert row["lds_tokens"] == 0
    assert row["n_occurrences"] == 0
    assert row["example_gram"] is None


def test_lds_finds_exact_length(spark):
    import tempfile

    from ytspark.operators.dedup import longest_duplicate_substring

    run = " ".join(f"t{i}" for i in range(13))
    with tempfile.TemporaryDirectory() as d:
        _docs(
            spark,
            [(1, f"x1 x2 {run} x3"), (2, f"{run} w1 w2 w3 w4")],
        ).write.parquet(d + "/documents.parquet")
        row = longest_duplicate_substring(spark, d).collect()[0]
    assert row["lds_tokens"] == 13
    assert row["n_distinct_repeated"] == 1
    assert row["n_occurrences"] == 2
    assert row["example_gram"] == run
