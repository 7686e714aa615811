"""Unit tests for the custom operators: as-of join, multimodal binary
plumbing, MinHash/LSH internals."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from ytspark.operators.multimodal import (
    attach_fake_media,
    decode_image,
    media_features,
    sample_frames,
)
from ytspark.operators.temporal import asof_join


def _ts(s: str) -> datetime.datetime:
    return datetime.datetime.fromisoformat(s)


class TestAsofJoin:
    def _frames(self, spark):
        left = spark.createDataFrame(
            [
                Row(k=1, lts=_ts("2024-01-01T10:00:00"), tag="a"),
                Row(k=1, lts=_ts("2024-01-01T12:00:00"), tag="b"),
                Row(k=2, lts=_ts("2024-01-01T09:00:00"), tag="c"),
            ]
        )
        right = spark.createDataFrame(
            [
                Row(k=1, rts=_ts("2024-01-01T09:30:00"), payload=10.0),
                Row(k=1, rts=_ts("2024-01-01T11:00:00"), payload=20.0),
                Row(k=1, rts=_ts("2024-01-01T12:00:00"), payload=30.0),
                Row(k=2, rts=_ts("2024-01-01T09:30:00"), payload=99.0),
            ]
        )
        return left, right

    def test_backward_semantics(self, spark):
        left, right = self._frames(spark)
        out = {
            r["tag"]: r
            for r in asof_join(
                left, right, key="k", left_ts="lts", right_ts="rts",
                payload=["rts", "payload"],
            ).collect()
        }
        # a @10:00 sees the 09:30 row
        assert out["a"]["asof_payload"] == 10.0
        # b @12:00: right row at EXACTLY 12:00 is visible (<= semantics)
        assert out["b"]["asof_payload"] == 30.0
        # c @09:00: no prior right row -> NULLs, row preserved (left join)
        assert out["c"]["asof_payload"] is None

    def test_left_columns_preserved(self, spark):
        left, right = self._frames(spark)
        res = asof_join(
            left, right, key="k", left_ts="lts", right_ts="rts", payload=["payload"]
        )
        assert res.columns == ["k", "lts", "tag", "asof_payload"]
        assert res.count() == left.count()


class TestMultimodal:
    def _media(self, spark, sf_dir):
        from ytspark.session import load_tables

        docs = load_tables(spark, sf_dir, "documents")["documents"]
        return attach_fake_media(docs.limit(20))

    def test_schema(self, spark, sf_dir):
        media = self._media(spark, sf_dir)
        assert dict(media.dtypes)["media"] == "binary"
        assert dict(media.dtypes)["meta"].startswith("struct<format:string")

    def test_features_roundtrip(self, spark, sf_dir):
        import hashlib

        media = self._media(spark, sf_dir)
        feats = {r["doc_id"]: r for r in media_features(media).collect()}
        for row in media.collect():
            f = feats[row["doc_id"]]
            assert f["n_bytes"] == len(row["media"])
            assert f["checksum"] == hashlib.md5(bytes(row["media"])).hexdigest()
            w, h = row["meta"]["width"], row["meta"]["height"]
            assert f["thumb_w"] == w * 64 // max(w, h)
            assert max(f["thumb_w"], f["thumb_h"]) == 64

    def test_frame_sampling_expansion(self, spark, sf_dir):
        media = self._media(spark, sf_dir)
        frames = sample_frames(media)
        per_doc = frames.groupBy("doc_id").count().collect()
        assert len(per_doc) == media.count()  # every asset emits >= 1 frame
        one = frames.where(F.col("frame_idx") == 0).count()
        assert one == media.count()  # frame 0 always sampled

    def test_metadata_only_projection_skips_payload(self, spark, sf_dir):
        media = self._media(spark, sf_dir)
        plan = (
            media.select("doc_id", "meta.format")._jdf.queryExecution()
            .optimizedPlan().toString()
        )
        assert "media" not in plan  # payload column pruned from the scan

    def test_decode_compressed_formats_raise_without_pil(self):
        with pytest.raises(NotImplementedError):
            decode_image(b"\x89PNG...", "png")

    def test_ppm_roundtrip_and_header_grammar(self):
        from ytspark.operators.multimodal import decode_ppm, encode_ppm

        pixels = bytes(range(2 * 3 * 3))
        w, h, raster = decode_ppm(encode_ppm(3, 2, pixels))
        assert (w, h, raster) == (3, 2, pixels)
        # comments + arbitrary whitespace in the header must parse
        hairy = b"P6 # comment\n  # another\n 3\t2 # dims\n255\n" + pixels
        assert decode_ppm(hairy) == (3, 2, pixels)
        with pytest.raises(ValueError):
            decode_ppm(b"P5\n1 1\n255\n\x00")  # grayscale PNM: unsupported

    def test_bmp_decode_bottom_up_bgr_padded(self):
        import struct

        from ytspark.operators.multimodal import decode_bmp, decode_image

        # 2x2 24bpp BMP: rows stored bottom-up, BGR, padded to 4 bytes
        top = [(255, 0, 0), (0, 255, 0)]  # logical top row: red, green
        bottom = [(0, 0, 255), (9, 8, 7)]
        rows = [bottom, top]  # file order = bottom-up
        body = b"".join(
            b"".join(bytes((b, g, r)) for (r, g, b) in row) + b"\x00\x00"
            for row in rows
        )
        header = (
            b"BM"
            + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
            + struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(body), 0, 0, 0, 0)
        )
        w, h, raster = decode_bmp(header + body)
        assert (w, h) == (2, 2)
        expect = b"".join(bytes(p) for p in top + bottom)
        assert raster == expect
        # sniffing via decode_image dispatches on magic bytes
        assert decode_image(header + body, "bmp")[2] == expect

    def test_wav_roundtrip_and_chunk_walker(self):
        import struct

        from ytspark.operators.multimodal import decode_wav, encode_wav

        frames = [-2048, -1, 0, 1, 2047, 123]  # stereo: 3 frames
        pcm = struct.pack("<6h", *frames)
        rate, ch, chans = decode_wav(encode_wav(44100, 2, pcm))
        assert (rate, ch) == (44100, 2)
        assert chans == [[-2048, 0, 2047], [-1, 1, 123]]
        # unknown chunk between fmt and data must be skipped
        rate, ch, chans = decode_wav(
            encode_wav(8000, 1, pcm, extra_chunk=b"INFOjunk!")
        )
        assert (rate, ch, chans[0]) == (8000, 1, frames)
        # odd-sized extra chunk exercises word-alignment padding
        _, _, chans = decode_wav(
            encode_wav(8000, 1, pcm, extra_chunk=b"odd")
        )
        assert chans[0] == frames
        with pytest.raises(ValueError):
            decode_wav(b"RIFF\x00\x00\x00\x00AIFF")  # not WAVE
        with pytest.raises(ValueError):  # float PCM unsupported
            bad_fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
            decode_wav(
                b"RIFF"
                + struct.pack("<I", 4 + 8 + len(bad_fmt))
                + b"WAVEfmt "
                + struct.pack("<I", len(bad_fmt))
                + bad_fmt
            )


class TestNgramJaccard:
    def test_df_cap_keeps_recall(self, spark, sf_dir):
        """The df-capped (scale) mode must find the same ≥0.8 pairs the
        exact mode finds — hot shingles carry no similarity signal."""
        from ytspark.operators.dedup import ngram_jaccard_pairs
        from ytspark.session import load_tables

        docs = load_tables(spark, sf_dir, "documents")["documents"]
        exact = {
            (r["doc_a"], r["doc_b"]): r["jaccard"]
            for r in ngram_jaccard_pairs(docs, max_df=None).collect()
        }
        capped = {
            (r["doc_a"], r["doc_b"]): r["jaccard"]
            for r in ngram_jaccard_pairs(docs, max_df=20).collect()
        }
        assert set(capped) == set(exact)  # full recall on this corpus
        for k, v in capped.items():
            assert abs(v - exact[k]) < 1e-12  # identical exact scores


class TestEmbeddingDedup:
    def test_lsh_pairs_subset_of_exact(self, spark, sf_dir):
        """Bucketed LSH dedup has exact precision: every pair it emits
        must appear in the exact block-pair GEMM result with the same
        rounded score."""
        from ytspark.operators.dedup import (
            dedup_embedding_cosine,
            dedup_embedding_cosine_lsh,
        )

        exact = {
            (r["vec_a"], r["vec_b"]): r["cos_sim"]
            for r in dedup_embedding_cosine(spark, sf_dir).collect()
        }
        approx = {
            (r["vec_a"], r["vec_b"]): r["cos_sim"]
            for r in dedup_embedding_cosine_lsh(spark, sf_dir).collect()
        }
        assert approx  # non-empty at this fixture
        assert set(approx) <= set(exact)
        for k, v in approx.items():
            assert v == exact[k]

    def test_exact_gemm_covers_every_block_pair_once(self, spark, sf_dir):
        """No duplicate pairs from the block-pair replication."""
        from ytspark.operators.dedup import dedup_embedding_cosine

        rows = dedup_embedding_cosine(spark, sf_dir).collect()
        pairs = [(r["vec_a"], r["vec_b"]) for r in rows]
        assert len(pairs) == len(set(pairs))
        assert all(a < b for a, b in pairs)


class TestAnnRecall:
    def _topk_sets(self, df):
        import collections

        out = collections.defaultdict(set)
        for r in df.collect():
            out[r["query_id"]].add(r["neighbor_id"])
        return out

    def test_ivf_recall_vs_bruteforce(self, spark, sf_dir):
        from ytspark.operators.similarity import knn_cosine_bruteforce, knn_cosine_ivf

        bf = self._topk_sets(knn_cosine_bruteforce(spark, sf_dir))
        ivf = self._topk_sets(knn_cosine_ivf(spark, sf_dir))
        recalls = [len(bf[q] & ivf[q]) / len(bf[q]) for q in bf]
        assert len(recalls) == 10
        # uniform random 64-dim vectors are the worst case for IVF;
        # probing 4/16 cells must still beat the 25% cell-coverage floor
        assert sum(recalls) / len(recalls) >= 0.3

    def test_multitable_lsh_recall_dominates_single_table(self, spark, sf_dir):
        from ytspark.operators.similarity import (
            knn_cosine_bruteforce,
            knn_cosine_lsh,
            knn_cosine_lsh_multitable,
        )

        bf = self._topk_sets(knn_cosine_bruteforce(spark, sf_dir))
        single = self._topk_sets(knn_cosine_lsh(spark, sf_dir))
        multi = self._topk_sets(knn_cosine_lsh_multitable(spark, sf_dir))

        def mean_recall(approx):
            return sum(len(bf[q] & approx[q]) / len(bf[q]) for q in bf) / len(bf)

        r1, rt = mean_recall(single), mean_recall(multi)
        # unioning 4 independent tables can only widen the candidate set
        assert rt >= r1
        # absolute recall at this fixture is intrinsically low: 8-bit
        # tables give 256 buckets over a ~50-vector corpus, so candidate
        # lists are sparse (the bits/density dial belongs to deployment);
        # the property under test is table-union dominance, not tuning
        assert rt >= 0.05


class TestMinhash:
    def test_signature_deterministic_and_sized(self, spark, sf_dir):
        from ytspark.operators.dedup import N_PERMUTATIONS, minhash_signatures_df
        from ytspark.session import load_tables

        docs = load_tables(spark, sf_dir, "documents")["documents"].limit(10)
        a = {r["doc_id"]: r["sig"] for r in minhash_signatures_df(docs).collect()}
        b = {r["doc_id"]: r["sig"] for r in minhash_signatures_df(docs).collect()}
        assert a == b  # deterministic across runs
        assert all(len(s) == N_PERMUTATIONS for s in a.values())

    def test_cluster_transitive_closure(self, spark, tmp_path):
        """A~B and B~C must land in ONE cluster labeled min(doc_id)."""
        import os

        from ytspark.session import load_tables

        base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
        # append-one-word chain: each neighbor pair's true Jaccard is
        # ~0.9, far above the banding miss region for ANY hash
        # realization (a mid-string substitution sat near J=0.65, where
        # 8 bands x 4 rows misses ~20% of hash families — the r12
        # portable-hash swap exposed exactly that sensitivity)
        rows = [
            (1, base + "one extra tail"),
            (2, base + "one extra tail word"),
            (3, base + "one extra tail word more"),
            (10, "totally unrelated text " * 20),
        ]
        docs = spark.createDataFrame(rows, "doc_id bigint, text string")
        sf_dir = str(tmp_path / "mini")
        os.makedirs(sf_dir, exist_ok=True)
        docs.write.mode("overwrite").parquet(os.path.join(sf_dir, "documents.parquet"))
        from ytspark.operators.dedup import dedup_minhash_clusters

        clusters = dedup_minhash_clusters(spark, sf_dir).collect()
        assert len(clusters) == 1
        assert clusters[0]["cluster_id"] == 1
        assert clusters[0]["n_docs"] == 3

    def test_identical_docs_identical_sigs(self, spark):
        from ytspark.operators.dedup import minhash_signatures_df

        docs = spark.createDataFrame(
            [
                Row(doc_id=1, text="the quick brown fox jumps over the lazy dog"),
                Row(doc_id=2, text="the quick brown fox jumps over the lazy dog"),
                Row(doc_id=3, text="a completely different document body here now"),
            ]
        )
        sigs = {r["doc_id"]: r["sig"] for r in minhash_signatures_df(docs).collect()}
        assert sigs[1] == sigs[2]
        assert sigs[1] != sigs[3]


class TestBatchMap:
    def test_minmax_normalize_bounds_and_constant_group(self, spark):
        from ytspark.operators.batchmap import minmax_normalize

        rows = [
            (1, 10, 5.0),
            (2, 10, 15.0),
            (3, 10, 10.0),
            (4, 20, 7.0),  # constant group → 0.5
            (5, 20, 7.0),
        ]
        df = spark.createDataFrame(rows, "event_id bigint, user_id bigint, value double")
        out = {
            r["event_id"]: r["norm_value"]
            for r in minmax_normalize(
                df, key_cols=["user_id"], value_col="value", out_col="norm_value"
            ).collect()
        }
        assert out[1] == 0.0
        assert out[2] == 1.0
        assert out[3] == 0.5
        assert out[4] == 0.5 and out[5] == 0.5


class TestChunking:
    def test_chunk_tail_rule(self, spark, tmp_path):
        """Docs shorter than one chunk yield exactly one chunk; a final
        window that only adds overlap tokens is NOT emitted."""
        import os

        rows = [
            (1, " ".join(f"w{i}" for i in range(10))),    # 10 tokens -> 1 chunk
            (2, " ".join(f"w{i}" for i in range(64))),    # exactly one window -> 1
            (3, " ".join(f"w{i}" for i in range(65))),    # one token past window -> 2
            (4, " ".join(f"w{i}" for i in range(81))),    # well past -> 2 chunks
        ]
        docs = spark.createDataFrame(
            rows, "doc_id bigint, text string"
        ).withColumns({"lang": F.lit("en"), "source": F.lit("t"), "n_chars": F.length("text")})
        sf_dir = str(tmp_path / "chunks")
        os.makedirs(sf_dir, exist_ok=True)
        docs.write.mode("overwrite").parquet(os.path.join(sf_dir, "documents.parquet"))
        from ytspark.operators.text import doc_overlap_chunks

        out = doc_overlap_chunks(spark, sf_dir).collect()
        by_doc = {}
        for r in out:
            by_doc.setdefault(r["doc_id"], []).append(r)
        assert len(by_doc[1]) == 1 and by_doc[1][0]["n_chunk_tokens"] == 10
        assert len(by_doc[2]) == 1 and by_doc[2][0]["n_chunk_tokens"] == 64
        # a second chunk appears as soon as any token lies past the
        # first 64-token window (its 17 tokens = 16 overlap + 1 new)
        assert len(by_doc[3]) == 2
        assert sorted(r["n_chunk_tokens"] for r in by_doc[3]) == [17, 64]
        assert len(by_doc[4]) == 2
        # second chunk of doc 4 starts at token 48 (overlap 16 with first)
        second = sorted(by_doc[4], key=lambda r: r["chunk_idx"])[1]
        assert second["chunk_text"].split(" ")[0] == "w48"
        assert second["n_chunk_tokens"] == 81 - 48


class TestConnectedComponents:
    def test_components_converge_on_chain(self, spark):
        from ytspark.operators.dedup import connected_components

        # chain 1-2-3-4 plus isolated pair (10, 11): two components
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (10, 11)], "doc_a bigint, doc_b bigint"
        )
        labels = {
            r["node"]: r["label"]
            for r in connected_components(pairs, "doc_a", "doc_b").collect()
        }
        assert labels[1] == labels[2] == labels[3] == labels[4] == 1
        assert labels[10] == labels[11] == 10

    def test_connected_components_deep_chain_converges(self, spark):
        """r10 regression: the sf0.1 multi-SF sweep caught plain
        min-label propagation splitting components whose diameter
        exceeds the round bound (an edit-distance name chain). The
        Shiloach-Vishkin cluster hook must resolve a 2000-hop chain —
        ids ordered so the min sits at one END, the adversarial case
        for per-node propagation — within the default 15 rounds, one
        component, label = min id."""
        from pyspark.sql import functions as F

        from ytspark.operators.dedup import connected_components

        n = 2000
        pairs = (
            spark.range(1, n)
            .select(
                F.col("id").alias("doc_a"),
                (F.col("id") + 1).alias("doc_b"),
            )
        )
        labels = connected_components(pairs, "doc_a", "doc_b")
        assert labels.select("label").distinct().count() == 1
        assert labels.agg(F.max("label")).first()[0] == 1
        assert labels.count() == n

    def test_connected_components_raises_rather_than_splits(self, spark):
        """A graph that cannot converge within max_rounds must raise —
        silently returning split components corrupts every downstream
        dedup (the exact sf0.1 failure mode, now loud)."""
        import pytest
        from pyspark.sql import functions as F

        from ytspark.operators.dedup import connected_components

        pairs = (
            spark.range(1, 64)
            .select(
                F.col("id").alias("doc_a"),
                (F.col("id") + 1).alias("doc_b"),
            )
        )
        # local_edge_budget=0 forces the iterative path: the guard
        # under test lives there (the single-task union-find route is
        # exact by construction and never splits)
        with pytest.raises(RuntimeError, match="did not converge"):
            connected_components(
                pairs, "doc_a", "doc_b", max_rounds=1, local_edge_budget=0
            )

    def test_local_route_matches_iterative(self, spark):
        """The r12 scale-adaptive routing: below the edge budget CC
        runs as a single-task union-find. Its output must be
        bit-identical to the converged iterative propagation on an
        adversarial mix (chain with min at one end, star, isolated
        pair, self-loop, cross-links)."""
        from pyspark.sql import functions as F

        from ytspark.operators.dedup import connected_components

        edges = (
            [(i, i + 1) for i in range(2, 40)]  # chain, min at the end
            + [(100, t) for t in range(101, 110)]  # star
            + [(200, 201), (300, 300)]  # pair + self-loop
            + [(39, 1), (105, 108)]  # closes the chain onto node 1
        )
        pairs = spark.createDataFrame(edges, "doc_a bigint, doc_b bigint")
        local = {
            (r["node"], r["label"])
            for r in connected_components(pairs, "doc_a", "doc_b").collect()
        }
        iterative = {
            (r["node"], r["label"])
            for r in connected_components(
                pairs, "doc_a", "doc_b", local_edge_budget=0
            ).collect()
        }
        assert local == iterative
        # labels really are component minima
        assert {lbl for n, lbl in local if n <= 40} == {1}
        assert {lbl for n, lbl in local if 100 <= n < 200} == {100}

    def test_local_route_budget_boundary(self, spark):
        """Exactly-at-budget routes local; one-over routes iterative
        (and still converges) — both give the same labels."""
        from ytspark.operators.dedup import connected_components

        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (10, 11)], "doc_a bigint, doc_b bigint"
        )
        at = connected_components(
            pairs, "doc_a", "doc_b", local_edge_budget=3
        ).collect()
        over = connected_components(
            pairs, "doc_a", "doc_b", local_edge_budget=2
        ).collect()
        assert {(r["node"], r["label"]) for r in at} == {
            (r["node"], r["label"]) for r in over
        } == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)}


class TestPersistedLshIndex:
    def test_partition_pruning_and_multiprobe_recall(self, spark, sf_dir, tmp_path):
        import os

        from ytspark.operators.similarity import (
            knn_cosine_bruteforce,
            knn_from_index,
            persist_lsh_index,
        )
        from ytspark.session import load_tables

        emb = load_tables(spark, sf_dir, "embeddings")["embeddings"]
        path = str(tmp_path / "lsh_index")
        persist_lsh_index(emb, path)
        # index is physically partitioned by bucket
        assert len([d for d in os.listdir(path) if d.startswith("bucket=")]) > 1

        queries = emb.where(F.col("vec_id") < 10)
        hit0 = knn_from_index(spark, path, queries, probes=0)
        # the probe set reaches the scan as a partition filter
        plan = hit0._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan and "bucket" in plan

        import collections

        def topk(df):
            out = collections.defaultdict(set)
            for r in df.collect():
                out[r["query_id"]].add(r["neighbor_id"])
            return out

        bf = topk(knn_cosine_bruteforce(spark, sf_dir))
        r0 = topk(hit0)
        r1 = topk(knn_from_index(spark, path, queries, probes=1))

        def recall(a):
            return sum(len(bf[q] & a[q]) / len(bf[q]) for q in bf) / len(bf)

        # hamming-1 probing strictly widens the candidate set
        assert recall(r1) >= recall(r0)

    def test_registered_serving_queries_build_index_once(
        self, spark, sf_dir
    ):
        """r9: the registered serving queries amortize the index build
        (the documented 'bucket once, partition-prune forever' cost
        model) — a second invocation must NOT rewrite the index."""
        import os

        from ytspark.operators.similarity import (
            knn_cosine_ivf,
            knn_lsh_index_serving,
        )
        from ytspark.plans.scratch import scratch_dir

        for fn, tag in (
            (knn_lsh_index_serving, "lsh"),
            (knn_cosine_ivf, "ivf"),
        ):
            first = fn(spark, sf_dir).collect()
            marker = os.path.join(
                scratch_dir(f"{tag}_{sf_dir}"), "index", "_SUCCESS"
            )
            mtime = os.path.getmtime(marker)
            second = fn(spark, sf_dir).collect()
            assert os.path.getmtime(marker) == mtime, (
                f"{tag} index rebuilt on repeat invocation"
            )
            assert first == second


class TestPersistedIvfIndex:
    def test_pruned_probe_scan_and_recall(self, spark, sf_dir, tmp_path):
        import os

        from ytspark.operators.similarity import (
            knn_cosine_bruteforce,
            knn_from_ivf_index,
            persist_ivf_index,
        )
        from ytspark.session import load_tables

        emb = load_tables(spark, sf_dir, "embeddings")["embeddings"]
        path = str(tmp_path / "ivf_index")
        persist_ivf_index(emb, path)
        assert len([d for d in os.listdir(path) if d.startswith("cell=")]) > 1

        queries = emb.where(F.col("vec_id") < 10)
        hits = knn_from_ivf_index(spark, path, queries)
        plan = hits._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan and "cell" in plan

        import collections

        def topk(df):
            out = collections.defaultdict(set)
            for r in df.collect():
                out[r["query_id"]].add(r["neighbor_id"])
            return out

        bf = topk(knn_cosine_bruteforce(spark, sf_dir))
        iv = topk(hits)
        recall = sum(len(bf[q] & iv[q]) / len(bf[q]) for q in bf) / len(bf)
        # same 4/16-cell probe budget as the inline IVF query
        assert recall >= 0.3

    def test_distributed_probe_path_matches_driver_path(
        self, spark, sf_dir, tmp_path
    ):
        """Serving must not depend on which probe-assignment shape runs:
        forcing the batch over max_driver_batch switches to the
        distributed mapInPandas path, whose results must be identical
        to the driver-side (collected) path."""
        from ytspark.operators.similarity import (
            knn_from_ivf_index,
            persist_ivf_index,
        )
        from ytspark.session import load_tables

        emb = load_tables(spark, sf_dir, "embeddings")["embeddings"]
        path = str(tmp_path / "ivf_index2")
        persist_ivf_index(emb, path)
        queries = emb.where(F.col("vec_id") < 10)
        small = knn_from_ivf_index(spark, path, queries)
        big = knn_from_ivf_index(spark, path, queries, max_driver_batch=3)
        key = lambda r: (r["query_id"], r["neighbor_id"])  # noqa: E731
        assert sorted(map(key, small.collect())) == sorted(
            map(key, big.collect())
        )


class TestEmbBlockCount:
    def test_blocks_scale_with_corpus_bytes(self, spark, sf_dir):
        """The exact-GEMM grid derives from the optimizer's size stats:
        shrinking the per-task byte target must grow the block count
        (same corpus, more blocks), bounded by floor and cap."""
        from ytspark.operators.dedup import EMB_BLOCKS, emb_block_count
        from ytspark.session import load_tables

        emb = load_tables(spark, sf_dir, "embeddings")["embeddings"]
        # small SF: the floor wins at the production target
        assert emb_block_count(emb) == EMB_BLOCKS
        # tiny targets: block count grows monotonically with corpus/target
        b16k = emb_block_count(emb, target_bytes=16 << 10)
        b2k = emb_block_count(emb, target_bytes=2 << 10)
        assert b2k >= b16k > EMB_BLOCKS
        # the cap bounds the replication factor
        assert emb_block_count(emb, target_bytes=1, cap=64) == 64


class TestIncrementalMinhashStore:
    def test_new_batch_dedups_against_persisted_corpus(self, spark, tmp_path):
        from ytspark.operators.dedup import (
            incremental_minhash_dedup,
            persist_minhash_store,
        )

        base = "the quick brown fox jumps over the lazy dog " * 6
        corpus = spark.createDataFrame(
            [(1, base + "tail one"), (2, "completely different text body here " * 5)],
            "doc_id bigint, text string",
        )
        path = str(tmp_path / "mh_store")
        persist_minhash_store(corpus, path)

        # batch A: one near-dup of doc 1, one novel doc
        batch_a = spark.createDataFrame(
            [(10, base + "tail two"), (11, "novel content nothing alike " * 6)],
            "doc_id bigint, text string",
        )
        pairs_a = {
            (r["new_doc_id"], r["existing_doc_id"])
            for r in incremental_minhash_dedup(spark, batch_a, path).collect()
        }
        assert (10, 1) in pairs_a
        assert all(n != 11 for n, _ in pairs_a)  # novel doc matches nothing

        # batch B sees batch A through the appended store
        batch_b = spark.createDataFrame(
            [(20, "novel content nothing alike " * 6)], "doc_id bigint, text string"
        )
        pairs_b = {
            (r["new_doc_id"], r["existing_doc_id"])
            for r in incremental_minhash_dedup(spark, batch_b, path).collect()
        }
        assert (20, 11) in pairs_b
