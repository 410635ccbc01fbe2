"""Tests: suffix-array spans, dedup family, multimodal plumbing,
streaming sketch metrics."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from datasketches_server_spark.operators.dedup import (
    exact_dedup,
    ngram_jaccard_pairs,
    simhash_dedup_pairs,
)
from datasketches_server_spark.operators.multimodal import (
    extract_features,
    frame_sample_plan,
    synth_media,
)
from datasketches_server_spark.operators.similarity import ann_topk, cosine_topk
from datasketches_server_spark.operators.suffixarray import (
    attach_dup_spans,
    lcp_kasai,
    longest_common_substring,
    suffix_array,
)


# ----------------------------------------------------------- suffix array

def test_suffix_array_matches_naive():
    rng = np.random.default_rng(0)
    for _ in range(5):
        s = rng.integers(0, 4, size=50)
        sa = suffix_array(s)
        want = sorted(range(len(s)), key=lambda i: tuple(s[i:]))
        assert list(sa) == want
        lcp = lcp_kasai(s, sa)
        for i in range(1, len(s)):
            x, y = s[sa[i] :], s[sa[i - 1] :]
            k = 0
            while k < len(x) and k < len(y) and x[k] == y[k]:
                k += 1
            assert lcp[i] == k


def test_longest_common_substring():
    L, a0, b0 = longest_common_substring("hello world xyz", "say hello world")
    assert L == len("hello world")
    assert "hello world xyz"[a0 : a0 + L] == "say hello world"[b0 : b0 + L]
    L2, _, _ = longest_common_substring("abc", "xyz")
    assert L2 == 0
    L3, s3, t3 = longest_common_substring("abcdef", "zzabcdezz")
    assert L3 == 5 and s3 == 0 and t3 == 2


def test_attach_dup_spans(spark):
    convs = spark.createDataFrame(
        [("c1", "the quick brown fox jumps over the lazy dog"),
         ("c2", "xx the quick brown fox sleeps"),
         ("c3", "totally different words here")],
        ["conv_id", "full_text"],
    )
    edges = spark.createDataFrame([("c1", "c2", 0.5), ("c1", "c3", 0.1)], ["a", "b", "jaccard"])
    out = {(r["a"], r["b"]): r for r in attach_dup_spans(edges, convs).collect()}
    r12 = out[("c1", "c2")]
    assert r12["span_len"] == len("the quick brown fox ")
    assert r12["span_frac"] > 0.5
    assert out[("c1", "c3")]["span_len"] <= 4  # only incidental char overlap


# ------------------------------------------------------------ dedup family

def test_exact_dedup(spark):
    df = spark.createDataFrame(
        [(1, "Hello, World!"), (2, "hello world"), (3, "something else")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in exact_dedup(df).collect()}
    assert out[1]["keeper_id"] == 1 and out[2]["keeper_id"] == 1  # same normalized fp
    assert out[2]["is_duplicate"] and not out[1]["is_duplicate"]
    assert not out[3]["is_duplicate"]


def test_simhash_dedup_pairs(spark):
    state = spark.createDataFrame(
        [("a", 0b1111000011110000), ("b", 0b1111000011110001), ("c", -4242424242424242)],
        ["conv_id", "simhash"],
    )
    pairs = simhash_dedup_pairs(state, max_hamming=3).collect()
    assert [(p["a"], p["b"], p["hamming"]) for p in pairs] == [("a", "b", 1)]


def test_ngram_jaccard_pairs(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "a b c d e f g x"), (3, "q w e r t y u i")],
        ["doc_id", "text"],
    )
    pairs = ngram_jaccard_pairs(df, threshold=0.4).collect()
    assert len(pairs) == 1 and pairs[0]["a"] == 1 and pairs[0]["b"] == 2


# -------------------------------------------------------------- similarity

def test_ann_recall_vs_bruteforce(spark):
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 5)
    exact = cosine_topk(emb, queries, k=10)
    # synthetic embeddings are ~isotropic (the LSH worst case): recall
    # comes from multi-probe, not from shallow codes
    approx = ann_topk(emb, queries, k=10, n_tables=24, n_bits=6, probe_radius=1)
    e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.9, f"ANN recall {recall}"


def test_ivf_recall_vs_bruteforce(spark):
    """IVF tier (r5): nprobe=12 of 16 lists on ~isotropic synthetic
    embeddings (the coarse-quantizer worst case -- recall ~ nprobe/
    n_lists on structureless data).  Same deterministic query set as the
    q64 contract (vec_id % 25 == 0, 20 queries); the implementation
    measures mean recall 0.94 here, asserted with a small margin.  (A
    5-query window of the same run reads 0.86 -- per-query variance on
    isotropic data is real, which is why the contract bounds the MEAN
    plus a 0.5 per-query floor.)"""
    from datasketches_server_spark.operators.similarity import ivf_topk

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    queries = emb.where(F.col("vec_id") % 25 == 0)
    exact = cosine_topk(emb, queries, k=10)
    approx = ivf_topk(emb, queries, k=10, n_lists=16, nprobe=12, n_iters=2)
    e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.9, f"IVF recall {recall}"


def test_ivf_list_cap_bounds_candidates(spark):
    """A degenerate corpus (every vector identical -> one list) stays
    bounded: list_cap caps the inverted list, and results still return
    k rows per query from the capped candidates."""
    from datasketches_server_spark.operators.similarity import ivf_topk

    base = [0.5] * 8
    rows = [(i, [v + (0.001 * (i % 3)) for v in base]) for i in range(200)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = emb.where(F.col("vec_id") == 0)
    got = ivf_topk(emb, queries, k=5, n_lists=4, nprobe=1, n_iters=1, list_cap=20)
    assert got.count() == 5  # k results from <= list_cap candidates


# -------------------------------------------------------------- multimodal

def test_multimodal_features(spark):
    media = synth_media(spark, n=64)
    feats = extract_features(media, dim=16).collect()
    assert len(feats) == 64
    assert all(len(r["feature"]) == 16 for r in feats)
    # deterministic across runs
    again = extract_features(synth_media(spark, n=64), dim=16).collect()
    m1 = {r["media_id"]: list(r["feature"]) for r in feats}
    m2 = {r["media_id"]: list(r["feature"]) for r in again}
    assert m1 == m2


def test_frame_sample_plan(spark):
    media = synth_media(spark, n=64)
    plan = frame_sample_plan(media, every_ms=60000)
    rows = plan.groupBy("media_id").count().collect()
    assert rows and all(r["count"] >= 1 for r in rows)


def test_codec_roundtrips():
    """Real decode kernels: every uncompressed codec round-trips its
    encoder (Y4M bit-exact in YUV space, +-2/255 through RGB from 8-bit
    BT.601 quantization); no Spark involved."""
    import numpy as np

    from datasketches_server_spark.operators import codecs as C

    img = (np.arange(5 * 7 * 3).reshape(5, 7, 3) % 256).astype(np.uint8)
    assert np.array_equal(C.decode_ppm(C.encode_ppm(img)), img)
    gray = (np.arange(5 * 7).reshape(5, 7) % 256).astype(np.uint8)
    assert np.array_equal(C.decode_ppm(C.encode_ppm(gray)), gray)
    commented = b"P6\n# c1\n7 5\n# c2\n255\n" + img.tobytes()
    assert np.array_equal(C.decode_ppm(commented), img)
    assert np.array_equal(C.decode_bmp(C.encode_bmp(img)), img)  # odd width -> row padding

    mono = ((np.arange(1000) * 37) % 60001 - 30000).astype(np.int16)
    got, rate = C.decode_wav(C.encode_wav(mono, 8000))
    assert rate == 8000 and np.array_equal(got, mono)
    stereo = np.stack([mono, -mono], axis=1).astype(np.int16)
    got2, _ = C.decode_wav(C.encode_wav(stereo, 44100))
    assert np.array_equal(got2, stereo)

    frames = (np.arange(4 * 6 * 8 * 3).reshape(4, 6, 8, 3) % 256).astype(np.uint8)
    enc = C.encode_y4m(frames, fps=10, space="yuv")
    assert C.y4m_frame_count(enc) == 4
    assert all(
        np.array_equal(C.decode_y4m_frame(enc, i, space="yuv"), frames[i]) for i in range(4)
    )
    enc_rgb = C.encode_y4m(frames, fps=10, space="rgb")
    for i in range(4):
        delta = C.decode_y4m_frame(enc_rgb, i).astype(int) - frames[i].astype(int)
        assert np.abs(delta).max() <= 2

    assert np.array_equal(C.resize_nearest(img, 5, 7), img)
    down = C.resize_nearest(np.arange(16).reshape(4, 4).astype(np.uint8), 2, 2)
    assert np.array_equal(down, np.array([[5, 7], [13, 15]], dtype=np.uint8))
    const = np.full(800, 16384, dtype=np.int16)
    assert np.allclose(C.audio_features(const, 8), 0.5, atol=1e-4)  # RMS of constant


def test_real_media_features(spark):
    """The REAL decode path end-to-end: synth_real_media emits actual
    PPM/BMP/WAV/Y4M payloads inside mapInPandas; extract_features decodes
    them with the numpy codecs; the Spark-side feature equals a
    driver-side decode of the same payload."""
    import numpy as np

    from datasketches_server_spark.operators.multimodal import (
        decode_features,
        synth_real_media,
    )

    media = synth_real_media(spark, n=48)
    rows = media.collect()
    assert {r["kind"] for r in rows} == {"image", "audio", "video"}
    assert {r["mime"] for r in rows} >= {
        "image/x-portable-pixmap",
        "image/bmp",
        "audio/wav",
        "video/x-yuv4mpeg",
    }
    feats = {r["media_id"]: r["feature"] for r in extract_features(media, dim=16).collect()}
    assert len(feats) == 48
    for r in rows:
        want = decode_features(r["kind"], r["mime"], bytes(r["payload"]), 16)
        assert np.allclose(np.asarray(feats[r["media_id"]], dtype=np.float32), want)


# --------------------------------------------------------------- streaming

def test_streaming_windowed_sketches(spark, tmp_path):
    from datasketches_server_spark.streaming.incremental import (
        append_metrics_foreachBatch,
        merged_view,
        windowed_sketch_stream,
    )

    src = str(tmp_path / "stream_src")
    out = str(tmp_path / "metrics")
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(ev.schema).parquet(src)
    windowed = windowed_sketch_stream(stream)
    # complete mode so windows still open at end-of-input are emitted too
    q = (
        windowed.writeStream.outputMode("complete")
        .format("memory")
        .queryName("win_metrics")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.sql(
        "SELECT window_start, event_type, theta_sketch_estimate(theta_items) AS d, n_events "
        "FROM win_metrics"
    )
    assert got.count() > 0
    total_events = got.agg(F.sum("n_events")).collect()[0][0]
    assert total_events == ev.count()

    q2 = append_metrics_foreachBatch(stream, out).queryName("acc").start()
    q2.processAllAvailable()
    q2.stop()
    merged = {r["event_type"]: r for r in merged_view(spark, out).collect()}
    truth = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("d"), F.count("*").alias("n"))
        .collect()
    }
    for et, t in truth.items():
        assert merged[et]["n_events"] == t["n"]
        assert merged[et]["distinct_items"] == pytest.approx(t["d"], rel=0.03)


def test_prune_verify_modes_agree(spark):
    """prune_verify True / False / auto must produce identical edges --
    pruning is a plan optimization, never a semantic change."""
    from datasketches_server_spark.plans.pipeline import dedup_pipeline
    from datasketches_server_spark.sources.synth import synth_transcripts

    t = synth_transcripts(spark, n_convs=300, seed=3, dup_fraction=0.1)
    outs = []
    for mode in (False, True, "auto"):
        res = dedup_pipeline(t, prune_verify=mode)
        outs.append({(r["a"], r["b"]) for r in res.edges.collect()})
        res.unpersist()
    assert outs[0] == outs[1] == outs[2]


def test_streaming_stateful_exact_dedup(spark, tmp_path):
    """Custom stateful streaming operator (applyInPandasWithState):
    only the first occurrence of each fingerprint survives, across
    micro-batches (state persists between batches)."""
    from datasketches_server_spark.streaming.incremental import streaming_exact_dedup

    src = str(tmp_path / "dedup_src")
    ckpt = str(tmp_path / "ckpt")
    rows1 = [(f"d{i}", f"text number {i % 6}") for i in range(12)]  # 6 uniques, 12 rows
    df1 = spark.createDataFrame(rows1, "doc_id string, text string")
    df1.coalesce(1).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(df1.schema).parquet(src)
    deduped = streaming_exact_dedup(stream, n_buckets=8)
    q = (
        deduped.writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .format("memory")
        .queryName("dedup_out")
        .start()
    )
    q.processAllAvailable()
    assert spark.sql("SELECT count(*) FROM dedup_out").collect()[0][0] == 6

    # second batch: 3 repeats of old texts + 2 new -> only the new emit
    rows2 = [("x1", "text number 0"), ("x2", "text number 1"), ("x3", "text number 5"),
             ("x4", "brand new text a"), ("x5", "brand new text b")]
    spark.createDataFrame(rows2, "doc_id string, text string").coalesce(1).write.mode(
        "append"
    ).parquet(src)
    q.processAllAvailable()
    q.stop()
    out = spark.sql("SELECT doc_id FROM dedup_out").collect()
    ids = {r["doc_id"] for r in out}
    assert len(out) == 8  # 6 + 2 new
    assert {"x4", "x5"} <= ids and not ({"x1", "x2", "x3"} & ids)


def test_streaming_near_dup_pairs_across_batches(spark, tmp_path):
    """Streaming LSH near-dup tier: a pair is detected when its second
    member arrives, even in a LATER micro-batch (band-bucket state)."""
    from datasketches_server_spark.streaming.incremental import streaming_near_dup_pairs

    src = str(tmp_path / "nd_src")
    ckpt = str(tmp_path / "nd_ckpt")
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4
    other = "one two three four five six seven eight nine ten " * 4
    batch1 = [("c1", base), ("c2", other)]
    df1 = spark.createDataFrame(batch1, "conv_id string, full_text string")
    df1.coalesce(1).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(df1.schema).parquet(src)
    pairs = streaming_near_dup_pairs(stream, threshold=0.7)
    q = (
        pairs.writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .format("memory").queryName("nd_out").start()
    )
    q.processAllAvailable()
    assert spark.sql("SELECT count(*) FROM nd_out").collect()[0][0] == 0

    # second batch: a near-copy of c1 arrives -> (c1, c3) fires
    batch2 = [("c3", base + "alpha beta"), ("c4", "unrelated words entirely different " * 6)]
    spark.createDataFrame(batch2, "conv_id string, full_text string").coalesce(1).write.mode(
        "append"
    ).parquet(src)
    q.processAllAvailable()
    q.stop()
    got = spark.sql("SELECT DISTINCT a, b FROM nd_out").collect()
    assert {(r["a"], r["b"]) for r in got} == {("c1", "c3")}


# ----------------------------------------------------- embedding near-dups

def test_embedding_lsh_near_dups_recall_vs_exact(spark, sf_dir):
    """Hyperplane-LSH near-dup pairs must recover >= 90% of the exact
    brute-force cosine pairs at the same threshold (and no false
    positives: every emitted pair is exact-cosine >= threshold by
    construction of the rerank)."""
    from datasketches_server_spark.operators.similarity import (
        cosine,
        embedding_near_dup_pairs,
    )
    from pyspark.sql import functions as F

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    found = embedding_near_dup_pairs(e, threshold=0.5, n_tables=24, n_bits=6, probe_radius=1)
    fset = {(r["a"], r["b"]) for r in found.collect()}
    ea = e.select(F.col("vec_id").alias("a"), F.col("embedding").alias("emb_a"))
    eb = e.select(F.col("vec_id").alias("b"), F.col("embedding").alias("emb_b"))
    exact = (
        ea.join(eb, F.col("a") < F.col("b"))
        .select("a", "b", cosine(F.col("emb_a"), F.col("emb_b")).alias("c"))
        .where(F.col("c") >= 0.5)
    )
    oset = {(r["a"], r["b"]) for r in exact.collect()}
    assert fset <= oset, "false positives escaped the exact rerank"
    if oset:
        assert len(fset & oset) / len(oset) >= 0.9


def test_brute_force_guard_trips(spark):
    """VERDICT #10: the O(n^2) tiers refuse large inputs instead of
    silently launching a cartesian."""
    import pytest
    from datasketches_server_spark.operators.dedup import (
        hashed_bow_near_dup_pairs,
        ngram_jaccard_pairs,
    )

    df = spark.range(50).select(
        F.col("id").alias("doc_id"), F.lit("some words here").alias("text")
    )
    with pytest.raises(ValueError, match="brute-force guard"):
        ngram_jaccard_pairs(df, max_rows=10)
    with pytest.raises(ValueError, match="brute-force guard"):
        hashed_bow_near_dup_pairs(df, max_rows=10)
    assert ngram_jaccard_pairs(df, max_rows=100).count() >= 0  # under guard: runs


def test_pipeline_unpersist_releases_cache(spark):
    """VERDICT #9 / ADVICE: repeated pipeline invocations must not
    accumulate cached relations once the caller releases the result."""
    from datasketches_server_spark.plans.pipeline import dedup_pipeline
    from datasketches_server_spark.sources.synth import synth_transcripts

    jsc = spark.sparkContext._jsc.sc()
    spark.catalog.clearCache()
    base = jsc.getPersistentRDDs().size()
    for seed in (1, 2, 3):
        t = synth_transcripts(spark, n_convs=100, seed=seed)
        res = dedup_pipeline(t)
        res.clusters.count()
        res.unpersist()
    assert jsc.getPersistentRDDs().size() <= base, "cached relations leaked"


def test_hashed_bow_near_dups_finds_planted_dups(spark):
    """Exact-duplicate texts must score cosine 1.0; unrelated texts must
    not appear at a 0.9 threshold."""
    from datasketches_server_spark.operators.dedup import hashed_bow_near_dup_pairs

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),
        (3, "the quick brown fox jumps over the lazy cat"),
        (4, "completely different words about spark shuffle partitions"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {(r["a"], r["b"]): r["cosine"] for r in hashed_bow_near_dup_pairs(df).collect()}
    assert out[(1, 2)] == 1.0
    assert (1, 3) in out and out[(1, 3)] >= 0.9
    assert not any(4 in p for p in out)


def test_streaming_metrics_epoch_replay_is_idempotent(spark, tmp_path):
    """Round-3 task #3: foreachBatch is at-least-once -- a replayed
    epoch must overwrite its own partition, not append a duplicate, so
    the merged estimate is unchanged under retry."""
    from datasketches_server_spark.streaming.incremental import (
        append_metrics_batch,
        merged_view,
    )

    out = str(tmp_path / "metrics_replay")
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    half1 = ev.where(F.col("user_id") % 2 == 0)
    half2 = ev.where(F.col("user_id") % 2 == 1)

    append_metrics_batch(half1, 0, out)
    append_metrics_batch(half2, 1, out)
    before = {r["event_type"]: (r["n_events"], r["distinct_items"])
              for r in merged_view(spark, out).collect()}

    # forced double-fire: epoch 1 replays (same data, same epoch_id)
    append_metrics_batch(half2, 1, out)
    after = {r["event_type"]: (r["n_events"], r["distinct_items"])
             for r in merged_view(spark, out).collect()}
    assert after == before

    truth = {r["event_type"]: r["n"]
             for r in ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    assert {k: v[0] for k, v in after.items()} == truth


def test_metrics_compaction_preserves_estimates_and_drops_files(spark, tmp_path):
    """Round-4 task #3 (SURVEY §2.1 #24 'append + periodic
    compaction-merge'): compacting epochs <= N into one base row must
    leave every merged estimate unchanged, shrink the partition count,
    be idempotent under re-run, and keep folding correctly as new
    epochs arrive after the compaction."""
    import os

    from datasketches_server_spark.streaming.incremental import (
        append_metrics_batch,
        compact_metrics,
        merged_view,
    )

    out = str(tmp_path / "metrics_compact")
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    for epoch in range(4):
        append_metrics_batch(ev.where(F.col("user_id") % 4 == epoch), epoch, out)

    def snapshot():
        return {r["event_type"]: (r["n_events"], r["distinct_items"])
                for r in merged_view(spark, out).collect()}

    def epoch_dirs():
        return sorted(d for d in os.listdir(out) if d.startswith("epoch_id="))

    before = snapshot()
    assert len(epoch_dirs()) == 4

    r1 = compact_metrics(spark, out, through_epoch=2)
    assert r1["folded_epochs"] == 3 and not r1["noop"]
    assert snapshot() == before
    # base partition + the un-compacted tail epoch only
    assert epoch_dirs() == ["epoch_id=-1", "epoch_id=3"]

    # idempotent re-run: no-op, nothing changes
    r2 = compact_metrics(spark, out, through_epoch=2)
    assert r2["noop"] and snapshot() == before

    # new epochs after compaction fold into the existing base
    append_metrics_batch(ev.where(F.col("user_id") % 4 == 0), 4, out)  # replayed data
    after_append = snapshot()
    r3 = compact_metrics(spark, out, through_epoch=4)
    assert r3["folded_epochs"] == 2 and not r3["noop"]
    assert snapshot() == after_append
    assert epoch_dirs() == ["epoch_id=-1"]

    # exact counts still reconcile with the raw table (epochs 0-3
    # partition ev disjointly; epoch 4 duplicated a quarter of events
    # in a NEW epoch, so n_events counts it twice -- by design, the
    # exactly-once guarantee is per epoch_id)
    truth = {r["event_type"]: r["n"] for r in
             ev.union(ev.where(F.col("user_id") % 4 == 0))
             .groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    assert {k: v[0] for k, v in snapshot().items()} == truth


def test_metrics_compaction_crash_between_write_and_cleanup(spark, tmp_path):
    """Crash-safety: if the base row is written but the folded epoch
    partitions were NOT removed (crash mid-compaction), readers must not
    double-count -- the watermark makes folded epochs invisible -- and
    the next compaction removes the leftovers."""
    import os
    import shutil

    from datasketches_server_spark.streaming.incremental import (
        append_metrics_batch,
        compact_metrics,
        merged_view,
    )

    out = str(tmp_path / "metrics_crash")
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    for epoch in range(3):
        append_metrics_batch(ev.where(F.col("user_id") % 3 == epoch), epoch, out)
    before = {r["event_type"]: (r["n_events"], r["distinct_items"])
              for r in merged_view(spark, out).collect()}

    # simulate the crash: run a real compaction, then RESTORE the folded
    # epoch partitions from a copy taken beforehand
    saved = str(tmp_path / "saved_epochs")
    os.makedirs(saved)
    for d in os.listdir(out):
        if d.startswith("epoch_id=") and not d.endswith("=-1"):
            shutil.copytree(os.path.join(out, d), os.path.join(saved, d))
    compact_metrics(spark, out, through_epoch=2)
    for d in os.listdir(saved):
        shutil.copytree(os.path.join(saved, d), os.path.join(out, d))

    # leftovers present on disk, invisible to readers
    assert len([d for d in os.listdir(out) if d.startswith("epoch_id=")]) == 4
    after = {r["event_type"]: (r["n_events"], r["distinct_items"])
             for r in merged_view(spark, out).collect()}
    assert after == before

    # the next (no-op) compaction sweeps them
    r = compact_metrics(spark, out, through_epoch=2)
    assert r["noop"] and r["removed_partitions"] == 3
    assert [d for d in os.listdir(out) if d.startswith("epoch_id=")] == ["epoch_id=-1"]


def test_metrics_compaction_edge_cases(spark, tmp_path):
    """through_epoch past the max epoch folds everything but records the
    watermark CLAMPED to the highest epoch actually present (code-review
    r4: an over-shot watermark would hide and then delete every future
    epoch below it); re-runs are no-ops; below-watermark requests never
    regress it; epochs arriving after an over-shot request stay
    visible."""
    from datasketches_server_spark.streaming.incremental import (
        append_metrics_batch,
        compact_metrics,
        merged_view,
    )

    out = str(tmp_path / "metrics_edge")
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    append_metrics_batch(ev.where(F.col("user_id") % 2 == 0), 0, out)
    append_metrics_batch(ev.where(F.col("user_id") % 2 == 1), 1, out)
    before = {r["event_type"]: (r["n_events"], r["distinct_items"])
              for r in merged_view(spark, out).collect()}

    r = compact_metrics(spark, out, through_epoch=100)  # beyond max epoch
    assert r["folded_epochs"] == 2
    assert r["compacted_through"] == 1  # clamped to the max present epoch
    snap = {r2["event_type"]: (r2["n_events"], r2["distinct_items"])
            for r2 in merged_view(spark, out).collect()}
    assert snap == before

    r2 = compact_metrics(spark, out, through_epoch=100)
    assert r2["noop"]
    r3 = compact_metrics(spark, out, through_epoch=0)  # below watermark
    assert r3["noop"] and r3["compacted_through"] == 1
    snap2 = {r4["event_type"]: (r4["n_events"], r4["distinct_items"])
             for r4 in merged_view(spark, out).collect()}
    assert snap2 == before

    # the data-loss scenario the clamp prevents: an epoch written AFTER
    # the over-shot request must stay visible and foldable
    append_metrics_batch(ev.where(F.col("user_id") % 2 == 0), 2, out)
    with_late = {r5["event_type"]: r5["n_events"]
                 for r5 in merged_view(spark, out).collect()}
    assert any(with_late[k] > before[k][0] for k in with_late)  # epoch 2 counted
    r4_ = compact_metrics(spark, out, through_epoch=2)
    assert r4_["folded_epochs"] == 1 and r4_["compacted_through"] == 2
    after_fold = {r6["event_type"]: r6["n_events"]
                  for r6 in merged_view(spark, out).collect()}
    assert after_fold == with_late


def test_streaming_near_dup_state_is_capped(spark, tmp_path):
    """Round-3 task #6: bucket state holds at most bucket_cap members --
    members past the cap still MATCH against stored state but are not
    stored, so a mega-family's pair volume stays linear."""
    from datasketches_server_spark.streaming.incremental import streaming_near_dup_pairs

    src = str(tmp_path / "cap_src")
    ckpt = str(tmp_path / "cap_ckpt")
    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4
    batch1 = [(f"d{i}", text) for i in range(1, 5)]  # fills cap exactly
    df1 = spark.createDataFrame(batch1, "conv_id string, full_text string")
    df1.coalesce(1).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(df1.schema).parquet(src)
    pairs = streaming_near_dup_pairs(stream, threshold=0.7, bucket_cap=4)
    q = (
        pairs.writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .format("memory").queryName("cap_out").start()
    )
    q.processAllAvailable()
    # 4 stored members -> all C(4,2) pairs
    got1 = {(r["a"], r["b"]) for r in spark.sql("SELECT DISTINCT a, b FROM cap_out").collect()}
    assert len(got1) == 6

    # two more identical docs: each matches the 4 STORED members (4
    # pairs each) but is not stored -- so (d5, d6) must NOT appear
    batch2 = [("d5", text), ("d6", text)]
    spark.createDataFrame(batch2, "conv_id string, full_text string").coalesce(1).write.mode(
        "append"
    ).parquet(src)
    q.processAllAvailable()
    q.stop()
    got = {(r["a"], r["b"]) for r in spark.sql("SELECT DISTINCT a, b FROM cap_out").collect()}
    assert len(got) == 14  # 6 + 2*4
    assert ("d5", "d6") not in got


class _FakeGroupState:
    """Minimal GroupState double for unit-testing the stateful kernel."""

    def __init__(self, value=None, timed_out=False):
        self._v = value
        self.hasTimedOut = timed_out
        self.removed = False
        self.timeout_ms = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v

    def remove(self):
        self._v, self.removed = None, True

    def setTimeoutDuration(self, ms):
        self.timeout_ms = ms


def test_near_dup_match_fn_ttl_eviction_and_cap():
    """Round-3 task #6 (unit level): timed-out buckets drop their state;
    live buckets cap at bucket_cap with an O(cap) buffer; the TTL is
    re-armed on every update."""
    import pandas as pd

    from datasketches_server_spark.streaming.incremental import make_near_dup_match_fn

    fn = make_near_dup_match_fn(num_perm=4, threshold=0.5, bucket_cap=2, state_ttl_minutes=1)

    # timed-out call: state removed, nothing emitted
    st = _FakeGroupState(value=(["x"], [1, 2, 3, 4]), timed_out=True)
    assert list(fn((0,), iter([]), st)) == []
    assert st.removed and not st.exists

    # live call: 3 identical members, cap 2 -> c3 matches both stored
    # members but is NOT stored; TTL re-armed
    pdf = pd.DataFrame({"conv_id": ["c1", "c2", "c3"], "minhash": [[7, 7, 7, 7]] * 3})
    st2 = _FakeGroupState()
    out = pd.concat(list(fn((5,), iter([pdf]), st2)))
    assert {(r.a, r.b) for r in out.itertuples()} == {("c1", "c2"), ("c1", "c3"), ("c2", "c3")}
    ids, sigs = st2.get
    # state is the FLAT Arrow-native layout: cnt * num_perm longs
    assert ids == ["c1", "c2"] and sigs == [7, 7, 7, 7, 7, 7, 7, 7]
    assert st2.timeout_ms == 60_000


def test_near_dup_match_fn_tolerates_oversized_restored_state():
    """ADVICE r3: restored state holding MORE than bucket_cap members
    (cap lowered across a restart) must degrade gracefully -- oversized
    members still match, no new members are stored -- instead of
    crashing the query on a buffer-shape error."""
    import pandas as pd

    from datasketches_server_spark.streaming.incremental import make_near_dup_match_fn

    fn = make_near_dup_match_fn(num_perm=2, threshold=0.5, bucket_cap=2, state_ttl_minutes=None)
    # 3 stored members, cap is 2 (flat layout: 3 * 2 longs)
    st = _FakeGroupState(value=(["x1", "x2", "x3"], [9, 9, 9, 9, 9, 9]))
    pdf = pd.DataFrame({"conv_id": ["y"], "minhash": [[9, 9]]})
    out = pd.concat(list(fn((1,), iter([pdf]), st)))
    # y matched ALL THREE oversized members ...
    assert {(r.a, r.b) for r in out.itertuples()} == {("x1", "y"), ("x2", "y"), ("x3", "y")}
    # ... and was not stored (state stays at its oversized 3, never grows)
    ids, sigs = st.get
    assert ids == ["x1", "x2", "x3"] and len(sigs) == 6


def test_verify_near_dup_pairs_dedups_and_kills_false_positives(spark):
    """Round-4 task #9: the shipped downstream verify join must dedup
    multi-bucket emissions and drop pairs whose EXACT jaccard is below
    threshold, keeping true near-dups with their exact score."""
    from datasketches_server_spark.config import DEFAULT_CONFIG
    from datasketches_server_spark.plans.pipeline import conv_signatures
    from datasketches_server_spark.sources.synth import synth_transcripts
    from datasketches_server_spark.streaming.incremental import verify_near_dup_pairs

    t = synth_transcripts(spark, n_convs=60, seed=5)
    state = conv_signatures(t, DEFAULT_CONFIG)

    # one true exact-dup pair from the planted families, one bogus pair
    from datasketches_server_spark.plans.pipeline import dedup_pipeline

    res = dedup_pipeline(t, DEFAULT_CONFIG)
    true_pair = res.edges.orderBy("a", "b").limit(1).collect()[0]
    ids = sorted(r["conv_id"] for r in state.select("conv_id").collect())
    # a pair of two unrelated convs: last two ids, unless they happen to
    # be the true pair (deterministic corpus; they are not)
    bogus = (ids[-1], ids[-2]) if ids[-1] < ids[-2] else (ids[-2], ids[-1])
    bogus_edge = res.edges.where(
        (F.col("a") == bogus[0]) & (F.col("b") == bogus[1])
    ).count()

    pairs = spark.createDataFrame(
        [
            (true_pair["a"], true_pair["b"], 0.9, 1),
            (true_pair["a"], true_pair["b"], 0.9, 7),   # same pair, 2nd bucket
            (bogus[0], bogus[1], 0.71, 3),              # estimate lied
        ],
        "a string, b string, est_jaccard double, bucket long",
    )
    got = verify_near_dup_pairs(pairs, state, threshold=0.7).collect()
    got_pairs = [(r["a"], r["b"]) for r in got]
    assert got_pairs.count((true_pair["a"], true_pair["b"])) == 1  # deduped
    if bogus_edge == 0:
        assert (bogus[0], bogus[1]) not in got_pairs  # false positive killed
    assert all(r["jaccard"] >= 0.7 for r in got)
    res.unpersist()


def test_flat_state_layout_micro_benchmark():
    """Round-4 task #5: the flat long-array state round-trip must beat
    the nested list-of-lists layout it replaced (cap x perm Python-int
    conversions per group per batch)."""
    import time

    import numpy as np

    cap, perm = 256, 128
    buf = np.arange(cap * perm, dtype=np.int64).reshape(cap, perm)

    def run(f, n=20):
        best = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            f()
            best = min(best, time.perf_counter() - t0)
        return best

    t_nested = run(lambda: [list(map(int, r)) for r in buf])      # old layout
    t_flat = run(lambda: buf.ravel().tolist())                    # new layout
    # the flat path is typically 10-50x faster; assert a conservative 2x
    assert t_flat * 2 < t_nested, (t_flat, t_nested)
    # and the decode side reshapes losslessly
    flat = buf.ravel().tolist()
    assert (np.asarray(flat, dtype=np.int64).reshape(-1, perm) == buf).all()


def test_prune_auto_counts_members_not_pairs(spark):
    """Round-3 task #9: the auto heuristic must measure DISTINCT pair
    members, not 2*pairs -- a few mega-families have pairs ~ members^2/2,
    and the old proxy wrongly skipped a profitable prune there."""
    from datasketches_server_spark.plans.pipeline import dedup_pipeline
    from datasketches_server_spark.sources.synth import synth_transcripts

    # 2 mega-families of 50 among 800 convs: members ~100 (well under
    # corpus/2 -> prune pays) but pairs ~2*C(50,2)=2450 (the 2*pairs
    # proxy would have said 4900 > 400 -> skip)
    # probe_min_convs=0 forces the probe on this miniature corpus (the
    # r6 default skips it below 20k convs, where either plan is trivial)
    t = synth_transcripts(spark, n_convs=800, seed=9, dup_fraction=0.125, avg_family_size=50)
    res = dedup_pipeline(t, prune_verify="auto", probe_min_convs=0)
    assert res.pruned_verify is True
    res.unpersist()

    # dup-dense corpus (every conv in a small family): pair members are
    # the majority of the corpus -> pruning is pure cost
    t2 = synth_transcripts(spark, n_convs=800, seed=9, dup_fraction=1.0, avg_family_size=4)
    res2 = dedup_pipeline(t2, prune_verify="auto", probe_min_convs=0)
    assert res2.pruned_verify is False
    res2.unpersist()


def test_read_transcripts_jsonl_quarantine(spark, tmp_path):
    """Typed JSONL ingest: clean rows come back on the contract schema;
    broken lines and key-field-less rows land in the quarantine."""
    from datasketches_server_spark.sources.io import read_transcripts_jsonl

    src = tmp_path / "in.jsonl"
    src.write_text(
        "\n".join(
            [
                '{"conv_id":"c1","turn_idx":0,"role":"user","text":"hi","tool":null,'
                '"ts":"2024-06-01T00:00:00Z"}',
                '{"conv_id":"c1","turn_idx":1,"role":"assistant","text":"yo","tool":"search",'
                '"ts":"2024-06-01T00:00:01Z"}',
                "this is not json at all {",
                '{"role":"user","text":"no ids here"}',
                '{"conv_id":"c2","turn_idx":"zero","role":"user","text":"bad idx type"}',
            ]
        )
    )
    qdir = str(tmp_path / "quarantine")
    got = read_transcripts_jsonl(spark, str(src), quarantine=qdir)
    rows = sorted((r["conv_id"], r["turn_idx"]) for r in got.collect())
    assert rows == [("c1", 0), ("c1", 1)]
    assert [f.name for f in got.schema.fields] == [
        "conv_id", "turn_idx", "role", "text", "tool", "ts",
    ]
    bad = spark.read.text(qdir).count()
    assert bad == 3


def test_streaming_pair_sink_replay_is_idempotent(spark, tmp_path):
    """Verdict r4 #7: the near-dup PAIR sink gets the same exactly-once
    epoch-overwrite contract as the metrics sink -- a forced double-fire
    of an epoch leaves the log and the deduped view unchanged, and a
    legitimate cross-epoch re-emission of the same pair collapses in the
    reader."""
    from datasketches_server_spark.streaming.incremental import (
        near_dup_pairs_batch,
        read_near_dup_pairs,
    )

    out = str(tmp_path / "pair_sink")
    e0 = spark.createDataFrame(
        [("c1", "c2", 0.9, 7), ("c3", "c4", 0.8, 9)],
        "a string, b string, est_jaccard double, bucket long",
    )
    e1 = spark.createDataFrame(
        [("c1", "c2", 0.95, 11), ("c5", "c6", 0.75, 7)],  # c1-c2 again, other bucket
        "a string, b string, est_jaccard double, bucket long",
    )
    near_dup_pairs_batch(e0, 0, out)
    near_dup_pairs_batch(e1, 1, out)
    raw_before = spark.read.parquet(out).count()
    view_before = {(r["a"], r["b"]): (r["est_jaccard"], r["first_epoch"])
                   for r in read_near_dup_pairs(spark, out).collect()}

    # forced double-fire: epoch 1 replays (same data, same epoch_id)
    near_dup_pairs_batch(e1, 1, out)
    assert spark.read.parquet(out).count() == raw_before  # no replay rows
    view_after = {(r["a"], r["b"]): (r["est_jaccard"], r["first_epoch"])
                  for r in read_near_dup_pairs(spark, out).collect()}
    assert view_after == view_before

    # semantic dedup: c1-c2 emitted in both epochs -> one row, first
    # epoch kept, best estimate kept
    assert view_after[("c1", "c2")] == (0.95, 0)
    assert len(view_after) == 3


def test_cli_compact_metrics_mode(spark, tmp_path):
    """Verdict r4 #4: --compact-metrics drives the metrics append-log
    compaction from the CLI; merged estimates are unchanged."""
    import json
    from contextlib import redirect_stdout
    from io import StringIO

    from datasketches_server_spark.__main__ import main
    from datasketches_server_spark.streaming.incremental import (
        append_metrics_batch,
        merged_view,
    )

    out = str(tmp_path / "metrics_cli")
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    for e in range(3):
        append_metrics_batch(ev.where(F.col("user_id") % 3 == e), e, out)
    before = {r["event_type"]: (r["n_events"], r["distinct_items"])
              for r in merged_view(spark, out).collect()}

    buf = StringIO()
    with redirect_stdout(buf):
        assert main(
            ["--workdir", out, "--compact-metrics", out, "--through-epoch", "1"],
            spark=spark,
        ) == 0
    res = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert res["mode"] == "compact-metrics"

    after = {r["event_type"]: (r["n_events"], r["distinct_items"])
             for r in merged_view(spark, out).collect()}
    assert after == before


def test_containment_pairs_finds_near_supersets(spark):
    """A short doc pasted into a long one: containment ~1, jaccard small.
    jaccard_below returns exactly the pairs the symmetric gate misses;
    df_cap only ever LOWERS recall (never invents a pair)."""
    from datasketches_server_spark.operators.dedup import containment_pairs

    short = "alpha beta gamma delta epsilon zeta"
    long = (
        "one two three four five six seven eight nine ten eleven twelve "
        "thirteen fourteen fifteen sixteen " + short
    )
    near_dup_of_long = long + " seventeen"
    rows = [(1, short), (2, long), (3, near_dup_of_long), (4, "totally different words here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["contained"], r["container"]): r.asDict()
        for r in containment_pairs(df, threshold=0.9).collect()
    }
    assert ("1", "2") in got and got[("1", "2")]["containment"] == 1.0
    assert got[("1", "2")]["jaccard"] < 0.7
    assert ("2", "3") in got  # the symmetric near-dup also contains
    # the asymmetric-only view drops the jaccard>=0.7 near-dup pair
    only_asym = {
        (r["contained"], r["container"])
        for r in containment_pairs(df, threshold=0.9, jaccard_below=0.7).collect()
    }
    assert ("1", "2") in only_asym and ("2", "3") not in only_asym
    # df_cap: a gram present in >cap docs is dropped from the index --
    # pairs can disappear, but survivors' counts stay true intersections
    capped = {
        (r["contained"], r["container"]): r["n_inter"]
        for r in containment_pairs(df, threshold=0.5, df_cap=2).collect()
    }
    full = {
        (r["contained"], r["container"]): r["n_inter"]
        for r in containment_pairs(df, threshold=0.5).collect()
    }
    assert set(capped) <= set(full)
    for k, v in capped.items():
        assert v <= full[k]
