"""Cross-corpus decontamination (plans/pipeline.cross_corpus_near_dups):
signature-level train-vs-eval near-dup pairs, judged against the exact
brute-force cross-pair oracle at the identical shingle/signature config
(same recall>=0.99 / zero-false-positive contract as dedup_pipeline)."""

from __future__ import annotations

from pyspark.sql import functions as F

from datasketches_server_spark.config import DEFAULT_CONFIG
from datasketches_server_spark.plans.pipeline import (
    conv_signatures,
    cross_corpus_near_dups,
)
from datasketches_server_spark.plans.oracle import exact_jaccard
from datasketches_server_spark.sources.synth import synth_transcripts


def _split(transcripts, mod=5):
    """Carve an eval suite out of a planted corpus: every conv whose
    numeric id is divisible by ``mod`` -- dup families span both sides."""
    is_eval = F.pmod(F.xxhash64("conv_id"), F.lit(mod)) == 0
    return transcripts.where(~is_eval), transcripts.where(is_eval)


def _exact_cross_pairs(spark, train, evalt, cfg):
    """Brute-force oracle: ALL cross-side pairs with jaccard >= threshold."""
    st = conv_signatures(train, cfg).select(
        F.col("conv_id").alias("a"), F.col("shingles").alias("sh_a")
    )
    se = conv_signatures(evalt, cfg).select(
        F.col("conv_id").alias("b"), F.col("shingles").alias("sh_b")
    )
    return (
        st.crossJoin(se)
        .select("a", "b", exact_jaccard(F.col("sh_a"), F.col("sh_b")).alias("jaccard"))
        .where(F.col("jaccard") >= cfg.lsh.jaccard_threshold)
    )


def test_cross_pairs_match_exact_oracle(spark):
    cfg = DEFAULT_CONFIG
    transcripts = synth_transcripts(spark, n_convs=500, seed=11)
    train, evalt = _split(transcripts)

    got = cross_corpus_near_dups(train, evalt, cfg).persist()
    want = _exact_cross_pairs(spark, train, evalt, cfg).persist()

    n_want = want.count()
    assert n_want > 0, "planted corpus produced no cross-side near-dups"
    hit = got.join(
        want.select(
            F.col("a").alias("train_conv_id"), F.col("b").alias("eval_conv_id")
        ),
        ["train_conv_id", "eval_conv_id"],
    ).count()
    recall = hit / n_want
    assert recall >= 0.99, f"cross-corpus recall {recall} < 0.99 ({hit}/{n_want})"

    # exact verification tier => zero false positives
    fp = got.join(
        want.select(
            F.col("a").alias("train_conv_id"), F.col("b").alias("eval_conv_id")
        ),
        ["train_conv_id", "eval_conv_id"],
        "left_anti",
    ).count()
    assert fp == 0, f"{fp} false-positive cross pairs"


def test_shared_conv_ids_never_alias(spark):
    """An eval suite reusing a train corpus's conv_ids must not self-pair:
    the internal t|/e| namespacing keeps a train conv and an UNRELATED
    eval conv with the same id apart, while a genuine copy still pairs."""
    cfg = DEFAULT_CONFIG
    transcripts = synth_transcripts(spark, n_convs=200, seed=23).persist()
    ids = [r[0] for r in transcripts.select("conv_id").distinct().orderBy("conv_id").limit(2).collect()]
    a, b = ids
    train = transcripts
    # eval: conv 'a' is a verbatim copy of train conv 'a' (true leak);
    # conv 'b' is train conv 'a' RELABELED as 'b' (same text, different id).
    evalt = transcripts.where(F.col("conv_id") == a).unionByName(
        transcripts.where(F.col("conv_id") == a).withColumn("conv_id", F.lit(b))
    )
    got = cross_corpus_near_dups(train, evalt, cfg)
    rows = {(r["train_conv_id"], r["eval_conv_id"]) for r in got.collect()}
    # both eval convs are exact copies of train 'a' => both pairs found,
    # with sides preserved (no 'a'=='a' suppression, no id collision)
    assert (a, a) in rows, rows
    assert (a, b) in rows, rows


def test_indexed_train_side_equals_derived(spark, tmp_path):
    """Decontam against a persisted corpus (signatures stage + band
    index -- the accumulator incremental_dedup probes) must equal the
    derived path bit-for-bit: nothing about the train side recomputes."""
    from datasketches_server_spark.plans.band_index import (
        read_band_index,
        write_band_index,
    )

    cfg = DEFAULT_CONFIG
    transcripts = synth_transcripts(spark, n_convs=300, seed=17)
    train, evalt = _split(transcripts)

    derived = {
        tuple(r) for r in cross_corpus_near_dups(train, evalt, cfg).collect()
    }

    # persist the train corpus the way a completed run would
    state = conv_signatures(train, cfg)
    sig_path = str(tmp_path / "sigs")
    state.write.parquet(sig_path)
    write_band_index(state, str(tmp_path), cfg, input_fp="base")

    stored_state = spark.read.parquet(sig_path)
    stored_buckets = read_band_index(spark, str(tmp_path), cfg, input_fp="base")
    indexed = {
        tuple(r)
        for r in cross_corpus_near_dups(
            None,
            evalt,
            cfg,
            train_state=stored_state,
            train_buckets=stored_buckets,
        ).collect()
    }
    assert derived, "no cross pairs planted"
    assert indexed == derived


def test_cli_decontam_probes_indexed_chain(spark, tmp_path):
    """--decontam-input end-to-end: full CLI run indexes a corpus, then
    an eval parquet containing verbatim copies of two train convs plus
    genuinely new convs is probed -- the copies are flagged, the new
    convs are not, and nothing needed the train transcripts again."""
    import json
    from contextlib import redirect_stdout
    from io import StringIO

    from datasketches_server_spark.__main__ import main

    base = synth_transcripts(spark, n_convs=120, seed=5).persist()
    leak_ids = [
        r[0]
        for r in base.select("conv_id").distinct().orderBy("conv_id").limit(2).collect()
    ]
    leaked = base.where(F.col("conv_id").isin(leak_ids)).selectExpr(
        "concat('ev-', conv_id) conv_id", "turn_idx", "role", "text", "tool", "ts"
    )
    fresh = synth_transcripts(
        spark, n_convs=10, seed=777, dup_fraction=0.0
    ).selectExpr(
        "concat('fresh-', conv_id) conv_id", "turn_idx", "role", "text", "tool", "ts"
    )
    evalt = leaked.unionByName(fresh)

    base_p, eval_p = str(tmp_path / "base"), str(tmp_path / "eval")
    base.write.parquet(base_p)
    evalt.write.parquet(eval_p)
    wd = str(tmp_path / "wd")

    def run(argv):
        buf = StringIO()
        with redirect_stdout(buf):
            assert main(argv, spark=spark) == 0
        return json.loads(buf.getvalue().strip().splitlines()[-1])

    full = run(["--input", base_p, "--workdir", wd])
    rep = run(
        ["--decontam-input", eval_p, "--workdir", wd, "--base-fps", full["input_fp"]]
    )
    assert rep["mode"] == "decontam"
    pairs = spark.read.parquet(rep["pairs_path"])
    flagged = {r["eval_conv_id"] for r in pairs.select("eval_conv_id").distinct().collect()}
    # both planted copies flagged, paired with their train originals
    for cid in leak_ids:
        assert f"ev-{cid}" in flagged, (cid, flagged)
    got = {(r["train_conv_id"], r["eval_conv_id"]) for r in pairs.collect()}
    for cid in leak_ids:
        assert (cid, f"ev-{cid}") in got, (cid, got)
    # the genuinely-new convs stay clean
    assert not any(c.startswith("fresh-") for c in flagged), flagged
    assert rep["n_contaminated_eval_convs"] == len(flagged)
    base.unpersist()


def test_decontam_plan_shape(spark):
    """The 100 TB plan contract: eval band rows join by BROADCAST (never
    a sort-merge shuffle of the train corpus), no cartesian product, no
    row-at-a-time Python anywhere."""
    import contextlib
    import io

    cfg = DEFAULT_CONFIG
    transcripts = synth_transcripts(spark, n_convs=200, seed=31)
    train, evalt = _split(transcripts)
    # plan-only: build the candidate join exactly as the operator does,
    # WITHOUT the eager materialization (which would hide the plan)
    pre_t = conv_signatures(train, cfg).withColumn(
        "conv_id", F.concat(F.lit("t|"), "conv_id")
    )
    pre_e = conv_signatures(evalt, cfg).withColumn(
        "conv_id", F.concat(F.lit("e|"), "conv_id")
    )
    from datasketches_server_spark.operators.lsh import band_buckets

    bt = band_buckets(pre_t, cfg.lsh).select(F.col("conv_id").alias("a"), "bucket")
    be = band_buckets(pre_e, cfg.lsh).select(F.col("conv_id").alias("b"), "bucket")
    cand = bt.join(F.broadcast(be), "bucket").select("a", "b").distinct()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        cand.explain("simple")
    p = buf.getvalue()
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    assert "CartesianProduct" not in p
    assert "BatchEvalPython" not in p


def test_bucket_cap_only_lowers_recall(spark):
    """A hot-bucket cap may drop pairs but never invent them, and a
    generous cap changes nothing."""
    cfg = DEFAULT_CONFIG
    transcripts = synth_transcripts(spark, n_convs=300, seed=5)
    train, evalt = _split(transcripts)
    free = {
        (r["train_conv_id"], r["eval_conv_id"])
        for r in cross_corpus_near_dups(train, evalt, cfg).collect()
    }
    capped = {
        (r["train_conv_id"], r["eval_conv_id"])
        for r in cross_corpus_near_dups(train, evalt, cfg, bucket_cap=2).collect()
    }
    loose = {
        (r["train_conv_id"], r["eval_conv_id"])
        for r in cross_corpus_near_dups(train, evalt, cfg, bucket_cap=10**6).collect()
    }
    assert capped <= free
    assert loose == free


def test_streaming_decontam_filters_at_ingest(spark, tmp_path):
    """Ingest-time decontamination (streaming/incremental.decontam_batch
    via foreachBatch): a conversation near-duplicating the eval suite is
    diverted to the flagged sink across micro-batches; clean convs pass
    through; an epoch replay does not duplicate either sink."""
    from datasketches_server_spark.streaming.incremental import (
        decontam_batch,
        streaming_decontam_foreachBatch,
    )

    cfg = DEFAULT_CONFIG
    corpus = synth_transcripts(spark, n_convs=60, seed=41).persist()
    eval_ids = [
        r[0]
        for r in corpus.select("conv_id").distinct().orderBy("conv_id").limit(2).collect()
    ]
    eval_t = corpus.where(F.col("conv_id").isin(eval_ids)).selectExpr(
        "concat('ev-', conv_id) conv_id", "turn_idx", "role", "text", "tool", "ts"
    )
    eval_state = conv_signatures(eval_t, cfg).persist()
    eval_state.count()

    # batch 0: one leaked conv (copy of eval_ids[0]) + clean convs
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    clean_p, flagged_p = str(tmp_path / "clean"), str(tmp_path / "flag")
    b0 = corpus.where(F.col("conv_id") == eval_ids[0]).unionByName(
        synth_transcripts(spark, n_convs=6, seed=71, dup_fraction=0.0).selectExpr(
            "concat('c0-', conv_id) conv_id", "turn_idx", "role", "text", "tool", "ts"
        )
    )
    b0.coalesce(1).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(b0.schema).parquet(src)
    q = (
        streaming_decontam_foreachBatch(stream, eval_state, clean_p, flagged_p, cfg)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()

    # batch 1: second leak + more clean convs
    b1 = corpus.where(F.col("conv_id") == eval_ids[1]).unionByName(
        synth_transcripts(spark, n_convs=5, seed=72, dup_fraction=0.0).selectExpr(
            "concat('c1-', conv_id) conv_id", "turn_idx", "role", "text", "tool", "ts"
        )
    )
    b1.coalesce(1).write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()

    flagged = spark.read.parquet(flagged_p)
    fl_convs = {r[0] for r in flagged.select("train_conv_id").distinct().collect()}
    assert set(eval_ids) == fl_convs, fl_convs
    clean = spark.read.parquet(clean_p)
    cl_convs = {r[0] for r in clean.select("conv_id").distinct().collect()}
    assert not (set(eval_ids) & cl_convs)
    assert any(c.startswith("c0-") for c in cl_convs)
    assert any(c.startswith("c1-") for c in cl_convs)
    # clean sink preserves every turn of the surviving convs
    n_clean_turns = clean.count()
    want = (
        b0.unionByName(b1)
        .where(~F.col("conv_id").isin(eval_ids))
        .count()
    )
    assert n_clean_turns == want

    # replay: re-running an epoch overwrites its partition, no dupes
    before_f, before_c = spark.read.parquet(flagged_p).count(), n_clean_turns
    decontam_batch(b0, 0, eval_state, clean_p, flagged_p, cfg)
    assert spark.read.parquet(flagged_p).count() == before_f
    assert spark.read.parquet(clean_p).count() == before_c
    eval_state.unpersist()
    corpus.unpersist()


def test_embedding_cross_decontam_finds_planted_vecs(spark):
    """Semantic cross-corpus decontam: an eval vector equal (and one
    nearly equal) to a train vector is surfaced with cosine ~1; an
    orthogonal eval vector is not.  Only cross-side pairs appear."""
    import math

    from datasketches_server_spark.operators.similarity import (
        cross_corpus_embedding_near_dups,
    )

    dim = 64

    def unit(i):
        # deterministic distinct unit vectors
        v = [math.sin(0.7 * i + 0.13 * j) for j in range(dim)]
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    # i < 9 only: the sin construction repeats with period 2*pi/0.7 ~ 9,
    # so larger ids would alias back onto these directions
    train_rows = [(i, unit(i)) for i in range(1, 9)]
    near = [x + (0.001 if j == 0 else 0.0) for j, x in enumerate(unit(2))]
    # unrelated: a one-hot vector -- cosine vs any dense sin vector is
    # that vector's single-component magnitude, far below threshold
    onehot = [1.0 if j == 0 else 0.0 for j in range(dim)]
    eval_rows = [
        (100, unit(1)),           # exact copy of train vec 1
        (101, near),              # near copy of train vec 2
        (102, onehot),            # unrelated
    ]
    schema = "vec_id long, embedding array<float>"
    train = spark.createDataFrame(train_rows, schema)
    evalq = spark.createDataFrame(eval_rows, schema)

    got = {
        (r["a"], r["b"]): r["cosine"]
        for r in cross_corpus_embedding_near_dups(
            train, evalq, threshold=0.95
        ).collect()
    }
    assert (1, 100) in got and got[(1, 100)] > 0.999, got
    assert (2, 101) in got and got[(2, 101)] > 0.999, got
    # sides are typed: a is always a train id, b always an eval id
    assert all(a <= 8 and b >= 100 for a, b in got)
    assert not any(b == 102 for _, b in got), got
