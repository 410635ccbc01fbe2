"""Bloom membership index (plans/bloom_index): the exact-dedup
accumulator.

Contracts proven here:
* no false negatives ever (every planted seen fp probes maybe_seen);
* measured false-positive rate on unseen fps stays near the analytic
  bits_per_item=10/k=7 design point (~1%, asserted < 5%);
* seen_filter is EXACT -- identical verdicts to the naive semi-join it
  replaces at scale;
* absorb == rebuild-from-union BIT-FOR-BIT at the same m (mergeability
  is pure bitwise-OR because positions are pure in (fp, m));
* a saturated index refuses absorbs instead of silently degrading;
* the verify join's input is the SURVIVORS, not the batch (the
  O(batch-hashing + survivors-join) scale contract).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datasketches_server_spark.plans.bloom_index import (
    BloomConfig,
    absorb_bloom,
    bloom_stats,
    build_bloom_index,
    index_m,
    probe_bloom,
    read_bloom_index,
    seen_filter,
    write_bloom_index,
)

CFG = BloomConfig(n_buckets=8)


def _fps(spark, lo, hi):
    return spark.range(lo, hi).select(F.md5(F.col("id").cast("string")).alias("fp"))


def _batch(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").cast("string").alias("id"),
        F.md5(F.col("id").cast("string")).alias("fp"),
    )


def test_no_false_negatives_and_bounded_fp(spark):
    base = _fps(spark, 0, 2000)
    idx = build_bloom_index(base, "fp", CFG).cache()
    # 500 seen + 2000 unseen probes
    probed = probe_bloom(idx, _batch(spark, 0, 500).unionAll(_batch(spark, 10_000, 12_000)), cfg=CFG)
    rows = {r.id: r.maybe_seen for r in probed.collect()}
    seen = [rows[str(i)] for i in range(500)]
    unseen = [rows[str(i)] for i in range(10_000, 12_000)]
    assert all(seen), "Bloom false negative -- impossible by construction"
    fp_rate = sum(unseen) / len(unseen)
    assert fp_rate < 0.05, f"fp rate {fp_rate} far above the ~1% design point"
    idx.unpersist()


def test_seen_filter_equals_naive_semi_join(spark):
    base = _fps(spark, 0, 1500)
    idx = build_bloom_index(base, "fp", CFG)
    batch = _batch(spark, 1000, 2500)  # 500 seen, 1000 unseen
    got = {r.id: r.seen_before for r in seen_filter(idx, base, batch, cfg=CFG).collect()}
    naive = {
        r.id: r.seen
        for r in batch.join(
            base.withColumn("seen", F.lit(True)).distinct(), "fp", "left"
        )
        .select("id", F.coalesce("seen", F.lit(False)).alias("seen"))
        .collect()
    }
    assert got == naive
    assert len(got) == 1500


def test_absorb_equals_rebuild_bit_for_bit(spark, tmp_path):
    base = _fps(spark, 0, 800)
    idx = build_bloom_index(base, "fp", CFG)
    m = index_m(idx)
    new = _fps(spark, 5000, 5400)
    absorbed = absorb_bloom(idx, new, cfg=CFG)
    rebuilt = build_bloom_index(base.unionAll(new), "fp", CFG, m=m)
    a = {r.bucket: (r.bits, r.n_rows) for r in absorbed.collect()}
    b = {r.bucket: (r.bits, r.n_rows) for r in rebuilt.collect()}
    assert a == b
    # round-trips through the persisted form unchanged
    p = str(tmp_path / "bloom")
    write_bloom_index(absorbed, p)
    back = {r.bucket: r.bits for r in read_bloom_index(spark, p).collect()}
    assert back == {k: v[0] for k, v in a.items()}


def test_saturated_index_refuses_absorb(spark):
    # min_bits floor only: 4000 items into 8 x 1024 bits ~= fill .97
    tight = BloomConfig(n_buckets=8, bits_per_item=1, min_bits_per_bucket=1024)
    idx = build_bloom_index(_fps(spark, 0, 4000), "fp", tight)
    with pytest.raises(ValueError, match="rebuild with larger m"):
        absorb_bloom(idx, _fps(spark, 9000, 9100), cfg=tight)


def test_stats_expose_design_point(spark):
    idx = build_bloom_index(_fps(spark, 0, 2000), "fp", CFG)
    st = bloom_stats(idx, CFG).collect()
    assert len(st) == CFG.n_buckets
    for r in st:
        # optimally-loaded filter sits near fill 0.5; est fp near 1%
        assert 0.2 < r.fill_frac < 0.65
        assert r.est_fp_rate < 0.05


def test_verify_join_input_is_survivors_only(spark):
    """The scale contract: the exact-verify join sees the maybe-seen
    SURVIVORS, not the whole batch.  Count both sides explicitly."""
    base = _fps(spark, 0, 1000)
    idx = build_bloom_index(base, "fp", CFG)
    batch = _batch(spark, 500, 3500)  # 500 seen of 3000
    probed = probe_bloom(idx, batch, cfg=CFG)
    survivors = probed.where("maybe_seen").count()
    seen = seen_filter(idx, base, batch, cfg=CFG).where("seen_before").count()
    assert seen == 500
    # survivors = true hits + the small fp margin -- far below the batch
    assert seen <= survivors < 500 + 0.05 * 3000


def test_mixed_m_rejected(spark):
    a = build_bloom_index(_fps(spark, 0, 100), "fp", CFG, m=1024)
    b = build_bloom_index(_fps(spark, 0, 100), "fp", CFG, m=2048)
    with pytest.raises(ValueError, match="mixed m"):
        index_m(a.unionAll(b))


def test_seen_gate_batch_diverts_and_replays_idempotently(spark, tmp_path):
    """Streaming history-dedup gate: rows whose fp exists in the corpus
    divert to the seen sink; a forced double-fire of an epoch leaves
    both sinks unchanged (epoch-partitioned overwrite + the probe being
    pure in (fp, m))."""
    from datasketches_server_spark.streaming.incremental import seen_gate_batch

    base = _fps(spark, 0, 1000)
    idx = build_bloom_index(base, "fp", CFG)
    fresh_p, seen_p = str(tmp_path / "fresh"), str(tmp_path / "seen")

    e0 = _batch(spark, 900, 1100).withColumnRenamed("id", "conv_id")  # 100 seen
    e1 = _batch(spark, 2000, 2050).withColumnRenamed("id", "conv_id")  # all fresh
    seen_gate_batch(e0, 0, idx, base, fresh_p, seen_p, bloom_cfg=CFG)
    seen_gate_batch(e1, 1, idx, base, fresh_p, seen_p, bloom_cfg=CFG)

    fresh = spark.read.parquet(fresh_p)
    seen = spark.read.parquet(seen_p)
    assert seen.count() == 100
    assert fresh.count() == 100 + 50
    assert {r.conv_id for r in seen.collect()} == {str(i) for i in range(900, 1000)}

    # forced double-fire of epoch 0: byte-identical verdicts, no growth
    seen_gate_batch(e0, 0, idx, base, fresh_p, seen_p, bloom_cfg=CFG)
    assert spark.read.parquet(seen_p).count() == 100
    assert spark.read.parquet(fresh_p).count() == 150


def test_cli_bloom_build_then_seen_filter(spark, tmp_path, sf_dir):
    """Ops path: --bloom-build persists index + fps from a corpus; a
    later --seen-input probes a batch containing one exact re-crawl and
    one fresh conversation, and the verdicts separate them exactly."""
    import json
    from contextlib import redirect_stdout
    from io import StringIO

    from datasketches_server_spark.__main__ import main
    from datasketches_server_spark.sources.synth import transcripts_from_documents

    t = transcripts_from_documents(spark, sf_dir)
    corpus_p = str(tmp_path / "corpus")
    t.where(F.col("conv_id").cast("long") < 400).write.parquet(corpus_p)
    # batch: conv 7 re-crawled under a fresh id + genuinely new conv 450
    batch_p = str(tmp_path / "batch")
    recrawl = t.where(F.col("conv_id") == "7").withColumn("conv_id", F.lit("re_7"))
    fresh = t.where(F.col("conv_id") == "450")
    recrawl.unionByName(fresh).write.parquet(batch_p)
    wd = str(tmp_path / "wd")

    buf = StringIO()
    with redirect_stdout(buf):
        assert main(["--workdir", wd, "--input", corpus_p, "--bloom-build"], spark=spark) == 0
    built = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert built["mode"] == "bloom-build" and built["n_fingerprints"] > 0

    buf = StringIO()
    with redirect_stdout(buf):
        assert main(["--workdir", wd, "--seen-input", batch_p], spark=spark) == 0
    probed = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert probed["n_convs"] == 2 and probed["n_seen"] == 1
    verdicts = {r.conv_id: r.seen_before
                for r in spark.read.parquet(probed["verdicts_path"]).collect()}
    assert verdicts == {"re_7": True, "450": False}


def test_q84_diameter_invariants(spark, sf_dir):
    """q84 structural invariants at sf0.001: complete pair coverage per
    audited cluster (n_pairs == C(n_members, 2)) and min <= mean; every
    audited cluster also appears in q24's >=2-member summary."""
    from datasketches_server_spark.plans import queries as Q

    rows = Q.q84_cluster_diameter_audit(spark, sf_dir).collect()
    assert rows, "sf0.001 has multi-member clusters; audit cannot be empty"
    for r in rows:
        assert r.n_pairs == r.n_members * (r.n_members - 1) // 2
        assert r.min_j_e4 * r.n_pairs <= r.sum_j_e4
    q24 = {x.cluster_id for x in Q.q24_dedup_clusters_documents(spark, sf_dir).collect()}
    assert {r.cluster_id for r in rows} <= q24
