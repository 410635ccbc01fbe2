"""Skew hardening: a pathological mega-family of near-identical convs
must route through the hot-bucket salted path + star edges and still
cluster correctly with O(m) edges, not O(m^2) pairs."""

from __future__ import annotations

from pyspark.sql import functions as F

from datasketches_server_spark.config import LshConfig, PipelineConfig
from datasketches_server_spark.operators.lsh import band_buckets, bucket_stats, candidate_pairs
from datasketches_server_spark.plans.pipeline import dedup_pipeline
from datasketches_server_spark.sources.synth import synth_transcripts


def _mega_family_corpus(spark, n_dupes=1500, n_unique=200):
    """n_dupes exact copies of one conversation + n_unique distinct."""
    base = synth_transcripts(spark, n_convs=n_unique, seed=99, dup_fraction=0.0)
    one = base.where(F.col("conv_id") == "conv-00000000")
    copies = (
        spark.range(n_dupes)
        .select(F.concat(F.lit("copy-"), F.lpad(F.col("id").cast("string"), 6, "0")).alias("new_id"))
        .crossJoin(one)
        .select(
            F.col("new_id").alias("conv_id"), "turn_idx", "role", "text", "tool", "ts"
        )
    )
    return base.unionByName(copies)


def test_incremental_batch_mega_family_stays_linear(spark):
    """Skew in the INCREMENTAL path: a new batch that is one giant
    near-duplicate family joining an existing corpus must route through
    the same star-edge topology -- O(m) new edges, not O(m^2) pairs --
    and land in one cluster with the old copy of the template."""
    from datasketches_server_spark.operators.lsh import band_buckets as bb
    from datasketches_server_spark.plans.pipeline import incremental_dedup

    cfg = PipelineConfig(
        lsh=LshConfig(bands=32, rows_per_band=4, jaccard_threshold=0.7,
                      bucket_cap=5000, salt_buckets=8, hot_bucket_threshold=256)
    )
    base = synth_transcripts(spark, n_convs=200, seed=99, dup_fraction=0.0)
    old = dedup_pipeline(base, cfg)
    old_edge_count = old.edges.count()

    one = base.where(F.col("conv_id") == "conv-00000000")
    m = 800
    batch = (
        spark.range(m)
        .select(F.concat(F.lit("copy-"), F.lpad(F.col("id").cast("string"), 6, "0")).alias("new_id"))
        .crossJoin(one)
        .select(F.col("new_id").alias("conv_id"), "turn_idx", "role", "text", "tool", "ts")
    )
    inc = incremental_dedup(
        old.conv_state, old.edges, batch, cfg,
        old_buckets=bb(old.conv_state, cfg.lsh),
        old_clusters=old.clusters,
    )
    new_edges = inc.edges.count() - old_edge_count
    # star topology: O(m) edges for the m+1-member family, never m^2/2
    assert new_edges < (m + 1) * 40, f"edge blowup: {new_edges}"
    # the whole family (old template + new copies) is ONE cluster
    fam = inc.clusters.where(
        (F.col("conv_id") == "conv-00000000") | F.col("conv_id").startswith("copy-")
    )
    assert fam.select("cluster_id").distinct().count() == 1
    assert fam.count() == m + 1
    inc.unpersist()
    old.unpersist()


def test_mega_family_star_edges_and_single_cluster(spark):
    cfg = PipelineConfig(
        lsh=LshConfig(bands=32, rows_per_band=4, jaccard_threshold=0.7,
                      bucket_cap=5000, salt_buckets=8, hot_bucket_threshold=256)
    )
    t = _mega_family_corpus(spark, n_dupes=1500, n_unique=200)
    res = dedup_pipeline(t, cfg)

    n_edges = res.edges.count()
    # star edges: O(m), nowhere near m^2/2 (~1.1M pairs for 1501 members)
    assert n_edges < 1501 * 40, f"edge blowup: {n_edges}"

    mega = res.clusters.where(
        F.col("conv_id").startswith("copy-") | (F.col("conv_id") == "conv-00000000")
    )
    assert mega.select("cluster_id").distinct().count() == 1
    assert mega.count() == 1501

    stats = bucket_stats(band_buckets(res.conv_state, cfg.lsh), cfg.lsh).collect()[0]
    assert stats["max_bucket"] >= 1501  # the hot bucket existed
    assert stats["dropped_members"] == 0  # cap was not hit at this size


def test_ann_dense_cluster_bounded_candidates(spark):
    """VERDICT #8: a dense embedding cluster (every member in the same
    bucket in every table) must NOT go quadratic -- per-bucket caps
    bound the candidate volume, and recall on the planted near-dups
    stays high because the rerank only needs ONE collision per pair."""
    import numpy as np
    from datasketches_server_spark.operators.similarity import (
        _bucketize,
        _cap_buckets,
        _probe,
        embedding_near_dup_pairs,
    )

    rng = np.random.default_rng(7)
    dense_base = rng.standard_normal(32)
    rows = []
    for i in range(300):  # dense family: tiny perturbations of one vector
        v = dense_base + rng.standard_normal(32) * 0.01
        rows.append((i, [float(x) for x in (v / np.linalg.norm(v))]))
    for i in range(300, 1000):  # isotropic background
        v = rng.standard_normal(32)
        rows.append((i, [float(x) for x in (v / np.linalg.norm(v))]))
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    nt, nb, cap, pr = 4, 8, 8, 0

    def n_cands(bucket_cap: int) -> int:
        buckets = _bucketize(e, "vec_id", nt, nb, 42)
        capped = _cap_buckets(buckets, "vec_id", bucket_cap)
        probes = _probe(buckets, nb, pr)
        return (
            probes.withColumnRenamed("vec_id", "pid")
            .join(capped, ["table_idx", "code"])
            .where(F.col("pid") != F.col("vec_id"))
            .select(F.least("pid", "vec_id").alias("a"), F.greatest("pid", "vec_id").alias("b"))
            .distinct()
            .count()
        )

    capped_n = n_cands(cap)
    uncapped_n = n_cands(10**9)
    # structural bound: each member pairs with <= tables * probes * cap
    # partners -- LINEAR in family size (a 10^6-member family costs
    # 10^6 * t*p*cap/2 candidates, never 10^12/2)
    assert capped_n <= 1000 * nt * (pr * nb + 1) * cap, f"candidate blowup: {capped_n}"
    assert capped_n < 300 * 299 / 2, "dense family went quadratic"
    assert capped_n < uncapped_n / 3, f"cap did not bite: {capped_n} vs {uncapped_n}"

    # capped pipeline still emits only true (exact-verified) dense pairs
    pairs = embedding_near_dup_pairs(
        e, threshold=0.95, n_tables=nt, n_bits=nb, bucket_cap=cap, probe_radius=pr
    ).collect()
    assert all(p["a"] < 300 and p["b"] < 300 for p in pairs)
    assert len(pairs) > 0


def test_bucket_cap_drops_are_observable(spark):
    cfg = PipelineConfig(
        lsh=LshConfig(bands=4, rows_per_band=4, jaccard_threshold=0.7,
                      bucket_cap=100, salt_buckets=4, hot_bucket_threshold=64)
    )
    t = _mega_family_corpus(spark, n_dupes=400, n_unique=50)
    state = dedup_pipeline(t, cfg).conv_state
    stats = bucket_stats(band_buckets(state, cfg.lsh), cfg.lsh).collect()[0]
    assert stats["dropped_members"] > 0  # cap engaged and is visible
    # pipeline still completes and the kept members still cluster
    pairs = candidate_pairs(band_buckets(state, cfg.lsh), cfg.lsh)
    assert pairs.count() > 0


def test_singleton_prefilter_is_pure_optimization(spark):
    """candidate_pairs with and without the singleton prefilter must emit
    the identical pair set -- the w2 sz-filter already drops singleton
    buckets, so the prefilter only changes the plan, never the result."""
    from datasketches_server_spark.config import LshConfig, PipelineConfig
    from datasketches_server_spark.operators.lsh import band_buckets, candidate_pairs
    from datasketches_server_spark.plans.pipeline import conv_signatures
    from datasketches_server_spark.sources.synth import synth_transcripts

    t = synth_transcripts(spark, n_convs=300, seed=17)
    state = conv_signatures(t, PipelineConfig()).persist()
    buckets = band_buckets(state, LshConfig())
    on = {(r["a"], r["b"]) for r in candidate_pairs(buckets, singleton_prefilter=True).collect()}
    off = {(r["a"], r["b"]) for r in candidate_pairs(buckets, singleton_prefilter=False).collect()}
    state.unpersist()
    assert on == off and len(on) > 0
