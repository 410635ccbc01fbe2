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
