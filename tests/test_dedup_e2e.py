"""End-to-end dedup: planted corpus -> clusters, judged against the exact
brute-force oracle at the identical shingle/signature config
(BASELINE.json: dup-pair recall >= 0.99)."""

from __future__ import annotations

from pyspark.sql import functions as F

from datasketches_server_spark.config import DEFAULT_CONFIG
from datasketches_server_spark.plans.oracle import (
    oracle_pairs,
    pair_recall,
    union_find_clusters,
)
from datasketches_server_spark.plans.pipeline import dedup_pipeline
from datasketches_server_spark.sources.synth import synth_transcripts


def test_recall_and_precision_vs_oracle(spark):
    cfg = DEFAULT_CONFIG
    transcripts = synth_transcripts(spark, n_convs=600, seed=42)
    result = dedup_pipeline(transcripts, cfg)

    oracle = oracle_pairs(result.conv_state, cfg).persist()
    found = result.edges.persist()

    recall = pair_recall(found, oracle)
    assert recall >= 0.99, f"dup-pair recall {recall} < 0.99"

    # exact verification tier => zero false positives
    fp = found.join(oracle.select("a", "b"), ["a", "b"], "left_anti").count()
    assert fp == 0, f"{fp} false-positive pairs"


def test_clusters_match_oracle_clusters(spark):
    cfg = DEFAULT_CONFIG
    transcripts = synth_transcripts(spark, n_convs=400, seed=7)
    result = dedup_pipeline(transcripts, cfg)

    opairs = [(r["a"], r["b"]) for r in oracle_pairs(result.conv_state, cfg).collect()]
    want = union_find_clusters(opairs)
    got = {r["conv_id"]: r["cluster_id"] for r in result.clusters.collect()}

    all_ids = [r["conv_id"] for r in result.conv_state.select("conv_id").collect()]
    mismatch = [
        c for c in all_ids if got[c] != want.get(c, c)
    ]
    # recall >= 0.99 allows a sliver of divergence; demand <= 1% of convs
    assert len(mismatch) <= max(1, len(all_ids) // 100), mismatch[:10]


def test_exact_duplicates_always_cluster(spark):
    """Planted exact copies (mutation level 0 slots) must land in one
    cluster -- exact dups survive any LSH banding."""
    cfg = DEFAULT_CONFIG
    transcripts = synth_transcripts(spark, n_convs=300, seed=3)
    result = dedup_pipeline(transcripts, cfg)
    state = result.conv_state.select(
        "conv_id", F.xxhash64(F.concat_ws(" ", "shingles")).alias("fp")
    )
    joined = state.join(result.clusters, "conv_id")
    # same shingle fingerprint => same cluster id
    n_bad = (
        joined.groupBy("fp")
        .agg(F.countDistinct("cluster_id").alias("k"))
        .where(F.col("k") > 1)
        .count()
    )
    assert n_bad == 0
