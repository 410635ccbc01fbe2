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


def test_incremental_dedup_equals_full_recompute(spark):
    """incremental_dedup(old, new) must produce the identical clustering
    to a full recompute on the combined corpus: signatures and bucket
    hashes are deterministic and cluster_id = min conv_id, so the
    assignments match row for row (uncapped-bucket regime)."""
    from pyspark.sql import functions as F

    from datasketches_server_spark.config import PipelineConfig
    from datasketches_server_spark.plans.pipeline import dedup_pipeline, incremental_dedup
    from datasketches_server_spark.sources.synth import synth_transcripts

    cfg = PipelineConfig()
    full_t = synth_transcripts(spark, n_convs=500, seed=23)
    # split by conv hash: ~80% "old" corpus, ~20% "new" batch -- cuts
    # ACROSS dup families, so some new convs must join old clusters
    is_new = F.pmod(F.xxhash64("conv_id"), F.lit(5)) == 0
    old_t, new_t = full_t.where(~is_new), full_t.where(is_new)

    old = dedup_pipeline(old_t, cfg)
    inc = incremental_dedup(old.conv_state, old.edges, new_t, cfg)
    incremental = {r["conv_id"]: r["cluster_id"] for r in inc.clusters.collect()}

    full = dedup_pipeline(full_t, cfg)
    want = {r["conv_id"]: r["cluster_id"] for r in full.clusters.collect()}

    assert incremental == want
    # and the expensive signature stage really only ran on the new batch
    assert inc.conv_state.count() == full.conv_state.count()
    n_new = new_t.select("conv_id").distinct().count()
    assert n_new > 0
    inc.unpersist()
    old.unpersist()
    full.unpersist()
