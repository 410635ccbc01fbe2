"""plans/semantic_index.py: the embedding-side accumulator.

Equality contract: in the uncapped regime, probing the persisted index
with a batch must reproduce EXACTLY the pairs/clusters a full recompute
over old+batch finds (whatever the LSH surfaces -- recall itself is
q31/q33's contract, not this one).  Work contract: the cap-window input
scales with the batch + touched-bucket members, not the corpus.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from datasketches_server_spark.operators.components import (
    attach_singletons,
    connected_components,
)
from datasketches_server_spark.operators.similarity import (
    embedding_near_dup_pairs,
    semantic_dedup_clusters,
)
from datasketches_server_spark.plans import semantic_index as SI

PARAMS = dict(threshold=0.4, n_tables=24, n_bits=6, bucket_cap=128, probe_radius=1)


def _corpus(spark, n=120, dim=8, n_clusters=6, per_cluster=4, seed=7):
    """Deterministic embeddings with planted near-identical clusters
    spanning the old/new split (every 10th id is 'new')."""
    rng = np.random.default_rng(seed)
    rows = []
    vid = 0
    for c in range(n_clusters):
        base = rng.normal(size=dim)
        base /= np.linalg.norm(base)
        for _ in range(per_cluster):
            v = base + rng.normal(scale=0.01, size=dim)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    while vid < n:
        v = rng.normal(size=dim)
        rows.append((vid, [float(x) for x in v]))
        vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_incremental_semantic_equals_full(spark, tmp_path):
    e = _corpus(spark)
    is_new = F.col("vec_id") % 10 == 0
    old, batch = e.where(~is_new), e.where(is_new)

    old_labels = attach_singletons(
        connected_components(embedding_near_dup_pairs(old, **PARAMS).select("a", "b")),
        old.select(F.col("vec_id").alias("conv_id")),
    )
    SI.write_embedding_index(old, str(tmp_path))
    idx = SI.read_embedding_index(spark, str(tmp_path))
    new_pairs = SI.incremental_embedding_pairs(idx, batch, e, **PARAMS)
    inc = SI.incremental_semantic_dedup(old_labels, new_pairs, batch.select("vec_id"))

    full = semantic_dedup_clusters(e, **PARAMS)
    got = sorted(map(tuple, inc.collect()))
    want = sorted(map(tuple, full.collect()))
    assert got == want and len(want) >= 10  # non-trivial planted clusters

    # and the incremental pair set is exactly the full pair set minus
    # old-old pairs (batch ids end in 0)
    full_pairs = {
        (r["a"], r["b"])
        for r in embedding_near_dup_pairs(e, **PARAMS).collect()
        if r["a"] % 10 == 0 or r["b"] % 10 == 0
    }
    inc_pairs = {(r["a"], r["b"]) for r in new_pairs.collect()}
    assert inc_pairs == full_pairs and full_pairs


def test_incremental_work_scales_with_batch(spark, tmp_path):
    # 12-bit codes: 4096 buckets/table, so a 10-vector batch's probe ball
    # (10 x 13 codes) touches a few percent of each table -- the realistic
    # selectivity regime (6-bit test codes would touch all 64 buckets and
    # prove nothing about the filter)
    params = dict(PARAMS, n_bits=12)
    e = _corpus(spark, n=200)
    is_new = F.col("vec_id") % 20 == 0  # 5% batch
    old, batch = e.where(~is_new), e.where(is_new)
    SI.write_embedding_index(old, str(tmp_path), n_bits=12)
    idx = SI.read_embedding_index(spark, str(tmp_path), n_bits=12)
    hook: list = []
    SI.incremental_embedding_pairs(idx, batch, e, window_input_out=hook, **params).count()
    comb_rows = hook[0].count()
    corpus_rows = 200 * params["n_tables"]  # full re-encode would be this
    # batch rows (10 x 24) + old members of touched buckets only
    assert comb_rows < corpus_rows / 2, (comb_rows, corpus_rows)


def test_append_and_read_chain_equals_whole(spark, tmp_path):
    from datasketches_server_spark.operators.similarity import _bucketize

    e = _corpus(spark, n=60)
    is_new = F.col("vec_id") % 10 == 0
    SI.write_embedding_index(e.where(~is_new), str(tmp_path), input_fp="base")
    SI.append_embedding_index(e.where(is_new), str(tmp_path), batch_fp="b1")
    chain = SI.read_embedding_index(spark, str(tmp_path), input_fp=["base", "b1"])
    whole = _bucketize(e, "vec_id", 24, 6, 42)
    assert sorted(map(tuple, chain.collect())) == sorted(map(tuple, whole.collect()))
    # replay idempotence: re-absorbing the same batch_fp replaces, not duplicates
    SI.append_embedding_index(e.where(is_new), str(tmp_path), batch_fp="b1")
    again = SI.read_embedding_index(spark, str(tmp_path), input_fp=["base", "b1"])
    assert again.count() == whole.count()


def test_incremental_semantic_dedup_bridges_and_singletons(spark):
    """A batch edge bridging two old clusters relabels both to the global
    min; untouched old clusters and edgeless batch vectors stay put."""
    old_labels = spark.createDataFrame(
        [(1, 1), (2, 1), (10, 10), (11, 10), (50, 50), (60, 60), (61, 60)],
        "conv_id long, cluster_id long",
    )
    new_pairs = spark.createDataFrame(
        [(2, 100, 0.9), (10, 100, 0.9)], "a long, b long, cosine double"
    )
    new_nodes = spark.createDataFrame([(100,), (101,)], "vec_id long")
    out = {
        r["vec_id"]: r
        for r in SI.incremental_semantic_dedup(old_labels, new_pairs, new_nodes).collect()
    }
    # bridge: {1,2} + {10,11} + 100 merge under min id 1
    assert {v for v, r in out.items() if r["cluster_id"] == 1} == {1, 2, 10, 11, 100}
    assert out[1]["cluster_size"] == 5 and out[1]["is_keeper"]
    assert not out[100]["is_keeper"]
    # untouched old cluster survives; singletons (50, 101) are filtered
    assert out[60]["cluster_id"] == 60 and out[61]["cluster_size"] == 2
    assert 50 not in out and 101 not in out


def test_retract_semantic_equals_full_recompute(spark):
    """Removing vectors (including chain links) leaves exactly the
    labeling a full pipeline over survivors produces."""
    e = _corpus(spark, n=100)
    removed = e.select("vec_id").where(F.col("vec_id") % 4 == 1)  # hits cluster members
    survivors = e.join(removed, "vec_id", "left_anti")

    edges = embedding_near_dup_pairs(e, **PARAMS)
    labels = attach_singletons(
        connected_components(edges.select("a", "b")),
        e.select(F.col("vec_id").alias("conv_id")),
    ).select(F.col("conv_id").alias("vec_id"), "cluster_id")

    edges2, labels2 = SI.retract_semantic(labels, edges, removed)
    got = sorted(map(tuple, SI.clusters_view(labels2).collect()))
    want = sorted(map(tuple, semantic_dedup_clusters(survivors, **PARAMS).collect()))
    assert got == want and want  # non-trivial: clusters survive the cut
    # no retained edge touches a removed id
    rm = {r["vec_id"] for r in removed.collect()}
    assert all(r["a"] not in rm and r["b"] not in rm for r in edges2.collect())


def test_retract_index_then_absorb_equals_full(spark, tmp_path):
    """Lifecycle closure: base index -> retract -> absorb a batch ->
    probing the stitched chain equals a full recompute over
    (survivors + batch)."""
    e = _corpus(spark, n=120)
    is_new = F.col("vec_id") % 10 == 0
    old, batch = e.where(~is_new), e.where(is_new)
    removed = old.select("vec_id").where(F.col("vec_id") % 7 == 3)
    old2 = old.join(removed, "vec_id", "left_anti")

    SI.write_embedding_index(old, str(tmp_path), input_fp="base")
    SI.retract_embedding_index(spark, str(tmp_path), removed, "base_r1", chain="base")
    idx = SI.read_embedding_index(spark, str(tmp_path), input_fp="base_r1")

    corpus = old2.unionByName(batch)
    new_pairs = SI.incremental_embedding_pairs(idx, batch, corpus, **PARAMS)
    old_labels = attach_singletons(
        connected_components(embedding_near_dup_pairs(old2, **PARAMS).select("a", "b")),
        old2.select(F.col("vec_id").alias("conv_id")),
    )
    inc = SI.incremental_semantic_dedup(old_labels, new_pairs, batch.select("vec_id"))
    want = sorted(map(tuple, semantic_dedup_clusters(corpus, **PARAMS).collect()))
    assert sorted(map(tuple, inc.collect())) == want and want
