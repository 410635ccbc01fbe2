"""Retraction: removing convs from accumulated dedup state must equal a
full recompute over the filtered corpus (plans/retract.py)."""

from __future__ import annotations

import random
import shutil
import tempfile

from pyspark.sql import functions as F

from datasketches_server_spark.config import DEFAULT_CONFIG
from datasketches_server_spark.operators.components import (
    attach_singletons,
    connected_components,
)
from datasketches_server_spark.plans.band_index import (
    read_band_index,
    write_band_index,
)
from datasketches_server_spark.plans.pipeline import dedup_pipeline
from datasketches_server_spark.plans.retract import (
    retract_band_index,
    retract_convs,
)
from datasketches_server_spark.sources.synth import synth_transcripts


def _clusters_of(spark, edges, nodes):
    e = spark.createDataFrame(edges, ["a", "b"]) if edges else (
        spark.createDataFrame([("x", "x")], ["a", "b"]).limit(0)
    )
    n = spark.createDataFrame([(x,) for x in nodes], ["conv_id"])
    return attach_singletons(connected_components(e), n)


def test_retract_matches_recompute_on_random_graphs(spark):
    """Pure graph semantics: retract_convs on (edges, clusters) equals
    CC over the filtered edge set, across random graphs and removal
    sets -- including removals that split clusters (bridge nodes)."""
    rng = random.Random(13)
    for trial in range(3):
        nodes = [f"n{i:03d}" for i in range(80)]
        edges = list(
            {
                (a, b) if a < b else (b, a)
                for a, b in (
                    (rng.choice(nodes), rng.choice(nodes)) for _ in range(90)
                )
                if a != b
            }
        )
        removed = rng.sample(nodes, 12)
        e_df = spark.createDataFrame(edges, ["a", "b"])
        clusters = _clusters_of(spark, edges, nodes)
        state = spark.createDataFrame([(x, 1) for x in nodes], ["conv_id", "sig"])
        rm_df = spark.createDataFrame([(x,) for x in removed], ["conv_id"])

        state2, edges2, clusters2 = retract_convs(state, e_df, clusters, rm_df)

        kept_nodes = [x for x in nodes if x not in set(removed)]
        kept_edges = [
            (a, b) for a, b in edges if a not in set(removed) and b not in set(removed)
        ]
        want = {
            r["conv_id"]: r["cluster_id"]
            for r in _clusters_of(spark, kept_edges, kept_nodes).collect()
        }
        got = {r["conv_id"]: r["cluster_id"] for r in clusters2.collect()}
        assert got == want, f"trial {trial}"
        assert {r["conv_id"] for r in state2.collect()} == set(kept_nodes)
        assert {(r["a"], r["b"]) for r in edges2.collect()} == set(kept_edges)


def test_retract_bridge_splits_cluster_and_wakes_singletons(spark):
    """Removing the bridge of a path a-b-c splits the cluster: a and c
    become singletons labeled by their own ids, exactly what a fresh run
    would produce; an untouched cluster keeps its label verbatim."""
    edges = [("a", "b"), ("b", "c"), ("x", "y")]
    nodes = ["a", "b", "c", "x", "y", "lone"]
    clusters = _clusters_of(spark, edges, nodes)
    state = spark.createDataFrame([(n, 1) for n in nodes], ["conv_id", "sig"])
    rm = spark.createDataFrame([("b",)], ["conv_id"])
    _, edges2, clusters2 = retract_convs(
        state, spark.createDataFrame(edges, ["a", "b"]), clusters, rm
    )
    got = {r["conv_id"]: r["cluster_id"] for r in clusters2.collect()}
    assert got == {"a": "a", "c": "c", "x": "x", "y": "x", "lone": "lone"}
    assert {(r["a"], r["b"]) for r in edges2.collect()} == {("x", "y")}


def test_retract_pipeline_equals_filtered_recompute(spark):
    """E2E on the real pipeline (uncapped regime at this scale): run the
    full corpus, retract a deterministic subset, and the resulting
    clusters/edges must fingerprint-match a fresh pipeline over the
    filtered corpus."""
    cfg = DEFAULT_CONFIG
    t = synth_transcripts(spark, n_convs=300, seed=11)
    is_rm = F.pmod(F.xxhash64("conv_id"), F.lit(7)) == 0
    full = dedup_pipeline(t, cfg)
    rm = t.select("conv_id").where(is_rm).distinct()
    _, edges2, clusters2 = retract_convs(full.conv_state, full.edges, full.clusters, rm)

    fresh = dedup_pipeline(t.where(~is_rm), cfg)
    got_edges = {(r["a"], r["b"]) for r in edges2.select("a", "b").collect()}
    want_edges = {(r["a"], r["b"]) for r in fresh.edges.select("a", "b").collect()}
    assert got_edges == want_edges
    got = {r["conv_id"]: r["cluster_id"] for r in clusters2.collect()}
    want = {r["conv_id"]: r["cluster_id"] for r in fresh.clusters.collect()}
    assert got == want
    full.unpersist()
    fresh.unpersist()


def test_retract_band_index_equals_rebuilt(spark):
    """Retracting the persisted band index equals building the index
    from the filtered signature state (set equality of (conv_id, bucket)
    membership), written as a NEW snapshot dir."""
    cfg = DEFAULT_CONFIG
    t = synth_transcripts(spark, n_convs=200, seed=5)
    res = dedup_pipeline(t, cfg)
    wd = tempfile.mkdtemp(prefix="retract_bidx_")
    try:
        write_band_index(res.conv_state, wd, cfg, input_fp="base")
        is_rm = F.pmod(F.xxhash64("conv_id"), F.lit(5)) == 0
        rm = res.conv_state.select("conv_id").where(is_rm)
        retract_band_index(spark, wd, rm, "base-retracted", cfg, chain=["base"])

        got = {
            (r["conv_id"], r["bucket"])
            for r in read_band_index(spark, wd, cfg, "base-retracted").collect()
        }
        wd2 = tempfile.mkdtemp(prefix="retract_bidx_want_")
        try:
            write_band_index(res.conv_state.where(~is_rm), wd2, cfg, input_fp="f")
            want = {
                (r["conv_id"], r["bucket"])
                for r in read_band_index(spark, wd2, cfg, "f").collect()
            }
        finally:
            shutil.rmtree(wd2, ignore_errors=True)
        assert got == want and got
    finally:
        shutil.rmtree(wd, ignore_errors=True)
        res.unpersist()


def _label_fp(df):
    return df.select(
        F.expr("bit_xor(xxhash64(conv_id, cluster_id))").alias("f")
    ).collect()[0]["f"]


def test_retract_chain_then_absorb(spark, tmp_path):
    """LineageRunner.retract_chain: base + batch1 minus a removal set
    folds into one snapshot whose composed labeling equals a fresh full
    recompute over the filtered corpus -- and a LATER batch absorbs
    against the retracted snapshot exactly as if the removed convs had
    never existed."""
    from datasketches_server_spark.config import PipelineConfig
    from datasketches_server_spark.plans.lineage import LineageRunner

    cfg = PipelineConfig(num_buckets=8)
    full_t = synth_transcripts(spark, n_convs=300, seed=37)
    b1 = F.pmod(F.xxhash64("conv_id"), F.lit(4)) == 0
    b2 = F.pmod(F.xxhash64("conv_id"), F.lit(4)) == 1
    is_rm = F.pmod(F.xxhash64("conv_id"), F.lit(9)) == 0

    runner = LineageRunner(spark, str(tmp_path / "wd"), cfg)
    runner.run(full_t.where(~b1 & ~b2), input_fp="base")
    runner.run_incremental(full_t.where(b1), "batch1", ["base"])

    rm = full_t.where(~b2 & is_rm).select("conv_id").distinct()
    counts = runner.retract_chain(["base", "batch1"], rm, "ret1")
    survivors = full_t.where(~b2 & ~is_rm)
    n_surv = survivors.select("conv_id").distinct().count()
    assert counts["signatures"] == n_surv and counts["clusters"] == n_surv

    want = dedup_pipeline(survivors, cfg).clusters
    got = runner.read_clusters(["ret1"], fallback=want.limit(0))
    assert _label_fp(got) == _label_fp(want)

    # later ingest chains on the retracted snapshot
    out, _ = runner.run_incremental(full_t.where(b2), "batch2", ["ret1"])
    want2 = dedup_pipeline(full_t.where(b2).unionByName(survivors), cfg).clusters
    assert _label_fp(out["clusters"]) == _label_fp(want2)


def test_cli_retract_mode(spark, tmp_path):
    """--retract-input drives retract_chain end-to-end and reports the
    surviving store sizes."""
    import json
    from contextlib import redirect_stdout
    from io import StringIO

    from datasketches_server_spark.__main__ import main

    t = synth_transcripts(spark, n_convs=120, seed=41)
    base_p = str(tmp_path / "base")
    t.write.parquet(base_p)
    rm_p = str(tmp_path / "rm")
    is_rm = F.pmod(F.xxhash64("conv_id"), F.lit(6)) == 0
    t.where(is_rm).select("conv_id").distinct().write.parquet(rm_p)
    wd = str(tmp_path / "wd")

    def run(argv):
        buf = StringIO()
        with redirect_stdout(buf):
            assert main(argv, spark=spark) == 0
        return json.loads(buf.getvalue().strip().splitlines()[-1])

    full = run(["--input", base_p, "--workdir", wd])
    ret = run(
        ["--retract-input", rm_p, "--workdir", wd,
         "--base-fps", full["input_fp"], "--compact-fp", "ret1"]
    )
    assert ret["mode"] == "retract" and ret["input_fp"] == "ret1"
    n_surv = t.where(~is_rm).select("conv_id").distinct().count()
    assert ret["counts"]["signatures"] == n_surv
    assert ret["counts"]["clusters"] == n_surv
