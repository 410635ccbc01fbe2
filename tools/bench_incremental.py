"""Measured evidence for the round-4 incremental redesign: a small
daily batch against a large existing corpus, three ways --

  full            -- recompute the combined corpus from scratch
  derived         -- incremental WITHOUT the persisted index (old corpus
                     re-banded on the fly + connected components over
                     ALL accumulated edges: the round-3 scale concern,
                     minus the signature pass which was already
                     incremental)
  indexed         -- incremental WITH the persisted band index + delta
                     connected components (the round-4 path)

All three must produce the identical cluster fingerprint; the point of
the numbers is the WORK metrics, which are deterministic where walls on
this shared VM are not:

  window_input_rows  -- rows entering the capping window sorts
                        (corpus-banded vs batch-scaled)
  contracted_edges   -- connected-components input (all edges vs delta)

Walls are still reported, bracketed by cpu_ceiling probes (certified =
both >= gate).  Usage:

  python tools/bench_incremental.py [--convs 50000] [--batch-frac 0.01]

Prints one JSON line; writes BENCH_incremental.json at the repo root.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F

from datasketches_server_spark.config import PipelineConfig
from datasketches_server_spark.plans.band_index import (
    read_band_index,
    write_band_index,
)
from datasketches_server_spark.plans.pipeline import dedup_pipeline, incremental_dedup
from datasketches_server_spark.session import get_spark
from datasketches_server_spark.sources.synth import synth_transcripts
from tools.cpu_ceiling import probe as cpu_probe


def quick_ceiling() -> float:
    return cpu_probe(levels=(2, 8), secs_per_rep=1.0, repeats=2)[
        "efficiency_ceiling_2to8"
    ]


def fingerprint(clusters) -> int:
    return clusters.select(
        F.expr("bit_xor(xxhash64(conv_id, cluster_id))").alias("f")
    ).collect()[0]["f"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--convs", type=int, default=50_000)
    ap.add_argument("--batch-frac", type=float, default=0.01)
    ap.add_argument("--gate", type=float, default=0.9)
    args = ap.parse_args()

    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("bench_incremental", cores=cores)
    spark.range(1000).select(F.xxhash64("id")).count()  # warm

    cfg = PipelineConfig()
    mod = max(2, int(round(1.0 / args.batch_frac)))
    full_t = synth_transcripts(spark, n_convs=args.convs, seed=42)
    is_new = F.pmod(F.xxhash64("conv_id"), F.lit(mod)) == 0
    old_t, new_t = full_t.where(~is_new), full_t.where(is_new)

    # ---- untimed setup: the existing corpus's state/edges/clusters/
    # index all land ON DISK, exactly like a production daily-ingest
    # deployment (keeping them cached in memory would unfairly favor
    # the derived mode, whose corpus re-banding then reads RAM instead
    # of the fat parquet it would read in production)
    workdir = tempfile.mkdtemp(prefix="bench_inc_")
    old_run = dedup_pipeline(old_t, cfg)
    old_run.conv_state.write.parquet(os.path.join(workdir, "state"))
    old_run.edges.write.parquet(os.path.join(workdir, "edges"))
    old_run.clusters.write.parquet(os.path.join(workdir, "clusters"))
    write_band_index(old_run.conv_state, workdir, cfg)
    old_run.unpersist()

    class OldCorpus:
        conv_state = spark.read.parquet(os.path.join(workdir, "state"))
        edges = spark.read.parquet(os.path.join(workdir, "edges"))
        clusters = spark.read.parquet(os.path.join(workdir, "clusters"))

    old = OldCorpus()
    n_old = old.conv_state.count()

    out: dict = {
        "metric": "incremental-batch cost vs corpus size",
        "n_convs_total": args.convs,
        "n_convs_old": n_old,
        "cores": cores,
        "bands": cfg.lsh.bands,
    }

    def timed(name: str, fn):
        pre = quick_ceiling()
        t0 = time.monotonic()
        res = fn()
        wall = round(time.monotonic() - t0, 3)
        post = quick_ceiling()
        out[f"{name}_wall_sec"] = wall
        out[f"{name}_probes"] = [pre, post]
        out[f"{name}_certified"] = pre >= args.gate and post >= args.gate
        return res

    # full recompute of the combined corpus
    def run_full():
        res = dedup_pipeline(full_t, cfg)
        fp = fingerprint(res.clusters)
        res.unpersist()
        return fp

    fp_full = timed("full", run_full)

    # incremental, derived banding + full CC (the round-3 shape).
    # Counter relations are LAZY -- count them AFTER the wall is taken
    # (code-review r4: counting comb inside the timed window re-ran a
    # second corpus-scale band pass and was charged to the mode's wall)
    derived_win: list = []

    def run_derived():
        res = incremental_dedup(
            old.conv_state, old.edges, new_t, cfg, window_input_out=derived_win
        )
        fp = fingerprint(res.clusters)
        res.unpersist()
        return fp

    fp_derived = timed("derived", run_derived)
    out["derived_window_input_rows"] = derived_win[0].count()

    # incremental, persisted index + delta CC (the round-4 path)
    indexed_win: list = []
    indexed_cc: list = []

    def run_indexed():
        res = incremental_dedup(
            old.conv_state,
            old.edges,
            new_t,
            cfg,
            old_buckets=read_band_index(spark, workdir, cfg),
            old_clusters=old.clusters,
            window_input_out=indexed_win,
            contracted_out=indexed_cc,
        )
        fp = fingerprint(res.clusters)
        res.unpersist()
        return fp

    fp_indexed = timed("indexed", run_indexed)
    out["indexed_window_input_rows"] = indexed_win[0].count()
    out["indexed_contracted_edges"] = indexed_cc[0].count()

    n_new = full_t.where(is_new).select("conv_id").distinct().count()
    out["n_convs_batch"] = n_new
    out["corpus_band_rows"] = n_old * cfg.lsh.bands
    out["batch_band_rows"] = n_new * cfg.lsh.bands
    out["accumulated_old_edges"] = old.edges.count()
    out["identical_clusters"] = fp_full == fp_derived == fp_indexed
    out["fingerprint"] = fp_full
    out["speedup_indexed_vs_full"] = round(
        out["full_wall_sec"] / out["indexed_wall_sec"], 2
    )
    out["window_rows_ratio_indexed_vs_derived"] = round(
        out["indexed_window_input_rows"] / max(out["derived_window_input_rows"], 1), 4
    )

    print(json.dumps(out))
    with open(os.path.join(REPO, "BENCH_incremental.json"), "w") as f:
        json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
