"""Chain evidence for the incremental accumulator: FIVE successive
daily batches folded into a growing corpus via the persisted band index
+ delta connected components, then one full recompute over the final
corpus as ground truth.

What BENCH_incremental.json cannot show, this does: the corpus DOUBLES
across the chain (base 50% + 5 batches of 10% each) while every
per-batch work counter stays batch-scaled --

  window_input_rows  -- rows entering the capping window sorts; must
                        track the batch (plus touched old members),
                        never the growing corpus
  contracted_edges   -- connected-components input; the delta graph
  wall_sec           -- bracketed by cpu_ceiling probes like every
                        other bench (walls on this shared VM are noise
                        without the probes; counters are deterministic)

Between batches, state/edges/clusters/index land ON DISK exactly like a
production ingest (the index via append_band_index -- O(|batch| x bands)
per absorb, old rows untouched).  The final batch's fingerprint must
equal the full-recompute fingerprint: the accumulator never drifts.

Usage: python tools/bench_chain.py [--convs 100000] [--batches 5]
Writes BENCH_chain.json at the repo root.
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
    append_band_index,
    read_band_index,
    write_band_index,
)
from datasketches_server_spark.plans.pipeline import (
    conv_signatures,
    dedup_pipeline,
    incremental_dedup,
)
from datasketches_server_spark.session import get_spark
from datasketches_server_spark.sources.synth import synth_transcripts

# shared with the single-batch bench so the certification gate and the
# fingerprint definition cannot drift between the two artifacts
from tools.bench_incremental import fingerprint, quick_ceiling


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--convs", type=int, default=100_000)
    ap.add_argument("--batches", type=int, default=5)
    ap.add_argument("--gate", type=float, default=0.9)
    args = ap.parse_args()

    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("bench_chain", cores=cores)
    spark.range(1000).select(F.xxhash64("id")).count()  # warm

    cfg = PipelineConfig()
    k = args.batches
    mod = 2 * k  # base = slots [k, 2k) = 50%; batch i = slot i
    full_t = synth_transcripts(spark, n_convs=args.convs, seed=42)
    slot = F.pmod(F.xxhash64("conv_id"), F.lit(mod))

    workdir = tempfile.mkdtemp(prefix="bench_chain_")

    def p(name: str) -> str:
        return os.path.join(workdir, name)

    # ---- untimed base: dedup the 50% corpus, persist everything
    base_t = full_t.where(slot >= k)
    base = dedup_pipeline(base_t, cfg)
    base.conv_state.write.parquet(p("state_base"))
    base.edges.write.parquet(p("edges_base"))
    base.clusters.write.parquet(p("clusters_cur"))
    write_band_index(base.conv_state, workdir, cfg, input_fp="base")
    base.unpersist()

    state_dirs = [p("state_base")]
    edge_dirs = [p("edges_base")]
    index_fps = ["base"]
    out: dict = {
        "metric": "per-batch cost across an incremental chain (corpus doubles)",
        "n_convs_total": args.convs,
        "cores": cores,
        "bands": cfg.lsh.bands,
        "batches": [],
    }

    fp_last = None
    for i in range(k):
        new_t = full_t.where(slot == i)
        old_state = None
        for d in state_dirs:
            df = spark.read.parquet(d)
            old_state = df if old_state is None else old_state.unionByName(df)
        old_edges = None
        for d in edge_dirs:
            df = spark.read.parquet(d)
            old_edges = df if old_edges is None else old_edges.unionByName(df)
        old_clusters = spark.read.parquet(p("clusters_cur"))
        old_buckets = read_band_index(spark, workdir, cfg, input_fp=index_fps)

        win: list = []
        cc: list = []
        pre = quick_ceiling()
        t0 = time.monotonic()
        res = incremental_dedup(
            old_state,
            old_edges,
            new_t,
            cfg,
            old_buckets=old_buckets,
            old_clusters=old_clusters,
            window_input_out=win,
            contracted_out=cc,
        )
        fp_last = fingerprint(res.clusters)
        wall = round(time.monotonic() - t0, 3)
        post = quick_ceiling()

        # untimed: collect the work counters BEFORE any absorb write --
        # the relations are lazy and reference clusters_cur, which the
        # absorb below overwrites (and counting them inside the wall
        # would re-run their stages)
        rec = {
            "i": i,
            "n_convs_corpus": old_clusters.count(),
            "n_convs_batch": new_t.select("conv_id").distinct().count(),
            "wall_sec": wall,
            "probes": [pre, post],
            "certified": pre >= args.gate and post >= args.gate,
            "window_input_rows": win[0].count(),
            "contracted_edges": cc[0].count(),
            "fingerprint": fp_last,
        }
        # untimed absorb: new state/edges/clusters/index rows to disk
        # (delta edges straight from the result -- an exceptAll against
        # old_edges would be a corpus-scaled anti-join per batch)
        new_state = conv_signatures(new_t, cfg)
        new_state.write.parquet(p(f"state_b{i}"))
        res.new_edges.write.parquet(p(f"edges_b{i}"))
        res.clusters.write.mode("overwrite").parquet(p("clusters_next"))
        res.unpersist()
        spark.read.parquet(p("clusters_next")).write.mode("overwrite").parquet(
            p("clusters_cur")
        )
        append_band_index(
            spark.read.parquet(p(f"state_b{i}")), workdir, cfg, batch_fp=f"b{i}"
        )
        state_dirs.append(p(f"state_b{i}"))
        edge_dirs.append(p(f"edges_b{i}"))
        index_fps.append(f"b{i}")
        out["batches"].append(rec)
        print(json.dumps(rec))

    # ---- ground truth: one full recompute over the final corpus
    full = dedup_pipeline(full_t, cfg)
    fp_full = fingerprint(full.clusters)
    full.unpersist()
    out["fingerprint_full_recompute"] = fp_full
    out["fingerprint_final_batch"] = fp_last
    out["chain_equals_full"] = fp_full == fp_last
    w = [b["window_input_rows"] for b in out["batches"]]
    out["window_rows_first_to_last_ratio"] = round(w[-1] / max(w[0], 1), 3)
    out["corpus_growth_over_chain"] = round(
        (out["batches"][-1]["n_convs_corpus"] + out["batches"][-1]["n_convs_batch"])
        / max(out["batches"][0]["n_convs_corpus"], 1),
        3,
    )

    print(json.dumps({k: v for k, v in out.items() if k != "batches"}))
    with open(os.path.join(REPO, "BENCH_chain.json"), "w") as f:
        json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
