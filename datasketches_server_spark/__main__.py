"""spark-submit entry point: the full resumable dedup job.

Absolute imports so this file can be passed directly to spark-submit
(with --py-files providing the package); `python -m` works too.

    spark-submit --master local[N] --py-files dss.zip \
        -m datasketches_server_spark  # (or path to this file)
        --input  /path/to/transcripts_parquet_or_table \
        --workdir /path/to/checkpoints \
        [--config config.json] [--synth-convs 100000]

Re-running the same command after a kill resumes from the lineage
manifest (plans/lineage.py): completed buckets are skipped, outputs are
byte-identical.  --config accepts a JSON object with shingle/minhash/
lsh/sketch overrides (our engine config, not the reference's sketch
declarations -- for those see server.py:parse_config).
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import SparkSession

from datasketches_server_spark.config import LshConfig, MinHashConfig, PipelineConfig, ShingleConfig, SketchConfig
from datasketches_server_spark.plans.lineage import LineageRunner
from datasketches_server_spark.plans.metrics import cluster_metrics, global_rollup, shingle_metrics, simscore_metrics
from datasketches_server_spark.sources.io import TableIO
from datasketches_server_spark.sources.synth import synth_transcripts


def load_config(path: str | None) -> PipelineConfig:
    if not path:
        return PipelineConfig()
    with open(path) as f:
        raw = json.load(f)
    return PipelineConfig(
        shingle=ShingleConfig(**raw.get("shingle", {})),
        minhash=MinHashConfig(**raw.get("minhash", {})),
        lsh=LshConfig(**raw.get("lsh", {})),
        sketch=SketchConfig(**raw.get("sketch", {})),
        num_buckets=raw.get("num_buckets", 32),
    )


def main(argv: list[str] | None = None, spark: SparkSession | None = None) -> int:
    # spark: pass an existing session (tests, notebooks) and main() will
    # neither create nor stop one; spark-submit owns its own session.
    ap = argparse.ArgumentParser(prog="datasketches_server_spark")
    ap.add_argument("--input", help="transcripts parquet dir or table name")
    ap.add_argument("--workdir", required=True, help="checkpoint/lineage root")
    ap.add_argument("--config", help="engine config JSON")
    ap.add_argument("--synth-convs", type=int, help="generate a planted corpus instead of --input")
    ap.add_argument("--metrics", action="store_true", help="also emit sketch metric tables")
    ap.add_argument(
        "--batch-input",
        help="NEW-batch transcripts parquet: absorb incrementally against the "
        "completed runs named by --base-fps (daily-ingest mode; per-batch "
        "work scales with the batch via the persisted band index)",
    )
    ap.add_argument(
        "--base-fps",
        help="comma-separated input fingerprints of the completed base runs, "
        "oldest first (a full run prints its input_fp in the summary)",
    )
    ap.add_argument(
        "--batch-fp",
        help="fingerprint recorded for this batch (default: snapshot of --batch-input)",
    )
    args = ap.parse_args(argv)

    owns_session = spark is None
    if owns_session:
        spark = SparkSession.builder.getOrCreate()
        spark.sparkContext.setLogLevel("WARN")
    cfg = load_config(args.config)

    if args.batch_input:
        if not args.base_fps:
            ap.error("--batch-input requires --base-fps")
        io = TableIO(spark, root="/")
        batch = spark.read.parquet(args.batch_input)
        batch_fp = args.batch_fp or io.snapshot_fingerprint(args.batch_input)
        runner = LineageRunner(spark, args.workdir, cfg)
        out, stats = runner.run_incremental(
            batch, input_fp=batch_fp, base_fps=args.base_fps.split(",")
        )
        print(
            json.dumps(
                {
                    "mode": "incremental",
                    "config_hash": cfg.config_hash(),
                    "input_fp": batch_fp,
                    "computed": stats.computed,
                    "skipped": stats.skipped,
                    "n_batch_convs": batch.select("conv_id").distinct().count(),
                    "n_convs_total": out["conv_state"].count(),
                    "n_clusters": out["clusters"].select("cluster_id").distinct().count(),
                }
            )
        )
        if owns_session:
            spark.stop()
        return 0

    if args.synth_convs:
        transcripts = synth_transcripts(spark, n_convs=args.synth_convs, seed=cfg.minhash.seed)
        input_fp = f"synth:{args.synth_convs}:{cfg.minhash.seed}"
    elif args.input:
        io = TableIO(spark, root="/")
        transcripts = (
            spark.read.table(args.input)
            if "." in args.input and not args.input.startswith("/")
            else spark.read.parquet(args.input)
        )
        input_fp = io.snapshot_fingerprint(args.input) if args.input.startswith("/") else args.input
    else:
        ap.error("--input or --synth-convs required")

    runner = LineageRunner(spark, args.workdir, cfg)
    out, stats = runner.run(transcripts, input_fp=input_fp)
    summary = {
        "config_hash": cfg.config_hash(),
        "input_fp": input_fp,  # pass as --base-fps to later --batch-input runs
        "computed": stats.computed,
        "skipped": stats.skipped,
        # skew observability (no-silent-caps): star_buckets fell back to
        # O(m) star edges; dropped_members were truncated past bucket_cap
        "bucket_stats": stats.bucket_stats,
        "n_convs": out["conv_state"].count(),
        "n_edges": out["edges"].count(),
        "n_clusters": out["clusters"].select("cluster_id").distinct().count(),
    }
    if args.metrics:
        row = global_rollup(
            shingle_metrics(out["conv_state"], cfg),
            simscore_metrics(out["edges"], cfg),
            cluster_metrics(out["clusters"], cfg),
            cfg,
        ).collect()[0]
        summary["metrics"] = {
            "distinct_shingles": int(row["distinct_shingles"]),
            "jaccard_quantiles": [float(x) for x in (row["jaccard_quantiles"] or [])],
            "approx_clusters": int(row["approx_clusters"]),
        }
    print(json.dumps(summary))
    if owns_session:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
