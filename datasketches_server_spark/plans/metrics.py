"""Streaming-mergeable sketch metric tables over the dedup pipeline.

This is the datasketches-server capability re-expressed as data
(BASELINE.json north_star): instead of a stateful HTTP server holding
named sketches, the pipeline emits per-partition sketch rows to metric
tables; global (or any coarser) views are one ``*_union_agg`` away.
Because every sketch is mergeable, incremental appends + periodic
rollup-compaction replace the reference's /update + /merge + /reset
accumulator pattern (README.md:377-379).

Tables (keyed by ``bucket`` = pmod(xxhash64(conv_id), num_buckets)):

* metrics_shingles  -- theta sketch of distinct shingle hashes
  (+ exact-regime distinct count semantics at small scale)
* metrics_simscore  -- KLL sketch of verified-pair jaccard scores
* metrics_clusters  -- hll sketch of cluster ids (cluster cardinality)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import DEFAULT_CONFIG, PipelineConfig


def _bucket(col, n: int):
    return F.pmod(F.xxhash64(col), F.lit(n)).cast("int")


def shingle_metrics(conv_state: DataFrame, cfg: PipelineConfig = DEFAULT_CONFIG) -> DataFrame:
    """theta sketch of distinct shingles per bucket (update op #2)."""
    exploded = conv_state.select(
        _bucket(F.col("conv_id"), cfg.num_buckets).alias("bucket"),
        F.explode("shingles").alias("shingle"),
    )
    return exploded.groupBy("bucket").agg(
        F.theta_sketch_agg("shingle", cfg.sketch.theta_lg_k).alias("theta_shingles"),
        F.count("*").cast("long").alias("n_shingle_rows"),
    )


def simscore_metrics(edges: DataFrame, cfg: PipelineConfig = DEFAULT_CONFIG) -> DataFrame:
    """KLL sketch of pair similarity scores per bucket (update op #5)."""
    return (
        edges.select(
            _bucket(F.col("a"), cfg.num_buckets).alias("bucket"),
            F.col("jaccard").cast("float").alias("score"),
        )
        .groupBy("bucket")
        .agg(
            F.kll_sketch_agg_float("score", cfg.sketch.kll_k).alias("kll_jaccard"),
            F.count("*").cast("long").alias("n_pairs"),
        )
    )


def cluster_metrics(clusters: DataFrame, cfg: PipelineConfig = DEFAULT_CONFIG) -> DataFrame:
    """hll sketch of cluster ids per bucket (update op #4)."""
    return (
        clusters.select(
            _bucket(F.col("conv_id"), cfg.num_buckets).alias("bucket"), "cluster_id"
        )
        .groupBy("bucket")
        .agg(
            F.hll_sketch_agg("cluster_id", cfg.sketch.hll_lg_k).alias("hll_clusters"),
            F.count("*").cast("long").alias("n_convs"),
        )
    )


def global_rollup(
    shingle_m: DataFrame, simscore_m: DataFrame, cluster_m: DataFrame,
    cfg: PipelineConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """Merge all per-bucket sketches to one global row (merge ops #15-18)
    and evaluate (query ops #10-11) -- the /query endpoint as a SELECT."""
    sh = shingle_m.agg(
        F.theta_sketch_estimate(
            F.theta_union_agg("theta_shingles", cfg.sketch.theta_lg_k)
        ).alias("distinct_shingles"),
        F.sum("n_shingle_rows").alias("n_shingle_rows"),
    )
    ss = simscore_m.agg(
        F.kll_merge_agg_float("kll_jaccard", cfg.sketch.kll_k).alias("kll"),
        F.sum("n_pairs").alias("n_pairs"),
    ).select(
        F.kll_sketch_get_quantile_float(
            "kll", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99))
        ).alias("jaccard_quantiles"),
        "n_pairs",
    )
    cl = cluster_m.agg(
        F.hll_sketch_estimate(F.hll_union_agg("hll_clusters", True)).alias("approx_clusters"),
        F.sum("n_convs").alias("n_convs"),
    )
    return sh.crossJoin(ss).crossJoin(cl)


def exactsubstr_metrics(
    coverage: DataFrame, cfg: PipelineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """KLL sketch of per-doc duplicate-coverage fractions per bucket
    (update op #5 lifted to the ExactSubstr family), plus exact token
    totals.  ``coverage`` is the (id, n_tokens, dup_tokens, dup_frac)
    relation from dedup.cross_doc_duplicate_coverage or
    window_index.read_coverage -- batch and incremental paths feed the
    same table, and rows stay mergeable across buckets, batches, and
    compactions like every other metric table here."""
    return (
        coverage.select(
            _bucket(F.col("id"), cfg.num_buckets).alias("bucket"),
            F.col("dup_frac").cast("float").alias("frac"),
            "dup_tokens",
            "n_tokens",
        )
        .groupBy("bucket")
        .agg(
            F.kll_sketch_agg_float("frac", cfg.sketch.kll_k).alias("kll_dup_frac"),
            F.sum("dup_tokens").cast("long").alias("dup_tokens"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.count("*").cast("long").alias("n_docs"),
        )
    )


def exactsubstr_rollup(
    metrics: DataFrame, cfg: PipelineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """Merge the per-bucket ExactSubstr metric rows to one global row:
    coverage-fraction quantiles (merge op #18 + query op #11) and exact
    corpus duplicate-token mass."""
    return (
        metrics.agg(
            F.kll_merge_agg_float("kll_dup_frac", cfg.sketch.kll_k).alias("kll"),
            F.sum("dup_tokens").alias("dup_tokens"),
            F.sum("total_tokens").alias("total_tokens"),
            F.sum("n_docs").alias("n_docs"),
        )
        .select(
            F.kll_sketch_get_quantile_float(
                "kll", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99))
            ).alias("dup_frac_quantiles"),
            "dup_tokens",
            "total_tokens",
            "n_docs",
        )
    )
