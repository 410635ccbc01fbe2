"""Persisted band-bucket membership index: the incremental-dedup
accumulator.

The reference's accumulator pattern (/root/reference/README.md:377-379,
MergeHandler.java:82-138) merges NEW state into OLD state -- it never
re-derives old state.  The analog here: the old corpus's LSH band
membership, (conv_id, bucket) one row per (conv, band), written once and
probed -- not rebuilt -- by every incremental batch
(operators/lsh.incremental_candidate_pairs).  Without it each daily
batch would re-explode bands and re-sort capping windows over the ENTIRE
combined corpus: O(corpus) narrow work per increment even when the batch
is 0.1% of the corpus (the round-3 scale-killer).

Layout mirrors plans/lineage.py stage outputs: the index dir is KEYED by
``{config_hash}_{input_fp}``, so a config change (different bands/rows
-> different bucket hashes) can never serve a stale index, and two input
snapshots never mix.  Rows are bucketized into ``units`` hash partitions
of the bucket key (``_unit`` dir column) -- at 100 TB this bounds file
sizes, gives the broadcast-semi-join probe partition-parallel scans, and
matches the lineage edge stage's unit scheme.

Growth contract: ``append_band_index`` absorbs each new batch's rows
after its incremental run, so index maintenance is O(|new| x bands) per
batch -- append-only, no rewrite of old rows.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..operators.lsh import band_buckets

BANDS_STAGE = "bands"


def band_index_dir(
    workdir: str, cfg: PipelineConfig = DEFAULT_CONFIG, input_fp: str = "static"
) -> str:
    return os.path.join(workdir, BANDS_STAGE, f"{cfg.config_hash()}_{input_fp}")


def _band_rows(state: DataFrame, cfg: PipelineConfig, units: int) -> DataFrame:
    return (
        band_buckets(state, cfg.lsh)
        .select("conv_id", "bucket")
        .withColumn("_unit", F.pmod(F.col("bucket"), F.lit(units)).cast("int"))
    )


def write_band_index(
    state: DataFrame,
    workdir: str,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    input_fp: str = "static",
    units: int = 8,
) -> str:
    """Materialize the corpus's band membership once (overwrite).

    state: per-conv signatures (DedupResult.conv_state or the lineage
    signatures stage) -- banding is a narrow projection of the minhash
    column, no signature UDF runs."""
    path = band_index_dir(workdir, cfg, input_fp)
    (
        _band_rows(state, cfg, units)
        .write.mode("overwrite")
        .partitionBy("_unit")
        .parquet(path)
    )
    return path


def append_band_index(
    new_state: DataFrame,
    workdir: str,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    input_fp: str = "static",
    units: int = 8,
) -> str:
    """Absorb a new batch's band rows into the index (append-only:
    O(|new| x bands) per batch, old rows untouched).  Call after the
    batch's incremental_dedup run succeeds; rerunning the SAME batch
    after a crash-before-append is safe (duplicate (conv, bucket) rows
    only re-propose the same candidate pairs, which dedup downstream)."""
    path = band_index_dir(workdir, cfg, input_fp)
    (
        _band_rows(new_state, cfg, units)
        .write.mode("append")
        .partitionBy("_unit")
        .parquet(path)
    )
    return path


def read_band_index(
    spark: SparkSession,
    workdir: str,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    input_fp: str = "static",
) -> DataFrame:
    """(conv_id, bucket) membership of the indexed corpus."""
    return (
        spark.read.parquet(band_index_dir(workdir, cfg, input_fp))
        .select("conv_id", "bucket")
    )
