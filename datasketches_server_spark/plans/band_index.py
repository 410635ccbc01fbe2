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
    batch_fp: str = "static",
    units: int = 8,
) -> str:
    """Absorb a new batch into the index: O(|new| x bands) per batch,
    old rows untouched.  The batch lands in its OWN dir keyed by
    (config_hash, batch_fp) -- the same one-dir-per-snapshot convention
    LineageRunner.ensure_band_index uses -- written with OVERWRITE, so
    rerunning the same batch after a crash replaces its rows instead of
    duplicating them.  (Duplicate rows are not harmless here, code-review
    r4: in the capped regimes a duplicate (conv, bucket) row consumes a
    bucket_cap / ALL_PAIRS_CAP slot and can evict a genuine member or
    flip a bucket to star topology.)  Readers pass the chain of fps to
    read_band_index."""
    return write_band_index(new_state, workdir, cfg, batch_fp, units)


def read_band_index(
    spark: SparkSession,
    workdir: str,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    input_fp: str | list[str] = "static",
) -> DataFrame:
    """(conv_id, bucket) membership of the indexed corpus; pass the list
    of input fps (base + absorbed batches, any order) to read a chain."""
    fps = [input_fp] if isinstance(input_fp, str) else list(input_fp)
    out = None
    for fp in fps:
        df = spark.read.parquet(band_index_dir(workdir, cfg, fp)).select(
            "conv_id", "bucket"
        )
        out = df if out is None else out.unionByName(df)
    return out
