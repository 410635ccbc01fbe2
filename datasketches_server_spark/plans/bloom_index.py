"""Persisted Bloom-filter membership index: the exact-dedup accumulator.

The reference's accumulator pattern (/root/reference/README.md:377-379,
MergeHandler.java:82-138) is "merge NEW state into OLD state, never
re-derive old state".  The exact-dedup analog of the band/window/semantic
indexes: a bucketed Bloom filter over the corpus's normalized-text
fingerprints.  At 10^12 turns, asking "has this exact conversation been
ingested before?" for a daily batch via a join against the full
fingerprint table shuffles the corpus; the Bloom index answers it with
O(corpus_bits/8) immutable state probed at O(batch) cost:

  1. bucket   = pmod(xxhash64(fp, SEED_BUCKET), n_buckets)  -- JVM-side
  2. bit positions = double hashing h1 + i*h2 mod m (Kirsch-Mitzenmacher
     2006: two xxhash64 calls simulate k independent hashes), also
     JVM-side -- the SAME expressions feed build, probe and absorb, so
     the three can never disagree on a bit.
  3. build:  groupBy(bucket).applyInPandas OR-folds positions into a
     numpy bitset -- one (bucket, bits) row per bucket.
  4. probe:  batch positions COGROUPed with the index on bucket -- the
     filter bytes cross Arrow ONCE PER BUCKET, never once per row (a
     broadcast-join would copy m/8 bytes into every probed row).
  5. verify: only maybe-seen survivors join the (bucketed) fingerprint
     table -- false positives cost verify work, false negatives are
     impossible, so the final answer is EXACT and the DuckDB oracle is a
     plain semi-join.

Mergeability is the point: two filters with the same (m, k) OR together,
so absorbing a batch is bitwise-OR -- ``absorb == rebuild-from-union``
bit-for-bit (positions depend only on (fp, m)).  ``bloom_stats`` exposes
fill fraction and the analytic false-positive estimate fill**k; past
``SATURATION_FP`` the absorb path refuses and the caller rebuilds with
a larger m (the documented maintenance policy -- same shape as the
window-index rebuild-on-retract rule).

Scale notes: m is sized at bits_per_item * n over ALL buckets and split
evenly; n_buckets is chosen so one bucket's bytes (m / n_buckets / 8)
stay under ~64 MB -- an Arrow batch a single cogroup task holds
comfortably.  Probing shuffles only the BATCH by bucket (batch-scaled);
the index never re-shuffles after build.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SEED_BUCKET = 9001
SEED_H1 = 9002
SEED_H2 = 9003
# An optimally-loaded Bloom filter sits at fill = 1-exp(-k*n/m) ~= 0.503
# by design (m/n=10, k=7), so saturation gates on the ANALYTIC fp rate
# fill**k, not on fill itself: 0.05 fp ~= fill 0.652 -- real headroom
# above the by-construction load, still an order tighter than useless.
SATURATION_FP = 0.05

INDEX_SCHEMA = "bucket int, m long, k int, n_rows long, bits binary"


@dataclass(frozen=True)
class BloomConfig:
    bits_per_item: int = 10  # ~1% fp at k=7 (classic m/n=10 sizing)
    n_hashes: int = 7
    n_buckets: int = 32
    min_bits_per_bucket: int = 1024  # floor so tiny corpora stay well under fill

    def config_hash(self) -> str:
        import hashlib

        raw = f"bloom|{self.bits_per_item}|{self.n_hashes}|{self.n_buckets}|{self.min_bits_per_bucket}"
        return hashlib.md5(raw.encode()).hexdigest()[:12]


def _ceil64(n: int) -> int:
    return ((int(n) + 63) // 64) * 64


def bucket_bits(n_items: int, cfg: BloomConfig) -> int:
    """Per-bucket m: total bits split evenly, 64-bit aligned, floored."""
    per = math.ceil(max(n_items, 1) * cfg.bits_per_item / cfg.n_buckets)
    return _ceil64(max(per, cfg.min_bits_per_bucket))


def with_positions(df: DataFrame, fp_col: str, m: int, cfg: BloomConfig) -> DataFrame:
    """Append (bucket, positions) -- all JVM-side, shared by build/probe/
    absorb so the bit layout is defined once.  h2 is forced odd-ish
    (1..m-1) so the double-hash stride never degenerates to 0."""
    fp = F.col(fp_col)
    h1 = F.pmod(F.xxhash64(fp, F.lit(SEED_H1)), F.lit(m))
    h2 = F.pmod(F.xxhash64(fp, F.lit(SEED_H2)), F.lit(m - 1)) + F.lit(1)
    return df.withColumn(
        "bucket",
        F.pmod(F.xxhash64(fp, F.lit(SEED_BUCKET)), F.lit(cfg.n_buckets)).cast("int"),
    ).withColumn(
        "positions",
        F.transform(
            F.sequence(F.lit(0), F.lit(cfg.n_hashes - 1)),
            lambda i: F.pmod(h1 + i * h2, F.lit(m)),
        ),
    )


def _set_bits(bits: np.ndarray, pos_lists) -> int:
    """OR every position into the bitset; returns rows folded."""
    n = 0
    chunks = [np.asarray(p, dtype=np.int64) for p in pos_lists if p is not None]
    if chunks:
        allpos = np.concatenate(chunks)
        np.bitwise_or.at(bits, allpos >> 3, (1 << (allpos & 7)).astype(np.uint8))
        n = len(chunks)
    return n


def build_bloom_index(
    fps: DataFrame, fp_col: str = "fp", cfg: BloomConfig = BloomConfig(), m: int | None = None
) -> DataFrame:
    """One (bucket, m, k, n_rows, bits) row per bucket over DISTINCT
    fingerprints.  m defaults to the corpus-count sizing rule; pass it
    explicitly to absorb into an existing layout."""
    distinct = fps.select(F.col(fp_col).alias("fp")).where(F.col("fp").isNotNull()).distinct()
    if m is None:
        m = bucket_bits(distinct.count(), cfg)
    k = cfg.n_hashes
    pos = with_positions(distinct, "fp", m, cfg).select("bucket", "positions")

    def _fold(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        bits = np.zeros(m // 8, dtype=np.uint8)
        n = _set_bits(bits, pdf["positions"])
        return pd.DataFrame(
            {"bucket": [int(key[0])], "m": [m], "k": [k], "n_rows": [n],
             "bits": [bits.tobytes()]}
        )

    return pos.groupBy("bucket").applyInPandas(_fold, INDEX_SCHEMA)


def index_m(index: DataFrame) -> int:
    """The index's (uniform) per-bucket m; validated on read."""
    row = index.select(F.min("m").alias("lo"), F.max("m").alias("hi")).first()
    if row.lo is None:
        raise ValueError("empty bloom index")
    if row.lo != row.hi:
        raise ValueError(f"bloom index has mixed m ({row.lo} != {row.hi}); rebuild")
    return int(row.lo)


def probe_bloom(
    index: DataFrame,
    batch: DataFrame,
    id_col: str = "id",
    fp_col: str = "fp",
    cfg: BloomConfig = BloomConfig(),
) -> DataFrame:
    """(id, fp, maybe_seen) for every batch row.  Cogrouped on bucket:
    the filter bytes cross to Python once per bucket; buckets absent
    from the index come back with an empty right side -> all False."""
    m = index_m(index)
    pos = with_positions(
        batch.select(F.col(id_col).alias("id"), F.col(fp_col).alias("fp")), "fp", m, cfg
    ).select("id", "fp", "bucket", "positions")

    def _test(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty:
            return pd.DataFrame({"id": [], "fp": [], "maybe_seen": []}).astype(
                {"id": str, "fp": str, "maybe_seen": bool}
            )
        if right.empty:
            return pd.DataFrame(
                {"id": left["id"], "fp": left["fp"], "maybe_seen": False}
            )
        bits = np.frombuffer(right["bits"].iloc[0], dtype=np.uint8)
        hit = [
            bool(np.all(bits[np.asarray(p, dtype=np.int64) >> 3]
                        & (1 << (np.asarray(p, dtype=np.int64) & 7)).astype(np.uint8)))
            for p in left["positions"]
        ]
        return pd.DataFrame({"id": left["id"], "fp": left["fp"], "maybe_seen": hit})

    return (
        pos.groupby("bucket")
        .cogroup(index.groupby("bucket"))
        .applyInPandas(_test, "id string, fp string, maybe_seen boolean")
    )


def seen_filter(
    index: DataFrame,
    base_fps: DataFrame,
    batch: DataFrame,
    id_col: str = "id",
    fp_col: str = "fp",
    cfg: BloomConfig = BloomConfig(),
) -> DataFrame:
    """EXACT (id, seen_before) verdict per batch row: Bloom prefilter,
    then only maybe-seen survivors semi-join the fingerprint table.
    ``base_fps`` is the corpus fingerprint relation (bucketed at scale,
    sources/io.write_bucketed) -- the join input is the SURVIVORS, not
    the batch, so a clean batch costs ~zero join work."""
    probed = probe_bloom(index, batch, id_col, fp_col, cfg)
    survivors = probed.where(F.col("maybe_seen"))
    base = base_fps.select(F.col(fp_col).alias("fp")).distinct()
    verified = (
        survivors.join(base, "fp", "left_semi")
        .select("id", F.lit(True).alias("seen_before"))
    )
    return (
        probed.select("id")
        .join(verified, "id", "left")
        .select("id", F.coalesce("seen_before", F.lit(False)).alias("seen_before"))
    )


def absorb_bloom(
    index: DataFrame, new_fps: DataFrame, fp_col: str = "fp", cfg: BloomConfig = BloomConfig()
) -> DataFrame:
    """Fold a batch into the index: build the batch's delta filters AT
    THE INDEX'S m, then bitwise-OR per bucket.  Never mutates in place
    (recompute-never-mutate, like every accumulator here); absorb ==
    rebuild-from-union bit-for-bit because positions are pure in (fp, m).
    Refuses past SATURATION_FP -- rebuild with a larger m instead."""
    m = index_m(index)
    sat = bloom_stats(index, cfg).agg(F.max("est_fp_rate").alias("f")).first().f
    if sat is not None and sat > SATURATION_FP:
        raise ValueError(
            f"bloom index est fp rate {sat:.4f} > {SATURATION_FP}; rebuild with larger m"
        )
    delta = build_bloom_index(new_fps, fp_col, cfg, m=m)

    def _merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        frames = [f for f in (left, right) if not f.empty]
        head = frames[0]
        bits = np.zeros(m // 8, dtype=np.uint8)
        n = 0
        for f in frames:
            bits |= np.frombuffer(f["bits"].iloc[0], dtype=np.uint8)
            n += int(f["n_rows"].iloc[0])
        return pd.DataFrame(
            {"bucket": [int(head["bucket"].iloc[0])], "m": [m],
             "k": [cfg.n_hashes], "n_rows": [n], "bits": [bits.tobytes()]}
        )

    return (
        index.groupby("bucket").cogroup(delta.groupby("bucket")).applyInPandas(_merge, INDEX_SCHEMA)
    )


def bloom_stats(index: DataFrame, cfg: BloomConfig = BloomConfig()) -> DataFrame:
    """(bucket, n_rows, m, fill_frac, est_fp_rate): the saturation
    dashboard.  fill = popcount/m via one pandas pass over the (small,
    one-row-per-bucket) index; est_fp = fill**k (standard Bloom
    analysis)."""
    k = cfg.n_hashes

    def _stats(pdf: pd.DataFrame) -> pd.DataFrame:
        fills = [
            float(np.unpackbits(np.frombuffer(b, dtype=np.uint8)).sum()) / int(m)
            for b, m in zip(pdf["bits"], pdf["m"])
        ]
        return pd.DataFrame(
            {"bucket": pdf["bucket"], "n_rows": pdf["n_rows"], "m": pdf["m"],
             "fill_frac": np.round(fills, 6),
             "est_fp_rate": np.round(np.power(fills, k), 8)}
        )

    return index.mapInPandas(
        lambda it: (_stats(pdf) for pdf in it),
        "bucket int, n_rows long, m long, fill_frac double, est_fp_rate double",
    )


# ------------------------------------------------------- persistence

BLOOM_STAGE = "bloom"


def bloom_index_dir(workdir: str, cfg: BloomConfig, input_fp: str = "static") -> str:
    return os.path.join(workdir, BLOOM_STAGE, f"{cfg.config_hash()}_{input_fp}")


def write_bloom_index(index: DataFrame, path: str) -> None:
    index.write.mode("overwrite").parquet(path)


def read_bloom_index(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
