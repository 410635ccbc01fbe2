"""MinHash-128 + SimHash-64 signatures -- one fused vectorized pass.

This is the engine's Python hot path and it is deliberately its *only*
document-level one (SURVEY.md section 7.4 risk #6): a single Arrow-batched
pandas UDF that computes both signatures with flat numpy ops --
``np.minimum.reduceat`` / ``np.add.reduceat`` over the concatenated
shingle arrays of the whole batch, so cost is O(num_perm * total_shingles)
of pure C loops with zero per-row Python.

Hash family: multiply-add over uint64 with odd multipliers (multiply-shift
universal hashing), seeded from config -- deterministic across runs,
executors, and resume.  MinHash here plays the role theta sketches play in
the reference (a min-value sketch per stream, SketchStorage.java:164-168),
but keyed per conversation and used for jaccard estimation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import MinHashConfig


def _perm_params(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 2**62, size=num_perm, dtype=np.uint64) * np.uint64(2) + np.uint64(1)
    b = rng.integers(0, 2**62, size=num_perm, dtype=np.uint64)
    return a, b


def _batch_signatures(
    shingle_arrays: pd.Series, a: np.ndarray, b: np.ndarray, simhash_bits: int
) -> pd.DataFrame:
    vals = [
        np.asarray(x, dtype=np.int64) if len(x) else np.zeros(1, dtype=np.int64)
        for x in shingle_arrays
    ]
    lengths = np.fromiter((len(v) for v in vals), dtype=np.int64, count=len(vals))
    starts = np.zeros(len(vals), dtype=np.int64)
    np.cumsum(lengths[:-1], out=starts[1:])
    flat = np.concatenate(vals).astype(np.uint64)  # wraps mod 2**64

    # MinHash: (num_perm, total) permuted values, segment-min per row
    permuted = a[:, None] * flat[None, :] + b[:, None]
    mins = np.minimum.reduceat(permuted, starts, axis=1)  # (num_perm, n)
    minhash = mins.T.astype(np.int64)

    # SimHash: per-bit +/-1 votes over raw shingle hashes, sign -> bit
    shifts = np.arange(simhash_bits, dtype=np.uint64)[:, None]
    bits = ((flat[None, :] >> shifts) & np.uint64(1)).astype(np.int64) * 2 - 1
    votes = np.add.reduceat(bits, starts, axis=1)  # (bits, n)
    packed = np.zeros(len(vals), dtype=np.uint64)
    for i in range(simhash_bits):  # 64 iterations per *batch*, not per row
        packed |= (votes[i] > 0).astype(np.uint64) << np.uint64(i)
    simhash = packed.astype(np.int64)

    return pd.DataFrame({"minhash": list(minhash), "simhash": simhash})


def signature_udf(cfg: MinHashConfig = MinHashConfig()):
    """pandas UDF: array<long> shingles -> struct(minhash array<long>, simhash long)."""
    a, b = _perm_params(cfg.num_perm, cfg.seed)
    out_type = T.StructType(
        [
            T.StructField("minhash", T.ArrayType(T.LongType())),
            T.StructField("simhash", T.LongType()),
        ]
    )

    @F.pandas_udf(out_type)
    def _sig(shingle_arrays: pd.Series) -> pd.DataFrame:
        return _batch_signatures(shingle_arrays, a, b, cfg.simhash_bits)

    return _sig


def minhash_jaccard(sig_a: Column, sig_b: Column) -> Column:
    """Estimated jaccard = fraction of agreeing signature positions (native)."""
    agree = F.size(F.filter(F.zip_with(sig_a, sig_b, lambda x, y: x == y), lambda v: v))
    return (agree / F.size(sig_a)).cast("double")


def simhash_hamming(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit SimHash fingerprints (native)."""
    return F.bit_count(a.bitwiseXOR(b)).cast("int")


def exact_jaccard(shingles_a: Column, shingles_b: Column) -> Column:
    """Exact jaccard of two distinct-element shingle arrays (native)."""
    inter = F.size(F.array_intersect(shingles_a, shingles_b))
    union = F.size(F.array_union(shingles_a, shingles_b))
    return (inter / F.greatest(union, F.lit(1))).cast("double")
