"""k-word shingling to 64-bit hash sets -- fully native Catalyst.

Generalizes the reference's update lanes (UpdateHandler.java:102-112,
which atomize a stream into scalar items): here the "items" are k-gram
shingles of a conversation, hashed with ``xxhash64`` so downstream
(MinHash, theta sketches) operates on fixed-width longs, never strings.

Native expressions (sequence/transform/slice/xxhash64) keep this inside
whole-stage codegen -- no Python per row.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..config import ShingleConfig
from .text import tokens as _tokens


def shingles(text: Column, cfg: ShingleConfig = ShingleConfig()) -> Column:
    """array<long>: distinct xxhash64 of each k-token window.

    Documents shorter than k tokens yield a single shingle over the whole
    token stream (so no row is dropped and exact dups still collide).
    """
    toks = _tokens(text, cfg.lowercase, cfg.token_pattern)
    n = F.size(toks)
    windows = F.sequence(F.lit(0), F.greatest(n - cfg.k, F.lit(0)))
    return F.array_distinct(
        F.transform(windows, lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i + 1, cfg.k))))
    )
