"""Suffix-array longest-duplicate-substring spans for verified pairs.

North-star operator (BASELINE.json): for each confirmed near-duplicate
pair, report the longest common substring (the duplicated span) via a
real suffix array + LCP, not a heuristic matcher.

Implementation: per Arrow batch, each pair builds one int sequence
``bytes(A) + [SEP] + bytes(B)``; prefix-doubling suffix array (numpy
lexsort rounds, O(n log^2 n)) + Kasai LCP; the answer is the max LCP
between adjacent suffixes that start on opposite sides of the separator.
Runs ONLY on LSH-confirmed candidates (SURVEY.md section 4 custom work
#3) so the quadratic-ish per-pair cost is bounded by the verified-edge
count, never by corpus size.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

SEP = 0x110000  # above any unicode code point


def suffix_array(codes: np.ndarray) -> np.ndarray:
    """Prefix-doubling SA over an int array (vectorized lexsort rounds)."""
    n = len(codes)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    _, rank = np.unique(codes, return_inverse=True)
    rank = rank.astype(np.int64)
    k = 1
    while True:
        r2 = np.full(n, -1, dtype=np.int64)
        if k < n:
            r2[: n - k] = rank[k:]
        order = np.lexsort((r2, rank))
        changed = np.ones(n, dtype=bool)
        changed[1:] = (rank[order][1:] != rank[order][:-1]) | (r2[order][1:] != r2[order][:-1])
        new_rank = np.empty(n, dtype=np.int64)
        new_rank[order] = np.cumsum(changed) - 1
        rank = new_rank
        if rank[order[-1]] == n - 1:
            return order
        k *= 2


def lcp_kasai(codes: np.ndarray, sa: np.ndarray) -> np.ndarray:
    """LCP array (lcp[i] = common prefix of sa[i] and sa[i-1])."""
    n = len(codes)
    rank = np.empty(n, dtype=np.int64)
    rank[sa] = np.arange(n)
    lcp = np.zeros(n, dtype=np.int64)
    h = 0
    for i in range(n):
        r = rank[i]
        if r > 0:
            j = sa[r - 1]
            while i + h < n and j + h < n and codes[i + h] == codes[j + h]:
                h += 1
            lcp[r] = h
            if h:
                h -= 1
        else:
            h = 0
    return lcp


def longest_common_subarray(ca: np.ndarray, cb: np.ndarray, sep: int = SEP) -> tuple[int, int, int]:
    """(length, start_in_a, start_in_b) of the longest common contiguous
    run between two int sequences (SA + Kasai over the concatenation;
    ``sep`` must not occur in either input)."""
    codes = np.concatenate([ca, np.array([sep], dtype=np.int64), cb])
    n_a = len(ca)
    sa = suffix_array(codes)
    lcp = lcp_kasai(codes, sa)
    side = sa < n_a  # suffix starts in A (separator suffix counts as B-side)
    cross = np.zeros(len(sa), dtype=bool)
    cross[1:] = side[1:] != side[:-1]
    cand = lcp * cross
    if cand.max(initial=0) == 0:
        return 0, 0, 0
    i = int(cand.argmax())
    length = int(cand[i])
    p, q = int(sa[i]), int(sa[i - 1])
    start_a = min(p, q)
    start_b = max(p, q) - n_a - 1
    return length, start_a, start_b


def longest_common_substring(a: str, b: str) -> tuple[int, int, int]:
    """(length, start_in_a, start_in_b) of the longest common substring
    (character unit)."""
    ca = np.fromiter((ord(c) for c in a), dtype=np.int64, count=len(a))
    cb = np.fromiter((ord(c) for c in b), dtype=np.int64, count=len(b))
    return longest_common_subarray(ca, cb)


_TOKEN_RE = None


def _norm_tokens(s: str) -> list[str]:
    """Same normalization as the shingle path ([a-z0-9]+ on lowercased
    text) so token spans line up with shingle jaccard."""
    global _TOKEN_RE
    if _TOKEN_RE is None:
        import re

        _TOKEN_RE = re.compile(r"[a-z0-9]+")
    return _TOKEN_RE.findall(s.lower())


def longest_common_token_span(a: str, b: str) -> tuple[int, int, int, int, int]:
    """(span_len, start_a, start_b, n_tokens_a, n_tokens_b) where
    span_len is the longest common contiguous TOKEN run -- the unit a
    dedup pipeline reasons in, and SQL-replayable (max shared n-gram)."""
    ta, tb = _norm_tokens(a), _norm_tokens(b)
    vocab: dict[str, int] = {}
    ca = np.fromiter((vocab.setdefault(t, len(vocab)) for t in ta), dtype=np.int64, count=len(ta))
    cb = np.fromiter((vocab.setdefault(t, len(vocab)) for t in tb), dtype=np.int64, count=len(tb))
    L, s1, s2 = longest_common_subarray(ca, cb, sep=-1)
    return L, s1, s2, len(ta), len(tb)


def attach_dup_spans(edges: DataFrame, convs: DataFrame, unit: str = "char") -> DataFrame:
    """edges (a, b, ...) + convs (conv_id, full_text) ->
    edges + (span_len, span_a_start, span_b_start, span_frac).

    unit: "char" (longest common substring) or "token" (longest common
    normalized-token run; span_frac then uses token counts -- the
    SQL-replayable variant the q26 oracle checks).
    span_frac = span_len / min(len_a, len_b): 1.0 means one text is a
    substring of the other.
    """
    ta = convs.select(F.col("conv_id").alias("a"), F.col("full_text").alias("text_a"))
    tb = convs.select(F.col("conv_id").alias("b"), F.col("full_text").alias("text_b"))
    joined = edges.join(ta, "a").join(tb, "b")
    out_fields = [T.StructField(f.name, f.dataType) for f in joined.schema.fields
                  if f.name not in ("text_a", "text_b")]
    out_schema = T.StructType(
        out_fields
        + [
            T.StructField("span_len", T.LongType()),
            T.StructField("span_a_start", T.LongType()),
            T.StructField("span_b_start", T.LongType()),
            T.StructField("span_frac", T.DoubleType()),
        ]
    )
    keep = [f.name for f in out_fields]

    def batches(it):
        for pdf in it:
            lens = np.zeros(len(pdf), dtype=np.int64)
            sa_ = np.zeros(len(pdf), dtype=np.int64)
            sb_ = np.zeros(len(pdf), dtype=np.int64)
            frac = np.zeros(len(pdf), dtype=np.float64)
            for i, (x, y) in enumerate(zip(pdf["text_a"], pdf["text_b"])):
                if unit == "token":
                    L, s1, s2, na, nb = longest_common_token_span(x, y)
                else:
                    L, s1, s2 = longest_common_substring(x, y)
                    na, nb = len(x), len(y)
                lens[i], sa_[i], sb_[i] = L, s1, s2
                frac[i] = L / max(min(na, nb), 1)
            out = pdf[keep].copy()
            out["span_len"] = lens
            out["span_a_start"] = sa_
            out["span_b_start"] = sb_
            out["span_frac"] = frac
            yield out

    return joined.mapInPandas(batches, out_schema)
