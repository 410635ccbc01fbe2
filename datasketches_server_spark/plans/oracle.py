"""Exact brute-force oracle: the "reference clusters" of BASELINE.json.

The reference repo computes no clusters, so the recall contract is judged
against exact computation at the identical shingle/signature config
(SURVEY.md section 6): exact jaccard over the same k-shingle sets, same
threshold, transitive closure.  O(n^2) -- test/verification scale only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import PipelineConfig
from ..functions.signatures import exact_jaccard


def oracle_pairs(conv_state: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """All (a, b) with exact jaccard >= threshold, a < b. Brute force."""
    left = conv_state.select(F.col("conv_id").alias("a"), F.col("shingles").alias("sh_a"))
    right = conv_state.select(F.col("conv_id").alias("b"), F.col("shingles").alias("sh_b"))
    pairs = left.join(right, F.col("a") < F.col("b"))
    return (
        pairs.select("a", "b", exact_jaccard(F.col("sh_a"), F.col("sh_b")).alias("jaccard"))
        .where(F.col("jaccard") >= cfg.lsh.jaccard_threshold)
    )


def union_find_clusters(pairs: list[tuple[str, str]]) -> dict[str, str]:
    """Driver-side union-find with min-id roots (oracle clustering)."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    return {x: find(x) for x in list(parent)}


def pair_recall(found: DataFrame, oracle: DataFrame) -> float:
    """|found ∩ oracle| / |oracle| on (a, b) pair keys."""
    o = oracle.select("a", "b").distinct()
    f = found.select("a", "b").distinct()
    n_oracle = o.count()
    if n_oracle == 0:
        return 1.0
    n_hit = o.join(f, ["a", "b"], "left_semi").count()
    return n_hit / n_oracle
