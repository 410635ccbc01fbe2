"""Similarity search over embedding columns (array<float>).

Two tiers (task brief "Similarity search"):

* :func:`cosine_topk` -- brute-force exact top-k, fully native
  (zip_with/aggregate dot products; broadcast the query side).  The
  baseline and the verifier for the ANN tier.
* :func:`ann_topk` -- random-hyperplane LSH (SimHash for vectors):
  L tables x m bits; candidates = bucket collisions in any table,
  reranked by exact cosine.  The scale path: candidate generation is an
  equi-join on (table, code), so a 10^10-vector corpus shuffles narrow
  (id, code) rows instead of embeddings, and only candidates touch the
  wide vectors again.

Hyperplanes are seeded -- deterministic across runs and executors.  The
code computation is one vectorized pandas UDF (numpy matmul per Arrow
batch); everything else is native.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql import Window


def cosine(a: Column, b: Column) -> Column:
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)
    na = F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda s, v: s + v))
    nb = F.sqrt(F.aggregate(F.transform(b, lambda x: x * x), F.lit(0.0), lambda s, v: s + v))
    return (dot / (na * nb)).cast("double")


def cosine_topk(data: DataFrame, queries: DataFrame, k: int = 10) -> DataFrame:
    """Exact top-k: broadcast the (small) query side, score all rows.
    data: (vec_id, embedding); queries: (vec_id, embedding)."""
    q = queries.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe"))
    scored = data.crossJoin(F.broadcast(q)).where(F.col("vec_id") != F.col("query_id"))
    scored = scored.select(
        "query_id", "vec_id", cosine(F.col("embedding"), F.col("qe")).alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "vec_id")
    return scored.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") <= k).drop("_rn")


def _hyperplane_udf(dim_hint: int, n_tables: int, n_bits: int, seed: int):
    rng = np.random.default_rng(seed)
    planes: dict[int, np.ndarray] = {}

    def get_planes(dim: int) -> np.ndarray:
        if dim not in planes:
            r = np.random.default_rng(seed + dim)
            planes[dim] = r.standard_normal((n_tables * n_bits, dim))
        return planes[dim]

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def codes(emb: pd.Series) -> pd.Series:
        mat = np.stack([np.asarray(e, dtype=np.float64) for e in emb])
        h = get_planes(mat.shape[1])
        bits = (mat @ h.T) > 0  # (n, tables*bits)
        weights = (1 << np.arange(n_bits, dtype=np.int64))
        out = np.einsum(
            "ntb,b->nt", bits.reshape(len(mat), n_tables, n_bits).astype(np.int64), weights
        )
        return pd.Series(list(out))

    return codes


def ann_topk(
    data: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_tables: int = 12,
    n_bits: int = 10,
    seed: int = 42,
) -> DataFrame:
    """LSH-bucketed approximate top-k, reranked exactly within candidates."""
    codes = _hyperplane_udf(0, n_tables, n_bits, seed)

    def bucketize(df: DataFrame, id_alias: str) -> DataFrame:
        coded = df.select(
            F.col("vec_id").alias(id_alias), F.col("embedding"), codes("embedding").alias("_codes")
        )
        return coded.select(
            id_alias,
            F.posexplode("_codes").alias("table_idx", "code"),
        )

    d_b = bucketize(data, "vec_id")
    q_b = bucketize(queries, "query_id")
    cands = (
        d_b.join(q_b, ["table_idx", "code"])
        .select("query_id", "vec_id")
        .where(F.col("vec_id") != F.col("query_id"))
        .distinct()
    )
    q_emb = queries.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe"))
    d_emb = data.select("vec_id", "embedding")
    scored = (
        cands.join(F.broadcast(q_emb), "query_id")
        .join(d_emb, "vec_id")
        .select("query_id", "vec_id", cosine(F.col("embedding"), F.col("qe")).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "vec_id")
    return scored.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") <= k).drop("_rn")


def embedding_near_dup_pairs(
    data: DataFrame, threshold: float = 0.95, n_tables: int = 12, n_bits: int = 10, seed: int = 42
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (dedup family member):
    LSH bucket collisions -> exact cosine filter, a < b."""
    codes = _hyperplane_udf(0, n_tables, n_bits, seed)
    coded = data.select("vec_id", "embedding", codes("embedding").alias("_codes"))
    buckets = coded.select("vec_id", F.posexplode("_codes").alias("table_idx", "code"))
    left = buckets.select(F.col("vec_id").alias("a"), "table_idx", "code")
    right = buckets.select(F.col("vec_id").alias("b"), "table_idx", "code")
    cands = (
        left.join(right, ["table_idx", "code"]).where(F.col("a") < F.col("b"))
        .select("a", "b").distinct()
    )
    ea = data.select(F.col("vec_id").alias("a"), F.col("embedding").alias("emb_a"))
    eb = data.select(F.col("vec_id").alias("b"), F.col("embedding").alias("emb_b"))
    return (
        cands.join(ea, "a").join(eb, "b")
        .select("a", "b", cosine(F.col("emb_a"), F.col("emb_b")).alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )
