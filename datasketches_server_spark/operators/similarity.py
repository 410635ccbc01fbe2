"""Similarity search over embedding columns (array<float>).

Two tiers (task brief "Similarity search"):

* :func:`cosine_topk` -- brute-force exact top-k, fully native
  (zip_with/aggregate dot products; broadcast the query side).  The
  baseline and the verifier for the ANN tier.
* :func:`ann_topk` / :func:`embedding_near_dup_pairs` -- sign-random-
  projection LSH (hyperplanes with +/-1 entries over POWER-OF-2-QUANTIZED
  embeddings): L tables x m bits, MULTI-PROBE on the query side (also
  probe codes within hamming `probe_radius`), PER-BUCKET MEMBER CAPS on
  the data side.  Candidates are equi-join collisions reranked by exact
  cosine.

Scale design: candidate generation shuffles narrow (id, table, code)
longs, never embeddings; a pathological dense cluster (10^6 copies of
one vector) lands in one bucket per table and is CAPPED at bucket_cap
members ordered by a deterministic hash -- candidate volume is bounded
by n_tables x probes x bucket_cap per query instead of going quadratic
(the same skew discipline as the text LSH's salted caps, operators/
lsh.py).  Multi-probe buys the recall that deeper codes would otherwise
cost, WITHOUT shrinking bucket count -- the standard production-ANN
trade (probe the neighboring codes instead of multiplying tables).

Determinism/portability: planes have +/-1 entries from a seeded rng;
embeddings are quantized by floor(x * 512) (a power-of-2 scale, so the
multiply is EXACT in IEEE doubles); code bits are signs of integer dot
products.  Every step is exact integer arithmetic, so runs, resume, and
the DuckDB oracle (q31/q33) reproduce identical buckets; the float
cosine only appears in the final rerank.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql import Window

from ..functions.portable import u01, u01_sql

QUANT = 512  # power of 2: floor(x*QUANT) is exact in doubles on every engine


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


def sign_planes(dim: int, n_tables: int, n_bits: int, seed: int = 42) -> np.ndarray:
    """(n_tables*n_bits, dim) matrix of +/-1 hyperplane signs, seeded --
    shared by the Spark UDF and the SQL-oracle literal builder."""
    rng = np.random.default_rng(seed + dim)
    return (rng.integers(0, 2, size=(n_tables * n_bits, dim)) * 2 - 1).astype(np.int64)


def sign_planes_sql_values(dim: int, n_tables: int, n_bits: int, seed: int = 42) -> str:
    """VALUES rows '(pid, [s0, s1, ...])' replaying sign_planes in SQL."""
    planes = sign_planes(dim, n_tables, n_bits, seed)
    rows = [
        f"({pid}, [{', '.join(f'{int(s)}.0' for s in row)}])"
        for pid, row in enumerate(planes)
    ]
    return ", ".join(rows)


def _codes_udf(n_tables: int, n_bits: int, seed: int):
    """pandas UDF: embedding -> array<long> of per-table bucket codes.
    Exact integer arithmetic end to end (see module docstring)."""
    planes: dict[int, np.ndarray] = {}

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def codes(emb: pd.Series) -> pd.Series:
        mat = np.stack([np.asarray(e, dtype=np.float64) for e in emb])
        dim = mat.shape[1]
        if dim not in planes:
            planes[dim] = sign_planes(dim, n_tables, n_bits, seed)
        qv = np.floor(mat * QUANT).astype(np.int64)
        bits = (qv @ planes[dim].T) > 0  # (n, tables*bits), exact int dots
        weights = 1 << np.arange(n_bits, dtype=np.int64)
        out = np.einsum(
            "ntb,b->nt", bits.reshape(len(mat), n_tables, n_bits).astype(np.int64), weights
        )
        return pd.Series(list(out))

    return codes


def _bucketize(
    df: DataFrame, id_alias: str, n_tables: int, n_bits: int, seed: int
) -> DataFrame:
    codes = _codes_udf(n_tables, n_bits, seed)
    # posexplode wrapped around the UDF call in ONE select: a two-step
    # projection makes Catalyst's UDF extraction evaluate the codes UDF
    # twice per row (stacked ArrowEvalPython, plan-asserted in
    # tests/test_plan_quality.py); this form evaluates it once.
    return df.select(
        F.col("vec_id").alias(id_alias),
        F.posexplode(codes("embedding")).alias("table_idx", "code"),
    )


def _cap_buckets(buckets: DataFrame, id_col: str, bucket_cap: int) -> DataFrame:
    """Deterministic per-bucket member cap: rank by a portable hash of
    the id (unbiased, engine-replayable) and keep bucket_cap members.
    The skew guard: a mega-cluster bucket costs bucket_cap rows, never
    its full membership."""
    w = Window.partitionBy("table_idx", "code").orderBy("_capkey", id_col)
    return (
        buckets.withColumn("_capkey", u01(F.col(id_col), salt="cap|"))
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= bucket_cap)
        .select(id_col, "table_idx", "code")
    )


def cap_order_sql(id_expr: str) -> str:
    """SQL twin of the _cap_buckets ranking key."""
    return u01_sql(id_expr, salt="cap|")


def _probe(buckets: DataFrame, n_bits: int, probe_radius: int) -> DataFrame:
    """Multi-probe expansion: each (table, code) row also probes the
    codes within hamming <= probe_radius (bit flips) -- recall without
    shallower codes.  Narrow rows only; radius 1 multiplies by n_bits+1."""
    if probe_radius <= 0:
        return buckets
    flips = [F.col("code")]
    flips += [F.col("code").bitwiseXOR(F.lit(1 << b)) for b in range(n_bits)]
    if probe_radius >= 2:
        flips += [
            F.col("code").bitwiseXOR(F.lit((1 << b1) | (1 << b2)))
            for b1 in range(n_bits)
            for b2 in range(b1 + 1, n_bits)
        ]
    return buckets.select(
        *[c for c in buckets.columns if c != "code"],
        F.explode(F.array(*flips)).alias("code"),
    )


def ann_topk(
    data: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_tables: int = 24,
    n_bits: int = 6,
    seed: int = 42,
    bucket_cap: int = 128,
    probe_radius: int = 1,
) -> DataFrame:
    """LSH-bucketed approximate top-k, reranked exactly within candidates."""
    d_b = _cap_buckets(
        _bucketize(data, "vec_id", n_tables, n_bits, seed), "vec_id", bucket_cap
    )
    q_b = _probe(_bucketize(queries, "query_id", n_tables, n_bits, seed), n_bits, probe_radius)
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
    data: DataFrame,
    threshold: float = 0.95,
    n_tables: int = 24,
    n_bits: int = 6,
    seed: int = 42,
    bucket_cap: int = 128,
    probe_radius: int = 1,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (dedup family member):
    multi-probe LSH bucket collisions against capped buckets -> exact
    cosine filter, a < b."""
    buckets = _bucketize(data, "vec_id", n_tables, n_bits, seed)
    capped = _cap_buckets(buckets, "vec_id", bucket_cap)
    probes = _probe(buckets, n_bits, probe_radius)
    cands = (
        probes.withColumnRenamed("vec_id", "pid")
        .join(capped, ["table_idx", "code"])
        .where(F.col("pid") != F.col("vec_id"))
        .select(
            F.least("pid", "vec_id").alias("a"), F.greatest("pid", "vec_id").alias("b")
        )
        .distinct()
    )
    ea = data.select(F.col("vec_id").alias("a"), F.col("embedding").alias("emb_a"))
    eb = data.select(F.col("vec_id").alias("b"), F.col("embedding").alias("emb_b"))
    return (
        cands.join(ea, "a").join(eb, "b")
        .select("a", "b", cosine(F.col("emb_a"), F.col("emb_b")).alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )


def cross_corpus_embedding_near_dups(
    train: DataFrame,
    evalq: DataFrame,
    threshold: float = 0.95,
    n_tables: int = 24,
    n_bits: int = 6,
    seed: int = 42,
    bucket_cap: int = 128,
    probe_radius: int = 1,
) -> DataFrame:
    """SEMANTIC cross-corpus decontamination: (a=train vec_id, b=eval
    vec_id, cosine) for every cross-side embedding pair at/above the
    cosine threshold that the sign-LSH banding surfaces -- the
    embedding-space analog of plans/pipeline.cross_corpus_near_dups
    (which catches lexical paraphrase; this catches re-worded semantic
    leaks a shingle jaccard misses entirely).

    Shape at 100 TB: only the TRAIN side is bucketized-and-capped (the
    same capped tables embedding_near_dup_pairs uses, so skew costs
    bucket_cap rows per bucket); the EVAL side's multi-probe rows --
    |eval| x tables x (bits+1), small by definition -- broadcast into
    one equi-join, and the eval embedding column broadcasts into the
    rerank.  Candidates are eval-scaled, so AQE broadcasts them into
    the train-side gather; the train corpus never shuffles.

    Sides are separate columns by construction -- no least/greatest
    normalization, no id-collision hazard when the two tables share
    vec_ids."""
    tb = _cap_buckets(
        _bucketize(train, "vec_id", n_tables, n_bits, seed), "vec_id", bucket_cap
    )
    ep = _probe(
        _bucketize(evalq, "vec_id", n_tables, n_bits, seed), n_bits, probe_radius
    ).withColumnRenamed("vec_id", "b")
    cands = (
        tb.join(F.broadcast(ep), ["table_idx", "code"])
        .select(F.col("vec_id").alias("a"), "b")
        .distinct()
    )
    ea = train.select(F.col("vec_id").alias("a"), F.col("embedding").alias("emb_a"))
    eb = evalq.select(F.col("vec_id").alias("b"), F.col("embedding").alias("emb_b"))
    return (
        cands.join(ea, "a")
        .join(F.broadcast(eb), "b")
        .select("a", "b", cosine(F.col("emb_a"), F.col("emb_b")).alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )


def _train_ivf_centroids(
    data: DataFrame, n_lists: int, n_iters: int, seed: int
) -> np.ndarray:
    """Deterministic IVF coarse quantizer: hash-sampled seeds + a FIXED
    number of Lloyd iterations, centroids L2-normalized and rounded to 6
    decimals each iteration (so a reorder of Spark's float partial sums
    cannot ripple into different assignments between runs).

    Scale shape: the training data never leaves the executors -- each
    iteration is one map-side assignment UDF plus ONE narrow
    (list_id, pos, partial-sum) aggregation; only the n_lists x dim
    centroid matrix (config-bounded, e.g. 64 x 64 doubles) is collected.
    At 100 TB you train on a deterministic hash-sample of the corpus
    (same code path: pass ``data.where(u01(col) < rate)``), never the
    whole table."""
    init = (
        data.withColumn("_k", u01(F.col("vec_id"), salt=f"ivf{seed}|"))
        .orderBy("_k", "vec_id")
        .limit(n_lists)
        .select("embedding")
        .collect()  # bounded: n_lists rows by construction
    )
    C = np.stack([np.asarray(r[0], dtype=np.float64) for r in init])
    C = np.round(C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12), 6)
    for _ in range(n_iters):
        assign = _nearest_lists_udf(C, 1)
        agg = (
            data.select(
                assign("embedding")[0].alias("list_id"),
                F.posexplode("embedding").alias("pos", "val"),
            )
            .groupBy("list_id", "pos")
            .agg(F.sum("val").alias("s"), F.count("*").alias("n"))
            .collect()  # bounded: n_lists x dim rows
        )
        C2 = C.copy()  # empty lists keep their previous centroid
        counts = np.zeros(len(C))
        for r in agg:
            C2[r["list_id"], r["pos"]] = r["s"] / r["n"]
            counts[r["list_id"]] = r["n"]
        C2 = C2 / np.maximum(np.linalg.norm(C2, axis=1, keepdims=True), 1e-12)
        C = np.round(C2, 6)
    return C


def _nearest_lists_udf(centroids: np.ndarray, nprobe: int):
    """pandas UDF: embedding -> array<int> of the nprobe nearest centroid
    ids by cosine (centroids pre-normalized, so argmax of the dot against
    the raw embedding; ties break to the lower list id via argsort's
    stable kind)."""
    C = centroids  # (n_lists, dim), captured in the Arrow-worker closure

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def nearest(emb: pd.Series) -> pd.Series:
        mat = np.stack([np.asarray(e, dtype=np.float64) for e in emb])
        sims = mat @ C.T  # norm of the query scales all lists equally
        order = np.argsort(-sims, axis=1, kind="stable")[:, :nprobe]
        return pd.Series(list(order.astype(np.int32)))

    return nearest


def ivf_topk(
    data: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_lists: int = 16,
    nprobe: int = 4,
    n_iters: int = 2,
    seed: int = 42,
    list_cap: int = 100_000,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k -- the second scale path
    next to the LSH tier (:func:`ann_topk`), trading LSH's multi-table
    redundancy for one learned coarse quantizer:

    * index: every vector joins exactly ONE inverted list (its nearest
      centroid) -- a single narrow (vec_id, list_id) relation, capped at
      ``list_cap`` members per list by the same deterministic-hash rank
      as every other skew cap in this engine;
    * query: each query probes its ``nprobe`` nearest lists; candidates
      are an equi-join on list_id (narrow ids only -- embeddings never
      shuffle for candidate generation), then exact-cosine reranked.

    Candidate volume per query is bounded by nprobe x list_cap.  Recall
    is tunable by nprobe (the IVF analog of multi-probe radius); on the
    ~isotropic synthetic embeddings (no cluster structure for a coarse
    quantizer to learn) recall ~ nprobe/n_lists, so the pytest/registry
    contracts (q64) probe 12 of 16 lists -- real-corpus embeddings are
    clustered, which is the regime IVF exists for."""
    C = _train_ivf_centroids(data, n_lists, n_iters, seed)
    d_l = data.select(
        "vec_id", _nearest_lists_udf(C, 1)("embedding")[0].alias("list_id")
    )
    w = Window.partitionBy("list_id").orderBy("_capkey", "vec_id")
    d_l = (
        d_l.withColumn("_capkey", u01(F.col("vec_id"), salt="ivfcap|"))
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= list_cap)
        .select("vec_id", "list_id")
    )
    q_l = queries.select(
        F.col("vec_id").alias("query_id"),
        F.explode(_nearest_lists_udf(C, nprobe)("embedding")).alias("list_id"),
    )
    cands = (
        d_l.join(q_l, "list_id")
        .select("query_id", "vec_id")
        .where(F.col("vec_id") != F.col("query_id"))
        .distinct()
    )
    q_emb = queries.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe"))
    scored = (
        cands.join(F.broadcast(q_emb), "query_id")
        .join(data.select("vec_id", "embedding"), "vec_id")
        .select("query_id", "vec_id", cosine(F.col("embedding"), F.col("qe")).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "vec_id")
    return scored.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") <= k).drop("_rn")


def semantic_dedup_clusters(
    data: DataFrame,
    threshold: float = 0.95,
    n_tables: int = 24,
    n_bits: int = 6,
    seed: int = 42,
    bucket_cap: int = 128,
    probe_radius: int = 1,
) -> DataFrame:
    """SemDeDup-style semantic duplicate clusters over an embedding
    column: LSH-bucketed candidate pairs above ``threshold`` cosine
    (:func:`embedding_near_dup_pairs`) -> connected components ->
    (vec_id, cluster_id, cluster_size, is_keeper).

    Only clustered vectors (cluster_size >= 2) are returned; the keeper
    is the minimum vec_id of the component (which is also the
    component's label, so no extra argmin pass is needed).  The scale
    shape is the dedup pipeline's: candidate volume bounded by
    tables x probes x bucket_cap, components over an edge list that is
    tiny relative to the corpus, no all-pairs stage anywhere.
    """
    from .components import connected_components

    edges = embedding_near_dup_pairs(
        data, threshold, n_tables, n_bits, seed, bucket_cap, probe_radius
    ).select("a", "b")
    labels = connected_components(edges).select(
        F.col("conv_id").alias("vec_id"), "cluster_id"
    )
    sizes = labels.groupBy("cluster_id").agg(F.count("*").alias("cluster_size"))
    return labels.join(sizes, "cluster_id").select(
        "vec_id",
        "cluster_id",
        "cluster_size",
        (F.col("vec_id") == F.col("cluster_id")).alias("is_keeper"),
    )
