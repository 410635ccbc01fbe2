"""The dedup operator family over document/conversation tables.

Five members (task brief + north rule), all returning either pair
DataFrames (a, b, score) or cluster assignments:

* :func:`exact_dedup`            -- 64-bit fingerprint hash-groupBy
* MinHash+LSH                    -- plans/pipeline.dedup_pipeline (flagship)
* :func:`simhash_dedup_pairs`    -- 64-bit SimHash, banded bucket join +
                                    hamming verify
* :func:`ngram_jaccard_pairs`    -- exact n-gram jaccard (brute-force
                                    tier for small candidate sets / oracles)
* similarity.embedding_near_dup_pairs -- embedding-cosine near dups

Everything here is native DataFrame ops; the only Python is the shared
signature UDF upstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from functools import reduce

from ..functions.portable import md5_long60, word_grams
from ..functions.signatures import simhash_hamming
from ..functions.text import fingerprint64, tokens


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact duplicates by normalized-token fingerprint: each row gets
    (id, fingerprint, keeper_id, is_duplicate).  One shuffle."""
    fp = df.select(F.col(id_col), fingerprint64(F.col(text_col)).alias("fingerprint"))
    keepers = fp.groupBy("fingerprint").agg(F.min(id_col).alias("keeper_id"))
    return fp.join(keepers, "fingerprint").select(
        id_col,
        "fingerprint",
        "keeper_id",
        (F.col(id_col) != F.col("keeper_id")).alias("is_duplicate"),
    )


def portable_simhash_fingerprints(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    bits: int = 48,
) -> DataFrame:
    """SimHash fingerprints from ENGINE-PORTABLE arithmetic: word
    n-grams hashed via md5 (functions/portable.py), per-bit +/-1 votes,
    sign -> bit.  The DuckDB oracle replays the identical fingerprint,
    which is what makes q25 hash-checkable; the numpy signature UDF
    (functions/signatures.py) remains the pipeline hot path.

    48 bits (not 64): the md5-derived hash is 60 bits, and staying under
    it keeps every shift/mask in plain BIGINT range on both engines."""
    g = docs.select(
        F.col(id_col).alias("id"),
        F.explode(word_grams(tokens(F.col(text_col)), n)).alias("gram"),
    )
    gh = g.select("id", md5_long60(F.col("gram")).alias("h"))
    votes = [
        F.sum(
            F.when(F.shiftright("h", i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{i}")
        for i in range(bits)
    ]
    agg = gh.groupBy("id").agg(*votes)
    fp = reduce(
        lambda a, b: a + b,
        [F.when(F.col(f"v{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0)) for i in range(bits)],
    )
    return agg.select("id", fp.cast("long").alias("fingerprint"))


def simhash_dedup_pairs(
    state: DataFrame,
    max_hamming: int = 3,
    n_bands: int = 4,
    id_col: str = "conv_id",
    bits: int = 64,
) -> DataFrame:
    """SimHash near-dup pairs: split the ``bits``-wide fingerprint into
    ``n_bands`` bands; pairs colliding on any band are verified with
    bit_count(xor).  With n_bands > max_hamming every pair within the
    hamming radius collides on >= 1 band (pigeonhole) -- exact recall,
    LSH cost profile.  state: (id_col, simhash)."""
    assert n_bands > max_hamming, "need n_bands > max_hamming for full recall"
    width = bits // n_bands
    mask = (1 << width) - 1
    bands = state.select(
        F.col(id_col).alias("id"),
        F.col("simhash"),
        F.posexplode(
            F.array(*[
                F.shiftrightunsigned("simhash", i * width).bitwiseAND(F.lit(mask))
                for i in range(n_bands)
            ])
        ).alias("band_idx", "band_val"),
    )
    left = bands.select(F.col("id").alias("a"), F.col("simhash").alias("sh_a"), "band_idx", "band_val")
    right = bands.select(F.col("id").alias("b"), F.col("simhash").alias("sh_b"), "band_idx", "band_val")
    cands = (
        left.join(right, ["band_idx", "band_val"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b", "sh_a", "sh_b")
        .distinct()
    )
    return (
        cands.select("a", "b", simhash_hamming(F.col("sh_a"), F.col("sh_b")).alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
    )


MAX_BRUTE_ROWS = 20_000


def _guard_brute_force(df: DataFrame, max_rows: int, op: str, alt: str) -> None:
    """Refuse to launch an all-pairs plan on a large input (VERDICT:
    nothing should let a user accidentally start a cartesian at corpus
    scale).  One cheap count against the pushed-down scan."""
    n = df.count()
    if n > max_rows:
        raise ValueError(
            f"{op}: {n} rows exceeds the brute-force guard ({max_rows}); "
            f"this tier is O(n^2) -- use {alt} at scale, or raise max_rows "
            "explicitly if you really mean it"
        )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    max_rows: int = MAX_BRUTE_ROWS,
) -> DataFrame:
    """Exact word n-gram jaccard over all pairs -- the brute-force tier
    (O(n^2); use the LSH pipeline at scale, guarded by max_rows).
    Shares token semantics with functions.text.tokens so results line
    up with the fingerprints."""
    _guard_brute_force(df, max_rows, "ngram_jaccard_pairs", "plans.pipeline.dedup_pipeline")
    toks = tokens(F.col(text_col))
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        )
    )
    g = df.select(F.col(id_col), grams.alias("grams"))
    a = g.select(F.col(id_col).alias("a"), F.col("grams").alias("ga"))
    b = g.select(F.col(id_col).alias("b"), F.col("grams").alias("gb"))
    inter = F.size(F.array_intersect("ga", "gb"))
    uni = F.size(F.array_union("ga", "gb"))
    return (
        a.join(b, F.col("a") < F.col("b"))
        .select("a", "b", (inter / uni).cast("double").alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


def hashed_bow_near_dup_pairs(
    docs: DataFrame,
    dim: int = 64,
    threshold: float = 0.9,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_rows: int = MAX_BRUTE_ROWS,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs over documents (dedup
    family member): each doc is embedded as a ``dim``-dimensional hashed
    bag-of-words vector, and pairs with cosine >= threshold are emitted
    (a < b).

    The dimension hash is deliberately portable arithmetic
    (ascii/length, no engine-specific hash), so the DuckDB oracle
    replays it exactly; dot products and norms are integer sums, so the
    cosine predicate is bit-identical across engines.  Sparse
    formulation: one narrow (id, dim, weight) relation, an equi-join on
    dim, and a sum -- Catalyst keeps the whole plan in codegen.  This is
    the brute-force tier (all dims join); the scale path for dense
    learned embeddings is :func:`..similarity.embedding_near_dup_pairs`
    (hyperplane LSH buckets -> exact rerank).  Guarded by max_rows.
    """
    _guard_brute_force(
        docs, max_rows, "hashed_bow_near_dup_pairs", "similarity.embedding_near_dup_pairs"
    )
    tok = docs.select(
        F.col(id_col).alias("_id"), F.explode(tokens(F.col(text_col))).alias("tok")
    )
    d = F.pmod(
        F.ascii(F.substring(F.col("tok"), 1, 1)) * 97
        + F.ascii(F.substring(F.concat(F.col("tok"), F.lit("~")), 2, 1)) * 31
        + F.length(F.col("tok")) * 7,
        F.lit(dim),
    )
    dims = tok.groupBy("_id", d.alias("dim")).agg(F.count("*").alias("w"))
    norms = dims.groupBy("_id").agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm"))
    left = dims.select(F.col("_id").alias("a"), "dim", F.col("w").alias("wa"))
    right = dims.select(F.col("_id").alias("b"), "dim", F.col("w").alias("wb"))
    dots = (
        left.join(right, "dim")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"))
    )
    na = norms.select(F.col("_id").alias("a"), F.col("nrm").alias("na"))
    nb = norms.select(F.col("_id").alias("b"), F.col("nrm").alias("nb"))
    return (
        dots.join(na, "a")
        .join(nb, "b")
        .withColumn("_cos", F.col("dot") / (F.col("na") * F.col("nb")))
        .where(F.col("_cos") >= threshold)
        .select("a", "b", F.round("_cos", 4).alias("cosine"))
    )
