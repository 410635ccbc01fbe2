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


def containment_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.9,
    jaccard_below: float | None = None,
    df_cap: int | None = None,
) -> DataFrame:
    """Asymmetric near-SUPERSET pairs the symmetric jaccard gate misses.

    Containment C = |grams(A) ∩ grams(B)| / min(|A|, |B|): a short doc
    pasted verbatim inside a longer one scores C ≈ 1 while its jaccard
    is tiny (|A|/|B|), so LSH-over-jaccard never pairs them.  Emits
    (contained, container, n_inter, containment, jaccard) with
    containment >= threshold; ``jaccard_below`` keeps only pairs BELOW
    the symmetric threshold, i.e. exactly the dups the q24 pipeline
    cannot see.

    Shape, not a cartesian: one inverted-index self-join on the gram
    (the same join the exact-closure oracle runs), then a (a, b) agg.
    The shuffle is O(sum of per-gram df^2); ``df_cap`` is the skew
    guard -- grams seen in more than df_cap docs (boilerplate shingles:
    greetings, headers) are dropped from the index before the join,
    a standard prefix-filter whose effect is observable (a dropped
    gram can only LOWER recall, never create a false pair, because the
    survivors still verify on true intersection counts over the kept
    grams).  At 100 TB run this after LSH dedup on the deduped
    survivors, or bound it per-source; df_cap keeps the hot-gram
    buckets from quadratic blowup either way."""
    toks = tokens(F.col(text_col))
    g = df.select(
        F.col(id_col).cast("string").alias("id"),
        word_grams(toks, n).alias("grams"),
    )
    sizes = g.select("id", F.size("grams").cast("long").alias("n_grams"))
    x = g.select("id", F.explode("grams").alias("gram"))
    if df_cap is not None:
        hot = (
            x.groupBy("gram")
            .agg(F.count("*").alias("gram_df"))
            .where(F.col("gram_df") > df_cap)
            .select("gram")
        )
        x = x.join(F.broadcast(hot), "gram", "left_anti")
    inter = (
        x.select(F.col("id").alias("a"), "gram")
        .join(x.select(F.col("id").alias("b"), "gram"), "gram")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").cast("long").alias("n_inter"))
    )
    scored = (
        inter.join(sizes.select(F.col("id").alias("a"), F.col("n_grams").alias("na")), "a")
        .join(sizes.select(F.col("id").alias("b"), F.col("n_grams").alias("nb")), "b")
        .select(
            # contained = the smaller gram set (ties: smaller id, which
            # is already the "a" side under a < b)
            F.when(F.col("nb") < F.col("na"), F.col("b")).otherwise(F.col("a")).alias("contained"),
            F.when(F.col("nb") < F.col("na"), F.col("a")).otherwise(F.col("b")).alias("container"),
            "n_inter",
            F.round(F.col("n_inter") / F.least("na", "nb"), 4).alias("containment"),
            F.round(F.col("n_inter") / (F.col("na") + F.col("nb") - F.col("n_inter")), 4).alias(
                "jaccard"
            ),
        )
        .where(F.col("containment") >= threshold)
    )
    if jaccard_below is not None:
        scored = scored.where(F.col("jaccard") < jaccard_below)
    return scored


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


def _token_windows(
    docs: DataFrame,
    window: int,
    id_col: str,
    text_col: str,
    exact: bool,
) -> tuple[DataFrame, DataFrame]:
    """(base, wins): base = (id, n_tokens) for docs with >= `window`
    tokens; wins = one row per sliding window position (id, n_tokens,
    pos, wkey).  exact=True keys windows by the window STRING (bit-exact,
    oracle tier); exact=False keys by xxhash64 of it (scale tier: the
    fat string never shuffles, rows are a narrow (long, long, int)).
    Same [a-z0-9]+ normalization as every other tokenizer tier."""
    from ..sources.io import spread_scan

    base = spread_scan(docs, id_col).select(
        F.col(id_col).alias("id"),
        tokens(F.col(text_col)).alias("toks"),
    ).withColumn("n_tokens", F.size("toks").cast("long")).where(
        F.col("n_tokens") >= window
    )
    win_str = lambda s: F.concat_ws(" ", F.slice("toks", s + 1, window))  # noqa: E731
    key = (lambda s: win_str(s)) if exact else (lambda s: F.xxhash64(win_str(s)))
    wins = base.select(
        "id",
        "n_tokens",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.col("n_tokens").cast("int") - window),
                lambda s: key(s),
            )
        ).alias("pos", "wkey"),
    )
    return base.select("id", "n_tokens"), wins


def _interval_union_tokens(occ: DataFrame, window: int) -> DataFrame:
    """occ (id, pos) -> (id, covered_tokens): size of the union of the
    intervals [pos, pos+window) per id.  Gaps-and-islands with window
    functions: an island starts where pos clears the running max end of
    every earlier interval; island length = max(pos)+window-min(pos).
    Per-doc sort of FLAGGED positions only -- the shuffled relation is
    two longs per duplicated window occurrence, never the corpus."""
    from pyspark.sql import Window as W

    w_seq = W.partitionBy("id").orderBy("pos")
    prev_end = F.max(F.col("pos") + window).over(
        w_seq.rowsBetween(W.unboundedPreceding, -1)
    )
    marked = occ.withColumn(
        "new_isl",
        F.when(prev_end.isNull() | (F.col("pos") > prev_end), 1).otherwise(0),
    )
    islands = marked.withColumn("island", F.sum("new_isl").over(w_seq))
    return (
        islands.groupBy("id", "island")
        .agg((F.max("pos") + window - F.min("pos")).alias("ilen"))
        .groupBy("id")
        .agg(F.sum("ilen").cast("long").alias("covered_tokens"))
    )


def cross_doc_duplicate_coverage(
    docs: DataFrame,
    window: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    exact: bool = True,
    min_docs: int = 2,
) -> DataFrame:
    """ExactSubstr-style CORPUS-WIDE duplicate-text coverage (the
    cross-document complement of the per-pair suffix-array spans in
    operators/suffixarray.py): for every document, how many token
    positions sit inside a `window`-token run that also appears in at
    least ``min_docs`` distinct documents.

    Returns (id, n_tokens, dup_tokens, dup_frac) for every doc with
    n_tokens >= window; dup_tokens is the size of the interval UNION of
    flagged windows (overlapping runs are not double-counted).

    Scale shape (10^12 tokens): the window relation is one row per
    token position.  exact=False keys it by xxhash64 so the shuffled
    rows are three longs; the distinct-(wkey,id) + count>=min_docs
    aggregate map-side combines, and only flagged positions reach the
    per-doc island sort.  No member lists are ever collected, so a
    boilerplate window shared by millions of docs costs one count, not
    one bucket sort.  Reference analog: the dedup family the sketch
    server summarizes (distinct counting over streams,
    UpdateHandler.java:102-112) lifted to position-level text reuse.
    """
    base, wins = _token_windows(docs, window, id_col, text_col, exact)
    flagged = (
        wins.select("wkey", "id")
        .distinct()
        .groupBy("wkey")
        .agg(F.count("*").alias("nd"))
        .where(F.col("nd") >= min_docs)
        .select("wkey")
    )
    dup_pos = wins.join(flagged, "wkey", "leftsemi").select("id", "pos")
    cov = _interval_union_tokens(dup_pos, window)
    return (
        base.join(cov, "id", "left")
        .select(
            F.col("id"),
            F.col("n_tokens"),
            F.coalesce(F.col("covered_tokens"), F.lit(0)).cast("long").alias("dup_tokens"),
            F.round(
                F.coalesce(F.col("covered_tokens"), F.lit(0))
                / F.col("n_tokens").cast("double"),
                4,
            ).alias("dup_frac"),
        )
    )


def exactsubstr_removal_plan(
    docs: DataFrame,
    window: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    exact: bool = True,
) -> DataFrame:
    """ExactSubstr REMOVAL policy (the step after detection): for every
    window duplicated across the corpus keep exactly ONE occurrence --
    the smallest (doc id, position), chosen by two partial-aggregate
    steps (min doc per window, then min position inside that doc), never
    a per-window sort -- and schedule every other occurrence's token
    span for removal.

    Returns (id, n_tokens, removed_tokens, kept_tokens) per doc
    (kept = n_tokens - interval-union of removed spans).  A doc equal to
    the concatenation of earlier docs keeps ~0 tokens; the earliest copy
    of each duplicated run always survives, so no text is lost from the
    corpus as a whole.
    """
    base, wins = _token_windows(docs, window, id_col, text_col, exact)
    flagged = (
        wins.select("wkey", "id")
        .distinct()
        .groupBy("wkey")
        .agg(F.count("*").alias("nd"))
        .where(F.col("nd") >= 2)
        .select("wkey")
    )
    occ = wins.join(flagged, "wkey", "leftsemi")
    k1 = occ.groupBy("wkey").agg(F.min("id").alias("kid"))
    k2 = (
        occ.join(k1, "wkey")
        .where(F.col("id") == F.col("kid"))
        .groupBy("wkey", "kid")
        .agg(F.min("pos").alias("kpos"))
    )
    removed_occ = (
        occ.join(k2, "wkey")
        .where(~((F.col("id") == F.col("kid")) & (F.col("pos") == F.col("kpos"))))
        .select("id", "pos")
    )
    cov = _interval_union_tokens(removed_occ, window)
    return (
        base.join(cov, "id", "left")
        .select(
            F.col("id"),
            F.col("n_tokens"),
            F.coalesce(F.col("covered_tokens"), F.lit(0)).cast("long").alias("removed_tokens"),
            (F.col("n_tokens") - F.coalesce(F.col("covered_tokens"), F.lit(0)))
            .cast("long")
            .alias("kept_tokens"),
        )
    )


def cross_doc_duplicate_spans(
    docs: DataFrame,
    window: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    exact: bool = True,
    min_docs: int = 2,
) -> DataFrame:
    """The actionable form of :func:`cross_doc_duplicate_coverage`:
    emit the merged duplicated INTERVALS themselves -- one row per
    maximal run of overlapping flagged windows, (id, span_start,
    span_end, span_tokens) with token positions [span_start, span_end).
    A trim/removal job rewrites exactly these slices; coverage is their
    sum by construction (same gaps-and-islands pass, materialized
    instead of aggregated away)."""
    from pyspark.sql import Window as W

    base, wins = _token_windows(docs, window, id_col, text_col, exact)
    flagged = (
        wins.select("wkey", "id")
        .distinct()
        .groupBy("wkey")
        .agg(F.count("*").alias("nd"))
        .where(F.col("nd") >= min_docs)
        .select("wkey")
    )
    occ = wins.join(flagged, "wkey", "leftsemi").select("id", "pos")
    w_seq = W.partitionBy("id").orderBy("pos")
    prev_end = F.max(F.col("pos") + window).over(
        w_seq.rowsBetween(W.unboundedPreceding, -1)
    )
    marked = occ.withColumn(
        "new_isl",
        F.when(prev_end.isNull() | (F.col("pos") > prev_end), 1).otherwise(0),
    )
    islands = marked.withColumn("island", F.sum("new_isl").over(w_seq))
    return (
        islands.groupBy("id", "island")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            (F.max("pos") + window).cast("long").alias("span_end"),
        )
        .select(
            "id",
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start")).alias("span_tokens"),
        )
    )
