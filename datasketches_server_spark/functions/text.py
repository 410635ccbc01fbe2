"""Text functions: conversation assembly, normalization, analysis.

All native Catalyst expressions (whole-stage codegen'd); no Python in the
hot path.  The reference's only text handling is its string ValueType lane
(UpdateHandler.java:102-112); everything here generalizes that to real
corpus processing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# small English stopword list for quality/lang heuristics (public domain)
STOPWORDS = (
    "the a an and or of to in is are was were be been it this that for on "
    "with as at by from not have has had but they you we he she i"
).split()


def assemble_conversations(transcripts: DataFrame) -> DataFrame:
    """(conv_id, turn_idx, text, ...) -> one row per conv with full text.

    Stable turn order without relying on collect_list ordering (which is
    nondeterministic under shuffle): ``listagg ... WITHIN GROUP (ORDER BY
    turn_idx)`` sorts inside the aggregate (turn_idx is unique per conv,
    so the order is total).  One shuffle on conv_id; at 100 TB this is
    the pipeline's first and largest shuffle, and everything downstream
    reuses the conv-keyed partitioning.  (The earlier
    collect_list(struct)+array_sort+transform formulation produced the
    same result but 3x the GC churn -- interpreted HOFs + struct arrays.)
    """
    return transcripts.groupBy("conv_id").agg(
        F.expr("listagg(text, ' ') within group (order by turn_idx)").alias("full_text"),
        F.count("*").cast("long").alias("n_turns"),
    )


def tokens(col: Column, lowercase: bool = True, pattern: str = "[a-z0-9]+") -> Column:
    """Normalize + tokenize.  `pattern` is a MATCH pattern (re.findall
    semantics -- one token per match), the same convention as
    ShingleConfig.token_pattern and the signature UDF, so one config
    drives every tokenizer tier.  The default equals splitting on
    non-alphanumeric runs (what the DuckDB oracles replay)."""
    c = F.lower(col) if lowercase else col
    return F.regexp_extract_all(c, F.lit(pattern), F.lit(0))


def token_count(col: Column) -> Column:
    """Whitespace-ish token count (cheap proxy for LLM token budgeting)."""
    return F.size(tokens(col)).cast("long")


def bpe_ish_piece_count(col: Column) -> Column:
    """BPE-flavored piece count: alphanumeric runs + punctuation runs
    counted as separate pieces (approximates subword tokenizer piece
    counts; lookaround-free so the DuckDB/RE2 oracle can replay it)."""
    alnum_runs = F.size(F.filter(F.split(F.lower(col), "[^a-z0-9]+"), lambda t: t != ""))
    punct_runs = F.size(F.filter(F.split(F.lower(col), r"[a-z0-9\s]+"), lambda t: t != ""))
    return (alnum_runs + punct_runs).cast("long")


def stopword_ratio(col: Column) -> Column:
    toks = tokens(col)
    stop = F.array(*[F.lit(w) for w in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))
    return (n_stop / F.greatest(F.size(toks), F.lit(1))).cast("double")


def punct_ratio(col: Column) -> Column:
    n_punct = F.length(F.regexp_replace(col, r"[^!-/:-@\[-`{-~]", ""))
    return (n_punct / F.greatest(F.length(col), F.lit(1))).cast("double")


def quality_score(col: Column) -> Column:
    """[0,1] doc-quality heuristic: length band + low punctuation +
    healthy mean word length.  Deterministic, SQL-replayable."""
    n = token_count(col)
    len_score = F.when((n >= 10) & (n <= 5000), F.lit(1.0)).otherwise(
        F.when(n < 10, n / F.lit(10.0)).otherwise(F.lit(5000.0) / n)
    )
    mean_word = F.length(col) / F.greatest(n, F.lit(1))
    word_score = F.when((mean_word >= 3) & (mean_word <= 12), F.lit(1.0)).otherwise(F.lit(0.5))
    punct_score = F.lit(1.0) - F.least(punct_ratio(col) * 4, F.lit(1.0))
    return ((len_score + word_score + punct_score) / 3).cast("double")


def lang_id(col: Column) -> Column:
    """Tiny n-gram-free language heuristic: 'en' if the English stopword
    ratio clears 8%, 'und' otherwise.  (Real models are out of scope for
    this container; the interface point is what matters.)"""
    return F.when(stopword_ratio(col) >= 0.08, F.lit("en")).otherwise(F.lit("und"))


def fingerprint64(col: Column) -> Column:
    """64-bit document fingerprint over normalized tokens (xxhash64 of
    the canonical token stream) -- the exact-dedup key."""
    return F.xxhash64(F.concat_ws(" ", tokens(col)))
