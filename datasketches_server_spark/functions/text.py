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
    """ENGLISH-LIKELIHOOD GATE, not a true language classifier: 'en' if
    the English stopword ratio clears 8%, 'und' otherwise.  A real
    multi-language LID (fastText / CLD3 class) needs trained models --
    external data this environment excludes -- so this is a documented
    substitution (README substitution table): the curation-pipeline
    interface point (q23 thresholds on it) with exact DuckDB
    replayability, honest about what it measures."""
    return F.when(stopword_ratio(col) >= 0.08, F.lit("en")).otherwise(F.lit("und"))


def fingerprint64(col: Column) -> Column:
    """64-bit document fingerprint over normalized tokens (xxhash64 of
    the canonical token stream) -- the exact-dedup key."""
    return F.xxhash64(F.concat_ws(" ", tokens(col)))


# ------------------------------------------------------- Gopher quality rules
#
# Heuristic document-quality gates from Rae et al. 2021 ("Scaling Language
# Models: ... Gopher", section A1.1 quality filtering) -- the standard
# pre-training corpus filter set.  All native Catalyst expressions with
# exact DuckDB twins in __spark_entry__.oracle_sql (q53); ratios are
# deterministic rational arithmetic so the oracle hash-matches.

GOPHER_STOPS = ["the", "be", "to", "of", "and", "that", "have", "with"]

# paper thresholds
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MAX_BULLET_LINE_FRAC = 0.9
GOPHER_MAX_ELLIPSIS_LINE_FRAC = 0.3
GOPHER_MIN_ALPHA_WORD_FRAC = 0.8
GOPHER_MIN_STOP_HITS = 2


def ws_words(col: Column) -> Column:
    """Whitespace words (Gopher's unit), lowercased, empties dropped."""
    return F.filter(F.split(F.lower(col), r"\s+"), lambda w: w != "")


def gopher_flags(col: Column) -> Column:
    """Struct of the seven Gopher quality measurements + the combined
    pass verdict.  One projection, whole-stage codegen'd; no UDFs.

    The verdict gates on the same 4dp-ROUNDED ratios the struct reports
    (and the q53 oracle replays): a consumer recomputing the verdict
    from the struct's fields always agrees with ``passes_gopher``, and a
    boundary doc (e.g. mean_word_len 2.99995) can never flip between
    engines that round before comparing."""
    words = ws_words(col)
    n_words = F.size(words).cast("long")
    denom_w = F.greatest(n_words, F.lit(1)).cast("double")
    total_chars = F.aggregate(
        words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w).cast("long")
    )
    mean_word_len = F.round((total_chars / denom_w).cast("double"), 4)
    n_hash = F.length(col) - F.length(F.replace(col, F.lit("#"), F.lit("")))
    n_ellipsis = (F.length(col) - F.length(F.replace(col, F.lit("..."), F.lit("")))) / F.lit(3)
    symbol_ratio = F.round(((n_hash + n_ellipsis) / denom_w).cast("double"), 4)
    alpha_words = F.size(F.filter(words, lambda w: w.rlike("[a-z]"))).cast("long")
    alpha_word_frac = F.round((alpha_words / denom_w).cast("double"), 4)
    stop_hits = F.size(
        F.filter(F.array(*[F.lit(s) for s in GOPHER_STOPS]), lambda s: F.array_contains(words, s))
    ).cast("long")
    lines = F.filter(F.split(col, "\n"), lambda ln: F.trim(ln) != "")
    denom_l = F.greatest(F.size(lines), F.lit(1)).cast("double")
    bullet_line_frac = F.round(
        (
            F.size(
                F.filter(
                    lines,
                    lambda ln: F.substring(F.ltrim(ln), 1, 1).isin("-", "*", "•"),
                )
            )
            / denom_l
        ).cast("double"),
        4,
    )
    ellipsis_line_frac = F.round(
        (F.size(F.filter(lines, lambda ln: F.endswith(F.rtrim(ln), F.lit("...")))) / denom_l)
        .cast("double"),
        4,
    )
    passes = (
        (n_words >= GOPHER_MIN_WORDS)
        & (n_words <= GOPHER_MAX_WORDS)
        & (mean_word_len >= GOPHER_MIN_MEAN_WORD_LEN)
        & (mean_word_len <= GOPHER_MAX_MEAN_WORD_LEN)
        & (symbol_ratio <= GOPHER_MAX_SYMBOL_RATIO)
        & (bullet_line_frac <= GOPHER_MAX_BULLET_LINE_FRAC)
        & (ellipsis_line_frac <= GOPHER_MAX_ELLIPSIS_LINE_FRAC)
        & (alpha_word_frac >= GOPHER_MIN_ALPHA_WORD_FRAC)
        & (stop_hits >= GOPHER_MIN_STOP_HITS)
    )
    return F.struct(
        n_words.alias("n_words"),
        mean_word_len.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        alpha_word_frac.alias("alpha_word_frac"),
        stop_hits.alias("stop_hits"),
        bullet_line_frac.alias("bullet_line_frac"),
        ellipsis_line_frac.alias("ellipsis_line_frac"),
        passes.alias("passes_gopher"),
    )


# ------------------------------------------------------------- C4 filters
#
# The C4 web-text cleaning rules (Raffel et al. 2020, "Exploring the
# Limits of Transfer Learning...", the C4 corpus construction): line-level
# keep rules (terminal punctuation, >= 5 words, no "javascript", no
# cookie/policy boilerplate) and page-level drop rules (< 3 sentences
# after line filtering, "lorem ipsum", curly brace).  Complements the
# Gopher gates (gopher_flags): Gopher measures word/symbol statistics,
# C4 prunes navigation chrome and code-ish pages.  One codegen'd
# projection, no UDFs; every rule is exactly replayable in ANSI SQL
# (the q76 oracle).  The blocklist-word rule of the paper is omitted:
# the published list is external data, excluded by the build rules.

C4_TERMINALS = [".", "!", "?", '"']
C4_POLICY_PHRASES = ["terms of use", "privacy policy", "cookie policy", "uses cookies"]
C4_MIN_LINE_WORDS = 5
C4_MIN_SENTENCES = 3


def _c4_line_kept(ln: Column) -> Column:
    low = F.lower(ln)
    words = F.filter(F.split(F.trim(low), r"\s+"), lambda w: w != "")
    ends_terminal = F.substring(F.rtrim(ln), -1, 1).isin(*C4_TERMINALS)
    policy_hit = F.lit(False)
    for p in C4_POLICY_PHRASES:
        policy_hit = policy_hit | low.contains(p)
    return (
        ends_terminal
        & (F.size(words) >= C4_MIN_LINE_WORDS)
        & ~low.contains("javascript")
        & ~policy_hit
    )


def c4_flags(col: Column) -> Column:
    """Struct of the C4 cleaning measurements + the combined page verdict.

    ``n_sentences`` counts terminal marks (``.!?``) in the KEPT lines —
    the deterministic sentence proxy both engines replay exactly (the
    paper's sentence splitter is model-free punctuation splitting too).
    ``passes_c4`` = >= 3 sentences after line filtering AND no
    "lorem ipsum" AND no '{' on the raw page (page-level rules apply to
    the raw text, line rules to each line)."""
    lines = F.filter(F.split(col, "\n"), lambda ln: F.trim(ln) != "")
    n_lines = F.size(lines).cast("long")
    kept = F.filter(lines, _c4_line_kept)
    n_kept = F.size(kept).cast("long")
    kept_line_frac = F.round(
        (n_kept / F.greatest(n_lines, F.lit(1)).cast("double")), 4
    )
    n_sentences = F.aggregate(
        kept,
        F.lit(0).cast("long"),
        lambda acc, ln: acc
        + (F.length(ln) - F.length(F.replace(ln, F.lit("."), F.lit(""))))
        + (F.length(ln) - F.length(F.replace(ln, F.lit("!"), F.lit(""))))
        + (F.length(ln) - F.length(F.replace(ln, F.lit("?"), F.lit("")))),
    )
    has_lorem = F.lower(col).contains("lorem ipsum")
    has_brace = col.contains("{")
    passes = (n_sentences >= C4_MIN_SENTENCES) & ~has_lorem & ~has_brace
    return F.struct(
        n_lines.alias("n_lines"),
        n_kept.alias("n_kept_lines"),
        kept_line_frac.alias("kept_line_frac"),
        n_sentences.alias("n_sentences"),
        has_lorem.alias("has_lorem_ipsum"),
        has_brace.alias("has_curly_brace"),
        passes.alias("passes_c4"),
    )


def c4_clean_text(col: Column) -> Column:
    """The C4 line filter as a rewrite: the kept lines re-joined.
    Page-level drops are a row filter on ``c4_flags(...).passes_c4`` —
    composition stays one projection, no shuffle."""
    lines = F.filter(F.split(col, "\n"), lambda ln: F.trim(ln) != "")
    return F.array_join(F.filter(lines, _c4_line_kept), "\n")


# ------------------------------------------------------------- PII scrubbing
#
# Regex-based PII scan + redaction over text columns.  Patterns are kept
# inside the Java-regex / RE2 common subset (no lookaround, no backrefs)
# so the DuckDB oracle replays the SAME pattern byte-for-byte (q54
# hash-matches the md5 of the redacted text).

PII_PATTERNS = {
    # order matters for redaction: emails contain dots, redact first
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"[0-9]{3}-[0-9]{3}-[0-9]{4}",
    "ipv4": r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}",
}


def pii_counts(col: Column) -> Column:
    """Struct of per-kind match counts (the scan/report tier)."""
    return F.struct(
        *[
            F.size(F.regexp_extract_all(col, F.lit(pat), F.lit(0))).cast("long").alias(f"n_{kind}")
            for kind, pat in PII_PATTERNS.items()
        ]
    )


# ------------------------------------------------------- encoding hygiene
#
# Mojibake / broken-decode detection: web-crawl text that survived a bad
# charset decode carries U+FFFD replacement characters and raw C0 control
# bytes.  Both patterns live in the Java-regex / RE2 common subset so the
# q78 oracle replays them byte-for-byte.

ENC_REPLACEMENT_PAT = "�"
# C0 controls except tab/LF/CR (legitimate whitespace)
ENC_CONTROL_PAT = r"[\x00-\x08\x0B\x0C\x0E-\x1F]"
ENC_MAX_BAD_FRAC = 0.0005  # > 1 bad char per 2000 fails the gate


def encoding_flags(col: Column) -> Column:
    """Struct of encoding-hygiene measurements + pass verdict.  One
    codegen'd projection; fracs 4dp-rounded before the gate compares
    (same never-flips-between-engines contract as gopher_flags)."""
    n_chars = F.length(col).cast("long")
    denom = F.greatest(n_chars, F.lit(1)).cast("double")
    n_repl = F.size(F.regexp_extract_all(col, F.lit(ENC_REPLACEMENT_PAT), F.lit(0))).cast("long")
    n_ctrl = F.size(F.regexp_extract_all(col, F.lit(ENC_CONTROL_PAT), F.lit(0))).cast("long")
    repl_frac = F.round((n_repl / denom), 4)
    ctrl_frac = F.round((n_ctrl / denom), 4)
    passes = (repl_frac <= ENC_MAX_BAD_FRAC) & (ctrl_frac <= ENC_MAX_BAD_FRAC)
    return F.struct(
        n_chars.alias("n_chars"),
        n_repl.alias("n_replacement"),
        n_ctrl.alias("n_control"),
        repl_frac.alias("replacement_frac"),
        ctrl_frac.alias("control_frac"),
        passes.alias("passes_encoding"),
    )


def redact_pii(col: Column) -> Column:
    """Replace every PII match with a typed placeholder token.  Applied
    in declaration order so overlapping grammars (emails contain
    dotted hosts) resolve deterministically on both engines."""
    out = col
    for kind, pat in PII_PATTERNS.items():
        out = F.regexp_replace(out, pat, f"<{kind.upper()}>")
    return out
