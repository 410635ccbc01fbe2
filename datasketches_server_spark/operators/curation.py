"""Training-data curation operators: benchmark decontamination,
repetition scoring, stratified sampling, sequence packing.

These are the steps a 100 TB pretraining pipeline runs AFTER dedup
(operators/dedup.py, plans/pipeline.py) and text scoring
(functions/text.py): remove eval-set contamination, drop degenerate
repetitive documents, draw reproducible per-stratum samples, and pack
documents into fixed token budgets.  The reference has no analog (its
scope is sketch serving -- README.md:6-8); these follow the same design
rules as the rest of the repo: native Catalyst expressions only, every
randomness source is the portable u01 hash (functions/portable.py), and
every operator has a DuckDB-replayable formulation so the driver's
correctness gate hash-checks it (q39-q42 in __spark_entry__.py; q43
composes the whole funnel -- dedup keeper -> decontaminate ->
repetition/quality gates -> one verdict per doc).

Scale notes are per-operator; the common theme is that nothing here
shuffles fat text -- grams and token counts reduce to narrow keyed rows
before any exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.portable import u01, word_grams, word_grams_all
from ..functions.text import quality_score, token_count, tokens


def decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document eval-set contamination: the fraction of a training
    document's distinct word n-grams that appear anywhere in the eval
    corpus.  Returns every training doc (zero-hit docs included) as
    (id, n_grams, n_contaminated, contamination).  Two rows sharing an
    id merge into one output row (their gram rows aggregate together);
    pass a unique id for per-document semantics.

    Scale shape: the eval side is a benchmark suite -- thousands of
    documents, millions of distinct grams at most -- so its distinct
    gram set is BROADCAST and the training side never shuffles text:
    ONE tokenize-and-gram pass over the corpus (the dominant cost at
    100 TB), one explode, a broadcast LEFT join marking hits, and one
    map-side-combined groupBy on the near-unique doc id.  The clamp in
    word_grams guarantees every doc >= 1 exploded row, so zero-hit and
    empty docs survive the aggregate.  A contaminated mega-gram cannot
    skew the plan because the join is map-side.
    """
    exploded = docs.select(
        F.col(id_col),
        F.explode(word_grams(tokens(F.col(text_col)), n)).alias("gram"),
    )
    eval_grams = (
        eval_docs.select(
            F.explode(word_grams(tokens(F.col(text_col)), n)).alias("gram")
        )
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    return (
        exploded.join(F.broadcast(eval_grams), "gram", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.count("_hit").cast("long").alias("n_contaminated"),
            F.round(
                F.count("_hit") / F.greatest(F.count("*"), F.lit(1)), 4
            ).alias("contamination"),
        )
    )


def repetition_scores(
    docs: DataFrame, n: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Intra-document repetition: duplicate-n-gram fraction
    (1 - distinct/total) and the highest single-gram multiplicity --
    the classic 'repetitive boilerplate' quality gate.

    Scale shape: explode to (id, gram), two-level aggregate -- both
    groupBys are map-side combined and keyed by the near-unique doc id,
    so the only exchange is narrow (id, gram-hash-sized) rows.  No
    window, no skew (a doc's grams are bounded by its own length).
    """
    g = docs.select(
        F.col(id_col),
        F.explode(word_grams_all(tokens(F.col(text_col)), n)).alias("gram"),
    )
    per_gram = g.groupBy(id_col, "gram").agg(F.count("*").alias("_n"))
    return (
        per_gram.groupBy(id_col)
        .agg(
            F.sum("_n").cast("long").alias("n_grams"),
            F.count("*").cast("long").alias("n_distinct"),
            F.round(1 - F.count("*") / F.sum("_n"), 4).alias("rep_ratio"),
            F.max("_n").cast("long").alias("max_repeat"),
        )
    )


def stratified_sample(
    docs: DataFrame,
    strata_cols: list[str],
    k: int,
    id_col: str = "doc_id",
    salt: str = "strat",
    partial_buckets: int = 32,
) -> DataFrame:
    """Deterministic k-per-stratum sample: rank documents inside each
    stratum by the portable u01 hash of their id (ties by id) and keep
    the top k.  Reproducible across runs, engines (the DuckDB oracle
    replays the same hash), and cluster sizes.

    Scale shape: a naive per-stratum window sorts EVERY member of a
    stratum in one task -- with 10 languages over 10^12 docs that is a
    serial 10^11-row sort.  Instead, top-k is computed in two phases
    (top-k commutes over partitions): phase 1 ranks within
    (stratum, salt-bucket) -- ``partial_buckets`` parallel sub-sorts,
    each keeping only k rows -- phase 2 ranks the surviving
    k x partial_buckets rows per stratum.  The final sort input is
    bounded by k x partial_buckets per stratum regardless of corpus
    size.  Identical output to the naive window.
    """
    key = u01(F.col(id_col), salt)
    keyed = docs.select(*strata_cols, id_col).withColumn("_k", key)
    bucket = F.pmod(F.xxhash64(F.col(id_col)), F.lit(partial_buckets))
    w1 = Window.partitionBy(*strata_cols, "_b").orderBy("_k", id_col)
    survivors = (
        keyed.withColumn("_b", bucket)
        .withColumn("_r1", F.row_number().over(w1))
        .where(F.col("_r1") <= k)
    )
    w2 = Window.partitionBy(*strata_cols).orderBy("_k", id_col)
    return (
        survivors.withColumn("rk", F.row_number().over(w2))
        .where(F.col("rk") <= k)
        .select(*strata_cols, id_col, "rk")
    )


def pack_sequences(
    docs: DataFrame,
    capacity: int,
    strata_cols: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Greedy sequence packing: walk each stratum in id order, assign
    every document to bin floor(preceding-token-total / capacity) --
    the deterministic streaming packer a tokenize-and-shard job uses to
    fill fixed context windows.  Returns one row per (stratum, bin)
    with doc and token totals plus the fill ratio (>1 when a bin's last
    doc overflows the budget; documents are never split).

    Scale shape: packing is inherently sequential WITHIN a stratum (bin
    of doc i depends on all earlier tokens), so the running sum is a
    per-stratum window -- parallel ACROSS strata.  At 100 TB, strata
    must therefore be sized like shards: pack per (source, shard) with
    shard = a hash or ingest-partition of the id space, exactly how
    tokenizer-sharding jobs bound their sequential scans.  Only
    (stratum, id, n_tok) rows reach the window -- the text column is
    reduced to a token count before the shuffle.
    """
    t = docs.select(
        *strata_cols, id_col, token_count(F.col(text_col)).alias("n_tok")
    )
    w = (
        Window.partitionBy(*strata_cols)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    binned = t.withColumn("_cum", F.sum("n_tok").over(w)).select(
        *strata_cols,
        F.expr(f"(_cum - n_tok) DIV {capacity}").alias("bin"),
        "n_tok",
    )
    return binned.groupBy(*strata_cols, "bin").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("bin_tokens"),
        F.round(F.sum("n_tok") / F.lit(float(capacity)), 4).alias("fill"),
    )


def turn_templates(
    turns: DataFrame,
    min_convs: int = 2,
    conv_col: str = "conv_id",
    text_col: str = "text",
    role_col: str | None = "role",
) -> DataFrame:
    """Turn-level template detection: turns whose exact text recurs in
    >= ``min_convs`` DISTINCT conversations (within-conversation repeats
    never qualify).  One row per template md5 fingerprint with its
    conversation spread, total occurrences, and a deterministic
    exemplar -- the boilerplate set a transcript pipeline strips.
    ``role_col=None`` skips the role column (null in the output) for
    inputs without one.

    Scale shape: fat turn text reduces to (md5, conv_id, role) narrow
    rows before the single fingerprint-keyed exchange; both aggregates
    are map-side combined.  10^12 turns shuffle ~48 bytes each, never
    text.
    """
    role = F.col(role_col) if role_col else F.lit(None).cast("string")
    return (
        turns.select(
            F.md5(F.col(text_col)).alias("fp"),
            F.col(conv_col).alias("conv_id"),
            role.alias("role"),
        )
        .groupBy("fp")
        .agg(
            F.count_distinct("conv_id").alias("n_convs"),
            F.count("*").cast("long").alias("n_occurrences"),
            F.min("conv_id").alias("exemplar_conv"),
            F.min("role").alias("role"),
        )
        .where(F.col("n_convs") >= min_convs)
        .select("fp", "n_convs", "n_occurrences", "exemplar_conv", "role")
    )


def template_contamination(
    turns: DataFrame,
    min_convs: int = 2,
    conv_col: str = "conv_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-conversation template contamination: fraction of a
    conversation's turns whose exact text also appears in >= min_convs
    distinct conversations (the :func:`turn_templates` set).  The
    per-conv gate a curation funnel thresholds on.

    Scale shape: the same narrow (conv_id, md5) reduction, a narrow
    fingerprint equi-join against the :func:`turn_templates` set (one
    definition of "template" for both operators), then one map-side
    combined groupBy on the near-unique conv id.  Both join branches
    derive from ``turns``, so Catalyst scans the fat text twice --
    persist the turns relation first when the input is not already a
    cheap parquet scan (same caller-persists convention as
    dedup.cross_doc_duplicate_coverage).
    """
    keyed = turns.select(
        F.col(conv_col).alias("conv_id"), F.md5(F.col(text_col)).alias("fp")
    )
    tmpl = (
        turn_templates(turns, min_convs, conv_col, text_col, role_col=None)
        .select("fp", F.lit(1).alias("_t"))
    )
    return (
        keyed.join(tmpl, "fp", "left")
        .groupBy("conv_id")
        .agg(
            F.count("*").cast("long").alias("n_turns"),
            F.count("_t").cast("long").alias("n_template_turns"),
            F.round(F.count("_t") / F.count("*"), 4).alias("template_frac"),
        )
    )


def agent_loop_scores(
    turns: DataFrame,
    conv_col: str = "conv_id",
    text_col: str = "text",
    role_col: str = "role",
    idx_col: str = "turn_idx",
    loop_run: int = 3,
) -> DataFrame:
    """Per-conversation agent-loop detection: an agent stuck in a loop
    emits the same (role, text) turn consecutively.  Reports, per conv,
    the turn count, how many turns exactly repeat their predecessor
    (same role AND same text), the longest consecutive-identical run,
    and a ``loop_flag`` once that run reaches ``loop_run``.

    Scale shape: every window partitions by conv_id (narrow rows --
    md5 of the text, never the text itself, flows through the sort), so
    state is bounded by the longest single conversation regardless of
    corpus size; the final reduce is one map-side-combined groupBy on
    the near-unique conv key.  Gaps-and-islands via the classic
    row_number difference, all whole-stage-codegen'd -- no UDFs.
    """
    w = Window.partitionBy(conv_col).orderBy(idx_col)
    # NULL role/text coalesce to sentinels BEFORE signing (concat_ws
    # would silently DROP a null part, collapsing distinct turns into
    # one signature): two NULL-text turns compare equal -- identical
    # absent content is a repeat -- and a NULL-text turn never equals a
    # real one.  The q57 oracle applies the same coalesce.
    keyed = turns.select(
        F.col(conv_col).alias("conv_id"),
        F.col(idx_col).alias("turn_idx"),
        F.concat(
            F.coalesce(F.col(role_col), F.lit("<norole>")),
            F.lit("|"),
            F.coalesce(F.md5(F.col(text_col)), F.lit("<notext>")),
        ).alias("sig"),
    )
    marked = keyed.withColumn(
        "is_repeat", (F.col("sig") == F.lag("sig").over(w)).cast("long")
    ).withColumn(
        # island id: row_number minus per-signature row_number is
        # constant within one consecutive run of the same sig
        "run_id",
        F.row_number().over(w)
        - F.row_number().over(Window.partitionBy("conv_id", "sig").orderBy("turn_idx")),
    )
    runs = marked.groupBy("conv_id", "sig", "run_id").agg(
        F.count("*").cast("long").alias("run_len")
    )
    per_run = runs.groupBy("conv_id").agg(F.max("run_len").alias("max_run"))
    per_turn = marked.groupBy("conv_id").agg(
        F.count("*").cast("long").alias("n_turns"),
        F.coalesce(F.sum("is_repeat"), F.lit(0)).cast("long").alias("n_repeat_turns"),
    )
    return per_turn.join(per_run, "conv_id").select(
        "conv_id",
        "n_turns",
        "n_repeat_turns",
        "max_run",
        (F.col("max_run") >= loop_run).alias("loop_flag"),
    )


def structure_audit(
    turns: DataFrame,
    conv_col: str = "conv_id",
    text_col: str = "text",
    role_col: str = "role",
    idx_col: str = "turn_idx",
) -> DataFrame:
    """Per-conversation structural validation for transcript tables:

    * ``has_gap`` -- turn_idx is not the contiguous 0..n-1 sequence
      (checked arithmetically: min=0, max=n-1, all distinct);
    * ``n_role_violations`` -- adjacent turns with the same role
      (strict user/assistant alternation is the expected shape);
    * ``n_empty_turns`` -- whitespace-only text.

    The gate a transcript-ingest pipeline runs BEFORE dedup: malformed
    conversations poison shingling (concatenation order) silently.
    Same scale shape as :func:`agent_loop_scores`: one conv-partitioned
    window over narrow rows + one map-side-combined groupBy.
    """
    w = Window.partitionBy(conv_col).orderBy(idx_col)
    m = turns.select(
        F.col(conv_col).alias("conv_id"),
        F.col(idx_col).alias("turn_idx"),
        F.col(role_col).alias("role"),
        # coalesce first: NULL text is exactly the malformed input this
        # gate exists to catch, and (trim(NULL) == '') is NULL, which a
        # bare cast would count as 0 instead of empty
        (F.trim(F.coalesce(F.col(text_col), F.lit(""))) == "")
        .cast("long")
        .alias("is_empty"),
    ).withColumn("same_role", (F.col("role") == F.lag("role").over(w)).cast("long"))
    return m.groupBy("conv_id").agg(
        F.count("*").cast("long").alias("n_turns"),
        (
            (F.min("turn_idx") != 0)
            | (F.max("turn_idx") != F.count("*") - 1)
            | (F.countDistinct("turn_idx") != F.count("*"))
        ).alias("has_gap"),
        F.coalesce(F.sum("same_role"), F.lit(0)).cast("long").alias("n_role_violations"),
        F.sum("is_empty").cast("long").alias("n_empty_turns"),
    )


def temperature_mix(
    docs: DataFrame,
    budget_frac: float = 0.2,
    alpha: float = 0.5,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature-based source mixing: allocate a global sampling
    budget of ``budget_frac`` x corpus across sources proportionally to
    n_source^alpha (alpha < 1 upsamples small sources -- the standard
    pre-training mix rule), then accept each doc by the portable u01
    hash so runs, resume, and the SQL oracle see the same draw.

    Returns one row per source: size, computed accept rate (6dp -- the
    rounding both engines share, so cross-engine float-sum ULP drift in
    the normalizer cannot flip any accept decision), and accepted count.

    Scale shape: two map-side-combined aggregates over the (tiny)
    source dimension + one broadcast join of the per-source rate back
    onto the corpus; the corpus itself is scanned once and never
    shuffled on a fat key.
    """
    w = docs.groupBy(source_col).agg(F.count("*").cast("long").alias("n_docs"))
    w = w.withColumn("wgt", F.pow(F.col("n_docs").cast("double"), F.lit(float(alpha))))
    tot = w.agg(
        F.sum("wgt").alias("wgt_sum"), F.sum("n_docs").cast("double").alias("n_tot")
    )
    rates = (
        w.crossJoin(F.broadcast(tot))
        .withColumn(
            "rate",
            F.round(
                F.least(
                    F.lit(1.0),
                    F.lit(budget_frac) * F.col("n_tot") * F.col("wgt")
                    / (F.col("wgt_sum") * F.col("n_docs").cast("double")),
                ),
                6,
            ),
        )
        .select(source_col, "n_docs", "rate")
    )
    accepted = (
        docs.join(F.broadcast(rates), source_col)
        .where(u01(F.col(id_col).cast("string"), salt="mix|") <= F.col("rate"))
        .groupBy(source_col)
        .agg(F.count("*").cast("long").alias("n_sampled"))
    )
    return (
        rates.join(accepted, source_col, "left")
        .select(
            source_col,
            "n_docs",
            "rate",
            F.coalesce("n_sampled", F.lit(0)).cast("long").alias("n_sampled"),
        )
    )


def cluster_safe_split(
    docs: DataFrame,
    clusters: DataFrame,
    eval_frac: float = 0.1,
    id_col: str = "doc_id",
    salt: str = "split|",
) -> DataFrame:
    """Leakage-safe train/eval split: near-dup clusters are ATOMIC.

    Splitting a corpus doc-by-doc after dedup still leaks -- two
    members of one near-dup cluster can land on opposite sides of the
    split, which is train/eval contamination by construction.  The
    split unit here is the cluster: every doc draws its split from
    u01(cluster_id) (portable md5 hash, replayable in the DuckDB
    oracle), so all members of a cluster land together and NO verified
    dup edge can cross the boundary (asserted in tests).  Docs absent
    from ``clusters`` are their own unit.

    Expected eval mass is eval_frac of UNITS, not docs -- a mega-cluster
    drags its whole membership to one side; that is the correctness
    property, not a bug (the doc-weighted alternative is exactly the
    leak this operator exists to prevent).

    Scale: ``clusters`` is (conv_id, cluster_id) -- narrow, one row per
    doc.  The join hashes on the near-unique doc id (no skew; the skew
    in cluster SIZE never enters an exchange because the u01 draw is a
    per-row expression after the join).  One shuffle total.
    """
    ids = docs.select(F.col(id_col).cast("string").alias("conv_id"))
    lab = clusters.select("conv_id", "cluster_id")
    return (
        ids.join(lab, "conv_id", "left")
        .select(
            "conv_id",
            F.coalesce("cluster_id", "conv_id").alias("split_unit"),
        )
        .withColumn(
            "split",
            F.when(
                u01(F.col("split_unit"), salt=salt) <= F.lit(eval_frac), F.lit("eval")
            ).otherwise(F.lit("train")),
        )
    )


def token_budget_select(
    docs: DataFrame,
    budget_frac: float = 0.25,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Quality-greedy corpus selection under a global token budget.

    Selects documents in (quality DESC, id ASC) order until the running
    token total reaches ``budget_frac`` of the corpus's tokens -- the
    "best N tokens" step after dedup/gating when the training run has a
    fixed budget.  Selection rule: a doc is in iff its cumulative token
    count (itself included) is <= budget.

    NOT a global-order window at scale: quality is rounded to 4dp, so
    the plan aggregates per quality BUCKET first (<= ~10^4 narrow rows
    regardless of corpus size), prefix-sums bucket totals in one tiny
    window, admits every fully-under-budget bucket wholesale, and runs
    the per-doc running sum ONLY inside the single boundary bucket
    (window partitioned by that bucket's key).  Equivalent, doc for
    doc, to the naive global window the DuckDB oracle runs.
    """
    q = F.round(quality_score(F.col(text_col)), 4)
    t = docs.select(
        F.col(id_col).alias("doc_id"),
        q.alias("quality"),
        token_count(F.col(text_col)).alias("n_tok"),
    )
    total = t.agg(F.sum("n_tok").alias("tot")).select(
        F.floor(F.col("tot") * budget_frac).cast("long").alias("budget")
    )
    buckets = t.groupBy("quality").agg(F.sum("n_tok").alias("bucket_tok"))
    wb = Window.orderBy(F.col("quality").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    buckets = (
        buckets.withColumn("cum_bucket", F.sum("bucket_tok").over(wb))
        .crossJoin(F.broadcast(total))
        .select(
            "quality",
            (F.col("cum_bucket") - F.col("bucket_tok")).alias("tok_before"),
            "cum_bucket",
            "budget",
        )
    )
    joined = t.join(F.broadcast(buckets), "quality")
    whole = joined.where(F.col("cum_bucket") <= F.col("budget"))
    wd = Window.partitionBy("quality").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    boundary = (
        joined.where(
            (F.col("cum_bucket") > F.col("budget"))
            # <= (not <): a zero-token doc whose bucket starts EXACTLY
            # at the budget still satisfies cum <= budget in the naive
            # global-order rule and must be admitted
            & (F.col("tok_before") <= F.col("budget"))
        )
        .withColumn("cum_in_bucket", F.sum("n_tok").over(wd))
        .where(F.col("tok_before") + F.col("cum_in_bucket") <= F.col("budget"))
        .drop("cum_in_bucket")
    )
    return whole.unionByName(boundary).select(
        "doc_id", "quality", "n_tok"
    )


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 64,
    stride: int = 48,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Overlapping fixed-token chunking (embedding / RAG prep).

    Every document becomes ceil-strided windows of ``chunk_tokens``
    normalized tokens starting every ``stride`` tokens (overlap =
    chunk_tokens - stride); the final window is the first one covering
    the tail, so every token lands in >= 1 chunk and no start index
    passes the end.  chunk_idx, 0-based start offset, actual token
    count, and the reassembled chunk text are emitted.

    Per-row explode -- no shuffle at all until a consumer aggregates;
    amplification is n_tok/stride rows per doc carrying only the chunk
    text (bounded by chunk_tokens words), the shape an embedding UDF
    downstream wants.
    """
    if stride <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    # last start index: ceil(max(n - chunk, 0) / stride), integer-exact
    k_last = F.floor(
        (F.greatest(n - chunk_tokens, F.lit(0)) + stride - 1) / stride
    ).cast("int")
    t = docs.select(
        F.col(id_col).alias("doc_id"), toks.alias("toks"), n.alias("n_tok"), k_last.alias("k")
    )
    return (
        t.select(
            "doc_id",
            "n_tok",
            F.posexplode(F.sequence(F.lit(0), F.col("k"))).alias("chunk_idx", "i"),
            "toks",
        )
        .select(
            "doc_id",
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            (F.col("i") * stride).cast("long").alias("start_tok"),
            F.least(F.lit(chunk_tokens), F.col("n_tok") - F.col("i") * stride)
            .cast("long")
            .alias("chunk_len"),
            F.concat_ws(
                " ", F.slice("toks", F.col("i") * stride + 1, chunk_tokens)
            ).alias("chunk_text"),
        )
    )


def unigram_surprisal(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document unigram-LM surprisal score, log10-bucketed (the
    CCNet-style perplexity filter, self-trained).

    CCNet/RefinedWeb rank web documents by the perplexity of a language
    model trained on a clean corpus; the model-free, engine-portable
    version here is a unigram LM trained on the corpus itself with
    surprisal discretized to decimal-digit buckets: a token occurring
    ``cnt`` times in a corpus of ``N`` total tokens scores
    ``digits(N) - digits(cnt)`` (an exact integer floor of
    ``-log10(cnt/N)`` up to one bucket), so no libm ``ln`` enters the
    plan and the DuckDB oracle replays it bit-identically (the module
    rule -- functions/portable.py header).  A document's score is the
    mean bucket over its token OCCURRENCES: rare-token-heavy documents
    (OCR noise, mojibake, codebooks) score high exactly as they do
    under a real perplexity filter.

    Returns one row per document: ``(doc_id, n_toks, ppl_bucket_e4)``
    where ppl_bucket_e4 = round(mean surprisal bucket * 10000) -- the
    sum and count are exact integers, so the one IEEE division is
    portable.

    Scale: the explode is O(total tokens) rows of (id, tok) -- narrow;
    the vocab agg map-side-combines to one row per distinct token; the
    vocab (corpus vocabulary, ~millions of rows at 100 TB) joins back
    BROADCAST so the fat exploded relation never shuffles on the token
    key; the per-doc agg partially aggregates to ~one row per doc per
    partition before its exchange.  The 1-row corpus total rides the
    same broadcast (a crossJoin of an aggregated singleton, the
    repo's standard pattern for corpus constants).
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(F.col(text_col))).alias("tok"),
    )
    vocab = toks.groupBy("tok").agg(F.count("*").alias("cnt"))
    total = vocab.agg(
        F.length(F.sum("cnt").cast("string")).alias("n_digits")
    )
    scored = vocab.select(
        "tok",
        F.length(F.col("cnt").cast("string")).alias("cnt_digits"),
    ).crossJoin(F.broadcast(total))
    return (
        toks.join(F.broadcast(scored), "tok")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_toks"),
            F.sum(F.col("n_digits") - F.col("cnt_digits")).alias("s"),
        )
        .select(
            "doc_id",
            "n_toks",
            F.round(F.col("s") / F.col("n_toks") * 10000)
            .cast("long")
            .alias("ppl_bucket_e4"),
        )
    )


def dsir_importance(
    docs: DataFrame,
    target_source: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """DSIR-style importance weight of every non-target document toward
    a target domain (Xie et al. 2023, "Data Selection for Language
    Models via Importance Resampling"), log10-bucketed.

    DSIR scores a raw document by sum over its features f of
    ``log(p_target(f) / p_raw(f))`` using hashed-ngram counts; the
    engine-portable discretization here uses distinct word bigrams
    (functions/portable.word_grams, the decontamination feature unit)
    and decimal-digit buckets: per bigram,
    ``digits(cnt_t + 1) - digits(cnt_r + 1) + shift`` where the add-one
    is Laplace smoothing and ``shift = digits(N_r + 1) - digits(N_t + 1)``
    normalizes the count ratio into a probability ratio (the target
    corpus is a single domain, orders of magnitude smaller than raw --
    without the shift every weight is just the size imbalance).  All
    integers: no libm, exact DuckDB replay.

    Returns one row per NON-target document:
    ``(doc_id, source, n_grams, wt, wt_per_gram_e4)`` -- ``wt`` is the
    raw bucket sum (length-sensitive, what DSIR resamples on),
    ``wt_per_gram_e4`` the length-normalized score a fixed selection
    threshold can use across scales (> 0 = more target-like than raw).

    Scale: gram dims aggregate with map-side combine; the target dim is
    one domain's vocabulary -- broadcast; the raw dim joins on the gram
    key it was just aggregated on (AQE reuses the exchange); the 1-row
    shift constant broadcasts.  At 100 TB the distinct-bigram dim is
    the big relation, and it is exactly the relation decontaminate()
    already materializes -- a real pipeline computes both in one pass.
    """
    grams = docs.where(F.col(source_col).isNotNull()).select(
        F.col(id_col).alias("doc_id"),
        F.col(source_col).alias("source"),
        F.explode(word_grams(tokens(F.col(text_col)), 2)).alias("gram"),
    )
    tgt = (
        grams.where(F.col("source") == target_source)
        .groupBy("gram")
        .agg(F.count("*").alias("cnt_t"))
    )
    raw = (
        grams.where(F.col("source") != target_source)
        .groupBy("gram")
        .agg(F.count("*").alias("cnt_r"))
    )
    shift = (
        raw.agg(F.length((F.sum("cnt_r") + 1).cast("string")).alias("rd"))
        .crossJoin(
            F.broadcast(
                tgt.agg(F.length((F.sum("cnt_t") + 1).cast("string")).alias("td"))
            )
        )
        .select((F.col("rd") - F.col("td")).alias("shift"))
    )
    per_gram = (
        raw.join(F.broadcast(tgt), "gram", "left")
        .crossJoin(F.broadcast(shift))
        .select(
            "gram",
            (
                F.length((F.coalesce(F.col("cnt_t"), F.lit(0)) + 1).cast("string"))
                - F.length((F.col("cnt_r") + 1).cast("string"))
                + F.col("shift")
            ).alias("w"),
        )
    )
    return (
        grams.where(F.col("source") != target_source)
        .join(per_gram, "gram")
        .groupBy("doc_id", "source")
        .agg(F.count("*").alias("n_grams"), F.sum("w").alias("wt"))
        .select(
            "doc_id",
            "source",
            "n_grams",
            "wt",
            F.round(F.col("wt") / F.col("n_grams") * 10000)
            .cast("long")
            .alias("wt_per_gram_e4"),
        )
    )
