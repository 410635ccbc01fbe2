"""Deterministic synthetic transcript corpora.

Two generators, both pure DataFrame expressions (no driver-side data, no
``rand()``), so they scale to any row count and reproduce byte-identically
from (seed, sizes) alone:

* :func:`synth_transcripts` -- planted near-duplicate families for
  recall/cluster tests and the bench corpus.  Every token is a
  deterministic function of ``xxhash64(seed, family/conv, position)``;
  convs in the same family share a base token stream and differ by a
  per-conv mutation rate (0 = exact dup, small = near dup, large =
  effectively unique).
* :func:`transcripts_from_documents` -- derives a transcripts table from
  the driver-provided ``documents`` parquet by splitting each document
  into fixed-length turns.  The derivation is simple enough to replay in
  ANSI SQL, so DuckDB oracles can verify pipeline stages on it.

Schema (BASELINE.json input_hint):
``conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

TRANSCRIPT_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]

# small fixed vocabulary in the spirit of the testdata documents table
VOCAB = (
    "spark table query scan filter join agg group sort window merge batch "
    "stream row column value key hash part data fast slow big small line "
    "order customer vector the a index cache disk memory shuffle stage task "
    "plan cost read write commit snapshot branch tag file block page segment"
).split()

# per-conv mutation levels: slot -> fraction of tokens replaced
MUTATION_LEVELS = [0.0, 0.0, 0.02, 0.05, 0.35, 0.75]


def _h(*cols: Column | str | int) -> Column:
    """Deterministic 64-bit hash; non-negative via pmod."""
    lits = [c if isinstance(c, Column) else F.lit(c) for c in cols]
    return F.pmod(F.xxhash64(*lits), F.lit(2**31))


def synth_transcripts(
    spark: SparkSession,
    n_convs: int = 2000,
    seed: int = 42,
    dup_fraction: float = 0.5,
    avg_family_size: int = 4,
    partitions: int | None = None,
) -> DataFrame:
    """Planted-duplicate transcript corpus as one exploded DataFrame.

    The first ``dup_fraction`` of convs are grouped into families of
    ``avg_family_size``; the rest are singleton families.  Token counts
    and turn lengths are family-level so family members align
    position-by-position (near-dups under k-shingle jaccard).
    """
    n_dup = int(n_convs * dup_fraction)
    n_families = max(1, n_dup // avg_family_size)

    base = spark.range(0, n_convs, 1, partitions or spark.sparkContext.defaultParallelism)
    conv = F.col("id")
    family = F.when(conv < n_dup, F.pmod(conv, F.lit(n_families))).otherwise(conv + n_convs)
    df = base.select(
        conv.alias("conv_num"),
        family.alias("family"),
    )
    # family-level shape
    df = df.withColumn("n_tokens", (F.lit(48) + _h(seed, "ntok", F.col("family")) % 144).cast("int"))
    df = df.withColumn("turn_len", (F.lit(8) + _h(seed, "tlen", F.col("family")) % 9).cast("int"))
    # per-conv mutation rate in basis points (family slot 0 keeps two
    # exact copies per family: conv slots 0,1 -> level 0)
    slot = F.pmod(_h(seed, "slot", F.col("conv_num")), F.lit(len(MUTATION_LEVELS)))
    levels = F.array(*[F.lit(int(m * 10000)) for m in MUTATION_LEVELS])
    df = df.withColumn("mut_bp", F.element_at(levels, (slot + 1).cast("int")))

    vocab = F.array(*[F.lit(w) for w in VOCAB])
    nv = len(VOCAB)
    tokens = F.transform(
        F.sequence(F.lit(0), F.col("n_tokens") - 1),
        lambda j: F.when(
            _h(seed, "mut", F.col("conv_num"), j) % 10000 < F.col("mut_bp"),
            F.element_at(vocab, (_h(seed, "alt", F.col("conv_num"), j) % nv + 1).cast("int")),
        ).otherwise(
            F.element_at(vocab, (_h(seed, "base", F.col("family"), j) % nv + 1).cast("int"))
        ),
    )
    df = df.withColumn("tokens", tokens)
    n_turns = F.ceil(F.col("n_tokens") / F.col("turn_len")).cast("int")
    df = df.select(
        "conv_num",
        "turn_len",
        "tokens",
        F.posexplode(F.sequence(F.lit(0), n_turns - 1)).alias("_pos", "turn_idx"),
    )
    turn_text = F.concat_ws(
        " ", F.slice(F.col("tokens"), F.col("turn_idx") * F.col("turn_len") + 1, F.col("turn_len"))
    )
    return df.select(
        F.concat(F.lit("conv-"), F.lpad(F.col("conv_num").cast("string"), 8, "0")).alias("conv_id"),
        F.col("turn_idx").cast("int").alias("turn_idx"),
        F.element_at(
            F.array(F.lit("user"), F.lit("assistant")), F.pmod(F.col("turn_idx"), F.lit(2)).cast("int") + 1
        ).alias("role"),
        turn_text.alias("text"),
        F.when(F.pmod(F.col("turn_idx"), F.lit(7)) == 3, F.lit("search")).otherwise(F.lit(None).cast("string")).alias("tool"),
        (
            F.to_timestamp(F.lit("2025-01-01 00:00:00"))
            + F.make_interval(secs=(F.col("conv_num") * 60 + F.col("turn_idx")).cast("double"))
        ).alias("ts"),
    )


def transcripts_from_documents(
    spark: SparkSession, sf_dir: str, turn_len: int = 8
) -> DataFrame:
    """Derive transcripts from the testdata ``documents`` table.

    Deterministic, SQL-replayable: doc ``text`` is split on single spaces
    into ``turn_len``-token turns; re-concatenating turns in
    ``(conv_id, turn_idx)`` order restores ``text`` exactly (the per-row
    invariant asserted in tests and the DuckDB oracle).
    """
    from .io import spread_scan

    # single-row-group test files make this scan ONE task; the per-doc
    # turn explode below is the expensive part, so spread it first
    # (no-op on a real multi-file corpus)
    docs = spread_scan(spark.read.parquet(f"{sf_dir}/documents.parquet"), "doc_id")
    toks = F.split(F.col("text"), " ")
    n_turns = F.ceil(F.size(toks) / F.lit(turn_len)).cast("int")
    df = docs.select(
        F.col("doc_id"),
        toks.alias("toks"),
        F.posexplode(F.sequence(F.lit(0), n_turns - 1)).alias("_pos", "turn_idx"),
    )
    return df.select(
        F.col("doc_id").cast("string").alias("conv_id"),
        F.col("turn_idx").cast("int").alias("turn_idx"),
        F.element_at(
            F.array(F.lit("user"), F.lit("assistant")), F.pmod(F.col("turn_idx"), F.lit(2)).cast("int") + 1
        ).alias("role"),
        F.concat_ws(" ", F.slice(F.col("toks"), F.col("turn_idx") * turn_len + 1, turn_len)).alias("text"),
        F.lit(None).cast("string").alias("tool"),
        (
            F.to_timestamp(F.lit("2024-06-01 00:00:00"))
            + F.make_interval(secs=(F.col("doc_id") * 60 + F.col("turn_idx")).cast("double"))
        ).alias("ts"),
    )


def transcripts_from_documents_sql(turn_len: int = 8) -> str:
    """DuckDB SQL replay of :func:`transcripts_from_documents` (oracle)."""
    return f"""
    SELECT CAST(doc_id AS VARCHAR) AS conv_id,
           CAST(t.turn_idx AS INTEGER) AS turn_idx,
           CASE WHEN t.turn_idx % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
           array_to_string(toks[t.turn_idx*{turn_len}+1 : t.turn_idx*{turn_len}+{turn_len}], ' ') AS text,
           CAST(NULL AS VARCHAR) AS tool,
           TIMESTAMP '2024-06-01 00:00:00'
             + to_seconds(doc_id*60 + t.turn_idx) AS ts
    FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents) d,
         LATERAL (SELECT UNNEST(range(CAST(ceil(len(toks)/{turn_len}.0) AS BIGINT))) AS turn_idx) t
    """
