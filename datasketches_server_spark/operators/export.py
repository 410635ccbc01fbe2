"""Training-data shard export: deterministic token-balanced shards.

The last mile of the dedup/curation pipeline: the kept corpus must be
written as size-balanced shards a training loader can stream, with a
manifest (docs, tokens, boundary ids per shard) -- and the assignment
must be DETERMINISTIC (re-running export after a resume, or at a
different parallelism, must produce byte-identical shard membership,
or downstream sample order silently changes between runs).

Rule: documents are laid out in one canonical total order -- id cast to
string, lexicographic -- and cut greedily: a document belongs to shard
``floor(tokens_before_it / target_tokens)``.  Shards are contiguous id
ranges; each holds >= target_tokens until its last doc (a straddling
doc stays in the shard where it starts, so a shard overshoots by at
most one document -- the standard loader-shard contract).

Scale: this is a GLOBAL running sum, but never a global window.  Like
``token_budget_select`` (curation.py), the plan decomposes it in two
levels: per-BUCKET token totals (buckets = the first ``prefix_len``
chars of the id string -- order-preserving under the lexicographic
canonical order) are prefix-summed in one tiny window over the bucket
dimension (<= alphabet^prefix_len rows regardless of corpus size) and
broadcast back; the per-doc running sum then runs inside each bucket's
own window partition.  Doc-for-doc equal to the naive global window the
DuckDB oracle runs.  ``prefix_len`` tunes bucket fan-out: at 100 TB use
enough characters that no single id-prefix bucket dominates (id schemes
with a constant prefix should bump it past the constant part).

No reference analog (apache/datasketches-server has no export path);
this implements the task brief's training-data pipeline requirement.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import token_count


def shard_assign(
    docs: DataFrame,
    target_tokens: int = 1 << 20,
    id_col: str = "doc_id",
    text_col: str = "text",
    prefix_len: int = 2,
    n_tok_col: Column | None = None,
) -> DataFrame:
    """-> (doc_id:string, bucket, n_tok, tok_before, shard_id) -- one row
    per doc, shard_id = floor(tok_before / target_tokens) under the
    canonical lexicographic id order.  ``n_tok_col`` overrides the token
    counter (e.g. a precomputed column) -- default is the engine-wide
    normalized tokenizer, so the DuckDB oracle replays it exactly."""
    sid = F.col(id_col).cast("string")
    n_tok = n_tok_col if n_tok_col is not None else token_count(F.col(text_col))
    t = docs.select(
        sid.alias("doc_id"),
        F.substring(sid, 1, prefix_len).alias("bucket"),
        n_tok.alias("n_tok"),
    )
    bucket_tot = t.groupBy("bucket").agg(F.sum("n_tok").alias("bucket_tok"))
    wb = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    offsets = bucket_tot.select(
        "bucket",
        (F.sum("bucket_tok").over(wb) - F.col("bucket_tok")).alias("bucket_before"),
    )
    wd = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        t.join(F.broadcast(offsets), "bucket")
        .withColumn(
            "tok_before",
            F.col("bucket_before") + F.sum("n_tok").over(wd) - F.col("n_tok"),
        )
        .select(
            "doc_id",
            "bucket",
            "n_tok",
            "tok_before",
            # integer division (ULP-safe at 10^13-token cumsums; the
            # DuckDB oracle's `//` twin)
            F.expr(f"tok_before div {int(target_tokens)}").alias("shard_id"),
        )
    )


def shard_manifest(assignments: DataFrame) -> DataFrame:
    """Per-shard manifest over shard_assign output: doc count, token
    total, and the (lexicographic) boundary ids.  Shards are contiguous
    id ranges, so (first_doc, last_doc) fully describes membership."""
    return (
        assignments.groupBy("shard_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("shard_id")
    )


def write_shards(
    docs: DataFrame,
    out_dir: str,
    target_tokens: int = 1 << 20,
    id_col: str = "doc_id",
    text_col: str = "text",
    prefix_len: int = 2,
) -> DataFrame:
    """Export: parquet partitioned by shard_id (each shard = one
    directory a loader streams independently) + the manifest alongside.
    Payload rows join to their assignment on the near-unique doc id --
    one narrow shuffle; the manifest agg reuses the same assignment.
    Returns the manifest (also persisted at ``<out_dir>/_manifest``)."""
    sid = F.col(id_col).cast("string")
    assign = shard_assign(
        docs, target_tokens=target_tokens, id_col=id_col, text_col=text_col,
        prefix_len=prefix_len,
    )
    payload = docs.withColumn("doc_id", sid) if id_col == "doc_id" else docs.select(
        sid.alias("doc_id"), *[c for c in docs.columns if c != id_col]
    )
    (
        payload.join(assign.select("doc_id", "shard_id"), "doc_id")
        .write.mode("overwrite")
        .partitionBy("shard_id")
        .parquet(f"{out_dir}/shards")
    )
    manifest = shard_manifest(assign)
    manifest.write.mode("overwrite").parquet(f"{out_dir}/_manifest")
    return manifest
