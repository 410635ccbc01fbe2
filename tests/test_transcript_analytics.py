"""Invariants for the transcript-analytics queries (q90/q91/q92).

The hash-equality gate vs DuckDB lives in tools/check_oracles.py; these
tests pin the semantics that must hold on ANY corpus, so a refactor that
keeps the oracle in lockstep but breaks the meaning still fails here.
"""

from pyspark.sql import functions as F

from datasketches_server_spark.plans.queries import (
    q38_cluster_keeper_policy,
    q87_shard_manifest,
    q90_tool_motifs,
    q91_dialog_balance,
    q92_dedup_shard_manifest,
)
from datasketches_server_spark.sources.synth import transcripts_from_documents

TOOLS = {"browser", "calc", "python", "search", "sql"}


def test_tool_motifs_invariants(spark, sf_dir):
    rows = q90_tool_motifs(spark, sf_dir).collect()
    assert rows, "the (cid+idx) % 11 plant guarantees tool steps exist"
    for r in rows:
        parts = r.motif.split(">")
        assert len(parts) == 3 and set(parts) <= TOOLS
        assert 1 <= r.n_convs <= r.n
    # each source's shares sum to 10000 up to per-motif rounding
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    for src, rs in by_src.items():
        assert abs(sum(r.share_e4 for r in rs) - 10000) <= len(rs)


def test_tool_motifs_count_matches_per_conv_steps(spark, sf_dir):
    """Total motif count == sum over convs of max(0, tool_steps - 2):
    a sliding trigram over each conv's ordered tool-step sequence."""
    t = transcripts_from_documents(spark, sf_dir)
    steps = t.where(F.col("role") == "assistant")
    per_conv = steps.groupBy("conv_id").agg(F.count("*").alias("k"))
    expected = per_conv.select(
        F.sum(F.greatest(F.col("k") - 2, F.lit(0))).alias("m")
    ).first()["m"]
    total = sum(r.n for r in q90_tool_motifs(spark, sf_dir).collect())
    assert total == int(expected or 0)


def test_dialog_balance_invariants(spark, sf_dir):
    rows = q91_dialog_balance(spark, sf_dir).collect()
    assert rows
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r.n_convs for r in rows) == n_docs
    for r in rows:
        # turn 0 is always 'user', so assistant share can never reach 1;
        # single-turn convs make 0 reachable.
        assert 0.0 <= r.p05_asst_share <= r.p50_asst_share <= r.p95_asst_share < 1.0
        assert r.avg_turns >= 1.0


def test_dedup_shard_manifest_covers_exactly_the_survivors(spark, sf_dir):
    kept = q92_dedup_shard_manifest(spark, sf_dir).collect()
    assert kept
    # shard ids are the contiguous prefix 0..max (greedy cut can't skip)
    sids = sorted(r.shard_id for r in kept)
    assert sids == list(range(len(sids)))
    for r in kept:
        assert r.first_doc <= r.last_doc and r.n_docs >= 1 and r.n_tokens >= 1
    n_dropped = (
        q38_cluster_keeper_policy(spark, sf_dir).where(F.col("dropped")).count()
    )
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r.n_docs for r in kept) == n_docs - n_dropped
    # strictly fewer tokens than the raw-corpus manifest (dups removed)
    raw = q87_shard_manifest(spark, sf_dir).collect()
    assert sum(r.n_tokens for r in kept) < sum(r.n_tokens for r in raw)
    assert n_dropped > 0, "planted near-dup families guarantee drops"


def test_embedding_hygiene_detects_planted_anomalies(spark, sf_dir, tmp_path):
    """The gate must actually fire: plant a NaN vector, a zero vector,
    and a ragged-dim vector into a copy of the corpus and assert each
    lands in the right counter (clean corpus: all counters zero)."""
    from datasketches_server_spark.plans.queries import q93_embedding_hygiene

    clean = q93_embedding_hygiene(spark, sf_dir).collect()
    assert clean
    assert all(r.n_nonfinite == 0 and r.n_zero_norm == 0 and r.n_dims == 1 for r in clean)

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dim = len(e.first().embedding)
    planted = spark.createDataFrame(
        [
            (10_000_001, [float("nan")] * dim, 99),
            (10_000_002, [0.0] * dim, 99),
            (10_000_003, [1.0] * (dim - 3), 99),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    out = str(tmp_path / "emb")
    e.unionByName(planted).write.parquet(f"{out}/embeddings.parquet")
    rows = {r.label: r for r in q93_embedding_hygiene(spark, out).collect()}
    bad = rows[99]
    assert bad.n_nonfinite == 1
    assert bad.n_zero_norm == 1
    assert bad.n_dims == 2 and bad.dim_min == dim - 3 and bad.dim_max == dim
