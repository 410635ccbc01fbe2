"""Invariants for the corpus-statistics queries (q88/q89).

The hash-equality gate vs DuckDB lives in tools/check_oracles.py; these
tests pin the mathematical invariants that must hold on ANY corpus, so
a refactor that keeps the oracle in lockstep but breaks the semantics
(e.g. losing the per-source distinct) still fails here.
"""

from pyspark.sql import functions as F

from datasketches_server_spark.plans.queries import (
    q88_source_overlap_matrix,
    q89_vocab_growth,
)


def test_source_overlap_matrix_invariants(spark, sf_dir):
    rows = q88_source_overlap_matrix(spark, sf_dir).collect()
    assert rows, "documents corpus has >1 source, matrix must be non-empty"
    srcs = {r.src_a for r in rows} | {r.src_b for r in rows}
    n_s = len(srcs)
    # ordered pairs only, never more than the complete matrix
    assert len(rows) <= n_s * (n_s - 1) // 2
    for r in rows:
        assert r.src_a < r.src_b
        assert r.n_common >= 1  # pairs sharing nothing are absent, not 0
        assert 0.0 < r.jaccard <= 1.0


def test_source_overlap_matrix_matches_direct_jaccard(spark, sf_dir):
    """Spot-check one pair against an independently computed exact
    Jaccard of the two sources' distinct trigram vocabularies."""
    from datasketches_server_spark.functions.portable import word_grams

    rows = q88_source_overlap_matrix(spark, sf_dir).collect()
    r0 = rows[0]
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = F.filter(F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda t: t != "")
    g = d.select("source", F.explode(word_grams(toks, 3)).alias("gram")).distinct()
    va = {r.gram for r in g.where(F.col("source") == r0.src_a).collect()}
    vb = {r.gram for r in g.where(F.col("source") == r0.src_b).collect()}
    inter = len(va & vb)
    assert inter == r0.n_common
    assert abs(inter / len(va | vb) - r0.jaccard) < 5e-5


def test_vocab_growth_invariants(spark, sf_dir):
    rows = q89_vocab_growth(spark, sf_dir).collect()
    assert rows
    # batch 0 is all-new by definition
    assert rows[0].n_new == rows[0].n_grams
    assert rows[0].novelty_e4 == 10000
    cum = 0
    for r in rows:
        assert 0 <= r.n_new <= r.n_grams
        cum += r.n_new
        assert r.cum_vocab == cum  # running sum is exact
    # total vocabulary equals the corpus-wide distinct gram count
    from datasketches_server_spark.functions.portable import word_grams

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = F.filter(F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda t: t != "")
    n_vocab = (
        d.select(F.explode(word_grams(toks, 3)).alias("gram")).distinct().count()
    )
    assert rows[-1].cum_vocab == n_vocab
