"""Invariants for the transcript-dedup reconciliation family (q117-q120).

Hash-equality vs DuckDB lives in tools/check_oracles.py; these pin the
semantics — above all q117's reason to exist: a one-token shift slides
every later turn boundary, blinding exact turn dedup (q50) while gram
jaccard stays at 5/7, which q117 must still catch.
"""

from pyspark.sql import functions as F

from datasketches_server_spark.plans.queries import (
    q117_turn_near_dup,
    q118_template_continuation_spread,
    q119_template_cluster_overlap,
    q120_conv_code_switch,
)
from datasketches_server_spark.sources.synth import transcripts_from_documents


def _write_docs(spark, tmp_path, rows, sub="planted"):
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = str(tmp_path / sub)
    docs.write.parquet(f"{out}/documents.parquet")
    return out


def test_turn_near_dup_catches_shifted_boundaries(spark, tmp_path):
    """Doc B = doc A with one token PREPENDED: zero byte-identical
    turns remain (q50-blind), yet every aligned turn pair scores 5/7
    >= 0.7 and q117 must flag all of them."""
    toks = [f"w{k}" for k in range(32)]  # 4 turns of 8
    a = " ".join(toks)
    b = "xshift " + " ".join(toks[:31])  # still 4 turns of 8
    out = _write_docs(spark, tmp_path, [(0, a, "s"), (1, b, "s")])
    # precondition: no exact turn text is shared
    tr = transcripts_from_documents(spark, out)
    shared_exact = (
        tr.where(F.col("conv_id") == "0")
        .select("text")
        .intersect(tr.where(F.col("conv_id") == "1").select("text"))
        .count()
    )
    assert shared_exact == 0
    rows = {r.role: r for r in q117_turn_near_dup(spark, out).collect()}
    # 4 aligned pairs, each marking both sides: 2 user + 2 assistant
    # turns per doc
    assert rows["user"].n_dup_turns == 4
    assert rows["assistant"].n_dup_turns == 4
    assert rows["user"].n_pairs == 2
    assert rows["assistant"].n_pairs == 2


def test_turn_near_dup_corpus_bounds(spark, sf_dir):
    rows = q117_turn_near_dup(spark, sf_dir).collect()
    assert {r.role for r in rows} == {"user", "assistant"}
    n_turns = transcripts_from_documents(spark, sf_dir).count()
    assert sum(r.n_turns for r in rows) == n_turns
    for r in rows:
        assert 0 <= r.n_dup_turns <= r.n_turns
        assert 0 <= r.dup_rate_e4 <= 10000
    # exact-dup docs exist in testdata => identical turns across convs
    assert sum(r.n_dup_turns for r in rows) > 0


def test_template_continuation_spread_planted(spark, tmp_path):
    prompt = " ".join(f"p{k}" for k in range(8))
    rows = [
        (0, prompt + " " + " ".join(f"a{k}" for k in range(8)), "s"),
        (1, prompt + " " + " ".join(f"b{k}" for k in range(16)), "s"),
        (2, prompt + " " + " ".join(f"c{k}" for k in range(24)), "s"),
        (3, " ".join(f"z{k}" for k in range(16)), "s"),  # different prompt, 1 use
    ]
    out = _write_docs(spark, tmp_path, rows)
    got = q118_template_continuation_spread(spark, out).collect()
    assert len(got) == 1  # the 1-use prompt is filtered
    r = got[0]
    assert r.prompt == prompt
    assert r.n_uses == 3
    assert r.n_distinct_next == 3
    assert r.min_cont_toks == 8
    assert r.max_cont_toks == 24
    assert float(r.p50_cont_toks) == 16.0


def test_template_continuation_spread_corpus_bounds(spark, sf_dir):
    for r in q118_template_continuation_spread(spark, sf_dir).collect():
        assert r.n_uses >= 3
        assert 1 <= r.n_distinct_next <= r.n_uses
        assert r.min_cont_toks <= float(r.p50_cont_toks) <= r.max_cont_toks


def test_template_cluster_overlap_explained_vs_spanning(spark, tmp_path):
    """Exact-dup docs form one cluster => their shared turns are
    'explained'; two otherwise-different docs sharing one verbatim turn
    stay unclustered => that template 'spans'."""
    base = " ".join(f"e{k}" for k in range(24))  # 3 turns
    boiler = " ".join(f"bp{k}" for k in range(8))
    rows = [
        (0, base, "s"),
        (1, base, "s"),  # exact dup of 0 -> same cluster
        (2, boiler + " " + " ".join(f"u{k}" for k in range(24)), "s"),
        (3, boiler + " " + " ".join(f"v{k}" for k in range(24)), "s"),
    ]
    out = _write_docs(spark, tmp_path, rows)
    got = {r.conv_bucket: r for r in q119_template_cluster_overlap(spark, out).collect()}
    assert set(got) == {2}
    r = got[2]
    # 3 explained templates (the dup pair's turns) + 1 spanning (boiler)
    assert r.n_explained == 3
    assert r.n_spanning == 1
    assert r.n_templates == 4
    assert r.n_explained + r.n_spanning == r.n_templates


def test_template_cluster_overlap_corpus_partition(spark, sf_dir):
    rows = q119_template_cluster_overlap(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 2 <= r.conv_bucket <= 5
        assert r.n_explained + r.n_spanning == r.n_templates
        assert 0 <= r.spanning_rate_e4 <= 10000


def test_conv_code_switch_planted(spark, tmp_path):
    stops = "the of and to in is was for"  # 8 stopwords -> 'en'
    nonstop = " ".join(f"q{k}" for k in range(8))  # -> 'und'
    rows = [
        (0, stops + " " + nonstop + " " + stops, "s"),  # en/und/en: 2 flips
        (1, nonstop + " " + nonstop, "s"),  # und/und: 0 flips
    ]
    out = _write_docs(spark, tmp_path, rows)
    got = {r.source: r for r in q120_conv_code_switch(spark, out).collect()}
    r = got["s"]
    assert r.n_convs == 2
    assert r.n_switching == 1
    assert r.n_flips == 2
    assert r.switch_rate_e4 == 5000


def test_conv_code_switch_corpus_bounds(spark, sf_dir):
    rows = q120_conv_code_switch(spark, sf_dir).collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r.n_convs for r in rows) == n_docs
    for r in rows:
        assert 0 <= r.n_switching <= r.n_convs
        assert r.n_flips <= r.n_turns
        assert 0 <= r.switch_rate_e4 <= 10000


def test_quality_dup_correlation_partitions_corpus(spark, sf_dir):
    from datasketches_server_spark.plans.queries import (
        documents_dedup_result,
        q121_quality_dup_correlation,
    )

    rows = q121_quality_dup_correlation(spark, sf_dir).collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r.n_docs for r in rows) == n_docs
    res = documents_dedup_result(spark, sf_dir)
    from pyspark.sql import functions as FF

    fam_docs = (
        res.clusters.groupBy("cluster_id")
        .agg(FF.count("*").alias("sz"))
        .where(FF.col("sz") >= 2)
        .agg(FF.sum("sz"))
        .collect()[0][0]
        or 0
    )
    assert sum(r.n_dup for r in rows) == fam_docs
    for r in rows:
        assert 0 <= r.quality_decile <= 9
        assert 0 <= r.n_dup <= r.n_docs
        assert 0 <= r.dup_rate_e4 <= 10000


def test_dup_mass_concentration_shares_are_ordered(spark, sf_dir):
    from datasketches_server_spark.plans.queries import q122_dup_mass_concentration

    r = q122_dup_mass_concentration(spark, sf_dir).collect()[0]
    assert r.n_families >= 1
    assert r.n_dup_docs >= 2 * r.n_families  # every family has >= 2 members
    assert r.max_family >= 2
    assert 2 <= float(r.p50_family) <= r.max_family
    assert 0 < r.top1_share_e4 <= r.top10_share_e4 <= 10000
    # top1 share must be exactly max_family / n_dup_docs (half-up e4)
    want = (20000 * r.max_family + r.n_dup_docs) // (2 * r.n_dup_docs)
    assert r.top1_share_e4 == want


def test_role_gram_divergence_bounds(spark, sf_dir):
    from datasketches_server_spark.plans.queries import q125_role_gram_divergence

    rows = q125_role_gram_divergence(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_shared <= min(r.n_user_grams, r.n_ast_grams)
        assert 0 <= r.jaccard_e4 <= 10000
        assert 0 <= r.user_excl_share_e4 <= 10000
        # exclusive share is exactly (nu - ns) / nu half-up
        want = (20000 * (r.n_user_grams - r.n_shared) + r.n_user_grams) // (
            2 * r.n_user_grams
        )
        assert r.user_excl_share_e4 == want


def test_conv_dup_by_length_partitions_corpus(spark, sf_dir):
    from datasketches_server_spark.plans.queries import q126_conv_dup_by_length

    rows = q126_conv_dup_by_length(spark, sf_dir).collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r.n_convs for r in rows) == n_docs
    for r in rows:
        assert 1 <= r.turn_bucket <= 6
        assert 0 <= r.n_dup <= r.n_convs
        assert 0 <= r.dup_rate_e4 <= 10000


def test_turn_dedup_savings_prices_every_dup_turn(spark, tmp_path):
    """On the shifted-boundary corpus every turn is near-dup, so the
    recoverable token share is exactly 1.0 for both roles."""
    from datasketches_server_spark.plans.queries import q130_turn_dedup_savings

    toks = [f"w{k}" for k in range(32)]
    rows = [(0, " ".join(toks), "s"), (1, "xshift " + " ".join(toks[:31]), "s")]
    out = _write_docs(spark, tmp_path, rows)
    got = {r.role: r for r in q130_turn_dedup_savings(spark, out).collect()}
    for role in ("user", "assistant"):
        assert got[role].n_dup_tokens == got[role].n_tokens
        assert got[role].dup_token_share_e4 == 10000


def test_turn_dedup_savings_corpus_consistency(spark, sf_dir):
    from datasketches_server_spark.plans.queries import (
        q117_turn_near_dup,
        q130_turn_dedup_savings,
    )

    sav = {r.role: r for r in q130_turn_dedup_savings(spark, sf_dir).collect()}
    cnt = {r.role: r for r in q117_turn_near_dup(spark, sf_dir).collect()}
    n_tokens = (
        transcripts_from_documents(spark, sf_dir)
        .select(F.sum(F.size(F.split(F.col("text"), " "))))
        .collect()[0][0]
    )
    assert sum(r.n_tokens for r in sav.values()) == n_tokens
    for role, r in sav.items():
        assert 0 <= r.n_dup_tokens <= r.n_tokens
        # a role has dup tokens iff q117 found dup turns for it
        assert (r.n_dup_tokens > 0) == (cnt[role].n_dup_turns > 0)
