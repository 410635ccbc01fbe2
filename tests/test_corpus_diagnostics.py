"""Invariants for the corpus-diagnostic queries (q94-q97).

The hash-equality gate vs DuckDB lives in tools/check_oracles.py; these
tests pin the semantics that must hold on ANY corpus, so a refactor that
keeps the oracle in lockstep but breaks the meaning still fails here.
"""

from pyspark.sql import functions as F

from datasketches_server_spark.plans.queries import (
    documents_dedup_result,
    q94_dup_rate_timeseries,
    q95_turn_position_dup_profile,
    q96_prompt_response_divergence,
    q97_cross_source_substr_leakage,
)
from datasketches_server_spark.sources.synth import transcripts_from_documents


def test_dup_rate_timeseries_accounts_for_every_later_side(spark, sf_dir):
    rows = q94_dup_rate_timeseries(spark, sf_dir).collect()
    assert rows
    # every conv lands on exactly one day
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r.n_convs for r in rows) == n_docs
    # total dup ingests == distinct later-side convs of the edge list
    res = documents_dedup_result(spark, sf_dir)
    late = F.greatest(F.col("a").cast("long"), F.col("b").cast("long"))
    n_late = res.edges.select(late).distinct().count()
    assert sum(r.n_dup_ingested for r in rows) == n_late
    assert rows[-1].cum_dup == n_late
    # cum_dup is the running sum in day order and rates are sane
    run = 0
    days = [r.day for r in rows]
    assert days == sorted(days)
    for r in rows:
        run += r.n_dup_ingested
        assert r.cum_dup == run
        assert 0 <= r.n_dup_ingested <= r.n_convs
        assert 0 <= r.dup_rate_e4 <= 10000
    assert n_late > 0, "planted near-dup families guarantee dup ingests"


def test_turn_position_profile_partitions_the_corpus(spark, sf_dir):
    rows = q95_turn_position_dup_profile(spark, sf_dir).collect()
    assert rows
    deciles = [r.pos_decile for r in rows]
    assert set(deciles) <= set(range(10))
    n_turns = transcripts_from_documents(spark, sf_dir).count()
    assert sum(r.n_turns for r in rows) == n_turns
    for r in rows:
        assert 0 <= r.n_template_turns <= r.n_turns
        assert 0 <= r.template_rate_e4 <= 10000
    # exact-dup docs exist in the corpus (q21), so template turns exist
    assert sum(r.n_template_turns for r in rows) > 0


def test_turn_position_profile_finds_planted_opening_template(spark, sf_dir, tmp_path):
    """Plant one exact greeting as turn 0 of many synthetic docs: decile
    0's template count must include every planted doc."""
    greeting = "hello agent please help with the following task today"
    docs = spark.createDataFrame(
        [(i, f"{greeting} unique tail {i} " + " ".join(f"w{i}x{j}" for j in range(20)), "s")
         for i in range(30)],
        "doc_id long, text string, source string",
    )
    out = str(tmp_path / "planted")
    docs.write.parquet(f"{out}/documents.parquet")
    rows = {r.pos_decile: r for r in q95_turn_position_dup_profile(spark, out).collect()}
    # the 8-token greeting is exactly turn 0 of every doc -> 30 template
    # turns in decile 0; the unique tails never template.
    assert rows[0].n_template_turns >= 30
    later = sum(r.n_template_turns for d, r in rows.items() if d > 0)
    assert later == 0


def test_prompt_response_divergence_buckets(spark, sf_dir):
    rows = {r.divergence: r for r in q96_prompt_response_divergence(spark, sf_dir).collect()}
    assert rows, "exact-dup docs guarantee repeated prompts"
    assert set(rows) <= {"consistent", "partial", "all_distinct"}
    for r in rows.values():
        assert r.n_prompts >= 1
        assert r.n_uses >= 2 * r.n_prompts  # each prompt recurs >= twice
        assert r.max_distinct_resps >= 1
    if "consistent" in rows:
        assert rows["consistent"].max_distinct_resps == 1
    # exact-dup docs answer identical prompts identically -> consistent
    # bucket must exist on this corpus
    assert "consistent" in rows


def test_cross_source_substr_leakage_bounds(spark, sf_dir):
    rows = q97_cross_source_substr_leakage(spark, sf_dir).collect()
    assert rows, "near-dup families span sources in the testdata corpus"
    seen = set()
    for r in rows:
        assert r.src_a < r.src_b
        assert (r.src_a, r.src_b) not in seen
        seen.add((r.src_a, r.src_b))
        assert 1 <= r.n_shared_wins <= min(r.wins_a, r.wins_b)
        assert 0 < r.containment_e4 <= 10000


def test_cross_source_substr_leakage_planted_quote(spark, sf_dir, tmp_path):
    """A doc in source b verbatim-quotes an 8-token span from source a:
    the (a, b) cell must count exactly the quoted windows and no pair
    may involve the quote-free source c."""
    span = "alpha bravo charlie delta echo foxtrot golf hotel"  # 8 tokens
    docs = spark.createDataFrame(
        [
            (1, f"{span} origin tail one two three four five six", "a"),
            (2, f"prefix words here then the quote {span} closing words", "b"),
            (3, "totally disjoint text nine ten eleven twelve thirteen fourteen", "c"),
        ],
        "doc_id long, text string, source string",
    )
    out = str(tmp_path / "quote")
    docs.write.parquet(f"{out}/documents.parquet")
    rows = q97_cross_source_substr_leakage(spark, out).collect()
    cells = {(r.src_a, r.src_b): r for r in rows}
    assert ("a", "b") in cells
    assert cells[("a", "b")].n_shared_wins == 1  # exactly the planted span
    assert all("c" not in k for k in cells)
