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


def test_dup_pair_age_covers_every_edge(spark, sf_dir):
    from datasketches_server_spark.plans.queries import q106_dup_pair_age

    rows = q106_dup_pair_age(spark, sf_dir).collect()
    assert rows, "planted near-dup families guarantee pairs"
    res = documents_dedup_result(spark, sf_dir)
    n_edges = res.edges.count()
    assert sum(r.n_pairs for r in rows) == n_edges
    for r in rows:
        assert 0 <= r.p50_gap_min <= r.p90_gap_min <= r.max_gap_min
        assert 0 <= r.n_beyond_1h <= r.n_pairs
        assert 0 <= r.miss_share_e4 <= 10000


def test_dup_pair_age_planted_gap(spark, tmp_path):
    """Two exact-dup docs whose ids sit 500 apart: the synthetic ts
    derivation makes the pair's gap exactly 500 minutes, in the source
    of the LATER doc."""
    from datasketches_server_spark.plans.queries import q106_dup_pair_age

    body = " ".join(f"tok{i} common text span here" for i in range(8))
    docs = spark.createDataFrame(
        [
            (1, body, "early_src"),
            (501, body, "late_src"),
            (900, "completely different words that never shingle alike at all "
                  + " ".join(f"z{i}" for i in range(30)), "noise"),
        ],
        "doc_id long, text string, source string",
    )
    out = str(tmp_path / "aged")
    docs.write.parquet(f"{out}/documents.parquet")
    rows = {r.source: r for r in q106_dup_pair_age(spark, out).collect()}
    assert set(rows) == {"late_src"}
    r = rows["late_src"]
    assert r.n_pairs == 1
    assert r.max_gap_min == 500
    assert r.n_beyond_1h == 1 and r.miss_share_e4 == 10000


def test_source_centroid_similarity_matrix_shape(spark, sf_dir):
    from datasketches_server_spark.plans.queries import q107_source_centroid_similarity

    rows = q107_source_centroid_similarity(spark, sf_dir).collect()
    labels = set()
    for r in rows:
        assert r.label_a < r.label_b
        assert -1.0 <= r.cosine <= 1.0
        assert r.n_a > 0 and r.n_b > 0
        labels.update((r.label_a, r.label_b))
    n = len(labels)
    assert len(rows) == n * (n - 1) // 2, "full upper-triangular matrix"


def test_source_centroid_similarity_planted_identical(spark, tmp_path):
    """Two labels holding identical vector sets centroid to cosine 1;
    an orthogonal third label centroids to cosine 0 against both."""
    import pyspark.sql.functions as F2

    vecs = []
    for i in range(5):
        vecs.append((i, [1.0, 2.0, 0.0, 0.0], 0))
        vecs.append((10 + i, [1.0, 2.0, 0.0, 0.0], 1))
        vecs.append((20 + i, [0.0, 0.0, 3.0 + i, 1.0], 2))
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>, label int")
    out = str(tmp_path / "cent")
    df.write.parquet(f"{out}/embeddings.parquet")
    from datasketches_server_spark.plans.queries import q107_source_centroid_similarity

    rows = {(r.label_a, r.label_b): r.cosine for r in
            q107_source_centroid_similarity(spark, out).collect()}
    assert rows[(0, 1)] == 1.0
    assert rows[(0, 2)] == 0.0
    assert rows[(1, 2)] == 0.0


def test_prompt_diversity_bounds_and_planted_template(spark, sf_dir, tmp_path):
    from datasketches_server_spark.plans.queries import q108_prompt_diversity

    rows = q108_prompt_diversity(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r.n_prompts <= r.n_convs
        assert 0 < r.diversity_e4 <= 10000
        assert 0 < r.top_prompt_share_e4 <= 10000

    # planted: every conv in source "s" opens with the SAME 8-token
    # prompt (turn 0 is exactly 8 tokens), so the source has ONE
    # distinct prompt owning 100% of convs.
    greeting = "hello agent please help with the following task"  # 8 tokens
    docs = spark.createDataFrame(
        [(i, f"{greeting} unique tail {i} " + " ".join(f"w{i}x{j}" for j in range(12)), "s")
         for i in range(10)],
        "doc_id long, text string, source string",
    )
    out = str(tmp_path / "prompts")
    docs.write.parquet(f"{out}/documents.parquet")
    planted = {r.source: r for r in q108_prompt_diversity(spark, out).collect()}
    assert planted["s"].n_convs == 10
    assert planted["s"].n_prompts == 1
    assert planted["s"].top_prompt_share_e4 == 10000


def test_minhash_calibration_bounds_and_exact_dup_band(spark, sf_dir):
    from datasketches_server_spark.plans.queries import q109_minhash_calibration

    rows = q109_minhash_calibration(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.band <= 10
        assert r.n_pairs > 0
        assert 0 <= r.mean_est_e4 <= 10000
        assert 0 <= r.mean_exact_e4 <= 10000
        assert 0 <= r.mean_abs_err_e4 <= 10000
        assert 0 <= r.p90_abs_err_e4 <= 10000


def test_minhash_calibration_planted_identical_pair(spark, tmp_path):
    """Identical docs: every lane min matches -> est exactly 10000 with
    zero error; a disjoint doc never pairs."""
    from datasketches_server_spark.plans.queries import q109_minhash_calibration

    body = " ".join(f"alpha{i} beta{i} gamma{i}" for i in range(10))
    docs = spark.createDataFrame(
        [
            (1, body, "s"),
            (2, body, "s"),
            (3, " ".join(f"zz{i} yy{i}" for i in range(15)), "s"),
        ],
        "doc_id long, text string, source string",
    )
    out = str(tmp_path / "cal")
    docs.write.parquet(f"{out}/documents.parquet")
    rows = q109_minhash_calibration(spark, out).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.band == 10 and r.n_pairs == 1
    assert r.mean_est_e4 == 10000 and r.mean_exact_e4 == 10000
    assert r.mean_abs_err_e4 == 0 and r.p90_abs_err_e4 == 0.0


def test_keeper_floor_accounts_for_every_dropped_member(spark, sf_dir):
    from datasketches_server_spark.plans.queries import q110_keeper_similarity_floor

    rows = q110_keeper_similarity_floor(spark, sf_dir).collect()
    assert rows
    res = documents_dedup_result(spark, sf_dir)
    sizes = res.clusters.groupBy("cluster_id").count().where(F.col("count") > 1)
    n_clusters = sizes.count()
    n_members = sizes.agg(F.sum("count")).collect()[0][0] or 0
    assert sum(r.n_clusters for r in rows) == n_clusters
    assert sum(r.n_dropped for r in rows) == n_members - n_clusters
    for r in rows:
        assert 2 <= r.size_bucket <= 5
        assert 0 <= r.n_unscored <= r.n_dropped
        if r.n_unscored < r.n_dropped:  # some scored member exists
            assert 0.7 <= r.min_keeper_j <= r.p50_keeper_j <= 1.0


def test_keeper_floor_planted_triplet(spark, tmp_path):
    """Three identical docs: one cluster of size 3, two dropped members
    both with a direct keeper edge at jaccard 1.0."""
    from datasketches_server_spark.plans.queries import q110_keeper_similarity_floor

    body = " ".join(f"tok{i} word{i} item{i}" for i in range(12))
    docs = spark.createDataFrame(
        [(i, body, "s") for i in (1, 2, 3)]
        + [(9, " ".join(f"qq{i} rr{i}" for i in range(20)), "s")],
        "doc_id long, text string, source string",
    )
    out = str(tmp_path / "triplet")
    docs.write.parquet(f"{out}/documents.parquet")
    rows = q110_keeper_similarity_floor(spark, out).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.size_bucket == 3
    assert r.n_clusters == 1 and r.n_dropped == 2 and r.n_unscored == 0
    assert r.p50_keeper_j == 1.0 and r.min_keeper_j == 1.0
