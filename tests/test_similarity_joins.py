"""Invariants for the exact-similarity-join family (q111-q116).

The hash-equality gate vs DuckDB lives in tools/check_oracles.py; these
tests pin the semantics on planted corpora — above all q111's
recall-1.0-by-construction claim (prefix filtering must equal the
brute-force closure bit for bit) and the set-vs-weighted jaccard split
that motivates q112.
"""

from pyspark.sql import functions as F

from datasketches_server_spark.plans.queries import (
    documents_dedup_result,
    q111_allpairs_ssjoin,
    q112_weighted_jaccard_dedup,
    q113_gram_rank_decay,
    q114_edit_distance_audit,
    q115_bbit_minhash_contract,
    q116_source_mix_weights,
)


def _grams(text, n=3):
    toks = [t for t in "".join(c if c.isalnum() else " " for c in text.lower()).split() if t]
    if len(toks) <= n:
        return [" ".join(toks)]
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


def _brute_pairs(rows):
    """Exact jaccard >= 0.5 closure over (doc_id, text) rows; the
    threshold is the integer form 3i >= na + nb used by q111."""
    sets = {i: set(_grams(t)) for i, t in rows}
    out = {}
    ids = sorted(sets)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            i = len(sets[a] & sets[b])
            u = len(sets[a] | sets[b])
            if u and 3 * i >= len(sets[a]) + len(sets[b]):
                out[(a, b)] = (20000 * i + u) // (2 * u)
    return out


def test_allpairs_ssjoin_equals_bruteforce_closure(spark, sf_dir, tmp_path):
    """Prefix filtering must find EVERY pair the quadratic closure finds
    — recall 1.0 by construction, not by tuning."""
    base = "the quick brown fox jumps over the lazy dog near the riverbank today"
    rows = [
        (0, base, "s"),
        (1, base + " extra tail words here", "s"),  # near-dup of 0
        (2, base.replace("fox", "cat").replace("dog", "bird"), "s"),  # mid-sim
        (3, " ".join(f"unrelated{k} token{k}" for k in range(20)), "s"),
        (4, base, "s"),  # exact dup of 0
    ]
    docs = spark.createDataFrame(
        [(i, t, s) for i, t, s in rows], "doc_id long, text string, source string"
    )
    out = str(tmp_path / "planted")
    docs.write.parquet(f"{out}/documents.parquet")
    got = {
        (r.ida, r.idb): r.jacc_e4 for r in q111_allpairs_ssjoin(spark, out).collect()
    }
    want = _brute_pairs([(i, t) for i, t, _ in rows])
    assert got == want
    assert (0, 4) in got and got[(0, 4)] == 10000  # exact dup scores 1.0
    assert all(v >= 5000 for v in got.values())


def test_allpairs_ssjoin_on_corpus_bounds(spark, sf_dir):
    rows = q111_allpairs_ssjoin(spark, sf_dir).collect()
    for r in rows:
        assert r.ida < r.idb
        assert 5000 <= r.jacc_e4 <= 10000


def test_weighted_jaccard_splits_from_set_jaccard(spark, tmp_path):
    """A doc that pastes the same paragraph 5x has near-identical gram
    SET to the single-paste doc (q111 keeps the pair) but only ~1/5 of
    its gram MASS matches (q112 must drop it)."""
    para = " ".join(f"tok{k}" for k in range(20))
    docs = spark.createDataFrame(
        [(0, para, "s"), (1, " ".join([para] * 5), "s")],
        "doc_id long, text string, source string",
    )
    out = str(tmp_path / "paste")
    docs.write.parquet(f"{out}/documents.parquet")
    set_pairs = {(r.ida, r.idb) for r in q111_allpairs_ssjoin(spark, out).collect()}
    wj_pairs = {(r.ida, r.idb) for r in q112_weighted_jaccard_dedup(spark, out).collect()}
    assert (0, 1) in set_pairs
    assert (0, 1) not in wj_pairs


def test_weighted_jaccard_corpus_bounds(spark, sf_dir):
    for r in q112_weighted_jaccard_dedup(spark, sf_dir).collect():
        assert r.ida < r.idb
        assert 5000 <= r.wj_e4 <= 10000


def test_gram_rank_decay_ordering(spark, sf_dir):
    rows = q113_gram_rank_decay(spark, sf_dir).collect()
    srcs = {
        r.source
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("source")
        .distinct()
        .collect()
    }
    assert {r.source for r in rows} == srcs
    for r in rows:
        assert r.c1 >= 1
        if r.c10 is not None:
            assert r.c1 >= r.c10
            assert 0 <= r.decay_1_10_e4 <= 10000
        if r.c100 is not None:
            assert r.c10 >= r.c100
            assert 0 <= r.decay_10_100_e4 <= 10000


def test_edit_distance_audit_covers_every_verified_pair(spark, sf_dir):
    rows = q114_edit_distance_audit(spark, sf_dir).collect()
    assert {r.edit_class for r in rows} <= {"exact", "near", "moderate", "far"}
    n_edges = documents_dedup_result(spark, sf_dir).edges.count()
    assert sum(r.n_pairs for r in rows) == n_edges
    for r in rows:
        assert 0 <= r.mean_nld_e4 <= 10000
        assert r.mean_lev <= r.max_lev
    byc = {r.edit_class: r for r in rows}
    if "exact" in byc:
        assert byc["exact"].max_lev == 0


def test_bbit_minhash_accounts_for_every_sharing_pair(spark, sf_dir):
    rows = q115_bbit_minhash_contract(spark, sf_dir).collect()
    assert rows
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    from datasketches_server_spark.functions.portable import word_grams
    from datasketches_server_spark.functions.text import tokens

    g = d.select(
        F.col("doc_id").alias("id"),
        F.explode(word_grams(tokens(F.col("text")), 3)).alias("gram"),
    )
    n_sharing = (
        g.select(F.col("id").alias("a"), "gram")
        .join(g.select(F.col("id").alias("b"), "gram"), "gram")
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
        .count()
    )
    assert sum(r.n_pairs for r in rows) == n_sharing
    for r in rows:
        assert 0 <= r.band <= 10
        assert 0 <= r.mean_est_e4 <= 10000
        assert 0 <= r.mean_exact_e4 <= 10000


def test_bbit_minhash_identical_docs_score_exact(spark, tmp_path):
    text = " ".join(f"alpha{k} beta{k}" for k in range(15))
    docs = spark.createDataFrame(
        [(0, text, "s"), (1, text, "s")], "doc_id long, text string, source string"
    )
    out = str(tmp_path / "ident")
    docs.write.parquet(f"{out}/documents.parquet")
    rows = {r.band: r for r in q115_bbit_minhash_contract(spark, out).collect()}
    assert rows[10].mean_est_e4 == 10000
    assert rows[10].mean_exact_e4 == 10000
    assert rows[10].mean_abs_err_e4 == 0


def test_source_mix_weights_flatten_and_sum(spark, sf_dir):
    rows = q116_source_mix_weights(spark, sf_dir).collect()
    assert rows
    n = len(rows)
    assert abs(sum(r.raw_share_e4 for r in rows) - 10000) <= n
    assert abs(sum(r.temp_share_e4 for r in rows) - 10000) <= n
    # sqrt temperature flattens: the heaviest source loses share, the
    # lightest gains (ties allowed within rounding)
    assert max(r.temp_share_e4 for r in rows) <= max(r.raw_share_e4 for r in rows) + 2
    assert min(r.temp_share_e4 for r in rows) >= min(r.raw_share_e4 for r in rows) - 2
    for r in rows:
        assert r.n_tokens > 0
        # epochs_e4 == round(temp_share_e4 * 1e9 / n_tokens) by contract
        want = (2 * r.temp_share_e4 * 10**9 + r.n_tokens) // (2 * r.n_tokens)
        assert r.epochs_e4 == want


def test_shingle_k_ablation_k3_matches_edge_contract(spark, sf_dir):
    from datasketches_server_spark.plans.queries import q123_shingle_k_ablation

    rows = {r.k: r for r in q123_shingle_k_ablation(spark, sf_dir).collect()}
    assert set(rows) == {2, 3, 5}
    # the k=3 tier IS q24's edge contract
    n_edges = documents_dedup_result(spark, sf_dir).edges.count()
    assert rows[3].n_pairs == n_edges
    for r in rows.values():
        assert 0 <= r.mean_jacc_e4 <= 10000
        if r.n_pairs:
            assert r.mean_jacc_e4 >= 7000  # every pair passed the 0.7 gate


def test_shingle_k_ablation_monotone_on_planted(spark, tmp_path):
    """Two substitutions in a 40-token doc: each kills k grams per
    side, so the pair passes 0.7 at k=2 (j~0.81) and k=3 (j~0.73) but
    falls below it at k=5 (j~0.57) — the strict monotone split the
    ablation exists to expose."""
    from datasketches_server_spark.plans.queries import q123_shingle_k_ablation

    toks = [f"w{k}" for k in range(40)]
    b_toks = list(toks)
    b_toks[10], b_toks[30] = "XX", "YY"
    docs = spark.createDataFrame(
        [(0, " ".join(toks), "s"), (1, " ".join(b_toks), "s")],
        "doc_id long, text string, source string",
    )
    out = str(tmp_path / "abl")
    docs.write.parquet(f"{out}/documents.parquet")
    rows = {r.k: r for r in q123_shingle_k_ablation(spark, out).collect()}
    assert rows[2].n_pairs == 1
    assert rows[3].n_pairs == 1
    assert rows[5].n_pairs == 0
    assert rows[5].mean_jacc_e4 == 0  # the empty tier is an explicit zero


def test_band_collision_profile_contract(spark, sf_dir):
    from datasketches_server_spark.plans.queries import q124_band_collision_profile

    rows = q124_band_collision_profile(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.decile <= 10
        assert 0 <= r.mean_collide_e4 <= 10000
        assert 0 <= r.hit_rate_e4 <= 10000
        # a band collision implies a hit, so hit rate >= mean/4-bands rate
        assert r.hit_rate_e4 >= r.mean_collide_e4 // 4
    byd = {r.decile: r for r in rows}
    if 10 in byd:  # identical docs collide on every band
        assert byd[10].mean_collide_e4 == 10000
        assert byd[10].hit_rate_e4 == 10000


def test_winnowing_position_robust_on_rotation(spark, tmp_path):
    """B is a rotation of A (same content, every position different):
    winnowing fingerprints are content-keyed window minima, so the pair
    must still surface; identical docs must score exactly 1.0."""
    from datasketches_server_spark.plans.queries import q127_winnowing_pairs

    x = [f"x{k}" for k in range(20)]
    y = [f"y{k}" for k in range(20)]
    docs = spark.createDataFrame(
        [
            (0, " ".join(x + y), "s"),
            (1, " ".join(y + x), "s"),  # rotation of 0
            (2, " ".join(x + y), "s"),  # identical to 0
        ],
        "doc_id long, text string, source string",
    )
    out = str(tmp_path / "winnow")
    docs.write.parquet(f"{out}/documents.parquet")
    got = {(r.ida, r.idb): r.fp_jacc_e4 for r in q127_winnowing_pairs(spark, out).collect()}
    assert got[(0, 2)] == 10000
    assert (0, 1) in got and got[(0, 1)] >= 5000
    assert (1, 2) in got


def test_winnowing_corpus_bounds(spark, sf_dir):
    from datasketches_server_spark.plans.queries import q127_winnowing_pairs

    rows = q127_winnowing_pairs(spark, sf_dir).collect()
    assert rows, "exact-dup docs guarantee fingerprint-identical pairs"
    for r in rows:
        assert r.ida < r.idb
        assert 5000 <= r.fp_jacc_e4 <= 10000


def test_idf_weighting_is_boilerplate_blind(spark, tmp_path):
    """Two docs sharing only a high-df boilerplate block pair under set
    jaccard (q111) but must NOT pair under IDF weighting (q128)."""
    from datasketches_server_spark.plans.queries import q128_idf_weighted_pairs

    boiler = " ".join(f"bp{k}" for k in range(20))
    rows = [(i, boiler, "s") for i in range(8)]  # df of boiler grams = 10
    rows.append((8, boiler + " " + " ".join(f"ua{k}" for k in range(4)), "s"))
    rows.append((9, boiler + " " + " ".join(f"ub{k}" for k in range(4)), "s"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = str(tmp_path / "idf")
    docs.write.parquet(f"{out}/documents.parquet")
    set_pairs = {(r.ida, r.idb) for r in q111_allpairs_ssjoin(spark, out).collect()}
    idf_pairs = {(r.ida, r.idb) for r in q128_idf_weighted_pairs(spark, out).collect()}
    assert (8, 9) in set_pairs  # boilerplate dominates the gram set
    assert (8, 9) not in idf_pairs  # rare mass does not match
    # identical pure-boiler docs still pair everywhere
    assert (0, 1) in idf_pairs and (0, 1) in set_pairs


def test_idf_weighted_corpus_bounds(spark, sf_dir):
    from datasketches_server_spark.plans.queries import q128_idf_weighted_pairs

    for r in q128_idf_weighted_pairs(spark, sf_dir).collect():
        assert r.ida < r.idb
        assert 5000 <= r.idf_jacc_e4 <= 10000


def test_minhash_k_error_planted_identical_is_exact(spark, tmp_path):
    """Identical docs: every lane matches at every width, so the error
    is 0 at k = 4, 8 and 16 alike."""
    from datasketches_server_spark.plans.queries import q129_minhash_k_error

    text = " ".join(f"mk{k}" for k in range(20))
    docs = spark.createDataFrame(
        [(0, text, "s"), (1, text, "s")], "doc_id long, text string, source string"
    )
    out = str(tmp_path / "kerr")
    docs.write.parquet(f"{out}/documents.parquet")
    rows = {r.k: r for r in q129_minhash_k_error(spark, out).collect()}
    assert set(rows) == {4, 8, 16}
    for r in rows.values():
        assert r.n_pairs == 1
        assert r.mean_abs_err_e4 == 0
        assert r.max_abs_err_e4 == 0


def test_minhash_k_error_corpus_bounds(spark, sf_dir):
    from datasketches_server_spark.plans.queries import q129_minhash_k_error

    rows = {r.k: r for r in q129_minhash_k_error(spark, sf_dir).collect()}
    assert set(rows) == {4, 8, 16}
    np = {r.n_pairs for r in rows.values()}
    assert len(np) == 1, "all widths ablate the same pair set"
    for r in rows.values():
        assert 0 <= r.mean_abs_err_e4 <= r.max_abs_err_e4 <= 10000
