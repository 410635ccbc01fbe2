"""Turn-aligned prefix/containment dedup (operators/prefix.py) and
semantic dedup clusters (operators/similarity.semantic_dedup_clusters)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from datasketches_server_spark.operators.prefix import (
    turn_prefix_candidates,
    turn_prefix_pairs,
    verify_prefix_pairs,
)


def _transcripts(spark, convs: dict[str, list[str]]):
    rows = [
        (cid, i, "user" if i % 2 == 0 else "assistant", text, None)
        for cid, turns in convs.items()
        for i, text in enumerate(turns)
    ]
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string"
    ).withColumn("ts", F.to_timestamp(F.lit("2024-06-01 00:00:00")))


def test_prefix_pairs_planted(spark):
    """A proper prefix, an exact dup pair, a same-opening divergence,
    and a unique conv: exactly the prefix/exact pairs come out, each
    once, with the right turn counts."""
    t = _transcripts(
        spark,
        {
            "long": ["hello there", "hi how can i help", "run the job", "done"],
            "stub": ["hello there", "hi how can i help"],
            "copy": ["hello there", "hi how can i help", "run the job", "done"],
            "fork": ["hello there", "hi how can i help", "cancel it"],
            "solo": ["completely different opening"],
        },
    )
    rows = turn_prefix_pairs(t).collect()
    got = {(r.prefix_conv_id, r.super_conv_id, r.relation) for r in rows}
    assert got == {
        ("stub", "long", "prefix"),
        ("stub", "copy", "prefix"),
        ("stub", "fork", "prefix"),
        ("copy", "long", "exact"),
    }
    by_pair = {(r.prefix_conv_id, r.super_conv_id): r for r in rows}
    assert by_pair[("stub", "long")].prefix_turns == 2
    assert by_pair[("stub", "long")].super_turns == 4
    # the turn-granularity contract: 'fork' shares only a 2-turn prefix
    # with 'long' (turn 2 differs), so no (fork, long) pair
    assert ("fork", "long") not in by_pair


def test_verify_drops_hash_collision_impostors(spark):
    """verify_prefix_pairs is the exactness guarantee: feed it a forged
    candidate (pretending a hash collision slipped through) and assert
    it is dropped while the genuine pair survives."""
    t = _transcripts(
        spark,
        {
            "a": ["x y", "z w"],
            "b": ["x y", "z w", "tail"],
            "c": ["totally", "different", "turns"],
        },
    )
    genuine = turn_prefix_candidates(t)
    forged = spark.createDataFrame(
        [("a", "c", 2, 3, "prefix")],
        "prefix_conv_id string, super_conv_id string, prefix_turns long, "
        "super_turns long, relation string",
    )
    out = verify_prefix_pairs(genuine.unionByName(forged), t).collect()
    assert {(r.prefix_conv_id, r.super_conv_id) for r in out} == {("a", "b")}


def test_prefix_empty_and_single(spark):
    t = _transcripts(spark, {"only": ["one turn"]})
    assert turn_prefix_pairs(t).count() == 0
    empty = t.where(F.lit(False))
    assert turn_prefix_pairs(empty).count() == 0


def test_prefix_candidates_plan_is_equi_join(spark):
    """Scale guard: the candidate join must be a hash/sort-merge
    equi-join on the composite key -- never a nested-loop/cartesian."""
    t = _transcripts(spark, {"a": ["x", "y"], "b": ["x", "y", "z"]})
    plan = turn_prefix_candidates(t)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_semantic_dedup_clusters_planted(spark):
    """Two tight semantic families + noise: family members cluster
    together, keepers are the min vec_id, singletons are absent."""
    import numpy as np

    rng = np.random.default_rng(7)
    base1 = rng.normal(size=64)
    base2 = rng.normal(size=64)
    rows = []
    for i in range(3):  # family A: vec 0,1,2
        v = base1 + rng.normal(scale=0.01, size=64)
        rows.append((i, (v / np.linalg.norm(v)).astype(float).tolist()))
    for i in range(3, 5):  # family B: vec 3,4
        v = base2 + rng.normal(scale=0.01, size=64)
        rows.append((i, (v / np.linalg.norm(v)).astype(float).tolist()))
    for i in range(5, 10):  # noise
        v = rng.normal(size=64)
        rows.append((i, (v / np.linalg.norm(v)).astype(float).tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    from datasketches_server_spark.operators.similarity import (
        semantic_dedup_clusters,
    )

    out = semantic_dedup_clusters(df, threshold=0.95).collect()
    clusters = {}
    for r in out:
        clusters.setdefault(r.cluster_id, set()).add(r.vec_id)
    assert clusters == {0: {0, 1, 2}, 3: {3, 4}}
    keepers = {r.vec_id for r in out if r.is_keeper}
    assert keepers == {0, 3}
    sizes = {r.cluster_id: r.cluster_size for r in out}
    assert sizes == {0: 3, 3: 2}


def test_prefix_pairs_property_vs_bruteforce(spark):
    """Hypothesis sweep: random corpora of short token streams (with
    deliberately heavy overlap so prefixes actually occur) must match a
    brute-force python oracle pair-for-pair."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    turn = st.sampled_from(["a", "b", "a b", "c"])
    conv = st.lists(turn, min_size=1, max_size=4)

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(convs=st.lists(conv, min_size=1, max_size=7))
    def check(convs):
        named = {f"c{i:02d}": turns for i, turns in enumerate(convs)}
        want = set()
        for a, ta in named.items():
            for b, tb in named.items():
                if a == b or len(ta) > len(tb):
                    continue
                if len(ta) == len(tb) and a > b:
                    continue
                if tb[: len(ta)] == ta:
                    rel = "exact" if len(ta) == len(tb) else "prefix"
                    want.add((a, b, rel))
        t = _transcripts(spark, named)
        got = {
            (r.prefix_conv_id, r.super_conv_id, r.relation)
            for r in turn_prefix_pairs(t).collect()
        }
        assert got == want, named

    check()


def test_prefix_dedup_assignments_chain_and_twins(spark):
    """Chain a < b < c plus an exact twin of the chain head and a
    unique conv: only the maximal conv and the unique conv survive;
    verdicts carry the prefix_dup > exact_dup precedence."""
    from datasketches_server_spark.operators.prefix import (
        prefix_dedup_assignments,
    )

    t = _transcripts(
        spark,
        {
            "a": ["t1"],
            "b": ["t1", "t2"],
            "c": ["t1", "t2", "t3"],
            "d": ["t1", "t2", "t3"],  # exact twin of c (loses min-id)
            "e": ["elsewhere"],
        },
    )
    got = {r.conv_id: (r.n_turns, r.verdict) for r in prefix_dedup_assignments(t).collect()}
    assert got == {
        "a": (1, "prefix_dup"),
        "b": (2, "prefix_dup"),
        "c": (3, "kept"),
        "d": (3, "exact_dup"),
        "e": (1, "kept"),
    }


def test_prefix_pairs_gapped_and_nonzero_turn_idx(spark):
    """ADVICE r4: positions are rank under the stable (conv_id, turn_idx)
    ordering, not raw turn_idx values -- a conversation logged with
    gapped (10,20,30,40) or non-zero-based (5,6) indices still forms
    prefix/exact pairs by its k-th turns."""
    rows = [
        # contiguous 0-based reference conv
        ("long", 0, "a b c"), ("long", 1, "d e f"), ("long", 2, "g h i"),
        # same texts, gapped indices -> exact dup of long
        ("gappy", 10, "a b c"), ("gappy", 20, "d e f"), ("gappy", 30, "g h i"),
        # first two texts, indices starting at 5 -> prefix of both
        ("stub5", 5, "a b c"), ("stub5", 6, "d e f"),
    ]
    t = spark.createDataFrame(
        [(c, i, "user", x, None) for c, i, x in rows],
        "conv_id string, turn_idx int, role string, text string, tool string",
    ).withColumn("ts", F.to_timestamp(F.lit("2024-06-01 00:00:00")))
    got = {(r.prefix_conv_id, r.super_conv_id, r.relation)
           for r in turn_prefix_pairs(t).collect()}
    assert got == {
        ("gappy", "long", "exact"),
        ("stub5", "long", "prefix"),
        ("stub5", "gappy", "prefix"),
    }


def test_positions_auto_probe_and_mode_equivalence(spark):
    """The contiguity probe routes auto correctly, and on a contiguous
    0-based corpus the fast index path and the rank path emit identical
    pairs (the property that makes auto safe)."""
    from datasketches_server_spark.operators.prefix import _positions_contiguous

    contig = spark.createDataFrame(
        [("a", 0, "u", "x", None), ("a", 1, "u", "y", None),
         ("b", 0, "u", "x", None), ("b", 1, "u", "y", None),
         ("c", 0, "u", "x", None)],
        "conv_id string, turn_idx int, role string, text string, tool string",
    )
    assert _positions_contiguous(contig)
    # duplicates spoof min/max+count alone ([0,0,3,3]); the distinct
    # count must catch them
    dup = spark.createDataFrame(
        [("d", 0, "u", "x", None), ("d", 0, "u", "y", None),
         ("d", 3, "u", "z", None), ("d", 3, "u", "w", None)],
        "conv_id string, turn_idx int, role string, text string, tool string",
    )
    assert not _positions_contiguous(dup)
    gapped = spark.createDataFrame(
        [("e", 5, "u", "x", None), ("e", 6, "u", "y", None)],
        "conv_id string, turn_idx int, role string, text string, tool string",
    )
    assert not _positions_contiguous(gapped)

    by_index = {(r.prefix_conv_id, r.super_conv_id, r.relation)
                for r in turn_prefix_pairs(contig, positions="index").collect()}
    by_rank = {(r.prefix_conv_id, r.super_conv_id, r.relation)
               for r in turn_prefix_pairs(contig, positions="rank").collect()}
    by_auto = {(r.prefix_conv_id, r.super_conv_id, r.relation)
               for r in turn_prefix_pairs(contig).collect()}
    assert (
        by_index == by_rank == by_auto
        == {("a", "b", "exact"), ("c", "a", "prefix"), ("c", "b", "prefix")}
    )
