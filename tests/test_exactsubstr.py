"""ExactSubstr cross-document duplicate coverage + removal policy.

Brute-force oracle: a pure-python reimplementation over a synthetic
corpus with planted shared runs (copied paragraphs, partial overlaps,
repeated boilerplate), plus invariants the policy must hold (token
conservation, at least one surviving occurrence per duplicated run) and
the exact-tier == hash-tier equivalence that justifies the narrow-row
scale path.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from datasketches_server_spark.operators.dedup import (
    cross_doc_duplicate_coverage,
    exactsubstr_removal_plan,
)

W = 5


def _toks(s: str) -> list[str]:
    return re.findall(r"[a-z0-9]+", s.lower())


def _brute(docs: list[tuple[int, str]]):
    """Returns (coverage, removal) dicts keyed by doc id, computed the
    slow obvious way: materialize every window, flag cross-doc ones,
    take interval unions."""
    toks = {i: _toks(t) for i, t in docs}
    wins: dict[str, list[tuple[int, int]]] = {}
    for i, tk in toks.items():
        for p in range(len(tk) - W + 1):
            wins.setdefault(" ".join(tk[p : p + W]), []).append((i, p))
    flagged = {w: occ for w, occ in wins.items() if len({i for i, _ in occ}) >= 2}

    def union_size(positions: list[int]) -> int:
        total, end = 0, -1
        for p in sorted(positions):
            s = max(p, end)
            total += max(0, p + W - s)
            end = max(end, p + W)
        return total

    cov = {}
    rem = {}
    for i, tk in toks.items():
        if len(tk) < W:
            continue
        dup_pos = [p for w, occ in flagged.items() for j, p in occ if j == i]
        cov[i] = (len(tk), union_size(dup_pos))
        removed_pos = []
        for w, occ in flagged.items():
            keeper = min(occ)  # (min doc, then min pos) -- the operator's rule
            removed_pos += [p for (j, p) in occ if j == i and (j, p) != keeper]
        rem[i] = (len(tk), union_size(removed_pos))
    return cov, rem


FIXTURE = [
    (1, "the quick brown fox jumps over the lazy dog near the old river bank today"),
    # copies tokens of doc 1 mid-run, different ends
    (2, "zebra quick brown fox jumps over the lazy dog near the mill pond"),
    # exact twin of doc 1
    (3, "the quick brown fox jumps over the lazy dog near the old river bank today"),
    # boilerplate shared by 4 and 5 at different offsets, twice in doc 4
    (4, "header alpha beta gamma delta epsilon end header alpha beta gamma delta epsilon end"),
    (5, "intro text here header alpha beta gamma delta epsilon end outro"),
    (6, "nothing in common with anything else whatsoever in this corpus row"),
    (7, "tiny"),  # < W tokens: dropped from both outputs
]


def test_coverage_matches_bruteforce(spark):
    docs = spark.createDataFrame(FIXTURE, "doc_id long, text string")
    got = {
        r["id"]: (r["n_tokens"], r["dup_tokens"])
        for r in cross_doc_duplicate_coverage(docs, window=W).collect()
    }
    cov, _ = _brute(FIXTURE)
    assert got == cov
    assert 7 not in got  # sub-window docs are excluded, not zero-filled


def test_removal_matches_bruteforce_and_conserves_tokens(spark):
    docs = spark.createDataFrame(FIXTURE, "doc_id long, text string")
    rows = exactsubstr_removal_plan(docs, window=W).collect()
    got = {r["id"]: (r["n_tokens"], r["removed_tokens"]) for r in rows}
    _, rem = _brute(FIXTURE)
    assert got == rem
    for r in rows:
        assert r["kept_tokens"] + r["removed_tokens"] == r["n_tokens"]
    # exact twin: the min-id copy keeps everything, the other loses everything
    assert got[1][1] == 0
    assert got[3] == (got[3][0], got[3][0])


def test_every_duplicated_run_survives_somewhere(spark):
    """The policy must never delete ALL copies of a duplicated window:
    for each flagged window string, at least one occurrence lies fully
    outside its doc's removed mass (checked via the brute keeper)."""
    _, rem = _brute(FIXTURE)
    toks = {i: _toks(t) for i, t in FIXTURE}
    wins: dict[str, list[tuple[int, int]]] = {}
    for i, tk in toks.items():
        for p in range(len(tk) - W + 1):
            wins.setdefault(" ".join(tk[p : p + W]), []).append((i, p))
    for w, occ in wins.items():
        if len({i for i, _ in occ}) < 2:
            continue
        kid, kpos = min(occ)
        # the keeper doc never removes its keeper position: recompute the
        # removed set exactly as the operator does and assert disjointness
        removed_pos = []
        for w2, occ2 in wins.items():
            if len({i for i, _ in occ2}) < 2:
                continue
            k2 = min(occ2)
            removed_pos += [p for (j, p) in occ2 if j == kid and (j, p) != k2]
        covered = set()
        for p in removed_pos:
            covered.update(range(p, p + W))
        assert not covered.issuperset(range(kpos, kpos + W))


def test_hash_tier_equals_exact_tier(spark):
    """exact=False (xxhash64 window keys: the narrow-row 100 TB shuffle)
    must produce identical results absent 64-bit collisions."""
    docs = spark.createDataFrame(FIXTURE, "doc_id long, text string")
    a = sorted(map(tuple, cross_doc_duplicate_coverage(docs, window=W, exact=True).collect()))
    b = sorted(map(tuple, cross_doc_duplicate_coverage(docs, window=W, exact=False).collect()))
    assert a == b
    c = sorted(map(tuple, exactsubstr_removal_plan(docs, window=W, exact=True).collect()))
    d = sorted(map(tuple, exactsubstr_removal_plan(docs, window=W, exact=False).collect()))
    assert c == d


def test_plan_stays_native(spark):
    """No Python UDF anywhere in the coverage plan (BatchEvalPython
    absent) and the flag aggregate map-side combines (partial_count)."""
    docs = spark.createDataFrame(FIXTURE, "doc_id long, text string")
    plan = cross_doc_duplicate_coverage(docs, window=W, exact=False)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "partial_count" in plan or "partial_finalmerge" in plan or "HashAggregate" in plan


def test_spans_materialize_the_coverage(spark):
    """cross_doc_duplicate_spans emits the islands themselves: per doc
    the span_tokens must sum to dup_tokens, spans must be disjoint and
    non-adjacent (maximal merge), and each span must match brute force."""
    from datasketches_server_spark.operators.dedup import cross_doc_duplicate_spans

    docs = spark.createDataFrame(FIXTURE, "doc_id long, text string")
    spans = cross_doc_duplicate_spans(docs, window=W).collect()
    cov, _ = _brute(FIXTURE)
    by_doc: dict[int, list[tuple[int, int]]] = {}
    for r in spans:
        assert r["span_tokens"] == r["span_end"] - r["span_start"] > 0
        by_doc.setdefault(r["id"], []).append((r["span_start"], r["span_end"]))
    for i, ivs in by_doc.items():
        ivs.sort()
        for (s1, e1), (s2, e2) in zip(ivs, ivs[1:]):
            assert e1 < s2  # disjoint AND non-adjacent (else not maximal)
        assert sum(e - s for s, e in ivs) == cov[i][1]
    # docs with zero coverage emit no spans
    assert set(by_doc) == {i for i, (_, d) in cov.items() if d > 0}
