"""Incremental ExactSubstr: the persisted window index must absorb
batches in O(|batch|) work and stay bit-identical to a full recompute.

Mirrors the band-index contract tests: equality across a multi-batch
chain (including singleton wakes, batch-internal duplicates, and
chain-spanning matches), plus work counters pinning that the window
explode ran over the batch only.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest

from datasketches_server_spark.operators.dedup import (
    cross_doc_duplicate_coverage,
    cross_doc_duplicate_spans,
)
from datasketches_server_spark.plans.window_index import (
    absorb_batch,
    read_coverage,
    read_spans,
    write_window_index,
)

W = 5

BASE = [
    (1, "the quick brown fox jumps over the lazy dog near the old river bank today"),
    # singleton with the SAME 5-token run at two positions: a wake must
    # cover both occurrences, exactly like the full recompute
    (2, "alpha beta gamma delta epsilon filler word alpha beta gamma delta epsilon tail"),
    (3, "totally unrelated content sits here with nothing shared at all among others"),
]
BATCH1 = [
    (10, "zz quick brown fox jumps over the lazy dog yy"),  # wakes doc 1
    (11, "lead alpha beta gamma delta epsilon close"),  # wakes doc 2 (both positions)
    (12, "pair aaa bbb ccc ddd eee fff shared run here"),
    (13, "other aaa bbb ccc ddd eee fff shared run there"),  # batch-internal dup
]
BATCH2 = [
    # id SMALLER than every old id: coverage semantics are id-order-free
    (0, "again alpha beta gamma delta epsilon repeat"),  # matches an nd>=2 key
    (21, "fresh totally new content nothing shared here ok fine"),
]


@pytest.fixture(scope="module")
def chain_state(spark):
    wd = tempfile.mkdtemp(prefix="wix_test_")
    base = spark.createDataFrame(BASE, "doc_id long, text string")
    b1 = spark.createDataFrame(BATCH1, "doc_id long, text string")
    b2 = spark.createDataFrame(BATCH2, "doc_id long, text string")
    s0 = write_window_index(base, wd, window=W, input_fp="base", store_tokens=True)
    s1 = absorb_batch(spark, b1, wd, window=W, chain=["base"], batch_fp="b1", store_tokens=True)
    s2 = absorb_batch(spark, b2, wd, window=W, chain=["base", "b1"], batch_fp="b2", store_tokens=True)
    yield wd, (s0, s1, s2), base.unionByName(b1).unionByName(b2)
    shutil.rmtree(wd, ignore_errors=True)


def test_incremental_coverage_equals_full_recompute(spark, chain_state):
    wd, _, all_docs = chain_state
    inc = sorted(map(tuple, read_coverage(spark, wd, W, ["base", "b1", "b2"]).collect()))
    full = sorted(
        map(tuple, cross_doc_duplicate_coverage(all_docs, window=W, exact=False).collect())
    )
    assert inc == full


def test_incremental_spans_equal_full_recompute(spark, chain_state):
    wd, _, all_docs = chain_state
    inc = sorted(map(tuple, read_spans(spark, wd, W, ["base", "b1", "b2"]).collect()))
    full = sorted(
        map(tuple, cross_doc_duplicate_spans(all_docs, window=W, exact=False).collect())
    )
    assert inc == full


def test_multi_position_singleton_wake(spark, chain_state):
    """Doc 2 holds its duplicated run at TWO positions; the batch match
    must cover both (the index stores every singleton position)."""
    wd, _, _ = chain_state
    spans = {
        (r["span_start"], r["span_end"])
        for r in read_spans(spark, wd, W, ["base", "b1", "b2"]).collect()
        if r["id"] == 2
    }
    assert len(spans) == 2  # two disjoint woken occurrences


def test_batch_work_scales_with_batch(spark, chain_state):
    """The O(|batch|) contract: each absorb's window explode saw exactly
    the batch's own windows (sum over batch docs of n_tokens - W + 1),
    never the corpus's."""
    _, (s0, s1, s2), _ = chain_state

    def expected(rows):
        import re

        return sum(
            max(0, len(re.findall(r"[a-z0-9]+", t.lower())) - W + 1) for _, t in rows
        )

    assert s0["window_rows"] == expected(BASE)
    assert s1["batch_window_rows"] == expected(BATCH1)
    assert s2["batch_window_rows"] == expected(BATCH2)
    # batch 2 matched an already-flagged (nd>=2) key: nothing to wake
    assert s2["woken_singleton_positions"] == 0
    assert s1["woken_singleton_positions"] > 0


def test_rerunning_a_batch_is_idempotent(spark, chain_state):
    """Crash-rerun of the last absorb (same batch_fp) must leave the
    chain state unchanged -- deltas are written with overwrite, exactly
    like append_band_index."""
    wd, _, all_docs = chain_state
    b2 = spark.createDataFrame(BATCH2, "doc_id long, text string")
    absorb_batch(spark, b2, wd, window=W, chain=["base", "b1"], batch_fp="b2", store_tokens=True)
    inc = sorted(map(tuple, read_coverage(spark, wd, W, ["base", "b1", "b2"]).collect()))
    full = sorted(
        map(tuple, cross_doc_duplicate_coverage(all_docs, window=W, exact=False).collect())
    )
    assert inc == full


def test_compaction_preserves_state_and_absorbs_continue(spark, chain_state):
    """Compacting the chain into one snapshot changes nothing readable,
    and a further batch absorbed on top of the compacted dir still
    equals the full recompute."""
    from datasketches_server_spark.plans.window_index import compact_window_chain

    wd, _, all_docs = chain_state
    before = sorted(map(tuple, read_coverage(spark, wd, W, ["base", "b1", "b2"]).collect()))
    compact_window_chain(spark, wd, W, ["base", "b1", "b2"], out_fp="c0")
    after = sorted(map(tuple, read_coverage(spark, wd, W, ["c0"]).collect()))
    assert before == after
    b3_rows = [(30, "closing zz quick brown fox jumps over the lazy dog after compaction")]
    b3 = spark.createDataFrame(b3_rows, "doc_id long, text string")
    absorb_batch(spark, b3, wd, window=W, chain=["c0"], batch_fp="b3")
    inc = sorted(map(tuple, read_coverage(spark, wd, W, ["c0", "b3"]).collect()))
    full = sorted(
        map(
            tuple,
            cross_doc_duplicate_coverage(
                all_docs.unionByName(b3), window=W, exact=False
            ).collect(),
        )
    )
    assert inc == full


def test_cli_compact_windows_mode(spark, tmp_path):
    """Verdict r4 #4: --compact-windows folds a window-index chain from
    the CLI; coverage read from [compacted] == coverage read from the
    chain, and a later absorb continues against the compacted fp."""
    import json
    from contextlib import redirect_stdout
    from io import StringIO

    from datasketches_server_spark.__main__ import main

    wd = str(tmp_path / "wix")
    base = spark.createDataFrame(BASE, "doc_id long, text string")
    b1 = spark.createDataFrame(BATCH1, "doc_id long, text string")
    b2 = spark.createDataFrame(BATCH2, "doc_id long, text string")
    write_window_index(base, wd, window=W, input_fp="base")
    absorb_batch(spark, b1, wd, window=W, chain=["base"], batch_fp="b1")

    buf = StringIO()
    with redirect_stdout(buf):
        assert main(
            ["--workdir", wd, "--compact-windows", "--window", str(W),
             "--base-fps", "base,b1", "--compact-fp", "wcmp1"],
            spark=spark,
        ) == 0
    out = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert out["mode"] == "compact-windows" and out["input_fp"] == "wcmp1"

    want = {(r["id"], r["dup_tokens"])
            for r in read_coverage(spark, wd, window=W, chain=["base", "b1"]).collect()}
    got = {(r["id"], r["dup_tokens"])
           for r in read_coverage(spark, wd, window=W, chain=["wcmp1"]).collect()}
    assert got == want

    absorb_batch(spark, b2, wd, window=W, chain=["wcmp1"], batch_fp="b2")
    full = cross_doc_duplicate_coverage(
        base.unionByName(b1).unionByName(b2), window=W
    )
    want_full = {(r["id"], r["dup_tokens"]) for r in full.collect()}
    got_full = {(r["id"], r["dup_tokens"])
                for r in read_coverage(spark, wd, window=W, chain=["wcmp1", "b2"]).collect()}
    assert got_full == want_full


def test_retract_window_chain_equals_rebuild_over_survivors(spark, chain_state):
    """Erasure fold: retracting docs from the chain must equal indexing
    the surviving corpus from scratch -- including the NON-monotone
    effects absorb can't reverse: removing doc 10 demotes doc 1's woken
    window back to singleton (coverage shrinks to 0), removing doc 13
    orphans doc 12's batch-internal run."""
    import tempfile as _tf

    from datasketches_server_spark.plans.window_index import (
        retract_window_chain,
    )

    wd, _, all_docs = chain_state
    removed = spark.createDataFrame([(10,), (13,)], "doc_id long")

    stats = retract_window_chain(
        spark, wd, removed, window=W, chain=["base", "b1", "b2"], out_fp="ret1"
    )
    got_cov = {
        tuple(r)
        for r in read_coverage(spark, wd, window=W, chain=["ret1"]).collect()
    }
    got_spans = {
        tuple(r) for r in read_spans(spark, wd, window=W, chain=["ret1"]).collect()
    }

    wd2 = _tf.mkdtemp(prefix="wix_ret_ref_")
    try:
        survivors = all_docs.where(~all_docs.doc_id.isin(10, 13))
        write_window_index(survivors, wd2, window=W, input_fp="base")
        want_cov = {
            tuple(r)
            for r in read_coverage(spark, wd2, window=W, chain=["base"]).collect()
        }
        want_spans = {
            tuple(r)
            for r in read_spans(spark, wd2, window=W, chain=["base"]).collect()
        }
    finally:
        import shutil as _sh

        _sh.rmtree(wd2, ignore_errors=True)

    assert got_cov == want_cov
    assert got_spans == want_spans
    # the planted non-monotone effects actually fired
    cov = {t[0]: t[2] for t in got_cov}
    assert cov[1] == 0, cov      # doc 1's wake reversed
    assert cov[12] == 0, cov     # doc 12's partner removed
    assert 10 not in cov and 13 not in cov
    # further absorbs chain off the retracted snapshot
    b3 = spark.createDataFrame(
        [(31, "zz quick brown fox jumps over the lazy dog yy copy")],
        "doc_id long, text string",
    )
    absorb_batch(spark, b3, wd, window=W, chain=["ret1"], batch_fp="rb3")
    cov2 = {
        t[0]: t[2]
        for t in (
            tuple(r)
            for r in read_coverage(spark, wd, window=W, chain=["ret1", "rb3"]).collect()
        )
    }
    assert cov2[1] > 0 and cov2[31] > 0  # doc 1 re-woken by the new batch
    assert stats["out_fp"] == "ret1"


def test_retract_unknown_ids_is_noop(spark, chain_state):
    from datasketches_server_spark.plans.window_index import (
        retract_window_chain,
    )

    wd, _, _ = chain_state
    removed = spark.createDataFrame([(999,)], "doc_id long")
    retract_window_chain(
        spark, wd, removed, window=W, chain=["base", "b1", "b2"], out_fp="ret_noop"
    )
    before = {
        tuple(r)
        for r in read_coverage(
            spark, wd, window=W, chain=["base", "b1", "b2"]
        ).collect()
    }
    after = {
        tuple(r)
        for r in read_coverage(spark, wd, window=W, chain=["ret_noop"]).collect()
    }
    assert after == before


def test_cli_retract_windows_mode(spark, tmp_path):
    """--retract-windows end-to-end: bootstrap + absorb via the library,
    retract two docs via the CLI, coverage equals a scratch rebuild over
    the survivors."""
    import json
    from contextlib import redirect_stdout
    from io import StringIO

    from datasketches_server_spark.__main__ import main

    wd = str(tmp_path / "wd")
    base = spark.createDataFrame(BASE, "doc_id long, text string")
    b1 = spark.createDataFrame(BATCH1, "doc_id long, text string")
    write_window_index(base, wd, window=W, input_fp="base", store_tokens=True)
    absorb_batch(spark, b1, wd, window=W, chain=["base"], batch_fp="b1", store_tokens=True)

    rm_p = str(tmp_path / "rm")
    spark.createDataFrame([(10,), (13,)], "doc_id long").write.parquet(rm_p)

    buf = StringIO()
    with redirect_stdout(buf):
        assert main(
            ["--retract-windows", "--retract-input", rm_p, "--workdir", wd,
             "--base-fps", "base,b1", "--window", str(W), "--compact-fp", "ret1"],
            spark=spark,
        ) == 0
    rep = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert rep["mode"] == "retract-windows" and rep["input_fp"] == "ret1"

    got = {
        tuple(r) for r in read_coverage(spark, wd, window=W, chain=["ret1"]).collect()
    }
    wd2 = str(tmp_path / "ref")
    survivors = base.unionByName(b1)
    survivors = survivors.where(~survivors.doc_id.isin(10, 13))
    write_window_index(survivors, wd2, window=W, input_fp="base")
    want = {
        tuple(r) for r in read_coverage(spark, wd2, window=W, chain=["base"]).collect()
    }
    assert got == want
