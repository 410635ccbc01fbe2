"""LSH band-plan selection (functions/lsh_planner.py) -- pure S-curve
arithmetic, no Spark session needed."""

from __future__ import annotations

import pytest

from datasketches_server_spark.functions.lsh_planner import (
    candidate_probability,
    factorizations,
    plan_bands,
    planned_lsh_config,
    s50,
)


def test_factorizations_cover_128():
    facs = factorizations(128)
    assert len(facs) == 8
    assert all(b * r == 128 for b, r in facs)
    assert [r for _, r in facs] == sorted(r for _, r in facs)


def test_recall_rule_derives_shipped_default():
    # the engine's hand-chosen round-1 default (config.py: b=32, r=4)
    # is exactly what the recall rule derives at the contract threshold
    assert plan_bands(0.7, 128, mode="recall", min_catch=0.99) == (32, 4)
    assert candidate_probability(0.7, 32, 4) >= 0.99


def test_balanced_rule_matches_bruteforce_argmin():
    for t in [0.05 * i for i in range(1, 20)]:
        b, r = plan_bands(t, 128, mode="balanced")
        best = min(abs(s50(bb, rr) - t) for bb, rr in factorizations(128))
        assert abs(s50(b, r) - t) == best


def test_recall_rule_is_max_selectivity_meeting_floor():
    for t in (0.5, 0.6, 0.7, 0.8, 0.9):
        b, r = plan_bands(t, 128, mode="recall", min_catch=0.99)
        assert candidate_probability(t, b, r) >= 0.99
        # no more selective factorization (larger r) also clears it
        for bb, rr in factorizations(128):
            if rr > r:
                assert candidate_probability(t, bb, rr) < 0.99


def test_scurve_monotonicity():
    # P monotone in s for fixed (b, r); s50 monotone in r for b*r fixed
    ps = [candidate_probability(s / 20, 32, 4) for s in range(21)]
    assert ps == sorted(ps)
    mids = [s50(b, r) for b, r in factorizations(128)]
    assert mids == sorted(mids)


def test_planned_config_valid_and_threaded():
    cfg = planned_lsh_config(0.85, mode="balanced", bucket_cap=500)
    assert cfg.bands * cfg.rows_per_band == 128
    assert cfg.jaccard_threshold == 0.85
    assert cfg.bucket_cap == 500
    with pytest.raises(ValueError):
        plan_bands(0.7, mode="nope")
