"""LSH band-plan selection from the MinHash S-curve (round 5).

The reference pins one (bands, rows) config; a 100 TB operator needs to
RE-plan when the similarity threshold changes (0.7 for near-dup removal,
0.85+ for semantic-dup audits, 0.5 for recall-heavy contamination
sweeps).  The math is the standard S-curve for banded MinHash (Leskovec/
Rajaraman/Ullman, "Mining of Massive Datasets" ch. 3, public): a pair
with true Jaccard s becomes a candidate in at least one of b bands of r
rows with probability

    P(s; b, r) = 1 - (1 - s^r)^b

and the curve's midpoint ("threshold") sits at s50 = (1/b)^(1/r).

Two selection rules, both closed-form and exactly replayable in the
DuckDB oracle (q65):

* ``balanced``  -- the (b, r) factorization of num_perm whose s50 lands
  closest to the target threshold: FP and FN mass are traded evenly,
  the right default for *audit* queries where both error kinds cost.
* ``recall``    -- the largest r (fewest, most selective candidates =
  cheapest verify stage) whose catch probability AT the threshold still
  clears ``min_catch``: the right rule for the dedup pipeline itself,
  where the >= 0.99 dup-pair recall contract is a hard floor and
  precision is recovered by the exact-verify stage anyway.  With
  num_perm=128, threshold=0.7, min_catch=0.99 this rule derives
  (b=32, r=4) -- the engine's shipped default (config.py:80), which was
  hand-chosen in round 1; the planner proves it optimal among the
  128-perm factorizations rather than merely asserted.

Everything is O(divisors(num_perm)) driver-side arithmetic -- planning
cost is independent of corpus size, so at 100 TB this runs before the
job in microseconds; only the chosen LshConfig ships to executors.
"""

from __future__ import annotations

from .. import config as _cfg

__all__ = [
    "candidate_probability",
    "factorizations",
    "s50",
    "plan_bands",
    "planned_lsh_config",
]


def candidate_probability(s: float, bands: int, rows: int) -> float:
    """P(pair with Jaccard s shares >= 1 band) = 1 - (1 - s^r)^b."""
    return 1.0 - (1.0 - s**rows) ** bands


def factorizations(num_perm: int = 128) -> list[tuple[int, int]]:
    """All (bands, rows) with bands*rows == num_perm, rows ascending."""
    return [
        (num_perm // r, r)
        for r in range(1, num_perm + 1)
        if num_perm % r == 0
    ]


def s50(bands: int, rows: int) -> float:
    """The S-curve midpoint (1/b)^(1/r): P(s50) ~ 1 - 1/e for large b."""
    return (1.0 / bands) ** (1.0 / rows)


def plan_bands(
    threshold: float,
    num_perm: int = 128,
    mode: str = "balanced",
    min_catch: float = 0.99,
) -> tuple[int, int]:
    """Choose (bands, rows) for a target Jaccard threshold.

    ``balanced``: argmin over factorizations of |s50 - threshold|.
    ``recall``:   max rows whose P(threshold) >= min_catch (falls back
    to rows=1 -- every pair a candidate -- if nothing clears the floor).
    Ties in ``balanced`` break to the smaller rows (recall-leaning).
    """
    facs = factorizations(num_perm)
    if mode == "balanced":
        return min(facs, key=lambda br: (abs(s50(*br) - threshold), br[1]))
    if mode == "recall":
        ok = [
            (b, r)
            for b, r in facs
            if candidate_probability(threshold, b, r) >= min_catch
        ]
        return max(ok, key=lambda br: br[1]) if ok else (num_perm, 1)
    raise ValueError(f"unknown mode {mode!r}")


def planned_lsh_config(
    threshold: float,
    num_perm: int = 128,
    mode: str = "recall",
    min_catch: float = 0.99,
    **overrides,
) -> "_cfg.LshConfig":
    """An LshConfig whose (bands, rows) the planner derived for
    ``threshold`` -- drop-in for PipelineConfig(lsh=...) when running
    the pipeline at a non-default similarity threshold."""
    b, r = plan_bands(threshold, num_perm, mode=mode, min_catch=min_catch)
    return _cfg.LshConfig(
        bands=b, rows_per_band=r, jaccard_threshold=threshold, **overrides
    )
