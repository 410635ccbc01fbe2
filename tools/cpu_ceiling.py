"""Machine-concurrency ceiling probe (evidence for BASELINE.md).

Runs the SAME fixed CPU-bound kernel (the signature workload's numpy
profile: uint64 multiply-add + reduceat over cache-blocked buffers) in
N independent OS processes and reports per-process wall inflation vs a
single process.  No Spark, no shuffle, no Python-worker accounting --
pure "what does this box charge for running k copies at once".

If running 8 copies costs each copy X times the 1-copy wall, then NO
job -- however perfectly scheduled -- can exceed scaling efficiency
(k_small * inflation_small) / (k_large * inflation_large) ... i.e. the
measured inflation ratio bounds N->4N efficiency at
inflation(N) / inflation(4N).  This separates "the engine doesn't
scale" from "the box charges more per CPU under concurrency"
(shared LLC / memory bandwidth / SMT / hypervisor): a real cluster
adds nodes (each with its own memory subsystem) instead of packing one
socket harder, so it does not pay this tax on N->4N executors.

Usage: python tools/cpu_ceiling.py [--levels 1,2,8,32] [--secs-per-rep 2]
Prints one JSON line; feed into BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import time

import numpy as np


def kernel(reps: int, n_sh: int = 8192, num_perm: int = 16) -> float:
    """Cache-blocked multiply-add + segment-min, shaped like the MinHash
    inner loop (functions/signatures.py)."""
    rng = np.random.default_rng(0)
    hs = rng.integers(1, 2**62, size=n_sh, dtype=np.uint64)
    a = rng.integers(1, 2**62, size=num_perm, dtype=np.uint64) * np.uint64(2) + np.uint64(1)
    b = rng.integers(0, 2**62, size=num_perm, dtype=np.uint64)
    starts = np.arange(0, n_sh, 170)
    buf = np.empty((num_perm, n_sh), dtype=np.uint64)
    t0 = time.monotonic()
    acc = np.uint64(0)
    for _ in range(reps):
        np.multiply(a[:, None], hs[None, :], out=buf)
        buf += b[:, None]
        mins = np.minimum.reduceat(buf, starts, axis=1)
        acc ^= mins[0, 0]
    return time.monotonic() - t0


def _worker(reps: int, q) -> None:
    q.put(kernel(reps))


def run_level(k: int, reps: int) -> dict:
    q = mp.Queue()
    procs = [mp.Process(target=_worker, args=(reps, q)) for _ in range(k)]
    t0 = time.monotonic()
    for p in procs:
        p.start()
    walls = [q.get() for _ in procs]
    for p in procs:
        p.join()
    return {
        "k": k,
        "mean_proc_wall": round(sum(walls) / len(walls), 3),
        "max_proc_wall": round(max(walls), 3),
        "outer_wall": round(time.monotonic() - t0, 3),
    }


def probe(levels=(1, 2, 8, 32), secs_per_rep: float = 3.0, repeats: int = 3) -> dict:
    """Run the ceiling probe and return the result dict.  With levels
    (2, 8) the returned ``efficiency_ceiling_2to8`` is the hard upper
    bound ANY 2-vs-8-process job can show right now -- bench_scaling.py
    uses it as the certified-quiet-epoch gate (a ceiling >= ~0.9 means
    the box is currently charging little concurrency tax)."""
    levels = tuple(levels)
    # calibrate rep count to ~secs_per_rep of single-process work
    one = kernel(50)
    reps = max(50, int(50 * secs_per_rep / max(one, 1e-6)))

    results = {}
    for k in levels:
        best = None
        for _ in range(repeats):
            r = run_level(k, reps)
            if best is None or r["mean_proc_wall"] < best["mean_proc_wall"]:
                best = r
        results[k] = best
    base = results[levels[0]]["mean_proc_wall"]
    for k, r in results.items():
        r["inflation_vs_1proc"] = round(r["mean_proc_wall"] / base, 3)
    out = {
        "metric": "per-process wall inflation under k-way concurrency (pure numpy, no Spark)",
        "reps": reps,
        "levels": results,
    }
    if 2 in results and 8 in results:
        out["efficiency_ceiling_2to8"] = round(
            results[2]["mean_proc_wall"] / results[8]["mean_proc_wall"], 3
        )
    # absolute machine-speed marker: wall seconds this box needs for 1000
    # kernel reps at the probe's lowest concurrency.  Unlike the 2-vs-8
    # ratio (which detects a CURRENT concurrency tax), the absolute
    # marker detects uniform epoch drift -- the whole box running slower
    # or faster between two measurement windows -- which the ratio gate
    # is blind to (round-4 probe15 lesson: both windows probed "quiet"
    # but the tax had moved BETWEEN them).  bench_scaling.py divides each
    # job wall by the surrounding markers to compare runs across drift.
    out["abs_wall_per_krep"] = round(
        results[levels[0]]["mean_proc_wall"] / reps * 1000.0, 4
    )
    return out


def probe_median(levels=(2, 8), secs_per_rep: float = 3.0, repeats: int = 3) -> dict:
    """Drift-robust variant of :func:`probe` for the certification gate.

    ``probe`` takes the best sample PER LEVEL, so the two walls entering
    the ceiling ratio can come from different instants -- on this shared
    VM single-sample ratios swing 0.79-1.08 back-to-back on an idle box
    (round-5 measurement), which made the [0.9, 1.1] certified-quiet
    gate a lottery even in genuinely quiet epochs.  Here each repeat
    runs the two levels ADJACENT IN TIME and yields its own ratio and
    marker; the median over repeats is reported, plus the spread so the
    caller can reject internally-turbulent windows.

    Round-5 calibration on this box (quiet epoch, load 0.08): single
    1s samples with MEAN process walls read 0.65-1.46 back-to-back;
    3s kernels with MEDIAN process walls read 0.898-1.015 -- the mean
    at k=2 has only two samples, so one scheduler-stalled process
    (observed 0.66 vs 0.97 within a pair) swings the ratio 25%.
    """
    import statistics

    def run_level_median(k: int, reps: int) -> float:
        q = mp.Queue()
        procs = [mp.Process(target=_worker, args=(reps, q)) for _ in range(k)]
        for p in procs:
            p.start()
        walls = [q.get() for _ in procs]
        for p in procs:
            p.join()
        return statistics.median(walls)

    lo, hi = levels
    ratios, markers = [], []
    one = kernel(50)
    reps = max(50, int(50 * secs_per_rep / max(one, 1e-6)))
    for _ in range(repeats):
        w_lo = run_level_median(lo, reps)
        w_hi = run_level_median(hi, reps)
        ratios.append(w_lo / w_hi)
        markers.append(w_lo / reps * 1000.0)

    ratios.sort()
    markers_sorted = sorted(markers)
    return {
        "metric": "median paired 2-vs-8 ceiling (drift-robust)",
        "reps": reps,
        "repeats": repeats,
        "efficiency_ceiling_2to8": round(statistics.median(ratios), 3),
        "ceiling_spread": round(ratios[-1] - ratios[0], 3),
        # min over repeats: the least-disturbed sample converges on the
        # box's true uncontended speed, so between-window drift of this
        # marker reflects genuine epoch change, not sampling jitter
        "abs_wall_per_krep": round(markers_sorted[0], 4),
        "abs_wall_per_krep_median": round(statistics.median(markers_sorted), 4),
        "marker_spread_rel": round(
            (markers_sorted[-1] - markers_sorted[0])
            / max(statistics.median(markers_sorted), 1e-9),
            4,
        ),
        "ratios": [round(x, 3) for x in ratios],
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", default="1,2,8,32")
    ap.add_argument("--secs-per-rep", type=float, default=3.0,
                    help="approx seconds of kernel work per process")
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()
    out = probe(
        [int(x) for x in args.levels.split(",")], args.secs_per_rep, args.repeats
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
