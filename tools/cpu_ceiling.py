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
    return out


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
