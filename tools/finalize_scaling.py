"""Turn a killed campaign's .partial record into a complete artifact.

bench_scaling.py persists <out>.partial after every run; when a campaign
is cut short (box needed back, epoch turned), this produces the same
{summary, best, runs} artifact the full run would have written, using
the identical estimator/certification code (bench_scaling.summarize).

    python tools/finalize_scaling.py BENCH_scaling_r5c.json.partial \
        [--n 1] [--out BENCH_scaling_r5c.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("partial")
    ap.add_argument("--n", type=int, default=1)
    ap.add_argument("--ceiling-gate", type=float, default=0.9)
    ap.add_argument("--marker-drift", type=float, default=0.08)
    ap.add_argument("--out", default=None,
                    help="default: the partial path minus '.partial'")
    args = ap.parse_args()

    from bench_scaling import summarize

    with open(args.partial) as f:
        d = json.load(f)
    summary, best = summarize(d["runs"], args.n, args.ceiling_gate, args.marker_drift)
    summary["finalized_from_partial"] = True
    out = args.out or args.partial.removesuffix(".partial")
    with open(out, "w") as f:
        json.dump({"summary": summary, "best": best, "runs": d["runs"]}, f, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
