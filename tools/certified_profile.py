"""Certified-quiet per-stage scaling profile (round-3 fallback evidence).

Repeats (probe -> profile_stages at K executors -> probe) until each
parallelism level has a profile whose two bracketing cpu_ceiling probes
BOTH clear the gate -- i.e. the box provably charged no concurrency tax
while that profile ran.  Stage efficiencies computed across two levels
are only meaningful when both levels' profiles are certified; a single
contended epoch otherwise poisons the ratio (observed: an 8-exec
profile whose closing probe read 0.277 while the 2-exec pair sat at
0.83-1.01).

Usage:
  python tools/certified_profile.py [--corpus PATH] [--gate 0.9]
                                    [--max-tries 6] [--n 2]
Prints one JSON line with certified per-stage walls + efficiencies.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from cpu_ceiling import probe as ceiling_probe  # noqa: E402


def run_profile(cores: int, corpus: str, zip_path: str) -> dict:
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run(
        [
            "spark-submit",
            "--master", f"local-cluster[{cores},1,6144]",
            "--conf", "spark.scheduler.minRegisteredResourcesRatio=1.0",
            "--conf", "spark.scheduler.maxRegisteredResourcesWaitingTime=180s",
            "--conf", f"spark.sql.shuffle.partitions={2 * cores}",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.adaptive.enabled=true",
            "--conf", "spark.driver.memory=48g",
            "--conf", "spark.python.daemon.module=datasketches_server_spark.worker_daemon",
            "--conf", "spark.local.dir=/dev/shm/spark-local",
            "--py-files", zip_path,
            os.path.join(REPO, "tools", "profile_stages.py"),
            corpus,
        ],
        check=True, capture_output=True, text=True, env=env, cwd="/tmp",
    )
    line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", default="/tmp/scaling_bench/transcripts_1000000")
    ap.add_argument("--gate", type=float, default=0.9)
    ap.add_argument("--max-tries", type=int, default=6)
    ap.add_argument("--n", type=int, default=2)
    args = ap.parse_args()

    zip_path = "/tmp/scaling_bench/dss.zip"
    os.makedirs(os.path.dirname(zip_path), exist_ok=True)
    subprocess.run(
        ["zip", "-qr", "-FS", zip_path, "datasketches_server_spark"],
        check=True, cwd=REPO,
    )

    certified: dict[int, dict] = {}
    attempts = []
    for k in (args.n * 4, args.n):
        for t in range(args.max_tries):
            pre = ceiling_probe(levels=(2, 8), secs_per_rep=1.2, repeats=1)[
                "efficiency_ceiling_2to8"
            ]
            if pre < args.gate:
                attempts.append({"cores": k, "try": t, "pre": pre, "skipped": True})
                time.sleep(20)
                continue
            prof = run_profile(k, args.corpus, zip_path)
            post = ceiling_probe(levels=(2, 8), secs_per_rep=1.2, repeats=1)[
                "efficiency_ceiling_2to8"
            ]
            rec = {"cores": k, "try": t, "pre": pre, "post": post, "stages": prof["stages"]}
            attempts.append(rec)
            print(json.dumps(rec), flush=True)
            if post >= args.gate:
                certified[k] = prof
                break

    out: dict = {"gate": args.gate, "attempts": attempts}
    if args.n in certified and args.n * 4 in certified:
        s2, s8 = certified[args.n]["stages"], certified[args.n * 4]["stages"]
        out["certified"] = True
        out["per_stage_efficiency"] = {
            name: round(s2[name] / s8[name] / 4.0, 3)
            for name in s2
            if name in s8 and s8[name] > 0
        }
        out["walls_n"] = s2
        out["walls_4n"] = s8
    else:
        out["certified"] = False
    print(json.dumps(out))


if __name__ == "__main__":
    main()
