"""Event-log breakdown of one scaling_job run: where does wall time go?

Runs tools/scaling_job.py at a given executor count with the Spark event
log enabled, then parses the log into per-stage aggregates:

  * executor task-time sum (the truly parallel work)
  * per-stage wall (submission -> completion) and tail skew
    (max task finish - median task finish)
  * gaps BETWEEN stages (driver-side planning / actions / collect time
    where no stage is running = the serial fraction Amdahl charges)

Comparing two parallelism levels tells which of the three buckets fails
to shrink 4x -- distinguishing "stage doesn't parallelize" (task-time
sum grows), "stage tail-skews" (wall >> task_sum/cores), and "driver
serial time" (inter-stage gaps constant across levels).

Usage: python tools/stage_breakdown.py --cores 8 [--corpus PATH]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_job(cores: int, corpus: str, zip_path: str, log_dir: str) -> dict:
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
            "--conf", "spark.eventLog.enabled=true",
            "--conf", f"spark.eventLog.dir=file://{log_dir}",
            "--py-files", zip_path,
            os.path.join(REPO, "tools", "scaling_job.py"),
            corpus, os.path.join(log_dir, "clusters_out"),
        ],
        check=True, capture_output=True, text=True, env=env, cwd="/tmp",
    )
    line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def parse_log(log_dir: str) -> dict:
    # Spark 4 rolling logs: eventlog_v2_<appid>/ dirs holding events_* files
    dirs = sorted(glob.glob(os.path.join(log_dir, "eventlog_v2_*")), key=os.path.getmtime)
    if dirs:
        parts = sorted(glob.glob(os.path.join(dirs[-1], "events_*")))
    else:
        files = sorted(
            (f for f in glob.glob(os.path.join(log_dir, "*")) if os.path.isfile(f)),
            key=os.path.getmtime,
        )
        parts = files[-1:]
    stages: dict[int, dict] = {}
    app_start = app_end = None

    def _lines():
        for p in parts:
            if p.endswith(".zstd"):
                r = subprocess.run(["zstd", "-dc", p], check=True, capture_output=True, text=True)
                yield from r.stdout.splitlines()
            else:
                with open(p) as f:
                    yield from f

    if True:
        for raw in _lines():
            try:
                ev = json.loads(raw)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerApplicationStart":
                app_start = ev["Timestamp"]
            elif e == "SparkListenerApplicationEnd":
                app_end = ev["Timestamp"]
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                sub, comp = si.get("Submission Time"), si.get("Completion Time")
                if sub and comp:
                    st = stages.setdefault(sid, {"task_ms": 0, "n_tasks": 0, "finishes": []})
                    st["name"] = si["Stage Name"].split()[0]
                    st["sub"], st["comp"] = sub, comp
            elif e == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                st = stages.setdefault(sid, {"task_ms": 0, "n_tasks": 0, "finishes": []})
                ti = ev.get("Task Info", {})
                st["task_ms"] += ti.get("Finish Time", 0) - ti.get("Launch Time", 0)
                st["n_tasks"] += 1
                st["finishes"].append(ti.get("Finish Time", 0))

    done = [s for s in stages.values() if "sub" in s]
    done.sort(key=lambda s: s["sub"])
    # ONE labeled merge of overlapping stage windows serves both the
    # coverage total and the gap attribution (gaps = app time between
    # merged windows = where driver_gap_ms actually lives)
    lwin = []  # [start, end, last_stage_name, first_stage_name]
    for s in done:
        if lwin and s["sub"] <= lwin[-1][1]:
            if s["comp"] > lwin[-1][1]:
                lwin[-1][1], lwin[-1][2] = s["comp"], s["name"]
        else:
            lwin.append([s["sub"], s["comp"], s["name"], s["name"]])
    covered = sum(b - a for a, b, _, _ in lwin)
    total = (app_end - app_start) if app_start and app_end else None
    gaps = []
    prev_end, prev_label = app_start, "app_start"
    for a, b, last, first in lwin:
        if prev_end and a - prev_end > 0:
            gaps.append({"ms": a - prev_end, "after": prev_label, "before": first})
        prev_end, prev_label = b, last
    if app_end and prev_end and app_end - prev_end > 0:
        gaps.append({"ms": app_end - prev_end, "after": prev_label, "before": "app_end"})
    gaps.sort(key=lambda g: -g["ms"])
    per_name: dict[str, dict] = {}
    for s in done:
        g = per_name.setdefault(s["name"], {"wall_ms": 0, "task_ms": 0, "n_stages": 0, "tail_ms": 0})
        g["wall_ms"] += s["comp"] - s["sub"]
        g["task_ms"] += s["task_ms"]
        g["n_stages"] += 1
        fin = sorted(s["finishes"])
        if fin:
            g["tail_ms"] += fin[-1] - fin[len(fin) // 2]
    return {
        "app_ms": total,
        "stage_covered_ms": covered,
        "driver_gap_ms": (total - covered) if total else None,
        "n_stages": len(done),
        "task_ms_sum": sum(s["task_ms"] for s in done),
        "top_gaps": gaps[:8],
        "by_stage_name": {
            k: {kk: vv for kk, vv in v.items()} for k, v in
            sorted(per_name.items(), key=lambda kv: -kv[1]["wall_ms"])
        },
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--corpus", default="/tmp/scaling_bench/transcripts_1000000")
    args = ap.parse_args()

    zip_path = "/tmp/scaling_bench/dss.zip"
    subprocess.run(
        ["zip", "-qr", "-FS", zip_path, "datasketches_server_spark"], check=True, cwd=REPO
    )
    log_dir = f"/tmp/scaling_bench/eventlogs_{args.cores}"
    os.makedirs(log_dir, exist_ok=True)
    for f in glob.glob(os.path.join(log_dir, "app-*")) + glob.glob(os.path.join(log_dir, "local-*")):
        os.remove(f)
    rec = run_job(args.cores, args.corpus, zip_path, log_dir)
    breakdown = parse_log(log_dir)
    print(json.dumps({"job": rec, "breakdown": breakdown}))


if __name__ == "__main__":
    main()
