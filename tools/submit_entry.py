"""Exercise `__spark_entry__.entry` through the REAL packaged surface:
zip the library, `spark-submit --py-files` it from a neutral cwd (so the
zip must be self-contained -- running from the repo root would silently
pick up the package dir), run the flagship query, and assert row count,
schema, and the deterministic result fingerprint.

This is the contract's invocation path (BASELINE.json north_rule: "run
via spark-submit --py-files"); pytest exercises the library in-process,
which cannot catch packaging bugs (missing submodule in the zip, repo-
relative imports, cwd-dependent paths).

Usage: python tools/submit_entry.py [--master local[8]]
Writes one JSON line to stdout and (from the repo root) SUBMIT_ENTRY.json.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DRIVER = """
import json
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

import __spark_entry__ as E

spark = SparkSession.builder.appName("submit-entry").getOrCreate()
df = E.entry(spark)
schema = [f"{f.name}:{f.dataType.simpleString()}" for f in df.schema.fields]
# ANSI mode: bit_xor, never sum, over xxhash64
fp_row = df.select(
    F.expr("bit_xor(xxhash64(cluster_id, cluster_size))").alias("f"),
    F.count("*").alias("n"),
).collect()[0]
print("ENTRY_RESULT " + json.dumps(
    {"rows": fp_row["n"], "fingerprint": fp_row["f"], "schema": schema}
))
spark.stop()
"""


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--master", default="local[8]")
    args = ap.parse_args()

    workdir = tempfile.mkdtemp(prefix="submit_entry_")
    zip_path = os.path.join(workdir, "dss.zip")
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(REPO, "datasketches_server_spark")
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
        # the entry contract module rides in the zip root too
        z.write(os.path.join(REPO, "__spark_entry__.py"), "__spark_entry__.py")
    driver_path = os.path.join(workdir, "driver.py")
    with open(driver_path, "w") as f:
        f.write(DRIVER)

    t0 = time.monotonic()
    proc = subprocess.run(
        [
            "spark-submit",
            "--master", args.master,
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            driver_path,
        ],
        cwd=workdir,  # neutral cwd: the zip must be self-contained
        capture_output=True,
        text=True,
        timeout=600,
    )
    wall = round(time.monotonic() - t0, 1)
    marker = [l for l in proc.stdout.splitlines() if l.startswith("ENTRY_RESULT ")]
    if proc.returncode != 0 or not marker:
        sys.stderr.write(proc.stdout[-2000:] + "\n" + proc.stderr[-4000:] + "\n")
        print(json.dumps({"ok": False, "wall_sec": wall, "master": args.master}))
        return 1
    result = json.loads(marker[0][len("ENTRY_RESULT "):])
    ok = (
        result["rows"] >= 0
        and result["schema"] == ["cluster_id:string", "cluster_size:bigint"]
    )
    out = {
        "ok": ok,
        "wall_sec": wall,
        "master": args.master,
        **result,
    }
    print(json.dumps(out))
    art = os.path.join(REPO, "SUBMIT_ENTRY.json")
    with open(art, "w") as f:
        json.dump(out, f)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
