"""Per-stage wall-clock profile of the dedup pipeline at one parallelism.

Usage:
  spark-submit --master local[N] --py-files dss.zip tools/profile_stages.py <input_parquet>

Each stage is materialized (persist + count) so the timing isolates that
stage's work; prints one JSON line with per-stage seconds.
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import SparkSession

from datasketches_server_spark.config import DEFAULT_CONFIG
from datasketches_server_spark.operators.components import attach_singletons, connected_components
from datasketches_server_spark.operators.lsh import band_buckets, candidate_pairs, verify_pairs
from datasketches_server_spark.plans.pipeline import conv_signatures


def main() -> None:
    inp = sys.argv[1]
    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
    # wait for all local-cluster executors (see scaling_job.wait_for_executors)
    import re
    import time as _time

    m = re.match(r"local-cluster\[(\d+),", spark.sparkContext.master or "")
    if m:
        want, t0 = int(m.group(1)), _time.monotonic()
        while _time.monotonic() - t0 < 120 and spark.sparkContext.defaultParallelism < want:
            _time.sleep(0.5)
    cfg = DEFAULT_CONFIG
    t: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.monotonic()
        out = fn()
        t[name] = round(time.monotonic() - t0, 2)
        return out

    transcripts = spark.read.parquet(inp)
    n_turns = timed("read_count", lambda: transcripts.count())

    state = conv_signatures(transcripts, cfg).persist()
    timed("signatures", lambda: state.count())

    buckets = band_buckets(state, cfg.lsh).persist()
    timed("band_buckets", lambda: buckets.count())

    cands = candidate_pairs(buckets, cfg.lsh).persist()
    n_cands = timed("candidate_pairs", lambda: cands.count())

    edges = verify_pairs(cands, state, cfg.lsh, tier="exact").persist()
    n_edges = timed("verify", lambda: edges.count())

    labels = timed("components", lambda: connected_components(edges).persist())
    t["components"] = t["components"]
    n_labeled = labels.count()

    clusters = attach_singletons(labels, state)
    timed("attach_write", lambda: clusters.write.mode("overwrite").parquet("/tmp/profile_clusters"))

    print(json.dumps({
        "cores": spark.sparkContext.defaultParallelism,
        "n_turns": n_turns, "n_cands": n_cands, "n_edges": n_edges,
        "n_labeled": n_labeled,
        "stages": t, "total": round(sum(t.values()), 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
