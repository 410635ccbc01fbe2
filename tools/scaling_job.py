"""One scaling-measurement job: read transcripts parquet -> full dedup
pipeline -> write clusters -> print one JSON timing line.

Run via spark-submit --py-files (the contract's invocation path):
  spark-submit --master local[N] --py-files dss.zip tools/scaling_job.py \
      <input_parquet> <output_dir>
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from datasketches_server_spark.config import DEFAULT_CONFIG
from datasketches_server_spark.plans.pipeline import dedup_pipeline


def wait_for_executors(spark, timeout_s: float = 120) -> None:
    """Block until every requested local-cluster executor has registered:
    minRegisteredResourcesRatio does not reliably hold the first job, and
    a job that starts on 7 of 8 executors measures a 14% inflated wall
    (observed: certified 175 s runs reporting defaultParallelism 7 vs
    154 s with all 8)."""
    import re
    import time as _time

    m = re.match(r"local-cluster\[(\d+),", spark.sparkContext.master or "")
    if not m:
        return
    want = int(m.group(1))
    t0 = _time.monotonic()
    while _time.monotonic() - t0 < timeout_s:
        if spark.sparkContext.defaultParallelism >= want:
            return
        _time.sleep(0.5)


def main() -> None:
    inp, out = sys.argv[1], sys.argv[2]
    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    # cache-resident signature batches (see session.py) -- runtime SQL conf
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
    wait_for_executors(spark)
    cores = spark.sparkContext.defaultParallelism

    t0 = time.monotonic()
    transcripts = spark.read.parquet(inp)
    res = dedup_pipeline(transcripts, DEFAULT_CONFIG)
    res.clusters.write.mode("overwrite").parquet(out)
    res.unpersist()
    wall = time.monotonic() - t0

    n_turns = transcripts.count()
    n_clusters = (
        spark.read.parquet(out).select("cluster_id").distinct().count()
    )
    fp = spark.read.parquet(out).select(
        F.expr("bit_xor(xxhash64(conv_id, cluster_id))").alias("f")
    ).collect()[0]["f"]
    print(
        json.dumps(
            {
                "cores": cores,
                "wall_sec": round(wall, 2),
                "n_turns": n_turns,
                "turns_per_sec": round(n_turns / wall, 1),
                "n_clusters": n_clusters,
                "fingerprint": fp,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
