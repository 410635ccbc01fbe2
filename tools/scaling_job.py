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


def main() -> None:
    inp, out = sys.argv[1], sys.argv[2]
    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    # cache-resident signature batches (see session.py) -- runtime SQL conf
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
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
