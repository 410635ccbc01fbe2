"""SparkSession factory tuned for the sandbox (local[N], single JVM).

At cluster scale the same settings apply except shuffle partitions /
maxPartitionBytes, which should be sized to executor memory; AQE then
re-coalesces and splits skewed partitions at runtime.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "datasketches_server_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        # ~cores in local mode; a 1000-executor cluster would use
        # 2-3x total cores and rely on AQE coalescing.
        shuffle_partitions = max(cores, 8)
    # worker-daemon preload: forked Python workers inherit imported
    # numpy/pandas/pyarrow + the warm signature module via copy-on-write
    # (~1-2 s saved per worker's first task).  The daemon module must be
    # importable at worker LAUNCH, so the package root (a directory or a
    # --py-files zip -- both are valid PYTHONPATH entries) goes on the
    # environment before the JVM starts.
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.environ["PYTHONPATH"] = pkg_root + os.pathsep + os.environ.get("PYTHONPATH", "")
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        # tmpfs shuffle dir when available: the sandbox's virtio disk
        # (~580 MB/s, async writeback) adds multi-second jitter per
        # multi-GB shuffle; real clusters have per-executor local disks
        .config(
            "spark.local.dir",
            "/dev/shm/spark-local" if os.path.isdir("/dev/shm") else "/tmp",
        )
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # catalog tables (write_bucketed) land in tmp, not the repo cwd;
        # per-uid-and-pid path so concurrent runs (bench + pytest, two CI
        # jobs) can't overwrite each other's saveAsTable data
        .config(
            "spark.sql.warehouse.dir",
            f"/tmp/spark-warehouse-{os.getuid()}-{os.getpid()}",
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE coalesces by SHUFFLE BYTES; this engine's hot shuffles are
        # narrow-but-compute-dense rows (gram strings, hash keys feeding
        # windows/joins), so the 1 MB default min-partition-size folds a
        # CPU-bound stage onto ~6 of 32 cores (measured: q111's ranking
        # window ran (5+1)/6 tasks with a straggler tail; 64k keeps it at
        # 32 tasks, min wall 9.5 -> 5.3 s).  Parameterised: on a real
        # cluster with deep per-task overheads raise it back via env.
        .config(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize",
            os.environ.get("SPARK_GRAFT_AQE_MIN_PARTITION", "64k"),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # small Arrow batches: the signature kernel's per-batch working set
        # must stay cache-resident or concurrent workers thrash shared L3
        # (measured 6x CPU inflation at batch=10000 with 16 workers)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.python.daemon.module", "datasketches_server_spark.worker_daemon")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
