"""Custom PySpark worker daemon: preload heavy libraries before forking.

Set ``spark.python.daemon.module=datasketches_server_spark.worker_daemon``
and every forked Python worker inherits already-imported numpy / pandas /
pyarrow via copy-on-write, instead of each worker paying ~1-2s of import
on its first task.  On a 16-worker executor that removes most of the
first-stage latency of the signature UDF.

Public mechanism: pyspark.daemon is the stock worker factory; this module
only front-loads imports and delegates to it.
"""

import numpy  # noqa: F401
import pandas  # noqa: F401
import pyarrow  # noqa: F401

import datasketches_server_spark.functions.signatures  # noqa: F401  (warm module)

if __name__ == "__main__":
    from pyspark.daemon import manager

    manager()
