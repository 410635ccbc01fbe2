"""Table IO: Iceberg when available, parquet layout otherwise.

The reference's only IO is JSON-over-HTTP (BaseSketchesQueryHandler.java:
79-97); ours is real table IO.  The contract input is an Iceberg table of
transcripts (BASELINE.json input_hint); this sandbox has no
iceberg-spark-runtime jar, so `TableIO` probes for the Iceberg catalog and
falls back to a parquet directory layout with identical semantics for
everything this engine needs (append, overwrite, snapshot fingerprints
for lineage).  The format choice is a config flag, not a code path fork.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


class TableIO:
    """read/write named tables under a warehouse root.

    Iceberg mode uses ``catalog.db.name`` identifiers; parquet mode maps a
    table name to ``{root}/{name}`` (directory of parquet files).  Both
    support the three verbs the pipeline uses: read, append, overwrite.
    """

    def __init__(self, spark: SparkSession, root: str, use_iceberg: bool | None = None):
        self.spark = spark
        self.root = root
        self.use_iceberg = (
            iceberg_available(spark) if use_iceberg is None else use_iceberg
        )

    def _path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def read(self, name: str) -> DataFrame:
        if self.use_iceberg:
            return self.spark.read.table(name)
        return self.spark.read.parquet(self._path(name))

    def exists(self, name: str) -> bool:
        if self.use_iceberg:
            return self.spark.catalog.tableExists(name)
        p = self._path(name)
        return os.path.isdir(p) and any(
            f.endswith(".parquet") or f == "_SUCCESS" for f in os.listdir(p)
        )

    def append(self, df: DataFrame, name: str) -> None:
        if self.use_iceberg:
            df.writeTo(name).append()
        else:
            df.write.mode("append").parquet(self._path(name))

    def overwrite(self, df: DataFrame, name: str) -> None:
        if self.use_iceberg:
            df.writeTo(name).createOrReplace()
        else:
            df.write.mode("overwrite").parquet(self._path(name))

    def snapshot_fingerprint(self, name: str) -> str:
        """Stable id of current table contents, recorded in lineage rows.

        Iceberg: the snapshot id.  Parquet: mtime+size digest of the files.
        """
        if self.use_iceberg:
            row = (
                self.spark.sql(f"SELECT snapshot_id FROM {name}.snapshots "
                               "ORDER BY committed_at DESC LIMIT 1").collect()
            )
            return str(row[0][0]) if row else "empty"
        return path_fingerprint(self._path(name))


def path_fingerprint(path: str) -> str:
    """mtime+size digest of a parquet directory (lineage input_fp for a
    filesystem path).  Use this for raw ``--batch-input`` paths instead of
    routing them through ``TableIO.snapshot_fingerprint`` — a path is not a
    catalog table name, and joining it onto a warehouse root mangles
    relative paths (and, with Iceberg present, would issue
    ``<path>.snapshots`` SQL against a directory)."""
    import hashlib

    p = os.path.abspath(path)
    if not os.path.isdir(p):
        return "absent"
    h = hashlib.sha256()
    for f in sorted(os.listdir(p)):
        st = os.stat(os.path.join(p, f))
        h.update(f"{f}:{st.st_size}:{st.st_mtime_ns}".encode())
    return h.hexdigest()[:16]


TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def read_transcripts_jsonl(
    spark: SparkSession, path: str, quarantine: str | None = None
) -> DataFrame:
    """Ingest front door: JSONL -> the contract transcript schema
    (BASELINE.json input_hint: conv_id, turn_idx, role, text, tool, ts).

    text scan + ``from_json`` with an explicit schema: malformed lines
    parse to a NULL struct instead of failing the job (at 100 TB a
    crawler WILL emit broken lines; FAILFAST would burn hours then
    die).  Rows missing either key field (conv_id, turn_idx) count as
    bad too -- they cannot participate in stable turn ordering.  When
    ``quarantine`` is given, bad raw lines are appended there for
    offline triage -- NOTE this runs the quarantine pass EAGERLY at
    call time (one full scan), and consuming the returned clean frame
    scans again; callers that cannot afford two ingest scans should
    write the parsed frame once partitioned by a bad-row flag and read
    the clean partition back.  (Deliberately NOT the PERMISSIVE reader's
    ``_corrupt_record`` column: Spark disallows filtering on the
    internal corrupt column without caching the whole scan first --
    the text+from_json form keeps both branches streaming.)

    Timestamps parse as ISO-8601 (Spark's JSON default); column order
    is normalized so downstream unionByName never depends on producer
    field order.
    """
    from pyspark.sql import functions as F

    lines = spark.read.text(path)
    parsed = lines.select(
        "value", F.from_json("value", TRANSCRIPT_SCHEMA).alias("r")
    )
    bad = (
        F.col("r").isNull()
        | F.col("r.conv_id").isNull()
        | F.col("r.turn_idx").isNull()
    )
    if quarantine:
        parsed.where(bad).select("value").write.mode("append").text(quarantine)
    return parsed.where(~bad).select("r.conv_id", "r.turn_idx", "r.role", "r.text", "r.tool", "r.ts")


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 64,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist a relation bucketed (and optionally sorted) by its join
    key -- the 100 TB pattern for state that gets RE-JOINED every
    incremental batch (conv_state, the band-bucket index, old cluster
    labels): two tables bucketed by the same key into the same bucket
    count join with ZERO Exchange on either side (plan-asserted in
    tests/test_plan_quality.py), so each daily batch pays a shuffle of
    the BATCH only, never of the corpus.

    Parquet + ``bucketBy`` must go through ``saveAsTable`` (bucket
    metadata lives in the catalog, not the files); on a real cluster
    the catalog is the metastore, in this sandbox the in-memory session
    catalog.  Pick ``n_buckets`` so one bucket of the biggest table
    fits an executor core's working set (~shuffle-partition sizing);
    both sides of the co-located join MUST use the same count.
    """
    w = df.write.format("parquet").mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def spread_scan(df: DataFrame, *key_cols: str, min_factor: int = 1) -> DataFrame:
    """Repartition a LOW-PARALLELISM scan across the cluster before
    per-row-heavy compute (optimization guide section 2.5, input skew:
    an unsplittable/single-row-group input leaves every pre-shuffle
    operator -- n-gram explosion, turn splitting, window hashing -- on
    one core).  No-op when the scan already has enough partitions, so
    a real multi-file corpus pays nothing; keyed (hash) repartitioning
    keeps the row placement deterministic under task retries
    (SPARK-23207 note in the guide).  ``key_cols`` should be a
    high-cardinality key like the document id."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * min_factor
    try:
        current = df.rdd.getNumPartitions()
    except Exception:
        return df
    if current >= target:
        return df
    if key_cols:
        from pyspark.sql import functions as F

        return df.repartition(target, *[F.col(c) for c in key_cols])
    return df.repartition(target)
