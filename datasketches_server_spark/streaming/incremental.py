"""Structured Streaming tier: continuous sketch-metric ingestion.

The reference is conceptually a streaming aggregator -- unbounded
/update stream, queryable state (README.md:159-166) -- with no event
time or windows.  Here the same capability is Structured Streaming over
event-time windows: sketch aggregates ARE Spark aggregate functions, so
they run under watermarks with partial/final aggregation like any agg.

Two modes:

* :func:`windowed_sketch_stream` -- watermarked tumbling-window sketch
  aggregation (theta distincts + counts per window x key).
* :func:`append_metrics_foreachBatch` -- the accumulator pattern
  (README.md:377-379): each micro-batch appends per-batch sketch rows to
  a metrics table; readers merge at query time with ``*_union_agg``.
  Exactly the reference's update -> merge -> query loop, minus the server.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import SketchConfig


def windowed_sketch_stream(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    item_col: str = "user_id",
    value_col: str = "value",
    window: str = "1 hour",
    watermark: str = "2 hours",
    cfg: SketchConfig = SketchConfig(),
) -> DataFrame:
    """Streaming DF in -> windowed sketch metrics out (append mode)."""
    # watermarks need session-TZ TIMESTAMP; parquet often yields TIMESTAMP_NTZ
    events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("win"), key_col)
        .agg(
            F.theta_sketch_agg(item_col, cfg.theta_lg_k).alias("theta_items"),
            F.kll_sketch_agg_float(F.col(value_col).cast("float"), cfg.kll_k).alias("kll_value"),
            F.count("*").alias("n_events"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            key_col,
            "theta_items",
            "kll_value",
            "n_events",
        )
    )


def append_metrics_foreachBatch(
    stream: DataFrame,
    out_path: str,
    key_col: str = "event_type",
    item_col: str = "user_id",
    cfg: SketchConfig = SketchConfig(),
):
    """writeStream.foreachBatch sink: per-batch partial sketches appended
    to a parquet/Iceberg metrics table.  Mergeability makes the append
    log queryable at any time: estimate = theta_union_agg over all rows."""

    def _sink(batch: DataFrame, epoch_id: int) -> None:
        (
            batch.groupBy(key_col)
            .agg(
                F.theta_sketch_agg(item_col, cfg.theta_lg_k).alias("theta_items"),
                F.count("*").alias("n_events"),
            )
            .withColumn("epoch_id", F.lit(epoch_id))
            .write.mode("append")
            .parquet(out_path)
        )

    return stream.writeStream.foreachBatch(_sink)


def merged_view(spark: SparkSession, metrics_path: str, key_col: str = "event_type",
                cfg: SketchConfig = SketchConfig()) -> DataFrame:
    """Query the append log: merge partial sketches per key (the /query
    endpoint over accumulated /update batches)."""
    m = spark.read.parquet(metrics_path)
    return m.groupBy(key_col).agg(
        F.theta_sketch_estimate(F.theta_union_agg("theta_items", cfg.theta_lg_k)).alias("distinct_items"),
        F.sum("n_events").alias("n_events"),
    )
