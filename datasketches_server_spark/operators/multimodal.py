"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video decode libraries are not in this container, so the
decode kernels are deterministic fakes behind ``DECODERS`` (clearly
marked); everything Spark-side is real and tested: schema, partition
strategy, Arrow batch shapes, and the mapInPandas operator signatures a
real decoder would drop into.

At 100 TB the design rules are: (1) binary payloads never enter a
shuffle -- feature extraction runs mapInPandas on the scan partitioning
and only small feature vectors/metadata flow on; (2) batch size is
bounded by bytes not rows (maxRecordsPerBatch + payload-size cap) so an
Arrow batch of 4K videos cannot OOM an executor.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)


def synth_media(spark: SparkSession, n: int = 256, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = seeded pseudo-bytes)."""
    df = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(3)).cast("int") + 1,
        ).alias("kind"),
        F.sha2(F.concat(F.lit(str(seed)), F.col("id").cast("string")), 256)
        .cast("binary")
        .alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(1920)) + 64).cast("int").alias("width"),
        (F.pmod(F.xxhash64("id", F.lit(2)), F.lit(1080)) + 64).cast("int").alias("height"),
        (F.pmod(F.xxhash64("id", F.lit(3)), F.lit(600000)) + 1000).cast("int").alias("duration_ms"),
    )
    return df


def media_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media table derived deterministically from the documents table
    (payload = utf-8 bytes of the text): gives the multimodal plumbing a
    driver-replayable input, so q29's aggregate features can be
    hash-checked by the DuckDB oracle (md5/octet_length over the same
    bytes)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            F.pmod(F.col("doc_id"), F.lit(3)).cast("int") + 1,
        ).alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        (F.pmod(F.col("doc_id") * 37, F.lit(1920)) + 64).cast("int").alias("width"),
        (F.pmod(F.col("doc_id") * 23, F.lit(1080)) + 64).cast("int").alias("height"),
        (F.pmod(F.col("doc_id") * 17, F.lit(600000)) + 1000).cast("int").alias("duration_ms"),
    )


def _fake_decode_features(payload: bytes, dim: int) -> np.ndarray:
    """STUB decoder: a real build replaces this with PIL/torchvision/
    ffmpeg.  Deterministic AND engine-portable: features are md5 bytes
    of the payload scaled to [0, 1] (feature[j] = md5[j]/255), extended
    by counter-salted md5 blocks for dim > 16 -- so tests, resume, and
    the DuckDB oracle all reproduce them."""
    data = payload or b""
    feats: list[float] = []
    counter = 0
    while len(feats) < dim:
        block = data if counter == 0 else data + b"#%d" % counter
        feats.extend(b / 255.0 for b in hashlib.md5(block).digest())
        counter += 1
    return np.asarray(feats[:dim], dtype=np.float32)


DECODERS: dict[str, Callable[[bytes, int], np.ndarray]] = {
    "image": _fake_decode_features,
    "audio": _fake_decode_features,
    "video": _fake_decode_features,
}

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def extract_features(media: DataFrame, dim: int = 64, max_payload_mb: int = 64) -> DataFrame:
    """mapInPandas feature extraction; payloads stay on the scan
    partitions, only (id, kind, feature[dim]) rows continue downstream."""
    cap = max_payload_mb * (1 << 20)

    def op(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats, nb = [], []
            for kind, payload in zip(pdf["kind"], pdf["payload"]):
                data = bytes(payload) if payload is not None else b""
                if len(data) > cap:
                    feats.append(None)
                    nb.append(len(data))
                    continue
                feats.append(DECODERS[kind](data, dim))
                nb.append(len(data))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": np.asarray(nb, dtype=np.int64),
                    "feature": feats,
                }
            )

    return media.mapInPandas(op, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: explode one row per planned frame
    timestamp (decode itself is the stubbed kernel).  Native explode --
    the 100 TB point is that frame plans shuffle as (id, ts) longs, not
    as decoded frames."""
    v = media.where(F.col("kind") == "video")
    return v.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
