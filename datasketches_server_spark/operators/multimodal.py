"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Decode is REAL for uncompressed public formats -- PPM/PGM, 24-bit BMP,
PCM16 WAV, and YUV4MPEG2 (C444) raw video parse in pure numpy
(`operators/codecs.py`), with real grayscale-thumbnail / windowed-RMS /
sampled-frame feature kernels.  Only compressed formats (JPEG/PNG/MP3/
MP4), whose codecs genuinely require external libraries absent from this
sandbox, fall back to the deterministic md5 stand-in (clearly marked).
Everything Spark-side is real and tested either way: schema, partition
strategy, Arrow batch shapes, and the mapInPandas operator signatures.

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


def synth_real_media(spark: SparkSession, n: int = 96, seed: int = 42) -> DataFrame:
    """Deterministic media table whose payloads are REAL encoded files:
    PPM/BMP images, PCM16 WAVs, and Y4M raw videos built in numpy from
    integer patterns of (seed, media_id) -- so the real decode path is
    exercised end-to-end with no external data.  Payloads are built
    inside mapInPandas on the range partitioning (never on the driver)."""
    from . import codecs

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid in pdf["id"]:
                mid = int(mid)
                k = (mid + seed) % 3
                if k == 0:  # image
                    h, w = 12 + mid % 11, 16 + mid % 17
                    i, j = np.mgrid[0:h, 0:w]
                    img = np.stack(
                        [(i * 7 + j * 13 + c * 29 + mid * 31) % 256 for c in range(3)],
                        axis=2,
                    ).astype(np.uint8)
                    if mid % 2 == 0:
                        payload, mime = codecs.encode_ppm(img), "image/x-portable-pixmap"
                    else:
                        payload, mime = codecs.encode_bmp(img), "image/bmp"
                    rows.append((mid, "image", payload, mime, w, h, None))
                elif k == 1:  # audio
                    ns = 800 + (mid % 5) * 160
                    t = np.arange(ns, dtype=np.int64)
                    samples = ((t * t * (mid % 7 + 3) * 97 + mid * 13) % 60001 - 30000).astype(
                        np.int16
                    )
                    payload = codecs.encode_wav(samples, rate=8000)
                    rows.append((mid, "audio", payload, "audio/wav", None, None, ns * 1000 // 8000))
                else:  # video
                    nf, h, w = 3 + mid % 3, 6, 8
                    f, i, j = np.mgrid[0:nf, 0:h, 0:w]
                    frames = np.stack(
                        [(f * 41 + i * 7 + j * 13 + c * 29 + mid * 31) % 256 for c in range(3)],
                        axis=3,
                    ).astype(np.uint8)
                    payload = codecs.encode_y4m(frames, fps=10)
                    rows.append((mid, "video", payload, "video/x-yuv4mpeg", w, h, nf * 100))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "kind", "payload", "mime", "width", "height", "duration_ms"],
            )

    return spark.range(n).mapInPandas(gen, MEDIA_SCHEMA)


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
    """STAND-IN for compressed formats only (JPEG/PNG/MP3/MP4 need codec
    libraries absent from this sandbox).  Deterministic AND
    engine-portable: features are md5 bytes of the payload scaled to
    [0, 1] (feature[j] = md5[j]/255), extended by counter-salted md5
    blocks for dim > 16 -- so tests, resume, and the DuckDB oracle all
    reproduce them."""
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

# Real decoders, dispatched by mime (see operators/codecs.py).  Anything
# not listed here -- i.e. the compressed formats -- uses the md5 stand-in
# keyed by `kind` above.
_REAL_IMAGE_MIMES = {
    "image/x-portable-pixmap": "ppm",
    "image/x-portable-graymap": "ppm",
    "image/bmp": "bmp",
}
_REAL_AUDIO_MIMES = {"audio/wav", "audio/x-wav"}
_REAL_VIDEO_MIMES = {"video/x-yuv4mpeg"}


def decode_features(kind: str, mime: str, payload: bytes, dim: int) -> np.ndarray:
    """Feature vector for one payload: REAL decode + real kernels for the
    uncompressed mimes, md5 stand-in otherwise."""
    from . import codecs

    if mime in _REAL_IMAGE_MIMES:
        fmt = _REAL_IMAGE_MIMES[mime]
        img = codecs.decode_ppm(payload) if fmt == "ppm" else codecs.decode_bmp(payload)
        return codecs.image_features(img, dim)
    if mime in _REAL_AUDIO_MIMES:
        samples, _rate = codecs.decode_wav(payload)
        return codecs.audio_features(samples, dim)
    if mime in _REAL_VIDEO_MIMES:
        return codecs.video_features(payload, dim)
    return DECODERS[kind](payload, dim)

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
            for kind, mime, payload in zip(pdf["kind"], pdf["mime"], pdf["payload"]):
                data = bytes(payload) if payload is not None else b""
                if len(data) > cap:
                    feats.append(None)
                    nb.append(len(data))
                    continue
                feats.append(decode_features(kind, mime or "", data, dim))
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
