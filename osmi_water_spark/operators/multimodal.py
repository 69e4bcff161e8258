"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed through ``mapInPandas``.

The Spark-side plumbing (schemas, batch shape, partition behavior) is
real and tested; the actual codec work is STUBBED — image/audio libraries
are not in this container — behind ``decode_stub`` (NotImplementedError)
and ``fake_features`` (deterministic hash-derived vectors standing in for
a real feature extractor, so downstream operators can be exercised).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("codec", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURES_SCHEMA = "media_id long, media_type string, n_bytes long, features array<float>"


def decode_stub(media: DataFrame) -> DataFrame:
    """Real decode path — requires codec libraries not present here."""
    raise NotImplementedError(
        "media decode requires PIL/ffmpeg (not in this container); "
        "use fake_features() for pipeline plumbing"
    )


def _fake_vector(payload: bytes, dim: int = 16) -> np.ndarray:
    """Deterministic stand-in feature vector: blake2b(payload) -> floats."""
    d = hashlib.blake2b(payload or b"", digest_size=dim * 4).digest()
    a = np.frombuffer(d, dtype=np.uint32).astype(np.float64)
    return (a / 2**32).astype(np.float32)


def fake_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """The feature-extraction stage with the codec swapped for a
    deterministic fake — batch shape and schema identical to the real one."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else 0),
                    "features": pdf["payload"].map(lambda b: _fake_vector(b, dim).tolist()),
                }
            )

    return media.select("media_id", "media_type", "payload").mapInPandas(
        batches, FEATURES_SCHEMA
    )


BYTE_FEATURES_SCHEMA = (
    "media_id long, media_type string, n_bytes long, "
    "entropy double, mean_byte double, frac_printable double"
)


def byte_features(media: DataFrame) -> DataFrame:
    """REAL (not stubbed) codec-free feature extraction over the raw
    payload bytes: Shannon entropy, mean byte value, printable-ASCII
    fraction. This is the feature path that needs no image/audio library —
    useful as-is for corrupt-file detection, format fingerprinting, and
    compression-ratio proxies in a training-data pipeline. Per *feature*
    Python, per *byte* numpy (bincount/histogram), Arrow-batched."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, types, nb, ent, mean, prn = [], [], [], [], [], []
            for mid, mtype, payload in zip(
                pdf["media_id"], pdf["media_type"], pdf["payload"]
            ):
                b = (
                    np.frombuffer(bytes(payload), dtype=np.uint8)
                    if payload is not None and len(payload)
                    else np.zeros(0, dtype=np.uint8)
                )
                n = int(b.size)
                if n:
                    h = np.bincount(b, minlength=256).astype(np.float64)
                    p = h[h > 0] / n
                    e = float(-(p * np.log2(p)).sum())
                    m = float(b.mean())
                    fp = float(((b >= 32) & (b < 127)).mean())
                else:
                    e = m = fp = 0.0
                ids.append(mid); types.append(mtype); nb.append(n)
                ent.append(e); mean.append(m); prn.append(fp)
            yield pd.DataFrame(
                {"media_id": ids, "media_type": types, "n_bytes": nb,
                 "entropy": ent, "mean_byte": mean, "frac_printable": prn}
            )

    return media.select("media_id", "media_type", "payload").mapInPandas(
        batches, BYTE_FEATURES_SCHEMA
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: one output row per planned frame
    (the decode itself is the stubbed part). Demonstrates the explode
    shape — bounded fan-out duration/every_ms per video."""
    n_frames = F.greatest(
        F.lit(1), (F.col("meta.duration_ms") / every_ms).cast("int")
    )
    return (
        media.filter(F.col("media_type") == "video")
        .select("media_id", F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"))
        .withColumn("ts_ms", F.col("frame_idx") * every_ms)
    )


def synth_media(spark, n: int = 100) -> DataFrame:
    """Deterministic synthetic media table for tests."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        payload = hashlib.blake2b(str(i).encode(), digest_size=32).digest() * (i % 5 + 1)
        meta = (64 + i % 512, 48 + i % 256, 1000 * (i % 30 + 1), "fake")
        rows.append((i, kind, bytearray(payload), meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
