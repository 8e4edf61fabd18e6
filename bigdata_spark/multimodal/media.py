"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed struct metadata (driver brief, SURVEY §2.9).

The Spark-side plumbing — schema, partitioning, Arrow batch shapes,
mapInPandas signatures — is real and tested. The actual codec step is
STUBBED: this container has no image/audio libraries, so decode is a
deterministic fake (derived from the payload bytes) behind
``_decode_stub``, and the real-codec path raises NotImplementedError
with a clear marker. Swapping in PIL/torchaudio/ffmpeg is a one-
function change that does not touch any distributed plumbing.

Scale notes:
- payloads stay in executors end-to-end (no collect; feature columns
  are small projections of big binaries, so always select features out
  and drop the payload before any shuffle),
- mapInPandas streams Arrow record batches → constant memory per task
  regardless of file count,
- `spark.sql.files.maxPartitionBytes` (session.py) sizes binary scans.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Canonical multimodal row: opaque payload + typed metadata struct.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("payload", BinaryType(), True),
        StructField(
            "meta",
            StructType(
                [
                    StructField("kind", StringType(), True),  # image|audio|video
                    StructField("format", StringType(), True),  # png|wav|mp4|...
                    StructField("width", IntegerType(), True),
                    StructField("height", IntegerType(), True),
                    StructField("duration_ms", LongType(), True),
                    StructField("sample_rate", IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

REAL_CODECS_AVAILABLE = False  # flip when PIL/torchaudio/ffmpeg are installed


def _decode_stub(payload: bytes, n_features: int = 8) -> np.ndarray:
    """Deterministic fake decode: md5-seeded feature vector. Stands in
    for pixel/spectrogram statistics so the distributed plumbing (batch
    shapes, schemas, dtypes) is exercised honestly."""
    if payload is None:
        return np.zeros(n_features)
    h = hashlib.md5(payload).digest()
    return np.frombuffer(h[: n_features * 2], dtype=np.uint8)[:n_features].astype(np.float64) / 255.0


def _decode_real(payload: bytes, meta: dict) -> np.ndarray:
    raise NotImplementedError(
        "STUB: real image/audio decode needs PIL/torchaudio, not present "
        "in this container. Wire it here; the Spark plumbing is complete."
    )


def media_metadata(df: DataFrame) -> DataFrame:
    """Cheap metadata projection — never touches the payload bytes
    (column pruning drops the binary at the scan)."""
    return df.select(
        "media_id",
        F.col("meta.kind").alias("kind"),
        F.col("meta.format").alias("format"),
        F.length("payload").alias("payload_bytes"),
        (F.col("meta.width") * F.col("meta.height")).alias("pixels"),
    )


def decode_image_features(df: DataFrame, n_features: int = 8) -> DataFrame:
    """payload → feature vector via mapInPandas (Arrow-batched).

    Output: (media_id, features array<double>) — the payload is dropped
    before anything downstream can shuffle it.
    """
    out_schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("features", ArrayType(DoubleType()), True),
        ]
    )

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_stub(p, n_features).tolist() if p is not None else None
                for p in pdf["payload"]
            ]
            yield pd.DataFrame({"media_id": pdf["media_id"], "features": feats})

    return df.select("media_id", "payload").mapInPandas(decode_batches, out_schema)


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: passes payloads through the stub transform and
    rewrites the meta struct with the new dimensions. Real resize drops
    into ``_transform``."""

    def _transform(payload: bytes) -> bytes:
        # STUB: identity transform; real path would re-encode pixels.
        return payload

    out_schema = MEDIA_SCHEMA

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["payload"] = [None if p is None else _transform(p) for p in pdf["payload"]]
            pdf["meta"] = [
                None
                if m is None
                else {**m, "width": width, "height": height}
                for m in pdf["meta"]
            ]
            yield pdf

    return df.mapInPandas(resize_batches, out_schema)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling plan: one row per sampled timestamp (the
    decode of each frame is the stubbed step). Explodes a sequence — no
    Python in the expansion, only in the (stubbed) per-frame decode."""
    n_frames = (F.col("meta.duration_ms") / every_ms).cast("int")
    return (
        df.filter(F.col("meta.kind") == "video")
        .select(
            "media_id",
            F.explode(F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))).alias("frame_ix"),
        )
        .withColumn("frame_ts_ms", F.col("frame_ix") * every_ms)
    )


def synthetic_media_df(spark, n: int = 64) -> DataFrame:
    """Deterministic synthetic media table for tests/queries (no binary
    fixtures ship with the testdata)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.sha256(str(i).encode()).digest() * 4  # 128 opaque bytes
        rows.append(
            (
                i,
                bytearray(payload),
                {
                    "kind": kind,
                    "format": {"image": "png", "audio": "wav", "video": "mp4"}[kind],
                    "width": 64 + (i % 4) * 32 if kind == "image" else None,
                    "height": 64 + (i % 3) * 32 if kind == "image" else None,
                    "duration_ms": 1000 * (1 + i % 5) if kind != "image" else None,
                    "sample_rate": 16000 if kind == "audio" else None,
                },
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
