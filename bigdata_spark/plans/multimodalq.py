"""Multimodal-column queries (driver brief). The media table is a
deterministic synthetic (no binary fixtures in the testdata), so these
are rows-only checks — the plumbing itself is pinned by
tests/test_multimodal.py."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..multimodal.media import (
    decode_image_features,
    frame_sample_plan,
    media_metadata,
    synthetic_media_df,
)


def mm_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = synthetic_media_df(spark, n=64)
    return media_metadata(media).groupBy("kind").agg(
        F.count("*").alias("n"),
        F.sum("payload_bytes").alias("total_bytes"),
    )


def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = synthetic_media_df(spark, n=64)
    feats = decode_image_features(media, n_features=8)
    return feats.select(
        "media_id", F.round(F.aggregate("features", F.lit(0.0), lambda a, x: a + x), 9).alias("feat_sum")
    )


def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = synthetic_media_df(spark, n=64)
    return frame_sample_plan(media, every_ms=500).groupBy("media_id").agg(
        F.count("*").alias("n_frames"), F.max("frame_ts_ms").alias("last_ts_ms")
    )


QUERIES = {
    "mm_metadata": (mm_metadata, None),
    "mm_decode_features": (mm_decode_features, None),
    "mm_frame_sample": (mm_frame_sample, None),
}
