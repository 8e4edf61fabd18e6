"""Time-series resampling with gap-fill interpolation — the
hypertable-rollup pattern (TimescaleDB's time_bucket_gapfill /
interpolate, re-expressed as native Spark dataflow).

Pipeline per series key:
  bucket   — date_trunc the event time to the grid,
  rollup   — one hash aggregation to a per-bucket value (the mean,
             accumulated in fixed-point so the result is bit-stable
             under Spark's nondeterministic float-sum ordering),
  grid     — explode sequence(min_bucket, max_bucket, interval): every
             bucket exists even where no events landed,
  fill     — two windows carry the nearest observed (bucket, value)
             backward and forward; empty buckets linearly interpolate
             between them (edges clamp to the nearest observation).

Scale notes: the rollup is a partial-aggregated shuffle on
(key, bucket); the fill windows partition by the series key only, so
parallelism equals the number of series — the right shape for wide
key spaces (sensors, users, symbols). For few-series/very-long
histories, pre-split the key into coarse time chunks and stitch the
chunk boundaries (one extra observed row per side); not needed here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# fixed-point scale for the bit-stable mean: floor(value * 1e6) sums
# exactly in int64 (same floor semantics in Spark and DuckDB, unlike
# double->int casts, which truncate in Spark but round in DuckDB)
_FP = 1_000_000


def _fp_mean(value: Column) -> Column:
    """Order-independent mean: exact int64 sum of floor(value*1e6),
    divided once at the end — no float accumulation order anywhere."""
    return (
        F.sum(F.floor(value * _FP)).cast("double") / _FP / F.count(value)
    )


def resample_gapfill(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    interval: str = "1 hour",
    trunc_unit: str = "hour",
) -> DataFrame:
    """Resample to a fixed grid per key and linearly interpolate empty
    buckets. Returns (keys..., bucket, value_interp, observed)."""
    bucket = F.date_trunc(trunc_unit, F.col(ts_col))
    agg = df.groupBy(*key_cols, bucket.alias("bucket")).agg(
        _fp_mean(F.col(value_col)).alias("v")
    )
    span = agg.groupBy(*key_cols).agg(
        F.min("bucket").alias("lo"), F.max("bucket").alias("hi")
    )
    grid = span.select(
        *key_cols,
        F.explode(
            F.sequence(F.col("lo"), F.col("hi"), F.expr(f"INTERVAL {interval}"))
        ).alias("bucket"),
    )
    joined = grid.join(agg, [*key_cols, "bucket"], "left")

    w_prev = (
        Window.partitionBy(*key_cols)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_next = (
        Window.partitionBy(*key_cols)
        .orderBy("bucket")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    obs = F.when(
        F.col("v").isNotNull(),
        F.struct(F.col("bucket").alias("b"), F.col("v").alias("val")),
    )
    prev = F.last(obs, ignorenulls=True).over(w_prev)
    nxt = F.first(obs, ignorenulls=True).over(w_next)
    t = F.unix_timestamp("bucket").cast("double")
    tp = F.unix_timestamp(prev["b"]).cast("double")
    tn = F.unix_timestamp(nxt["b"]).cast("double")
    interp = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(prev.isNull(), nxt["val"])
        .when(nxt.isNull(), prev["val"])
        .otherwise(
            prev["val"] + (nxt["val"] - prev["val"]) * (t - tp) / (tn - tp)
        )
    )
    return joined.select(
        *key_cols,
        "bucket",
        interp.alias("value_interp"),
        F.col("v").isNotNull().alias("observed"),
    )
