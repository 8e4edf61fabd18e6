"""Parallelism guard for compute-heavy per-row operators.

A small parquet file scans as ONE partition, serializing expensive
per-row work (shingling, hashing, decoding) onto a single core. At
corpus scale the scan has thousands of splits and this is a no-op; on
small inputs it round-robins rows across the cluster first. The check
is plan-time-cheap (no job is triggered)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(
    df: DataFrame, min_partitions: int | None = None, force: bool = False
) -> DataFrame:
    """``force=True`` always inserts the exchange — used as a projection-
    collapse barrier so an expensive upstream projection is computed
    once instead of being inlined into every downstream expression."""
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    if force or df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
