"""Small-file compaction — the data-lake maintenance op every 100 TB
pipeline needs: streaming ingest and fine-grained partitioning leave
thousands of KB-sized parquet files whose per-file open/footer cost
dominates scans; compaction rewrites them into ~target-sized files.

Strategy: estimate bytes/row from the source footprint, compute the
file count that hits ``target_file_bytes``, and rewrite through a
round-robin ``repartition(n)`` (even output sizes regardless of input
skew). The estimate is metadata + one count — no data collect."""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def parquet_file_count(path: str) -> int:
    n = 0
    for _root, _dirs, files in os.walk(path):
        n += sum(1 for f in files if f.endswith(".parquet"))
    return n


def compact_parquet(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Rewrite the parquet dataset at ``src_path`` into ``dst_path``
    with files sized ~``target_file_bytes``. Returns the output file
    count. Compression ratios survive the rewrite (same codec family),
    so sizing on the source's on-disk bytes is the right estimate."""
    df = spark.read.parquet(src_path)
    src_bytes = _dir_bytes(src_path)
    n_files = max(1, math.ceil(src_bytes / target_file_bytes))
    df.repartition(n_files).write.mode("overwrite").parquet(dst_path)
    return parquet_file_count(dst_path)


def read_merged_schema(spark: SparkSession, *paths: str) -> DataFrame:
    """Schema-evolution read: union parquet datasets whose schemas
    drifted (added columns), with missing columns null-filled —
    ``mergeSchema`` resolves the superset schema at planning time."""
    return spark.read.option("mergeSchema", "true").parquet(*paths)
