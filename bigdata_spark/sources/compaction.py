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

from pyspark.sql import DataFrame, SparkSession


def _dataset_bytes(spark: SparkSession, path: str) -> int:
    """On-disk bytes of a dataset via Hadoop's FileSystem API — resolves
    any URI scheme Spark can read (file://, hdfs://, s3a://), unlike an
    os.walk that silently returns 0 off the local filesystem."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs.getContentSummary(jpath).getLength()


def parquet_file_count(spark: SparkSession, path: str) -> int:
    """Data-file count of a parquet dataset, from Spark's own file
    listing (URI-scheme-agnostic; excludes _SUCCESS/metadata files)."""
    return len(spark.read.parquet(path).inputFiles())


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
    src_bytes = _dataset_bytes(spark, src_path)
    if src_bytes <= 0:
        # a mistyped path or an empty dataset would degenerate to one
        # giant output file with no error — fail loudly instead
        raise ValueError(f"source dataset at {src_path!r} has 0 bytes")
    n_files = max(1, math.ceil(src_bytes / target_file_bytes))
    df.repartition(n_files).write.mode("overwrite").parquet(dst_path)
    return parquet_file_count(spark, dst_path)


def read_merged_schema(spark: SparkSession, *paths: str) -> DataFrame:
    """Schema-evolution read: union parquet datasets whose schemas
    drifted (added columns), with missing columns null-filled —
    ``mergeSchema`` resolves the superset schema at planning time."""
    return spark.read.option("mergeSchema", "true").parquet(*paths)
