"""Exact deduplication: hash-groupBy on normalized content.

Scale shape: md5 the normalized text in the scan projection (map-side),
groupBy the 128-bit digest — the shuffle moves (digest, id) pairs, not
document bodies. At 100 TB this is the cheapest possible exact dedup:
one shuffle of ~40 bytes/row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _content_key(text_col: str) -> F.Column:
    return F.md5(F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " "))


def exact_dup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Groups of exact duplicates: (content_key, n_dups, doc_ids)."""
    return (
        df.select(_content_key(text_col).alias("content_key"), F.col(id_col))
        .groupBy("content_key")
        .agg(
            F.count("*").alias("n_dups"),
            F.sort_array(F.collect_list(id_col)).alias("doc_ids"),
        )
        .filter(F.col("n_dups") > 1)
    )


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one representative per content key (the lowest id —
    deterministic). Window-free plan: min-id per key then semi join,
    both shuffles on the compact digest key."""
    w = Window.partitionBy(_content_key(text_col)).orderBy(F.col(id_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
