"""Distributed global ranking — two-pass range-partitioned row_number.

A bare ``row_number().over(Window.orderBy(...))`` plans as
``Exchange SinglePartition`` + one task sorting the ENTIRE input: fine
on a 500-row domain table, fatal on a data-sized one. The scalable
shape is the classic two-pass rank every MPP engine uses:

1. ``repartitionByRange`` on the order key (sampled boundaries), sort
   and rank WITHIN each range partition (parallelism = #partitions);
2. aggregate the per-partition row counts — a #partitions-grain table —
   compute exclusive prefix offsets on that tiny table, and broadcast
   them back; global rank = local rank + partition offset.

The per-partition ranked pass is eagerly ``localCheckpoint``-ed so the
count pass and the output pass read the SAME materialized partitioning
(range boundaries come from sampling; recomputing the exchange twice
could re-sample).

Reference parity: the reference engine has no distributed ranker (its
sorts are single-node); this is the Spark-first scale shape required
by SURVEY.md §6's partitioning discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def range_rank(
    df: DataFrame,
    order_cols: list[str],
    rank_col: str = "r",
    num_partitions: int | None = None,
) -> DataFrame:
    """Total-order row_number over ``order_cols`` (must be a total key)
    without a single-partition window. Returns ``df`` plus ``rank_col``
    (1-based, dense in the row_number sense). The only data-sized
    movements are one range exchange and per-partition sorts; the
    offset table is #partitions-grain (bounded), hence broadcast."""
    parts = (
        df.repartitionByRange(num_partitions, *order_cols)
        if num_partitions
        else df.repartitionByRange(*order_cols)
    )
    w_local = Window.partitionBy("_pid").orderBy(*order_cols)
    ranked_local = (
        parts.withColumn("_pid", F.spark_partition_id())
        .withColumn("_lr", F.row_number().over(w_local))
        .localCheckpoint()
    )
    w_off = (
        Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        ranked_local.groupBy("_pid")
        .agg(F.count("*").alias("_c"))
        .select(
            "_pid",
            F.coalesce(F.sum("_c").over(w_off), F.lit(0)).alias("_off"),
        )
    )
    return (
        ranked_local.join(F.broadcast(offsets), "_pid")
        .withColumn(rank_col, (F.col("_lr") + F.col("_off")).cast("long"))
        .drop("_pid", "_lr", "_off")
    )
