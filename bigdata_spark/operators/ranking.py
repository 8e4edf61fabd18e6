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
    """Total-order row_number over ``order_cols`` without a
    single-partition window. Returns ``df`` plus ``rank_col`` (1-based,
    dense in the row_number sense). The only data-sized movements are
    one range exchange and per-partition sorts; the offset table is
    #partitions-grain (bounded), hence broadcast.

    ``order_cols`` MUST be a total key for reproducible output: the
    range boundaries come from sampling, so with duplicate full keys
    the assignment of ranks among tied rows is valid but
    NON-DETERMINISTIC across reruns (a boundary may split the tie
    group differently). Callers that need hash-stable results append a
    unique tiebreaker — the dedup_sorted_neighborhood pattern of
    ending the key with ``doc_id``. (The pre-checkpoint lineage is
    nondeterministic for the same reason; the eager localCheckpoint
    pins ONE consistent permutation for both passes.)"""
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


def range_ntile(
    df: DataFrame,
    order_cols: list[str],
    k: int,
    out_col: str = "bucket",
    num_partitions: int | None = None,
) -> DataFrame:
    """NTILE(k) over a global order WITHOUT a single-partition window —
    bit-identical to ``F.ntile(k).over(Window.orderBy(*order_cols))``
    (and ANSI NTILE) on a total key: with n rows, the first ``n % k``
    buckets take ``n div k + 1`` rows, the rest ``n div k``. The global
    rank comes from :func:`range_rank` (range exchange + broadcast
    offsets); the row count is a one-row aggregate broadcast back; the
    bucket index is pure integer arithmetic on (rank, n, k) — no
    Exchange SinglePartition anywhere. ``order_cols`` must be a total
    key (see range_rank) or bucket assignment of tied rows is
    nondeterministic. Descending dimensions: negate the column before
    calling (exact for integers)."""
    ranked = range_rank(df, order_cols, "_gr", num_partitions)
    tot = ranked.agg(F.count("*").alias("_n"))
    # q = n div k, rem = n mod k; rank r lands in bucket
    #   (r + q) div (q + 1)                      if r <= rem·(q+1)
    #   rem + ceil((r − rem·(q+1)) / q)          otherwise
    # (q = 0 ⇒ n < k ⇒ the first branch covers every row: bucket = r)
    bucket = F.expr(
        f"IF(_gr <= (_n % {k}) * (_n div {k} + 1),"
        f" (_gr + _n div {k}) div (_n div {k} + 1),"
        f" _n % {k} + (_gr - (_n % {k}) * (_n div {k} + 1)"
        f"  + greatest(_n div {k}, 1) - 1) div greatest(_n div {k}, 1))"
    )
    return (
        ranked.join(F.broadcast(tot))
        .withColumn(out_col, bucket.cast("int"))
        .drop("_gr", "_n")
    )


def range_cumsum(
    df: DataFrame,
    order_cols: list[str],
    sum_col: str,
    out_col: str = "cum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Global running sum of ``sum_col`` in ``order_cols`` order (rows
    from the first row through the current one) without a
    single-partition window — the two-pass shape of range_rank with
    SUM in place of row_number: per-range-partition running sums, then
    broadcast exclusive prefix totals of the per-partition sums.
    ``order_cols`` must be a total key for a deterministic prefix (the
    sum type is whatever Spark's SUM yields on ``sum_col`` — exact for
    integer/decimal inputs)."""
    parts = (
        df.repartitionByRange(num_partitions, *order_cols)
        if num_partitions
        else df.repartitionByRange(*order_cols)
    )
    w_local = (
        Window.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = (
        parts.withColumn("_pid", F.spark_partition_id())
        .withColumn("_lc", F.sum(sum_col).over(w_local))
        .localCheckpoint()
    )
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        local.groupBy("_pid")
        .agg(F.sum(sum_col).alias("_s"))
        .select(
            "_pid",
            F.coalesce(F.sum("_s").over(w_off), F.lit(0)).alias("_off"),
        )
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, F.col("_lc") + F.col("_off"))
        .drop("_pid", "_lc", "_off")
    )
