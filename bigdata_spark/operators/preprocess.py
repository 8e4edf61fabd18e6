"""Preprocessing operators (SURVEY §2.3 F1/F2, §2.7 O2/O3, §2.6 W1).

Reference semantics: drop all-null rows, global min-max normalization
with constant columns mapped to 0.0, and balanced label-stratified
repartitioning (reference code/src/preprocessing.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def drop_all_null_rows(df: DataFrame) -> DataFrame:
    """F1 — drop rows where every column is null (reference preprocessing.py:24-26)."""
    return df.dropna(how="all")


def min_max_stats(df: DataFrame, cols: list[str]) -> dict[str, tuple[float, float]]:
    """A1 — one-pass multi-column min/max aggregate (reference utilities.py:78-95).

    A single ``agg`` of 2·N expressions → one job, one row to the driver,
    regardless of table size.
    """
    exprs = []
    for c in cols:
        exprs.append(F.min(c).alias(f"min_{c}"))
        exprs.append(F.max(c).alias(f"max_{c}"))
    row = df.agg(*exprs).first()
    return {c: (row[f"min_{c}"], row[f"max_{c}"]) for c in cols}


def min_max_normalize(
    df: DataFrame, cols: list[str], stats: dict[str, tuple[float, float]] | None = None
) -> DataFrame:
    """F2 — project each column to (x-min)/(max-min); constant column → 0.0
    (reference preprocessing.py:29-48).

    Min/max are baked in as literals so Catalyst constant-folds the
    arithmetic into the scan projection — no second aggregate at plan
    time, stays in whole-stage codegen.
    """
    if stats is None:
        stats = min_max_stats(df, cols)
    out = []
    for c in df.columns:
        if c in stats:
            lo, hi = stats[c]
            if lo is None or hi is None or hi == lo:
                out.append(F.lit(0.0).alias(c))
            else:
                out.append(((F.col(c) - F.lit(lo)) / F.lit(hi - lo)).alias(c))
        else:
            out.append(F.col(c))
    return df.select(*out)


def balanced_stratified_repartition(
    df: DataFrame,
    label_col: str,
    num_partitions: int,
    seed: int = 42,
    keep_partition_col: bool = False,
) -> DataFrame:
    """W1+O3 — force exactly ``num_partitions`` balanced, label-stratified
    partitions (reference preprocessing.py:57-86).

    Per-label row_number over a seeded content-hash order, then
    ``(rn-1) % n`` spreads each class round-robin across partitions;
    hash-repartition on the computed id materializes the placement.
    Skew-safe: the modulo distributes any label skew evenly by
    construction. The order key hashes row CONTENT (not
    partition-seeded rand) so the assignment is identical on any
    cluster layout or retry.

    The per-label rank is operators/ranking.grouped_range_rank, NOT a
    ``Window.partitionBy(label)`` — with a handful of labels over an
    SF-grown input, a label-partitioned window sorts 1/|labels| of the
    data in ONE task at any scale; the range-partitioned two-pass rank
    keeps parallelism at #partitions. Costs three shuffles (range
    exchange, offset agg, placement repartition) — the documented
    price of partition-quality-sensitive local models (SURVEY §7
    hard-point 4).
    """
    from .ranking import grouped_range_rank

    hashed = df.withColumn(
        "_ord", F.xxhash64(F.lit(seed), *[F.col(c) for c in df.columns])
    )
    with_pid = (
        grouped_range_rank(hashed, [label_col], ["_ord"], "_rn")
        .withColumn(
            "_partition_id",
            ((F.col("_rn") - F.lit(1)) % F.lit(num_partitions)).cast("int"),
        )
        .drop("_ord", "_rn")
    )
    out = with_pid.repartition(num_partitions, F.col("_partition_id"))
    if not keep_partition_col:
        out = out.drop("_partition_id")
    return out
