"""Slowly-changing-dimension Type-2 build from a change stream.

The standard warehouse operator: given per-key timestamped attribute
observations, emit one row per *attribute run* with its validity
interval — (key, attr, valid_from, valid_to, is_current), where
valid_to is the next run's valid_from (NULL while current).

Plan shape: two analytic windows over the SAME (key) partitioning and
(ts, tiebreak) ordering — Catalyst evaluates both in ONE Window
operator after one shuffle+sort per key, so the whole build is a
single exchange regardless of history depth. Ties on ts are broken by
an explicit unique column, making run boundaries deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_from_changes(
    df: DataFrame,
    key_cols: list[str],
    attr_col: str,
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Collapse consecutive equal attribute values per key into SCD2
    validity intervals."""
    w = Window.partitionBy(*key_cols).orderBy(ts_col, tiebreak_col)
    changes = (
        df.select(*key_cols, attr_col, ts_col, tiebreak_col)
        .withColumn("_prev", F.lag(attr_col).over(w))
        .filter(
            F.col("_prev").isNull() | (F.col(attr_col) != F.col("_prev"))
        )
        .drop("_prev")
    )
    # run boundaries only survive, so lead(ts) over the same window IS
    # the next version's start
    w2 = Window.partitionBy(*key_cols).orderBy(ts_col, tiebreak_col)
    return (
        changes.withColumn("valid_to", F.lead(ts_col).over(w2))
        .withColumn("is_current", F.col("valid_to").isNull())
        .withColumnRenamed(ts_col, "valid_from")
        .drop(tiebreak_col)
    )
