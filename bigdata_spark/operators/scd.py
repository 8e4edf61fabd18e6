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
    # _prev_seen (lag of a literal) is NULL only on the first row per
    # key; boundary detection must be null-SAFE on the attribute —
    # a plain != yields NULL when the attr transitions to/from NULL and
    # the filter would silently merge NULL-valued runs into the
    # preceding run.
    changes = (
        df.select(*key_cols, attr_col, ts_col, tiebreak_col)
        .withColumn("_prev", F.lag(attr_col).over(w))
        .withColumn("_prev_seen", F.lag(F.lit(True)).over(w))
        .filter(
            F.col("_prev_seen").isNull()
            | ~F.col(attr_col).eqNullSafe(F.col("_prev"))
        )
        .drop("_prev", "_prev_seen")
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
