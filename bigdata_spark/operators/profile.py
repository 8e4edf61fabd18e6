"""Data profiling + expectation checks — the data-quality surface a
warehouse pipeline runs before/after every load (dbt tests, Great
Expectations, Deequ).

``profile_columns``: one full-table pass (a single aggregate job —
Catalyst plans the multi-countDistinct via one Expand, so the table is
scanned once) producing per-column null/distinct/min/max stats in long
format.

``check_expectations``: declarative constraint list → one violation
count per rule. Each rule is its own aggregate over a filtered scan
(the predicates push down), and referential checks are left-anti
joins — the broadcast-able side is the primary-key table when the
dimension is small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Long-format profile: (column, n_rows, n_nulls, n_distinct,
    min_value, max_value) with min/max rendered as strings so every
    column type fits one schema. Distinct counts are EXACT (the
    approx_* sketch path lives in plans/scaleq.approx_sketches)."""
    aggs = [F.count("*").alias("_n")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__distinct"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)
    stacked = ", ".join(
        f"'{c}', {c}__nulls, {c}__distinct, {c}__min, {c}__max" for c in cols
    )
    return wide.select(
        F.col("_n").alias("n_rows"),
        F.expr(
            f"stack({len(cols)}, {stacked}) AS "
            "(column_name, n_nulls, n_distinct, min_value, max_value)"
        ),
    ).select(
        "column_name", "n_rows", "n_nulls", "n_distinct", "min_value", "max_value"
    )


def check_expectations(checks: dict[str, DataFrame]) -> DataFrame:
    """Union a dict of named violation DataFrames (each a 1-row count)
    into the (check_name, n_violations, passed) report."""
    out = None
    for name, c in sorted(checks.items()):
        row = c.select(
            F.lit(name).alias("check_name"),
            F.col("n_violations").cast("long"),
            (F.col("n_violations") == 0).alias("passed"),
        )
        out = row if out is None else out.unionByName(row)
    return out


def expect_unique(df: DataFrame, col: str) -> DataFrame:
    """Violations = duplicate-key row surplus (count − distinct)."""
    return df.agg(
        (F.count(col) - F.countDistinct(col)).alias("n_violations")
    )


def expect_not_null(df: DataFrame, col: str) -> DataFrame:
    return df.agg(F.sum(F.col(col).isNull().cast("long")).alias("n_violations"))


def expect_in_range(df: DataFrame, col: str, lo, hi) -> DataFrame:
    bad = ~F.col(col).between(lo, hi)
    return df.agg(
        F.sum(F.coalesce(bad, F.lit(False)).cast("long")).alias("n_violations")
    )


def expect_in_set(df: DataFrame, col: str, allowed: list) -> DataFrame:
    bad = ~F.col(col).isin(allowed)
    return df.agg(
        F.sum(F.coalesce(bad, F.lit(False)).cast("long")).alias("n_violations")
    )


def expect_references(fact: DataFrame, fk: str, dim: DataFrame, pk: str) -> DataFrame:
    """Orphaned-foreign-key rows via left-anti join on the key table."""
    return fact.join(
        dim.select(F.col(pk).alias(fk)).distinct(), fk, "left_anti"
    ).agg(F.count("*").alias("n_violations"))
