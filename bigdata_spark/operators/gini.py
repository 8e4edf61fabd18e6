"""Weighted-Gini aggregation pipeline (SURVEY §2.5 A5; reference
code/src/global_model_manager.py:286-295).

Pure DataFrame dataflow: per-(branch,label) counts → per-branch totals →
sum of squared class probabilities → per-branch Gini → branch-weighted
global Gini. One scalar out; two shuffles in (groupBy counts + groupBy
sums), both with map-side partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def weighted_gini_df(df: DataFrame, branch_col: str, label_col: str) -> DataFrame:
    """Per-branch Gini impurity + weight, as a DataFrame (for inspection)."""
    counts = df.groupBy(branch_col, label_col).agg(F.count("*").alias("cnt"))
    totals = counts.groupBy(branch_col).agg(F.sum("cnt").alias("branch_total"))
    probs = counts.join(totals, branch_col).withColumn(
        "prob_sq", (F.col("cnt") / F.col("branch_total")) ** 2
    )
    return probs.groupBy(branch_col, "branch_total").agg(
        (F.lit(1.0) - F.sum("prob_sq")).alias("gini")
    )


def weighted_gini(df: DataFrame, branch_col: str, label_col: str) -> float:
    """Scalar weighted Gini over branches: Σ_b (n_b/n) · (1 − Σ_c p_bc²)."""
    per_branch = weighted_gini_df(df, branch_col, label_col)
    row = per_branch.agg(
        (
            F.sum(F.col("branch_total") * F.col("gini")) / F.sum("branch_total")
        ).alias("weighted_gini")
    ).first()
    return float(row["weighted_gini"])
