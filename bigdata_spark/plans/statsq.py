"""Distributed statistics queries: grouped simple + multivariate OLS
regression, a one-pass correlation matrix, Welch two-sample A/B
analysis, and a chi-squared independence test.

All of them reduce to *exact sufficient statistics* — DECIMAL sums of the
2-decimal source columns and their pairwise products (products of
DECIMAL(18,2) are exact DECIMAL(·,4); sums of those are exact and
order-independent) — followed by the SAME closed-form IEEE-double
expression in Spark and in the DuckDB oracle, so results hash-match
across engines (the repo-wide float discipline, plans/__init__.py).

Scale design: each query is ONE map-side-combinable aggregation over
the fact table — O(groups · d²) result rows regardless of input size,
no joins, no windows. On a 1000-executor cluster the only shuffle is
the partial-aggregate merge of a few dozen decimal cells per group;
the closed-form solve is a projection on the aggregated row. This is
the classic "normal equations via Gram aggregation" pattern for
linear models at 100 TB (X^T X as an aggregate, solve on O(d²) data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load_table


def _dec2(c: str) -> F.Column:
    return F.col(c).cast("decimal(18,2)")


# ---------------------------------------------------------------------------
# stat_reg_group — per-group simple OLS (y = extendedprice ~ quantity)
# ---------------------------------------------------------------------------

# Shared closed-form (identical text in Spark and DuckDB; every input is
# a double derived from an exact decimal sum, so the expression trees —
# and therefore the IEEE results — are identical in both engines).
_REG_SLOPE = "(n * sxy - sx * sy) / (n * sxx - sx * sx)"
_REG_INTERCEPT = "(sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n"
_REG_R2 = (
    "((n * sxy - sx * sy) * (n * sxy - sx * sy))"
    " / ((n * sxx - sx * sx) * (n * syy - sy * sy))"
)


def stat_reg_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped simple linear regression via exact normal equations.

    One aggregation pass computes (n, Σx, Σy, Σx², Σxy, Σy²) per
    l_returnflag as exact decimals; slope/intercept/R² are a driver-free
    projection. At 100 TB this is a single partial-agg shuffle of 6
    cells per group.
    """
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity", "l_extendedprice"
    )
    x = _dec2("l_quantity")
    y = _dec2("l_extendedprice")
    agg = l.groupBy("l_returnflag").agg(
        F.count("*").cast("double").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(x * y).cast("double").alias("sxy"),
        F.sum(y * y).cast("double").alias("syy"),
    )
    return agg.select(
        "l_returnflag",
        F.col("n").cast("long").alias("n_rows"),
        F.expr(_REG_SLOPE).alias("slope"),
        F.expr(_REG_INTERCEPT).alias("intercept"),
        F.expr(_REG_R2).alias("r2"),
    ).orderBy("l_returnflag")


STAT_REG_SQL = f"""
WITH s AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag,
       CAST(n AS BIGINT) AS n_rows,
       {_REG_SLOPE} AS slope,
       {_REG_INTERCEPT} AS intercept,
       {_REG_R2} AS r2
FROM s ORDER BY l_returnflag
"""


# ---------------------------------------------------------------------------
# stat_corr_matrix — all pairwise Pearson correlations in ONE pass
# ---------------------------------------------------------------------------

_CORR_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def _corr_expr(a: str, b: str) -> str:
    # corr(a,b) from exact sums; sqrt is correctly rounded in IEEE, so
    # the two engines agree bit-for-bit given identical inputs.
    return (
        f"(n * s_{a}_{b} - s_{a} * s_{b})"
        f" / (sqrt(n * s_{a}_{a} - s_{a} * s_{a})"
        f" * sqrt(n * s_{b}_{b} - s_{b} * s_{b}))"
    )


def stat_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation matrix of the four lineitem measures.

    A single aggregation computes all d + d(d+1)/2 exact sums (here 4
    sums + 10 product sums); the 6 off-diagonal correlations are a
    projection + `stack` over the one aggregated row. Cost at any scale:
    one map-side-combined pass, 14 decimal cells shuffled.
    """
    short = {c: c.replace("l_", "") for c in _CORR_COLS}
    l = load_table(spark, sf_dir, "lineitem").select(*_CORR_COLS)
    aggs = [F.count("*").cast("double").alias("n")]
    for c in _CORR_COLS:
        aggs.append(F.sum(_dec2(c)).cast("double").alias(f"s_{short[c]}"))
    for i, a in enumerate(_CORR_COLS):
        for b in _CORR_COLS[i:]:
            aggs.append(
                F.sum(_dec2(a) * _dec2(b))
                .cast("double")
                .alias(f"s_{short[a]}_{short[b]}")
            )
    one = l.agg(*aggs)
    pairs = [
        (short[a], short[b])
        for i, a in enumerate(_CORR_COLS)
        for b in _CORR_COLS[i + 1 :]
    ]
    stack_args = ", ".join(
        f"'{a}~{b}', {_corr_expr(a, b)}" for a, b in pairs
    )
    return one.select(
        F.col("n").cast("long").alias("n_rows"),
        F.expr(f"stack({len(pairs)}, {stack_args}) AS (pair, pearson_r)"),
    ).select("pair", "pearson_r", "n_rows").orderBy("pair")


def _corr_sql() -> str:
    short = {c: c.replace("l_", "") for c in _CORR_COLS}
    sums = ["CAST(COUNT(*) AS DOUBLE) AS n"]
    for c in _CORR_COLS:
        sums.append(
            f"CAST(SUM(CAST({c} AS DECIMAL(18,2))) AS DOUBLE) AS s_{short[c]}"
        )
    for i, a in enumerate(_CORR_COLS):
        for b in _CORR_COLS[i:]:
            sums.append(
                f"CAST(SUM(CAST({a} AS DECIMAL(18,2)) * CAST({b} AS DECIMAL(18,2))) AS DOUBLE)"
                f" AS s_{short[a]}_{short[b]}"
            )
    pairs = [
        (short[a], short[b])
        for i, a in enumerate(_CORR_COLS)
        for b in _CORR_COLS[i + 1 :]
    ]
    arms = "\nUNION ALL\n".join(
        f"SELECT '{a}~{b}' AS pair, {_corr_expr(a, b)} AS pearson_r,"
        f" CAST(n AS BIGINT) AS n_rows FROM s"
        for a, b in pairs
    )
    return (
        "WITH s AS (\n  SELECT " + ",\n         ".join(sums) + "\n  FROM lineitem\n)\n"
        + arms
        + "\nORDER BY pair"
    )


STAT_CORR_SQL = _corr_sql()


# ---------------------------------------------------------------------------
# stat_ab_welch — two-sample Welch t-test per event_type (A/B harness)
# ---------------------------------------------------------------------------

_WELCH_PRE = {
    # per-arm means and sample variances from exact sums
    "m0": "s0 / n0",
    "m1": "s1 / n1",
    "v0": "(ss0 - s0 * s0 / n0) / (n0 - 1)",
    "v1": "(ss1 - s1 * s1 / n1) / (n1 - 1)",
}
_WELCH_T = (
    "((s0 / n0) - (s1 / n1))"
    " / sqrt(((ss0 - s0 * s0 / n0) / (n0 - 1)) / n0"
    " + ((ss1 - s1 * s1 / n1) / (n1 - 1)) / n1)"
)
_WELCH_DF = (
    "(((ss0 - s0 * s0 / n0) / (n0 - 1)) / n0 + ((ss1 - s1 * s1 / n1) / (n1 - 1)) / n1)"
    " * (((ss0 - s0 * s0 / n0) / (n0 - 1)) / n0 + ((ss1 - s1 * s1 / n1) / (n1 - 1)) / n1)"
    " / ((((ss0 - s0 * s0 / n0) / (n0 - 1)) / n0) * (((ss0 - s0 * s0 / n0) / (n0 - 1)) / n0) / (n0 - 1)"
    " + (((ss1 - s1 * s1 / n1) / (n1 - 1)) / n1) * (((ss1 - s1 * s1 / n1) / (n1 - 1)) / n1) / (n1 - 1))"
)


def stat_ab_welch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test between experiment arms.

    Arm assignment is the standard deterministic hash split
    (user_id mod 2 here; a production pipeline salts the hash per
    experiment). Per event_type, one conditional aggregation produces
    both arms' exact (n, Σv, Σv²) — no self-join, no second pass — and
    the t statistic + Welch–Satterthwaite df are projected from it.
    """
    e = load_table(spark, sf_dir, "events").select("event_type", "user_id", "value")
    v = _dec2("value")
    arm_a = F.col("user_id") % 2 == 0
    agg = e.groupBy("event_type").agg(
        F.count(F.when(arm_a, 1)).cast("double").alias("n0"),
        F.sum(F.when(arm_a, v)).cast("double").alias("s0"),
        F.sum(F.when(arm_a, v * v)).cast("double").alias("ss0"),
        F.count(F.when(~arm_a, 1)).cast("double").alias("n1"),
        F.sum(F.when(~arm_a, v)).cast("double").alias("s1"),
        F.sum(F.when(~arm_a, v * v)).cast("double").alias("ss1"),
    )
    return agg.select(
        "event_type",
        F.col("n0").cast("long").alias("n_arm_a"),
        F.col("n1").cast("long").alias("n_arm_b"),
        F.expr(_WELCH_PRE["m0"]).alias("mean_a"),
        F.expr(_WELCH_PRE["m1"]).alias("mean_b"),
        F.expr(_WELCH_T).alias("t_stat"),
        F.expr(_WELCH_DF).alias("welch_df"),
    ).orderBy("event_type")


STAT_WELCH_SQL = f"""
WITH s AS (
  SELECT event_type,
         CAST(COUNT(*) FILTER (user_id % 2 = 0) AS DOUBLE) AS n0,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) FILTER (user_id % 2 = 0) AS DOUBLE) AS s0,
         CAST(SUM(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) FILTER (user_id % 2 = 0) AS DOUBLE) AS ss0,
         CAST(COUNT(*) FILTER (user_id % 2 <> 0) AS DOUBLE) AS n1,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) FILTER (user_id % 2 <> 0) AS DOUBLE) AS s1,
         CAST(SUM(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) FILTER (user_id % 2 <> 0) AS DOUBLE) AS ss1
  FROM events GROUP BY event_type
)
SELECT event_type,
       CAST(n0 AS BIGINT) AS n_arm_a,
       CAST(n1 AS BIGINT) AS n_arm_b,
       {_WELCH_PRE["m0"]} AS mean_a,
       {_WELCH_PRE["m1"]} AS mean_b,
       {_WELCH_T} AS t_stat,
       {_WELCH_DF} AS welch_df
FROM s ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# stat_reg_multi — multivariate OLS via normal equations + Cramer
# ---------------------------------------------------------------------------

# Normal-equation system for y ~ 1 + x1 + x2:
#   [ n    sx1   sx2  ] [b0]   [ sy   ]
#   [ sx1  sx11  sx12 ] [b1] = [ sx1y ]
#   [ sx2  sx12  sx22 ] [b2]   [ sx2y ]
# solved by Cramer's rule with one shared expression per coefficient —
# identical text in Spark and DuckDB, doubles derived from exact
# decimal sums, so the solve is bit-identical cross-engine.
_DET_A = (
    "(n * (sx11 * sx22 - sx12 * sx12)"
    " - sx1 * (sx1 * sx22 - sx12 * sx2)"
    " + sx2 * (sx1 * sx12 - sx11 * sx2))"
)
_DET_B0 = (
    "(sy * (sx11 * sx22 - sx12 * sx12)"
    " - sx1 * (sx1y * sx22 - sx12 * sx2y)"
    " + sx2 * (sx1y * sx12 - sx11 * sx2y))"
)
_DET_B1 = (
    "(n * (sx1y * sx22 - sx12 * sx2y)"
    " - sy * (sx1 * sx22 - sx12 * sx2)"
    " + sx2 * (sx1 * sx2y - sx1y * sx2))"
)
_DET_B2 = (
    "(n * (sx11 * sx2y - sx1y * sx12)"
    " - sx1 * (sx1 * sx2y - sx1y * sx2)"
    " + sy * (sx1 * sx12 - sx11 * sx2))"
)


def stat_reg_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped MULTIVARIATE linear regression (y = extendedprice ~
    quantity + discount) — the full normal-equations-at-scale pattern:
    one map-side-combinable pass builds the exact Gram matrix (d = 2 →
    9 decimal cells + 1 count per group), Cramer's rule solves the
    3x3 system as a projection. No driver solve, no MLlib iteration;
    at 100 TB the shuffle is 10 cells per group."""
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity", "l_discount", "l_extendedprice"
    )
    x1 = _dec2("l_quantity")
    x2 = _dec2("l_discount")
    y = _dec2("l_extendedprice")
    agg = l.groupBy("l_returnflag").agg(
        F.count("*").cast("double").alias("n"),
        F.sum(x1).cast("double").alias("sx1"),
        F.sum(x2).cast("double").alias("sx2"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x1 * x1).cast("double").alias("sx11"),
        F.sum(x1 * x2).cast("double").alias("sx12"),
        F.sum(x2 * x2).cast("double").alias("sx22"),
        F.sum(x1 * y).cast("double").alias("sx1y"),
        F.sum(x2 * y).cast("double").alias("sx2y"),
    )
    return agg.select(
        "l_returnflag",
        F.col("n").cast("long").alias("n_rows"),
        F.expr(f"{_DET_B0} / {_DET_A}").alias("intercept"),
        F.expr(f"{_DET_B1} / {_DET_A}").alias("beta_quantity"),
        F.expr(f"{_DET_B2} / {_DET_A}").alias("beta_discount"),
    ).orderBy("l_returnflag")


STAT_REG_MULTI_SQL = f"""
WITH s AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx1,
         CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sx2,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx11,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sx12,
         CAST(SUM(CAST(l_discount AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sx22,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sx1y,
         CAST(SUM(CAST(l_discount AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sx2y
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag,
       CAST(n AS BIGINT) AS n_rows,
       {_DET_B0} / {_DET_A} AS intercept,
       {_DET_B1} / {_DET_A} AS beta_quantity,
       {_DET_B2} / {_DET_A} AS beta_discount
FROM s ORDER BY l_returnflag
"""


# ---------------------------------------------------------------------------
# stat_chi2_independence — chi-squared test over a contingency table
# ---------------------------------------------------------------------------


def stat_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-squared test of independence (orderstatus × orderpriority).

    One groupBy builds the contingency table; margins are window sums
    over the handful of cells (the post-aggregation table is tiny at
    any input scale, so the windows are free); the statistic folds the
    cells with the shared (obs - exp)^2 / exp expression. Output also
    carries the degrees of freedom and the per-cell max contribution
    (which cell drives the dependence) — rounded to 6 dp to absorb
    cross-engine float-summation order."""
    o = load_table(spark, sf_dir, "orders")
    cells = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("obs")
    )
    from pyspark.sql import Window

    w_all = Window.partitionBy()
    w_row = Window.partitionBy("o_orderstatus")
    w_col = Window.partitionBy("o_orderpriority")
    with_m = cells.select(
        "o_orderstatus",
        "o_orderpriority",
        "obs",
        F.sum("obs").over(w_row).alias("row_tot"),
        F.sum("obs").over(w_col).alias("col_tot"),
        F.sum("obs").over(w_all).alias("n"),
    )
    contrib = with_m.withColumn(
        "contrib",
        F.expr(
            "(CAST(obs AS DOUBLE) - CAST(row_tot AS DOUBLE) * col_tot / n)"
            " * (CAST(obs AS DOUBLE) - CAST(row_tot AS DOUBLE) * col_tot / n)"
            " / (CAST(row_tot AS DOUBLE) * col_tot / n)"
        ),
    )
    return contrib.agg(
        F.round(F.sum("contrib"), 6).alias("chi2"),
        (
            (F.countDistinct("o_orderstatus") - 1)
            * (F.countDistinct("o_orderpriority") - 1)
        ).alias("dof"),
        F.round(F.max("contrib"), 6).alias("max_cell_contrib"),
        F.max("n").alias("n_rows"),
    )


STAT_CHI2_SQL = """
WITH cells AS (
  SELECT o_orderstatus, o_orderpriority, COUNT(*) AS obs
  FROM orders GROUP BY 1, 2
),
m AS (
  SELECT o_orderstatus, o_orderpriority, obs,
         SUM(obs) OVER (PARTITION BY o_orderstatus) AS row_tot,
         SUM(obs) OVER (PARTITION BY o_orderpriority) AS col_tot,
         SUM(obs) OVER () AS n
  FROM cells
),
c AS (
  SELECT *,
         (CAST(obs AS DOUBLE) - CAST(row_tot AS DOUBLE) * col_tot / n)
         * (CAST(obs AS DOUBLE) - CAST(row_tot AS DOUBLE) * col_tot / n)
         / (CAST(row_tot AS DOUBLE) * col_tot / n) AS contrib
  FROM m
)
SELECT ROUND(SUM(contrib), 6) AS chi2,
       (COUNT(DISTINCT o_orderstatus) - 1)
       * (COUNT(DISTINCT o_orderpriority) - 1) AS dof,
       ROUND(MAX(contrib), 6) AS max_cell_contrib,
       CAST(MAX(n) AS BIGINT) AS n_rows
FROM c
"""


# ---------------------------------------------------------------------------
# stat_mannwhitney — tie-corrected Mann-Whitney U rank-sum test
# ---------------------------------------------------------------------------

# Shared closed-form (identical text both engines; every input is a
# double derived from exact integer aggregates). u1x2/r1x2 carry 2×U /
# 2×R so tied average ranks (halves) stay integer-exact end to end.
_MW_Z = (
    "(CAST(u1x2 AS DOUBLE) - CAST(n1 AS DOUBLE) * n2)"
    " / (CAST(2 AS DOUBLE) * sqrt((CAST(n1 AS DOUBLE) * n2 / CAST(12 AS DOUBLE))"
    " * (CAST(n1 + n2 + 1 AS DOUBLE)"
    " - CAST(tie_t AS DOUBLE) / (CAST(n1 + n2 AS DOUBLE) * (n1 + n2 - 1)))))"
)
_MW_EFFECT = "(CAST(n1 AS DOUBLE) * n2 - CAST(u1x2 AS DOUBLE)) / (CAST(n1 AS DOUBLE) * n2)"


def stat_mannwhitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U test (returnflag A vs R lineitems, value = quantity)
    with the tie-corrected normal approximation.

    Never ranks rows: quantity has a bounded integer domain, so the
    average rank of value v is derivable from per-value counts —
    2·rank(v) = 2·(# rows < v) + count(v) + 1, exact in integers. One
    map-side-combinable aggregation collapses the fact table to ≤50
    (value, count, count_group1) rows; the cumulative window runs over
    that tiny domain table, NOT the fact table, so there is no global
    row sort anywhere — the 100 TB cost is a single partial-agg
    shuffle. 2×R1, 2×U1 and the tie term Σ(t³−t) are exact
    DECIMAL(38,0) (HUGEINT in the oracle) — BIGINT overflows past ~2M
    rows per value — exposed as the identical nearest-DOUBLE; z and
    the rank-biserial effect size are the same IEEE expression in both
    engines.
    """
    from pyspark.sql import Window

    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag").isin("A", "R")
    )
    per_v = (
        l.select(
            F.col("l_quantity").cast("long").alias("v"),
            (F.col("l_returnflag") == "A").cast("long").alias("g1"),
        )
        .groupBy("v")
        .agg(F.count("*").alias("c"), F.sum("g1").alias("c1"))
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    ranked = per_v.withColumn(
        "r2", 2 * F.coalesce(F.sum("c").over(w), F.lit(0)) + F.col("c") + 1
    )
    # Σ(c1·r2) ≈ 2n² and the cubic tie term Σ(c³−c) overflow BIGINT once
    # per-value counts pass ~2M (sf≳20): carry both as exact
    # DECIMAL(38,0) (HUGEINT in the oracle) and expose them as DOUBLE —
    # both engines round the same exact integer to the same nearest
    # double, so the cross-engine hash still matches.
    agg = ranked.agg(
        F.sum("c1").alias("n1"),
        F.sum(F.col("c") - F.col("c1")).alias("n2"),
        F.sum(F.expr("CAST(c1 AS DECIMAL(38,0)) * r2")).alias("r1x2"),
        F.sum(F.expr("CAST(c AS DECIMAL(38,0)) * c * c - c")).alias("tie_t"),
    )
    return agg.select(
        "n1",
        "n2",
        F.expr("r1x2 - CAST(n1 AS DECIMAL(38,0)) * (n1 + 1)").alias("u1x2"),
        "tie_t",
    ).select(
        "n1",
        "n2",
        "u1x2",
        "tie_t",
        F.expr(_MW_Z).alias("z"),
        F.expr(_MW_EFFECT).alias("rank_biserial"),
    ).select(
        "n1",
        "n2",
        F.col("u1x2").cast("double").alias("u1x2"),
        F.col("tie_t").cast("double").alias("tie_t"),
        "z",
        "rank_biserial",
    )


STAT_MANNWHITNEY_SQL = f"""
WITH per_v AS (
  SELECT CAST(l_quantity AS BIGINT) AS v, COUNT(*) AS c,
         SUM(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS c1
  FROM lineitem
  WHERE l_returnflag IN ('A', 'R')
  GROUP BY 1
),
ranked AS (
  SELECT v, c, c1,
         2 * COALESCE(SUM(c) OVER (ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + c + 1 AS r2
  FROM per_v
),
agg AS (
  SELECT CAST(SUM(c1) AS BIGINT) AS n1,
         CAST(SUM(c - c1) AS BIGINT) AS n2,
         SUM(CAST(c1 AS HUGEINT) * r2) AS r1x2,
         SUM(CAST(c AS HUGEINT) * c * c - c) AS tie_t
  FROM ranked
),
u AS (
  SELECT n1, n2, r1x2 - CAST(n1 AS HUGEINT) * (n1 + 1) AS u1x2, tie_t FROM agg
),
fin AS (
  SELECT n1, n2, u1x2, tie_t,
         {_MW_Z} AS z,
         {_MW_EFFECT} AS rank_biserial
  FROM u
)
SELECT n1, n2, CAST(u1x2 AS DOUBLE) AS u1x2, CAST(tie_t AS DOUBLE) AS tie_t,
       z, rank_biserial
FROM fin
"""


# ---------------------------------------------------------------------------
# stat_ks_test — two-sample Kolmogorov-Smirnov, exact via cross-multiplied
# integer ECDF differences (the rankless bounded-domain pattern again)
# ---------------------------------------------------------------------------

_KS_D = "CAST(d_num AS DOUBLE) / (CAST(n1 AS DOUBLE) * n2)"
_KS_LAMBDA = (
    "(CAST(d_num AS DOUBLE) / (CAST(n1 AS DOUBLE) * n2))"
    " * sqrt((CAST(n1 AS DOUBLE) * n2) / (CAST(n1 AS DOUBLE) + n2))"
)


def stat_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov distance between the quantity
    distributions of returnflag A vs R lineitems.

    D = max_v |F1(v) − F2(v)| is kept EXACT until the last step by
    cross-multiplying the two ECDFs to integers: d_num =
    max |cum1·n2 − cum2·n1|, so no division happens before the single
    closed-form projection. Like the Mann-Whitney query, the fact
    table collapses to ≤50 per-value count rows in one partial-agg
    shuffle; the cumulative window runs over that bounded domain
    table, never over rows."""
    from pyspark.sql import Window

    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag").isin("A", "R")
    )
    per_v = (
        l.select(
            F.col("l_quantity").cast("long").alias("v"),
            (F.col("l_returnflag") == "A").cast("long").alias("g1"),
        )
        .groupBy("v")
        .agg(F.count("*").alias("c"), F.sum("g1").alias("c1"))
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = per_v.select(
        F.sum("c1").over(w).alias("cum1"),
        (F.sum("c").over(w) - F.sum("c1").over(w)).alias("cum2"),
    )
    tot = per_v.agg(
        F.sum("c1").alias("n1"), F.sum(F.col("c") - F.col("c1")).alias("n2")
    )
    # cum·n cross-products grow ~n² (past BIGINT around sf~500): exact
    # DECIMAL(38,0) internally (HUGEINT in the oracle), d_num exposed
    # as the identical nearest-DOUBLE
    agg = cum.crossJoin(F.broadcast(tot)).agg(
        F.max(
            F.abs(
                F.expr("CAST(cum1 AS DECIMAL(38,0)) * n2")
                - F.expr("CAST(cum2 AS DECIMAL(38,0)) * n1")
            )
        ).alias("d_num"),
        F.min("n1").alias("n1"),
        F.min("n2").alias("n2"),
    )
    return agg.select(
        "n1",
        "n2",
        "d_num",
        F.expr(_KS_D).alias("ks_d"),
        F.expr(_KS_LAMBDA).alias("ks_lambda"),
    ).select(
        "n1",
        "n2",
        F.col("d_num").cast("double").alias("d_num"),
        "ks_d",
        "ks_lambda",
    )


STAT_KS_SQL = f"""
WITH per_v AS (
  SELECT CAST(l_quantity AS BIGINT) AS v, COUNT(*) AS c,
         SUM(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS c1
  FROM lineitem
  WHERE l_returnflag IN ('A', 'R')
  GROUP BY 1
),
cum AS (
  SELECT SUM(c1) OVER w AS cum1, SUM(c) OVER w - SUM(c1) OVER w AS cum2
  FROM per_v
  WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
tot AS (
  SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c - c1) AS BIGINT) AS n2
  FROM per_v
),
agg AS (
  SELECT MAX(ABS(CAST(cum1 AS HUGEINT) * n2 - CAST(cum2 AS HUGEINT) * n1))
           AS d_num,
         CAST(MIN(n1) AS BIGINT) AS n1, CAST(MIN(n2) AS BIGINT) AS n2
  FROM cum CROSS JOIN tot
), fin AS (
  SELECT n1, n2, d_num,
         {_KS_D} AS ks_d,
         {_KS_LAMBDA} AS ks_lambda
  FROM agg
)
SELECT n1, n2, CAST(d_num AS DOUBLE) AS d_num, ks_d, ks_lambda
FROM fin
"""


# ---------------------------------------------------------------------------
# stat_mad_outliers — robust outlier detection via median absolute deviation
# ---------------------------------------------------------------------------


def _domain_median(per_v: DataFrame, grp: str) -> DataFrame:
    """Lower median over a (grp, v, c) count table: smallest v whose
    cumulative count reaches (n+1) div 2 — pure integer selection,
    identical in any engine, never ranks raw rows."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(grp)
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = Window.partitionBy(grp)
    return (
        per_v.withColumn("cum", F.sum("c").over(w))
        .withColumn("n", F.sum("c").over(wn))
        .filter(F.col("cum") >= F.expr("(n + 1) div 2"))
        .groupBy(grp)
        .agg(F.min("v").alias("med"), F.min("n").alias("n"))
    )


def stat_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-group outlier census: median absolute deviation with
    the 3×MAD rule over quantity per return flag — the heavy-tail-safe
    alternative to z-scores (evt_anomaly_zscore), kept EXACT.

    Both medians (values, then absolute deviations) are selected from
    the bounded value DOMAIN (≤50 distinct quantities), not from rows:
    the fact collapses once per phase into a per-value count table and
    the cumulative scan runs over that. Integer end to end — no
    percentile sketch, no tolerance. Cost at 100 TB: two
    map-side-combined aggregations and two ~50-row windows."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag").isin("A", "N", "R")
    )
    per_v = (
        l.select("l_returnflag", F.col("l_quantity").cast("long").alias("v"))
        .groupBy("l_returnflag", "v")
        .agg(F.count("*").alias("c"))
    )
    med = _domain_median(per_v, "l_returnflag")
    dev = (
        per_v.join(F.broadcast(med), "l_returnflag")
        .select(
            "l_returnflag",
            F.abs(F.col("v") - F.col("med")).alias("v"),
            "c",
        )
        .groupBy("l_returnflag", "v")
        .agg(F.sum("c").alias("c"))
    )
    mad = _domain_median(dev, "l_returnflag").select(
        "l_returnflag", F.col("med").alias("mad")
    )
    out = (
        dev.join(F.broadcast(mad), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(F.col("v") > 3 * F.col("mad"), F.col("c")).otherwise(0)).alias(
                "n_outliers"
            )
        )
    )
    return (
        med.join(mad, "l_returnflag")
        .join(out, "l_returnflag")
        .select(
            "l_returnflag",
            "n",
            F.col("med").alias("median_qty"),
            "mad",
            "n_outliers",
        )
        .orderBy("l_returnflag")
    )


STAT_MAD_SQL = """
WITH per_v AS (
  SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS v, COUNT(*) AS c
  FROM lineitem WHERE l_returnflag IN ('A', 'N', 'R')
  GROUP BY 1, 2
),
med AS (
  SELECT l_returnflag, CAST(MIN(v) AS BIGINT) AS med, CAST(MIN(n) AS BIGINT) AS n
  FROM (
    SELECT l_returnflag, v,
           SUM(c) OVER (PARTITION BY l_returnflag ORDER BY v
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
           SUM(c) OVER (PARTITION BY l_returnflag) AS n
    FROM per_v
  ) WHERE cum >= (n + 1) // 2
  GROUP BY 1
),
dev AS (
  SELECT p.l_returnflag, ABS(p.v - m.med) AS v, CAST(SUM(p.c) AS BIGINT) AS c
  FROM per_v p JOIN med m ON m.l_returnflag = p.l_returnflag
  GROUP BY 1, 2
),
mad AS (
  SELECT l_returnflag, CAST(MIN(v) AS BIGINT) AS mad
  FROM (
    SELECT l_returnflag, v,
           SUM(c) OVER (PARTITION BY l_returnflag ORDER BY v
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
           SUM(c) OVER (PARTITION BY l_returnflag) AS n
    FROM dev
  ) WHERE cum >= (n + 1) // 2
  GROUP BY 1
),
outliers AS (
  SELECT d.l_returnflag,
         CAST(SUM(CASE WHEN d.v > 3 * a.mad THEN d.c ELSE 0 END) AS BIGINT)
           AS n_outliers
  FROM dev d JOIN mad a ON a.l_returnflag = d.l_returnflag
  GROUP BY 1
)
SELECT m.l_returnflag, m.n, m.med AS median_qty, a.mad, o.n_outliers
FROM med m
JOIN mad a ON a.l_returnflag = m.l_returnflag
JOIN outliers o ON o.l_returnflag = m.l_returnflag
ORDER BY m.l_returnflag
"""


# ---------------------------------------------------------------------------
# stat_bootstrap_ci — engine-reproducible subsample bootstrap
# ---------------------------------------------------------------------------

_BOOT_B = 20

_BOOT_MEMBER_SPARK = (
    "CAST(conv(substring(md5(concat(CAST(b AS STRING), '|',"
    " CAST(o_orderkey AS STRING))), 1, 15), 16, 10) AS BIGINT) % 2 = 0"
)
_BOOT_MEMBER_DUCK = (
    "('0x' || substr(md5(CAST(b AS VARCHAR) || '|' ||"
    " CAST(o_orderkey AS VARCHAR)), 1, 15))::BIGINT % 2 = 0"
)


def stat_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed subsample bootstrap for the mean order value —
    uncertainty quantification WITHOUT engine-specific RNG.

    Seeded `rand()` never reproduces across engines, so replicate
    membership comes from the portable md5 hash: order k joins
    replicate b iff hash(b|k) is even — 20 deterministic half-samples
    any engine regenerates bit-for-bit. ONE pass computes all
    replicates (a native explode of b=1..20, then a 20-cell
    map-side-combined decimal aggregation — no 20 separate jobs, no
    driver loop); the CI is the min/max of the 20 replicate means
    (the ±2.5% tail at B=20). The same shape scales to any B and any
    aggregate with exact sufficient statistics."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", _dec2("o_totalprice").alias("v")
    )
    reps = (
        o.select(
            F.explode(F.expr(f"sequence(1, {_BOOT_B})")).alias("b"),
            "o_orderkey",
            "v",
        )
        .filter(F.expr(_BOOT_MEMBER_SPARK))
        .groupBy("b")
        .agg(F.sum("v").alias("sd"), F.count("*").alias("n"))
        .select(F.expr("CAST(sd AS DOUBLE) / n").alias("m"))
    )
    point = o.agg(F.sum("v").alias("sd"), F.count("*").alias("n")).select(
        F.expr("CAST(sd AS DOUBLE) / n").alias("point_mean"), F.col("n").alias("n_rows")
    )
    band = reps.agg(
        F.count("*").alias("n_replicates"),
        F.min("m").alias("boot_lo"),
        F.max("m").alias("boot_hi"),
    )
    return point.crossJoin(F.broadcast(band)).select(
        "n_rows", "point_mean", "n_replicates", "boot_lo", "boot_hi"
    )


STAT_BOOT_SQL = f"""
WITH o AS (
  SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)) AS v FROM orders
),
reps AS (
  SELECT CAST(sd AS DOUBLE) / n AS m
  FROM (
    SELECT b, SUM(v) AS sd, COUNT(*) AS n
    FROM o, unnest(range(1, {_BOOT_B + 1})) AS r(b)
    WHERE {_BOOT_MEMBER_DUCK}
    GROUP BY b
  )
),
point AS (
  SELECT CAST(SUM(v) AS DOUBLE) / COUNT(*) AS point_mean,
         COUNT(*) AS n_rows
  FROM o
)
SELECT p.n_rows, p.point_mean,
       (SELECT COUNT(*) FROM reps) AS n_replicates,
       (SELECT MIN(m) FROM reps) AS boot_lo,
       (SELECT MAX(m) FROM reps) AS boot_hi
FROM point p
"""



# ---------------------------------------------------------------------------
# stat_ab_assignment — deterministic experiment bucketing + SRM guard
# ---------------------------------------------------------------------------

_SRM_CHI2 = (
    "(CAST(n_control AS DOUBLE) - (CAST(n_users AS DOUBLE) / 2))"
    " * (CAST(n_control AS DOUBLE) - (CAST(n_users AS DOUBLE) / 2))"
    " / (CAST(n_users AS DOUBLE) / 2)"
    " + (CAST(n_treatment AS DOUBLE) - (CAST(n_users AS DOUBLE) / 2))"
    " * (CAST(n_treatment AS DOUBLE) - (CAST(n_users AS DOUBLE) / 2))"
    " / (CAST(n_users AS DOUBLE) / 2)"
)


def stat_ab_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment assignment the way production A/B systems do it:
    arm = md5-hash(experiment_salt | user) % 100 against a 50/50
    split — sticky (a user keeps their arm forever), stateless (no
    assignment table to join), uniform, and engine-portable so the
    oracle reproduces every user's arm bit-for-bit. The output row is
    the sample-ratio-mismatch (SRM) guard: arm sizes plus the 1-dof
    chi-square against the configured split — THE standard validity
    check before reading any experiment metric (chi2 > 3.84 at p=.05
    means the assignment itself is broken). One distinct + one
    aggregation at any scale."""
    e = load_table(spark, sf_dir, "events").select("user_id").distinct()
    bucket = (
        "CAST(conv(substring(md5(concat('exp1|', CAST(user_id AS STRING)))"
        ", 1, 15), 16, 10) AS BIGINT) % 100"
    )
    agg = e.agg(
        F.count("*").alias("n_users"),
        F.sum(F.expr(f"CASE WHEN {bucket} < 50 THEN 1 ELSE 0 END")).alias(
            "n_control"
        ),
        F.sum(F.expr(f"CASE WHEN {bucket} >= 50 THEN 1 ELSE 0 END")).alias(
            "n_treatment"
        ),
    )
    return agg.select(
        "n_users",
        "n_control",
        "n_treatment",
        F.round(F.expr(_SRM_CHI2), 9).alias("srm_chi2"),
        F.expr(f"({_SRM_CHI2}) > CAST(3.841 AS DOUBLE)").alias("srm_alarm"),
    )


STAT_SRM_SQL = f"""
WITH u AS (SELECT DISTINCT user_id FROM events),
agg AS (
  SELECT COUNT(*) AS n_users,
         CAST(SUM(CASE WHEN ('0x' || substr(md5('exp1|' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 100 < 50
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_control,
         CAST(SUM(CASE WHEN ('0x' || substr(md5('exp1|' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 100 >= 50
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_treatment
  FROM u
)
SELECT n_users, n_control, n_treatment,
       ROUND({_SRM_CHI2}, 9) AS srm_chi2,
       ({_SRM_CHI2}) > CAST(3.841 AS DOUBLE) AS srm_alarm
FROM agg
"""


# ---------------------------------------------------------------------------
# stat_cuped — CUPED variance reduction from pre-period covariates
# ---------------------------------------------------------------------------

_CUPED_VAR_Y = "(syy - sy * sy / n) / (n - 1)"
_CUPED_THETA = "((sxy - sx * sy / n) / (sxx - sx * sx / n))"
_CUPED_VAR_ADJ = (
    "((syy - sy * sy / n)"
    " - ((sxy - sx * sy / n) * (sxy - sx * sy / n)) / (sxx - sx * sx / n))"
    " / (n - 1)"
)


def stat_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED (controlled-experiment using pre-experiment data): adjust
    each user's experiment-period metric by theta x their pre-period
    covariate, shrinking metric variance by rho-squared and therefore
    the sample size an A/B test needs — the single highest-leverage
    trick in industrial experimentation.

    Pre/post user totals are exact decimals (first/second half of the
    event window); theta and both variances derive from ONE
    map-side-combined aggregation of five exact sums over the
    user-level table — the same sufficient-statistics shape as the
    regression queries, so every output is a shared-text IEEE
    projection. The variance identity var_adj = var_y − cov²/var_x is
    computed symbolically from the sums (no per-row adjusted metric
    materialized — nothing to re-shuffle)."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.expr(
            "unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000"
        ).alias("day_id"),
        F.col("value").cast("decimal(18,3)").alias("v"),
    )
    cut = e.agg(
        F.expr("CAST(min(day_id) + (max(day_id) - min(day_id)) div 2 AS BIGINT)").alias(
            "mid"
        )
    )
    per_user = (
        e.crossJoin(F.broadcast(cut))
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("day_id") < F.col("mid"), F.col("v")).otherwise(
                F.lit(0).cast("decimal(18,3)")
            )).alias("x_dec"),
            F.sum(F.when(F.col("day_id") >= F.col("mid"), F.col("v")).otherwise(
                F.lit(0).cast("decimal(18,3)")
            )).alias("y_dec"),
        )
    )
    agg = per_user.agg(
        F.count("*").cast("double").alias("n"),
        F.sum("x_dec").cast("double").alias("sx"),
        F.sum("y_dec").cast("double").alias("sy"),
        F.sum(F.expr("x_dec * x_dec")).cast("double").alias("sxx"),
        F.sum(F.expr("x_dec * y_dec")).cast("double").alias("sxy"),
        F.sum(F.expr("y_dec * y_dec")).cast("double").alias("syy"),
    )
    return agg.select(
        F.col("n").cast("long").alias("n_users"),
        F.round(F.expr(_CUPED_THETA), 9).alias("theta"),
        F.round(F.expr(_CUPED_VAR_Y), 6).alias("var_y"),
        F.round(F.expr(_CUPED_VAR_ADJ), 6).alias("var_cuped"),
        F.round(
            F.expr(
                f"100 * (1 - ({_CUPED_VAR_ADJ}) / ({_CUPED_VAR_Y}))"
            ),
            6,
        ).alias("variance_reduction_pct"),
    )


STAT_CUPED_SQL = f"""
WITH e AS (
  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day_id,
         CAST(value AS DECIMAL(18,3)) AS v
  FROM events
),
cut AS (
  SELECT CAST(MIN(day_id) + (MAX(day_id) - MIN(day_id)) // 2 AS BIGINT) AS mid
  FROM e
),
per_user AS (
  SELECT user_id,
         SUM(CASE WHEN day_id < mid THEN v ELSE CAST(0 AS DECIMAL(18,3)) END) AS x_dec,
         SUM(CASE WHEN day_id >= mid THEN v ELSE CAST(0 AS DECIMAL(18,3)) END) AS y_dec
  FROM e CROSS JOIN cut
  GROUP BY user_id
),
agg AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(x_dec) AS DOUBLE) AS sx,
         CAST(SUM(y_dec) AS DOUBLE) AS sy,
         CAST(SUM(x_dec * x_dec) AS DOUBLE) AS sxx,
         CAST(SUM(x_dec * y_dec) AS DOUBLE) AS sxy,
         CAST(SUM(y_dec * y_dec) AS DOUBLE) AS syy
  FROM per_user
)
SELECT CAST(n AS BIGINT) AS n_users,
       ROUND({_CUPED_THETA}, 9) AS theta,
       ROUND({_CUPED_VAR_Y}, 6) AS var_y,
       ROUND({_CUPED_VAR_ADJ}, 6) AS var_cuped,
       ROUND(100 * (1 - ({_CUPED_VAR_ADJ}) / ({_CUPED_VAR_Y})), 6)
         AS variance_reduction_pct
FROM agg
"""

# ---------------------------------------------------------------------------
# stat_acf — sample autocorrelation of the daily event-count series
# ---------------------------------------------------------------------------

# Closed-form ACF at lag k from INTEGER sufficient statistics (shared
# verbatim across engines).  With x̄ = s/n, expanding the usual
# Σ(x_t−x̄)(x_{t−k}−x̄) numerator over the t>k overlap gives
#   num_k = Σ x_t·x_{t−k}  −  x̄·(tail_sum + head_sum)  +  (n−k)·x̄²
# and the denominator Σ(x_t−x̄)² = Σx² − n·x̄².  Every Σ term is an
# exact BIGINT (products of daily counts), so the only float work is
# this one projection.
_ACF_EXPR = (
    "(sxy - mean * (tail_s + head_s) + (n - k) * mean * mean)"
    " / (sxx - n * mean * mean)"
)


def stat_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation (lags 1–5) of daily event counts.

    Two map-side-combinable aggregations: (1) daily counts — one
    shuffle of ~days rows; (2) lag-k cross-products via a window over
    the TINY aggregated series (days rows, one partition is fine
    because the windowed input is already ≤ O(days), not O(events)).
    At 100 TB the heavy table is only touched by step (1).  Integer
    sufficient stats keep the result bit-identical across engines.
    """
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.date_trunc("day", "ts").alias("d")).agg(
        F.count("*").alias("x")
    )
    w = Window.orderBy("d")
    lagged = daily.select(
        "d", "x", *[F.lag("x", k).over(w).alias(f"x_{k}") for k in range(1, 6)]
    )
    per_lag = None
    for k in range(1, 6):
        part = lagged.filter(F.col(f"x_{k}").isNotNull()).agg(
            F.lit(k).alias("k"),
            F.sum(F.col("x") * F.col(f"x_{k}")).alias("sxy"),
            F.sum("x").alias("tail_s"),
            F.sum(f"x_{k}").alias("head_s"),
        )
        per_lag = part if per_lag is None else per_lag.unionByName(part)
    glob = daily.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("s"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    return (
        per_lag.crossJoin(F.broadcast(glob))
        .select(
            F.col("k").cast("int").alias("lag"),
            F.round(
                F.expr(_ACF_EXPR.replace("mean", "(CAST(s AS DOUBLE) / n)")), 9
            ).alias("acf"),
        )
        .orderBy("lag")
    )


STAT_ACF_SQL = f"""
WITH daily AS (
  SELECT date_trunc('day', ts) AS d, COUNT(*) AS x FROM events GROUP BY 1
), lagged AS (
  SELECT x,
         LAG(x, 1) OVER (ORDER BY d) AS x_1,
         LAG(x, 2) OVER (ORDER BY d) AS x_2,
         LAG(x, 3) OVER (ORDER BY d) AS x_3,
         LAG(x, 4) OVER (ORDER BY d) AS x_4,
         LAG(x, 5) OVER (ORDER BY d) AS x_5
  FROM daily
), per_lag AS (
  {" UNION ALL ".join(
    f'''SELECT {k} AS k, SUM(x * x_{k}) AS sxy, SUM(x) AS tail_s,
               SUM(x_{k}) AS head_s
        FROM lagged WHERE x_{k} IS NOT NULL'''
    for k in range(1, 6)
  )}
), g AS (
  SELECT COUNT(*) AS n, SUM(x) AS s, SUM(x * x) AS sxx FROM daily
)
SELECT CAST(k AS INT) AS lag,
       ROUND({_ACF_EXPR.replace("mean", "(CAST(s AS DOUBLE) / n)")}, 9) AS acf
FROM per_lag, g ORDER BY lag
"""


# ---------------------------------------------------------------------------
# stat_ewma — exponentially-weighted moving average of monthly revenue
# ---------------------------------------------------------------------------

_EWMA_ALPHA = 0.3
_EWMA_LAGS = 10


def stat_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncated-window EWMA (α=0.3, 10 taps) of monthly order revenue.

    Monthly totals are exact DECIMAL sums (one shuffle over orders —
    the only pass that touches the big table); the EWMA itself is a
    fixed 10-term weighted sum written as one literal expression so
    Spark and DuckDB evaluate the same IEEE operation sequence.  The
    truncated-kernel form (vs the recursive definition) is what makes
    EWMA embarrassingly parallel: each output row needs only its own
    10 lags, no sequential scan.
    """
    o = load_table(spark, sf_dir, "orders")
    monthly = o.groupBy(F.date_trunc("month", "o_orderdate").alias("m")).agg(
        F.sum(_dec2("o_totalprice")).cast("double").alias("rev")
    )
    w = Window.orderBy("m")
    lagged = monthly.select(
        "m",
        "rev",
        *[F.lag("rev", j).over(w).alias(f"r{j}") for j in range(1, _EWMA_LAGS)],
    ).withColumn("r0", F.col("rev"))
    num = " + ".join(
        f"({_EWMA_ALPHA} * {(1 - _EWMA_ALPHA) ** j!r}) * COALESCE(r{j}, 0.0)"
        for j in range(_EWMA_LAGS)
    )
    den = " + ".join(
        f"(CASE WHEN r{j} IS NOT NULL THEN"
        f" ({_EWMA_ALPHA} * {(1 - _EWMA_ALPHA) ** j!r}) ELSE 0.0 END)"
        for j in range(_EWMA_LAGS)
    )
    return (
        lagged.select(
            F.date_format("m", "yyyy-MM").alias("month"),
            F.round("rev", 2).alias("revenue"),
            F.round(F.expr(f"({num}) / ({den})"), 6).alias("ewma"),
        )
        .orderBy("month")
        .limit(24)
    )


def _ewma_sql() -> str:
    lag_cols = ",\n         ".join(
        f"LAG(rev, {j}) OVER (ORDER BY m) AS r{j}"
        for j in range(1, _EWMA_LAGS)
    )
    num = " + ".join(
        f"({_EWMA_ALPHA} * {(1 - _EWMA_ALPHA) ** j!r}) * COALESCE(r{j}, 0.0)"
        for j in range(_EWMA_LAGS)
    )
    den = " + ".join(
        f"(CASE WHEN r{j} IS NOT NULL THEN"
        f" ({_EWMA_ALPHA} * {(1 - _EWMA_ALPHA) ** j!r}) ELSE 0.0 END)"
        for j in range(_EWMA_LAGS)
    )
    return f"""
WITH monthly AS (
  SELECT date_trunc('month', o_orderdate) AS m,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
  FROM orders GROUP BY 1
), lagged AS (
  SELECT m, rev, rev AS r0,
         {lag_cols}
  FROM monthly
)
SELECT strftime(m, '%Y-%m') AS month,
       ROUND(rev, 2) AS revenue,
       ROUND(({num}) / ({den}), 6) AS ewma
FROM lagged ORDER BY month LIMIT 24
"""


STAT_EWMA_SQL = _ewma_sql()


# ---------------------------------------------------------------------------
# stat_theil_sen — robust trend: median of pairwise monthly-revenue slopes
# ---------------------------------------------------------------------------


def stat_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust slope of monthly revenue vs month index.

    The big-table pass is one aggregation (monthly DECIMAL totals);
    the pairwise-slope set is O(months²) on the TINY aggregated series
    (80 months → 3 160 pairs), built with a self-join and reduced with
    an exact middle-element median (sorted row_number, avg of the two
    central slopes).  Slopes are double quotients of exact decimals
    with identical operand order in both engines.
    """
    o = load_table(spark, sf_dir, "orders")
    monthly = (
        o.groupBy(F.date_trunc("month", "o_orderdate").alias("m"))
        .agg(F.sum(_dec2("o_totalprice")).cast("double").alias("rev"))
        .withColumn(
            "i",
            F.months_between(
                F.col("m"), F.lit("1995-01-01").cast("timestamp")
            ).cast("long"),
        )
    )
    a, b = monthly.alias("a"), monthly.alias("b")
    slopes = (
        a.join(b, F.col("a.i") < F.col("b.i"))
        .select(
            (
                (F.col("b.rev") - F.col("a.rev"))
                / (F.col("b.i") - F.col("a.i")).cast("double")
            ).alias("slope")
        )
    )
    ranked = slopes.select(
        "slope",
        F.row_number().over(Window.orderBy("slope")).alias("r"),
        F.count("*").over(Window.partitionBy()).alias("cnt"),
    )
    # Middle element(s): (cnt+1) div 2 and cnt div 2 + 1 coincide for
    # odd cnt and are the two central ranks for even cnt (`div` is the
    # truncating integer division — Spark `/` would be float).
    return ranked.filter(
        F.expr("r = (cnt + 1) div 2 OR r = cnt div 2 + 1")
    ).agg(
        F.count("*").cast("long").alias("n_mid"),
        F.round(F.avg("slope"), 6).alias("theil_sen_slope"),
        F.max("cnt").cast("long").alias("n_pairs"),
    )


STAT_THEIL_SEN_SQL = """
WITH monthly AS (
  SELECT date_trunc('month', o_orderdate) AS m,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev,
         CAST(datediff('month', TIMESTAMP '1995-01-01',
                       date_trunc('month', o_orderdate)) AS BIGINT) AS i
  FROM orders GROUP BY 1
), slopes AS (
  SELECT (b.rev - a.rev) / CAST(b.i - a.i AS DOUBLE) AS slope
  FROM monthly a JOIN monthly b ON a.i < b.i
), ranked AS (
  SELECT slope,
         ROW_NUMBER() OVER (ORDER BY slope) AS r,
         COUNT(*) OVER () AS cnt
  FROM slopes
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_mid,
       ROUND(AVG(slope), 6) AS theil_sen_slope,
       CAST(MAX(cnt) AS BIGINT) AS n_pairs
FROM ranked
WHERE r = (cnt + 1) // 2 OR r = cnt // 2 + 1
"""


# ---------------------------------------------------------------------------
# stat_gini_lorenz — Gini coefficient of customer spend concentration
# ---------------------------------------------------------------------------

_GINI_EXPR = "(2.0 * swx / (n * sx)) - (n + 1.0) / n"


def stat_gini_lorenz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-customer order spend (Lorenz form).

    Pass 1 aggregates spend per customer (exact DECIMAL, one shuffle
    over orders).  Pass 2 ranks customers by (spend, custkey) through
    operators/ranking.range_rank — the two-pass range-partitioned
    ranker, because the per-customer table GROWS with the data and a
    bare Window.orderBy would funnel it through one task — and reduces
    Σ rank·spend; rank·DECIMAL products stay exact, so the Gini is one
    closed-form double at the end.  The only data-sized movements are
    the groupBy shuffle and the range exchange of the slim
    (spend, custkey) projection.
    """
    from ..operators.ranking import range_rank

    o = load_table(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(
        F.sum(_dec2("o_totalprice")).alias("spend")
    )
    ranked = range_rank(spend, ["spend", "o_custkey"], "rk").select(
        "spend", "rk"
    )
    agg = ranked.agg(
        F.count("*").cast("double").alias("n"),
        F.sum("spend").cast("double").alias("sx"),
        F.sum(F.col("rk") * F.col("spend")).cast("double").alias("swx"),
    )
    return agg.select(
        F.col("n").cast("long").alias("n_customers"),
        F.round("sx", 2).alias("total_spend"),
        F.round(F.expr(_GINI_EXPR), 9).alias("gini"),
    )


STAT_GINI_SQL = f"""
WITH spend AS (
  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS spend
  FROM orders GROUP BY o_custkey
), ranked AS (
  SELECT spend,
         ROW_NUMBER() OVER (ORDER BY spend, o_custkey) AS rk
  FROM spend
), agg AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(spend) AS DOUBLE) AS sx,
         CAST(SUM(rk * spend) AS DOUBLE) AS swx
  FROM ranked
)
SELECT CAST(n AS BIGINT) AS n_customers,
       ROUND(sx, 2) AS total_spend,
       ROUND({_GINI_EXPR}, 9) AS gini
FROM agg
"""


# ---------------------------------------------------------------------------
# stat_power_analysis — two-proportion A/B sample-size planning
# ---------------------------------------------------------------------------

_PW_Z_ALPHA = 1.959963984540054  # two-sided 5%
_PW_Z_BETA = 0.8416212335729143  # 80% power
_PW_DELTAS = (0.01, 0.02, 0.05)
# shared closed form: n/arm = (zα+zβ)² · (p0(1−p0) + p1(1−p1)) / δ²
_PW_N = (
    f"ceil((({_PW_Z_ALPHA!r} + {_PW_Z_BETA!r}) * ({_PW_Z_ALPHA!r} + {_PW_Z_BETA!r}))"
    " * (p0 * (1.0 - p0) + p1 * (1.0 - p1)) / (delta * delta))"
)


def stat_power_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment sample-size planning from observed baselines: the
    purchase share of events (purchase events / all events — the
    event-level proportion; per-user conversion is degenerate 1.0 in
    this corpus) feeds the standard two-proportion normal-approximation formula at
    80% power / 5% α for a grid of absolute MDEs.

    One distinct-aggregation over events (two exact counts at any
    scale); the MDE grid is a 3-row literal join and the n-per-arm is
    a closed-form double both engines evaluate identically. The
    planning table every experimentation platform ships — here it
    composes with stat_ab_welch (the analysis) and
    stat_ab_assignment (the assignment audit).
    """
    e = load_table(spark, sf_dir, "events")
    base = e.agg(
        F.count("*").alias("n_events"),
        F.count(
            F.when(F.col("event_type") == "purchase", 1)
        ).alias("n_purchases"),
    )
    deltas = spark.range(1).select(
        F.explode(
            F.array(*[F.lit(d) for d in _PW_DELTAS])
        ).alias("delta")
    )
    return (
        base.crossJoin(deltas)
        .withColumn("p0", F.expr("CAST(n_purchases AS DOUBLE) / n_events"))
        .withColumn("p1", F.expr("p0 + delta"))
        .select(
            F.col("delta").alias("mde_abs"),
            "n_events",
            F.col("p0").alias("baseline_rate"),
            F.expr(f"CAST({_PW_N} AS BIGINT)").alias("n_per_arm"),
            F.expr(f"CAST({_PW_N} AS BIGINT) * 2").alias("n_total"),
            F.expr(
                f"CAST({_PW_N} AS BIGINT) * 2 <= n_events"
            ).alias("feasible_with_current_traffic"),
        )
        .orderBy("mde_abs")
    )


STAT_POWER_SQL = f"""
WITH base AS (
  SELECT COUNT(*) AS n_events,
         COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchases
  FROM events
), grid AS (
  SELECT CAST(u.delta AS DOUBLE) AS delta
  FROM (VALUES ({_PW_DELTAS[0]!r}), ({_PW_DELTAS[1]!r}), ({_PW_DELTAS[2]!r})) u(delta)
), p AS (
  SELECT delta, n_events,
         CAST(n_purchases AS DOUBLE) / n_events AS p0,
         CAST(n_purchases AS DOUBLE) / n_events + delta AS p1
  FROM base CROSS JOIN grid
)
SELECT delta AS mde_abs,
       n_events,
       p0 AS baseline_rate,
       CAST({_PW_N} AS BIGINT) AS n_per_arm,
       CAST({_PW_N} AS BIGINT) * 2 AS n_total,
       CAST({_PW_N} AS BIGINT) * 2 <= n_events AS feasible_with_current_traffic
FROM p ORDER BY mde_abs
"""


# ---------------------------------------------------------------------------
# stat_permutation_test — randomization test, exact integer comparisons
# ---------------------------------------------------------------------------

_PERM_B = 64
_PERM_SEED_SEP = "#"


def _perm_hash_spark(b_col: str, id_col: str) -> str:
    return (
        f"CAST(conv(substring(md5(concat(CAST({b_col} AS STRING), "
        f"'{_PERM_SEED_SEP}', CAST({id_col} AS STRING))), 1, 15), 16, 10) "
        f"AS BIGINT)"
    )


def stat_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample randomization test on click values (cohort = user-id
    parity), the distribution-free alternative to the t-test when
    normality is off the table: re-label every observation under
    B = 64 deterministic pseudo-permutations (portable md5 of
    (perm, event_id) — both engines rebuild the identical relabeling),
    recompute |mean_A − mean_B| for each, and report the exceedance
    p-value with the +1 correction. Exactness: values quantize to
    exact DECIMAL milli-units, per-perm sums are order-free BIGINTs,
    and "perm stat ≥ observed stat" compares CROSS-MULTIPLIED
    integers in DECIMAL(38,0) — no float enters until the two reported
    ratios. Plan shape: one 64-way explode + a 2·B-group
    combine-friendly aggregate; at 100 TB you run it on a consistent
    hash-sample of rows, same plan."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "click"
    )
    base = ev.select(
        "event_id",
        (F.col("user_id") % 2).alias("obs_label"),
        F.expr(
            "CAST(CAST(value AS DECIMAL(18,3)) * 1000 AS BIGINT)"
        ).alias("q"),
    )
    obs = base.agg(
        F.sum(F.when(F.col("obs_label") == 0, F.col("q"))).alias("sa"),
        F.count(F.when(F.col("obs_label") == 0, F.lit(1))).alias("na"),
        F.sum(F.when(F.col("obs_label") == 1, F.col("q"))).alias("sb"),
        F.count(F.when(F.col("obs_label") == 1, F.lit(1))).alias("nb"),
    ).select(
        F.abs(F.col("sa") * F.col("nb") - F.col("sb") * F.col("na")).alias("num_o"),
        (F.col("na") * F.col("nb")).alias("den_o"),
        (F.col("na") + F.col("nb")).alias("n_obs"),
    )
    perms = base.select(
        "event_id", "q", F.explode(F.sequence(F.lit(0), F.lit(_PERM_B - 1))).alias("b")
    ).withColumn("label", F.expr(f"{_perm_hash_spark('b', 'event_id')} % 2"))
    per_b = perms.groupBy("b").agg(
        F.sum(F.when(F.col("label") == 0, F.col("q"))).alias("sa"),
        F.count(F.when(F.col("label") == 0, F.lit(1))).alias("na"),
        F.sum(F.when(F.col("label") == 1, F.col("q"))).alias("sb"),
        F.count(F.when(F.col("label") == 1, F.lit(1))).alias("nb"),
    ).select(
        "b",
        F.abs(F.col("sa") * F.col("nb") - F.col("sb") * F.col("na")).alias("num_b"),
        (F.col("na") * F.col("nb")).alias("den_b"),
    )
    exceed = (
        per_b.crossJoin(obs)
        .select(
            (
                F.col("num_b").cast("decimal(38,0)") * F.col("den_o")
                >= F.col("num_o").cast("decimal(38,0)") * F.col("den_b")
            ).cast("long").alias("x"),
            "num_o", "den_o", "n_obs",
        )
        .groupBy("num_o", "den_o", "n_obs")
        .agg(F.sum("x").alias("n_exceed"))
    )
    return exceed.select(
        "n_obs",
        "num_o",
        "den_o",
        (F.col("num_o").cast("double") / (F.col("den_o").cast("double") * 1000.0)).alias(
            "obs_abs_diff"
        ),
        F.lit(_PERM_B).cast("long").alias("n_perms"),
        "n_exceed",
        ((F.col("n_exceed") + 1).cast("double") / float(_PERM_B + 1)).alias("p_value"),
    )


def _perm_sql() -> str:
    h = (
        f"('0x' || substr(md5(b || '{_PERM_SEED_SEP}' || event_id), 1, 15))::BIGINT"
    )
    return f"""
WITH base AS (
  SELECT event_id, user_id % 2 AS obs_label,
         CAST(CAST(value AS DECIMAL(18,3)) * 1000 AS BIGINT) AS q
  FROM events WHERE event_type = 'click'
), obs AS (
  SELECT abs(SUM(CASE WHEN obs_label = 0 THEN q END)
             * COUNT(CASE WHEN obs_label = 1 THEN 1 END)
           - SUM(CASE WHEN obs_label = 1 THEN q END)
             * COUNT(CASE WHEN obs_label = 0 THEN 1 END)) AS num_o,
         COUNT(CASE WHEN obs_label = 0 THEN 1 END)
           * COUNT(CASE WHEN obs_label = 1 THEN 1 END) AS den_o,
         COUNT(*) AS n_obs
  FROM base
), perms AS (
  SELECT base.event_id, base.q, g.b, ({h}) % 2 AS label
  FROM base CROSS JOIN (SELECT UNNEST(range({_PERM_B})) AS b) g
), per_b AS (
  SELECT b,
         abs(SUM(CASE WHEN label = 0 THEN q END)
             * COUNT(CASE WHEN label = 1 THEN 1 END)
           - SUM(CASE WHEN label = 1 THEN q END)
             * COUNT(CASE WHEN label = 0 THEN 1 END)) AS num_b,
         COUNT(CASE WHEN label = 0 THEN 1 END)
           * COUNT(CASE WHEN label = 1 THEN 1 END) AS den_b
  FROM perms GROUP BY 1
)
SELECT CAST(n_obs AS BIGINT) AS n_obs,
       CAST(num_o AS BIGINT) AS num_o,
       CAST(den_o AS BIGINT) AS den_o,
       CAST(num_o AS DOUBLE) / (CAST(den_o AS DOUBLE) * 1000.0) AS obs_abs_diff,
       CAST({_PERM_B} AS BIGINT) AS n_perms,
       CAST(SUM(CASE WHEN CAST(num_b AS DECIMAL(38,0)) * den_o
                      >= CAST(num_o AS DECIMAL(38,0)) * den_b
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_exceed,
       CAST(SUM(CASE WHEN CAST(num_b AS DECIMAL(38,0)) * den_o
                      >= CAST(num_o AS DECIMAL(38,0)) * den_b
                 THEN 1 ELSE 0 END) + 1 AS DOUBLE) / {_PERM_B + 1}.0 AS p_value
FROM per_b CROSS JOIN obs
GROUP BY 1, 2, 3, 4, 5
"""


STAT_PERM_SQL = _perm_sql()


# ---------------------------------------------------------------------------
# stat_spearman — tie-corrected Spearman rank correlation, rankless
# ---------------------------------------------------------------------------

# one closed-form IEEE expression over the exact DECIMAL sufficient
# statistics, shared VERBATIM with the oracle (repo float discipline).
# Every aggregate is cast to DOUBLE *before* combining: a 38×38
# decimal product would overflow DuckDB's width rules, and since both
# engines cast the identical exact integer and then run the identical
# IEEE ops, the result still hash-matches.  The doubled-rank scale
# (2·rank) cancels out of the correlation.
_SPEARMAN_RHO = (
    "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / "
    "(SQRT(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * "
    "SQRT(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)"
    " - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))"
)


def stat_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between l_quantity and l_discount,
    with full tie correction — and no row ranking.

    Both columns have small bounded domains (50 and 11 values), so the
    tie-averaged rank of a value is derivable from per-value counts:
    2·rank(v) = 2·(# rows < v) + count(v) + 1 stays integer-exact end
    to end (the stat_mannwhitney pattern, statsq.py:434).  Spearman is
    then Pearson over the doubled ranks, and every sufficient
    statistic (Σx, Σy, Σxy, Σx², Σy², n) reduces over the joint
    (quantity, discount) contingency table — ≤ 550 cells — as exact
    DECIMAL sums (widths 18+10+10 = 38, inside DuckDB's strict
    multiplication rule); rho is ONE closed-form double over the
    aggregates at the end, shared verbatim with the DuckDB oracle.

    Scale: the only data-sized pass is the map-side-combinable (q, d)
    count; the rank windows run over ≤ 50 / ≤ 11 marginal rows and the
    final join is a broadcast of those marginals back onto the tiny
    joint table.  A naive implementation would global-sort the fact
    table twice to rank it — this never ranks a row.  Magnitudes:
    2·rank ≤ 2n+1 fits the DECIMAL(10,0) rank cast through ~5·10⁹
    rows (≈ sf800); past that, widen the rank cast and drop one count
    digit — the 38-width product budget itself has room to ~10¹⁸ rows.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").alias("q"), F.col("l_discount").alias("d")
    )
    joint = li.groupBy("q", "d").agg(F.count("*").alias("cnt"))

    def _marginal(col: str, rank_name: str) -> DataFrame:
        marg = joint.groupBy(col).agg(F.sum("cnt").alias("c"))
        w = Window.orderBy(col).rowsBetween(Window.unboundedPreceding, -1)
        return marg.select(
            col,
            (
                F.lit(2) * F.coalesce(F.sum("c").over(w), F.lit(0))
                + F.col("c")
                + F.lit(1)
            ).alias(rank_name),
        )

    rx = _marginal("q", "rx2")
    ry = _marginal("d", "ry2")
    j2 = joint.join(F.broadcast(rx), "q").join(F.broadcast(ry), "d")
    # widths chosen so triple products stay inside width 38 under
    # DuckDB's strict w1+w2 multiplication rule: 18+10+10 = 38
    c = F.col("cnt").cast("decimal(18,0)")
    x = F.col("rx2").cast("decimal(10,0)")
    y = F.col("ry2").cast("decimal(10,0)")
    agg = j2.agg(
        F.sum(c).alias("n"),
        F.sum(c * x).alias("sx"),
        F.sum(c * y).alias("sy"),
        F.sum(c * x * y).alias("sxy"),
        F.sum(c * x * x).alias("sxx"),
        F.sum(c * y * y).alias("syy"),
    )
    return agg.select(
        F.col("n").cast("bigint").alias("n"),
        F.col("sx").cast("bigint").alias("sum_rank2_q"),
        F.col("sy").cast("bigint").alias("sum_rank2_d"),
        F.expr(_SPEARMAN_RHO).alias("spearman_rho"),
    )


STAT_SPEARMAN_SQL = f"""
WITH joint AS (
  SELECT l_quantity AS q, l_discount AS d, COUNT(*) AS cnt
  FROM lineitem GROUP BY 1, 2
), rx AS (
  SELECT q,
         2 * COALESCE(SUM(c) OVER (ORDER BY q
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + c + 1 AS rx2
  FROM (SELECT q, SUM(cnt) AS c FROM joint GROUP BY 1)
), ry AS (
  SELECT d,
         2 * COALESCE(SUM(c) OVER (ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + c + 1 AS ry2
  FROM (SELECT d, SUM(cnt) AS c FROM joint GROUP BY 1)
), agg AS (
  SELECT SUM(CAST(cnt AS DECIMAL(18,0))) AS n,
         SUM(CAST(cnt AS DECIMAL(18,0)) * CAST(rx2 AS DECIMAL(10,0))) AS sx,
         SUM(CAST(cnt AS DECIMAL(18,0)) * CAST(ry2 AS DECIMAL(10,0))) AS sy,
         SUM(CAST(cnt AS DECIMAL(18,0)) * CAST(rx2 AS DECIMAL(10,0))
             * CAST(ry2 AS DECIMAL(10,0))) AS sxy,
         SUM(CAST(cnt AS DECIMAL(18,0)) * CAST(rx2 AS DECIMAL(10,0))
             * CAST(rx2 AS DECIMAL(10,0))) AS sxx,
         SUM(CAST(cnt AS DECIMAL(18,0)) * CAST(ry2 AS DECIMAL(10,0))
             * CAST(ry2 AS DECIMAL(10,0))) AS syy
  FROM joint j JOIN rx ON j.q = rx.q JOIN ry ON j.d = ry.d
)
SELECT CAST(n AS BIGINT) AS n,
       CAST(sx AS BIGINT) AS sum_rank2_q,
       CAST(sy AS BIGINT) AS sum_rank2_d,
       {_SPEARMAN_RHO} AS spearman_rho
FROM agg
"""


# ---------------------------------------------------------------------------
# stat_kendall_tau — tau-b from the contingency table, O(cells²) pairs
# ---------------------------------------------------------------------------

# tau-b = (C − D) / sqrt((n0 − n1)(n0 − n2)); every operand is an
# exact BIGINT (n0 = n(n−1)/2 ≤ 1.8e13 at sf1, exactly representable
# in a double), so one shared IEEE expression finishes it
_KENDALL_TAU = (
    "(CAST(c AS DOUBLE) - CAST(d AS DOUBLE)) / "
    "(SQRT(CAST(n0 AS DOUBLE) - CAST(n1 AS DOUBLE)) * "
    "SQRT(CAST(n0 AS DOUBLE) - CAST(n2 AS DOUBLE)))"
)


def stat_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's tau-b between l_quantity and l_discount — the
    tie-corrected concordant/discordant pair statistic, computed from
    the joint contingency table instead of the O(n²) row-pair space.

    Concordant and discordant pair counts reduce to ONE self-join of
    the ≤ 550-cell joint table (cnt_a·cnt_b per ordered cell pair,
    sign from the discount direction); tie corrections n1/n2 come from
    the marginals as c·(c−1) div 2.  Pair-scale counts (C, D, n0, n1,
    n2 all grow ~n²/2, past BIGINT around sf~500) are exact
    DECIMAL(38,0) — HUGEINT in the oracle — exposed as the identical
    nearest-DOUBLE; tau-b is one closed-form IEEE expression over
    them, shared verbatim with the DuckDB oracle.

    Scale: the only data-sized pass is the same map-side-combinable
    (q, d) count the Spearman query uses; the pair arithmetic is
    O(cells²) — 550² here — regardless of row count, where a naive
    formulation would compare n²/2 ≈ 1.8e13 row pairs at sf1.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").alias("q"), F.col("l_discount").alias("d")
    )
    # no checkpoint: the four consumers share the identical aggregate
    # subtree, so AQE exchange reuse materializes it once, and the
    # lineage stays visible to the plan audit (scan pruning, partials)
    joint = li.groupBy("q", "d").agg(F.count("*").alias("cnt"))
    a = joint.select(
        F.col("q").alias("qa"), F.col("d").alias("da"), F.col("cnt").alias("ca")
    )
    b = joint.select(
        F.col("q").alias("qb"), F.col("d").alias("db"), F.col("cnt").alias("cb")
    )
    # pair products, the halved tie binomials c·(c−1)/2 and n0=n(n−1)/2
    # all pass BIGINT around sf~500: carry them as exact DECIMAL(38,0)
    # (HUGEINT in the oracle) and expose as the identical nearest-DOUBLE.
    # The binomial halves exactly via the even/odd factor split, so no
    # decimal division is needed.
    _half_binom = (
        "SUM(CAST(CASE WHEN c % 2 = 0 THEN c div 2 ELSE c END"
        " AS DECIMAL(38,0))"
        " * CASE WHEN c % 2 = 0 THEN c - 1 ELSE (c - 1) div 2 END)"
    )
    pairs = a.join(
        F.broadcast(b),
        (F.col("qb") > F.col("qa")) & (F.col("db") != F.col("da")),
    ).agg(
        F.expr(
            "SUM(CASE WHEN db > da THEN CAST(ca AS DECIMAL(38,0)) * cb"
            " ELSE CAST(0 AS DECIMAL(38,0)) END)"
        ).alias("c"),
        F.expr(
            "SUM(CASE WHEN db < da THEN CAST(ca AS DECIMAL(38,0)) * cb"
            " ELSE CAST(0 AS DECIMAL(38,0)) END)"
        ).alias("d"),
    )
    n_tot = joint.agg(F.sum("cnt").alias("n"))
    n1 = (
        joint.groupBy("q")
        .agg(F.sum("cnt").alias("c"))
        .agg(F.expr(_half_binom).alias("n1"))
    )
    n2 = (
        joint.groupBy("d")
        .agg(F.sum("cnt").alias("c"))
        .agg(F.expr(_half_binom).alias("n2"))
    )
    out = (
        pairs.crossJoin(n_tot)
        .crossJoin(n1)
        .crossJoin(n2)
        .withColumn(
            "n0",
            F.expr(
                "CAST(CASE WHEN n % 2 = 0 THEN n div 2 ELSE n END"
                " AS DECIMAL(38,0))"
                " * CASE WHEN n % 2 = 0 THEN n - 1 ELSE (n - 1) div 2 END"
            ),
        )
    )
    return out.select(
        "n",
        F.col("c").cast("double").alias("concordant"),
        F.col("d").cast("double").alias("discordant"),
        F.col("n1").cast("double").alias("tied_q_pairs"),
        F.col("n2").cast("double").alias("tied_d_pairs"),
        F.expr(_KENDALL_TAU).alias("kendall_tau_b"),
    )


STAT_KENDALL_SQL = f"""
WITH joint AS (
  SELECT l_quantity AS q, l_discount AS d, COUNT(*) AS cnt
  FROM lineitem GROUP BY 1, 2
), pairs AS (
  SELECT SUM(CASE WHEN b.d > a.d THEN CAST(a.cnt AS HUGEINT) * b.cnt
             ELSE CAST(0 AS HUGEINT) END) AS c,
         SUM(CASE WHEN b.d < a.d THEN CAST(a.cnt AS HUGEINT) * b.cnt
             ELSE CAST(0 AS HUGEINT) END) AS d
  FROM joint a JOIN joint b ON b.q > a.q AND b.d <> a.d
), nn AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM joint),
t1 AS (
  SELECT SUM(CAST(c AS HUGEINT) * (c - 1) // 2) AS n1
  FROM (SELECT CAST(SUM(cnt) AS BIGINT) AS c FROM joint GROUP BY q)
), t2 AS (
  SELECT SUM(CAST(c AS HUGEINT) * (c - 1) // 2) AS n2
  FROM (SELECT CAST(SUM(cnt) AS BIGINT) AS c FROM joint GROUP BY d)
), z AS (
  SELECT n, c, d, n1, n2, CAST(n AS HUGEINT) * (n - 1) // 2 AS n0
  FROM pairs, nn, t1, t2
)
SELECT n, CAST(c AS DOUBLE) AS concordant, CAST(d AS DOUBLE) AS discordant,
       CAST(n1 AS DOUBLE) AS tied_q_pairs, CAST(n2 AS DOUBLE) AS tied_d_pairs,
       {_KENDALL_TAU} AS kendall_tau_b
FROM z
"""


# ---------------------------------------------------------------------------
# stat_skew_kurtosis — higher moments from mergeable integer power sums
# ---------------------------------------------------------------------------

# Shared closed-form over the exact power sums (identical text in Spark
# and DuckDB → identical IEEE doubles). Central moments come from raw
# moments; skewness uses m2·sqrt(m2) instead of pow(m2, 1.5) because
# sqrt is correctly-rounded IEEE everywhere while pow is not.
_MOM_N = "CAST(n AS DOUBLE)"
_MOM_MEAN = f"(CAST(s1 AS DOUBLE) / {_MOM_N})"
_MOM_M2 = f"(CAST(s2 AS DOUBLE) / {_MOM_N} - {_MOM_MEAN} * {_MOM_MEAN})"
_MOM_M3 = (
    f"(CAST(s3 AS DOUBLE) / {_MOM_N}"
    f" - CAST(3 AS DOUBLE) * {_MOM_MEAN} * (CAST(s2 AS DOUBLE) / {_MOM_N})"
    f" + CAST(2 AS DOUBLE) * {_MOM_MEAN} * {_MOM_MEAN} * {_MOM_MEAN})"
)
_MOM_M4 = (
    f"(CAST(s4 AS DOUBLE) / {_MOM_N}"
    f" - CAST(4 AS DOUBLE) * {_MOM_MEAN} * (CAST(s3 AS DOUBLE) / {_MOM_N})"
    f" + CAST(6 AS DOUBLE) * {_MOM_MEAN} * {_MOM_MEAN}"
    f" * (CAST(s2 AS DOUBLE) / {_MOM_N})"
    f" - CAST(3 AS DOUBLE) * {_MOM_MEAN} * {_MOM_MEAN}"
    f" * {_MOM_MEAN} * {_MOM_MEAN})"
)
_MOM_SKEW = f"({_MOM_M3} / ({_MOM_M2} * SQRT({_MOM_M2})))"
_MOM_KURT = f"({_MOM_M4} / ({_MOM_M2} * {_MOM_M2}) - CAST(3 AS DOUBLE))"


def stat_skew_kurtosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority skewness and excess kurtosis of order totals from
    EXACT mergeable sufficient statistics — the one-pass distributed
    answer to "are my group distributions heavy-tailed?".

    The engine-native skewness/kurtosis aggregates accumulate floats in
    partition order and can't hash-match across engines; here the value
    is quantized to whole currency units (floor(x+0.5), ≤7 digits) and
    Σq, Σq², Σq³, Σq⁴ are carried as exact DECIMALs (widths 15/23/31,
    inside DuckDB's strict p1+p2 multiplication budget; the Σq⁴ sum has
    headroom to ~10⁹ rows per group at width 38). The four central
    moments then come from ONE closed-form double expression shared
    verbatim with the oracle.

    Scale: a single map-side-combinable groupBy — partial aggregation
    reduces every partition to 5 decimal cells per group before the
    shuffle, so 100 TB costs one scan plus a groups-sized exchange.
    The same sums merge across days for incremental rollups.
    """
    o = load_table(spark, sf_dir, "orders")
    q = F.expr("CAST(FLOOR(o_totalprice + CAST(0.5 AS DOUBLE)) AS DECIMAL(7,0))")
    agg = o.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        F.sum(q).alias("s1"),
        F.sum(q * q).alias("s2"),
        F.sum(q * q * q).alias("s3"),
        F.sum(q * q * q * q).alias("s4"),
    )
    return agg.selectExpr(
        "o_orderpriority",
        "CAST(n AS BIGINT) AS n",
        "CAST(s1 AS BIGINT) AS sum_units",
        f"{_MOM_MEAN} AS mean_units",
        f"{_MOM_M2} AS var_units",
        f"{_MOM_SKEW} AS skewness",
        f"{_MOM_KURT} AS kurtosis_excess",
    ).orderBy("o_orderpriority")


STAT_MOMENTS_SQL = f"""
WITH qv AS (
  SELECT o_orderpriority,
         CAST(FLOOR(o_totalprice + CAST(0.5 AS DOUBLE)) AS DECIMAL(7,0)) AS q
  FROM orders
), agg AS (
  SELECT o_orderpriority, COUNT(*) AS n,
         SUM(q) AS s1, SUM(q*q) AS s2,
         -- DuckDB clamps int64-range decimal multiplies at width 18
         -- (q³ would overflow); the DECIMAL(19) casts force the exact
         -- hugeint path (widths 26 / 38)
         SUM(CAST(q*q AS DECIMAL(19,0)) * q) AS s3,
         SUM(CAST(q*q AS DECIMAL(19,0)) * CAST(q*q AS DECIMAL(19,0))) AS s4
  FROM qv GROUP BY 1
)
SELECT o_orderpriority,
       CAST(n AS BIGINT) AS n,
       CAST(s1 AS BIGINT) AS sum_units,
       {_MOM_MEAN} AS mean_units,
       {_MOM_M2} AS var_units,
       {_MOM_SKEW} AS skewness,
       {_MOM_KURT} AS kurtosis_excess
FROM agg
ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# stat_survival_lifetable — Kaplan-Meier-style life table + Nelson-Aalen
# ---------------------------------------------------------------------------

_SURV_CHURN_DAYS = 3  # users silent for the last 3 days are "churned"

# the per-interval hazard is ONE IEEE division over exact integers —
# shared verbatim between engines
_SURV_HAZARD = "CAST(n_event AS DOUBLE) / CAST(n_risk AS DOUBLE)"


def stat_survival_lifetable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified right-censored survival life tables — the
    Kaplan-Meier input table plus the Nelson-Aalen cumulative hazard,
    one stratum per event_type (the KM-by-treatment-arm shape).

    A (user, event_type) span's duration is the whole days between the
    user's first event of that type and their last; the "death" (churn)
    indicator is last activity of that type more than 3 days before the
    corpus horizon, else the span is right-censored. For each stratum
    and distinct duration t: n_risk = spans with duration ≥ t (a
    reversed running sum), n_event / n_censored at t, the interval
    hazard d/n (one exactly-rounded IEEE division, shared verbatim),
    and the Nelson-Aalen cumulative hazard carried EXACTLY in ppm
    integers (1e6·d div n, running BIGINT sum) so the output
    hash-matches without relying on float summation order.

    Scale: the per-span min/max groupBy is the only data-sized pass
    (map-side combinable); the life table itself is
    strata × distinct-durations-sized, so the two windows run over a
    tiny relation. 100 TB of events → one scan + a spans-sized
    exchange.
    """
    e = load_table(spark, sf_dir, "events")
    horizon = e.agg(F.max("ts").alias("horizon"))
    spans = (
        e.groupBy("user_id", "event_type")
        .agg(F.min("ts").alias("first_ts"), F.max("ts").alias("last_ts"))
        .crossJoin(F.broadcast(horizon))
        .select(
            "event_type",
            F.datediff(F.to_date("last_ts"), F.to_date("first_ts"))
            .alias("dur_days"),
            (
                F.col("last_ts")
                < F.col("horizon") - F.expr(f"INTERVAL {_SURV_CHURN_DAYS} DAYS")
            )
            .cast("long")
            .alias("churned"),
        )
    )
    g = spans.groupBy("event_type", "dur_days").agg(
        F.count("*").alias("n_total"), F.sum("churned").alias("n_event")
    )
    w_risk = (
        Window.partitionBy("event_type")
        .orderBy("dur_days")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("dur_days")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    lt = g.select(
        "event_type",
        "dur_days",
        F.sum("n_total").over(w_risk).alias("n_risk"),
        "n_event",
        (F.col("n_total") - F.col("n_event")).alias("n_censored"),
    ).withColumn("hazard_ppm", F.expr("(1000000 * n_event) div n_risk"))
    return lt.select(
        "event_type",
        "dur_days",
        "n_risk",
        "n_event",
        "n_censored",
        F.expr(_SURV_HAZARD).alias("hazard"),
        "hazard_ppm",
        F.sum("hazard_ppm").over(w_cum).alias("cum_hazard_ppm"),
    ).orderBy("event_type", "dur_days")


STAT_SURVIVAL_SQL = f"""
WITH horizon AS (SELECT MAX(ts) AS horizon FROM events),
spans AS (
  SELECT event_type,
         DATEDIFF('day', CAST(MIN(ts) AS DATE), CAST(MAX(ts) AS DATE))
           AS dur_days,
         CASE WHEN MAX(ts) < (SELECT horizon FROM horizon)
                              - INTERVAL {_SURV_CHURN_DAYS} DAY
              THEN 1 ELSE 0 END AS churned
  FROM events GROUP BY user_id, event_type
), g AS (
  SELECT event_type, dur_days, COUNT(*) AS n_total, SUM(churned) AS n_event
  FROM spans GROUP BY 1, 2
), lt AS (
  SELECT event_type, dur_days,
         SUM(n_total) OVER (PARTITION BY event_type ORDER BY dur_days
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS n_risk,
         CAST(n_event AS BIGINT) AS n_event,
         CAST(n_total - n_event AS BIGINT) AS n_censored
  FROM g
), lh AS (
  SELECT *, (1000000 * n_event) // n_risk AS hazard_ppm FROM lt
)
SELECT event_type, dur_days, CAST(n_risk AS BIGINT) AS n_risk,
       n_event, n_censored,
       {_SURV_HAZARD} AS hazard,
       CAST(hazard_ppm AS BIGINT) AS hazard_ppm,
       CAST(SUM(hazard_ppm) OVER (PARTITION BY event_type ORDER BY dur_days
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_hazard_ppm
FROM lh
ORDER BY event_type, dur_days
"""


# ---------------------------------------------------------------------------
# stat_cem_att — coarsened exact matching, average treatment effect
# ---------------------------------------------------------------------------

_CEM_TREATMENT = "BUILDING"  # "treated" = customers in this segment
_CEM_BAL_BIN = 2000  # account-balance coarsening width

# final ATT as dollars: two exactly-rounded IEEE divisions over exact
# integers, shared verbatim between engines
_CEM_ATT = (
    "CAST(att_num AS DOUBLE) / CAST(m_t AS DOUBLE)"
    " / CAST(1000000 AS DOUBLE)"
)


def stat_cem_att(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coarsened Exact Matching (CEM) estimate of the average treatment
    effect on the treated — the causal-inference primitive for
    observational data: does the BUILDING market segment spend more per
    order than comparable customers?

    Covariates are COARSENED (nation → region, account balance →
    2000-wide bins, order priority kept exact) and units match within
    strata containing both treated and control orders; unmatched
    treated units are pruned (reported, per CEM practice). Within each
    matched stratum the control mean is quantized to micro-cents by
    integer division, so the treated-count-weighted ATT numerator
    Σ_s (ΣY_T·10⁴ − n_T·ȳ_C^micro) accumulates as an EXACT BIGINT —
    no float summation over strata — and the final dollar value is two
    shared-verbatim IEEE divisions.

    Scale: one customer-dim join by stats/AQE (user grain grows with
    SF) + one map-side-combinable stratum
    aggregation over the fact table; everything after runs on
    #strata rows. The same stratum cells merge across data increments.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    cents = F.expr(
        "CAST(FLOOR(o_totalprice * CAST(100 AS DOUBLE)"
        " + CAST(0.5 AS DOUBLE)) AS BIGINT)"
    )
    units = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(
            F.col("n_regionkey").alias("region"),
            F.expr(f"CAST(FLOOR(c_acctbal / CAST({_CEM_BAL_BIN} AS DOUBLE))"
                   " AS BIGINT)").alias("bal_bin"),
            "o_orderpriority",
            (F.col("c_mktsegment") == _CEM_TREATMENT).cast("long").alias("t"),
            cents.alias("y_cents"),
        )
    )
    strata = units.groupBy("region", "bal_bin", "o_orderpriority").agg(
        F.sum("t").alias("n_t"),
        (F.count("*") - F.sum("t")).alias("n_c"),
        F.sum(F.expr("IF(t = 1, y_cents, 0)")).alias("sum_t"),
        F.sum(F.expr("IF(t = 1, 0, y_cents)")).alias("sum_c"),
    )
    matched = strata.filter((F.col("n_t") > 0) & (F.col("n_c") > 0)).selectExpr(
        "n_t",
        "n_c",
        "sum_t",
        "(10000 * sum_c) div n_c AS mc_micro",
    )
    agg = matched.agg(
        F.count("*").alias("n_strata_matched"),
        F.sum("n_t").alias("m_t"),
        F.sum("n_c").alias("m_c"),
        F.sum(F.expr("10000 * sum_t - n_t * mc_micro")).alias("att_num"),
    )
    unmatched = (
        strata.filter((F.col("n_t") > 0) & (F.col("n_c") == 0))
        .agg(F.coalesce(F.sum("n_t"), F.lit(0)).alias("n_treated_unmatched"))
    )
    return agg.crossJoin(F.broadcast(unmatched)).selectExpr(
        "n_strata_matched",
        "m_t AS n_treated_matched",
        "m_c AS n_control_matched",
        "CAST(n_treated_unmatched AS BIGINT) AS n_treated_unmatched",
        "att_num div m_t AS att_micro_cents",
        f"{_CEM_ATT} AS att_dollars",
    )


STAT_CEM_SQL = f"""
WITH units AS (
  SELECT n.n_regionkey AS region,
         CAST(FLOOR(c_acctbal / CAST({_CEM_BAL_BIN} AS DOUBLE)) AS BIGINT)
           AS bal_bin,
         o_orderpriority,
         CASE WHEN c_mktsegment = '{_CEM_TREATMENT}' THEN 1 ELSE 0 END AS t,
         CAST(FLOOR(o_totalprice * CAST(100 AS DOUBLE)
              + CAST(0.5 AS DOUBLE)) AS BIGINT) AS y_cents
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
), strata AS (
  SELECT region, bal_bin, o_orderpriority,
         SUM(t) AS n_t, COUNT(*) - SUM(t) AS n_c,
         SUM(CASE WHEN t = 1 THEN y_cents ELSE 0 END) AS sum_t,
         SUM(CASE WHEN t = 1 THEN 0 ELSE y_cents END) AS sum_c
  FROM units GROUP BY 1, 2, 3
), matched AS (
  SELECT n_t, n_c, sum_t, (10000 * sum_c) // n_c AS mc_micro
  FROM strata WHERE n_t > 0 AND n_c > 0
), agg AS (
  SELECT COUNT(*) AS n_strata_matched,
         CAST(SUM(n_t) AS BIGINT) AS m_t,
         CAST(SUM(n_c) AS BIGINT) AS m_c,
         CAST(SUM(10000 * sum_t - n_t * mc_micro) AS BIGINT) AS att_num
  FROM matched
), unmatched AS (
  SELECT COALESCE(SUM(n_t), 0) AS n_treated_unmatched
  FROM strata WHERE n_t > 0 AND n_c = 0
)
SELECT n_strata_matched, m_t AS n_treated_matched, m_c AS n_control_matched,
       CAST(n_treated_unmatched AS BIGINT) AS n_treated_unmatched,
       att_num // m_t AS att_micro_cents,
       {_CEM_ATT} AS att_dollars
FROM agg, unmatched
"""


# ---------------------------------------------------------------------------
# stat_qini_uplift — uplift (Qini) curve by targeting decile
# ---------------------------------------------------------------------------

# the repo's portable sticky-assignment hash (stat_ab_assignment)
_QINI_BUCKET_SPARK = (
    "CAST(conv(substring(md5(concat('exp1|', CAST(user_id AS STRING)))"
    ", 1, 15), 16, 10) AS BIGINT) % 100"
)
_QINI_BUCKET_DUCK = (
    "('0x' || substr(md5('exp1|' || CAST(user_id AS VARCHAR)), 1, 15))"
    "::BIGINT % 100"
)
# Qini (absolute-numbers convention) and cumulative uplift — shared
# verbatim IEEE expressions over exact cumulative integers; NULL while
# an arm is still empty (tiny-SF head deciles)
_QINI_VALUE = (
    "CASE WHEN n_c_cum = 0 THEN NULL ELSE"
    " CAST(y_t_cum AS DOUBLE) - CAST(y_c_cum AS DOUBLE)"
    " * CAST(n_t_cum AS DOUBLE) / CAST(n_c_cum AS DOUBLE) END"
)
_QINI_UPLIFT = (
    "CASE WHEN n_t_cum = 0 OR n_c_cum = 0 THEN NULL ELSE"
    " CAST(y_t_cum AS DOUBLE) / CAST(n_t_cum AS DOUBLE)"
    " - CAST(y_c_cum AS DOUBLE) / CAST(n_c_cum AS DOUBLE) END"
)


def stat_qini_uplift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qini / uplift curve — the evaluation primitive of uplift
    modeling: rank users by a targeting score, then ask, decile by
    decile, how many EXTRA conversions the treated arm produced over
    the control arm's rate. The treatment arm is the repo's sticky
    portable hash split (stat_ab_assignment); the targeting score is
    the user's click count (a deterministic engagement proxy); the
    outcome is any purchase.

    Deciles come from NTILE(10) over (score DESC, user_id) — a total
    order, so both engines bucket identically. The user table GROWS
    with the data, so the decile cut runs through
    operators/ranking.range_ntile (range-partitioned two-pass rank +
    integer bucket arithmetic — bit-identical to ANSI NTILE, no
    single-partition exchange; score DESC rides as an exact integer
    negation). Per-decile arm counts and their running sums stay
    BIGINT, and the Qini value / cumulative uplift are shared-verbatim
    IEEE expressions over those exact integers; everything after the
    decile groupBy is 10 rows."""
    from ..operators.ranking import range_ntile

    e = load_table(spark, sf_dir, "events")
    users = e.groupBy("user_id").agg(
        F.sum(F.expr("IF(event_type = 'click', 1, 0)")).alias("score"),
        F.max(F.expr("IF(event_type = 'purchase', 1, 0)")).alias("y"),
    ).withColumn("t", F.expr(f"IF({_QINI_BUCKET_SPARK} >= 50, 1, 0)"))
    deciles = range_ntile(
        users.withColumn("neg_score", -F.col("score")),
        ["neg_score", "user_id"],
        10,
        "decile",
    ).drop("neg_score")
    g = deciles.groupBy("decile").agg(
        F.sum("t").alias("n_t"),
        (F.count("*") - F.sum("t")).alias("n_c"),
        F.sum(F.expr("t * y")).alias("y_t"),
        F.sum(F.expr("(1 - t) * y")).alias("y_c"),
    )
    w_cum = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = g.select(
        "decile",
        "n_t",
        "n_c",
        "y_t",
        "y_c",
        F.sum("n_t").over(w_cum).alias("n_t_cum"),
        F.sum("n_c").over(w_cum).alias("n_c_cum"),
        F.sum("y_t").over(w_cum).alias("y_t_cum"),
        F.sum("y_c").over(w_cum).alias("y_c_cum"),
    )
    return cum.selectExpr(
        "decile",
        "n_t", "n_c", "y_t", "y_c",
        "n_t_cum", "n_c_cum", "y_t_cum", "y_c_cum",
        f"{_QINI_VALUE} AS qini",
        f"{_QINI_UPLIFT} AS uplift_cum",
    ).orderBy("decile")


STAT_QINI_SQL = f"""
WITH users AS (
  SELECT user_id,
         SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS score,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y,
         CASE WHEN {_QINI_BUCKET_DUCK} >= 50 THEN 1 ELSE 0 END AS t
  FROM events GROUP BY user_id
), deciles AS (
  SELECT *, NTILE(10) OVER (ORDER BY score DESC, user_id) AS decile
  FROM users
), g AS (
  SELECT decile,
         CAST(SUM(t) AS BIGINT) AS n_t,
         CAST(COUNT(*) - SUM(t) AS BIGINT) AS n_c,
         CAST(SUM(t * y) AS BIGINT) AS y_t,
         CAST(SUM((1 - t) * y) AS BIGINT) AS y_c
  FROM deciles GROUP BY 1
), cum AS (
  SELECT decile, n_t, n_c, y_t, y_c,
         CAST(SUM(n_t) OVER (ORDER BY decile
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS n_t_cum,
         CAST(SUM(n_c) OVER (ORDER BY decile
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS n_c_cum,
         CAST(SUM(y_t) OVER (ORDER BY decile
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS y_t_cum,
         CAST(SUM(y_c) OVER (ORDER BY decile
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS y_c_cum
  FROM g
)
SELECT decile, n_t, n_c, y_t, y_c, n_t_cum, n_c_cum, y_t_cum, y_c_cum,
       {_QINI_VALUE} AS qini,
       {_QINI_UPLIFT} AS uplift_cum
FROM cum
ORDER BY decile
"""


# ---------------------------------------------------------------------------
# stat_anova_oneway — one-way ANOVA from exact per-group sufficient stats
# ---------------------------------------------------------------------------

# SSB = Σ_g n_g·(ȳ_g − ȳ)², SSW = SST − SSB, F = (SSB/(k−1))/(SSW/(n−k)).
# Every Σ is an exact decimal; the one shared IEEE expression uses the
# computational forms SST = s2 − s1²/n and SSB = Σ(s1_g²/n_g) − s1²/n,
# evaluated identically in both engines.
_ANOVA_SSB = (
    "(CAST(sum_sq_over_n AS DOUBLE)"
    " - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))"
)
_ANOVA_SST = (
    "(CAST(s2 AS DOUBLE)"
    " - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))"
)
_ANOVA_F = (
    f"(({_ANOVA_SSB} / (CAST(k AS DOUBLE) - CAST(1 AS DOUBLE)))"
    f" / (({_ANOVA_SST} - {_ANOVA_SSB})"
    f" / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))))"
)


def stat_anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA: does mean order value differ across priorities?
    The F-statistic reduces ENTIRELY to per-group exact sufficient
    statistics — n_g, Σy, Σy² in cents (decimal-exact) — so a 100 TB
    fact table costs one map-side-combinable groupBy; the between- and
    within-group sums of squares come from the computational forms and
    the single shared IEEE expression at the end.

    The per-group s1_g²/n_g term can't stay a whole number (n_g does
    not divide s1_g²), so it is carried TRUNCATED to whole units —
    (s1_g·s1_g) div n_g, an exact integral division in both engines
    (Spark IntegralDivide on decimals → BIGINT; DuckDB HUGEINT //) —
    losing <1 unit per group, invisible at double precision and
    IDENTICAL across engines. Values are whole-dollar units (the
    stat_skew_kurtosis quantization) so the quotient fits BIGINT
    through ~sf100. Output: one row with k, n, SSB/SST and F."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.expr(
        "CAST(FLOOR(o_totalprice + CAST(0.5 AS DOUBLE)) AS BIGINT)"
    )
    per_g = (
        o.select("o_orderpriority", cents.alias("c"))
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_g"),
            F.sum(F.col("c").cast("decimal(18,0)")).alias("s1_g"),
            F.sum(
                F.col("c").cast("decimal(18,0)") * F.col("c").cast("decimal(18,0)")
            ).alias("s2_g"),
        )
    )
    tot = per_g.agg(
        F.count("*").alias("k"),
        F.sum("n_g").alias("n"),
        F.sum("s1_g").alias("s1"),
        F.sum("s2_g").alias("s2"),
        F.sum(F.expr("(s1_g * s1_g) div n_g")).alias("ssq_n_trunc"),
    )
    return tot.selectExpr(
        "CAST(k AS BIGINT) AS k",
        "CAST(n AS BIGINT) AS n",
        "CAST(ssq_n_trunc AS BIGINT) AS sum_sq_over_n_units",
        f"{_ANOVA_SSB.replace('sum_sq_over_n', 'ssq_n_trunc')} AS ss_between",
        f"{_ANOVA_SST} AS ss_total",
        f"{_ANOVA_F.replace('sum_sq_over_n', 'ssq_n_trunc')} AS f_stat",
    )


STAT_ANOVA_SQL = f"""
WITH per_g AS (
  SELECT o_orderpriority, COUNT(*) AS n_g,
         SUM(CAST(c AS DECIMAL(18,0))) AS s1_g,
         SUM(CAST(c AS DECIMAL(18,0)) * CAST(c AS DECIMAL(18,0))) AS s2_g
  FROM (
    SELECT o_orderpriority,
           CAST(FLOOR(o_totalprice + CAST(0.5 AS DOUBLE)) AS BIGINT) AS c
    FROM orders
  ) GROUP BY 1
), tot AS (
  SELECT COUNT(*) AS k, SUM(n_g) AS n, SUM(s1_g) AS s1, SUM(s2_g) AS s2,
         SUM(CAST(s1_g * s1_g AS HUGEINT) // CAST(n_g AS HUGEINT))
           AS ssq_n_trunc
  FROM per_g
)
SELECT CAST(k AS BIGINT) AS k,
       CAST(n AS BIGINT) AS n,
       CAST(ssq_n_trunc AS BIGINT) AS sum_sq_over_n_units,
       {_ANOVA_SSB.replace('sum_sq_over_n', 'ssq_n_trunc')} AS ss_between,
       {_ANOVA_SST} AS ss_total,
       {_ANOVA_F.replace('sum_sq_over_n', 'ssq_n_trunc')} AS f_stat
FROM tot
"""


# ---------------------------------------------------------------------------
# stat_trimmed_mean — robust per-group location (5% two-sided trim)
# ---------------------------------------------------------------------------

_TRIM_PCT = 5


def stat_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5%-trimmed mean per order priority — the robust-location
    counterpart to stat_mad_outliers' robust scale: drop the bottom
    and top floor(n·5/100) order totals (rank ties broken by
    o_orderkey, so the trim set is identical in both engines) and
    average the rest from exact cent sums. Emitted next to the
    untrimmed mean so the tail influence is visible.

    Scale: the per-group rank is operators/ranking.grouped_range_rank —
    a window partitioned by the 5-value priority would sort a fifth of
    orders in ONE task at any scale; the range-partitioned two-pass
    rank keeps parallelism at #partitions — and everything after is a
    map-side-combinable aggregate."""
    from ..operators.ranking import grouped_range_rank

    o = load_table(spark, sf_dir, "orders")
    cents = F.expr(
        "CAST(FLOOR(o_totalprice * CAST(100 AS DOUBLE)"
        " + CAST(0.5 AS DOUBLE)) AS BIGINT)"
    )
    ranked = grouped_range_rank(
        o.select("o_orderpriority", "o_orderkey", cents.alias("c")),
        ["o_orderpriority"],
        ["c", "o_orderkey"],
        "r",
        count_col="n",
    ).withColumn("k", F.expr(f"(n * {_TRIM_PCT}) div 100"))
    return (
        ranked.groupBy("o_orderpriority")
        .agg(
            F.max("n").alias("n"),
            F.max("k").alias("n_trimmed_each_side"),
            F.sum("c").alias("sum_all"),
            F.sum(F.expr("IF(r > k AND r <= n - k, c, 0)")).alias("sum_kept"),
            F.sum(F.expr("IF(r > k AND r <= n - k, 1, 0)")).alias("n_kept"),
        )
        .selectExpr(
            "o_orderpriority",
            "n",
            "n_trimmed_each_side",
            "CAST(sum_all AS DOUBLE) / CAST(n AS DOUBLE) AS mean_cents",
            "CAST(sum_kept AS DOUBLE) / CAST(n_kept AS DOUBLE)"
            " AS trimmed_mean_cents",
            "CAST(sum_kept AS BIGINT) AS sum_kept_cents",
            "CAST(n_kept AS BIGINT) AS n_kept",
        )
        .orderBy("o_orderpriority")
    )


STAT_TRIM_SQL = f"""
WITH ranked AS (
  SELECT o_orderpriority, c,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
           ORDER BY c, o_orderkey) AS r,
         COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
  FROM (
    SELECT o_orderpriority, o_orderkey,
           CAST(FLOOR(o_totalprice * CAST(100 AS DOUBLE)
                + CAST(0.5 AS DOUBLE)) AS BIGINT) AS c
    FROM orders
  )
), cut AS (SELECT *, (n * {_TRIM_PCT}) // 100 AS k FROM ranked)
SELECT o_orderpriority,
       CAST(MAX(n) AS BIGINT) AS n,
       CAST(MAX(k) AS BIGINT) AS n_trimmed_each_side,
       CAST(SUM(c) AS DOUBLE) / CAST(MAX(n) AS DOUBLE) AS mean_cents,
       CAST(SUM(CASE WHEN r > k AND r <= n - k THEN c ELSE 0 END) AS DOUBLE)
         / CAST(SUM(CASE WHEN r > k AND r <= n - k THEN 1 ELSE 0 END)
                AS DOUBLE) AS trimmed_mean_cents,
       CAST(SUM(CASE WHEN r > k AND r <= n - k THEN c ELSE 0 END) AS BIGINT)
         AS sum_kept_cents,
       CAST(SUM(CASE WHEN r > k AND r <= n - k THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kept
FROM cut
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# stat_control_chart — X-bar process-control chart over monthly subgroups
# ---------------------------------------------------------------------------

# global mean / stddev from exact cent sums (sqrt is correctly-rounded
# IEEE); subgroup z-score shares the same verbatim text in both engines
_XBAR_MU = "(CAST(g_c1 AS DOUBLE) / CAST(g_n AS DOUBLE))"
_XBAR_SD = (
    "SQRT(CAST(g_c2 AS DOUBLE) / CAST(g_n AS DOUBLE)"
    f" - {_XBAR_MU} * {_XBAR_MU})"
)
_XBAR_Z = (
    f"((CAST(c1 AS DOUBLE) / CAST(n AS DOUBLE)) - {_XBAR_MU})"
    f" / ({_XBAR_SD} / SQRT(CAST(n AS DOUBLE)))"
)


def stat_control_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-bar process-control chart — the SPC monitor every data-quality
    pipeline hangs on a metric: monthly subgroup means of the order
    total against ±3σ/√n control limits derived from the whole
    process. Everything reduces to exact cent sums (one map-side
    combinable groupBy to ~80 month cells; the global sums are one
    window over those cells, NOT a second scan), and the z-score /
    limit flags are shared-verbatim IEEE expressions, so out-of-control
    months match bit-for-bit across engines."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.expr(
        "CAST(FLOOR(o_totalprice * CAST(100 AS DOUBLE)"
        " + CAST(0.5 AS DOUBLE)) AS BIGINT)"
    )
    q2 = "CAST(c AS DECIMAL(18,0)) * CAST(c AS DECIMAL(18,0))"
    monthly = (
        o.select(
            F.expr("CAST(date_format(o_orderdate, 'yyyy-MM') AS STRING)")
            .alias("ym"),
            cents.alias("c"),
        )
        .groupBy("ym")
        .agg(
            F.count("*").alias("n"),
            F.sum("c").alias("c1"),
            F.sum(F.expr(q2)).alias("c2"),
        )
    )
    wall = Window.partitionBy()
    g = monthly.select(
        "ym",
        "n",
        "c1",
        F.sum("n").over(wall).alias("g_n"),
        F.sum("c1").over(wall).alias("g_c1"),
        F.sum("c2").over(wall).alias("g_c2"),
    )
    return g.selectExpr(
        "ym",
        "n",
        "CAST(c1 AS BIGINT) AS sum_cents",
        f"CAST(c1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean_cents",
        f"{_XBAR_Z} AS z",
        f"ABS({_XBAR_Z}) > CAST(3 AS DOUBLE) AS out_of_control",
    ).orderBy("ym")


STAT_XBAR_SQL = f"""
WITH monthly AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS ym,
         COUNT(*) AS n,
         SUM(c) AS c1,
         SUM(CAST(c AS DECIMAL(18,0)) * CAST(c AS DECIMAL(18,0))) AS c2
  FROM (
    SELECT o_orderdate,
           CAST(FLOOR(o_totalprice * CAST(100 AS DOUBLE)
                + CAST(0.5 AS DOUBLE)) AS BIGINT) AS c
    FROM orders
  ) GROUP BY 1
), g AS (
  SELECT ym, n, c1,
         SUM(n) OVER () AS g_n,
         SUM(c1) OVER () AS g_c1,
         SUM(c2) OVER () AS g_c2
  FROM monthly
)
SELECT ym, n,
       CAST(c1 AS BIGINT) AS sum_cents,
       CAST(c1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean_cents,
       {_XBAR_Z} AS z,
       ABS({_XBAR_Z}) > CAST(3 AS DOUBLE) AS out_of_control
FROM g
ORDER BY ym
"""


# ---------------------------------------------------------------------------
# stat_eb_shrinkage — empirical-Bayes rate shrinkage and re-ranking
# ---------------------------------------------------------------------------

_EB_ALPHA, _EB_BETA = 5, 95  # Beta prior (strength 100, mean 5%)

_EB_RAW = "CAST(y AS DOUBLE) / CAST(n AS DOUBLE)"
_EB_SHRUNK = (
    f"(CAST(y AS DOUBLE) + CAST({_EB_ALPHA} AS DOUBLE))"
    f" / (CAST(n AS DOUBLE) + CAST({_EB_ALPHA + _EB_BETA} AS DOUBLE))"
)


def stat_eb_shrinkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical-Bayes (Beta-binomial) shrinkage ranking — "which
    nation has the best F-completion rate?" answered the way a
    league-table should be: each nation's raw rate y/n is pulled
    toward the Beta(5, 95) prior mean by its evidence weight,
    posterior mean (y+α)/(n+α+β), so small-sample flukes stop topping
    the ranking. Both the raw and shrunk ranks are emitted with the
    rank movement.

    Everything reduces over one stats/AQE-planned customer-dim join +
    one map-side
    combinable groupBy to 25 rows; rates are ppm-exact integers
    (portable trunc division) plus shared-verbatim IEEE doubles; the
    re-ranking windows run over the 25-row table."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    g = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_nationkey", "n_name")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.expr("IF(o_orderstatus = 'F', 1, 0)")).alias("y"),
        )
    )
    ranked = g.selectExpr(
        "n_nationkey",
        "n_name",
        "n",
        "y",
        "(1000000 * y) div n AS raw_ppm",
        f"(1000000 * (y + {_EB_ALPHA})) div (n + {_EB_ALPHA + _EB_BETA})"
        " AS shrunk_ppm",
        f"{_EB_RAW} AS raw_rate",
        f"{_EB_SHRUNK} AS shrunk_rate",
    )
    w_raw = Window.orderBy(F.desc("raw_ppm"), "n_nationkey")
    w_shr = Window.orderBy(F.desc("shrunk_ppm"), "n_nationkey")
    return (
        ranked.withColumn("rank_raw", F.row_number().over(w_raw))
        .withColumn("rank_shrunk", F.row_number().over(w_shr))
        .withColumn("rank_delta", F.col("rank_raw") - F.col("rank_shrunk"))
        .orderBy("rank_shrunk")
    )


STAT_EB_SQL = f"""
WITH g AS (
  SELECT n_nationkey, n_name, COUNT(*) AS n,
         SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS y
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation nt ON c.c_nationkey = nt.n_nationkey
  GROUP BY 1, 2
), ranked AS (
  SELECT n_nationkey, n_name,
         CAST(n AS BIGINT) AS n, CAST(y AS BIGINT) AS y,
         CAST((1000000 * y) // n AS BIGINT) AS raw_ppm,
         CAST((1000000 * (y + {_EB_ALPHA})) // (n + {_EB_ALPHA + _EB_BETA})
              AS BIGINT) AS shrunk_ppm,
         {_EB_RAW} AS raw_rate,
         {_EB_SHRUNK} AS shrunk_rate
  FROM g
)
SELECT n_nationkey, n_name, n, y, raw_ppm, shrunk_ppm, raw_rate,
       shrunk_rate,
       CAST(rr AS INT) AS rank_raw,
       CAST(rs AS INT) AS rank_shrunk,
       CAST(rr - rs AS INT) AS rank_delta
FROM (
  SELECT *,
         ROW_NUMBER() OVER (ORDER BY raw_ppm DESC, n_nationkey) AS rr,
         ROW_NUMBER() OVER (ORDER BY shrunk_ppm DESC, n_nationkey) AS rs
  FROM ranked
)
ORDER BY rs
"""


# ---------------------------------------------------------------------------
# stat_friedman — within-block rank test across treatments
# ---------------------------------------------------------------------------

_FRIED_CHI2 = (
    "12.0 / (nb * kt * (kt + 1)) * r2sum - 3.0 * nb * (kt + 1)"
)


def stat_friedman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman test — the nonparametric repeated-measures ANOVA:
    months are BLOCKS, order priorities are TREATMENTS, each complete
    block ranks its 5 treatments by exact monthly cents (ties break on the
    treatment name — deterministic), and χ²_F folds the per-treatment
    rank sums through the closed form 12/(n·k·(k+1))·ΣR² − 3n(k+1).
    Every input to the double expression is an exact integer.

    Scale: one month×priority rollup (map-side combinable), a rank
    window PARTITIONED BY BLOCK (parallelism = blocks), a k-row rank-sum
    table; incomplete blocks are excluded exactly as the textbook test
    requires."""
    o = load_table(spark, sf_dir, "orders").select(
        F.expr("CAST(date_trunc('month', o_orderdate) AS DATE)").alias("day"),
        F.col("o_orderpriority").alias("trt"),
        F.expr(
            "CAST(FLOOR(o_totalprice * CAST(100 AS DOUBLE)"
            " + CAST(0.5 AS DOUBLE)) AS BIGINT)"
        ).alias("cents"),
    )
    cells = o.groupBy("day", "trt").agg(F.sum("cents").alias("v"))
    w_blk = Window.partitionBy("day")
    complete = cells.withColumn("k", F.count("*").over(w_blk)).filter(
        F.col("k") == 5
    )
    w_rank = Window.partitionBy("day").orderBy("v", "trt")
    ranked = complete.withColumn("r", F.row_number().over(w_rank))
    sums = ranked.groupBy("trt").agg(
        F.sum("r").alias("rank_sum"), F.count("*").alias("n_blocks")
    )
    wall = Window.partitionBy()
    out = sums.select(
        "trt",
        F.col("rank_sum").cast("long").alias("rank_sum"),
        F.col("n_blocks").cast("long").alias("n_blocks"),
        F.count("*").over(wall).cast("double").alias("kt"),
        F.max("n_blocks").over(wall).cast("double").alias("nb"),
        F.sum(F.expr("rank_sum * rank_sum")).over(wall)
        .cast("double")
        .alias("r2sum"),
    )
    return out.select(
        "trt",
        "rank_sum",
        "n_blocks",
        F.expr(f"ROUND({_FRIED_CHI2}, 6)").alias("chi2_f"),
    ).orderBy("trt")


STAT_FRIEDMAN_SQL = f"""
WITH cells AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS day,
         o_orderpriority AS trt,
         SUM(CAST(FLOOR(o_totalprice * CAST(100 AS DOUBLE)
              + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS v
  FROM orders GROUP BY 1, 2
), complete AS (
  SELECT * FROM (
    SELECT *, COUNT(*) OVER (PARTITION BY day) AS k FROM cells
  ) WHERE k = 5
), ranked AS (
  SELECT day, trt,
         ROW_NUMBER() OVER (PARTITION BY day ORDER BY v, trt) AS r
  FROM complete
), sums AS (
  SELECT trt, SUM(r) AS rank_sum, COUNT(*) AS n_blocks FROM ranked GROUP BY 1
), folded AS (
  SELECT trt, CAST(rank_sum AS BIGINT) AS rank_sum,
         CAST(n_blocks AS BIGINT) AS n_blocks,
         CAST(COUNT(*) OVER () AS DOUBLE) AS kt,
         CAST(MAX(n_blocks) OVER () AS DOUBLE) AS nb,
         CAST(SUM(rank_sum * rank_sum) OVER () AS DOUBLE) AS r2sum
  FROM sums
)
SELECT trt, rank_sum, n_blocks, ROUND({_FRIED_CHI2}, 6) AS chi2_f
FROM folded ORDER BY trt
"""


# ---------------------------------------------------------------------------
# stat_influence_diag — regression influence diagnostics (Cook's D)
# ---------------------------------------------------------------------------

_INF_SLOPE = "(n * sxy - sx * sy) / (n * sxx - sx * sx)"
_INF_INTERCEPT = f"(sy - ({_INF_SLOPE}) * sx) / n"
_INF_MSE = (
    f"(syy - ({_INF_INTERCEPT}) * sy - ({_INF_SLOPE}) * sxy) / (n - 2)"
)
_INF_H = "(CAST(1 AS DOUBLE) / n + (x - sx / n) * (x - sx / n) / (sxx - sx * sx / n))"
_INF_RESID = f"(y - (({_INF_INTERCEPT}) + ({_INF_SLOPE}) * x))"
_INF_COOKS = (
    f"ROUND(({_INF_RESID}) * ({_INF_RESID}) * ({_INF_H})"
    f" / (2 * ({_INF_MSE}) * (1 - ({_INF_H})) * (1 - ({_INF_H}))), 9)"
)


def stat_influence_diag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regression INFLUENCE diagnostics — Cook's distance + leverage for
    the price~quantity fit, top-10 most influential line items (the
    "which rows move my model" audit that should precede any fit on
    100 TB). Closed-form for simple regression: leverage hᵢ = 1/n +
    (x−x̄)²/Sxx and D = r²·h / (2·MSE·(1−h)²) — every input is an exact
    decimal sufficient statistic broadcast back onto the rows, and the
    per-row doubles come from the SAME expression text in both engines
    (rounded to 9 dp; ranking ties break on the row key).

    Scale: one partial-agg pass for the 6 sufficient stats, a one-row
    broadcast back, a projection, and a bounded TakeOrdered top-10 —
    no global sort, no second pass."""
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )
    xd = _dec2("l_quantity")
    yd = _dec2("l_extendedprice")
    stats = l.agg(
        F.count("*").cast("double").alias("n"),
        F.sum(xd).cast("double").alias("sx"),
        F.sum(yd).cast("double").alias("sy"),
        F.sum(xd * xd).cast("double").alias("sxx"),
        F.sum(xd * yd).cast("double").alias("sxy"),
        F.sum(yd * yd).cast("double").alias("syy"),
    )
    rows = l.crossJoin(F.broadcast(stats)).select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").alias("x"),
        F.col("l_extendedprice").alias("y"),
        "n", "sx", "sy", "sxx", "sxy", "syy",
    )
    return (
        rows.select(
            "l_orderkey",
            "l_linenumber",
            "x",
            "y",
            F.expr(f"ROUND({_INF_H}, 9)").alias("leverage"),
            F.expr(_INF_COOKS).alias("cooks_d"),
        )
        .orderBy(F.desc("cooks_d"), "l_orderkey", "l_linenumber")
        .limit(10)
    )


STAT_INFLUENCE_SQL = f"""
WITH s AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
              * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
              * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
              * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy
  FROM lineitem
), rows_ AS (
  SELECT l_orderkey, l_linenumber, l_quantity AS x, l_extendedprice AS y,
         n, sx, sy, sxx, sxy, syy
  FROM lineitem, s
)
SELECT l_orderkey, l_linenumber, x, y,
       ROUND({_INF_H}, 9) AS leverage,
       {_INF_COOKS} AS cooks_d
FROM rows_
ORDER BY cooks_d DESC, l_orderkey, l_linenumber
LIMIT 10
"""


# ---------------------------------------------------------------------------
# stat_runs_test — Wald-Wolfowitz runs test on the daily revenue series
# ---------------------------------------------------------------------------

_RUNS_MU = "(2 * n1 * n2 / (n1 + n2) + 1)"
_RUNS_SIG2 = (
    "(2 * n1 * n2 * (2 * n1 * n2 - n1 - n2)"
    " / ((n1 + n2) * (n1 + n2) * (n1 + n2 - 1)))"
)


def stat_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz RUNS test for randomness of the daily-revenue
    up/down sequence — too few runs means trending, too many means
    oscillation. Day-grain exact-cents totals give a deterministic
    up/down sign vs the previous day (zero-change days count as down);
    the run count and the up/down tallies are exact integers, and the
    z statistic folds them through the shared closed-form (rounded 6).

    Scale: one map-side-combinable day rollup; the lag/run windows run
    on the day-grain table only."""
    o = load_table(spark, sf_dir, "orders").select(
        F.expr("CAST(o_orderdate AS DATE)").alias("day"),
        F.expr(
            "CAST(FLOOR(o_totalprice * CAST(100 AS DOUBLE)"
            " + CAST(0.5 AS DOUBLE)) AS BIGINT)"
        ).alias("cents"),
    )
    daily = o.groupBy("day").agg(F.sum("cents").alias("v"))
    w = Window.orderBy("day")
    signed = (
        daily.select(
            "day", "v", F.lag("v").over(w).alias("pv")
        )
        .filter(F.col("pv").isNotNull())
        .select("day", F.expr("IF(v > pv, 1, 0)").alias("up"))
    )
    runs = signed.select(
        "up",
        F.expr(
            "IF(lag(up) over (order by day) IS NULL"
            " OR up != lag(up) over (order by day), 1, 0)"
        ).alias("new_run"),
    )
    agg = runs.agg(
        F.sum("new_run").alias("r"),
        F.sum("up").alias("n1"),
        F.sum(F.expr("1 - up")).alias("n2"),
    )
    return agg.select(
        F.col("r").cast("long").alias("n_runs"),
        F.col("n1").cast("long").alias("n_up"),
        F.col("n2").cast("long").alias("n_down"),
        F.expr(
            f"ROUND((CAST(r AS DOUBLE) - {_RUNS_MU})"
            f" / SQRT({_RUNS_SIG2}), 6)"
        ).alias("z"),
    )


STAT_RUNS_SQL = f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         SUM(CAST(FLOOR(o_totalprice * CAST(100 AS DOUBLE)
              + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS v
  FROM orders GROUP BY 1
), signed AS (
  SELECT day, CASE WHEN v > pv THEN 1 ELSE 0 END AS up
  FROM (SELECT day, v, LAG(v) OVER (ORDER BY day) AS pv FROM daily)
  WHERE pv IS NOT NULL
), runs AS (
  SELECT up,
         CASE WHEN LAG(up) OVER (ORDER BY day) IS NULL
                OR up != LAG(up) OVER (ORDER BY day) THEN 1 ELSE 0 END
           AS new_run
  FROM signed
), agg AS (
  SELECT CAST(SUM(new_run) AS DOUBLE) AS r,
         CAST(SUM(up) AS DOUBLE) AS n1,
         CAST(SUM(1 - up) AS DOUBLE) AS n2
  FROM runs
)
SELECT CAST(r AS BIGINT) AS n_runs, CAST(n1 AS BIGINT) AS n_up,
       CAST(n2 AS BIGINT) AS n_down,
       ROUND((r - {_RUNS_MU}) / SQRT({_RUNS_SIG2}), 6) AS z
FROM agg
"""


# ---------------------------------------------------------------------------
# stat_cohens_kappa — inter-rater agreement, exact integer numerators
# ---------------------------------------------------------------------------

_KAPPA_EXPR = (
    "CAST(n * po_num - pe_num AS DOUBLE)"
    " / CAST(n * n - pe_num AS DOUBLE)"
)


def stat_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa — chance-corrected agreement between two raters
    over the same category set (the labeling-QA staple for LLM
    annotation pipelines: how much better than chance do two annotators
    agree?). Rater A is the real order status; rater B is a
    deterministic key-derived rater, so both engines see identical
    labels. κ = (pₒ − pₑ)/(1 − pₑ) computed from EXACT integers —
    pₒ·N = Σ diagonal counts, pₑ·N² = Σ_c row_c·col_c — with ONE double
    division at the end (shared expression text, hash-exact).

    Scale: one groupBy to an R×C contingency (≤9 cells here); margins
    and the κ fold run on those cells — 100 TB of rated rows is one
    map-side-combinable scan."""
    o = load_table(spark, sf_dir, "orders")
    rated = o.select(
        F.col("o_orderstatus").alias("ra"),
        F.expr(
            "CASE WHEN o_orderkey % 3 = 0 THEN 'F'"
            " WHEN o_orderkey % 3 = 1 THEN 'O' ELSE 'P' END"
        ).alias("rb"),
    )
    diag = rated.agg(
        F.count("*").alias("n"),
        F.sum(F.expr("IF(ra = rb, 1, 0)")).alias("po_num"),
    )
    # pₑ·N² = Σ over categories of row_c·col_c — margins joined on the
    # category (a category absent from one rater contributes 0, which
    # the inner join encodes exactly)
    rows = rated.groupBy(F.col("ra").alias("cat")).agg(
        F.count("*").alias("row_tot")
    )
    cols = rated.groupBy(F.col("rb").alias("cat")).agg(
        F.count("*").alias("col_tot")
    )
    pe = (
        rows.join(F.broadcast(cols), "cat")
        .agg(
            F.sum(F.expr("CAST(row_tot AS DECIMAL(19,0)) * col_tot"))
            .cast("decimal(38,0)")
            .alias("pe_num_dec")
        )
    )
    return diag.crossJoin(F.broadcast(pe)).select(
        F.col("n").cast("long").alias("n"),
        F.col("po_num").cast("long").alias("po_num"),
        F.col("pe_num_dec").cast("double").alias("pe_num"),
        F.expr(
            "CAST(CAST(n AS DECIMAL(19,0)) * po_num - pe_num_dec AS DOUBLE)"
            " / CAST(CAST(n AS DECIMAL(19,0)) * n - pe_num_dec AS DOUBLE)"
        ).alias("kappa"),
    )


STAT_KAPPA_SQL = """
WITH rated AS (
  SELECT o_orderstatus AS ra,
         CASE WHEN o_orderkey % 3 = 0 THEN 'F'
              WHEN o_orderkey % 3 = 1 THEN 'O' ELSE 'P' END AS rb
  FROM orders
), diag AS (
  SELECT COUNT(*) AS n,
         SUM(CASE WHEN ra = rb THEN 1 ELSE 0 END) AS po_num
  FROM rated
), pe AS (
  SELECT SUM(CAST(r.row_tot AS HUGEINT) * c.col_tot) AS pe_num_dec
  FROM (SELECT ra AS cat, COUNT(*) AS row_tot FROM rated GROUP BY 1) r
  JOIN (SELECT rb AS cat, COUNT(*) AS col_tot FROM rated GROUP BY 1) c
    ON r.cat = c.cat
)
SELECT CAST(n AS BIGINT) AS n, CAST(po_num AS BIGINT) AS po_num,
       CAST(pe_num_dec AS DOUBLE) AS pe_num,
       CAST(CAST(n AS HUGEINT) * po_num - pe_num_dec AS DOUBLE)
       / CAST(CAST(n AS HUGEINT) * n - pe_num_dec AS DOUBLE) AS kappa
FROM diag, pe
"""


# ---------------------------------------------------------------------------
# stat_cramers_v — effect size for categorical association
# ---------------------------------------------------------------------------

_CHI2_CONTRIB = (
    "(CAST(obs AS DOUBLE) - CAST(row_tot AS DOUBLE) * col_tot / n)"
    " * (CAST(obs AS DOUBLE) - CAST(row_tot AS DOUBLE) * col_tot / n)"
    " / (CAST(row_tot AS DOUBLE) * col_tot / n)"
)


def stat_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V — the [0,1] effect size the raw chi-squared statistic
    (stat_chi2_independence) lacks: V = √(χ²/(N·min(r−1, c−1))), so
    association strengths compare across table shapes. Same
    exact-integer contingency; χ² folds with the shared per-cell
    expression, is rounded to 6 dp to absorb float summation order,
    and feeds one √ (correctly rounded IEEE in both engines).

    Scale: identical to the χ² entry — one map-side-combinable groupBy
    to R×C cells, everything else on the cells."""
    o = load_table(spark, sf_dir, "orders")
    cells = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("obs")
    )
    w_row = Window.partitionBy("o_orderstatus")
    w_col = Window.partitionBy("o_orderpriority")
    wall = Window.partitionBy()
    m = cells.select(
        "obs",
        F.col("o_orderstatus").alias("r"),
        F.col("o_orderpriority").alias("c"),
        F.sum("obs").over(w_row).alias("row_tot"),
        F.sum("obs").over(w_col).alias("col_tot"),
        F.sum("obs").over(wall).alias("n"),
    ).withColumn("contrib", F.expr(_CHI2_CONTRIB))
    return m.agg(
        F.max("n").cast("long").alias("n"),
        (F.countDistinct("r") - 1).cast("long").alias("r1"),
        (F.countDistinct("c") - 1).cast("long").alias("c1"),
        F.round(F.sum("contrib"), 6).alias("chi2"),
    ).select(
        "n",
        "r1",
        "c1",
        "chi2",
        F.expr(
            "ROUND(SQRT(chi2 / (CAST(n AS DOUBLE) * LEAST(r1, c1))), 6)"
        ).alias("cramers_v"),
    )


STAT_CRAMERS_SQL = f"""
WITH cells AS (
  SELECT o_orderstatus AS r, o_orderpriority AS c, COUNT(*) AS obs
  FROM orders GROUP BY 1, 2
), m AS (
  SELECT obs, r, c,
         SUM(obs) OVER (PARTITION BY r) AS row_tot,
         SUM(obs) OVER (PARTITION BY c) AS col_tot,
         SUM(obs) OVER () AS n
  FROM cells
), agg AS (
  SELECT CAST(MAX(n) AS BIGINT) AS n,
         CAST(COUNT(DISTINCT r) - 1 AS BIGINT) AS r1,
         CAST(COUNT(DISTINCT c) - 1 AS BIGINT) AS c1,
         ROUND(SUM({_CHI2_CONTRIB}), 6) AS chi2
  FROM m
)
SELECT n, r1, c1, chi2,
       ROUND(SQRT(chi2 / (CAST(n AS DOUBLE) * LEAST(r1, c1))), 6) AS cramers_v
FROM agg
"""


# ---------------------------------------------------------------------------
# stat_levene_bf — Brown-Forsythe variance-homogeneity test
# ---------------------------------------------------------------------------


def stat_levene_bf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe test (Levene with group MEDIANS) for variance
    homogeneity across order priorities — the assumption check ANOVA
    (stat_anova_oneway) rests on. Deviations z = |cents − group
    lower-median| are exact integers: the group median is the
    ceil(n/2)-th order statistic selected on the VALUE DOMAIN (cents
    histogram + running count — no per-row rank window), the same
    collapse stat_mannwhitney uses. The F statistic folds per-group
    exact sums (Σz as BIGINT, Σz² as DECIMAL) through the shared
    closed-form double expression, rounded to 6 dp to absorb group
    summation order.

    Scale: two map-side-combinable aggregations (value histogram,
    deviation moments) + a ≤groups-sized broadcast of medians. The
    LOWER median (not the interpolated one) is pinned so both engines
    select the identical integer."""
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("g"),
        F.expr(
            "CAST(FLOOR(o_totalprice * CAST(100 AS DOUBLE)"
            " + CAST(0.5 AS DOUBLE)) AS BIGINT)"
        ).alias("cents"),
    )
    hist = o.groupBy("g", "cents").agg(F.count("*").alias("cnt"))
    w_cum = Window.partitionBy("g").orderBy("cents").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_g = Window.partitionBy("g")
    med = (
        hist.select(
            "g",
            "cents",
            F.sum("cnt").over(w_cum).alias("cum"),
            F.sum("cnt").over(w_g).alias("n_g"),
        )
        .filter(F.expr("cum - 1 >= (n_g - 1) div 2").__and__(
            F.expr("cum - (n_g - 1) div 2 >= 1")))
        .groupBy("g")
        .agg(F.min("cents").alias("med"))
    )
    z = o.join(F.broadcast(med), "g").select(
        "g", F.expr("ABS(cents - med)").alias("z")
    )
    per_g = z.groupBy("g").agg(
        F.count("*").alias("n_g"),
        F.sum("z").alias("s_g"),
        F.sum(F.expr("CAST(z AS DECIMAL(19,0)) * z")).cast("decimal(38,0)").alias("q_g"),
    )
    wall = Window.partitionBy()
    tot = per_g.select(
        "g",
        "n_g",
        "s_g",
        "q_g",
        F.sum("n_g").over(wall).alias("n"),
        F.sum("s_g").over(wall).alias("s"),
        F.count("*").over(wall).alias("k"),
    )
    folded = tot.agg(
        F.max("n").alias("n"),
        F.max("k").alias("k"),
        F.round(
            F.sum(
                F.expr(
                    "(CAST(s_g AS DOUBLE) / n_g - CAST(s AS DOUBLE) / n)"
                    " * (CAST(s_g AS DOUBLE) / n_g - CAST(s AS DOUBLE) / n)"
                    " * n_g"
                )
            ),
            6,
        ).alias("ss_between"),
        F.round(
            F.sum(
                F.expr(
                    "CAST(q_g AS DOUBLE)"
                    " - CAST(s_g AS DOUBLE) * s_g / n_g"
                )
            ),
            6,
        ).alias("ss_within"),
    )
    return folded.select(
        F.col("n").cast("long").alias("n"),
        F.col("k").cast("long").alias("k"),
        "ss_between",
        "ss_within",
        F.expr(
            "ROUND((ss_between / (k - 1)) / (ss_within / (n - k)), 6)"
        ).alias("f_stat"),
    )


STAT_LEVENE_SQL = """
WITH src AS (
  SELECT o_orderpriority AS g,
         CAST(FLOOR(o_totalprice * CAST(100 AS DOUBLE)
              + CAST(0.5 AS DOUBLE)) AS BIGINT) AS cents
  FROM orders
), hist AS (
  SELECT g, cents, COUNT(*) AS cnt FROM src GROUP BY 1, 2
), med AS (
  SELECT g, MIN(cents) AS med FROM (
    SELECT g, cents,
           SUM(cnt) OVER (PARTITION BY g ORDER BY cents
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
           SUM(cnt) OVER (PARTITION BY g) AS n_g
    FROM hist
  ) WHERE cum - 1 >= (n_g - 1) // 2 AND cum - (n_g - 1) // 2 >= 1
  GROUP BY g
), z AS (
  SELECT s.g, ABS(s.cents - m.med) AS z
  FROM src s JOIN med m ON s.g = m.g
), per_g AS (
  SELECT g, COUNT(*) AS n_g, SUM(z) AS s_g,
         SUM(CAST(z AS HUGEINT) * z) AS q_g
  FROM z GROUP BY 1
), tot AS (
  SELECT g, n_g, s_g, q_g,
         SUM(n_g) OVER () AS n, SUM(s_g) OVER () AS s,
         COUNT(*) OVER () AS k
  FROM per_g
), folded AS (
  SELECT MAX(n) AS n, MAX(k) AS k,
         ROUND(SUM((CAST(s_g AS DOUBLE) / n_g - CAST(s AS DOUBLE) / n)
               * (CAST(s_g AS DOUBLE) / n_g - CAST(s AS DOUBLE) / n)
               * n_g), 6) AS ss_between,
         ROUND(SUM(CAST(q_g AS DOUBLE)
               - CAST(s_g AS DOUBLE) * s_g / n_g), 6) AS ss_within
  FROM tot
)
SELECT CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k,
       ss_between, ss_within,
       ROUND((ss_between / (k - 1)) / (ss_within / (n - k)), 6) AS f_stat
FROM folded
"""


# ---------------------------------------------------------------------------
# stat_wilcoxon_signed — tie-corrected Wilcoxon signed-rank (paired)
# ---------------------------------------------------------------------------

# Shared closed-form z (identical text in both engines; every input is a
# double derived from exact BIGINT aggregates). wpos2 carries 2·W⁺ so
# tied average ranks (halves) stay integer end to end; the tie-corrected
# variance of 2·W⁺ is n(n+1)(2n+1)/6 − Σ(t³−t)/12.
_WSR_Z = (
    "(CAST(wpos2 AS DOUBLE) - CAST(n AS DOUBLE) * (n + 1) / CAST(2 AS DOUBLE))"
    " / sqrt(CAST(n AS DOUBLE) * (n + 1) * (2 * n + 1) / CAST(6 AS DOUBLE)"
    " - CAST(tie_t AS DOUBLE) / CAST(12 AS DOUBLE))"
)


def stat_wilcoxon_signed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilcoxon signed-rank test on the paired per-lineitem difference
    tax − discount (in exact cents) — the nonparametric paired twin of
    stat_mannwhitney's two-sample test: zero differences drop, |d| is
    ranked with tie-averaged ranks, and W⁺ sums the ranks of the
    positive side.

    Never ranks rows: the difference domain is bounded (≤ ~19 distinct
    |cents| values), so the average rank of |d| = v derives from
    per-value counts — 2·rank(v) = 2·(# rows with |d| < v) + count(v)
    + 1, exact in integers. One map-side-combinable aggregation
    collapses the fact table to the tiny |d| domain; the cumulative
    window runs over that domain table, NOT the fact table, so the
    100 TB cost is a single partial-agg shuffle. 2·W⁺ and the tie term
    Σ(t³−t) are exact DECIMAL(38,0) (HUGEINT in the oracle; BIGINT
    overflows past ~2M rows per value), exposed as the identical
    nearest-DOUBLE; z is the same IEEE expression in both engines.

    Reference parity: extends the rank-test family of the reference's
    statistics coverage (SURVEY.md §2.9 extension surface).
    """
    l = load_table(spark, sf_dir, "lineitem")
    d = l.select(
        F.expr(
            "CAST(FLOOR((l_tax - l_discount) * CAST(100 AS DOUBLE)"
            " + CAST(0.5 AS DOUBLE)) AS BIGINT)"
        ).alias("d")
    ).filter(F.col("d") != 0)
    per_v = (
        d.select(
            F.abs(F.col("d")).alias("v"),
            (F.col("d") > 0).cast("long").alias("pos"),
        )
        .groupBy("v")
        .agg(F.count("*").alias("c"), F.sum("pos").alias("c_pos"))
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    ranked = per_v.withColumn(
        "r2", 2 * F.coalesce(F.sum("c").over(w), F.lit(0)) + F.col("c") + 1
    )
    # Σ(c_pos·r2) ≈ 2n² and Σ(c³−c) overflow BIGINT once per-value
    # counts pass ~2M (sf≳20): exact DECIMAL(38,0) internally (HUGEINT
    # in the oracle), exposed as the identical nearest-DOUBLE.
    agg = ranked.agg(
        F.sum("c").alias("n"),
        F.sum(F.expr("CAST(c_pos AS DECIMAL(38,0)) * r2")).alias("wpos2"),
        F.sum(F.expr("CAST(c AS DECIMAL(38,0)) * c * c - c")).alias("tie_t"),
    )
    return agg.select(
        F.col("n").cast("long").alias("n"),
        "wpos2",
        "tie_t",
        F.expr(_WSR_Z).alias("z"),
    ).select(
        "n",
        F.col("wpos2").cast("double").alias("wpos2"),
        F.col("tie_t").cast("double").alias("tie_t"),
        "z",
    )


STAT_WILCOXON_SQL = f"""
WITH d AS (
  SELECT CAST(FLOOR((l_tax - l_discount) * CAST(100 AS DOUBLE)
              + CAST(0.5 AS DOUBLE)) AS BIGINT) AS d
  FROM lineitem
  WHERE CAST(FLOOR((l_tax - l_discount) * CAST(100 AS DOUBLE)
             + CAST(0.5 AS DOUBLE)) AS BIGINT) != 0
), per_v AS (
  SELECT ABS(d) AS v, COUNT(*) AS c,
         SUM(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS c_pos
  FROM d GROUP BY 1
), ranked AS (
  SELECT v, c, c_pos,
         2 * COALESCE(SUM(c) OVER (ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + c + 1 AS r2
  FROM per_v
), agg AS (
  SELECT CAST(SUM(c) AS BIGINT) AS n,
         SUM(CAST(c_pos AS HUGEINT) * r2) AS wpos2,
         SUM(CAST(c AS HUGEINT) * c * c - c) AS tie_t
  FROM ranked
), fin AS (
  SELECT n, wpos2, tie_t, {_WSR_Z} AS z FROM agg
)
SELECT n, CAST(wpos2 AS DOUBLE) AS wpos2, CAST(tie_t AS DOUBLE) AS tie_t, z
FROM fin
"""


# ---------------------------------------------------------------------------
# stat_hodges_lehmann — one-sample HL location estimate (Walsh medians)
# ---------------------------------------------------------------------------


def stat_hodges_lehmann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hodges-Lehmann one-sample location estimator of l_quantity: the
    median of all Walsh averages (xᵢ + xⱼ)/2 over pairs i ≤ j — the
    robust, rank-based companion to the mean (it is the estimator the
    Wilcoxon test inverts).

    Never materializes the O(n²) Walsh pairs: quantity has a bounded
    integer domain (≤50 values), so pair MULTIPLICITIES are exact
    products of per-value counts — c_u·c_v for u < v and
    c_v·(c_v+1)/2 on the diagonal — over the ≤C(50,2)+50 domain-pair
    table. The weighted median then runs a cumulative window over that
    tiny table. At 100 TB the only fact-table cost is one partial-agg
    shuffle to the 50-row histogram; everything downstream is
    constant-size. Walsh sums are carried 2× (u+v) so halves stay
    integer; the estimate reports lower/upper middle Walsh 2×-values
    exactly plus their IEEE mean.
    """
    l = load_table(spark, sf_dir, "lineitem")
    hist = (
        l.select(F.col("l_quantity").cast("long").alias("v"))
        .groupBy("v")
        .agg(F.count("*").alias("c"))
        .localCheckpoint()  # ≤50 rows; reused by both sides of the pair join
    )
    a = hist.select(F.col("v").alias("u"), F.col("c").alias("cu"))
    b = hist.select(F.col("v").alias("v"), F.col("c").alias("cv"))
    pairs = (
        a.join(F.broadcast(b), F.col("u") <= F.col("v"))
        .select(
            (F.col("u") + F.col("v")).alias("s2"),
            F.when(
                F.col("u") < F.col("v"), F.col("cu") * F.col("cv")
            ).otherwise(F.col("cv") * (F.col("cv") + 1) / 2)
            .cast("long")
            .alias("wt"),
        )
        .groupBy("s2")
        .agg(F.sum("wt").alias("wt"))
    )
    w_cum = Window.orderBy("s2").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = pairs.select(
        "s2",
        F.sum("wt").over(w_cum).alias("cum"),
        F.sum("wt").over(w_all).alias("np"),
    )
    # lower/upper middle of np items (1-indexed (np+1)//2 and (np+2)//2)
    mid = cum.select(
        F.min(F.when(F.col("cum") >= (F.col("np") + 1) / 2, F.col("s2"))).alias(
            "lo2"
        ),
        F.min(F.when(F.col("cum") >= (F.col("np") + 2) / 2, F.col("s2"))).alias(
            "hi2"
        ),
        F.max("np").alias("n_walsh"),
    )
    return mid.select(
        F.col("n_walsh").cast("long").alias("n_walsh"),
        F.col("lo2").cast("long").alias("lo2"),
        F.col("hi2").cast("long").alias("hi2"),
        F.expr(
            "(CAST(lo2 AS DOUBLE) + hi2) / CAST(4 AS DOUBLE)"
        ).alias("hl_estimate"),
    )


STAT_HL_SQL = """
WITH hist AS (
  SELECT CAST(l_quantity AS BIGINT) AS v, COUNT(*) AS c
  FROM lineitem GROUP BY 1
), pairs AS (
  SELECT a.u + b.v AS s2,
         CAST(SUM(CASE WHEN a.u < b.v THEN a.cu * b.cv
                       ELSE b.cv * (b.cv + 1) / 2 END) AS BIGINT) AS wt
  FROM (SELECT v AS u, c AS cu FROM hist) a
  JOIN (SELECT v, c AS cv FROM hist) b ON a.u <= b.v
  GROUP BY 1
), cum AS (
  SELECT s2,
         SUM(wt) OVER (ORDER BY s2
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         SUM(wt) OVER () AS np
  FROM pairs
)
SELECT CAST(MAX(np) AS BIGINT) AS n_walsh,
       CAST(MIN(CASE WHEN cum >= (np + 1) / 2 THEN s2 END) AS BIGINT) AS lo2,
       CAST(MIN(CASE WHEN cum >= (np + 2) / 2 THEN s2 END) AS BIGINT) AS hi2,
       (CAST(MIN(CASE WHEN cum >= (np + 1) / 2 THEN s2 END) AS DOUBLE)
        + MIN(CASE WHEN cum >= (np + 2) / 2 THEN s2 END))
        / CAST(4 AS DOUBLE) AS hl_estimate
FROM cum
"""


# ---------------------------------------------------------------------------
# stat_bh_fdr — Benjamini-Hochberg FDR over per-segment mean tests
# ---------------------------------------------------------------------------

_BH_Q_NUM = 1  # q = 0.10 as an exact rational 1/10
_BH_Q_DEN = 10

# Welch z of segment vs complement, from exact micro-unit sums (same
# IEEE text both engines). Two-sided p via the logistic approximation
# Φ(z) ≈ 1/(1+exp(−1.702·z)) — a monotone, engine-identical transform;
# the BH PROCEDURE (rank, step-up cutoff) is the operator under test,
# the CDF approximation only maps z onto (0,1).
_BH_Z = (
    "(CAST(s_g AS DOUBLE) / n_g - (CAST(s AS DOUBLE) - s_g) / (n - n_g))"
    " / sqrt((CAST(q_g AS DOUBLE) / n_g - (CAST(s_g AS DOUBLE) / n_g)"
    " * (CAST(s_g AS DOUBLE) / n_g)) / n_g"
    " + ((CAST(q AS DOUBLE) - q_g) / (n - n_g)"
    " - ((CAST(s AS DOUBLE) - s_g) / (n - n_g))"
    " * ((CAST(s AS DOUBLE) - s_g) / (n - n_g))) / (n - n_g))"
)
_BH_P = "CAST(2 AS DOUBLE) / (CAST(1 AS DOUBLE) + exp(CAST(1.702 AS DOUBLE) * abs(z)))"


def stat_bh_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg step-up FDR control over m = (event_type ×
    day-of-week) segment tests: each segment's mean event value is
    Welch-tested against its complement, p-values rank ascending, and
    the step-up rule rejects ranks 1..k* where k* = max{k : p₍ₖ₎ ≤
    k·q/m} at q = 0.10 — the multiple-testing correction every
    experiment platform applies before reading 35 dashboards.

    Scale: ONE map-side-combinable aggregation collapses the fact
    table to m segment rows of exact micro-unit sums (value·10⁶ as
    BIGINT; squares summed as DECIMAL(38,0) so 100 TB cannot
    overflow); z, p and the BH walk all run on the m-row table via
    windows over m, never the fact table. The step-up cutoff uses the
    exact rational comparison p·m·den ≤ rank·num — no float division
    on the decision path.
    """
    e = load_table(spark, sf_dir, "events")
    seg = (
        e.select(
            F.col("event_type").alias("etype"),
            F.dayofweek("ts").alias("dow"),
            F.expr(
                "CAST(FLOOR(value * CAST(1000000 AS DOUBLE)"
                " + CAST(0.5 AS DOUBLE)) AS BIGINT)"
            ).alias("micro"),
        )
        .groupBy("etype", "dow")
        .agg(
            F.count("*").alias("n_g"),
            F.sum("micro").alias("s_g"),
            F.sum(
                (F.col("micro").cast("decimal(38,0)") * F.col("micro"))
            ).alias("q_g"),
        )
    )
    w_all = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    tot = seg.select(
        "etype",
        "dow",
        "n_g",
        "s_g",
        "q_g",
        F.sum("n_g").over(w_all).alias("n"),
        F.sum("s_g").over(w_all).alias("s"),
        F.sum("q_g").over(w_all).alias("q"),
        F.count("*").over(w_all).alias("m"),
    )
    scored = tot.withColumn("z", F.expr(_BH_Z)).withColumn("p", F.expr(_BH_P))
    w_rank = Window.orderBy("p", "etype", "dow")
    ranked = scored.withColumn("rnk", F.row_number().over(w_rank)).withColumn(
        "ok",
        (
            F.col("p") * F.col("m") * F.lit(_BH_Q_DEN)
            <= F.col("rnk") * F.lit(_BH_Q_NUM)
        ).cast("long"),
    )
    w_kstar = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        ranked.withColumn(
            "kstar",
            F.coalesce(
                F.max(F.when(F.col("ok") == 1, F.col("rnk"))).over(w_kstar),
                F.lit(0),
            ),
        )
        .select(
            "etype",
            "dow",
            F.col("n_g").cast("long").alias("n_g"),
            F.round("z", 6).alias("z"),
            F.round("p", 6).alias("p"),
            F.col("rnk").cast("long").alias("rnk"),
            (F.col("rnk") <= F.col("kstar")).alias("rejected"),
        )
        .orderBy("rnk")
    )


STAT_BH_SQL = f"""
WITH seg AS (
  SELECT event_type AS etype, dayofweek(ts) + 1 AS dow,
         COUNT(*) AS n_g,
         CAST(SUM(CAST(FLOOR(value * CAST(1000000 AS DOUBLE)
              + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS BIGINT) AS s_g,
         SUM(CAST(CAST(FLOOR(value * CAST(1000000 AS DOUBLE)
              + CAST(0.5 AS DOUBLE)) AS BIGINT) AS HUGEINT)
             * CAST(FLOOR(value * CAST(1000000 AS DOUBLE)
              + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS q_g
  FROM events GROUP BY 1, 2
), tot AS (
  SELECT etype, dow, n_g, s_g, q_g,
         SUM(n_g) OVER () AS n, SUM(s_g) OVER () AS s,
         SUM(q_g) OVER () AS q, COUNT(*) OVER () AS m
  FROM seg
), scored AS (
  SELECT *, {_BH_Z} AS z FROM tot
), pvals AS (
  SELECT *, {_BH_P} AS p FROM scored
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY p, etype, dow) AS rnk
  FROM pvals
), flagged AS (
  SELECT *, CASE WHEN p * m * {_BH_Q_DEN} <= rnk * {_BH_Q_NUM}
                 THEN 1 ELSE 0 END AS ok
  FROM ranked
)
SELECT etype, dow, CAST(n_g AS BIGINT) AS n_g,
       ROUND(z, 6) AS z, ROUND(p, 6) AS p,
       CAST(rnk AS BIGINT) AS rnk,
       rnk <= COALESCE(MAX(CASE WHEN ok = 1 THEN rnk END) OVER (), 0)
         AS rejected
FROM flagged
ORDER BY rnk
"""


# ---------------------------------------------------------------------------
# stat_weighted_median — revenue-weighted median quantity
# ---------------------------------------------------------------------------


def stat_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted median per returnflag: the quantity value at which
    cumulative extendedprice-weight first reaches half the group total
    (lower weighted median, plus the exact cents on each side) — the
    inventory-planning "half the revenue sits at or below this order
    size" statistic.

    Scale: weights aggregate to the (flag, quantity) grain first (one
    map-side-combinable shuffle, ≤ 3×50 rows), cents exact as BIGINT;
    the cumulative window runs over the tiny grain table. No global
    sort, no fact-table window.
    """
    l = load_table(spark, sf_dir, "lineitem")
    grain = (
        l.select(
            F.col("l_returnflag").alias("flag"),
            F.col("l_quantity").cast("long").alias("v"),
            F.expr(
                "CAST(FLOOR(l_extendedprice * CAST(100 AS DOUBLE)"
                " + CAST(0.5 AS DOUBLE)) AS BIGINT)"
            ).alias("cents"),
        )
        .groupBy("flag", "v")
        .agg(F.sum("cents").alias("wt"))
    )
    w_cum = Window.partitionBy("flag").orderBy("v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_tot = Window.partitionBy("flag")
    cum = grain.select(
        "flag",
        "v",
        F.sum("wt").over(w_cum).alias("cum"),
        F.sum("wt").over(w_tot).alias("tot"),
    )
    return (
        cum.filter(2 * F.col("cum") >= F.col("tot"))
        .groupBy("flag")
        .agg(
            F.min("v").cast("long").alias("wmedian_qty"),
            F.max("tot").cast("long").alias("total_cents"),
        )
        .orderBy("flag")
    )


STAT_WMEDIAN_SQL = """
WITH grain AS (
  SELECT l_returnflag AS flag, CAST(l_quantity AS BIGINT) AS v,
         CAST(SUM(CAST(FLOOR(l_extendedprice * CAST(100 AS DOUBLE)
              + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS BIGINT) AS wt
  FROM lineitem GROUP BY 1, 2
), cum AS (
  SELECT flag, v,
         SUM(wt) OVER (PARTITION BY flag ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         SUM(wt) OVER (PARTITION BY flag) AS tot
  FROM grain
)
SELECT flag, CAST(MIN(v) AS BIGINT) AS wmedian_qty,
       CAST(MAX(tot) AS BIGINT) AS total_cents
FROM cum
WHERE 2 * cum >= tot
GROUP BY flag
ORDER BY flag
"""


# ---------------------------------------------------------------------------
# stat_nelson_aalen — cumulative-hazard estimate over user activity spans
# ---------------------------------------------------------------------------


def stat_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson-Aalen cumulative hazard over user activity spans: each
    user's duration is last-event-day − first-event-day; at each
    duration t the hazard increment is d_t/n_t (events over the
    at-risk set) and H(t) = Σ_{s≤t} d_s/n_s — the lifetable's
    estimator-grade sibling (stat_survival_lifetable bins durations;
    this estimates the continuous hazard at every observed duration,
    no censoring in this corpus so every span is an event).

    Integer-exact: each increment is quantized ppm by integer division
    (d·10⁶ div n — both engines), so the cumulative sum is an exact
    BIGINT. Scale: one user-grain min/max aggregation, one duration-
    domain rollup (bounded by the observation window in days); both
    cumulative windows run over the tiny domain table."""
    e = load_table(spark, sf_dir, "events")
    spans = e.groupBy("user_id").agg(
        F.expr("datediff(CAST(MAX(ts) AS DATE), CAST(MIN(ts) AS DATE))").alias(
            "t"
        )
    )
    dom = spans.groupBy("t").agg(F.count("*").alias("d"))
    w_risk = Window.orderBy("t").rowsBetween(0, Window.unboundedFollowing)
    w_cum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    risk = dom.select(
        "t", "d", F.sum("d").over(w_risk).alias("n_risk")
    ).withColumn("hazard_ppm", F.expr("d * 1000000 div n_risk"))
    return risk.select(
        F.col("t").cast("long").alias("t_days"),
        F.col("d").cast("long").alias("n_events"),
        F.col("n_risk").cast("long").alias("n_risk"),
        F.col("hazard_ppm").cast("long").alias("hazard_ppm"),
        F.sum("hazard_ppm").over(w_cum).cast("long").alias("cumhaz_ppm"),
    ).orderBy("t_days")


STAT_NA_SQL = """
WITH spans AS (
  SELECT user_id,
         datediff('day', CAST(MIN(ts) AS DATE), CAST(MAX(ts) AS DATE)) AS t
  FROM events GROUP BY 1
), dom AS (
  SELECT t, COUNT(*) AS d FROM spans GROUP BY 1
), risk AS (
  SELECT t, d,
         SUM(d) OVER (ORDER BY t
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS n_risk
  FROM dom
), haz AS (
  SELECT t, d, n_risk, d * 1000000 // n_risk AS hazard_ppm FROM risk
)
SELECT CAST(t AS BIGINT) AS t_days, CAST(d AS BIGINT) AS n_events,
       CAST(n_risk AS BIGINT) AS n_risk,
       CAST(hazard_ppm AS BIGINT) AS hazard_ppm,
       CAST(SUM(hazard_ppm) OVER (ORDER BY t
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cumhaz_ppm
FROM haz
ORDER BY t_days
"""


# ---------------------------------------------------------------------------
# stat_mcnemar — paired classifier comparison on the discordant cells
# ---------------------------------------------------------------------------

# Continuity-corrected McNemar χ² = (|b−c|−1)²/(b+c); exact BIGINTs in,
# one shared IEEE division out.
_MCNEMAR = (
    "CAST((ABS(b - c) - 1) * (ABS(b - c) - 1) AS DOUBLE)"
    " / CAST(b + c AS DOUBLE)"
)


def stat_mcnemar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's test comparing two rule classifiers on the SAME
    orders (paired design): rule A = totalprice > 150k, rule B =
    priority urgent/high, target = orderstatus 'F'. Only the
    discordant pairs matter — b = A right & B wrong, c = A wrong &
    B right; χ² = (|b−c|−1)²/(b+c) with continuity correction — the
    standard "is model A actually better than model B on identical
    examples" gate that a two-proportion z-test gets wrong (it
    ignores the pairing).

    One map-side-combinable aggregation collapses the fact table to
    four exact BIGINT concordance cells; χ² is one shared IEEE
    expression."""
    o = load_table(spark, sf_dir, "orders")
    flags = o.select(
        (F.col("o_totalprice") > 150000).cast("long").alias("pa"),
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("long").alias(
            "pb"
        ),
        (F.col("o_orderstatus") == "F").cast("long").alias("y"),
    )
    cells = flags.agg(
        F.count("*").alias("n"),
        F.sum(
            ((F.col("pa") == F.col("y")) & (F.col("pb") != F.col("y"))).cast(
                "long"
            )
        ).alias("b"),
        F.sum(
            ((F.col("pa") != F.col("y")) & (F.col("pb") == F.col("y"))).cast(
                "long"
            )
        ).alias("c"),
        F.sum(
            ((F.col("pa") == F.col("y")) & (F.col("pb") == F.col("y"))).cast(
                "long"
            )
        ).alias("both_right"),
    )
    return cells.select(
        F.col("n").cast("long").alias("n"),
        F.col("both_right").cast("long").alias("both_right"),
        F.col("b").cast("long").alias("b"),
        F.col("c").cast("long").alias("c"),
        F.round(F.expr(_MCNEMAR), 6).alias("chi2_cc"),
    )


STAT_MCNEMAR_SQL = f"""
WITH flags AS (
  SELECT CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END AS pa,
         CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
              THEN 1 ELSE 0 END AS pb,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
  FROM orders
), cells AS (
  SELECT COUNT(*) AS n,
         SUM(CASE WHEN pa = y AND pb != y THEN 1 ELSE 0 END) AS b,
         SUM(CASE WHEN pa != y AND pb = y THEN 1 ELSE 0 END) AS c,
         SUM(CASE WHEN pa = y AND pb = y THEN 1 ELSE 0 END) AS both_right
  FROM flags
)
SELECT CAST(n AS BIGINT) AS n, CAST(both_right AS BIGINT) AS both_right,
       CAST(b AS BIGINT) AS b, CAST(c AS BIGINT) AS c,
       ROUND({_MCNEMAR}, 6) AS chi2_cc
FROM cells
"""


# ---------------------------------------------------------------------------
# stat_granger_daily — one-lag Granger-style predictive causality
# ---------------------------------------------------------------------------

# Centered second moments from exact BIGINT day-grain sums (the Gram-
# aggregation pattern of stat_reg_multi), then the restricted (z~y)
# vs full (z~x+y) RSS comparison — every expression identical text in
# both engines.
_GR_MOMS = (
    "CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n AS mxx,"
    " CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n AS mxy,"
    " CAST(sxz AS DOUBLE) - CAST(sx AS DOUBLE) * sz / n AS mxz,"
    " CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n AS myy,"
    " CAST(syz AS DOUBLE) - CAST(sy AS DOUBLE) * sz / n AS myz,"
    " CAST(szz AS DOUBLE) - CAST(sz AS DOUBLE) * sz / n AS mzz"
)
_GR_RSS_R = "(mzz - myz * myz / myy)"
_GR_BX = "((myy * mxz - mxy * myz) / (mxx * myy - mxy * mxy))"
_GR_BY = "((mxx * myz - mxy * mxz) / (mxx * myy - mxy * mxy))"
_GR_RSS_F = f"(mzz - (mxz * {_GR_BX} + myz * {_GR_BY}))"
_GR_F = f"(({_GR_RSS_R} - {_GR_RSS_F}) * (n - 3) / {_GR_RSS_F})"


def stat_granger_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-lag Granger-style predictive causality on the daily event
    series: does today's PURCHASE count (x) improve tomorrow's total
    event count (z) beyond what today's total (y) already predicts?
    F-tests the restricted model z ~ y against the full z ~ x + y —
    the standard leading-indicator screen on KPI dashboards.

    Day pairs come from a self-join of the day-grain table on d+1 (no
    fact-table window); all sufficient statistics are exact BIGINT
    sums over that bounded table; the closed-form 2-variable normal
    equations and F-statistic are the same IEEE expression in both
    engines (round 6)."""
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.groupBy(F.expr("CAST(ts AS DATE)").alias("d"))
        .agg(
            F.count("*").alias("y"),
            F.sum(
                (F.col("event_type") == "purchase").cast("long")
            ).alias("x"),
        )
        .localCheckpoint()  # day-grain, reused by both sides of the lag join
    )
    nxt = daily.select(
        F.expr("date_add(d, -1)").alias("d"), F.col("y").alias("z")
    )
    pairs = daily.join(nxt, "d")
    sums = pairs.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum("z").alias("sz"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("z")).alias("sxz"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("y") * F.col("z")).alias("syz"),
        F.sum(F.col("z") * F.col("z")).alias("szz"),
    )
    moms = sums.selectExpr("n", "sx", "sy", "sz", *_GR_MOMS.split(","))
    return moms.select(
        F.col("n").cast("long").alias("n_day_pairs"),
        F.round(F.expr(_GR_RSS_R), 6).alias("rss_restricted"),
        F.round(F.expr(_GR_RSS_F), 6).alias("rss_full"),
        F.round(F.expr(_GR_BX), 6).alias("beta_x"),
        F.round(F.expr(_GR_F), 6).alias("f_stat"),
    )


STAT_GRANGER_SQL = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, COUNT(*) AS y,
         SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS x
  FROM events GROUP BY 1
), pairs AS (
  SELECT a.x, a.y, b.y AS z
  FROM daily a JOIN daily b ON b.d = a.d + INTERVAL 1 DAY
), sums AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(z) AS BIGINT) AS sz,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * z) AS BIGINT) AS sxz,
         CAST(SUM(y * y) AS BIGINT) AS syy,
         CAST(SUM(y * z) AS BIGINT) AS syz,
         CAST(SUM(z * z) AS BIGINT) AS szz
  FROM pairs
), moms AS (
  SELECT n, sx, sy, sz, {_GR_MOMS} FROM sums
)
SELECT CAST(n AS BIGINT) AS n_day_pairs,
       ROUND({_GR_RSS_R}, 6) AS rss_restricted,
       ROUND({_GR_RSS_F}, 6) AS rss_full,
       ROUND({_GR_BX}, 6) AS beta_x,
       ROUND({_GR_F}, 6) AS f_stat
FROM moms
"""


# ---------------------------------------------------------------------------
# stat_equivalence_tost — two-one-sided-tests equivalence of segment means
# ---------------------------------------------------------------------------

_TOST_MARGIN_MICRO = 5_000_000  # ±5.0 in event-value units
_TOST_Z_CRIT = "1.6448536269514722"  # z_{0.95}, literal in both engines

# Welch SE from exact micro sums (identical text both engines)
_TOST_SE = (
    "sqrt((CAST(q1 AS DOUBLE) / n1 - (CAST(s1 AS DOUBLE) / n1)"
    " * (CAST(s1 AS DOUBLE) / n1)) / n1"
    " + (CAST(q2 AS DOUBLE) / n2 - (CAST(s2 AS DOUBLE) / n2)"
    " * (CAST(s2 AS DOUBLE) / n2)) / n2)"
)
_TOST_DIFF = "(CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2)"
_TOST_ZL = f"(({_TOST_DIFF} + {_TOST_MARGIN_MICRO}) / {_TOST_SE})"
_TOST_ZU = f"(({_TOST_MARGIN_MICRO} - {_TOST_DIFF}) / {_TOST_SE})"


def stat_equivalence_tost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOST equivalence test: are mean event values of 'click' and
    'view' equivalent within ±5.0? Two one-sided Welch z-tests — the
    test an experimentation platform needs when the HYPOTHESIS is "no
    meaningful difference" (a non-significant t-test is NOT evidence
    of equivalence; TOST is).

    Equivalent ⇔ both z_lower > z_crit and z_upper > z_crit at the
    90% TOST level. One map-side-combinable aggregation to exact
    micro-unit sufficient statistics (squares as DECIMAL(38,0), no
    overflow at any scale); every downstream expression is the same
    IEEE text in both engines, including the decision comparison."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view")
    )
    micro = e.select(
        (F.col("event_type") == "click").alias("is1"),
        F.expr(
            "CAST(FLOOR(value * CAST(1000000 AS DOUBLE)"
            " + CAST(0.5 AS DOUBLE)) AS BIGINT)"
        ).alias("m"),
    )
    suff = micro.agg(
        F.sum(F.when(F.col("is1"), 1).otherwise(0)).alias("n1"),
        F.sum(F.when(~F.col("is1"), 1).otherwise(0)).alias("n2"),
        F.sum(F.when(F.col("is1"), F.col("m")).otherwise(0)).alias("s1"),
        F.sum(F.when(~F.col("is1"), F.col("m")).otherwise(0)).alias("s2"),
        F.sum(
            F.when(
                F.col("is1"),
                F.col("m").cast("decimal(38,0)") * F.col("m"),
            ).otherwise(F.lit(0).cast("decimal(38,0)"))
        ).alias("q1"),
        F.sum(
            F.when(
                ~F.col("is1"),
                F.col("m").cast("decimal(38,0)") * F.col("m"),
            ).otherwise(F.lit(0).cast("decimal(38,0)"))
        ).alias("q2"),
    )
    return suff.select(
        F.col("n1").cast("long").alias("n1"),
        F.col("n2").cast("long").alias("n2"),
        F.round(F.expr(_TOST_DIFF), 6).alias("mean_diff_micro"),
        F.round(F.expr(_TOST_ZL), 6).alias("z_lower"),
        F.round(F.expr(_TOST_ZU), 6).alias("z_upper"),
        F.expr(
            f"{_TOST_ZL} > {_TOST_Z_CRIT} AND {_TOST_ZU} > {_TOST_Z_CRIT}"
        ).alias("equivalent"),
    )


STAT_TOST_SQL = f"""
WITH micro AS (
  SELECT event_type = 'click' AS is1,
         CAST(FLOOR(value * CAST(1000000 AS DOUBLE)
              + CAST(0.5 AS DOUBLE)) AS BIGINT) AS m
  FROM events WHERE event_type IN ('click', 'view')
), suff AS (
  SELECT SUM(CASE WHEN is1 THEN 1 ELSE 0 END) AS n1,
         SUM(CASE WHEN NOT is1 THEN 1 ELSE 0 END) AS n2,
         SUM(CASE WHEN is1 THEN m ELSE 0 END) AS s1,
         SUM(CASE WHEN NOT is1 THEN m ELSE 0 END) AS s2,
         SUM(CASE WHEN is1 THEN CAST(m AS HUGEINT) * m ELSE 0 END) AS q1,
         SUM(CASE WHEN NOT is1 THEN CAST(m AS HUGEINT) * m ELSE 0 END) AS q2
  FROM micro
)
SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
       ROUND({_TOST_DIFF}, 6) AS mean_diff_micro,
       ROUND({_TOST_ZL}, 6) AS z_lower,
       ROUND({_TOST_ZU}, 6) AS z_upper,
       {_TOST_ZL} > {_TOST_Z_CRIT} AND {_TOST_ZU} > {_TOST_Z_CRIT}
         AS equivalent
FROM suff
"""


# ---------------------------------------------------------------------------
# stat_sprt — sequential probability ratio test over the daily stream
# ---------------------------------------------------------------------------

_SPRT_P0 = "0.19"
_SPRT_P1 = "0.21"
# nano-quantized per-success / per-failure LLR increments and Wald
# boundaries (α = β = 0.05) — constant expressions, identical text in
# both engines, so everything downstream is exact integer arithmetic.
_SPRT_C1 = (
    f"CAST(FLOOR(ln(CAST({_SPRT_P1} AS DOUBLE) / {_SPRT_P0})"
    " * CAST(1000000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)"
)
_SPRT_C0 = (
    f"CAST(FLOOR(ln((CAST(1 AS DOUBLE) - {_SPRT_P1})"
    f" / (CAST(1 AS DOUBLE) - {_SPRT_P0}))"
    " * CAST(1000000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)"
)
_SPRT_UP = (
    "CAST(FLOOR(ln(CAST(0.95 AS DOUBLE) / CAST(0.05 AS DOUBLE))"
    " * CAST(1000000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)"
)
_SPRT_LO = (
    "CAST(FLOOR(ln(CAST(0.05 AS DOUBLE) / CAST(0.95 AS DOUBLE))"
    " * CAST(1000000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)"
)


def stat_sprt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald sequential probability ratio test on the daily purchase
    conversion rate (H₀: p = 0.19 vs H₁: p = 0.21, α = β = 0.05): each
    day contributes k·ln(p₁/p₀) + (n−k)·ln((1−p₁)/(1−p₀)) to the
    running log-likelihood ratio; the test stops the first day the
    cumulative LLR crosses a Wald boundary — the always-valid
    sequential monitor that lets an experiment stop early without
    p-hacking.

    The four ln constants quantize to nano integers once (identical
    constant expressions both engines), so every increment, cumulative
    sum, and boundary comparison is EXACT BIGINT arithmetic. Scale:
    one day-grain rollup; the cumulative window runs over the bounded
    day table."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.expr("CAST(ts AS DATE)").alias("d")).agg(
        F.count("*").alias("n"),
        F.sum((F.col("event_type") == "purchase").cast("long")).alias("k"),
    )
    w_cum = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    llr = daily.withColumn(
        "inc_nano",
        F.expr(f"k * {_SPRT_C1} + (n - k) * {_SPRT_C0}"),
    ).withColumn("llr_nano", F.sum("inc_nano").over(w_cum))
    return llr.select(
        "d",
        F.col("n").cast("long").alias("n"),
        F.col("k").cast("long").alias("k"),
        F.col("llr_nano").cast("long").alias("llr_nano"),
        F.expr(
            f"CASE WHEN llr_nano >= {_SPRT_UP} THEN 'accept_h1'"
            f" WHEN llr_nano <= {_SPRT_LO} THEN 'accept_h0'"
            " ELSE 'continue' END"
        ).alias("decision"),
    ).orderBy("d")


STAT_SPRT_SQL = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, COUNT(*) AS n,
         SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS k
  FROM events GROUP BY 1
), llr AS (
  SELECT d, n, k,
         SUM(k * {_SPRT_C1} + (n - k) * {_SPRT_C0}) OVER (ORDER BY d
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS llr_nano
  FROM daily
)
SELECT d, CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k,
       CAST(llr_nano AS BIGINT) AS llr_nano,
       CASE WHEN llr_nano >= {_SPRT_UP} THEN 'accept_h1'
            WHEN llr_nano <= {_SPRT_LO} THEN 'accept_h0'
            ELSE 'continue' END AS decision
FROM llr
ORDER BY d
"""


# ---------------------------------------------------------------------------
# ml_adversarial_validation — split-hygiene AUC between two hash splits
# ---------------------------------------------------------------------------

_AV_H = (
    "CAST(conv(substring(md5(concat('av|', CAST(l_orderkey AS STRING), '|',"
    " CAST(l_linenumber AS STRING))), 1, 15), 16, 10) AS BIGINT)"
)
_AV_H_DUCK = (
    "('0x' || substr(md5('av|' || CAST(l_orderkey AS VARCHAR) || '|'"
    " || CAST(l_linenumber AS VARCHAR)), 1, 15))::BIGINT"
)
# AUC from 2×U (tie-adjusted): AUC = U1/(n1·n2), with 2U1 exact.
_AV_AUC = "CAST(u1x2 AS DOUBLE) / (CAST(2 AS DOUBLE) * n1 * n2)"


def ml_adversarial_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adversarial validation of the portable-hash train/test split:
    the AUC of l_quantity at distinguishing split A from split B.
    AUC ≈ 0.5 certifies the split is feature-blind (exchangeable);
    a drifted AUC flags leakage or a skewed split BEFORE a model is
    trained on it — the standard pre-flight check for any offline
    evaluation.

    AUC = U/(n₁·n₂) comes from the same bounded-domain rank-sum trick
    as stat_mannwhitney (2·rank from per-value counts, 2·U exact
    BIGINT) — no row-level ranking anywhere; one partial-agg shuffle
    collapses the fact table to the ≤50-value domain."""
    l = load_table(spark, sf_dir, "lineitem")
    per_v = (
        l.select(
            F.col("l_quantity").cast("long").alias("v"),
            (F.expr(_AV_H) % 2 == 0).cast("long").alias("g1"),
        )
        .groupBy("v")
        .agg(F.count("*").alias("c"), F.sum("g1").alias("c1"))
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    ranked = per_v.withColumn(
        "r2", 2 * F.coalesce(F.sum("c").over(w), F.lit(0)) + F.col("c") + 1
    )
    agg = ranked.agg(
        F.sum("c1").alias("n1"),
        F.sum(F.col("c") - F.col("c1")).alias("n2"),
        F.sum(F.col("c1") * F.col("r2")).alias("r1x2"),
    )
    return agg.select(
        F.col("n1").cast("long").alias("n1"),
        F.col("n2").cast("long").alias("n2"),
        (F.col("r1x2") - F.col("n1") * (F.col("n1") + 1))
        .cast("long")
        .alias("u1x2"),
    ).select(
        "n1",
        "n2",
        "u1x2",
        F.round(F.expr(_AV_AUC), 6).alias("adversarial_auc"),
    )


ML_ADVERSARIAL_SQL = f"""
WITH per_v AS (
  SELECT CAST(l_quantity AS BIGINT) AS v, COUNT(*) AS c,
         SUM(CASE WHEN {_AV_H_DUCK} % 2 = 0 THEN 1 ELSE 0 END) AS c1
  FROM lineitem GROUP BY 1
), ranked AS (
  SELECT v, c, c1,
         2 * COALESCE(SUM(c) OVER (ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + c + 1 AS r2
  FROM per_v
), agg AS (
  SELECT CAST(SUM(c1) AS BIGINT) AS n1,
         CAST(SUM(c - c1) AS BIGINT) AS n2,
         CAST(SUM(c1 * r2) AS BIGINT) AS r1x2
  FROM ranked
), u AS (
  SELECT n1, n2, CAST(r1x2 - n1 * (n1 + 1) AS BIGINT) AS u1x2 FROM agg
)
SELECT n1, n2, u1x2, ROUND({_AV_AUC}, 6) AS adversarial_auc
FROM u
"""


# ---------------------------------------------------------------------------
# stat_winsorized_mean — 5%-winsorized mean per group (clamp, not drop)
# ---------------------------------------------------------------------------

_WINSOR_PCT = 5


def stat_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5%-winsorized mean per order priority — stat_trimmed_mean's
    sibling that CLAMPS the tails to the boundary order statistics
    instead of dropping them (keeps n constant, the estimator
    robust-statistics texts prefer when sample size matters): the
    bottom k = floor(n·5/100) totals are replaced by the (k+1)-th
    value and the top k by the (n−k)-th.

    Exact cents end-to-end: ranks break ties on o_orderkey so the
    clamp set is identical in both engines; the boundary values are
    values selected at two fixed ranks and broadcast back by group;
    the winsorized sum is an exact BIGINT. The per-group rank is
    grouped_range_rank (a priority-partitioned window would sort a
    fifth of orders in ONE task at any scale), then a map-side
    aggregate."""
    from ..operators.ranking import grouped_range_rank

    o = load_table(spark, sf_dir, "orders")
    cents = F.expr(
        "CAST(FLOOR(o_totalprice * CAST(100 AS DOUBLE)"
        " + CAST(0.5 AS DOUBLE)) AS BIGINT)"
    )
    ranked = grouped_range_rank(
        o.select(
            F.col("o_orderpriority").alias("g"),
            cents.alias("v"),
            "o_orderkey",
        ),
        ["g"],
        ["v", "o_orderkey"],
        "r",
        count_col="n",
    ).withColumn("k", F.expr(f"n * {_WINSOR_PCT} div 100"))
    clamp = (
        ranked.filter(
            (F.col("r") == F.col("k") + 1)
            | (F.col("r") == F.col("n") - F.col("k"))
        )
        .groupBy("g")
        .agg(
            F.max(
                F.when(F.col("r") == F.col("k") + 1, F.col("v"))
            ).alias("lo"),
            F.max(
                F.when(F.col("r") == F.col("n") - F.col("k"), F.col("v"))
            ).alias("hi"),
        )
    )
    bounds = ranked.join(F.broadcast(clamp), "g")
    wins = bounds.select(
        "g",
        "n",
        "k",
        F.expr(
            "CASE WHEN r <= k THEN lo WHEN r > n - k THEN hi ELSE v END"
        ).alias("wv"),
        F.col("v"),
    )
    return (
        wins.groupBy("g")
        .agg(
            F.max("n").cast("long").alias("n"),
            F.max("k").cast("long").alias("k_clamped_each_tail"),
            F.sum("wv").cast("long").alias("winsorized_cents"),
            F.round(
                F.expr("CAST(SUM(wv) AS DOUBLE) / COUNT(*)"), 6
            ).alias("winsorized_mean_cents"),
            F.round(
                F.expr("CAST(SUM(v) AS DOUBLE) / COUNT(*)"), 6
            ).alias("raw_mean_cents"),
        )
        .orderBy("g")
    )


STAT_WINSOR_SQL = f"""
WITH ranked AS (
  SELECT o_orderpriority AS g,
         CAST(FLOOR(o_totalprice * CAST(100 AS DOUBLE)
              + CAST(0.5 AS DOUBLE)) AS BIGINT) AS v,
         o_orderkey,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
           ORDER BY CAST(FLOOR(o_totalprice * CAST(100 AS DOUBLE)
              + CAST(0.5 AS DOUBLE)) AS BIGINT), o_orderkey) AS r,
         COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
  FROM orders
), kd AS (
  SELECT *, n * {_WINSOR_PCT} // 100 AS k FROM ranked
), bounds AS (
  SELECT *,
         MAX(CASE WHEN r = k + 1 THEN v END) OVER (PARTITION BY g) AS lo,
         MAX(CASE WHEN r = n - k THEN v END) OVER (PARTITION BY g) AS hi
  FROM kd
), wins AS (
  SELECT g, n, k,
         CASE WHEN r <= k THEN lo WHEN r > n - k THEN hi ELSE v END AS wv,
         v
  FROM bounds
)
SELECT g, CAST(MAX(n) AS BIGINT) AS n,
       CAST(MAX(k) AS BIGINT) AS k_clamped_each_tail,
       CAST(SUM(wv) AS BIGINT) AS winsorized_cents,
       ROUND(CAST(SUM(wv) AS DOUBLE) / COUNT(*), 6) AS winsorized_mean_cents,
       ROUND(CAST(SUM(v) AS DOUBLE) / COUNT(*), 6) AS raw_mean_cents
FROM wins
GROUP BY g
ORDER BY g
"""


# ---------------------------------------------------------------------------
# stat_circular_hours — circular statistics of event time-of-day
# ---------------------------------------------------------------------------

# Circular moments from the 24-bin hour histogram: the 24 cos/sin
# values are the same IEEE expressions over integer h in both engines;
# each count-weighted term quantizes to an exact nano integer BEFORE
# summing, because near-uniform hours cancel C and S down to noise
# where a float-sum ordering difference would swing atan2 wildly —
# integer sums make the angle bit-stable.
_CIRC_ANG = "(CAST(h AS DOUBLE) * 2 * pi() / 24)"
_CIRC_C_NANO = (
    f"CAST(FLOOR(c * cos({_CIRC_ANG}) * CAST(1000000000 AS DOUBLE)"
    " + CAST(0.5 AS DOUBLE)) AS BIGINT)"
)
_CIRC_S_NANO = (
    f"CAST(FLOOR(c * sin({_CIRC_ANG}) * CAST(1000000000 AS DOUBLE)"
    " + CAST(0.5 AS DOUBLE)) AS BIGINT)"
)


def stat_circular_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Circular statistics of event time-of-day per event type: the
    circular mean hour and the resultant length R̄ (1 = all events at
    the same hour, 0 = uniform around the clock) — the CORRECT way to
    average hours (the arithmetic mean of 23:00 and 01:00 is noon;
    the circular mean is midnight), used for peak-hour detection and
    diurnal-pattern monitoring.

    One rollup to the (type, hour) 24-bin histogram; C = Σ c·cos θ_h,
    S = Σ c·sin θ_h over those bins; mean hour = atan2(S, C)·24/2π
    (shifted into [0, 24)); R̄ = √(C²+S²)/n. All trig runs over the
    24 integer bins, never the fact table."""
    e = load_table(spark, sf_dir, "events")
    hist = e.groupBy(
        F.col("event_type").alias("etype"), F.hour("ts").alias("h")
    ).agg(F.count("*").alias("c"))
    moms = hist.groupBy("etype").agg(
        F.sum("c").alias("n"),
        F.sum(F.expr(_CIRC_C_NANO)).alias("cc"),
        F.sum(F.expr(_CIRC_S_NANO)).alias("ss"),
    )
    return moms.select(
        "etype",
        F.col("n").cast("long").alias("n"),
        F.round(
            F.expr(
                "((atan2(CAST(ss AS DOUBLE), CAST(cc AS DOUBLE))"
                " * 24 / (2 * pi())) + 24) % 24"
            ),
            6,
        ).alias("circ_mean_hour"),
        F.round(
            F.expr(
                "sqrt(CAST(cc AS DOUBLE) * cc + CAST(ss AS DOUBLE) * ss)"
                " / (CAST(1000000000 AS DOUBLE) * n)"
            ),
            6,
        ).alias("resultant_r"),
    ).orderBy("etype")


STAT_CIRC_SQL = f"""
WITH hist AS (
  SELECT event_type AS etype, hour(ts) AS h, COUNT(*) AS c
  FROM events GROUP BY 1, 2
), moms AS (
  SELECT etype, CAST(SUM(c) AS BIGINT) AS n,
         CAST(SUM({_CIRC_C_NANO}) AS BIGINT) AS cc,
         CAST(SUM({_CIRC_S_NANO}) AS BIGINT) AS ss
  FROM hist GROUP BY 1
)
SELECT etype, n,
       ROUND(((atan2(CAST(ss AS DOUBLE), CAST(cc AS DOUBLE))
               * 24 / (2 * pi())) + 24) % 24, 6) AS circ_mean_hour,
       ROUND(sqrt(CAST(cc AS DOUBLE) * cc + CAST(ss AS DOUBLE) * ss)
             / (CAST(1000000000 AS DOUBLE) * n), 6) AS resultant_r
FROM moms
ORDER BY etype
"""


# ---------------------------------------------------------------------------
# stat_anova_twoway — two-factor cell-model ANOVA census
# ---------------------------------------------------------------------------


def stat_anova_twoway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-factor ANOVA census on order totals (A = priority, B =
    status): the CELL-model F-test (is any A×B cell mean different?)
    plus the marginal sums of squares for each factor — the first
    read on a two-way design before picking contrasts. The cell-model
    F = (SS_cells/(c−1))/(SS_within/(n−c)) is valid for unbalanced
    data; the A/B marginal SS are reported as descriptive shares of
    the cell SS (the balanced-design additive decomposition — this
    corpus is near-balanced; an unbalanced Type-II fit would go
    through stat_reg_multi's Gram machinery).

    One rollup to the ≤15 exact-cents cell sufficient statistics
    (squares as DECIMAL(38,0)); margins and totals fold from the cell
    table; every ratio is the shared IEEE expression (round 6)."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.expr(
        "CAST(FLOOR(o_totalprice * CAST(100 AS DOUBLE)"
        " + CAST(0.5 AS DOUBLE)) AS BIGINT)"
    )
    cells = (
        o.select(
            F.col("o_orderpriority").alias("a"),
            F.col("o_orderstatus").alias("b"),
            cents.alias("v"),
        )
        .groupBy("a", "b")
        .agg(
            F.count("*").alias("n_c"),
            F.sum("v").alias("s_c"),
            F.sum(F.col("v").cast("decimal(38,0)") * F.col("v")).alias("q_c"),
        )
        .localCheckpoint()  # ≤15 rows, feeds four rollups
    )
    w_all = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    base = cells.select(
        "a",
        "b",
        "n_c",
        "s_c",
        "q_c",
        F.sum("n_c").over(w_all).alias("n"),
        F.sum("s_c").over(w_all).alias("s"),
        F.sum("q_c").over(w_all).alias("q"),
        F.count("*").over(w_all).alias("n_cells"),
    )
    # Each S²/n term quantizes to an integer (FLOOR of the same IEEE
    # expression in both engines) and sums as DECIMAL(38,0): a plain
    # double sum over the 15 terms is ORDER-DEPENDENT at 1e15 magnitude
    # where round(6) can't absorb it (observed 11th-digit drift). Terms
    # scale down by 10⁶ first because Spark's FLOOR(double) returns
    # LONG and the grand term exceeds Long.MAX at sf0.01 (observed
    # saturation at 9.22e18); 10⁶-unit granularity leaves 9+ exact
    # significant digits on every SS.
    def _sq_term(s: str, n: str) -> str:
        return (
            f"CAST(FLOOR(CAST({s} AS DOUBLE) * {s} / {n}"
            " / CAST(1000000 AS DOUBLE)"
            " + CAST(0.5 AS DOUBLE)) AS DECIMAL(38,0))"
        )

    folded = base.agg(
        F.max("n").alias("n"),
        F.max("n_cells").alias("n_cells"),
        F.round(
            F.max(
                F.expr("CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s / n")
            ),
            6,
        ).alias("ss_total"),
        (
            (
                F.sum(F.expr(_sq_term("s_c", "n_c")))
                - F.max(F.expr(_sq_term("s", "n")))
            ).cast("double")
            * F.lit(1_000_000.0)
        ).alias("ss_cells"),
    )
    marg_a = (
        cells.groupBy("a")
        .agg(F.sum("n_c").alias("n_a"), F.sum("s_c").alias("s_a"))
        .crossJoin(
            F.broadcast(
                cells.agg(
                    F.sum("n_c").alias("n"), F.sum("s_c").alias("s")
                )
            )
        )
        .agg(
            (
                (
                    F.sum(F.expr(_sq_term("s_a", "n_a")))
                    - F.max(F.expr(_sq_term("s", "n")))
                ).cast("double")
                * F.lit(1_000_000.0)
            ).alias("ss_a")
        )
    )
    marg_b = (
        cells.groupBy("b")
        .agg(F.sum("n_c").alias("n_b"), F.sum("s_c").alias("s_b"))
        .crossJoin(
            F.broadcast(
                cells.agg(
                    F.sum("n_c").alias("n"), F.sum("s_c").alias("s")
                )
            )
        )
        .agg(
            (
                (
                    F.sum(F.expr(_sq_term("s_b", "n_b")))
                    - F.max(F.expr(_sq_term("s", "n")))
                ).cast("double")
                * F.lit(1_000_000.0)
            ).alias("ss_b")
        )
    )
    return (
        folded.crossJoin(F.broadcast(marg_a))
        .crossJoin(F.broadcast(marg_b))
        .select(
            F.col("n").cast("long").alias("n"),
            F.col("n_cells").cast("long").alias("n_cells"),
            "ss_total",
            "ss_cells",
            "ss_a",
            "ss_b",
            F.round(
                F.expr(
                    "((ss_cells) / (n_cells - 1))"
                    " / ((ss_total - ss_cells) / (n - n_cells))"
                ),
                6,
            ).alias("f_cells"),
        )
    )


STAT_ANOVA2_SQL = """
WITH cells AS (
  SELECT o_orderpriority AS a, o_orderstatus AS b,
         COUNT(*) AS n_c,
         CAST(SUM(CAST(FLOOR(o_totalprice * CAST(100 AS DOUBLE)
              + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS BIGINT) AS s_c,
         SUM(CAST(CAST(FLOOR(o_totalprice * CAST(100 AS DOUBLE)
              + CAST(0.5 AS DOUBLE)) AS BIGINT) AS HUGEINT)
             * CAST(FLOOR(o_totalprice * CAST(100 AS DOUBLE)
              + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS q_c
  FROM orders GROUP BY 1, 2
), base AS (
  SELECT *, SUM(n_c) OVER () AS n, SUM(s_c) OVER () AS s,
         SUM(q_c) OVER () AS q, COUNT(*) OVER () AS n_cells
  FROM cells
), folded AS (
  SELECT MAX(n) AS n, MAX(n_cells) AS n_cells,
         ROUND(MAX(CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s / n), 6)
           AS ss_total,
         CAST(SUM(CAST(FLOOR(CAST(s_c AS DOUBLE) * s_c / n_c
                  / CAST(1000000 AS DOUBLE)
                  + CAST(0.5 AS DOUBLE)) AS HUGEINT))
              - MAX(CAST(FLOOR(CAST(s AS DOUBLE) * s / n
                  / CAST(1000000 AS DOUBLE)
                  + CAST(0.5 AS DOUBLE)) AS HUGEINT)) AS DOUBLE)
           * CAST(1000000 AS DOUBLE) AS ss_cells
  FROM base
), marg_a AS (
  SELECT CAST(SUM(CAST(FLOOR(CAST(s_a AS DOUBLE) * s_a / n_a
                  / CAST(1000000 AS DOUBLE)
                  + CAST(0.5 AS DOUBLE)) AS HUGEINT))
              - MAX(CAST(FLOOR(CAST(s AS DOUBLE) * s / n
                  / CAST(1000000 AS DOUBLE)
                  + CAST(0.5 AS DOUBLE)) AS HUGEINT)) AS DOUBLE)
           * CAST(1000000 AS DOUBLE) AS ss_a
  FROM (SELECT a, SUM(n_c) AS n_a, SUM(s_c) AS s_a FROM cells GROUP BY 1),
       (SELECT SUM(n_c) AS n, SUM(s_c) AS s FROM cells)
), marg_b AS (
  SELECT CAST(SUM(CAST(FLOOR(CAST(s_b AS DOUBLE) * s_b / n_b
                  / CAST(1000000 AS DOUBLE)
                  + CAST(0.5 AS DOUBLE)) AS HUGEINT))
              - MAX(CAST(FLOOR(CAST(s AS DOUBLE) * s / n
                  / CAST(1000000 AS DOUBLE)
                  + CAST(0.5 AS DOUBLE)) AS HUGEINT)) AS DOUBLE)
           * CAST(1000000 AS DOUBLE) AS ss_b
  FROM (SELECT b, SUM(n_c) AS n_b, SUM(s_c) AS s_b FROM cells GROUP BY 1),
       (SELECT SUM(n_c) AS n, SUM(s_c) AS s FROM cells)
)
SELECT CAST(n AS BIGINT) AS n, CAST(n_cells AS BIGINT) AS n_cells,
       ss_total, ss_cells, ss_a, ss_b,
       ROUND((ss_cells / (n_cells - 1))
             / ((ss_total - ss_cells) / (n - n_cells)), 6) AS f_cells
FROM folded, marg_a, marg_b
"""


# ---------------------------------------------------------------------------
# ml_pinball_eval — pinball-loss evaluation of group quantile forecasts
# ---------------------------------------------------------------------------


def ml_pinball_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pinball (quantile) loss of per-group q50/q90 point forecasts on
    order totals — the metric that scores quantile forecasts the way
    RMSE scores mean forecasts (a forecast that nails the median can
    still be terrible at the 90th percentile; this shows both).

    Predictions are the EXACT group quantiles by deterministic rank
    selection (type-1, ties on orderkey — identical row in both
    engines); the loss keeps exactness by scaling ×100: each term is
    q·(y−ŷ) or (100−q)·(ŷ−y) in integer cents, so group sums and the
    integer-ppm means are hash-exact. The per-group rank is
    grouped_range_rank (a priority-partitioned window would sort a
    fifth of orders in ONE task at any scale); the two selected
    quantile rows broadcast back by group; then one aggregate."""
    from ..operators.ranking import grouped_range_rank

    o = load_table(spark, sf_dir, "orders")
    cents = F.expr(
        "CAST(FLOOR(o_totalprice * CAST(100 AS DOUBLE)"
        " + CAST(0.5 AS DOUBLE)) AS BIGINT)"
    )
    ranked = grouped_range_rank(
        o.select(
            F.col("o_orderpriority").alias("g"), cents.alias("v"), "o_orderkey"
        ),
        ["g"],
        ["v", "o_orderkey"],
        "rn",
        count_col="n",
    )
    qsel = (
        ranked.filter(
            (F.col("rn") == F.expr("(n - 1) * 50 div 100 + 1"))
            | (F.col("rn") == F.expr("(n - 1) * 90 div 100 + 1"))
        )
        .groupBy("g")
        .agg(
            F.max(
                F.when(
                    F.col("rn") == F.expr("(n - 1) * 50 div 100 + 1"),
                    F.col("v"),
                )
            ).alias("q50"),
            F.max(
                F.when(
                    F.col("rn") == F.expr("(n - 1) * 90 div 100 + 1"),
                    F.col("v"),
                )
            ).alias("q90"),
        )
    )
    preds = ranked.join(F.broadcast(qsel), "g")
    losses = preds.select(
        "g",
        F.expr(
            "CASE WHEN v >= q50 THEN 50 * (v - q50)"
            " ELSE 50 * (q50 - v) END"
        ).alias("pb50"),
        F.expr(
            "CASE WHEN v >= q90 THEN 90 * (v - q90)"
            " ELSE 10 * (q90 - v) END"
        ).alias("pb90"),
        "q50",
        "q90",
    )
    return (
        losses.groupBy("g")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.max("q50").cast("long").alias("q50_cents"),
            F.max("q90").cast("long").alias("q90_cents"),
            F.expr("CAST(SUM(pb50) div COUNT(*) AS BIGINT)").alias(
                "mean_pinball50_x100"
            ),
            F.expr("CAST(SUM(pb90) div COUNT(*) AS BIGINT)").alias(
                "mean_pinball90_x100"
            ),
        )
        .orderBy("g")
    )


ML_PINBALL_SQL = """
WITH ranked AS (
  SELECT o_orderpriority AS g,
         CAST(FLOOR(o_totalprice * CAST(100 AS DOUBLE)
              + CAST(0.5 AS DOUBLE)) AS BIGINT) AS v,
         o_orderkey,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
           ORDER BY CAST(FLOOR(o_totalprice * CAST(100 AS DOUBLE)
              + CAST(0.5 AS DOUBLE)) AS BIGINT), o_orderkey) AS rn,
         COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
  FROM orders
), preds AS (
  SELECT *,
         MAX(CASE WHEN rn = (n - 1) * 50 // 100 + 1 THEN v END)
           OVER (PARTITION BY g) AS q50,
         MAX(CASE WHEN rn = (n - 1) * 90 // 100 + 1 THEN v END)
           OVER (PARTITION BY g) AS q90
  FROM ranked
), losses AS (
  SELECT g, q50, q90,
         CASE WHEN v >= q50 THEN 50 * (v - q50)
              ELSE 50 * (q50 - v) END AS pb50,
         CASE WHEN v >= q90 THEN 90 * (v - q90)
              ELSE 10 * (q90 - v) END AS pb90
  FROM preds
)
SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MAX(q50) AS BIGINT) AS q50_cents,
       CAST(MAX(q90) AS BIGINT) AS q90_cents,
       CAST(SUM(pb50) // COUNT(*) AS BIGINT) AS mean_pinball50_x100,
       CAST(SUM(pb90) // COUNT(*) AS BIGINT) AS mean_pinball90_x100
FROM losses
GROUP BY g
ORDER BY g
"""


# ---------------------------------------------------------------------------
# stat_ljung_box — portmanteau whiteness test on the daily series
# ---------------------------------------------------------------------------

_LB_MAXLAG = 5

# Centered lag-k autocorrelation from exact integer sums:
# ρ_k = (Σ x_t·x_{t-k} − x̄·(tail+head) + (n−k)·x̄²) / (Σ x² − n·x̄²)
_LB_RHO = (
    "((CAST(sxy AS DOUBLE) - (CAST(s AS DOUBLE) / n) * (tail_s + head_s)"
    " + (n - k) * (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n))"
    " / (CAST(sxx AS DOUBLE) - CAST(s AS DOUBLE) * s / n))"
)


def stat_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box portmanteau test (lags 1-5) on daily event counts:
    Q = n(n+2)·Σ ρ_k²/(n−k) — the "is anything left in the residuals"
    whiteness gate every forecasting pipeline runs after fitting
    (large Q = the series still has structure a model should capture).

    One fact rollup to day grain; lag cross-products ride a window
    over the bounded day table (the stat_acf shape); every ρ_k comes
    from exact integer sufficient statistics through the same IEEE
    expression, and Q sums 5 such terms (round 6)."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.date_trunc("day", "ts").alias("d")).agg(
        F.count("*").alias("x")
    )
    w = Window.orderBy("d")
    lagged = daily.select(
        "d",
        "x",
        *[
            F.lag("x", k).over(w).alias(f"x_{k}")
            for k in range(1, _LB_MAXLAG + 1)
        ],
    ).localCheckpoint()
    per_lag = None
    for k in range(1, _LB_MAXLAG + 1):
        part = lagged.filter(F.col(f"x_{k}").isNotNull()).agg(
            F.lit(k).alias("k"),
            F.sum(F.col("x") * F.col(f"x_{k}")).alias("sxy"),
            F.sum("x").alias("tail_s"),
            F.sum(f"x_{k}").alias("head_s"),
        )
        per_lag = part if per_lag is None else per_lag.unionByName(part)
    glob = daily.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("s"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    rho = per_lag.crossJoin(F.broadcast(glob)).select(
        "k",
        "n",
        F.expr(_LB_RHO).alias("rho"),
    )
    return rho.agg(
        F.max("n").cast("long").alias("n_days"),
        F.lit(_LB_MAXLAG).cast("long").alias("max_lag"),
        F.round(
            F.sum(F.expr("n * (n + 2) * rho * rho / (n - k)")), 6
        ).alias("ljung_box_q"),
    )


STAT_LJUNGBOX_SQL = f"""
WITH daily AS (
  SELECT date_trunc('day', ts) AS d, COUNT(*) AS x FROM events GROUP BY 1
), lagged AS (
  SELECT d, x,
         {', '.join(f"LAG(x, {k}) OVER (ORDER BY d) AS x_{k}" for k in range(1, _LB_MAXLAG + 1))}
  FROM daily
), per_lag AS (
  {' UNION ALL '.join(
      f'''SELECT {k} AS k, CAST(SUM(x * x_{k}) AS BIGINT) AS sxy,
         CAST(SUM(x) AS BIGINT) AS tail_s,
         CAST(SUM(x_{k}) AS BIGINT) AS head_s
  FROM lagged WHERE x_{k} IS NOT NULL'''
      for k in range(1, _LB_MAXLAG + 1)
  )}
), gtot AS (
  SELECT COUNT(*) AS n, CAST(SUM(x) AS BIGINT) AS s,
         CAST(SUM(x * x) AS BIGINT) AS sxx
  FROM daily
), rho AS (
  SELECT k, n, {_LB_RHO} AS rho FROM per_lag, gtot
)
SELECT CAST(MAX(n) AS BIGINT) AS n_days,
       CAST({_LB_MAXLAG} AS BIGINT) AS max_lag,
       ROUND(SUM(n * (n + 2) * rho * rho / (n - k)), 6) AS ljung_box_q
FROM rho
"""


# ---------------------------------------------------------------------------
# stat_mood_median — Mood's median test across order priorities
# ---------------------------------------------------------------------------


def stat_mood_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mood's median test: does any order-priority group sit above or
    below the GLOBAL median total more often than chance? Counts per
    group above vs ≤ the global lower median feed a 2×5 chi-squared —
    the quick nonparametric "are the medians equal" screen (coarser
    than Kruskal-Wallis but robust to any tail shape).

    The global lower median is a TWO-PASS bucketed quantile selection —
    never a row ranking: the fact table collapses once to the
    (priority, cents) histogram; a ~600-row $1000-bucket rollup of that
    histogram locates the median bucket by cumulative count, and the
    exact cent selects within that single bucket (≤1e5 distinct cents,
    a bounded-constant grain). No window anywhere touches a
    row-count-sized input, so the plan is two partial-agg shuffles plus
    broadcast joins at 100 TB. The chi-squared folds exact integer
    cells through the shared IEEE expression."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.expr(
        "CAST(FLOOR(o_totalprice * CAST(100 AS DOUBLE)"
        " + CAST(0.5 AS DOUBLE)) AS BIGINT)"
    )
    w_all = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    bucket_w = 100000  # $1000 buckets over the o_totalprice cents domain
    ghist = (
        o.select(F.col("o_orderpriority").alias("g"), cents.alias("v"))
        .groupBy("g", "v")
        .agg(F.count("*").alias("c"))
        .localCheckpoint()
    )
    hist = ghist.groupBy("v").agg(F.sum("c").alias("c"))
    tot = hist.agg(F.sum("c").alias("n"))
    coarse = hist.groupBy((F.col("v") - F.col("v") % bucket_w).alias("b")).agg(
        F.sum("c").alias("cb")
    )
    w_b = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    sel = (
        coarse.select(
            "b", "cb", F.coalesce(F.sum("cb").over(w_b), F.lit(0)).alias("cum0")
        )
        .crossJoin(F.broadcast(tot))
        .filter(F.expr("cum0 + cb >= (n + 1) div 2"))
        .orderBy("b")
        .limit(1)
        .select(F.col("b").alias("b_star"), "cum0", "n")
    )
    fine = hist.join(
        F.broadcast(sel), (F.col("v") - F.col("v") % bucket_w) == F.col("b_star")
    )
    w_f = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    gmed_row = (
        fine.select(
            "v", (F.col("cum0") + F.sum("c").over(w_f)).alias("cum"), "n"
        )
        .filter(F.expr("cum >= (n + 1) div 2"))
        .agg(F.min("v").alias("gmed"))
    )
    cells = (
        ghist.crossJoin(F.broadcast(gmed_row))
        .groupBy("g")
        .agg(
            F.sum(F.expr("IF(v > gmed, c, 0)")).alias("above"),
            F.sum(F.expr("IF(v <= gmed, c, 0)")).alias("below"),
        )
    )
    tot = cells.select(
        "g",
        "above",
        "below",
        F.sum("above").over(w_all).alias("ta"),
        F.sum("below").over(w_all).alias("tb"),
        F.sum(F.col("above") + F.col("below")).over(w_all).alias("n"),
    )
    chi = tot.select(
        "g",
        "above",
        "below",
        F.expr(
            "(above - CAST((above + below) AS DOUBLE) * ta / n)"
            " * (above - CAST((above + below) AS DOUBLE) * ta / n)"
            " / (CAST((above + below) AS DOUBLE) * ta / n)"
            " + (below - CAST((above + below) AS DOUBLE) * tb / n)"
            " * (below - CAST((above + below) AS DOUBLE) * tb / n)"
            " / (CAST((above + below) AS DOUBLE) * tb / n)"
        ).alias("chi_g"),
    )
    return chi.agg(
        F.sum(F.col("above") + F.col("below")).cast("long").alias("n"),
        F.count("*").cast("long").alias("k_groups"),
        F.round(F.sum("chi_g"), 6).alias("chi2"),
    )


STAT_MOOD_SQL = """
WITH ranked AS (
  SELECT o_orderpriority AS g,
         CAST(FLOOR(o_totalprice * CAST(100 AS DOUBLE)
              + CAST(0.5 AS DOUBLE)) AS BIGINT) AS v,
         ROW_NUMBER() OVER (ORDER BY CAST(FLOOR(o_totalprice
           * CAST(100 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT),
           o_orderkey) AS rn,
         COUNT(*) OVER () AS n
  FROM orders
), med AS (
  SELECT *, MAX(CASE WHEN rn = (n + 1) // 2 THEN v END) OVER () AS gmed
  FROM ranked
), cells AS (
  SELECT g, SUM(CASE WHEN v > gmed THEN 1 ELSE 0 END) AS above,
         SUM(CASE WHEN v <= gmed THEN 1 ELSE 0 END) AS below
  FROM med GROUP BY 1
), tot AS (
  SELECT g, above, below,
         SUM(above) OVER () AS ta, SUM(below) OVER () AS tb,
         SUM(above + below) OVER () AS n
  FROM cells
), chi AS (
  SELECT g, above, below,
         (above - CAST((above + below) AS DOUBLE) * ta / n)
         * (above - CAST((above + below) AS DOUBLE) * ta / n)
         / (CAST((above + below) AS DOUBLE) * ta / n)
         + (below - CAST((above + below) AS DOUBLE) * tb / n)
         * (below - CAST((above + below) AS DOUBLE) * tb / n)
         / (CAST((above + below) AS DOUBLE) * tb / n) AS chi_g
  FROM tot
)
SELECT CAST(SUM(above + below) AS BIGINT) AS n,
       CAST(COUNT(*) AS BIGINT) AS k_groups,
       ROUND(SUM(chi_g), 6) AS chi2
FROM chi
"""


# ---------------------------------------------------------------------------
# stat_mann_kendall — nonparametric monotone-trend test on the daily series
# ---------------------------------------------------------------------------

# Tie-corrected variance of S: (n(n−1)(2n+5) − Σ t(t−1)(2t+5)) / 18,
# with the ±1 continuity correction toward zero.
_MK_Z = (
    "CASE WHEN s_stat > 0 THEN (CAST(s_stat AS DOUBLE) - 1) / sqrt(var18 / 18.0)"
    " WHEN s_stat < 0 THEN (CAST(s_stat AS DOUBLE) + 1) / sqrt(var18 / 18.0)"
    " ELSE CAST(0 AS DOUBLE) END"
)


def stat_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall monotone-trend test on daily event counts:
    S = Σ_{i<j} sign(x_j − x_i) with the tie-corrected variance and
    continuity-corrected z — the nonparametric trend detector paired
    with stat_theil_sen's slope (KPI drift monitoring without a
    linearity assumption).

    The pairwise sum runs over the BOUNDED day table (one self-join
    of ≤#days rows — never the fact table); S, the tie term and the
    18×variance are exact BIGINTs; z is one shared IEEE expression."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.expr("CAST(ts AS DATE)").alias("d")).agg(
        F.count("*").alias("x")
    ).localCheckpoint()
    a = daily.select(F.col("d").alias("da"), F.col("x").alias("xa"))
    b = daily.select(F.col("d").alias("db"), F.col("x").alias("xb"))
    s_stat = (
        a.join(b, F.col("da") < F.col("db"))
        .agg(
            F.sum(F.expr("CAST(SIGN(xb - xa) AS BIGINT)")).alias("s_stat"),
            F.count("*").alias("n_pairs"),
        )
    )
    ties = (
        daily.groupBy("x")
        .agg(F.count("*").alias("t"))
        .agg(
            F.sum(
                F.expr("t * (t - 1) * (2 * t + 5)")
            ).alias("tie18"),
            F.sum(F.lit(1) * F.col("t")).alias("n"),
        )
    )
    return (
        s_stat.crossJoin(F.broadcast(ties))
        .select(
            F.col("n").cast("long").alias("n_days"),
            F.col("s_stat").cast("long").alias("s_stat"),
            F.expr(
                "CAST(n * (n - 1) * (2 * n + 5) - tie18 AS BIGINT)"
            ).alias("var18"),
        )
        .select(
            "n_days",
            "s_stat",
            "var18",
            F.round(F.expr(_MK_Z), 6).alias("z"),
        )
    )


STAT_MK_SQL = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, COUNT(*) AS x FROM events GROUP BY 1
), s AS (
  SELECT CAST(SUM(CAST(SIGN(b.x - a.x) AS BIGINT)) AS BIGINT) AS s_stat
  FROM daily a JOIN daily b ON a.d < b.d
), ties AS (
  SELECT CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie18,
         CAST(SUM(t) AS BIGINT) AS n
  FROM (SELECT x, COUNT(*) AS t FROM daily GROUP BY 1)
), folded AS (
  SELECT n AS n_days, s_stat,
         CAST(n * (n - 1) * (2 * n + 5) - tie18 AS BIGINT) AS var18
  FROM s, ties
)
SELECT n_days, s_stat, var18, ROUND({_MK_Z}, 6) AS z
FROM folded
"""


# ---------------------------------------------------------------------------
# ml_auc_delong — AUC with the DeLong placement-based standard error
# ---------------------------------------------------------------------------

# Placement of score v for positives: fraction of negatives strictly
# below + half the ties (the midrank convention), from exact counts.
_DL_V10 = (
    "((CAST(cum_neg_below AS DOUBLE) + CAST(c_neg AS DOUBLE) / 2) / n_neg)"
)
_DL_V01 = (
    "((CAST(pos_above AS DOUBLE) + CAST(c_pos AS DOUBLE) / 2) / n_pos)"
)


def ml_auc_delong(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUC of quantity at separating returned (returnflag 'R') from
    kept lineitems, WITH the DeLong standard error and 95% CI — the
    inference-grade AUC report (a point AUC without its DeLong SE
    can't say whether 0.52 beats 0.50).

    The placement machinery never touches rows: quantity's bounded
    domain gives per-value positive/negative counts, placements
    V10/V01 derive from cumulative windows over that ≤50-row table,
    and the placement variances are count-weighted sums over it. One
    fact-table rollup is the only corpus-sized stage. AUC itself is
    the exact midrank U; variances round(6)."""
    l = load_table(spark, sf_dir, "lineitem")
    per_v = (
        l.select(
            F.col("l_quantity").cast("long").alias("v"),
            (F.col("l_returnflag") == "R").cast("long").alias("pos"),
        )
        .groupBy("v")
        .agg(
            F.sum("pos").alias("c_pos"),
            F.sum(1 - F.col("pos")).alias("c_neg"),
        )
    )
    w_below = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    w_above = Window.orderBy("v").rowsBetween(1, Window.unboundedFollowing)
    w_all = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    placed = per_v.select(
        "v",
        "c_pos",
        "c_neg",
        F.coalesce(F.sum("c_neg").over(w_below), F.lit(0)).alias(
            "cum_neg_below"
        ),
        F.coalesce(F.sum("c_pos").over(w_above), F.lit(0)).alias("pos_above"),
        F.sum("c_pos").over(w_all).alias("n_pos"),
        F.sum("c_neg").over(w_all).alias("n_neg"),
    )
    # exact midrank AUC ×2: 2·Σ c_pos·(2·cum_neg_below + c_neg) carries
    # the halves as integers
    scored = placed.select(
        "c_pos",
        "c_neg",
        "n_pos",
        "n_neg",
        # 2·U grows ~n_pos·n_neg — exact decimal, past BIGINT at scale
        F.expr("CAST(c_pos AS DECIMAL(38,0)) * (2 * cum_neg_below + c_neg)").alias("u2"),
        F.expr(_DL_V10).alias("v10"),
        F.expr(_DL_V01).alias("v01"),
    )
    agg = scored.agg(
        F.max("n_pos").alias("n_pos"),
        F.max("n_neg").alias("n_neg"),
        F.sum("u2").alias("u2"),
        F.sum(F.expr("c_pos * v10 * v10")).alias("s10_raw"),
        F.sum(F.expr("c_neg * v01 * v01")).alias("s01_raw"),
    )
    return agg.select(
        F.col("n_pos").cast("long").alias("n_pos"),
        F.col("n_neg").cast("long").alias("n_neg"),
        F.round(
            F.expr("CAST(u2 AS DOUBLE) / (2 * CAST(n_pos AS DOUBLE) * n_neg)"),
            9,
        ).alias("auc"),
        F.round(
            F.expr(
                "sqrt("
                "(s10_raw / n_pos - (CAST(u2 AS DOUBLE)"
                " / (2 * CAST(n_pos AS DOUBLE) * n_neg))"
                " * (CAST(u2 AS DOUBLE) / (2 * CAST(n_pos AS DOUBLE) * n_neg)))"
                " * n_pos / (n_pos - 1) / n_pos"
                " + (s01_raw / n_neg - (CAST(u2 AS DOUBLE)"
                " / (2 * CAST(n_pos AS DOUBLE) * n_neg))"
                " * (CAST(u2 AS DOUBLE) / (2 * CAST(n_pos AS DOUBLE) * n_neg)))"
                " * n_neg / (n_neg - 1) / n_neg"
                ")"
            ),
            9,
        ).alias("delong_se"),
    )


ML_DELONG_SQL = f"""
WITH per_v AS (
  SELECT CAST(l_quantity AS BIGINT) AS v,
         SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS c_pos,
         SUM(CASE WHEN l_returnflag = 'R' THEN 0 ELSE 1 END) AS c_neg
  FROM lineitem GROUP BY 1
), placed AS (
  SELECT v, c_pos, c_neg,
         COALESCE(SUM(c_neg) OVER (ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS cum_neg_below,
         COALESCE(SUM(c_pos) OVER (ORDER BY v
           ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING), 0)
           AS pos_above,
         SUM(c_pos) OVER () AS n_pos,
         SUM(c_neg) OVER () AS n_neg
  FROM per_v
), scored AS (
  SELECT c_pos, c_neg, n_pos, n_neg,
         CAST(c_pos AS HUGEINT) * (2 * cum_neg_below + c_neg) AS u2,
         {_DL_V10} AS v10,
         {_DL_V01} AS v01
  FROM placed
), agg AS (
  SELECT CAST(MAX(n_pos) AS BIGINT) AS n_pos,
         CAST(MAX(n_neg) AS BIGINT) AS n_neg,
         SUM(u2) AS u2,
         SUM(c_pos * v10 * v10) AS s10_raw,
         SUM(c_neg * v01 * v01) AS s01_raw
  FROM scored
)
SELECT n_pos, n_neg,
       ROUND(CAST(u2 AS DOUBLE) / (2 * CAST(n_pos AS DOUBLE) * n_neg), 9)
         AS auc,
       ROUND(sqrt(
         (s10_raw / n_pos - (CAST(u2 AS DOUBLE)
          / (2 * CAST(n_pos AS DOUBLE) * n_neg))
          * (CAST(u2 AS DOUBLE) / (2 * CAST(n_pos AS DOUBLE) * n_neg)))
          * n_pos / (n_pos - 1) / n_pos
         + (s01_raw / n_neg - (CAST(u2 AS DOUBLE)
          / (2 * CAST(n_pos AS DOUBLE) * n_neg))
          * (CAST(u2 AS DOUBLE) / (2 * CAST(n_pos AS DOUBLE) * n_neg)))
          * n_neg / (n_neg - 1) / n_neg
       ), 9) AS delong_se
FROM agg
"""


# ---------------------------------------------------------------------------
# stat_jonckheere — Jonckheere-Terpstra ordered-alternative trend test
# ---------------------------------------------------------------------------


def stat_jonckheere(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jonckheere-Terpstra test for an ORDERED alternative across
    return-flag classes (A < N < R in the fixed label order): J sums the two-sample
    U statistics over all ordered group pairs — strictly more
    powerful than Kruskal-Wallis when the hypothesis is monotone
    ("higher priority ⇒ higher totals"), the standard dose-response
    trend test.

    2·J stays exact (DECIMAL(38,0); HUGEINT in the oracle — it grows
    ~n²/2, past BIGINT around sf~500) via the bounded-domain midrank trick on
    every (g₁<g₂, value) pair table (quantity domain ≤50 × 10 group
    pairs); z uses the no-tie null variance (documented
    approximation — ties are corrected in the U's themselves via
    midranks). One fact rollup; everything after is 500-row
    arithmetic."""
    l = load_table(spark, sf_dir, "lineitem")
    hist = (
        l.select(
            F.col("l_returnflag").alias("g"),
            F.col("l_quantity").cast("long").alias("v"),
        )
        .groupBy("g", "v")
        .agg(F.count("*").alias("c"))
        .localCheckpoint()
    )
    w_below = Window.partitionBy("g").orderBy("v").rowsBetween(
        Window.unboundedPreceding, -1
    )
    cum = hist.select(
        "g",
        "v",
        "c",
        F.coalesce(F.sum("c").over(w_below), F.lit(0)).alias("cum_below"),
    )
    a = cum.select(
        F.col("g").alias("g1"),
        F.col("v").alias("v1"),
        F.col("c").alias("c1"),
        F.col("cum_below").alias("cb1"),
    )
    b = cum.select(
        F.col("g").alias("g2"),
        F.col("v").alias("v2"),
        F.col("c").alias("c2"),
    )
    # 2·U(g1,g2) = Σ_v c2(v)·(2·cum1_below(v) + c1(v)) over matching v,
    # plus 2·(pairs where v2 has no matching v1 bucket) — handled by
    # joining b to a's cumulative at the same v via a full domain join.
    u2 = (
        b.join(
            a,
            (F.col("g1") < F.col("g2")) & (F.col("v1") == F.col("v2")),
            "inner",
        )
        .groupBy("g1", "g2")
        .agg(
            F.sum(
                F.expr("CAST(c2 AS DECIMAL(38,0)) * (2 * cb1 + c1)")
            ).alias("u2_matched")
        )
    )
    # buckets of g2 with no exact-v bucket in g1 contribute
    # c2 · 2 · (count of g1 values < v) — fold them via an asof-style
    # join on the g1 cumulative evaluated at the largest v1 ≤ v2
    tot1 = cum.groupBy("g").agg(F.sum("c").alias("n_g")).localCheckpoint()
    unmatched = (
        b.join(
            cum.select(
                F.col("g").alias("g1"),
                F.col("v").alias("v1"),
                F.col("c").alias("c1"),
                F.col("cum_below").alias("cb1"),
            ),
            (F.col("g1") < F.col("g2")) & (F.col("v1") == F.col("v2")),
            "left_anti",
        )
        .join(
            cum.select(
                F.col("g").alias("g1"),
                F.col("v").alias("v1"),
                (F.col("cum_below") + F.col("c")).alias("cum_le1"),
            ),
            (F.col("g1") < F.col("g2")) & (F.col("v1") < F.col("v2")),
            "inner",
        )
        .groupBy("g1", "g2", "v2", "c2")
        .agg(F.max("cum_le1").alias("below1"))
        .groupBy("g1", "g2")
        .agg(
            F.sum(
                F.expr("CAST(c2 AS DECIMAL(38,0)) * 2 * below1")
            ).alias("u2_unmatched")
        )
    )
    per_pair = (
        u2.join(unmatched, ["g1", "g2"], "full_outer")
        .select(
            "g1",
            "g2",
            (
                F.coalesce("u2_matched", F.lit(0))
                + F.coalesce("u2_unmatched", F.lit(0))
            ).alias("u2"),
        )
    )
    j2 = per_pair.agg(F.sum("u2").alias("j2"))
    sizes = tot1.agg(
        F.sum("n_g").alias("n"),
        F.sum(F.expr("CAST(n_g AS DECIMAL(38,0)) * n_g")).alias("sum_ng2"),
        # n_g³-scale term overflows BIGINT past ~2M rows/group — exact
        # DECIMAL(38,0) in Spark, HUGEINT in the oracle
        F.sum(
            F.expr("CAST(n_g AS DECIMAL(38,0)) * n_g * (2 * n_g + 3)")
        ).alias("sum_ng2_term"),
    )
    return j2.crossJoin(F.broadcast(sizes)).select(
        # 2·J grows ~n²/2 — exact decimal internally, nearest-double out
        F.col("j2").cast("double").alias("j_x2"),
        F.col("n").cast("long").alias("n"),
        F.round(
            F.expr(
                "(CAST(j2 AS DOUBLE) / 2"
                " - (CAST(n AS DOUBLE) * n - sum_ng2) / 4)"
                " / sqrt((CAST(n AS DOUBLE) * n * (2 * n + 3)"
                " - sum_ng2_term) / 72)"
            ),
            6,
        ).alias("z"),
    )


STAT_JT_SQL = """
WITH hist AS (
  SELECT l_returnflag AS g, CAST(l_quantity AS BIGINT) AS v, COUNT(*) AS c
  FROM lineitem GROUP BY 1, 2
), cum AS (
  SELECT g, v, c,
         COALESCE(SUM(c) OVER (PARTITION BY g ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_below
  FROM hist
), u2m AS (
  SELECT a.g AS g1, b.g AS g2,
         SUM(CAST(b.c AS HUGEINT) * (2 * a.cum_below + a.c)) AS u2_matched
  FROM cum a JOIN cum b ON a.g < b.g AND a.v = b.v
  GROUP BY 1, 2
), unmatched_b AS (
  SELECT a1.g AS g1, b.g AS g2, b.v AS v2, b.c AS c2,
         MAX(a1.cum_below + a1.c) AS below1
  FROM cum b
  JOIN cum a1 ON a1.g < b.g AND a1.v < b.v
  WHERE NOT EXISTS (SELECT 1 FROM cum a2
                    WHERE a2.g = a1.g AND a2.v = b.v)
  GROUP BY 1, 2, 3, 4
), u2u AS (
  SELECT g1, g2, SUM(CAST(c2 AS HUGEINT) * 2 * below1) AS u2_unmatched
  FROM unmatched_b GROUP BY 1, 2
), per_pair AS (
  SELECT COALESCE(m.g1, u.g1) AS g1, COALESCE(m.g2, u.g2) AS g2,
         COALESCE(m.u2_matched, 0) + COALESCE(u.u2_unmatched, 0) AS u2
  FROM u2m m FULL OUTER JOIN u2u u ON m.g1 = u.g1 AND m.g2 = u.g2
), j AS (
  SELECT SUM(CAST(u2 AS HUGEINT)) AS j2 FROM per_pair
), sizes AS (
  SELECT CAST(SUM(n_g) AS BIGINT) AS n,
         SUM(CAST(n_g AS HUGEINT) * n_g) AS sum_ng2,
         SUM(CAST(n_g AS HUGEINT) * n_g * (2 * n_g + 3)) AS sum_ng2_term
  FROM (SELECT g, SUM(c) AS n_g FROM hist GROUP BY 1)
)
SELECT CAST(j2 AS DOUBLE) AS j_x2, n,
       ROUND((CAST(j2 AS DOUBLE) / 2
              - (CAST(n AS DOUBLE) * n - sum_ng2) / 4)
             / sqrt((CAST(n AS DOUBLE) * n * (2 * n + 3)
              - sum_ng2_term) / 72), 6) AS z
FROM j, sizes
"""


QUERIES = {
    "ml_auc_delong": (ml_auc_delong, ML_DELONG_SQL),
    "stat_jonckheere": (stat_jonckheere, STAT_JT_SQL),
    "stat_mann_kendall": (stat_mann_kendall, STAT_MK_SQL),
    "stat_ljung_box": (stat_ljung_box, STAT_LJUNGBOX_SQL),
    "stat_mood_median": (stat_mood_median, STAT_MOOD_SQL),
    "stat_anova_twoway": (stat_anova_twoway, STAT_ANOVA2_SQL),
    "ml_pinball_eval": (ml_pinball_eval, ML_PINBALL_SQL),
    "stat_circular_hours": (stat_circular_hours, STAT_CIRC_SQL),
    "ml_adversarial_validation": (ml_adversarial_validation, ML_ADVERSARIAL_SQL),
    "stat_winsorized_mean": (stat_winsorized_mean, STAT_WINSOR_SQL),
    "stat_equivalence_tost": (stat_equivalence_tost, STAT_TOST_SQL),
    "stat_sprt": (stat_sprt, STAT_SPRT_SQL),
    "stat_granger_daily": (stat_granger_daily, STAT_GRANGER_SQL),
    "stat_mcnemar": (stat_mcnemar, STAT_MCNEMAR_SQL),
    "stat_nelson_aalen": (stat_nelson_aalen, STAT_NA_SQL),
    "stat_wilcoxon_signed": (stat_wilcoxon_signed, STAT_WILCOXON_SQL),
    "stat_hodges_lehmann": (stat_hodges_lehmann, STAT_HL_SQL),
    "stat_bh_fdr": (stat_bh_fdr, STAT_BH_SQL),
    "stat_weighted_median": (stat_weighted_median, STAT_WMEDIAN_SQL),
    "stat_friedman": (stat_friedman, STAT_FRIEDMAN_SQL),
    "stat_influence_diag": (stat_influence_diag, STAT_INFLUENCE_SQL),
    "stat_runs_test": (stat_runs_test, STAT_RUNS_SQL),
    "stat_cohens_kappa": (stat_cohens_kappa, STAT_KAPPA_SQL),
    "stat_cramers_v": (stat_cramers_v, STAT_CRAMERS_SQL),
    "stat_levene_bf": (stat_levene_bf, STAT_LEVENE_SQL),
    "stat_permutation_test": (stat_permutation_test, STAT_PERM_SQL),
    "stat_skew_kurtosis": (stat_skew_kurtosis, STAT_MOMENTS_SQL),
    "stat_survival_lifetable": (stat_survival_lifetable, STAT_SURVIVAL_SQL),
    "stat_cem_att": (stat_cem_att, STAT_CEM_SQL),
    "stat_qini_uplift": (stat_qini_uplift, STAT_QINI_SQL),
    "stat_eb_shrinkage": (stat_eb_shrinkage, STAT_EB_SQL),
    "stat_control_chart": (stat_control_chart, STAT_XBAR_SQL),
    "stat_trimmed_mean": (stat_trimmed_mean, STAT_TRIM_SQL),
    "stat_anova_oneway": (stat_anova_oneway, STAT_ANOVA_SQL),
    "stat_spearman": (stat_spearman, STAT_SPEARMAN_SQL),
    "stat_kendall_tau": (stat_kendall_tau, STAT_KENDALL_SQL),
    "stat_power_analysis": (stat_power_analysis, STAT_POWER_SQL),
    "stat_reg_group": (stat_reg_group, STAT_REG_SQL),
    "stat_reg_multi": (stat_reg_multi, STAT_REG_MULTI_SQL),
    "stat_chi2_independence": (stat_chi2_independence, STAT_CHI2_SQL),
    "stat_corr_matrix": (stat_corr_matrix, STAT_CORR_SQL),
    "stat_ab_welch": (stat_ab_welch, STAT_WELCH_SQL),
    "stat_mannwhitney": (stat_mannwhitney, STAT_MANNWHITNEY_SQL),
    "stat_ks_test": (stat_ks_test, STAT_KS_SQL),
    "stat_mad_outliers": (stat_mad_outliers, STAT_MAD_SQL),
    "stat_bootstrap_ci": (stat_bootstrap_ci, STAT_BOOT_SQL),
    "stat_ab_assignment": (stat_ab_assignment, STAT_SRM_SQL),
    "stat_cuped": (stat_cuped, STAT_CUPED_SQL),
    "stat_acf": (stat_acf, STAT_ACF_SQL),
    "stat_ewma": (stat_ewma, STAT_EWMA_SQL),
    "stat_theil_sen": (stat_theil_sen, STAT_THEIL_SEN_SQL),
    "stat_gini_lorenz": (stat_gini_lorenz, STAT_GINI_SQL),
}
