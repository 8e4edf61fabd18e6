"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship composed query on sf0.001;
``queries()`` exposes every implemented operator (SURVEY.md §2 plus the
training-data-pipeline surface) as (spark, sf_dir) → DataFrame;
``oracle_sql()`` gives the DuckDB-equivalent SQL for each (omitted only
for engine-RNG / approximate ops, which get rows-only checks).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001 (SURVEY §7 Phase 1).

    One DAG exercising the reference's core shapes: one-pass min/max
    aggregate (A1) → normalize projection (F2) → ranked stratified
    partition assignment (W1) → grouped stats (A2) ⋈ branch totals (J2)
    → conditional ratio (F4) → weighted-Gini-style rollup (A5).
    """
    from bigdata_spark.operators.preprocess import min_max_normalize, min_max_stats

    sf_dir = "/root/testdata/sf0.001"
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_quantity", "l_extendedprice"
    )
    stats = min_max_stats(l, ["l_quantity", "l_extendedprice"])
    norm = min_max_normalize(l, ["l_quantity", "l_extendedprice"], stats)

    w = Window.partitionBy("l_returnflag").orderBy("l_orderkey", "l_linenumber")
    assigned = norm.withColumn(
        "pid", ((F.row_number().over(w) - 1) % 4).cast("long")
    )

    per_cell = assigned.groupBy("l_returnflag", "pid").agg(
        F.count("*").alias("n"),
        F.avg("l_quantity").alias("avg_q_norm"),
        F.avg("l_extendedprice").alias("avg_price_norm"),
    )
    totals = per_cell.groupBy("l_returnflag").agg(F.sum("n").alias("flag_total"))
    return (
        per_cell.join(totals, "l_returnflag")
        .select(
            "l_returnflag",
            "pid",
            "n",
            F.when(F.col("flag_total") > 0, F.col("n") / F.col("flag_total"))
            .otherwise(F.lit(0.0))
            .alias("cell_fraction"),
            F.round("avg_q_norm", 6).alias("avg_q_norm"),
            F.round("avg_price_norm", 6).alias("avg_price_norm"),
        )
        .orderBy("l_returnflag", "pid")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from bigdata_spark.plans import all_queries

    return {name: fn for name, (fn, _sql) in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    from bigdata_spark.plans import all_queries

    return {name: sql for name, (_fn, sql) in all_queries().items() if sql is not None}
