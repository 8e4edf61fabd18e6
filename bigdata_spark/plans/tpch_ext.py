"""Extended TPC-H coverage over the TPC-H-ish testdata.

The driver schema has no ``partsupp`` table and trims several columns
(no l_commitdate/l_receiptdate, no c_phone/o_comment), so the queries
that reference them are ADAPTED — the adaptation is named per query.
Join/aggregate shapes and the optimizer features each query exercises
(correlated scalar subqueries, OR-of-ANDs predicate pushdown, count
histograms, having-on-max, anti-join existence checks) are preserved.

Scale notes: every dim side (region/nation/supplier/part + derived
per-part aggregates) is broadcast explicitly; fact-side joins shuffle
on their keys; all money sums are exact DECIMAL → DOUBLE at the edge
(cross-engine float discipline, plans/__init__)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load_table


def _dec2(c: str) -> F.Column:
    return F.col(c).cast("decimal(18,2)")


def _vol() -> F.Column:
    return (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")


# --- Q8: national market share -------------------------------------------

def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market share of NATION_3-supplied volume within AMERICA-customer
    ECONOMY-part order volume, by order year. 7-way star join: facts
    shuffle, every dim broadcast; the share is a ratio of two exact
    DECIMAL sums taken in DOUBLE."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("o_orderdate") <= F.to_timestamp(F.lit("1997-12-31")))
    )
    c = load_table(spark, sf_dir, "customer")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    s = load_table(spark, sf_dir, "supplier")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), "n_regionkey"
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    zero = F.lit(0).cast("decimal(18,6)")
    df = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == n1.c_nkey)
        .join(F.broadcast(r), n1.n_regionkey == r.r_regionkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), s.s_nationkey == n2.s_nkey)
    )
    return (
        df.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(F.when(F.col("supp_nation") == "NATION_3", _vol()).otherwise(zero))
            .cast("double")
            .alias("nation_vol"),
            F.sum(_vol()).cast("double").alias("total_vol"),
        )
        .select(
            "o_year", (F.col("nation_vol") / F.col("total_vol")).alias("mkt_share")
        )
    )


TPCH_Q8_SQL = """
SELECT year(o_orderdate) AS o_year,
  CAST(SUM(CASE WHEN n2.n_name = 'NATION_3'
       THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))
       ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
  / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)
  AS mkt_share
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region ON n1.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE p_type = 'ECONOMY' AND r_name = 'AMERICA'
  AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
GROUP BY 1
"""


# --- Q9 (adapted): revenue by supplier nation and year --------------------

def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 adapted: the schema has no partsupp/ps_supplycost, so profit
    degrades to discounted revenue; the join/aggregate shape (part-name
    LIKE scan, supplier-nation rollup by year) is Q9's."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").contains("widget"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(_vol()).cast("double").alias("sum_revenue"))
    )


TPCH_Q9_SQL = """
SELECT n_name AS nation, year(o_orderdate) AS o_year,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY 1, 2
"""


# --- Q13 (adapted): customer order-count distribution ---------------------

def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer distribution histogram: left join keeps zero-order
    customers, the excluded class is an order attribute (adapted from
    o_comment NOT LIKE to o_orderpriority <> '1-URGENT' — same
    join-with-residual-condition shape)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


TPCH_Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) GROUP BY c_count
"""


# --- Q15: top supplier(s) by quarterly revenue ----------------------------

def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue view over one quarter, then the having-on-global-max
    shape. The max is a global window over the ALREADY-aggregated
    per-supplier rows (supplier-cardinality table — the single
    partition is fine at any fact scale; it never sees fact rows)."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-04-01")))
    )
    s = load_table(spark, sf_dir, "supplier")
    rev = l.groupBy("l_suppkey").agg(
        F.sum(_vol()).cast("double").alias("total_revenue")
    )
    mx = Window.partitionBy()
    top = rev.withColumn("_mx", F.max("total_revenue").over(mx)).filter(
        F.col("total_revenue") == F.col("_mx")
    )
    return top.join(F.broadcast(s), top.l_suppkey == s.s_suppkey).select(
        "s_suppkey", "s_name", "total_revenue"
    )


TPCH_Q15_SQL = """
WITH revenue AS (
  SELECT l_suppkey,
    CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = l_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""


# --- Q16 (adapted): supplier counts by part attributes --------------------

def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 adapted: no partsupp, so "suppliers offering the part" means
    suppliers OBSERVED shipping it in lineitem. Same shape: negated
    filters on the part dim, count-distinct rollup over three part
    attributes."""
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (~F.col("p_type").startswith("PROMO"))
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    )
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


TPCH_Q16_SQL = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1' AND p_type NOT LIKE 'PROMO%'
  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
GROUP BY 1, 2, 3
"""


# --- Q17: small-quantity-order revenue (correlated scalar subquery) -------

def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The correlated 0.2·avg(quantity) subquery decorrelates into a
    per-part aggregate joined back to the fact — the per-part avg table
    is part-cardinality, broadcast. avg is the exact DECIMAL sum over
    DOUBLE count, same op order in the oracle."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    avg_q = l.groupBy(F.col("l_partkey").alias("ap_key")).agg(
        (F.sum(_dec2("l_quantity")).cast("double") / F.count("*")).alias("avg_q")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(avg_q), l.l_partkey == F.col("ap_key"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_q"))
        .agg(
            (F.sum(_dec2("l_extendedprice")).cast("double") / 7.0).alias("avg_yearly")
        )
    )


TPCH_Q17_SQL = """
WITH avg_part AS (
  SELECT l_partkey AS ap_key,
    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_q
  FROM lineitem GROUP BY 1
)
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN avg_part ON l_partkey = ap_key
WHERE p_brand = 'Brand#3' AND l_quantity < 0.2 * avg_q
"""


# --- Q19: OR-of-ANDs discounted revenue -----------------------------------

def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three AND-blocks OR-ed together across both join sides — the
    predicate-pushdown stress: the part-side conjuncts prune the
    broadcast build, the lineitem conjuncts must reach the scan."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(1, 15)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(5, 20)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(20, 40)
            & F.col("l_quantity").between(20, 50)
        )
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(F.sum(_vol()).cast("double").alias("revenue"))
    )


TPCH_Q19_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 1 AND 15)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 5 AND 20 AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 40 AND l_quantity BETWEEN 20 AND 50)
"""


# --- Q22 (adapted): dormant high-balance customers ------------------------

def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 adapted: the schema has no c_phone, so the 'country code'
    becomes c_nationkey % 10, and 'no orders' becomes 'no orders since
    2000' (every synthetic customer has SOME order — the unfiltered
    anti-join would be vacuously empty). Shape preserved: scalar
    above-average balance threshold + NOT EXISTS anti-join + per-code
    rollup."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        (F.col("c_nationkey") % 10).alias("cntrycode"),
        F.col("c_acctbal"),
    )
    elig = c.filter(F.col("cntrycode").isin(1, 3, 5, 7))
    avg_df = (
        elig.filter(F.col("c_acctbal") > 0)
        .agg(
            (F.sum(_dec2("c_acctbal")).cast("double") / F.count("*")).alias("avg_bal")
        )
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.to_timestamp(F.lit("2000-01-01"))
    )
    return (
        elig.join(F.broadcast(avg_df))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, elig.c_custkey == o.o_custkey, "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count("*").alias("numcust"),
            F.sum(_dec2("c_acctbal")).cast("double").alias("totacctbal"),
        )
    )


TPCH_Q22_SQL = """
WITH elig AS (
  SELECT c_custkey, c_nationkey % 10 AS cntrycode, c_acctbal
  FROM customer WHERE c_nationkey % 10 IN (1, 3, 5, 7)
),
thresh AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_bal
  FROM elig WHERE c_acctbal > 0
)
SELECT cntrycode, COUNT(*) AS numcust,
  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM elig, thresh
WHERE c_acctbal > avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY cntrycode
"""


QUERIES = {
    "tpch_q8": (tpch_q8, TPCH_Q8_SQL),
    "tpch_q9_adapted": (tpch_q9, TPCH_Q9_SQL),
    "tpch_q13_adapted": (tpch_q13, TPCH_Q13_SQL),
    "tpch_q15": (tpch_q15, TPCH_Q15_SQL),
    "tpch_q16_adapted": (tpch_q16, TPCH_Q16_SQL),
    "tpch_q17": (tpch_q17, TPCH_Q17_SQL),
    "tpch_q19": (tpch_q19, TPCH_Q19_SQL),
    "tpch_q22_adapted": (tpch_q22, TPCH_Q22_SQL),
}
