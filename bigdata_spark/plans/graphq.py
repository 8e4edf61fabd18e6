"""Graph analytics queries: fixed-point PageRank over the nation-level
trade graph (customer nation → supplier nation, weighted by lineitem
count).

The registry's other graph operator, connected components
(operators/graph.py, dedup_clusters), is oracle-checked against a
recursive CTE; PageRank is float-iterative in every textbook
implementation, which breaks hash-exact oracles. Here the iteration is
integer fixed-point (operators/graph.pagerank_fixed_point), so the
DuckDB oracle — the same 10 rounds unrolled as chained CTEs with
identical integer division — matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table

_PR_ITERS = 10
_PR_SCALE = 1_000_000_000_000
_PR_NUM = 17
_PR_DEN = 20


def _trade_edges(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    edges = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .select(
            F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst")
        )
        .groupBy("src", "dst")
        .agg(F.count("*").alias("w"))
    )
    nodes = n.select(F.col("n_nationkey").alias("node"))
    return nodes, edges


def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-round fixed-point PageRank on the nation trade graph. The
    fact joins build the edge list once (one shuffle per join, dims
    broadcast); each round is a partial-aggregated groupBy + broadcast-
    scale node join on a 25-node rank table."""
    from ..operators.graph import pagerank_fixed_point

    nodes, edges = _trade_edges(spark, sf_dir)
    ranks = pagerank_fixed_point(
        nodes, edges, iterations=_PR_ITERS, scale=_PR_SCALE,
        damping_num=_PR_NUM, damping_den=_PR_DEN,
    )
    n = load_table(spark, sf_dir, "nation")
    return (
        ranks.join(F.broadcast(n), ranks.node == n.n_nationkey)
        .select(F.col("node").alias("n_nationkey"), "n_name", "mass")
        .orderBy(F.desc("mass"), "n_nationkey")
    )


def _pagerank_sql() -> str:
    base = _PR_SCALE * (_PR_DEN - _PR_NUM) // _PR_DEN
    steps = []
    for i in range(_PR_ITERS):
        steps.append(
            f"""pr{i + 1} AS (
  SELECT n.node,
         CAST({base} + COALESCE(SUM(
           (((p.mass * {_PR_NUM}) // {_PR_DEN}) * e.w) // e.out_w
         ), 0) AS BIGINT) AS mass
  FROM nodes n
  LEFT JOIN (edges_w e JOIN pr{i} p ON p.node = e.src) ON e.dst = n.node
  GROUP BY n.node
)"""
        )
    chain = ",\n".join(steps)
    return f"""
WITH nodes AS (SELECT n_nationkey AS node FROM nation),
edges AS (
  SELECT c_nationkey AS src, s_nationkey AS dst, COUNT(*) AS w
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  GROUP BY 1, 2
),
edges_w AS (
  SELECT e.*, o.out_w FROM edges e
  JOIN (SELECT src, SUM(w) AS out_w FROM edges GROUP BY 1) o USING (src)
),
pr0 AS (SELECT node, CAST({_PR_SCALE} AS BIGINT) AS mass FROM nodes),
{chain}
SELECT p.node AS n_nationkey, n.n_name, p.mass
FROM pr{_PR_ITERS} p JOIN nation n ON p.node = n.n_nationkey
ORDER BY p.mass DESC, p.node
"""


GRAPH_PAGERANK_SQL = _pagerank_sql()

QUERIES = {
    "graph_pagerank": (graph_pagerank, GRAPH_PAGERANK_SQL),
}
