"""Connected components over candidate-pair edges — the cluster-
resolution step a dedup pipeline needs after pair generation (MinHash /
LSH / embedding pairs → duplicate CLUSTERS, keep one doc per cluster).

Algorithm: iterative min-label propagation. Each vertex starts labeled
with its own id; every round it takes the min label among itself and
its neighbors; convergence in O(graph diameter) rounds. Near-dup
graphs are unions of small cliques-ish components, so the diameter is
tiny in practice (2-4 rounds).

Scale notes (100 TB):
- each round is one join + one groupBy — both shuffle on vertex id, so
  partitioning is stable across rounds and AQE coalesces the tails;
- ``localCheckpoint`` truncates the lineage every round (an iterative
  loop otherwise re-plans an ever-growing DAG);
- the early-exit change count is a cheap aggregate on the label table
  (vertex-cardinality, far smaller than the edge table);
- for pathological long-chain graphs, swap in the large-star/small-star
  variant (Kiveris et al., "Connected Components in MapReduce") — same
  join primitives, fewer rounds; not needed for dedup-shaped graphs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    driver_threshold: int = 1_000_000,
) -> DataFrame:
    """(src, dst) undirected edge list → (vertex, component) where
    ``component`` is the minimum vertex id reachable from ``vertex``.
    Deterministic; raises if not converged within ``max_iter`` rounds.

    Below ``driver_threshold`` edges, the COMPACT pair list (two longs
    per edge — never payloads) is collected and closed with union-find
    on the driver: one job instead of ~3 jobs × diameter rounds. Above
    it, the distributed min-label propagation runs. Same hybrid shape
    as the IVF coarse quantizer: the data that must be global is tiny,
    so ship it to the driver while it is; the distributed path exists
    for when it is not."""
    # materialize the edge list ONCE — candidate-pair generation (LSH
    # join, cosine verify) is the expensive part and must not re-execute
    # on every propagation round. Null endpoints are dropped up front so
    # both paths agree (the distributed equi-join would drop them too).
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a").isNotNull() & F.col("b").isNotNull())
        .localCheckpoint()
    )
    n_edges = e.count()
    if n_edges <= driver_threshold:
        from pyspark.sql.types import StructField, StructType

        vertex_type = e.schema["a"].dataType
        out_schema = StructType(
            [
                StructField("vertex", vertex_type, False),
                StructField("component", vertex_type, False),
            ]
        )
        pairs = [(r["a"], r["b"]) for r in e.collect()]
        parent: dict = {}

        def find(x):
            root = x
            while parent[root] != root:
                root = parent[root]
            while parent[x] != root:  # path compression
                parent[x], x = root, parent[x]
            return root

        for a, b in pairs:
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:  # union by min id keeps components deterministic
                lo, hi = min(ra, rb), max(ra, rb)
                parent[hi] = lo
        rows = [(v, find(v)) for v in parent]
        return e.sparkSession.createDataFrame(rows, out_schema)
    sym = e.unionAll(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    labels = (
        sym.select(F.col("a").alias("vertex"))
        .distinct()
        .withColumn("component", F.col("vertex"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym.b == labels.vertex)
            .groupBy("a")
            .agg(F.min("component").alias("nbr_component"))
        )
        new_labels = (
            labels.join(nbr_min, labels.vertex == nbr_min.a, "left")
            .select(
                "vertex",
                F.least(
                    F.col("component"),
                    F.coalesce("nbr_component", F.col("component")),
                ).alias("component"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "vertex")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")


def dedup_cluster_stats(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-component stats for dedup resolution: (vertex, component,
    cluster_size, is_keeper) — keep the min-id document of every
    duplicate cluster, drop the rest."""
    cc = connected_components(edges, src, dst)
    sizes = cc.groupBy("component").agg(F.count("*").alias("cluster_size"))
    return cc.join(sizes, "component").select(
        "vertex",
        "component",
        "cluster_size",
        (F.col("vertex") == F.col("component")).alias("is_keeper"),
    )
