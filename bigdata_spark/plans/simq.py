"""Similarity-search and distance-kernel queries over ``embeddings``
(driver brief: brute-force cosine top-k baseline, LSH scale path;
SURVEY §2.8 U1/U6/U9/U10 distance kernels natively).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.distances import (
    cosine_similarity,
    euclidean_distance,
    manhattan_distance,
    nearest_exemplar_index,
)
from ..similarity.ann import brute_force_topk, lsh_bucketed_topk
from ..sources.catalog import load_table
from .golden_sql import keyed_values_oracle


def _vecs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings")


# DuckDB fragments: element-wise ops over FLOAT[] cast to DOUBLE, with
# the exact same operation order as functions/distances.py.

def _duck_dot(a: str, b: str) -> str:
    return (
        f"list_sum([CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE) "
        f"for i in generate_series(1, len({a}))])"
    )


def _duck_l2(a: str) -> str:
    return f"sqrt({_duck_dot(a, a)})"


def _duck_cos(a: str, b: str) -> str:
    return f"({_duck_dot(a, b)} / ({_duck_l2(a)} * {_duck_l2(b)}))"


def _duck_euclid(a: str, b: str) -> str:
    return (
        f"sqrt(list_sum([(CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE)) "
        f"* (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE)) "
        f"for i in generate_series(1, len({a}))]))"
    )


def _duck_manhattan(a: str, b: str) -> str:
    return (
        f"list_sum([abs(CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE)) "
        f"for i in generate_series(1, len({a}))])"
    )


# --- distance kernels (U6/U9/U10 natively) --------------------------------

def dist_kernels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise euclid/manhattan/cosine over a small id slice — pins the
    native zip_with/aggregate kernels against explicit element math."""
    e = _vecs(spark, sf_dir).filter(F.col("vec_id") < 10)
    v = e.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    a, b = v.alias("a"), v.alias("b")
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            F.round(euclidean_distance(F.col("a.v"), F.col("b.v")), 9).alias("euclid"),
            F.round(manhattan_distance(F.col("a.v"), F.col("b.v")), 9).alias("manhattan"),
            F.round(cosine_similarity(F.col("a.v"), F.col("b.v")), 9).alias("cosine"),
        )
    )


DIST_KERNELS_SQL = f"""
WITH v AS (SELECT vec_id, embedding AS v FROM embeddings WHERE vec_id < 10)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
  ROUND({_duck_euclid('a.v', 'b.v')}, 9) AS euclid,
  ROUND({_duck_manhattan('a.v', 'b.v')}, 9) AS manhattan,
  ROUND({_duck_cos('a.v', 'b.v')}, 9) AS cosine
FROM v a JOIN v b ON a.vec_id < b.vec_id
"""


# --- nearest exemplar (U1 natively) ---------------------------------------

def nearest_exemplar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Route every vector to its nearest of 3 exemplars (vec_id 0,1,2)
    by euclidean distance — the reference's branch rule (U1) as one
    native expression; exemplars ride along as a broadcast join."""
    e = _vecs(spark, sf_dir)
    # collect_list order is not deterministic under shuffle — sort the
    # (vec_id, vec) structs post-collect to pin exemplar order 0,1,2.
    ex = (
        e.filter(F.col("vec_id") < 3)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("vec_id", "v"))), lambda s: s["v"]
            ).alias("exemplars")
        )
    )
    v = e.filter(F.col("vec_id") >= 3).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    return v.crossJoin(F.broadcast(ex)).select(
        "vec_id",
        nearest_exemplar_index(F.col("v"), F.col("exemplars")).cast("long").alias("branch"),
    )


NEAREST_EXEMPLAR_SQL = f"""
WITH ex AS (
  SELECT
    (SELECT embedding FROM embeddings WHERE vec_id = 0) AS e0,
    (SELECT embedding FROM embeddings WHERE vec_id = 1) AS e1,
    (SELECT embedding FROM embeddings WHERE vec_id = 2) AS e2
), d AS (
  SELECT vec_id,
    {_duck_euclid('embedding', 'e0')} AS d0,
    {_duck_euclid('embedding', 'e1')} AS d1,
    {_duck_euclid('embedding', 'e2')} AS d2
  FROM embeddings CROSS JOIN ex
  WHERE vec_id >= 3
)
SELECT vec_id,
  CAST(CASE WHEN d0 <= d1 AND d0 <= d2 THEN 0
            WHEN d1 <= d2 THEN 1
            ELSE 2 END AS BIGINT) AS branch
FROM d
"""


# --- brute-force cosine top-k ---------------------------------------------

def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-5 cosine neighbors for query vectors vec_id < 5.
    Identical double cosines both engines → identical rank sets."""
    e = _vecs(spark, sf_dir)
    q = e.filter(F.col("vec_id") < 5)
    out = brute_force_topk(q, e, k=5)
    return out.select(
        "query_id",
        "corpus_id",
        F.col("rank").cast("long").alias("rank"),
        F.round("cosine", 9).alias("cosine"),
    )


SIM_TOPK_SQL = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS v FROM embeddings WHERE vec_id < 5),
c AS (SELECT vec_id AS corpus_id, embedding AS v FROM embeddings),
scored AS (
  SELECT q.query_id, c.corpus_id,
    CASE WHEN ({_duck_l2('q.v')} * {_duck_l2('c.v')}) != 0.0
         THEN {_duck_dot('q.v', 'c.v')} / ({_duck_l2('q.v')} * {_duck_l2('c.v')})
         ELSE 0.0 END AS cosine
  FROM c CROSS JOIN q
  WHERE q.query_id != c.corpus_id
), ranked AS (
  SELECT query_id, corpus_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, corpus_id) AS rank
  FROM scored
)
SELECT query_id, corpus_id, CAST(rank AS BIGINT) AS rank, ROUND(cosine, 9) AS cosine
FROM ranked WHERE rank <= 5
"""


# --- LSH-bucketed approximate top-k ---------------------------------------
# Fully oracle-checkable: the hyperplane signature is a deterministic
# md5-derived recipe (similarity/ann._hyperplane), so DuckDB recomputes
# the same buckets from inlined plane constants and the same exact
# cosine within bucket.

_LSH_PLANES, _LSH_DIM = 6, 64


def sim_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _vecs(spark, sf_dir)
    q = e.filter(F.col("vec_id") < 5)
    out = lsh_bucketed_topk(q, e, k=5, n_planes=_LSH_PLANES, dim=_LSH_DIM)
    return out.select(
        "query_id", "corpus_id", F.col("rank").cast("long").alias("rank"),
        F.round("cosine", 9).alias("cosine"),
    )


def _duck_bucket_expr(col: str) -> str:
    from ..similarity.ann import _hyperplane

    terms = []
    for p in range(_LSH_PLANES):
        lit = "[" + ", ".join(repr(x) for x in _hyperplane(_LSH_DIM, p)) + "]"
        dp = (
            f"list_sum([CAST({col}[i] AS DOUBLE) * ({lit})[i] "
            f"for i in generate_series(1, {_LSH_DIM})])"
        )
        terms.append(f"CASE WHEN {dp} >= 0 THEN {1 << p} ELSE 0 END")
    return "(" + " + ".join(terms) + ")"


SIM_LSH_SQL = f"""
WITH v AS (SELECT vec_id, embedding AS v, {_duck_bucket_expr('embedding')} AS bucket FROM embeddings),
q AS (SELECT vec_id AS query_id, v, bucket FROM v WHERE vec_id < 5),
scored AS (
  SELECT q.query_id, c.vec_id AS corpus_id,
    CASE WHEN ({_duck_l2('q.v')} * {_duck_l2('c.v')}) != 0.0
         THEN {_duck_dot('q.v', 'c.v')} / ({_duck_l2('q.v')} * {_duck_l2('c.v')})
         ELSE 0.0 END AS cosine
  FROM v c JOIN q ON c.bucket = q.bucket
  WHERE q.query_id != c.vec_id
), ranked AS (
  SELECT query_id, corpus_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, corpus_id) AS rank
  FROM scored
)
SELECT query_id, corpus_id, CAST(rank AS BIGINT) AS rank, ROUND(cosine, 9) AS cosine
FROM ranked WHERE rank <= 5
"""


def sim_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed ANN (similarity/ann.ivf_topk) vs the exact
    brute-force top-k: emits per-run recall@5 invariants the oracle
    pins TRUE. KMeans is seeded, so the result is deterministic; the
    quantizer itself is not SQL-expressible, hence the invariant-style
    oracle (same pattern as sampling/sketch checks)."""
    from ..similarity.ann import brute_force_topk, ivf_topk

    e = _vecs(spark, sf_dir)
    q = e.filter(F.col("vec_id") < 5)
    approx = ivf_topk(q, e, k=5, n_lists=16, n_probe=4, seed=42).persist()
    exact = brute_force_topk(q, e, k=5)
    # ONE brute-force pass: flag exact pairs the IVF probe also
    # surfaced and aggregate both counters in a single action (the
    # former semi-join count + exact count ran the windowed cross-join
    # twice). |exact ⟕ approx| counts match the old approx⋉exact count
    # because both sides carry unique (query_id, corpus_id) pairs.
    audit = (
        exact.join(
            approx.select("query_id", "corpus_id").withColumn(
                "hit", F.lit(1)
            ),
            ["query_id", "corpus_id"],
            "left",
        )
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.count("hit").alias("hits"),
        )
        .first()
    )
    hits, n_exact = audit["hits"], audit["n_exact"]
    stats = approx.agg(
        F.count("*").alias("n"), F.max("rank").alias("m")
    ).first()
    n_approx, max_rank = stats["n"], stats["m"]
    approx.unpersist()
    recall = hits / n_exact if n_exact else 0.0
    return spark.createDataFrame(
        [(bool(recall >= 0.5), bool(n_approx <= n_exact), bool(max_rank <= 5))],
        "recall_at_least_half boolean, bounded_candidates boolean, rank_bounded boolean",
    )


SIM_IVF_SQL = (
    "SELECT TRUE AS recall_at_least_half, TRUE AS bounded_candidates, "
    "TRUE AS rank_bounded"
)


def sim_topk_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ADC top-k (similarity/pq.py) vs the exact
    euclidean top-k: per-run recall@5 and structural invariants pinned
    TRUE (seeded codebooks → deterministic; the quantizer is not
    SQL-expressible — same oracle pattern as sim_topk_ivf). PQ at
    M=32×16 codes compresses 64-d vectors 16-fold (32 nibble codes);
    recall is the quantization-residual trade, checked ≥ 0.4 here
    (measured 0.68 at sf0.01, 0.60 at sf0.1 — 2-d subspaces quantize
    these near-uniform synthetic embeddings better than coarser ones,
    and cost ~4× fewer codeword-distance evals)."""
    from pyspark.sql import Window

    from ..similarity.pq import pq_topk

    e = _vecs(spark, sf_dir)
    q = e.filter(F.col("vec_id") < 5)
    # persist: the approx top-k feeds both the recall semi-join and the
    # stats aggregate inside ONE fused job — cache fills once, reused
    approx = pq_topk(q, e, k=5, m_subspaces=32, k_codes=16, seed=42).persist()

    qv = q.select(F.col("vec_id").alias("query_id"), F.col("embedding").cast("array<double>").alias("q_vec"))
    cv = e.select(F.col("vec_id").alias("corpus_id"), F.col("embedding").cast("array<double>").alias("c_vec"))
    w = Window.partitionBy("query_id").orderBy(F.asc("d"), F.asc("corpus_id"))
    exact = (
        cv.crossJoin(F.broadcast(qv))
        .filter(F.col("query_id") != F.col("corpus_id"))
        .withColumn("d", euclidean_distance(F.col("q_vec"), F.col("c_vec")))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("query_id", "corpus_id")
    )
    # ONE evaluation of the windowed exact cross-join: flag exact pairs
    # the PQ probe also surfaced and aggregate hits + n_exact in a
    # single subtree (the former semi-join-count + exact-count pair ran
    # the exact audit twice — the sim_topk_ivf fix, same shape).
    # |exact ⟕ approx| counts match the old approx⋉exact count because
    # both sides carry unique (query_id, corpus_id) pairs.
    audit = (
        exact.join(
            approx.select("query_id", "corpus_id").withColumn(
                "hit", F.lit(1)
            ),
            ["query_id", "corpus_id"],
            "left",
        )
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.count("hit").alias("hits"),
        )
    )
    stats = approx.agg(
        F.count("*").alias("n"), F.max("rank").alias("m"),
        F.min("adc_dist").alias("dmin"),
    )
    return (
        audit.crossJoin(stats)
        .select(
            F.when(
                F.col("n_exact") > 0,
                F.col("hits") / F.col("n_exact") >= 0.4,
            ).otherwise(F.lit(False)).alias("recall_ok"),
            (F.col("n") == F.col("n_exact")).alias("counts_match"),
            F.coalesce(F.col("m") <= 5, F.lit(True)).alias("rank_bounded"),
            F.coalesce(F.col("dmin") >= 0.0, F.lit(True)).alias("adc_nonnegative"),
        )
    )


SIM_PQ_SQL = (
    "SELECT TRUE AS recall_ok, TRUE AS counts_match, TRUE AS rank_bounded, "
    "TRUE AS adc_nonnegative"
)


def _radius_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(id_a < id_b, dist2) pairs within radius 0.02 of each other in
    the first-two-embedding-dims plane — the grid-bucketed candidate
    generator shared by geo_radius_join and ml_dbscan_grid."""
    r = "2e-2"
    r2 = "4e-4"
    pts = _vecs(spark, sf_dir).select(
        "vec_id",
        F.expr("CAST(element_at(embedding, 1) AS DOUBLE)").alias("x"),
        F.expr("CAST(element_at(embedding, 2) AS DOUBLE)").alias("y"),
    )
    cell = lambda c: F.expr(f"CAST(floor({c} / {r}) AS BIGINT)")  # noqa: E731
    right = pts.select(
        F.col("vec_id").alias("id_b"),
        F.col("x").alias("bx"),
        F.col("y").alias("by"),
        cell("x").alias("cx"),
        cell("y").alias("cy"),
    )
    left = (
        pts.select(
            F.col("vec_id").alias("id_a"),
            F.col("x").alias("ax"),
            F.col("y").alias("ay"),
            cell("x").alias("cx0"),
            cell("y").alias("cy0"),
        )
        .withColumn("dx", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .withColumn("dy", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .select(
            "id_a",
            "ax",
            "ay",
            (F.col("cx0") + F.col("dx")).alias("cx"),
            (F.col("cy0") + F.col("dy")).alias("cy"),
        )
    )
    d2 = "(ax - bx) * (ax - bx) + (ay - by) * (ay - by)"
    return (
        left.join(right, ["cx", "cy"])
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(F.expr(f"{d2} <= {r2}"))
        .select("id_a", "id_b", F.expr(d2).alias("dist2"))
    )


def geo_radius_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial radius self-join via grid bucketing (the 2-D analog of
    the LSH band join): points land in r-sized grid cells; the left
    side explodes to its 3x3 cell neighborhood, the right side keys by
    its exact cell, so the equi-join on cell id yields every candidate
    within radius r exactly once per ordered pair — then the exact
    squared-distance filter verifies (_radius_pairs). Shuffle moves
    (id, x, y, cell) only; candidate count is density-bounded per cell
    instead of the n^2 cross join the oracle runs."""
    return _radius_pairs(spark, sf_dir).orderBy("id_a", "id_b")


GEO_RADIUS_SQL = """
WITH pts AS (
  SELECT vec_id, CAST(embedding[1] AS DOUBLE) AS x,
         CAST(embedding[2] AS DOUBLE) AS y
  FROM embeddings
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS dist2
FROM pts a JOIN pts b ON a.vec_id < b.vec_id
WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= 4e-4
ORDER BY id_a, id_b
"""


def sim_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN classification over the embedding space via the IVF scale
    path: a held-out query slice (vec_id ≡ 7 mod 20, capped at 250
    queries) classifies by majority label of its 5 approximate nearest
    corpus neighbors (similarity/ann.ivf_topk — seeded coarse
    quantizer, n_probe inverted lists, exact cosine within them),
    deterministic tie-break (count desc, label asc). Per-class and
    overall accuracy via rollup.

    Round-5 swap (VERDICT r4 next #1): the verify side was
    brute_force_topk, whose queries×corpus scoring stayed superlinear
    in the soak even with the fixed query slice (17.6× at 10× data);
    IVF scores ~n_probe/n_lists of the corpus per query, which is the
    shape that survives 100 TB. Recall trade: the vote uses
    approximate neighbors, so accuracy is ANN-kNN accuracy (measured
    within 2pp of the exact-kNN accuracy at sf0.01/0.1 with
    n_lists=16, n_probe=4). The seeded quantizer is deterministic but
    not SQL-expressible, so the oracle is a per-SF pinned-golden
    (keyed_values_oracle — same class as ml_global_tree)."""
    from ..similarity.ann import ivf_topk

    e = _vecs(spark, sf_dir)
    # the eval slice is FIXED-SIZE (250 queries), not corpus-
    # proportional: a %-of-corpus query set makes ANY verify side
    # superlinear (queries × candidates); capping the id range keeps
    # cost linear in corpus size
    q = e.filter((F.col("vec_id") % 20 == 7) & (F.col("vec_id") < 5000))
    corpus = e.filter((F.col("vec_id") % 20 != 7) | (F.col("vec_id") >= 5000))
    knn = ivf_topk(q, corpus, k=5, n_lists=16, n_probe=4, seed=42)
    nbr = knn.join(
        corpus.select(
            F.col("vec_id").alias("corpus_id"), F.col("label").alias("nbr_label")
        ),
        "corpus_id",
    )
    votes = nbr.groupBy("query_id", "nbr_label").agg(F.count("*").alias("v"))
    w = Window.partitionBy("query_id").orderBy(F.desc("v"), F.asc("nbr_label"))
    pred = (
        votes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("query_id", F.col("nbr_label").alias("pred"))
    )
    truth = q.select(F.col("vec_id").alias("query_id"), F.col("label").alias("truth"))
    scored = pred.join(truth, "query_id")
    return (
        scored.rollup("truth")
        .agg(
            F.count("*").alias("n_queries"),
            F.count(F.when(F.col("pred") == F.col("truth"), 1)).alias("n_correct"),
        )
        .select(
            F.coalesce(F.col("truth"), F.lit(-1)).alias("label"),
            "n_queries",
            "n_correct",
            F.expr("CAST(n_correct AS DOUBLE) / n_queries").alias("accuracy"),
        )
        .orderBy("label")
    )


SIM_KNN_SQL = keyed_values_oracle(
    "sim_knn_classify",
    [
        ("label", "bigint"),
        ("n_queries", "bigint"),
        ("n_correct", "bigint"),
        ("accuracy", "double"),
    ],
)


_DBSCAN_MINPTS = 4


def ml_dbscan_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBSCAN density clustering composed from two verified operators:
    the grid-bucketed radius join supplies the eps-neighborhood graph
    (no n² scan) and connected components resolves core-point clusters
    (alternating-star at scale, exact). Core = ≥ minPts neighbors;
    border points adopt the MIN cluster label among their core
    neighbors (the deterministic variant of DBSCAN's order-dependent
    border rule); the rest is noise (cluster -1). Exact arithmetic
    end-to-end, so the oracle replays it with a cross join + recursive
    CTE."""
    from ..operators.graph import connected_components

    # lazy: the radius-pair generation materializes once under the
    # first downstream action (connected_components' edge count) and is
    # reused by sym/core/border — no dedicated materialization job
    pairs = (
        _radius_pairs(spark, sf_dir)
        .select("id_a", "id_b")
        .localCheckpoint(eager=False)
    )
    sym = pairs.unionAll(
        pairs.select(F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b"))
    )
    deg = sym.groupBy(F.col("id_a").alias("vec_id")).agg(
        F.count("*").alias("n_nbrs")
    )
    core = deg.filter(F.col("n_nbrs") >= _DBSCAN_MINPTS).select("vec_id")
    core_edges = (
        pairs.join(core.withColumnRenamed("vec_id", "id_a"), "id_a", "leftsemi")
        .join(core.withColumnRenamed("vec_id", "id_b"), "id_b", "leftsemi")
        .select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    )
    cc = connected_components(core_edges)
    core_lbl = core.join(cc, core.vec_id == cc.vertex, "left").select(
        "vec_id", F.coalesce("component", F.col("vec_id")).alias("cluster")
    )
    border = (
        sym.join(  # non-core left sides only
            core.withColumnRenamed("vec_id", "id_a"), "id_a", "left_anti"
        )
        .join(
            core_lbl.select(
                F.col("vec_id").alias("id_b"), F.col("cluster").alias("nbr_cluster")
            ),
            "id_b",
        )
        .groupBy(F.col("id_a").alias("vec_id"))
        .agg(F.min("nbr_cluster").alias("cluster"))
    )
    pts = _vecs(spark, sf_dir).select("vec_id")
    return (
        pts.join(core_lbl.withColumnRenamed("cluster", "c_core"), "vec_id", "left")
        .join(border.withColumnRenamed("cluster", "c_border"), "vec_id", "left")
        .select(
            "vec_id",
            F.when(F.col("c_core").isNotNull(), F.lit("core"))
            .when(F.col("c_border").isNotNull(), F.lit("border"))
            .otherwise(F.lit("noise"))
            .alias("role"),
            F.coalesce("c_core", "c_border", F.lit(-1)).alias("cluster"),
        )
        .orderBy("vec_id")
    )


ML_DBSCAN_SQL = f"""
WITH RECURSIVE
pts AS (
  SELECT vec_id, CAST(embedding[1] AS DOUBLE) AS x,
         CAST(embedding[2] AS DOUBLE) AS y
  FROM embeddings
),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM pts a JOIN pts b ON a.vec_id < b.vec_id
  WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= 4e-4
),
sym AS (SELECT id_a, id_b FROM pairs UNION ALL SELECT id_b, id_a FROM pairs),
core AS (
  SELECT id_a AS vec_id FROM sym GROUP BY id_a
  HAVING COUNT(*) >= {_DBSCAN_MINPTS}
),
ce AS (
  SELECT p.id_a AS a, p.id_b AS b FROM pairs p
  JOIN core c1 ON c1.vec_id = p.id_a
  JOIN core c2 ON c2.vec_id = p.id_b
),
cesym AS (SELECT a, b FROM ce UNION ALL SELECT b, a FROM ce),
reach(vtx, r) AS (
  SELECT a, a FROM cesym
  UNION
  SELECT s.a, reach.r FROM cesym s JOIN reach ON s.b = reach.vtx
),
cc AS (SELECT vtx, MIN(r) AS comp FROM reach GROUP BY vtx),
core_lbl AS (
  SELECT c.vec_id, COALESCE(cc.comp, c.vec_id) AS cluster
  FROM core c LEFT JOIN cc ON cc.vtx = c.vec_id
),
border AS (
  SELECT s.id_a AS vec_id, MIN(k.cluster) AS cluster
  FROM sym s JOIN core_lbl k ON k.vec_id = s.id_b
  WHERE s.id_a NOT IN (SELECT vec_id FROM core)
  GROUP BY s.id_a
)
SELECT p.vec_id,
       CASE WHEN cl.vec_id IS NOT NULL THEN 'core'
            WHEN bl.vec_id IS NOT NULL THEN 'border'
            ELSE 'noise' END AS role,
       CAST(COALESCE(cl.cluster, bl.cluster, -1) AS BIGINT) AS cluster
FROM pts p
LEFT JOIN core_lbl cl ON cl.vec_id = p.vec_id
LEFT JOIN border bl ON bl.vec_id = p.vec_id
ORDER BY p.vec_id
"""



# --- ColBERT-style MaxSim late-interaction retrieval ----------------------

_MS_T, _MS_D = 8, 8  # 64-d vector viewed as 8 token-vectors of 8 dims


def sim_maxsim_multivector(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-vector late-interaction retrieval (the ColBERT MaxSim
    kernel): each 64-d embedding is treated as 8 per-token vectors of
    8 dims; score(q, d) = sum over query tokens of the MAX dot product
    against any document token — token-level soft alignment instead of
    one pooled dot.

    The whole kernel is ONE native Catalyst expression (nested
    aggregate/transform/zip_with HOFs — no Python, stays inside
    codegen); queries broadcast, per-query top-5 is a partitioned
    window (group limit, never a global sort). The oracle evaluates
    the same sequential-order double arithmetic via DuckDB nested list
    comprehensions, so scores hash-match at round(9)."""
    e = _vecs(spark, sf_dir)
    tok = (
        f"transform(sequence(0, {_MS_T - 1}),"
        f" t -> slice(CAST(embedding AS ARRAY<DOUBLE>), t * {_MS_D} + 1, {_MS_D}))"
    )
    v = e.select("vec_id", F.expr(tok).alias("toks"))
    q = v.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("toks").alias("qt")
    )
    c = v.select(F.col("vec_id").alias("corpus_id"), F.col("toks").alias("ct"))
    score = (
        "aggregate(qt, CAST(0 AS DOUBLE), (acc, qtok) -> acc +"
        " array_max(transform(ct, ctok ->"
        " aggregate(zip_with(qtok, ctok, (x, y) -> x * y),"
        " CAST(0 AS DOUBLE), (a, x) -> a + x))))"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("maxsim"), "corpus_id")
    return (
        c.crossJoin(F.broadcast(q))
        .filter("query_id != corpus_id")
        .withColumn("maxsim", F.expr(score))
        .withColumn("rank", F.row_number().over(w))
        .filter("rank <= 5")
        .select(
            "query_id",
            "corpus_id",
            F.col("rank").cast("long").alias("rank"),
            F.round("maxsim", 9).alias("maxsim"),
        )
    )


_MS_DOT = (
    f"list_sum([CAST(q.v[(i-1)*{_MS_D}+d] AS DOUBLE)"
    f" * CAST(c.v[(j-1)*{_MS_D}+d] AS DOUBLE)"
    f" for d in generate_series(1, {_MS_D})])"
)
SIM_MAXSIM_SQL = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS v FROM embeddings WHERE vec_id < 3),
c AS (SELECT vec_id AS corpus_id, embedding AS v FROM embeddings),
scored AS (
  SELECT q.query_id, c.corpus_id,
    list_sum([list_max([{_MS_DOT}
      for j in generate_series(1, {_MS_T})])
      for i in generate_series(1, {_MS_T})]) AS maxsim
  FROM c CROSS JOIN q
  WHERE q.query_id != c.corpus_id
), ranked AS (
  SELECT query_id, corpus_id, maxsim,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY maxsim DESC, corpus_id) AS rank
  FROM scored
)
SELECT query_id, corpus_id, CAST(rank AS BIGINT) AS rank, ROUND(maxsim, 9) AS maxsim
FROM ranked WHERE rank <= 5
"""


# ---------------------------------------------------------------------------
# geo_quadkey_rollup — Z-order (quadkey) spatial index cells + rollup
# ---------------------------------------------------------------------------

_QK_LEVELS = 12  # 4096×4096 leaf grid
_QK_PARENT = 6  # rollup level


def _qk_interleave(xi: str, yi: str) -> str:
    """Bit-interleave two 12-bit ints into a Z-order key — unrolled
    integer arithmetic (div/mod by powers of two), identical text in
    both engines; no bit intrinsics needed."""
    terms = []
    for j in range(_QK_LEVELS):
        terms.append(f"(({xi} div {2 ** j}) % 2) * {4 ** j}")
        terms.append(f"(({yi} div {2 ** j}) % 2) * {2 * 4 ** j}")
    return "(" + " + ".join(terms) + ")"


def geo_quadkey_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order / quadkey spatial indexing of the embedding plane: map
    each point to a level-12 Morton cell (bit-interleaved 12-bit grid
    coords — the Bing-maps quadkey / Uber-style spatial key), then
    roll up to level-6 parents with leaf-cell diversity, emitting the
    10 densest parents.

    This is the storage-layout half of geo: s15_zorder_layout proves
    Z-ordered FILES prune; this cell key is what you GROUP and range-
    scan by (a parent cell is one contiguous Z range, so a spatial
    region is O(few) key ranges). One shuffle: groupBy leaf cell with
    partial aggregation; parents derive by integer division of the
    leaf key — no second pass over points.
    """
    pts = _vecs(spark, sf_dir).select(
        F.expr(
            "CAST(least(greatest(floor((CAST(element_at(embedding, 1) AS DOUBLE)"
            f" + 0.5) * {2 ** _QK_LEVELS}), 0.0), {2 ** _QK_LEVELS - 1}.0) AS BIGINT)"
        ).alias("xi"),
        F.expr(
            "CAST(least(greatest(floor((CAST(element_at(embedding, 2) AS DOUBLE)"
            f" + 0.5) * {2 ** _QK_LEVELS}), 0.0), {2 ** _QK_LEVELS - 1}.0) AS BIGINT)"
        ).alias("yi"),
    )
    leaf = (
        pts.select(F.expr(_qk_interleave("xi", "yi")).alias("z"))
        .groupBy("z")
        .agg(F.count("*").alias("n"))
    )
    parent_shift = 4 ** (_QK_LEVELS - _QK_PARENT)
    return (
        leaf.groupBy(F.expr(f"z div {parent_shift}").alias("parent_cell"))
        .agg(
            F.sum("n").cast("long").alias("n_points"),
            F.count("*").cast("long").alias("n_leaf_cells"),
            F.min("z").alias("z_min"),
            F.max("z").alias("z_max"),
        )
        .withColumn(
            "z_range_contiguous",
            # a parent is ONE contiguous Z interval: both extremes must
            # sit inside [parent*4^6, (parent+1)*4^6)
            F.expr(
                f"z_min >= parent_cell * {parent_shift}"
                f" AND z_max < (parent_cell + 1) * {parent_shift}"
            ),
        )
        .orderBy(F.desc("n_points"), F.asc("parent_cell"))
        .limit(10)
    )


def _qk_sql() -> str:
    mk = (
        "CAST(least(greatest(floor((CAST(embedding[{d}] AS DOUBLE)"
        f" + 0.5) * {2 ** _QK_LEVELS}), 0.0), {2 ** _QK_LEVELS - 1}.0) AS BIGINT)"
    )
    inter = _qk_interleave("xi", "yi").replace(" div ", " // ")
    parent_shift = 4 ** (_QK_LEVELS - _QK_PARENT)
    return f"""
WITH pts AS (
  SELECT {mk.format(d=1)} AS xi, {mk.format(d=2)} AS yi FROM embeddings
), leaf AS (
  SELECT {inter} AS z, COUNT(*) AS n FROM pts GROUP BY 1
)
SELECT z // {parent_shift} AS parent_cell,
       CAST(SUM(n) AS BIGINT) AS n_points,
       CAST(COUNT(*) AS BIGINT) AS n_leaf_cells,
       MIN(z) AS z_min,
       MAX(z) AS z_max,
       MIN(z) >= (z // {parent_shift}) * {parent_shift}
         AND MAX(z) < ((z // {parent_shift}) + 1) * {parent_shift}
         AS z_range_contiguous
FROM leaf GROUP BY 1
ORDER BY n_points DESC, parent_cell ASC LIMIT 10
"""


GEO_QUADKEY_SQL = _qk_sql()


# ---------------------------------------------------------------------------
# sim_quantized_recall — int8-style scalar quantization, recall@k audit
# ---------------------------------------------------------------------------

_SQR_K = 10
_SQR_MOD, _SQR_RES = 20, 3
_SQR_QCAP = 2000  # query-side cap: the audit's pair count stays corpus-LINEAR past sf0.1
_SQR_SCALE = 200  # |x| ≤ 0.58 → quantized |q| ≤ 116, dot ≤ 64·116² ≪ 2⁶³

# shared quantizer text modulo syntax: same CAST/FLOOR op chain per dim
_SQR_QUANT_SPARK = (
    "transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE)"
    f" * CAST({_SQR_SCALE} AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT))"
)
_SQR_QUANT_DUCK = (
    "[CAST(FLOOR(CAST(x AS DOUBLE)"
    f" * CAST({_SQR_SCALE} AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)"
    " for x in embedding]"
)


def sim_quantized_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-quantization recall audit — the evaluation every
    compressed-index deployment needs: quantize embeddings to ~int8
    (floor(200·x + ½), exact BIGINTs), rank neighbors by INTEGER dot
    product, and measure per-query overlap against the exact
    double-cosine top-10 (sim_topk_bruteforce's ranking). Quantized
    scores are pure integers (order-free, engine-exact) and recall is
    reported in ppm by integer division, so the audit itself is
    hash-exact — only the two rank windows touch doubles, through the
    repo's existing shared-cosine text.

    Scale: both ranking paths are the brute-force baseline (quadratic
    by design — the IVF/LSH/PQ entries are the sub-linear variants);
    the audit's value is the RECALL CONTRACT, which carries over to
    the bucketed paths unchanged. Queries vec_id ≡ 3 (mod 20), capped
    below 2000 so the audit's pair count grows linearly with the
    corpus past sf0.1 (the sim_knn_classify capping discipline)."""
    from ..similarity.ann import brute_force_topk

    vecs = _vecs(spark, sf_dir)
    qset = vecs.filter(
        (F.col("vec_id") % _SQR_MOD == _SQR_RES)
        & (F.col("vec_id") < _SQR_QCAP)
    )
    exact = brute_force_topk(qset, vecs, k=_SQR_K).select(
        "query_id", "corpus_id"
    )
    vq = vecs.select("vec_id", F.expr(_SQR_QUANT_SPARK).alias("qv"))
    qq = vq.filter(
        (F.col("vec_id") % _SQR_MOD == _SQR_RES)
        & (F.col("vec_id") < _SQR_QCAP)
    ).select(
        F.col("vec_id").alias("query_id"), F.col("qv").alias("q_vec")
    )
    pairs = (
        vq.withColumnRenamed("vec_id", "corpus_id")
        .crossJoin(F.broadcast(qq))
        .filter(F.col("query_id") != F.col("corpus_id"))
        .select(
            "query_id",
            "corpus_id",
            F.expr(
                "aggregate(zip_with(q_vec, qv, (a, b) -> a * b),"
                " 0L, (acc, v) -> acc + v)"
            ).alias("idot"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("idot"), F.asc("corpus_id"))
    approx = pairs.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= _SQR_K
    )
    hits = approx.join(exact, ["query_id", "corpus_id"]).groupBy("query_id").agg(
        F.count("*").alias("n_overlap")
    )
    return (
        qset.select(F.col("vec_id").alias("query_id"))
        .join(hits, "query_id", "left_outer")
        .selectExpr(
            "query_id",
            "CAST(COALESCE(n_overlap, 0) AS BIGINT) AS n_overlap",
            f"(1000000 * CAST(COALESCE(n_overlap, 0) AS BIGINT)) div {_SQR_K}"
            " AS recall_ppm",
        )
        .orderBy("query_id")
    )


SIM_QREC_SQL = f"""
WITH vq AS (
  SELECT vec_id, {_SQR_QUANT_DUCK} AS qv FROM embeddings
), q AS (SELECT vec_id AS query_id, embedding AS v FROM embeddings
         WHERE vec_id % {_SQR_MOD} = {_SQR_RES} AND vec_id < {_SQR_QCAP}),
c AS (SELECT vec_id AS corpus_id, embedding AS v FROM embeddings),
exact_scored AS (
  SELECT q.query_id, c.corpus_id,
         CASE WHEN ({_duck_l2('q.v')} * {_duck_l2('c.v')}) != 0.0
              THEN {_duck_dot('q.v', 'c.v')}
                   / ({_duck_l2('q.v')} * {_duck_l2('c.v')})
              ELSE 0.0 END AS cosine
  FROM c CROSS JOIN q WHERE q.query_id != c.corpus_id
), exact_topk AS (
  SELECT query_id, corpus_id FROM (
    SELECT query_id, corpus_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
             ORDER BY cosine DESC, corpus_id) AS rnk
    FROM exact_scored
  ) WHERE rnk <= {_SQR_K}
), int_scored AS (
  SELECT a.vec_id AS query_id, b.vec_id AS corpus_id,
         list_sum([a.qv[i] * b.qv[i]
                   for i in generate_series(1, len(a.qv))]) AS idot
  FROM vq a CROSS JOIN vq b
  WHERE a.vec_id % {_SQR_MOD} = {_SQR_RES} AND a.vec_id < {_SQR_QCAP}
    AND a.vec_id != b.vec_id
), approx_topk AS (
  SELECT query_id, corpus_id FROM (
    SELECT query_id, corpus_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
             ORDER BY idot DESC, corpus_id) AS rnk
    FROM int_scored
  ) WHERE rnk <= {_SQR_K}
), hits AS (
  SELECT a.query_id, COUNT(*) AS n_overlap
  FROM approx_topk a JOIN exact_topk e
    ON a.query_id = e.query_id AND a.corpus_id = e.corpus_id
  GROUP BY 1
)
SELECT q.query_id,
       CAST(COALESCE(h.n_overlap, 0) AS BIGINT) AS n_overlap,
       CAST((1000000 * COALESCE(h.n_overlap, 0)) // {_SQR_K} AS BIGINT)
         AS recall_ppm
FROM q LEFT JOIN hits h ON q.query_id = h.query_id
ORDER BY q.query_id
"""


# ---------------------------------------------------------------------------
# sim_jl_projection_audit — Johnson-Lindenstrauss sign projection, exact
# ---------------------------------------------------------------------------

_JL_K = 16  # target dimensionality
_JL_NVEC = 50  # audit sample: vec_id < 50 → 1225 pairs
_JL_SIGN_SPARK = (
    "IF(CAST(conv(substring(md5(concat('jl|', CAST(i AS STRING), '|',"
    " CAST(j AS STRING))), 1, 15), 16, 10) AS BIGINT) % 2 = 0, 1, -1)"
)
_JL_SIGN_DUCK = (
    "CASE WHEN ('0x' || substr(md5('jl|' || CAST(i AS VARCHAR) || '|'"
    " || CAST(j AS VARCHAR)), 1, 15))::BIGINT % 2 = 0 THEN 1 ELSE -1 END"
)


def sim_jl_projection_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss random projection 64 → 16 dims with a
    distance-distortion audit — the dimensionality-reduction step an
    embedding pipeline runs before indexing, PROVEN against its own
    contract (pairwise distances survive within (1±ε)).

    The ±1 projection matrix derives from the repo's portable hash
    (no RNG state), vectors are quantized to exact BIGINTs (the
    sim_quantized_recall scale), and the projection is the RELATIONAL
    formulation — unnest the vector, broadcast-join the 64×16 sign
    matrix, partial-agg per (vec, out_dim) — the shape that scales to
    a 100 TB corpus (matrix broadcasts; one exchange keyed on the
    vector id). Because projection is linear over integers, the
    squared-distance ratio 100·‖Pa−Pb‖² div (k·‖a−b‖²) is EXACT
    integer arithmetic end to end; the output is the distortion
    histogram over all 1225 sample pairs plus its extremes — no
    doubles anywhere."""
    vecs = _vecs(spark, sf_dir).filter(F.col("vec_id") < _JL_NVEC)
    q = vecs.select(
        "vec_id",
        F.posexplode(F.expr(_SQR_QUANT_SPARK)).alias("pos", "x"),
    ).select("vec_id", (F.col("pos") + 1).alias("i"), "x")
    dims = spark.range(1, 65).select(F.col("id").alias("i"))
    outs = spark.range(1, _JL_K + 1).select(F.col("id").alias("j"))
    matrix = dims.crossJoin(outs).select(
        "i", "j", F.expr(_JL_SIGN_SPARK).alias("s")
    )
    proj = (
        q.join(F.broadcast(matrix), "i")
        .groupBy("vec_id", "j")
        .agg(F.sum(F.expr("x * s")).alias("p"))
    )
    # pairwise distances: self-join per coordinate, difference-of-sums
    pa = proj.select(F.col("vec_id").alias("a"), "j", F.col("p").alias("pa"))
    pb = proj.select(F.col("vec_id").alias("b"), "j", F.col("p").alias("pb"))
    dproj = (
        pa.join(pb, "j")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.sum(F.expr("(pa - pb) * (pa - pb)")).alias("d2_proj"))
    )
    qa = q.select(F.col("vec_id").alias("a"), "i", F.col("x").alias("xa"))
    qb = q.select(F.col("vec_id").alias("b"), "i", F.col("x").alias("xb"))
    dorig = (
        qa.join(qb, "i")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.sum(F.expr("(xa - xb) * (xa - xb)")).alias("d2_orig"))
    )
    ratios = dproj.join(dorig, ["a", "b"]).selectExpr(
        "a", "b",
        f"(100 * d2_proj) div ({_JL_K} * d2_orig) AS ratio2_pct",
    )
    return (
        ratios.groupBy(F.expr("(ratio2_pct div 10) * 10").alias("ratio2_bucket"))
        .agg(
            F.count("*").alias("n_pairs"),
            F.min("ratio2_pct").alias("min_ratio2_pct"),
            F.max("ratio2_pct").alias("max_ratio2_pct"),
        )
        .orderBy("ratio2_bucket")
    )


SIM_JL_SQL = f"""
WITH vecs AS (
  SELECT vec_id, {_SQR_QUANT_DUCK} AS qv FROM embeddings
  WHERE vec_id < {_JL_NVEC}
), q AS (
  SELECT vec_id, i, qv[i] AS x
  FROM vecs, generate_series(1, 64) AS g(i)
), matrix AS (
  SELECT i, j, {_JL_SIGN_DUCK} AS s
  FROM generate_series(1, 64) AS gi(i),
       generate_series(1, {_JL_K}) AS gj(j)
), proj AS (
  SELECT q.vec_id, m.j, CAST(SUM(q.x * m.s) AS BIGINT) AS p
  FROM q JOIN matrix m ON q.i = m.i
  GROUP BY 1, 2
), dproj AS (
  SELECT x.vec_id AS a, y.vec_id AS b,
         CAST(SUM((x.p - y.p) * (x.p - y.p)) AS BIGINT) AS d2_proj
  FROM proj x JOIN proj y ON x.j = y.j AND x.vec_id < y.vec_id
  GROUP BY 1, 2
), dorig AS (
  SELECT x.vec_id AS a, y.vec_id AS b,
         CAST(SUM((x.x - y.x) * (x.x - y.x)) AS BIGINT) AS d2_orig
  FROM q x JOIN q y ON x.i = y.i AND x.vec_id < y.vec_id
  GROUP BY 1, 2
), ratios AS (
  SELECT p.a, p.b,
         (100 * p.d2_proj) // ({_JL_K} * o.d2_orig) AS ratio2_pct
  FROM dproj p JOIN dorig o ON p.a = o.a AND p.b = o.b
)
SELECT CAST((ratio2_pct // 10) * 10 AS BIGINT) AS ratio2_bucket,
       COUNT(*) AS n_pairs,
       CAST(MIN(ratio2_pct) AS BIGINT) AS min_ratio2_pct,
       CAST(MAX(ratio2_pct) AS BIGINT) AS max_ratio2_pct
FROM ratios
GROUP BY 1
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# ml_ranking_metrics — MAP@10 / MRR / NDCG@10 over label-relevant retrieval
# ---------------------------------------------------------------------------

_RANK_K = 10
_RANK_QCAP = 32  # query-side cap: pairs stay corpus-linear at scale
_RANK_LCM = 2520  # lcm(1..10): makes 1/i and 1/rank exact integers


def _ndcg_w(i: str) -> str:
    """Position weight FLOOR(10⁶/log2(i+1)+0.5) — same text both engines."""
    return (
        f"CAST(FLOOR(CAST(1000000 AS DOUBLE) / log2(CAST({i} AS DOUBLE) + 1)"
        " + CAST(0.5 AS DOUBLE)) AS BIGINT)"
    )


def ml_ranking_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality metrics over exact cosine top-10: MAP@10, MRR
    and NDCG@10 where a hit is a corpus neighbor sharing the query's
    label — the eval loop every embedding-search deployment runs
    (label = "the doc the user actually wanted").

    Everything is INTEGER-exact: average precision multiplies through
    by lcm(1..10)=2520 so Σ rel_i·cumrel_i·(2520/i) is an exact BIGINT;
    reciprocal rank is 2520 div rank; DCG uses the 10 fixed position
    weights FLOOR(10⁶/log2(i+1)+0.5) (constants — the same expression
    over integer i in both engines); ideal DCG truncates at
    min(R, 10). Corpus means are integer ppm divisions. Scale: the
    query side is capped (_RANK_QCAP) so the cosine join is
    corpus-linear; per-query windows are k-bounded; label totals ride
    a broadcast join.
    """
    e = _vecs(spark, sf_dir)
    q = e.filter(F.col("vec_id") < _RANK_QCAP)
    topk = brute_force_topk(q, e, k=_RANK_K)
    lab = e.select("vec_id", "label")
    lab_tot = lab.groupBy("label").agg(F.count("*").alias("n_label"))
    scored = (
        topk.join(
            lab.select(F.col("vec_id").alias("query_id"),
                       F.col("label").alias("q_label")),
            "query_id",
        )
        .join(
            lab.select(F.col("vec_id").alias("corpus_id"),
                       F.col("label").alias("c_label")),
            "corpus_id",
        )
        .join(
            F.broadcast(lab_tot.select(F.col("label").alias("q_label"),
                                       F.col("n_label"))),
            "q_label",
        )
        .select(
            "query_id",
            "rank",
            (F.col("q_label") == F.col("c_label")).cast("long").alias("rel"),
            (F.col("n_label") - 1).alias("r_total"),  # exclude the query itself
        )
    )
    w_cum = Window.partitionBy("query_id").orderBy("rank").rowsBetween(
        Window.unboundedPreceding, 0
    )
    per_pos = scored.withColumn("cumrel", F.sum("rel").over(w_cum))
    per_q = per_pos.groupBy("query_id").agg(
        F.max("r_total").alias("r_total"),
        F.sum(
            F.col("rel") * F.col("cumrel") * (F.lit(_RANK_LCM) / F.col("rank")).cast("long")
        ).alias("ap_scaled"),
        F.max(
            F.when(F.col("rel") == 1, F.expr(f"{_RANK_LCM} div rank")).otherwise(0)
        ).alias("rr_scaled"),
        F.sum(F.col("rel") * F.expr(_ndcg_w("rank"))).alias("dcg"),
        F.sum("rel").alias("hits"),
    )
    # ideal DCG: the first min(R, k) position weights (R>=0 exact ints)
    idcg_expr = "CAST(0 AS BIGINT)"
    for i in range(1, _RANK_K + 1):
        idcg_expr = (
            f"({idcg_expr} + CASE WHEN r_total >= {i} THEN {_ndcg_w(str(i))}"
            " ELSE 0 END)"
        )
    final = per_q.withColumn("idcg", F.expr(idcg_expr)).select(
        "query_id",
        F.expr(
            f"CASE WHEN LEAST(r_total, {_RANK_K}) > 0 THEN"
            f" ap_scaled * 1000000 div ({_RANK_LCM} * LEAST(r_total, {_RANK_K}))"
            " ELSE 0 END"
        ).alias("ap_ppm"),
        F.expr(f"rr_scaled * 1000000 div {_RANK_LCM}").alias("rr_ppm"),
        F.expr(
            "CASE WHEN idcg > 0 THEN dcg * 1000000 div idcg ELSE 0 END"
        ).alias("ndcg_ppm"),
        "hits",
    )
    return final.agg(
        F.count("*").cast("long").alias("n_queries"),
        F.expr("CAST(SUM(ap_ppm) div COUNT(*) AS BIGINT)").alias("map_ppm"),
        F.expr("CAST(SUM(rr_ppm) div COUNT(*) AS BIGINT)").alias("mrr_ppm"),
        F.expr("CAST(SUM(ndcg_ppm) div COUNT(*) AS BIGINT)").alias(
            "mean_ndcg_ppm"
        ),
        F.sum("hits").cast("long").alias("total_hits"),
    )


def _rank_idcg_sql() -> str:
    expr = "CAST(0 AS BIGINT)"
    for i in range(1, _RANK_K + 1):
        expr = (
            f"({expr} + CASE WHEN r_total >= {i} THEN {_ndcg_w(str(i))}"
            " ELSE 0 END)"
        )
    return expr


ML_RANKING_SQL = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS v, label AS q_label
           FROM embeddings WHERE vec_id < {_RANK_QCAP}),
c AS (SELECT vec_id AS corpus_id, embedding AS v, label AS c_label
      FROM embeddings),
lab_tot AS (SELECT label, COUNT(*) AS n_label FROM embeddings GROUP BY 1),
scored AS (
  SELECT q.query_id, c.corpus_id, q.q_label, c.c_label,
    CASE WHEN ({_duck_l2('q.v')} * {_duck_l2('c.v')}) != 0.0
         THEN {_duck_dot('q.v', 'c.v')} / ({_duck_l2('q.v')} * {_duck_l2('c.v')})
         ELSE 0.0 END AS cosine
  FROM c CROSS JOIN q
  WHERE q.query_id != c.corpus_id
), ranked AS (
  SELECT query_id, q_label, c_label, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id
           ORDER BY cosine DESC, corpus_id) AS rank
  FROM scored
), top AS (
  SELECT r.query_id, r.rank,
         CASE WHEN r.q_label = r.c_label THEN 1 ELSE 0 END AS rel,
         t.n_label - 1 AS r_total
  FROM ranked r JOIN lab_tot t ON r.q_label = t.label
  WHERE r.rank <= {_RANK_K}
), per_pos AS (
  SELECT *, SUM(rel) OVER (PARTITION BY query_id ORDER BY rank
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumrel
  FROM top
), per_q AS (
  SELECT query_id, MAX(r_total) AS r_total,
         CAST(SUM(rel * cumrel * ({_RANK_LCM} // rank)) AS BIGINT) AS ap_scaled,
         CAST(MAX(CASE WHEN rel = 1 THEN {_RANK_LCM} // rank ELSE 0 END)
              AS BIGINT) AS rr_scaled,
         CAST(SUM(rel * {_ndcg_w('rank')}) AS BIGINT) AS dcg,
         CAST(SUM(rel) AS BIGINT) AS hits
  FROM per_pos GROUP BY 1
), final AS (
  SELECT query_id,
         CASE WHEN LEAST(r_total, {_RANK_K}) > 0 THEN
           ap_scaled * 1000000 // ({_RANK_LCM} * LEAST(r_total, {_RANK_K}))
           ELSE 0 END AS ap_ppm,
         rr_scaled * 1000000 // {_RANK_LCM} AS rr_ppm,
         CASE WHEN {_rank_idcg_sql()} > 0
              THEN dcg * 1000000 // ({_rank_idcg_sql()}) ELSE 0 END AS ndcg_ppm,
         hits
  FROM per_q
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
       CAST(SUM(ap_ppm) // COUNT(*) AS BIGINT) AS map_ppm,
       CAST(SUM(rr_ppm) // COUNT(*) AS BIGINT) AS mrr_ppm,
       CAST(SUM(ndcg_ppm) // COUNT(*) AS BIGINT) AS mean_ndcg_ppm,
       CAST(SUM(hits) AS BIGINT) AS total_hits
FROM final
"""


# ---------------------------------------------------------------------------
# ml_silhouette — centroid-based silhouette score per label cluster
# ---------------------------------------------------------------------------

# Squared distance from vector v to a centroid sum/cnt, scaled by cnt²
# so it stays exact: Σ_d (cnt·v_d − s_d)². Both engines then divide by
# cnt² in the SAME IEEE expression.
_SIL_D2 = "CAST(num AS DOUBLE) / (CAST(cnt AS DOUBLE) * cnt)"


def ml_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Centroid silhouette of the labeled embedding clusters: per
    vector, a = distance to its own label centroid, b = distance to
    the nearest other centroid, s = (b−a)/max(a,b) — the clustering-
    quality score (the O(n·k) centroid variant of the O(n²) pairwise
    silhouette — the only formulation that survives a 10⁹-row corpus).

    Everything upstream of the final per-row doubles is exact
    integers: embeddings quantize to micro units, centroids stay as
    (component-sum, count) rationals, and the squared distance scales
    through by cnt² so Σ_d (cnt·v_d − s_d)² is an exact BIGINT. The
    distance table is (vectors × k centroids) rows via one broadcast
    join — corpus-linear for bounded k. Per-cluster means round(6)."""
    e = _vecs(spark, sf_dir)
    dims = e.select(
        "vec_id",
        "label",
        F.posexplode(
            F.expr(
                "transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE)"
                " * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT))"
            )
        ).alias("dim", "v"),
    ).localCheckpoint()
    cent = dims.groupBy(F.col("label").alias("c_label"), "dim").agg(
        F.sum("v").alias("s"), F.count("*").alias("cnt")
    )
    d2 = (
        dims.join(F.broadcast(cent), "dim")
        .groupBy("vec_id", "label", "c_label")
        .agg(
            F.sum(
                (F.col("cnt") * F.col("v") - F.col("s"))
                * (F.col("cnt") * F.col("v") - F.col("s"))
            ).alias("num"),
            F.max("cnt").alias("cnt"),
        )
        .select(
            "vec_id",
            "label",
            "c_label",
            F.expr(_SIL_D2).alias("d2"),
        )
    )
    per_vec = d2.groupBy("vec_id", "label").agg(
        F.max(F.when(F.col("label") == F.col("c_label"), F.col("d2"))).alias(
            "a2"
        ),
        F.min(F.when(F.col("label") != F.col("c_label"), F.col("d2"))).alias(
            "b2"
        ),
    )
    sil = per_vec.select(
        "label",
        F.expr(
            "(sqrt(b2) - sqrt(a2)) / GREATEST(sqrt(a2), sqrt(b2))"
        ).alias("s"),
    )
    return (
        sil.groupBy("label")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.avg("s"), 6).alias("mean_silhouette"),
        )
        .orderBy("label")
    )


ML_SILHOUETTE_SQL = f"""
WITH dims AS (
  SELECT vec_id, label,
         generate_subscripts(embedding, 1) - 1 AS dim,
         CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE)
              * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT) AS v
  FROM embeddings
), cent AS (
  SELECT label AS c_label, dim, CAST(SUM(v) AS BIGINT) AS s,
         COUNT(*) AS cnt
  FROM dims GROUP BY 1, 2
), nums AS (
  SELECT d.vec_id, d.label, c.c_label,
         CAST(SUM((c.cnt * d.v - c.s) * (c.cnt * d.v - c.s)) AS BIGINT)
           AS num,
         MAX(c.cnt) AS cnt
  FROM dims d JOIN cent c ON d.dim = c.dim
  GROUP BY 1, 2, 3
), d2 AS (
  SELECT vec_id, label, c_label, {_SIL_D2} AS d2 FROM nums
), per_vec AS (
  SELECT vec_id, label,
         MAX(CASE WHEN label = c_label THEN d2 END) AS a2,
         MIN(CASE WHEN label != c_label THEN d2 END) AS b2
  FROM d2 GROUP BY 1, 2
), sil AS (
  SELECT label,
         (sqrt(b2) - sqrt(a2)) / GREATEST(sqrt(a2), sqrt(b2)) AS s
  FROM per_vec
)
SELECT label, CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(AVG(s), 6) AS mean_silhouette
FROM sil
GROUP BY label
ORDER BY label
"""


# ---------------------------------------------------------------------------
# sim_contrastive_pairs — hard-negative / positive mining for metric learning
# ---------------------------------------------------------------------------

_CONTRAST_QCAP = 24


def sim_contrastive_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive-pair mining: for each query embedding the nearest
    SAME-label neighbor (positive) and the nearest DIFFERENT-label
    neighbor (hard negative), plus the margin between them — the data
    prep step every metric-learning / embedding-finetune run does
    (hard negatives are where the gradient is; margin ≤ 0 rows are
    the mislabeled-or-hard cases worth auditing).

    The query side is capped so the cosine join stays corpus-linear;
    per-query argmax picks are deterministic (cosine DESC, corpus_id)
    via one k-bounded window each. Cosines round(9) — the repo's
    shared-IEEE convention for the cosine kernel."""
    e = _vecs(spark, sf_dir)
    q = e.filter(F.col("vec_id") < _CONTRAST_QCAP)
    lab = e.select("vec_id", "label")
    scored = (
        brute_force_topk(q, e, k=10_000_000)  # full ranking, query-capped
        .join(
            lab.select(
                F.col("vec_id").alias("query_id"), F.col("label").alias("ql")
            ),
            "query_id",
        )
        .join(
            lab.select(
                F.col("vec_id").alias("corpus_id"), F.col("label").alias("cl")
            ),
            "corpus_id",
        )
    )
    w_pos = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), "corpus_id"
    )
    pos = (
        scored.filter(F.col("ql") == F.col("cl"))
        .withColumn("rk", F.row_number().over(w_pos))
        .filter(F.col("rk") == 1)
        .select(
            "query_id",
            F.col("corpus_id").alias("positive_id"),
            F.col("cosine").alias("pos_cos"),
        )
    )
    neg = (
        scored.filter(F.col("ql") != F.col("cl"))
        .withColumn("rk", F.row_number().over(w_pos))
        .filter(F.col("rk") == 1)
        .select(
            "query_id",
            F.col("corpus_id").alias("hard_negative_id"),
            F.col("cosine").alias("neg_cos"),
        )
    )
    return (
        pos.join(neg, "query_id")
        .select(
            "query_id",
            "positive_id",
            F.round("pos_cos", 9).alias("pos_cos"),
            "hard_negative_id",
            F.round("neg_cos", 9).alias("neg_cos"),
            F.round(F.col("pos_cos") - F.col("neg_cos"), 9).alias("margin"),
        )
        .orderBy("query_id")
    )


SIM_CONTRAST_SQL = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS v, label AS ql
           FROM embeddings WHERE vec_id < {_CONTRAST_QCAP}),
c AS (SELECT vec_id AS corpus_id, embedding AS v, label AS cl
      FROM embeddings),
scored AS (
  SELECT q.query_id, c.corpus_id, q.ql, c.cl,
    CASE WHEN ({_duck_l2('q.v')} * {_duck_l2('c.v')}) != 0.0
         THEN {_duck_dot('q.v', 'c.v')} / ({_duck_l2('q.v')} * {_duck_l2('c.v')})
         ELSE 0.0 END AS cosine
  FROM c CROSS JOIN q
  WHERE q.query_id != c.corpus_id
), pos AS (
  SELECT query_id, corpus_id AS positive_id, cosine AS pos_cos
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
          ORDER BY cosine DESC, corpus_id) AS rk
        FROM scored WHERE ql = cl)
  WHERE rk = 1
), neg AS (
  SELECT query_id, corpus_id AS hard_negative_id, cosine AS neg_cos
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
          ORDER BY cosine DESC, corpus_id) AS rk
        FROM scored WHERE ql != cl)
  WHERE rk = 1
)
SELECT p.query_id, p.positive_id, ROUND(p.pos_cos, 9) AS pos_cos,
       n.hard_negative_id, ROUND(n.neg_cos, 9) AS neg_cos,
       ROUND(p.pos_cos - n.neg_cos, 9) AS margin
FROM pos p JOIN neg n ON p.query_id = n.query_id
ORDER BY p.query_id
"""


# --- persisted ANN index with incremental admission ------------------------

_ANN_DUP_COS = 0.35  # admission near-duplicate threshold (corpus-tuned)


def sim_ann_index_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-run ANN against a PERSISTED hyperplane-LSH index — the
    embedding-space twin of ``dedup_minhash_incremental`` and the
    production retrieval-corpus admission shape: an admitted corpus
    owns an on-disk bucketed vector index; each new batch is bucketed
    with the SAME deterministic hyperplanes (no training, nothing to
    rebuild), probed against the index READ BACK FROM PARQUET, scored
    exactly within matching buckets only, near-duplicates (top
    candidate cosine ≥ 0.35) rejected, and the admitted vectors
    APPENDED as new files under a new manifest version — zero index
    rewrites, the s42-family commit shape rather than a full republish.

    Gates: recall@5 of the index probe vs the exact brute-force top-5
    over the same base corpus (integer ppm — the quality the bucket
    pruning trades), admission counts + id-sums, index row counts
    before/after, and two structural booleans — the second manifest
    version REUSES every v1 file (append-only) and the probe read
    exactly the v1 file set (no rebuild).

    Scale: probing is one hash join on bucket (batch × index, never
    corpus × corpus); the exact-verify side here scores the full probe
    set for the recall AUDIT — production keeps only the bucketed
    probe, which is candidates-sized. The append is admitted-batch-
    sized parquet plus one manifest write.

    Reference parity: scales the nearest-exemplar ops (U1-U3,
    reference global_model_manager.py:271-280) to a corpus that
    outlives one session."""
    import os
    import shutil
    import tempfile

    from ..similarity.ann import _hyperplane, brute_force_topk
    from ..functions.distances import dot_product
    from ..sources.manifest import (
        commit_snapshot,
        list_data_files,
        read_snapshot,
        snapshot_files,
    )

    def bucket_of(vec):
        out = F.lit(0)
        for p in range(_LSH_PLANES):
            plane = F.array(
                *[F.lit(x) for x in _hyperplane(_LSH_DIM, p)]
            )
            out = out + F.when(
                dot_product(vec, plane) >= 0, F.lit(1 << p)
            ).otherwise(F.lit(0))
        return out

    # One scan + one evaluation of the 6×64-literal bucket expression:
    # every later action (v1 publish, brute-force audit, admission
    # anti-join, final stats) re-derives base/batch from this cache
    # instead of re-running the plane dot products over the parquet
    # scan (guide §1.2/§5 — the per-action recompute dominated the
    # profile, not data volume).
    e = (
        _vecs(spark, sf_dir)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .withColumn("bucket", bucket_of(F.col("v")))
        .persist()
    )
    is_new = F.pmod(F.col("vec_id"), F.lit(5)) == 0
    base = e.filter(~is_new)
    batch = e.filter(is_new)

    scratch = tempfile.mkdtemp(prefix="bigdata_spark_annidx_")
    try:
        table = os.path.join(scratch, "annidx")
        # run 1: build + persist index v1 (bucket, corpus_id, vector)
        (
            base.select(
                "bucket",
                F.col("vec_id").alias("corpus_id"),
                F.col("v").alias("c_vec"),
            )
            .repartition(4)
            .write.parquet(table)
        )
        v1_files = list_data_files(table)
        commit_snapshot(table, 1, v1_files)

        # run 2: probe the index read back from the PERSISTED bytes
        idx = read_snapshot(spark, table, 1)
        # One job instead of two: per-file row counts give both the
        # probed file set AND the pre-append index row count (file
        # grain — bounded by the index file count).
        per_file = (
            idx.groupBy(F.col("_metadata.file_path").alias("f"))
            .count()
            .collect()
        )
        rows_before = sum(r["count"] for r in per_file)
        probed_files = {r["f"] for r in per_file}
        cand = (
            idx.join(
                batch.select(
                    F.col("vec_id").alias("query_id"),
                    F.col("v").alias("q_vec"),
                    "bucket",
                ),
                "bucket",
            )
            .select(
                "query_id",
                "corpus_id",
                cosine_similarity(
                    F.col("q_vec"), F.col("c_vec")
                ).alias("cosine"),
            )
        ).persist()
        w = Window.partitionBy("query_id").orderBy(
            F.desc("cosine"), F.asc("corpus_id")
        )
        approx = (
            cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 5)
            .select("query_id", "corpus_id")
        )
        exact = brute_force_topk(
            batch.select(F.col("vec_id"), F.col("v").alias("embedding")),
            base.select(F.col("vec_id"), F.col("v").alias("embedding")),
            k=5,
            id_col="vec_id",
            vec_col="embedding",
        ).select("query_id", "corpus_id")
        # ONE brute-force pass: flag exact pairs that the index probe
        # also surfaced and aggregate both counters in a single action
        # (the former hits-semi-join + exact-count pair ran the full
        # exact audit twice — 8.2 s of the 11.2 s warm profile).
        # |exact ∩ approx| == the old approx⋉exact count: both sides
        # carry unique (query_id, corpus_id) pairs.
        audit = (
            exact.join(
                approx.withColumn("hit", F.lit(1)),
                ["query_id", "corpus_id"],
                "left",
            )
            .agg(
                F.count(F.lit(1)).alias("n_exact"),
                F.count("hit").alias("hits"),
            )
            .first()
        )
        hits, n_exact = audit["hits"], audit["n_exact"]

        rejected = (
            cand.filter(F.col("cosine") >= F.lit(_ANN_DUP_COS))
            .select("query_id")
            .distinct()
        )
        admitted = batch.join(
            rejected.select(F.col("query_id").alias("vec_id")),
            "vec_id",
            "left_anti",
        )
        # append-only publish: admitted rows land as NEW files; v2 =
        # v1 files + appended files, no data file rewritten
        app_dir = os.path.join(table, "a2")
        (
            admitted.select(
                "bucket",
                F.col("vec_id").alias("corpus_id"),
                F.col("v").alias("c_vec"),
            )
            .repartition(1)
            .write.parquet(app_dir)
        )
        appended = [
            f for f in list_data_files(table) if f not in set(v1_files)
        ]
        commit_snapshot(table, 2, v1_files + appended)
        rows_after = read_snapshot(spark, table, 2).count()
        append_only = set(snapshot_files(table, 2)) >= set(v1_files)
        probe_no_rebuild = {
            f.removeprefix("file://").removeprefix("file:")
            for f in probed_files
        } == set(v1_files)

        stats = (
            base.agg(F.count("*").alias("n_base"))
            .crossJoin(
                batch.agg(
                    F.count("*").alias("n_incoming"),
                    F.coalesce(F.sum("vec_id"), F.lit(0)).alias(
                        "sum_incoming_ids"
                    ),
                )
            )
            .crossJoin(cand.agg(F.count("*").alias("n_candidate_pairs")))
            .crossJoin(
                rejected.agg(
                    F.count("*").alias("n_rejected"),
                    F.coalesce(F.sum("query_id"), F.lit(0)).alias(
                        "sum_rejected_ids"
                    ),
                )
            )
            .select(
                "n_base",
                "n_incoming",
                "n_candidate_pairs",
                "n_rejected",
                (F.col("n_incoming") - F.col("n_rejected")).alias(
                    "n_admitted"
                ),
                "sum_incoming_ids",
                "sum_rejected_ids",
                F.lit(rows_before).cast("long").alias("index_rows_before"),
                F.lit(rows_after).cast("long").alias("index_rows_after"),
                F.expr(f"(1000000L * {hits}) div {n_exact}").alias(
                    "recall_ppm"
                ),
                F.lit(bool(append_only)).alias("append_only"),
                F.lit(bool(probe_no_rebuild)).alias("probe_read_v1_only"),
            )
            .localCheckpoint()
        )
        return stats
    finally:
        e.unpersist()
        shutil.rmtree(scratch, ignore_errors=True)


def _ann_incremental_sql() -> str:
    return f"""
WITH v AS (
  SELECT vec_id, embedding AS v, {_duck_bucket_expr('embedding')} AS bucket
  FROM embeddings
),
base AS (SELECT * FROM v WHERE vec_id % 5 <> 0),
batch AS (SELECT vec_id AS query_id, v AS q, bucket FROM v WHERE vec_id % 5 = 0),
cand AS (
  SELECT b.query_id, c.vec_id AS corpus_id,
    CASE WHEN ({_duck_l2('b.q')} * {_duck_l2('c.v')}) != 0.0
         THEN {_duck_dot('b.q', 'c.v')} / ({_duck_l2('b.q')} * {_duck_l2('c.v')})
         ELSE 0.0 END AS cosine
  FROM base c JOIN batch b ON c.bucket = b.bucket
),
approx AS (
  SELECT query_id, corpus_id FROM (
    SELECT query_id, corpus_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY cosine DESC, corpus_id) AS r
    FROM cand) WHERE r <= 5
),
exact AS (
  SELECT query_id, corpus_id FROM (
    SELECT b.query_id, c.vec_id AS corpus_id,
           ROW_NUMBER() OVER (PARTITION BY b.query_id ORDER BY
             CASE WHEN ({_duck_l2('b.q')} * {_duck_l2('c.v')}) != 0.0
                  THEN {_duck_dot('b.q', 'c.v')} / ({_duck_l2('b.q')} * {_duck_l2('c.v')})
                  ELSE 0.0 END DESC, c.vec_id) AS r
    FROM base c CROSS JOIN batch b) WHERE r <= 5
),
rej AS (SELECT DISTINCT query_id FROM cand WHERE cosine >= {_ANN_DUP_COS}),
hits AS (
  SELECT COUNT(*) AS h FROM approx a JOIN exact e
    ON a.query_id = e.query_id AND a.corpus_id = e.corpus_id
)
SELECT
  CAST((SELECT COUNT(*) FROM base) AS BIGINT) AS n_base,
  CAST((SELECT COUNT(*) FROM batch) AS BIGINT) AS n_incoming,
  CAST((SELECT COUNT(*) FROM cand) AS BIGINT) AS n_candidate_pairs,
  CAST((SELECT COUNT(*) FROM rej) AS BIGINT) AS n_rejected,
  CAST((SELECT COUNT(*) FROM batch) - (SELECT COUNT(*) FROM rej)
       AS BIGINT) AS n_admitted,
  CAST((SELECT COALESCE(SUM(query_id), 0) FROM batch) AS BIGINT)
    AS sum_incoming_ids,
  CAST((SELECT COALESCE(SUM(query_id), 0) FROM rej) AS BIGINT)
    AS sum_rejected_ids,
  CAST((SELECT COUNT(*) FROM base) AS BIGINT) AS index_rows_before,
  CAST((SELECT COUNT(*) FROM base)
    + (SELECT COUNT(*) FROM batch) - (SELECT COUNT(*) FROM rej)
    AS BIGINT) AS index_rows_after,
  CAST((1000000 * (SELECT h FROM hits)) // (SELECT COUNT(*) FROM exact)
    AS BIGINT) AS recall_ppm,
  TRUE AS append_only,
  TRUE AS probe_read_v1_only
"""


SIM_ANN_INC_SQL = _ann_incremental_sql()


QUERIES = {
    "sim_ann_index_incremental": (
        sim_ann_index_incremental,
        SIM_ANN_INC_SQL,
    ),
    "sim_contrastive_pairs": (sim_contrastive_pairs, SIM_CONTRAST_SQL),
    "ml_silhouette": (ml_silhouette, ML_SILHOUETTE_SQL),
    "ml_ranking_metrics": (ml_ranking_metrics, ML_RANKING_SQL),
    "dist_kernels": (dist_kernels, DIST_KERNELS_SQL),
    "sim_quantized_recall": (sim_quantized_recall, SIM_QREC_SQL),
    "sim_jl_projection_audit": (sim_jl_projection_audit, SIM_JL_SQL),
    "geo_radius_join": (geo_radius_join, GEO_RADIUS_SQL),
    "geo_quadkey_rollup": (geo_quadkey_rollup, GEO_QUADKEY_SQL),
    "ml_dbscan_grid": (ml_dbscan_grid, ML_DBSCAN_SQL),
    "sim_knn_classify": (sim_knn_classify, SIM_KNN_SQL),
    "sim_topk_pq": (sim_topk_pq, SIM_PQ_SQL),
    "sim_maxsim_multivector": (sim_maxsim_multivector, SIM_MAXSIM_SQL),
    "nearest_exemplar": (nearest_exemplar, NEAREST_EXEMPLAR_SQL),
    "sim_topk_bruteforce": (sim_topk_bruteforce, SIM_TOPK_SQL),
    "sim_topk_lsh": (sim_topk_lsh, SIM_LSH_SQL),
    "sim_topk_ivf": (sim_topk_ivf, SIM_IVF_SQL),
}
