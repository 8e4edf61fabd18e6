"""Similarity search over embedding columns (array<float/double>).

Baseline: exact brute-force cosine top-k (broadcast the query set,
score every row natively, per-query top-k via ranking window). Scale
path: random-hyperplane LSH bucketing — score only within matching
buckets, trading recall for a ~buckets-fold candidate reduction.

All scoring is native ``zip_with``/``aggregate`` expressions
(functions/distances.py) — JVM-side, codegen, no Python workers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.distances import cosine_similarity, dot_product
from ..functions.hashing import portable_hash64


def _as_double_array(col_name: str) -> F.Column:
    return F.col(col_name).cast("array<double>")


def cosine_pairs(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All (query, corpus) cosine scores — broadcast the (small) query
    side so the corpus never shuffles."""
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double_array(vec_col).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("corpus_id"), _as_double_array(vec_col).alias("c_vec")
    )
    return (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("corpus_id"))
        .select(
            "query_id",
            "corpus_id",
            cosine_similarity(F.col("q_vec"), F.col("c_vec")).alias("cosine"),
        )
    )


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k nearest by cosine for each query vector.

    Deterministic: ties break on corpus_id. The only shuffle is the
    per-query ranking window, keyed on query_id (small side).
    """
    scored = cosine_pairs(queries, corpus, id_col, vec_col)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("corpus_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cosine", "rank")
    )


def _hyperplane(dim: int, seed: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane from the portable
    hash recipe (engine-independent, no RNG state)."""
    import hashlib

    vals = []
    for i in range(dim):
        h = hashlib.md5(f"{seed}|{i}".encode()).hexdigest()
        # map first 8 hex chars to [-1, 1)
        vals.append(int(h[:8], 16) / float(1 << 31) - 1.0)
    return vals


def lsh_bucketed_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: random-hyperplane signature buckets, exact
    cosine within bucket. Recall < 1.0 by design; candidates shrink
    ~2^n_planes-fold, which is what makes 100 TB ANN feasible."""
    if dim is None:
        first = corpus.select(F.size(vec_col).alias("d")).first()
        dim = int(first["d"])

    def signature(vec: F.Column) -> F.Column:
        bits = []
        for p in range(n_planes):
            plane = F.array(*[F.lit(v) for v in _hyperplane(dim, p)])
            bits.append(F.when(dot_product(vec, plane) >= 0, F.lit(1 << p)).otherwise(F.lit(0)))
        out = F.lit(0)
        for b in bits:
            out = out + b
        return out

    q = queries.select(
        F.col(id_col).alias("query_id"),
        _as_double_array(vec_col).alias("q_vec"),
    ).withColumn("bucket", signature(F.col("q_vec")))
    c = corpus.select(
        F.col(id_col).alias("corpus_id"),
        _as_double_array(vec_col).alias("c_vec"),
    ).withColumn("bucket", signature(F.col("c_vec")))

    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("query_id") != F.col("corpus_id"))
        .select(
            "query_id",
            "corpus_id",
            cosine_similarity(F.col("q_vec"), F.col("c_vec")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("corpus_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cosine", "rank")
    )
