"""Product quantization (Jégou et al., "Product Quantization for
Nearest Neighbor Search", TPAMI 2011) — the memory-compression ANN
path next to LSH bucketing and IVF lists (similarity/ann.py).

A D-dim vector is split into M subspaces of D/M dims; each subspace
gets its own small codebook (k codewords, trained like the IVF coarse
quantizer: bounded sample, seeded driver-side k-means++). A vector is
then stored as M small integers — at M=8, k=16 that is 8 nibbles
(~4 bytes) instead of 256 float bytes, a 64× compression, which is
what makes billion-vector indexes fit in cluster memory.

Query-time scoring is ADC (asymmetric distance computation): the query
stays a full vector; its distance to a code is the sum over subspaces
of ||q_s − codeword[s][code_s]||². Everything here is native
expressions — slicing, nearest-codeword argmin, and the ADC sum run
as ``transform``/``aggregate`` inside codegen; the codebooks travel as
ONE broadcast row (constant-size plan), never as literal expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.distances import nearest_exemplar_index
from .ann import _as_double_array, _lloyd_numpy


def train_pq_codebooks(
    c: DataFrame,
    m_subspaces: int,
    k_codes: int,
    dim: int,
    seed: int,
    max_iter: int = 10,
) -> list[list[list[float]]]:
    """codebooks[s][j] = j-th codeword of subspace s. Trained on ONE
    bounded sample collect (shared across subspaces — the sample is
    sliced driver-side), so training cost is independent of corpus
    size."""
    import numpy as np

    if dim % m_subspaces:
        raise ValueError(f"dim {dim} not divisible by m_subspaces {m_subspaces}")
    sub = dim // m_subspaces
    train_cap = max(k_codes * 64, 2048)
    X = np.asarray(
        [r["c_vec"] for r in c.select("c_vec").limit(train_cap).collect()],
        dtype="float64",
    )
    return [
        [
            [float(x) for x in cc]
            for cc in _lloyd_numpy(
                X[:, s * sub : (s + 1) * sub], k_codes, seed + s, max_iter
            )
        ]
        for s in range(m_subspaces)
    ]


def pq_encode(
    corpus: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(corpus_id, codes): each vector reduced to M nearest-codeword
    indices — the compressed index representation."""
    from ..operators.parallelism import ensure_parallelism

    spark = corpus.sparkSession
    m = len(codebooks)
    sub = len(codebooks[0][0])
    # encoding is a CPU-heavy narrow map (M × k codeword distances per
    # row, interpreted) — spread it; the scan's byte-based splits give
    # 1-2 partitions here (same lesson as ann.coarse_assign)
    c = ensure_parallelism(
        corpus.select(
            F.col(id_col).alias("corpus_id"), _as_double_array(vec_col).alias("c_vec")
        )
    )
    books = spark.createDataFrame(
        [(codebooks,)], "books array<array<array<double>>>"
    )
    codes = F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda s: nearest_exemplar_index(
            F.slice("c_vec", s * sub + F.lit(1), F.lit(sub)),
            F.element_at("books", (s + F.lit(1)).cast("int")),
        ),
    )
    return c.crossJoin(F.broadcast(books)).select(
        "corpus_id", codes.alias("codes")
    )


def pq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    m_subspaces: int = 8,
    k_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """ADC top-k: exact query vectors scored against PQ-compressed
    corpus codes. Deterministic for a fixed seed; approximation error
    is the quantization residual (recall recovers with more subspaces
    or codewords)."""
    spark = corpus.sparkSession
    c = corpus.select(
        F.col(id_col).alias("corpus_id"), _as_double_array(vec_col).alias("c_vec")
    )
    first = c.select(F.size("c_vec").alias("d")).first()
    dim = int(first["d"])
    sub = dim // m_subspaces
    codebooks = train_pq_codebooks(c, m_subspaces, k_codes, dim, seed)
    encoded = pq_encode(corpus, codebooks, id_col, vec_col)

    books = spark.createDataFrame(
        [(codebooks,)], "books array<array<array<double>>>"
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double_array(vec_col).alias("q_vec")
    ).crossJoin(F.broadcast(books))

    # ADC: for each (query, corpus) pair, fold over subspaces summing
    # ||q_s - codeword||² — the codeword is fetched by the corpus code
    def sq_dist(s):
        cw = F.element_at(
            F.element_at("books", (s + F.lit(1)).cast("int")),
            (F.element_at("codes", (s + F.lit(1)).cast("int")) + F.lit(1)).cast("int"),
        )
        q_s = F.slice("q_vec", s * sub + F.lit(1), F.lit(sub))
        return F.aggregate(
            F.zip_with(q_s, cw, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    adc = F.aggregate(
        F.sequence(F.lit(0), F.lit(m_subspaces - 1)),
        F.lit(0.0),
        lambda acc, s: acc + sq_dist(s),
    )
    scored = (
        encoded.join(F.broadcast(q), F.col("query_id") != F.col("corpus_id"))
        .withColumn("adc_dist", adc)
        .select("query_id", "corpus_id", "adc_dist")
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("adc_dist"), F.asc("corpus_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "adc_dist", "rank")
    )
