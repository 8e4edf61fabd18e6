"""N-gram Jaccard near-dup pairs (exact, bucketed to stay sub-quadratic).

For corpora where exact Jaccard is required (not the MinHash estimate),
pairs are generated inside coarse buckets (default: same ``source``
partition column or a length band) so the cross join never goes global.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import shingles


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bucket_col: str | None = None,
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Pairs (id_a < id_b, jaccard) with shingle-set Jaccard ≥ threshold.

    ``bucket_col`` confines the pair generation (same-bucket equi-join →
    hash join, never a global cross product). With None, a single global
    bucket is used — only for small inputs/tests.
    """
    sh = df.select(
        F.col(id_col),
        (F.col(bucket_col) if bucket_col else F.lit(0)).alias("_bucket"),
        shingles(F.col(text_col), n=shingle_n).alias("sh"),
    )
    a, b = sh.alias("a"), sh.alias("b")
    pairs = a.join(
        b,
        on=[
            F.col("a._bucket") == F.col("b._bucket"),
            F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
        ],
    ).select(
        F.col(f"a.{id_col}").alias("id_a"),
        F.col(f"b.{id_col}").alias("id_b"),
        F.col("a.sh").alias("sh_a"),
        F.col("b.sh").alias("sh_b"),
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    # |A ∪ B| = |A| + |B| − |A ∩ B| (shingle arrays are sets) — avoids
    # materializing the union array per pair
    union = F.size("sh_a") + F.size("sh_b") - inter
    jac = F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0))
    return (
        pairs.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
