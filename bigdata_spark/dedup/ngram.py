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
    from ..operators.parallelism import ensure_parallelism

    # Repartition BEFORE the self-join: a single-file corpus scans as one
    # partition, and a broadcast join inherits the stream side's
    # parallelism — without this every pair evaluates on one core.
    sh = ensure_parallelism(
        df.select(
            F.col(id_col),
            (F.col(bucket_col) if bucket_col else F.lit(0)).alias("_bucket"),
            shingles(F.col(text_col), n=shingle_n).alias("sh"),
        ),
        force=True,
    )
    a, b = sh.alias("a"), sh.alias("b")

    def jac_of(sa: F.Column, sb: F.Column) -> F.Column:
        inter = F.size(F.array_intersect(sa, sb))
        # |A ∪ B| = |A| + |B| − |A ∩ B| (shingle arrays are sets) —
        # avoids materializing the union array per pair
        union = F.size(sa) + F.size(sb) - inter
        return F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0))

    # The threshold lives in the ON clause *after* the id inequality:
    # a filter applied post-join gets pushed into the join condition
    # AHEAD of the cheap id check (measured 50× slower — array_intersect
    # ran for every same-bucket ordered pair); stating the conjunction
    # explicitly keeps the short-circuit order cheap-first.
    # Length bound before the intersect: jaccard(A,B) ≤ min|A|,|B| /
    # max|A|,|B|, so pairs whose size ratio can't reach the threshold
    # are rejected by two integer comparisons instead of an
    # array_intersect. No-op on uniform-length corpora; big on mixed.
    sa, sb = F.size(F.col("a.sh")), F.size(F.col("b.sh"))
    pairs = a.join(
        b,
        on=[
            F.col("a._bucket") == F.col("b._bucket"),
            F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
            sa.cast("double") >= threshold * sb,
            sb.cast("double") >= threshold * sa,
            jac_of(F.col("a.sh"), F.col("b.sh")) >= threshold,
        ],
    )
    return pairs.select(
        F.col(f"a.{id_col}").alias("id_a"),
        F.col(f"b.{id_col}").alias("id_b"),
        jac_of(F.col("a.sh"), F.col("b.sh")).alias("jaccard"),
    )
