"""N-gram Jaccard near-dup pairs (exact, bucketed to stay sub-quadratic).

For corpora where exact Jaccard is required (not the MinHash estimate),
pairs are generated inside coarse buckets so the self-join never goes
global. Two bucketing dimensions compose:

- an optional user bucket column (e.g. ``lang`` — pairs are only sought
  within a bucket value), and
- an ALWAYS-ON length band: documents are banded by shingle-set size on
  a log scale with multiplicative width ``1/threshold``. Jaccard ≥ t
  implies ``min(|A|,|B|)/max(|A|,|B|) ≥ t``, so a qualifying pair's
  bands differ by at most 1 — each document probes its own band and the
  next one, and NO qualifying pair is ever missed. This is what keeps
  the default (``bucket_col=None``) scale-safe: a uniform corpus of n
  docs splits into O(log n) bands instead of one global n² bucket.
"""

from __future__ import annotations

import math

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

    ``bucket_col`` confines the pair generation to equal bucket values
    (a semantic restriction — cross-bucket pairs are never reported).
    Length-band bucketing applies in EITHER case and is lossless for
    the given threshold, so results with ``bucket_col=None`` are
    identical to a global all-pairs scan."""
    from ..operators.parallelism import ensure_parallelism

    # Band width 1/t (clamped: t→0 degenerates to one huge band, which
    # is the correct limit — every pair qualifies on size; t→1 would be
    # a zero-width band, clamp to 0.95 and let the exact size-ratio
    # prune below do the tightening).
    t_eff = min(max(threshold, 1e-9), 0.95)
    band_w = math.log(1.0 / t_eff)

    # Repartition BEFORE the self-join: a single-file corpus scans as one
    # partition, and a broadcast join inherits the stream side's
    # parallelism — without this every pair evaluates on one core.
    base = df.select(
        F.col(id_col),
        (F.col(bucket_col) if bucket_col else F.lit(0)).alias("_bucket"),
        shingles(F.col(text_col), n=shingle_n).alias("sh"),
    )
    if threshold > 0:
        # empty shingle sets can never reach a positive threshold
        # (jaccard is pinned 0.0 when the union is empty)
        base = base.filter(F.size("sh") >= 1)
    sh = ensure_parallelism(
        base.withColumn(
            "_band",
            F.floor(F.log(F.greatest(F.size("sh"), F.lit(1))) / band_w).cast("int"),
        ),
        force=True,
    )
    a = sh.alias("a")
    # The probe side advertises itself in its own band AND the next one;
    # combined with the acceptance rule below each unordered pair is
    # examined exactly once: same-band pairs in the id_a < id_b
    # orientation, adjacent-band pairs in the higher-band-left
    # orientation (no id constraint needed — band assignment is a
    # function of the doc, so the reverse orientation can't also match).
    b = sh.withColumn(
        "_probe", F.explode(F.array(F.col("_band"), F.col("_band") + 1))
    ).alias("b")

    def jac_of(sa: F.Column, sb: F.Column) -> F.Column:
        inter = F.size(F.array_intersect(sa, sb))
        # |A ∪ B| = |A| + |B| − |A ∩ B| (shingle arrays are sets) —
        # avoids materializing the union array per pair
        union = F.size(sa) + F.size(sb) - inter
        return F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0))

    # The threshold lives in the ON clause *after* the cheap structural
    # checks: a filter applied post-join gets pushed into the join
    # condition AHEAD of the cheap checks (measured 50× slower —
    # array_intersect ran for every same-bucket ordered pair); stating
    # the conjunction explicitly keeps the short-circuit order
    # cheap-first. Length bound before the intersect: jaccard(A,B) ≤
    # min|A|,|B| / max|A|,|B|, so pairs whose size ratio can't reach the
    # threshold are rejected by two integer comparisons instead of an
    # array_intersect.
    sa, sb = F.size(F.col("a.sh")), F.size(F.col("b.sh"))
    pairs = a.join(
        b,
        on=[
            F.col("a._bucket") == F.col("b._bucket"),
            F.col("a._band") == F.col("b._probe"),
            (
                (F.col("a._band") == F.col("b._band"))
                & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            )
            | (F.col("a._band") == F.col("b._band") + 1),
            sa.cast("double") >= threshold * sb,
            sb.cast("double") >= threshold * sa,
            jac_of(F.col("a.sh"), F.col("b.sh")) >= threshold,
        ],
    )
    ida, idb = F.col(f"a.{id_col}"), F.col(f"b.{id_col}")
    return pairs.select(
        # canonical ordering: adjacent-band matches arrive with the
        # higher-band doc on the left regardless of id order
        F.least(ida, idb).alias("id_a"),
        F.greatest(ida, idb).alias("id_b"),
        jac_of(F.col("a.sh"), F.col("b.sh")).alias("jaccard"),
    )
