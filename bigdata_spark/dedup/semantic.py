"""SemDeDup-style semantic deduplication (Abbas et al., 2023):
cluster embeddings with a coarse k-means quantizer, then drop any item
whose cosine similarity to a LOWER-ID item in the same cluster meets
the threshold — keeping one representative per near-duplicate group.

Why this scales where pairwise cosine dedup doesn't: the pair join is
confined to same-cluster pairs, so cost is Σ cluster_size² instead of
n² — the quantizer is the recall/cost dial (more clusters → cheaper
and lower recall). Clustering reuses the IVF machinery
(similarity/ann.py coarse_assign): bounded driver-side seeded
k-means++ training, one full-corpus assignment pass, broadcast
centroid table. The within-cluster self-join shuffles on list_id; a
degenerate cluster (everything identical) concentrates its size² pairs
on one reducer — the same guard playbook as the LSH band join applies
(cap cluster size by sub-splitting on a secondary hash) and is noted
here rather than wired, since the quantizer already spreads mass by
construction.

Deterministic for a fixed seed, so the drop set is stable run-to-run
and engine-independent given the same centroid arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..similarity.ann import coarse_assign
from ..functions.distances import cosine_similarity


def semantic_dup_pairs(
    corpus: DataFrame,
    n_clusters: int = 16,
    threshold: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Within-cluster near-duplicate pairs (id_a < id_b, cosine ≥
    threshold). Exact cosine; recall is bounded by the clustering
    (cross-cluster near-dups are never examined — SemDeDup's stated
    trade)."""
    lists, _ = coarse_assign(corpus, n_clusters, id_col, vec_col, seed)
    a = lists.select(
        "list_id", F.col("corpus_id").alias("id_a"), F.col("c_vec").alias("vec_a")
    )
    b = lists.select(
        "list_id", F.col("corpus_id").alias("id_b"), F.col("c_vec").alias("vec_b")
    )
    return (
        a.join(b, "list_id")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", cosine_similarity(F.col("vec_a"), F.col("vec_b")))
        .filter(F.col("cosine") >= threshold)
        .select("list_id", "id_a", "id_b", "cosine")
    )


def semantic_dedup(
    corpus: DataFrame,
    n_clusters: int = 16,
    threshold: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    pairs: DataFrame | None = None,
) -> DataFrame:
    """Corpus annotated with ``is_dropped``: True iff a lower-id
    same-cluster item is ≥ threshold similar (SemDeDup keep-lowest-id
    policy, one pass — no transitive closure). Pass ``pairs`` when the
    caller already built ``semantic_dup_pairs`` — otherwise this would
    train and assign the quantizer a second time."""
    if pairs is None:
        pairs = semantic_dup_pairs(
            corpus, n_clusters, threshold, id_col, vec_col, seed
        )
    dropped = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return corpus.join(
        dropped.withColumn("is_dropped", F.lit(True)), id_col, "left"
    ).fillna(False, ["is_dropped"])
