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


def semantic_dup_pairs(
    corpus: DataFrame,
    n_clusters: int = 16,
    threshold: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    target_cluster_size: int | None = 128,
) -> DataFrame:
    """Within-cluster near-duplicate pairs (id_a < id_b, cosine ≥
    threshold). Exact cosine; recall is bounded by the clustering
    (cross-cluster near-dups are never examined — SemDeDup's stated
    trade).

    ``target_cluster_size`` scales the cluster count with the corpus
    (n_clusters = max(n_clusters, n/target)) — with a FIXED cluster
    count, mean cluster size grows linearly and the within-cluster pair
    join goes quadratic (measured 21× wall for 10× rows at 16 clusters
    in the sf1 soak); holding cluster size ~constant keeps total pair
    work linear, which is how SemDeDup runs at corpus scale (the paper
    uses 100k clusters for LAION-440M). Pass None to pin n_clusters
    exactly."""
    if target_cluster_size is not None:
        n = corpus.count()
        n_clusters = max(n_clusters, (n + target_cluster_size - 1) // target_cluster_size)
    lists, _ = coarse_assign(corpus, n_clusters, id_col, vec_col, seed)

    # Pair scoring is a per-cluster DENSE similarity matrix — exactly
    # the shape where Arrow-batched numpy beats row-wise evaluation:
    # the expression-level self-join + cosine fold materialized every
    # candidate pair as a boxed ~1 KB row (measured ~35 µs/pair, 45 s
    # for the sf1 pass — row copy + interpreted HOF dominate, not
    # arithmetic), while one V @ V.T per cluster is a BLAS call over
    # data that arrived in a single Arrow batch (same pass: ~3 s).
    # Memory is cluster_size² per group — bounded by
    # target_cluster_size, which is what also keeps total work linear.
    thr = float(threshold)

    def score(pdf):
        import numpy as np
        import pandas as pd

        order = pdf["corpus_id"].to_numpy().argsort()
        ids = pdf["corpus_id"].to_numpy()[order]
        V = np.vstack([np.asarray(v, dtype="float64") for v in pdf["c_vec"].iloc[order]])
        norms = np.linalg.norm(V, axis=1)
        den = np.outer(norms, norms)
        with np.errstate(divide="ignore", invalid="ignore"):
            sims = np.where(den != 0.0, (V @ V.T) / np.where(den == 0.0, 1.0, den), 0.0)
        ia, ib = np.triu_indices(len(ids), k=1)
        keep = sims[ia, ib] >= thr
        return pd.DataFrame(
            {
                "list_id": np.full(int(keep.sum()), int(pdf["list_id"].iloc[0]), dtype="int32"),
                "id_a": ids[ia[keep]],
                "id_b": ids[ib[keep]],
                "cosine": sims[ia[keep], ib[keep]],
            }
        )

    return lists.groupBy("list_id").applyInPandas(
        score, "list_id int, id_a long, id_b long, cosine double"
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
