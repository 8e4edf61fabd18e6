"""Alternating least squares matrix factorization, Spark-grouped and
bit-deterministic.

The classic recommender factorization R ≈ P·Qᵀ at the 100 TB shape:
each half-step solves ONE k×k normal-equation system PER ENTITY (user
or item), with the opposite side's factor table broadcast — so the
distributed work is an ``applyInPandas`` over the ratings grouped by
that entity, each group reduced to a k×k system (k=4 here), and the
factor tables that move between steps are (n_entities × k) — tiny
relative to the ratings. No RDD hops, no driver-side rating loops.

Determinism (what lets the registry pin the output as a per-SF value
oracle): item factors initialize from a closed-form integer formula,
each group's normal equations accumulate in sorted-key order with
plain Python floats, and the k×k solve is pure-Python Gaussian
elimination with partial pivoting — no BLAS anywhere, so the result
is bit-identical across runs and platforms given identical ratings.

Reference parity: the reference has no recommender, but its
broadcast-model-apply surface (SURVEY.md §2 U4/J4) is the same
pattern ALS alternates; this extends it to iterative factorization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_K = 4  # factor rank
_BUCKETS = 64  # applyInPandas group-count bound (see _solve_side)
_LAMBDA = 0.1  # ridge regularizer


def _init_item_factor(item: int) -> list[float]:
    """Deterministic closed-form init: small, varied, integer-derived."""
    return [(((item * 31 + f * 17) % 7) - 3) / 10.0 + 0.5 for f in range(_K)]


def _solve(A: list[list[float]], b: list[float]) -> list[float]:
    """Pure-Python Gaussian elimination with partial pivoting on a k×k
    system — deterministic IEEE, no BLAS."""
    k = len(b)
    M = [row[:] + [b[i]] for i, row in enumerate(A)]
    for c in range(k):
        piv = max(range(c, k), key=lambda r: abs(M[r][c]))
        M[c], M[piv] = M[piv], M[c]
        for r in range(c + 1, k):
            f = M[r][c] / M[c][c]
            for j in range(c, k + 1):
                M[r][j] -= f * M[c][j]
    x = [0.0] * k
    for r in range(k - 1, -1, -1):
        s = M[r][k] - sum(M[r][j] * x[j] for j in range(r + 1, k))
        x[r] = s / M[r][r]
    return x


def _solve_side(
    ratings: DataFrame,
    group_col: str,
    other_col: str,
    other_factors: dict[int, list[float]],
) -> dict[int, list[float]]:
    """One ALS half-step: for each ``group_col`` entity, solve
    (Σ q qᵀ + λ·n·I) p = Σ r·q over its ratings, with the opposite
    side's factors broadcast into the closure. Returns the new factor
    table as a small driver dict (n_entities × k)."""
    import pandas as pd

    spark = ratings.sparkSession
    bc = spark.sparkContext.broadcast(other_factors)

    # Grouping discipline, learned the hard way:
    # - NOT mapInPandas + per-batch groupby: a partition larger than
    #   one Arrow batch splits a group across calls and silently
    #   solves it on partial data.
    # - NOT applyInPandas keyed on the raw entity either: each
    #   applyInPandas group costs a fixed ~10 ms Arrow round-trip, so
    #   1e3+ entities pay seconds of pure overhead (and 1e9 entities
    #   at 100 TB would be absurd).
    # Instead key on a BUCKET of the entity (id % _BUCKETS): every row
    # of an entity still lands in exactly one call (the bucket is a
    # function of the id), and each call solves its bucket's entities
    # via an in-pandas groupby — bounded task count, whole groups.
    def solve_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        fac = bc.value
        out = []
        for gid, grp in pdf.groupby(group_col, sort=True):
            grp = grp.sort_values(other_col)
            Q = np.array([fac[int(o)] for o in grp[other_col]], dtype=np.float64)
            r = grp["rating"].to_numpy(dtype=np.float64)
            # einsum with optimize=False runs numpy's sequential C
            # loop — fixed summation order, no BLAS: bit-deterministic
            A = np.einsum("gi,gj->ij", Q, Q, optimize=False)
            b = np.einsum("g,gi->i", r, Q, optimize=False)
            n = len(r)
            Al = A.tolist()
            for i in range(_K):
                Al[i][i] += _LAMBDA * n
            p = _solve(Al, b.tolist())
            out.append({"id": int(gid), **{f"f{i}": p[i] for i in range(_K)}})
        return pd.DataFrame(out)

    fcols = ", ".join(f"f{i} double" for i in range(_K))
    rows = (
        ratings.withColumn("_bucket", F.col(group_col) % _BUCKETS)
        .groupBy("_bucket")
        .applyInPandas(solve_bucket, f"id long, {fcols}")
        .collect()
    )
    return {int(r["id"]): [float(r[f"f{i}"]) for i in range(_K)] for r in rows}


def als_train(
    ratings: DataFrame,
    user_col: str = "user_id",
    item_col: str = "item_id",
    n_iter: int = 2,
) -> tuple[dict[int, list[float]], dict[int, list[float]]]:
    """Run ``n_iter`` full ALS alternations (solve users, then items)
    from the deterministic item init. ``ratings`` needs columns
    (user_col, item_col, rating)."""
    items = [r[0] for r in ratings.select(item_col).distinct().collect()]
    q = {int(i): _init_item_factor(int(i)) for i in items}
    p: dict[int, list[float]] = {}
    for _ in range(n_iter):
        p = _solve_side(ratings, user_col, item_col, q)
        q = _solve_side(ratings, item_col, user_col, p)
    return p, q


def als_rmse(ratings: DataFrame, p: dict, q: dict, user_col: str, item_col: str) -> float:
    """Training RMSE, computed exactly enough to pin: per-row squared
    error in plain Python floats (deterministic), summed in sorted
    (user, item) order on the driver — the ratings sample this runs on
    is the grouped-aggregate table, already bounded (n_users ×
    n_items), not the raw event log."""
    rows = ratings.select(user_col, item_col, "rating").collect()
    rows.sort(key=lambda r: (r[0], r[1]))
    se = 0.0
    for u, i, r in rows:
        pu, qi = p[int(u)], q[int(i)]
        pred = sum(pu[f] * qi[f] for f in range(_K))
        se += (float(r) - pred) ** 2
    return (se / len(rows)) ** 0.5
