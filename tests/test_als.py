"""ALS factorization (ml/als.py): recoverability on a planted low-rank
matrix, determinism under partitioning, and group-integrity (the
bucket keying must never split an entity)."""

from __future__ import annotations

import numpy as np


def _planted(spark, n_users=60, n_items=30, seed=3):
    rng = np.random.default_rng(seed)
    P = rng.normal(size=(n_users, 4))
    Q = rng.normal(size=(n_items, 4))
    R = P @ Q.T
    rows = [
        (u, i, float(R[u, i]))
        for u in range(n_users)
        for i in range(n_items)
        if (u + i) % 3 != 0  # 2/3 observed
    ]
    return spark.createDataFrame(rows, "user_id long, item_id long, rating double")


def test_als_recovers_planted_low_rank(spark):
    from bigdata_spark.ml.als import als_rmse, als_train

    df = _planted(spark)
    p2, q2 = als_train(df, n_iter=2)
    p4, q4 = als_train(df, n_iter=4)
    rmse2 = als_rmse(df, p2, q2, "user_id", "item_id")
    rmse4 = als_rmse(df, p4, q4, "user_id", "item_id")
    # rank-4 planted matrix with rating std ~2.1: the fit must explain
    # most variance and keep improving with iterations (the λ·n ridge
    # intentionally blocks exact recovery)
    assert rmse4 < rmse2 < 1.0
    assert rmse4 < 0.7
    assert len(p4) == 60 and len(q4) == 30


def test_als_deterministic_across_layout(spark):
    from bigdata_spark.ml.als import als_train

    df = _planted(spark)
    p1, q1 = als_train(df, n_iter=2)
    p2, q2 = als_train(df.repartition(13), n_iter=2)
    assert p1 == p2 and q1 == q2


def test_als_handles_more_entities_than_buckets(spark):
    # >64 users forces bucket sharing; every user must still solve on
    # its full rating set (regression for the mapInPandas group-split)
    from bigdata_spark.ml.als import _BUCKETS, als_train

    df = _planted(spark, n_users=3 * _BUCKETS, n_items=10)
    p, q = als_train(df, n_iter=1)
    assert len(p) == 3 * _BUCKETS
