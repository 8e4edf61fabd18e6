"""ALS factorization (ml/als.py): recoverability on a planted low-rank
matrix, determinism under partitioning, group-integrity (the bucket
keying must never split an entity), and the no-driver-collect
contract (factor tables stay DataFrames)."""

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


def _factors(df):
    return sorted(tuple(r) for r in df.collect())


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
    assert p4.count() == 60 and q4.count() == 30


def test_als_deterministic_across_layout(spark):
    from bigdata_spark.ml.als import als_train

    df = _planted(spark)
    p1, q1 = als_train(df, n_iter=2)
    p2, q2 = als_train(df.repartition(13), n_iter=2)
    assert _factors(p1) == _factors(p2) and _factors(q1) == _factors(q2)


def test_als_handles_more_entities_than_buckets(spark):
    # >64 users forces bucket sharing; every user must still solve on
    # its full rating set (regression for the mapInPandas group-split)
    from bigdata_spark.ml.als import _BUCKETS, als_train

    df = _planted(spark, n_users=3 * _BUCKETS, n_items=10)
    p, q = als_train(df, n_iter=1)
    assert p.count() == 3 * _BUCKETS


def test_als_native_init_matches_formula(spark):
    # the Spark-native init expression must reproduce the closed-form
    # Python formula bit-for-bit (the pinned oracle depends on it)
    from bigdata_spark.ml.als import _K, init_item_factors

    df = spark.createDataFrame(
        [(i, i % 5, 1.0) for i in range(40)], "user_id long, item_id long, rating double"
    )
    got = {
        int(r["item_id"]): [r[f"f{f}"] for f in range(_K)]
        for r in init_item_factors(df, "item_id").collect()
    }
    for item in range(5):
        expect = [(((item * 31 + f * 17) % 7) - 3) / 10.0 + 0.5 for f in range(_K)]
        assert got[item] == expect


def test_als_module_has_no_collect():
    # the 100 TB contract: ratings and factor tables never visit the
    # driver — the module must contain zero collect() calls
    import inspect

    import bigdata_spark.ml.als as als

    src = inspect.getsource(als)
    assert ".collect()" not in src
