"""ML-layer tests: proximity tree/forest on separable clusters
(FIXTURES.md §4; reference code/src/test.py:58-122), DTW kernels,
evaluation metrics."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from bigdata_spark.ml.dtw import dtw_distance, dtw_pairwise_udf, dtw_upper_bound
from bigdata_spark.ml.evaluation import balanced_accuracy, classification_metrics, confusion_matrix
from bigdata_spark.ml.global_tree import GlobalProximityTree
from bigdata_spark.ml.local_forest import LocalProximityForest
from bigdata_spark.ml.proximity import ProximityTree


def _clusters2d(spark, train=True, seed=0):
    # FIXTURES §4: 15 train rows per class around (0,0), (5,5), (10,10) ± 0.6
    rng = np.random.default_rng(seed)
    rows = []
    centers = {1: (0.0, 0.0), 2: (5.0, 5.0), 3: (10.0, 10.0)}
    if train:
        for label, (cx, cy) in centers.items():
            for _ in range(15):
                rows.append((label, [cx + rng.uniform(-0.6, 0.6), cy + rng.uniform(-0.6, 0.6)]))
    else:
        for label, (cx, cy) in centers.items():
            for _ in range(4):
                rows.append((label, [cx + rng.uniform(-0.6, 0.6), cy + rng.uniform(-0.6, 0.6)]))
    return spark.createDataFrame(rows, "label int, features array<double>")


def test_numpy_proximity_tree():
    rng = np.random.default_rng(1)
    X = np.vstack([rng.normal(c, 0.3, (20, 2)) for c in (0.0, 5.0, 10.0)])
    y = np.repeat([1, 2, 3], 20)
    tree = ProximityTree(n_splitters=3, seed=7).fit(X, y)
    assert (tree.predict(X) == y).mean() == 1.0
    # round-trip through portable state
    clone = ProximityTree.from_state(tree.to_state())
    assert (clone.predict(X) == y).mean() == 1.0


def test_local_forest_end_to_end(spark, tmp_path):
    train, test = _clusters2d(spark, True), _clusters2d(spark, False, seed=9)
    forest = LocalProximityForest(num_partitions=3, n_splitters=3, seed=5).fit(train)
    assert len(forest.trees) == 3
    preds = forest.predict(test)
    acc = preds.filter(F.col("label") == F.col("prediction")).count() / preds.count()
    assert acc == 1.0  # well-separated clusters
    # JSON persistence round-trip (S5/S6)
    p = str(tmp_path / "forest.json")
    forest.save(p)
    reloaded = LocalProximityForest.load(p)
    preds2 = reloaded.predict(test)
    assert preds2.filter(F.col("label") == F.col("prediction")).count() == preds.count()


def test_global_tree_end_to_end(spark, tmp_path):
    train, test = _clusters2d(spark, True), _clusters2d(spark, False, seed=11)
    tree = GlobalProximityTree(n_splitters=3, max_depth=6, seed=3).fit(train)
    assert tree.depth >= 2
    preds = tree.predict(test)
    acc = preds.filter(F.col("label") == F.col("prediction")).count() / preds.count()
    assert acc == 1.0
    p = str(tmp_path / "tree.json")
    tree.save(p)
    reloaded = GlobalProximityTree.load(p)
    preds2 = reloaded.predict(test)
    assert preds2.filter(F.col("label") == F.col("prediction")).count() == preds.count()


def test_dtw_kernels(spark):
    a = [0.0, 1.0, 2.0, 3.0]
    b = [0.0, 1.0, 2.0, 3.0]
    assert dtw_distance(a, b) == 0.0
    shifted = [1.0, 2.0, 3.0, 3.0]
    # DTW warps the shift away; euclidean bound cannot
    assert dtw_distance(a, shifted) <= dtw_upper_bound(a, shifted)
    # banded variant still exact for identical series
    assert dtw_distance(a, b, window=1) == 0.0
    df = spark.createDataFrame([(a, shifted)], "a array<double>, b array<double>")
    got = df.select(dtw_pairwise_udf()(F.col("a"), F.col("b")).alias("d")).first()["d"]
    assert got == pytest.approx(dtw_distance(a, shifted))


def test_fast_dtw_error_bound(spark):
    import numpy as np

    from bigdata_spark.ml.dtw import fast_dtw, fast_dtw_pairwise_udf

    rng = np.random.RandomState(3)
    for _ in range(10):
        a, b = np.cumsum(rng.randn(64)), np.cumsum(rng.randn(64))
        exact = dtw_distance(a, b)
        approx = fast_dtw(a, b, radius=2)
        # restricted path ⇒ approx ≥ exact, and the coarsening keeps it close
        assert approx >= exact - 1e-9
        assert approx <= exact * 1.5 + 1e-9
    # identical series: zero under any radius
    assert fast_dtw(np.arange(50.0), np.arange(50.0)) == 0.0
    # unequal lengths supported
    assert fast_dtw(np.arange(33.0), np.arange(50.0)) >= dtw_distance(
        np.arange(33.0), np.arange(50.0)
    ) - 1e-9
    a, b = np.cumsum(rng.randn(32)).tolist(), np.cumsum(rng.randn(32)).tolist()
    df = spark.createDataFrame([(a, b)], "a array<double>, b array<double>")
    got = df.select(fast_dtw_pairwise_udf(radius=2)(F.col("a"), F.col("b")).alias("d")).first()["d"]
    assert got == pytest.approx(fast_dtw(a, b, radius=2))


def test_dtw_split_trees_deterministic(spark):
    """DTW-kernel proximity trees (local + global) train and predict
    deterministically for a fixed seed — reference parity with its
    multi-measure distance layer (distance_measures.py:16-88)."""
    import numpy as np

    from bigdata_spark.ml.global_tree import GlobalProximityTree
    from bigdata_spark.ml.proximity import ProximityTree

    rng = np.random.RandomState(11)
    # two phase-shifted waveform classes — DTW separates, euclid struggles
    rows = []
    for i in range(40):
        shift = rng.randint(0, 3)
        base = np.sin(np.linspace(0, 4 * np.pi, 32) + shift * 0.2)
        if i % 2:
            rows.append((1, (base + rng.randn(32) * 0.05).tolist()))
        else:
            rows.append((0, (-base + rng.randn(32) * 0.05).tolist()))
    X = np.array([r[1] for r in rows])
    y = np.array([r[0] for r in rows])

    t1 = ProximityTree(n_splitters=2, max_depth=5, seed=7, metric="dtw", dtw_window=4).fit(X, y)
    t2 = ProximityTree(n_splitters=2, max_depth=5, seed=7, metric="dtw", dtw_window=4).fit(X, y)
    assert (t1.predict(X) == t2.predict(X)).all()
    assert (t1.predict(X) == y).mean() >= 0.9  # separable by design
    # state roundtrip preserves the kernel
    rt = ProximityTree.from_state(t1.to_state())
    assert rt.metric == "dtw" and rt.dtw_window == 4
    assert (rt.predict(X) == t1.predict(X)).all()

    df = spark.createDataFrame(rows, "label int, features array<double>")
    g1 = GlobalProximityTree(
        n_splitters=2, max_depth=4, min_samples_split=4, seed=7,
        metric="dtw", dtw_window=4,
    ).fit(df)
    g2 = GlobalProximityTree(
        n_splitters=2, max_depth=4, min_samples_split=4, seed=7,
        metric="dtw", dtw_window=4,
    ).fit(df)
    p1 = [tuple(r) for r in g1.predict(df).select("label", "prediction").orderBy("label", "prediction").collect()]
    p2 = [tuple(r) for r in g2.predict(df).select("label", "prediction").orderBy("label", "prediction").collect()]
    assert p1 == p2
    acc = sum(1 for l, p in p1 if l == p) / len(p1)
    assert acc >= 0.85


def test_evaluation_metrics(spark):
    # FIXTURES §7: known confusion layout incl. a zero-TP class
    rows = [(1, 1)] * 4 + [(1, 2)] + [(2, 2)] * 3 + [(3, 1)] * 2  # class 3: 0 TP
    preds = spark.createDataFrame(rows, "label int, prediction int")
    m = classification_metrics(preds)
    assert m["accuracy"] == pytest.approx(7 / 10)
    ba = balanced_accuracy(preds)
    assert ba == pytest.approx((4 / 5 + 3 / 3 + 0.0) / 3)
    cm = {(r["label"], r["prediction"]): r["n"] for r in confusion_matrix(preds).collect()}
    assert cm[(1, 1)] == 4 and cm[(3, 1)] == 2 and (3, 3) not in cm


def test_metrics_counts_engine_matches_mllib(spark):
    import random

    from bigdata_spark.ml.evaluation import classification_metrics

    rng = random.Random(11)
    rows = [(rng.randint(0, 4), rng.randint(0, 4)) for _ in range(500)]
    rows += [(7, 2)] * 5  # a class that is never predicted
    df = spark.createDataFrame(rows, "label int, prediction int")
    fast = classification_metrics(df, engine="counts")
    ref = classification_metrics(df, engine="mllib")
    for k in ("accuracy", "weightedPrecision", "weightedRecall", "f1"):
        assert abs(fast[k] - ref[k]) < 1e-12, k


def test_perceptron_fixed_matches_python(spark):
    """Re-run the exact integer batch-perceptron recurrence in pure
    Python and compare every reported field."""
    from bigdata_spark.plans.mlq import (
        _PC_DIMS,
        _PC_EPOCHS,
        _PC_SCALE,
        _PC_SCALE2,
        ml_perceptron_fixed,
    )
    from bigdata_spark.sources.catalog import load_table

    sf = "/root/testdata/sf0.001"
    rows = load_table(spark, sf, "embeddings").select("embedding", "label").collect()
    data = []
    for r in rows:
        y = 1 if r["label"] % 2 == 0 else -1
        x = [
            int(round(float(v) * _PC_SCALE))
            for v in list(r["embedding"])[:_PC_DIMS]
        ]
        data.append((y, x))
    w, b = [0] * _PC_DIMS, 0
    for _ in range(_PC_EPOCHS):
        u, ub = [0] * _PC_DIMS, 0
        for y, x in data:
            if y * (sum(wi * xi for wi, xi in zip(w, x)) + b) <= 0:
                for i in range(_PC_DIMS):
                    u[i] += y * x[i]
                ub += y * _PC_SCALE2
        w = [wi + ui for wi, ui in zip(w, u)]
        b += ub
    mis = sum(
        1
        for y, x in data
        if y * (sum(wi * xi for wi, xi in zip(w, x)) + b) <= 0
    )
    got = ml_perceptron_fixed(spark, sf).collect()[0]
    assert got["n_rows"] == len(data)
    assert got["n_misclassified"] == mis
    assert got["weight_mass"] == sum(w)
    assert got["bias"] == b
    assert got["n_misclassified"] < got["n_rows"]  # it learned something


def test_conformal_coverage_guarantee(spark):
    """Split-conformal theory: coverage must land near (and in sample
    sizes this large, above) 1 - alpha - small slack."""
    from bigdata_spark.plans.mlq import ml_conformal_interval

    rows = ml_conformal_interval(spark, "/root/testdata/sf0.01").collect()
    assert len(rows) == 3
    for r in rows:
        assert r["n_train"] + 0 > 0 and r["n_cal"] > 0 and r["n_test"] > 0
        assert r["qhat"] > 0
        assert r["coverage"] >= 0.85, (r["l_returnflag"], r["coverage"])
        assert abs(r["coverage"] - r["n_covered"] / r["n_test"]) < 1e-12
