"""End-to-end experiment pipeline (reference controller_loop.py §3.1):
ingest → stats/split → preprocess → train → predict → evaluate →
report, looped over partition counts for speedup analysis.

Spark-first differences from the reference:
- stratified split is one rand pass, not an all-columns anti-join,
- local training is applyInPandas, not an RDD hop,
- the report is the same nested shape (performance/timing/complexity →
  JSON sink, S7 parity with evaluation.py:313-347).
"""

from __future__ import annotations

import json
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..ml.evaluation import balanced_accuracy, classification_metrics
from ..ml.global_tree import GlobalProximityTree
from ..ml.local_forest import LocalProximityForest
from ..operators.preprocess import drop_all_null_rows
from ..operators.sampling import stratified_split


def run_pipeline(
    df: DataFrame,
    model: str = "local",
    num_partitions: int = 4,
    n_splitters: int = 3,
    max_depth: int = 10,
    train_fraction: float = 0.8,
    seed: int = 42,
    label_col: str = "label",
    features_col: str = "features",
) -> dict:
    """One experiment iteration; returns the report dict."""
    timings: dict[str, float] = {}

    t0 = time.time()
    df = drop_all_null_rows(df)
    n_rows = df.count()
    timings["ingestion_time"] = time.time() - t0

    t0 = time.time()
    train, test = stratified_split(df, label_col, train_fraction, seed=seed)
    train = train.persist()
    test = test.persist()
    n_train, n_test = train.count(), test.count()
    timings["split_time"] = time.time() - t0

    t0 = time.time()
    complexity: dict[str, float] = {}
    if model == "local":
        m = LocalProximityForest(
            num_partitions=num_partitions, n_splitters=n_splitters,
            max_depth=max_depth, seed=seed,
        ).fit(train, label_col, features_col)
        complexity["n_trees"] = len(m.trees)
    else:
        m = GlobalProximityTree(
            n_splitters=n_splitters, max_depth=max_depth, seed=seed
        ).fit(train, label_col, features_col)
        complexity["depth"] = m.depth
        complexity["n_nodes"] = len(m.nodes)
    timings["training_time"] = time.time() - t0

    t0 = time.time()
    preds = m.predict(test, features_col).persist()
    preds.count()
    timings["prediction_time"] = time.time() - t0

    t0 = time.time()
    performance = classification_metrics(preds, label_col)
    performance["balanced_accuracy"] = balanced_accuracy(preds, label_col)
    timings["evaluation_time"] = time.time() - t0

    train.unpersist()
    test.unpersist()
    preds.unpersist()
    return {
        "model": model,
        "num_partitions": num_partitions,
        "rows": {"total": n_rows, "train": n_train, "test": n_test},
        "performance": {k: round(v, 6) for k, v in performance.items()},
        "timing": {k: round(v, 3) for k, v in timings.items()},
        "complexity": complexity,
    }


def run_partition_sweep(
    df: DataFrame,
    partition_counts: list[int],
    model: str = "local",
    report_path: str | None = None,
    **kwargs,
) -> dict:
    """Reference controller loop (controller_loop.py:135-158): sweep
    partition counts, accumulate one report per iteration, compute
    speedup vs. the first iteration, optionally JSON-sink (S7)."""
    reports: dict[str, dict] = {}
    for n in partition_counts:
        reports[str(n)] = run_pipeline(df, model=model, num_partitions=n, **kwargs)
    base = reports[str(partition_counts[0])]["timing"]["training_time"]
    for n in partition_counts:
        t = reports[str(n)]["timing"]["training_time"]
        reports[str(n)]["speedup"] = round(base / t, 3) if t > 0 else None
    if report_path:
        with open(report_path, "w") as f:
            json.dump(reports, f, indent=2)
    return reports
