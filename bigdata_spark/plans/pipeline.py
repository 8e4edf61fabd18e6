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

from ..ml.evaluation import (
    _confusion_counts,
    balanced_accuracy_from_counts,
    metrics_from_counts,
)
from ..ml.global_tree import GlobalProximityTree
from ..ml.local_forest import LocalProximityForest
from ..operators.preprocess import drop_all_null_rows
from ..operators.sampling import stratified_split


def _memory_snapshot(spark: SparkSession) -> dict:
    """Point-in-time memory reading (reference evaluation.py:313-347
    samples psutil around each stage; same shape here without the hard
    dependency): Python-driver RSS from stdlib ``resource`` (psutil's
    current-RSS added when available) plus the JVM's own view of every
    executor's block-manager storage memory — on local[*] that is one
    entry; on a 1000-executor cluster the same call returns all of
    them, so the report stays meaningful at scale."""
    import resource

    ru = resource.getrusage(resource.RUSAGE_SELF)
    snap: dict = {
        # ru_maxrss is KiB on Linux — peak, monotone over the process
        "driver_peak_rss_mb": round(ru.ru_maxrss / 1024.0, 1),
    }
    try:
        import psutil  # noqa: F401  (optional, parity with reference)

        snap["driver_rss_mb"] = round(
            psutil.Process().memory_info().rss / 2**20, 1
        )
    except ImportError:
        pass
    try:
        status = spark.sparkContext._jsc.sc().getExecutorMemoryStatus()
        it = status.iterator()
        max_mb = free_mb = 0.0
        n = 0
        while it.hasNext():
            kv = it.next()
            max_mb += kv._2()._1() / 2**20
            free_mb += kv._2()._2() / 2**20
            n += 1
        snap["n_executors"] = n
        snap["executor_storage_max_mb"] = round(max_mb, 1)
        snap["executor_storage_used_mb"] = round(max_mb - free_mb, 1)
    except Exception:  # py4j surface may shift across Spark versions
        snap["n_executors"] = 0
    return snap


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
    spark = df.sparkSession
    mem_start = _memory_snapshot(spark)

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
    mem_after_train = _memory_snapshot(spark)

    t0 = time.time()
    preds = m.predict(test, features_col).persist()
    preds.count()
    timings["prediction_time"] = time.time() - t0

    t0 = time.time()
    # one confusion-counts job feeds every metric (ml/evaluation.py)
    counts = _confusion_counts(preds, label_col, "prediction")
    performance = metrics_from_counts(counts)
    performance["balanced_accuracy"] = balanced_accuracy_from_counts(counts)
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
        # reference evaluation.py:313-347 parity: memory sampled at the
        # stage boundaries that matter (start, post-train, end)
        "memory": {
            "start": mem_start,
            "after_training": mem_after_train,
            "end": _memory_snapshot(spark),
        },
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
