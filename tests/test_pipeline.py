"""End-to-end pipeline + partition-sweep tests (reference §3.1)."""

from __future__ import annotations

import json

import numpy as np

from bigdata_spark.plans.pipeline import run_partition_sweep, run_pipeline


def _clusters(spark, n_per=40):
    rng = np.random.default_rng(3)
    rows = []
    for label, c in [(1, 0.0), (2, 6.0), (3, 12.0)]:
        for _ in range(n_per):
            rows.append((label, [c + rng.uniform(-0.5, 0.5), c + rng.uniform(-0.5, 0.5)]))
    return spark.createDataFrame(rows, "label int, features array<double>")


def test_run_pipeline_local(spark):
    rep = run_pipeline(_clusters(spark), model="local", num_partitions=3)
    assert rep["rows"]["train"] + rep["rows"]["test"] == rep["rows"]["total"] == 120
    assert rep["performance"]["accuracy"] > 0.9
    assert rep["complexity"]["n_trees"] == 3
    assert all(t >= 0 for t in rep["timing"].values())


def test_partition_sweep_report(spark, tmp_path):
    p = str(tmp_path / "report.json")
    reports = run_partition_sweep(
        _clusters(spark), [2, 4], model="local", report_path=p
    )
    assert set(reports) == {"2", "4"}
    assert reports["2"]["speedup"] == 1.0
    on_disk = json.load(open(p))
    assert on_disk["4"]["performance"]["accuracy"] > 0.9
