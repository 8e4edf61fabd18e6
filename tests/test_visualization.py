"""Plot-sink data prep (S8): dense confusion grid and per-class metric
table from the scalable counts DataFrame; rendering is gated on
matplotlib and skipped when absent."""

from __future__ import annotations

import math

import pytest

from bigdata_spark.ml.visualization import (
    HAVE_MPL,
    confusion_grid,
    per_class_metric_table,
    plot_confusion_heatmap,
)


@pytest.fixture()
def preds(spark):
    rows = [
        (0, 0), (0, 0), (0, 1),
        (1, 1), (1, 1), (1, 1), (1, 0),
        (2, 2), (2, 2), (2, 0),
    ]
    return spark.createDataFrame(rows, "label int, prediction int")


def test_confusion_grid(preds):
    classes, grid = confusion_grid(preds)
    assert classes == [0, 1, 2]
    assert grid == [[2, 1, 0], [1, 3, 0], [1, 0, 2]]


def test_per_class_metrics(preds):
    table = {t["class"]: t for t in per_class_metric_table(preds)}
    assert table[0]["support"] == 3
    assert math.isclose(table[0]["recall"], 2 / 3)
    assert math.isclose(table[0]["precision"], 2 / 4)
    assert math.isclose(table[1]["precision"], 3 / 4)
    assert math.isclose(table[2]["recall"], 2 / 3)


def test_render_gated(preds, tmp_path):
    out = str(tmp_path / "cm.png")
    if HAVE_MPL:
        assert plot_confusion_heatmap(preds, out) == out
    else:
        with pytest.raises(NotImplementedError):
            plot_confusion_heatmap(preds, out)
