"""Plot-sink data prep (S8): dense confusion grid and per-class metric
table from the scalable counts DataFrame; rendering runs end-to-end on
the stdlib PNG backend when matplotlib is absent."""

from __future__ import annotations

import math

import pytest

from bigdata_spark.ml.png import read_png, viridis, write_png
from bigdata_spark.ml.visualization import (
    confusion_grid,
    per_class_metric_table,
    plot_confusion_heatmap,
    plot_per_class_bars,
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


def test_png_roundtrip(tmp_path):
    pixels = [[(255, 0, 0), (0, 255, 0)], [(0, 0, 255), (17, 34, 51)]]
    path = str(tmp_path / "rt.png")
    write_png(path, pixels)
    assert read_png(path) == pixels


def test_heatmap_renders_real_png(preds, tmp_path):
    out = str(tmp_path / "cm.png")
    assert plot_confusion_heatmap(preds, out) == out
    pix = read_png(out)
    assert len(pix) > 0 and len(pix[0]) > 0
    # grid = [[2,1,0],[1,3,0],[1,0,2]], vmax=3: cell (1,1) holds the max
    # → viridis(1.0); cell (0,2) holds 0 → viridis(0.0). Cells are 24px
    # with a 1px gridline, so sample cell centers.
    assert pix[1 * 24 + 12][1 * 24 + 12] == viridis(1.0)
    assert pix[0 * 24 + 12][2 * 24 + 12] == viridis(0.0)


def test_bars_render_real_png(preds, tmp_path):
    out = str(tmp_path / "bars.png")
    assert plot_per_class_bars(preds, out) == out
    pix = read_png(out)
    h = len(pix)
    # class 1 precision = 3/4: its bar (second group, first bar) should
    # be filled at 3/4 height and empty above
    x = 4 + 1 * (3 * 8 + 2 * 2 + 12) + 4  # margin + one group + mid-bar
    assert pix[h - 4 - 1 - 10][x] == (31, 119, 180)  # just above baseline
    assert pix[4 + 5][x] == (255, 255, 255)  # near top, above 75%
