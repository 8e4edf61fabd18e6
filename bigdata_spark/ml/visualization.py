"""Plot sink (SURVEY §2.1 S8; reference code/src/visualization.py:6-81 —
confusion-matrix heatmap + per-class metric bars to PNG/PDF).

The data preparation (dense confusion grid, per-class metric table) is
real Spark→driver code and unit-tested; the actual rendering is gated
behind an import-try because matplotlib is not available in every
deployment — callers get the prepared arrays either way and a clear
error only if they ask for pixels without the library."""

from __future__ import annotations

from pyspark.sql import DataFrame

try:  # pragma: no cover - environment-dependent
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    HAVE_MPL = True
except ImportError:  # pragma: no cover
    HAVE_MPL = False


def confusion_grid(
    preds: DataFrame, label_col: str = "label", pred_col: str = "prediction"
) -> tuple[list[int], list[list[int]]]:
    """Dense (classes, matrix) from the scalable counts table — the
    collect is bounded by classes², never by rows."""
    from .evaluation import confusion_matrix

    rows = confusion_matrix(preds, label_col, pred_col).collect()
    classes = sorted({r["label"] for r in rows} | {r["prediction"] for r in rows})
    ix = {c: i for i, c in enumerate(classes)}
    grid = [[0] * len(classes) for _ in classes]
    for r in rows:
        grid[ix[r["label"]]][ix[r["prediction"]]] = r["n"]
    return classes, grid


def plot_confusion_heatmap(
    preds: DataFrame,
    out_path: str,
    label_col: str = "label",
    pred_col: str = "prediction",
) -> str:
    """Confusion-matrix heatmap → PNG (reference visualization.py:6-39)."""
    classes, grid = confusion_grid(preds, label_col, pred_col)
    if not HAVE_MPL:
        raise NotImplementedError(
            "matplotlib not installed — confusion_grid() gives the data; "
            "install matplotlib for rendering"
        )
    fig, ax = plt.subplots(figsize=(6, 5))
    im = ax.imshow(grid, cmap="viridis")
    ax.set_xticks(range(len(classes)), labels=[str(c) for c in classes])
    ax.set_yticks(range(len(classes)), labels=[str(c) for c in classes])
    ax.set_xlabel("prediction")
    ax.set_ylabel("label")
    fig.colorbar(im)
    fig.tight_layout()
    fig.savefig(out_path)
    plt.close(fig)
    return out_path


def per_class_metric_table(
    preds: DataFrame, label_col: str = "label", pred_col: str = "prediction"
) -> list[dict]:
    """Per-class precision/recall/F1 rows (reference
    visualization.py:41-81 feeds these to a bar chart) — computed from
    the counts table, one Spark job."""
    classes, grid = confusion_grid(preds, label_col, pred_col)
    out = []
    n = len(classes)
    for i, cls in enumerate(classes):
        tp = grid[i][i]
        actual = sum(grid[i][j] for j in range(n))
        predicted = sum(grid[j][i] for j in range(n))
        p = tp / predicted if predicted else 0.0
        r = tp / actual if actual else 0.0
        f1 = 2 * p * r / (p + r) if p + r else 0.0
        out.append(
            {"class": cls, "precision": p, "recall": r, "f1": f1, "support": actual}
        )
    return out


def plot_per_class_bars(
    preds: DataFrame,
    out_path: str,
    label_col: str = "label",
    pred_col: str = "prediction",
) -> str:
    """Per-class P/R/F1 grouped bars → PNG (reference :41-81)."""
    table = per_class_metric_table(preds, label_col, pred_col)
    if not HAVE_MPL:
        raise NotImplementedError(
            "matplotlib not installed — per_class_metric_table() gives the data"
        )
    fig, ax = plt.subplots(figsize=(8, 4))
    xs = range(len(table))
    w = 0.27
    for off, metric in ((-w, "precision"), (0.0, "recall"), (w, "f1")):
        ax.bar([x + off for x in xs], [t[metric] for t in table], width=w, label=metric)
    ax.set_xticks(list(xs), labels=[str(t["class"]) for t in table])
    ax.set_ylim(0, 1)
    ax.legend()
    fig.tight_layout()
    fig.savefig(out_path)
    plt.close(fig)
    return out_path
