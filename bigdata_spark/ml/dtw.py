"""Dynamic Time Warping kernels (SURVEY §2.8 U7/U8).

The reference wraps ``dtaidistance``/``fastdtw`` (distance_measures.py:
16-52); neither ships in this container, so the kernels are implemented
directly in numpy — exact O(n·m) DP, a Sakoe-Chiba banded variant (the
standard "fast enough" path), and the Euclidean upper bound that
``dtw.distance(..., only_ub=True)`` returns.

Spark surface: Arrow-batched pandas UDFs (the 10-100× path vs.
row-at-a-time Python); DTW is inherently iterative so it cannot be a
native Catalyst expression.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType


def dtw_distance(a: np.ndarray, b: np.ndarray, window: int | None = None) -> float:
    """Exact DTW distance (euclidean point cost, full DP), optional
    Sakoe-Chiba band of half-width ``window``."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    n, m = len(a), len(b)
    if n == 0 or m == 0:
        return float("inf")
    w = max(window, abs(n - m)) if window is not None else max(n, m)
    prev = np.full(m + 1, np.inf)
    prev[0] = 0.0
    for i in range(1, n + 1):
        cur = np.full(m + 1, np.inf)
        lo, hi = max(1, i - w), min(m, i + w)
        for j in range(lo, hi + 1):
            cost = (a[i - 1] - b[j - 1]) ** 2
            cur[j] = cost + min(prev[j], cur[j - 1], prev[j - 1])
        prev = cur
    return float(np.sqrt(prev[m]))


def dtw_upper_bound(a: np.ndarray, b: np.ndarray) -> float:
    """Euclidean upper bound on DTW (reference's ``only_ub=True`` path,
    distance_measures.py:35-52): valid when len(a) == len(b)."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    d = a - b
    return float(np.sqrt(np.dot(d, d)))


def dtw_distance_udf(exemplar: list[float], window: int | None = None):
    """Column function: DTW distance of an array column to a fixed
    exemplar, as an Arrow-batched pandas UDF."""
    ex = np.asarray(exemplar, dtype=np.float64)

    @F.pandas_udf(DoubleType())
    def _dtw(series: pd.Series) -> pd.Series:
        return series.apply(lambda ts: dtw_distance(np.asarray(ts), ex, window=window))

    return _dtw


def dtw_pairwise_udf(window: int | None = None):
    """pandas UDF over two array columns → DTW distance per row."""

    @F.pandas_udf(DoubleType())
    def _dtw(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(
            [dtw_distance(np.asarray(x), np.asarray(y), window=window) for x, y in zip(a, b)]
        )

    return _dtw
