"""Distance-kernel tests (FIXTURES.md §5; SURVEY §2.8 U6/U9/U10/U1)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from bigdata_spark.functions.distances import (
    cosine_distance,
    cosine_similarity,
    dot_product,
    euclidean_distance,
    manhattan_distance,
    nearest_exemplar_index,
)


@pytest.fixture(scope="module")
def ts_df(spark):
    # FIXTURES §5 dummy shape: time_series + exemplars
    rows = [
        (1, [1.0, 2.0, 3.0, 4.0], [[1.0, 2.0, 3.0, 4.0], [2.0, 3.0, 4.0, 5.0]]),
        (2, [0.0, 0.0, 0.0, 0.0], [[1.0, 1.0, 1.0, 1.0], [3.0, 3.0, 3.0, 3.0]]),
    ]
    return spark.createDataFrame(
        rows, "id int, time_series array<double>, exemplars array<array<double>>"
    )


def test_manhattan_hand_checked(ts_df):
    out = (
        ts_df.select(
            "id",
            *[
                manhattan_distance("time_series", F.col("exemplars")[i]).alias(f"exemplar_{i}")
                for i in range(2)
            ],
        )
        .orderBy("id")
        .collect()
    )
    # row 1: identical → 0; shifted by 1 in 4 dims → 4
    assert out[0]["exemplar_0"] == 0.0
    assert out[0]["exemplar_1"] == 4.0
    # row 2: |0-1|*4 = 4 ; |0-3|*4 = 12
    assert out[1]["exemplar_0"] == 4.0
    assert out[1]["exemplar_1"] == 12.0


def test_euclidean_and_dot(ts_df):
    r = ts_df.filter(F.col("id") == 2).select(
        euclidean_distance("time_series", F.col("exemplars")[0]).alias("e"),
        dot_product(F.col("exemplars")[0], F.col("exemplars")[1]).alias("d"),
    ).first()
    assert r["e"] == pytest.approx(2.0)  # sqrt(4*1)
    assert r["d"] == pytest.approx(12.0)  # 1*3*4


def test_cosine(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], [0.0, 1.0]), ([1.0, 1.0], [2.0, 2.0]), ([0.0, 0.0], [1.0, 1.0])],
        "a array<double>, b array<double>",
    )
    out = df.select(
        cosine_similarity("a", "b").alias("sim"), cosine_distance("a", "b").alias("dist")
    ).collect()
    assert out[0]["sim"] == pytest.approx(0.0)
    assert out[1]["sim"] == pytest.approx(1.0)
    assert out[2]["sim"] == 0.0  # zero-norm guard
    assert out[1]["dist"] == pytest.approx(0.0)


def test_nearest_exemplar_index(ts_df):
    out = ts_df.select("id", nearest_exemplar_index("time_series", "exemplars").alias("ix")).orderBy("id").collect()
    assert out[0]["ix"] == 0  # exact match wins
    assert out[1]["ix"] == 0  # closer of the two

    # tie → lowest index (numpy argmin parity)
    import pyspark.sql.functions as F2

    spark = ts_df.sparkSession
    tie = spark.createDataFrame(
        [([0.0, 0.0], [[1.0, 0.0], [0.0, 1.0]])], "ts array<double>, ex array<array<double>>"
    )
    assert tie.select(nearest_exemplar_index("ts", "ex").alias("ix")).first()["ix"] == 0


def test_euclidean_matches_numpy(spark):
    import numpy as np

    a = [0.3, -1.2, 5.5, 2.2]
    b = [1.0, 0.0, -2.0, 4.4]
    expected = float(np.sqrt(np.sum((np.array(a) - np.array(b)) ** 2)))
    df = spark.createDataFrame([(a, b)], "a array<double>, b array<double>")
    got = df.select(euclidean_distance("a", "b").alias("e")).first()["e"]
    assert got == pytest.approx(expected, rel=1e-12)
