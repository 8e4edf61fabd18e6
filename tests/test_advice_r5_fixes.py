"""Regression tests for the round-4 ADVICE findings: NULL-transition
SCD2 boundaries, upsert-sink order-col validation + batch-wins
tiebreak, and profile_columns with hostile column names."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_scd2_null_attribute_runs_are_boundaries(spark):
    """A transition to/from NULL is a run boundary (null-SAFE compare),
    and consecutive NULLs collapse into one run."""
    from bigdata_spark.operators.scd import scd2_from_changes

    df = spark.createDataFrame(
        [
            (1, "a", "2024-01-01 00:00:00", 1),
            (1, None, "2024-01-02 00:00:00", 2),   # a -> NULL: boundary
            (1, None, "2024-01-03 00:00:00", 3),   # NULL run continues
            (1, "b", "2024-01-04 00:00:00", 4),    # NULL -> b: boundary
            (2, None, "2024-01-01 00:00:00", 5),   # first row NULL
            (2, "x", "2024-01-02 00:00:00", 6),
        ],
        "user_id long, status string, ts_s string, event_id long",
    ).withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")
    out = scd2_from_changes(df, ["user_id"], "status", "ts", "event_id")
    u1 = sorted(
        [r for r in out.collect() if r["user_id"] == 1],
        key=lambda r: r["valid_from"],
    )
    assert [r["status"] for r in u1] == ["a", None, "b"]
    assert u1[0]["valid_to"] == u1[1]["valid_from"]
    assert u1[1]["valid_to"] == u1[2]["valid_from"]
    u2 = sorted(
        [r for r in out.collect() if r["user_id"] == 2],
        key=lambda r: r["valid_from"],
    )
    assert [r["status"] for r in u2] == [None, "x"]


def test_upsert_order_cols_must_survive_projection(spark, tmp_path):
    from bigdata_spark.streaming.upsert_sink import (
        VersionedParquetTable,
        keyed_upsert_batch,
    )

    table = VersionedParquetTable(spark, str(tmp_path / "t"))
    batch = spark.createDataFrame(
        [(1, 10, "x")], "k long, seq long, v string"
    )
    with pytest.raises(ValueError, match="order_cols"):
        # 'seq' is not kept in key_cols+value_cols -> next batch would
        # AnalysisException; must fail fast instead.
        keyed_upsert_batch(table, batch, ["k"], ["seq"], ["v"])


def test_upsert_equal_order_ties_resolve_batch_wins(spark, tmp_path):
    from bigdata_spark.streaming.upsert_sink import (
        VersionedParquetTable,
        keyed_upsert_batch,
    )

    table = VersionedParquetTable(spark, str(tmp_path / "t"))
    b1 = spark.createDataFrame([(1, 5, "old")], "k long, seq long, v string")
    keyed_upsert_batch(table, b1, ["k"], [F.col("seq").desc()], ["seq", "v"])
    # same key, same seq -> deterministic last-writer-wins: batch row
    b2 = spark.createDataFrame([(1, 5, "new")], "k long, seq long, v string")
    keyed_upsert_batch(table, b2, ["k"], [F.col("seq").desc()], ["seq", "v"])
    rows = table.read().collect()
    assert len(rows) == 1 and rows[0]["v"] == "new"


def test_profile_columns_hostile_names(spark):
    from bigdata_spark.operators.profile import profile_columns

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (2, "c")],
        ["weird col's", "it\"s.dotted"],
    )
    out = {
        r["column_name"]: r
        for r in profile_columns(df, ["weird col's", 'it"s.dotted']).collect()
    }
    assert out["weird col's"]["n_distinct"] == 2
    assert out["weird col's"]["n_nulls"] == 0
    assert out['it"s.dotted']["n_nulls"] == 1
    assert out['it"s.dotted']["min_value"] == "a"
