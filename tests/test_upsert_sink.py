"""Versioned-directory + commit-marker upsert sink
(streaming/upsert_sink.py): the cluster-safe replacement for the
driver-local stage-and-rename swap. Covers the merge semantics across
two batches through an explicit shared target dir, and the crash
contract — a version directory written WITHOUT a marker flip (the
simulated mid-swap failure) must leave readers on the old committed
snapshot."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_spark.streaming.upsert_sink import (
    VersionedParquetTable,
    keyed_upsert_batch,
)


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts long, event_id long, event_type string, value double"
    )


def _merge(table, batch):
    keyed_upsert_batch(
        table,
        batch,
        key_cols=["user_id"],
        order_cols=[F.desc("ts"), F.desc("event_id")],
        value_cols=["ts", "event_id", "event_type", "value"],
    )


def test_two_batch_merge_keeps_latest_per_key(spark, tmp_path):
    root = str(tmp_path / "shared" / "upsert_state")
    table = VersionedParquetTable(spark, root)
    assert table.current_version() is None
    assert table.read() is None

    _merge(table, _batch(spark, [(1, 10, 100, "view", 1.0), (2, 10, 101, "click", 2.0),
                                 (1, 20, 102, "click", 3.0)]))
    assert table.current_version() == 0
    got = {r["user_id"]: (r["ts"], r["event_type"]) for r in table.read().collect()}
    assert got == {1: (20, "click"), 2: (10, "click")}

    # second batch: newer row for user 1, older (ignored) row for user 2,
    # brand-new user 3
    _merge(table, _batch(spark, [(1, 30, 103, "purchase", 4.0),
                                 (2, 5, 104, "view", 0.5),
                                 (3, 1, 105, "signup", 9.0)]))
    assert table.current_version() == 1
    got = {r["user_id"]: (r["ts"], r["event_type"]) for r in table.read().collect()}
    assert got == {1: (30, "purchase"), 2: (10, "click"), 3: (1, "signup")}


def test_mid_swap_failure_leaves_old_version_visible(spark, tmp_path):
    root = str(tmp_path / "upsert_state")
    table = VersionedParquetTable(spark, root)
    _merge(table, _batch(spark, [(1, 10, 100, "view", 1.0)]))
    committed = table.current_version()

    # simulate a crash between the data write and the marker flip:
    # the next version's directory exists, but _LATEST was never updated
    _batch(spark, [(1, 99, 999, "crash", 0.0)]).write.mode("overwrite").parquet(
        table._version_dir(committed + 1)
    )

    # readers must still resolve the committed snapshot
    assert table.current_version() == committed
    rows = table.read().collect()
    assert [(r["user_id"], r["ts"]) for r in rows] == [(1, 10)]

    # and a subsequent publish recovers by overwriting the orphan
    _merge(table, _batch(spark, [(1, 50, 200, "click", 2.0)]))
    assert table.current_version() == committed + 1
    got = {r["user_id"]: r["ts"] for r in table.read().collect()}
    assert got == {1: 50}


def test_vacuum_keeps_current_and_previous(spark, tmp_path):
    root = str(tmp_path / "vac_state")
    table = VersionedParquetTable(spark, root, keep_versions=2)
    for i in range(4):
        _merge(table, _batch(spark, [(1, 10 + i, 100 + i, "view", 1.0)]))
    assert table.current_version() == 3
    kept = sorted(
        p.name for p in (tmp_path / "vac_state").iterdir() if p.name.startswith("state_v")
    )
    assert kept == ["state_v2", "state_v3"]
    # the previous version is still readable for in-flight readers
    prev = spark.read.parquet(table._version_dir(2))
    assert prev.count() == 1


def test_time_travel_reads_retained_versions(spark, tmp_path):
    import pytest

    from bigdata_spark.streaming.upsert_sink import VersionedParquetTable

    t = VersionedParquetTable(spark, str(tmp_path / "tt"), keep_versions=2)
    t.publish(spark.createDataFrame([(1, "a")], "k long, v string"))
    t.publish(spark.createDataFrame([(1, "b")], "k long, v string"))
    assert t.versions() == [0, 1]
    assert t.read_version(0).first()["v"] == "a"   # time travel
    assert t.read().first()["v"] == "b"            # committed head
    t.publish(spark.createDataFrame([(1, "c")], "k long, v string"))
    # vacuum keeps current + previous only; v0 must refuse, not misread
    assert t.versions() == [1, 2]
    with pytest.raises(ValueError):
        t.read_version(0)
