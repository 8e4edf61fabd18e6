"""Deletion-vector manifest primitives: positional deletes mask rows
without rewriting data files; DV-free snapshots read unchanged."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from bigdata_spark.sources.manifest import (
    commit_snapshot,
    file_key_col,
    list_data_files,
    read_snapshot,
    read_snapshot_with_deletes,
    snapshot_delete_files,
)


def _stage(spark, tmp_path, n=100, files=4):
    base = os.path.join(str(tmp_path), "t")
    (
        spark.range(0, n)
        .select(F.col("id"), (F.col("id") * 3 % 7).alias("v"))
        .repartition(files)
        .write.parquet(base)
    )
    data = list_data_files(base)
    commit_snapshot(base, 1, data)
    return base, data


def test_dv_masks_exact_positions(spark, tmp_path):
    base, data = _stage(spark, tmp_path)
    v1 = spark.read.option("basePath", base).parquet(*data)
    dv_dir = os.path.join(str(tmp_path), "dv")
    (
        v1.filter(F.col("id") % 10 == 3)
        .select(
            file_key_col(base).alias("file_key"),
            F.col("_metadata.row_index").alias("pos"),
        )
        .repartition(1)
        .write.parquet(dv_dir)
    )
    dvs = list_data_files(dv_dir)
    commit_snapshot(base, 2, data, delete_files=dvs)

    assert snapshot_delete_files(base, 2) == dvs
    got = sorted(
        r["id"] for r in read_snapshot_with_deletes(spark, base, 2).collect()
    )
    assert got == [i for i in range(100) if i % 10 != 3]
    # v1 is untouched — time travel still sees every row
    assert read_snapshot(spark, base, 1).count() == 100
    # no data file was rewritten
    assert set(list_data_files(base)) == set(data)


def test_snapshot_without_dvs_reads_plain(spark, tmp_path):
    base, data = _stage(spark, tmp_path, n=30, files=2)
    a = read_snapshot_with_deletes(spark, base, 1)
    b = read_snapshot(spark, base, 1)
    assert sorted(r["id"] for r in a.collect()) == sorted(
        r["id"] for r in b.collect()
    )
    assert a.columns == b.columns
