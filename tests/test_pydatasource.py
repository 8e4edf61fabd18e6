"""Custom Python DataSource: partition planning + content parity."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from bigdata_spark.sources.pydatasource import _RowGroupReader, register


def test_partitions_follow_row_groups(tmp_path):
    path = str(tmp_path / "multi.parquet")
    table = pa.table({"a": list(range(100)), "b": [f"s{i}" for i in range(100)]})
    pq.write_table(table, path, row_group_size=16)  # 7 row groups
    reader = _RowGroupReader(path)
    parts = reader.partitions()
    assert len(parts) == pq.ParquetFile(path).metadata.num_row_groups >= 7
    # each partition reads exactly its row group's rows, as Arrow batches
    seen = []
    for p in parts:
        for batch in reader.read(p):
            seen.extend(batch.column("a").to_pylist())
    assert sorted(seen) == list(range(100))


def test_datasource_roundtrip(spark, tmp_path):
    path = str(tmp_path / "t.parquet")
    table = pa.table({"k": [1, 2, 3], "v": ["x", "y", "z"]})
    pq.write_table(table, path, row_group_size=2)
    register(spark)
    df = spark.read.format("rowgroup_parquet").option("path", path).load()
    got = sorted((r["k"], r["v"]) for r in df.collect())
    assert got == [(1, "x"), (2, "y"), (3, "z")]
    assert df.rdd.getNumPartitions() == 2  # one per row group
    assert os.path.exists(path)
