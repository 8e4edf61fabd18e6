"""Pure-python Avro OCF codec + block-partitioned DataSource
(sources/avroocf.py)."""

from __future__ import annotations

import os

import pytest

from bigdata_spark.sources.avroocf import (
    read_block,
    register,
    scan_blocks,
    write_ocf,
)

FIELDS = [
    ("k", "long"),
    ("name", ["null", "string"]),
    ("bal", "double"),
    ("flag", "boolean"),
]


def _rows(n):
    return [
        (i, None if i % 3 == 0 else f"n{i}", i * 0.25, i % 2 == 0) for i in range(n)
    ]


@pytest.mark.parametrize("codec", ["deflate", "null"])
def test_codec_roundtrip_blocks(tmp_path, codec):
    p = os.path.join(str(tmp_path), "t.avro")
    rows = _rows(2500)
    write_ocf(p, FIELDS, rows, codec=codec, block_rows=1000)
    blocks = scan_blocks(p)
    assert [b[1] for b in blocks] == [1000, 1000, 500]  # per-block counts
    back = [r for off, _n, _s in blocks for r in read_block(p, off)]
    assert back == rows


def test_datasource_partitions_per_block(spark, tmp_path):
    p = os.path.join(str(tmp_path), "t.avro")
    rows = _rows(900)
    write_ocf(p, FIELDS, rows, block_rows=200)
    register(spark)
    df = spark.read.format("avro_py").option("path", p).load()
    assert df.rdd.getNumPartitions() == 5  # ceil(900/200) blocks
    got = sorted(tuple(r) for r in df.collect())
    assert got == sorted(rows)
    # nullable union decodes to real NULLs
    assert df.filter("name IS NULL").count() == len([r for r in rows if r[1] is None])


def test_unsupported_type_raises(tmp_path):
    p = os.path.join(str(tmp_path), "t.avro")
    with pytest.raises(ValueError):
        write_ocf(p, [("m", {"type": "map", "values": "long"})], [({},)])


def test_partitioned_writer_roundtrip(spark, tmp_path):
    """write_ocf_partitioned: one container file per input partition,
    written executor-side; the directory reads back as one DataFrame
    with one input partition per data block."""
    from bigdata_spark.sources.avroocf import write_ocf_partitioned

    out = os.path.join(str(tmp_path), "parts")
    os.makedirs(out)
    rows = _rows(901)
    df = spark.createDataFrame(
        rows, "k long, name string, bal double, flag boolean"
    ).repartition(3)
    manifest = write_ocf_partitioned(df, out, FIELDS, block_rows=100)
    m = {r["file"]: r["n_rows"] for r in manifest.collect()}
    assert sum(m.values()) == 901
    assert len(m) == 3 and all(f.endswith(".avro") for f in m)
    assert sorted(m) == sorted(os.listdir(out))
    register(spark)
    back = spark.read.format("avro_py").option("path", out).load()
    assert sorted(tuple(r) for r in back.collect()) == sorted(rows)
    # block granularity survives the directory layout: >= ceil per file
    assert back.rdd.getNumPartitions() >= 9  # 901 rows / 100-row blocks


def test_partitioned_writer_skips_empty_partitions(spark, tmp_path):
    from bigdata_spark.sources.avroocf import write_ocf_partitioned

    out = os.path.join(str(tmp_path), "parts")
    os.makedirs(out)
    df = spark.createDataFrame(
        _rows(4), "k long, name string, bal double, flag boolean"
    ).repartition(8)
    manifest = write_ocf_partitioned(df, out, FIELDS)
    n_manifest = manifest.count()  # triggers the executor-side write
    files = sorted(os.listdir(out))
    assert n_manifest == len(files) <= 4
    register(spark)
    back = spark.read.format("avro_py").option("path", out).load()
    assert back.count() == 4
