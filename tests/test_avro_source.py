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
