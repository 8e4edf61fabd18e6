"""Avro Object Container File source — pure-python codec + a Spark 4
Python DataSource, for containers without the spark-avro package.

The OCF layout (public Apache Avro spec): magic ``Obj\\x01``, a
metadata map carrying the writer schema JSON and codec, a 16-byte sync
marker, then data blocks of ``(record_count, byte_size, payload,
sync)`` where the payload is raw-deflate when ``avro.codec=deflate``.
Records are field-concatenated primitives: zigzag-varint longs,
length-prefixed utf8 strings/bytes, little-endian IEEE doubles,
1-byte booleans; nullable fields are ``["null", T]`` unions prefixed
by a varint branch index.

Scale shape: the DataSource's partition planner walks the block
headers (seek + two varints per block, no payload reads) and emits one
InputPartition per data block — the same split granularity the native
Avro reader plans, so a large file fans out across executors instead
of serializing through one task (the row-group-parquet connector's
rule applied to Avro). ``read`` yields Arrow RecordBatches; rows never
materialize as Python objects on the way to the JVM.

Supported types: null, boolean, int, long, float, double, string,
bytes, and ``["null", T]`` unions — the full primitive surface of the
engine's tables. Complex types raise loudly.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

_MAGIC = b"Obj\x01"
_SYNC = bytes(range(16))  # deterministic marker: fixtures are reproducible

_PA_TYPES = {
    "long": "int64",
    "int": "int32",
    "double": "float64",
    "float": "float32",
    "string": "string",
    "boolean": "bool_",
    "bytes": "binary",
}


# ---------------------------------------------------------------- primitives


def _zigzag_encode(n: int) -> bytes:
    z = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag_decode(buf: bytes, pos: int) -> tuple[int, int]:
    shift = acc = 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), pos


def _encode_value(typ, v) -> bytes:
    if isinstance(typ, list):  # ["null", T]
        if v is None:
            return _zigzag_encode(typ.index("null"))
        branch = 1 if typ[0] == "null" else 0
        return _zigzag_encode(branch) + _encode_value(typ[branch], v)
    if typ == "null":
        return b""
    if typ == "boolean":
        return b"\x01" if v else b"\x00"
    if typ in ("long", "int"):
        return _zigzag_encode(int(v))
    if typ == "double":
        return struct.pack("<d", float(v))
    if typ == "float":
        return struct.pack("<f", float(v))
    if typ in ("string", "bytes"):
        raw = v.encode("utf-8") if typ == "string" else bytes(v)
        return _zigzag_encode(len(raw)) + raw
    raise ValueError(f"unsupported Avro type {typ!r}")


def _decode_value(typ, buf: bytes, pos: int):
    if isinstance(typ, list):
        branch, pos = _zigzag_decode(buf, pos)
        if typ[branch] == "null":
            return None, pos
        return _decode_value(typ[branch], buf, pos)
    if typ == "null":
        return None, pos
    if typ == "boolean":
        return buf[pos] != 0, pos + 1
    if typ in ("long", "int"):
        return _zigzag_decode(buf, pos)
    if typ == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if typ == "float":
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if typ in ("string", "bytes"):
        n, pos = _zigzag_decode(buf, pos)
        raw = buf[pos : pos + n]
        return (raw.decode("utf-8") if typ == "string" else bytes(raw)), pos + n
    raise ValueError(f"unsupported Avro type {typ!r}")


# ------------------------------------------------------------------- writer


def write_ocf(
    path: str,
    fields: list[tuple[str, object]],
    rows: list[tuple],
    codec: str = "deflate",
    block_rows: int = 1000,
) -> None:
    """Write rows as an Avro OCF. ``fields`` is [(name, avro_type)];
    avro_type is a primitive name or ["null", primitive]."""
    schema = {
        "type": "record",
        "name": "row",
        "fields": [{"name": n, "type": t} for n, t in fields],
    }
    meta = {
        "avro.schema": json.dumps(schema).encode(),
        "avro.codec": codec.encode(),
    }
    out = io.BytesIO()
    out.write(_MAGIC)
    out.write(_zigzag_encode(len(meta)))
    for k, v in meta.items():
        kb = k.encode()
        out.write(_zigzag_encode(len(kb)) + kb)
        out.write(_zigzag_encode(len(v)) + v)
    out.write(_zigzag_encode(0))
    out.write(_SYNC)
    for start in range(0, len(rows), block_rows):
        chunk = rows[start : start + block_rows]
        payload = b"".join(
            b"".join(_encode_value(t, v) for (_n, t), v in zip(fields, row))
            for row in chunk
        )
        if codec == "deflate":  # raw RFC1951, no zlib header (Avro spec)
            c = zlib.compressobj(6, zlib.DEFLATED, -15)
            payload = c.compress(payload) + c.flush()
        elif codec != "null":
            raise ValueError(f"unsupported codec {codec!r}")
        out.write(_zigzag_encode(len(chunk)))
        out.write(_zigzag_encode(len(payload)))
        out.write(payload)
        out.write(_SYNC)
    with open(path, "wb") as f:
        f.write(out.getvalue())


def write_ocf_partitioned(
    df,
    out_dir: str,
    fields: list[tuple[str, object]],
    codec: str = "deflate",
    block_rows: int = 1000,
):
    """Distributed OCF sink: every input partition writes its own
    complete container file ``part-<pid>.avro`` into ``out_dir`` from
    the executor that holds it — the rows never pass through the
    driver (the parquet writer's layout rule applied to Avro; on a
    cluster ``out_dir`` is shared storage, exactly like any other file
    sink). Returns the per-file manifest DataFrame (file, n_rows) —
    partition-count-sized, safe to collect at any SF."""
    import pandas as pd

    from pyspark import TaskContext

    names = [n for n, _t in fields]

    def _write(batches):
        rows: list[tuple] = []
        for pdf in batches:
            clean = pdf[names].astype(object).where(pdf[names].notna(), None)
            rows.extend(clean.itertuples(index=False, name=None))
        if not rows:
            return
        pid = TaskContext.get().partitionId()
        path = os.path.join(out_dir, f"part-{pid:05d}.avro")
        write_ocf(path, fields, rows, codec=codec, block_rows=block_rows)
        yield pd.DataFrame({"file": [os.path.basename(path)], "n_rows": [len(rows)]})

    return df.mapInPandas(_write, "file string, n_rows long")


# ------------------------------------------------------------------- reader


def _read_header(f) -> tuple[list[tuple[str, object]], str, int]:
    """-> (fields, codec, data_start_offset)."""
    head = f.read(4)
    if head != _MAGIC:
        raise ValueError("not an Avro object container file")
    buf = f.read(1 << 20)  # metadata fits comfortably
    pos = 0
    meta: dict[str, bytes] = {}
    while True:
        count, pos = _zigzag_decode(buf, pos)
        if count == 0:
            break
        if count < 0:  # block with explicit byte size
            _size, pos = _zigzag_decode(buf, pos)
            count = -count
        for _ in range(count):
            n, pos = _zigzag_decode(buf, pos)
            key = buf[pos : pos + n].decode()
            pos += n
            n, pos = _zigzag_decode(buf, pos)
            meta[key] = buf[pos : pos + n]
            pos += n
    pos += 16  # sync marker
    schema = json.loads(meta["avro.schema"])
    if schema.get("type") != "record":
        raise ValueError("only record-schema OCFs are supported")
    fields = [(fl["name"], fl["type"]) for fl in schema["fields"]]
    codec = meta.get("avro.codec", b"null").decode()
    return fields, codec, 4 + pos


def scan_blocks(path: str) -> list[tuple[int, int, int]]:
    """Block index without reading payloads: [(offset, n_records,
    payload_size)] — the partition planner's input."""
    blocks = []
    with open(path, "rb") as f:
        _fields, _codec, pos = _read_header(f)
        size = os.fstat(f.fileno()).st_size
        while pos < size:
            f.seek(pos)
            head = f.read(20)  # two varints fit in <= 20 bytes
            if len(head) < 2:
                break
            n, p = _zigzag_decode(head, 0)
            nbytes, p = _zigzag_decode(head, p)
            blocks.append((pos, n, nbytes))
            pos = pos + p + nbytes + 16  # payload + sync
    return blocks


def read_block(path: str, offset: int) -> list[tuple]:
    """Decode one data block into Python tuples."""
    with open(path, "rb") as f:
        fields, codec, _ = _read_header(f)
        f.seek(offset)
        head = f.read(20)
        n, p = _zigzag_decode(head, 0)
        nbytes, p = _zigzag_decode(head, p)
        f.seek(offset + p)
        payload = f.read(nbytes)
    if codec == "deflate":
        payload = zlib.decompress(payload, -15)
    elif codec != "null":
        raise ValueError(f"unsupported codec {codec!r}")
    rows, pos = [], 0
    for _ in range(n):
        row = []
        for _name, typ in fields:
            v, pos = _decode_value(typ, payload, pos)
            row.append(v)
        rows.append(tuple(row))
    return rows


def _arrow_schema(fields):
    import pyarrow as pa

    def one(t):
        base = t[1] if isinstance(t, list) else t  # ["null", T] -> T
        if isinstance(base, list) or base not in _PA_TYPES:
            raise ValueError(f"unsupported Avro type {t!r}")
        return getattr(pa, _PA_TYPES[base])()

    return pa.schema([(n, one(t)) for n, t in fields])


# Spark 4 Python DataSource ---------------------------------------------------

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


def _resolve_files(path: str) -> list[str]:
    """A path may be one OCF or a directory of ``*.avro`` part-files
    (the partitioned writer's layout)."""
    if os.path.isdir(path):
        return sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith(".avro")
        )
    return [path]


class _BlockPartition(InputPartition):
    def __init__(self, file: str, offset: int) -> None:
        self.file = file
        self.offset = offset


class _AvroReader(DataSourceReader):
    def __init__(self, path: str) -> None:
        self.path = path

    def partitions(self):
        parts = [
            _BlockPartition(f, off)
            for f in _resolve_files(self.path)
            for off, _n, _s in scan_blocks(f)
        ]
        return parts or [_BlockPartition(self.path, -1)]

    def read(self, partition: _BlockPartition):
        import pyarrow as pa

        if partition.offset < 0:
            return
        with open(partition.file, "rb") as f:
            fields, _codec, _ = _read_header(f)
        rows = read_block(partition.file, partition.offset)
        schema = _arrow_schema(fields)
        cols = list(zip(*rows)) if rows else [[] for _ in fields]
        batch = pa.RecordBatch.from_arrays(
            [pa.array(c, type=schema.field(i).type) for i, c in enumerate(cols)],
            schema=schema,
        )
        yield batch


class AvroOCFDataSource(DataSource):
    """``spark.read.format("avro_py").option("path", p)``."""

    @classmethod
    def name(cls) -> str:
        return "avro_py"

    def schema(self):
        from pyspark.sql.pandas.types import from_arrow_schema

        first = _resolve_files(self.options["path"])[0]
        with open(first, "rb") as f:
            fields, _codec, _ = _read_header(f)
        return from_arrow_schema(_arrow_schema(fields))

    def reader(self, schema) -> _AvroReader:
        return _AvroReader(self.options["path"])


def register(spark) -> None:
    spark.dataSource.register(AvroOCFDataSource)
