"""Custom Python DataSource (Spark 4 DataSource API): a parquet reader
whose input partitions are the file's ROW GROUPS, streaming Arrow
RecordBatches to the JVM.

Demonstrates the full surface a production Python connector needs —
schema inference, partition planning, and the Arrow zero-copy read
path (``read`` yields RecordBatch, not Python tuples, so rows never
materialize as Python objects). At scale the partition planner is what
matters: one InputPartition per row group gives the scheduler the same
split granularity Spark's native parquet reader plans, so a TB-scale
file fans out across executors instead of serializing through one
task (the brief's 100 TB rule applied to a hand-written connector)."""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class _RowGroupPartition(InputPartition):
    def __init__(self, row_group: int) -> None:
        self.row_group = row_group


class _RowGroupReader(DataSourceReader):
    def __init__(self, path: str) -> None:
        self.path = path

    def partitions(self):
        import pyarrow.parquet as pq

        n = pq.ParquetFile(self.path).metadata.num_row_groups
        return [_RowGroupPartition(i) for i in range(max(1, n))]

    def read(self, partition: _RowGroupPartition):
        import pyarrow.parquet as pq

        f = pq.ParquetFile(self.path)
        if f.metadata.num_row_groups == 0:
            return
        table = f.read_row_group(partition.row_group)
        yield from table.to_batches()


class RowGroupParquetDataSource(DataSource):
    """``spark.read.format("rowgroup_parquet").option("path", p)``."""

    @classmethod
    def name(cls) -> str:
        return "rowgroup_parquet"

    def schema(self):
        import pyarrow.parquet as pq

        from pyspark.sql.pandas.types import from_arrow_schema

        return from_arrow_schema(pq.read_schema(self.options["path"]))

    def reader(self, schema) -> _RowGroupReader:
        return _RowGroupReader(self.options["path"])


def register(spark) -> None:
    spark.dataSource.register(RowGroupParquetDataSource)
