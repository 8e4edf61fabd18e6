"""Schema'd scans: parquet (primary), CSV/TSV (parity with the reference).

The reference reads CSV with an explicitly declared 141-column StructType
(reference code/src/data_ingestion.py:45-59) and validates non-emptiness
with ``take(1)`` (data_ingestion.py:67-71). We keep both behaviors:
explicit schemas (never inference scans — an extra full pass at 100 TB)
and a cheap emptiness guard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import DoubleType, IntegerType, StructField, StructType


class EmptyInputError(ValueError):
    pass


def require_nonempty(df: DataFrame, what: str = "input") -> DataFrame:
    """Raise if the DataFrame has no rows (reference data_ingestion.py:67-71).

    Uses ``head(1)`` — O(1 partition), never a full count.
    """
    if not df.head(1):
        raise EmptyInputError(f"{what} has no rows")
    return df


def read_parquet(spark: SparkSession, path: str, columns: list[str] | None = None) -> DataFrame:
    """Parquet scan; pass ``columns`` to prune at the scan (ReadSchema)."""
    df = spark.read.parquet(path)
    if columns:
        df = df.select(*columns)
    return df


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    header: bool = True,
    sep: str = ",",
) -> DataFrame:
    """CSV scan with an explicit schema (no inference pass at scale)."""
    reader = spark.read.option("header", header).option("sep", sep)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.csv(path)


def read_tsv(spark: SparkSession, path: str, schema: StructType | None = None, header: bool = False) -> DataFrame:
    """TSV variant (reference alt path, SURVEY §2.1 S2)."""
    return read_csv(spark, path, schema=schema, header=header, sep="\t")


def wide_series_schema(n_features: int, label_col: str = "label") -> StructType:
    """Schema for a wide time-series table: label + _c1.._cN doubles.

    Parity with the reference's declared ECG5000 schema
    (code/src/data_ingestion.py:45-52).
    """
    fields = [StructField(label_col, IntegerType(), True)]
    fields += [StructField(f"_c{i}", DoubleType(), True) for i in range(1, n_features + 1)]
    return StructType(fields)
