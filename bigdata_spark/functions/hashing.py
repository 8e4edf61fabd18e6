"""Portable deterministic hashing + shingling for dedup/fingerprints.

``portable_hash64`` derives a 63-bit integer from an md5 prefix, so the
exact same value is computable in any engine with md5 + hex parsing
(DuckDB: ``('0x' || substr(md5(x), 1, 15))::BIGINT``) — the foundation
of oracle-checkable MinHash/SimHash. Spark's builtin ``hash``/``xxhash64``
are engine-specific; md5 is universal.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def portable_hash64(col: Column | str, seed: int = 0) -> Column:
    """63-bit deterministic hash: first 15 hex chars of md5(seed || value).

    15 hex chars = 60 bits — always positive, fits BIGINT in every
    engine. Uniform enough for MinHash/LSH banding.
    """
    payload = F.concat(F.lit(f"{seed}|"), _c(col).cast("string"))
    return F.conv(F.substring(F.md5(payload), 1, 15), 16, 10).cast("long")


def shingles(col: Column | str, n: int = 3) -> Column:
    """Word n-gram shingle set of a text column, as array<string>.

    Lowercases, splits on whitespace, forms overlapping n-grams joined
    by single spaces, dedupes. Documents shorter than n words yield the
    whole document as one shingle.
    """
    words = F.split(F.trim(F.lower(_c(col))), r"\s+")
    k = F.greatest(F.size(words) - F.lit(n - 1), F.lit(1))
    grams = F.transform(
        F.sequence(F.lit(0), k - F.lit(1)),
        lambda i: F.array_join(F.slice(words, i + F.lit(1), n), " "),
    )
    return F.array_distinct(grams)
