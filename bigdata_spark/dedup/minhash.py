"""MinHash + LSH near-duplicate detection, oracle-checkable.

Pipeline (all native expressions — no Python in the hot path):
  shingle (word n-grams) → per-permutation min of portable 63-bit hashes
  → signature array → band → groupBy(band hash) bucket join → candidate
  pairs → exact Jaccard verify on shingle sets.

Uses ``portable_hash64`` (md5-derived) rather than Spark's ``hash`` so a
DuckDB oracle reproduces every signature bit-for-bit (SURVEY §2.9).

Scale shape: the only shuffles are the band-bucket groupBys on compact
(band_id, band_hash) keys, and the verify join moves shingle arrays only
for candidate pairs, never for the full corpus. Banding keeps candidate
count ~linear at 100 TB where naive all-pairs is quadratic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import portable_hash64, shingles


def minhash_signature(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, shingles, sig: array<long>[num_perm]) — one projection."""
    sh = shingles(F.col(text_col), n=shingle_n)
    out = df.select(F.col(id_col), sh.alias("shingles"))

    def hash_with_seed(seed: int):
        # single-arg lambda: a two-arg lambda would make F.transform pass
        # the array index as the second argument, clobbering the seed
        return lambda s: portable_hash64(s, seed=seed)

    sig = F.array(
        *[
            F.array_min(F.transform(F.col("shingles"), hash_with_seed(i)))
            for i in range(num_perm)
        ]
    )
    return out.withColumn("sig", sig)


def minhash_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """Near-dup pairs (id_a < id_b) whose exact shingle Jaccard ≥ threshold,
    discovered via LSH banding (rows = num_perm // bands per band)."""
    rows_per_band = num_perm // bands
    sigs = minhash_signature(df, text_col, id_col, num_perm, shingle_n)

    banded = sigs.select(
        F.col(id_col),
        "shingles",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.md5(
                            F.concat_ws(
                                ",",
                                *[
                                    F.col("sig")[i].cast("string")
                                    for i in range(b * rows_per_band, (b + 1) * rows_per_band)
                                ],
                            )
                        ).alias("band_hash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band"),
    ).select(F.col(id_col), "shingles", F.col("band.band_id"), F.col("band.band_hash"))

    left = banded.alias("a")
    right = banded.alias("b")
    cand = (
        left.join(
            right,
            on=[
                F.col("a.band_id") == F.col("b.band_id"),
                F.col("a.band_hash") == F.col("b.band_hash"),
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
            ],
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.shingles").alias("sh_a"),
            F.col("b.shingles").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )

    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    jac = F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0))
    return (
        cand.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )
