"""SimHash near-duplicate detection (Charikar 2002, as used in Manku et
al., WWW'07 for web-scale dedup).

64-bit simhash built natively: token → portable 63-bit hash → per-bit
±1 votes → sign of vote sum per bit → packed bigint. Candidate pairs
share a 16-bit block (Manku-style block permutation, 4 blocks) and are
verified by Hamming distance ≤ k.

All expressions, no UDFs; the vote aggregation is a fold over the token
hash array computed per row in the scan projection.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import portable_hash64
from ..text.analysis import tokens

SIMHASH_BITS = 60  # portable_hash64 yields 60 usable bits


def simhash64(text: Column | str, n_bits: int = SIMHASH_BITS) -> Column:
    """Per-row simhash over whitespace tokens, as bigint.

    Single fold: the accumulator is an array of n_bits vote counters;
    each token hash contributes ±1 per bit via one zip_with. One pass
    over the tokens regardless of n_bits (vs. n_bits separate folds).
    """
    col = F.col(text) if isinstance(text, str) else text
    tok_hashes = F.transform(F.array_distinct(tokens(col)), lambda t: portable_hash64(t))
    powers = F.array(*[F.lit(1 << i).cast("long") for i in range(n_bits)])
    zeros = F.array_repeat(F.lit(0), n_bits)
    bit_votes = lambda h: F.transform(  # noqa: E731
        powers, lambda p: F.when(h.bitwiseAND(p) != 0, 1).otherwise(-1)
    )
    votes = F.aggregate(tok_hashes, zeros, lambda acc, h: F.zip_with(acc, bit_votes(h), lambda a, v: a + v))
    # pack sign bits: Σ 2^i where votes[i] > 0
    packed = F.aggregate(
        F.zip_with(votes, powers, lambda v, p: F.when(v > 0, p).otherwise(F.lit(0).cast("long"))),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return packed


def hamming_distance(a: Column, b: Column, n_bits: int = SIMHASH_BITS) -> Column:
    """Popcount of a XOR b via bit_count (native in Spark 3.3+)."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 8,
    n_blocks: int = 4,
) -> DataFrame:
    """Near-dup pairs by simhash: bucket on each 15-bit block, verify
    Hamming distance ≤ max_hamming. Finds all pairs differing in fewer
    bits than the number of blocks (pigeonhole guarantee when
    max_hamming < n_blocks ... standard Manku trade-off otherwise)."""
    block_bits = SIMHASH_BITS // n_blocks
    sh = df.select(F.col(id_col), simhash64(F.col(text_col)).alias("simhash"))
    blocked = sh.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("block_id"),
                        F.shiftright(F.col("simhash"), b * block_bits)
                        .bitwiseAND(F.lit((1 << block_bits) - 1))
                        .alias("block_val"),
                    )
                    for b in range(n_blocks)
                ]
            )
        ).alias("blk"),
    ).select(id_col, "simhash", F.col("blk.block_id"), F.col("blk.block_val"))

    a, b = blocked.alias("a"), blocked.alias("b")
    cand = (
        a.join(
            b,
            on=[
                F.col("a.block_id") == F.col("b.block_id"),
                F.col("a.block_val") == F.col("b.block_val"),
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
            ],
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cand.withColumn("hamming", hamming_distance(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
