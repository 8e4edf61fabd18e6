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
count ~linear at 100 TB where naive all-pairs is quadratic. Degenerate
buckets (boilerplate corpora: m identical docs → m²/2 candidates on one
reducer) are guarded since round 4: singleton buckets are pruned via a
bucket census, hot buckets are salted across reducers, and an optional
df cap can exclude adversarial buckets outright (see minhash_dup_pairs
docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import portable_hash64, shingles


# Linear-permutation MinHash (standard universal-hash family): ONE
# md5-derived base hash per shingle, then num_perm cheap (a·h + b) mod M
# permutations of it. Cuts the dominant md5 cost num_perm-fold vs
# hashing every shingle once per permutation. M = 2^31 - 1 keeps every
# product a·h < 2^62 — no 64-bit overflow in either engine (DuckDB
# BIGINT overflow errors rather than wrapping, so this bound matters).
#
# Collision regime: the shared 31-bit base hash means documents with
# very large distinct-shingle sets (~2^15+, i.e. birthday bound of
# sqrt(M)) see base-hash collisions that slightly bias the Jaccard
# estimate upward — and ALL permutations share the same collisions, so
# they don't average out. Fine for document-sized shingle sets (500-doc
# corpus max here is ~10^3); a corpus of multi-MB documents should
# widen the base hash (or rely on the exact-Jaccard verify step, which
# bounds the damage either way).
MINHASH_MOD = (1 << 31) - 1


def perm_params(i: int) -> tuple[int, int]:
    """Deterministic (a, b) for permutation i, derived from md5 so any
    engine can reproduce them. a ∈ [1, M-1], b ∈ [0, M-1]."""
    import hashlib

    h = hashlib.md5(f"perm|{i}".encode()).hexdigest()
    a = (int(h[:8], 16) % (MINHASH_MOD - 1)) + 1
    b = int(h[8:16], 16) % MINHASH_MOD
    return a, b


def minhash_signature(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, shingles, sig: array<long>[num_perm])."""
    from ..operators.parallelism import ensure_parallelism

    # Repartition barriers BETWEEN the projections: each exchange stops
    # Catalyst's projection collapse from inlining the previous stage's
    # expression into every downstream transform. Without them codegen
    # compiles (and executes) the shingling num_perm times — or, if
    # shingles and hashes share one projection, the shingle expression
    # twice per row (measured slower). The FIRST exchange moves the raw
    # rows so the shingle projection itself runs on every core (a
    # single-file corpus scans as one partition — shingling there was
    # measured 7× slower than post-repartition). Shingle once → hash
    # once → permute num_perm times.
    src = ensure_parallelism(
        df.select(F.col(id_col), F.col(text_col).alias("_text")), force=True
    )
    sh = shingles(F.col("_text"), n=shingle_n)
    out = ensure_parallelism(src.select(F.col(id_col), sh.alias("shingles")), force=True)
    hashed = ensure_parallelism(
        out.withColumn(
            "_h",
            F.transform(F.col("shingles"), lambda s: portable_hash64(s) % MINHASH_MOD),
        ),
        force=True,
    )
    def permute(a: int, b: int):
        return lambda h: (F.lit(a) * h + F.lit(b)) % MINHASH_MOD

    sig = F.array(
        *[
            F.array_min(F.transform(F.col("_h"), permute(*perm_params(i))))
            for i in range(num_perm)
        ]
    )
    return hashed.withColumn("sig", sig).drop("_h")


def minhash_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.5,
    hot_bucket_df: int = 1024,
    n_salts: int = 16,
    max_bucket_df: int | None = None,
) -> DataFrame:
    """Near-dup pairs (id_a < id_b) whose exact shingle Jaccard ≥ threshold,
    discovered via LSH banding (rows = num_perm // bands per band).

    Degenerate-bucket skew guard: a real corpus contains boilerplate —
    m identical documents share every band hash and would emit m²/2
    candidates into ONE reducer. Buckets are counted first (a cheap agg
    on the compact (band_id, band_hash) key); singleton buckets are
    dropped before the join (they cannot pair — typically most of the
    table), and buckets with df > ``hot_bucket_df`` are salted: the
    b-side gets a deterministic salt in [0, n_salts), the a-side is
    replicated across all salts, so the hot bucket's m²/2 candidates
    spread over n_salts reducers (each holding m × m/n_salts) instead
    of one. The pair SET is unchanged — each (a, b) meets in exactly
    one salt partition. ``max_bucket_df`` (default None = keep all)
    EXCLUDES buckets beyond the cap from candidate generation entirely:
    an explicit recall trade for adversarial corpora — m identical
    pages still cost m²/2 total work even perfectly spread, and a
    downstream clusterer only needs the pairs of ONE band-bucket to
    merge the group, so capping is usually the right production call.
    """
    rows_per_band = num_perm // bands
    # One pass computes shingles + signatures; persisted because the
    # plan references it three times (two band-join sides + the verify
    # lookup) — without the cache Spark would re-shingle the corpus
    # three times.
    sigs = minhash_signature(df, text_col, id_col, num_perm, shingle_n).persist()

    # Band rows carry ONLY (id, band_id, band_hash) — at corpus scale
    # the candidate-generation shuffle must never move shingle arrays.
    banded = sigs.select(
        F.col(id_col),
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
    ).select(F.col(id_col), F.col("band.band_id"), F.col("band.band_hash"))

    # Bucket census via a window count, not a join: one shuffle on the
    # compact (band_id, band_hash) key, no second table for Catalyst to
    # mis-plan. The hot bucket's window group holds df rows in one task
    # — linear and spillable, unlike the df² pair fan-out the salting
    # below spreads. Persisted: referenced by both pair-join sides.
    from pyspark.sql import Window

    w_bucket = Window.partitionBy("band_id", "band_hash")
    joinable = banded.withColumn("_df", F.count(F.lit(1)).over(w_bucket))
    if max_bucket_df is not None:
        joinable = joinable.filter(F.col("_df") <= max_bucket_df)
    # df == 1 buckets cannot pair — drop them before they shuffle into
    # the self-join (in a deduped corpus that is MOST of the table).
    joinable = (
        joinable.filter(F.col("_df") >= 2)
        .withColumn("_hot", F.col("_df") > hot_bucket_df)
        .persist()
    )

    # Salt only hot buckets: b-side rows take one deterministic salt,
    # a-side rows are replicated across all salts; cold buckets use the
    # single salt 0 on both sides (no replication).
    a_salted = joinable.withColumn(
        "_salt",
        F.explode(
            F.when(
                F.col("_hot"),
                F.array(*[F.lit(i) for i in range(n_salts)]),
            ).otherwise(F.array(F.lit(0)))
        ),
    ).alias("a")
    b_salted = (
        joinable.withColumn(
            "_salt",
            F.when(F.col("_hot"), F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_salts)))
            .otherwise(F.lit(0))
            .cast("int"),
        )
        # hash-build the un-replicated side (m/S rows per key vs m)
        .hint("shuffle_hash")
        .alias("b")
    )
    cand = (
        a_salted.join(
            b_salted,
            on=[
                F.col("a.band_id") == F.col("b.band_id"),
                F.col("a.band_hash") == F.col("b.band_hash"),
                F.col("a._salt") == F.col("b._salt"),
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
            ],
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )

    # Verify: fetch shingle sets only for candidate pairs (two hash
    # joins on the compact id key), then exact Jaccard.
    sh = sigs.select(F.col(id_col), F.col("shingles"))
    pairs = (
        cand.join(sh.select(F.col(id_col).alias("id_a"), F.col("shingles").alias("sh_a")), "id_a")
        .join(sh.select(F.col(id_col).alias("id_b"), F.col("shingles").alias("sh_b")), "id_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    jac = F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0))
    return (
        pairs.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )
