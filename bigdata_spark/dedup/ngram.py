"""N-gram Jaccard near-dup pairs — exact, via a distributed inverted
index (the classic sparse all-pairs-similarity plan).

MinHash (dedup/minhash.py) is the estimate path; this operator is for
corpora where EXACT Jaccard is required. A pairwise self-join with a
per-pair ``array_intersect`` is quadratic in every bucket — hopeless at
low thresholds, where no length/prefix filter prunes anything. The
inverted index sidesteps pairwise set ops entirely:

  explode shingles → self-join on (bucket, shingle) → the per-pair
  GROUP COUNT of shared shingles IS |A ∩ B| (shingle arrays are
  deduped sets) → jaccard = |∩| / (|A| + |B| − |∩|) ≥ t.

Cost is Σ_shingle df² (df = docs containing the shingle), not n²:
only pairs that actually share a shingle ever materialize, and the
intersection size falls out of the aggregation — no array op per pair.
Every step is a plain shuffle (explode, hash join, groupBy) that
partitions by shingle then by pair, so the plan scales horizontally; a
pathological stop-shingle (df ~ corpus size) is the one skew risk —
guarded since round 4 by a posting census that drops singleton postings
and salts hot shingles across reducers (same two-phase shape as
operators/skew.py; see ngram_jaccard_pairs docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import shingles


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bucket_col: str | None = None,
    shingle_n: int = 3,
    threshold: float = 0.5,
    hot_token_df: int = 1024,
    n_salts: int = 16,
) -> DataFrame:
    """Pairs (id_a < id_b, jaccard) with shingle-set Jaccard ≥ threshold.

    ``bucket_col`` confines pairs to equal bucket values (a semantic
    restriction — cross-bucket pairs are never reported); with None the
    corpus is one bucket, which the inverted index handles fine (the
    join key is the shingle, not the bucket). ``threshold`` must be
    positive: a pair sharing zero shingles never enters the index, which
    is exactly the set a positive threshold excludes anyway.

    Stop-shingle skew guard: a shingle shared by m documents ("all
    rights reserved") puts m rows behind one join key → m² outputs in
    ONE reducer. Postings are counted per (bucket, shingle) first;
    df == 1 postings are dropped (they cannot pair), and shingles with
    df > ``hot_token_df`` are salted — b-side takes a deterministic
    salt in [0, n_salts), a-side replicates across all salts — so the
    hot shingle's pair fan-out spreads over n_salts reducers. Each
    (a, b) pair still meets exactly once per shared shingle, so the
    per-pair intersection COUNT (and therefore the exact Jaccard) is
    unchanged. Total work for pathological boilerplate remains Σ df²
    by the semantics of exact all-pairs; the guard bounds per-reducer
    memory/latency, which is what kills clusters in practice.
    """
    if threshold <= 0:
        raise ValueError(
            "ngram_jaccard_pairs requires threshold > 0 (zero-overlap "
            "pairs are unrepresentable in an inverted index; use the "
            "MinHash path for recall-oriented sweeps)"
        )
    from ..operators.parallelism import ensure_parallelism

    # Repartition the RAW rows first (cheap: id/bucket/text), THEN
    # shingle: a small corpus scans as one partition, and an exchange
    # placed above the shingle projection would leave the expensive
    # shingling serialized on that one core (measured 5.5 s vs 0.8 s on
    # 32 cores for the same corpus).
    src = ensure_parallelism(
        df.select(
            F.col(id_col),
            (F.col(bucket_col) if bucket_col else F.lit(0)).alias("_bucket"),
            F.col(text_col).alias("_text"),
        ),
        force=True,
    )
    base = (
        src.select(
            F.col(id_col), "_bucket", shingles(F.col("_text"), n=shingle_n).alias("sh")
        )
        .select(
            F.col(id_col),
            "_bucket",
            F.size("sh").alias("sz"),
            F.explode("sh").alias("tok"),
        )
        # an empty/whitespace-only document shingles to {""} — drop the
        # empty shingle so degenerate docs never pair (two empty docs
        # are NOT near-duplicates of anything)
        .filter(F.col("tok") != "")
    )

    # Posting census on the join key; singleton postings can never pair
    # — drop them before the self-join. Hot shingles get flagged for
    # salting.
    # Census via a window count, not a join: one shuffle on the posting
    # key, no second table, and no join for Catalyst to mis-plan (the
    # post-explode size estimate is garbage — a census JOIN was measured
    # broadcasting the whole exploded corpus). The hot shingle's window
    # group holds df rows in one task — linear and spillable, unlike the
    # df² pair fan-out the salt below spreads. The filtered index is
    # persisted so the corpus is shingled ONCE for both join sides
    # (the unguarded plan re-shingled per side).
    from pyspark.sql import Window

    w_tok = Window.partitionBy("_bucket", "tok")
    indexed = (
        base.withColumn("_df", F.count(F.lit(1)).over(w_tok))
        .filter(F.col("_df") >= 2)
        .withColumn("_hot", F.col("_df") > hot_token_df)
        .persist()
    )

    a = indexed.withColumn(
        "_salt",
        F.explode(
            F.when(
                F.col("_hot"), F.array(*[F.lit(i) for i in range(n_salts)])
            ).otherwise(F.array(F.lit(0)))
        ),
    ).alias("a")
    b = (
        indexed.withColumn(
            "_salt",
            F.when(F.col("_hot"), F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_salts)))
            .otherwise(F.lit(0))
            .cast("int"),
        )
        # build side of the pair join: per key the b-side holds df/S rows
        # (vs the a-side's replicated df) — hash-build the smaller side,
        # and never let Catalyst broadcast the exploded posting list
        .hint("shuffle_hash")
        .alias("b")
    )
    ida, idb = F.col(f"a.{id_col}"), F.col(f"b.{id_col}")
    sza, szb = F.col("a.sz"), F.col("b.sz")
    inter = F.count(F.lit(1))
    pairs = (
        a.join(
            b,
            on=[
                F.col("a._bucket") == F.col("b._bucket"),
                F.col("a.tok") == F.col("b.tok"),
                F.col("a._salt") == F.col("b._salt"),
                ida < idb,
                # size-ratio prune inside the join: jaccard(A,B) ≤
                # min(|A|,|B|)/max(|A|,|B|), so pairs that cannot reach
                # the threshold never reach the aggregation
                sza.cast("double") >= threshold * szb,
                szb.cast("double") >= threshold * sza,
            ],
        )
        .groupBy(ida.alias("id_a"), idb.alias("id_b"), sza.alias("sza"), szb.alias("szb"))
        .agg(inter.alias("inter"))
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("sza") + F.col("szb") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return pairs.select("id_a", "id_b", "jaccard")
