"""Duplicated-substring detection (Lee et al., "Deduplicating Training
Data Makes Language Models Better"): find every k-token window of every
document that also occurs elsewhere in the corpus, and annotate each
document with the fraction of its windows that are duplicated.

The paper's exact tool is a single-machine suffix array — unusable at
100 TB. The distributed equivalent for fixed window length k is a
rolling-hash inverted index, and unlike pairwise near-dup it is
LINEAR, not quadratic:

  tokens → all k-token windows → md5 window hash → per-(doc, hash)
  occurrence counts → global per-hash counts (two-phase partial agg)
  → hash-join the two → per-doc rollup.

A window occurrence is "duplicated" when its hash occurs ≥ 2 times
corpus-wide (covers both cross-doc and within-doc repeats, matching
the paper's "appears elsewhere in the corpus" notion). No step emits
more rows than it reads — the join key is the window hash, and the
join OUTPUT is exactly the distinct (doc, hash) pairs, so a
boilerplate window shared by a million pages costs one global-count
row and per-doc join probes, never m² pairs (contrast the pair-
producing band join in minhash.py, which needs the skew guard).

Reference has no dedup at all; this is brief-driven (training-data
pipeline surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..text.analysis import tokens


def duplicate_window_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 10,
) -> DataFrame:
    """Per-document duplicated-window stats: (id, n_windows, n_dup,
    dup_frac) where n_dup counts window occurrences whose k-token
    window hash appears ≥ 2 times in the whole corpus.

    All expressions are native (split/transform/slice/md5) — the
    window enumeration runs inside whole-stage codegen; the only
    shuffles are the two partial-aggregated groupBys and one hash
    join on the window hash.
    """
    from ..operators.parallelism import ensure_parallelism

    src = ensure_parallelism(
        df.select(F.col(id_col), tokens(text_col).alias("toks"))
    )
    n = F.size("toks")
    wins = src.select(
        id_col,
        F.when(
            n >= k,
            F.transform(
                F.sequence(F.lit(1), n - k + 1),
                lambda i: F.md5(F.array_join(F.slice("toks", i, k), " ")),
            ),
        )
        .otherwise(F.array().cast("array<string>"))
        .alias("whs"),
    )
    # explode_outer keeps zero-window docs as a null-hash row so the
    # final rollup still emits them (n_windows = 0)
    occ = wins.select(id_col, F.explode_outer("whs").alias("wh"))
    per_doc = occ.groupBy(id_col, "wh").agg(F.count("*").alias("c"))
    glob = (
        per_doc.filter(F.col("wh").isNotNull())
        .groupBy("wh")
        .agg(F.sum("c").alias("g"))
    )
    joined = per_doc.join(glob, "wh", "left")
    agg = joined.groupBy(id_col).agg(
        F.sum(F.when(F.col("wh").isNotNull(), F.col("c")).otherwise(F.lit(0)))
        .alias("n_windows"),
        F.sum(F.when(F.col("g") >= 2, F.col("c")).otherwise(F.lit(0)))
        .alias("n_dup"),
    )
    return agg.select(
        id_col,
        "n_windows",
        "n_dup",
        F.round(
            F.when(
                F.col("n_windows") > 0, F.col("n_dup") / F.col("n_windows")
            ).otherwise(F.lit(0.0)),
            9,
        ).alias("dup_frac"),
    )
