"""Distributed BPE tokenizer training (Sennrich et al. 2016, the
standard byte-pair-encoding merge-learning loop) as Spark dataflow.

The classic scaling trick: merges are learned over the DISTINCT-WORD
table (word, freq) — orders of magnitude smaller than the corpus and
the only thing that ever shuffles. Each merge round is:

  count — explode each word's adjacent symbol pairs weighted by word
          frequency; one partial-aggregated groupBy (pair) sum; top-1
          by (count desc, pair asc) — a deterministic argmax collected
          as a single row,
  apply — fold the winning (a, b) -> ab merge over every word's symbol
          array with a native ``aggregate`` lambda (greedy
          left-to-right, exactly the reference BPE semantics); the
          merge pair travels as two literals, so the plan stays
          constant-size.

Per round: one tiny collect + one narrow transform of the persisted
word table (re-persisted each round, parent unpersisted — the lineage
never grows past one round). R rounds = R jobs over a words-sized
table; corpus-sized data is touched exactly once, in the initial word
count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _apply_merge(syms: Column, a: str, b: str) -> Column:
    """Greedy left-to-right fold of merge (a, b) -> a+b over a symbol
    array — the BPE apply step as a native aggregate lambda."""
    merged = F.lit(a + b)

    def step(acc: Column, x: Column) -> Column:
        hit = (
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b))
        )
        return F.when(
            hit,
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(x)))

    return F.aggregate(syms, F.array().cast("array<string>"), step)


def word_table(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus -> (symbols array<string>, freq): the distinct-word table
    with each word split into single-character symbols. The ONE
    corpus-sized pass of BPE training."""
    words = df.select(
        F.explode(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
        ).alias("word")
    ).filter(F.col("word") != "")
    return words.groupBy("word").agg(F.count("*").alias("freq")).select(
        F.split(F.col("word"), "").alias("syms"), "freq"
    )


# Vocabularies at or below this size finish on the driver (hybrid
# cutover, same pattern as the dedup cluster resolution's union-find):
# the distinct-word table of a real corpus is millions of rows and
# stays distributed; a small vocabulary pays 8 rounds of job overhead
# for microseconds of actual work.
_DRIVER_VOCAB_CAP = 100_000


def _learn_bpe_local(
    words: list[tuple[list[str], int]], n_merges: int, min_freq: int
) -> list[tuple[str, str, int]]:
    """Driver-side rounds — bit-identical semantics to the distributed
    loop (same greedy fold, same (count desc, pair asc) tie-break)."""
    from collections import Counter

    merges: list[tuple[str, str, int]] = []
    seqs = [(list(s), f) for s, f in words]
    for _ in range(n_merges):
        counts: Counter = Counter()
        for syms, f in seqs:
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += f
        if not counts:
            break
        (a, b), n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < min_freq:
            break
        merges.append((a, b, int(n)))
        for ix, (syms, f) in enumerate(seqs):
            out: list[str] = []
            for x in syms:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            seqs[ix] = (out, f)
    return merges


def learn_bpe(
    df: DataFrame, text_col: str = "text", n_merges: int = 8, min_freq: int = 2
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges; returns [(left, right, count)]
    in merge order. Deterministic: ties break on the lexically smallest
    pair. Small vocabularies cut over to driver-side rounds (identical
    semantics); large ones run the distributed loop."""
    words = word_table(df, text_col).persist()
    if words.count() <= _DRIVER_VOCAB_CAP:
        try:
            pdf = words.toPandas()
            wl = [
                ([str(s) for s in syms], int(f))
                for syms, f in zip(pdf["syms"], pdf["freq"])
            ]
            return _learn_bpe_local(wl, n_merges, min_freq)
        finally:
            words.unpersist()
    merges: list[tuple[str, str, int]] = []
    prev = None
    try:
        for _ in range(n_merges):
            pairs = words.select(
                F.explode(
                    F.transform(
                        F.sequence(F.lit(1), F.size("syms") - 1),
                        lambda i: F.struct(
                            F.element_at("syms", i).alias("l"),
                            F.element_at("syms", i + 1).alias("r"),
                        ),
                    )
                ).alias("p"),
                "freq",
            ).filter(F.size("syms") >= 2)
            top = (
                pairs.groupBy("p")
                .agg(F.sum("freq").alias("n"))
                .orderBy(F.desc("n"), F.col("p.l"), F.col("p.r"))
                .limit(1)
                .collect()
            )
            if not top or top[0]["n"] < min_freq:
                break
            a, b, n = top[0]["p"]["l"], top[0]["p"]["r"], int(top[0]["n"])
            merges.append((a, b, n))
            nxt = words.select(
                _apply_merge(F.col("syms"), a, b).alias("syms"), "freq"
            ).persist()
            if prev is not None:
                prev.unpersist()
            prev = words
            words = nxt
    finally:
        if prev is not None:
            prev.unpersist()
        words.unpersist()
    return merges


def tokenize_with_merges(
    df: DataFrame,
    merges: list[tuple[str, str, int]],
    text_col: str = "text",
    id_cols: list[str] | None = None,
) -> DataFrame:
    """Per-row BPE token counts for a learned merge list, via the same
    distinct-word trick as training: the merge folds run ONCE over the
    vocabulary (tiny), and documents join the word → token-count
    dictionary and sum. Folding per document instead is O(doc_len²)
    per row and re-tokenizes every duplicate word — measured 10×
    slower even at sf0.1. The dictionary join is left to AQE: it
    broadcasts when the vocabulary is small and shuffles when a
    100 TB corpus's vocabulary isn't. Rows with no tokens drop out
    (no words → no BPE tokens)."""
    id_cols = id_cols or ["doc_id"]
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    exploded = df.select(*id_cols, F.explode(toks).alias("word")).filter(
        F.col("word") != ""
    )
    vocab = exploded.select("word").distinct()
    syms = F.split(F.col("word"), "")
    for a, b, _n in merges:
        syms = _apply_merge(syms, a, b)
    vocab_tok = vocab.select("word", F.size(syms).alias("w_tokens"))
    return (
        exploded.join(vocab_tok, "word")
        .groupBy(*id_cols)
        .agg(F.sum("w_tokens").alias("n_bpe_tokens"))
    )
