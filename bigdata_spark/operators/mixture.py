"""Training-mixture construction: sample each source at a rate that
hits a target token budget with prescribed mixture weights.

The standard LLM-pretraining step (The Pile, DoReMi, LLaMA data
recipes): given per-source weights w_s and a corpus-wide token budget
B = budget_frac · total_tokens, source s is down-sampled at

    rate_s = min(1, B · w_s / (Σw · tokens_s))

so the expected kept-token mix approaches the target weights (a source
too small for its weight saturates at rate 1 — the classic up-weight-
limited regime; we do not upsample).

Determinism: the keep decision is a hash-Bernoulli on the portable
md5-derived hash (functions/hashing.py), and the rate comparison is
EXACT integer arithmetic — u/10^6 < num/den is evaluated as
u·den < num·10^6 in wide decimals, never floats — so the same rows are
kept in any engine, at any partitioning, on every run. At truly
astronomical token counts (10^18+) the BIGINT inputs themselves would
need DECIMAL sums; the comparison layer is already exact-decimal.

Scale shape: one partial-aggregated groupBy for per-source token
totals (|sources| rows), one scalar total, and a broadcast join of the
tiny rate table back onto the corpus — no wide shuffle of the
documents themselves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import portable_hash64
from ..text.analysis import token_count

_MIX_SEED = 7
_U_MOD = 1_000_000


def mixture_rates(
    df: DataFrame,
    weights: dict[str, int],
    budget_num: int = 2,
    budget_den: int = 5,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-source rate table: (source, n_docs, n_tokens, num, den) with
    rate_s = num/den (uncapped; the keep predicate needs no cap)."""
    spark = df.sparkSession
    w_sum = sum(weights.values())
    wdf = spark.createDataFrame(
        [(s, int(w)) for s, w in sorted(weights.items())], f"{source_col} string, w_raw long"
    )
    base = df.select(
        F.col(source_col), token_count(text_col).alias("n_tok")
    )
    per_src = base.groupBy(source_col).agg(
        F.count("*").alias("n_docs"), F.sum("n_tok").alias("tok_s")
    )
    total = base.agg(F.sum("n_tok").alias("total_tokens"))
    return (
        per_src.crossJoin(F.broadcast(total))
        .join(F.broadcast(wdf), source_col)
        .select(
            source_col,
            "n_docs",
            F.col("tok_s").alias("n_tokens"),
            (F.lit(budget_num) * F.col("total_tokens") * F.col("w_raw"))
            .cast("decimal(28,0)")
            .alias("num"),
            (F.lit(budget_den) * F.lit(w_sum) * F.col("tok_s"))
            .cast("decimal(28,0)")
            .alias("den"),
        )
    )


def mixture_sample(
    df: DataFrame,
    weights: dict[str, int],
    budget_num: int = 2,
    budget_den: int = 5,
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Deterministically sampled mixture rows (original columns +
    n_tok), keeping each doc of source s iff
    hash_u(doc) · den_s < num_s · 10^6 — exact integer comparison."""
    rates = mixture_rates(
        df, weights, budget_num, budget_den, source_col, text_col
    )
    u = (portable_hash64(F.col(id_col), seed=_MIX_SEED) % _U_MOD).cast(
        "decimal(7,0)"
    )
    return (
        df.withColumn("n_tok", token_count(text_col))
        .join(F.broadcast(rates.select(source_col, "num", "den")), source_col)
        .filter(u * F.col("den") < F.col("num") * F.lit(_U_MOD))
        .drop("num", "den")
    )
