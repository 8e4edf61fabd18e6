"""Skew mitigation: salted joins and two-phase salted aggregation
(SURVEY §2.9 scale surface).

AQE's skew-join handling (on in session.py) splits oversized partitions
at runtime, but it only fires for sort-merge joins and can't help a
skewed aggregation key. Salting is the explicit fallback: spread one
hot key across ``n_salts`` sub-keys, do the heavy work per sub-key, then
merge. Cost: the small side is replicated ×n_salts (join) or a second
tiny shuffle (agg) — both bounded and key-cardinality-independent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 8,
    seed: int = 42,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``large`` has skewed join keys: large rows get a
    random salt in [0, n_salts); ``small`` is exploded across ALL salts
    so every (key, salt) pair finds its match. The shuffle key becomes
    (key, salt) — the hot key's rows land on n_salts reducers instead
    of one."""
    if how not in ("inner", "left", "leftouter", "left_outer"):
        # right/full-outer would emit n_salts duplicate null-padded rows
        # for every unmatched small-side key (it is exploded ×n_salts)
        raise ValueError(f"salted_join supports inner/left joins, got how={how!r}")
    salted_large = large.withColumn(
        "_salt", (F.rand(seed) * n_salts).cast("int")
    )
    salted_small = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return (
        salted_large.join(salted_small, on=[on, "_salt"], how=how).drop("_salt")
    )


def salted_agg(
    df: DataFrame,
    key: str,
    aggs: dict[str, Column | tuple],
    n_salts: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys, for aggregates that
    decompose into partial + merge (count→sum, sum→sum, min→min,
    max→max).

    ``aggs`` maps output name → either a plain partial aggregate Column
    (merged with ``F.sum`` — correct ONLY for count/sum partials) or a
    ``(partial_expr, merge_fn)`` tuple where ``merge_fn`` re-aggregates
    the per-salt partials (pass ``F.min``/``F.max`` for min/max).
    Phase 1 shuffles on (key, salt) — the hot key spreads over n_salts
    reducers; phase 2 shuffles only n_keys·n_salts pre-aggregated rows.

    Note Spark's hash aggregation already does map-side partials, which
    handles most skew; explicit salting matters when a single key's
    partials still overwhelm one reducer (extreme skew, memory-heavy
    aggregation state)."""
    parts: dict[str, Column] = {}
    merges: dict[str, object] = {}
    for name, spec in aggs.items():
        if isinstance(spec, tuple):
            parts[name], merges[name] = spec
        else:
            parts[name], merges[name] = spec, F.sum
    salted = df.withColumn("_salt", (F.rand(seed) * n_salts).cast("int"))
    partial = salted.groupBy(key, "_salt").agg(
        *[expr.alias(f"_p_{name}") for name, expr in parts.items()]
    )
    return partial.groupBy(key).agg(
        *[merges[name](f"_p_{name}").alias(name) for name in parts]
    )
