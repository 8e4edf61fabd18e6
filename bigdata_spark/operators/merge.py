"""Batch MERGE INTO: Delta-style upsert semantics as one full-outer
join (WHEN MATCHED [AND cond] DELETE / UPDATE, WHEN NOT MATCHED
INSERT, unmatched target rows carry over).

Scale shape: a single shuffle of both sides on the merge keys — the
same join a warehouse MERGE plans. Copy-on-write publication (write
the merged result as a new immutable version via
streaming/upsert_sink.VersionedParquetTable) keeps old versions
readable; a real lakehouse adds file-level pruning so only touched
files rewrite, which composes with this operator unchanged (prune,
merge the touched slice, union the untouched files).

Duplicate SOURCE keys make a merge ambiguous (same rule as Delta);
callers deduplicate first. Target-side duplicates are legal and each
matches independently.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def merge_into(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    *,
    update_set: dict[str, Column] | None = None,
    insert: bool = True,
    delete_when: Column | None = None,
    action_col: str | None = None,
) -> DataFrame:
    """Merge ``source`` into ``target`` on ``keys``.

    - matched + ``delete_when`` (evaluated over the joined ``t``/``s``
      namespaces): row dropped;
    - matched otherwise: updated via ``update_set`` (column name →
      expression over ``t.``/``s.``; default: take the source value for
      every common non-key column);
    - source-only: inserted when ``insert`` (target columns missing
      from source become NULL);
    - target-only: carried through unchanged.

    Output schema is the target schema, plus ``action_col`` (values
    update/insert/delete-survivor bookkeeping: 'update', 'insert',
    'carry') when requested — deleted rows do not appear.
    """
    # Presence markers, not key nullability: the join is null-safe
    # (eqNullSafe), so a NULL merge key is a legal match — classifying
    # matched/target-only off keys[0].isNull() would silently turn a
    # matched NULL-key row into a 'carry' and drop the source action.
    t = target.withColumn("_t_present", F.lit(True)).alias("t")
    s = source.withColumn("_s_present", F.lit(True)).alias("s")
    cond = None
    for k in keys:
        c = F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}"))
        cond = c if cond is None else cond & c
    j = t.join(s, cond, "full_outer")

    matched = F.col("t._t_present").isNotNull() & F.col("s._s_present").isNotNull()
    t_only = F.col("s._s_present").isNull()
    src_cols = set(source.columns)
    if update_set is None:
        update_set = {
            c: F.col(f"s.{c}")
            for c in target.columns
            if c not in keys and c in src_cols
        }

    out_cols = []
    for c in target.columns:
        if c in keys:
            val = F.coalesce(F.col(f"t.{c}"), F.col(f"s.{c}"))
        else:
            upd = update_set.get(c, F.col(f"t.{c}"))
            ins = F.col(f"s.{c}") if c in src_cols else F.lit(None)
            val = (
                F.when(matched, upd)
                .when(t_only, F.col(f"t.{c}"))
                .otherwise(ins)
            )
        out_cols.append(val.alias(c))
    if action_col is not None:
        out_cols.append(
            F.when(matched, F.lit("update"))
            .when(t_only, F.lit("carry"))
            .otherwise(F.lit("insert"))
            .alias(action_col)
        )

    keep = F.lit(True)
    if delete_when is not None:
        keep = keep & ~(matched & F.coalesce(delete_when, F.lit(False)))
    if not insert:
        # source-only rows are dropped when insert is disabled
        keep = keep & (matched | t_only)
    return j.filter(keep).select(*out_cols)
