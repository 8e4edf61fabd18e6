"""Bucketed tables: co-located, shuffle-free joins (SURVEY §2.9 scale
surface; no reference equivalent — the reference repartitions per run,
preprocessing.py:57-86, which costs a shuffle every time).

At 100 TB the winning move is to pay the partitioning shuffle ONCE at
write time: ``bucketBy(n, key)`` hashes rows into a fixed number of
files per partition, records the bucketing spec in the catalog, and
every later equi-join or aggregation on the bucket key skips its
Exchange entirely (verify: no ``Exchange`` above the scans in
``.explain``). Both sides must share bucket count and key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int,
    sort_col: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) managed
    table. Sorting within buckets additionally lets sort-merge join skip
    its per-task sort."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> DataFrame:
    """Equi-join two co-bucketed tables on the bucket key. With matching
    bucket specs Catalyst plans a sort-merge join with ZERO Exchange —
    the join runs bucket-to-bucket on the existing file layout."""
    return spark.table(left_table).join(spark.table(right_table), on)


def exchange_count(df: DataFrame) -> int:
    """Number of SHUFFLE Exchange operators in the executed plan — the
    thing bucketing is supposed to drive to zero. BroadcastExchange is
    excluded (it moves a small build side, not the fact table), and so
    is ReusedExchange (AQE reuse of an already-counted shuffle).

    Two plan-string traps: an executed AdaptiveSparkPlan prints BOTH
    '== Final Plan ==' and '== Initial Plan ==' sections (count only
    the final one), and a ReusedExchange node prints its child's
    description inline ('ReusedExchange [...], Exchange hash...'), so
    Exchange must be matched at an operator position (start of line or
    after the tree-branch '- '), not as a substring."""
    import re

    plan = df._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    return len(
        re.findall(
            r"(?m)(?:^|- )Exchange (?:hashpartitioning|rangepartitioning|SinglePartition|RoundRobinPartitioning)",
            plan,
        )
    )
