"""Custom stateful streaming operators via ``applyInPandasWithState``
(SURVEY §2.9 — the reference has no streaming; this is the
training-pipeline surface's "custom stateful operator" slot).

State lives per group key in Spark's state store, survives across
micro-batches, and is bounded by key cardinality (plus optional
timeouts) — the scalable pattern for running aggregates, sessionization
with custom rules, or online feature accumulation at 100 TB stream
volume."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_totals_stream(
    stream_df: DataFrame,
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Per-key running (count, sum) maintained in GroupState across
    micro-batches; emits the updated totals for every key seen in the
    batch (output mode ``update``).

    Output: (key string, n_events long, total double) — n_events is
    monotonically non-decreasing per key, so the latest row per key is
    the current running state."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((n, total))
        yield pd.DataFrame([{"key": key[0], "n_events": n, "total": total}])

    return stream_df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType="key string, n_events long, total double",
        stateStructType="n long, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
