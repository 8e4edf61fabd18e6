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


def stream_dedup(
    stream_df: DataFrame,
    key_col: str = "content_key",
    id_col: str = "doc_id",
) -> DataFrame:
    """Streaming exact dedup: the ingest-time guard a training-data
    pipeline runs so a document is admitted once across the whole
    stream history. Emits one row per content key carrying the current
    canonical keeper — the MINIMUM id seen so far — and a duplicate
    counter, both in GroupState.

    Min-id (rather than literal arrival order) makes the keeper
    order-independent: the same corpus produces the same keeper set no
    matter how files split into micro-batches, so results are
    reproducible under reprocessing and comparable to the batch
    aggregate (MIN(id), COUNT(*)-1 per key).

    Spark's built-in ``dropDuplicates`` + watermark covers the
    bounded-lateness case; this custom operator keeps unbounded state
    (bounded by DISTINCT key cardinality, the same asymptotics as the
    batch dedup's groupBy) and exposes the drop count as observability
    output.

    Output: (key string, kept_id long, dups_dropped long) in update
    mode — the latest row per key carries the current state."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        batch_n = 0
        batch_min_id = None
        for pdf in pdfs:
            batch_n += len(pdf)
            if len(pdf):
                m = int(pdf[id_col].min())
                batch_min_id = m if batch_min_id is None else min(batch_min_id, m)
        if batch_min_id is None:
            return
        if state.exists:
            kept_id, dups = state.get
            kept_id = min(kept_id, batch_min_id)
            dups += batch_n
        else:
            kept_id, dups = batch_min_id, batch_n - 1
        state.update((kept_id, dups))
        yield pd.DataFrame(
            [{"key": key[0], "kept_id": kept_id, "dups_dropped": dups}]
        )

    return stream_df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType="key string, kept_id long, dups_dropped long",
        stateStructType="kept_id long, dups_dropped long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def timeout_evicted_rollup(
    stream_df: DataFrame,
    key_cols: list[str],
    value_col: str = "vm",
    timeout_ms: int = 1,
) -> DataFrame:
    """Per-key (count, sum) accumulated in GroupState and emitted ONLY
    on PROCESSING-TIME timeout eviction — the TTL-cache shape (idle
    sessions flush, hot keys keep accumulating; reference has no
    streaming, SURVEY §2.9 extension surface).

    Semantics (exactly what Spark guarantees): a key's timeout clock
    re-arms every micro-batch that brings it data, and the timeout
    branch fires in the first LATER batch where no data arrived for the
    key — data arrival always preempts eviction. Keys still holding
    state when the stream stops are NOT flushed (their rows surface on
    restart); callers that need a full flush must either feed a
    trailing batch or read the state store. ``timeout_ms`` defaults to
    1 ms so any real inter-batch gap trips it — the determinism hinges
    on batch BOUNDARIES, not wall-clock.

    Output (append mode): key columns + (n_events long, v_micros long),
    one row per evicted state. ``value_col`` must be an exact-integer
    column prepared UPSTREAM (micro-units) so the pandas sum is exact.
    """

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            n, vsum = state.get
            state.remove()
            row = dict(zip(key_cols, key))
            row.update({"n_events": n, "v_micros": vsum})
            yield pd.DataFrame([row])
            return
        n, vsum = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            vsum += int(pdf[value_col].sum())
        state.update((n, vsum))
        state.setTimeoutDuration(timeout_ms)
        return
        yield  # pragma: no cover — generator marker

    out_fields = ", ".join(
        f"{n} {t}" for n, t in stream_df.select(*key_cols).dtypes
    )
    return stream_df.groupBy(*key_cols).applyInPandasWithState(
        update,
        outputStructType=f"{out_fields}, n_events long, v_micros long",
        stateStructType="n long, vsum long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
