"""Event-time windowing (SURVEY §2.9): tumbling, sliding, session.

These operate on any DataFrame with an event-time column — the same
code path works on a batch table and on a ``readStream`` source, which
is exactly how Structured Streaming is meant to be used: the window
assignment (``F.window`` / ``F.session_window``) is identical; a
streaming caller adds ``withWatermark`` before the groupBy (see
``stream_tumbling_counts`` below).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tumbling_window_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    group_cols: list[str],
    aggs: list[Column],
) -> DataFrame:
    """Non-overlapping fixed windows: one window per event, so the
    groupBy shuffles each row once with map-side partial aggregation."""
    win = F.window(F.col(ts_col), duration)
    return (
        df.groupBy(win, *group_cols)
        .agg(*aggs)
        .withColumn("window_start", F.col("window.start"))
        .withColumn("window_end", F.col("window.end"))
        .drop("window")
    )


def sliding_window_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    group_cols: list[str],
    aggs: list[Column],
) -> DataFrame:
    """Overlapping windows: each event lands in duration/slide windows
    (Spark explodes the assignment before the shuffle)."""
    win = F.window(F.col(ts_col), duration, slide)
    return (
        df.groupBy(win, *group_cols)
        .agg(*aggs)
        .withColumn("window_start", F.col("window.start"))
        .withColumn("window_end", F.col("window.end"))
        .drop("window")
    )


def session_windows(
    df: DataFrame,
    ts_col: str,
    gap: str,
    group_cols: list[str],
    aggs: list[Column],
) -> DataFrame:
    """Gap-based session windows via ``F.session_window`` — sessions
    close after ``gap`` of inactivity per group key."""
    win = F.session_window(F.col(ts_col), gap)
    return (
        df.groupBy(win, *group_cols)
        .agg(*aggs)
        .withColumn("session_start", F.col("session_window.start"))
        .withColumn("session_end", F.col("session_window.end"))
        .drop("session_window")
    )


def stream_session_agg(
    stream_df: DataFrame,
    ts_col: str,
    gap: str,
    group_cols: list[str],
    aggs: list[Column],
    watermark: str = "30 minutes",
) -> DataFrame:
    """True Structured Streaming session windows: watermark +
    ``F.session_window`` groupBy. Spark keeps per-key open-session state
    and MERGES sessions whose gaps close as late events arrive; the
    watermark bounds that state — a session older than
    (max event time - watermark) is finalized and emitted, so state
    stays proportional to active keys, not stream length. This is the
    streaming twin of ``session_windows`` above (same assignment
    expression, same semantics once every event is delivered)."""
    win = F.session_window(F.col(ts_col), gap)
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(win, *group_cols)
        .agg(*aggs)
        .withColumn("session_start", F.col("session_window.start"))
        .withColumn("session_end", F.col("session_window.end"))
        .drop("session_window")
    )


def stream_tumbling_counts(
    stream_df: DataFrame,
    ts_col: str,
    duration: str,
    group_cols: list[str],
    watermark: str = "10 minutes",
) -> DataFrame:
    """True Structured Streaming variant: watermarked tumbling counts.

    ``stream_df`` must come from ``spark.readStream``; late rows beyond
    the watermark are dropped and state is evicted — bounded state at
    any scale.
    """
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), duration), *group_cols)
        .agg(F.count("*").alias("n_events"))
    )
