"""True Structured Streaming path: file stream → watermarked windowed
aggregation → memory sink, result parity with the batch plan (the same
window-assignment code serves both — streaming/windows.py)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from bigdata_spark.streaming.windows import stream_tumbling_counts, tumbling_window_agg


def test_stream_batch_parity(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (i, t0 + dt.timedelta(minutes=7 * i), ["view", "click"][i % 2], float(i))
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string, value double")
    src = str(tmp_path / "stream_src")
    df.repartition(4).write.parquet(src)

    stream = spark.readStream.schema(df.schema).parquet(src)
    assert stream.isStreaming
    windowed = stream_tumbling_counts(stream, "ts", "1 hour", ["event_type"], watermark="30 minutes")

    q = (
        windowed.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r["window"]["start"], r["event_type"]): r["n_events"]
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    expected_df = tumbling_window_agg(df, "ts", "1 hour", ["event_type"], [F.count("*").alias("n_events")])
    expected = {
        (r["window_start"], r["event_type"]): r["n_events"] for r in expected_df.collect()
    }
    assert got == expected
    assert len(got) > 4
