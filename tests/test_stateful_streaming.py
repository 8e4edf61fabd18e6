"""Custom stateful streaming: per-key running totals must accumulate
across micro-batches (maxFilesPerTrigger=1 forces multiple batches) and
the final state must equal the batch aggregate."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from bigdata_spark.streaming.stateful import running_totals_stream


def test_running_totals_across_batches(spark, tmp_path):
    src = str(tmp_path / "stream_src")
    rows = [(i, ["a", "b", "c"][i % 3], float(i)) for i in range(60)]
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    # two files → two micro-batches with maxFilesPerTrigger=1, so the
    # second batch MUST read back batch-1 state to be correct
    df.filter(F.col("event_id") < 30).coalesce(1).write.parquet(src + "/p1")
    df.filter(F.col("event_id") >= 30).coalesce(1).write.parquet(src + "/p2")

    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/p*")
    )
    assert stream.isStreaming
    totals = running_totals_stream(stream, "event_type", "value")

    q = (
        totals.writeStream.format("memory")
        .queryName("running_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # n_events is monotone per key → the max row per key is the final state
    final = {
        r["key"]: (r["n_events"], r["total"])
        for r in spark.sql(
            "SELECT key, n_events, total FROM running_totals a "
            "WHERE n_events = (SELECT MAX(n_events) FROM running_totals b WHERE b.key = a.key)"
        ).collect()
    }
    want = {
        r["event_type"]: (r["n"], r["total"])
        for r in df.groupBy("event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    assert set(final) == set(want)
    for k in want:
        assert final[k][0] == want[k][0]
        assert math.isclose(final[k][1], want[k][1], rel_tol=1e-9)

    # the stream really ran in >1 batch: some key must have an
    # intermediate (smaller) update too
    n_rows = spark.sql("SELECT COUNT(*) AS c FROM running_totals").first()["c"]
    assert n_rows > len(want)
