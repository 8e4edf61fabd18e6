"""Event-time window queries over the ``events`` table (SURVEY §2.9).

The same window-assignment code (streaming/windows.py) serves batch and
Structured Streaming; the oracles replicate window assignment with
time_bucket / gaps-and-islands SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from ..streaming.windows import session_windows, sliding_window_agg, tumbling_window_agg


def _dec2(c: str) -> F.Column:
    return F.col(c).cast("decimal(18,2)")


def evt_tumbling_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1h windows × event_type: count + exact sum."""
    e = load_table(spark, sf_dir, "events")
    out = tumbling_window_agg(
        e,
        "ts",
        "1 hour",
        ["event_type"],
        [F.count("*").alias("n"), F.sum(_dec2("value")).cast("double").alias("sum_value")],
    )
    return out.select("window_start", "event_type", "n", "sum_value")


EVT_TUMBLING_SQL = """
SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events GROUP BY 1, 2
"""


def evt_sliding_1h_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1h/30m windows: every event lands in exactly 2 windows."""
    e = load_table(spark, sf_dir, "events")
    out = sliding_window_agg(
        e, "ts", "1 hour", "30 minutes", ["event_type"], [F.count("*").alias("n")]
    )
    return out.select("window_start", "event_type", "n")


EVT_SLIDING_SQL = """
WITH assigned AS (
  SELECT time_bucket(INTERVAL '30 minutes', ts) AS window_start, event_type FROM events
  UNION ALL
  SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes' AS window_start, event_type
  FROM events
)
SELECT window_start, event_type, COUNT(*) AS n
FROM assigned GROUP BY 1, 2
"""


def evt_session_10m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows with a 10-minute inactivity gap.
    session_end = last event + gap (Spark session_window semantics)."""
    e = load_table(spark, sf_dir, "events")
    out = session_windows(
        e,
        "ts",
        "10 minutes",
        ["user_id"],
        [F.count("*").alias("n_events"), F.sum(_dec2("value")).cast("double").alias("sum_value")],
    )
    return out.select("user_id", "session_start", "session_end", "n_events", "sum_value")


EVT_SESSION_SQL = """
WITH ordered AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL '10 minutes'
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
), islands AS (
  SELECT user_id, ts, value,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM ordered
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL '10 minutes' AS session_end,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM islands GROUP BY user_id, session_id
"""


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``readStream`` over the events table. events.ts has shipped as
    both TIMESTAMP(NANOS) (no native Spark type — read as long,
    truncate to µs) and plain TIMESTAMP(MICROS); probe the batch footer
    for the actual type, same branch as sources/catalog.load_table."""
    import os

    from pyspark.sql.types import LongType

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema
    # the streaming file source wants a directory: scan sf_dir with a
    # glob filter that admits only the events table
    raw = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if isinstance(schema["ts"].dataType, LongType):
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # TIMESTAMP_NTZ vintage: watermarks demand TIMESTAMP (LTZ); with
    # the session pinned to UTC the cast is value-preserving
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def evt_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE Structured Streaming path: ``readStream`` file source →
    watermarked tumbling counts (streaming/windows.py
    stream_tumbling_counts) → memory sink, availableNow trigger.

    All rows arrive in one micro-batch here, so the 30-minute watermark
    drops nothing and the result equals the batch tumbling aggregation —
    which is exactly the oracle below. At scale the same query runs on a
    live source with bounded state (late rows beyond the watermark are
    evicted)."""
    import uuid

    from ..streaming.windows import stream_tumbling_counts

    stream = _events_stream(spark, sf_dir)
    windowed = stream_tumbling_counts(
        stream, "ts", "1 hour", ["event_type"], watermark="30 minutes"
    )
    qname = "evt_stream_" + uuid.uuid4().hex[:8]
    q = (
        windowed.writeStream.format("memory")
        .queryName(qname)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    finished = q.awaitTermination(300)
    if not finished:
        q.stop()
        raise TimeoutError(
            "evt_stream_tumbling: availableNow stream did not finish in 300s; "
            "refusing to return partial window counts"
        )
    return spark.table(qname).select(
        F.col("window.start").alias("window_start"), "event_type", "n_events"
    )


EVT_STREAM_SQL = """
SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
       COUNT(*) AS n_events
FROM events GROUP BY 1, 2
"""


def evt_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join with watermarks on BOTH sides: for each
    click, the purchases by the same user within the next 30 minutes
    (funnel attribution). The event-time range condition is what lets
    Spark bound the join state — click state older than the purchase
    watermark minus 30 minutes is evicted; without it the state grows
    forever. availableNow delivers everything in order here, so the
    result equals the batch time-range self-join (the oracle)."""
    import uuid

    clicks = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "30 minutes")
    )
    purchases = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "30 minutes")
    )
    joined = clicks.join(
        purchases,
        on=[
            clicks.user_id == purchases.p_user_id,
            purchases.purchase_ts >= clicks.click_ts,
            purchases.purchase_ts
            <= clicks.click_ts + F.expr("INTERVAL 30 MINUTES"),
        ],
    ).select(
        "click_id",
        "purchase_id",
        "user_id",
        (
            F.unix_timestamp("purchase_ts") - F.unix_timestamp("click_ts")
        ).alias("gap_s"),
    )
    qname = "evt_sjoin_" + uuid.uuid4().hex[:8]
    # A stream-stream join maintains FOUR state stores per shuffle
    # partition per micro-batch; at the default 32 partitions the state
    # checkpointing dominates this bounded demo (~3× the join itself).
    # Scope a smaller fan-out to this stream — on a real cluster with a
    # high-volume source the right number is executor-count-sized, set
    # here per-query because shuffle.partitions is session-wide.
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            joined.writeStream.format("memory")
            .queryName(qname)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        finished = q.awaitTermination(300)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    if not finished:
        q.stop()
        raise TimeoutError(
            "evt_stream_join: availableNow stream did not finish in 300s; "
            "refusing to return partial join results"
        )
    return spark.table(qname)


EVT_STREAM_JOIN_SQL = """
SELECT a.event_id AS click_id, b.event_id AS purchase_id,
       a.user_id AS user_id,
       CAST(date_diff('second', a.ts, b.ts) AS BIGINT) AS gap_s
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND a.event_type = 'click' AND b.event_type = 'purchase'
 AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 30 MINUTE
"""


def evt_stream_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment: the event stream joins a BATCH dim
    table (no watermark needed on the static side — Spark re-plans the
    dim per micro-batch, the streaming analogue of a broadcast dim
    join) and rolls up weighted value per type."""
    import uuid

    dim = spark.createDataFrame(
        [("click", 2.0), ("view", 0.5), ("purchase", 25.0), ("signup", 10.0)],
        "event_type string, weight double",
    )
    stream = _events_stream(spark, sf_dir)
    enriched = (
        stream.join(F.broadcast(dim), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(
                (F.col("value").cast("decimal(18,3)") * F.col("weight").cast("decimal(8,1)"))
            )
            .cast("double")
            .alias("weighted_value"),
        )
    )
    qname = "evt_enrich_" + uuid.uuid4().hex[:8]
    q = (
        enriched.writeStream.format("memory")
        .queryName(qname)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError("evt_stream_enrich did not finish in 300s")
    return spark.table(qname)


EVT_STREAM_ENRICH_SQL = """
WITH dim(event_type, weight) AS (
  VALUES ('click', 2.0), ('view', 0.5), ('purchase', 25.0), ('signup', 10.0)
)
SELECT e.event_type, COUNT(*) AS n,
       CAST(SUM(CAST(e.value AS DECIMAL(18,3)) * CAST(d.weight AS DECIMAL(8,1))) AS DOUBLE)
         AS weighted_value
FROM events e JOIN dim d ON e.event_type = d.event_type
GROUP BY 1
"""


def evt_stream_upsert(
    spark: SparkSession, sf_dir: str, target_root: str | None = None
) -> DataFrame:
    """foreachBatch upsert sink — the production pattern for sinks with
    no native streaming writer: each micro-batch MERGEs into a keyed
    parquet table, keeping the latest event per user (dedup on write).
    Batch-local dedup picks the max-ts row per user (event_id as the
    deterministic tie-break), then the merge publishes the union of
    the existing snapshot and the batch, re-deduped. The final table is
    therefore the global latest-event-per-user — exactly the oracle's
    row_number() = 1 query.

    The sink is the cluster-safe ``VersionedParquetTable`` (immutable
    ``state_v{N}`` directories + an atomic ``_LATEST`` commit marker —
    streaming/upsert_sink.py): any Hadoop-compatible ``target_root``
    URI works (HDFS/S3A/local); a crash between data write and marker
    write leaves the previous committed snapshot intact. Locally the
    default is a throwaway tempdir."""
    import shutil
    import tempfile
    import uuid

    from ..streaming.upsert_sink import VersionedParquetTable, keyed_upsert_batch

    scratch = tempfile.mkdtemp(prefix="bigdata_spark_upsert_")
    if target_root is None:
        target_root = f"{scratch}/state"

    def merge_batch(batch: DataFrame, batch_id: int) -> None:
        table = VersionedParquetTable(batch.sparkSession, target_root)
        keyed_upsert_batch(
            table,
            batch,
            key_cols=["user_id"],
            order_cols=[F.desc("ts"), F.desc("event_id")],
            value_cols=["ts", "event_id", "event_type", "value"],
        )

    stream = _events_stream(spark, sf_dir)
    q = (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", f"{scratch}/ckpt_{uuid.uuid4().hex[:8]}")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError("evt_stream_upsert did not finish in 300s")
    try:
        snapshot = VersionedParquetTable(spark, target_root).read()
        if snapshot is None:
            raise RuntimeError("upsert sink published no version")
        final = snapshot.select(
            "user_id",
            F.col("ts").alias("last_ts"),
            F.col("event_type").alias("last_type"),
        )
        out = final.toPandas()
    finally:
        # scratch holds the checkpoint (and, for the local default, the
        # table itself); an external target_root is left in place.
        shutil.rmtree(scratch, ignore_errors=True)
    return spark.createDataFrame(out)


EVT_STREAM_UPSERT_SQL = """
SELECT user_id, ts AS last_ts, event_type AS last_type
FROM (
  SELECT user_id, ts, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rk
  FROM events
) WHERE rk = 1
"""


def evt_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Built-in streaming dedup: ``dropDuplicatesWithinWatermark`` —
    the API-surface twin of the custom applyInPandasWithState
    first-seen dedup (dedup_stream_firstseen). Each event in a sampled
    slice is duplicated twice in-stream (explode), then deduped on
    event_id inside a 30-minute watermark; state for an id is dropped
    once the watermark passes it, so state is bounded at scale. In
    this availableNow run everything lands in one micro-batch and the
    result must equal the distinct slice — the oracle."""
    import uuid

    stream = _events_stream(spark, sf_dir)
    doubled = (
        stream.filter(F.col("event_id") % 50 == 0)
        .withColumn("_copy", F.explode(F.array(F.lit(0), F.lit(1))))
        .drop("_copy")
        .withWatermark("ts", "30 minutes")
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    qname = "evt_dedup_" + uuid.uuid4().hex[:8]
    q = (
        doubled.writeStream.format("memory")
        .queryName(qname)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(
            "evt_stream_dedup: availableNow stream did not finish in 300s"
        )
    return spark.table(qname).groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("event_id").alias("n_unique"),
    )


EVT_STREAM_DEDUP_SQL = """
SELECT event_type,
       COUNT(DISTINCT event_id) AS n_events,
       COUNT(DISTINCT event_id) AS n_unique
FROM events WHERE event_id % 50 = 0
GROUP BY event_type
"""


def evt_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly-bucket anomaly detection per event_type: flag buckets
    whose mean deviates ≥ 3 standard ERRORS (σ/√n — the z-test for a
    bucket mean, so detection power holds as buckets grow with scale)
    from the type's global stats. All
    inputs to the float math are exact decimal totals (sum, sum-of-
    squares at 4 decimals, counts), and mean/variance/z take the SAME
    IEEE op order as the oracle, so a float-heavy statistical query
    still hash-matches bit-for-bit. Two partial-aggregated groupBys +
    a broadcast join of the per-type stats."""
    e = load_table(spark, sf_dir, "events")
    v2 = F.col("value").cast("decimal(18,2)")
    sq = (v2 * v2).cast("decimal(38,4)")
    buckets = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("bucket")
    ).agg(F.sum(v2).alias("b_sum"), F.count("*").alias("b_n"))
    stats = e.groupBy("event_type").agg(
        F.sum(v2).alias("g_sum"), F.sum(sq).alias("g_sumsq"),
        F.count("*").alias("g_n"),
    )
    mean = F.col("g_sum").cast("double") / F.col("g_n")
    var = (
        F.col("g_sumsq").cast("double")
        - F.col("g_sum").cast("double") * F.col("g_sum").cast("double") / F.col("g_n")
    ) / F.col("g_n")
    b_mean = F.col("b_sum").cast("double") / F.col("b_n")
    # standard error of a bucket MEAN is sigma/sqrt(n) — this is the
    # z-test for means, and it keeps detection power constant as bucket
    # populations grow with scale factor
    z = (b_mean - F.col("mean")) / F.sqrt(F.col("var") / F.col("b_n"))
    return (
        buckets.join(
            F.broadcast(stats.select("event_type", mean.alias("mean"), var.alias("var"))),
            "event_type",
        )
        .withColumn("z", z)
        .filter(F.abs(F.col("z")) >= 3.0)
        .select(
            "event_type", "bucket", "b_n",
            F.round(b_mean, 9).alias("bucket_mean"),
            F.round("z", 9).alias("z"),
        )
    )


EVT_ANOMALY_SQL = """
WITH buckets AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket,
         SUM(CAST(value AS DECIMAL(18,2))) AS b_sum, COUNT(*) AS b_n
  FROM events GROUP BY 1, 2
),
stats AS (
  SELECT event_type,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS mean,
         (CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS DOUBLE)
          - CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
            * CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
         ) / COUNT(*) AS var
  FROM events GROUP BY 1
)
SELECT b.event_type, b.bucket, b.b_n,
       ROUND(CAST(b.b_sum AS DOUBLE) / b.b_n, 9) AS bucket_mean,
       ROUND((CAST(b.b_sum AS DOUBLE) / b.b_n - s.mean) / sqrt(s.var / b.b_n), 9) AS z
FROM buckets b JOIN stats s USING (event_type)
WHERE abs((CAST(b.b_sum AS DOUBLE) / b.b_n - s.mean) / sqrt(s.var / b.b_n)) >= 3.0
"""


def evt_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis (view → click → purchase, each step
    STRICTLY after the previous): the sequential-pattern query every
    product-analytics stack ships. Expressed as three chained
    conditional-min aggregations — each step is a partial-aggregated
    groupBy on user_id plus one join back, so the plan is three
    shuffles on the same key (AQE coalesces them), no window over the
    whole event stream and no Python."""
    e = load_table(spark, sf_dir, "events")
    u1 = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    u2 = (
        e.filter(F.col("event_type") == "click")
        .join(u1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    u3 = (
        e.filter(F.col("event_type") == "purchase")
        .join(u2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    # four scalar aggregates crossJoined into ONE lazy row — a single
    # Spark job at action time, not four separate .count() actions
    return (
        e.agg(F.countDistinct("user_id").alias("n_users"))
        .crossJoin(u1.agg(F.count("*").alias("step_view")))
        .crossJoin(u2.agg(F.count("*").alias("step_click")))
        .crossJoin(u3.agg(F.count("*").alias("step_purchase")))
    )


EVT_FUNNEL_SQL = """
WITH u1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY 1
),
u2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN u1 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > u1.t1 GROUP BY 1
),
u3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN u2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > u2.t2 GROUP BY 1
)
SELECT (SELECT COUNT(DISTINCT user_id) FROM events) AS n_users,
       (SELECT COUNT(*) FROM u1) AS step_view,
       (SELECT COUNT(*) FROM u2) AS step_click,
       (SELECT COUNT(*) FROM u3) AS step_purchase
"""


def evt_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen week,
    counted distinct per (cohort, week-offset). Two partial-aggregated
    groupBys (first-seen per user; distinct user-weeks) and one join on
    user_id — the standard warehouse shape, no window functions
    needed."""
    e = load_table(spark, sf_dir, "events")
    wk = F.date_trunc("week", F.col("ts"))
    first = e.groupBy("user_id").agg(F.min(wk).alias("cohort_week"))
    active = e.select("user_id", wk.alias("week")).distinct()
    return (
        active.join(first, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff("week", "cohort_week") / 7).cast("long").alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


EVT_RETENTION_SQL = """
WITH first AS (
  SELECT user_id, MIN(date_trunc('week', ts)) AS cohort_week
  FROM events GROUP BY 1
),
active AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM events
)
SELECT f.cohort_week,
       CAST(date_diff('day', f.cohort_week, a.week) / 7 AS BIGINT) AS week_offset,
       COUNT(DISTINCT a.user_id) AS n_users
FROM active a JOIN first f USING (user_id)
GROUP BY 1, 2
"""


def _events_ts_bounds_us(sf_dir: str) -> tuple[int, int] | None:
    """Exact (min, max) of events.ts in epoch microseconds from the
    parquet FOOTER statistics — a driver-side metadata read replacing
    one full-scan min/max job per staged-stream query (guide §6;
    min/max are row-group-stat exact, and ns→µs floor-division commutes
    with min/max because it is monotone). Returns None when any
    row group lacks stats — callers fall back to the aggregate."""
    import os

    try:
        import pyarrow.parquet as pq

        path = os.path.join(sf_dir, "events.parquet")
        files = (
            sorted(
                os.path.join(path, f)
                for f in os.listdir(path)
                if f.endswith(".parquet")
            )
            if os.path.isdir(path)
            else [path]
        )
        lo = hi = None
        for fp in files:
            pf = pq.ParquetFile(fp)
            idx = pf.schema_arrow.get_field_index("ts")
            unit = getattr(pf.schema_arrow.field(idx).type, "unit", None)
            md = pf.metadata
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                if st is None or not st.has_min_max:
                    return None
                mn, mx = int(st.min_raw), int(st.max_raw)
                if unit == "ns" or unit is None:
                    # NANOS vintage ships as int64 nanos (see
                    # sources/catalog.py) — truncate exactly like the
                    # load path's `ts div 1000`
                    mn, mx = mn // 1000, mx // 1000
                elif unit == "ms":
                    mn, mx = mn * 1000, mx * 1000
                lo = mn if lo is None else min(lo, mn)
                hi = mx if hi is None else max(hi, mx)
        if lo is None:
            return None
        return lo, hi
    except Exception:
        return None


def _stage_quarter_files(
    spark: SparkSession,
    e: DataFrame,
    scratch: str,
    n_parts: int = 4,
    bounds_us: tuple[int, int] | None = None,
) -> list[list[str]]:
    """Write a batch frame as ``n_parts`` chronological parquet file
    groups (ONE partitionBy pass) and return the staged file paths per
    quarter. Quarter boundaries are exact integer microseconds —
    quarter(ts) = least(n-1, (us(ts) - lo) div max(1, (hi - lo) div n))
    — so an oracle can replicate the per-quarter row assignment.

    ``bounds_us``: exact (min, max) epoch-µs of e.ts when the caller
    already knows them (footer stats via _events_ts_bounds_us — valid
    ONLY for an unfiltered projection of the events table); None runs
    the min/max aggregate."""
    import glob
    import os

    if bounds_us is None:
        row = e.agg(
            F.min(F.unix_micros(F.col("ts").cast("timestamp"))).alias("lo"),
            F.max(F.unix_micros(F.col("ts").cast("timestamp"))).alias("hi"),
        ).first()
        bounds_us = (int(row["lo"]), int(row["hi"]))
    lo_us, hi_us = bounds_us
    span_us = max(1, (hi_us - lo_us) // n_parts)
    q_col = F.least(
        F.lit(n_parts - 1),
        F.expr(
            f"(unix_micros(CAST(ts AS TIMESTAMP)) - {lo_us}L) div {span_us}L"
        ),
    ).cast("int")
    staged = os.path.join(scratch, "staged")
    (
        e.withColumn("_q", q_col)
        .repartition("_q")
        .write.partitionBy("_q")
        .mode("overwrite")
        .parquet(staged)
    )
    return [
        sorted(glob.glob(os.path.join(staged, f"_q={i}", "*.parquet")))
        for i in range(n_parts)
    ]


import contextlib


@contextlib.contextmanager
def _stream_state_partitions(spark: SparkSession, n: int = 4):
    """Temporarily shrink ``spark.sql.shuffle.partitions`` for a
    multi-trigger stateful stream and restore it afterwards.

    A streaming agg opens one state store PER shuffle partition PER
    micro-batch; at this harness's state size (thousands of windows)
    32 stores × 4 triggers is pure fixed overhead (~1.2 s/trigger at
    32 → ~0.6 s at 4, measured). Safe here because every bench stream starts
    from a fresh checkpoint — a production stream sizes this to state
    volume once at first start (the checkpoint pins it thereafter)."""
    key = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(key)
    spark.conf.set(key, str(n))
    try:
        yield
    finally:
        spark.conf.set(key, prev)


def _stage_chronological_stream(
    spark: SparkSession,
    e: DataFrame,
    scratch: str,
    n_parts: int = 4,
    sf_dir: str | None = None,
) -> DataFrame:
    """Re-stage a batch frame as ``n_parts`` chronological parquet
    files and return a ``readStream`` over them with
    ``maxFilesPerTrigger=1`` — the harness that forces REAL multi-
    micro-batch execution (and genuine watermark advancement) out of a
    static table.

    ``sf_dir``: when e is an UNFILTERED projection of the events table,
    passing its directory lets the quarter bounds come from the parquet
    footer stats instead of a full-scan min/max job."""
    import os
    import shutil

    bounds = _events_ts_bounds_us(sf_dir) if sf_dir else None
    groups = _stage_quarter_files(spark, e, scratch, n_parts, bounds_us=bounds)
    indir = os.path.join(scratch, "in")
    os.makedirs(indir, exist_ok=True)
    for i, parts in enumerate(groups):
        for j, src in enumerate(parts):
            shutil.copy(src, os.path.join(indir, f"{i:02d}_{j}.parquet"))
    return (
        spark.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(indir)
        # NTZ vintage: watermarks demand TIMESTAMP (LTZ); the session
        # is pinned UTC so the cast is value-preserving (same branch
        # as _events_stream)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )


def evt_stream_multibatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTI-micro-batch Structured Streaming (every other streaming
    entry drains in one availableNow batch): events are re-staged as
    four chronological part files and ``maxFilesPerTrigger=1`` forces
    four micro-batches, so the watermark genuinely ADVANCES across
    batches. The tumbling aggregation runs in APPEND mode — the mode
    where the watermark has visible semantics: a window is emitted only
    once the watermark passes its end, and the last 30 minutes of event
    time stay in state, never emitted. The oracle replicates exactly
    that: batch tumbling counts restricted to windows closed by the
    final watermark (global max ts − 30 min)."""
    import glob
    import os
    import shutil
    import tempfile
    import uuid

    e = load_table(spark, sf_dir, "events").select("ts", "event_type")
    scratch = tempfile.mkdtemp(prefix="bigdata_spark_mb_")
    try:
        with _stream_state_partitions(spark):
            stream = _stage_chronological_stream(spark, e, scratch, n_parts=4, sf_dir=sf_dir)
            windowed = (
                stream.withWatermark("ts", "30 minutes")
                .groupBy(F.window("ts", "1 hour"), "event_type")
                .agg(F.count("*").alias("n"))
            )
            qname = "evt_mb_" + uuid.uuid4().hex[:8]
            q = (
                windowed.writeStream.format("memory")
                .queryName(qname)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            if not q.awaitTermination(300):
                q.stop()
                raise TimeoutError("evt_stream_multibatch: stream did not finish in 300s")
        out = spark.table(qname).select(
            F.col("window.start").alias("window_start"), "event_type", "n"
        )
        return out.localCheckpoint()
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


EVT_MULTIBATCH_SQL = """
WITH cutoff AS (SELECT MAX(ts) - INTERVAL 30 MINUTE AS wm FROM events)
SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
       COUNT(*) AS n
FROM events, cutoff
GROUP BY 1, 2, cutoff.wm
HAVING window_start + INTERVAL 1 HOUR <= cutoff.wm
"""


def evt_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension Type-2 build (operators/scd.py):
    collapse each user's event_type history into validity intervals —
    one shuffle, both analytic windows share the partitioning/ordering.
    Ties on ts break on event_id, so runs are deterministic."""
    from ..operators.scd import scd2_from_changes

    e = load_table(spark, sf_dir, "events")
    out = scd2_from_changes(
        e, ["user_id"], "event_type", "ts", "event_id"
    )
    return out.select(
        "user_id", "event_type", "valid_from", "valid_to", "is_current"
    )


EVT_SCD2_SQL = """
WITH marked AS (
  SELECT user_id, event_type, ts, event_id,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
), runs AS (
  SELECT user_id, event_type, ts, event_id
  FROM marked WHERE prev IS NULL OR event_type <> prev
)
SELECT user_id, event_type, ts AS valid_from,
       LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
       LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS is_current
FROM runs
"""


def evt_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE Structured Streaming session windows — the streaming twin
    of evt_session_10m (reference has batch windowing only; this is the
    one streaming window type the registry was missing). Watermarked
    ``F.session_window`` keeps per-user open-session state, merging
    sessions as the gap closes; complete output mode emits the final
    merged sessions when the availableNow run drains, which must equal
    the batch gaps-and-islands result — the oracle. Per-session sums
    stay DECIMAL through the final per-user rollup so the cross-session
    re-aggregation is order-independent (hash-exact across engines)."""
    import uuid

    from ..streaming.windows import stream_session_agg

    stream = _events_stream(spark, sf_dir)
    sessions = stream_session_agg(
        stream,
        "ts",
        "10 minutes",
        ["user_id"],
        [F.count("*").alias("n_events"), F.sum(_dec2("value")).alias("sum_dec")],
        watermark="30 minutes",
    )
    qname = "evt_sess_" + uuid.uuid4().hex[:8]
    q = (
        sessions.writeStream.format("memory")
        .queryName(qname)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(
            "evt_stream_session: availableNow stream did not finish in 300s"
        )
    return (
        spark.table(qname)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
            F.max("n_events").alias("max_session_events"),
            F.sum("sum_dec").cast("double").alias("sum_value"),
        )
    )


EVT_STREAM_SESSION_SQL = """
WITH ordered AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL '10 minutes'
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
), islands AS (
  SELECT user_id, ts, value,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM ordered
), sessions AS (
  SELECT user_id, session_id, COUNT(*) AS n_events,
         SUM(CAST(value AS DECIMAL(18,2))) AS sum_dec
  FROM islands GROUP BY user_id, session_id
)
SELECT user_id, COUNT(*) AS n_sessions,
       CAST(SUM(n_events) AS BIGINT) AS n_events,
       MAX(n_events) AS max_session_events,
       CAST(SUM(sum_dec) AS DOUBLE) AS sum_value
FROM sessions GROUP BY user_id
"""


def evt_resample_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style resample + gap-fill (operators/timeseries.py):
    a sparse slice of events (user_id % 7 == 0, so most hourly buckets
    are empty and the interpolation path carries real weight) is rolled
    up to an hourly grid per event_type, with empty buckets linearly
    interpolated between the nearest observations. The mean accumulates
    in fixed-point, so the values are bit-stable under any partition
    layout — that is what lets a float-producing window query carry a
    hash-exact oracle."""
    from ..operators.timeseries import resample_gapfill
    from ..sources.catalog import load_table

    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 7 == 0)
    out = resample_gapfill(e, ["event_type"], "ts", "value", "1 hour", "hour")
    return out.select(
        "event_type",
        "bucket",
        F.round("value_interp", 9).alias("value_interp"),
        "observed",
    )


EVT_GAPFILL_SQL = """
WITH src AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket, value
  FROM events WHERE user_id % 7 = 0
),
agg AS (
  SELECT event_type, bucket,
         (CAST(SUM(CAST(FLOOR(value * 1000000) AS BIGINT)) AS DOUBLE)
          / 1000000 / COUNT(*)) AS v
  FROM src GROUP BY 1, 2
),
span AS (
  SELECT event_type, MIN(bucket) AS lo, MAX(bucket) AS hi FROM agg GROUP BY 1
),
grid AS (
  SELECT event_type, UNNEST(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
  FROM span
),
joined AS (
  SELECT g.event_type, g.bucket, a.v FROM grid g
  LEFT JOIN agg a ON a.event_type = g.event_type AND a.bucket = g.bucket
),
filled AS (
  SELECT event_type, bucket, v,
         last_value(CASE WHEN v IS NOT NULL
                    THEN struct_pack(b := bucket, val := v) END IGNORE NULLS)
           OVER (PARTITION BY event_type ORDER BY bucket
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev,
         first_value(CASE WHEN v IS NOT NULL
                     THEN struct_pack(b := bucket, val := v) END IGNORE NULLS)
           OVER (PARTITION BY event_type ORDER BY bucket
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nxt
  FROM joined
)
SELECT event_type, bucket,
       ROUND(CASE
         WHEN v IS NOT NULL THEN v
         WHEN prev IS NULL THEN nxt.val
         WHEN nxt IS NULL THEN prev.val
         ELSE prev.val + (nxt.val - prev.val)
              * (epoch(bucket) - epoch(prev.b))
              / (epoch(nxt.b) - epoch(prev.b))
       END, 9) AS value_interp,
       v IS NOT NULL AS observed
FROM filled
"""


def evt_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch / last-touch revenue attribution with a 1-hour
    lookback: each purchase joins its user's click/view touches in
    [ts - 1h, ts), channel derived from the touch's props; the
    first/last touch per purchase is a row_number over (ts, event_id)
    — a deterministic total order shared with the oracle. Plan shape:
    one equi-join shuffle on user_id with the range predicate applied
    in-join, then purchase-grained windows (tiny partitions — one per
    conversion), then the channel rollup."""
    e = load_table(spark, sf_dir, "events")
    touches = e.filter(F.col("event_type").isin("click", "view")).select(
        F.col("user_id"),
        F.col("ts").alias("t_ts"),
        F.col("event_id").alias("t_eid"),
        F.concat(
            F.lit("ch"),
            (F.get_json_object("props", "$.k").cast("int") % 5).cast("string"),
        ).alias("channel"),
    )
    conv = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("p_eid"),
        "value",
    )
    cand = conv.join(touches, "user_id").filter(
        F.expr("t_ts >= p_ts - INTERVAL 1 HOUR AND t_ts < p_ts")
    )
    w_first = Window.partitionBy("p_eid").orderBy(
        F.col("t_ts").asc(), F.col("t_eid").asc()
    )
    w_last = Window.partitionBy("p_eid").orderBy(
        F.col("t_ts").desc(), F.col("t_eid").desc()
    )
    first = (
        cand.withColumn("rn", F.row_number().over(w_first))
        .filter(F.col("rn") == 1)
        .select(F.lit("first_touch").alias("model"), "channel", "value")
    )
    last = (
        cand.withColumn("rn", F.row_number().over(w_last))
        .filter(F.col("rn") == 1)
        .select(F.lit("last_touch").alias("model"), "channel", "value")
    )
    return (
        first.unionAll(last)
        .groupBy("model", "channel")
        .agg(
            F.count("*").alias("n_conversions"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("model", "channel")
    )


EVT_ATTRIBUTION_SQL = """
WITH touches AS (
  SELECT user_id, ts AS t_ts, event_id AS t_eid,
         'ch' || CAST(CAST(props->>'$.k' AS INTEGER) % 5 AS VARCHAR) AS channel
  FROM events WHERE event_type IN ('click', 'view')
),
conv AS (
  SELECT user_id, ts AS p_ts, event_id AS p_eid, value
  FROM events WHERE event_type = 'purchase'
),
cand AS (
  SELECT c.p_eid, c.value, t.channel, t.t_ts, t.t_eid
  FROM conv c JOIN touches t ON t.user_id = c.user_id
  WHERE t.t_ts >= c.p_ts - INTERVAL 1 HOUR AND t.t_ts < c.p_ts
),
first AS (
  SELECT 'first_touch' AS model, channel, value FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY p_eid ORDER BY t_ts ASC, t_eid ASC) AS rn
    FROM cand
  ) WHERE rn = 1
),
last AS (
  SELECT 'last_touch' AS model, channel, value FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY p_eid ORDER BY t_ts DESC, t_eid DESC) AS rn
    FROM cand
  ) WHERE rn = 1
)
SELECT model, channel, COUNT(*) AS n_conversions,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM (SELECT * FROM first UNION ALL SELECT * FROM last)
GROUP BY model, channel ORDER BY model, channel
"""


def evt_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value (the financial TWAP kernel): each
    observation holds until the next one, so its weight is the
    interval length. Weights are exact integer microseconds from a
    lead() over (ts, event_id) — a deterministic total order — and the
    value·duration products stay DECIMAL until the final ratio.

    Scale note: the per-series lead is grouped_range_lead — every task
    holds a contiguous (series, time) range and the one boundary row
    per range partition stitches through a #partitions-grain broadcast,
    so parallelism is #partitions regardless of series cardinality."""
    # ts may load as TIMESTAMP_NTZ; with the session pinned to UTC the
    # cast to TIMESTAMP is value-preserving (same branch as _events_stream)
    # the event_type key has bounded cardinality while each series
    # grows with the data — a type-partitioned lead window would sort a
    # whole series in ONE task; grouped_range_lead stitches per-range-
    # partition leads through the tiny per-(partition, type) first-row
    # table instead
    from ..operators.ranking import grouped_range_lead

    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        F.col("value").cast("decimal(18,2)").alias("v"),
    )
    iv = (
        grouped_range_lead(
            e, ["event_type"], ["ts_us", "event_id"], "ts_us", "next_us"
        )
        .select(
            "event_type",
            "v",
            (F.col("next_us") - F.col("ts_us")).alias("dt_us"),
        )
        .filter(F.col("dt_us").isNotNull())
    )
    return (
        iv.groupBy("event_type")
        .agg(
            F.count("*").alias("n_intervals"),
            F.sum("dt_us").alias("total_dur_us"),
            F.sum(F.col("v") * F.col("dt_us")).alias("vdt"),
        )
        .select(
            "event_type",
            "n_intervals",
            "total_dur_us",
            F.expr("CAST(vdt AS DOUBLE) / total_dur_us").alias("twap"),
        )
        .orderBy("event_type")
    )


EVT_TWAP_SQL = """
WITH iv AS (
  SELECT event_type,
         CAST(value AS DECIMAL(18,2)) AS v,
         epoch_us(LEAD(ts) OVER (PARTITION BY event_type ORDER BY ts, event_id))
         - epoch_us(ts) AS dt_us
  FROM events
)
SELECT event_type,
       COUNT(*) AS n_intervals,
       CAST(SUM(dt_us) AS BIGINT) AS total_dur_us,
       CAST(SUM(v * dt_us) AS DOUBLE) / CAST(SUM(dt_us) AS BIGINT) AS twap
FROM iv WHERE dt_us IS NOT NULL
GROUP BY event_type ORDER BY event_type
"""


def evt_stream_update_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UPDATE output mode across three real micro-batches — the third
    output mode (append and complete are covered elsewhere). Each
    batch emits the CHANGED (window × type) counts; a window touched
    by several batches emits several monotonically growing rows, so
    max(n) per key is the final state and must equal the plain batch
    tumbling count (the oracle). That equality is exactly the
    cross-batch state-continuity guarantee update mode makes: counts
    accumulate in the state store, they don't restart per batch.
    (Three batches, not four: cross-batch continuity needs windows
    spanning a batch boundary, which chronological thirds already
    give every busy window; the fourth trigger only re-proved it at
    ~0.7 s/trigger. evt_stream_multibatch keeps four — append mode's
    watermark semantics need the longer advancement run.)"""
    import shutil
    import tempfile
    import uuid

    e = load_table(spark, sf_dir, "events").select("ts", "event_type")
    scratch = tempfile.mkdtemp(prefix="bigdata_spark_upd_")
    try:
        with _stream_state_partitions(spark):
            stream = _stage_chronological_stream(spark, e, scratch, n_parts=3, sf_dir=sf_dir)
            windowed = (
                stream.withWatermark("ts", "30 minutes")
                .groupBy(F.window("ts", "1 hour"), "event_type")
                .agg(F.count("*").alias("n"))
            )
            qname = "evt_upd_" + uuid.uuid4().hex[:8]
            q = (
                windowed.writeStream.format("memory")
                .queryName(qname)
                .outputMode("update")
                .trigger(availableNow=True)
                .start()
            )
            if not q.awaitTermination(300):
                q.stop()
                raise TimeoutError(
                    "evt_stream_update_mode: stream did not finish in 300s"
                )
        out = (
            spark.table(qname)
            .groupBy(F.col("window.start").alias("window_start"), "event_type")
            .agg(F.max("n").alias("n"))
        )
        return out.localCheckpoint()
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


EVT_UPDATE_MODE_SQL = """
SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
       COUNT(*) AS n
FROM events GROUP BY 1, 2
"""


def evt_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-path transition matrix (Markov first-order): per user,
    events order on (ts, event_id) and each consecutive pair counts a
    prev_type → next_type transition; probabilities are exact rationals
    over the per-prev totals. One window shuffle on user_id, one
    rollup — the product-analytics 'path analysis' kernel."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = e.select(
        "user_id",
        F.lag("event_type").over(w).alias("prev_type"),
        F.col("event_type").alias("next_type"),
    ).filter(F.col("prev_type").isNotNull())
    counts = t.groupBy("prev_type", "next_type").agg(F.count("*").alias("n"))
    totals = counts.groupBy("prev_type").agg(F.sum("n").alias("tot"))
    return (
        counts.join(F.broadcast(totals), "prev_type")
        .select(
            "prev_type",
            "next_type",
            "n",
            F.expr("CAST(n AS DOUBLE) / tot").alias("p"),
        )
        .orderBy("prev_type", "next_type")
    )


EVT_TRANSITIONS_SQL = """
WITH t AS (
  SELECT LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
         event_type AS next_type
  FROM events
),
counts AS (
  SELECT prev_type, next_type, COUNT(*) AS n
  FROM t WHERE prev_type IS NOT NULL GROUP BY 1, 2
),
tot AS (SELECT prev_type, SUM(n) AS tot FROM counts GROUP BY 1)
SELECT c.prev_type, c.next_type, c.n, CAST(c.n AS DOUBLE) / t.tot AS p
FROM counts c JOIN tot t USING (prev_type)
ORDER BY c.prev_type, c.next_type
"""


def w7_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-framed window (vs the ROWS frames elsewhere): per event,
    the user's rolling 1-hour value sum and event count — the frame is
    defined by event-TIME distance, not row position, so ties and
    irregular spacing behave correctly. Spark needs a numeric ordering
    column for rangeBetween → exact integer microseconds; DuckDB uses
    the equivalent RANGE INTERVAL frame over ts. One shuffle on
    user_id."""
    e = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.col("value").cast("decimal(18,2)").alias("v"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    hour_us = 3_600_000_000
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-hour_us, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        F.count("*").over(w).alias("n_last_hour"),
        F.sum("v").over(w).cast("double").alias("sum_last_hour"),
    ).orderBy("event_id")


W7_RANGE_SQL = """
SELECT event_id, user_id,
       COUNT(*) OVER w AS n_last_hour,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_last_hour
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
ORDER BY event_id
"""


def w8_islands_rle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: run-length encode consecutive same-type events
    per user, then census the islands per event_type.

    The classic sessionless streak workload (consecutive logins, retry
    storms, sensor plateaus). Island ids come from the lag-change
    cumulative-sum trick — two windows over the SAME (user_id; ts,
    event_id) partitioning/order, so Catalyst evaluates them in one
    sort + one pass, one shuffle on user_id total; the island census is
    an ordinary two-level aggregation. Ordering ties on ts are broken
    by the unique event_id, so the encoding is deterministic."""
    e = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    chg = (
        F.lag("event_type").over(w).isNull()
        | (F.lag("event_type").over(w) != F.col("event_type"))
    ).cast("long")
    islands = (
        e.withColumn("chg", chg)
        .withColumn(
            "island",
            F.sum("chg").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy("user_id", "island", "event_type")
        .agg(F.count("*").alias("run_len"))
    )
    return (
        islands.groupBy("event_type")
        .agg(
            F.count("*").alias("n_islands"),
            F.max("run_len").alias("max_run"),
            F.sum("run_len").alias("n_events"),
            F.sum(F.when(F.col("run_len") >= 3, 1).otherwise(0)).alias(
                "n_streaks_3plus"
            ),
        )
        .orderBy("event_type")
    )


W8_ISLANDS_SQL = """
WITH ordered AS (
  SELECT user_id, event_type, ts, event_id,
         CASE WHEN LAG(event_type) OVER w IS NULL
                OR LAG(event_type) OVER w <> event_type
              THEN 1 ELSE 0 END AS chg
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
tagged AS (
  SELECT user_id, event_type,
         SUM(chg) OVER (PARTITION BY user_id
                        ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS island
  FROM ordered
),
islands AS (
  SELECT user_id, island, event_type, COUNT(*) AS run_len
  FROM tagged GROUP BY 1, 2, 3
)
SELECT event_type,
       COUNT(*) AS n_islands,
       CAST(MAX(run_len) AS BIGINT) AS max_run,
       CAST(SUM(run_len) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN run_len >= 3 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_streaks_3plus
FROM islands
GROUP BY event_type
ORDER BY event_type
"""


def evt_calendar_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generated calendar-spine dimension joined back to the fact —
    the ubiquitous BI pattern that surfaces ZERO-activity days (a
    plain GROUP BY date silently drops them).

    The spine comes from `sequence()` over the observed [min, max]
    date range — generated, never stored, no driver round-trip (the
    min/max row feeds sequence+explode directly). Day-of-week avoids
    the engines' conflicting dayofweek() conventions by deriving from
    days-since-epoch arithmetic (1970-01-01 + 4 ≡ Thursday), identical
    text both sides. The per-day rollup is one partial-agg shuffle;
    the spine left-join is broadcast (a few thousand days even for a
    decade of data)."""
    e = load_table(spark, sf_dir, "events").select(
        F.to_date(F.col("ts").cast("timestamp")).alias("d"),
        "user_id",
        F.col("value").cast("decimal(18,2)").alias("v"),
    )
    spine = (
        e.agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
        .select(F.explode(F.sequence("d0", "d1")).alias("d"))
    )
    per_day = e.groupBy("d").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum("v").cast("double").alias("value_sum"),
    )
    dow = "(datediff(d, DATE '1970-01-01') + 4) % 7"
    return (
        spine.join(per_day, "d", "left_outer")
        .select(
            "d",
            F.expr(dow).cast("long").alias("dow"),
            F.expr(f"({dow}) IN (0, 6)").alias("is_weekend"),
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.coalesce("n_users", F.lit(0)).alias("n_users"),
            F.coalesce("value_sum", F.lit(0.0)).alias("value_sum"),
        )
        .orderBy("d")
    )


EVT_CALENDAR_SQL = """
WITH e AS (
  SELECT CAST(ts AS DATE) AS d, user_id, CAST(value AS DECIMAL(18,2)) AS v
  FROM events
),
bounds AS (SELECT MIN(d) AS d0, MAX(d) AS d1 FROM e),
spine AS (
  SELECT CAST(UNNEST(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS d
  FROM bounds
),
per_day AS (
  SELECT d, COUNT(*) AS n_events, COUNT(DISTINCT user_id) AS n_users,
         CAST(SUM(v) AS DOUBLE) AS value_sum
  FROM e GROUP BY d
)
SELECT s.d,
       CAST((datediff('day', DATE '1970-01-01', s.d) + 4) % 7 AS BIGINT) AS dow,
       ((datediff('day', DATE '1970-01-01', s.d) + 4) % 7) IN (0, 6) AS is_weekend,
       COALESCE(p.n_events, 0) AS n_events,
       COALESCE(p.n_users, 0) AS n_users,
       COALESCE(p.value_sum, 0.0) AS value_sum
FROM spine s LEFT JOIN per_day p ON p.d = s.d
ORDER BY s.d
"""


def evt_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum concurrent user sessions (the classic sweep-line /
    interval-counting problem): sessionize per user (10-min gap), emit
    +1 at session start and −1 at session end, and the peak of the
    running sum is the answer.

    The naive sweep is a GLOBAL ordered cumsum — a one-task sort at
    100 TB. Here it is operators/ranking.range_cumsum: deltas cumsum
    within range partitions of (t, d) and per-partition prefix totals
    broadcast back, so parallelism = #partitions (not #days, which is
    time-span-bounded) while the result is exactly the global sweep. Ties order (t, delta) so ends free slots before
    same-instant starts (end-exclusive intervals)."""
    gap_us = 600_000_000
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_us")
    new_sess = (
        F.lag("ts_us").over(w).isNull()
        | (F.col("ts_us") - F.lag("ts_us").over(w) >= gap_us)
    ).cast("long")
    sess = (
        e.withColumn("ns", new_sess)
        .withColumn(
            "sid",
            F.sum("ns").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy("user_id", "sid")
        .agg(
            F.min("ts_us").alias("s"),
            (F.max("ts_us") + gap_us).alias("e"),
        )
    )
    deltas = sess.select(F.col("s").alias("t"), F.lit(1).alias("d")).unionAll(
        sess.select(F.col("e").alias("t"), F.lit(-1).alias("d"))
    )
    # global sweep-line running sum via range_cumsum: every task holds
    # a contiguous (t, d) range (ends sort before starts at the same
    # instant: −1 < +1) and per-partition prefix totals broadcast — no
    # day-bucketed carry chain, parallelism = #partitions at any scale.
    # (t, d) is not a total key, but tied rows carry IDENTICAL deltas,
    # so the multiset of running values — hence the peak and its first
    # timestamp — is order-independent within a tie group.
    from ..operators.ranking import range_cumsum

    conc = range_cumsum(deltas, ["t", "d"], "d", "concurrency")
    peak = conc.agg(F.max("concurrency").alias("peak_concurrency"))
    return (
        peak.crossJoin(
            sess.agg(F.count("*").alias("n_sessions"))
        )
        .crossJoin(
            conc.join(F.broadcast(peak), conc.concurrency == peak.peak_concurrency)
            .agg(F.min("t").alias("first_peak_us"))
        )
        .select("n_sessions", "peak_concurrency", "first_peak_us")
    )


EVT_PEAK_SQL = """
WITH e AS (
  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events
),
marked AS (
  SELECT user_id, ts_us,
         CASE WHEN LAG(ts_us) OVER w IS NULL
                OR ts_us - LAG(ts_us) OVER w >= 600000000
              THEN 1 ELSE 0 END AS ns
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)
),
tagged AS (
  SELECT user_id, ts_us,
         SUM(ns) OVER (PARTITION BY user_id ORDER BY ts_us
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM marked
),
sess AS (
  SELECT user_id, CAST(MIN(ts_us) AS BIGINT) AS s,
         CAST(MAX(ts_us) + 600000000 AS BIGINT) AS e
  FROM tagged GROUP BY user_id, sid
),
deltas AS (
  SELECT s AS t, 1 AS d FROM sess
  UNION ALL
  SELECT e AS t, -1 AS d FROM sess
),
swept AS (
  SELECT t, SUM(d) OVER (ORDER BY t, d
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS concurrency
  FROM deltas
),
peak AS (SELECT CAST(MAX(concurrency) AS BIGINT) AS peak_concurrency FROM swept)
SELECT (SELECT COUNT(*) FROM sess) AS n_sessions,
       p.peak_concurrency,
       (SELECT CAST(MIN(t) AS BIGINT) FROM swept s
        WHERE s.concurrency = p.peak_concurrency) AS first_peak_us
FROM peak p
"""


def evt_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM mean-shift detection per event series, kept EXACT: the
    classic statistic S_t = Σ(x_i − mean) needs the rational mean, so
    everything is scaled by n — T_t = n·cumsum(x) − t·total is an
    integer (value in exact millis), and the drift range
    (max T − min T)/(n·scale) divides only at the end. A series whose
    mean shifts mid-stream shows a large range; a stable series stays
    near zero. The per-series rank/cumsum/total come from ONE
    grouped_range_rank pass (range-partitioned — no task ever sorts a
    whole series); the final statistic is a projection."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        (F.col("value").cast("decimal(18,3)") * 1000).cast("long").alias("v_mill"),
    )
    # the event_type key has bounded cardinality while each series grows
    # with the data — a type-partitioned window would sort one series in
    # ONE task at any scale; grouped_range_rank fuses the per-series
    # rank, running sum, count and total into one range-partitioned pass
    from ..operators.ranking import grouped_range_rank

    t = grouped_range_rank(
        e,
        ["event_type"],
        ["ts_us", "event_id"],
        "rn",
        count_col="n",
        sum_col="v_mill",
        cumsum_col="cum",
        total_col="total",
    ).withColumn(
        "t_stat", F.col("n") * F.col("cum") - F.col("rn") * F.col("total")
    )
    return (
        t.groupBy("event_type")
        .agg(
            F.max("n").alias("n"),
            F.max("t_stat").alias("t_max"),
            F.min("t_stat").alias("t_min"),
        )
        .select(
            "event_type",
            "n",
            F.expr(
                "CAST(t_max - t_min AS DOUBLE) / (CAST(n AS DOUBLE) * 1000)"
            ).alias("cusum_range"),
        )
        .orderBy("event_type")
    )


EVT_CUSUM_SQL = """
WITH e AS (
  SELECT event_type, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
         CAST(CAST(value AS DECIMAL(18,3)) * 1000 AS BIGINT) AS v_mill
  FROM events
),
t AS (
  SELECT event_type,
         COUNT(*) OVER wc AS n,
         COUNT(*) OVER wc
           * SUM(v_mill) OVER (PARTITION BY event_type ORDER BY ts_us, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY ts_us, event_id)
             * SUM(v_mill) OVER wc AS t_stat
  FROM e
  WINDOW wc AS (PARTITION BY event_type)
),
agg AS (
  SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
         CAST(MAX(t_stat) AS BIGINT) AS t_max,
         CAST(MIN(t_stat) AS BIGINT) AS t_min
  FROM t GROUP BY event_type
)
SELECT event_type, n,
       CAST(t_max - t_min AS DOUBLE) / (CAST(n AS DOUBLE) * 1000) AS cusum_range
FROM agg
ORDER BY event_type
"""


_DECAY_CAP = 31  # ages beyond 31 half-lives decay to exactly zero


def evt_decay_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponential time-decay engagement score (half-life =
    1 day), computed EXACTLY: weight 2^(−age_days) is a power of two,
    so each contribution value·2^(cap−age) is an INTEGER (a bigint
    shift), the per-user sum is an exact DECIMAL(38,0) — order-
    independent, unlike naive float pow() accumulation whose result
    depends on reduce order — and only the final rescale touches
    doubles (one correctly-rounded cast + one division, identical in
    both engines). Ages past 31 half-lives round to weight 0 (< 5e-10
    of a current event — below any ranking relevance). One map-side-
    combined aggregation; the reference clock is max(ts), computed in
    the same pass shape and broadcast."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        (F.col("value").cast("decimal(18,3)") * 1000).cast("long").alias("v_mill"),
    )
    ref = e.agg(F.max("ts_us").alias("tmax"))
    scaled = (
        e.crossJoin(F.broadcast(ref))
        .select(
            "user_id",
            F.expr("CAST((tmax - ts_us) div 86400000000 AS INT)").alias("age"),
            "v_mill",
        )
        .select(
            "user_id",
            F.expr(
                f"CASE WHEN age <= {_DECAY_CAP} THEN CAST(v_mill *"
                f" shiftleft(CAST(1 AS BIGINT), {_DECAY_CAP} - age)"
                f" AS DECIMAL(38,0)) ELSE CAST(0 AS DECIMAL(38,0)) END"
            ).alias("contrib"),
        )
    )
    denom = float(1000 * (1 << _DECAY_CAP))
    return (
        scaled.groupBy("user_id")
        .agg(F.sum("contrib").alias("s"))
        .select(
            "user_id",
            F.expr(f"CAST(s AS DOUBLE) / CAST({int(denom)} AS DOUBLE)").alias(
                "decay_score"
            ),
        )
        .orderBy(F.desc("decay_score"), "user_id")
    )


EVT_DECAY_SQL = f"""
WITH e AS (
  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
         CAST(CAST(value AS DECIMAL(18,3)) * 1000 AS BIGINT) AS v_mill
  FROM events
),
ref AS (SELECT MAX(ts_us) AS tmax FROM e),
scaled AS (
  SELECT user_id,
         CASE WHEN CAST((tmax - ts_us) // 86400000000 AS INT) <= {_DECAY_CAP}
              THEN CAST(v_mill * (CAST(1 AS BIGINT)
                   << ({_DECAY_CAP} - CAST((tmax - ts_us) // 86400000000 AS INT)))
                   AS DECIMAL(38,0))
              ELSE CAST(0 AS DECIMAL(38,0)) END AS contrib
  FROM e CROSS JOIN ref
)
SELECT user_id,
       CAST(SUM(contrib) AS DOUBLE) / CAST({1000 * (1 << _DECAY_CAP)} AS DOUBLE)
         AS decay_score
FROM scaled
GROUP BY user_id
ORDER BY decay_score DESC, user_id
"""


def j7_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap self-join: per user, sessionize each event
    type independently (10-minute gap), then find cross-type session
    pairs that overlap in time — "was the user's click session
    concurrent with their purchase session?" — the temporal-join class
    (range × range) that plain equi-joins can't express.

    Scale shape: intervals are built with the shared gaps-and-islands
    windows (one shuffle on user), and the overlap join is an
    EQUI-join on user_id with the range predicates as residual
    filters — co-partitioned by the join key, never a cross join;
    per-user session counts are tiny, so the residual is cheap.
    Overlap durations are exact integer microseconds."""
    gap_us = 600_000_000
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    w = Window.partitionBy("user_id", "event_type").orderBy("ts_us")
    new_sess = (
        F.lag("ts_us").over(w).isNull()
        | (F.col("ts_us") - F.lag("ts_us").over(w) >= gap_us)
    ).cast("long")
    sess = (
        e.withColumn("ns", new_sess)
        .withColumn(
            "sid",
            F.sum("ns").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy("user_id", "event_type", "sid")
        .agg(
            F.min("ts_us").alias("start_us"),
            (F.max("ts_us") + gap_us).alias("end_us"),
        )
    )
    a = sess.select(
        "user_id",
        F.col("event_type").alias("type_a"),
        F.col("start_us").alias("sa"),
        F.col("end_us").alias("ea"),
    )
    b = sess.select(
        "user_id",
        F.col("event_type").alias("type_b"),
        F.col("start_us").alias("sb"),
        F.col("end_us").alias("eb"),
    )
    pairs = a.join(b, "user_id").filter(
        (F.col("type_a") < F.col("type_b"))
        & (F.col("sa") < F.col("eb"))
        & (F.col("sb") < F.col("ea"))
    )
    return (
        pairs.groupBy("type_a", "type_b")
        .agg(
            F.count("*").alias("n_overlaps"),
            F.sum(
                F.least("ea", "eb") - F.greatest("sa", "sb")
            ).alias("total_overlap_us"),
        )
        .orderBy("type_a", "type_b")
    )


J7_INTERVAL_SQL = """
WITH e AS (
  SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
  FROM events
),
marked AS (
  SELECT user_id, event_type, ts_us,
         CASE WHEN LAG(ts_us) OVER w IS NULL
                OR ts_us - LAG(ts_us) OVER w >= 600000000
              THEN 1 ELSE 0 END AS ns
  FROM e
  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts_us)
),
tagged AS (
  SELECT user_id, event_type, ts_us,
         SUM(ns) OVER (PARTITION BY user_id, event_type ORDER BY ts_us
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM marked
),
sess AS (
  SELECT user_id, event_type,
         CAST(MIN(ts_us) AS BIGINT) AS start_us,
         CAST(MAX(ts_us) + 600000000 AS BIGINT) AS end_us
  FROM tagged GROUP BY user_id, event_type, sid
)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       COUNT(*) AS n_overlaps,
       CAST(SUM(LEAST(a.end_us, b.end_us) - GREATEST(a.start_us, b.start_us))
            AS BIGINT) AS total_overlap_us
FROM sess a JOIN sess b ON a.user_id = b.user_id
WHERE a.event_type < b.event_type
  AND a.start_us < b.end_us AND b.start_us < a.end_us
GROUP BY 1, 2
ORDER BY 1, 2
"""


def evt_rolling_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day active users (WAU) plus daily actives (DAU) per
    calendar day — the canonical engagement metric, done EXACTLY.

    Set-valued rolling windows don't compose (you can't sum distinct
    counts), so the scale-correct exact shape is: collapse the fact to
    distinct (day, user) pairs ONCE, then let each pair vote into the
    ≤7 target days it covers (a native explode of a 7-element range —
    rows × 7, not rows × users) and count distinct users per target
    day. One partial-agg'd distinct collapse + one 7× fanout shuffle,
    no per-day self-joins, no state. Days beyond the observed range
    are clipped so WAU(d) only aggregates real days."""
    e = load_table(spark, sf_dir, "events").select(
        F.to_date(F.col("ts").cast("timestamp")).alias("d"), "user_id"
    )
    du = e.distinct()
    bounds = du.agg(F.max("d").alias("dmax"))
    votes = (
        du.crossJoin(F.broadcast(bounds))
        .select(
            F.explode(F.expr("sequence(0, 6)")).alias("off"), "d", "user_id", "dmax"
        )
        .select(F.expr("date_add(d, off)").alias("day"), "user_id", "dmax")
        .filter(F.col("day") <= F.col("dmax"))
    )
    wau = votes.groupBy("day").agg(F.countDistinct("user_id").alias("wau"))
    dau = du.groupBy(F.col("d").alias("day")).agg(
        F.countDistinct("user_id").alias("dau")
    )
    return (
        wau.join(dau, "day", "left_outer")
        .select("day", F.coalesce("dau", F.lit(0)).alias("dau"), "wau")
        .orderBy("day")
    )


EVT_WAU_SQL = """
WITH du AS (
  SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events
),
bounds AS (SELECT MAX(d) AS dmax FROM du),
votes AS (
  SELECT d + r.off * INTERVAL 1 DAY AS day, user_id
  FROM du CROSS JOIN bounds, unnest(range(0, 7)) AS r(off)
  WHERE d + r.off * INTERVAL 1 DAY <= dmax
),
wau AS (SELECT CAST(day AS DATE) AS day, COUNT(DISTINCT user_id) AS wau FROM votes GROUP BY 1),
dau AS (SELECT d AS day, COUNT(DISTINCT user_id) AS dau FROM du GROUP BY 1)
SELECT w.day, COALESCE(a.dau, 0) AS dau, w.wau
FROM wau w LEFT JOIN dau a ON a.day = w.day
ORDER BY w.day
"""


def evt_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive seasonal decomposition (STL-lite) of the hourly event
    value series: trend = centered 25-hour moving average, seasonal =
    hour-of-day mean of the detrended series, residual = remainder —
    the decomposition every monitoring stack runs before alerting on
    "anomalies" that are just Tuesday mornings.

    Exactness: hourly sums are exact decimals; the moving average and
    the seasonal means are (sum, count) pairs divided once in a
    shared-text double expression, so no running float accumulation
    exists anywhere. One bucketing aggregation + one 25-row window
    over the HOURLY series (8.7k rows/year — series-length-, not
    event-count-sized) + one broadcast join back."""
    e = load_table(spark, sf_dir, "events").select(
        F.expr(
            "unix_micros(CAST(ts AS TIMESTAMP)) div 3600000000"
        ).alias("hour_id"),
        F.col("value").cast("decimal(18,3)").alias("v"),
    )
    hourly = e.groupBy("hour_id").agg(
        F.sum("v").alias("hv"), F.count("*").alias("hn")
    )
    w = Window.orderBy("hour_id").rowsBetween(-12, 12)
    trended = hourly.withColumn("tv", F.sum("hv").over(w)).withColumn(
        "tn", F.sum("hn").over(w)
    )
    base = trended.select(
        "hour_id",
        F.expr("CAST(hv AS DOUBLE) / hn").alias("level"),
        F.expr("CAST(tv AS DOUBLE) / tn").alias("trend"),
        F.expr("hour_id % 24").alias("hod"),
        F.expr("CAST(hv AS DOUBLE) / hn - CAST(tv AS DOUBLE) / tn").alias("detr"),
    )
    # float sums are merge-order-dependent; force hour_id order via a
    # sorted-list sequential reduction (identical in the oracle)
    seq_sum = (
        "aggregate(transform(array_sort(collect_list(struct(hour_id, {c}))),"
        " s -> s.{c}), CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
    )
    seasonal = base.groupBy("hod").agg(
        F.expr(seq_sum.format(c="detr") + " / count(1)").alias("seasonal")
    )
    resid = base.join(F.broadcast(seasonal), "hod").withColumn(
        "ar", F.expr("abs(detr - seasonal)")
    )
    return (
        resid.groupBy("hod")
        .agg(
            F.count("*").alias("n_hours"),
            F.min("seasonal").alias("seasonal"),
            F.round(F.expr(seq_sum.format(c="ar") + " / count(1)"), 9).alias(
                "mean_abs_residual"
            ),
        )
        .orderBy("hod")
    )


EVT_SEASONAL_SQL = """
WITH e AS (
  SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS hour_id,
         CAST(value AS DECIMAL(18,3)) AS v
  FROM events
),
hourly AS (
  SELECT hour_id, SUM(v) AS hv, COUNT(*) AS hn FROM e GROUP BY hour_id
),
trended AS (
  SELECT hour_id, hv, hn,
         SUM(hv) OVER w AS tv, SUM(hn) OVER w AS tn
  FROM hourly
  WINDOW w AS (ORDER BY hour_id ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)
),
base AS (
  SELECT hour_id,
         CAST(hv AS DOUBLE) / hn AS level,
         CAST(tv AS DOUBLE) / tn AS trend,
         hour_id % 24 AS hod,
         CAST(hv AS DOUBLE) / hn - CAST(tv AS DOUBLE) / tn AS detr
  FROM trended
),
seasonal AS (
  SELECT hod, list_sum(list(detr ORDER BY hour_id)) / COUNT(*) AS seasonal
  FROM base GROUP BY hod
)
SELECT b.hod, COUNT(*) AS n_hours, MIN(s.seasonal) AS seasonal,
       ROUND(list_sum(list(abs(b.detr - s.seasonal) ORDER BY b.hour_id))
             / COUNT(*), 9) AS mean_abs_residual
FROM base b JOIN seasonal s ON s.hod = b.hod
GROUP BY b.hod
ORDER BY b.hod
"""


_M4_BUCKETS = 128


def w10_m4_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 time-series downsampling (Jugel et al., VLDB'14): per pixel-
    column bucket keep exactly the min, max, first and last points —
    the four extremes that make a line chart at that width pixel-
    perfect while shipping O(width) instead of O(n) points to the
    renderer. THE standard dashboard-backend operator.

    One map-side-combinable aggregation per (series, bucket):
    min/max over value plus argmin/argmax over (ts, event_id) structs
    (first/last), so a 100 TB series costs a single partial-agg
    shuffle of 4 structs per bucket. Bucket edges derive from the
    observed time range (broadcast 1-row bounds); everything is exact
    integers/decimals."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t"),
        F.col("value").cast("decimal(18,3)").alias("v"),
    )
    bounds = e.agg(F.min("t").alias("t0"), F.max("t").alias("t1"))
    b = (
        e.crossJoin(F.broadcast(bounds))
        .withColumn(
            "bucket",
            F.expr(
                f"CAST(least(CAST({_M4_BUCKETS} AS BIGINT) - 1,"
                f" ((t - t0) * {_M4_BUCKETS}) div (t1 - t0 + 1)) AS INT)"
            ),
        )
    )
    agg = b.groupBy("event_type", "bucket").agg(
        F.count("*").alias("n_points"),
        F.min("v").cast("double").alias("v_min"),
        F.max("v").cast("double").alias("v_max"),
        F.min(F.struct("t", "event_id", "v")).alias("first_pt"),
        F.max(F.struct("t", "event_id", "v")).alias("last_pt"),
    )
    return agg.select(
        "event_type",
        "bucket",
        "n_points",
        "v_min",
        "v_max",
        F.col("first_pt.t").alias("t_first"),
        F.col("first_pt.v").cast("double").alias("v_first"),
        F.col("last_pt.t").alias("t_last"),
        F.col("last_pt.v").cast("double").alias("v_last"),
    ).orderBy("event_type", "bucket")


W10_M4_SQL = f"""
WITH e AS (
  SELECT event_type, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS t,
         CAST(value AS DECIMAL(18,3)) AS v
  FROM events
),
bounds AS (SELECT MIN(t) AS t0, MAX(t) AS t1 FROM e),
b AS (
  SELECT e.*, CAST(LEAST(CAST({_M4_BUCKETS} AS BIGINT) - 1,
              ((t - t0) * {_M4_BUCKETS}) // (t1 - t0 + 1)) AS INT) AS bucket
  FROM e CROSS JOIN bounds
)
SELECT event_type, bucket, COUNT(*) AS n_points,
       CAST(MIN(v) AS DOUBLE) AS v_min,
       CAST(MAX(v) AS DOUBLE) AS v_max,
       CAST(MIN({{'t': t, 'eid': event_id, 'v': v}}).t AS BIGINT) AS t_first,
       CAST(MIN({{'t': t, 'eid': event_id, 'v': v}}).v AS DOUBLE) AS v_first,
       CAST(MAX({{'t': t, 'eid': event_id, 'v': v}}).t AS BIGINT) AS t_last,
       CAST(MAX({{'t': t, 'eid': event_id, 'v': v}}).v AS DOUBLE) AS v_last
FROM b
GROUP BY event_type, bucket
ORDER BY event_type, bucket
"""


def s27_stream_file_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The NATIVE streaming parquet file sink with its `_spark_metadata`
    transaction log — the sink surface the other streaming queries
    (memory sink, foreachBatch) don't touch, and the standard way a
    100 TB pipeline lands streams on object storage.

    An availableNow run writes the projected stream to parquet under a
    checkpoint; a SECOND run over the same checkpoint must write
    NOTHING (file-sink exactly-once comes from the checkpoint +
    manifest pair, and readers resolve the manifest, so partial task
    files can never be read). The returned row carries the read-back
    census plus the rerun-delta — the oracle recomputes the census
    from the batch table and pins the delta at zero."""
    import shutil
    import tempfile

    scratch = tempfile.mkdtemp(prefix="bigdata_spark_filesink_")
    out_dir = f"{scratch}/out"
    ckpt = f"{scratch}/ckpt"
    try:
        def run_once() -> None:
            stream = _events_stream(spark, sf_dir).select(
                "event_id",
                "user_id",
                F.col("value").cast("decimal(18,2)").alias("v"),
            )
            q = (
                stream.writeStream.format("parquet")
                .option("path", out_dir)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            if not q.awaitTermination(300):
                q.stop()
                raise TimeoutError("s27 file sink did not finish in 300s")

        run_once()
        first = spark.read.parquet(out_dir).agg(
            F.count("*").alias("n"),
            F.sum("v").cast("double").alias("value_sum"),
        ).first()
        run_once()  # same checkpoint: must be a no-op
        second = spark.read.parquet(out_dir).count()
        return spark.createDataFrame(
            [
                (
                    int(first["n"]),
                    float(first["value_sum"]),
                    int(second) - int(first["n"]),
                )
            ],
            "n_rows long, value_sum double, rerun_delta long",
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


S27_FILESINK_SQL = """
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum,
       CAST(0 AS BIGINT) AS rerun_delta
FROM events
"""


def evt_stream_ckpt_recovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checkpointed stop/restart EXACTLY-ONCE: run 1 streams the first
    two chronological file groups under a checkpoint and terminates;
    the remaining files then land in the source directory and run 2
    restarts FROM THE SAME CHECKPOINT — the file-source log must admit
    only the unseen files. Per-batch counts accumulate through
    foreachBatch tagged by run; the oracle recomputes both runs' totals
    from the exact integer-microsecond quarter rule, so any
    reprocessing (double counts) or loss (missing counts) breaks the
    hash match."""
    import os
    import shutil
    import tempfile
    import uuid

    e = load_table(spark, sf_dir, "events").select("ts", "event_type")
    scratch = tempfile.mkdtemp(prefix="bigdata_spark_ckpt_")
    try:
        groups = _stage_quarter_files(spark, e, scratch, n_parts=4, bounds_us=_events_ts_bounds_us(sf_dir))
        indir = os.path.join(scratch, "in")
        os.makedirs(indir, exist_ok=True)
        ckpt = os.path.join(scratch, "ckpt_" + uuid.uuid4().hex[:8])
        counts: list[tuple[int, str, int]] = []

        def run(run_id: int) -> None:
            def record(batch: DataFrame, batch_id: int) -> None:
                for r in batch.groupBy("event_type").count().collect():
                    counts.append((run_id, r["event_type"], int(r["count"])))

            q = (
                spark.readStream.schema(e.schema)
                .parquet(indir)
                .writeStream.foreachBatch(record)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            if not q.awaitTermination(300):
                q.stop()
                raise TimeoutError("ckpt recovery stream did not finish in 300s")

        for i, parts in enumerate(groups[:2]):
            for j, src in enumerate(parts):
                shutil.copy(src, os.path.join(indir, f"{i:02d}_{j}.parquet"))
        run(1)
        for i, parts in enumerate(groups[2:], start=2):
            for j, src in enumerate(parts):
                shutil.copy(src, os.path.join(indir, f"{i:02d}_{j}.parquet"))
        run(2)

        agg: dict[str, list[int]] = {}
        for run_id, et, n in counts:
            slot = agg.setdefault(et, [0, 0])
            slot[run_id - 1] += n
        rows = [
            (et, v[0], v[1], v[0] + v[1]) for et, v in sorted(agg.items())
        ]
        return spark.createDataFrame(
            rows, "event_type string, n_run1 long, n_run2 long, n_total long"
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


EVT_CKPT_SQL = """
WITH b AS (
  SELECT epoch_us(MIN(ts)) AS lo, epoch_us(MAX(ts)) AS hi FROM events
),
q AS (
  SELECT event_type,
         least(3, (epoch_us(ts) - b.lo) // greatest(1, (b.hi - b.lo) // 4)) AS qt
  FROM events, b
)
SELECT event_type,
       COUNT(*) FILTER (qt <= 1) AS n_run1,
       COUNT(*) FILTER (qt >= 2) AS n_run2,
       COUNT(*) AS n_total
FROM q GROUP BY event_type ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# j12_scd2_dim_join — fact rows joined to the SCD2 dimension state
# ---------------------------------------------------------------------------


def j12_scd2_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FACT → SCD2-DIMENSION temporal join — the warehouse pattern
    evt_scd2 builds the dimension FOR: every purchase joins the
    dimension row that was valid AT ITS TIMESTAMP (user_id equality +
    ts ∈ [valid_from, valid_to)), then rolls revenue up by the
    dimension state — revenue by the ENGAGEMENT state the buyer was
    in. The SCD2 table is each user's NON-purchase activity history
    (operators/scd.py — purchases excluded so the joined state is the
    browsing context, not the purchase itself); purchases before a
    user's first tracked state drop out of the inner join. Intervals
    are half-open and deterministic
    (ties on ts break on event_id), so exactly one dimension row
    serves each fact and both engines agree bit-for-bit (revenue in
    exact micro ints).

    Scale: the dimension join is an equi-join ON USER with the range
    predicate evaluated inside it — per-user row counts bound the
    work, never a global range join; the SCD2 build itself is two
    windows over ONE user-partitioned exchange."""
    from ..operators.scd import scd2_from_changes

    e = load_table(spark, sf_dir, "events")
    dim = scd2_from_changes(
        e.filter(F.col("event_type") != "purchase"),
        ["user_id"], "event_type", "ts", "event_id",
    ).select(
        "user_id",
        F.col("event_type").alias("dim_state"),
        "valid_from",
        "valid_to",
    )
    facts = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.expr(
            "CAST(FLOOR(value * CAST(1000000 AS DOUBLE)"
            " + CAST(0.5 AS DOUBLE)) AS BIGINT)"
        ).alias("vm"),
    )
    joined = facts.join(
        dim,
        on=[
            facts.user_id == dim.user_id,
            facts.ts >= dim.valid_from,
            F.coalesce(facts.ts < dim.valid_to, F.lit(True)),
        ],
    )
    return (
        joined.groupBy("dim_state")
        .agg(
            F.count("*").alias("n_purchases"),
            F.sum("vm").alias("revenue_micros"),
        )
        .orderBy("dim_state")
    )


J12_SCD2_JOIN_SQL = """
WITH marked AS (
  SELECT user_id, event_type, ts, event_id,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev
  FROM events WHERE event_type <> 'purchase'
), runs AS (
  SELECT user_id, event_type, ts, event_id
  FROM marked WHERE prev IS NULL OR event_type <> prev
), dim AS (
  SELECT user_id, event_type AS dim_state, ts AS valid_from,
         LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS valid_to
  FROM runs
), facts AS (
  SELECT user_id, ts,
         CAST(FLOOR(value * CAST(1000000 AS DOUBLE)
              + CAST(0.5 AS DOUBLE)) AS BIGINT) AS vm
  FROM events WHERE event_type = 'purchase'
)
SELECT d.dim_state, COUNT(*) AS n_purchases,
       CAST(SUM(f.vm) AS BIGINT) AS revenue_micros
FROM facts f
JOIN dim d
  ON f.user_id = d.user_id
 AND f.ts >= d.valid_from
 AND (d.valid_to IS NULL OR f.ts < d.valid_to)
GROUP BY 1
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# evt_snaive_backtest — seasonal-naive forecast + exact error metrics
# ---------------------------------------------------------------------------


def evt_snaive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive BACKTEST — ŷ(t) = y(t − 168h), the
    same-hour-last-week forecast every real model must beat, evaluated
    with exact micro-integer errors (MAE and MAPE numerators stay
    BIGINT; two divisions at the end). The hourly series is the exact
    purchase-value rollup; only hours with a 168-hour-old counterpart
    score. This is the baseline+metric half of a forecasting pipeline —
    the model half is evt_holt_linear's recursion.

    Scale: one hourly rollup (map-side combinable), one self-join on
    hour−168h (hash on the hour key), one scalar fold."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    hourly = (
        e.select(
            F.date_trunc("hour", "ts").alias("h"),
            F.expr(
                "CAST(FLOOR(value * CAST(1000000 AS DOUBLE)"
                " + CAST(0.5 AS DOUBLE)) AS BIGINT)"
            ).alias("vm"),
        )
        .groupBy("h")
        .agg(F.sum("vm").alias("vm"))
    )
    lagged = hourly.select(
        F.expr("h + INTERVAL 168 HOURS").alias("h"),
        F.col("vm").alias("pred"),
    )
    scored = hourly.join(lagged, "h").select(
        "h", "vm", "pred", F.expr("ABS(vm - pred)").alias("ae")
    )
    return scored.agg(
        F.count("*").alias("n_hours"),
        F.expr("CAST(SUM(ae) div COUNT(1) AS BIGINT)").alias("mae_micros"),
        F.expr(
            "CAST(SUM((1000000 * ae) div GREATEST(1L, vm)) div COUNT(1)"
            " AS BIGINT)"
        ).alias("mape_ppm"),
        F.max("ae").alias("max_ae_micros"),
    )


EVT_SNAIVE_SQL = """
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS h,
         SUM(CAST(FLOOR(value * CAST(1000000 AS DOUBLE)
              + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS vm
  FROM events WHERE event_type = 'purchase' GROUP BY 1
), lagged AS (
  SELECT h + INTERVAL 168 HOUR AS h, vm AS pred FROM hourly
), scored AS (
  SELECT a.h, CAST(a.vm AS BIGINT) AS vm, CAST(l.pred AS BIGINT) AS pred,
         CAST(ABS(a.vm - l.pred) AS BIGINT) AS ae
  FROM hourly a JOIN lagged l ON a.h = l.h
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_hours,
       CAST(SUM(ae) // COUNT(*) AS BIGINT) AS mae_micros,
       CAST(SUM((1000000 * ae) // GREATEST(1, vm)) // COUNT(*) AS BIGINT)
         AS mape_ppm,
       MAX(ae) AS max_ae_micros
FROM scored
"""


# ---------------------------------------------------------------------------
# evt_bot_detection — rate + regularity heuristics over user activity
# ---------------------------------------------------------------------------

_BOT_BURST = 2  # events within one minute bucket
_BOT_REG_PPM = 30_000  # modal-gap share threshold (3%)


def evt_bot_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bot/abuse heuristics — the traffic-quality filter every
    event pipeline runs before analytics or training-data export. Two
    exact integer signals per user: BURST (max events in any single
    minute bucket) and REGULARITY (the modal inter-event gap's ppm
    share — scripted clients repeat the same delay; humans don't).
    A user flags when burst ≥ 2 or modal share ≥ 3% with enough
    events (thresholds sized to the sparse synthetic traffic — real
    deployments tune them; the PLAN is the point). Output: every flagged user with both signals, deterministic
    (modal-gap ties break on the smaller gap).

    Scale: minute rollup and gap histogram are both map-side
    combinable; windows partition BY USER; output is flagged-user-
    sized."""
    e = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    per_min = (
        e.select("user_id", F.date_trunc("minute", "ts").alias("m"))
        .groupBy("user_id", "m")
        .agg(F.count("*").alias("k"))
        .groupBy("user_id")
        .agg(F.max("k").alias("max_per_minute"))
    )
    w_u = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        e.select(
            "user_id",
            (
                F.unix_timestamp("ts")
                - F.unix_timestamp(F.lag("ts").over(w_u))
            ).alias("gap_s"),
        )
        .filter(F.col("gap_s").isNotNull())
    )
    ghist = gaps.groupBy("user_id", "gap_s").agg(F.count("*").alias("c"))
    w_top = Window.partitionBy("user_id").orderBy(F.desc("c"), "gap_s")
    w_tot = Window.partitionBy("user_id")
    modal = (
        ghist.select(
            "user_id",
            "gap_s",
            "c",
            F.row_number().over(w_top).alias("rn"),
            F.sum("c").over(w_tot).alias("n_gaps"),
        )
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("gap_s").alias("modal_gap_s"),
            F.col("c").alias("modal_n"),
            "n_gaps",
            F.expr("(1000000 * c) div n_gaps").alias("modal_share_ppm"),
        )
    )
    return (
        per_min.join(modal, "user_id")
        .filter(
            (F.col("max_per_minute") >= _BOT_BURST)
            | (
                (F.col("modal_share_ppm") >= _BOT_REG_PPM)
                & (F.col("n_gaps") >= 20)
            )
        )
        .select(
            "user_id",
            F.col("max_per_minute").cast("long").alias("max_per_minute"),
            "modal_gap_s",
            F.col("modal_n").cast("long").alias("modal_n"),
            F.col("n_gaps").cast("long").alias("n_gaps"),
            "modal_share_ppm",
        )
        .orderBy("user_id")
    )


EVT_BOT_SQL = f"""
WITH per_min AS (
  SELECT user_id, MAX(k) AS max_per_minute FROM (
    SELECT user_id, date_trunc('minute', ts) AS m, COUNT(*) AS k
    FROM events GROUP BY 1, 2
  ) GROUP BY 1
), gaps AS (
  SELECT user_id,
         CAST(date_diff('second',
              LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
              ts) AS BIGINT) AS gap_s
  FROM events
), g AS (SELECT user_id, gap_s FROM gaps WHERE gap_s IS NOT NULL),
ghist AS (SELECT user_id, gap_s, COUNT(*) AS c FROM g GROUP BY 1, 2),
modal AS (
  SELECT user_id, gap_s AS modal_gap_s, c AS modal_n, n_gaps,
         CAST((1000000 * c) // n_gaps AS BIGINT) AS modal_share_ppm
  FROM (
    SELECT *,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY c DESC, gap_s) AS rn,
           SUM(c) OVER (PARTITION BY user_id) AS n_gaps
    FROM ghist
  ) WHERE rn = 1
)
SELECT p.user_id,
       CAST(p.max_per_minute AS BIGINT) AS max_per_minute,
       m.modal_gap_s, CAST(m.modal_n AS BIGINT) AS modal_n,
       CAST(m.n_gaps AS BIGINT) AS n_gaps, m.modal_share_ppm
FROM per_min p JOIN modal m ON p.user_id = m.user_id
WHERE p.max_per_minute >= {_BOT_BURST}
   OR (m.modal_share_ppm >= {_BOT_REG_PPM} AND m.n_gaps >= 20)
ORDER BY p.user_id
"""


# ---------------------------------------------------------------------------
# evt_stream_out_of_order — shuffled file arrival, identical aggregate
# ---------------------------------------------------------------------------


def evt_stream_out_of_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OUT-OF-ORDER arrival robustness: the four chronological quarter
    files are fed to the stream as q0, q2, q1, q3 — the third
    micro-batch delivers a week of data entirely BELOW the watermark
    the q2 batch advanced to — and the append-mode tumbling aggregate
    must still equal the in-order run bit-for-bit.

    Why that holds (measured on this Spark, pinned by the oracle):
    arriving rows whose windows were never finalized simply (re)enter
    state and merge before emission — `numRowsDroppedByWatermark` stays
    0 — and this arrival pattern can never touch an already-emitted
    window, because every window carrying q1 data ends after
    max(q0)−30min, the highest watermark that ran before q1 landed. So
    the emitted set is exactly the in-order multibatch result: all
    windows closed by the FINAL watermark (global max ts − 30 min),
    which is the oracle. A pattern that re-opened an emitted window
    WOULD duplicate it — that hazard is the reason production
    pipelines bound disorder to the watermark delay; this entry pins
    the safe side of the line.

    Scale: identical plan to evt_stream_multibatch — watermarked
    tumbling aggregation, state bounded by the watermark."""
    import os
    import shutil
    import tempfile
    import uuid

    e = load_table(spark, sf_dir, "events").select("ts", "event_type")
    scratch = tempfile.mkdtemp(prefix="bigdata_spark_ooo_")
    try:
        groups = _stage_quarter_files(spark, e, scratch, n_parts=4, bounds_us=_events_ts_bounds_us(sf_dir))
        indir = os.path.join(scratch, "in")
        os.makedirs(indir, exist_ok=True)
        for arrival, qtr in enumerate([0, 2, 1, 3]):
            for j, src in enumerate(groups[qtr]):
                shutil.copy(src, os.path.join(indir, f"{arrival:02d}_{j}.parquet"))
        with _stream_state_partitions(spark):
            stream = (
                spark.readStream.schema(e.schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(indir)
                .withColumn("ts", F.col("ts").cast("timestamp"))
            )
            windowed = (
                stream.withWatermark("ts", "30 minutes")
                .groupBy(F.window("ts", "1 hour"), "event_type")
                .agg(F.count("*").alias("n"))
            )
            qname = "evt_ooo_" + uuid.uuid4().hex[:8]
            q = (
                windowed.writeStream.format("memory")
                .queryName(qname)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            if not q.awaitTermination(300):
                q.stop()
                raise TimeoutError(
                    "evt_stream_out_of_order: stream did not finish in 300s"
                )
        out = spark.table(qname).select(
            F.col("window.start").alias("window_start"), "event_type", "n"
        )
        return out.localCheckpoint()
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


EVT_OOO_SQL = """
WITH cutoff AS (SELECT MAX(ts) - INTERVAL 30 MINUTE AS wm FROM events)
SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
       COUNT(*) AS n
FROM events, cutoff
GROUP BY 1, 2, cutoff.wm
HAVING window_start + INTERVAL 1 HOUR <= cutoff.wm
"""


# ---------------------------------------------------------------------------
# w14_dist_functions — percent_rank / cume_dist / nth_value coverage
# ---------------------------------------------------------------------------

# shared verbatim by both engines: ranks are exact integers, the two
# distribution functions are single divisions of them
_W14_BODY = """
WITH daily AS (
  SELECT o_orderpriority AS pri, CAST(o_orderdate AS DATE) AS day,
         COUNT(*) AS n
  FROM orders GROUP BY 1, 2
)
SELECT pri, day, CAST(n AS BIGINT) AS n,
       PERCENT_RANK() OVER w AS pct_rank,
       CUME_DIST() OVER w AS cume_dist,
       CAST(NTH_VALUE(n, 3) OVER (PARTITION BY pri ORDER BY n, day
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
            AS BIGINT) AS third_smallest
FROM daily
WINDOW w AS (PARTITION BY pri ORDER BY n, day)
ORDER BY pri, day
"""


def w14_dist_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window DISTRIBUTION functions — percent_rank, cume_dist,
    nth_value — the last classic window family the registry lacked,
    exercised over the per-priority daily order-count series. The
    ordering (n, day) is a total order inside each partition, so ranks
    are deterministic and both distribution values are single IEEE
    divisions of exact integer ranks — hash-exact. Identical SQL text
    runs on both engines.

    Scale: the windows run on the (priority × day) rollup (bounded),
    never the fact table; the rollup itself is one map-side-combinable
    groupBy."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_W14_BODY)


W14_DIST_SQL = _W14_BODY


# ---------------------------------------------------------------------------
# evt_stickiness_dau_mau — DAU / trailing-28-day MAU engagement ratio
# ---------------------------------------------------------------------------


def evt_stickiness_dau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/MAU stickiness — THE product-engagement ratio: for every
    day, distinct daily actives over distinct actives in the trailing
    28 days, as exact ppm integers. The trailing-window distinct is the
    rolling-WAU shape: each (user, day) presence VOTES into the next 28
    calendar days (native sequence explode — a bounded 28× fanout of
    the user-day grain, never of raw events), then one distinct count
    per day; no window function ever sees the fact table.

    Scale: distinct to user-day grain, 28× vote explode, two
    map-side-combinable distinct aggregations, one day-grain join."""
    e = load_table(spark, sf_dir, "events").select(
        F.to_date(F.col("ts").cast("timestamp")).alias("d"), "user_id"
    )
    du = e.distinct()
    bounds = du.agg(F.max("d").alias("dmax"))
    votes = (
        du.crossJoin(F.broadcast(bounds))
        .select(
            F.explode(F.expr("sequence(0, 27)")).alias("off"),
            "d",
            "user_id",
            "dmax",
        )
        .select(F.expr("date_add(d, off)").alias("day"), "user_id", "dmax")
        .filter(F.col("day") <= F.col("dmax"))
    )
    mau = votes.groupBy("day").agg(F.countDistinct("user_id").alias("mau"))
    dau = du.groupBy(F.col("d").alias("day")).agg(
        F.countDistinct("user_id").alias("dau")
    )
    return (
        mau.join(dau, "day", "left_outer")
        .select(
            "day",
            F.coalesce("dau", F.lit(0)).alias("dau"),
            "mau",
            F.expr("(1000000 * COALESCE(dau, 0)) div mau").alias(
                "stickiness_ppm"
            ),
        )
        .orderBy("day")
    )


EVT_STICKINESS_SQL = """
WITH du AS (
  SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events
), bounds AS (SELECT MAX(d) AS dmax FROM du),
votes AS (
  SELECT d + CAST(off AS INT) AS day, user_id
  FROM du, bounds, range(28) t(off)
  WHERE d + CAST(off AS INT) <= dmax
),
mau AS (SELECT day, COUNT(DISTINCT user_id) AS mau FROM votes GROUP BY 1),
dau AS (SELECT d AS day, COUNT(DISTINCT user_id) AS dau FROM du GROUP BY 1)
SELECT m.day, CAST(COALESCE(d.dau, 0) AS BIGINT) AS dau,
       CAST(m.mau AS BIGINT) AS mau,
       CAST((1000000 * COALESCE(d.dau, 0)) // m.mau AS BIGINT)
         AS stickiness_ppm
FROM mau m LEFT JOIN dau d ON m.day = d.day
ORDER BY m.day
"""


# ---------------------------------------------------------------------------
# evt_interarrival_stats — per-user inter-event gap distribution, exact
# ---------------------------------------------------------------------------


def evt_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival time distribution — the per-user gap between
    consecutive events (ordered by ts with the event_id tiebreak),
    reduced to exact integer-second order statistics: lower median,
    lower p90, max, and the exact-ppm mean. Quantiles come from the
    VALUE-DOMAIN histogram (gap-second → count, one cumulative window
    over distinct gap values), never a global rank of rows — the
    stat_mannwhitney collapse.

    Scale: one lag window partitioned BY USER (parallelism = users),
    one histogram groupBy, windows over the distinct-gap-value table."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id"
    )
    w_u = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        e.select(
            "user_id",
            (
                F.unix_timestamp("ts")
                - F.unix_timestamp(F.lag("ts").over(w_u))
            ).alias("gap_s"),
        )
        .filter(F.col("gap_s").isNotNull())
    )
    hist = gaps.groupBy("gap_s").agg(F.count("*").alias("cnt"))
    w_cum = Window.orderBy("gap_s").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.partitionBy()
    cum = hist.select(
        "gap_s",
        F.sum("cnt").over(w_cum).alias("cum"),
        F.sum("cnt").over(wall).alias("n"),
        F.sum(F.expr("gap_s * cnt")).over(wall).alias("s"),
        F.max("gap_s").over(wall).alias("mx"),
    )
    return cum.agg(
        F.max("n").alias("n_gaps"),
        F.expr("CAST((1000000 * MAX(s)) div MAX(n) AS BIGINT)").alias(
            "mean_gap_micros"
        ),
        F.min(F.expr("IF(cum * 2 >= n, gap_s, NULL)")).alias("p50_s"),
        F.min(F.expr("IF(cum * 10 >= 9 * n, gap_s, NULL)")).alias("p90_s"),
        F.max("mx").alias("max_s"),
    )


EVT_INTERARRIVAL_SQL = """
WITH gaps AS (
  SELECT user_id,
         CAST(date_diff('second',
              LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
              ts) AS BIGINT) AS gap_s
  FROM events
), g AS (SELECT gap_s FROM gaps WHERE gap_s IS NOT NULL),
hist AS (SELECT gap_s, COUNT(*) AS cnt FROM g GROUP BY 1),
cum AS (
  SELECT gap_s,
         SUM(cnt) OVER (ORDER BY gap_s
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         SUM(cnt) OVER () AS n,
         SUM(gap_s * cnt) OVER () AS s,
         MAX(gap_s) OVER () AS mx
  FROM hist
)
SELECT CAST(MAX(n) AS BIGINT) AS n_gaps,
       CAST((1000000 * MAX(s)) // MAX(n) AS BIGINT) AS mean_gap_micros,
       MIN(CASE WHEN cum * 2 >= n THEN gap_s END) AS p50_s,
       MIN(CASE WHEN cum * 10 >= 9 * n THEN gap_s END) AS p90_s,
       MAX(mx) AS max_s
FROM cum
"""


# ---------------------------------------------------------------------------
# evt_holt_linear — double exponential smoothing as a native recursive CTE
# ---------------------------------------------------------------------------

# α = 1/5 (level), β = 1/10 (trend) — integer micro recurrence, both
# engines truncate div toward zero, so every step is bit-identical
_HOLT_DAILY = """
SELECT CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS t, day, vm
FROM (
  SELECT CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(FLOOR(value * CAST(1000000 AS DOUBLE)
              + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS BIGINT) AS vm
  FROM events WHERE event_type = 'purchase' GROUP BY 1
)
"""

_HOLT_BODY = """
WITH RECURSIVE daily AS (
  {daily}
),
holt AS (
  SELECT t, day, vm, CAST(vm AS BIGINT) AS l, CAST(0 AS BIGINT) AS b
  FROM daily WHERE t = 1
  UNION ALL
  SELECT d.t, d.day, d.vm,
         CAST((1 * d.vm + 4 * (h.l + h.b)) {div} 5 AS BIGINT) AS l,
         CAST((1 * ((1 * d.vm + 4 * (h.l + h.b)) {div} 5 - h.l) + 9 * h.b)
           {div} 10 AS BIGINT) AS b
  FROM holt h JOIN daily d ON d.t = h.t + 1
)
SELECT t, day, vm AS v_micros, CAST(l AS BIGINT) AS level_micros,
       CAST(b AS BIGINT) AS trend_micros,
       CAST(l + b AS BIGINT) AS forecast_next_micros
FROM holt ORDER BY t
"""


def evt_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear (double exponential) smoothing of the daily
    purchase-value series — level+trend state evolving as a NATIVE
    ``WITH RECURSIVE`` (Spark 4 UnionLoop, the s33 path): no driver
    loop, no checkpoint bookkeeping, and DuckDB replays the identical
    recursion as the oracle. The recurrence runs in exact BIGINT
    micro-units with truncating integer division (α=1/5, β=1/10), so
    the sequential fixed point is bit-identical across engines —
    the float-EWMA trap (stat_ewma dodges it with DECIMAL powers)
    never appears.

    Scale: the day-grain rollup is the distributed part (one
    map-side-combinable groupBy over 100 TB of events — its MAP side
    keeps the scan's parallelism regardless of the shuffle setting
    below); the recursion is day-count-bounded — each level is one
    tiny join over the ≤days-sized table, so the post-shuffle side is
    scoped to one partition (30 rows across 32 reducers is pure
    scheduling overhead, ~35% of this query's wall at bench scale).

    The day rollup is MATERIALIZED before the recursion starts:
    UnionLoop re-executes the whole step plan every iteration, so an
    inline ``daily`` CTE re-runs the fact-table aggregate once per day
    (measured ~40% of this query's wall at bench scale; at 100 TB it
    would be days × full-scan — quadratic-by-constant). Recursing over
    the checkpointed ≤days-sized table makes each iteration a tiny
    join, identical values."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    with _stream_state_partitions(spark, n=1):
        daily = spark.sql(_HOLT_DAILY).localCheckpoint(eager=False)
        daily.createOrReplaceTempView("holt_daily_mat")
        return spark.sql(
            _HOLT_BODY.format(daily="SELECT * FROM holt_daily_mat", div="div")
        ).localCheckpoint()


EVT_HOLT_SQL = _HOLT_BODY.format(daily=_HOLT_DAILY, div="//")


# ---------------------------------------------------------------------------
# evt_stream_outer_join — stream-stream LEFT OUTER join (null on expiry)
# ---------------------------------------------------------------------------


def evt_stream_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER join — the semantics evt_stream_join's
    inner join can't show: a click with NO purchase inside its
    30-minute attribution window is emitted NULL-PADDED, but only once
    the watermark proves no match can still arrive (state eviction IS
    the emission trigger). Events re-stage as four chronological files
    (maxFilesPerTrigger=1) so the watermark genuinely advances across
    micro-batches and evictions happen mid-stream, not just in the
    final cleanup batch.

    Determinism contract (oracle-pinned): emitted = all matched pairs
    PLUS every unmatched click whose window upper bound
    (click_ts + 30 min) lies below the FINAL global watermark
    min(max click_ts, max purchase_ts) − 30 min — Spark's multi-input
    watermark is the min across inputs. Unmatched clicks younger than
    that stay in state (they'd surface on restart), exactly like the
    window the multibatch entry holds back.

    Scale: join state is bounded by the watermark on both sides; each
    side's state is (30 min + range) of stream volume, hash-partitioned
    on user_id — the production attribution-join shape."""
    import shutil
    import tempfile
    import uuid

    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type"
    )
    scratch = tempfile.mkdtemp(prefix="bigdata_spark_soj_")
    try:
        with _stream_state_partitions(spark):
            stream = _stage_chronological_stream(spark, e, scratch, n_parts=4, sf_dir=sf_dir)
            clicks = (
                stream.filter(F.col("event_type") == "click")
                .select(
                    F.col("event_id").alias("click_id"),
                    "user_id",
                    F.col("ts").alias("click_ts"),
                )
                .withWatermark("click_ts", "30 minutes")
            )
            purchases = (
                stream.filter(F.col("event_type") == "purchase")
                .select(
                    F.col("event_id").alias("purchase_id"),
                    F.col("user_id").alias("p_user_id"),
                    F.col("ts").alias("purchase_ts"),
                )
                .withWatermark("purchase_ts", "30 minutes")
            )
            joined = clicks.join(
                purchases,
                on=[
                    clicks.user_id == purchases.p_user_id,
                    purchases.purchase_ts >= clicks.click_ts,
                    purchases.purchase_ts
                    <= clicks.click_ts + F.expr("INTERVAL 30 MINUTES"),
                ],
                how="left_outer",
            ).select(
                "click_id",
                "user_id",
                "purchase_id",
                (
                    F.unix_timestamp("purchase_ts")
                    - F.unix_timestamp("click_ts")
                ).alias("gap_s"),
            )
            qname = "evt_soj_" + uuid.uuid4().hex[:8]
            q = (
                joined.writeStream.format("memory")
                .queryName(qname)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            if not q.awaitTermination(300):
                q.stop()
                raise TimeoutError(
                    "evt_stream_outer_join: availableNow stream did not "
                    "finish in 300s"
                )
        return spark.table(qname).localCheckpoint()
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


EVT_STREAM_OUTER_JOIN_SQL = """
WITH c AS (
  SELECT event_id AS click_id, user_id, ts AS click_ts
  FROM events WHERE event_type = 'click'
), p AS (
  SELECT event_id AS purchase_id, user_id AS p_user_id, ts AS purchase_ts
  FROM events WHERE event_type = 'purchase'
), wm AS (
  SELECT LEAST((SELECT MAX(click_ts) FROM c),
               (SELECT MAX(purchase_ts) FROM p)) - INTERVAL 30 MINUTE AS w
), m AS (
  SELECT c.click_id, c.user_id, c.click_ts, p.purchase_id, p.purchase_ts
  FROM c JOIN p
    ON c.user_id = p.p_user_id
   AND p.purchase_ts >= c.click_ts
   AND p.purchase_ts <= c.click_ts + INTERVAL 30 MINUTE
)
SELECT click_id, user_id, purchase_id,
       CAST(date_diff('second', click_ts, purchase_ts) AS BIGINT) AS gap_s
FROM m
UNION ALL
SELECT c.click_id, c.user_id,
       CAST(NULL AS BIGINT) AS purchase_id, CAST(NULL AS BIGINT) AS gap_s
FROM c, wm
WHERE c.click_ts + INTERVAL 30 MINUTE < wm.w
  AND NOT EXISTS (SELECT 1 FROM m WHERE m.click_id = c.click_id)
"""


# ---------------------------------------------------------------------------
# evt_stream_incremental_mv — foreachBatch aggregate-MERGE MV refresh
# ---------------------------------------------------------------------------

# staged chronological file groups == expected non-empty refreshes;
# shared between the plan (n_parts=) and the oracle (n_refreshes)
_SMV_N_PARTS = 3


def evt_stream_incremental_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming MATERIALIZED-VIEW maintenance — the foreachBatch twin
    of the batch entry s37_incremental_mv (plans/scaleq.py) and the
    aggregate-MERGE counterpart of evt_stream_upsert's latest-per-key
    sink: each micro-batch folds its PARTIAL aggregates (per-type
    event count + exact value micro-sum — both self-mergeable) into a
    versioned MV table, so the view stays fresh after every trigger
    without ever rescanning stream history. Three chronological
    micro-batches force three real refreshes; the committed version
    counter (part of the oracle-checked output) proves each batch
    published, and the final MV must equal the global batch aggregate
    — the exactly-once-shaped invariant. Empty micro-batches (a
    no-data trigger, a source batching change) SKIP the publish — an
    MV refresh that changes nothing should not burn a version — so
    the version counter equals the staged file-group count
    (``_SMV_N_PARTS``), which is also what the oracle pins.

    Scale: per refresh the sink reads the MV (view grain — bounded),
    unions the batch partials, re-aggregates at view grain and
    publishes one immutable snapshot via an atomic marker flip
    (streaming/upsert_sink.py — object-store-safe). The stream's own
    state is ZERO: aggregation state lives in the MV table, which is
    what makes this the restartable production shape (a crashed job
    resumes from the committed snapshot + checkpoint offsets)."""
    import shutil
    import tempfile
    import uuid

    from ..streaming.upsert_sink import VersionedParquetTable

    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        "ts",
        F.expr(
            "CAST(FLOOR(value * CAST(1000000 AS DOUBLE)"
            " + CAST(0.5 AS DOUBLE)) AS BIGINT)"
        ).alias("vm"),
    )
    scratch = tempfile.mkdtemp(prefix="bigdata_spark_smv_")
    target_root = f"{scratch}/mv"

    def refresh(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        table = VersionedParquetTable(batch.sparkSession, target_root)
        partial = batch.groupBy("event_type").agg(
            F.count("*").alias("n_events"),
            F.sum("vm").alias("v_micros"),
        )
        cur = table.read()
        merged = (
            partial
            if cur is None
            else cur.unionByName(partial)
            .groupBy("event_type")
            .agg(
                F.sum("n_events").alias("n_events"),
                F.sum("v_micros").alias("v_micros"),
            )
        )
        table.publish(merged)

    try:
        stream = _stage_chronological_stream(
            spark, e, scratch, n_parts=_SMV_N_PARTS
        )
        q = (
            stream.writeStream.foreachBatch(refresh)
            .option("checkpointLocation", f"{scratch}/ckpt_{uuid.uuid4().hex[:8]}")
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError(
                "evt_stream_incremental_mv did not finish in 300s"
            )
        table = VersionedParquetTable(spark, target_root)
        mv = table.read()
        if mv is None:
            raise RuntimeError("MV sink published no version")
        n_refreshes = int(table.current_version()) + 1
        out = (
            mv.select(
                "event_type",
                "n_events",
                F.col("v_micros").cast("long").alias("v_micros"),
                F.lit(n_refreshes).cast("long").alias("n_refreshes"),
            )
            .orderBy("event_type")
            .toPandas()
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    return spark.createDataFrame(out)


EVT_STREAM_IMV_SQL = f"""
SELECT event_type, COUNT(*) AS n_events,
       CAST(SUM(CAST(FLOOR(value * CAST(1000000 AS DOUBLE)
            + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS BIGINT) AS v_micros,
       CAST({_SMV_N_PARTS} AS BIGINT) AS n_refreshes
FROM events
GROUP BY event_type
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# evt_stream_full_outer_join — stream-stream FULL OUTER join
# ---------------------------------------------------------------------------


def evt_stream_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream FULL OUTER join — the last join mode after
    evt_stream_join (inner) and evt_stream_outer_join (left):
    watermark expiry now null-pads BOTH unmatched sides. A click with
    no purchase in its 30-minute window emits (click_id, NULL) once no
    match can still arrive; a purchase no click preceded emits
    (NULL, purchase_id) symmetrically — the audit-complete attribution
    join (every event accounted for exactly once).

    Determinism contract (oracle-pinned): with W = min(max click_ts,
    max purchase_ts) − 30 min — Spark's multi-input watermark —
    emitted = all matched pairs, PLUS unmatched clicks with
    click_ts + 30 min < W (a future purchase p ≥ W could still land
    inside a younger click's window), PLUS unmatched purchases with
    purchase_ts < W (a future click c ≥ W can only match purchases
    p ≥ c — the asymmetry falls straight out of the one-sided window
    p ∈ [c, c + 30 min]). Rows younger than their side's horizon stay
    in state and would surface on restart.

    Scale: state on each side is watermark-bounded (30 min + range of
    in-flight stream volume), hash-partitioned on user_id — identical
    asymptotics to the inner join; FULL OUTER adds only the eviction-
    time null emission, no extra state."""
    import shutil
    import tempfile
    import uuid

    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type"
    )
    scratch = tempfile.mkdtemp(prefix="bigdata_spark_foj_")
    try:
        with _stream_state_partitions(spark):
            stream = _stage_chronological_stream(spark, e, scratch, n_parts=4, sf_dir=sf_dir)
            clicks = (
                stream.filter(F.col("event_type") == "click")
                .select(
                    F.col("event_id").alias("click_id"),
                    "user_id",
                    F.col("ts").alias("click_ts"),
                )
                .withWatermark("click_ts", "30 minutes")
            )
            purchases = (
                stream.filter(F.col("event_type") == "purchase")
                .select(
                    F.col("event_id").alias("purchase_id"),
                    F.col("user_id").alias("p_user_id"),
                    F.col("ts").alias("purchase_ts"),
                )
                .withWatermark("purchase_ts", "30 minutes")
            )
            joined = clicks.join(
                purchases,
                on=[
                    clicks.user_id == purchases.p_user_id,
                    purchases.purchase_ts >= clicks.click_ts,
                    purchases.purchase_ts
                    <= clicks.click_ts + F.expr("INTERVAL 30 MINUTES"),
                ],
                how="full_outer",
            ).select(
                "click_id",
                F.coalesce("user_id", "p_user_id").alias("user_id"),
                "purchase_id",
                (
                    F.unix_timestamp("purchase_ts")
                    - F.unix_timestamp("click_ts")
                ).alias("gap_s"),
            )
            qname = "evt_foj_" + uuid.uuid4().hex[:8]
            q = (
                joined.writeStream.format("memory")
                .queryName(qname)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            if not q.awaitTermination(300):
                q.stop()
                raise TimeoutError(
                    "evt_stream_full_outer_join: availableNow stream did not "
                    "finish in 300s"
                )
        return spark.table(qname).localCheckpoint()
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


EVT_STREAM_FULL_OUTER_JOIN_SQL = """
WITH c AS (
  SELECT event_id AS click_id, user_id, ts AS click_ts
  FROM events WHERE event_type = 'click'
), p AS (
  SELECT event_id AS purchase_id, user_id AS p_user_id, ts AS purchase_ts
  FROM events WHERE event_type = 'purchase'
), wm AS (
  SELECT LEAST((SELECT MAX(click_ts) FROM c),
               (SELECT MAX(purchase_ts) FROM p)) - INTERVAL 30 MINUTE AS w
), m AS (
  SELECT c.click_id, c.user_id, c.click_ts, p.purchase_id, p.purchase_ts
  FROM c JOIN p
    ON c.user_id = p.p_user_id
   AND p.purchase_ts >= c.click_ts
   AND p.purchase_ts <= c.click_ts + INTERVAL 30 MINUTE
)
SELECT click_id, user_id, purchase_id,
       CAST(date_diff('second', click_ts, purchase_ts) AS BIGINT) AS gap_s
FROM m
UNION ALL
SELECT c.click_id, c.user_id,
       CAST(NULL AS BIGINT) AS purchase_id, CAST(NULL AS BIGINT) AS gap_s
FROM c, wm
WHERE c.click_ts + INTERVAL 30 MINUTE < wm.w
  AND NOT EXISTS (SELECT 1 FROM m WHERE m.click_id = c.click_id)
UNION ALL
SELECT CAST(NULL AS BIGINT) AS click_id, p.p_user_id AS user_id,
       p.purchase_id, CAST(NULL AS BIGINT) AS gap_s
FROM p, wm
WHERE p.purchase_ts < wm.w
  AND NOT EXISTS (SELECT 1 FROM m WHERE m.purchase_id = p.purchase_id)
"""


# ---------------------------------------------------------------------------
# evt_stream_state_timeout — processing-time TTL eviction of custom state
# ---------------------------------------------------------------------------


def evt_stream_state_timeout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator with PROCESSING-TIME timeout eviction
    (streaming/stateful.py timeout_evicted_rollup): per-USER GroupState
    holds the in-flight (day → count, micro-sum) rollups; a day emits
    when it closes — eagerly, in the first later batch where the user
    sends data but none for that day (the stream stages
    chronologically, so an absent day is finished), or via the user's
    re-armed 1 ms processing-time TTL once the user goes fully idle.
    Data arrival always preempts the timeout.

    Determinism contract: events re-stage as TWO chronological files
    (one micro-batch each; the integer-microsecond boundary rule is
    the one evt_stream_ckpt_recovery pins — two triggers is the
    minimum that still exercises BOTH eviction paths mid-stream: the
    second data batch eagerly closes the first batch's finished days
    AND fires the TTL branch for users idle since batch one; r8 ran
    four triggers and the cost term is triggers × per-user state
    invocations, so halving the triggers halves the fleet's most
    expensive entry); no-data micro-batches are OFF for this query, so
    timeouts fire only on real batch boundaries and the stream
    terminates — which also means keys still holding state after the
    LAST batch are not flushed (they'd surface on restart). Emitted
    set ≡ every (user, day) whose latest event falls before the final
    half — exactly the oracle, via either eviction path.

    Scale: state is LIVE-USER-bounded (closed days leave state in the
    batch that closes them; an idle user's TTL reclaims the rest) and
    hash-partitioned 16 ways so per-user Python invocations run in
    parallel —
    the TTL-cache pattern that keeps a 100 TB stream's state store
    keyed by live sessions, not by every session-day ever seen."""
    import shutil
    import tempfile
    import uuid

    from ..streaming.stateful import timeout_evicted_rollup

    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.expr("CAST(ts AS DATE)").alias("day"),
        "ts",
        F.expr(
            "CAST(FLOOR(value * CAST(1000000 AS DOUBLE)"
            " + CAST(0.5 AS DOUBLE)) AS BIGINT)"
        ).alias("vm"),
    )
    scratch = tempfile.mkdtemp(prefix="bigdata_spark_ttl_")
    nodata_key = "spark.sql.streaming.noDataMicroBatches.enabled"
    prev_nodata = spark.conf.get(nodata_key)
    spark.conf.set(nodata_key, "false")
    try:
        # 16 state partitions: 1500 live users fan out over 16 Python
        # workers per trigger instead of 4 — state hash-partitioning is
        # result-invariant and MORE partitions is the production shape
        with _stream_state_partitions(spark, n=16):
            stream = _stage_chronological_stream(spark, e, scratch, n_parts=2, sf_dir=sf_dir)
            out = timeout_evicted_rollup(
                stream, "user_id", "day", value_col="vm", timeout_ms=1
            )
            qname = "evt_ttl_" + uuid.uuid4().hex[:8]
            q = (
                out.writeStream.format("memory")
                .queryName(qname)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            if not q.awaitTermination(300):
                q.stop()
                raise TimeoutError(
                    "evt_stream_state_timeout: availableNow stream did not "
                    "finish in 300s"
                )
        return spark.table(qname).localCheckpoint()
    finally:
        spark.conf.set(nodata_key, prev_nodata)
        shutil.rmtree(scratch, ignore_errors=True)


EVT_STREAM_TIMEOUT_SQL = """
WITH b AS (
  SELECT epoch_us(MIN(ts)) AS lo, epoch_us(MAX(ts)) AS hi FROM events
), ev AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         CAST(FLOOR(value * CAST(1000000 AS DOUBLE)
              + CAST(0.5 AS DOUBLE)) AS BIGINT) AS vm,
         least(1, (epoch_us(ts) - b.lo) // greatest(1, (b.hi - b.lo) // 2)) AS qt
  FROM events, b
)
SELECT user_id, day, COUNT(*) AS n_events,
       CAST(SUM(vm) AS BIGINT) AS v_micros
FROM ev GROUP BY 1, 2 HAVING MAX(qt) < 1
"""


# ---------------------------------------------------------------------------
# evt_stream_event_time_timeout — watermark-driven GroupState eviction
# ---------------------------------------------------------------------------

_ETS_GAP_US = 6 * 3600 * 1_000_000
_ETS_DELAY = "30 minutes"
_ETS_DELAY_US = 30 * 60 * 1_000_000


def evt_stream_event_time_timeout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization whose idle-session eviction is driven
    by GroupStateTimeout.EventTimeTimeout — the WATERMARK-clocked state
    timeout that completes the state-timeout matrix next to
    evt_stream_state_timeout's processing-time TTL (streaming/
    stateful.py:event_time_sessionize): a session closes either when a
    later event of the same user exceeds the 6 h gap (data path), or
    when the stream's event-time watermark passes the session's gap
    horizon (timeout path) — replay-deterministic in a way a
    processing-time TTL can never be, because the clock is the data's.

    Determinism contract (oracle-pinned): events re-stage as two
    chronological files (one micro-batch each — batch 2 exercises the
    DATA eviction path on batch-1 sessions and the watermark timeout
    for users idle since batch 1); under availableNow Spark appends
    one final NO-DATA micro-batch whose watermark includes the LAST
    batch's data — the timeout trigger for everything still idle — so
    the emitted set is batch-structure-independent and exactly:
    every non-final session of a user, plus the final session iff its
    gap horizon (armed at the CEILING millisecond of end + gap — the
    operator's exact arming grain) lies strictly below the final
    watermark (floor-ms of the global max event time, minus the 30 min
    delay — Spark's own ms-grain watermark arithmetic). The oracle
    computes BOTH sides at that millisecond grain, so operator and
    oracle are bit-aligned rather than empirically pinned (the two
    eviction paths agree by construction on a chronological stream;
    see the operator docstring).

    Scale: one GroupState row per LIVE user (start/last/count/sum as
    exact epoch-micro integers), hash-partitioned 16 ways; watermark
    state is O(partitions). This is the production sessionization
    shape — state bounded by concurrent sessions, not history."""
    import shutil
    import tempfile
    import uuid

    from ..streaming.stateful import event_time_sessionize

    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        F.expr(
            "CAST(FLOOR(value * CAST(1000000 AS DOUBLE)"
            " + CAST(0.5 AS DOUBLE)) AS BIGINT)"
        ).alias("vm"),
    )
    scratch = tempfile.mkdtemp(prefix="bigdata_spark_ets_")
    try:
        with _stream_state_partitions(spark, n=16):
            stream = _stage_chronological_stream(spark, e, scratch, n_parts=2, sf_dir=sf_dir)
            out = event_time_sessionize(
                stream.withWatermark("ts", _ETS_DELAY),
                "user_id",
                "ts",
                "vm",
                gap_us=_ETS_GAP_US,
            )
            qname = "evt_ets_" + uuid.uuid4().hex[:8]
            q = (
                out.writeStream.format("memory")
                .queryName(qname)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            if not q.awaitTermination(300):
                q.stop()
                raise TimeoutError(
                    "evt_stream_event_time_timeout: availableNow stream did"
                    " not finish in 300s"
                )
        return spark.table(qname).localCheckpoint()
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


_ETS_DELAY_MS = _ETS_DELAY_US // 1000

# Final-session eviction is compared at Spark's own grain: the timeout
# clock arms at ceil-ms of (end + gap) and fires strictly below the
# ms-grain watermark floor(max event us / 1000) - delay_ms — both
# sides of the inequality below are that exact integer arithmetic.
EVT_STREAM_ETS_SQL = f"""
WITH ev AS (
  SELECT user_id, epoch_us(ts) AS us,
         CAST(FLOOR(value * CAST(1000000 AS DOUBLE)
              + CAST(0.5 AS DOUBLE)) AS BIGINT) AS vm
  FROM events
), wm AS (SELECT (MAX(us) // 1000) - {_ETS_DELAY_MS} AS w_ms FROM ev),
l AS (
  SELECT user_id, us, vm,
         CASE WHEN lag(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL
                   OR us - lag(us) OVER (PARTITION BY user_id ORDER BY us)
                      > {_ETS_GAP_US}
              THEN 1 ELSE 0 END AS brk
  FROM ev
), g AS (
  SELECT user_id, us, vm,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY us
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM l
), s AS (
  SELECT user_id, sid, MIN(us) AS start_us, MAX(us) AS end_us,
         COUNT(*) AS n_events, CAST(SUM(vm) AS BIGINT) AS v_micros,
         MAX(sid) OVER (PARTITION BY user_id) AS maxsid
  FROM g GROUP BY 1, 2
)
SELECT user_id, start_us, end_us, n_events, v_micros
FROM s, wm
WHERE sid < maxsid OR (end_us + {_ETS_GAP_US} + 999) // 1000 < wm.w_ms
"""


# ---------------------------------------------------------------------------
# evt_stream_checkpoint_recovery — kill/restart proof of state recovery
# ---------------------------------------------------------------------------


def evt_stream_checkpoint_recovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checkpoint-recovery PROOF for stateful streaming — the invariant
    every docstring in this family asserts ("state would surface on
    restart"), here actually exercised and oracle-gated: the
    event-time sessionizer (streaming/stateful.py) runs against a
    file source, is STOPPED after it drains the first chronological
    file group, then a SECOND query restarts from the SAME checkpoint
    after more files land — and the union of the two runs' emissions
    must equal the uninterrupted run bit-for-bit (the same ms-aligned
    contract EVT_STREAM_ETS_SQL pins for evt_stream_event_time_timeout).

    What restart actually recovers, all from the checkpoint dir:
    (1) SOURCE OFFSETS — the file-source log marks group-1 files
    processed, so run 2 reads only the new files (no double counting —
    any replay would double n_events/v_micros and fail the value
    hash); (2) GROUP STATE — sessions still open at shutdown resume
    with their exact (start, last, n, Σv) and close later by data or
    timeout; (3) THE WATERMARK — run 2 starts from run 1's final
    watermark, so timeout eviction stays replay-deterministic.
    Emission-set equality with the uninterrupted run holds by the
    two-path agreement: any session run 1's final no-data batch
    evicted by timeout would have been closed by the same user's next
    (chronologically later) event in run 2 anyway, with an identical
    row.

    Scale: this is the production restart path itself — state
    proportional to live sessions, recovery cost proportional to
    state + one checkpoint read, never to stream history. Each run
    writes its append-mode emissions to the same parquet dir; the
    final read is the union."""
    import os
    import shutil
    import tempfile

    from ..streaming.stateful import event_time_sessionize

    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        F.expr(
            "CAST(FLOOR(value * CAST(1000000 AS DOUBLE)"
            " + CAST(0.5 AS DOUBLE)) AS BIGINT)"
        ).alias("vm"),
    )
    scratch = tempfile.mkdtemp(prefix="bigdata_spark_ckpt_")
    indir = os.path.join(scratch, "in")
    ckpt = os.path.join(scratch, "ckpt")  # SHARED by both runs
    outdir = os.path.join(scratch, "out")
    os.makedirs(indir, exist_ok=True)

    def run_until_drained() -> None:
        stream = (
            spark.readStream.schema(e.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(indir)
            .withColumn("ts", F.col("ts").cast("timestamp"))
        )
        out = event_time_sessionize(
            stream.withWatermark("ts", _ETS_DELAY),
            "user_id",
            "ts",
            "vm",
            gap_us=_ETS_GAP_US,
        )
        q = (
            out.writeStream.foreachBatch(
                lambda b, _i: b.write.mode("append").parquet(outdir)
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError(
                "evt_stream_checkpoint_recovery: run did not drain in 300s"
            )

    try:
        groups = _stage_quarter_files(spark, e, scratch, n_parts=2, bounds_us=_events_ts_bounds_us(sf_dir))
        with _stream_state_partitions(spark, n=16):
            # run 1: only the first chronological group is visible
            for j, src in enumerate(groups[0]):
                shutil.copy(src, os.path.join(indir, f"00_{j}.parquet"))
            run_until_drained()
            # the query is STOPPED; the rest of the corpus lands;
            # run 2 restarts from the same checkpoint
            for j, src in enumerate(groups[1]):
                shutil.copy(src, os.path.join(indir, f"01_{j}.parquet"))
            run_until_drained()
        out_schema = (
            "user_id bigint, start_us long, end_us long,"
            " n_events long, v_micros long"
        )
        return (
            spark.read.schema(out_schema).parquet(outdir).localCheckpoint()
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


# ---------------------------------------------------------------------------
# w12_seq_pattern — regex motif mining over per-user event sequences
# ---------------------------------------------------------------------------

# event_type -> one-letter alphabet for sequence strings (c=click,
# e=error, p=purchase, s=signup, v=view)
_SEQ_PATTERNS = (
    ("view_click_purchase", "vc*p"),
    ("error_retry_success", "e[ve]*p"),
    ("signup_then_purchase", "s.*p"),
)


def w12_seq_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-pattern mining (the MATCH_RECOGNIZE-shaped kernel
    product analytics calls "behavioral motifs"): each user's events
    collapse — in (ts, event_id) total order — into one string over a
    5-letter alphabet, and each motif is a plain regex counted per
    user with regexp_count. One shuffle to build the per-user strings,
    then pure string ops; both engines run the same regexes on the
    same strings, so matched-user and total-match counts are exact.
    At 100 TB the per-user sequence string IS the bounded state (a
    user's history), so this stays a one-pass groupBy; motifs needing
    cross-user context would go to the graph/transition entries
    instead."""
    e = load_table(spark, sf_dir, "events")
    seqs = (
        e.select(
            "user_id",
            "ts",
            "event_id",
            F.substring("event_type", 1, 1).alias("ch"),
        )
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("ts", "event_id", "ch"))),
                    lambda x: x["ch"],
                ),
                "",
            ).alias("seq")
        )
    )
    out = None
    for name, pat in _SEQ_PATTERNS:
        m = seqs.select(
            F.lit(name).alias("pattern"),
            F.expr(f"regexp_count(seq, '{pat}')").alias("k"),
        ).groupBy("pattern").agg(
            F.sum(F.when(F.col("k") > 0, 1).otherwise(0)).cast("long").alias("n_users_matched"),
            F.sum("k").cast("long").alias("n_matches"),
        )
        out = m if out is None else out.unionAll(m)
    return out.orderBy("pattern")


def _seq_pattern_sql() -> str:
    # DuckDB has no regexp_count; len(regexp_extract_all(...)) counts the
    # same non-overlapping leftmost matches Spark's regexp_count does
    arms = "\nUNION ALL\n".join(
        f"""SELECT '{name}' AS pattern,
       CAST(SUM(CASE WHEN len(regexp_extract_all(seq, '{pat}')) > 0
                THEN 1 ELSE 0 END) AS BIGINT) AS n_users_matched,
       CAST(SUM(len(regexp_extract_all(seq, '{pat}'))) AS BIGINT) AS n_matches
FROM seqs"""
        for name, pat in _SEQ_PATTERNS
    )
    return f"""
WITH seqs AS (
  SELECT user_id, string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id) AS seq
  FROM events GROUP BY user_id
)
{arms}
ORDER BY pattern
"""


W12_SEQ_SQL = _seq_pattern_sql()


# ---------------------------------------------------------------------------
# dq_table_checksum — order-free cross-engine table fingerprints
# ---------------------------------------------------------------------------


def dq_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-system reconciliation fingerprints: every row of a table
    reduces to the portable md5-derived 60-bit hash of its canonical
    key string, and the table's checksum is the order-free BIT_XOR of
    those hashes plus the row count — the pair you compare across a
    migration (warehouse A vs warehouse B) without moving data. XOR is
    commutative/associative, so the checksum is partition-order-free
    by construction and map-side combinable; this query IS its own
    proof, since DuckDB recomputes the identical checksums from the
    same parquet. One scan per table, keys-only projection."""
    specs = [
        ("orders", "o_orderkey", "o_totalprice"),
        ("customer", "c_custkey", "c_acctbal"),
        ("lineitem", "l_orderkey", "l_linenumber"),
    ]
    out = None
    for t, k1, k2 in specs:
        df = load_table(spark, sf_dir, t)
        h = (
            f"CAST(conv(substring(md5(concat(CAST({k1} AS STRING), '|', "
            f"CAST({k2} AS STRING))), 1, 15), 16, 10) AS BIGINT)"
        )
        agg = df.select(F.expr(h).alias("h")).agg(
            F.lit(t).alias("table_name"),
            F.count("*").alias("n_rows"),
            F.expr("bit_xor(h)").alias("checksum"),
        ).select("table_name", "n_rows", "checksum")
        out = agg if out is None else out.unionAll(agg)
    return out.orderBy("table_name")


def _checksum_sql() -> str:
    arms = []
    for t, k1, k2 in (
        ("orders", "o_orderkey", "o_totalprice"),
        ("customer", "c_custkey", "c_acctbal"),
        ("lineitem", "l_orderkey", "l_linenumber"),
    ):
        h = f"('0x' || substr(md5({k1} || '|' || {k2}), 1, 15))::BIGINT"
        arms.append(
            f"SELECT '{t}' AS table_name, CAST(COUNT(*) AS BIGINT) AS n_rows, "
            f"CAST(bit_xor({h}) AS BIGINT) AS checksum FROM {t}"
        )
    return "\nUNION ALL\n".join(arms) + "\nORDER BY table_name"


DQ_CHECKSUM_SQL = _checksum_sql()

# ---------------------------------------------------------------------------
# evt_markov_stationary — stationary distribution of the user-path chain
# ---------------------------------------------------------------------------

_MKV_ITERS = 12
_MKV_SCALE = 10_000_000_000


def evt_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution of the first-order user-path Markov
    chain — where do user journeys settle? evt_transitions builds the
    transition matrix; this runs 12 rounds of integer fixed-point power
    iteration π' (s') = Σ_s (π(s)·n(s→s')) div tot(s) over it, the
    graph_pagerank discipline applied to a dense stochastic matrix, so
    the DuckDB oracle replays every round bit-for-bit as unrolled CTEs.

    Scale: the transition counts are one data-sized window + groupBy
    (shared shape with evt_transitions); the iteration then runs on a
    #states² table — constant work per round no matter the corpus
    size. Mass stays BIGINT throughout (π ≤ 1e10, counts ≤ corpus
    rows; products ≤ 1e10·n fit BIGINT to ~10⁸ transitions per pair)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = e.select(
        F.lag("event_type").over(w).alias("prev_type"),
        F.col("event_type").alias("next_type"),
    ).filter(F.col("prev_type").isNotNull())
    counts = t.groupBy("prev_type", "next_type").agg(F.count("*").alias("n"))
    totals = counts.groupBy("prev_type").agg(F.sum("n").alias("tot"))
    edges = counts.join(F.broadcast(totals), "prev_type").localCheckpoint()
    states = edges.select(F.col("prev_type").alias("state")).distinct()

    pi = states.select("state", F.lit(_MKV_SCALE).cast("long").alias("mass"))
    for _ in range(_MKV_ITERS):
        pi = (
            edges.join(pi, edges.prev_type == pi.state)
            .groupBy(F.col("next_type").alias("state2"))
            .agg(F.sum(F.expr("(mass * n) div tot")).alias("mass"))
            .select(F.col("state2").alias("state"), "mass")
            .localCheckpoint()
        )
    return pi.select(F.col("state").alias("event_type"), "mass").orderBy(
        F.desc("mass"), "event_type"
    )


def _markov_sql() -> str:
    steps = []
    for i in range(_MKV_ITERS):
        steps.append(
            f"""pi{i + 1} AS (
  SELECT e.next_type AS state,
         CAST(SUM((p.mass * e.n) // e.tot) AS BIGINT) AS mass
  FROM edges e JOIN pi{i} p ON p.state = e.prev_type
  GROUP BY 1
)"""
        )
    chain = ",\n".join(steps)
    return f"""
WITH seq AS (
  SELECT LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type,
         event_type AS next_type
  FROM events
), counts AS (
  SELECT prev_type, next_type, COUNT(*) AS n
  FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2
), edges AS (
  SELECT c.*, t.tot FROM counts c
  JOIN (SELECT prev_type, SUM(n) AS tot FROM counts GROUP BY 1) t
    USING (prev_type)
), pi0 AS (
  SELECT DISTINCT prev_type AS state, CAST({_MKV_SCALE} AS BIGINT) AS mass
  FROM edges
),
{chain}
SELECT state AS event_type, mass FROM pi{_MKV_ITERS}
ORDER BY mass DESC, event_type
"""


EVT_MARKOV_SQL = _markov_sql()


# ---------------------------------------------------------------------------
# w13_rising_streaks — longest strictly-increasing runs (momentum scan)
# ---------------------------------------------------------------------------

_STREAK_TOPK = 10


def w13_rising_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest strictly-rising revenue streaks — the momentum variant
    of gaps-and-islands (w8 groups EQUAL values; this breaks a run on
    any non-increase, the lag-compare + running-break-count trick).
    Daily revenue reduces to exact cents; a day extends the streak iff
    its revenue strictly exceeds yesterday's AND the days are
    consecutive; the top-10 streaks report span, length, and total
    climb. Two window passes over the ~2.4k-day table (which is the
    data-sized rollup's OUTPUT, not the fact table) and one small
    aggregate."""
    o = load_table(spark, sf_dir, "orders")
    daily = (
        o.select(
            F.expr("CAST(o_orderdate AS DATE)").alias("d"),
            F.expr(
                "CAST(FLOOR(o_totalprice * CAST(100 AS DOUBLE)"
                " + CAST(0.5 AS DOUBLE)) AS BIGINT)"
            ).alias("c"),
        )
        .groupBy("d")
        .agg(F.sum("c").alias("rev"))
    )
    w = Window.orderBy("d")
    flagged = daily.select(
        "d",
        "rev",
        F.expr(
            "IF(lag(rev) OVER (ORDER BY d) IS NOT NULL"
            " AND rev > lag(rev) OVER (ORDER BY d)"
            " AND datediff(d, lag(d) OVER (ORDER BY d)) = 1, 0, 1)"
        ).alias("brk"),
    )
    grouped = flagged.withColumn(
        "grp",
        F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        grouped.groupBy("grp")
        .agg(
            F.min("d").alias("start_day"),
            F.max("d").alias("end_day"),
            F.count("*").alias("len_days"),
            (F.max("rev") - F.min("rev")).alias("climb_cents"),
        )
        .filter(F.col("len_days") >= 2)
        .orderBy(F.desc("len_days"), F.desc("climb_cents"), "start_day")
        .limit(_STREAK_TOPK)
        .select("start_day", "end_day", "len_days", "climb_cents")
    )


W13_STREAK_SQL = f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         SUM(CAST(FLOOR(o_totalprice * CAST(100 AS DOUBLE)
              + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS rev
  FROM orders GROUP BY 1
), flagged AS (
  SELECT d, rev,
         CASE WHEN lag(rev) OVER (ORDER BY d) IS NOT NULL
                   AND rev > lag(rev) OVER (ORDER BY d)
                   AND datediff('day', lag(d) OVER (ORDER BY d), d) = 1
              THEN 0 ELSE 1 END AS brk
  FROM daily
), grouped AS (
  SELECT *, SUM(brk) OVER (ORDER BY d
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
  FROM flagged
)
SELECT MIN(d) AS start_day, MAX(d) AS end_day,
       COUNT(*) AS len_days,
       CAST(MAX(rev) - MIN(rev) AS BIGINT) AS climb_cents
FROM grouped
GROUP BY grp
HAVING COUNT(*) >= 2
ORDER BY len_days DESC, climb_cents DESC, start_day
LIMIT {_STREAK_TOPK}
"""


# ---------------------------------------------------------------------------
# evt_cohort_ltv — cohort lifetime-value triangle with cumulative LTV/user
# ---------------------------------------------------------------------------


def evt_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV triangle — the revenue-side twin of evt_retention:
    users cohort by the ISO week of their FIRST event; purchase value
    accrues to (cohort_week, age_weeks) cells in exact micro-units;
    each cohort's running total divides by its fixed cohort size for
    cumulative LTV per user (ppm-exact by integer division, plus the
    one shared IEEE double).

    Scale: one groupBy to user grain (first-event week), one
    user-keyed shuffle join back onto purchases (both sides hash on
    user_id; the first-event table is user-set cardinality, so it is
    NEVER broadcast — AQE picks the join strategy), one cell-grain
    rollup — the triangle is #cohorts × #ages rows and the cumulative
    window runs over it, not the fact table."""
    e = load_table(spark, sf_dir, "events")
    first = e.groupBy("user_id").agg(
        F.expr("CAST(date_trunc('week', MIN(ts)) AS DATE)").alias("cohort_w")
    )
    sizes = first.groupBy("cohort_w").agg(F.count("*").alias("cohort_users"))
    buys = (
        e.filter(F.col("event_type") == "purchase")
        .join(first, "user_id")
        .select(
            "cohort_w",
            F.expr(
                "CAST(datediff(CAST(date_trunc('week', ts) AS DATE), cohort_w)"
                " div 7 AS INT)"
            ).alias("age_weeks"),
            F.expr(
                "CAST(FLOOR(value * CAST(1000000 AS DOUBLE)"
                " + CAST(0.5 AS DOUBLE)) AS BIGINT)"
            ).alias("rev_micro"),
        )
    )
    cells = buys.groupBy("cohort_w", "age_weeks").agg(
        F.count("*").alias("n_purchases"),
        F.sum("rev_micro").alias("rev_micro"),
    )
    w_cum = (
        Window.partitionBy("cohort_w")
        .orderBy("age_weeks")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        cells.join(F.broadcast(sizes), "cohort_w")
        .select(
            "cohort_w",
            "age_weeks",
            "cohort_users",
            "n_purchases",
            "rev_micro",
            F.sum("rev_micro").over(w_cum).alias("cum_rev_micro"),
        )
        .withColumn(
            "ltv_micro_per_user",
            F.expr("cum_rev_micro div cohort_users"),
        )
        .orderBy("cohort_w", "age_weeks")
    )


EVT_COHORT_LTV_SQL = """
WITH first AS (
  SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_w
  FROM events GROUP BY 1
), sizes AS (
  SELECT cohort_w, COUNT(*) AS cohort_users FROM first GROUP BY 1
), buys AS (
  SELECT f.cohort_w,
         CAST(datediff('day', f.cohort_w,
              CAST(date_trunc('week', e.ts) AS DATE)) // 7 AS INT)
           AS age_weeks,
         CAST(FLOOR(e.value * CAST(1000000 AS DOUBLE)
              + CAST(0.5 AS DOUBLE)) AS BIGINT) AS rev_micro
  FROM events e JOIN first f ON e.user_id = f.user_id
  WHERE e.event_type = 'purchase'
), cells AS (
  SELECT cohort_w, age_weeks, COUNT(*) AS n_purchases,
         CAST(SUM(rev_micro) AS BIGINT) AS rev_micro
  FROM buys GROUP BY 1, 2
)
SELECT c.cohort_w, c.age_weeks, s.cohort_users, c.n_purchases, c.rev_micro,
       CAST(SUM(c.rev_micro) OVER (PARTITION BY c.cohort_w ORDER BY c.age_weeks
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_rev_micro,
       CAST(SUM(c.rev_micro) OVER (PARTITION BY c.cohort_w ORDER BY c.age_weeks
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         // s.cohort_users AS ltv_micro_per_user
FROM cells c JOIN sizes s ON c.cohort_w = s.cohort_w
ORDER BY c.cohort_w, c.age_weeks
"""


# ---------------------------------------------------------------------------
# evt_seasonal_anomaly — anomalies on the seasonally-adjusted residual
# ---------------------------------------------------------------------------

_SEAS_Z = "CAST(3 AS DOUBLE)"  # alarm threshold in residual sigmas

# residual z-score: one shared IEEE expression over exact micro sums
_SEAS_ZEXPR = (
    "(CAST(resid_micro AS DOUBLE) / CAST(1000000 AS DOUBLE))"
    " / SQRT(CAST(g_r2 AS DOUBLE) / CAST(g_n AS DOUBLE)"
    " / CAST(1000000000000 AS DOUBLE))"
)


def evt_seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonally-adjusted anomaly detection — evt_anomaly_zscore's
    upgrade for metrics with a weekly/diurnal cycle: hourly purchase
    value is compared against ITS OWN (weekday, hour) seasonal mean
    (micro-exact, integer division), and the z-score runs on the
    RESIDUAL so the 3σ alarm fires on genuine deviations, not on every
    Friday evening. Residuals and their second moment stay exact
    micro/micro² integers; the z-score is one shared IEEE expression.
    Emits only the alarming hours (|z| > 3).

    Scale: one map-side-combinable rollup to hour grain, one broadcast
    of the 168-cell seasonal profile, and the global residual moments
    fold as a one-row aggregate broadcast back onto the hour table (no
    single-partition window — the hour grain grows with the time
    span) — the fact table is scanned once."""
    e = load_table(spark, sf_dir, "events")
    hourly = (
        e.filter(F.col("event_type") == "purchase")
        .select(
            F.expr("date_trunc('hour', ts)").alias("h"),
            F.expr(
                "CAST(FLOOR(value * CAST(1000000 AS DOUBLE)"
                " + CAST(0.5 AS DOUBLE)) AS BIGINT)"
            ).alias("vm"),
        )
        .groupBy("h")
        .agg(F.sum("vm").alias("vm"))
        .select(
            "h",
            F.expr("dayofweek(h)").alias("dow"),
            F.expr("hour(h)").alias("hod"),
            "vm",
        )
    )
    season = hourly.groupBy("dow", "hod").agg(
        F.count("*").alias("cells"), F.sum("vm").alias("sum_vm")
    ).withColumn("mean_micro", F.expr("sum_vm div cells"))
    resid = hourly.join(F.broadcast(season), ["dow", "hod"]).select(
        "h",
        "dow",
        "hod",
        "vm",
        "mean_micro",
        (F.col("vm") - F.col("mean_micro")).alias("resid_micro"),
    )
    # global residual moments: one-row aggregate + crossJoin(broadcast)
    # instead of a zero-partition window — the hour grain grows linearly
    # with the time span, so a single-partition window over it would
    # funnel the whole series through one task at long horizons
    moments = resid.agg(
        F.count("*").alias("g_n"),
        F.sum(
            F.expr(
                "CAST(resid_micro AS DECIMAL(19,0))"
                " * CAST(resid_micro AS DECIMAL(19,0))"
            )
        ).alias("g_r2"),
    )
    z = resid.crossJoin(F.broadcast(moments))
    return (
        z.selectExpr(
            "h", "dow", "hod", "vm", "mean_micro", "resid_micro",
            f"{_SEAS_ZEXPR} AS z",
        )
        .filter(F.expr(f"ABS(z) > {_SEAS_Z}"))
        .orderBy("h")
    )


EVT_SEASONAL_ANOM_SQL = f"""
WITH hourly AS (
  -- DuckDB dayofweek is 0-based (Sunday=0); Spark's is 1-based — align
  SELECT h, CAST(dayofweek(h) + 1 AS INT) AS dow,
         CAST(hour(h) AS INT) AS hod, vm FROM (
    SELECT date_trunc('hour', ts) AS h,
           SUM(CAST(FLOOR(value * CAST(1000000 AS DOUBLE)
                + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS vm
    FROM events WHERE event_type = 'purchase'
    GROUP BY 1
  )
), season AS (
  SELECT dow, hod, COUNT(*) AS cells, SUM(vm) AS sum_vm,
         CAST(SUM(vm) AS HUGEINT) // COUNT(*) AS mean_micro
  FROM hourly GROUP BY 1, 2
), resid AS (
  SELECT h.h, h.dow, h.hod, CAST(h.vm AS BIGINT) AS vm,
         CAST(s.mean_micro AS BIGINT) AS mean_micro,
         CAST(h.vm - CAST(s.mean_micro AS BIGINT) AS BIGINT) AS resid_micro
  FROM hourly h JOIN season s ON h.dow = s.dow AND h.hod = s.hod
), z AS (
  SELECT *,
         COUNT(*) OVER () AS g_n,
         SUM(CAST(resid_micro AS DECIMAL(19,0))
             * CAST(resid_micro AS DECIMAL(19,0))) OVER () AS g_r2
  FROM resid
)
SELECT h, dow, hod, vm, mean_micro, resid_micro,
       {_SEAS_ZEXPR} AS z
FROM z
WHERE ABS({_SEAS_ZEXPR}) > {_SEAS_Z}
ORDER BY h
"""


# ---------------------------------------------------------------------------
# evt_growth_accounting — weekly new / retained / resurrected / churned
# ---------------------------------------------------------------------------


def evt_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth accounting — the WAU decomposition every growth team
    reports: each week's actives split into NEW (first week ever),
    RETAINED (also active last week), RESURRECTED (returning after a
    gap), plus the users CHURNED out of last week's actives; the
    identity actives_w = new + retained + resurrected and
    actives_{w-1} = retained + churned_w holds exactly.

    Scale: one distinct to (user, week) grain, one per-user min, two
    self-equi-joins on (user, week±7d) — all hash-partitioned on
    user_id (the first-week table is user-cardinality, so it is NOT
    broadcast-hinted; AQE picks the strategy), no windows over the fact
    table; output is #weeks rows. The week-grain merge of actives and
    churn is a FULL outer join so an all-churn week (zero actives,
    nonzero churned) still reports its churn row and the identity
    actives_{w-1} = retained_w + churned_w holds for every week."""
    e = load_table(spark, sf_dir, "events")
    weekly = (
        e.select(
            "user_id",
            F.expr("CAST(date_trunc('week', ts) AS DATE)").alias("w"),
        )
        .distinct()
        .localCheckpoint()
    )
    first = weekly.groupBy("user_id").agg(F.min("w").alias("first_w"))
    prev = weekly.select("user_id", F.expr("date_add(w, 7)").alias("w"))
    maxw = weekly.agg(F.max("w").alias("max_w"))
    flags = (
        weekly.join(first, "user_id")
        .join(prev.withColumn("was_prev", F.lit(1)), ["user_id", "w"], "left_outer")
        .groupBy("w")
        .agg(
            F.count("*").alias("actives"),
            F.sum(F.expr("IF(w = first_w, 1, 0)")).alias("n_new"),
            F.sum(
                F.expr("IF(w != first_w AND was_prev IS NOT NULL, 1, 0)")
            ).alias("n_retained"),
            F.sum(
                F.expr("IF(w != first_w AND was_prev IS NULL, 1, 0)")
            ).alias("n_resurrected"),
        )
    )
    churned = (
        prev.join(weekly.withColumn("still", F.lit(1)), ["user_id", "w"], "left_outer")
        .filter(F.col("still").isNull())
        .crossJoin(F.broadcast(maxw))
        .filter(F.col("w") <= F.col("max_w"))
        .groupBy("w")
        .agg(F.count("*").alias("n_churned"))
    )
    return (
        flags.join(churned, "w", "full_outer")
        .select(
            "w",
            F.coalesce("actives", F.lit(0)).cast("long").alias("actives"),
            F.coalesce("n_new", F.lit(0)).cast("long").alias("n_new"),
            F.coalesce("n_retained", F.lit(0)).cast("long").alias("n_retained"),
            F.coalesce("n_resurrected", F.lit(0)).cast("long").alias("n_resurrected"),
            F.coalesce("n_churned", F.lit(0)).cast("long").alias("n_churned"),
        )
        .orderBy("w")
    )


EVT_GROWTH_SQL = """
WITH weekly AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS w
  FROM events
), first AS (
  SELECT user_id, MIN(w) AS first_w FROM weekly GROUP BY 1
), prev AS (
  SELECT user_id, w + INTERVAL 7 DAY AS w FROM weekly
), flags AS (
  SELECT wk.w, COUNT(*) AS actives,
         SUM(CASE WHEN wk.w = f.first_w THEN 1 ELSE 0 END) AS n_new,
         SUM(CASE WHEN wk.w != f.first_w AND p.user_id IS NOT NULL
                  THEN 1 ELSE 0 END) AS n_retained,
         SUM(CASE WHEN wk.w != f.first_w AND p.user_id IS NULL
                  THEN 1 ELSE 0 END) AS n_resurrected
  FROM weekly wk
  JOIN first f ON wk.user_id = f.user_id
  LEFT JOIN prev p ON wk.user_id = p.user_id AND CAST(p.w AS DATE) = wk.w
  GROUP BY 1
), churned AS (
  SELECT CAST(p.w AS DATE) AS w, COUNT(*) AS n_churned
  FROM prev p
  LEFT JOIN weekly wk ON wk.user_id = p.user_id AND wk.w = CAST(p.w AS DATE)
  WHERE wk.user_id IS NULL
    AND CAST(p.w AS DATE) <= (SELECT MAX(w) FROM weekly)
  GROUP BY 1
)
SELECT COALESCE(f.w, c.w) AS w,
       CAST(COALESCE(f.actives, 0) AS BIGINT) AS actives,
       CAST(COALESCE(f.n_new, 0) AS BIGINT) AS n_new,
       CAST(COALESCE(f.n_retained, 0) AS BIGINT) AS n_retained,
       CAST(COALESCE(f.n_resurrected, 0) AS BIGINT) AS n_resurrected,
       CAST(COALESCE(c.n_churned, 0) AS BIGINT) AS n_churned
FROM flags f FULL OUTER JOIN churned c ON f.w = c.w
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# evt_top_paths — leading user-day event paths (the Sankey feeder)
# ---------------------------------------------------------------------------

_PATH_LEN = 4
_PATH_TOPK = 15


def evt_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top user-day event paths — the "what do sessions look like"
    rollup that feeds every product-analytics Sankey: per (user, day),
    the first 4 event types in (ts, event_id) order join into a path
    string, and the 15 most common paths win (ties by path text).

    Order inside a group is pinned by sorting the (ts, event_id, type)
    structs — array_sort's lexicographic struct compare equals the
    oracle's ORDER BY — so the path strings match bit-for-bit. Scale:
    one groupBy to user-day grain (collect_list of a session-bounded
    handful of events), one path-count rollup."""
    e = load_table(spark, sf_dir, "events")
    paths = (
        e.select(
            "user_id",
            F.expr("CAST(ts AS DATE)").alias("d"),
            F.struct("ts", "event_id", "event_type").alias("s"),
        )
        .groupBy("user_id", "d")
        .agg(F.collect_list("s").alias("evs"))
        .select(
            F.expr(
                f"array_join(transform(slice(array_sort(evs), 1, {_PATH_LEN}),"
                " x -> x.event_type), '>')"
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").alias("n_user_days"))
        .orderBy(F.desc("n_user_days"), "path")
        .limit(_PATH_TOPK)
    )


EVT_TOP_PATHS_SQL = f"""
WITH paths AS (
  SELECT array_to_string(
           list_slice(list(event_type ORDER BY ts, event_id),
                      1, {_PATH_LEN}), '>') AS path
  FROM events
  GROUP BY user_id, CAST(ts AS DATE)
)
SELECT path, COUNT(*) AS n_user_days
FROM paths
GROUP BY 1
ORDER BY n_user_days DESC, path
LIMIT {_PATH_TOPK}
"""


# ---------------------------------------------------------------------------
# evt_changepoint — exact single change-point (AMOC) on the daily series
# ---------------------------------------------------------------------------

# Between-segment CUSUM² score for a split after position t:
# (n·S_t − t·S_n)² / (n·t·(n−t)). The difference is an exact BIGINT;
# the square and division are the same IEEE doubles in both engines.
_CP_SCORE = (
    "CAST(n * s_t - t * s_n AS DOUBLE) * CAST(n * s_t - t * s_n AS DOUBLE)"
    " / (CAST(n AS DOUBLE) * t * (n - t))"
)


def evt_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """At-most-one-change-point detection on the daily event-count
    series: the split t* maximizing the between-segment CUSUM² score
    (n·S_t − t·S_n)²/(n·t·(n−t)) — the exact argmax every binary-
    segmentation changepoint routine computes at its top level, here
    as pure dataflow (ties break on the earlier day).

    Scale: one map-side-combinable rollup to day grain; the cumulative
    sum, score and argmax all run over the bounded day table (#days
    rows), never the fact table. The score difference n·S_t − t·S_n
    stays an exact BIGINT; only the final square/ratio is IEEE."""
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.select(F.expr("CAST(ts AS DATE)").alias("d"))
        .groupBy("d")
        .agg(F.count("*").alias("c"))
    )
    w_ord = Window.orderBy("d")
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = daily.select(
        "d",
        F.row_number().over(w_ord).alias("t"),
        F.sum("c").over(w_cum).alias("s_t"),
        F.sum("c").over(w_all).alias("s_n"),
        F.count("*").over(w_all).alias("n"),
    ).filter(F.col("t") < F.col("n"))
    scored = cum.withColumn("score", F.expr(_CP_SCORE))
    best = scored.orderBy(F.desc("score"), "d").limit(1)
    return best.select(
        F.col("n").cast("long").alias("n_days"),
        F.col("t").cast("long").alias("t_star"),
        F.col("d").alias("day_star"),
        F.col("s_t").cast("long").alias("left_events"),
        (F.col("s_n") - F.col("s_t")).cast("long").alias("right_events"),
        F.round("score", 6).alias("cusum_score"),
        F.round(F.expr("CAST(s_t AS DOUBLE) / t"), 6).alias("mean_left"),
        F.round(
            F.expr("CAST(s_n - s_t AS DOUBLE) / (n - t)"), 6
        ).alias("mean_right"),
    )


EVT_CHANGEPOINT_SQL = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, COUNT(*) AS c FROM events GROUP BY 1
), cum AS (
  SELECT d,
         ROW_NUMBER() OVER (ORDER BY d) AS t,
         SUM(c) OVER (ORDER BY d
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s_t,
         SUM(c) OVER () AS s_n,
         COUNT(*) OVER () AS n
  FROM daily
), scored AS (
  SELECT *, {_CP_SCORE} AS score FROM cum WHERE t < n
)
SELECT CAST(n AS BIGINT) AS n_days, CAST(t AS BIGINT) AS t_star,
       d AS day_star, CAST(s_t AS BIGINT) AS left_events,
       CAST(s_n - s_t AS BIGINT) AS right_events,
       ROUND(score, 6) AS cusum_score,
       ROUND(CAST(s_t AS DOUBLE) / t, 6) AS mean_left,
       ROUND(CAST(s_n - s_t AS DOUBLE) / (n - t), 6) AS mean_right
FROM scored
ORDER BY score DESC, d
LIMIT 1
"""


# ---------------------------------------------------------------------------
# w15_cumulative_distinct — cumulative unique users by day (first-seen)
# ---------------------------------------------------------------------------


def w15_cumulative_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users by day — the "total unique users ever"
    dashboard line — WITHOUT a running COUNT(DISTINCT) window (which
    would re-scan user sets per day): a user's FIRST day is one linear
    min-aggregate; dailies then roll up new-user counts and one
    cumulative window runs over the bounded day table. The same
    first-occurrence trick as txt_heaps_law, on users instead of
    vocabulary.
    """
    e = load_table(spark, sf_dir, "events")
    fs = e.groupBy("user_id").agg(
        F.expr("CAST(MIN(ts) AS DATE)").alias("first_d")
    )
    dau = (
        e.select(F.expr("CAST(ts AS DATE)").alias("d"), "user_id")
        .distinct()
        .groupBy("d")
        .agg(F.count("*").alias("dau"))
    )
    news = fs.groupBy(F.col("first_d").alias("d")).agg(
        F.count("*").alias("new_users")
    )
    w_cum = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    return (
        dau.join(news, "d", "left_outer")
        .select(
            "d",
            F.col("dau").cast("long").alias("dau"),
            F.coalesce("new_users", F.lit(0)).cast("long").alias("new_users"),
        )
        .withColumn(
            "cum_users", F.sum("new_users").over(w_cum).cast("long")
        )
        .orderBy("d")
    )


W15_CUMDIST_SQL = """
WITH fs AS (
  SELECT user_id, CAST(MIN(ts) AS DATE) AS first_d FROM events GROUP BY 1
), dau AS (
  SELECT d, COUNT(*) AS dau FROM (
    SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events
  ) GROUP BY 1
), news AS (
  SELECT first_d AS d, COUNT(*) AS new_users FROM fs GROUP BY 1
)
SELECT dau.d, CAST(dau.dau AS BIGINT) AS dau,
       CAST(COALESCE(news.new_users, 0) AS BIGINT) AS new_users,
       CAST(SUM(COALESCE(news.new_users, 0)) OVER (ORDER BY dau.d
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_users
FROM dau LEFT JOIN news ON dau.d = news.d
ORDER BY dau.d
"""


# ---------------------------------------------------------------------------
# evt_entropy_rate — conditional next-event entropy of the user stream
# ---------------------------------------------------------------------------

# Per-cell contribution −(c_ij/N)·ln(c_ij/c_i) quantized to exact nano
# nats (FLOOR of the same IEEE expression both engines → order-free sum).
_ER_TERM = (
    "CAST(FLOOR(-(CAST(n AS DOUBLE) / grand) * ln(CAST(n AS DOUBLE) / tot)"
    " * CAST(1000000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)"
)


def evt_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional entropy H(next | current) of the per-user event
    stream — the predictability ceiling of user behavior: 0 means the
    next action is fully determined by the current one, ln(k) means
    the Markov structure carries no signal (the information-theoretic
    twin of evt_transitions / evt_markov_stationary).

    One keyed window builds transition pairs, one rollup gives the
    ≤k² cell counts; each −p·ln(p|i) term quantizes to exact nano
    integers so the total is order-free. Also reports the
    unconditional next-event entropy H(next) and the information gain
    H(next) − H(next|current), both nano-exact."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = e.select(
        "user_id",
        F.lag("event_type").over(w).alias("prev_type"),
        F.col("event_type").alias("next_type"),
    ).filter(F.col("prev_type").isNotNull())
    cells = t.groupBy("prev_type", "next_type").agg(
        F.count("*").alias("n")
    ).localCheckpoint()  # ≤k² rows, reused by three rollups
    w_prev = Window.partitionBy("prev_type")
    w_all = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cond = cells.select(
        "n",
        F.sum("n").over(w_prev).alias("tot"),
        F.sum("n").over(w_all).alias("grand"),
    ).agg(
        F.max("grand").alias("n_transitions"),
        F.sum(F.expr(_ER_TERM)).alias("h_cond_nano"),
    )
    marg = (
        cells.groupBy("next_type")
        .agg(F.sum("n").alias("n"))
        .crossJoin(F.broadcast(cells.agg(F.sum("n").alias("grand"))))
        .select("n", F.col("grand").alias("tot"), "grand")
        .agg(F.sum(F.expr(_ER_TERM)).alias("h_marg_nano"))
    )
    return cond.crossJoin(F.broadcast(marg)).select(
        F.col("n_transitions").cast("long").alias("n_transitions"),
        F.col("h_cond_nano").cast("long").alias("h_cond_nano"),
        F.col("h_marg_nano").cast("long").alias("h_marg_nano"),
        (F.col("h_marg_nano") - F.col("h_cond_nano"))
        .cast("long")
        .alias("info_gain_nano"),
    )


EVT_ENTROPY_RATE_SQL = f"""
WITH t AS (
  SELECT LAG(event_type) OVER (PARTITION BY user_id
           ORDER BY ts, event_id) AS prev_type,
         event_type AS next_type
  FROM events
), cells AS (
  SELECT prev_type, next_type, COUNT(*) AS n
  FROM t WHERE prev_type IS NOT NULL GROUP BY 1, 2
), cond AS (
  SELECT CAST(MAX(grand) AS BIGINT) AS n_transitions,
         CAST(SUM({_ER_TERM}) AS BIGINT) AS h_cond_nano
  FROM (
    SELECT n,
           SUM(n) OVER (PARTITION BY prev_type) AS tot,
           SUM(n) OVER () AS grand
    FROM cells
  )
), marg AS (
  SELECT CAST(SUM({_ER_TERM}) AS BIGINT) AS h_marg_nano
  FROM (
    SELECT m.n, g.grand AS tot, g.grand
    FROM (SELECT next_type, SUM(n) AS n FROM cells GROUP BY 1) m,
         (SELECT SUM(n) AS grand FROM cells) g
  )
)
SELECT n_transitions, h_cond_nano, h_marg_nano,
       CAST(h_marg_nano - h_cond_nano AS BIGINT) AS info_gain_nano
FROM cond, marg
"""


# ---------------------------------------------------------------------------
# evt_retention_halflife — exponential-decay fit of the retention curve
# ---------------------------------------------------------------------------


def evt_retention_halflife(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention half-life: the age-w retention rates r_w (distinct
    users active w weeks after their first week over the user total)
    fit to r = e^{β·w}; half-life = −ln 2/β — the single number a
    growth model plugs in for LTV horizon math.

    Rates are exact rationals from two linear aggregations (first
    week per user, distinct (user, age) presence); the ln-linear OLS
    runs over the ≤#weeks curve points with the shared closed form
    (round 6). No fact-table windows."""
    e = load_table(spark, sf_dir, "events")
    weekly = e.select(
        "user_id", F.expr("CAST(date_trunc('week', ts) AS DATE)").alias("w")
    ).distinct()
    first = weekly.groupBy("user_id").agg(F.min("w").alias("fw"))
    ages = (
        weekly.join(first, "user_id")
        .select(
            "user_id",
            F.expr("datediff(w, fw) div 7").alias("age"),
        )
        .distinct()
    )
    w_all = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    curve = (
        ages.groupBy("age")
        .agg(F.count("*").alias("active"))
        .select(
            "age",
            "active",
            F.max(F.when(F.col("age") == 0, F.col("active"))).over(w_all).alias(
                "cohort"
            ),
        )
        .filter((F.col("age") >= 1) & (F.col("active") > 0))
    )
    pts = curve.select(
        F.col("age").cast("double").alias("x"),
        F.expr("ln(CAST(active AS DOUBLE) / cohort)").alias("y"),
    )
    fit = pts.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    return fit.select(
        F.col("n").cast("long").alias("n_ages"),
        F.round(
            F.expr("(n * sxy - sx * sy) / (n * sxx - sx * sx)"), 6
        ).alias("decay_beta"),
        F.round(
            F.expr(
                # a zero slope means no measured decay (perfect
                # retention in-window) — half-life is undefined, not ∞
                "CASE WHEN (n * sxy - sx * sy) != 0 THEN"
                " -ln(CAST(2 AS DOUBLE))"
                " / ((n * sxy - sx * sy) / (n * sxx - sx * sx)) END"
            ),
            6,
        ).alias("halflife_weeks"),
    )


EVT_HALFLIFE_SQL = """
WITH weekly AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS w
  FROM events
), first AS (
  SELECT user_id, MIN(w) AS fw FROM weekly GROUP BY 1
), ages AS (
  SELECT DISTINCT wk.user_id,
         datediff('day', f.fw, wk.w) // 7 AS age
  FROM weekly wk JOIN first f ON wk.user_id = f.user_id
), curve AS (
  SELECT age, active,
         MAX(CASE WHEN age = 0 THEN active END) OVER () AS cohort
  FROM (SELECT age, COUNT(*) AS active FROM ages GROUP BY 1)
), pts AS (
  SELECT CAST(age AS DOUBLE) AS x,
         ln(CAST(active AS DOUBLE) / cohort) AS y
  FROM curve WHERE age >= 1 AND active > 0
), fit AS (
  SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * x) AS sxx, SUM(x * y) AS sxy
  FROM pts
)
SELECT CAST(n AS BIGINT) AS n_ages,
       ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS decay_beta,
       ROUND(CASE WHEN (n * sxy - sx * sy) != 0 THEN
             -ln(CAST(2 AS DOUBLE))
             / ((n * sxy - sx * sy) / (n * sxx - sx * sx)) END, 6)
         AS halflife_weeks
FROM fit
"""


# ---------------------------------------------------------------------------
# dq_freshness_sla — per-slice staleness against the corpus watermark
# ---------------------------------------------------------------------------

_FRESH_SLA_S = 86_400  # 1 day


def dq_freshness_sla(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Freshness SLA census: per event type, the lag between its
    latest event and the corpus watermark (global max ts), with a
    1-day SLA flag — the staleness monitor every ingestion DAG
    exports (a silent upstream stall shows up here first).

    Exact epoch-second arithmetic (per-timestamp FLOOR, the repo's
    unix_timestamp convention); two tiny aggregations, watermark via
    broadcast."""
    e = load_table(spark, sf_dir, "events")
    per = e.groupBy("event_type").agg(
        F.count("*").alias("n_events"), F.max("ts").alias("last_ts")
    )
    wm = e.agg(F.max("ts").alias("watermark"))
    return (
        per.crossJoin(F.broadcast(wm))
        .select(
            "event_type",
            F.col("n_events").cast("long").alias("n_events"),
            (
                F.unix_timestamp("watermark") - F.unix_timestamp("last_ts")
            )
            .cast("long")
            .alias("staleness_s"),
            (
                F.unix_timestamp("watermark") - F.unix_timestamp("last_ts")
                <= _FRESH_SLA_S
            ).alias("within_sla"),
        )
        .orderBy("event_type")
    )


DQ_FRESHNESS_SQL = f"""
WITH per AS (
  SELECT event_type, COUNT(*) AS n_events, MAX(ts) AS last_ts
  FROM events GROUP BY 1
), wm AS (SELECT MAX(ts) AS watermark FROM events)
SELECT event_type, CAST(n_events AS BIGINT) AS n_events,
       CAST(FLOOR(epoch(watermark)) AS BIGINT)
         - CAST(FLOOR(epoch(last_ts)) AS BIGINT) AS staleness_s,
       CAST(FLOOR(epoch(watermark)) AS BIGINT)
         - CAST(FLOOR(epoch(last_ts)) AS BIGINT) <= {_FRESH_SLA_S}
         AS within_sla
FROM per, wm
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# evt_markov_absorption — expected steps to conversion (absorbing chain)
# ---------------------------------------------------------------------------

_ABS_ITERS = 12
_ABS_TARGET = "purchase"
_ABS_SCALE = 1_000_000_000


def evt_markov_absorption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected number of steps to reach 'purchase' from each event
    state, treating purchase as ABSORBING in the empirical first-order
    chain — the "how far is each state from converting" number a
    funnel-optimization team ranks intervention targets by (the
    fundamental-matrix quantity N·1, here by value iteration).

    Bit-exact like graph_pagerank: E ← 1 + P·E iterated 24 rounds in
    integer nano-steps (each edge term is (c_ij·E_j) div c_i, exact
    BIGINT), purchase pinned at 0; the DuckDB oracle unrolls the same
    24 rounds as chained CTEs. Each Spark round is one join + partial
    agg on the k-state table (k ≈ 5 here; hash-partitioned at real
    state cardinality), localCheckpointed so lineage stays flat."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = e.select(
        "user_id",
        F.lag("event_type").over(w).alias("src"),
        F.col("event_type").alias("dst"),
    ).filter(F.col("src").isNotNull() & (F.col("src") != _ABS_TARGET))
    cells = t.groupBy("src", "dst").agg(F.count("*").alias("c")).localCheckpoint()
    tot = cells.groupBy("src").agg(F.sum("c").alias("ctot"))
    states = (
        cells.select(F.col("src").alias("s"))
        .unionAll(cells.select(F.col("dst").alias("s")))
        .distinct()
        .localCheckpoint()
    )
    ev = states.select(
        "s",
        F.when(F.col("s") == _ABS_TARGET, F.lit(0))
        .otherwise(F.lit(_ABS_SCALE))
        .cast("long")
        .alias("ev"),
    )
    trans = cells.join(F.broadcast(tot), "src").localCheckpoint()
    for _ in range(_ABS_ITERS - 1):
        nxt = (
            trans.join(ev, trans.dst == ev.s)
            .groupBy("src")
            .agg(
                F.sum(F.expr("c * ev div ctot")).alias("pe"),
            )
        )
        ev = (
            states.join(nxt, states.s == nxt.src, "left_outer")
            .select(
                "s",
                F.when(F.col("s") == _ABS_TARGET, F.lit(0))
                .otherwise(F.lit(_ABS_SCALE) + F.coalesce("pe", F.lit(0)))
                .cast("long")
                .alias("ev"),
            )
            .localCheckpoint()
        )
    return ev.select(
        F.col("s").alias("state"),
        F.col("ev").alias("expected_steps_nano"),
        F.round(F.expr(f"CAST(ev AS DOUBLE) / {_ABS_SCALE}"), 6).alias(
            "expected_steps"
        ),
    ).orderBy("state")


def _markov_abs_sql() -> str:
    steps = []
    # MATERIALIZED pins each round: DuckDB would otherwise inline the
    # single-reference CTE chain recursively and the optimizer cost
    # explodes exponentially with depth (observed: >600 s at depth 23,
    # sub-second materialized).
    for i in range(1, _ABS_ITERS):
        steps.append(
            f"""e{i} AS MATERIALIZED (
  SELECT st.s,
         CASE WHEN st.s = '{_ABS_TARGET}' THEN 0
              ELSE {_ABS_SCALE} + COALESCE(SUM(t.c * p.ev // t.ctot), 0)
         END AS ev
  FROM states st
  LEFT JOIN (trans t JOIN e{i - 1} p ON p.s = t.dst) ON t.src = st.s
  GROUP BY st.s
)"""
        )
    chain = ",\n".join(steps)
    return f"""
WITH t AS (
  SELECT LAG(event_type) OVER (PARTITION BY user_id
           ORDER BY ts, event_id) AS src,
         event_type AS dst
  FROM events
), cells AS (
  SELECT src, dst, COUNT(*) AS c FROM t
  WHERE src IS NOT NULL AND src != '{_ABS_TARGET}'
  GROUP BY 1, 2
), trans AS (
  SELECT c.src, c.dst, c.c, o.ctot
  FROM cells c JOIN (SELECT src, SUM(c) AS ctot FROM cells GROUP BY 1) o
    USING (src)
), states AS (
  SELECT DISTINCT src AS s FROM cells
  UNION
  SELECT DISTINCT dst AS s FROM cells
), e0 AS (
  SELECT s, CASE WHEN s = '{_ABS_TARGET}' THEN CAST(0 AS BIGINT)
                 ELSE CAST({_ABS_SCALE} AS BIGINT) END AS ev
  FROM states
),
{chain}
SELECT s AS state, CAST(ev AS BIGINT) AS expected_steps_nano,
       ROUND(CAST(ev AS DOUBLE) / {_ABS_SCALE}, 6) AS expected_steps
FROM e{_ABS_ITERS - 1}
ORDER BY state
"""


EVT_MARKOV_ABS_SQL = _markov_abs_sql()


# ---------------------------------------------------------------------------
# evt_diff_in_diff — difference-in-differences on the event value
# ---------------------------------------------------------------------------

_DID_H = (
    "CAST(conv(substring(md5(concat('did|', CAST(user_id AS STRING))),"
    " 1, 15), 16, 10) AS BIGINT)"
)
_DID_H_DUCK = (
    "('0x' || substr(md5('did|' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT"
)
_DID_CELL_MEAN = "CAST(s AS DOUBLE) / n"
_DID_CELL_VARN = (
    "(CAST(q AS DOUBLE) / n - (CAST(s AS DOUBLE) / n)"
    " * (CAST(s AS DOUBLE) / n)) / n"
)


def evt_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences on mean event value: treatment =
    portable-hash user split, post = second half of the observation
    window; DiD = (T_post − T_pre) − (C_post − C_pre) with the
    four-cell Welch standard error — the quasi-experimental estimator
    every marketing/product team runs when randomization wasn't
    possible (on a pure hash split the true effect is 0, so this
    entry doubles as an A/A guardrail).

    One aggregation to the four (treated, post) cells of exact
    micro-unit sums (squares as DECIMAL(38,0)); window bounds ride a
    broadcast 1-row min/max; DiD, SE and t are the same IEEE
    expressions in both engines."""
    e = load_table(spark, sf_dir, "events")
    bounds = e.agg(
        F.expr("CAST(MIN(ts) AS DATE)").alias("d0"),
        F.expr("CAST(MAX(ts) AS DATE)").alias("d1"),
    )
    cells = (
        e.crossJoin(F.broadcast(bounds))
        .select(
            (F.expr(_DID_H) % 2 == 0).alias("treated"),
            (
                F.expr("datediff(CAST(ts AS DATE), d0)")
                * 2
                >= F.expr("datediff(d1, d0)")
            ).alias("post"),
            F.expr(
                "CAST(FLOOR(value * CAST(1000000 AS DOUBLE)"
                " + CAST(0.5 AS DOUBLE)) AS BIGINT)"
            ).alias("m"),
        )
        .groupBy("treated", "post")
        .agg(
            F.count("*").alias("n"),
            F.sum("m").alias("s"),
            F.sum(F.col("m").cast("decimal(38,0)") * F.col("m")).alias("q"),
        )
    )
    folded = cells.agg(
        F.sum("n").cast("long").alias("n_events"),
        F.sum(
            F.when(F.col("treated") & F.col("post"), F.expr(_DID_CELL_MEAN))
            .when(F.col("treated") & ~F.col("post"), -F.expr(_DID_CELL_MEAN))
            .when(~F.col("treated") & F.col("post"), -F.expr(_DID_CELL_MEAN))
            .otherwise(F.expr(_DID_CELL_MEAN))
        ).alias("did_micro"),
        F.sum(F.expr(_DID_CELL_VARN)).alias("var_sum"),
    )
    return folded.select(
        "n_events",
        F.round("did_micro", 6).alias("did_micro"),
        F.round(F.expr("did_micro / sqrt(var_sum)"), 6).alias("t_stat"),
    )


EVT_DID_SQL = f"""
WITH bounds AS (
  SELECT CAST(MIN(ts) AS DATE) AS d0, CAST(MAX(ts) AS DATE) AS d1
  FROM events
), cells AS (
  SELECT {_DID_H_DUCK} % 2 = 0 AS treated,
         datediff('day', d0, CAST(ts AS DATE)) * 2
           >= datediff('day', d0, d1) AS post,
         COUNT(*) AS n,
         CAST(SUM(CAST(FLOOR(value * CAST(1000000 AS DOUBLE)
              + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS BIGINT) AS s,
         SUM(CAST(CAST(FLOOR(value * CAST(1000000 AS DOUBLE)
              + CAST(0.5 AS DOUBLE)) AS BIGINT) AS HUGEINT)
             * CAST(FLOOR(value * CAST(1000000 AS DOUBLE)
              + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS q
  FROM events, bounds
  GROUP BY 1, 2
), folded AS (
  SELECT CAST(SUM(n) AS BIGINT) AS n_events,
         SUM(CASE WHEN treated AND post THEN {_DID_CELL_MEAN}
                  WHEN treated AND NOT post THEN -({_DID_CELL_MEAN})
                  WHEN NOT treated AND post THEN -({_DID_CELL_MEAN})
                  ELSE {_DID_CELL_MEAN} END) AS did_micro,
         SUM({_DID_CELL_VARN}) AS var_sum
  FROM cells
)
SELECT n_events, ROUND(did_micro, 6) AS did_micro,
       ROUND(did_micro / sqrt(var_sum), 6) AS t_stat
FROM folded
"""


# ---------------------------------------------------------------------------
# evt_shapley_attribution — exact Shapley credit over touch channels
# ---------------------------------------------------------------------------

# channel → mask bit (fixed order; purchase is the CONVERSION, not a
# channel)
_SHAP_CHANNELS = [("click", 1), ("error", 2), ("signup", 4), ("view", 8)]
# |S|!·(k−1−|S|)!·24/k! for k=4 channels: exact integer weights ×24
_SHAP_W24 = {0: 6, 1: 2, 2: 2, 3: 6}


def evt_shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Shapley-value channel attribution: the coalition value
    v(S) is the conversion rate of users whose touched-channel set is
    ⊆ S (computed for all 16 coalitions by a subset-sum over the
    16-row mask census), and each channel's credit is the exact
    Shapley average of its marginal contributions — the
    game-theoretically fair attribution that last-touch/linear rules
    approximate, exact here because the channel alphabet is small
    (2^k coalitions is the standard regime for marketing Shapley).

    Everything after ONE user-grain rollup is 16-row arithmetic:
    coalition rates quantize to exact ppm integers; Shapley weights
    ×24 are exact integers ({6,2,2,6} by |S|); the final credits are
    integer sums. At 100 TB only the user rollup touches the fact
    table."""
    e = load_table(spark, sf_dir, "events")
    users = e.groupBy("user_id").agg(
        (
            F.max(F.when(F.col("event_type") == "click", 1).otherwise(0)) * 1
            + F.max(F.when(F.col("event_type") == "error", 1).otherwise(0)) * 2
            + F.max(F.when(F.col("event_type") == "signup", 1).otherwise(0)) * 4
            + F.max(F.when(F.col("event_type") == "view", 1).otherwise(0)) * 8
        ).alias("mask"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("conv"),
    )
    census = users.groupBy("mask").agg(
        F.count("*").alias("n_u"), F.sum("conv").alias("c_u")
    ).localCheckpoint()  # ≤16 rows
    sets = spark.range(0, 16).select(F.col("id").cast("int").alias("s"))
    v = (
        sets.join(
            F.broadcast(census),
            F.expr("CAST(mask AS INT) & s") == F.col("mask").cast("int"),
            "left_outer",
        )
        .groupBy("s")
        .agg(
            F.coalesce(F.sum("n_u"), F.lit(0)).alias("n_s"),
            F.coalesce(F.sum("c_u"), F.lit(0)).alias("c_s"),
        )
        .select(
            "s",
            F.expr(
                "CASE WHEN n_s > 0 THEN c_s * 1000000 div n_s ELSE 0 END"
            ).alias("v_ppm"),
        )
        .localCheckpoint()  # 16 rows
    )
    chans = spark.createDataFrame(_SHAP_CHANNELS, "channel string, bit int")
    rest = v.select(F.col("s").alias("s0"), F.col("v_ppm").alias("v0"))
    with_ch = (
        chans.crossJoin(F.broadcast(rest))
        .filter(F.expr("s0 & bit") == 0)
        .join(
            F.broadcast(
                v.select(F.col("s").alias("s1"), F.col("v_ppm").alias("v1"))
            ),
            F.expr("s0 | bit") == F.col("s1"),
        )
        .select(
            "channel",
            F.expr(
                "CASE bit_count(CAST(s0 AS LONG)) WHEN 0 THEN 6 WHEN 1 THEN 2"
                " WHEN 2 THEN 2 ELSE 6 END"
            ).alias("w24"),
            (F.col("v1") - F.col("v0")).alias("dv"),
        )
    )
    return (
        with_ch.groupBy("channel")
        .agg(F.sum(F.col("w24") * F.col("dv")).alias("shap_x24_ppm"))
        .select(
            "channel",
            F.col("shap_x24_ppm").cast("long").alias("shap_x24_ppm"),
            F.round(
                F.expr("CAST(shap_x24_ppm AS DOUBLE) / 24 / 1000000"), 9
            ).alias("shapley_credit"),
        )
        .orderBy("channel")
    )


EVT_SHAPLEY_SQL = """
WITH users AS (
  SELECT user_id,
         MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) * 1
         + MAX(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) * 2
         + MAX(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) * 4
         + MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) * 8 AS mask,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
  FROM events GROUP BY 1
), census AS (
  SELECT mask, COUNT(*) AS n_u, SUM(conv) AS c_u FROM users GROUP BY 1
), sets AS (SELECT unnest(generate_series(0, 15)) AS s),
v AS (
  SELECT s,
         CASE WHEN COALESCE(SUM(n_u), 0) > 0
              THEN COALESCE(SUM(c_u), 0) * 1000000 // SUM(n_u)
              ELSE 0 END AS v_ppm
  FROM sets LEFT JOIN census ON (mask & s) = mask
  GROUP BY s
), chans AS (
  SELECT * FROM (VALUES ('click', 1), ('error', 2), ('signup', 4),
                        ('view', 8)) t(channel, bit)
), terms AS (
  SELECT c.channel,
         CASE bit_count(v0.s) WHEN 0 THEN 6 WHEN 1 THEN 2
              WHEN 2 THEN 2 ELSE 6 END AS w24,
         v1.v_ppm - v0.v_ppm AS dv
  FROM chans c
  JOIN v v0 ON (v0.s & c.bit) = 0
  JOIN v v1 ON v1.s = (v0.s | c.bit)
)
SELECT channel,
       CAST(SUM(w24 * dv) AS BIGINT) AS shap_x24_ppm,
       ROUND(CAST(SUM(w24 * dv) AS DOUBLE) / 24 / 1000000, 9)
         AS shapley_credit
FROM terms
GROUP BY channel
ORDER BY channel
"""


QUERIES = {
    "evt_shapley_attribution": (evt_shapley_attribution, EVT_SHAPLEY_SQL),
    "evt_markov_absorption": (evt_markov_absorption, EVT_MARKOV_ABS_SQL),
    "evt_diff_in_diff": (evt_diff_in_diff, EVT_DID_SQL),
    "evt_entropy_rate": (evt_entropy_rate, EVT_ENTROPY_RATE_SQL),
    "evt_retention_halflife": (evt_retention_halflife, EVT_HALFLIFE_SQL),
    "dq_freshness_sla": (dq_freshness_sla, DQ_FRESHNESS_SQL),
    "w15_cumulative_distinct": (w15_cumulative_distinct, W15_CUMDIST_SQL),
    "evt_changepoint": (evt_changepoint, EVT_CHANGEPOINT_SQL),
    "evt_markov_stationary": (evt_markov_stationary, EVT_MARKOV_SQL),
    "w13_rising_streaks": (w13_rising_streaks, W13_STREAK_SQL),
    "evt_cohort_ltv": (evt_cohort_ltv, EVT_COHORT_LTV_SQL),
    "evt_top_paths": (evt_top_paths, EVT_TOP_PATHS_SQL),
    "evt_growth_accounting": (evt_growth_accounting, EVT_GROWTH_SQL),
    "evt_seasonal_anomaly": (evt_seasonal_anomaly, EVT_SEASONAL_ANOM_SQL),
    "evt_stream_ckpt_recovery": (evt_stream_ckpt_recovery, EVT_CKPT_SQL),
    "evt_holt_linear": (evt_holt_linear, EVT_HOLT_SQL),
    "w14_dist_functions": (w14_dist_functions, W14_DIST_SQL),
    "evt_stream_out_of_order": (evt_stream_out_of_order, EVT_OOO_SQL),
    "evt_bot_detection": (evt_bot_detection, EVT_BOT_SQL),
    "evt_snaive_backtest": (evt_snaive_backtest, EVT_SNAIVE_SQL),
    "j12_scd2_dim_join": (j12_scd2_dim_join, J12_SCD2_JOIN_SQL),
    "evt_stickiness_dau_mau": (evt_stickiness_dau_mau, EVT_STICKINESS_SQL),
    "evt_interarrival_stats": (evt_interarrival_stats, EVT_INTERARRIVAL_SQL),
    "evt_stream_outer_join": (evt_stream_outer_join, EVT_STREAM_OUTER_JOIN_SQL),
    "evt_stream_full_outer_join": (
        evt_stream_full_outer_join,
        EVT_STREAM_FULL_OUTER_JOIN_SQL,
    ),
    "evt_stream_incremental_mv": (
        evt_stream_incremental_mv,
        EVT_STREAM_IMV_SQL,
    ),
    "evt_stream_state_timeout": (evt_stream_state_timeout, EVT_STREAM_TIMEOUT_SQL),
    "evt_stream_event_time_timeout": (
        evt_stream_event_time_timeout,
        EVT_STREAM_ETS_SQL,
    ),
    # same ms-aligned emission contract — the restart must be
    # invisible in the output, so the oracle IS the uninterrupted run
    "evt_stream_checkpoint_recovery": (
        evt_stream_checkpoint_recovery,
        EVT_STREAM_ETS_SQL,
    ),
    "w7_range_frame": (w7_range_frame, W7_RANGE_SQL),
    "w8_islands_rle": (w8_islands_rle, W8_ISLANDS_SQL),
    "w12_seq_pattern": (w12_seq_pattern, W12_SEQ_SQL),
    "dq_table_checksum": (dq_table_checksum, DQ_CHECKSUM_SQL),
    "evt_calendar_dim": (evt_calendar_dim, EVT_CALENDAR_SQL),
    "evt_rolling_wau": (evt_rolling_wau, EVT_WAU_SQL),
    "j7_interval_overlap": (j7_interval_overlap, J7_INTERVAL_SQL),
    "evt_decay_score": (evt_decay_score, EVT_DECAY_SQL),
    "evt_peak_concurrency": (evt_peak_concurrency, EVT_PEAK_SQL),
    "evt_cusum_drift": (evt_cusum_drift, EVT_CUSUM_SQL),
    "s27_stream_file_sink": (s27_stream_file_sink, S27_FILESINK_SQL),
    "w10_m4_downsample": (w10_m4_downsample, W10_M4_SQL),
    "evt_seasonal_decompose": (evt_seasonal_decompose, EVT_SEASONAL_SQL),
    "evt_transitions": (evt_transitions, EVT_TRANSITIONS_SQL),
    "evt_stream_update_mode": (evt_stream_update_mode, EVT_UPDATE_MODE_SQL),
    "evt_twap": (evt_twap, EVT_TWAP_SQL),
    "evt_attribution": (evt_attribution, EVT_ATTRIBUTION_SQL),
    "evt_resample_gapfill": (evt_resample_gapfill, EVT_GAPFILL_SQL),
    "evt_stream_dedup": (evt_stream_dedup, EVT_STREAM_DEDUP_SQL),
    "evt_tumbling_1h": (evt_tumbling_1h, EVT_TUMBLING_SQL),
    "evt_sliding_1h_30m": (evt_sliding_1h_30m, EVT_SLIDING_SQL),
    "evt_session_10m": (evt_session_10m, EVT_SESSION_SQL),
    "evt_stream_tumbling": (evt_stream_tumbling, EVT_STREAM_SQL),
    "evt_stream_session": (evt_stream_session, EVT_STREAM_SESSION_SQL),
    "evt_stream_multibatch": (evt_stream_multibatch, EVT_MULTIBATCH_SQL),
    "evt_scd2": (evt_scd2, EVT_SCD2_SQL),
    "evt_funnel": (evt_funnel, EVT_FUNNEL_SQL),
    "evt_anomaly_zscore": (evt_anomaly_zscore, EVT_ANOMALY_SQL),
    "evt_retention": (evt_retention, EVT_RETENTION_SQL),
    "evt_stream_join": (evt_stream_join, EVT_STREAM_JOIN_SQL),
    "evt_stream_enrich": (evt_stream_enrich, EVT_STREAM_ENRICH_SQL),
    "evt_stream_upsert": (evt_stream_upsert, EVT_STREAM_UPSERT_SQL),
}
