"""Scale-surface queries: skew mitigation, partitioned sinks, JSON-lines
source, and the SQL-string API — each with a DuckDB oracle.

The skew operators' OUTPUTS are salt-invariant (salting only changes the
shuffle layout), so plain GROUP BY / JOIN SQL is an exact oracle for
them — the gate proves the two-phase plans compute the same answer as
the direct ones."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table


def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation over the events table (event_type is
    a few-key column — the worst-case agg skew shape). Salt-invariant
    output: count/sum/min/max per key, so the oracle is the plain
    GROUP BY."""
    from ..operators.skew import salted_agg

    e = load_table(spark, sf_dir, "events")
    dec = F.col("value").cast("decimal(18,3)")
    out = salted_agg(
        e.select("event_type", dec.alias("v")),
        "event_type",
        {
            "n": F.count("*"),
            "sum_v": F.sum("v"),
            "min_v": (F.min("v"), F.min),
            "max_v": (F.max("v"), F.max),
        },
        n_salts=8,
    )
    return out.select(
        "event_type",
        "n",
        F.col("sum_v").cast("double").alias("sum_v"),
        F.col("min_v").cast("double").alias("min_v"),
        F.col("max_v").cast("double").alias("max_v"),
    )


SKEW_AGG_SQL = """
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,3))) AS DOUBLE) AS sum_v,
       CAST(MIN(CAST(value AS DECIMAL(18,3))) AS DOUBLE) AS min_v,
       CAST(MAX(CAST(value AS DECIMAL(18,3))) AS DOUBLE) AS max_v
FROM events GROUP BY 1
"""


def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted join of the (skewed) events fact against a small
    event-type dim, aggregated after the join. Salt-invariant output —
    the oracle is the plain join + GROUP BY."""
    from ..operators.skew import salted_join

    e = load_table(spark, sf_dir, "events").select("event_type", "value")
    dim = spark.createDataFrame(
        [("click", 1.0), ("view", 0.1), ("purchase", 10.0)],
        "event_type string, weight double",
    )
    joined = salted_join(e, dim, "event_type", n_salts=8)
    return (
        joined.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(
                (F.col("value").cast("decimal(18,3)") * F.col("weight").cast("decimal(8,1)"))
            )
            .cast("double")
            .alias("weighted_sum"),
        )
    )


SKEW_JOIN_SQL = """
WITH dim(event_type, weight) AS (VALUES ('click', 1.0), ('view', 0.1), ('purchase', 10.0))
SELECT e.event_type, COUNT(*) AS n,
       CAST(SUM(CAST(e.value AS DECIMAL(18,3)) * CAST(d.weight AS DECIMAL(8,1))) AS DOUBLE) AS weighted_sum
FROM events e JOIN dim d ON e.event_type = d.event_type
GROUP BY 1
"""


def skew_stress_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deliberate-skew stress (VERDICT r2 #9): HALF of lineitem lands on
    one 'HOT' key (even orderkeys), the rest spreads over a ~49-key
    tail — the distribution where a plain groupBy funnels 50% of the
    table through one reducer. The two-phase salted plan spreads the
    hot key over (key, salt) sub-keys in phase 1; the output is
    salt-invariant so the plain GROUP BY is an exact oracle, and
    tests/test_scale_ops.py::test_salted_agg_spreads_hot_key pins the
    phase-1 spread itself."""
    from ..operators.skew import salted_agg

    l = load_table(spark, sf_dir, "lineitem")
    key = F.when(F.col("l_orderkey") % 2 == 0, F.lit("HOT")).otherwise(
        F.concat(F.lit("k"), (F.col("l_orderkey") % 97).cast("string"))
    )
    dec = F.col("l_quantity").cast("decimal(18,2)")
    out = salted_agg(
        l.select(key.alias("k"), dec.alias("v")),
        "k",
        {
            "n": F.count("*"),
            "sum_v": F.sum("v"),
            "min_v": (F.min("v"), F.min),
            "max_v": (F.max("v"), F.max),
        },
        n_salts=8,
    )
    return out.select(
        "k",
        "n",
        F.col("sum_v").cast("double").alias("sum_v"),
        F.col("min_v").cast("double").alias("min_v"),
        F.col("max_v").cast("double").alias("max_v"),
    )


SKEW_STRESS_SQL = """
SELECT CASE WHEN l_orderkey % 2 = 0 THEN 'HOT'
            ELSE 'k' || CAST(l_orderkey % 97 AS VARCHAR) END AS k,
       COUNT(*) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_v,
       CAST(MIN(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS min_v,
       CAST(MAX(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS max_v
FROM lineitem GROUP BY 1
"""


def skew_stress_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-side twin of skew_stress_agg (VERDICT r3 #6): the SAME
    50%-hot-key distribution, but the hot key flows through a fact⋈dim
    equi-join — the shape where a plain shuffle join funnels half the
    fact table through the hot key's single reducer. ``salted_join``
    rewrites the shuffle key to (key, salt): the dim side replicates
    ×n_salts (bounded — it is dim-sized), the fact side spreads evenly.
    Output is salt-invariant, so the plain join is an exact oracle;
    tests/test_scale_ops.py::test_salted_join_spreads_hot_key pins the
    physical spread, and the with/without-salting parity is asserted in
    the same test module."""
    from ..operators.skew import salted_join

    l = load_table(spark, sf_dir, "lineitem")
    key = F.when(F.col("l_orderkey") % 2 == 0, F.lit("HOT")).otherwise(
        F.concat(F.lit("k"), (F.col("l_orderkey") % 97).cast("string"))
    )
    fact = l.select(key.alias("k"), F.col("l_quantity").cast("decimal(18,2)").alias("v"))
    dim = spark.createDataFrame(
        [("HOT", 0.5)] + [(f"k{i}", float(i % 7) + 1.0) for i in range(97)],
        "k string, weight double",
    )
    joined = salted_join(fact, dim, "k", n_salts=8)
    return (
        joined.groupBy("k")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("v") * F.col("weight").cast("decimal(8,1)"))
            .cast("double")
            .alias("weighted_sum"),
        )
    )


SKEW_STRESS_JOIN_SQL = """
WITH fact AS (
  SELECT CASE WHEN l_orderkey % 2 = 0 THEN 'HOT'
              ELSE 'k' || CAST(l_orderkey % 97 AS VARCHAR) END AS k,
         CAST(l_quantity AS DECIMAL(18,2)) AS v
  FROM lineitem
), dim AS (
  SELECT 'HOT' AS k, 0.5 AS weight
  UNION ALL
  SELECT 'k' || CAST(i AS VARCHAR), CAST(i % 7 AS DOUBLE) + 1.0
  FROM range(97) t(i)
)
SELECT f.k, COUNT(*) AS n,
       CAST(SUM(f.v * CAST(d.weight AS DECIMAL(8,1))) AS DOUBLE) AS weighted_sum
FROM fact f JOIN dim d ON f.k = d.k
GROUP BY 1
"""


def s16_avro_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Avro OCF sink + source roundtrip via the pure-python codec and
    block-partitioned Python DataSource (sources/avroocf.py — no
    spark-avro in this container). Supplier is written DISTRIBUTED:
    ``write_ocf_partitioned`` emits one complete deflate-compressed
    container file per input partition from the executor that holds it
    (rows never pass through the driver; only the partition-count-sized
    file manifest does), then the directory is read back through
    ``format("avro_py")`` — one input partition per data block — and
    rolled up; the rollup hash-matches DuckDB over the original
    parquet, so a wrong varint/deflate/union decode shows as a value
    mismatch."""
    import shutil
    import tempfile

    from ..sources.avroocf import register, write_ocf_partitioned

    register(spark)
    scratch = tempfile.mkdtemp(prefix="bigdata_spark_avro_")
    try:
        path = f"{scratch}/supplier_avro"
        os.makedirs(path, exist_ok=True)
        s = load_table(spark, sf_dir, "supplier").select(
            "s_suppkey", "s_name", "s_nationkey", "s_acctbal"
        )
        manifest = write_ocf_partitioned(
            s,
            path,
            [
                ("s_suppkey", "long"),
                ("s_name", ["null", "string"]),
                ("s_nationkey", "int"),
                ("s_acctbal", "double"),
            ],
            codec="deflate",
            block_rows=256,
        )
        # the write is the mapInPandas job itself; the manifest is
        # partition-count-sized, so this collect is bounded at any SF
        n_written = sum(r["n_rows"] for r in manifest.collect())
        assert n_written > 0, "avro writer produced no rows"
        back = spark.read.format("avro_py").option("path", path).load()
        rollup = back.groupBy("s_nationkey").agg(
            F.count("*").alias("n_suppliers"),
            F.sum(F.col("s_acctbal").cast("decimal(18,6)"))
            .cast("double")
            .alias("acctbal_sum"),
        )
        return rollup.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


S16_AVRO_SQL = """
SELECT s_nationkey, COUNT(*) AS n_suppliers,
       CAST(SUM(CAST(s_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS acctbal_sum
FROM supplier GROUP BY s_nationkey
"""


def s15_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order data-skipping evidence (operators/zorder.py): lineitem
    written 16-file naive (round-robin) vs 16-file Morton-ordered on
    (l_partkey, l_suppkey), then a 2-D box predicate reads both
    layouts. ``input_file_name`` counts the files that actually
    contain matches — the files a stats-based reader must touch. The
    z-layout must cover the same rows with strictly fewer files; both
    layouts must return exactly the box's rows (value check via the
    rowcount against DuckDB). The box bounds derive from the KEY
    DOMAIN (quarter of each max key ⇒ ~1/16 of the z-space) so the
    predicate is selective at EVERY scale factor — fixed literal
    bounds covered the whole toy-SF table, making the file-skipping
    claim degenerate there (r8 fix)."""
    import shutil
    import tempfile

    from ..operators.zorder import zorder_write

    scratch = tempfile.mkdtemp(prefix="bigdata_spark_zorder_")
    try:
        l = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
        )
        naive = f"{scratch}/naive"
        zord = f"{scratch}/zorder"
        l.repartition(16).write.mode("overwrite").parquet(naive)
        zorder_write(l, zord, ("l_partkey", "l_suppkey"), n_files=16)
        bounds = l.agg(
            F.max("l_partkey").alias("pk"), F.max("l_suppkey").alias("sk")
        ).first()
        pk_cut, sk_cut = int(bounds["pk"]) // 4, int(bounds["sk"]) // 4

        def box(df):
            return df.filter(
                (F.col("l_partkey") <= pk_cut) & (F.col("l_suppkey") <= sk_cut)
            )

        def probe(path):
            hits = box(spark.read.parquet(path)).withColumn(
                "_f", F.input_file_name()
            )
            row = hits.agg(
                F.count("*").alias("rows"),
                F.countDistinct("_f").alias("files"),
            ).first()
            return int(row["rows"]), int(row["files"])

        n_rows, n_files = probe(naive)
        z_rows, z_files = probe(zord)
        return spark.createDataFrame(
            [
                (
                    n_rows,
                    bool(z_rows == n_rows),
                    bool(z_files < n_files),
                    bool(n_files >= 12),  # naive layout scatters the box
                )
            ],
            "box_rows long, rows_equal boolean, zorder_touches_fewer_files boolean, "
            "naive_scatters boolean",
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


S15_ZORDER_SQL = """
WITH b AS (
  SELECT MAX(l_partkey) // 4 AS pk_cut, MAX(l_suppkey) // 4 AS sk_cut
  FROM lineitem
)
SELECT COUNT(*) AS box_rows, TRUE AS rows_equal,
       TRUE AS zorder_touches_fewer_files, TRUE AS naive_scatters
FROM lineitem, b
WHERE l_partkey <= b.pk_cut AND l_suppkey <= b.sk_cut
"""


def s13_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom Python DataSource (Spark 4 API, sources/pydatasource.py):
    row-group-partitioned parquet reader streaming Arrow RecordBatches.
    The oracle reads the SAME file through DuckDB — content equality
    proves the connector reproduces the native reader bit-for-bit."""
    from ..sources.pydatasource import register

    register(spark)
    docs = (
        spark.read.format("rowgroup_parquet")
        .option("path", f"{sf_dir}/documents.parquet")
        .load()
    )
    return docs.select("doc_id", "lang", "source", F.col("n_chars").cast("long"))


S13_PYDS_SQL = """
SELECT doc_id, lang, source, CAST(n_chars AS BIGINT) AS n_chars FROM documents
"""


def a14_udaf_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True UDAF surface: a GROUPED_AGG pandas UDF (Arrow-batched,
    whole-group-at-once) computing the per-group MODE of l_quantity
    with a deterministic smallest-value tie-break. The reference has no
    UDAFs (SURVEY §2.8); this extends the UDF family to the
    aggregation position. Counts are integers, so the result is exact
    and the oracle is a count + row_number reimplementation."""
    from ..functions.udafs import mode_qty

    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag", "l_linestatus")
        .agg(mode_qty("l_quantity").alias("mode_qty"))
    )


A14_UDAF_SQL = """
WITH counts AS (
  SELECT l_returnflag, l_linestatus, l_quantity, COUNT(*) AS n
  FROM lineitem GROUP BY 1, 2, 3
),
ranked AS (
  SELECT l_returnflag, l_linestatus, l_quantity,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag, l_linestatus
                            ORDER BY n DESC, l_quantity) AS rk
  FROM counts
)
SELECT l_returnflag, l_linestatus, CAST(l_quantity AS DOUBLE) AS mode_qty
FROM ranked WHERE rk = 1
"""


def s9_partitioned_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-partitioned parquet sink + partition-pruned re-read — the
    write-path layout that makes 100 TB scans cheap. Pins: rows
    conserved through the sink, a one-partition filter reads only that
    partition's files (input_file_name check), and the partition column
    survives the roundtrip."""
    import shutil
    import tempfile

    scratch = tempfile.mkdtemp(prefix="bigdata_spark_psink_")
    try:
        l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 2000)
        cols = ["l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"]
        src = l.select(*cols)
        n_src = src.count()
        src.write.mode("overwrite").partitionBy("l_returnflag").parquet(scratch)

        back = spark.read.parquet(scratch)
        n_back = back.count()
        one = back.filter(F.col("l_returnflag") == "R")
        files = {
            r["f"]
            for r in one.select(F.input_file_name().alias("f")).distinct().collect()
        }
        # nonempty guard: all() over an empty file set is vacuously
        # true, which would claim pruning held without exercising it
        pruned = len(files) > 0 and all("l_returnflag=R" in f for f in files)
        n_r_part = one.count()
        n_r_src = src.filter(F.col("l_returnflag") == "R").count()
        return spark.createDataFrame(
            [(bool(n_back == n_src), bool(pruned), bool(n_r_part == n_r_src))],
            "rows_conserved boolean, scan_pruned_to_partition boolean, "
            "partition_values_roundtrip boolean",
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


S9_SQL = (
    "SELECT TRUE AS rows_conserved, TRUE AS scan_pruned_to_partition, "
    "TRUE AS partition_values_roundtrip"
)


def s10_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines sink + schema'd source roundtrip (the interchange
    format most training-data pipelines ingest). Oracle pins the
    roundtrip invariants."""
    import shutil
    import tempfile

    scratch = tempfile.mkdtemp(prefix="bigdata_spark_jsonl_")
    try:
        n = load_table(spark, sf_dir, "nation")
        n.repartition(1).write.mode("overwrite").json(scratch)
        back = spark.read.schema(
            "n_nationkey long, n_name string, n_regionkey long"
        ).json(scratch)
        diff = back.select("n_nationkey", "n_name", "n_regionkey").exceptAll(
            n.select("n_nationkey", "n_name", "n_regionkey")
        ).count()
        n_back = back.count()
        n_src = n.count()
        return spark.createDataFrame(
            [(bool(n_back == n_src), bool(diff == 0))],
            "rowcount_preserved boolean, values_roundtrip boolean",
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


S10_SQL = "SELECT TRUE AS rowcount_preserved, TRUE AS values_roundtrip"


def s14_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink + source roundtrip — the second columnar format Spark
    ships natively (warehouse interchange with Hive-era estates). The
    oracle is a REAL value check, not a pinned TRUE: the rollup comes
    back from the ORC copy and must hash-match DuckDB's rollup of the
    original parquet — wrong ORC encode/decode shows up as a value
    mismatch, not a flipped boolean."""
    import shutil
    import tempfile

    scratch = tempfile.mkdtemp(prefix="bigdata_spark_orc_")
    try:
        s = load_table(spark, sf_dir, "supplier")
        s.write.mode("overwrite").orc(scratch)
        back = spark.read.orc(scratch)
        rollup = back.groupBy("s_nationkey").agg(
            F.count("*").alias("n_suppliers"),
            # decimal sum: exact and order-free (the tpch_q1 pattern)
            F.sum(F.col("s_acctbal").cast("decimal(18,6)")).cast("double").alias("acctbal_sum"),
        )
        # materialize on the EXECUTORS before the scratch dir goes away
        # (the returned frame must not depend on deleted files when the
        # caller runs it) — localCheckpoint keeps the blocks
        # executor-resident instead of round-tripping rows through the
        # driver, so the materialization stays rollup-sized per task at
        # any SF
        return rollup.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


S14_SQL = """
SELECT s_nationkey, COUNT(*) AS n_suppliers,
       CAST(SUM(CAST(s_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS acctbal_sum
FROM supplier GROUP BY s_nationkey
"""


def s24_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML sink + source roundtrip (Spark 4 native XML datasource —
    rowTag records, schema inference on read). Same real-value oracle
    pattern as ORC/Avro: the rollup is computed from the XML copy and
    must hash-match DuckDB's rollup of the original parquet. Dates are
    round-tripped as ISO strings (XML is schema-light; the read-back
    casts restore types explicitly rather than trusting inference)."""
    import shutil
    import tempfile

    scratch = tempfile.mkdtemp(prefix="bigdata_spark_xml_")
    try:
        c = load_table(spark, sf_dir, "customer")
        c.write.format("xml").option("rowTag", "customer").mode(
            "overwrite"
        ).save(scratch)
        back = spark.read.format("xml").option("rowTag", "customer").load(scratch)
        rollup = back.groupBy(F.col("c_nationkey").cast("long").alias("c_nationkey")).agg(
            F.count("*").alias("n_customers"),
            F.sum(F.col("c_acctbal").cast("decimal(18,6)"))
            .cast("double")
            .alias("acctbal_sum"),
        )
        # executor-resident materialization (scratch dir dies in finally)
        return rollup.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


S24_XML_SQL = """
SELECT c_nationkey, COUNT(*) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS acctbal_sum
FROM customer GROUP BY c_nationkey
"""


def s17_delete_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Versioned-table DELETE + row-level CDC (streaming/upsert_sink):
    v0 = an orders slice, v1 = keyed price update, v2 = GDPR-style
    delete of every 100th key — each an immutable published version.
    ``versioned_changes(v0 → v2)`` classifies keys as update/delete;
    the counts and the surviving exact-decimal price sum are all
    derivable from the orders table alone, so the oracle is REAL SQL,
    not pinned booleans. Old versions stay readable (time travel) and
    the delete never rewrites a committed directory."""
    import shutil
    import tempfile

    from ..streaming.upsert_sink import (
        VersionedParquetTable,
        versioned_changes,
        versioned_delete_where,
    )

    scratch = tempfile.mkdtemp(prefix="bigdata_spark_cdc_")
    try:
        t = VersionedParquetTable(spark, scratch, keep_versions=4)
        o = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderkey") % 20 == 0
        ).select("o_orderkey", "o_totalprice", "o_orderstatus")
        v0 = t.publish(o)
        updated = o.withColumn(
            "o_totalprice",
            F.when(
                F.col("o_orderkey") % 50 == 0, F.col("o_totalprice") + 100.0
            ).otherwise(F.col("o_totalprice")),
        )
        t.publish(updated)
        v2 = versioned_delete_where(t, F.col("o_orderkey") % 100 == 0)
        cdc = versioned_changes(t, v0, v2, ["o_orderkey"])
        by_type = {
            r["_change_type"]: r["n"]
            for r in cdc.groupBy("_change_type").agg(F.count("*").alias("n")).collect()
        }
        final = t.read().agg(
            F.count("*").alias("n_rows"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("price_sum"),
        ).first()
        return spark.createDataFrame(
            [(
                int(v0),
                int(v2),
                int(by_type.get("delete", 0)),
                int(by_type.get("update", 0)),
                int(by_type.get("insert", 0)),
                int(final["n_rows"]),
                float(final["price_sum"]),
            )],
            "v_first bigint, v_final bigint, cdc_deleted bigint, cdc_updated bigint, "
            "cdc_inserted bigint, n_rows bigint, price_sum double",
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


S17_CDC_SQL = """
WITH slice AS (
  SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 20 = 0
)
SELECT CAST(0 AS BIGINT) AS v_first, CAST(2 AS BIGINT) AS v_final,
  (SELECT COUNT(*) FROM slice WHERE o_orderkey % 100 = 0) AS cdc_deleted,
  (SELECT COUNT(*) FROM slice
    WHERE o_orderkey % 50 = 0 AND o_orderkey % 100 <> 0) AS cdc_updated,
  CAST(0 AS BIGINT) AS cdc_inserted,
  (SELECT COUNT(*) FROM slice WHERE o_orderkey % 100 <> 0) AS n_rows,
  (SELECT CAST(SUM(CAST(CASE WHEN o_orderkey % 50 = 0
                        THEN o_totalprice + 100.0
                        ELSE o_totalprice END AS DECIMAL(18,2))) AS DOUBLE)
   FROM slice WHERE o_orderkey % 100 <> 0) AS price_sum
"""


def s18_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance: a per-customer aggregate is
    maintained from the versioned table's CDC feed instead of
    recomputed — v0's aggregate plus signed group deltas (insert adds
    the new row, delete subtracts the old, update does both) must equal
    the full recompute over the final version. At 100 TB this is THE
    pattern that turns an hourly full-table aggregation into a
    CDC-sized one; count/sum are additive, so the merge is one
    full-outer join on the group key. The oracle computes the final
    aggregate directly from orders — a full-value check of the entire
    publish → mutate → diff → merge chain."""
    import shutil
    import tempfile

    from ..streaming.upsert_sink import (
        VersionedParquetTable,
        versioned_changes,
        versioned_delete_where,
    )

    scratch = tempfile.mkdtemp(prefix="bigdata_spark_ivm_")
    try:
        t = VersionedParquetTable(spark, scratch, keep_versions=4)
        base = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderkey") % 10 == 0
        ).select("o_orderkey", "o_custkey", "o_totalprice")
        v0 = t.publish(base)
        agg0 = (
            t.read_version(v0)
            .groupBy("o_custkey")
            .agg(
                F.count("*").alias("n"),
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("s"),
            )
        )
        t.publish(
            base.withColumn(
                "o_totalprice",
                F.when(
                    F.col("o_orderkey") % 40 == 0, F.col("o_totalprice") + 50.0
                ).otherwise(F.col("o_totalprice")),
            )
        )
        v2 = versioned_delete_where(t, F.col("o_orderkey") % 100 == 0)
        cdc = versioned_changes(t, v0, v2, ["o_orderkey"])
        minus = cdc.filter(F.col("_change_type").isin("delete", "update")).select(
            F.col("_va.o_custkey").alias("o_custkey"),
            F.lit(-1).cast("long").alias("dn"),
            (-F.col("_va.o_totalprice").cast("decimal(18,2)")).alias("ds"),
        )
        plus = cdc.filter(F.col("_change_type").isin("insert", "update")).select(
            F.col("_vb.o_custkey").alias("o_custkey"),
            F.lit(1).cast("long").alias("dn"),
            F.col("_vb.o_totalprice").cast("decimal(18,2)").alias("ds"),
        )
        deltas = (
            minus.unionByName(plus)
            .groupBy("o_custkey")
            .agg(F.sum("dn").alias("dn"), F.sum("ds").alias("ds"))
        )
        merged = (
            agg0.join(deltas, "o_custkey", "full_outer")
            .select(
                "o_custkey",
                (F.coalesce("n", F.lit(0)) + F.coalesce("dn", F.lit(0))).alias("n"),
                (
                    F.coalesce(F.col("s"), F.lit(0).cast("decimal(18,2)"))
                    + F.coalesce(F.col("ds"), F.lit(0).cast("decimal(18,2)"))
                )
                .cast("double")
                .alias("sum_price"),
            )
            .filter(F.col("n") > 0)
        )
        # the merged aggregate is CUSTOMER-grain — a collect here would
        # round-trip an input-sized table through the driver; eager
        # localCheckpoint pins the blocks on the executors instead, and
        # the scratch-backed lineage can then die in the finally
        return merged.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


S18_IVM_SQL = """
SELECT o_custkey, COUNT(*) AS n,
       CAST(SUM(CAST(CASE WHEN o_orderkey % 40 = 0
                     THEN o_totalprice + 50.0
                     ELSE o_totalprice END AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM orders
WHERE o_orderkey % 10 = 0 AND o_orderkey % 100 <> 0
GROUP BY 1
"""


_CSV_ROWS = [
    (1, 'plain'),
    (2, 'comma, inside'),
    (3, 'quote " inside'),
    (4, 'both ", and, quotes "'),
    (5, 'newline\ninside'),
    (6, ''),
    (7, None),
    (8, 'trailing space '),
    (9, ' leading space'),
    (10, 'unicode: café üß — 中文'),
]


def s19_csv_quoting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV sink/source QUOTING roundtrip: commas, embedded quotes,
    newlines-in-fields, empty vs NULL, edge whitespace, non-ASCII — the
    cases that corrupt naive CSV handling. Written with explicit
    quote/escape options and read back with the same; multiLine=true is
    REQUIRED for the newline row (the splittable default reader breaks
    records on raw newlines — at scale that costs per-file parallelism,
    which is the documented trade for newline-bearing exports). The
    oracle is the same literal rows, so any quoting defect
    hash-mismatches."""
    import shutil
    import tempfile

    scratch = tempfile.mkdtemp(prefix="bigdata_spark_csvq_")
    try:
        df = spark.createDataFrame(_CSV_ROWS, "id long, s string")
        (
            df.write.mode("overwrite")
            .options(
                header=True, quote='"', escape='"', nullValue="\\N",
                # the WRITER trims edge whitespace by default — keep it
                ignoreLeadingWhiteSpace=False, ignoreTrailingWhiteSpace=False,
            )
            .csv(scratch)
        )
        back = (
            spark.read.options(
                header=True, quote='"', escape='"', nullValue="\\N",
                multiLine=True,
            )
            .schema("id long, s string")
            .csv(scratch)
        )
        return back.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


def _csv_values_sql() -> str:
    def lit(v):
        if v is None:
            return "NULL"
        return "'" + v.replace("'", "''").replace("\n", "' || chr(10) || '") + "'"

    vals = ", ".join(f"({i}, {lit(s)})" for i, s in _CSV_ROWS)
    return f"SELECT CAST(id AS BIGINT) AS id, s FROM (VALUES {vals}) t(id, s)"


S19_CSV_SQL = _csv_values_sql()


def s21_dynamic_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition overwrite (partitionOverwriteMode=dynamic):
    rewrite ONLY the partitions present in the incoming batch, leaving
    sibling partitions untouched — the idempotent-backfill primitive
    (re-run one day's job without clobbering the month). Static mode
    would truncate the whole table first; the final rollup proves the
    other partitions survived, and the oracle computes the expected
    merged state straight from orders."""
    import shutil
    import tempfile

    scratch = tempfile.mkdtemp(prefix="bigdata_spark_dynow_")
    try:
        o = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_totalprice", "o_orderstatus"
        )
        o.write.mode("overwrite").partitionBy("o_orderstatus").parquet(scratch)
        # backfill ONLY the 'F' partition with doubled prices
        patch = o.filter(F.col("o_orderstatus") == "F").withColumn(
            "o_totalprice", F.col("o_totalprice") * 2.0
        )
        (
            patch.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("o_orderstatus")
            .parquet(scratch)
        )
        rollup = (
            spark.read.parquet(scratch)
            .groupBy("o_orderstatus")
            .agg(
                F.count("*").alias("n"),
                F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                .cast("double")
                .alias("sum_price"),
            )
        )
        # executor-resident materialization (scratch dir dies in finally)
        return rollup.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


S21_DYNOW_SQL = """
SELECT o_orderstatus, COUNT(*) AS n,
       CAST(SUM(CAST(CASE WHEN o_orderstatus = 'F'
                     THEN o_totalprice * 2.0
                     ELSE o_totalprice END AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM orders GROUP BY 1
"""


def sql_api_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL-string API surface: the same pricing-summary shape as
    tpch_q1 expressed through spark.sql over a temp view — proves a
    reference user can keep writing SQL text verbatim. The oracle is
    the identical ANSI statement."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_v")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
               COUNT(*) AS count_order
        FROM lineitem_v
        GROUP BY l_returnflag, l_linestatus
        """
    )


SQL_API_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       COUNT(*) AS count_order
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""


def s11_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction (sources/compaction.py): explode a slice of
    lineitem into many tiny files, compact to a byte target, and pin
    rows conserved + file count collapsed + values intact."""
    import shutil
    import tempfile

    from ..sources.compaction import compact_parquet, parquet_file_count

    root = tempfile.mkdtemp(prefix="bigdata_spark_compact_")
    try:
        src, dst = f"{root}/small", f"{root}/compacted"
        l = load_table(spark, sf_dir, "lineitem").filter(
            F.col("l_orderkey") <= 2000
        ).select("l_orderkey", "l_linenumber", "l_quantity").persist()
        n_src = l.count()
        l.repartition(64).write.mode("overwrite").parquet(src)  # the small-file mess
        n_small = parquet_file_count(spark, src)
        n_out = compact_parquet(spark, src, dst, target_file_bytes=64 * 1024 * 1024)
        back = spark.read.parquet(dst)
        n_back = back.count()
        diff = back.exceptAll(l).count()
        l.unpersist()
        return spark.createDataFrame(
            [
                (
                    bool(n_small >= 32),
                    bool(n_out < n_small),
                    bool(n_back == n_src),
                    bool(diff == 0),
                )
            ],
            "many_small_files boolean, file_count_collapsed boolean, "
            "rows_conserved boolean, values_intact boolean",
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


S11_SQL = (
    "SELECT TRUE AS many_small_files, TRUE AS file_count_collapsed, "
    "TRUE AS rows_conserved, TRUE AS values_intact"
)


def s12_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution read (mergeSchema): two parquet generations —
    one with an added column — union into the superset schema with
    null-fill for the missing column."""
    import shutil
    import tempfile

    from ..sources.compaction import read_merged_schema

    root = tempfile.mkdtemp(prefix="bigdata_spark_evolve_")
    try:
        n = load_table(spark, sf_dir, "nation")
        v1 = n.select("n_nationkey", "n_name")
        v2 = n.select(
            "n_nationkey", "n_name", F.col("n_regionkey").alias("region_added")
        )
        v1.write.mode("overwrite").parquet(f"{root}/gen=1")
        v2.write.mode("overwrite").parquet(f"{root}/gen=2")
        merged = read_merged_schema(spark, f"{root}/gen=1", f"{root}/gen=2")
        has_col = "region_added" in merged.columns
        counts = merged.agg(
            F.count("*").alias("total"),
            F.count("region_added").alias("with_col"),
        ).first()
        n_src = v1.count()
        return spark.createDataFrame(
            [
                (
                    bool(has_col),
                    bool(counts["total"] == 2 * n_src),
                    bool(counts["with_col"] == n_src),
                )
            ],
            "superset_schema boolean, all_rows_read boolean, "
            "old_generation_nullfilled boolean",
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


S12_SQL = (
    "SELECT TRUE AS superset_schema, TRUE AS all_rows_read, "
    "TRUE AS old_generation_nullfilled"
)


def s23_merge_into(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch MERGE INTO (operators/merge.py): one full-outer join
    realizes WHEN MATCHED AND is_delete THEN DELETE / WHEN MATCHED
    THEN UPDATE / WHEN NOT MATCHED THEN INSERT, with unmatched target
    rows carried. Target = every 20th order; source = every 30th with
    a +50 price revision, every 300th tombstoned. Result is audited
    per (action, status) with exact decimal price sums."""
    from ..operators.merge import merge_into

    o = load_table(spark, sf_dir, "orders")
    target = o.filter(F.col("o_orderkey") % 20 == 0).select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    source = o.filter(F.col("o_orderkey") % 30 == 0).select(
        "o_orderkey",
        (F.col("o_totalprice") + 50.0).alias("o_totalprice"),
        "o_orderstatus",
        (F.col("o_orderkey") % 300 == 0).alias("is_delete"),
    )
    merged = merge_into(
        target,
        source,
        ["o_orderkey"],
        delete_when=F.col("s.is_delete"),
        action_col="action",
    )
    return (
        merged.groupBy("action", "o_orderstatus")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("price_sum"),
        )
        .orderBy("action", "o_orderstatus")
    )


S23_MERGE_SQL = """
WITH t AS (
  SELECT o_orderkey AS k, o_totalprice AS p, o_orderstatus AS st
  FROM orders WHERE o_orderkey % 20 = 0
),
s AS (
  SELECT o_orderkey AS k, o_totalprice + 50.0 AS p, o_orderstatus AS st,
         o_orderkey % 300 = 0 AS is_del
  FROM orders WHERE o_orderkey % 30 = 0
),
m AS (
  SELECT CASE WHEN t.k IS NOT NULL AND s.k IS NOT NULL THEN s.p
              WHEN s.k IS NULL THEN t.p ELSE s.p END AS p,
         CASE WHEN t.k IS NOT NULL AND s.k IS NOT NULL THEN s.st
              WHEN s.k IS NULL THEN t.st ELSE s.st END AS st,
         CASE WHEN t.k IS NOT NULL AND s.k IS NOT NULL THEN 'update'
              WHEN s.k IS NULL THEN 'carry' ELSE 'insert' END AS action
  FROM t FULL OUTER JOIN s ON t.k = s.k
  WHERE NOT (t.k IS NOT NULL AND s.k IS NOT NULL AND s.is_del)
)
SELECT action, st AS o_orderstatus, COUNT(*) AS n_rows,
       CAST(SUM(CAST(p AS DECIMAL(18,2))) AS DOUBLE) AS price_sum
FROM m GROUP BY 1, 2 ORDER BY 1, 2
"""


def sql_params_api(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL (Spark 3.4+/4): named parameter markers bound
    through ``spark.sql(..., args=...)`` plus direct DataFrame
    interpolation with ``{df}`` — the injection-safe way to template
    queries (parameters are bound AFTER parsing, never string-spliced,
    so a malicious value can't change the plan). The oracle inlines
    the same constants."""
    l = load_table(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        SELECT l_returnflag,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        FROM {lineitem}
        WHERE l_quantity < :qmax AND l_returnflag != :skip
        GROUP BY l_returnflag
        ORDER BY l_returnflag
        """,
        args={"qmax": 10, "skip": "N"},
        lineitem=l,
    )


SQL_PARAMS_SQL = """
SELECT l_returnflag, COUNT(*) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
FROM lineitem
WHERE l_quantity < 10 AND l_returnflag <> 'N'
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def o9_observe_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``Observation`` API: piggyback named metrics onto a query's
    OWN single pass (no second scan) — how a production pipeline
    collects row counts / control totals for reconciliation without
    doubling its I/O. The observed metrics must equal what a separate
    aggregation would report; both are returned side by side and the
    oracle pins their equality."""
    from pyspark.sql import Observation

    obs = Observation("ingest_metrics")
    l = load_table(spark, sf_dir, "lineitem").observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty_total"),
    )
    filtered_n = l.filter(F.col("l_quantity") < 10).count()  # the real action
    m = obs.get
    return spark.createDataFrame(
        [(int(m["n_rows"]), float(m["qty_total"]), int(filtered_n))],
        "observed_rows long, observed_qty double, filtered_rows long",
    )


O9_OBSERVE_SQL = """
SELECT COUNT(*) AS observed_rows,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS observed_qty,
       CAST(SUM(CASE WHEN l_quantity < 10 THEN 1 ELSE 0 END) AS BIGINT)
         AS filtered_rows
FROM lineitem
"""


def s26_binaryfile_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque binary ingestion via Spark's ``binaryFile`` datasource —
    the front door a multimodal corpus (images/audio on shared
    storage) enters the engine through.

    Stages four deterministic PNGs plus a non-matching decoy into a
    scratch dir, reads them back with ``pathGlobFilter`` (the decoy
    must be pruned at LISTING time, before any bytes are read), and
    reduces each file to (name, byte length, md5). At 100 TB the file
    listing is distributed, content is never deserialized row-wise,
    and per-file work is a constant-memory digest — the payload stays
    an opaque BinaryType column exactly like documents/media pipelines
    expect. Content is seed-deterministic, so the oracle pins the
    digests."""
    import shutil
    import tempfile

    import numpy as np

    from ..multimodal.codecs import encode_png

    scratch = tempfile.mkdtemp(prefix="bigdata_spark_binfile_")
    try:
        for i in range(4):
            h, w = 8 + 4 * i, 12 + 2 * i
            yy, xx = np.mgrid[0:h, 0:w]
            px = np.stack(
                [(yy * 31 + i * 7) % 256, (xx * 17) % 256, (yy * xx + i) % 256],
                axis=-1,
            ).astype(np.uint8)
            with open(f"{scratch}/img_{i}.png", "wb") as f:
                f.write(encode_png(px, filter_type=i % 2))
        with open(f"{scratch}/decoy.txt", "w") as f:
            f.write("not an image")
        df = (
            spark.read.format("binaryFile")
            .option("pathGlobFilter", "*.png")
            .load(scratch)
            .select(
                F.element_at(F.split("path", "/"), -1).alias("fname"),
                F.col("length").alias("n_bytes"),
                F.md5("content").alias("digest"),
            )
            .orderBy("fname")
        )
        # executor-resident materialization before the scratch dir dies
        return df.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


S26_BINARYFILE_SQL = """
SELECT * FROM (VALUES
  ('img_0.png', CAST(309 AS BIGINT), 'ce174a7d1394b4e4d6665e197e65cdec'),
  ('img_1.png', CAST(141 AS BIGINT), '2a345ab25cc5fd1573c276e1c5e5f354'),
  ('img_2.png', CAST(744 AS BIGINT), '1f912108201329b2e1c10fec0969846d'),
  ('img_3.png', CAST(180 AS BIGINT), 'eb3c37bb43c600f2c1bf4ec315dab0bf')
) AS t(fname, n_bytes, digest)
ORDER BY fname
"""



def s30_csv_malformed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed-record semantics for CSV ingestion — the unglamorous
    behavior that decides whether a 100 TB load silently corrupts or
    fails loudly. A staged file carries 8 clean rows and 4 suspect
    ones; the pinned census documents what Spark ACTUALLY does:
    an unparseable int and a short row are quarantined with the raw
    line in ``columnNameOfCorruptRecord``; an EXTRA column is
    quarantined; but an unclosed quote parses LENIENTLY as clean data.
    The census also pins the infamous DROPMALFORMED footgun: ``count()``
    reports 12 because column pruning skips parsing entirely (Spark's
    documented CSV behavior), while materializing the columns yields 9
    rows — the discrepancy every production CSV pipeline must know
    exists before trusting row counts."""
    import shutil
    import tempfile

    scratch = tempfile.mkdtemp(prefix="bigdata_spark_badcsv_")
    try:
        lines = ["id,qty,name"]
        for i in range(8):
            lines.append(f"{i},{i * 10},item_{i}")
        lines += [
            "8,notanint,item_8",      # unparseable int -> corrupt
            "9,90",                    # missing column -> corrupt
            '10,100,"unclosed',        # bare quote -> corrupt
            "11,110,item_11,extra",    # extra column -> corrupt
        ]
        path = f"{scratch}/data.csv"
        with open(path, "w") as f:
            f.write("\n".join(lines) + "\n")
        schema = "id INT, qty INT, name STRING, _bad STRING"
        permissive = (
            spark.read.schema(schema)
            .option("header", "true")
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_bad")
            .csv(path)
            .cache()
        )
        n_perm = permissive.count()
        n_quarantined = permissive.filter(F.col("_bad").isNotNull()).count()
        qty_clean = permissive.filter(F.col("_bad").isNull()).agg(
            F.sum("qty")
        ).first()[0]
        drop_df = (
            spark.read.schema("id INT, qty INT, name STRING")
            .option("header", "true")
            .option("mode", "DROPMALFORMED")
            .csv(path)
        )
        n_drop_count_pruned = drop_df.count()  # prunes all columns: 12!
        n_drop_parsed = len(drop_df.collect())  # forces the parse: 9
        permissive.unpersist()
        return spark.createDataFrame(
            [
                (
                    n_perm,
                    n_quarantined,
                    int(qty_clean),
                    int(n_drop_parsed),
                    int(n_drop_count_pruned),
                )
            ],
            "n_permissive long, n_quarantined long, qty_clean_sum long,"
            " n_dropmalformed long, n_drop_count_pruned long",
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


S30_BADCSV_SQL = """
SELECT CAST(12 AS BIGINT) AS n_permissive,
       CAST(3 AS BIGINT) AS n_quarantined,
       CAST(380 AS BIGINT) AS qty_clean_sum,
       CAST(9 AS BIGINT) AS n_dropmalformed,
       CAST(12 AS BIGINT) AS n_drop_count_pruned
"""


def s31_json_malformed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed-record semantics for JSON ingestion — the schema-on-
    read contrasts with the CSV census (s30) that decide how a 100 TB
    JSONL load degrades. The staged file carries 8 clean records plus:
    a syntactically broken line (quarantined, raw text in
    ``_corrupt_record``); a TYPE mismatch (JSON's partial-result
    semantics: the good fields survive AND the record is flagged —
    CSV nulls the whole row); a MISSING field (plain null, NOT corrupt
    — schema-on-read); and an EXTRA field (ignored, NOT corrupt —
    where CSV quarantines the whole row). FAILFAST raises on the first
    bad record (pinned as a boolean), and DROPMALFORMED's parsed
    row count is pinned next to PERMISSIVE's."""
    import shutil
    import tempfile

    scratch = tempfile.mkdtemp(prefix="bigdata_spark_badjson_")
    try:
        lines = [
            f'{{"id": {i}, "qty": {i * 10}, "name": "item_{i}"}}'
            for i in range(8)
        ]
        lines += [
            '{"id": 8, "qty": "notanint", "name": "item_8"}',  # type clash
            '{"id": 9, "name": "item_9"}',                     # missing field
            '{"id": 10, "qty": 100, "name": "item_10", "extra": 1}',
            '{"id": 11, "qty": 110, "name": "item_11"',        # broken syntax
        ]
        path = f"{scratch}/data.jsonl"
        with open(path, "w") as f:
            f.write("\n".join(lines) + "\n")
        schema = "id INT, qty INT, name STRING, _bad STRING"
        permissive = (
            spark.read.schema(schema)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_bad")
            .json(path)
            .cache()
        )
        n_perm = permissive.count()
        n_quarantined = permissive.filter(F.col("_bad").isNotNull()).count()
        # partial-result semantics: the type-clash record keeps its
        # parseable fields, so id=8 survives WITH a _bad marker
        n_partial = permissive.filter(
            F.col("_bad").isNotNull() & F.col("id").isNotNull()
        ).count()
        qty_sum = permissive.agg(F.sum("qty")).first()[0]
        drop_df = (
            spark.read.schema("id INT, qty INT, name STRING")
            .option("mode", "DROPMALFORMED")
            .json(path)
        )
        n_drop_parsed = len(drop_df.collect())
        failfast_raises = False
        # The FAILFAST probe is SUPPOSED to fail — silence the JVM's
        # ERROR-level task-failure trace for exactly this action so the
        # bench/driver stderr tail doesn't lead with a stack trace that
        # reads like a real failure (ADVICE r6 / VERDICT r7 #7). The
        # Python-side exception is still asserted via the pinned boolean.
        sc = spark.sparkContext
        try:
            sc.setLogLevel("OFF")
            spark.read.schema("id INT, qty INT, name STRING").option(
                "mode", "FAILFAST"
            ).json(path).collect()
        except Exception:
            failfast_raises = True
        finally:
            sc.setLogLevel("ERROR")
        permissive.unpersist()
        return spark.createDataFrame(
            [
                (
                    int(n_perm),
                    int(n_quarantined),
                    int(n_partial),
                    int(qty_sum),
                    int(n_drop_parsed),
                    bool(failfast_raises),
                )
            ],
            "n_permissive long, n_quarantined long, n_partial_results long,"
            " qty_sum long, n_dropmalformed long, failfast_raises boolean",
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


# pinned from the observed census (see docstring for what each pins)
S31_BADJSON_SQL = """
SELECT CAST(12 AS BIGINT) AS n_permissive,
       CAST(2 AS BIGINT) AS n_quarantined,
       CAST(1 AS BIGINT) AS n_partial_results,
       CAST(380 AS BIGINT) AS qty_sum,
       CAST(10 AS BIGINT) AS n_dropmalformed,
       TRUE AS failfast_raises
"""

def s32_bucketed_smb_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed sort-merge join — pay the partitioning shuffle ONCE at
    write time, join shuffle-free forever after (sources/bucketing.py,
    until now only unit-tested, never under the gate). lineitem and
    orders are written as co-bucketed sorted tables on the order key
    (8 buckets); the join of the two bucketed scans plans with ZERO
    shuffle Exchange (asserted in-query via exchange_count and pinned
    as a boolean next to the un-bucketed twin's has-shuffle flag),
    then revenue rolls up per priority with the package's exact
    DECIMAL discipline. At 100 TB this is THE co-location strategy:
    every repeated fact-fact equi-join on the bucket key skips both
    sides' exchanges, trading one write-time shuffle for all of them."""
    from ..sources.bucketing import exchange_count, write_bucketed

    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    # repartition to the bucket layout before writing: otherwise every
    # input task writes its own copy of every bucket (32×8 small files
    # per table — the classic bucketed-write file explosion)
    write_bucketed(
        l.repartition(8, "l_orderkey"), "s32_lineitem_b", "l_orderkey", 8,
        sort_col="l_orderkey",
    )
    write_bucketed(
        o.repartition(8, "o_orderkey"), "s32_orders_b", "o_orderkey", 8,
        sort_col="o_orderkey",
    )
    try:
        bl, bo = spark.table("s32_lineitem_b"), spark.table("s32_orders_b")
        vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
            "decimal(18,6)"
        )
        joined = bl.join(bo, bl.l_orderkey == bo.o_orderkey)
        agg = (
            joined.groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n_lines"),
                F.sum(vol).cast("double").alias("revenue"),
            )
            .orderBy("o_orderpriority")
        )
        bucketed_shuffle_free = exchange_count(joined) == 0
        # the un-bucketed twin must compare like-for-like: force the
        # sort-merge strategy (at toy SF the planner would otherwise
        # broadcast orders and dodge the shuffle the bucketing saves)
        plain_has_shuffle = (
            exchange_count(l.hint("merge").join(o, l.l_orderkey == o.o_orderkey))
            >= 1
        )
        rows = [
            (
                r["o_orderpriority"],
                r["n_lines"],
                r["revenue"],
                bucketed_shuffle_free,
                plain_has_shuffle,
            )
            for r in agg.collect()
        ]
    finally:
        spark.sql("DROP TABLE IF EXISTS s32_lineitem_b")
        spark.sql("DROP TABLE IF EXISTS s32_orders_b")
    return spark.createDataFrame(
        rows,
        "o_orderpriority string, n_lines long, revenue double,"
        " bucketed_shuffle_free boolean, plain_has_shuffle boolean",
    )


S32_BUCKETED_SQL = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
            AS DOUBLE) AS revenue,
       TRUE AS bucketed_shuffle_free, TRUE AS plain_has_shuffle
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# s33_recursive_cte — Spark 4 native WITH RECURSIVE, one SQL text, two engines
# ---------------------------------------------------------------------------

# The ONE recursive SQL text both engines execute verbatim (Spark 4.1
# runs WITH RECURSIVE natively — iterative closure without a driver
# loop; DuckDB runs the identical string as the oracle). The supplier
# set forms an implicit 3-ary tree (parent(s) = (s-1) div 3, root 0);
# the recursion walks it root-down and the outer query reports a
# per-depth census. Integer parent arithmetic avoids `div`-operator
# dialect drift: (x - x%3)/3 is an exact small-integer division in
# DOUBLE in both engines before the BIGINT cast.
S33_RECURSIVE_SQL = """
WITH RECURSIVE walk(s_suppkey, depth) AS (
  SELECT s_suppkey, 0 AS depth FROM supplier WHERE s_suppkey = 0
  UNION ALL
  SELECT s.s_suppkey, w.depth + 1
  FROM supplier s JOIN walk w
    ON CAST(((s.s_suppkey - 1) - ((s.s_suppkey - 1) % 3)) / 3 AS BIGINT)
       = w.s_suppkey
   AND s.s_suppkey > 0
)
SELECT w.depth,
       CAST(COUNT(*) AS BIGINT) AS n_nodes,
       MIN(w.s_suppkey) AS min_key,
       MAX(w.s_suppkey) AS max_key,
       CAST(SUM(CAST(s.s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
FROM walk w JOIN supplier s ON w.s_suppkey = s.s_suppkey
GROUP BY w.depth
ORDER BY w.depth
"""


def s33_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native ``WITH RECURSIVE`` (new in Spark 4): the 3-ary supplier
    tree walks root-down entirely inside the SQL engine — no driver
    loop, no localCheckpoint bookkeeping — and the per-depth census
    (count, key range, exact-decimal balance sum) comes from the SAME
    SQL text DuckDB executes as the oracle, so the parity check is
    literal. Complements hier_rollup_closure (which builds the closure
    by hand with recursive doubling for engines/versions without
    native recursion) — this entry proves the engine-native path.
    Scale note: each recursion level is one distributed join against
    the full table, exactly what the hand-rolled loop would run; depth
    is log3(n), so a 10^9-supplier tree is ~19 levels."""
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView("supplier")
    return spark.sql(S33_RECURSIVE_SQL)


# ---------------------------------------------------------------------------
# sql_pipe_syntax — Spark 4 SQL pipe operators (|>), oracle in standard SQL
# ---------------------------------------------------------------------------

# The pipe form Spark executes natively (SQL pipe syntax, new in Spark
# 4): each |> stage is a self-contained operator application in reading
# order — the SQL-2023-era answer to deeply nested SELECTs. Catalyst
# compiles it to the identical plan as the standard form the DuckDB
# oracle runs, which is exactly what this entry checks.
SQL_PIPE_TEXT = """
FROM lineitem
|> WHERE l_shipdate <= DATE '1998-09-02'
|> AGGREGATE COUNT(*) AS n_rows,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_price
   GROUP BY l_returnflag, l_linestatus
|> ORDER BY l_returnflag, l_linestatus
"""


def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (``|>``, new in Spark 4): the TPC-H q1 core
    written as a reading-order pipeline — scan |> filter |> aggregate
    |> order. Catalyst parses the pipe form into the same logical plan
    as the nested-SELECT spelling (filter still pushes to the scan,
    sums still partial-aggregate), so the DuckDB oracle is simply the
    standard-SQL equivalent and the value match proves the two
    surfaces agree."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(SQL_PIPE_TEXT)


SQL_PIPE_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM lineitem
WHERE l_shipdate <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# s34_manifest_time_travel — snapshot isolation + time travel by manifest
# ---------------------------------------------------------------------------


def s34_manifest_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot versioning with manifest-planned reads
    (sources/manifest.py — the table-format core trick): v1 snapshots
    the orders table; a v2 commit rewrites ONLY the 'F'-status
    partition files (prices doubled) and publishes a new manifest that
    reuses v1's untouched files. Reading @v1 AFTER the v2 commit must
    reproduce the original table bit-for-bit (time travel / snapshot
    isolation), and @v2 must show exactly the patched partition — both
    proven against an oracle computed straight from orders. Readers
    plan from ONE manifest read, never a directory listing, so at
    100 TB a commit is one atomic JSON rename and old snapshots stay
    queryable for free."""
    import shutil
    import tempfile

    from ..sources.manifest import (
        commit_snapshot,
        list_data_files,
        read_snapshot,
    )

    scratch = tempfile.mkdtemp(prefix="bigdata_spark_ttravel_")
    try:
        o = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_totalprice", "o_orderstatus"
        )
        base = os.path.join(scratch, "table")
        o.write.mode("overwrite").partitionBy("o_orderstatus").parquet(base)
        v1_files = list_data_files(base)
        commit_snapshot(base, 1, v1_files)

        # v2: rewrite the F partition into NEW immutable files placed in
        # the same hive layout (v1's F files stay on disk untouched — a
        # naive directory listing would now double-count, a manifest
        # read never does)
        patch_dir = os.path.join(scratch, "staged_v2")
        (
            o.filter(F.col("o_orderstatus") == "F")
            .withColumn("o_totalprice", F.col("o_totalprice") * 2.0)
            .write.mode("overwrite")
            .partitionBy("o_orderstatus")
            .parquet(patch_dir)
        )
        new_files = []
        for src in list_data_files(patch_dir):
            rel = os.path.relpath(src, patch_dir)
            dst = os.path.join(base, os.path.dirname(rel), "v2-" + os.path.basename(rel))
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            shutil.move(src, dst)
            new_files.append(dst)
        keep = [f for f in v1_files if "o_orderstatus=F" not in f]
        commit_snapshot(base, 2, keep + new_files)

        def _roll(df: DataFrame, version: int) -> DataFrame:
            return df.groupBy("o_orderstatus").agg(
                F.count("*").alias("n"),
                F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                .cast("double")
                .alias("sum_price"),
            ).select(F.lit(version).alias("version"), "o_orderstatus", "n", "sum_price")

        v1 = _roll(read_snapshot(spark, base, 1), 1)
        v2 = _roll(read_snapshot(spark, base, 2), 2)
        out = v1.unionAll(v2).orderBy("version", "o_orderstatus")
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


S34_TTRAVEL_SQL = """
SELECT 1 AS version, o_orderstatus, COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM orders GROUP BY o_orderstatus
UNION ALL
SELECT 2 AS version, o_orderstatus, COUNT(*) AS n,
       CAST(SUM(CAST(CASE WHEN o_orderstatus = 'F'
                          THEN o_totalprice * 2.0
                          ELSE o_totalprice END AS DECIMAL(18,2)))
            AS DOUBLE) AS sum_price
FROM orders GROUP BY o_orderstatus
ORDER BY version, o_orderstatus
"""


# ---------------------------------------------------------------------------
# s35_manifest_stats_pruning — manifest min/max file stats + measured skipping
# ---------------------------------------------------------------------------

_S35_BUCKETS = 8


def s35_manifest_stats_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest FILE-STATS pruning (sources/manifest.py — the second
    half of the table-format trick s34 left unproven): orders is laid
    out as one file per o_orderkey range bucket, the commit harvests
    per-file min/max from the parquet FOOTERS (distributed metadata
    pass, no data rows read), and ``read_snapshot_pruned`` plans a
    ``o_orderkey <= K div 2`` scan over ONLY the files whose [min, max]
    can intersect — the measured files_read/files_pruned counters are
    part of the oracle-checked output, so a reader that silently stops
    skipping fails the value gate (the s15_zorder_layout discipline).

    The bucket rule is exact integer arithmetic — width = greatest(1,
    (K+1) div 8), bucket = least(7, key div width) — so DuckDB
    recomputes the expected file census from the rows alone. At 100 TB
    the pruning decision stays ONE manifest read; no directory listing
    and no footer fetches at query time."""
    import shutil
    import tempfile

    from ..sources.manifest import (
        collect_file_stats,
        commit_snapshot,
        list_data_files,
        read_snapshot_pruned,
    )

    scratch = tempfile.mkdtemp(prefix="bigdata_spark_mstats_")
    try:
        o = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_totalprice"
        )
        k = o.agg(F.max("o_orderkey")).first()[0]  # scalar — bounded
        width = max(1, (int(k) + 1) // _S35_BUCKETS)
        x = int(k) // 2
        base = os.path.join(scratch, "table")
        (
            o.withColumn(
                "_b",
                F.least(
                    F.lit(_S35_BUCKETS - 1), F.expr(f"o_orderkey div {width}L")
                ).cast("int"),
            )
            .repartition("_b")
            .write.partitionBy("_b")
            .mode("overwrite")
            .parquet(base)
        )
        files = list_data_files(base)
        stats = collect_file_stats(spark, files, ["o_orderkey"])
        commit_snapshot(base, 1, files, stats=stats)
        pruned, n_total, n_read = read_snapshot_pruned(
            spark, base, 1, "o_orderkey", hi=x
        )
        agg = (
            pruned.filter(F.col("o_orderkey") <= x)
            .agg(
                F.count("*").alias("n_rows"),
                F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                .cast("double")
                .alias("sum_price"),
            )
            .select(
                F.lit(n_total).cast("long").alias("files_total"),
                F.lit(n_read).cast("long").alias("files_read"),
                F.lit(n_total - n_read).cast("long").alias("files_pruned"),
                "n_rows",
                "sum_price",
            )
        )
        return agg.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


S35_MSTATS_SQL = f"""
WITH k AS (SELECT MAX(o_orderkey) AS k FROM orders),
w AS (SELECT GREATEST(1, (k + 1) // {_S35_BUCKETS}) AS width, k // 2 AS x FROM k),
b AS (
  SELECT LEAST({_S35_BUCKETS - 1}, o_orderkey // width) AS bucket,
         o_orderkey, o_totalprice
  FROM orders, w
),
census AS (SELECT bucket, MIN(o_orderkey) AS mn FROM b GROUP BY 1)
SELECT
  (SELECT CAST(COUNT(*) AS BIGINT) FROM census) AS files_total,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM census, w WHERE mn <= x) AS files_read,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM census, w WHERE mn > x) AS files_pruned,
  (SELECT COUNT(*) FROM b, w WHERE o_orderkey <= x) AS n_rows,
  (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
   FROM b, w WHERE o_orderkey <= x) AS sum_price
"""


# ---------------------------------------------------------------------------
# s36_manifest_compaction — small-file compaction as a manifest swap
# ---------------------------------------------------------------------------

_S36_SMALL, _S36_COMPACT = 64, 4


def s36_manifest_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file COMPACTION under snapshot isolation (the maintenance
    job every streaming-ingest table needs: micro-batch commits leave
    64 shard files; a background rewrite folds them into 4) — realized
    as a pure MANIFEST SWAP: v2 lists the compacted files, v1 keeps
    listing the originals, both stay readable, nothing is rewritten in
    place and readers never see a half-compacted state. The output
    carries the per-version file census AND the rollup from each
    snapshot — identical values at both versions proves the compaction
    was lossless, and the file counts prove it actually compacted.

    Scale: the rewrite is one repartition pass over the snapshot (the
    only data-proportional step — exactly what the real maintenance
    job costs); the commit is one JSON rename."""
    import shutil
    import tempfile

    from ..sources.manifest import (
        commit_snapshot,
        list_data_files,
        read_snapshot,
        snapshot_files,
    )

    scratch = tempfile.mkdtemp(prefix="bigdata_spark_compact_")
    try:
        o = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_totalprice"
        )
        base = os.path.join(scratch, "table")
        o.repartition(_S36_SMALL).write.mode("overwrite").parquet(base)
        v1_files = list_data_files(base)
        commit_snapshot(base, 1, v1_files)

        compact_dir = os.path.join(base, "compact-v2")
        read_snapshot(spark, base, 1).repartition(_S36_COMPACT).write.mode(
            "overwrite"
        ).parquet(compact_dir)
        v2_files = [
            f for f in list_data_files(compact_dir)
        ]
        commit_snapshot(base, 2, v2_files)

        def _roll(version: int) -> DataFrame:
            n_files = len(snapshot_files(base, version))
            return read_snapshot(spark, base, version).agg(
                F.lit(version).alias("version"),
                F.lit(n_files).cast("long").alias("n_files"),
                F.count("*").alias("n_rows"),
                F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                .cast("double")
                .alias("sum_price"),
            )
        out = _roll(1).unionAll(_roll(2)).orderBy("version")
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


S36_COMPACT_SQL = f"""
SELECT v AS version,
       CAST(CASE WHEN v = 1 THEN {_S36_SMALL} ELSE {_S36_COMPACT} END
            AS BIGINT) AS n_files,
       (SELECT COUNT(*) FROM orders) AS n_rows,
       (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        FROM orders) AS sum_price
FROM (VALUES (1), (2)) t(v)
ORDER BY v
"""


# ---------------------------------------------------------------------------
# s37_incremental_mv — incremental materialized-view maintenance
# ---------------------------------------------------------------------------

_S37_BUCKETS = 8


def s37_incremental_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental MATERIALIZED-VIEW maintenance over manifest
    snapshots — the append-only refresh loop every warehouse MV /
    Delta-style aggregate table runs: orders lands in three commits
    (v1 = 4 key-range files, v2 = +2, v3 = +2); the MV (order count +
    exact revenue cents by priority) is built ONCE over v1, then each
    refresh scans ONLY the delta files (set difference of two manifest
    file lists — pure metadata, no directory diffing) and folds the
    delta's partial aggregates into the stored MV by a group-key merge.
    COUNT/SUM are self-mergeable, so the refresh never rescans history.

    The measured counters are part of the oracle-checked output:
    files_total (8), files_initial_scan (4), files_incremental_scanned
    (4 across both refreshes) — a refresh that silently rescans
    history fails the value gate, the s35 files-pruned discipline.

    Scale: each refresh costs O(delta) scan + a MV-grain merge
    (priority grain here; date×dim grain in production — bounded
    either way); the stored MV re-materializes per refresh via an
    eager localCheckpoint exactly as a real MV table would persist.
    Deletes/updates are out of scope by design — they need partition
    recompute or retractable aggregates (the s23_merge_into path).

    Reference parity: extends the reference's snapshot/model
    persistence intent (code/src/model_manager) to derived-table
    maintenance; no reference analog (SURVEY §2.9 extension)."""
    import re
    import shutil
    import tempfile

    from ..sources.manifest import (
        commit_snapshot,
        list_data_files,
        snapshot_files,
    )

    scratch = tempfile.mkdtemp(prefix="bigdata_spark_imv_")
    try:
        o = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderpriority", "o_totalprice"
        )
        k = int(o.agg(F.max("o_orderkey")).first()[0])  # scalar — bounded
        width = max(1, (k + 1) // _S37_BUCKETS)
        base = os.path.join(scratch, "table")
        (
            o.withColumn(
                "_b",
                F.least(
                    F.lit(_S37_BUCKETS - 1),
                    F.expr(f"o_orderkey div {width}L"),
                ).cast("int"),
            )
            .repartition("_b")
            .write.partitionBy("_b")
            .mode("overwrite")
            .parquet(base)
        )
        files = list_data_files(base)

        def bucket_of(path: str) -> int:
            return int(re.search(r"_b=(\d+)", path).group(1))

        commit_snapshot(base, 1, [f for f in files if bucket_of(f) <= 3])
        commit_snapshot(base, 2, [f for f in files if bucket_of(f) <= 5])
        commit_snapshot(base, 3, files)

        cents = F.expr(
            "CAST(FLOOR(o_totalprice * CAST(100 AS DOUBLE)"
            " + CAST(0.5 AS DOUBLE)) AS BIGINT)"
        )

        def partial(df: DataFrame) -> DataFrame:
            return df.groupBy("o_orderpriority").agg(
                F.count("*").alias("n_orders"),
                F.sum(cents).alias("revenue_cents"),
            )

        def read_files(fs: list[str]) -> DataFrame:
            return spark.read.option("basePath", base).parquet(*fs)

        prev = snapshot_files(base, 1)
        # initial build — the only full scan the MV ever pays
        mv = partial(read_files(prev)).localCheckpoint(eager=True)
        scanned = 0
        for v in (2, 3):
            cur = snapshot_files(base, v)
            delta = sorted(set(cur) - set(prev))
            scanned += len(delta)
            mv = (
                mv.unionByName(partial(read_files(delta)))
                .groupBy("o_orderpriority")
                .agg(
                    F.sum("n_orders").alias("n_orders"),
                    F.sum("revenue_cents").alias("revenue_cents"),
                )
                .localCheckpoint(eager=True)  # MV persisted per refresh
            )
            prev = cur
        counters = spark.createDataFrame(
            [(len(files), len(snapshot_files(base, 1)), scanned)],
            "files_total long, files_initial_scan long,"
            " files_incremental_scanned long",
        )
        return (
            mv.crossJoin(F.broadcast(counters))
            .select(
                "o_orderpriority",
                "n_orders",
                F.col("revenue_cents").cast("long").alias("revenue_cents"),
                "files_total",
                "files_initial_scan",
                "files_incremental_scanned",
            )
            .orderBy("o_orderpriority")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


S37_IMV_SQL = f"""
WITH k AS (SELECT MAX(o_orderkey) AS k FROM orders),
w AS (SELECT GREATEST(1, (k + 1) // {_S37_BUCKETS}) AS width FROM k),
b AS (
  SELECT LEAST({_S37_BUCKETS - 1}, o_orderkey // width) AS bucket,
         o_orderpriority,
         CAST(FLOOR(o_totalprice * CAST(100 AS DOUBLE)
              + CAST(0.5 AS DOUBLE)) AS BIGINT) AS cents
  FROM orders, w
),
census AS (
  SELECT CAST(COUNT(DISTINCT bucket) AS BIGINT) AS files_total,
         CAST(COUNT(DISTINCT CASE WHEN bucket <= 3 THEN bucket END)
              AS BIGINT) AS files_initial_scan,
         CAST(COUNT(DISTINCT CASE WHEN bucket >= 4 THEN bucket END)
              AS BIGINT) AS files_incremental_scanned
  FROM b
)
SELECT o_orderpriority, COUNT(*) AS n_orders,
       CAST(SUM(cents) AS BIGINT) AS revenue_cents,
       files_total, files_initial_scan, files_incremental_scanned
FROM b, census
GROUP BY o_orderpriority, files_total, files_initial_scan,
         files_incremental_scanned
ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# s38_mv_retraction — MV maintenance under UPDATE/DELETE via signed partials
# ---------------------------------------------------------------------------


def s38_mv_retraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-view maintenance under UPDATES and DELETES — the
    half s37_incremental_mv declares out of scope: a v2 commit REWRITES
    one key-range file (bucket 2, prices doubled) and DROPS another
    (bucket 5); the refresh diffs the two manifest file lists (pure
    metadata), scans ONLY the three changed files, and folds them into
    the stored MV as SIGNED partial aggregates — removed files
    contribute (−n, −cents), added files (+n, +cents); COUNT and SUM
    are retractable, so MV − old + new is exact and groups whose
    support hits zero drop out (HAVING n > 0). This is the
    Delta/Iceberg CDF refresh loop: history is never rescanned even
    when it is edited, because immutable files make every change an
    explicit (removed, added) file pair.

    Measured counters in the oracle-checked output: files_total_v2 (7),
    files_delta_scanned (3 = 2 removed + 1 added) — a refresh that
    silently recomputes fails the value gate.

    Scale: O(changed files) scan + a view-grain merge per refresh; the
    manifest diff is one JSON read per side. Min/max-style aggregates
    are NOT retractable — those need partition recompute, which the
    same (removed, added) diff scopes to the touched partitions."""
    import re
    import shutil
    import tempfile

    from ..sources.manifest import (
        commit_snapshot,
        list_data_files,
        snapshot_files,
    )

    scratch = tempfile.mkdtemp(prefix="bigdata_spark_mvr_")
    try:
        o = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderpriority", "o_totalprice"
        )
        k = int(o.agg(F.max("o_orderkey")).first()[0])  # scalar — bounded
        width = max(1, (k + 1) // _S37_BUCKETS)
        bucket = F.least(
            F.lit(_S37_BUCKETS - 1), F.expr(f"o_orderkey div {width}L")
        ).cast("int")
        base = os.path.join(scratch, "table")
        (
            o.withColumn("_b", bucket)
            .repartition("_b")
            .write.partitionBy("_b")
            .mode("overwrite")
            .parquet(base)
        )
        v1_files = list_data_files(base)
        commit_snapshot(base, 1, v1_files)

        def bucket_of(path: str) -> int:
            return int(re.search(r"_b=(\d+)", path).group(1))

        # v2: bucket 2 rewritten (prices doubled) into a NEW immutable
        # file; bucket 5 deleted outright. v1's files stay on disk.
        patch_dir = os.path.join(scratch, "staged_v2")
        (
            o.withColumn("_b", bucket)
            .filter(F.col("_b") == 2)
            .withColumn("o_totalprice", F.col("o_totalprice") * 2.0)
            .repartition("_b")
            .write.partitionBy("_b")
            .mode("overwrite")
            .parquet(patch_dir)
        )
        added = []
        for src in list_data_files(patch_dir):
            rel = os.path.relpath(src, patch_dir)
            dst = os.path.join(
                base, os.path.dirname(rel), "v2-" + os.path.basename(rel)
            )
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            shutil.move(src, dst)
            added.append(dst)
        keep = [f for f in v1_files if bucket_of(f) not in (2, 5)]
        commit_snapshot(base, 2, keep + added)

        cents = F.expr(
            "CAST(FLOOR(o_totalprice * CAST(100 AS DOUBLE)"
            " + CAST(0.5 AS DOUBLE)) AS BIGINT)"
        )

        def signed_partial(files: list[str], sign: int) -> DataFrame:
            return (
                spark.read.option("basePath", base)
                .parquet(*files)
                .groupBy("o_orderpriority")
                .agg(
                    (F.lit(sign) * F.count("*")).alias("n_orders"),
                    (F.lit(sign) * F.sum(cents)).alias("revenue_cents"),
                )
            )

        mv1 = signed_partial(snapshot_files(base, 1), 1).localCheckpoint(
            eager=True
        )
        v1s, v2s = set(snapshot_files(base, 1)), set(snapshot_files(base, 2))
        removed = sorted(v1s - v2s)
        new = sorted(v2s - v1s)
        mv2 = (
            mv1.unionByName(signed_partial(removed, -1))
            .unionByName(signed_partial(new, 1))
            .groupBy("o_orderpriority")
            .agg(
                F.sum("n_orders").alias("n_orders"),
                F.sum("revenue_cents").alias("revenue_cents"),
            )
            .filter(F.col("n_orders") > 0)
            .localCheckpoint(eager=True)  # the refreshed stored MV
        )
        counters = spark.createDataFrame(
            [(len(v2s), len(removed) + len(new))],
            "files_total_v2 long, files_delta_scanned long",
        )
        return (
            mv2.crossJoin(F.broadcast(counters))
            .select(
                "o_orderpriority",
                "n_orders",
                F.col("revenue_cents").cast("long").alias("revenue_cents"),
                "files_total_v2",
                "files_delta_scanned",
            )
            .orderBy("o_orderpriority")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


S38_MVR_SQL = f"""
WITH k AS (SELECT MAX(o_orderkey) AS k FROM orders),
w AS (SELECT GREATEST(1, (k + 1) // {_S37_BUCKETS}) AS width FROM k),
b AS (
  SELECT LEAST({_S37_BUCKETS - 1}, o_orderkey // width) AS bucket,
         o_orderpriority, o_totalprice
  FROM orders, w
),
v2 AS (
  SELECT o_orderpriority,
         CAST(FLOOR(CASE WHEN bucket = 2 THEN o_totalprice * 2.0
                         ELSE o_totalprice END * CAST(100 AS DOUBLE)
              + CAST(0.5 AS DOUBLE)) AS BIGINT) AS cents
  FROM b WHERE bucket <> 5
),
census AS (
  SELECT CAST(COUNT(DISTINCT bucket) - 1 AS BIGINT) AS files_total_v2,
         CAST(COUNT(DISTINCT CASE WHEN bucket IN (2, 5) THEN bucket END)
              + COUNT(DISTINCT CASE WHEN bucket = 2 THEN bucket END)
              AS BIGINT) AS files_delta_scanned
  FROM b
)
SELECT o_orderpriority, COUNT(*) AS n_orders,
       CAST(SUM(cents) AS BIGINT) AS revenue_cents,
       files_total_v2, files_delta_scanned
FROM v2, census
GROUP BY o_orderpriority, files_total_v2, files_delta_scanned
HAVING COUNT(*) > 0
ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# s39_change_data_feed — row-level CDC between two manifest snapshots
# ---------------------------------------------------------------------------


def s39_change_data_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level CHANGE DATA FEED between two snapshots — the consumer
    side of the s38 commit (bucket 2 rewritten with doubled prices,
    bucket 5 deleted): the manifest diff names the (removed, added)
    files, and a keyed FULL OUTER join over ONLY those files classifies
    every changed row — key in both sides → an update (pre/post pair),
    key only in removed → delete, key only in added → insert. This is
    Delta CDF / Iceberg changelog semantics derived from nothing but
    immutable files + manifests: history files never open, so the feed
    costs O(changed files) no matter how big the table is.

    Output is the per-priority change census (update_pre and
    update_post carried as separate change types, the CDF convention)
    plus the exact revenue-cents delta each type contributes — the
    numbers a downstream incremental consumer (s38's signed-partial
    refresh) would apply verbatim.

    Scale: two file-list reads, one join keyed on the primary key over
    the changed rows only; at 100 TB with a 0.1% daily churn the feed
    reads ~0.1% of the table."""
    import re
    import shutil
    import tempfile

    from ..sources.manifest import (
        commit_snapshot,
        list_data_files,
        snapshot_files,
    )

    scratch = tempfile.mkdtemp(prefix="bigdata_spark_cdf_")
    try:
        o = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderpriority", "o_totalprice"
        )
        k = int(o.agg(F.max("o_orderkey")).first()[0])  # scalar — bounded
        width = max(1, (k + 1) // _S37_BUCKETS)
        bucket = F.least(
            F.lit(_S37_BUCKETS - 1), F.expr(f"o_orderkey div {width}L")
        ).cast("int")
        base = os.path.join(scratch, "table")
        (
            o.withColumn("_b", bucket)
            .repartition("_b")
            .write.partitionBy("_b")
            .mode("overwrite")
            .parquet(base)
        )
        v1_files = list_data_files(base)
        commit_snapshot(base, 1, v1_files)

        def bucket_of(path: str) -> int:
            return int(re.search(r"_b=(\d+)", path).group(1))

        patch_dir = os.path.join(scratch, "staged_v2")
        (
            o.withColumn("_b", bucket)
            .filter(F.col("_b") == 2)
            .withColumn("o_totalprice", F.col("o_totalprice") * 2.0)
            .repartition("_b")
            .write.partitionBy("_b")
            .mode("overwrite")
            .parquet(patch_dir)
        )
        added = []
        for src in list_data_files(patch_dir):
            rel = os.path.relpath(src, patch_dir)
            dst = os.path.join(
                base, os.path.dirname(rel), "v2-" + os.path.basename(rel)
            )
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            shutil.move(src, dst)
            added.append(dst)
        keep = [f for f in v1_files if bucket_of(f) not in (2, 5)]
        commit_snapshot(base, 2, keep + added)

        v1s, v2s = set(snapshot_files(base, 1)), set(snapshot_files(base, 2))
        cents = (
            "CAST(FLOOR(o_totalprice * CAST(100 AS DOUBLE)"
            " + CAST(0.5 AS DOUBLE)) AS BIGINT)"
        )

        def side(files: set, pre: str) -> DataFrame:
            return (
                spark.read.option("basePath", base)
                .parquet(*sorted(files))
                .selectExpr(
                    f"o_orderkey AS {pre}_key",
                    f"o_orderpriority AS {pre}_prio",
                    f"{cents} AS {pre}_cents",
                )
            )

        pre = side(v1s - v2s, "pre")
        post = side(v2s - v1s, "post")
        changes = pre.join(
            post, pre.pre_key == post.post_key, "full_outer"
        ).selectExpr(
            "CASE WHEN pre_key IS NULL THEN array('insert')"
            " WHEN post_key IS NULL THEN array('delete')"
            " ELSE array('update_pre', 'update_post') END AS kinds",
            "coalesce(pre_prio, post_prio) AS o_orderpriority",
            "pre_cents",
            "post_cents",
        )
        feed = changes.select(
            F.explode("kinds").alias("change_type"),
            "o_orderpriority",
            "pre_cents",
            "post_cents",
        ).select(
            "change_type",
            "o_orderpriority",
            F.expr(
                "CASE WHEN change_type IN ('delete', 'update_pre')"
                " THEN -pre_cents ELSE post_cents END"
            ).alias("delta_cents"),
        )
        return (
            feed.groupBy("change_type", "o_orderpriority")
            .agg(
                F.count("*").alias("n_rows"),
                F.sum("delta_cents").cast("long").alias("delta_cents"),
            )
            .orderBy("change_type", "o_orderpriority")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


S39_CDF_SQL = f"""
WITH k AS (SELECT MAX(o_orderkey) AS k FROM orders),
w AS (SELECT GREATEST(1, (k + 1) // {_S37_BUCKETS}) AS width FROM k),
b AS (
  SELECT LEAST({_S37_BUCKETS - 1}, o_orderkey // width) AS bucket,
         o_orderpriority,
         CAST(FLOOR(o_totalprice * CAST(100 AS DOUBLE)
              + CAST(0.5 AS DOUBLE)) AS BIGINT) AS cents,
         CAST(FLOOR(o_totalprice * 2.0 * CAST(100 AS DOUBLE)
              + CAST(0.5 AS DOUBLE)) AS BIGINT) AS cents2
  FROM orders, w
),
feed AS (
  SELECT 'delete' AS change_type, o_orderpriority, -cents AS delta_cents
  FROM b WHERE bucket = 5
  UNION ALL
  SELECT 'update_pre', o_orderpriority, -cents FROM b WHERE bucket = 2
  UNION ALL
  SELECT 'update_post', o_orderpriority, cents2 FROM b WHERE bucket = 2
)
SELECT change_type, o_orderpriority, COUNT(*) AS n_rows,
       CAST(SUM(delta_cents) AS BIGINT) AS delta_cents
FROM feed
GROUP BY 1, 2
ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# s40_schema_evolution — additive column evolution across snapshots
# ---------------------------------------------------------------------------


def s40_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive SCHEMA EVOLUTION under snapshot isolation — the table
    grows a column without rewriting history: v1 files carry
    (key, priority, price); a v2 commit appends NEW files that also
    carry ``o_channel``; reading @v2 with schema merging surfaces the
    new column with NULL for every legacy row (exactly Delta/Iceberg
    add-column semantics), while @v1 still has no such column at all —
    both facts are part of the oracle-checked output
    (v1_has_channel = false, v2_has_channel = true alongside the
    per-channel census where NULL is the legacy population).

    The channel is a deterministic key derivation (o_orderkey % 3 over
    the appended key range), so DuckDB recomputes the census from rows
    alone. Scale: evolution costs ZERO data movement — old files are
    never touched; the only price is the footer-schema merge at plan
    time, which the manifest bounds to the listed files."""
    import re
    import shutil
    import tempfile

    from ..sources.manifest import (
        commit_snapshot,
        list_data_files,
        snapshot_files,
    )

    scratch = tempfile.mkdtemp(prefix="bigdata_spark_sev_")
    try:
        o = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderpriority", "o_totalprice"
        )
        k = int(o.agg(F.max("o_orderkey")).first()[0])  # scalar — bounded
        width = max(1, (k + 1) // _S37_BUCKETS)
        bucket = F.least(
            F.lit(_S37_BUCKETS - 1), F.expr(f"o_orderkey div {width}L")
        ).cast("int")
        base = os.path.join(scratch, "table")
        (
            o.withColumn("_b", bucket)
            .filter(F.col("_b") <= 5)
            .repartition("_b")
            .write.partitionBy("_b")
            .mode("overwrite")
            .parquet(base)
        )
        v1_files = list_data_files(base)
        commit_snapshot(base, 1, v1_files)

        # v2 appends the 6..7 key range as NEW files that carry the new
        # o_channel column; v1 files are never rewritten
        patch_dir = os.path.join(scratch, "staged_v2")
        (
            o.withColumn("_b", bucket)
            .filter(F.col("_b") >= 6)
            .withColumn(
                "o_channel",
                F.expr(
                    "CASE o_orderkey % 3 WHEN 0 THEN 'web'"
                    " WHEN 1 THEN 'store' ELSE 'app' END"
                ),
            )
            .repartition("_b")
            .write.partitionBy("_b")
            .mode("overwrite")
            .parquet(patch_dir)
        )
        added = []
        for src in list_data_files(patch_dir):
            rel = os.path.relpath(src, patch_dir)
            dst = os.path.join(
                base, os.path.dirname(rel), "v2-" + os.path.basename(rel)
            )
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            shutil.move(src, dst)
            added.append(dst)
        commit_snapshot(base, 2, v1_files + added)

        v1df = spark.read.option("basePath", base).parquet(
            *snapshot_files(base, 1)
        )
        v2df = (
            spark.read.option("mergeSchema", "true")
            .option("basePath", base)
            .parquet(*snapshot_files(base, 2))
        )
        cents = F.expr(
            "CAST(FLOOR(o_totalprice * CAST(100 AS DOUBLE)"
            " + CAST(0.5 AS DOUBLE)) AS BIGINT)"
        )
        return (
            v2df.groupBy("o_channel")
            .agg(
                F.count("*").alias("n_orders"),
                F.sum(cents).cast("long").alias("revenue_cents"),
            )
            .select(
                "o_channel",
                "n_orders",
                "revenue_cents",
                F.lit("o_channel" in v1df.columns).alias("v1_has_channel"),
                F.lit("o_channel" in v2df.columns).alias("v2_has_channel"),
            )
            .orderBy(F.col("o_channel").asc_nulls_first())
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


S40_SEV_SQL = f"""
WITH k AS (SELECT MAX(o_orderkey) AS k FROM orders),
w AS (SELECT GREATEST(1, (k + 1) // {_S37_BUCKETS}) AS width FROM k),
b AS (
  SELECT LEAST({_S37_BUCKETS - 1}, o_orderkey // width) AS bucket,
         o_orderkey,
         CAST(FLOOR(o_totalprice * CAST(100 AS DOUBLE)
              + CAST(0.5 AS DOUBLE)) AS BIGINT) AS cents
  FROM orders, w
),
v2 AS (
  SELECT CASE WHEN bucket <= 5 THEN NULL
              WHEN o_orderkey % 3 = 0 THEN 'web'
              WHEN o_orderkey % 3 = 1 THEN 'store'
              ELSE 'app' END AS o_channel,
         cents
  FROM b
)
SELECT o_channel, COUNT(*) AS n_orders,
       CAST(SUM(cents) AS BIGINT) AS revenue_cents,
       false AS v1_has_channel, true AS v2_has_channel
FROM v2
GROUP BY o_channel
ORDER BY o_channel NULLS FIRST
"""


# ---------------------------------------------------------------------------
# s41_metadata_only_count — COUNT answered from manifest stats alone
# ---------------------------------------------------------------------------


def s41_metadata_only_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """METADATA-ONLY aggregation — the table-format fast path every
    Iceberg/Delta reader ships: ``COUNT(*)`` (global and per key-range
    file, plus a min/max key envelope) answered ENTIRELY from the
    manifest's per-file footer stats; zero data files open at query
    time, and the output says so (data_files_opened = 0 is part of the
    oracle-checked row). The stats were harvested once at commit time
    by the distributed footer pass (sources/manifest.py
    collect_file_stats — no data pages read even then).

    The oracle recomputes the same counts and envelopes from the raw
    rows with the identical bucket rule, so a manifest that miscounts
    or misrecords min/max fails the value gate.

    Scale: at 100 TB this is the difference between a row-count probe
    costing one JSON read and costing a full scan; it is also why
    manifest stats must be transactionally committed WITH the files
    (s34's atomic rename) — stale stats would silently lie here."""
    import json as _json
    import re
    import shutil
    import tempfile

    from ..sources.manifest import (
        _manifest_dir,
        collect_file_stats,
        commit_snapshot,
        list_data_files,
    )

    scratch = tempfile.mkdtemp(prefix="bigdata_spark_moc_")
    try:
        o = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_totalprice"
        )
        k = int(o.agg(F.max("o_orderkey")).first()[0])  # scalar — bounded
        width = max(1, (k + 1) // _S37_BUCKETS)
        base = os.path.join(scratch, "table")
        (
            o.withColumn(
                "_b",
                F.least(
                    F.lit(_S37_BUCKETS - 1),
                    F.expr(f"o_orderkey div {width}L"),
                ).cast("int"),
            )
            .repartition("_b")
            .write.partitionBy("_b")
            .mode("overwrite")
            .parquet(base)
        )
        files = list_data_files(base)
        stats = collect_file_stats(spark, files, ["o_orderkey"])
        commit_snapshot(base, 1, files, stats=stats)

        # the query itself: ONE manifest read, no parquet opened
        with open(os.path.join(_manifest_dir(base), "v1.json")) as fh:
            manifest = _json.load(fh)
        rows = [
            (
                int(re.search(r"_b=(\d+)", rel).group(1)),
                int(manifest["stats"][rel]["rows"]),
                int(manifest["stats"][rel]["cols"]["o_orderkey"][0]),
                int(manifest["stats"][rel]["cols"]["o_orderkey"][1]),
            )
            for rel in manifest["files"]
        ]
        per_file = spark.createDataFrame(
            rows, "bucket int, n_rows long, min_key long, max_key long"
        )
        return (
            per_file.groupBy("bucket")
            .agg(
                F.sum("n_rows").alias("n_rows"),
                F.min("min_key").alias("min_key"),
                F.max("max_key").alias("max_key"),
            )
            .crossJoin(
                F.broadcast(
                    per_file.agg(
                        F.sum("n_rows").alias("total_rows"),
                        F.lit(0).cast("long").alias("data_files_opened"),
                    )
                )
            )
            .orderBy("bucket")
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


S41_MOC_SQL = f"""
WITH k AS (SELECT MAX(o_orderkey) AS k FROM orders),
w AS (SELECT GREATEST(1, (k + 1) // {_S37_BUCKETS}) AS width FROM k),
b AS (
  SELECT LEAST({_S37_BUCKETS - 1}, o_orderkey // width) AS bucket, o_orderkey
  FROM orders, w
)
SELECT CAST(bucket AS INT) AS bucket, COUNT(*) AS n_rows,
       MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key,
       (SELECT COUNT(*) FROM orders) AS total_rows,
       CAST(0 AS BIGINT) AS data_files_opened
FROM b
GROUP BY bucket
ORDER BY bucket
"""


# ---------------------------------------------------------------------------
# opt_join_order_cost — cost-modeled join-order selection audit
# ---------------------------------------------------------------------------


def opt_join_order_cost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cost-based join-order selection made AUDITABLE: the classic
    System-R estimate |R ⋈ S| = |R|·|S| / max(ndv_R(k), ndv_S(k)) is
    computed from EXACT distributed statistics (filtered cardinalities
    and key NDVs — one aggregate pass per table), every connected
    left-deep order of the customer ⋈ orders ⋈ lineitem chain is
    costed by its intermediate size, and the output ranks the orders
    with the winner flagged plus the MEASURED final row count. This is
    the join-reordering decision Catalyst/CBO makes internally,
    externalized so a pipeline owner can see WHY an order wins and how
    far the estimate sits from reality.

    All cost arithmetic is exact integers (BIGINT products under a
    DECIMAL(38,0) guard, truncating division), so DuckDB reproduces
    the model bit-for-bit from the same COUNT/COUNT(DISTINCT)
    statistics. The join graph c—o—l is a chain: the two connected
    first joins are {c ⋈ o} (then l) and {o ⋈ l} (then c); orders
    starting with the cross pair c×l are pruned as every real
    enumerator does.

    Scale: the stats pass is three map-side-combinable aggregations
    (COUNT + exact NDV per join key — at 100 TB you would swap
    approx_count_distinct in with the same plumbing); the enumeration
    itself is scalar arithmetic over the one-row stats crossJoin —
    the whole query is ONE Spark plan (stats aggs + measured join
    count + cost model + stack to ranked rows), no driver loops. The
    measured count runs the join once (dims broadcast by AQE)."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.to_timestamp(F.lit("1997-01-01"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    cs = c.agg(
        F.count("*").alias("n_c"),
        F.countDistinct("c_custkey").alias("ndv_c_custkey"),
    )
    os_ = o.agg(
        F.count("*").alias("n_o"),
        F.countDistinct("o_custkey").alias("ndv_o_custkey"),
        F.countDistinct("o_orderkey").alias("ndv_o_orderkey"),
    )
    ls = l.agg(
        F.count("*").alias("n_l"),
        F.countDistinct("l_orderkey").alias("ndv_l_orderkey"),
    )
    act = (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, F.col("o_orderkey") == F.col("l_orderkey"))
        .agg(F.count("*").alias("actual"))
    )
    est = (
        cs.crossJoin(os_)
        .crossJoin(ls)
        .crossJoin(act)
        .selectExpr(
            "CAST(CAST(n_c AS DECIMAL(38,0)) * n_o"
            " div GREATEST(ndv_c_custkey, ndv_o_custkey, 1L)"
            " AS BIGINT) AS est_co",
            "CAST(CAST(n_o AS DECIMAL(38,0)) * n_l"
            " div GREATEST(ndv_o_orderkey, ndv_l_orderkey, 1L)"
            " AS BIGINT) AS est_ol",
            "actual",
        )
    )
    return est.selectExpr(
        "stack(2,"
        " '(customer JOIN orders) JOIN lineitem', est_co, est_co <= est_ol,"
        " '(orders JOIN lineitem) JOIN customer', est_ol, est_ol <= est_co"
        ") AS (join_order, est_intermediate_rows, chosen)",
        "actual AS actual_final_rows",
    ).orderBy("est_intermediate_rows", "join_order")


def opt_join_order_cost_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCALE shape of opt_join_order_cost: the same System-R
    cost model fed by ``approx_count_distinct`` (HyperLogLog++, 5%
    default rsd) instead of exact COUNT(DISTINCT) — the swap the exact
    entry's docstring promises for 100 TB, pinned here as its own
    gated entry. An exact NDV pass soaked 6.5× at sf1 because
    COUNT(DISTINCT key) shuffles every distinct key; the HLL sketch
    partial-aggregates map-side into a constant-size buffer, so the
    stats pass costs one scan regardless of key cardinality.

    The oracle contract is DECISION INVARIANCE, not sketch equality
    (two engines' HLL implementations differ): the entry outputs the
    CHOSEN join order and the measured final row count, and the
    oracle recomputes the winner from EXACT statistics — on this
    chain the two intermediate estimates differ by ~40× (filtered
    customer⋈orders vs full orders⋈lineitem ≈ |lineitem|), so a 5%
    NDV error cannot flip the argmin; if it ever did, that is
    precisely the regression the gate should catch. One Spark plan,
    no driver loops; the measured join runs once (dims by AQE)."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.to_timestamp(F.lit("1997-01-01"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    cs = c.agg(
        F.count("*").alias("n_c"),
        F.approx_count_distinct("c_custkey").alias("ndv_c_custkey"),
    )
    os_ = o.agg(
        F.count("*").alias("n_o"),
        F.approx_count_distinct("o_custkey").alias("ndv_o_custkey"),
        F.approx_count_distinct("o_orderkey").alias("ndv_o_orderkey"),
    )
    ls = l.agg(
        F.count("*").alias("n_l"),
        F.approx_count_distinct("l_orderkey").alias("ndv_l_orderkey"),
    )
    act = (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, F.col("o_orderkey") == F.col("l_orderkey"))
        .agg(F.count("*").alias("actual"))
    )
    est = (
        cs.crossJoin(os_)
        .crossJoin(ls)
        .crossJoin(act)
        .selectExpr(
            "CAST(CAST(n_c AS DECIMAL(38,0)) * n_o"
            " div GREATEST(ndv_c_custkey, ndv_o_custkey, 1L)"
            " AS BIGINT) AS est_co",
            "CAST(CAST(n_o AS DECIMAL(38,0)) * n_l"
            " div GREATEST(ndv_o_orderkey, ndv_l_orderkey, 1L)"
            " AS BIGINT) AS est_ol",
            "actual",
        )
    )
    return est.selectExpr(
        "IF(est_co <= est_ol,"
        " '(customer JOIN orders) JOIN lineitem',"
        " '(orders JOIN lineitem) JOIN customer') AS chosen_join_order",
        "actual AS actual_final_rows",
    )


OPT_JOIN_ORDER_APPROX_SQL = """
SELECT CASE WHEN est_co <= est_ol
            THEN '(customer JOIN orders) JOIN lineitem'
            ELSE '(orders JOIN lineitem) JOIN customer' END
         AS chosen_join_order,
       CAST(act.actual AS BIGINT) AS actual_final_rows
FROM (
  SELECT
    CAST(CAST(cs.n AS HUGEINT) * os.n
         // GREATEST(cs.ndv_custkey, os.ndv_custkey, 1) AS BIGINT) AS est_co,
    CAST(CAST(os.n AS HUGEINT) * ls.n
         // GREATEST(os.ndv_orderkey, ls.ndv_orderkey, 1) AS BIGINT) AS est_ol
  FROM (SELECT COUNT(*) AS n, COUNT(DISTINCT c_custkey) AS ndv_custkey
        FROM customer WHERE c_mktsegment = 'BUILDING') cs,
       (SELECT COUNT(*) AS n, COUNT(DISTINCT o_custkey) AS ndv_custkey,
               COUNT(DISTINCT o_orderkey) AS ndv_orderkey
        FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01') os,
       (SELECT COUNT(*) AS n, COUNT(DISTINCT l_orderkey) AS ndv_orderkey
        FROM lineitem) ls
), (
  SELECT COUNT(*) AS actual FROM customer c
  JOIN orders o ON c.c_custkey = o.o_custkey
  JOIN lineitem l ON o.o_orderkey = l.l_orderkey
  WHERE c.c_mktsegment = 'BUILDING'
    AND o.o_orderdate < TIMESTAMP '1997-01-01'
) act
"""


OPT_JOIN_ORDER_SQL = """
WITH cs AS (
  SELECT COUNT(*) AS n, COUNT(DISTINCT c_custkey) AS ndv_custkey
  FROM customer WHERE c_mktsegment = 'BUILDING'
), os AS (
  SELECT COUNT(*) AS n, COUNT(DISTINCT o_custkey) AS ndv_custkey,
         COUNT(DISTINCT o_orderkey) AS ndv_orderkey
  FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01'
), ls AS (
  SELECT COUNT(*) AS n, COUNT(DISTINCT l_orderkey) AS ndv_orderkey
  FROM lineitem
), act AS (
  SELECT COUNT(*) AS actual FROM customer c
  JOIN orders o ON c.c_custkey = o.o_custkey
  JOIN lineitem l ON o.o_orderkey = l.l_orderkey
  WHERE c.c_mktsegment = 'BUILDING'
    AND o.o_orderdate < TIMESTAMP '1997-01-01'
), est AS (
  SELECT
    CAST(CAST(cs.n AS HUGEINT) * os.n
         // GREATEST(cs.ndv_custkey, os.ndv_custkey, 1) AS BIGINT) AS est_co,
    CAST(CAST(os.n AS HUGEINT) * ls.n
         // GREATEST(os.ndv_orderkey, ls.ndv_orderkey, 1) AS BIGINT) AS est_ol
  FROM cs, os, ls
)
SELECT join_order, est_intermediate_rows, chosen,
       CAST(actual AS BIGINT) AS actual_final_rows
FROM (
  SELECT '(customer JOIN orders) JOIN lineitem' AS join_order,
         est_co AS est_intermediate_rows,
         est_co <= est_ol AS chosen FROM est
  UNION ALL
  SELECT '(orders JOIN lineitem) JOIN customer' AS join_order,
         est_ol AS est_intermediate_rows,
         est_ol <= est_co AS chosen FROM est
), act
ORDER BY est_intermediate_rows, join_order
"""


# ---------------------------------------------------------------------------
# s42/s43 — row-level DELETE/UPDATE via deletion vectors (no file rewrite)
# ---------------------------------------------------------------------------

_DV_CENTS = (
    "CAST(FLOOR(o_totalprice * CAST(100 AS DOUBLE)"
    " + CAST(0.5 AS DOUBLE)) AS BIGINT)"
)
_DV_DELETE_PRED = "o_orderpriority = '1-URGENT' AND o_orderkey % 10 = 3"
_DV_UPDATE_PRED = "o_orderpriority = '2-HIGH' AND o_orderkey % 10 = 7"


def _stage_dv_table(spark: SparkSession, sf_dir: str, scratch: str):
    """Stage orders as a flat 8-file manifest table (v1 — deletion
    vectors are POSITIONAL, so no bucket/partition alignment is
    needed), then commit a MERGE as snapshot v2 WITHOUT rewriting any
    data file: rows hit by the DELETE predicate get (file_key, pos)
    entries in a parquet deletion-vector sidecar; rows hit by the
    UPDATE predicate get a DV entry for the OLD position plus their
    new image in ONE appended file (update = DV + append — the Delta
    deletion-vector commit shape). Returns
    (base, v1_files, appended_files, dv_files)."""
    import shutil

    from ..sources.manifest import (
        commit_snapshot,
        file_key_col,
        list_data_files,
    )

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    base = os.path.join(scratch, "table")
    o.repartition(_S37_BUCKETS).write.mode("overwrite").parquet(base)
    v1_files = list_data_files(base)
    commit_snapshot(base, 1, v1_files)

    v1 = spark.read.option("basePath", base).parquet(*v1_files)
    touched = F.expr(f"({_DV_DELETE_PRED}) OR ({_DV_UPDATE_PRED})")
    dv_dir = os.path.join(scratch, "dv_v2")
    (
        v1.filter(touched)
        .select(
            file_key_col(base).alias("file_key"),
            F.col("_metadata.row_index").alias("pos"),
        )
        # one sidecar file pins the gate's counters; DV volume is
        # per-COMMIT churn (bounded by the merge batch, not the
        # table) — a production writer splits by maxRecordsPerFile
        .repartition(1)
        .write.mode("overwrite")
        .parquet(dv_dir)
    )
    dv_files = []
    for i, src in enumerate(sorted(list_data_files(dv_dir))):
        dst = os.path.join(base, f"dv-v2-{i}-{os.path.basename(src)}")
        shutil.move(src, dst)
        dv_files.append(dst)
    app_dir = os.path.join(scratch, "staged_append")
    (
        v1.filter(F.expr(_DV_UPDATE_PRED))
        .select(
            "o_orderkey",
            "o_orderpriority",
            (F.col("o_totalprice") * F.lit(2.0)).alias("o_totalprice"),
        )
        # the appended update-image file is merge-batch-sized (churn,
        # not table); one file pins the v2 file-count counter
        .repartition(1)
        .write.mode("overwrite")
        .parquet(app_dir)
    )
    appended = []
    for i, src in enumerate(sorted(list_data_files(app_dir))):
        dst = os.path.join(base, f"v2a-{i}-{os.path.basename(src)}")
        shutil.move(src, dst)
        appended.append(dst)
    commit_snapshot(base, 2, v1_files + appended, delete_files=dv_files)
    return base, v1_files, appended, dv_files


def s42_deletion_vector_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level DELETE + UPDATE committed as DELETION VECTORS — the
    Delta-DV / Iceberg-positional-delete MERGE path that s38's
    copy-on-write entry deliberately avoids: the v2 commit REWRITES
    ZERO data files. Deleted rows (o_orderpriority 1-URGENT, key%10=3)
    and the old images of updated rows (2-HIGH, key%10=7, price
    doubled) become (file_key, row_index) pairs in a parquet sidecar —
    Spark's ``_metadata.row_index`` supplies the physical positions —
    and the new images land in one appended file; the manifest
    registers both. ``read_snapshot_with_deletes`` then serves v2 by
    anti-joining the DV onto position-annotated scans.

    Oracle contract: the per-priority census (row count + exact cents)
    of the DV-applied snapshot must equal the relational MERGE result
    computed by DuckDB directly from orders, and the counters pin the
    mechanism — n_files_rewritten is literally 0 (every v1 file is
    byte-identical in v2), one appended file, and the DV entry count
    equals the rows the two predicates touch.

    Scale: a MERGE touching p% of rows commits O(p) sidecar bytes
    instead of rewriting every hit file — at 100 TB with point deletes
    this is the difference between kilobytes and terabytes of write
    amplification; the read-side cost is one churn-sized anti join
    that AQE broadcasts in the common case."""
    import shutil
    import tempfile

    from ..sources.manifest import read_snapshot_with_deletes

    scratch = tempfile.mkdtemp(prefix="bigdata_spark_dv_")
    try:
        base, v1_files, appended, dv_files = _stage_dv_table(
            spark, sf_dir, scratch
        )
        dv_entries = spark.read.parquet(*dv_files).count()
        snap2 = read_snapshot_with_deletes(spark, base, 2)
        census = (
            snap2.groupBy("o_orderpriority")
            .agg(
                F.count("*").alias("n_rows"),
                F.sum(F.expr(_DV_CENTS)).cast("long").alias("revenue_cents"),
            )
            .select(
                "o_orderpriority",
                "n_rows",
                "revenue_cents",
                F.lit(dv_entries).cast("long").alias("n_dv_entries"),
                F.lit(len(v1_files)).cast("long").alias("n_files_v1"),
                F.lit(len(v1_files) + len(appended))
                .cast("long")
                .alias("n_files_v2"),
                F.lit(0).cast("long").alias("n_files_rewritten"),
            )
            .orderBy("o_orderpriority")
            .localCheckpoint(eager=True)
        )
        return census
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


S42_DV_SQL = f"""
WITH merged AS (
  SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
  WHERE NOT ({_DV_DELETE_PRED}) AND NOT ({_DV_UPDATE_PRED})
  UNION ALL
  SELECT o_orderkey, o_orderpriority, o_totalprice * 2.0 AS o_totalprice
  FROM orders WHERE {_DV_UPDATE_PRED}
), counters AS (
  SELECT COUNT(*) AS n_dv FROM orders
  WHERE ({_DV_DELETE_PRED}) OR ({_DV_UPDATE_PRED})
)
SELECT o_orderpriority,
       COUNT(*) AS n_rows,
       CAST(SUM({_DV_CENTS}) AS BIGINT) AS revenue_cents,
       CAST(counters.n_dv AS BIGINT) AS n_dv_entries,
       CAST({_S37_BUCKETS} AS BIGINT) AS n_files_v1,
       CAST({_S37_BUCKETS + 1} AS BIGINT) AS n_files_v2,
       CAST(0 AS BIGINT) AS n_files_rewritten
FROM merged, counters
GROUP BY o_orderpriority, counters.n_dv
ORDER BY o_orderpriority
"""


def s43_dv_change_data_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHANGE DATA FEED derived from a deletion-vector commit — the
    consumer side of s42, composing with s39's file-diff CDF: under
    DVs the v1→v2 diff is not (removed files, added files) but
    (DV positions, appended files), and the feed reads ONLY the
    DV-named data files plus the appended file. Deleted positions join
    back to their rows (position-annotated scan of the affected files
    only); a deleted row whose key reappears in the appended file is
    an update (pre/post pair), otherwise a delete; appended rows with
    no DV partner would be inserts (s39 pins that path — this commit
    appends updates only).

    Output is the same per-priority change census as s39 — change
    type × priority × exact signed cents delta — exactly what the
    incremental MV (s38) would apply. Scale: the feed costs O(churn):
    DV sidecar + touched files + appended file, never the table."""
    import shutil
    import tempfile

    from ..sources.manifest import file_key_col

    scratch = tempfile.mkdtemp(prefix="bigdata_spark_dvcdf_")
    try:
        base, v1_files, appended, dv_files = _stage_dv_table(
            spark, sf_dir, scratch
        )
        dv = spark.read.parquet(*dv_files)
        touched_keys = {
            r["file_key"] for r in dv.select("file_key").distinct().collect()
        }  # file grain — bounded by the file count
        touched_files = [
            f
            for f in v1_files
            if os.path.relpath(f, base) in touched_keys
        ]
        old_rows = (
            spark.read.option("basePath", base)
            .parquet(*touched_files)
            .withColumn("_fk", file_key_col(base))
            .withColumn("_pos", F.col("_metadata.row_index"))
            .join(
                dv,
                on=[
                    F.col("_fk") == dv.file_key,
                    F.col("_pos") == dv.pos,
                ],
            )
            .select(
                F.col("o_orderkey").alias("old_key"),
                F.col("o_orderpriority").alias("old_prio"),
                F.expr(_DV_CENTS).alias("old_cents"),
            )
        )
        new_rows = (
            spark.read.option("basePath", base)
            .parquet(*appended)
            .select(
                F.col("o_orderkey").alias("new_key"),
                F.col("o_orderpriority").alias("new_prio"),
                F.expr(_DV_CENTS).alias("new_cents"),
            )
        )
        changes = old_rows.join(
            new_rows, old_rows.old_key == new_rows.new_key, "full_outer"
        ).selectExpr(
            "CASE WHEN new_key IS NULL THEN array('delete')"
            " WHEN old_key IS NULL THEN array('insert')"
            " ELSE array('update_pre', 'update_post') END AS kinds",
            "coalesce(old_prio, new_prio) AS o_orderpriority",
            "old_cents",
            "new_cents",
        )
        feed = changes.select(
            F.explode("kinds").alias("change_type"),
            "o_orderpriority",
            F.expr(
                "CASE WHEN change_type IN ('delete', 'update_pre')"
                " THEN -old_cents ELSE new_cents END"
            ).alias("delta_cents"),
        )
        return (
            feed.groupBy("change_type", "o_orderpriority")
            .agg(
                F.count("*").alias("n_rows"),
                F.sum("delta_cents").cast("long").alias("delta_cents"),
            )
            .orderBy("change_type", "o_orderpriority")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


S43_DVCDF_SQL = f"""
WITH feed AS (
  SELECT 'delete' AS change_type, o_orderpriority,
         -{_DV_CENTS} AS delta_cents
  FROM orders WHERE {_DV_DELETE_PRED}
  UNION ALL
  SELECT 'update_pre' AS change_type, o_orderpriority,
         -{_DV_CENTS} AS delta_cents
  FROM orders WHERE {_DV_UPDATE_PRED}
  UNION ALL
  SELECT 'update_post' AS change_type, o_orderpriority,
         CAST(FLOOR((o_totalprice * 2.0) * CAST(100 AS DOUBLE)
              + CAST(0.5 AS DOUBLE)) AS BIGINT) AS delta_cents
  FROM orders WHERE {_DV_UPDATE_PRED}
)
SELECT change_type, o_orderpriority,
       COUNT(*) AS n_rows,
       CAST(SUM(delta_cents) AS BIGINT) AS delta_cents
FROM feed
GROUP BY change_type, o_orderpriority
ORDER BY change_type, o_orderpriority
"""


def s44_dv_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deletion-vector COMPACTION — the maintenance step that closes
    the DV lifecycle (s42 writes DVs, s43 feeds changes, this folds
    them back): every data file carrying DV entries is rewritten
    WITHOUT its masked rows (one position-annotated anti-join over the
    touched files only), snapshot v3 lists the rewritten + untouched +
    appended files with NO delete sidecars, and old snapshots stay
    readable (time travel to v2 still applies the DVs). This is the
    Delta `REORG ... APPLY (PURGE)` / Iceberg rewrite-data-files job:
    DVs trade write amplification for read-side anti-joins, and
    compaction pays the rewrite back once the masked fraction makes
    the anti-join the expensive side.

    Oracle contract: the v3 census (per-priority rows + exact cents)
    must STILL equal the relational MERGE result — compaction is
    required to be a physical no-op — and the counters pin the
    lifecycle: rows_purged equals the DV entry count, v3 registers
    zero DV sidecars.

    Scale: cost is O(touched files), chosen by a file-grain census
    (bounded); untouched and appended files carry over by manifest
    reference without a byte moving."""
    import shutil
    import tempfile

    from ..sources.manifest import (
        commit_snapshot,
        file_key_col,
        list_data_files,
        read_snapshot_with_deletes,
        snapshot_delete_files,
    )

    scratch = tempfile.mkdtemp(prefix="bigdata_spark_dvc_")
    try:
        base, v1_files, appended, dv_files = _stage_dv_table(
            spark, sf_dir, scratch
        )
        dv = spark.read.parquet(*dv_files)
        n_dv = dv.count()
        touched_keys = {
            r["file_key"] for r in dv.select("file_key").distinct().collect()
        }  # file grain — bounded
        touched = [
            f
            for f in v1_files
            if os.path.relpath(f, base) in touched_keys
        ]
        untouched = [
            f
            for f in v1_files
            if os.path.relpath(f, base) not in touched_keys
        ]
        live = (
            spark.read.option("basePath", base)
            .parquet(*touched)
            .withColumn("_fk", file_key_col(base))
            .withColumn("_pos", F.col("_metadata.row_index"))
            .join(
                dv,
                on=[F.col("_fk") == dv.file_key, F.col("_pos") == dv.pos],
                how="left_anti",
            )
            .select("o_orderkey", "o_orderpriority", "o_totalprice")
        )
        comp_dir = os.path.join(scratch, "compacted")
        live.repartition(len(touched)).write.mode("overwrite").parquet(
            comp_dir
        )
        compacted = []
        for i, src in enumerate(sorted(list_data_files(comp_dir))):
            dst = os.path.join(base, f"c3-{i}-{os.path.basename(src)}")
            shutil.move(src, dst)
            compacted.append(dst)
        commit_snapshot(base, 3, untouched + appended + compacted)

        snap3 = read_snapshot_with_deletes(spark, base, 3)
        return (
            snap3.groupBy("o_orderpriority")
            .agg(
                F.count("*").alias("n_rows"),
                F.sum(F.expr(_DV_CENTS)).cast("long").alias("revenue_cents"),
            )
            .select(
                "o_orderpriority",
                "n_rows",
                "revenue_cents",
                F.lit(n_dv).cast("long").alias("rows_purged"),
                F.lit(len(snapshot_delete_files(base, 3)))
                .cast("long")
                .alias("n_dv_files_after"),
            )
            .orderBy("o_orderpriority")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


S44_DVC_SQL = f"""
WITH merged AS (
  SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
  WHERE NOT ({_DV_DELETE_PRED}) AND NOT ({_DV_UPDATE_PRED})
  UNION ALL
  SELECT o_orderkey, o_orderpriority, o_totalprice * 2.0 AS o_totalprice
  FROM orders WHERE {_DV_UPDATE_PRED}
), counters AS (
  SELECT COUNT(*) AS n_dv FROM orders
  WHERE ({_DV_DELETE_PRED}) OR ({_DV_UPDATE_PRED})
)
SELECT o_orderpriority,
       COUNT(*) AS n_rows,
       CAST(SUM({_DV_CENTS}) AS BIGINT) AS revenue_cents,
       CAST(counters.n_dv AS BIGINT) AS rows_purged,
       CAST(0 AS BIGINT) AS n_dv_files_after
FROM merged, counters
GROUP BY o_orderpriority, counters.n_dv
ORDER BY o_orderpriority
"""


def s50_partition_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARTITION EVOLUTION — changing a table's partition layout
    WITHOUT rewriting history (the Iceberg capability hidden
    partitioning exists to enable): orders before 1999 were committed
    FLAT under the old spec (8 round-robin files, only footer min/max
    stats); the spec then evolved, and 1999+ data commits under
    month directories. One manifest lists both vintages; the reader
    plans each file by ITS OWN spec — month files prune by path, flat
    files prune by committed min/max — so a one-month query reads
    exactly one file, while the legacy files stay untouched forever
    (no backfill rewrite, the whole point).

    The gate pins the pruning arithmetic, not just the census: total
    files = 8 legacy + one per live month of the new vintage (the
    oracle counts the months relationally), and the 2000-03 probe
    reads exactly 1 file — every legacy file's [min, max] ends before
    1999 (stats pruning), every other month file's path mismatches.

    Scale: planning is one manifest read + per-file spec dispatch
    (file-list cardinality); the probe's data cost is one month
    partition regardless of table size or how many times the spec
    evolved."""
    import shutil
    import tempfile

    from ..sources.manifest import (
        collect_file_stats,
        commit_snapshot,
        list_data_files,
    )

    _SPLIT = "1999-01-01"
    _PROBE = "2000-03"
    scratch = tempfile.mkdtemp(prefix="bigdata_spark_pevo_")
    try:
        base = os.path.join(scratch, "table")
        o = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderpriority", "o_totalprice", "o_orderdate"
        )
        # old spec: flat files, stats-only pruning
        (
            o.filter(F.col("o_orderdate") < _SPLIT)
            .repartition(_S37_BUCKETS)
            .write.mode("overwrite")
            .parquet(base)
        )
        legacy = list_data_files(base)
        # evolved spec: month directories for the new vintage
        stage = os.path.join(scratch, "staged_months")
        (
            o.filter(F.col("o_orderdate") >= _SPLIT)
            .withColumn("om", F.date_format("o_orderdate", "yyyy-MM"))
            .repartition("om")
            .write.partitionBy("om")
            .mode("overwrite")
            .parquet(stage)
        )
        monthly = []
        for src in list_data_files(stage):
            rel = os.path.relpath(src, stage)  # om=YYYY-MM/part-...
            dst = os.path.join(base, rel)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            shutil.move(src, dst)
            monthly.append(dst)
        stats = collect_file_stats(spark, legacy, ["o_orderdate"])
        commit_snapshot(base, 1, legacy + monthly, stats=stats)

        # reader: dispatch each committed file by its spec
        import json as _json

        with open(os.path.join(base, "_manifests", "v1.json")) as fh:
            man = _json.load(fh)
        lo, hi = f"{_PROBE}-01", f"{_PROBE}-31"
        keep = []
        for rel in man["files"]:
            if rel.startswith("om="):
                if rel.split("/", 1)[0] == f"om={_PROBE}":
                    keep.append(rel)  # path (spec-B) pruning
                continue
            st = man.get("stats", {}).get(rel, {}).get("cols", {}).get(
                "o_orderdate"
            )
            if st is not None and (st[1] < lo or st[0] > hi):
                continue  # stats (spec-A) pruning
            keep.append(rel)
        got = (
            spark.read.parquet(*(os.path.join(base, f) for f in keep))
            .filter(F.date_format("o_orderdate", "yyyy-MM") == _PROBE)
            .agg(
                F.count("*").alias("n_rows"),
                F.coalesce(F.sum(F.expr(_DV_CENTS)), F.lit(0)).alias(
                    "revenue_cents"
                ),
            )
            .first()
        )
        import pandas as pd

        pdf = pd.DataFrame(
            [
                (
                    _PROBE,
                    int(got["n_rows"]),
                    int(got["revenue_cents"]),
                    len(man["files"]),
                    len(legacy),
                    len(keep),
                )
            ],
            columns=[
                "probe_month",
                "n_rows",
                "revenue_cents",
                "n_files_total",
                "n_files_legacy",
                "n_files_read",
            ],
        )
        return spark.createDataFrame(pdf).select(
            "probe_month",
            F.col("n_rows").cast("long"),
            F.col("revenue_cents").cast("long"),
            F.col("n_files_total").cast("long"),
            F.col("n_files_legacy").cast("long"),
            F.col("n_files_read").cast("long"),
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


S50_PEVO_SQL = f"""
WITH months AS (
  SELECT COUNT(DISTINCT strftime(o_orderdate, '%Y-%m')) AS m
  FROM orders WHERE o_orderdate >= TIMESTAMP '1999-01-01'
)
SELECT '2000-03' AS probe_month,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COALESCE(SUM({_DV_CENTS}), 0) AS BIGINT) AS revenue_cents,
       CAST({_S37_BUCKETS} + months.m AS BIGINT) AS n_files_total,
       CAST({_S37_BUCKETS} AS BIGINT) AS n_files_legacy,
       CAST(1 AS BIGINT) AS n_files_read
FROM orders, months
WHERE strftime(o_orderdate, '%Y-%m') = '2000-03'
GROUP BY months.m
"""


def s49_bloom_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BLOOM-FILTER file skipping — the pruning mode that completes
    the trio next to min/max range stats (s41/read_snapshot_pruned)
    and Z-order spatial clustering: on a hash/round-robin file layout
    every file's [min, max] spans the whole key domain, so a POINT
    lookup on a high-cardinality key scans all files unless the
    manifest carries per-file blooms. Here each of the 8 flat order
    files commits a 32 KiB bloom over o_orderkey; three probes — the
    live MIN key, the live MAX key, and a key that does not exist —
    read only each probe's candidate files. Correctness is structural
    (build and probe share the hash, so no false negatives — the
    lookup censuses must equal DuckDB's relational answer regardless
    of false positives), and the gate also pins that skipping
    actually HAPPENED (`bloom_skips_files`: total candidate reads
    strictly below probes × files; a bloom that stopped pruning
    fails the gate, not just a benchmark).

    Scale: bloom build is one column-only task per file (stats-pass
    cardinality); a probe is one manifest read + O(candidate) file
    scans — at 100 TB a needle lookup costs 1-2 file reads instead of
    the full table."""
    import shutil
    import tempfile

    import pandas as pd

    from ..sources.manifest import (
        bloom_candidate_files,
        collect_file_blooms,
        commit_snapshot,
        list_data_files,
    )

    scratch = tempfile.mkdtemp(prefix="bigdata_spark_bloom_")
    try:
        base = os.path.join(scratch, "table")
        o = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderpriority", "o_totalprice"
        )
        o.repartition(_S37_BUCKETS).write.mode("overwrite").parquet(base)
        files = list_data_files(base)
        blooms = collect_file_blooms(spark, files, "o_orderkey")
        commit_snapshot(
            base,
            1,
            files,
            stats={f: {"bloom": {"o_orderkey": b}} for f, b in blooms.items()},
        )
        lo, hi = o.agg(F.min("o_orderkey"), F.max("o_orderkey")).first()
        probes = [("absent", int(hi) + 1), ("k_max", int(hi)), ("k_min", int(lo))]
        rows, n_cand_total, n_files = [], 0, len(files)
        for tag, key in probes:
            cand, total = bloom_candidate_files(base, 1, "o_orderkey", key)
            n_cand_total += len(cand)
            if cand:
                got = (
                    spark.read.option("basePath", base)
                    .parquet(*cand)
                    .filter(F.col("o_orderkey") == key)
                    .agg(
                        F.count("*").alias("n"),
                        F.coalesce(F.sum(F.expr(_DV_CENTS)), F.lit(0)).alias(
                            "c"
                        ),
                    )
                    .first()
                )
                rows.append((tag, int(got["n"]), int(got["c"])))
            else:
                rows.append((tag, 0, 0))
        skipped = n_cand_total < len(probes) * n_files
        pdf = pd.DataFrame(
            rows, columns=["probe", "n_rows", "revenue_cents"]
        )
        return (
            spark.createDataFrame(pdf)
            .select(
                "probe",
                F.col("n_rows").cast("long"),
                F.col("revenue_cents").cast("long"),
                F.lit(bool(skipped)).alias("bloom_skips_files"),
            )
            .orderBy("probe")
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


S49_BLOOM_SQL = f"""
WITH k AS (SELECT MIN(o_orderkey) AS lo, MAX(o_orderkey) AS hi FROM orders)
SELECT 'absent' AS probe, CAST(0 AS BIGINT) AS n_rows,
       CAST(0 AS BIGINT) AS revenue_cents, TRUE AS bloom_skips_files
UNION ALL
SELECT 'k_max', CAST(COUNT(*) AS BIGINT),
       CAST(COALESCE(SUM({_DV_CENTS}), 0) AS BIGINT), TRUE
FROM orders, k WHERE o_orderkey = k.hi
UNION ALL
SELECT 'k_min', CAST(COUNT(*) AS BIGINT),
       CAST(COALESCE(SUM({_DV_CENTS}), 0) AS BIGINT), TRUE
FROM orders, k WHERE o_orderkey = k.lo
ORDER BY probe
"""


def s48_stream_cdf_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING CONSUMPTION of a change data feed — the Delta
    "stream from a table's changes" composition that ties the DV
    family to the MV family: an MV seeds from the v1 snapshot census
    (the initial load), the v1→v2 change feed (derived from the
    deletion-vector commit exactly as in s43) streams in as signed
    deltas across three micro-batches, and each foreachBatch refresh
    folds its partial into the versioned MV. The gated invariant is
    the CDC contract itself: INITIAL LOAD + CHANGE FEED = NEXT
    SNAPSHOT — the final MV must equal the v2 census bit-for-bit
    (same relational oracle as s42), with delete/update_pre carrying
    (−1 row, −cents) and update_post/insert (+1 row, +cents), all
    order-free signed integers so batch boundaries cannot matter.

    Scale: the consumer never rescans either snapshot — per refresh
    it reads the MV (view grain) plus one churn-sized delta batch;
    this is the production path for keeping downstream aggregates
    fresh off a lakehouse table's feed without reprocessing
    history."""
    import shutil
    import tempfile
    import uuid

    from ..sources.manifest import file_key_col, read_snapshot
    from ..streaming.upsert_sink import VersionedParquetTable

    scratch = tempfile.mkdtemp(prefix="bigdata_spark_scdf_")
    try:
        base, v1_files, appended, dv_files = _stage_dv_table(
            spark, sf_dir, scratch
        )
        dv = spark.read.parquet(*dv_files)
        old_rows = (
            spark.read.option("basePath", base)
            .parquet(*v1_files)
            .withColumn("_fk", file_key_col(base))
            .withColumn("_pos", F.col("_metadata.row_index"))
            .join(
                dv,
                on=[F.col("_fk") == dv.file_key, F.col("_pos") == dv.pos],
            )
            .select(
                F.col("o_orderpriority").alias("prio"),
                F.lit(-1).cast("long").alias("d_rows"),
                (-F.expr(_DV_CENTS)).alias("d_cents"),
            )
        )
        new_rows = (
            spark.read.option("basePath", base)
            .parquet(*appended)
            .select(
                F.col("o_orderpriority").alias("prio"),
                F.lit(1).cast("long").alias("d_rows"),
                F.expr(_DV_CENTS).alias("d_cents"),
            )
        )
        feed_dir = os.path.join(scratch, "feed")
        old_rows.unionByName(new_rows).repartition(3).write.parquet(feed_dir)

        mv_root = os.path.join(scratch, "mv")
        table = VersionedParquetTable(spark, mv_root)
        table.publish(
            read_snapshot(spark, base, 1)
            .groupBy(F.col("o_orderpriority").alias("prio"))
            .agg(
                F.count("*").alias("n_rows"),
                F.sum(F.expr(_DV_CENTS)).alias("revenue_cents"),
            )
        )

        def refresh(batch: DataFrame, batch_id: int) -> None:
            if batch.isEmpty():
                return
            t = VersionedParquetTable(batch.sparkSession, mv_root)
            partial = batch.groupBy("prio").agg(
                F.sum("d_rows").alias("n_rows"),
                F.sum("d_cents").alias("revenue_cents"),
            )
            t.publish(
                t.read()
                .unionByName(partial)
                .groupBy("prio")
                .agg(
                    F.sum("n_rows").alias("n_rows"),
                    F.sum("revenue_cents").alias("revenue_cents"),
                )
            )

        stream = (
            spark.readStream.schema("prio string, d_rows long, d_cents long")
            .option("maxFilesPerTrigger", 1)
            .parquet(feed_dir)
        )
        q = (
            stream.writeStream.foreachBatch(refresh)
            .option(
                "checkpointLocation",
                os.path.join(scratch, f"ckpt_{uuid.uuid4().hex[:8]}"),
            )
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError("s48_stream_cdf_apply did not finish in 300s")
        final = VersionedParquetTable(spark, mv_root)
        n_stream_refreshes = int(final.current_version())  # seed was v0
        out = (
            final.read()
            .select(
                F.col("prio").alias("o_orderpriority"),
                F.col("n_rows").cast("long").alias("n_rows"),
                F.col("revenue_cents").cast("long").alias("revenue_cents"),
                F.lit(n_stream_refreshes)
                .cast("long")
                .alias("n_stream_refreshes"),
            )
            .orderBy("o_orderpriority")
            .toPandas()
        )
        return spark.createDataFrame(out)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


S48_SCDF_SQL = f"""
WITH merged AS (
  SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
  WHERE NOT ({_DV_DELETE_PRED}) AND NOT ({_DV_UPDATE_PRED})
  UNION ALL
  SELECT o_orderkey, o_orderpriority, o_totalprice * 2.0 AS o_totalprice
  FROM orders WHERE {_DV_UPDATE_PRED}
)
SELECT o_orderpriority,
       COUNT(*) AS n_rows,
       CAST(SUM({_DV_CENTS}) AS BIGINT) AS revenue_cents,
       CAST(3 AS BIGINT) AS n_stream_refreshes
FROM merged
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# s45/s46/s47 — snapshot expiry + vacuum, optimistic concurrency, AS OF reads
# ---------------------------------------------------------------------------


def _stage_flat_orders(spark: SparkSession, sf_dir: str, base: str):
    """Orders as _S37_BUCKETS flat immutable files + manifest v1."""
    from ..sources.manifest import commit_snapshot, list_data_files

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    o.repartition(_S37_BUCKETS).write.mode("overwrite").parquet(base)
    files = list_data_files(base)
    commit_snapshot(base, 1, files)
    return files


def _write_slice(spark, base, scratch, name, pred, mult, src_files):
    """One appended immutable file: the rows of ``src_files`` matching
    ``pred`` with o_totalprice scaled by ``mult`` (an exact IEEE
    double product both engines reproduce). Returns the final path."""
    from ..sources.manifest import list_data_files

    stage = os.path.join(scratch, f"staged_{name}")
    (
        spark.read.option("basePath", base)
        .parquet(*src_files)
        .filter(F.expr(pred))
        .select(
            "o_orderkey",
            "o_orderpriority",
            (F.col("o_totalprice") * F.lit(float(mult))).alias(
                "o_totalprice"
            ),
        )
        # one commit-batch-sized file per writer keeps the committed
        # file lists deterministic; production sizes by churn
        .repartition(1)
        .write.mode("overwrite")
        .parquet(stage)
    )
    import shutil

    src = list_data_files(stage)[0]
    dst = os.path.join(base, f"{name}-{os.path.basename(src)}")
    shutil.move(src, dst)
    return dst


_S46_A_PRED = "o_orderpriority = '1-URGENT'"
_S46_B_PRED = "o_orderpriority = '3-MEDIUM'"


def s45_snapshot_expiry_vacuum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot EXPIRY + VACUUM — the retention/garbage-collection half
    of the manifest format (Delta VACUUM / Iceberg expire_snapshots):
    v2 rewrites the whole table without its '1-URGENT' rows (the GDPR
    purge shape — a rewrite commit, so v1's files become historical),
    the retention policy expires every manifest but the newest, and
    vacuum deletes exactly the files no surviving manifest references.
    Safety is structural, pinned by the gate: the reachable set is the
    union of surviving manifests' files+deletes, so the post-vacuum
    census must still equal the logical v2 content — a vacuum that
    ever deleted a live file would break the value hash, not just a
    counter.

    Scale: expiry is pure metadata; vacuum is one listing diffed
    against the manifest union — O(files), no data read. Counters pin
    the lifecycle: 16 files before (8 original + 8 rewritten), 8
    deleted, 8 live, 1 manifest surviving."""
    import shutil
    import tempfile

    from ..sources.manifest import (
        commit_snapshot,
        expire_snapshots,
        list_data_files,
        read_snapshot,
        vacuum,
        versions,
    )

    scratch = tempfile.mkdtemp(prefix="bigdata_spark_vac_")
    try:
        base = os.path.join(scratch, "table")
        _stage_flat_orders(spark, sf_dir, base)
        # v2: full rewrite dropping the purged rows (new immutable files)
        stage = os.path.join(scratch, "rewrite")
        (
            read_snapshot(spark, base, 1)
            .filter(~F.expr(_S46_A_PRED))
            .repartition(_S37_BUCKETS)
            .write.mode("overwrite")
            .parquet(stage)
        )
        c2 = []
        for i, src in enumerate(sorted(list_data_files(stage))):
            dst = os.path.join(base, f"c2-{i}-{os.path.basename(src)}")
            shutil.move(src, dst)
            c2.append(dst)
        commit_snapshot(base, 2, c2)

        n_before = len(list_data_files(base))
        expired = expire_snapshots(base, keep_latest=1)
        deleted, n_ref = vacuum(base, retention_secs=0.0)
        census = (
            read_snapshot(spark, base, 2)
            .groupBy("o_orderpriority")
            .agg(
                F.count("*").alias("n_rows"),
                F.sum(F.expr(_DV_CENTS)).cast("long").alias("revenue_cents"),
            )
            .select(
                "o_orderpriority",
                "n_rows",
                "revenue_cents",
                F.lit(n_before).cast("long").alias("n_files_before"),
                F.lit(len(deleted)).cast("long").alias("n_files_vacuumed"),
                F.lit(n_ref).cast("long").alias("n_files_live"),
                F.lit(len(expired)).cast("long").alias("n_snapshots_expired"),
                F.lit(len(versions(base))).cast("long").alias(
                    "n_snapshots_live"
                ),
            )
            .orderBy("o_orderpriority")
            .localCheckpoint(eager=True)
        )
        return census
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


S45_VAC_SQL = f"""
SELECT o_orderpriority,
       COUNT(*) AS n_rows,
       CAST(SUM({_DV_CENTS}) AS BIGINT) AS revenue_cents,
       CAST({2 * _S37_BUCKETS} AS BIGINT) AS n_files_before,
       CAST({_S37_BUCKETS} AS BIGINT) AS n_files_vacuumed,
       CAST({_S37_BUCKETS} AS BIGINT) AS n_files_live,
       CAST(1 AS BIGINT) AS n_snapshots_expired,
       CAST(1 AS BIGINT) AS n_snapshots_live
FROM orders
WHERE NOT ({_S46_A_PRED})
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def s46_write_conflict_retry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIMISTIC-CONCURRENCY commit protocol — two writers race from
    the same base snapshot; the manifest CAS (create-exclusive link in
    sources/manifest.try_commit_snapshot) admits exactly one v2, and
    the loser RETRIES the lakehouse way: re-read the new current
    version, verify its own base files still stand (both commits here
    are append-only, so the rebase is conflict-free by rule — a
    rewrite that removed the loser's base files would abort instead),
    and commit the SAME staged file as v3. Nothing re-stages and
    nothing is written twice — conflict resolution is metadata-only.

    The gate pins the protocol's outcome: exactly one CAS failure,
    final version 3, and the v3 census equals base ∪ both appended
    slices — a lost or double-applied append breaks the value hash.

    Scale: the CAS is one atomic metadata op regardless of table
    size; retry cost is a manifest read + subset check over file
    lists (manifest cardinality), never a data operation."""
    import shutil
    import tempfile

    from ..sources.manifest import (
        read_snapshot,
        snapshot_files,
        try_commit_snapshot,
        versions,
    )

    scratch = tempfile.mkdtemp(prefix="bigdata_spark_occ_")
    try:
        base = os.path.join(scratch, "table")
        v1_files = _stage_flat_orders(spark, sf_dir, base)
        # both writers stage from v1 BEFORE either commits
        fa = _write_slice(spark, base, scratch, "a2", _S46_A_PRED, 2.0, v1_files)
        fb = _write_slice(spark, base, scratch, "b2", _S46_B_PRED, 3.0, v1_files)
        ok_a = try_commit_snapshot(base, 2, v1_files + [fa])
        ok_b = try_commit_snapshot(base, 2, v1_files + [fb])  # loses
        n_conflicts = int(not ok_a) + int(not ok_b)
        retried = False
        if not ok_b:
            cur = max(versions(base))
            cur_files = snapshot_files(base, cur)
            if not set(v1_files).issubset(cur_files):
                raise RuntimeError("rebase conflict: base files rewritten")
            retried = try_commit_snapshot(base, cur + 1, cur_files + [fb])
        final_v = max(versions(base))
        return (
            read_snapshot(spark, base, final_v)
            .groupBy("o_orderpriority")
            .agg(
                F.count("*").alias("n_rows"),
                F.sum(F.expr(_DV_CENTS)).cast("long").alias("revenue_cents"),
            )
            .select(
                "o_orderpriority",
                "n_rows",
                "revenue_cents",
                F.lit(n_conflicts).cast("long").alias("n_conflicts"),
                F.lit(int(retried)).cast("long").alias("n_retries_ok"),
                F.lit(final_v).cast("long").alias("final_version"),
            )
            .orderBy("o_orderpriority")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


S46_OCC_SQL = f"""
WITH merged AS (
  SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
  UNION ALL
  SELECT o_orderkey, o_orderpriority, o_totalprice * 2.0 FROM orders
  WHERE {_S46_A_PRED}
  UNION ALL
  SELECT o_orderkey, o_orderpriority, o_totalprice * 3.0 FROM orders
  WHERE {_S46_B_PRED}
)
SELECT o_orderpriority,
       COUNT(*) AS n_rows,
       CAST(SUM({_DV_CENTS}) AS BIGINT) AS revenue_cents,
       CAST(1 AS BIGINT) AS n_conflicts,
       CAST(1 AS BIGINT) AS n_retries_ok,
       CAST(3 AS BIGINT) AS final_version
FROM merged
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def s47_time_travel_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF-TIMESTAMP time travel — version-number travel
    (s18/read_snapshot) is the mechanism, but consumers ask for "the
    table as of T": each commit carries a logical commit timestamp in
    its manifest, and ``resolve_asof`` binary-resolves the largest
    version committed at or before the asked time. Three commits at
    t=100/200/300 (base, +doubled-URGENT slice, +tripled-MEDIUM
    slice); reads AS OF t=150/250/350 must see exactly the first one,
    two, then three states — pinned by scalar censuses.

    Scale: resolution is one manifest-directory metadata pass (no
    data); the read plans from the resolved manifest exactly like any
    snapshot read."""
    import shutil
    import tempfile

    from ..sources.manifest import (
        read_snapshot,
        resolve_asof,
        snapshot_files,
        try_commit_snapshot,
    )

    scratch = tempfile.mkdtemp(prefix="bigdata_spark_asof_")
    try:
        base = os.path.join(scratch, "table")
        o = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderpriority", "o_totalprice"
        )
        o.repartition(_S37_BUCKETS).write.mode("overwrite").parquet(base)
        from ..sources.manifest import list_data_files

        v1_files = list_data_files(base)
        assert try_commit_snapshot(base, 1, v1_files, committed_at=100)
        fa = _write_slice(spark, base, scratch, "a2", _S46_A_PRED, 2.0, v1_files)
        assert try_commit_snapshot(
            base, 2, v1_files + [fa], committed_at=200
        )
        fb = _write_slice(spark, base, scratch, "b3", _S46_B_PRED, 3.0, v1_files)
        assert try_commit_snapshot(
            base, 3, snapshot_files(base, 2) + [fb], committed_at=300
        )
        out = None
        for ts in (150, 250, 350):
            v = resolve_asof(base, ts)
            row = (
                read_snapshot(spark, base, v)
                .agg(
                    F.count("*").alias("n_rows"),
                    F.sum(F.expr(_DV_CENTS))
                    .cast("long")
                    .alias("revenue_cents"),
                )
                .select(
                    F.lit(ts).cast("long").alias("asof_ts"),
                    F.lit(v).cast("long").alias("version"),
                    "n_rows",
                    "revenue_cents",
                )
            )
            out = row if out is None else out.unionByName(row)
        return out.orderBy("asof_ts").localCheckpoint(eager=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


S47_ASOF_SQL = f"""
WITH base AS (
  SELECT COUNT(*) AS n, CAST(SUM({_DV_CENTS}) AS BIGINT) AS c FROM orders
), sa AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(CAST(FLOOR((o_totalprice * 2.0) * CAST(100 AS DOUBLE)
              + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS BIGINT) AS c
  FROM orders WHERE {_S46_A_PRED}
), sb AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(CAST(FLOOR((o_totalprice * 3.0) * CAST(100 AS DOUBLE)
              + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS BIGINT) AS c
  FROM orders WHERE {_S46_B_PRED}
)
SELECT CAST(150 AS BIGINT) AS asof_ts, CAST(1 AS BIGINT) AS version,
       base.n AS n_rows, base.c AS revenue_cents FROM base
UNION ALL
SELECT CAST(250 AS BIGINT), CAST(2 AS BIGINT),
       base.n + sa.n, base.c + sa.c FROM base, sa
UNION ALL
SELECT CAST(350 AS BIGINT), CAST(3 AS BIGINT),
       base.n + sa.n + sb.n, base.c + sa.c + sb.c FROM base, sa, sb
ORDER BY asof_ts
"""


# ---------------------------------------------------------------------------
# s51 — EQUALITY deletes: row-level delete by key predicate, no positions
# ---------------------------------------------------------------------------

_S51_CHURN_PRED = "o_custkey % 50 = 3"  # churned customers (non-unique key)


def s51_equality_deletes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg-style EQUALITY deletes — the other half of production
    row-level deletes beside the positional DV family (s42-s44): a
    churn feed deletes every order of a set of customers by writing a
    sidecar of KEY VALUES (distinct o_custkey), registered in the
    manifest with its key-column list and applied merge-on-read as an
    anti-join on the key. The delete writer never opens a data file —
    no read-modify-write to find row positions — which is why equality
    deletes are the cheap-under-churn shape: one key row logically
    removes every matching data row across every file.

    Staged as a real manifest lifecycle: orders commit as an 8-file v1;
    the churned-key sidecar commits as v2 over the SAME data files
    (zero rewrites, pinned structurally); the gated rows prove census
    invariance (v2 read == v1 read minus the churned customers' rows,
    counts and exact cents) plus the s43-style change-data-feed census
    of exactly the removed rows.

    Scale: the sidecar is key-cardinality-sized (churn-batch), the
    anti-join hash-partitions on the key (AQE broadcasts the usual
    tiny sidecar), and no data file is opened at delete time — at
    100 TB a churn delete commits kilobytes.

    Reference parity: the reference rewrites whole artifacts on any
    mutation (model_manager.py save path); this is the Spark-first
    row-level shape."""
    import os
    import shutil
    import tempfile

    from ..sources.manifest import (
        commit_snapshot,
        list_data_files,
        read_snapshot,
        read_snapshot_with_deletes,
        snapshot_files,
    )

    scratch = tempfile.mkdtemp(prefix="bigdata_spark_eqdel_")
    try:
        base = os.path.join(scratch, "table")
        o = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_orderpriority", "o_totalprice"
        )
        o.repartition(8).write.parquet(base)
        v1_files = list_data_files(base)
        commit_snapshot(base, 1, v1_files)

        # the churn feed supplies keys — the writer reads NO data file
        keys = (
            o.filter(F.expr(_S51_CHURN_PRED))
            .select("o_custkey")
            .distinct()
        )
        eq_dir = os.path.join(base, "eqdel_v2")
        keys.repartition(1).write.parquet(eq_dir)
        eq_files = [
            f for f in list_data_files(base) if f not in set(v1_files)
        ]
        commit_snapshot(
            base,
            2,
            v1_files,
            equality_deletes=(eq_files, ["o_custkey"]),
        )

        v1 = read_snapshot(spark, base, 1)
        v2 = read_snapshot_with_deletes(spark, base, 2)
        # the change-data-feed of the delete — key-churn-sized census;
        # unhinted like read_snapshot_with_deletes: AQE broadcasts the
        # usual tiny churn batch by stats, degrades to shuffle if a
        # commit really deleted a data-sized key set
        removed = v1.join(keys, "o_custkey", "left_semi")
        zero_rewrite = set(snapshot_files(base, 2)) == set(v1_files)

        cents = F.expr(_DV_CENTS)
        stats = (
            v1.agg(
                F.count("*").alias("n_before"),
                F.sum(cents).cast("long").alias("cents_before"),
            )
            .crossJoin(
                keys.agg(F.count("*").alias("n_deleted_keys"))
            )
            .crossJoin(
                removed.agg(
                    F.count("*").alias("n_removed_rows"),
                    F.coalesce(F.sum(cents), F.lit(0))
                    .cast("long")
                    .alias("cents_removed"),
                )
            )
            .crossJoin(
                v2.agg(
                    F.count("*").alias("n_after"),
                    F.coalesce(F.sum(cents), F.lit(0))
                    .cast("long")
                    .alias("cents_after"),
                )
            )
            .select(
                "n_before",
                "n_deleted_keys",
                "n_removed_rows",
                "n_after",
                "cents_before",
                "cents_removed",
                "cents_after",
                (
                    (F.col("n_after") == F.col("n_before") - F.col("n_removed_rows"))
                    & (
                        F.col("cents_after")
                        == F.col("cents_before") - F.col("cents_removed")
                    )
                ).alias("census_invariant"),
                F.lit(bool(zero_rewrite)).alias("zero_data_file_rewrite"),
            )
            .localCheckpoint()
        )
        return stats
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


S51_EQDEL_SQL = f"""
WITH cents AS (
  SELECT o_custkey,
         CAST(FLOOR(o_totalprice * CAST(100 AS DOUBLE)
              + CAST(0.5 AS DOUBLE)) AS BIGINT) AS c
  FROM orders
),
removed AS (SELECT * FROM cents WHERE {_S51_CHURN_PRED})
SELECT
  CAST((SELECT COUNT(*) FROM cents) AS BIGINT) AS n_before,
  CAST((SELECT COUNT(DISTINCT o_custkey) FROM removed) AS BIGINT)
    AS n_deleted_keys,
  CAST((SELECT COUNT(*) FROM removed) AS BIGINT) AS n_removed_rows,
  CAST((SELECT COUNT(*) FROM cents) - (SELECT COUNT(*) FROM removed)
       AS BIGINT) AS n_after,
  CAST((SELECT SUM(c) FROM cents) AS BIGINT) AS cents_before,
  CAST((SELECT COALESCE(SUM(c), 0) FROM removed) AS BIGINT)
    AS cents_removed,
  CAST((SELECT SUM(c) FROM cents)
    - (SELECT COALESCE(SUM(c), 0) FROM removed) AS BIGINT) AS cents_after,
  TRUE AS census_invariant,
  TRUE AS zero_data_file_rewrite
"""


# ---------------------------------------------------------------------------
# s52 — multi-table transactional commit: fact + derived MV in ONE CAS
# ---------------------------------------------------------------------------


def s52_multi_table_txn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTI-TABLE transaction — one CAS commit covering a fact table
    AND its derived per-priority summary MV (sources/manifest.
    try_commit_transaction): each table stages its own snapshot, then
    a single create-exclusive transaction doc makes BOTH current, so a
    reader resolving through the txn log can never see the fact at v2
    with the MV still summarizing v1 — the cross-table atomicity
    Delta/Iceberg single-table commits cannot give you.

    Two writers race from txn 1: each stages a fact append AND its
    matching MV rebuild. Writer A wins the fact-level CAS; writer B's
    conflict forces the full transactional rebase — and because the MV
    DERIVES from the fact, B's rebase is NOT metadata-only: it
    re-derives the MV over the post-A fact before committing txn 3
    (the part single-table OCC (s46) never exercises).

    Gates: per-priority census of the final fact (base ∪ both slices —
    a lost/doubled append breaks the hash), exactly one conflict, one
    recompute-rebase, final txn 3, and `mv_consistent_all_txns` — at
    EVERY committed transaction the MV read back from disk equals the
    aggregate of the fact at that transaction's version (the atomicity
    invariant itself, checked bit-for-bit on exact cents).

    Scale: the txn CAS is one metadata op regardless of table count or
    size; the rebase recompute is MV-sized (here summary-grain; in
    production an incremental s37-style refresh)."""
    import shutil
    import tempfile

    from ..sources.manifest import (
        commit_snapshot,
        list_data_files,
        read_snapshot,
        resolve_transaction,
        snapshot_files,
        transaction_ids,
        try_commit_snapshot,
        try_commit_transaction,
    )

    scratch = tempfile.mkdtemp(prefix="bigdata_spark_txn_")
    try:
        root = os.path.join(scratch, "db")
        fact = os.path.join(root, "fact")
        mv = os.path.join(root, "mv")
        os.makedirs(mv, exist_ok=True)
        v1_files = _stage_flat_orders(spark, sf_dir, fact)

        def write_mv(tag: str, fact_files: list[str]) -> str:
            stage = os.path.join(scratch, f"mv_{tag}")
            (
                spark.read.option("basePath", fact)
                .parquet(*fact_files)
                .groupBy("o_orderpriority")
                .agg(
                    F.count("*").alias("n_rows"),
                    F.sum(F.expr(_DV_CENTS))
                    .cast("long")
                    .alias("revenue_cents"),
                )
                .repartition(1)
                .write.mode("overwrite")
                .parquet(stage)
            )
            src = list_data_files(stage)[0]
            dst = os.path.join(mv, f"{tag}-{os.path.basename(src)}")
            shutil.move(src, dst)
            return dst

        commit_snapshot(mv, 1, [write_mv("m1", v1_files)])
        assert try_commit_transaction(root, 1, {"fact": 1, "mv": 1})

        # both writers stage fact append + matching MV rebuild from txn 1
        fa = _write_slice(spark, fact, scratch, "a2", _S46_A_PRED, 2.0, v1_files)
        fb = _write_slice(spark, fact, scratch, "b2", _S46_B_PRED, 3.0, v1_files)
        mva = write_mv("m2a", v1_files + [fa])
        mvb = write_mv("m2b", v1_files + [fb])  # B's pre-rebase MV

        ok_fa = try_commit_snapshot(fact, 2, v1_files + [fa])
        ok_ma = try_commit_snapshot(mv, 2, [mva])
        ok_ta = try_commit_transaction(root, 2, {"fact": 2, "mv": 2})
        ok_fb = try_commit_snapshot(fact, 2, v1_files + [fb])  # loses
        n_conflicts = int(not ok_fb)
        rebased_recompute = False
        if not ok_fb:
            cur = resolve_transaction(root)  # {"fact": 2, "mv": 2}
            cur_files = snapshot_files(fact, cur["fact"])
            if not set(v1_files).issubset(cur_files):
                raise RuntimeError("rebase conflict: base files rewritten")
            assert try_commit_snapshot(
                fact, cur["fact"] + 1, cur_files + [fb]
            )
            # the MV derives from the fact: the rebase RE-DERIVES it on
            # the post-A state — B's staged m2b is stale and unreferenced
            mvb = write_mv("m3", cur_files + [fb])
            rebased_recompute = True
            assert try_commit_snapshot(mv, cur["mv"] + 1, [mvb])
            assert try_commit_transaction(
                root, 3, {"fact": cur["fact"] + 1, "mv": cur["mv"] + 1}
            )

        # atomicity audit: at EVERY committed txn, MV == fact aggregate.
        # All per-txn symmetric differences are unioned and counted in
        # ONE action (formerly two exceptAll counts per txn = six jobs;
        # sum of non-negative per-txn diffs == 0 is the same boolean).
        diff_parts = []
        for t in transaction_ids(root):
            tv = resolve_transaction(root, t)
            fact_agg = (
                read_snapshot(spark, fact, tv["fact"])
                .groupBy("o_orderpriority")
                .agg(
                    F.count("*").alias("n_rows"),
                    F.sum(F.expr(_DV_CENTS))
                    .cast("long")
                    .alias("revenue_cents"),
                )
            )
            mv_read = read_snapshot(spark, mv, tv["mv"])
            diff_parts.append(fact_agg.exceptAll(mv_read))
            diff_parts.append(mv_read.exceptAll(fact_agg))
        from functools import reduce

        consistent = (
            reduce(DataFrame.unionAll, diff_parts).count() == 0
        )

        final = resolve_transaction(root)
        return (
            read_snapshot(spark, fact, final["fact"])
            .groupBy("o_orderpriority")
            .agg(
                F.count("*").alias("n_rows"),
                F.sum(F.expr(_DV_CENTS)).cast("long").alias("revenue_cents"),
            )
            .select(
                "o_orderpriority",
                "n_rows",
                "revenue_cents",
                F.lit(n_conflicts).cast("long").alias("n_conflicts"),
                F.lit(int(rebased_recompute)).cast("long").alias(
                    "n_rebase_recomputes"
                ),
                F.lit(max(transaction_ids(root))).cast("long").alias(
                    "final_txn"
                ),
                F.lit(bool(consistent)).alias("mv_consistent_all_txns"),
            )
            .orderBy("o_orderpriority")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


S52_TXN_SQL = f"""
WITH merged AS (
  SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
  UNION ALL
  SELECT o_orderkey, o_orderpriority, o_totalprice * 2.0 FROM orders
  WHERE {_S46_A_PRED}
  UNION ALL
  SELECT o_orderkey, o_orderpriority, o_totalprice * 3.0 FROM orders
  WHERE {_S46_B_PRED}
)
SELECT o_orderpriority,
       COUNT(*) AS n_rows,
       CAST(SUM({_DV_CENTS}) AS BIGINT) AS revenue_cents,
       CAST(1 AS BIGINT) AS n_conflicts,
       CAST(1 AS BIGINT) AS n_rebase_recomputes,
       CAST(3 AS BIGINT) AS final_txn,
       TRUE AS mv_consistent_all_txns
FROM merged
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


QUERIES = {
    "s52_multi_table_txn": (s52_multi_table_txn, S52_TXN_SQL),
    "s51_equality_deletes": (s51_equality_deletes, S51_EQDEL_SQL),
    "s37_incremental_mv": (s37_incremental_mv, S37_IMV_SQL),
    "opt_join_order_cost": (opt_join_order_cost, OPT_JOIN_ORDER_SQL),
    "opt_join_order_cost_approx": (
        opt_join_order_cost_approx,
        OPT_JOIN_ORDER_APPROX_SQL,
    ),
    "s38_mv_retraction": (s38_mv_retraction, S38_MVR_SQL),
    "s39_change_data_feed": (s39_change_data_feed, S39_CDF_SQL),
    "s42_deletion_vector_merge": (s42_deletion_vector_merge, S42_DV_SQL),
    "s43_dv_change_data_feed": (s43_dv_change_data_feed, S43_DVCDF_SQL),
    "s44_dv_compaction": (s44_dv_compaction, S44_DVC_SQL),
    "s45_snapshot_expiry_vacuum": (s45_snapshot_expiry_vacuum, S45_VAC_SQL),
    "s46_write_conflict_retry": (s46_write_conflict_retry, S46_OCC_SQL),
    "s47_time_travel_asof": (s47_time_travel_asof, S47_ASOF_SQL),
    "s48_stream_cdf_apply": (s48_stream_cdf_apply, S48_SCDF_SQL),
    "s49_bloom_point_lookup": (s49_bloom_point_lookup, S49_BLOOM_SQL),
    "s50_partition_evolution": (s50_partition_evolution, S50_PEVO_SQL),
    "s40_schema_evolution": (s40_schema_evolution, S40_SEV_SQL),
    "s41_metadata_only_count": (s41_metadata_only_count, S41_MOC_SQL),
    "s34_manifest_time_travel": (s34_manifest_time_travel, S34_TTRAVEL_SQL),
    "s35_manifest_stats_pruning": (s35_manifest_stats_pruning, S35_MSTATS_SQL),
    "s36_manifest_compaction": (s36_manifest_compaction, S36_COMPACT_SQL),
    "s23_merge_into": (s23_merge_into, S23_MERGE_SQL),
    "s33_recursive_cte": (s33_recursive_cte, S33_RECURSIVE_SQL),
    "sql_pipe_syntax": (sql_pipe_syntax, SQL_PIPE_ORACLE),
    "s32_bucketed_smb_join": (s32_bucketed_smb_join, S32_BUCKETED_SQL),
    "s26_binaryfile_source": (s26_binaryfile_source, S26_BINARYFILE_SQL),
    "sql_params_api": (sql_params_api, SQL_PARAMS_SQL),
    "s30_csv_malformed": (s30_csv_malformed, S30_BADCSV_SQL),
    "s31_json_malformed": (s31_json_malformed, S31_BADJSON_SQL),
    "o9_observe_metrics": (o9_observe_metrics, O9_OBSERVE_SQL),
    "skew_salted_agg": (skew_salted_agg, SKEW_AGG_SQL),
    "skew_salted_join": (skew_salted_join, SKEW_JOIN_SQL),
    "skew_stress_agg": (skew_stress_agg, SKEW_STRESS_SQL),
    "skew_stress_join": (skew_stress_join, SKEW_STRESS_JOIN_SQL),
    "s13_python_datasource": (s13_python_datasource, S13_PYDS_SQL),
    "a14_udaf_mode": (a14_udaf_mode, A14_UDAF_SQL),
    "s9_partitioned_sink": (s9_partitioned_sink, S9_SQL),
    "s10_jsonl_roundtrip": (s10_jsonl_roundtrip, S10_SQL),
    "s14_orc_roundtrip": (s14_orc_roundtrip, S14_SQL),
    "s15_zorder_layout": (s15_zorder_layout, S15_ZORDER_SQL),
    "s16_avro_roundtrip": (s16_avro_roundtrip, S16_AVRO_SQL),
    "s24_xml_roundtrip": (s24_xml_roundtrip, S24_XML_SQL),
    "s17_delete_cdc": (s17_delete_cdc, S17_CDC_SQL),
    "s18_incremental_agg": (s18_incremental_agg, S18_IVM_SQL),
    "s19_csv_quoting": (s19_csv_quoting, S19_CSV_SQL),
    "s21_dynamic_overwrite": (s21_dynamic_overwrite, S21_DYNOW_SQL),
    "s11_compaction": (s11_compaction, S11_SQL),
    "s12_schema_evolution": (s12_schema_evolution, S12_SQL),
    "sql_api_q1": (sql_api_q1, SQL_API_SQL),
}
