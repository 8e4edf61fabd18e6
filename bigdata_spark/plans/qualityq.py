"""Data-quality queries: one-pass column profiling and declarative
expectation checks (operators/profile.py) — the dbt-test/Deequ surface
over the TPC-H-ish tables, each with a full-value DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load_table


def dq_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profile four orders columns in ONE aggregate job (single scan,
    multi-countDistinct via Expand). min/max render as strings; the
    oracle renders the same way (timestamps normalized to the same
    'YYYY-MM-DD HH:MM:SS' form both engines)."""
    from ..operators.profile import profile_columns

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus",
        # render ts as string pre-profile so min/max stringification is
        # engine-independent (Spark CAST(ts AS STRING) drops trailing
        # .000000, DuckDB keeps it — normalize via explicit format)
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("o_orderdate"),
    )
    return profile_columns(
        o, ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate"]
    )


DQ_PROFILE_SQL = """
WITH src AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate
  FROM orders
),
wide AS (
  SELECT COUNT(*) AS n_rows,
    CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS k_nulls,
    COUNT(DISTINCT o_orderkey) AS k_distinct,
    CAST(MIN(o_orderkey) AS VARCHAR) AS k_min, CAST(MAX(o_orderkey) AS VARCHAR) AS k_max,
    CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS c_nulls,
    COUNT(DISTINCT o_custkey) AS c_distinct,
    CAST(MIN(o_custkey) AS VARCHAR) AS c_min, CAST(MAX(o_custkey) AS VARCHAR) AS c_max,
    CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS s_nulls,
    COUNT(DISTINCT o_orderstatus) AS s_distinct,
    MIN(o_orderstatus) AS s_min, MAX(o_orderstatus) AS s_max,
    CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS d_nulls,
    COUNT(DISTINCT o_orderdate) AS d_distinct,
    MIN(o_orderdate) AS d_min, MAX(o_orderdate) AS d_max
  FROM src
)
SELECT u.* FROM wide, LATERAL (
  SELECT 'o_orderkey' AS column_name, n_rows, k_nulls AS n_nulls,
         k_distinct AS n_distinct, k_min AS min_value, k_max AS max_value
  UNION ALL
  SELECT 'o_custkey', n_rows, c_nulls, c_distinct, c_min, c_max
  UNION ALL
  SELECT 'o_orderstatus', n_rows, s_nulls, s_distinct, s_min, s_max
  UNION ALL
  SELECT 'o_orderdate', n_rows, d_nulls, d_distinct, d_min, d_max
) u
"""


def dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five declarative checks over orders/lineitem: PK uniqueness,
    FK presence, referential integrity (anti-join), numeric range,
    accepted-value set. Each check is its own pushed-down aggregate;
    the report is a 5-row union."""
    from ..operators.profile import (
        check_expectations,
        expect_in_range,
        expect_in_set,
        expect_not_null,
        expect_references,
        expect_unique,
    )

    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    return check_expectations(
        {
            "orders_pk_unique": expect_unique(o, "o_orderkey"),
            "orders_custkey_not_null": expect_not_null(o, "o_custkey"),
            "lineitem_fk_orders": expect_references(l, "l_orderkey", o, "o_orderkey"),
            "discount_in_range": expect_in_range(l, "l_discount", 0.0, 1.0),
            "status_in_set": expect_in_set(o, "o_orderstatus", ["F", "O", "P"]),
        }
    )


DQ_EXPECT_SQL = """
WITH checks AS (
  SELECT 'discount_in_range' AS check_name,
         (SELECT COUNT(*) FROM lineitem
          WHERE NOT (l_discount BETWEEN 0.0 AND 1.0)) AS n_violations
  UNION ALL
  SELECT 'lineitem_fk_orders',
         (SELECT COUNT(*) FROM lineitem
          WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders))
  UNION ALL
  SELECT 'orders_custkey_not_null',
         (SELECT COUNT(*) FROM orders WHERE o_custkey IS NULL)
  UNION ALL
  SELECT 'orders_pk_unique',
         (SELECT COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey) FROM orders)
  UNION ALL
  SELECT 'status_in_set',
         (SELECT COUNT(*) FROM orders WHERE o_orderstatus NOT IN ('F','O','P'))
)
SELECT check_name, n_violations, n_violations = 0 AS passed FROM checks
"""


# Shared decile-bin CASE over reference boundaries b1..b9 (identical
# text in Spark and DuckDB so the binning is bit-identical).
_PSI_CASE = (
    "CASE "
    + " ".join(f"WHEN o_totalprice <= b{i} THEN {i}" for i in range(1, 10))
    + " ELSE 10 END"
)
# PSI contribution, Laplace-smoothed so empty bins stay finite and the
# expression is total: p = (n_ref+0.5)/(ref_tot+5), q likewise.
_PSI_P = "((n_ref + 0.5) / (ref_tot + 5.0))"
_PSI_Q = "((n_cur + 0.5) / (cur_tot + 5.0))"
_PSI_CONTRIB = f"({_PSI_Q} - {_PSI_P}) * ln({_PSI_Q} / {_PSI_P})"


def dq_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability-index drift monitor — the standard ML-ops
    check that a feature's distribution hasn't shifted between a
    reference window and the current window. Reference = 1997H1
    orders, current = everything after; bins are the REFERENCE deciles
    selected by rank (the w6 pattern, one exchange), broadcast to bin
    both slices; PSI folds Laplace-smoothed proportions through the
    shared (q-p)·ln(q/p) expression. PSI < 0.1 is 'stable' by the
    usual rule of thumb — emitted as a flag per bin plus the total."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_totalprice",
        (F.col("o_orderdate") < F.to_timestamp(F.lit("1997-07-01"))).alias("is_ref"),
    )
    ref = o.filter(F.col("is_ref"))
    w = Window.orderBy("o_totalprice", "o_orderkey")
    wc = Window.partitionBy()
    ranked = ref.select(
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wc).alias("n"),
    )
    bnd = ranked.agg(
        *[
            F.min(
                F.when(
                    F.col("rn") == F.expr(f"({i} * n + 9) div 10"),
                    F.col("o_totalprice"),
                )
            ).alias(f"b{i}")
            for i in range(1, 10)
        ]
    )
    binned = o.crossJoin(F.broadcast(bnd)).select(
        "is_ref", F.expr(_PSI_CASE).alias("bin")
    )
    cells = binned.groupBy("bin").agg(
        F.count(F.when(F.col("is_ref"), 1)).cast("double").alias("n_ref"),
        F.count(F.when(~F.col("is_ref"), 1)).cast("double").alias("n_cur"),
    )
    wtot = Window.partitionBy()
    with_tot = cells.select(
        "bin",
        "n_ref",
        "n_cur",
        F.sum("n_ref").over(wtot).alias("ref_tot"),
        F.sum("n_cur").over(wtot).alias("cur_tot"),
    )
    per_bin = with_tot.select(
        "bin",
        F.col("n_ref").cast("long").alias("n_ref"),
        F.col("n_cur").cast("long").alias("n_cur"),
        F.round(F.expr(_PSI_CONTRIB), 6).alias("psi_contrib"),
    )
    total = per_bin.agg(
        F.lit(-1).alias("bin"),
        F.sum("n_ref").alias("n_ref"),
        F.sum("n_cur").alias("n_cur"),
        F.round(F.sum("psi_contrib"), 6).alias("psi_contrib"),
    )
    return per_bin.unionAll(total).orderBy("bin")


DQ_DRIFT_SQL = f"""
WITH o AS (
  SELECT o_orderkey, o_totalprice,
         o_orderdate < TIMESTAMP '1997-07-01' AS is_ref
  FROM orders
),
ranked AS (
  SELECT o_totalprice,
         ROW_NUMBER() OVER (ORDER BY o_totalprice, o_orderkey) AS rn,
         COUNT(*) OVER () AS n
  FROM o WHERE is_ref
),
bnd AS (
  SELECT {", ".join(f"MIN(CASE WHEN rn = ({i} * n + 9) // 10 THEN o_totalprice END) AS b{i}" for i in range(1, 10))}
  FROM ranked
),
binned AS (
  SELECT is_ref, {_PSI_CASE} AS bin FROM o CROSS JOIN bnd
),
cells AS (
  SELECT bin,
         CAST(COUNT(*) FILTER (is_ref) AS DOUBLE) AS n_ref,
         CAST(COUNT(*) FILTER (NOT is_ref) AS DOUBLE) AS n_cur
  FROM binned GROUP BY bin
),
with_tot AS (
  SELECT bin, n_ref, n_cur,
         SUM(n_ref) OVER () AS ref_tot,
         SUM(n_cur) OVER () AS cur_tot
  FROM cells
),
per_bin AS (
  SELECT bin, CAST(n_ref AS BIGINT) AS n_ref, CAST(n_cur AS BIGINT) AS n_cur,
         ROUND({_PSI_CONTRIB}, 6) AS psi_contrib
  FROM with_tot
)
SELECT * FROM per_bin
UNION ALL
SELECT -1 AS bin, CAST(SUM(n_ref) AS BIGINT), CAST(SUM(n_cur) AS BIGINT),
       ROUND(SUM(psi_contrib), 6)
FROM per_bin
ORDER BY bin
"""



def dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Foreign-key integrity audit across the star schema: for each
    declared FK edge, the count of child rows whose key has no parent
    (left-anti join) plus the child row count — the reconciliation
    report a warehouse runs after every load.

    Each check is one anti-join; parent key sets are dim-sized or
    key-projected, so at 100 TB each audit is a broadcast or
    co-partitioned anti-join on a single pruned column — no full-row
    shuffles. The testdata is referentially clean, so every orphan
    count must be zero; the oracle recomputes the same anti-joins."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    p_ = load_table(spark, sf_dir, "part")
    s_ = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    checks = [
        ("lineitem.l_orderkey -> orders", l.select(F.col("l_orderkey").alias("k")), o.select(F.col("o_orderkey").alias("k"))),
        ("lineitem.l_partkey -> part", l.select(F.col("l_partkey").alias("k")), p_.select(F.col("p_partkey").alias("k"))),
        ("lineitem.l_suppkey -> supplier", l.select(F.col("l_suppkey").alias("k")), s_.select(F.col("s_suppkey").alias("k"))),
        ("orders.o_custkey -> customer", o.select(F.col("o_custkey").alias("k")), c.select(F.col("c_custkey").alias("k"))),
        ("customer.c_nationkey -> nation", c.select(F.col("c_nationkey").alias("k")), n.select(F.col("n_nationkey").alias("k"))),
    ]
    # one lazy job instead of 10 sequential driver actions (an
    # anti-join count + a child count per FK edge): each edge's counts
    # become 1-row aggregates crossJoined into a labeled row, all five
    # unioned — the scheduler runs the per-edge subtrees concurrently
    # and the values are the same counts
    from functools import reduce

    parts = []
    for name, child, parent in checks:
        orphans = child.join(parent, "k", "left_anti").agg(
            F.count("*").alias("n_orphans")
        )
        row = (
            child.agg(F.count("*").alias("n_child_rows"))
            .crossJoin(orphans)
            .select(
                F.lit(name).alias("fk_edge"), "n_child_rows", "n_orphans"
            )
        )
        parts.append(row)
    return reduce(DataFrame.unionAll, parts).orderBy("fk_edge")


DQ_REFINT_SQL = """
SELECT * FROM (VALUES
  ('customer.c_nationkey -> nation',
   (SELECT COUNT(*) FROM customer),
   (SELECT COUNT(*) FROM customer WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation))),
  ('lineitem.l_orderkey -> orders',
   (SELECT COUNT(*) FROM lineitem),
   (SELECT COUNT(*) FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders))),
  ('lineitem.l_partkey -> part',
   (SELECT COUNT(*) FROM lineitem),
   (SELECT COUNT(*) FROM lineitem WHERE l_partkey NOT IN (SELECT p_partkey FROM part))),
  ('lineitem.l_suppkey -> supplier',
   (SELECT COUNT(*) FROM lineitem),
   (SELECT COUNT(*) FROM lineitem WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier))),
  ('orders.o_custkey -> customer',
   (SELECT COUNT(*) FROM orders),
   (SELECT COUNT(*) FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)))
) AS t(fk_edge, n_child_rows, n_orphans)
ORDER BY fk_edge
"""


def dq_uniqueness_pk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Primary-key uniqueness audit across the schema — the other half
    of the dq_referential_integrity contract check: for every declared
    key, row count vs distinct-key count and the duplicate surplus
    (all zeros on clean data). lineitem's compound key proves the
    multi-column case. Each check is one map-side-combinable
    distinct-count aggregation over the key projection only."""
    checks = [
        ("customer(c_custkey)", "customer", ["c_custkey"]),
        ("lineitem(l_orderkey,l_linenumber)", "lineitem", ["l_orderkey", "l_linenumber"]),
        ("nation(n_nationkey)", "nation", ["n_nationkey"]),
        ("orders(o_orderkey)", "orders", ["o_orderkey"]),
        ("part(p_partkey)", "part", ["p_partkey"]),
        ("supplier(s_suppkey)", "supplier", ["s_suppkey"]),
    ]
    rows = []
    for name, table, keys in checks:
        t = load_table(spark, sf_dir, table).select(*keys)
        r = t.agg(
            F.count("*").alias("n"), F.countDistinct(*keys).alias("nd")
        ).first()
        rows.append((name, int(r["n"]), int(r["nd"]), int(r["n"] - r["nd"])))
    return spark.createDataFrame(
        rows, "pk string, n_rows long, n_distinct long, n_duplicates long"
    ).orderBy("pk")


DQ_UNIQUE_SQL = """
SELECT * FROM (VALUES
  ('customer(c_custkey)',
   (SELECT COUNT(*) FROM customer),
   (SELECT COUNT(DISTINCT c_custkey) FROM customer),
   (SELECT COUNT(*) - COUNT(DISTINCT c_custkey) FROM customer)),
  ('lineitem(l_orderkey,l_linenumber)',
   (SELECT COUNT(*) FROM lineitem),
   (SELECT COUNT(DISTINCT (l_orderkey, l_linenumber)) FROM lineitem),
   (SELECT COUNT(*) - COUNT(DISTINCT (l_orderkey, l_linenumber)) FROM lineitem)),
  ('nation(n_nationkey)',
   (SELECT COUNT(*) FROM nation),
   (SELECT COUNT(DISTINCT n_nationkey) FROM nation),
   (SELECT COUNT(*) - COUNT(DISTINCT n_nationkey) FROM nation)),
  ('orders(o_orderkey)',
   (SELECT COUNT(*) FROM orders),
   (SELECT COUNT(DISTINCT o_orderkey) FROM orders),
   (SELECT COUNT(*) - COUNT(DISTINCT o_orderkey) FROM orders)),
  ('part(p_partkey)',
   (SELECT COUNT(*) FROM part),
   (SELECT COUNT(DISTINCT p_partkey) FROM part),
   (SELECT COUNT(*) - COUNT(DISTINCT p_partkey) FROM part)),
  ('supplier(s_suppkey)',
   (SELECT COUNT(*) FROM supplier),
   (SELECT COUNT(DISTINCT s_suppkey) FROM supplier),
   (SELECT COUNT(*) - COUNT(DISTINCT s_suppkey) FROM supplier))
) AS t(pk, n_rows, n_distinct, n_duplicates)
ORDER BY pk
"""

# ---------------------------------------------------------------------------
# dq_benford — Benford's-law first-digit audit (fraud/synthetic-data tell)
# ---------------------------------------------------------------------------

# log10(1 + 1/d) as exact double literals shared by both engines
_BENFORD_P = {d: __import__("math").log10(1 + 1 / d) for d in range(1, 10)}


def dq_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit distribution of o_totalprice vs
    Benford's law, with the chi-squared distance — the classic audit
    for fabricated or truncated numeric columns.

    One map-side-combinable groupBy over the fact column (9 result
    rows at any scale); the expected frequencies are compile-time
    literals and the chi² term is a closed-form double from exact
    counts. First digit via string head of the integer part — no
    log/pow per row.
    """
    o = load_table(spark, sf_dir, "orders")
    digit = F.expr(
        "CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS STRING), 1, 1) AS INT)"
    )
    counts = (
        o.filter(F.col("o_totalprice") >= 1.0)
        .select(digit.alias("d"))
        .groupBy("d")
        .agg(F.count("*").alias("n"))
    )
    total = counts.agg(F.sum("n").alias("t"))
    exp_map = "MAP(" + ", ".join(
        f"{d}, CAST({p!r} AS DOUBLE)" for d, p in _BENFORD_P.items()
    ) + ")"
    return (
        counts.crossJoin(F.broadcast(total))
        .withColumn("expected_p", F.expr(f"element_at({exp_map}, d)"))
        .select(
            "d",
            "n",
            F.expr("CAST(n AS DOUBLE) / t").alias("observed_p"),
            "expected_p",
            F.expr(
                "(CAST(n AS DOUBLE) / t - element_at(" + exp_map + ", d))"
                " * (CAST(n AS DOUBLE) / t - element_at(" + exp_map + ", d))"
                " / element_at(" + exp_map + ", d) * t"
            ).alias("chi2_term"),
        )
        .orderBy("d")
    )


def _benford_sql() -> str:
    exp_case = "CASE d " + " ".join(
        f"WHEN {d} THEN CAST({p!r} AS DOUBLE)" for d, p in _BENFORD_P.items()
    ) + " END"
    return f"""
WITH counts AS (
  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS d,
         COUNT(*) AS n
  FROM orders WHERE o_totalprice >= 1.0 GROUP BY 1
), tot AS (SELECT SUM(n) AS t FROM counts)
SELECT d, n,
       CAST(n AS DOUBLE) / t AS observed_p,
       {exp_case} AS expected_p,
       (CAST(n AS DOUBLE) / t - {exp_case})
         * (CAST(n AS DOUBLE) / t - {exp_case})
         / {exp_case} * t AS chi2_term
FROM counts CROSS JOIN tot ORDER BY d
"""


DQ_BENFORD_SQL = _benford_sql()


# ---------------------------------------------------------------------------
# dq_embedding_drift — embedding-distribution drift monitor, exact integers
# ---------------------------------------------------------------------------

_DRIFT_TOPK = 8
_DRIFT_Q = 1_000_000  # per-element micro-unit quantization


def dq_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-distribution drift — the monitor an LLM-data pipeline
    points at its vector column when the upstream encoder, corpus mix,
    or preprocessing changes: split the corpus into a reference and a
    current cohort (vec_id parity here; in production, before/after a
    cutover date), compare PER-DIMENSION means, and surface the most
    drifted dimensions. Exactness trick: each element quantizes to
    micro-units (floor(x·1e6+0.5) BIGINT) so cohort sums are order-free
    integers, and the ranking key is the cross-multiplied integer
    numerator |S_cur·n_ref − S_ref·n_cur| — no float enters until the
    final per-row means, which are single identical-IEEE divisions in
    both engines. One posexplode + one 64-group aggregate: at 100 TB
    this is a single combine-friendly pass over the vectors."""
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    el = e.select(
        (F.col("vec_id") % 2).alias("cohort"),
        F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "x"),
    ).select(
        "cohort", "dim",
        F.floor(F.col("x") * _DRIFT_Q + F.lit(0.5)).cast("long").alias("q"),
    )
    per_dim = el.groupBy("dim").agg(
        F.sum(F.when(F.col("cohort") == 0, F.col("q"))).alias("s_ref"),
        F.count(F.when(F.col("cohort") == 0, F.lit(1))).alias("n_ref"),
        F.sum(F.when(F.col("cohort") == 1, F.col("q"))).alias("s_cur"),
        F.count(F.when(F.col("cohort") == 1, F.lit(1))).alias("n_cur"),
    )
    ranked = per_dim.withColumn(
        "drift_num",
        F.abs(F.col("s_cur") * F.col("n_ref") - F.col("s_ref") * F.col("n_cur")),
    )
    return (
        ranked.orderBy(F.desc("drift_num"), F.asc("dim"))
        .limit(_DRIFT_TOPK)
        .select(
            F.col("dim").cast("long").alias("dim"),
            "n_ref",
            "n_cur",
            "drift_num",
            (F.col("s_ref").cast("double") / (F.col("n_ref") * float(_DRIFT_Q))).alias("mean_ref"),
            (F.col("s_cur").cast("double") / (F.col("n_cur") * float(_DRIFT_Q))).alias("mean_cur"),
        )
        .orderBy(F.desc("drift_num"), F.asc("dim"))
    )


DQ_EMB_DRIFT_SQL = f"""
WITH el AS (
  SELECT vec_id % 2 AS cohort, u.dim AS dim,
         CAST(floor(CAST(u.x AS DOUBLE) * {_DRIFT_Q} + 0.5) AS BIGINT) AS q
  FROM (
    SELECT vec_id,
           UNNEST(list_transform(embedding,
                  (x0, i) -> struct_pack(x := x0, dim := i - 1))) AS u
    FROM embeddings
  )
), per_dim AS (
  SELECT dim,
         SUM(CASE WHEN cohort = 0 THEN q END) AS s_ref,
         COUNT(CASE WHEN cohort = 0 THEN 1 END) AS n_ref,
         SUM(CASE WHEN cohort = 1 THEN q END) AS s_cur,
         COUNT(CASE WHEN cohort = 1 THEN 1 END) AS n_cur
  FROM el GROUP BY 1
), ranked AS (
  SELECT *, abs(s_cur * n_ref - s_ref * n_cur) AS drift_num FROM per_dim
)
SELECT CAST(dim AS BIGINT) AS dim,
       CAST(n_ref AS BIGINT) AS n_ref, CAST(n_cur AS BIGINT) AS n_cur,
       CAST(drift_num AS BIGINT) AS drift_num,
       CAST(s_ref AS DOUBLE) / (n_ref * CAST({_DRIFT_Q} AS DOUBLE)) AS mean_ref,
       CAST(s_cur AS DOUBLE) / (n_cur * CAST({_DRIFT_Q} AS DOUBLE)) AS mean_cur
FROM ranked
ORDER BY drift_num DESC, dim ASC
LIMIT {_DRIFT_TOPK}
"""


# ---------------------------------------------------------------------------
# dq_fairness_ratios — group-fairness audit of a decision rule
# ---------------------------------------------------------------------------

# the decision rule under audit: a proxy-score threshold (approve an
# order when its total price clears the cut); ground truth is whether
# the order was actually high-priority
_FAIR_CUT = "250000.0"
_FAIR_PRED = f"o_totalprice > {_FAIR_CUT}"
_FAIR_LABEL = "o_orderpriority IN ('1-URGENT', '2-HIGH')"


def dq_fairness_ratios(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-fairness audit of a threshold decision rule across
    customer market segments: per-group selection rate (demographic
    parity), TPR/FPR against the true label (equalized odds), and the
    disparate-impact ratio against the most-selected group, flagged
    against the four-fifths (80%) rule.

    Every rate is a parts-per-million BIGINT — (count·10^6) div n —
    so the whole report is integer-exact and order-free: rates,
    ratios, and the 80%-rule flag all hash-match the DuckDB oracle
    with no float discipline needed (the repo's ppm pattern).

    Scale: one user-dim join planned by stats/AQE (customer grows with
    SF — never force-broadcast) (customer segment onto
    orders), one map-side-combinable aggregation down to n_segments
    rows, then a window over those few rows for the max selection
    rate.  Nothing after the first aggregation scales with the fact
    table.  Fairness-style per-cohort ratio reports are a first-class
    need of training-data pipelines (cohort balance audits before
    sampling); the reference has no counterpart (closest is the
    per-class P/R/F1 report, code/src/evaluation_manager.py).
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice", "o_orderpriority"
    )
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    base = o.join(c, o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("segment"),
        F.expr(f"CASE WHEN {_FAIR_PRED} THEN 1 ELSE 0 END").alias("pred"),
        F.expr(f"CASE WHEN {_FAIR_LABEL} THEN 1 ELSE 0 END").alias("label"),
    )
    per = base.groupBy("segment").agg(
        F.count("*").alias("n"),
        F.sum("label").alias("pos"),
        F.sum("pred").alias("predpos"),
        F.sum(F.col("pred") * F.col("label")).alias("tp"),
        F.sum(F.col("pred") * (F.lit(1) - F.col("label"))).alias("fp"),
    )
    rates = per.select(
        "segment",
        "n",
        F.expr("pos * 1000000 div n").alias("base_rate_ppm"),
        F.expr("predpos * 1000000 div n").alias("sel_rate_ppm"),
        F.expr("tp * 1000000 div GREATEST(pos, 1)").alias("tpr_ppm"),
        F.expr("fp * 1000000 div GREATEST(n - pos, 1)").alias("fpr_ppm"),
    )
    w = Window.partitionBy()
    out = rates.withColumn(
        "max_sel", F.max("sel_rate_ppm").over(w)
    ).select(
        "segment",
        "n",
        "base_rate_ppm",
        "sel_rate_ppm",
        "tpr_ppm",
        "fpr_ppm",
        F.expr("sel_rate_ppm * 1000000 div GREATEST(max_sel, 1)").alias(
            "di_ppm"
        ),
    )
    return out.withColumn(
        "passes_80pct_rule",
        F.expr("CAST(di_ppm >= 800000 AS INT)"),
    ).orderBy("segment")


DQ_FAIRNESS_SQL = f"""
WITH base AS (
  SELECT c.c_mktsegment AS segment,
         CASE WHEN {_FAIR_PRED} THEN 1 ELSE 0 END AS pred,
         CASE WHEN {_FAIR_LABEL} THEN 1 ELSE 0 END AS label
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
), per AS (
  SELECT segment,
         COUNT(*) AS n,
         SUM(label) AS pos,
         SUM(pred) AS predpos,
         SUM(pred * label) AS tp,
         SUM(pred * (1 - label)) AS fp
  FROM base GROUP BY 1
), rates AS (
  -- DuckDB SUMs are HUGEINT; every derived rate is cast back to
  -- BIGINT so the frame dtype-matches Spark's int64 (checker rule)
  SELECT segment, n,
         CAST(pos * 1000000 // n AS BIGINT) AS base_rate_ppm,
         CAST(predpos * 1000000 // n AS BIGINT) AS sel_rate_ppm,
         CAST(tp * 1000000 // GREATEST(pos, 1) AS BIGINT) AS tpr_ppm,
         CAST(fp * 1000000 // GREATEST(n - pos, 1) AS BIGINT) AS fpr_ppm
  FROM per
), di AS (
  SELECT *, MAX(sel_rate_ppm) OVER () AS max_sel FROM rates
)
SELECT segment, n, base_rate_ppm, sel_rate_ppm, tpr_ppm, fpr_ppm,
       CAST(sel_rate_ppm * 1000000 // GREATEST(max_sel, 1) AS BIGINT)
         AS di_ppm,
       CAST(sel_rate_ppm * 1000000 // GREATEST(max_sel, 1) >= 800000
            AS INT) AS passes_80pct_rule
FROM di ORDER BY segment
"""


# ---------------------------------------------------------------------------
# dq_pseudonymize_join — keyed tokenization with referential integrity
# ---------------------------------------------------------------------------

_PSEUDO_PEPPER = "pepper-v1"
_PSEUDO_TOKEN_SPARK = (
    "substring(md5(concat('{p}|', CAST({{c}} AS STRING))), 1, 16)"
).format(p=_PSEUDO_PEPPER)
_PSEUDO_TOKEN_DUCK = (
    "substr(md5('{p}|' || CAST({{c}} AS VARCHAR)), 1, 16)"
).format(p=_PSEUDO_PEPPER)


def dq_pseudonymize_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy-preserving tokenization that KEEPS the data joinable —
    the de-identification primitive of a shareable analytics extract:
    replace the customer key everywhere with a peppered hash token
    (md5('pepper|key'), 16 hex chars), then PROVE the pseudonymized
    tables still reconcile: every order still joins to exactly one
    tokenized customer, the token space is collision-free (distinct
    tokens == distinct keys on both sides), and the join cardinality
    is unchanged from the raw-key join.

    Scale: tokenization is a stateless projection (no lookup table to
    shuffle or leak); the verification is two distinct-counts and one
    hash join — the same cost profile as the raw join it replaces."""
    c = load_table(spark, sf_dir, "customer").select(
        F.expr(_PSEUDO_TOKEN_SPARK.format(c="c_custkey")).alias("c_token")
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.expr(_PSEUDO_TOKEN_SPARK.format(c="o_custkey")).alias("o_token"),
    )
    joined = o.join(c, o.o_token == c.c_token)
    raw = load_table(spark, sf_dir, "orders").join(
        load_table(spark, sf_dir, "customer"),
        F.col("o_custkey") == F.col("c_custkey"),
    )
    return (
        o.agg(
            F.count("*").alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_keys"),
            F.countDistinct("o_token").alias("n_tokens"),
        )
        .crossJoin(
            F.broadcast(joined.agg(F.count("*").alias("n_joined_tokenized")))
        )
        .crossJoin(F.broadcast(raw.agg(F.count("*").alias("n_joined_raw"))))
        .selectExpr(
            "n_orders",
            "n_keys",
            "n_tokens",
            "n_tokens = n_keys AS collision_free",
            "n_joined_tokenized",
            "n_joined_raw",
            "n_joined_tokenized = n_joined_raw AS referentially_intact",
        )
    )


_TOK_O = _PSEUDO_TOKEN_DUCK.format(c="o_custkey")
_TOK_C = _PSEUDO_TOKEN_DUCK.format(c="c_custkey")

DQ_PSEUDO_SQL = f"""
WITH o AS (
  SELECT o_custkey, {_TOK_O} AS o_token FROM orders
), c AS (
  SELECT {_TOK_C} AS c_token FROM customer
), stats AS (
  SELECT COUNT(*) AS n_orders,
         COUNT(DISTINCT o_custkey) AS n_keys,
         COUNT(DISTINCT o_token) AS n_tokens
  FROM o
), jt AS (
  SELECT COUNT(*) AS n_joined_tokenized FROM o JOIN c ON o.o_token = c.c_token
), jr AS (
  SELECT COUNT(*) AS n_joined_raw
  FROM orders JOIN customer ON o_custkey = c_custkey
)
SELECT n_orders, n_keys, n_tokens,
       n_tokens = n_keys AS collision_free,
       n_joined_tokenized, n_joined_raw,
       n_joined_tokenized = n_joined_raw AS referentially_intact
FROM stats, jt, jr
"""


# ---------------------------------------------------------------------------
# dq_k_anonymity — k-anonymity / l-diversity census over quasi-identifiers
# ---------------------------------------------------------------------------

_KANON_K = 5


def dq_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity and l-diversity census over the quasi-identifier
    tuple (customer nation, order priority, order year): for each
    equivalence class its size (k) and the number of distinct
    sensitive values (order status) it contains (l) — the two numbers
    a privacy review reads before a dataset leaves the warehouse
    (classes with k < 5 re-identify; l = 1 classes leak the sensitive
    attribute outright even at high k).

    One joined rollup to the QI-class grain (nation broadcast); the
    risk summary is a second rollup over the class table. Output: the
    global census row plus flags, all exact integers."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    classes = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_nationkey").alias("qi_nation"),
            F.col("o_orderpriority").alias("qi_priority"),
            F.year("o_orderdate").alias("qi_year"),
        )
        .agg(
            F.count("*").alias("k"),
            F.countDistinct("o_orderstatus").alias("l"),
        )
    )
    return classes.agg(
        F.count("*").cast("long").alias("n_classes"),
        F.sum("k").cast("long").alias("n_rows"),
        F.min("k").cast("long").alias("k_min"),
        F.sum(F.when(F.col("k") < _KANON_K, F.col("k")).otherwise(0))
        .cast("long")
        .alias("rows_below_k5"),
        F.sum(F.when(F.col("k") < _KANON_K, 1).otherwise(0))
        .cast("long")
        .alias("classes_below_k5"),
        F.min("l").cast("long").alias("l_min"),
        F.sum(F.when(F.col("l") == 1, F.col("k")).otherwise(0))
        .cast("long")
        .alias("rows_sensitive_leak"),
    )


DQ_KANON_SQL = f"""
WITH classes AS (
  SELECT c.c_nationkey AS qi_nation, o.o_orderpriority AS qi_priority,
         year(o.o_orderdate) AS qi_year,
         COUNT(*) AS k, COUNT(DISTINCT o.o_orderstatus) AS l
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2, 3
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_classes,
       CAST(SUM(k) AS BIGINT) AS n_rows,
       CAST(MIN(k) AS BIGINT) AS k_min,
       CAST(SUM(CASE WHEN k < {_KANON_K} THEN k ELSE 0 END) AS BIGINT)
         AS rows_below_k5,
       CAST(SUM(CASE WHEN k < {_KANON_K} THEN 1 ELSE 0 END) AS BIGINT)
         AS classes_below_k5,
       CAST(MIN(l) AS BIGINT) AS l_min,
       CAST(SUM(CASE WHEN l = 1 THEN k ELSE 0 END) AS BIGINT)
         AS rows_sensitive_leak
FROM classes
"""


QUERIES = {
    "dq_k_anonymity": (dq_k_anonymity, DQ_KANON_SQL),
    "dq_pseudonymize_join": (dq_pseudonymize_join, DQ_PSEUDO_SQL),
    "dq_fairness_ratios": (dq_fairness_ratios, DQ_FAIRNESS_SQL),
    "dq_embedding_drift": (dq_embedding_drift, DQ_EMB_DRIFT_SQL),
    "dq_benford": (dq_benford, DQ_BENFORD_SQL),
    "dq_profile": (dq_profile, DQ_PROFILE_SQL),
    "dq_referential_integrity": (dq_referential_integrity, DQ_REFINT_SQL),
    "dq_uniqueness_pk": (dq_uniqueness_pk, DQ_UNIQUE_SQL),
    "dq_expectations": (dq_expectations, DQ_EXPECT_SQL),
    "dq_drift_psi": (dq_drift_psi, DQ_DRIFT_SQL),
}
