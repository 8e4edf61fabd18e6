"""Invariant tests for the round-5 additions (ER linkage, CMS, GBT,
logreg, URL dedup, perplexity buckets, ACF/EWMA/Theil-Sen/Gini).

The cross-engine value check lives in the oracle gate; these assert
the mathematical invariants a hash match alone would not explain."""

from __future__ import annotations

import math

SF = "/root/testdata/sf0.001"


# --- entity resolution -----------------------------------------------------


def test_er_unchanged_records_link_perfectly(spark):
    from bigdata_spark.plans.erq import er_blocked_linkage

    rows = {r["edit_type"]: r for r in er_blocked_linkage(spark, SF).collect()}
    assert set(rows) == {0, 1, 2, 3}
    clean = rows[3]
    # untouched names must match themselves exactly
    assert clean["n_correct"] == clean["n_records"]
    assert clean["recall"] == 1.0
    # corrupted types can miss, but blocking must find SOME candidates
    for t in (0, 1, 2):
        assert rows[t]["n_with_candidates"] > 0
        assert 0 <= rows[t]["n_correct"] <= rows[t]["n_matched"]


def test_trunc_div_matches_engines():
    from bigdata_spark.plans.mlq import _trunc_div

    # C-style semantics (Spark `div`, DuckDB `//`), not Python floor
    assert _trunc_div(7, 2) == 3
    assert _trunc_div(-7, 2) == -3  # Python -7 // 2 == -4
    assert _trunc_div(7, -2) == -3
    assert _trunc_div(-7, -2) == 3


# --- sketches ----------------------------------------------------------------


def test_cms_never_underestimates(spark):
    from bigdata_spark.plans.extended import approx_cms_topk

    rows = approx_cms_topk(spark, SF).collect()
    assert len(rows) == 10
    for r in rows:
        assert r["overestimate"] >= 0  # structural CMS guarantee
        assert r["cms_est"] >= r["true_cnt"]


# --- boosting / logreg -------------------------------------------------------


def test_gbt_sse_monotone_decreasing(spark):
    from bigdata_spark.plans.mlq import ml_gbt_stumps

    rows = sorted(ml_gbt_stumps(spark, SF).collect(), key=lambda r: r["round"])
    assert [r["round"] for r in rows] == [1, 2, 3]
    sses = [r["sse_micro2"] for r in rows]
    # squared loss cannot increase when adding a best-split stump whose
    # leaves are (quantized) residual means; allow the 1-micro-unit
    # truncation slack per row
    n = rows[0]["n"]
    for a, b in zip(sses, sses[1:]):
        assert b <= a + n
    for r in rows:
        assert 0 <= r["thr_bin"] < 15
        assert 1 <= r["feat"] <= 4


def test_logreg_beats_majority_class(spark):
    from bigdata_spark.plans.mlq import ml_logreg_gd
    from bigdata_spark.sources.catalog import load_table

    row = ml_logreg_gd(spark, SF).first()
    e = load_table(spark, SF, "embeddings")
    n = e.count()
    pos = e.filter("label >= 5").count()
    majority = max(pos, n - pos) / n
    # 3 GD steps on weak features won't be great, but accuracy is a
    # valid probability and the weights moved off the origin
    assert 0.0 <= row["train_acc"] <= 1.0
    assert any(abs(row[f"w{j}"]) > 0 for j in range(5))
    assert row["train_acc"] >= majority - 0.25


# --- text pipeline -----------------------------------------------------------


def test_url_dedup_collapses_noise_variants(spark):
    from bigdata_spark.plans.textq import llm_url_dedup

    rows = llm_url_dedup(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["n_urls"] >= r["n_canonical"]
        assert r["dup_factor"] >= 1.0
        # canonical hosts are normalized: lowercase, no www.
        assert r["host"] == r["host"].lower()
        assert not r["host"].startswith("www.")


def test_perplexity_buckets_partition_docs(spark):
    from bigdata_spark.plans.textq import llm_perplexity_buckets
    from bigdata_spark.sources.catalog import load_table

    rows = sorted(
        llm_perplexity_buckets(spark, SF).collect(), key=lambda r: r["bucket"]
    )
    assert [r["bucket"] for r in rows] == [1, 2, 3]
    d = load_table(spark, SF, "documents")
    n_scorable = d.filter("length(trim(text)) > 0").count()
    assert sum(r["n_docs"] for r in rows) <= n_scorable
    # tertiles ordered by construction: per-bucket mean surprisal rises
    means = [r["sum_surprisal_micro"] / r["sum_bigrams"] for r in rows]
    assert means == sorted(means)
    for r in rows:
        assert r["bucket_perplexity"] > 1.0


# --- spatial / planning ------------------------------------------------------


def test_quadkey_parents_are_contiguous_z_ranges(spark):
    from bigdata_spark.plans.simq import geo_quadkey_rollup

    rows = geo_quadkey_rollup(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["z_range_contiguous"] is True
        assert r["n_points"] >= r["n_leaf_cells"] >= 1
        assert 0 <= r["parent_cell"] < 4**6


def test_power_analysis_monotone_in_mde(spark):
    from bigdata_spark.plans.statsq import stat_power_analysis

    rows = sorted(
        stat_power_analysis(spark, SF).collect(), key=lambda r: r["mde_abs"]
    )
    assert [round(r["mde_abs"], 2) for r in rows] == [0.01, 0.02, 0.05]
    ns = [r["n_per_arm"] for r in rows]
    # bigger detectable effects need fewer samples
    assert ns == sorted(ns, reverse=True)
    p0 = rows[0]["baseline_rate"]
    assert 0.0 < p0 < 1.0
    # closed form sanity at the first delta
    za, zb = 1.959963984540054, 0.8416212335729143
    p1 = p0 + 0.01
    expect = math.ceil(
        (za + zb) ** 2 * (p0 * (1 - p0) + p1 * (1 - p1)) / 0.01**2
    )
    assert abs(ns[0] - expect) <= 1


# --- time-series stats -------------------------------------------------------


def test_acf_values_in_range(spark):
    from bigdata_spark.plans.statsq import stat_acf

    rows = stat_acf(spark, SF).collect()
    assert [r["lag"] for r in rows] == [1, 2, 3, 4, 5]
    for r in rows:
        assert -1.0 - 1e-9 <= r["acf"] <= 1.0 + 1e-9


def test_ewma_between_min_max_of_window(spark):
    from bigdata_spark.plans.statsq import stat_ewma

    rows = stat_ewma(spark, SF).collect()
    assert rows
    revs = [r["revenue"] for r in rows]
    for i, r in enumerate(rows):
        window = revs[max(0, i - 9) : i + 1]
        assert min(window) - 1e-6 <= r["ewma"] <= max(window) + 1e-6


def test_theil_sen_agrees_with_numpy(spark):
    import numpy as np

    from bigdata_spark.plans.statsq import stat_theil_sen
    from bigdata_spark.sources.catalog import load_table
    from pyspark.sql import functions as F

    row = stat_theil_sen(spark, SF).first()
    o = load_table(spark, SF, "orders")
    monthly = (
        o.groupBy(F.date_trunc("month", "o_orderdate").alias("m"))
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("rev"))
        .orderBy("m")
        .collect()
    )
    ys = np.array([r["rev"] for r in monthly])
    slopes = []
    for i in range(len(ys)):
        for j in range(i + 1, len(ys)):
            slopes.append((ys[j] - ys[i]) / (j - i))
    assert math.isclose(
        row["theil_sen_slope"], float(np.median(slopes)), rel_tol=1e-9, abs_tol=1e-6
    )
    assert row["n_pairs"] == len(slopes)


def test_gini_matches_definition(spark):
    from bigdata_spark.plans.statsq import stat_gini_lorenz
    from bigdata_spark.sources.catalog import load_table
    from pyspark.sql import functions as F

    row = stat_gini_lorenz(spark, SF).first()
    o = load_table(spark, SF, "orders")
    spend = sorted(
        r["s"]
        for r in o.groupBy("o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("s"))
        .collect()
    )
    n = len(spend)
    mean_abs = sum(abs(a - b) for a in spend for b in spend) / (n * n)
    gini_def = mean_abs / (2 * sum(spend) / n)
    assert 0.0 <= row["gini"] <= 1.0
    assert math.isclose(row["gini"], gini_def, rel_tol=0, abs_tol=1.5 / n)
