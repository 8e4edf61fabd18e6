"""Invariant tests for the statistics query family (plans/statsq.py).

The cross-engine value check lives in the oracle gate; these assert the
mathematical invariants that a hash match alone would not explain."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_reg_group_matches_duckdb_builtin(spark):
    """Our exact-sum closed form vs DuckDB's native regr_* aggregates
    (an INDEPENDENT implementation, unlike the oracle which shares the
    formula)."""
    import duckdb

    from bigdata_spark.plans.statsq import stat_reg_group

    rows = {r["l_returnflag"]: r for r in stat_reg_group(spark, SF).collect()}
    assert set(rows) == {"A", "N", "R"}
    ref = duckdb.sql(
        "SELECT l_returnflag, regr_slope(l_extendedprice, l_quantity) s,"
        " regr_intercept(l_extendedprice, l_quantity) i,"
        " regr_r2(l_extendedprice, l_quantity) r2"
        f" FROM '{SF}/lineitem.parquet' GROUP BY 1"
    ).fetchall()
    for flag, s, i, r2 in ref:
        got = rows[flag]
        assert abs(got["slope"] - s) < 1e-6 * max(1.0, abs(s))
        assert abs(got["intercept"] - i) < 1e-6 * max(1.0, abs(i))
        assert abs(got["r2"] - r2) < 1e-9
        assert 0.0 <= got["r2"] <= 1.0


def test_corr_matrix_matches_duckdb_builtin(spark):
    import duckdb

    from bigdata_spark.plans.statsq import stat_corr_matrix

    rows = stat_corr_matrix(spark, SF).collect()
    assert len(rows) == 6
    by_pair = {r["pair"]: r["pearson_r"] for r in rows}
    for r in rows:
        assert -1.0 <= r["pearson_r"] <= 1.0
    ref = duckdb.sql(
        "SELECT corr(l_quantity, l_extendedprice) a, corr(l_discount, l_tax) b"
        f" FROM '{SF}/lineitem.parquet'"
    ).fetchone()
    assert abs(by_pair["quantity~extendedprice"] - ref[0]) < 1e-9
    assert abs(by_pair["discount~tax"] - ref[1]) < 1e-9


def test_ab_welch_invariants(spark):
    from bigdata_spark.plans.statsq import stat_ab_welch

    rows = stat_ab_welch(spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["n_arm_a"] > 1 and r["n_arm_b"] > 1
        # Welch df is bounded by (min single-arm df, pooled df)
        assert r["welch_df"] >= min(r["n_arm_a"], r["n_arm_b"]) - 1
        assert r["welch_df"] <= r["n_arm_a"] + r["n_arm_b"] - 2
        # arm split is a hash of user_id, not value: means must be close
        assert abs(r["mean_a"] - r["mean_b"]) < 0.5 * max(r["mean_a"], r["mean_b"])


def test_reg_multi_matches_numpy_lstsq(spark):
    """The Cramer closed form vs numpy's SVD-based lstsq — fully
    independent solvers must agree to high precision."""
    import numpy as np

    from bigdata_spark.plans.statsq import stat_reg_multi

    rows = {r["l_returnflag"]: r for r in stat_reg_multi(spark, SF).collect()}
    import duckdb

    data = duckdb.sql(
        "SELECT l_returnflag, l_quantity, l_discount, l_extendedprice"
        f" FROM '{SF}/lineitem.parquet'"
    ).fetchall()
    by_flag: dict[str, list] = {}
    for flag, q, d, y in data:
        by_flag.setdefault(flag, []).append((q, d, y))
    for flag, rs in by_flag.items():
        arr = np.array(rs)
        X = np.column_stack([np.ones(len(arr)), arr[:, 0], arr[:, 1]])
        beta, *_ = np.linalg.lstsq(X, arr[:, 2], rcond=None)
        got = rows[flag]
        assert abs(got["intercept"] - beta[0]) < 1e-5 * max(1, abs(beta[0]))
        assert abs(got["beta_quantity"] - beta[1]) < 1e-5 * max(1, abs(beta[1]))
        assert abs(got["beta_discount"] - beta[2]) < 1e-4 * max(1, abs(beta[2]))


def test_mannwhitney_matches_bruteforce(spark):
    """Exact average-rank U statistic recomputed in pure Python over
    the same filtered sample."""
    from bigdata_spark.plans.statsq import stat_mannwhitney
    from bigdata_spark.sources.catalog import load_table

    sf = "/root/testdata/sf0.001"
    rows = (
        load_table(spark, sf, "lineitem")
        .filter("l_returnflag IN ('A', 'R')")
        .select("l_returnflag", "l_quantity")
        .collect()
    )
    sample = [(r["l_returnflag"] == "A", int(r["l_quantity"])) for r in rows]
    vals = sorted({v for _, v in sample})
    cnt = {v: 0 for v in vals}
    cnt1 = {v: 0 for v in vals}
    for g1, v in sample:
        cnt[v] += 1
        cnt1[v] += g1
    cum, r2 = 0, {}
    for v in vals:
        r2[v] = 2 * cum + cnt[v] + 1
        cum += cnt[v]
    n1 = sum(cnt1.values())
    n2 = sum(cnt.values()) - n1
    r1x2 = sum(cnt1[v] * r2[v] for v in vals)
    u1x2 = r1x2 - n1 * (n1 + 1)
    tie_t = sum(c**3 - c for c in cnt.values())

    got = stat_mannwhitney(spark, sf).collect()[0]
    assert (got["n1"], got["n2"]) == (n1, n2)
    assert got["u1x2"] == u1x2
    assert got["tie_t"] == tie_t
    import math

    sigma2 = (n1 * n2 / 12) * ((n1 + n2 + 1) - tie_t / ((n1 + n2) * (n1 + n2 - 1.0)))
    z = (u1x2 - float(n1) * n2) / (2.0 * math.sqrt(sigma2))
    assert abs(got["z"] - z) < 1e-9
    assert abs(got["rank_biserial"] - (float(n1) * n2 - u1x2) / (n1 * n2)) < 1e-12


def test_ks_test_matches_bruteforce(spark):
    from bigdata_spark.plans.statsq import stat_ks_test
    from bigdata_spark.sources.catalog import load_table

    sf = "/root/testdata/sf0.001"
    rows = (
        load_table(spark, sf, "lineitem")
        .filter("l_returnflag IN ('A', 'R')")
        .select("l_returnflag", "l_quantity")
        .collect()
    )
    a = sorted(int(r["l_quantity"]) for r in rows if r["l_returnflag"] == "A")
    b = sorted(int(r["l_quantity"]) for r in rows if r["l_returnflag"] == "R")
    n1, n2 = len(a), len(b)
    d_num = 0
    for v in sorted(set(a) | set(b)):
        c1 = sum(1 for x in a if x <= v)
        c2 = sum(1 for x in b if x <= v)
        d_num = max(d_num, abs(c1 * n2 - c2 * n1))
    got = stat_ks_test(spark, sf).collect()[0]
    assert (got["n1"], got["n2"], got["d_num"]) == (n1, n2, d_num)
    assert abs(got["ks_d"] - d_num / (n1 * n2)) < 1e-12


def test_bootstrap_ci_brackets_point_and_reproduces(spark):
    import hashlib

    from bigdata_spark.plans.statsq import _BOOT_B, stat_bootstrap_ci
    from bigdata_spark.sources.catalog import load_table

    sf = "/root/testdata/sf0.001"
    rows = (
        load_table(spark, sf, "orders")
        .selectExpr("o_orderkey", "CAST(o_totalprice AS DECIMAL(18,2)) AS v")
        .collect()
    )
    from decimal import Decimal

    means = []
    for b in range(1, _BOOT_B + 1):
        tot, n = Decimal(0), 0
        for r in rows:
            h = int(hashlib.md5(f"{b}|{r['o_orderkey']}".encode()).hexdigest()[:15], 16)
            if h % 2 == 0:
                tot += r["v"]
                n += 1
        means.append(float(tot) / n)
    got = stat_bootstrap_ci(spark, sf).collect()[0]
    assert got["n_replicates"] == _BOOT_B
    assert abs(got["boot_lo"] - min(means)) < 1e-9
    assert abs(got["boot_hi"] - max(means)) < 1e-9
    assert got["boot_lo"] <= got["point_mean"] <= got["boot_hi"]
