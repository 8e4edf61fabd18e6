"""Round-8 second-wave invariants: cross-entry identities the value
oracle can't express (Shapley efficiency, absorption lower bounds,
motif consistency, DeLong bounds)."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_shapley_efficiency_identity(spark):
    """Σ_i shapley_i = v(grand coalition) − v(empty) — the efficiency
    axiom, recomputed from the same coalition values."""
    from bigdata_spark.plans.events import evt_shapley_attribution
    from bigdata_spark.sources.catalog import load_table

    rows = evt_shapley_attribution(spark, SF).collect()
    total_x24 = sum(r["shap_x24_ppm"] for r in rows)
    e = load_table(spark, SF, "events")
    users = e.groupBy("user_id").agg(
        F.max((F.col("event_type") == "purchase").cast("int")).alias("conv"),
        (
            F.max((F.col("event_type") == "click").cast("int")) * 1
            + F.max((F.col("event_type") == "error").cast("int")) * 2
            + F.max((F.col("event_type") == "signup").cast("int")) * 4
            + F.max((F.col("event_type") == "view").cast("int")) * 8
        ).alias("mask"),
    ).collect()
    n_all = len(users)
    c_all = sum(u["conv"] for u in users)
    v_grand = c_all * 1_000_000 // n_all
    empty = [u for u in users if u["mask"] == 0]
    v_empty = (
        (sum(u["conv"] for u in empty) * 1_000_000 // len(empty))
        if empty
        else 0
    )
    assert total_x24 == 24 * (v_grand - v_empty)


def test_markov_absorption_bounds(spark):
    from bigdata_spark.plans.events import evt_markov_absorption, _ABS_ITERS

    rows = {r["state"]: r for r in evt_markov_absorption(spark, SF).collect()}
    assert rows["purchase"]["expected_steps_nano"] == 0
    for s, r in rows.items():
        if s == "purchase":
            continue
        # at least one step away, and bounded by the iteration budget
        assert 1.0 <= r["expected_steps"] <= float(_ABS_ITERS)


def test_rectangles_consistency(spark):
    from bigdata_spark.plans.graphq import graph_rectangles

    row = graph_rectangles(spark, SF).collect()[0]
    assert 0 <= row["n_rectangles"]
    # each rectangle needs two distinct wedges on one endpoint pair
    assert 2 * row["n_rectangles"] <= row["n_wedges"] * (row["n_wedges"] - 1)


def test_delong_auc_bounds_and_symmetry(spark):
    from bigdata_spark.plans.statsq import ml_auc_delong

    row = ml_auc_delong(spark, SF).collect()[0]
    assert 0.0 <= row["auc"] <= 1.0
    assert row["delong_se"] >= 0.0
    # with thousands of rows the SE of a mid AUC is small but nonzero
    assert row["delong_se"] < 0.2


def test_jonckheere_matches_bruteforce(spark):
    """2·J recomputed by brute force over the (group, value) histogram
    (midrank convention) equals the windowed aggregation."""
    from collections import defaultdict

    from bigdata_spark.plans.statsq import stat_jonckheere
    from bigdata_spark.sources.catalog import load_table

    row = stat_jonckheere(spark, SF).collect()[0]
    l = load_table(spark, SF, "lineitem").select(
        "l_returnflag", "l_quantity"
    ).collect()
    hist: dict[str, dict[int, int]] = defaultdict(lambda: defaultdict(int))
    for r in l:
        hist[r["l_returnflag"]][int(r["l_quantity"])] += 1
    groups = sorted(hist)
    j2 = 0
    for i, g1 in enumerate(groups):
        for g2 in groups[i + 1 :]:
            for v2, c2 in hist[g2].items():
                below = sum(c for v1, c in hist[g1].items() if v1 < v2)
                ties = hist[g1].get(v2, 0)
                j2 += c2 * (2 * below + ties)
    assert row["j_x2"] == j2


def test_patch_census_arithmetic(spark):
    from bigdata_spark.plans.multimodalq import mm_patch_census, _PATCH

    for r in mm_patch_census(spark, SF).collect():
        assert r["np_x"] == -(-r["w"] // _PATCH)
        assert r["np_y"] == -(-r["h"] // _PATCH)
        assert r["seq_len"] == r["np_x"] * r["np_y"] + 1
        assert r["pad_pixels"] >= 0


def test_reciprocity_in_unit_interval(spark):
    from bigdata_spark.plans.graphq import graph_reciprocity

    row = graph_reciprocity(spark, SF).collect()[0]
    assert 0 <= row["n_reciprocal"] <= row["n_edges"]
    assert 0 <= row["reciprocity_ppm"] <= 1_000_000


def test_best_of_n_dominates_single_draw(spark):
    from bigdata_spark.plans.textq import llm_best_of_n

    for r in llm_best_of_n(spark, SF).collect():
        p = r["accept_ppm"] / 1e6
        assert r["best_of_4_rate"] >= p - 1e-9
        assert r["best_of_4_rate"] <= min(1.0, 4 * p + 1e-9)


def test_oov_plus_vocab_mass_conserved(spark):
    from bigdata_spark.plans.textq import llm_oov_rate

    rows = llm_oov_rate(spark, SF).collect()
    for r in rows:
        assert 0 <= r["n_oov"] <= r["n_tokens"]
        assert 0 <= r["oov_ppm"] <= 1_000_000


def test_contrastive_margin_consistency(spark):
    from bigdata_spark.plans.simq import sim_contrastive_pairs

    for r in sim_contrastive_pairs(spark, SF).collect():
        assert -2.0 <= r["margin"] <= 2.0
        assert abs((r["pos_cos"] - r["neg_cos"]) - r["margin"]) < 1e-6
