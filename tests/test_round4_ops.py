"""Unit tests for the round-4 session additions: duplicated-substring
windows, training-mixture sampling, SCD2, SemDeDup, fixed-point
PageRank."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest


# --- duplicated-substring windows ----------------------------------------

def test_substring_dup_stats(spark):
    from bigdata_spark.dedup.substring import duplicate_window_stats

    # k=3: doc 1/2 share "a b c d" (two 3-windows); doc 3 is unique;
    # doc 4 too short for any window
    df = spark.createDataFrame(
        [
            (1, "a b c d x y z"),
            (2, "p q a b c d"),
            (3, "one two three four five"),
            (4, "tiny doc"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in duplicate_window_stats(df, k=3).collect()
    }
    assert out[1]["n_windows"] == 5 and out[1]["n_dup"] == 2
    assert out[2]["n_windows"] == 4 and out[2]["n_dup"] == 2
    assert out[3]["n_dup"] == 0
    assert out[4]["n_windows"] == 0 and out[4]["dup_frac"] == 0.0
    assert abs(out[1]["dup_frac"] - 2 / 5) < 1e-9


def test_substring_within_doc_repeat_counts(spark):
    from bigdata_spark.dedup.substring import duplicate_window_stats

    # the same window twice WITHIN one doc is a duplicate (global
    # occurrence count ≥ 2), matching Lee et al. semantics
    df = spark.createDataFrame(
        [(1, "x y z q x y z")], "doc_id long, text string"
    )
    row = duplicate_window_stats(df, k=3).collect()[0]
    # windows: xyz yzq zqx qxy xyz → the two xyz occurrences are dups
    assert row["n_windows"] == 5 and row["n_dup"] == 2


# --- training-mixture sampling -------------------------------------------

def _mix_corpus(spark):
    rows = [(i, "tok " * 12, f"src{i % 2}") for i in range(200)]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_mixture_sample_deterministic_and_budgeted(spark):
    from bigdata_spark.operators.mixture import mixture_sample

    df = _mix_corpus(spark)
    w = {"src0": 3, "src1": 1}
    kept1 = sorted(r["doc_id"] for r in mixture_sample(df, w).collect())
    kept2 = sorted(
        r["doc_id"]
        for r in mixture_sample(df.repartition(7), w).collect()
    )
    assert kept1 == kept2  # partition-layout independent
    assert 0 < len(kept1) < 200


def test_mixture_rates_follow_weights(spark):
    from bigdata_spark.operators.mixture import mixture_rates

    df = _mix_corpus(spark)
    rates = {
        r["source"]: (float(r["num"]) / float(r["den"]))
        for r in mixture_rates(df, {"src0": 3, "src1": 1}).collect()
    }
    # equal-sized sources: rate ratio == weight ratio
    assert rates["src0"] / rates["src1"] == pytest.approx(3.0, rel=1e-6)


def test_mixture_saturates_at_one(spark):
    from bigdata_spark.operators.mixture import mixture_sample

    # a tiny source with a huge weight: its token target exceeds its
    # size, so the rate saturates at 1 and every doc is kept
    rows = [(i, "tok " * 12, "src0" if i < 190 else "src1") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    kept = mixture_sample(df, {"src0": 1, "src1": 1000}).collect()
    n_src1 = sum(1 for r in kept if r["source"] == "src1")
    assert n_src1 == 10


# --- SCD2 ----------------------------------------------------------------

def test_scd2_runs_and_intervals(spark):
    from bigdata_spark.operators.scd import scd2_from_changes

    df = spark.createDataFrame(
        [
            (1, "a", "2024-01-01 00:00:00", 10),
            (1, "a", "2024-01-02 00:00:00", 11),  # no change → collapsed
            (1, "b", "2024-01-03 00:00:00", 12),
            (1, "a", "2024-01-04 00:00:00", 13),  # back to a → new run
            (2, "x", "2024-01-01 00:00:00", 14),
        ],
        "user_id long, status string, ts_s string, event_id long",
    ).withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")
    out = scd2_from_changes(df, ["user_id"], "status", "ts", "event_id")
    u1 = sorted(
        [r for r in out.collect() if r["user_id"] == 1],
        key=lambda r: r["valid_from"],
    )
    assert [r["status"] for r in u1] == ["a", "b", "a"]
    # intervals chain: each valid_to equals the next valid_from
    assert u1[0]["valid_to"] == u1[1]["valid_from"]
    assert u1[1]["valid_to"] == u1[2]["valid_from"]
    assert u1[2]["valid_to"] is None and u1[2]["is_current"]
    assert not u1[0]["is_current"]


def test_scd2_tiebreak_deterministic(spark):
    from bigdata_spark.operators.scd import scd2_from_changes

    # two observations at the SAME ts — event_id orders them
    df = spark.createDataFrame(
        [
            (1, "a", "2024-01-01 00:00:00", 2),
            (1, "b", "2024-01-01 00:00:00", 1),
        ],
        "user_id long, status string, ts_s string, event_id long",
    ).withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")
    out = scd2_from_changes(df, ["user_id"], "status", "ts", "event_id")
    rows = sorted(out.collect(), key=lambda r: not r["is_current"])
    assert rows[0]["status"] == "a"  # event_id 2 is the later version


# --- SemDeDup ------------------------------------------------------------

def test_semantic_dedup_drops_exact_dups(spark):
    from bigdata_spark.dedup.semantic import semantic_dedup

    # three exact copies of one vector + two orthogonal singles
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [1.0, 0.0, 0.0, 0.0]),
        (3, [1.0, 0.0, 0.0, 0.0]),
        (4, [0.0, 1.0, 0.0, 0.0]),
        (5, [0.0, 0.0, 1.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r["is_dropped"] for r in
           semantic_dedup(df, n_clusters=2, threshold=0.9).collect()}
    assert out[1] is False          # lowest id of the dup group survives
    assert out[2] and out[3]        # copies dropped
    # orthogonal vectors never reach 0.9 cosine with anything
    assert out[4] is False and out[5] is False


# --- fixed-point PageRank ------------------------------------------------

def _pr(spark, nodes, edges, **kw):
    from bigdata_spark.operators.graph import pagerank_fixed_point

    ndf = spark.createDataFrame([(n,) for n in nodes], "node long")
    edf = spark.createDataFrame(edges, "src long, dst long, w long")
    return {
        r["node"]: r["mass"]
        for r in pagerank_fixed_point(ndf, edf, **kw).collect()
    }


def test_pagerank_star_ranks_center_highest(spark):
    # spokes all point at node 0
    masses = _pr(spark, range(5), [(i, 0, 1) for i in range(1, 5)])
    assert masses[0] == max(masses.values())
    assert len({masses[i] for i in range(1, 5)}) == 1  # spokes tie


def test_pagerank_mass_bounds_and_determinism(spark):
    edges = [(0, 1, 2), (1, 2, 1), (2, 0, 1), (1, 0, 3)]
    m1 = _pr(spark, range(3), edges, iterations=5)
    m2 = _pr(spark, range(3), edges, iterations=5)
    assert m1 == m2  # bit-identical across runs
    scale = 1_000_000_000_000
    total = sum(m1.values())
    # truncation only loses mass — never creates it
    assert total <= 3 * scale
    assert all(m >= scale * 3 // 20 for m in m1.values())  # ≥ teleport base


# --- versioned delete + CDC ----------------------------------------------

def test_versioned_delete_and_changes(spark, tmp_path):
    from bigdata_spark.streaming.upsert_sink import (
        VersionedParquetTable,
        versioned_changes,
        versioned_delete_where,
    )

    t = VersionedParquetTable(spark, str(tmp_path / "tbl"), keep_versions=4)
    df0 = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    v0 = t.publish(df0)
    t.publish(spark.createDataFrame([(1, "a"), (2, "B"), (3, "c"), (4, "d")],
                                    "k long, v string"))
    v2 = versioned_delete_where(t, F.col("k") == 3)
    assert sorted(r["k"] for r in t.read().collect()) == [1, 2, 4]
    # the deleted version's predecessor is intact (immutability)
    assert sorted(r["k"] for r in t.read_version(v0).collect()) == [1, 2, 3]
    cdc = {r["k"]: r["_change_type"]
           for r in versioned_changes(t, v0, v2, ["k"]).collect()}
    assert cdc == {2: "update", 3: "delete", 4: "insert"}


def test_versioned_delete_null_predicate_retains(spark, tmp_path):
    from bigdata_spark.streaming.upsert_sink import (
        VersionedParquetTable,
        versioned_delete_where,
    )

    t = VersionedParquetTable(spark, str(tmp_path / "tbl"), keep_versions=2)
    t.publish(spark.createDataFrame(
        [(1, "x"), (2, None)], "k long, v string"
    ))
    versioned_delete_where(t, F.col("v") == "x")
    # row 2's predicate is NULL → retained, SQL DELETE semantics
    assert [r["k"] for r in t.read().collect()] == [2]


# --- product quantization ------------------------------------------------

def test_pq_encode_shape_and_determinism(spark):
    from bigdata_spark.similarity.pq import pq_encode, train_pq_codebooks

    import random
    rng = random.Random(7)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    c = df.select(F.col("vec_id").alias("corpus_id"),
                  F.col("embedding").cast("array<double>").alias("c_vec"))
    books = train_pq_codebooks(c, m_subspaces=4, k_codes=4, dim=8, seed=1)
    assert len(books) == 4 and all(len(b) == 4 for b in books)
    assert all(len(cw) == 2 for b in books for cw in b)
    enc1 = {r["corpus_id"]: r["codes"] for r in pq_encode(df, books).collect()}
    enc2 = {r["corpus_id"]: r["codes"] for r in pq_encode(df, books).collect()}
    assert enc1 == enc2
    assert all(0 <= code < 4 for codes in enc1.values() for code in codes)


def test_pq_topk_identical_vector_is_top1(spark):
    from bigdata_spark.similarity.pq import pq_topk

    import random
    rng = random.Random(3)
    base = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(40)]
    # vec 100 is an exact copy of vec 0 → ADC distance 0, must be its top-1
    rows = base + [(100, list(base[0][1]))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.filter(F.col("vec_id") == 0)
    out = pq_topk(q, df, k=3, m_subspaces=4, k_codes=8, seed=5).collect()
    top1 = [r for r in out if r["rank"] == 1][0]
    # ADC distance to the exact copy equals the QUERY's own quantization
    # residual (both share the same codes), so it is minimal but not 0
    assert top1["corpus_id"] == 100
    assert all(top1["adc_dist"] <= r["adc_dist"] for r in out)


# --- data-quality expectations -------------------------------------------

def test_expectations_count_violations(spark):
    from bigdata_spark.operators.profile import (
        check_expectations,
        expect_in_range,
        expect_in_set,
        expect_not_null,
        expect_references,
        expect_unique,
    )

    t = spark.createDataFrame(
        [(1, 5.0, "ok"), (1, -2.0, "ok"), (2, None, "bad"), (3, 150.0, None)],
        "k long, v double, s string",
    )
    dim = spark.createDataFrame([(1,), (3,)], "pk long")
    out = {
        r["check_name"]: (r["n_violations"], r["passed"])
        for r in check_expectations(
            {
                "unique_k": expect_unique(t, "k"),         # k=1 twice → 1
                "v_not_null": expect_not_null(t, "v"),     # one null → 1
                "v_range": expect_in_range(t, "v", 0.0, 100.0),  # -2, 150 → 2
                "s_set": expect_in_set(t, "s", ["ok"]),    # 'bad' → 1 (null not counted)
                "k_refs": expect_references(t, "k", dim, "pk"),  # k=2 orphan → 1
            }
        ).collect()
    }
    assert out["unique_k"] == (1, False)
    assert out["v_not_null"] == (1, False)
    assert out["v_range"] == (2, False)
    assert out["s_set"] == (1, False)
    assert out["k_refs"] == (1, False)


def test_profile_columns_nulls_and_distinct(spark):
    from bigdata_spark.operators.profile import profile_columns

    t = spark.createDataFrame(
        [(1, "a"), (2, None), (2, "b")], "k long, s string"
    )
    out = {r["column_name"]: r for r in profile_columns(t, ["k", "s"]).collect()}
    assert out["k"]["n_rows"] == 3 and out["k"]["n_nulls"] == 0
    assert out["k"]["n_distinct"] == 2
    assert out["s"]["n_nulls"] == 1 and out["s"]["n_distinct"] == 2
    assert out["k"]["min_value"] == "1" and out["k"]["max_value"] == "2"
