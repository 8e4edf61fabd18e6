"""Degenerate-bucket skew guards in the LSH band join and the n-gram
inverted index (round-4 VERDICT task): a boilerplate corpus — many
IDENTICAL documents sharing every band hash / every shingle — must (a)
produce exactly the right pairs and (b) spread its candidate fan-out
across salted reducers instead of one.

The 1k-identical-docs stress of the VERDICT runs at a reduced size in
CI (the full 1k fixture generates ~500k pairs; the semantics and the
salt spread are size-independent) — the full-size run is the
``dedup_skew_stress`` bench/registry entry.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdata_spark.dedup.minhash import minhash_dup_pairs
from bigdata_spark.dedup.ngram import ngram_jaccard_pairs


N_IDENTICAL = 60
BOILER = "all rights reserved copyright notice terms of service apply here"


@pytest.fixture(scope="module")
def boiler_docs(spark):
    rows = [(i, BOILER) for i in range(N_IDENTICAL)] + [
        (1000, "a genuinely unique document about owls and lighthouses"),
        (1001, "another unique document concerning tidal phenomena offshore"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_ngram_identical_docs_all_pairs_survive_salting(boiler_docs):
    pairs = ngram_jaccard_pairs(
        boiler_docs, threshold=0.5, hot_token_df=8, n_salts=4
    ).collect()
    expect = {(a, b) for a in range(N_IDENTICAL) for b in range(N_IDENTICAL) if a < b}
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert got == expect
    assert all(r["jaccard"] == 1.0 for r in pairs)


def test_ngram_salting_inert_below_threshold(boiler_docs):
    # identical output whether the hot path fires or not
    hot = ngram_jaccard_pairs(boiler_docs, threshold=0.5, hot_token_df=8, n_salts=4)
    cold = ngram_jaccard_pairs(
        boiler_docs, threshold=0.5, hot_token_df=10**6, n_salts=4
    )
    assert sorted(map(tuple, hot.collect())) == sorted(map(tuple, cold.collect()))


def test_minhash_identical_docs_all_pairs_survive_salting(boiler_docs):
    pairs = minhash_dup_pairs(
        boiler_docs,
        num_perm=16,
        bands=4,
        jaccard_threshold=0.9,
        hot_bucket_df=8,
        n_salts=4,
    ).collect()
    expect = {(a, b) for a in range(N_IDENTICAL) for b in range(N_IDENTICAL) if a < b}
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert got == expect


def test_minhash_bucket_cap_drops_degenerate_bucket(boiler_docs):
    # with the cap below the boilerplate group size, the m² candidate
    # storm is excluded entirely (documented recall trade) — unique
    # docs are unaffected
    pairs = minhash_dup_pairs(
        boiler_docs,
        num_perm=16,
        bands=4,
        jaccard_threshold=0.9,
        max_bucket_df=16,
    ).collect()
    assert pairs == []


def test_salt_spread_bounds_per_reducer_candidates(boiler_docs):
    """The guard's point: the hot bucket's b-side rows spread over >1
    salt, so no single reducer holds the whole m×m fan-out."""
    from bigdata_spark.functions.hashing import shingles

    base = boiler_docs.select(
        F.col("doc_id"),
        F.lit(0).alias("_bucket"),
        F.explode(shingles(F.col("text"), n=3)).alias("tok"),
    )
    n_salts = 4
    salts = (
        base.withColumn(
            "_salt", F.pmod(F.xxhash64(F.col("doc_id")), F.lit(n_salts)).cast("int")
        )
        .groupBy("tok")
        .agg(F.countDistinct("_salt").alias("n"), F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= 8)
        .collect()
    )
    assert salts, "stress fixture must produce hot shingles"
    for r in salts:
        assert r["n"] > 1, f"hot shingle {r['tok']!r} landed on one salt"
