"""Text analysis + dedup operator tests."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from bigdata_spark.dedup.exact import exact_dedup, exact_dup_groups
from bigdata_spark.dedup.minhash import minhash_dup_pairs, minhash_signature
from bigdata_spark.dedup.ngram import ngram_jaccard_pairs
from bigdata_spark.dedup.simhash import simhash64
from bigdata_spark.functions.hashing import portable_hash64, shingles
from bigdata_spark.text.analysis import doc_fingerprint, language_id, quality_features, token_count


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog", "en"),
        (2, "the quick brown fox jumps over the lazy cat", "en"),  # near-dup of 1
        (3, "der hund ist nicht ein katze und der vogel", "de"),
        (4, "THE  Quick   Brown Fox jumps over the lazy dog", "en"),  # exact dup of 1 mod ws/case
        (5, "completely different words entirely unrelated text here", "en"),
        (6, "", "und"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_token_count(docs):
    out = {r["doc_id"]: r["n"] for r in docs.select("doc_id", token_count("text").alias("n")).collect()}
    assert out[1] == 9
    assert out[6] == 0  # empty text → 0, not 1


def test_portable_hash_matches_python_md5(spark):
    df = spark.createDataFrame([("hello",)], "s string")
    got = df.select(portable_hash64("s", seed=3).alias("h")).first()["h"]
    expected = int(hashlib.md5(b"3|hello").hexdigest()[:15], 16)
    assert got == expected


def test_shingles(spark):
    df = spark.createDataFrame([("a b c d",), ("a b",)], "s string")
    out = df.select(shingles("s", 3).alias("sh")).collect()
    assert sorted(out[0]["sh"]) == ["a b c", "b c d"]
    assert out[1]["sh"] == ["a b"]  # shorter than n → whole doc


def test_language_id(docs):
    out = {r["doc_id"]: r["g"] for r in docs.select("doc_id", language_id("text").alias("g")).collect()}
    assert out[1] == "en"
    assert out[3] == "de"
    assert out[6] == "und"


def test_quality_features(docs):
    q = quality_features("text")
    r = docs.filter(F.col("doc_id") == 1).select(
        q["n_tokens"].alias("t"), q["stopword_ratio"].alias("sr"), q["punct_ratio"].alias("pr")
    ).first()
    assert r["t"] == 9
    assert r["sr"] == pytest.approx(2 / 9)  # the ×2
    assert r["pr"] == 0.0


def test_exact_dedup(docs):
    groups = exact_dup_groups(docs).collect()
    assert len(groups) == 1
    assert groups[0]["doc_ids"] == [1, 4]
    kept = exact_dedup(docs)
    assert kept.count() == 5
    assert 4 not in {r["doc_id"] for r in kept.collect()}  # lowest id kept


def test_fingerprint_ws_case_invariant(docs):
    fp = {r["doc_id"]: r["f"] for r in docs.select("doc_id", doc_fingerprint("text").alias("f")).collect()}
    assert fp[1] == fp[4]
    assert fp[1] != fp[2]


def test_minhash_near_dup(docs):
    pairs = minhash_dup_pairs(docs, num_perm=16, bands=8, jaccard_threshold=0.4).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (1, 2) in found or (1, 4) in found  # near/exact dups surface
    # signature shape
    sig = minhash_signature(docs, num_perm=16).first()
    assert len(sig["sig"]) == 16


def test_simhash_close_for_near_dups(docs):
    sh = {r["doc_id"]: r["s"] for r in docs.select("doc_id", simhash64(F.col("text")).alias("s")).collect()}
    ham_12 = bin(sh[1] ^ sh[2]).count("1")
    ham_15 = bin(sh[1] ^ sh[5]).count("1")
    assert sh[1] == sh[4]  # same token set
    assert ham_12 < ham_15  # near-dup closer than unrelated


def test_ngram_jaccard(docs):
    pairs = ngram_jaccard_pairs(docs, threshold=0.5).collect()
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs}
    assert (1, 4) in got and got[(1, 4)] == pytest.approx(1.0)
    assert (1, 2) in got  # 9-token docs differing in last word


def test_symspell_join_completeness_vs_bruteforce(spark):
    """Deletion-neighborhood blocking must find EVERY lev<=1 pair:
    cross-check against itertools brute force on real sf0.001 names."""
    from itertools import combinations

    from bigdata_spark.plans.dedupq import dedup_symspell_join

    sf = "/root/testdata/sf0.001"
    got = {
        (r["name_a"], r["name_b"], r["edit_dist"])
        for r in dedup_symspell_join(spark, sf).collect()
    }

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    names = sorted(
        {r["p_name"] for r in spark.read.parquet(f"{sf}/part.parquet").collect()}
    )
    want = {
        (a, b, lev(a, b))
        for a, b in combinations(names, 2)
        if lev(a, b) <= 1
    }
    assert got == want
