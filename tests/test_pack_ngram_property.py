"""Property-based checks (hypothesis) for the round-3 operators:
inverted-index exact Jaccard vs a pure-Python brute force, and the
concat-and-chunk packing invariants. The reference has no randomized
testing at all (SURVEY §5); these pin the operators' algebra on
corpora the fixtures would never enumerate."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]

doc_strategy = st.lists(st.sampled_from(WORDS), min_size=0, max_size=12).map(
    " ".join
)
corpus_strategy = st.lists(doc_strategy, min_size=2, max_size=8)


def _shingles(text: str, n: int = 3) -> frozenset:
    toks = text.strip().lower().split()
    if not toks:
        return frozenset()
    if len(toks) < n:
        return frozenset({" ".join(toks)})
    return frozenset(" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1))


@settings(
    max_examples=10, deadline=None, suppress_health_check=list(HealthCheck)
)
@given(corpus_strategy, st.sampled_from([0.2, 0.5, 0.8]))
def test_ngram_pairs_match_bruteforce(spark, corpus, threshold):
    from bigdata_spark.dedup.ngram import ngram_jaccard_pairs

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string"
    )
    got = {
        (r["id_a"], r["id_b"]): round(r["jaccard"], 9)
        for r in ngram_jaccard_pairs(df, threshold=threshold).collect()
    }
    want = {}
    sh = [_shingles(t) for t in corpus]
    for a in range(len(corpus)):
        for b in range(a + 1, len(corpus)):
            union = len(sh[a] | sh[b])
            jac = len(sh[a] & sh[b]) / union if union else 0.0
            if jac >= threshold and len(sh[a] & sh[b]) > 0:
                want[(a, b)] = round(jac, 9)
    assert got == want


@settings(
    max_examples=10, deadline=None, suppress_health_check=list(HealthCheck)
)
@given(
    st.lists(
        st.tuples(st.sampled_from(["en", "de"]), st.integers(0, 40)),
        min_size=1,
        max_size=12,
    )
)
def test_seq_pack_invariants(spark, docs):
    """Token conservation + every block full except each shard's last."""
    from pyspark.sql import functions as F

    from bigdata_spark.plans.textq import llm_seq_pack

    rows = [
        (i, lang, " ".join(["w"] * nt)) for i, (lang, nt) in enumerate(docs)
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    df.createOrReplaceTempView("documents")

    # drive the packer through a temp view by monkeypatching load_table?
    # simpler: rebuild the same plan inline with block=512 semantics
    import bigdata_spark.plans.textq as textq

    orig = textq.load_table
    textq.load_table = lambda spark_, sf_dir_, name_: df
    try:
        out = llm_seq_pack(spark, "ignored").collect()
    finally:
        textq.load_table = orig

    total_by_lang = {}
    for lang, nt in docs:
        if nt > 0:
            total_by_lang[lang] = total_by_lang.get(lang, 0) + nt
    got_by_lang = {}
    blocks_by_lang = {}
    for r in out:
        got_by_lang[r["lang"]] = got_by_lang.get(r["lang"], 0) + r["n_tokens"]
        blocks_by_lang.setdefault(r["lang"], []).append(
            (r["block_id"], r["n_tokens"], r["is_full"])
        )
    assert got_by_lang == total_by_lang  # no token created or lost
    for lang, blocks in blocks_by_lang.items():
        blocks.sort()
        ids = [b for b, _, _ in blocks]
        assert ids == list(range(len(ids)))  # contiguous blocks from 0
        for _, n_tokens, is_full in blocks[:-1]:
            assert is_full and n_tokens == 512  # only the tail is ragged
        assert blocks[-1][1] <= 512
