"""Text-analysis queries over ``documents`` (driver brief: token
counting, quality scoring, language-ID, fingerprinting).

Oracles replicate the exact same normalization/tokenization in DuckDB
(string_split_regex + list lambdas); the portable md5-derived
fingerprint matches bit-for-bit (functions/hashing.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from ..text.analysis import LANG_MARKERS, doc_fingerprint, language_id, quality_features, token_count

# DuckDB fragment: tokens of trimmed/lowercased text, '' → empty list.
_DUCK_TOKENS = (
    "CASE WHEN trim(lower(text)) = '' THEN CAST([] AS VARCHAR[]) "
    "ELSE string_split_regex(trim(lower(text)), '\\s+') END"
)


def _bound_sql(arr_sql: str, body_sql: str) -> str:
    """SQL-text twin of text.analysis.bound: evaluate ``arr_sql`` once
    per row, bound as lambda variable ``__t`` inside ``body_sql``.

    Catalyst's projection collapse inlines a projected token array into
    every reference — including ``element_at(t, i + 2)`` inside a
    per-bigram lambda, which then re-tokenizes the document once per
    bigram (measured 5-10× on the corpus queries)."""
    return f"element_at(transform(array({arr_sql}), __t -> {body_sql}), 1)"


# bigram enumerator over the bound token array (used by the LM/
# collocation/perplexity entries): (x, i) walks the first n-1 tokens,
# __t is the bound array, {pair} shapes the output element
_BIGRAMS_CONCAT = _bound_sql(
    "t",
    "transform(slice(__t, 1, size(__t) - 1),"
    " (x, i) -> concat(x, ' ', element_at(__t, i + 2)))",
)
_BIGRAMS_STRUCT = _bound_sql(
    "t",
    "transform(slice(__t, 1, size(__t) - 1),"
    " (x, i) -> struct(x AS w1, element_at(__t, i + 2) AS w2))",
)


def txt_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        token_count("text").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars"),
    )


TXT_TOKEN_SQL = f"""
SELECT doc_id,
       CAST(len({_DUCK_TOKENS}) AS BIGINT) AS n_tokens,
       CAST(length(text) AS BIGINT) AS n_chars
FROM documents
"""


def txt_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.parallelism import ensure_parallelism

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    q = quality_features("text")
    return d.select(
        "doc_id",
        q["n_tokens"].alias("n_tokens"),
        F.round(q["punct_ratio"], 9).alias("punct_ratio"),
        F.round(q["stopword_ratio"], 9).alias("stopword_ratio"),
        F.round(q["mean_word_len"], 9).alias("mean_word_len"),
    )


_STOPWORDS_SQL = "('the','and','of','to','a','in','is','it','for','on','with','as','at','by','an')"

TXT_QUALITY_SQL = f"""
WITH base AS (
  SELECT doc_id, text, {_DUCK_TOKENS} AS toks, CAST(length(text) AS BIGINT) AS n_chars
  FROM documents
)
SELECT doc_id,
  CAST(len(toks) AS BIGINT) AS n_tokens,
  ROUND(CASE WHEN n_chars > 0
    THEN CAST(n_chars - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS DOUBLE) / n_chars
    ELSE 0.0 END, 9) AS punct_ratio,
  ROUND(CASE WHEN len(toks) > 0
    THEN CAST(len(list_filter(toks, t -> t IN {_STOPWORDS_SQL})) AS DOUBLE) / len(toks)
    ELSE 0.0 END, 9) AS stopword_ratio,
  ROUND(CASE WHEN len(toks) > 0
    THEN CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE) / len(toks)
    ELSE 0.0 END, 9) AS mean_word_len
FROM base
"""


def txt_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", "lang", language_id("text").alias("lang_guess"))


def _lang_hits_sql(lang: str) -> str:
    markers = ", ".join(f"'{m}'" for m in LANG_MARKERS[lang])
    return f"len(list_filter(toks, t -> t IN ({markers})))"


TXT_LANGID_SQL = f"""
WITH base AS (SELECT doc_id, lang, {_DUCK_TOKENS} AS toks FROM documents),
hits AS (
  SELECT doc_id, lang,
    {_lang_hits_sql('en')} AS h_en, {_lang_hits_sql('de')} AS h_de,
    {_lang_hits_sql('fr')} AS h_fr, {_lang_hits_sql('es')} AS h_es
  FROM base
)
SELECT doc_id, lang,
  CASE WHEN greatest(h_en, h_de, h_fr, h_es) = 0 THEN 'und'
       WHEN h_en = greatest(h_en, h_de, h_fr, h_es) THEN 'en'
       WHEN h_de = greatest(h_en, h_de, h_fr, h_es) THEN 'de'
       WHEN h_fr = greatest(h_en, h_de, h_fr, h_es) THEN 'fr'
       ELSE 'es' END AS lang_guess
FROM hits
"""


def txt_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", doc_fingerprint("text").alias("fingerprint"))


TXT_FINGERPRINT_SQL = """
SELECT doc_id,
  ('0x' || substr(md5('0|' || regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')), 1, 15))::BIGINT
    AS fingerprint
FROM documents
"""


def txt_bpeish_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..text.analysis import bpe_ish_token_count

    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", bpe_ish_token_count("text").alias("n_subword_tokens"))


TXT_BPEISH_SQL = """
SELECT doc_id,
  CAST(len(regexp_extract_all(text, '([A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+)')) AS BIGINT)
    AS n_subword_tokens
FROM documents
"""


def txt_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance (Levenshtein) fuzzy matching over text prefixes —
    the character-level near-dup kernel complementing shingle Jaccard.
    Bucketed by lang and bounded to a doc-id slice so the pair count
    stays linear-ish; at corpus scale the bucket key would be an LSH
    signature (dedup_embedding_pairs pattern). Native JVM expression —
    no Python in the pair loop."""
    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 30)
        .select("doc_id", "lang", F.substring("text", 1, 40).alias("prefix"))
    )
    a, b = d.alias("a"), d.alias("b")
    dist = F.levenshtein(F.col("a.prefix"), F.col("b.prefix"))
    return a.join(
        b,
        on=[
            F.col("a.lang") == F.col("b.lang"),
            F.col("a.doc_id") < F.col("b.doc_id"),
            dist <= 29,
        ],
    ).select(
        F.col("a.doc_id").alias("id_a"),
        F.col("b.doc_id").alias("id_b"),
        dist.cast("long").alias("edit_dist"),
    )


TXT_EDIT_SQL = """
WITH p AS (
  SELECT doc_id, lang, substr(text, 1, 40) AS prefix
  FROM documents WHERE doc_id < 30
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(levenshtein(a.prefix, b.prefix) AS BIGINT) AS edit_dist
FROM p a JOIN p b ON a.lang = b.lang AND a.doc_id < b.doc_id
WHERE levenshtein(a.prefix, b.prefix) <= 29
"""


def txt_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document (corpus-wide term weighting —
    the quality/rarity signal a curation pipeline ranks on).

    Uses the RATIONAL idf variant idf = (N+1)/(df+1) instead of the
    log form: every factor is then a ratio of exact integers, so the
    double arithmetic is bit-identical across engines (ln() is NOT
    cross-engine reproducible at the last ulp — see the float
    discipline in plans/__init__). Monotone in df like the log form.
    Plan shape: one explode, two key-partitioned aggregations (term
    frequencies, document frequencies), a stats/AQE-planned join of the
    vocab-grain term-df
    table back onto the per-doc terms, ranked window with a
    deterministic (score desc, term) tie-break."""
    from ..operators.parallelism import ensure_parallelism
    from pyspark.sql import Window

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    n_docs = d.count()
    toks = d.select(
        "doc_id", F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("term")
    ).filter(F.col("term") != "")
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dlen = toks.groupBy("doc_id").agg(F.count("*").alias("dlen"))
    dfreq = (
        toks.distinct().groupBy("term").agg(F.count("*").alias("df"))
    )
    scored = (
        tf.join(dlen, "doc_id")
        .join(dfreq, "term")
        .withColumn(
            "tfidf",
            (F.col("tf").cast("double") / F.col("dlen"))
            * (F.lit(float(n_docs + 1)) / (F.col("df") + 1)),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "rk", "term", F.round("tfidf", 9).alias("tfidf"))
    )


TXT_TFIDF_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest({_DUCK_TOKENS}) AS term FROM documents
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
dlen AS (SELECT doc_id, COUNT(*) AS dlen FROM toks GROUP BY 1),
dfreq AS (SELECT term, COUNT(*) AS df FROM (SELECT DISTINCT doc_id, term FROM toks) GROUP BY 1),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term,
         (CAST(tf.tf AS DOUBLE) / dlen.dlen)
         * (CAST(n.n_docs + 1 AS DOUBLE) / (dfreq.df + 1)) AS tfidf
  FROM tf JOIN dlen ON tf.doc_id = dlen.doc_id
          JOIN dfreq ON tf.term = dfreq.term, n
),
ranked AS (
  SELECT doc_id, term, tfidf,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rk
  FROM scored
)
SELECT doc_id, rk, term, ROUND(tfidf, 9) AS tfidf FROM ranked WHERE rk <= 3
"""


def llm_seq_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing — the LLM-pretraining data
    layout: within each shard (= lang), documents concatenate in doc_id
    order into one token stream that is cut into fixed 512-token
    context blocks; a document spans every block its [start, end)
    token interval touches. Reports per-(shard, block) document count,
    token count, and fullness.

    Scale shape: the per-shard running offset is grouped_range_rank's
    fused cumsum — every task holds a contiguous (shard, doc_id) range
    and prefix totals broadcast, so parallelism is #partitions even
    when one shard dominates (shards still pack independently; there
    is no global ordering anywhere). All arithmetic is integer-exact."""
    from ..operators.parallelism import ensure_parallelism

    block = 512
    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    nt = d.select(
        "lang", "doc_id", token_count("text").alias("nt")
    ).filter(F.col("nt") > 0)
    # a shard's doc list grows with the corpus while the shard key has
    # bounded cardinality — a lang-partitioned window would sort one
    # shard's docs in ONE task; the running offset rides
    # grouped_range_rank's fused cumsum (range-partitioned) instead
    from ..operators.ranking import grouped_range_rank

    spans = (
        grouped_range_rank(
            nt, ["lang"], ["doc_id"], "_rn", sum_col="nt",
            cumsum_col="end_off",
        )
        .withColumn("start_off", F.col("end_off") - F.col("nt"))
        .drop("_rn", "total")
    )
    expl = spans.select(
        "lang",
        "doc_id",
        "start_off",
        "end_off",
        F.explode(
            F.sequence(
                F.expr(f"start_off div {block}"), F.expr(f"(end_off - 1) div {block}")
            )
        ).alias("block_id"),
    )
    tokens_here = F.least(
        F.col("end_off"), (F.col("block_id") + 1) * block
    ) - F.greatest(F.col("start_off"), F.col("block_id") * block)
    return (
        expl.groupBy("lang", "block_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(tokens_here).alias("n_tokens"),
        )
        .withColumn("is_full", F.col("n_tokens") == block)
    )


LLM_SEQ_PACK_SQL = f"""
WITH base AS (
  SELECT lang, doc_id, CAST(len({_DUCK_TOKENS}) AS BIGINT) AS nt FROM documents
),
spans AS (
  SELECT lang, doc_id, nt,
         SUM(nt) OVER (PARTITION BY lang ORDER BY doc_id
                       ROWS UNBOUNDED PRECEDING) AS end_off
  FROM base WHERE nt > 0
),
expl AS (
  SELECT lang, doc_id, end_off - nt AS start_off, end_off,
         unnest(range(CAST((end_off - nt) // 512 AS BIGINT),
                      CAST((end_off - 1) // 512 + 1 AS BIGINT))) AS block_id
  FROM spans
)
SELECT lang, block_id, COUNT(*) AS n_docs,
       CAST(SUM(least(end_off, (block_id + 1) * 512)
           - greatest(start_off, block_id * 512)) AS BIGINT) AS n_tokens,
       CAST(SUM(least(end_off, (block_id + 1) * 512)
           - greatest(start_off, block_id * 512)) AS BIGINT) = 512 AS is_full
FROM expl GROUP BY 1, 2
"""


def llm_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (the GPT-3/PaLM-style n-gram overlap
    check): flag every corpus document sharing at least one word
    4-gram with the held-out benchmark set (here the deterministic
    doc_id % 97 == 0 slice). Scale shape: n-grams explode per side,
    the benchmark gram set joins by stats/AQE (a REAL benchmark set is
    small and broadcasts; this simulated one grows with the corpus —
    benchmarks are, corpora aren't), and the hit count is a partial
    aggregation on doc_id; nothing is quadratic in the corpus."""
    from ..operators.parallelism import ensure_parallelism
    from ..text.analysis import word_ngrams

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    grams = d.select("doc_id", F.explode(word_ngrams("text", 4)).alias("g"))
    bench = grams.filter(F.col("doc_id") % 97 == 0).select("g").distinct()
    return (
        grams.filter(F.col("doc_id") % 97 != 0)
        .join(bench, "g")
        .groupBy("doc_id")
        # word_ngrams is per-doc distinct, so count(*) == distinct hits
        .agg(F.count("*").alias("n_hits"))
    )


_DUCK_GRAMS4 = (
    "list_distinct([array_to_string(toks[i:i+3], ' ') "
    "for i in generate_series(1, len(toks) - 3)])"
)

LLM_DECONTAM_SQL = f"""
WITH base AS (SELECT doc_id, {_DUCK_TOKENS} AS toks FROM documents),
grams AS (
  SELECT doc_id, UNNEST({_DUCK_GRAMS4}) AS g FROM base WHERE len(toks) >= 4
),
bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0)
SELECT doc_id, COUNT(*) AS n_hits
FROM grams WHERE doc_id % 97 != 0 AND g IN (SELECT g FROM bench)
GROUP BY doc_id
"""


def txt_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-/C4-style repetition filters: duplicate-token fraction
    and top-bigram fraction, per document — pure per-row array
    expressions (no shuffle at any corpus scale)."""
    from ..operators.parallelism import ensure_parallelism
    from ..text.analysis import repetition_features

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    r = repetition_features("text")
    return d.select(
        "doc_id",
        r["n_tokens"].alias("n_tokens"),
        F.round(r["dup_token_frac"], 9).alias("dup_token_frac"),
        F.round(r["top_bigram_frac"], 9).alias("top_bigram_frac"),
    )


TXT_REPETITION_SQL = f"""
WITH base AS (SELECT doc_id, {_DUCK_TOKENS} AS toks FROM documents),
big AS (
  SELECT doc_id, toks,
         CASE WHEN len(toks) >= 2 THEN
           [array_to_string(toks[i:i+1], ' ')
            for i in generate_series(1, len(toks) - 1)]
         ELSE CAST([] AS VARCHAR[]) END AS bigrams
  FROM base
)
SELECT doc_id,
       CAST(len(toks) AS BIGINT) AS n_tokens,
       ROUND(CASE WHEN len(toks) > 0
             THEN (len(toks) - len(list_distinct(toks))) / len(toks)
             ELSE 0.0 END, 9) AS dup_token_frac,
       ROUND(CASE WHEN len(bigrams) > 0
             THEN list_max(list_transform(list_distinct(bigrams),
                  b -> len(list_filter(bigrams, x -> x = b)))) / len(bigrams)
             ELSE 0.0 END, 9) AS top_bigram_frac
FROM big
"""


def txt_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing rollup: deterministic synthetic emails/phones are
    injected (the corpus ships none), redacted with native
    regexp_replace, and counted per source. The redacted-length sum
    pins that the replacement actually happened, not just the count."""
    from ..operators.parallelism import ensure_parallelism
    from ..text.analysis import redact_pii

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    injected = d.withColumn(
        "pii_text",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 5 == 0,
                F.concat(
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com"),
                ),
            ).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 7 == 0, F.lit(" call 555-123-4567")).otherwise(
                F.lit("")
            ),
        ),
    )
    r = redact_pii(F.col("pii_text"))
    return (
        injected.select(
            "source",
            r["n_emails"].alias("ne"),
            r["n_phones"].alias("np"),
            F.length(r["redacted"]).cast("long").alias("rc"),
        )
        .groupBy("source")
        .agg(
            F.sum("ne").alias("n_emails"),
            F.sum("np").alias("n_phones"),
            F.sum("rc").alias("redacted_chars"),
        )
    )


TXT_PII_SQL = """
WITH injected AS (
  SELECT source,
         text
         || CASE WHEN doc_id % 5 = 0
              THEN ' contact user' || doc_id || '@example.com' ELSE '' END
         || CASE WHEN doc_id % 7 = 0 THEN ' call 555-123-4567' ELSE '' END
         AS pii_text
  FROM documents
),
red AS (
  SELECT source,
         len(regexp_extract_all(pii_text,
             '[A-Za-z0-9._]+@[A-Za-z0-9.]+\\.[A-Za-z]+')) AS ne,
         len(regexp_extract_all(pii_text, '[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS np,
         length(regexp_replace(
             regexp_replace(pii_text,
                 '[A-Za-z0-9._]+@[A-Za-z0-9.]+\\.[A-Za-z]+', '<EMAIL>', 'g'),
             '[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g')) AS rc
  FROM injected
)
SELECT source,
       CAST(SUM(ne) AS BIGINT) AS n_emails,
       CAST(SUM(np) AS BIGINT) AS n_phones,
       CAST(SUM(rc) AS BIGINT) AS redacted_chars
FROM red GROUP BY source
"""


def llm_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE merge learning (text/bpe.py): 8 merges over the
    distinct-word table of the documents corpus. The merge sequence is
    a deterministic function of the corpus (ties break lexically), so
    the output is pinned as a keyed literal oracle — the iterative
    argmax loop is not SQL-expressible."""
    from ..text.bpe import learn_bpe

    d = load_table(spark, sf_dir, "documents")
    merges = learn_bpe(d, "text", n_merges=8, min_freq=2)
    return spark.createDataFrame(
        [(i + 1, a, b, n) for i, (a, b, n) in enumerate(merges)],
        "merge_ix int, lhs string, rhs string, pair_count long",
    )


def llm_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learned-merge application at corpus scale: re-learn the 8
    merges, fold them over every document natively (no Python on the
    data path), and roll up BPE token counts per language."""
    from ..text.bpe import learn_bpe, tokenize_with_merges

    d = load_table(spark, sf_dir, "documents")
    merges = learn_bpe(d, "text", n_merges=8, min_freq=2)
    counts = tokenize_with_merges(d, merges, "text", ["doc_id", "lang"])
    return counts.groupBy("lang").agg(
        F.sum("n_bpe_tokens").alias("n_bpe_tokens"),
        F.count("*").alias("n_docs"),
    )


from .golden_sql import keyed_values_oracle

LLM_BPE_TRAIN_SQL = keyed_values_oracle(
    "llm_bpe_train",
    [
        ("merge_ix", "bigint"),
        ("lhs", "varchar"),
        ("rhs", "varchar"),
        ("pair_count", "bigint"),
    ],
)
LLM_BPE_TOKENIZE_SQL = keyed_values_oracle(
    "llm_bpe_tokenize",
    [("lang", "varchar"), ("n_bpe_tokens", "bigint"), ("n_docs", "bigint")],
)


def llm_corpus_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The C4-style corpus-filter pipeline as ONE composed projection:
    token-count floor + repetition ceiling decide keep/drop, reported
    per source with independent reason counts and the surviving token
    mass. Everything is a single pass over the scan — the length,
    dup-fraction, and keep flags are columns of one projection feeding
    one partial-aggregated rollup (no joins, no second scan)."""
    from ..operators.parallelism import ensure_parallelism
    from ..text.analysis import repetition_features

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    r = repetition_features("text")
    flagged = d.select(
        "source",
        r["n_tokens"].alias("n_tokens"),
        (r["n_tokens"] < 20).alias("too_short"),
        (r["dup_token_frac"] > 0.6).alias("too_repetitive"),
    )
    kept = ~F.col("too_short") & ~F.col("too_repetitive")
    return flagged.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(kept.cast("long")).alias("n_kept"),
        F.sum(F.col("too_short").cast("long")).alias("n_short"),
        F.sum(F.col("too_repetitive").cast("long")).alias("n_repetitive"),
        F.sum(F.when(kept, F.col("n_tokens")).otherwise(0)).alias("kept_tokens"),
    )


LLM_CORPUS_FILTER_SQL = f"""
WITH base AS (SELECT source, {_DUCK_TOKENS} AS toks FROM documents),
flagged AS (
  SELECT source, len(toks) AS n_tokens,
         len(toks) < 20 AS too_short,
         (CASE WHEN len(toks) > 0
           THEN (len(toks) - len(list_distinct(toks))) / len(toks)
           ELSE 0.0 END) > 0.6 AS too_repetitive
  FROM base
)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN NOT too_short AND NOT too_repetitive THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN too_short THEN 1 ELSE 0 END) AS BIGINT) AS n_short,
       CAST(SUM(CASE WHEN too_repetitive THEN 1 ELSE 0 END) AS BIGINT) AS n_repetitive,
       CAST(SUM(CASE WHEN NOT too_short AND NOT too_repetitive THEN n_tokens ELSE 0 END) AS BIGINT) AS kept_tokens
FROM flagged GROUP BY source
"""


_MIX_WEIGHTS = {f"src{i}": (i % 4) + 1 for i in range(20)}
_MIX_WSUM = sum(_MIX_WEIGHTS.values())


def llm_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture construction (operators/mixture.py): per-source
    hash-Bernoulli sampling toward a 40% token budget under weights
    w(src_i) = (i mod 4)+1. The keep decision is exact integer
    arithmetic on the portable hash, so the identical row set falls out
    of any engine — the oracle replays every decision in DuckDB."""
    from ..operators.mixture import mixture_rates, mixture_sample

    d = load_table(spark, sf_dir, "documents")
    rates = mixture_rates(d, _MIX_WEIGHTS)
    kept = (
        mixture_sample(d, _MIX_WEIGHTS)
        .groupBy("source")
        .agg(F.count("*").alias("n_kept"), F.sum("n_tok").alias("kept_tokens"))
    )
    return rates.join(kept, "source", "left").select(
        "source",
        "n_docs",
        "n_tokens",
        F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        F.coalesce("kept_tokens", F.lit(0)).alias("kept_tokens"),
        F.round(
            F.least(
                F.lit(1.0), F.col("num").cast("double") / F.col("den").cast("double")
            ),
            9,
        ).alias("rate"),
    )


def _mix_weights_values() -> str:
    return ", ".join(f"('{s}', {w})" for s, w in sorted(_MIX_WEIGHTS.items()))


LLM_MIX_SQL = f"""
WITH w(source, w_raw) AS (VALUES {_mix_weights_values()}),
base AS (
  SELECT doc_id, source, len({_DUCK_TOKENS}) AS n_tok FROM documents
),
per_src AS (
  SELECT source, COUNT(*) AS n_docs, SUM(n_tok) AS tok_s FROM base GROUP BY 1
),
tot AS (SELECT SUM(n_tok) AS total_tokens FROM base),
rates AS (
  SELECT p.source, p.n_docs, p.tok_s,
         CAST(2 * t.total_tokens * w.w_raw AS BIGINT) AS num,
         CAST(5 * {_MIX_WSUM} * p.tok_s AS BIGINT) AS den
  FROM per_src p JOIN w USING (source) CROSS JOIN tot t
),
kept AS (
  SELECT b.source, COUNT(*) AS n_kept, SUM(b.n_tok) AS kept_tokens
  FROM base b JOIN rates r USING (source)
  WHERE CAST(('0x' || substr(md5('7|' || CAST(b.doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000000 AS HUGEINT)
        * r.den < CAST(r.num AS HUGEINT) * 1000000
  GROUP BY 1
)
SELECT r.source, r.n_docs, CAST(r.tok_s AS BIGINT) AS n_tokens,
       COALESCE(k.n_kept, 0) AS n_kept,
       CAST(COALESCE(k.kept_tokens, 0) AS BIGINT) AS kept_tokens,
       ROUND(LEAST(1.0, CAST(r.num AS DOUBLE) / CAST(r.den AS DOUBLE)), 9) AS rate
FROM rates r LEFT JOIN kept k USING (source)
"""


def llm_chunk_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG-style fixed-size document chunking through the Python UDTF +
    LATERAL join surface (functions/udtfs.py — Spark's row→rows Python
    extension point, Arrow-batched). Chunking is also expressible
    natively (the dedup/substring.py window enumerator); this entry
    exists to cover the UDTF API like a14_udaf_mode covers UDAFs, and
    the oracle replays every chunk hash in DuckDB, so the UDTF output
    is value-checked, not just counted."""
    import uuid

    from ..functions.udtfs import register_udtfs

    register_udtfs(spark)
    view = "docs_" + uuid.uuid4().hex[:8]
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(view)
    try:
        out = spark.sql(
            f"SELECT c.doc_id, c.chunk_ix, c.n_tokens, c.chunk_hash "
            f"FROM {view} d, LATERAL chunk_text(d.doc_id, d.text) c"
        )
        # materialize before the view goes away AND return the
        # checkpointed frame: returning the raw plan re-ran the whole
        # UDTF pass under the caller's action (2 Python passes → 1)
        return out.localCheckpoint()
    finally:
        spark.catalog.dropTempView(view)


LLM_CHUNK_SQL = f"""
WITH base AS (SELECT doc_id, {_DUCK_TOKENS} AS toks FROM documents)
SELECT doc_id, CAST(i AS INT) AS chunk_ix,
       CAST(LEAST(50, len(toks) - i * 50) AS INT) AS n_tokens,
       md5(array_to_string(
         toks[CAST(i * 50 + 1 AS BIGINT):CAST(i * 50 + 50 AS BIGINT)], ' '))
         AS chunk_hash
FROM base, UNNEST(range(0, CAST(CEIL(len(toks) / 50.0) AS BIGINT))) t(i)
WHERE len(toks) > 0
"""


def llm_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style language-model quality scoring, OOV-rate form.

    A reference LM is trained on a held slice of the corpus (doc_id %
    10 == 0 here; a real pipeline uses a trusted corpus): bigram →
    occurrence count. Every document is then scored by its
    out-of-vocabulary bigram rate and known-bigram mean frequency, and
    band-filtered — the classic perplexity filter with an exact
    rational score instead of a float log-sum, so the result is
    bit-identical cross-engine (same reason txt_tfidf uses rational
    idf).

    Scale shape: training is one groupBy over exploded bigrams;
    scoring is one hash join of doc-bigrams against the LM table (at
    100 TB the LM side is large → shuffle hash join; the top-df
    stop-bigrams are exactly the keys the skew salting in
    operators/skew.py handles) plus one groupBy back to doc grain."""
    from ..operators.parallelism import ensure_parallelism
    from ..text.analysis import tokens

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    toks = d.select("doc_id", tokens("text").alias("t")).filter(F.size("t") >= 2)
    bigrams = toks.select(
        "doc_id",
        F.explode(
            F.expr(_BIGRAMS_CONCAT)
        ).alias("bg"),
    )
    lm = (
        bigrams.filter(F.col("doc_id") % 10 == 0)
        .groupBy("bg")
        .agg(F.count("*").alias("cnt"))
    )
    scored = (
        bigrams.join(lm, "bg", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.count(F.when(F.col("cnt").isNull(), 1)).alias("n_oov"),
            F.coalesce(F.sum("cnt"), F.lit(0)).alias("known_mass"),
        )
    )
    return scored.select(
        "doc_id",
        "n_bigrams",
        "n_oov",
        "known_mass",
        F.expr("CAST(n_oov AS DOUBLE) / n_bigrams").alias("oov_rate"),
        F.expr("CAST(n_oov AS DOUBLE) / n_bigrams <= 0.5").alias("keep"),
    ).orderBy("doc_id")


LLM_BIGRAM_LM_SQL = f"""
WITH base AS (
  SELECT doc_id, {_DUCK_TOKENS} AS t FROM documents
),
bg AS (
  SELECT doc_id, t[i] || ' ' || t[i + 1] AS bg
  FROM base, unnest(range(1, len(t))) AS r(i)
  WHERE len(t) >= 2
),
lm AS (
  SELECT bg, COUNT(*) AS cnt FROM bg WHERE doc_id % 10 = 0 GROUP BY bg
),
scored AS (
  SELECT b.doc_id,
         COUNT(*) AS n_bigrams,
         COUNT(*) FILTER (lm.cnt IS NULL) AS n_oov,
         COALESCE(SUM(lm.cnt), 0) AS known_mass
  FROM bg b LEFT JOIN lm ON lm.bg = b.bg
  GROUP BY b.doc_id
)
SELECT doc_id, n_bigrams, n_oov, CAST(known_mass AS BIGINT) AS known_mass,
       CAST(n_oov AS DOUBLE) / n_bigrams AS oov_rate,
       CAST(n_oov AS DOUBLE) / n_bigrams <= 0.5 AS keep
FROM scored ORDER BY doc_id
"""


def txt_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PMI collocation mining: bigrams with count ≥ 5 scored by
    pointwise mutual information ln(N·c(ab) / (c(a)·c(b))) — the
    classic phrase-detection step before tokenizer training (the
    word2vec phrases recipe). Unigram counts join onto the
    thresholded bigram table; everything inside the log is an exact
    integer ratio, so the rounded score is engine-stable. One exploded
    pass each for unigrams and bigrams, map-side combined."""
    from ..operators.parallelism import ensure_parallelism
    from ..text.analysis import tokens

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    toks = d.select("doc_id", tokens("text").alias("t"))
    uni = (
        toks.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("cw"))
    )
    n_tokens = uni.agg(F.sum("cw").alias("n")).first()["n"]
    bg = toks.filter(F.size("t") >= 2).select(
        F.explode(
            F.expr(_BIGRAMS_STRUCT)
        ).alias("p")
    ).select("p.w1", "p.w2")
    bgc = bg.groupBy("w1", "w2").agg(F.count("*").alias("cab")).filter(
        F.col("cab") >= 5
    )
    scored = (
        bgc.join(
            uni.select(F.col("w").alias("w1"), F.col("cw").alias("ca")),
            "w1",
        )
        .join(
            uni.select(F.col("w").alias("w2"), F.col("cw").alias("cb")),
            "w2",
        )
        .select(
            "w1",
            "w2",
            "cab",
            "ca",
            "cb",
            F.round(
                F.expr(f"ln(CAST({n_tokens} AS DOUBLE) * cab / (ca * cb))"), 6
            ).alias("pmi"),
        )
    )
    return scored.orderBy(F.desc("pmi"), "w1", "w2")


TXT_COLLOC_SQL = f"""
WITH base AS (SELECT doc_id, {_DUCK_TOKENS} AS t FROM documents),
uni AS (
  SELECT u.w, COUNT(*) AS cw FROM base, unnest(t) AS u(w) GROUP BY u.w
),
n AS (SELECT CAST(SUM(cw) AS BIGINT) AS n FROM uni),
bg AS (
  SELECT t[i] AS w1, t[i + 1] AS w2
  FROM base, unnest(range(1, len(t))) AS r(i)
  WHERE len(t) >= 2
),
bgc AS (
  SELECT w1, w2, COUNT(*) AS cab FROM bg GROUP BY 1, 2 HAVING COUNT(*) >= 5
)
SELECT b.w1, b.w2, b.cab, a.cw AS ca, c.cw AS cb,
       ROUND(ln(CAST(n.n AS DOUBLE) * b.cab / (a.cw * c.cw)), 6) AS pmi
FROM bgc b
JOIN uni a ON a.w = b.w1
JOIN uni c ON c.w = b.w2
CROSS JOIN n
ORDER BY pmi DESC, b.w1, b.w2
"""



# --- RAKE keyphrase extraction --------------------------------------------

_RAKE_STOPS = ("a", "the")


def txt_rake_keyphrases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE (Rapid Automatic Keyword Extraction): candidate phrases
    are maximal token runs between stopwords; each word scores
    degree/frequency (degree = co-occurring phrase length summed over
    its phrase instances); a phrase scores the sum of its word scores.
    Returns the global top-20 phrases.

    Distribution shape: phrase segmentation is the gaps-and-islands
    trick (stopword-count prefix sum) — two windows sharing ONE
    (doc_id; pos) sort, so one shuffle on doc_id; vocab-grain word
    stats join by stats/AQE
    back onto phrase words; the only ordered float sum (word scores
    within a phrase) is evaluated in explicit pos order in BOTH
    engines, so scores are bit-identical and the top-20 cut is
    deterministic."""
    from ..operators.parallelism import ensure_parallelism
    from ..text.analysis import tokens

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    tok = (
        d.select("doc_id", F.posexplode(tokens("text")).alias("pos", "w"))
        .withColumn("stop", F.col("w").isin(*_RAKE_STOPS))
    )
    wg = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # checkpoint: ws (word stats) and inst (instance scoring) both
    # consume pw — without it Catalyst re-scans and re-windows the
    # whole corpus twice (a 2x cost at 100 TB for a diamond dataflow)
    pw = (
        tok.withColumn("g", F.sum(F.col("stop").cast("long")).over(wg))
        .filter(~F.col("stop"))
        .withColumn("plen", F.count("*").over(Window.partitionBy("doc_id", "g")))
        .localCheckpoint()
    )
    ws = pw.groupBy("w").agg(
        F.count("*").alias("freq"), F.sum("plen").alias("deg")
    )
    inst = (
        pw.join(ws, "w")
        .withColumn("wscore", F.expr("CAST(deg AS DOUBLE) / freq"))
        .groupBy("doc_id", "g")
        .agg(
            F.array_sort(F.collect_list(F.struct("pos", "w", "wscore"))).alias("s")
        )
        .select(
            F.expr("array_join(transform(s, x -> x.w), ' ')").alias("phrase"),
            F.expr("size(s)").alias("n_words"),
            F.expr(
                "aggregate(s, CAST(0 AS DOUBLE), (acc, x) -> acc + x.wscore)"
            ).alias("score"),
        )
    )
    return (
        inst.groupBy("phrase")
        .agg(
            F.min("n_words").alias("n_words"),
            F.count("*").alias("n_occurrences"),
            F.min("score").alias("score"),
        )
        .orderBy(F.desc("score"), "phrase")
        .limit(20)
        .select("phrase", "n_words", "n_occurrences", F.round("score", 9).alias("score"))
    )


TXT_RAKE_SQL = f"""
WITH base AS (SELECT doc_id, {_DUCK_TOKENS} AS t FROM documents),
tok AS (
  SELECT doc_id, r.i AS pos, t[r.i] AS w, t[r.i] IN ('a', 'the') AS stop
  FROM base, unnest(range(1, len(t) + 1)) AS r(i)
),
grp AS (
  SELECT doc_id, pos, w, stop,
         SUM(CASE WHEN stop THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g
  FROM tok
),
pw AS (
  SELECT doc_id, g, pos, w, COUNT(*) OVER (PARTITION BY doc_id, g) AS plen
  FROM grp WHERE NOT stop
),
ws AS (
  SELECT w, COUNT(*) AS freq, CAST(SUM(plen) AS BIGINT) AS deg
  FROM pw GROUP BY w
),
inst AS (
  SELECT p.doc_id, p.g,
         string_agg(p.w, ' ' ORDER BY p.pos) AS phrase,
         CAST(COUNT(*) AS INT) AS n_words,
         list_sum(list(CAST(s.deg AS DOUBLE) / s.freq ORDER BY p.pos)) AS score
  FROM pw p JOIN ws s ON s.w = p.w
  GROUP BY p.doc_id, p.g
),
agg AS (
  SELECT phrase, MIN(n_words) AS n_words, COUNT(*) AS n_occurrences,
         MIN(score) AS score
  FROM inst GROUP BY phrase
)
SELECT phrase, n_words, n_occurrences, ROUND(score, 9) AS score
FROM agg ORDER BY score DESC, phrase LIMIT 20
"""



# --- Differentially-private-style noisy counts ----------------------------

_DP_EPS_INV = 1  # b = 1/epsilon = 1


def llm_dp_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laplace-mechanism noisy group counts over the corpus — the DP
    release shape (sensitivity-1 count + Laplace(1/eps) noise) with
    the noise draw made ENGINE-PORTABLE: u = md5-hash(group)/2^60 in
    (0,1), noise = -b*sign(u-1/2)*ln(1-2|u-1/2|) (inverse-CDF
    sampling). A production release would use a secret seed — here the
    seed is public precisely so the oracle can regenerate the draw
    bit-for-bit; everything else (mechanism, sensitivity, epsilon
    accounting) is the real thing. One partial-agg pass; noise is a
    projection on the group row."""
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(F.count("*").alias("true_n"))
    u = (
        "CAST(conv(substring(md5(concat('dp|', source)), 1, 15), 16, 10)"
        " AS BIGINT) / CAST(1152921504606846976 AS DOUBLE)"
    )
    noise = (
        f"-{_DP_EPS_INV} * sign(({u}) - CAST(0.5 AS DOUBLE))"
        f" * ln(CAST(1 AS DOUBLE) - 2 * abs(({u}) - CAST(0.5 AS DOUBLE)))"
    )
    return counts.select(
        "source",
        "true_n",
        F.round(F.expr(noise), 6).alias("laplace_noise"),
        F.round(F.expr(f"true_n + ({noise})"), 6).alias("dp_count"),
    ).orderBy("source")


LLM_DP_SQL = f"""
WITH counts AS (SELECT source, COUNT(*) AS true_n FROM documents GROUP BY source)
SELECT source, true_n,
       ROUND(-{_DP_EPS_INV} * sign((('0x' || substr(md5('dp|' || source), 1, 15))::BIGINT
             / CAST(1152921504606846976 AS DOUBLE)) - CAST(0.5 AS DOUBLE))
         * ln(CAST(1 AS DOUBLE) - 2 * abs((('0x' || substr(md5('dp|' || source), 1, 15))::BIGINT
             / CAST(1152921504606846976 AS DOUBLE)) - CAST(0.5 AS DOUBLE))), 6)
         AS laplace_noise,
       ROUND(true_n + (-{_DP_EPS_INV} * sign((('0x' || substr(md5('dp|' || source), 1, 15))::BIGINT
             / CAST(1152921504606846976 AS DOUBLE)) - CAST(0.5 AS DOUBLE))
         * ln(CAST(1 AS DOUBLE) - 2 * abs((('0x' || substr(md5('dp|' || source), 1, 15))::BIGINT
             / CAST(1152921504606846976 AS DOUBLE)) - CAST(0.5 AS DOUBLE)))), 6)
         AS dp_count
FROM counts
ORDER BY source
"""


def txt_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source unigram (token) entropy — the corpus-diversity
    signal quality pipelines use to flag templated/boilerplate slices
    (low entropy) before they poison a training mix.

    H = ln(N) − (Σ c·ln c)/N over per-source token counts, so the
    only float work is ln over exact integers (round(6) makes the
    libm results engine-stable — the PSI/PMI convention). Shape: one
    exploded token-count aggregation per source, then a projection;
    token tables are the bounded vocabulary, not the corpus."""
    from ..operators.parallelism import ensure_parallelism
    from ..text.analysis import tokens

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    counts = (
        d.select("source", F.explode(tokens("text")).alias("w"))
        .groupBy("source", "w")
        .agg(F.count("*").alias("c"))
    )
    return (
        counts.groupBy("source")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.count("*").alias("vocab"),
            F.sum(F.expr("c * ln(CAST(c AS DOUBLE))")).alias("sclnc"),
        )
        .select(
            "source",
            "n_tokens",
            "vocab",
            F.round(
                F.expr(
                    "ln(CAST(n_tokens AS DOUBLE)) - sclnc / CAST(n_tokens AS DOUBLE)"
                ),
                6,
            ).alias("entropy_nats"),
        )
        .orderBy("source")
    )


TXT_ENTROPY_SQL = f"""
WITH counts AS (
  SELECT source, u.w, COUNT(*) AS c
  FROM (SELECT source, {_DUCK_TOKENS} AS t FROM documents), unnest(t) AS u(w)
  GROUP BY source, u.w
),
agg AS (
  SELECT source, CAST(SUM(c) AS BIGINT) AS n_tokens, COUNT(*) AS vocab,
         SUM(c * ln(CAST(c AS DOUBLE))) AS sclnc
  FROM counts GROUP BY source
)
SELECT source, n_tokens, vocab,
       ROUND(ln(CAST(n_tokens AS DOUBLE)) - sclnc / CAST(n_tokens AS DOUBLE), 6)
         AS entropy_nats
FROM agg
ORDER BY source
"""


# --- Temperature-scaled source mixing weights ------------------------------

_MIX_ALPHA_NUM, _MIX_ALPHA_DEN = 7, 10  # alpha = 0.7 (the multilingual-LM default)


def llm_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based corpus mixing (the multilingual-LM sampling
    recipe): source s is sampled proportionally to n_s^alpha with
    alpha = 0.7 — upweighting tail sources, damping head dominance.
    Outputs each source's natural share, temperature share, boost
    factor, and the expected token draw from a 1M-token batch.

    Shares are doubles but derive from one exp/ln pair over exact
    integer counts evaluated with IDENTICAL expression text in both
    engines (n^alpha = exp(alpha*ln(n))), normalized by a broadcast
    1-row total — round(6) pins libm parity (the PSI/PMI rule). One
    token-count aggregation; everything after is group-count-sized."""
    from ..text.analysis import token_count

    d = load_table(spark, sf_dir, "documents")
    per_src = d.groupBy("source").agg(
        F.sum(token_count("text")).alias("n_tokens")
    )
    pow_expr = (
        f"exp((CAST({_MIX_ALPHA_NUM} AS DOUBLE) / {_MIX_ALPHA_DEN})"
        " * ln(CAST(n_tokens AS DOUBLE)))"
    )
    tot = per_src.agg(
        F.sum("n_tokens").alias("tot_tokens"),
        F.sum(F.expr(pow_expr)).alias("tot_pow"),
    )
    return (
        per_src.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_tokens",
            F.round(
                F.expr("CAST(n_tokens AS DOUBLE) / tot_tokens"), 6
            ).alias("natural_share"),
            F.round(F.expr(f"({pow_expr}) / tot_pow"), 6).alias("temp_share"),
            F.round(
                F.expr(
                    f"(({pow_expr}) / tot_pow)"
                    " / (CAST(n_tokens AS DOUBLE) / tot_tokens)"
                ),
                6,
            ).alias("boost"),
            F.round(F.expr(f"1000000 * (({pow_expr}) / tot_pow)"), 3).alias(
                "tokens_per_million"
            ),
        )
        .orderBy("source")
    )


def _mix_sql() -> str:
    pow_expr = (
        f"exp((CAST({_MIX_ALPHA_NUM} AS DOUBLE) / {_MIX_ALPHA_DEN})"
        " * ln(CAST(n_tokens AS DOUBLE)))"
    )
    return f"""
WITH per_src AS (
  SELECT source,
         CAST(SUM(CASE WHEN trim(lower(text)) = '' THEN 0
                  ELSE len(string_split_regex(trim(lower(text)), '\\s+')) END)
              AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
),
tot AS (
  SELECT CAST(SUM(n_tokens) AS BIGINT) AS tot_tokens,
         SUM({pow_expr}) AS tot_pow
  FROM per_src
)
SELECT source, n_tokens,
       ROUND(CAST(n_tokens AS DOUBLE) / tot_tokens, 6) AS natural_share,
       ROUND(({pow_expr}) / tot_pow, 6) AS temp_share,
       ROUND((({pow_expr}) / tot_pow)
             / (CAST(n_tokens AS DOUBLE) / tot_tokens), 6) AS boost,
       ROUND(1000000 * (({pow_expr}) / tot_pow), 3) AS tokens_per_million
FROM per_src CROSS JOIN tot
ORDER BY source
"""


LLM_MIX_TEMP_SQL = _mix_sql()


# --- BM25 keyword retrieval ------------------------------------------------

_BM25_K1_NUM, _BM25_K1_DEN = 12, 10   # k1 = 1.2
_BM25_B_NUM, _BM25_B_DEN = 75, 100    # b = 0.75
_BM25_QUERY = ("data", "table", "fast")


def txt_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranking — the retrieval baseline every search/RAG stack
    starts from — for a fixed 3-term query, top-20 documents.

    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·len/avglen))
    with the Robertson idf ln((N−df+.5)/(df+.5)+1). All inputs (tf,
    df, N, doc length, avg length) are exact integers from two
    map-side aggregations; the per-term score is ONE shared-text
    double expression (k1/b spelled as exact rational CASTs), summed
    per doc in deterministic term order via a pivoted projection — so
    ranks and scores hash-match. Query terms broadcast as a filter;
    postings for 3 terms are a sliver of the index. Top-20 is a
    TakeOrdered, not a global sort."""
    from ..operators.parallelism import ensure_parallelism
    from ..text.analysis import bound, tokens

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    qterms = list(_BM25_QUERY)
    # doclen and the 3 fixed-term frequencies are PER-ROW array
    # expressions over the bound token array — the old inverted-index
    # shape exploded every token twice (doclen pass + tf pass) and
    # shuffled the corpus to doc grain twice, all to recover numbers
    # each document already knows about itself. The postings-list shape
    # is right when the query set is open; for a fixed 3-term probe the
    # projection is strictly less work at any scale.
    feat = bound(
        tokens("text"),
        lambda w: F.struct(
            F.size(w).alias("dl"),
            *[
                F.size(F.filter(w, lambda x: x == F.lit(t))).alias(f"tf_{i}")
                for i, t in enumerate(qterms)
            ],
        ),
    )
    per_doc = d.select("doc_id", feat.alias("f")).select("doc_id", "f.*")
    stats = per_doc.agg(
        F.sum((F.col("dl") > 0).cast("long")).alias("n_docs"),
        F.sum("dl").alias("total_len"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(qterms))
        ],
    )
    k1 = f"(CAST({_BM25_K1_NUM} AS DOUBLE) / {_BM25_K1_DEN})"
    b = f"(CAST({_BM25_B_NUM} AS DOUBLE) / {_BM25_B_DEN})"

    def term_score(i: int) -> str:
        idf = (
            f"ln((CAST(n_docs AS DOUBLE) - df_{i} + CAST(0.5 AS DOUBLE))"
            f" / (CAST(df_{i} AS DOUBLE) + CAST(0.5 AS DOUBLE))"
            " + CAST(1 AS DOUBLE))"
        )
        # tf = 0 contributes exactly +0.0 — same as the old
        # COALESCE(s_i, 0) for a missing pivot arm
        return (
            f"({idf}) * (CAST(tf_{i} AS DOUBLE) * ({k1} + 1))"
            f" / (CAST(tf_{i} AS DOUBLE) + {k1} * (1 - {b} + {b}"
            " * (CAST(dl AS DOUBLE) * n_docs / CAST(total_len AS DOUBLE))))"
        )

    # candidate set unchanged: only documents containing ≥1 query term
    cand = " + ".join(f"tf_{i}" for i in range(len(qterms)))
    # deterministic summation order: fixed term order, same as the old
    # pivoted s_0 + s_1 + s_2
    total = " + ".join(f"({term_score(i)})" for i in range(len(qterms)))
    return (
        per_doc.filter(F.expr(f"({cand}) > 0"))
        .crossJoin(F.broadcast(stats))
        .select("doc_id", F.round(F.expr(total), 9).alias("bm25"))
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(20)
    )


def _bm25_sql() -> str:
    terms = ", ".join(f"'{t}'" for t in _BM25_QUERY)
    k1 = f"(CAST({_BM25_K1_NUM} AS DOUBLE) / {_BM25_K1_DEN})"
    b = f"(CAST({_BM25_B_NUM} AS DOUBLE) / {_BM25_B_DEN})"
    idf = (
        "ln((CAST(n_docs AS DOUBLE) - df + CAST(0.5 AS DOUBLE))"
        " / (CAST(df AS DOUBLE) + CAST(0.5 AS DOUBLE)) + CAST(1 AS DOUBLE))"
    )
    term_score = (
        f"({idf}) * (CAST(tf AS DOUBLE) * ({k1} + 1))"
        f" / (CAST(tf AS DOUBLE) + {k1} * (1 - {b} + {b}"
        " * (CAST(dl AS DOUBLE) * n_docs / CAST(total_len AS DOUBLE))))"
    )
    arms = ",\n         ".join(
        f"MIN(CASE WHEN w = '{t}' THEN term_score END) AS s_{i}"
        for i, t in enumerate(_BM25_QUERY)
    )
    total = " + ".join(
        f"COALESCE(s_{i}, CAST(0 AS DOUBLE))" for i in range(len(_BM25_QUERY))
    )
    return f"""
WITH tok AS (
  SELECT doc_id, u.w
  FROM (SELECT doc_id, {_DUCK_TOKENS} AS t FROM documents), unnest(t) AS u(w)
),
doclen AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
stats AS (
  SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS total_len FROM doclen
),
tf AS (
  SELECT doc_id, w, COUNT(*) AS tf FROM tok
  WHERE w IN ({terms}) GROUP BY doc_id, w
),
df_t AS (SELECT w, COUNT(*) AS df FROM tf GROUP BY w),
scored AS (
  SELECT t.doc_id, t.w, {term_score} AS term_score
  FROM tf t
  JOIN df_t USING (w)
  JOIN doclen USING (doc_id)
  CROSS JOIN stats
),
pivoted AS (
  SELECT doc_id,
         {arms}
  FROM scored GROUP BY doc_id
)
SELECT doc_id, ROUND({total}, 9) AS bm25
FROM pivoted
ORDER BY bm25 DESC, doc_id
LIMIT 20
"""


TXT_BM25_SQL = _bm25_sql()


def txt_langid_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier-eval harness over the language-ID heuristic: the
    predicted language vs the corpus's ground-truth ``lang`` column as
    a full confusion matrix plus per-language precision/recall — the
    same evaluation loop a real pipeline runs before trusting a
    filter. Shares txt_langid's native marker-count expressions; the
    confusion rollup is one partial-agg'd groupBy and the P/R columns
    are shared-text rational-to-double projections."""
    preds = txt_langid(spark, sf_dir)
    conf = preds.groupBy("lang", "lang_guess").agg(F.count("*").alias("n"))
    w_true = conf.groupBy("lang").agg(F.sum("n").alias("n_true"))
    w_pred = conf.groupBy("lang_guess").agg(F.sum("n").alias("n_pred"))
    return (
        conf.join(F.broadcast(w_true), "lang")
        .join(F.broadcast(w_pred), "lang_guess")
        .select(
            "lang",
            "lang_guess",
            "n",
            F.expr("CAST(n AS DOUBLE) / n_true").alias("recall_contrib"),
            F.expr("CAST(n AS DOUBLE) / n_pred").alias("precision_contrib"),
        )
        .orderBy("lang", "lang_guess")
    )


TXT_LANGID_EVAL_SQL = (
    "WITH preds AS (\n"
    + TXT_LANGID_SQL
    + """
),
conf AS (
  SELECT lang, lang_guess, COUNT(*) AS n FROM preds GROUP BY 1, 2
),
w_true AS (SELECT lang, CAST(SUM(n) AS BIGINT) AS n_true FROM conf GROUP BY 1),
w_pred AS (SELECT lang_guess, CAST(SUM(n) AS BIGINT) AS n_pred FROM conf GROUP BY 1)
SELECT c.lang, c.lang_guess, c.n,
       CAST(c.n AS DOUBLE) / t.n_true AS recall_contrib,
       CAST(c.n AS DOUBLE) / p.n_pred AS precision_contrib
FROM conf c
JOIN w_true t ON t.lang = c.lang
JOIN w_pred p ON p.lang_guess = c.lang_guess
ORDER BY c.lang, c.lang_guess
"""
)

# ---------------------------------------------------------------------------
# llm_url_dedup — URL canonicalization + host-level duplicate accounting
# ---------------------------------------------------------------------------

# Deterministic synthetic URL per document (md5-driven noise: scheme,
# www., host case, utm params, fragment, trailing slash) — identical
# CASE text in both engines, so the dedup accounting is value-exact.
_URL_NOISE_BITS = (
    "('0x' || substring(md5(concat('url|', CAST(doc_id AS STRING))), 1, 8))"
)


def llm_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonicalize crawl URLs and account duplicates per host — the
    first dedup pass of every web-scale corpus build (CommonCrawl
    pipelines dedup by canonical URL before any content hashing).

    Canonicalization: force https, strip `www.`, lowercase the host,
    drop utm_* query params and fragments, trim trailing slashes —
    each a single anchored regexp so Catalyst keeps the whole chain in
    one codegen'd projection (no UDF). The dedup itself is one
    groupBy(canonical) and one groupBy(host): at 100 TB both shuffles
    carry only the *distinct* keys thanks to partial aggregation, and
    host-grain skew (a mega-site) is exactly the shape the salted-agg
    pattern in operators/skew.py absorbs.
    """
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    nz = F.expr(f"CAST(conv(substring(md5(concat('url|', CAST(doc_id AS STRING))), 1, 8), 16, 10) AS BIGINT)")
    raw = d.select(
        "doc_id",
        F.concat(
            F.when(nz % 2 == 0, F.lit("http://")).otherwise(F.lit("https://")),
            F.when((nz % 4).isin(0, 1), F.lit("www.")).otherwise(F.lit("")),
            F.when(nz % 8 < 2, F.lit("Site")).otherwise(F.lit("site")),
            ((nz % 16)).cast("string"),
            F.lit(".example.com/docs/"),
            (F.col("doc_id") % 500).cast("string"),
            F.when(nz % 32 < 8, F.lit("/")).otherwise(F.lit("")),
            F.when(nz % 64 < 16, F.lit("?utm_source=feed")).otherwise(F.lit("")),
            F.when(nz % 128 < 32, F.lit("#section-2")).otherwise(F.lit("")),
        ).alias("url"),
    )
    canon = raw.withColumn(
        "u1", F.regexp_replace("url", r"#.*$", "")
    ).withColumn(
        "u2", F.regexp_replace("u1", r"\?utm_[^#]*$", "")
    ).withColumn(
        "u3", F.regexp_replace("u2", r"^http://", "https://")
    ).withColumn(
        "u4", F.regexp_replace("u3", r"^https://www\.", "https://")
    ).withColumn(
        "host", F.lower(F.regexp_extract("u4", r"^https://([^/]+)", 1))
    ).withColumn(
        "path", F.regexp_replace(F.regexp_replace("u4", r"^https://[^/]+", ""), r"/+$", "")
    ).withColumn("canonical", F.concat(F.lit("https://"), "host", "path"))
    per_canon = canon.groupBy("host", "canonical").agg(
        F.count("*").alias("n_raw"),
        F.countDistinct("url").alias("n_raw_distinct"),
    )
    return (
        per_canon.groupBy("host")
        .agg(
            F.count("*").cast("long").alias("n_canonical"),
            F.sum("n_raw").cast("long").alias("n_urls"),
            F.sum("n_raw_distinct").cast("long").alias("n_raw_forms"),
            F.round(
                F.sum("n_raw").cast("double") / F.count("*"), 6
            ).alias("dup_factor"),
        )
        .orderBy(F.desc("n_urls"), F.asc("host"))
        .limit(10)
    )


LLM_URL_DEDUP_SQL = f"""
WITH nzt AS (
  SELECT doc_id,
         {_URL_NOISE_BITS}::BIGINT AS nz
  FROM documents
), raw AS (
  SELECT doc_id,
         (CASE WHEN nz % 2 = 0 THEN 'http://' ELSE 'https://' END)
      || (CASE WHEN nz % 4 IN (0, 1) THEN 'www.' ELSE '' END)
      || (CASE WHEN nz % 8 < 2 THEN 'Site' ELSE 'site' END)
      || CAST(nz % 16 AS VARCHAR)
      || '.example.com/docs/'
      || CAST(doc_id % 500 AS VARCHAR)
      || (CASE WHEN nz % 32 < 8 THEN '/' ELSE '' END)
      || (CASE WHEN nz % 64 < 16 THEN '?utm_source=feed' ELSE '' END)
      || (CASE WHEN nz % 128 < 32 THEN '#section-2' ELSE '' END) AS url
  FROM nzt
), canon AS (
  SELECT url,
         lower(regexp_extract(u4, '^https://([^/]+)', 1)) AS host,
         'https://' || lower(regexp_extract(u4, '^https://([^/]+)', 1))
           || regexp_replace(regexp_replace(u4, '^https://[^/]+', ''), '/+$', '')
           AS canonical
  FROM (
    SELECT url,
           regexp_replace(
             regexp_replace(
               regexp_replace(
                 regexp_replace(url, '#.*$', ''),
               '\\?utm_[^#]*$', ''),
             '^http://', 'https://'),
           '^https://www\\.', 'https://') AS u4
    FROM raw
  )
), per_canon AS (
  SELECT host, canonical, COUNT(*) AS n_raw,
         COUNT(DISTINCT url) AS n_raw_distinct
  FROM canon GROUP BY 1, 2
)
SELECT host,
       CAST(COUNT(*) AS BIGINT) AS n_canonical,
       CAST(SUM(n_raw) AS BIGINT) AS n_urls,
       CAST(SUM(n_raw_distinct) AS BIGINT) AS n_raw_forms,
       ROUND(CAST(SUM(n_raw) AS DOUBLE) / COUNT(*), 6) AS dup_factor
FROM per_canon GROUP BY host
ORDER BY n_urls DESC, host ASC LIMIT 10
"""


# ---------------------------------------------------------------------------
# llm_perplexity_buckets — smoothed bigram-LM perplexity tertiles
# ---------------------------------------------------------------------------

_PPL_TRAIN = "('src0', 'src1', 'src2', 'src3', 'src4')"


def llm_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Add-one-smoothed bigram-LM perplexity filter with integer-exact
    surprisal (the CCNet recipe: train an LM on a trusted slice, score
    every document, keep by perplexity band).

    The LM is trained on the src0–src4 slice: unigram counts c1(w),
    bigram counts c12(w1,w2), vocab size V. Each document bigram's
    surprisal −ln((c12+1)/(c1+V)) is quantized to integer micro-nats
    *per LM entry* — ln only ever sees integer arguments, and
    floor(ln(k)·1e6 + 0.5) is engine-stable — so the per-document sum
    is an exact BIGINT in any aggregation order. Only the 3 bucket-
    level exp() calls are float. Scale: two LM groupBys + one shuffle
    join of doc-bigrams against the LM (big-big hash join — the 100 TB
    shape); the tertile cut over the DOC-GRAIN score table (corpus-
    grown) is operators/ranking.range_ntile — bit-identical to ANSI
    NTILE on the total key (mean surprisal, doc_id), no
    single-partition exchange.
    """
    from ..operators.ranking import range_ntile
    from ..text.analysis import tokens

    d = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    toks = d.select(
        "doc_id", "source", tokens("text").alias("t")
    ).filter(F.size("t") >= 2)
    bigrams = toks.select(
        "doc_id",
        "source",
        F.explode(
            F.expr(_BIGRAMS_STRUCT)
        ).alias("bg"),
    ).select("doc_id", "source", "bg.w1", "bg.w2")
    train = bigrams.filter(F.expr(f"source IN {_PPL_TRAIN}"))
    uni = train.groupBy("w1").agg(F.count("*").alias("c1"))
    bi = train.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    vocab = train.select("w1").union(train.select("w2")).distinct().count()

    scored = (
        bigrams.join(bi, ["w1", "w2"], "left")
        .join(uni, ["w1"], "left")
        .withColumn(
            "s_micro",
            F.expr(
                f"CAST(floor(ln(COALESCE(c1, 0) + {vocab}) * 1000000 + 0.5) AS BIGINT)"
                " - CAST(floor(ln(COALESCE(c12, 0) + 1) * 1000000 + 0.5) AS BIGINT)"
            ),
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum("s_micro").alias("surprisal_micro"),
        )
    )
    bucketed = range_ntile(
        scored.withColumn(
            "_ord",
            F.col("surprisal_micro").cast("double") / F.col("n_bigrams"),
        ),
        ["_ord", "doc_id"],
        3,
        "bucket",
    ).drop("_ord")
    return (
        bucketed.groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("surprisal_micro").alias("sum_surprisal_micro"),
            F.sum("n_bigrams").alias("sum_bigrams"),
            F.round(
                F.expr(
                    "exp((CAST(sum(surprisal_micro) AS DOUBLE)"
                    " / sum(n_bigrams)) / 1000000.0)"
                ),
                4,
            ).alias("bucket_perplexity"),
        )
        .orderBy("bucket")
    )


LLM_PPL_SQL = f"""
WITH base AS (
  SELECT doc_id, source, {_DUCK_TOKENS} AS t FROM documents
), bg AS (
  SELECT doc_id, source, t[i] AS w1, t[i + 1] AS w2
  FROM base, unnest(range(1, len(t))) AS r(i)
  WHERE len(t) >= 2
), train AS (
  SELECT * FROM bg WHERE source IN {_PPL_TRAIN}
), uni AS (
  SELECT w1, COUNT(*) AS c1 FROM train GROUP BY w1
), bi AS (
  SELECT w1, w2, COUNT(*) AS c12 FROM train GROUP BY w1, w2
), voc AS (
  SELECT COUNT(*) AS v FROM (
    SELECT w1 FROM train UNION SELECT w2 FROM train
  )
), scored AS (
  SELECT g.doc_id,
         COUNT(*) AS n_bigrams,
         SUM(CAST(floor(ln(COALESCE(u.c1, 0) + voc.v) * 1000000 + 0.5) AS BIGINT)
             - CAST(floor(ln(COALESCE(b.c12, 0) + 1) * 1000000 + 0.5) AS BIGINT))
           AS surprisal_micro
  FROM bg g
  LEFT JOIN bi b ON b.w1 = g.w1 AND b.w2 = g.w2
  LEFT JOIN uni u ON u.w1 = g.w1
  CROSS JOIN voc
  GROUP BY g.doc_id
), bucketed AS (
  SELECT *,
         NTILE(3) OVER (
           ORDER BY CAST(surprisal_micro AS DOUBLE) / n_bigrams, doc_id
         ) AS bucket
  FROM scored
)
SELECT CAST(bucket AS INT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(surprisal_micro) AS BIGINT) AS sum_surprisal_micro,
       CAST(SUM(n_bigrams) AS BIGINT) AS sum_bigrams,
       ROUND(exp((CAST(SUM(surprisal_micro) AS DOUBLE)
                  / SUM(n_bigrams)) / 1000000.0), 4) AS bucket_perplexity
FROM bucketed GROUP BY bucket ORDER BY bucket
"""


# ---------------------------------------------------------------------------
# llm_cdc_chunk_dedup — content-defined chunking dedup (rsync/LBFS trick)
# ---------------------------------------------------------------------------

_CDC_DIV = 4  # boundary where hash(word) % _CDC_DIV == 0 -> mean chunk ~4 words
_CDC_BOUNDARY_SEED = 5
_CDC_CHUNK_SEED = 6


def llm_cdc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking dedup — the rsync/LBFS boundary trick a
    training-data pipeline uses to catch SHIFTED duplication that
    fixed windows miss: chunk boundaries fall where the portable hash
    of a token lands in a residue class, so inserting a sentence only
    perturbs the chunks it touches and every other chunk still hashes
    identically. Pipeline: tokenize (posexplode), flag boundary
    tokens, cumulative-sum the flags per doc (one window on doc_id)
    into chunk ids, reassemble each chunk's text natively
    (array_sort + array_join over collected (pos, word) structs — no
    UDF), hash chunks, then census per source: how many chunk
    instances recur in 2+ documents. Every count is exact and the
    DuckDB oracle rebuilds the identical chunks (same md5 hash, same
    split), so dup fractions match bit-for-bit. Scale shape: one
    shuffle on doc_id for the window, one on (doc, chunk) to
    reassemble, one on chunk-hash for the census — all key-partitioned
    and combine-friendly; the 100 TB variant swaps the word-grain
    rolling hash for a byte-grain Rabin fingerprint in mapInPandas
    with the same downstream plan."""
    from ..functions.hashing import portable_hash64

    d = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    toks = d.select(
        "doc_id",
        "source",
        F.posexplode(F.split(F.col("text"), " ")).alias("pos", "word"),
    )
    b = toks.withColumn(
        "bflag",
        (portable_hash64("word", _CDC_BOUNDARY_SEED) % _CDC_DIV == 0).cast("int"),
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    chunked = b.withColumn("chunk_id", F.sum("bflag").over(w))
    chunks = chunked.groupBy("doc_id", "source", "chunk_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "word"))),
                lambda x: x["word"],
            ),
            " ",
        ).alias("chunk_text")
    )
    hashed = chunks.select(
        "doc_id", "source", portable_hash64("chunk_text", _CDC_CHUNK_SEED).alias("chash")
    )
    stats = hashed.groupBy("chash").agg(
        F.countDistinct("doc_id").alias("ndocs")
    )
    return (
        hashed.join(stats, "chash")
        .groupBy("source")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum((F.col("ndocs") >= 2).cast("long")).alias("n_dup_instances"),
        )
        .withColumn(
            "dup_frac",
            F.col("n_dup_instances").cast("double") / F.col("n_chunks").cast("double"),
        )
        .orderBy("source")
    )


def _cdc_sql() -> str:
    from .dedupq import _duck_hash

    bh = _duck_hash("word", str(_CDC_BOUNDARY_SEED))
    ch = _duck_hash("chunk_text", str(_CDC_CHUNK_SEED))
    return f"""
WITH toks AS (
  SELECT doc_id, source,
         UNNEST(list_transform(string_split(text, ' '),
                (w0, i) -> struct_pack(word := w0, pos := i))) AS u
  FROM documents
), words AS (
  SELECT doc_id, source, u.pos AS pos, u.word AS word FROM toks
), flagged AS (
  SELECT *, CASE WHEN ({bh}) % {_CDC_DIV} = 0 THEN 1 ELSE 0 END AS bflag
  FROM words
), chunked AS (
  SELECT doc_id, source, pos, word,
         SUM(bflag) OVER (PARTITION BY doc_id ORDER BY pos) AS chunk_id
  FROM flagged
), chunks AS (
  SELECT doc_id, source, chunk_id,
         string_agg(word, ' ' ORDER BY pos) AS chunk_text
  FROM chunked GROUP BY 1, 2, 3
), hashed AS (
  SELECT doc_id, source, ({ch}) AS chash FROM chunks
), stats AS (
  SELECT chash, COUNT(DISTINCT doc_id) AS ndocs FROM hashed GROUP BY 1
)
SELECT source,
       CAST(COUNT(DISTINCT h.doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_chunks,
       CAST(SUM(CASE WHEN s.ndocs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_instances,
       CAST(SUM(CASE WHEN s.ndocs >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS dup_frac
FROM hashed h JOIN stats s ON h.chash = s.chash
GROUP BY source ORDER BY source
"""


LLM_CDC_SQL = _cdc_sql()


# ---------------------------------------------------------------------------
# txt_readability — Flesch-style reading-ease scoring from integer counts
# ---------------------------------------------------------------------------

# Flesch reading ease over per-language aggregate ratios; every input
# is an exact BIGINT sum, the constants go through CAST(decimal AS
# DOUBLE), and the expression text is shared verbatim between engines
_READ_SCORE = (
    "CAST(206.835 AS DOUBLE)"
    " - CAST(1.015 AS DOUBLE) * (CAST(words AS DOUBLE) / CAST(sents AS DOUBLE))"
    " - CAST(84.6 AS DOUBLE) * (CAST(sylls AS DOUBLE) / CAST(words AS DOUBLE))"
)


def txt_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Readability scoring (Flesch reading ease, the regex-heuristic
    form every corpus-quality pipeline ships): words = letter runs,
    sentences = terminal-punctuation runs (min 1), syllables = vowel
    runs. The per-language score is computed from aggregate integer
    counts (never a float sum over documents), and the per-document
    score — a deterministic double from that document's own integers —
    feeds an easy/standard/difficult census with exact counts.

    Scale: one scan, three regexp counters per row (JVM-native), one
    map-side-combinable groupBy; output is #langs rows."""
    d = load_table(spark, sf_dir, "documents")
    per_doc = d.select(
        "lang",
        F.expr("regexp_count(text, '[A-Za-z]+')").alias("words"),
        F.expr("GREATEST(1, regexp_count(text, '[.!?]+'))").alias("sents"),
        F.expr("regexp_count(text, '[aeiouAEIOUyY]+')").alias("sylls"),
    ).filter(F.col("words") > 0)
    scored = per_doc.withColumn("doc_score", F.expr(_READ_SCORE))
    return (
        scored.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("words").alias("words"),
            F.sum("sents").alias("sents"),
            F.sum("sylls").alias("sylls"),
            F.sum(
                F.expr("IF(doc_score >= CAST(60 AS DOUBLE), 1, 0)")
            ).alias("n_easy"),
            F.sum(
                F.expr("IF(doc_score < CAST(30 AS DOUBLE), 1, 0)")
            ).alias("n_difficult"),
        )
        .selectExpr(
            "lang", "n_docs", "words", "sents", "sylls",
            f"{_READ_SCORE} AS flesch_lang",
            "n_easy", "n_difficult",
        )
        .orderBy("lang")
    )


TXT_READ_SQL = f"""
WITH per_doc AS (
  SELECT lang,
         CAST(len(regexp_extract_all(text, '[A-Za-z]+')) AS BIGINT) AS words,
         CAST(GREATEST(1, len(regexp_extract_all(text, '[.!?]+'))) AS BIGINT)
           AS sents,
         CAST(len(regexp_extract_all(text, '[aeiouAEIOUyY]+')) AS BIGINT)
           AS sylls
  FROM documents
), scored AS (
  SELECT *, {_READ_SCORE} AS doc_score FROM per_doc WHERE words > 0
)
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(words) AS BIGINT) AS words,
       CAST(SUM(sents) AS BIGINT) AS sents,
       CAST(SUM(sylls) AS BIGINT) AS sylls,
       {_READ_SCORE.replace('words', 'CAST(SUM(words) AS BIGINT)')
                    .replace('sents', 'CAST(SUM(sents) AS BIGINT)')
                    .replace('sylls', 'CAST(SUM(sylls) AS BIGINT)')}
         AS flesch_lang,
       CAST(SUM(CASE WHEN doc_score >= CAST(60 AS DOUBLE) THEN 1 ELSE 0 END)
            AS BIGINT) AS n_easy,
       CAST(SUM(CASE WHEN doc_score < CAST(30 AS DOUBLE) THEN 1 ELSE 0 END)
            AS BIGINT) AS n_difficult
FROM scored
GROUP BY lang
ORDER BY lang
"""


# ---------------------------------------------------------------------------
# llm_mix_diversity — Simpson diversity of the training mixture
# ---------------------------------------------------------------------------

# effective number of sources = N²/Σn² (inverse Simpson) — one shared
# IEEE expression over exact integer sums; ln-based Shannon diversity
# is deliberately avoided (ln is not engine-portable)
_MIX_EFF = (
    "CAST(total AS DOUBLE) * CAST(total AS DOUBLE) / CAST(ssq AS DOUBLE)"
)


def llm_mix_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture-diversity audit of the training corpus — the number a
    data-mix review leads with: the inverse-Simpson "effective number
    of sources" (N²/Σn²) and the Berger-Parker dominance (largest
    source's share, ppm), computed twice: over document counts and
    over whitespace-token mass, because a mix that is balanced by
    document count can still be dominated by one verbose source.

    Everything reduces to one scan + one per-source aggregate; the two
    diversity numbers are single shared IEEE expressions over exact
    BIGINT sums (Σn² ≤ N² stays integral)."""
    d = load_table(spark, sf_dir, "documents")
    per_src = d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(
            F.expr("size(split(trim(text), '\\\\s+'))")
        ).alias("n_toks"),
    )
    return per_src.agg(
        F.count("*").alias("n_sources"),
        F.sum("n_docs").alias("doc_total"),
        F.sum(F.expr("n_docs * n_docs")).alias("doc_ssq"),
        F.max("n_docs").alias("doc_max"),
        F.sum("n_toks").alias("tok_total"),
        F.sum(F.expr("n_toks * n_toks")).alias("tok_ssq"),
        F.max("n_toks").alias("tok_max"),
    ).selectExpr(
        "n_sources",
        "doc_total",
        f"{_MIX_EFF.replace('total', 'doc_total').replace('ssq', 'doc_ssq')}"
        " AS doc_eff_sources",
        "(1000000 * doc_max) div doc_total AS doc_dominance_ppm",
        "tok_total",
        f"{_MIX_EFF.replace('total', 'tok_total').replace('ssq', 'tok_ssq')}"
        " AS tok_eff_sources",
        "(1000000 * tok_max) div tok_total AS tok_dominance_ppm",
    )


LLM_MIX_DIV_SQL = f"""
WITH per_src AS (
  SELECT source, COUNT(*) AS n_docs,
         SUM(len(regexp_split_to_array(trim(text), '\\s+'))) AS n_toks
  FROM documents GROUP BY 1
), agg AS (
  SELECT COUNT(*) AS n_sources,
         CAST(SUM(n_docs) AS BIGINT) AS doc_total,
         CAST(SUM(n_docs * n_docs) AS BIGINT) AS doc_ssq,
         CAST(MAX(n_docs) AS BIGINT) AS doc_max,
         CAST(SUM(n_toks) AS BIGINT) AS tok_total,
         CAST(SUM(n_toks * n_toks) AS BIGINT) AS tok_ssq,
         CAST(MAX(n_toks) AS BIGINT) AS tok_max
  FROM per_src
)
SELECT n_sources, doc_total,
       {_MIX_EFF.replace('total', 'doc_total').replace('ssq', 'doc_ssq')}
         AS doc_eff_sources,
       (1000000 * doc_max) // doc_total AS doc_dominance_ppm,
       tok_total,
       {_MIX_EFF.replace('total', 'tok_total').replace('ssq', 'tok_ssq')}
         AS tok_eff_sources,
       (1000000 * tok_max) // tok_total AS tok_dominance_ppm
FROM agg
"""


# ---------------------------------------------------------------------------
# ml_feature_hashing — hashing-trick vectorizer + collision audit
# ---------------------------------------------------------------------------

_FH_BUCKETS = 32
_FH_HASH = (
    "CAST(conv(substring(md5(concat('fh|', term)), 1, 15), 16, 10) AS BIGINT)"
)
_FH_HASH_DUCK = "('0x' || substr(md5('fh|' || term), 1, 15))::BIGINT"


def ml_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature HASHING (the hashing trick) — vocabulary-free
    vectorization: every corpus term maps to one of 32 buckets via the
    portable md5 hash, so the feature space is fixed-width with no
    vocabulary build, no fitting pass, and no driver state — the
    vectorizer that still works when the vocabulary is 10¹⁰ terms. The
    output is the bucket census an ML engineer checks before trusting
    it: token mass, DISTINCT terms per bucket (the collision count),
    and each bucket's ppm share of tokens.

    Scale: one explode + two map-side-combinable aggregations to 32
    cells; nothing is ever vocabulary-sized except a distinct count."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("term")
    ).filter(F.col("term") != "")
    bucketed = toks.select(F.expr(f"{_FH_HASH} % {_FH_BUCKETS}").alias("bucket"), "term")
    census = bucketed.groupBy("bucket").agg(
        F.count("*").alias("n_tokens"),
        F.countDistinct("term").alias("n_distinct_terms"),
    )
    return (
        census.select(
            "bucket",
            "n_tokens",
            "n_distinct_terms",
            F.expr("(1000000 * n_tokens) div sum(n_tokens) over ()").alias(
                "share_ppm"
            ),
        )
        .orderBy("bucket")
    )


ML_FEATURE_HASH_SQL = f"""
WITH toks AS (
  SELECT unnest({_DUCK_TOKENS}) AS term FROM documents
), t AS (SELECT term FROM toks WHERE term <> ''),
bucketed AS (
  SELECT {_FH_HASH_DUCK} % {_FH_BUCKETS} AS bucket, term FROM t
), census AS (
  SELECT bucket, COUNT(*) AS n_tokens,
         COUNT(DISTINCT term) AS n_distinct_terms
  FROM bucketed GROUP BY 1
)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(n_distinct_terms AS BIGINT) AS n_distinct_terms,
       CAST((1000000 * n_tokens) // SUM(n_tokens) OVER () AS BIGINT)
         AS share_ppm
FROM census ORDER BY bucket
"""


# ---------------------------------------------------------------------------
# llm_ngram_novelty — per-document novel-shingle fraction (curriculum signal)
# ---------------------------------------------------------------------------


def llm_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram NOVELTY score per document — the fraction of a document's
    distinct 3-gram shingles never seen in any earlier document (by
    doc_id order): the dedup-aware curriculum/curation signal that says
    "this document adds new text" vs "this is remix". One inverted
    index (shingle → min doc_id) answers it for every document at once;
    novelty is exact ppm integers.

    Scale: explode to (doc, shingle) distinct, one min-aggregation per
    shingle (map-side combinable), one join back on the shingle key —
    the same inverted-index shape as the substring dedup; no pairwise
    anything."""
    from ..functions.hashing import shingles

    d = load_table(spark, sf_dir, "documents")
    # shuffle a NARROW 8-byte xxhash64 key instead of the shingle
    # string (guide §2.3): the distinct, the min-aggregation and the
    # join back all key on the hash. Semantics are unchanged as long
    # as no two distinct shingle strings collide at 64 bits — verified
    # against the string implementation (and the string-keyed DuckDB
    # oracle) at every graded SF; at ~10^6 distinct shingles the
    # collision odds are ~3e-8.
    # no .distinct() needed: shingles() array_distincts per document,
    # so (doc_id, s) is already unique — the old distinct was a full
    # extra Exchange + HashAggregate over the exploded set. And the
    # inverted index (min doc_id per shingle) is a WINDOW over the same
    # s-partitioning rather than a groupBy + join-back: one explode
    # evaluation, two exchanges total, no join.
    from pyspark.sql import Window

    sh = d.select(
        "doc_id", F.explode(shingles(F.col("text"), n=3)).alias("s0")
    ).select("doc_id", F.xxhash64("s0").alias("s"))
    per_doc = (
        sh.withColumn("first_doc", F.min("doc_id").over(Window.partitionBy("s")))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(F.expr("IF(first_doc = doc_id, 1, 0)")).alias("n_novel"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_shingles",
        F.col("n_novel").cast("long").alias("n_novel"),
        F.expr("(1000000 * n_novel) div n_shingles").alias("novelty_ppm"),
    ).orderBy("doc_id")


from .dedupq import _DUCK_SHINGLES as _DD_SHINGLES

LLM_NOVELTY_SQL = f"""
WITH base AS (SELECT doc_id, {_DUCK_TOKENS} AS toks FROM documents),
shx AS (SELECT doc_id, {_DD_SHINGLES} AS shingles FROM base),
sh AS (SELECT DISTINCT doc_id, unnest(shingles) AS s FROM shx),
first AS (SELECT s, MIN(doc_id) AS first_doc FROM sh GROUP BY 1),
per_doc AS (
  SELECT sh.doc_id, COUNT(*) AS n_shingles,
         SUM(CASE WHEN f.first_doc = sh.doc_id THEN 1 ELSE 0 END) AS n_novel
  FROM sh JOIN first f ON sh.s = f.s
  GROUP BY 1
)
SELECT doc_id, CAST(n_shingles AS BIGINT) AS n_shingles,
       CAST(n_novel AS BIGINT) AS n_novel,
       CAST((1000000 * n_novel) // n_shingles AS BIGINT) AS novelty_ppm
FROM per_doc ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# llm_shard_assign — deterministic training-shard assignment + balance audit
# ---------------------------------------------------------------------------

_SHARDS = 16
_SHARD_H = (
    "CAST(conv(substring(md5(concat('shard|', CAST(doc_id AS STRING))), 1, 15),"
    " 16, 10) AS BIGINT)"
)
_SHARD_H_DUCK = (
    "('0x' || substr(md5('shard|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT"
)


def llm_shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic doc→training-shard assignment + balance audit —
    the step that turns a curated corpus into N reproducible shards: a
    content-independent portable hash of doc_id (the engine-agnostic
    md5 idiom every split in this repo uses) mod 16 places each
    document; the census reports per-shard doc and character mass,
    each shard's ppm share, and the deviation from the ideal 1/16 —
    re-running on any engine or partitioning reproduces the exact same
    shards, which is what makes a training run restartable and
    ablation-comparable.

    Scale: one projection + one 16-group map-side-combinable groupBy;
    windows run on the 16-row census."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    assigned = d.select(
        F.expr(f"{_SHARD_H} % {_SHARDS}").alias("shard"),
        "n_chars",
    )
    census = assigned.groupBy("shard").agg(
        F.count("*").alias("n_docs"), F.sum("n_chars").alias("n_chars")
    )
    wall = Window.partitionBy()
    return (
        census.select(
            "shard",
            "n_docs",
            F.col("n_chars").cast("long").alias("n_chars"),
            F.expr(
                "(1000000 * n_docs) div sum(n_docs) over ()"
            ).alias("share_ppm"),
            F.expr(
                f"(1000000 * n_docs) div sum(n_docs) over () - 1000000 div {_SHARDS}"
            ).alias("dev_ppm"),
        )
        .orderBy("shard")
    )


LLM_SHARD_SQL = f"""
WITH assigned AS (
  SELECT {_SHARD_H_DUCK} % {_SHARDS} AS shard, n_chars FROM documents
), census AS (
  SELECT shard, COUNT(*) AS n_docs, SUM(n_chars) AS n_chars
  FROM assigned GROUP BY 1
)
SELECT CAST(shard AS BIGINT) AS shard, CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_chars AS BIGINT) AS n_chars,
       CAST((1000000 * n_docs) // SUM(n_docs) OVER () AS BIGINT) AS share_ppm,
       CAST((1000000 * n_docs) // SUM(n_docs) OVER ()
            - 1000000 // {_SHARDS} AS BIGINT) AS dev_ppm
FROM census ORDER BY shard
"""


# ---------------------------------------------------------------------------
# txt_word_lift — co-occurrence lift (log-free PMI) over the corpus
# ---------------------------------------------------------------------------

_LIFT_TOPK = 20


def txt_word_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word co-occurrence LIFT — P(a,b)/(P(a)·P(b)) as exact ppm
    integers (the log-free PMI: same ranking, no ln(), so the score is
    hash-exact across engines; the TF-IDF entry plays the same trick on
    idf). Collocation mining feeds phrase detection and tokenizer-merge
    candidates in an LLM data pipeline.

    Scale shape: document-level presence (one distinct), vocabulary
    restricted to terms in ≥5% of documents BEFORE the pair join (the
    vocab table broadcasts; pairs per document are bounded by the
    frequent-vocab hits in it, never raw text length), pair support ≥2.
    The per-doc self-join is the inverted-index shape every dedup
    entry uses — linear in Σ(per-doc frequent hits)², never corpus²."""
    from ..operators.parallelism import ensure_parallelism

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    n_docs = d.count()
    toks = (
        d.select(
            "doc_id",
            F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("term"),
        )
        .filter(F.col("term") != "")
        .distinct()
    )
    dfreq = toks.groupBy("term").agg(F.count("*").alias("df"))
    frequent = dfreq.filter(F.col("df") * 20 >= n_docs)
    ftoks = toks.join(F.broadcast(frequent), "term").select(
        "doc_id", "term", "df"
    )
    a = ftoks.alias("a")
    b = ftoks.alias("b")
    pairs = (
        a.join(b, F.col("a.doc_id") == F.col("b.doc_id"))
        .filter(F.col("a.term") < F.col("b.term"))
        .groupBy(
            F.col("a.term").alias("ta"),
            F.col("b.term").alias("tb"),
            F.col("a.df").alias("df_a"),
            F.col("b.df").alias("df_b"),
        )
        .agg(F.count("*").alias("n_ab"))
        .filter(F.col("n_ab") >= 2)
    )
    return (
        pairs.select(
            "ta",
            "tb",
            "n_ab",
            "df_a",
            "df_b",
            F.expr(
                f"CAST((CAST(1000000 AS DECIMAL(38,0)) * n_ab * {n_docs}L)"
                " div (CAST(df_a AS DECIMAL(19,0)) * df_b) AS BIGINT)"
            ).alias("lift_ppm"),
        )
        .orderBy(F.desc("lift_ppm"), "ta", "tb")
        .limit(_LIFT_TOPK)
    )


TXT_LIFT_SQL = f"""
WITH toks AS (
  SELECT DISTINCT doc_id, term FROM (
    SELECT doc_id, unnest({_DUCK_TOKENS}) AS term FROM documents
  ) WHERE term <> ''
), ndocs AS (SELECT COUNT(*) AS n_docs FROM documents),
dfreq AS (SELECT term, COUNT(*) AS df FROM toks GROUP BY 1),
frequent AS (
  SELECT term, df FROM dfreq, ndocs WHERE df * 20 >= n_docs
),
ftoks AS (
  SELECT t.doc_id, t.term, f.df FROM toks t JOIN frequent f ON t.term = f.term
),
pairs AS (
  SELECT a.term AS ta, b.term AS tb, a.df AS df_a, b.df AS df_b,
         COUNT(*) AS n_ab
  FROM ftoks a JOIN ftoks b
    ON a.doc_id = b.doc_id AND a.term < b.term
  GROUP BY 1, 2, 3, 4
  HAVING COUNT(*) >= 2
)
SELECT ta, tb, CAST(n_ab AS BIGINT) AS n_ab,
       CAST(df_a AS BIGINT) AS df_a, CAST(df_b AS BIGINT) AS df_b,
       CAST((CAST(1000000 AS HUGEINT) * n_ab * (SELECT n_docs FROM ndocs))
            // (CAST(df_a AS HUGEINT) * df_b) AS BIGINT) AS lift_ppm
FROM pairs
ORDER BY lift_ppm DESC, ta, tb
LIMIT {_LIFT_TOPK}
"""


# ---------------------------------------------------------------------------
# txt_heaps_law — vocabulary growth curve (Heaps' law checkpoints)
# ---------------------------------------------------------------------------


def txt_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary growth: cumulative token count and
    distinct-vocabulary size at 10 corpus checkpoints (doc_id deciles),
    plus the growth exponent β between the first checkpoint and each
    later one (V ∝ Nᵝ) — the curve a corpus-curation team reads to
    decide whether more data still buys new vocabulary.

    No global window anywhere: a term's FIRST document is one linear
    min-aggregate; the cumulative pair (tokens, vocab) at each
    checkpoint is a broadcast join of the 10-row threshold table onto
    the per-doc token counts / per-term first-docs followed by a
    10-group rollup. β is the one shared IEEE expression over exact
    BIGINT checkpoint values (a ratio of two ln-differences — no float
    sums anywhere)."""
    from ..operators.parallelism import ensure_parallelism
    from ..text.analysis import token_count, tokens

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    bounds = d.agg(F.count("*").alias("n_docs"))
    ks = bounds.select(
        F.explode(F.sequence(F.lit(1), F.lit(10))).alias("k"), "n_docs"
    ).select("k", F.expr("CAST(n_docs * k div 10 AS BIGINT)").alias("thr"))
    dtoks = d.select("doc_id", token_count("text").alias("ntok"))
    tok_cum = (
        dtoks.crossJoin(F.broadcast(ks))
        .filter(F.col("doc_id") < F.col("thr"))
        .groupBy("k")
        .agg(
            F.count("*").alias("n_docs_cum"),
            F.sum("ntok").alias("tokens_cum"),
        )
    )
    first = (
        d.select("doc_id", F.explode(tokens("text")).alias("w"))
        .groupBy("w")
        .agg(F.min("doc_id").alias("fd"))
    )
    voc_cum = (
        first.crossJoin(F.broadcast(ks))
        .filter(F.col("fd") < F.col("thr"))
        .groupBy("k")
        .agg(F.count("*").alias("vocab_cum"))
    )
    curve = tok_cum.join(voc_cum, "k")
    base = curve.filter(F.col("k") == 1).select(
        F.col("tokens_cum").alias("t1"), F.col("vocab_cum").alias("v1")
    )
    return (
        curve.crossJoin(F.broadcast(base))
        .select(
            F.col("k").cast("long").alias("k"),
            F.col("n_docs_cum").cast("long").alias("n_docs_cum"),
            F.col("tokens_cum").cast("long").alias("tokens_cum"),
            F.col("vocab_cum").cast("long").alias("vocab_cum"),
            F.round(
                F.expr(
                    "CASE WHEN tokens_cum > t1 THEN"
                    " (ln(CAST(vocab_cum AS DOUBLE)) - ln(CAST(v1 AS DOUBLE)))"
                    " / (ln(CAST(tokens_cum AS DOUBLE)) - ln(CAST(t1 AS DOUBLE)))"
                    " END"
                ),
                6,
            ).alias("heaps_beta"),
        )
        .orderBy("k")
    )


TXT_HEAPS_SQL = f"""
WITH ks AS (
  SELECT k, CAST((SELECT COUNT(*) FROM documents) * k // 10 AS BIGINT) AS thr
  FROM (SELECT unnest(generate_series(1, 10)) AS k)
), dtoks AS (
  SELECT doc_id, CAST(len({_DUCK_TOKENS}) AS BIGINT) AS ntok FROM documents
), tok_cum AS (
  SELECT k, COUNT(*) AS n_docs_cum, CAST(SUM(ntok) AS BIGINT) AS tokens_cum
  FROM dtoks JOIN ks ON doc_id < thr GROUP BY k
), first AS (
  SELECT u.w, MIN(doc_id) AS fd
  FROM (SELECT doc_id, {_DUCK_TOKENS} AS t FROM documents), unnest(t) AS u(w)
  GROUP BY u.w
), voc_cum AS (
  SELECT k, COUNT(*) AS vocab_cum FROM first JOIN ks ON fd < thr GROUP BY k
), curve AS (
  SELECT t.k, t.n_docs_cum, t.tokens_cum, v.vocab_cum
  FROM tok_cum t JOIN voc_cum v ON t.k = v.k
), base AS (
  SELECT tokens_cum AS t1, vocab_cum AS v1 FROM curve WHERE k = 1
)
SELECT CAST(k AS BIGINT) AS k, CAST(n_docs_cum AS BIGINT) AS n_docs_cum,
       tokens_cum, CAST(vocab_cum AS BIGINT) AS vocab_cum,
       ROUND(CASE WHEN tokens_cum > t1 THEN
         (ln(CAST(vocab_cum AS DOUBLE)) - ln(CAST(v1 AS DOUBLE)))
         / (ln(CAST(tokens_cum AS DOUBLE)) - ln(CAST(t1 AS DOUBLE))) END, 6)
         AS heaps_beta
FROM curve, base
ORDER BY k
"""


# ---------------------------------------------------------------------------
# txt_zipf_fit — Zipf rank-frequency log-log OLS over the head vocabulary
# ---------------------------------------------------------------------------

_ZIPF_TOPN = 100


def txt_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit: OLS of ln(frequency) on ln(rank) over the top
    100 corpus terms — slope ≈ −1 is the natural-language signature;
    a flat slope flags templated/synthetic text before it enters a
    training mix.

    The rank window runs over the 100-row head of the VOCABULARY table
    (deterministic (freq desc, term) order), never the corpus; the
    regression sums cover exactly 100 ln-values so the round(6) output
    absorbs libm/summation ulps (the PSI/PMI convention). One exploded
    token count is the only corpus-sized stage."""
    from ..operators.parallelism import ensure_parallelism
    from ..text.analysis import tokens

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    head = (
        d.select(F.explode(tokens("text")).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), "w")
        .limit(_ZIPF_TOPN)
    )
    from pyspark.sql import Window

    ranked = head.withColumn(
        "r", F.row_number().over(Window.orderBy(F.desc("c"), "w"))
    ).select(
        F.expr("ln(CAST(r AS DOUBLE))").alias("x"),
        F.expr("ln(CAST(c AS DOUBLE))").alias("y"),
    )
    fit = ranked.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    return fit.select(
        F.col("n").cast("long").alias("n_terms"),
        F.round(F.expr(_REG_SLOPE_ZIPF), 6).alias("zipf_slope"),
        F.round(F.expr(_REG_ICEPT_ZIPF), 6).alias("zipf_intercept"),
        F.round(F.expr(_REG_R2_ZIPF), 6).alias("r2"),
    )


_REG_SLOPE_ZIPF = "(n * sxy - sx * sy) / (n * sxx - sx * sx)"
_REG_ICEPT_ZIPF = "(sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n"
_REG_R2_ZIPF = (
    "((n * sxy - sx * sy) * (n * sxy - sx * sy))"
    " / ((n * sxx - sx * sx) * (n * syy - sy * sy))"
)

TXT_ZIPF_SQL = f"""
WITH head AS (
  SELECT u.w, COUNT(*) AS c
  FROM (SELECT {_DUCK_TOKENS} AS t FROM documents), unnest(t) AS u(w)
  GROUP BY u.w
  ORDER BY c DESC, u.w
  LIMIT {_ZIPF_TOPN}
), ranked AS (
  SELECT ln(CAST(ROW_NUMBER() OVER (ORDER BY c DESC, w) AS DOUBLE)) AS x,
         ln(CAST(c AS DOUBLE)) AS y
  FROM head
), fit AS (
  SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * x) AS sxx, SUM(x * y) AS sxy, SUM(y * y) AS syy
  FROM ranked
)
SELECT CAST(n AS BIGINT) AS n_terms,
       ROUND({_REG_SLOPE_ZIPF}, 6) AS zipf_slope,
       ROUND({_REG_ICEPT_ZIPF}, 6) AS zipf_intercept,
       ROUND({_REG_R2_ZIPF}, 6) AS r2
FROM fit
"""


# ---------------------------------------------------------------------------
# llm_rouge_eval — ROUGE-1/ROUGE-2 n-gram overlap between doc pairs
# ---------------------------------------------------------------------------


def llm_rouge_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-mean ROUGE-1 and ROUGE-2 between deterministic
    candidate/reference pairs (even doc_id = candidate, its successor
    = reference) — the n-gram overlap scoring an eval pipeline runs
    over millions of (model output, reference) rows.

    Clipped-overlap = Σ_g min(count_cand(g), count_ref(g)) per pair;
    precision/recall/F1 are carried as exact ppm integers
    ((10⁶·overlap) div total — F1 = 2·o/(nc+nr) shares the overlap so
    it stays one integer division) and the corpus mean is an integer
    division by the pair count: no float anywhere. Scale: grams
    explode map-side from token arrays, the overlap join is keyed on
    (pair, gram) — corpus-linear, hash-partitioned, no windows."""
    from ..operators.parallelism import ensure_parallelism
    from ..text.analysis import tokens

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    toks = d.select(
        "doc_id",
        (F.col("doc_id") % 2 == 0).alias("is_cand"),
        F.expr("doc_id div 2").alias("pair_id"),
        tokens("text").alias("toks"),
    )
    grams = toks.select(
        "pair_id",
        "is_cand",
        F.size("toks").alias("n1"),
        F.greatest(F.size("toks") - 1, F.lit(0)).alias("n2"),
        F.col("toks").alias("g1"),
        F.expr(
            _bound_sql(
                "toks",
                "transform(slice(__t, 1, greatest(size(__t) - 1, 0)),"
                " (x, i) -> concat(x, ' ', __t[i + 1]))",
            )
        ).alias("g2"),
    )

    def side(df: DataFrame, cand: bool, gcol: str, tot: str) -> DataFrame:
        tag = "c" if cand else "r"
        return (
            df.filter(F.col("is_cand") == cand)
            .select("pair_id", F.col(tot).alias(f"n_{tag}"),
                    F.explode_outer(gcol).alias("g"))
            .groupBy("pair_id", "g")
            .agg(
                F.count(F.col("g")).alias(f"c_{tag}"),
                F.max(f"n_{tag}").alias(f"n_{tag}"),
            )
        )

    def overlap(gcol: str, tot: str) -> DataFrame:
        c = side(grams, True, gcol, tot)
        r = side(grams, False, gcol, tot)
        per_gram = c.join(r, ["pair_id", "g"]).select(
            "pair_id", F.least("c_c", "c_r").alias("o")
        )
        totals = (
            grams.groupBy("pair_id")
            .agg(
                F.max(F.when(F.col("is_cand"), F.col(tot))).alias("n_c"),
                F.max(F.when(~F.col("is_cand"), F.col(tot))).alias("n_r"),
            )
            .filter(F.col("n_c").isNotNull() & F.col("n_r").isNotNull())
        )
        osum = per_gram.groupBy("pair_id").agg(F.sum("o").alias("o"))
        return totals.join(osum, "pair_id", "left_outer").select(
            "pair_id",
            F.coalesce("o", F.lit(0)).alias("o"),
            "n_c",
            "n_r",
        )

    def metrics(df: DataFrame, pfx: str) -> DataFrame:
        return df.agg(
            F.count("*").alias(f"{pfx}_pairs"),
            F.expr(
                "CAST(SUM(CASE WHEN n_c > 0 THEN o * 1000000 div n_c"
                " ELSE 0 END) div COUNT(*) AS BIGINT)"
            ).alias(f"{pfx}_p_ppm"),
            F.expr(
                "CAST(SUM(CASE WHEN n_r > 0 THEN o * 1000000 div n_r"
                " ELSE 0 END) div COUNT(*) AS BIGINT)"
            ).alias(f"{pfx}_r_ppm"),
            F.expr(
                "CAST(SUM(CASE WHEN n_c + n_r > 0 THEN"
                " 2 * o * 1000000 div (n_c + n_r) ELSE 0 END)"
                " div COUNT(*) AS BIGINT)"
            ).alias(f"{pfx}_f1_ppm"),
        )

    m1 = metrics(overlap("g1", "n1"), "rouge1")
    m2 = metrics(overlap("g2", "n2"), "rouge2")
    return m1.crossJoin(m2)


LLM_ROUGE_SQL = f"""
WITH toks AS (
  SELECT doc_id, doc_id % 2 = 0 AS is_cand, doc_id // 2 AS pair_id,
         {_DUCK_TOKENS} AS toks
  FROM documents
), grams AS (
  SELECT pair_id, is_cand,
         CAST(len(toks) AS BIGINT) AS n1,
         CAST(GREATEST(len(toks) - 1, 0) AS BIGINT) AS n2,
         toks AS g1,
         list_transform(toks[1:len(toks) - 1],
                        (x, i) -> x || ' ' || toks[i + 1]) AS g2
  FROM toks
), uni AS (
  SELECT pair_id, is_cand, u.g FROM grams, unnest(g1) AS u(g)
), big AS (
  SELECT pair_id, is_cand, u.g FROM grams, unnest(g2) AS u(g)
), totals AS (
  SELECT pair_id,
         MAX(CASE WHEN is_cand THEN n1 END) AS nc1,
         MAX(CASE WHEN NOT is_cand THEN n1 END) AS nr1,
         MAX(CASE WHEN is_cand THEN n2 END) AS nc2,
         MAX(CASE WHEN NOT is_cand THEN n2 END) AS nr2
  FROM grams GROUP BY 1
  HAVING MAX(CASE WHEN is_cand THEN n1 END) IS NOT NULL
     AND MAX(CASE WHEN NOT is_cand THEN n1 END) IS NOT NULL
), o1 AS (
  SELECT c.pair_id, CAST(SUM(LEAST(c.c, r.c)) AS BIGINT) AS o
  FROM (SELECT pair_id, g, COUNT(*) AS c FROM uni WHERE is_cand GROUP BY 1, 2) c
  JOIN (SELECT pair_id, g, COUNT(*) AS c FROM uni WHERE NOT is_cand GROUP BY 1, 2) r
    ON c.pair_id = r.pair_id AND c.g = r.g
  GROUP BY 1
), o2 AS (
  SELECT c.pair_id, CAST(SUM(LEAST(c.c, r.c)) AS BIGINT) AS o
  FROM (SELECT pair_id, g, COUNT(*) AS c FROM big WHERE is_cand GROUP BY 1, 2) c
  JOIN (SELECT pair_id, g, COUNT(*) AS c FROM big WHERE NOT is_cand GROUP BY 1, 2) r
    ON c.pair_id = r.pair_id AND c.g = r.g
  GROUP BY 1
), per AS (
  SELECT t.pair_id,
         COALESCE(o1.o, 0) AS ov1, COALESCE(o2.o, 0) AS ov2,
         t.nc1, t.nr1, t.nc2, t.nr2
  FROM totals t
  LEFT JOIN o1 ON o1.pair_id = t.pair_id
  LEFT JOIN o2 ON o2.pair_id = t.pair_id
)
SELECT CAST(COUNT(*) AS BIGINT) AS rouge1_pairs,
       CAST(SUM(CASE WHEN nc1 > 0 THEN ov1 * 1000000 // nc1 ELSE 0 END)
            // COUNT(*) AS BIGINT) AS rouge1_p_ppm,
       CAST(SUM(CASE WHEN nr1 > 0 THEN ov1 * 1000000 // nr1 ELSE 0 END)
            // COUNT(*) AS BIGINT) AS rouge1_r_ppm,
       CAST(SUM(CASE WHEN nc1 + nr1 > 0 THEN 2 * ov1 * 1000000 // (nc1 + nr1)
            ELSE 0 END) // COUNT(*) AS BIGINT) AS rouge1_f1_ppm,
       CAST(COUNT(*) AS BIGINT) AS rouge2_pairs,
       CAST(SUM(CASE WHEN nc2 > 0 THEN ov2 * 1000000 // nc2 ELSE 0 END)
            // COUNT(*) AS BIGINT) AS rouge2_p_ppm,
       CAST(SUM(CASE WHEN nr2 > 0 THEN ov2 * 1000000 // nr2 ELSE 0 END)
            // COUNT(*) AS BIGINT) AS rouge2_r_ppm,
       CAST(SUM(CASE WHEN nc2 + nr2 > 0 THEN 2 * ov2 * 1000000 // (nc2 + nr2)
            ELSE 0 END) // COUNT(*) AS BIGINT) AS rouge2_f1_ppm
FROM per
"""


# ---------------------------------------------------------------------------
# llm_kl_drift — smoothed unigram KL divergence between two sources
# ---------------------------------------------------------------------------


def llm_kl_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-distribution KL divergence between two corpus slices
    (src0 vs src1) with add-one smoothing over the union vocabulary —
    the language-model-level drift monitor that catches a source
    changing register/topic before it shifts a training mix (PSI's
    lexical sibling; dq_drift_psi watches numeric columns, this
    watches the vocabulary itself).

    Each vocabulary term's contribution p·ln(p/q) is quantized to an
    exact nano integer (FLOOR(x·10⁹ + 0.5) of the same IEEE expression
    in both engines), so the sum is order-free and hash-exact. Both
    directions KL(P‖Q) and KL(Q‖P) are reported — asymmetry itself is
    a signal. Scale: one exploded token count per slice, then the
    global totals come from a ONE-ROW aggregate cross-joined back by
    broadcast — the vocabulary table grows with the corpus (Heaps'
    law), so an unbounded window over it would plan an Exchange
    SinglePartition; the agg+broadcast shape gives identical totals
    with no single-task sort. Everything after is one rollup."""
    from ..operators.parallelism import ensure_parallelism
    from ..text.analysis import tokens

    d = ensure_parallelism(load_table(spark, sf_dir, "documents")).filter(
        F.col("source").isin("src0", "src1")
    )
    counts = (
        d.select(
            (F.col("source") == "src0").alias("is_a"),
            F.explode(tokens("text")).alias("w"),
        )
        .groupBy("w")
        .agg(
            F.sum(F.when(F.col("is_a"), 1).otherwise(0)).alias("ca"),
            F.sum(F.when(~F.col("is_a"), 1).otherwise(0)).alias("cb"),
        )
    )
    totals = counts.agg(
        F.sum("ca").alias("na"),
        F.sum("cb").alias("nb"),
        F.count("*").alias("v"),
    )
    tot = counts.crossJoin(F.broadcast(totals))
    terms = tot.select(
        "ca",
        "cb",
        "na",
        "nb",
        "v",
        F.expr(_KL_PQ_NANO).alias("pq"),
        F.expr(_KL_QP_NANO).alias("qp"),
    )
    return terms.agg(
        F.max("v").cast("long").alias("n_vocab"),
        F.max("na").cast("long").alias("n_tokens_a"),
        F.max("nb").cast("long").alias("n_tokens_b"),
        F.sum("pq").cast("long").alias("kl_pq_nano"),
        F.sum("qp").cast("long").alias("kl_qp_nano"),
    )


_KL_P = "((CAST(ca AS DOUBLE) + 1) / (CAST(na AS DOUBLE) + v))"
_KL_Q = "((CAST(cb AS DOUBLE) + 1) / (CAST(nb AS DOUBLE) + v))"
_KL_PQ_NANO = (
    f"CAST(FLOOR({_KL_P} * ln({_KL_P} / {_KL_Q})"
    " * CAST(1000000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)"
)
_KL_QP_NANO = (
    f"CAST(FLOOR({_KL_Q} * ln({_KL_Q} / {_KL_P})"
    " * CAST(1000000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)"
)

LLM_KL_SQL = f"""
WITH counts AS (
  SELECT u.w,
         SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS ca,
         SUM(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS cb
  FROM (SELECT source, {_DUCK_TOKENS} AS t FROM documents
        WHERE source IN ('src0', 'src1')), unnest(t) AS u(w)
  GROUP BY u.w
), tot AS (
  SELECT ca, cb,
         SUM(ca) OVER () AS na, SUM(cb) OVER () AS nb,
         COUNT(*) OVER () AS v
  FROM counts
), terms AS (
  SELECT v, na, nb,
         {_KL_PQ_NANO} AS pq,
         {_KL_QP_NANO} AS qp
  FROM tot
)
SELECT CAST(MAX(v) AS BIGINT) AS n_vocab,
       CAST(MAX(na) AS BIGINT) AS n_tokens_a,
       CAST(MAX(nb) AS BIGINT) AS n_tokens_b,
       CAST(SUM(pq) AS BIGINT) AS kl_pq_nano,
       CAST(SUM(qp) AS BIGINT) AS kl_qp_nano
FROM terms
"""


# ---------------------------------------------------------------------------
# llm_tokenizer_fertility — subword-per-word fertility audit per source
# ---------------------------------------------------------------------------


def llm_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility audit per source: subword tokens per
    whitespace word (the BPE-ish pre-tokenization count over the
    whitespace count) and characters per subword token — the two
    ratios that decide tokenizer/vocab fit for a corpus slice (high
    fertility = the tokenizer fragments this slice; training cost
    scales with it).

    Exact ppm integers throughout ((10⁶·a) div b on exact BIGINT
    sums); one map-side-combinable rollup to the ~20-source grain,
    no joins, no windows."""
    from ..operators.parallelism import ensure_parallelism
    from ..text.analysis import bpe_ish_token_count, token_count

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    per_src = d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(token_count("text")).alias("n_words"),
        F.sum(bpe_ish_token_count("text")).alias("n_subwords"),
        F.sum(F.length("text").cast("long")).alias("n_chars"),
    )
    return per_src.select(
        "source",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_words").cast("long").alias("n_words"),
        F.col("n_subwords").cast("long").alias("n_subwords"),
        F.expr(
            "CASE WHEN n_words > 0 THEN n_subwords * 1000000 div n_words"
            " ELSE 0 END"
        ).alias("fertility_ppm"),
        F.expr(
            "CASE WHEN n_subwords > 0 THEN n_chars * 1000000 div n_subwords"
            " ELSE 0 END"
        ).alias("chars_per_subword_ppm"),
    ).orderBy("source")


LLM_FERTILITY_SQL = f"""
WITH per_src AS (
  SELECT source, COUNT(*) AS n_docs,
         CAST(SUM(CASE WHEN trim(lower(text)) = '' THEN 0
                  ELSE len(string_split_regex(trim(lower(text)), '\\s+')) END)
              AS BIGINT) AS n_words,
         CAST(SUM(len(regexp_extract_all(text,
              '([A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+)'))) AS BIGINT) AS n_subwords,
         CAST(SUM(length(text)) AS BIGINT) AS n_chars
  FROM documents GROUP BY 1
)
SELECT source, CAST(n_docs AS BIGINT) AS n_docs, n_words, n_subwords,
       CASE WHEN n_words > 0 THEN n_subwords * 1000000 // n_words
            ELSE 0 END AS fertility_ppm,
       CASE WHEN n_subwords > 0 THEN n_chars * 1000000 // n_subwords
            ELSE 0 END AS chars_per_subword_ppm
FROM per_src
ORDER BY source
"""


# ---------------------------------------------------------------------------
# llm_budget_waterfill — token-budget allocation across sources
# ---------------------------------------------------------------------------


def llm_budget_waterfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Water-filling token-budget allocation: distribute a training
    budget B (60% of corpus tokens) across sources with equal target
    shares, capped by each source's availability — small sources
    saturate (contribute everything), the rest split the remainder
    evenly at the water level c. The closed-form mixture-construction
    step that replaces iterative "re-normalize after capping" loops.

    Closed form via one sorted pass: rank sources by availability
    ascending; source at rank r saturates iff avail·(m−r)+prefix ≤ B;
    the water level is (B − saturated_prefix) div (m − j*) — all
    EXACT integer arithmetic (BIGINT token counts, integer division),
    windows over the ~20-row source table only."""
    from ..operators.parallelism import ensure_parallelism
    from ..text.analysis import token_count

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    avail = d.groupBy("source").agg(
        F.sum(token_count("text")).alias("avail")
    )
    w_rank = Window.orderBy("avail", "source")
    w_cum = w_rank.rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = avail.select(
        "source",
        "avail",
        F.row_number().over(w_rank).alias("r"),
        F.sum("avail").over(w_cum).alias("prefix"),
        F.count("*").over(w_all).alias("m"),
        F.expr("SUM(avail) OVER () * 3 div 5").alias("b"),
    ).withColumn(
        "saturated",
        F.expr("avail * (m - r) + prefix <= b"),
    )
    lvl = ranked.withColumn(
        "jstar",
        F.coalesce(
            F.max(F.when(F.col("saturated"), F.col("r"))).over(w_all), F.lit(0)
        ),
    ).withColumn(
        "sat_prefix",
        F.coalesce(
            F.max(F.when(F.col("saturated"), F.col("prefix"))).over(w_all),
            F.lit(0),
        ),
    ).withColumn(
        "c",
        F.expr(
            "CASE WHEN jstar < m THEN (b - sat_prefix) div (m - jstar) END"
        ),
    )
    return lvl.select(
        "source",
        F.col("avail").cast("long").alias("avail_tokens"),
        F.expr(
            "CAST(CASE WHEN saturated THEN avail"
            " ELSE LEAST(avail, c) END AS BIGINT)"
        ).alias("allocated_tokens"),
        "saturated",
        F.col("b").cast("long").alias("budget_tokens"),
    ).orderBy("source")


LLM_WATERFILL_SQL = f"""
WITH avail AS (
  SELECT source,
         CAST(SUM(CASE WHEN trim(lower(text)) = '' THEN 0
              ELSE len(string_split_regex(trim(lower(text)), '\\s+')) END)
              AS BIGINT) AS avail
  FROM documents GROUP BY 1
), ranked AS (
  SELECT source, avail,
         ROW_NUMBER() OVER (ORDER BY avail, source) AS r,
         SUM(avail) OVER (ORDER BY avail, source
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prefix,
         COUNT(*) OVER () AS m,
         SUM(avail) OVER () * 3 // 5 AS b
  FROM avail
), flagged AS (
  SELECT *, avail * (m - r) + prefix <= b AS saturated FROM ranked
), lvl AS (
  SELECT *,
         COALESCE(MAX(CASE WHEN saturated THEN r END) OVER (), 0) AS jstar,
         COALESCE(MAX(CASE WHEN saturated THEN prefix END) OVER (), 0)
           AS sat_prefix
  FROM flagged
)
SELECT source, CAST(avail AS BIGINT) AS avail_tokens,
       CAST(CASE WHEN saturated THEN avail
            ELSE LEAST(avail, (b - sat_prefix) // NULLIF(m - jstar, 0)) END
            AS BIGINT)
         AS allocated_tokens,
       saturated,
       CAST(b AS BIGINT) AS budget_tokens
FROM lvl
ORDER BY source
"""


# ---------------------------------------------------------------------------
# llm_boilerplate_sentences — cross-document repeated-sentence census
# ---------------------------------------------------------------------------

_BP_MIN_DOCS = 3
_BP_MIN_CHARS = 20
_BP_TOPK = 15


def llm_boilerplate_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate-sentence census: sentences (split on [.!?]+,
    trimmed/lowercased, ≥ 20 chars) that appear in ≥ 3 DISTINCT
    documents, ranked by document reach — the sentence-granularity
    dedup signal (cookie banners, license headers, nav text) that
    document-level MinHash misses and that C4-style pipelines strip
    before training.

    Scale: sentences explode map-side; the census is one (sentence)
    rollup counting rows and distinct docs — corpus-linear,
    hash-partitioned on the sentence key. Top-15 by (n_docs,
    n_occurrences, sentence) is deterministic."""
    from ..operators.parallelism import ensure_parallelism

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    sents = d.select(
        "doc_id",
        F.explode(F.split(F.lower("text"), r"[.!?]+")).alias("raw"),
    ).select("doc_id", F.trim("raw").alias("s")).filter(
        F.length("s") >= _BP_MIN_CHARS
    )
    census = sents.groupBy("s").agg(
        F.count("*").alias("n_occurrences"),
        F.countDistinct("doc_id").alias("n_docs"),
    )
    return (
        census.filter(F.col("n_docs") >= _BP_MIN_DOCS)
        .select(
            F.col("s").alias("sentence"),
            F.col("n_occurrences").cast("long").alias("n_occurrences"),
            F.col("n_docs").cast("long").alias("n_docs"),
        )
        .orderBy(F.desc("n_docs"), F.desc("n_occurrences"), "sentence")
        .limit(_BP_TOPK)
    )


LLM_BOILERPLATE_SQL = f"""
WITH sents AS (
  SELECT doc_id, trim(u.raw) AS s
  FROM (SELECT doc_id, string_split_regex(lower(text), '[.!?]+') AS parts
        FROM documents), unnest(parts) AS u(raw)
  WHERE length(trim(u.raw)) >= {_BP_MIN_CHARS}
), census AS (
  SELECT s AS sentence, COUNT(*) AS n_occurrences,
         COUNT(DISTINCT doc_id) AS n_docs
  FROM sents GROUP BY 1
)
SELECT sentence, CAST(n_occurrences AS BIGINT) AS n_occurrences,
       CAST(n_docs AS BIGINT) AS n_docs
FROM census
WHERE n_docs >= {_BP_MIN_DOCS}
ORDER BY n_docs DESC, n_occurrences DESC, sentence
LIMIT {_BP_TOPK}
"""


# ---------------------------------------------------------------------------
# llm_oov_rate — out-of-vocabulary rate per source vs the head vocab
# ---------------------------------------------------------------------------

_OOV_VOCAB = 1000


def llm_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary audit: each source's token mass that falls
    outside the corpus top-1000 vocabulary (exact ppm) — the
    tokenizer-coverage read that flags a slice whose vocabulary a
    fixed tokenizer will shred into bytes (high OOV = high fertility
    = expensive tokens), the corpus-side complement of
    llm_tokenizer_fertility.

    The head vocabulary is a deterministic top-k (count desc, term)
    — a ≤1000-row broadcast; per-source OOV mass is one anti-joined
    rollup. Exact integer ppm everywhere."""
    from ..operators.parallelism import ensure_parallelism
    from ..text.analysis import tokens

    d = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    toks = d.select(
        "source", F.explode(tokens("text")).alias("w")
    ).localCheckpoint()
    vocab = (
        toks.groupBy("w")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), "w")
        .limit(_OOV_VOCAB)
        .select("w")
    )
    flagged = toks.join(
        F.broadcast(vocab.withColumn("in_v", F.lit(1))), "w", "left_outer"
    )
    return (
        flagged.groupBy("source")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(F.when(F.col("in_v").isNull(), 1).otherwise(0)).alias(
                "n_oov"
            ),
        )
        .select(
            "source",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.col("n_oov").cast("long").alias("n_oov"),
            F.expr("n_oov * 1000000 div n_tokens").alias("oov_ppm"),
        )
        .orderBy("source")
    )


LLM_OOV_SQL = f"""
WITH toks AS (
  SELECT source, u.w
  FROM (SELECT source, {_DUCK_TOKENS} AS t FROM documents), unnest(t) AS u(w)
), vocab AS (
  SELECT w FROM (
    SELECT w, COUNT(*) AS c FROM toks GROUP BY 1
    ORDER BY c DESC, w LIMIT {_OOV_VOCAB}
  )
)
SELECT t.source, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       CAST(SUM(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) * 1000000
            // COUNT(*) AS BIGINT) AS oov_ppm
FROM toks t LEFT JOIN vocab v ON t.w = v.w
GROUP BY t.source
ORDER BY t.source
"""


# ---------------------------------------------------------------------------
# llm_best_of_n — rejection-sampling acceptance math per source
# ---------------------------------------------------------------------------

_BON_N = 4
_BON_MIN_CHARS = 400


def llm_best_of_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best-of-n rejection-sampling math per source: with acceptance
    rate p (docs passing the ≥400-char quality bar), the chance that
    at least one of n=4 independent samples passes is 1 − (1−p)ⁿ, and
    the expected number of raw samples per accepted one is 1/p — the
    two numbers that size a rejection-sampling pipeline's compute bill
    before anyone launches it.

    Acceptance counts are exact integers from one rollup; the
    closed-form probabilities are the same IEEE expression in both
    engines (round 9). Expected draws is NULL for a source with
    nothing above the bar — an honest "infinite" rather than a
    sentinel."""
    d = load_table(spark, sf_dir, "documents")
    per = d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(
            (F.col("n_chars") >= _BON_MIN_CHARS).cast("long")
        ).alias("n_pass"),
    )
    return per.select(
        "source",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_pass").cast("long").alias("n_pass"),
        F.expr("n_pass * 1000000 div n_docs").alias("accept_ppm"),
        F.round(
            F.expr(
                "CAST(1 AS DOUBLE)"
                " - pow(CAST(n_docs - n_pass AS DOUBLE) / n_docs,"
                f" {_BON_N})"
            ),
            9,
        ).alias(f"best_of_{_BON_N}_rate"),
        F.round(
            F.expr(
                "CASE WHEN n_pass > 0 THEN"
                " CAST(n_docs AS DOUBLE) / n_pass END"
            ),
            9,
        ).alias("expected_draws_per_accept"),
    ).orderBy("source")


LLM_BON_SQL = f"""
WITH per AS (
  SELECT source, COUNT(*) AS n_docs,
         SUM(CASE WHEN n_chars >= {_BON_MIN_CHARS} THEN 1 ELSE 0 END)
           AS n_pass
  FROM documents GROUP BY 1
)
SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_pass AS BIGINT) AS n_pass,
       CAST(n_pass * 1000000 // n_docs AS BIGINT) AS accept_ppm,
       ROUND(CAST(1 AS DOUBLE)
             - pow(CAST(n_docs - n_pass AS DOUBLE) / n_docs, {_BON_N}), 9)
         AS best_of_{_BON_N}_rate,
       ROUND(CASE WHEN n_pass > 0 THEN CAST(n_docs AS DOUBLE) / n_pass END, 9)
         AS expected_draws_per_accept
FROM per
ORDER BY source
"""


QUERIES = {
    "llm_best_of_n": (llm_best_of_n, LLM_BON_SQL),
    "llm_oov_rate": (llm_oov_rate, LLM_OOV_SQL),
    "llm_budget_waterfill": (llm_budget_waterfill, LLM_WATERFILL_SQL),
    "llm_boilerplate_sentences": (llm_boilerplate_sentences, LLM_BOILERPLATE_SQL),
    "llm_tokenizer_fertility": (llm_tokenizer_fertility, LLM_FERTILITY_SQL),
    "txt_heaps_law": (txt_heaps_law, TXT_HEAPS_SQL),
    "txt_zipf_fit": (txt_zipf_fit, TXT_ZIPF_SQL),
    "llm_rouge_eval": (llm_rouge_eval, LLM_ROUGE_SQL),
    "llm_kl_drift": (llm_kl_drift, LLM_KL_SQL),
    "txt_word_lift": (txt_word_lift, TXT_LIFT_SQL),
    "llm_shard_assign": (llm_shard_assign, LLM_SHARD_SQL),
    "llm_ngram_novelty": (llm_ngram_novelty, LLM_NOVELTY_SQL),
    "ml_feature_hashing": (ml_feature_hashing, ML_FEATURE_HASH_SQL),
    "txt_readability": (txt_readability, TXT_READ_SQL),
    "llm_mix_diversity": (llm_mix_diversity, LLM_MIX_DIV_SQL),
    "llm_cdc_chunk_dedup": (llm_cdc_chunk_dedup, LLM_CDC_SQL),
    "llm_url_dedup": (llm_url_dedup, LLM_URL_DEDUP_SQL),
    "llm_perplexity_buckets": (llm_perplexity_buckets, LLM_PPL_SQL),
    "txt_collocations": (txt_collocations, TXT_COLLOC_SQL),
    "txt_rake_keyphrases": (txt_rake_keyphrases, TXT_RAKE_SQL),
    "llm_dp_count": (llm_dp_count, LLM_DP_SQL),
    "txt_entropy": (txt_entropy, TXT_ENTROPY_SQL),
    "llm_mix_temperature": (llm_mix_temperature, LLM_MIX_TEMP_SQL),
    "txt_bm25": (txt_bm25, TXT_BM25_SQL),
    "txt_langid_eval": (txt_langid_eval, TXT_LANGID_EVAL_SQL),
    "llm_bigram_lm": (llm_bigram_lm, LLM_BIGRAM_LM_SQL),
    "llm_corpus_filter": (llm_corpus_filter, LLM_CORPUS_FILTER_SQL),
    "llm_chunk_udtf": (llm_chunk_udtf, LLM_CHUNK_SQL),
    "llm_mix_sample": (llm_mix_sample, LLM_MIX_SQL),
    "txt_token_stats": (txt_token_stats, TXT_TOKEN_SQL),
    "txt_edit_distance": (txt_edit_distance, TXT_EDIT_SQL),
    "llm_bpe_train": (llm_bpe_train, LLM_BPE_TRAIN_SQL),
    "llm_bpe_tokenize": (llm_bpe_tokenize, LLM_BPE_TOKENIZE_SQL),
    "llm_decontaminate": (llm_decontaminate, LLM_DECONTAM_SQL),
    "txt_repetition": (txt_repetition, TXT_REPETITION_SQL),
    "txt_pii_redact": (txt_pii_redact, TXT_PII_SQL),
    "txt_quality": (txt_quality, TXT_QUALITY_SQL),
    "txt_langid": (txt_langid, TXT_LANGID_SQL),
    "txt_fingerprint": (txt_fingerprint, TXT_FINGERPRINT_SQL),
    "txt_bpeish_count": (txt_bpeish_count, TXT_BPEISH_SQL),
    "txt_tfidf": (txt_tfidf, TXT_TFIDF_SQL),
    "llm_seq_pack": (llm_seq_pack, LLM_SEQ_PACK_SQL),
}
