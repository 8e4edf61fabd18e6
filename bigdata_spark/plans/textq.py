"""Text-analysis queries over ``documents`` (driver brief: token
counting, quality scoring, language-ID, fingerprinting).

Oracles replicate the exact same normalization/tokenization in DuckDB
(string_split_regex + list lambdas); the portable md5-derived
fingerprint matches bit-for-bit (functions/hashing.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from ..text.analysis import LANG_MARKERS, doc_fingerprint, language_id, quality_features, token_count

# DuckDB fragment: tokens of trimmed/lowercased text, '' → empty list.
_DUCK_TOKENS = (
    "CASE WHEN trim(lower(text)) = '' THEN CAST([] AS VARCHAR[]) "
    "ELSE string_split_regex(trim(lower(text)), '\\s+') END"
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


QUERIES = {
    "txt_token_stats": (txt_token_stats, TXT_TOKEN_SQL),
    "txt_edit_distance": (txt_edit_distance, TXT_EDIT_SQL),
    "txt_quality": (txt_quality, TXT_QUALITY_SQL),
    "txt_langid": (txt_langid, TXT_LANGID_SQL),
    "txt_fingerprint": (txt_fingerprint, TXT_FINGERPRINT_SQL),
    "txt_bpeish_count": (txt_bpeish_count, TXT_BPEISH_SQL),
}
