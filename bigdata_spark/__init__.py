"""bigdata_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference
time-series/relational pipeline (KRudd-E/BigData, surveyed in SURVEY.md)
as an idiomatic Spark DataFrame/SQL engine, extended with the
large-scale training-data-pipeline operators (dedup, similarity search,
text analysis, multimodal plumbing) that a 100 TB corpus needs.

Layout:
    session     — SparkSession factory with scale-tuned defaults
    sources     — schema'd scans (parquet/csv/tsv), catalog of testdata
    operators   — sampling/splits, preprocessing, gini, partitioning
    functions   — native array/distance/text column expressions
    plans       — composed relational queries (TPC-H-ish analytics)
    streaming   — event-time windows (tumbling/sliding/session), streams
    ml          — proximity tree/forest, prediction, evaluation
    text        — language-ID, quality scoring, tokenization, fingerprints
    dedup       — exact, minhash-LSH, simhash, n-gram jaccard near-dup
    similarity  — brute-force + LSH-bucketed ANN over embeddings
"""

__version__ = "0.1.0"
