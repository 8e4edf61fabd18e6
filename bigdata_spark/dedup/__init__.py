from .exact import exact_dup_groups, exact_dedup
from .minhash import minhash_signature, minhash_dup_pairs
from .ngram import ngram_jaccard_pairs
from .simhash import simhash64, simhash_dup_pairs

__all__ = [
    "exact_dup_groups",
    "exact_dedup",
    "minhash_signature",
    "minhash_dup_pairs",
    "ngram_jaccard_pairs",
    "simhash64",
    "simhash_dup_pairs",
]
