from .components import connected_components
from .exact import exact_dedup
from .minhash import MinHasher, minhash_near_dupes
from .ngram import ngram_jaccard, ngram_jaccard_near_dupes
from .simhash import SimHasher, hamming_near_dupes, simhash_near_dupes
from .spans import duplicated_span_stats

__all__ = [
    "connected_components",
    "exact_dedup",
    "MinHasher",
    "minhash_near_dupes",
    "SimHasher",
    "simhash_near_dupes",
    "hamming_near_dupes",
    "ngram_jaccard",
    "ngram_jaccard_near_dupes",
    "duplicated_span_stats",
]
