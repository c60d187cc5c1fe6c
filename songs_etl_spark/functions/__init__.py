from songs_etl_spark.functions.casts import parse_release_date, try_iso_timestamp
from songs_etl_spark.functions.keys import surrogate_key
from songs_etl_spark.functions.text import char_ngrams, tokens, word_shingles
from songs_etl_spark.functions.vectors import cosine_similarity, dot, l2_norm

__all__ = [
    "surrogate_key",
    "try_iso_timestamp",
    "parse_release_date",
    "tokens",
    "word_shingles",
    "char_ngrams",
    "dot",
    "l2_norm",
    "cosine_similarity",
]
