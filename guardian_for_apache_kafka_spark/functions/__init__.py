from guardian_for_apache_kafka_spark.functions.columns import (
    cosine_similarity,
    hamming_distance64,
    minhash_signature,
    minhash_signature_udf,
    ngram_shingles,
    rolling_fingerprint,
    simhash64,
    tokens_col,
)

__all__ = [
    "cosine_similarity",
    "hamming_distance64",
    "minhash_signature",
    "minhash_signature_udf",
    "ngram_shingles",
    "rolling_fingerprint",
    "simhash64",
    "tokens_col",
]
