"""Curated column-expression library — the engine's scalar/array surface.

Everything here is a pure ``Column -> Column`` built from JVM-side
``pyspark.sql.functions`` (whole-stage-codegen friendly, no Python UDFs).
Grouped by family; the DataFrame-level operators live in
``npm_mirror_spark.operators``.
"""

# string / path projections (reference P5-P11)
from npm_mirror_spark.operators.projections import (  # noqa: F401
    artifact_filename,
    iso_to_ts,
    prefix_bucket,
    scrub_special_chars,
    split_last,
    ts_to_iso,
)

# text canonicalization / hashing / fuzzy-dedup primitives
from npm_mirror_spark.operators.dedup import (  # noqa: F401
    jaccard,
    lsh_band_hashes,
    md5_hash64,
    md5_key64,
    minhash_signature,
    normalize_text,
    simhash16,
    text_hash,
    word_shingles,
)

# vector math
from npm_mirror_spark.operators.similarity import (  # noqa: F401
    cosine,
    dot,
    l2_norm,
    srp_signature,
)

# text analytics
from npm_mirror_spark.operators.text import (  # noqa: F401
    bpe_ish_token_count,
    bpe_ish_tokens,
    fingerprint,
    hashed_embedding,
    language_id,
    language_scores,
    punct_count,
    stopword_count,
    ws_token_count,
    ws_tokens,
)

# curation primitives (round 2; canonicalize_url round 6)
from npm_mirror_spark.operators.curation import (  # noqa: F401
    PII_PATTERNS,
    canonicalize_url,
    sample_bucket,
    url_host,
)

# bloom-filter membership (round 5)
from npm_mirror_spark.operators.bloom import (  # noqa: F401
    bloom_might_contain,
)

__all__ = [
    "artifact_filename",
    "iso_to_ts",
    "prefix_bucket",
    "scrub_special_chars",
    "split_last",
    "ts_to_iso",
    "jaccard",
    "lsh_band_hashes",
    "minhash_signature",
    "normalize_text",
    "simhash16",
    "text_hash",
    "word_shingles",
    "md5_hash64",
    "md5_key64",
    "cosine",
    "dot",
    "l2_norm",
    "srp_signature",
    "bpe_ish_token_count",
    "bpe_ish_tokens",
    "fingerprint",
    "hashed_embedding",
    "language_id",
    "PII_PATTERNS",
    "sample_bucket",
    "url_host",
    "canonicalize_url",
    "language_scores",
    "punct_count",
    "stopword_count",
    "ws_token_count",
    "ws_tokens",
    "bloom_might_contain",
]
