"""Column-level function library.

The reference interprets no values at all (SURVEY.md §2.8 — keys/values are
opaque bytes); everything here is engine-added capability. All functions are
built from ``pyspark.sql.functions`` so they stay JVM-side inside
whole-stage codegen — no Python in the hot path.
"""

from helixdb_spark.functions.vector import cosine_similarity, dot, l2_norm
from helixdb_spark.functions.text import (
    char_shingles,
    fingerprint,
    normalized_text,
    squeezed_text,
    token_count,
    word_shingles,
    words,
)

__all__ = [
    "cosine_similarity",
    "dot",
    "l2_norm",
    "char_shingles",
    "fingerprint",
    "normalized_text",
    "squeezed_text",
    "token_count",
    "word_shingles",
    "words",
]
