"""Text primitives for the document-pipeline operators (dedup, quality,
lang-id, fingerprinting). Pure ``pyspark.sql.functions`` compositions —
codegen'd, no UDFs — and each has a 1:1 ANSI-SQL translation used by the
DuckDB oracles, so every operator built on these is hash-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalized_text(text: Column) -> Column:
    """Lowercase, collapse every non-alphanumeric run to one space, trim."""
    return F.trim(F.regexp_replace(F.lower(text), r"[^a-z0-9]+", " "))


def words(text: Column) -> Column:
    """Whitespace tokens, empties removed."""
    return F.filter(F.split(text, r"\s+"), lambda w: w != "")


def word_shingles(ws: Column, n: int = 3) -> Column:
    """Distinct n-word shingles of a word array (the MinHash/Jaccard unit).

    Empty result when the document has fewer than ``n`` words.
    """
    starts = F.sequence(F.lit(1), F.size(ws) - F.lit(n - 1))
    grams = F.transform(starts, lambda i: F.array_join(F.slice(ws, i, n), " "))
    return F.when(F.size(ws) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def token_count(text: Column) -> Column:
    """BPE-ish token count: alphabetic runs, digit runs, and single
    punctuation marks each count as one token."""
    return F.regexp_count(text, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"))


def fingerprint(text: Column) -> Column:
    """OpenRefine-style key-collision fingerprint: md5 of the sorted distinct
    normalized words — a rolling-hash-free deterministic document signature
    that clusters token-permuted duplicates."""
    ws = words(normalized_text(text))
    return F.md5(F.array_join(F.array_sort(F.array_distinct(ws)), " "))
