"""Edge-case unit tests for the document-pipeline operators that the
sf0.001 oracle-parity sweep can't hit (its corpus has no empty or
degenerate documents)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from helixdb_spark.functions.text import (
    WINNOW_K,
    WINNOW_W,
    normalized_text,
    with_winnow_fingerprints,
)
from helixdb_spark.operators.multimodal import (
    RESIZE_TARGET_H,
    RESIZE_TARGET_W,
    resize_media,
    synthesize_media,
)


def _winnow(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = with_winnow_fingerprints(
        df.withColumn("__n", normalized_text(F.col("text"))), F.col("__n")
    )
    return {r["doc_id"]: r["fps"] for r in out.select("doc_id", "fps").collect()}


def test_winnow_empty_and_short_text(spark):
    fps = _winnow(spark, ["", "ab", "x" * (WINNOW_K - 1)])
    assert fps[0] == []  # empty
    assert fps[1] == []  # shorter than k
    assert fps[2] == []  # still shorter than k


def test_winnow_needs_w_grams(spark):
    # k + w - 2 chars yields w-1 grams -> below the winnowing window
    n_chars = WINNOW_K + WINNOW_W - 2
    fps = _winnow(spark, ["a" * n_chars])
    assert fps[0] == []
    # one more char yields exactly w grams -> exactly one window minimum
    fps = _winnow(spark, ["a" * (n_chars + 1)])
    assert len(fps[0]) == 1


def test_winnow_shared_substring_shares_fingerprints(spark):
    """The winnowing guarantee: documents sharing a long substring share at
    least one fingerprint."""
    core = "the quick brown fox jumps over the lazy dog"
    fps = _winnow(spark, [f"AAA {core} BBB", f"zzz {core} qqq", "unrelated words here"])
    assert set(fps[0]) & set(fps[1])
    # identical shared substring dominates; unrelated doc shares nothing
    assert not (set(fps[0]) & set(fps[2]))


def test_resize_media_exact_bytes(spark):
    docs = spark.createDataFrame(
        [(0, "abcdefgh"), (1, ""), (2, "x")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: (r["out_len"], r["resized_md5"])
        for r in resize_media(synthesize_media(docs)).collect()
    }
    t = RESIZE_TARGET_W * RESIZE_TARGET_H
    src = b"abcdefgh"
    expected = bytes(src[(i * len(src)) // t] for i in range(t))
    assert out[0] == (t, hashlib.md5(expected).hexdigest())
    assert out[1] == (0, None)
    assert out[2] == (t, hashlib.md5(b"x" * t).hexdigest())
