"""Round 11 regression pins: the r10 ADVICE fixes (JPEG error taxonomy,
decode_image fallback routing, HITS empty-graph guard) plus the new
round-11 operators added later in the round."""

import numpy as np
import pytest


# ------------------------------------------------------------ JPEG advice
def test_jpeg_truncated_scan_raises_clean_valueerror():
    """ADVICE r10: truncated entropy streams must surface as
    ValueError('truncated JPEG scan'), not raw IndexError from
    _BitReader._fill or an escaped _EndOfScan."""
    from helixdb_spark.operators.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(7)
    arr = rng.integers(0, 256, size=(32, 48, 3), dtype=np.uint8)
    good = encode_jpeg(arr, quality=90)
    # chop the tail off the entropy segment (keep headers intact)
    truncated = good[: len(good) // 2]
    with pytest.raises(ValueError, match="truncated JPEG scan"):
        decode_jpeg(truncated)
    # also: splice a premature EOI into the scan -> _EndOfScan path
    spliced = good[: len(good) - 20] + b"\xff\xd9"
    with pytest.raises(ValueError, match="truncated JPEG scan"):
        decode_jpeg(spliced)


def test_jpeg_two_component_raises_notimplemented():
    """ADVICE r10 (medium), narrowed in r12: 4-component Adobe CMYK/YCCK
    decodes natively now, so the valid-but-unsupported layout left is
    2-component -> NotImplementedError (so decode_image falls through to
    PIL), never ValueError/IndexError."""
    from helixdb_spark.operators.jpeg import decode_jpeg, encode_jpeg

    arr = np.full((8, 8, 3), 90, dtype=np.uint8)
    good = bytearray(encode_jpeg(arr, quality=90))
    # patch SOF0: find FFC0, length at +2 (2 bytes), precision +4,
    # h +5..6, w +7..8, nc at +9
    i = good.find(b"\xff\xc0")
    assert i > 0
    good[i + 9] = 2
    with pytest.raises(NotImplementedError, match="2 components"):
        decode_jpeg(bytes(good))


def test_decode_image_jpeg_valueerror_falls_through():
    """decode_image must not die on a JPEG payload the native decoder
    rejects with ValueError: it falls through to PIL, and without PIL the
    documented NotImplementedError surfaces (never a raw ValueError)."""
    from helixdb_spark.operators import multimodal as mm
    from helixdb_spark.operators.jpeg import encode_jpeg

    arr = np.full((8, 8, 3), 90, dtype=np.uint8)
    good = encode_jpeg(arr, quality=90)
    truncated = good[: len(good) // 2]
    try:
        import PIL  # noqa: F401

        have_pil = True
    except ImportError:
        have_pil = False
    if have_pil:
        pytest.skip("PIL present: fallback decodes or raises PIL's error")
    with pytest.raises(NotImplementedError):
        mm.decode_image(truncated)


# ------------------------------------------------------- HITS empty graph
def test_hits_edgeless_graph_no_keyerror(spark):
    """ADVICE r10: totals['a']/totals['h'] KeyError when both score
    vectors are empty. An empty edge table must return an empty (or
    null-scored) result, not crash on the driver."""
    from helixdb_spark.operators.graph import hits

    edges = spark.createDataFrame([], "src string, dst string")
    out = hits(edges, iterations=2)
    assert out.count() == 0
    assert set(out.columns) == {"node", "hub", "authority"}


# ----------------------------------------------------- Unicode text (r11)
def test_cjk_doc_survives_normalization(spark):
    """r10 VERDICT #1 'Done' criterion: a CJK document must normalize to
    non-empty text (pre-r11 the ASCII rule collapsed it to '')."""
    from pyspark.sql import functions as F

    from helixdb_spark.functions.text import (
        normalized_text,
        token_count,
        subword_count,
        words,
    )

    docs = [
        ("数据清洗流水线：去重、质量评分。",),
        ("Привет, мир — тест 123",),
        ("مرحبا بالعالم",),
        ("mixed 🙂 café 数据 test",),
    ]
    df = spark.createDataFrame(docs, "text string")
    rows = df.select(
        normalized_text(F.col("text")).alias("norm"),
        token_count(F.col("text")).alias("ntok"),
        subword_count(F.col("text")).alias("nsub"),
        F.size(words(normalized_text(F.col("text")))).alias("nw"),
    ).collect()
    for r in rows:
        assert r["norm"] != "", "non-Latin doc normalized to empty"
        assert r["ntok"] > 0 and r["nsub"] > 0 and r["nw"] > 0
    # CJK text keeps its ideographs verbatim (no case, no strip)
    assert rows[0]["norm"] == "数据清洗流水线 去重 质量评分"
    # ASCII behavior unchanged: lowered + collapsed
    got = (
        spark.createDataFrame([("The  QUICK-brown fox 42!",)], "text string")
        .select(normalized_text(F.col("text")).alias("n"))
        .first()["n"]
    )
    assert got == "the quick brown fox 42"


def test_unicode_hash_paths_agree(spark):
    """The three rolling-hash paths (JVM HOF reference, Arrow UTF-32
    kernel, DuckDB ascii() oracle fold) must produce identical values on
    non-Latin text — the codepoint is the shared hash unit."""
    import duckdb
    from pyspark.sql import functions as F

    from helixdb_spark.functions import text as T

    doc = ("привет мир 数据 naïve 🙂 " * 6).strip()
    df = spark.createDataFrame([(doc,)], "t string")
    hof = T.with_winnow_fingerprints(df, F.col("t"), out="fps").first()["fps"]
    arrow = df.select(
        T.winnow_fingerprints_arrow(F.col("t")).alias("fps")
    ).first()["fps"]
    assert list(hof) == list(arrow) and len(hof) > 0

    g30 = df.select(T.gram_hash64_arrow(F.col("t"), 30).alias("g")).first()["g"]
    multik = df.select(
        T.multik_gram_hash64_arrow(F.col("t"), (30,)).alias("m")
    ).first()["m"][0]["ghs"]
    assert list(g30) == list(multik) and len(g30) > 0

    con = duckdb.connect()
    duck_h1 = con.execute(
        f"""
WITH c AS (SELECT list_transform(range(1, len(t)+1),
                  i -> ascii(t[i])::BIGINT) AS codes
           FROM (SELECT '{doc}' AS t))
SELECT list_transform(range(1, len(codes) - 30 + 2),
  i -> list_reduce(list_prepend(0::BIGINT, codes[i:i+29]),
       (a,b) -> (a*{T.ROLLING_BASE}+b) % {T.ROLLING_PRIME})) FROM c
"""
    ).fetchone()[0]
    assert duck_h1 == [int(g) // T.ROLLING_PRIME2 for g in g30]


def test_multilingual_rows_registered():
    import __spark_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    for name in (
        "dedup_exact_multilingual",
        "dedup_minhash_multilingual",
        "text_top_tokens_multilingual",
    ):
        assert name in qs and name in os_


# ------------------------------------------------- progressive JPEG (r11)
def test_progressive_jpeg_bit_identical_to_baseline():
    """Progressive encoding re-orders entropy bits, never coefficient
    values, so decode(SOF2 stream) must equal decode(SOF0 stream) of the
    same source EXACTLY — across shapes, content classes, subsampling
    modes (4:4:4 / 4:2:0 / 4:2:2) and qualities. Exercises all four
    Annex G scan kinds: DC first at Al=1, DC refinement bits, AC
    spectral-selection first scans with EOB runs, and AC refinement with
    correction bits."""
    import numpy as np

    from helixdb_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(42)
    cases = [rng.integers(0, 256, size=(s[0], s[1], 3), dtype=np.uint8)
             for s in [(8, 8), (17, 23), (33, 47), (7, 9)]]
    xx, yy = np.meshgrid(np.arange(40), np.arange(30))
    cases.append(
        np.stack([(xx * 3 + yy * 2) % 256, (xx + yy * 4) % 256,
                  (xx * 2) % 256], axis=2).astype(np.uint8)
    )
    cases.append(np.full((24, 24, 3), 90, dtype=np.uint8))
    for arr in cases:
        for sub in (False, True, "422"):
            for q in (50, 90):
                base = decode_jpeg(encode_jpeg(arr, quality=q, subsample=sub))
                prog = decode_jpeg(
                    encode_jpeg_progressive(arr, quality=q, subsample=sub)
                )
                assert np.array_equal(base, prog), (arr.shape, sub, q)
    # grayscale script
    g = rng.integers(0, 256, size=(21, 19), dtype=np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg(g, quality=90)),
        decode_jpeg(encode_jpeg_progressive(g, quality=90)),
    )


def test_jpeg_422_decodes_within_bound():
    """4:2:2 (2x1 chroma) frames decode with the same smooth-content error
    contract as 4:2:0 — the layout the r10 guards excluded."""
    import numpy as np

    from helixdb_spark.operators.jpeg import decode_jpeg, encode_jpeg

    xx, yy = np.meshgrid(np.arange(48), np.arange(32))
    arr = np.stack(
        [(xx * 2 + 30) % 200 + 20, (yy * 3 + 50) % 200 + 20,
         ((xx + yy) * 2) % 200 + 20], axis=2
    ).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(arr, quality=90, subsample="422"))
    assert out.shape == arr.shape
    err = np.abs(out.astype(int) - arr.astype(int)).max()
    assert err <= 40, err  # chroma-subsampled gradient: generous bound
    # luma plane error stays tight (subsampling touches chroma only)
    ylum = 0.299 * arr[..., 0] + 0.587 * arr[..., 1] + 0.114 * arr[..., 2]
    olum = 0.299 * out[..., 0] + 0.587 * out[..., 1] + 0.114 * out[..., 2]
    assert np.abs(ylum - olum).max() <= 12


def test_progressive_truncated_scan_raises():
    import numpy as np
    import pytest

    from helixdb_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(3)
    arr = rng.integers(0, 256, size=(24, 24, 3), dtype=np.uint8)
    good = encode_jpeg_progressive(arr, quality=90)
    with pytest.raises(ValueError):
        decode_jpeg(good[: len(good) // 3])


# ---------------------------------------- cross-k span consolidation (r11)
def test_duplicate_spans_consolidated_semantics(spark):
    """A 500-char wholesale copy and a short 40-char boilerplate overlap
    must come back as SEPARATE consolidated islands with longest-width-
    wins attribution: the long copy carries deepest_k=400, the
    boilerplate only the k=30 ladder rung; per-k fragments never split a
    merged island."""
    from helixdb_spark.operators.dedup import (
        DUP_SPAN_KS,
        duplicate_spans_consolidated,
        duplicate_spans_multik,
    )

    import hashlib

    def text_from(seed: int, n: int) -> str:
        # hash-derived words: no 30-gram repeats within or across fillers
        words = [
            hashlib.md5(f"{seed}:{i}".encode()).hexdigest()[:7]
            for i in range(n // 8 + 1)
        ]
        return " ".join(words)[:n]

    long_copy = text_from(3, 520)[:500]
    boiler = text_from(11, 48)[:40]
    docs = [
        (0, text_from(1, 200) + " " + long_copy + " " + text_from(2, 200)),
        (1, long_copy + " " + text_from(4, 300)),
        (2, text_from(5, 150) + " " + boiler),
        (3, boiler + " " + text_from(6, 260)),
        (4, text_from(8, 120)),  # clean
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in duplicate_spans_consolidated(df).collect()
    }
    assert out[4]["n_islands"] == 0 and out[4]["deepest_k"] == 0
    for d in (0, 1):
        assert out[d]["deepest_k"] == 400, out[d]
        assert out[d]["longest_island"] >= 480
    for d in (2, 3):
        assert out[d]["deepest_k"] == 30, out[d]
        assert out[d]["n_islands"] >= 1
    # consolidation dominates every per-k view: merged coverage >= the
    # widest single-k coverage, island count <= the per-k island count
    per_k = duplicate_spans_multik(df).collect()
    by_doc_k = {(r["doc_id"], r["k"]): r for r in per_k}
    for d in range(5):
        best_cov = max(
            by_doc_k[(d, k)]["covered_chars"] for k in DUP_SPAN_KS
        )
        assert out[d]["covered_chars"] >= best_cov


# --------------------------------------------- unicode kernels (r11 late)
def test_unicode_normalize_arrow_forms(spark):
    from pyspark.sql import functions as F

    from helixdb_spark.functions.text import unicode_normalize_arrow

    import pytest

    df = spark.createDataFrame(
        [("café ｶﾀｶﾅ ﬁne",)], "t string"
    )
    got = {
        form: df.select(
            unicode_normalize_arrow(F.col("t"), form).alias("n")
        ).first()["n"]
        for form in ("NFC", "NFKC")
    }
    assert got["NFC"].startswith("café")       # composed
    assert "ﬁ" in got["NFC"]                    # ligature untouched
    assert "fine" in got["NFKC"]                     # ligature folded
    assert "カタカナ" in got["NFKC"]  # halfwidth folded
    with pytest.raises(ValueError):
        unicode_normalize_arrow(F.col("t"), "NFX")


def test_script_profile_and_nfc_rows_registered():
    import __spark_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    for name in ("text_script_profile", "text_nfc_normalize",
                 "dedup_spans_consolidated", "mm_decode_jpeg_progressive"):
        assert name in qs and name in os_
