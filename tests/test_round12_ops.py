"""Round 12 regression pins: the r11 VERDICT items — complete
dominant_script routing (arabic), char-n-gram shingles for space-free
scripts, NFKC invariants, CMYK/YCCK JPEG — plus the r11 ADVICE fixes
(fill-byte marker walk, epoch-replay guard, sized append coalesce)."""

import numpy as np
import pytest
from pyspark.sql import functions as F


# --------------------------------------------------- dominant_script (r11 #2)
def test_dominant_script_routes_arabic(spark):
    """r11 VERDICT #2 'Done' criterion: an Arabic-majority document must
    route to 'arabic' (pre-r12 the tie-break only considered
    han/cyrillic/latin, so Arabic-dominant docs fell through to 'latin'
    or 'none')."""
    from helixdb_spark.plans.pipeline import text_script_profile

    out = text_script_profile(spark, "/root/testdata/sf0.001")
    doms = {r["dominant_script"] for r in out.collect()}
    assert "arabic" in doms, doms
    # every profiled script must actually be reachable on the corpus
    assert {"latin", "cyrillic", "han", "arabic"} <= doms


def test_dominant_script_priority_chain(spark):
    """The fixed priority chain on hand-built fixtures: han > arabic >
    cyrillic > latin on ties, 'none' only when no profiled letters."""
    docs = [
        (0, "مرحبا بالعالم hi"),  # arabic-majority + some latin
        (1, "数据 مرحبا"),  # han == 2, arabic == 5 -> arabic
        (2, "数据数据 مر"),  # han 4 >= arabic 2 -> han
        (3, "Привет hi"),  # cyrillic 6 >= latin 2
        (4, "hello"),
        (5, "123 !?"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    def cnt(prop):
        return F.regexp_count(F.col("text"), F.lit(prop))

    lat, cyr = cnt(r"\p{IsLatin}"), cnt(r"\p{IsCyrillic}")
    han, ara = cnt(r"\p{IsHan}"), cnt(r"\p{IsArabic}")
    dom = (
        F.when((han >= lat) & (han >= cyr) & (han >= ara) & (han > 0), "han")
        .when((ara >= lat) & (ara >= cyr) & (ara > 0), "arabic")
        .when((cyr >= lat) & (cyr > 0), "cyrillic")
        .when(lat > 0, "latin")
        .otherwise("none")
    )
    got = {
        r["doc_id"]: r["d"]
        for r in df.select("doc_id", dom.alias("d")).collect()
    }
    assert got == {
        0: "arabic",
        1: "arabic",
        2: "han",
        3: "cyrillic",
        4: "latin",
        5: "none",
    }


# ------------------------------------------- char shingles (r11 VERDICT #1)
def test_spacefree_pair_with_half_overlap_found(spark):
    """r11 VERDICT #1 'Done' criterion: a space-free document pair with
    ~50% char-gram overlap is found by MinHash-LSH under unit="char",
    while word-unit shingling sees zero shingles on the same docs."""
    from helixdb_spark.operators import dedup

    a = "今天天气很好我们去公园散步然后吃午饭再回家休息片刻之后继续工作到晚上"
    b = "今天天气很好我们去公园散步然后吃午饭再回家休息片刻之后出门看电影去了"
    c = "完全不同的文本内容和前面没有任何重叠之处可言测试字符分词的负样本文档"
    df = spark.createDataFrame(
        [(1, a), (2, b), (3, c)], "doc_id long, text string"
    )
    truth = dedup.ngram_jaccard_pairs(df, n=5, threshold=0.4, unit="char")
    t = {(r["id_a"], r["id_b"]): r["jaccard"] for r in truth.collect()}
    assert set(t) == {(1, 2)} and t[(1, 2)] >= 0.5, t
    pairs = dedup.minhash_lsh_pairs(df, n=5, threshold=0.4, unit="char")
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (1, 2) in got and (1, 3) not in got and (2, 3) not in got
    # the word unit is blind here: no spaces -> one giant token -> no
    # 3-word shingles at all (the degradation this mode exists to fix)
    word_sh = dedup.doc_shingles(df, n=3, unit="word")
    assert all(len(r["shingles"]) == 0 for r in word_sh.collect())


def test_char_shingles_and_squeeze(spark):
    """char_shingles counts code points (astral-plane safe) and squeezes
    ALL whitespace before gramming; short docs yield empty arrays."""
    from pyspark.sql import functions as F

    from helixdb_spark.functions.text import char_shingles, squeezed_text

    df = spark.createDataFrame(
        [(1, "ab cd ef"), (2, "короткий"), (3, "ab"), (4, "𠀀x𠀁y𠀂z")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["sq"], r["sh"])
        for r in df.withColumn("sq", squeezed_text(F.col("text")))
        .select(
            "doc_id", "sq", char_shingles(F.col("sq"), 3).alias("sh")
        )
        .collect()
    }
    assert out[1][0] == "abcdef"
    assert out[1][1] == ["abc", "bcd", "cde", "def"]
    assert out[3][1] == []  # shorter than k
    # astral-plane LETTERS (CJK Ext B, \p{L}) survive normalization and
    # count as single code points in substr/length on both engines
    assert out[4][1][0] == "𠀀x𠀁"


def test_doc_shingles_rejects_unknown_unit(spark):
    from helixdb_spark.operators import dedup

    df = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    with pytest.raises(ValueError, match="unknown shingle unit"):
        dedup.doc_shingles(df, unit="byte")


# ------------------------------------------ minhash family soundness (r12)
def test_minhash_family_actually_wraps(spark):
    """Regression pin for the r12 hash-family fix: with the r1-r11 prime
    2^61-1 every product a*bh+b was below the modulus, each h_i was
    monotone in bh, all 32 components shared ONE argmin (the set's
    minimum base hash) and the signature collapsed to a single coin flip
    — component matches were all-or-nothing. A sound family matches
    ~J*k components on a J≈0.5 pair: assert strictly between."""
    from helixdb_spark.operators import dedup

    # the modulus must actually reduce a typical product
    a0, b0 = dedup.minhash_coeffs(1)[0]
    assert (a0 * (1 << 31) + b0) % dedup.MINHASH_PRIME != a0 * (1 << 31) + b0
    # and products must stay inside int64 for the DuckDB oracle
    assert a0 * ((1 << 32) - 1) + b0 < (1 << 63)

    a = "今天天气很好我们去公园散步然后吃午饭再回家休息片刻之后继续工作到晚上"
    b = "今天天气很好我们去公园散步然后吃午饭再回家休息片刻之后出门看电影去了"
    df = spark.createDataFrame([(1, a), (2, b)], "doc_id long, text string")
    sh, sig = dedup._minhash_build(df, "doc_id", "text", 5, 32, unit="char")
    rows = {
        r["doc_id"]: [r[f"m{i}"] for i in range(32)] for r in sig.collect()
    }
    sh.unpersist()
    m = sum(1 for i in range(32) if rows[1][i] == rows[2][i])
    assert 0 < m < 32, f"all-or-nothing signature: {m}/32 components match"


def test_minhash_store_prime_staleness(spark, tmp_path):
    """A persisted minhash store whose signatures were built under a
    different hash-family prime must fail validate() (and re-index)
    rather than serve stale band keys."""
    from helixdb_spark.index_store import AnnIndexStore

    docs = spark.createDataFrame(
        [(i, f"doc number {i} text body " * 3) for i in range(8)],
        "doc_id long, text string",
    )
    store = AnnIndexStore(spark, str(tmp_path / "store"))
    store.write_minhash(docs)
    assert store.validate("minhash", docs)
    # simulate a store written under the old family
    store._state["indexes"]["minhash"]["prime"] = (1 << 61) - 1
    store._save_state()
    store2 = AnnIndexStore(spark, str(tmp_path / "store"))
    assert not store2.validate("minhash", docs)


# ------------------------------------------------ NFKC invariants (r11 #3)
def test_nfkc_invariants_row(spark):
    """The graded NFKC row: every doc idempotent + NFC-fixed-point, and
    the fold actually fires (n_nfkc = n_raw + 5 on the fixed suffix:
    ﬁﬂ->fifl (+2), ㎞->km (+1), Ⅻ->XII (+2), ②->2, ｶ->カ, ²->2 (+0))."""
    from helixdb_spark.plans.pipeline import text_nfkc_invariants

    rows = text_nfkc_invariants(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert r["idempotent"] and r["nfc_fixedpoint"]
        assert r["n_nfkc"] == r["n_raw"] + 5


# ------------------------------------------------ CMYK/YCCK JPEG (r11 #4)
def test_cmyk_jpeg_roundtrip_both_transforms():
    """Native 4-component Adobe JPEG: decode(encode_jpeg_cmyk(ink))
    matches the analytic ink->RGB conversion within 2 levels on a smooth
    ramp for BOTH channel codings (APP14 transform 0 = CMYK, 2 = YCCK)."""
    from helixdb_spark.operators.jpeg import decode_jpeg, encode_jpeg_cmyk

    h, w = 24, 31
    r = np.arange(h)[:, None, None]
    c = np.arange(w)[None, :, None]
    ch = np.arange(4)[None, None, :]
    ink = np.clip(20 + r * 2 + c * 3 + ch * 11, 0, 255).astype(np.uint8)
    inv = 255.0 - ink.astype(np.float64)
    exp = np.clip(np.round(np.stack(
        [inv[:, :, 0] * inv[:, :, 3], inv[:, :, 1] * inv[:, :, 3],
         inv[:, :, 2] * inv[:, :, 3]], axis=2) / 255.0), 0, 255)
    for t in (0, 2):
        out = decode_jpeg(encode_jpeg_cmyk(ink, quality=90, transform=t))
        assert out.shape == (h, w, 3)
        assert np.abs(out.astype(np.float64) - exp).max() <= 2.0, t


def test_cmyk_jpeg_flat_color_near_exact():
    """A flat CMYK block is DC-only: the only error left is the ink->RGB
    rounding, so the round trip is within 1 level everywhere."""
    from helixdb_spark.operators.jpeg import decode_jpeg, encode_jpeg_cmyk

    ink = np.empty((16, 16, 4), dtype=np.uint8)
    ink[:, :, 0], ink[:, :, 1], ink[:, :, 2], ink[:, :, 3] = 30, 60, 90, 40
    inv = 255.0 - ink.astype(np.float64)
    exp = np.round(np.stack(
        [inv[:, :, 0] * inv[:, :, 3], inv[:, :, 1] * inv[:, :, 3],
         inv[:, :, 2] * inv[:, :, 3]], axis=2) / 255.0)
    for t in (0, 2):
        out = decode_jpeg(encode_jpeg_cmyk(ink, quality=90, transform=t))
        assert np.abs(out.astype(np.float64) - exp).max() <= 1.0, t


def test_cmyk_without_app14_reads_as_plain_cmyk():
    """A 4-component frame with the APP14 marker stripped decodes as
    plain stored-CMYK (transform 0) — the documented default."""
    from helixdb_spark.operators.jpeg import decode_jpeg, encode_jpeg_cmyk

    ink = np.full((8, 8, 4), 70, dtype=np.uint8)
    with_marker = encode_jpeg_cmyk(ink, quality=90, transform=0)
    i = with_marker.find(b"\xff\xee")
    assert i > 0
    import struct as st

    (ln,) = st.unpack_from(">H", with_marker, i + 2)
    stripped = with_marker[:i] + with_marker[i + 2 + ln:]
    assert (decode_jpeg(stripped) == decode_jpeg(with_marker)).all()


def test_jpeg_fill_bytes_before_marker(  # r11 ADVICE: T.81 B.1.1.2
):
    """Optional 0xFF fill bytes padded ahead of a marker code must be
    skipped, not parsed as a marker named 0xFF."""
    from helixdb_spark.operators.jpeg import decode_jpeg, encode_jpeg

    arr = np.clip(
        np.arange(16)[:, None, None] * 3
        + np.arange(20)[None, :, None] * 2
        + np.arange(3)[None, None, :] * 10,
        0, 255,
    ).astype(np.uint8)
    good = encode_jpeg(arr, quality=90)
    ref = decode_jpeg(good)
    # pad fill bytes ahead of DQT, DHT and SOS markers
    padded = good
    for m in (b"\xff\xdb", b"\xff\xc4", b"\xff\xda"):
        i = padded.find(m)
        assert i > 0
        padded = padded[:i] + b"\xff\xff\xff" + padded[i:]
    assert (decode_jpeg(padded) == ref).all()
