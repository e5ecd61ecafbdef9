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


# ------------------- independent progressive JPEG fixtures (r11 ADVICE)
def _seg(marker: int, payload: bytes) -> bytes:
    import struct as st

    return st.pack(">HH", marker, len(payload) + 2) + payload


def _idct_independent(F64):
    """Reference IDCT written longhand from the T.81 A.3.3 formula —
    independent of operators.jpeg.dct_matrix — so the fixtures' expected
    pixels do not flow through the module under test."""
    import math

    out = np.zeros((8, 8))
    for y in range(8):
        for x in range(8):
            acc = 0.0
            for u in range(8):
                for v in range(8):
                    au = math.sqrt(1 / 8) if u == 0 else math.sqrt(2 / 8)
                    av = math.sqrt(1 / 8) if v == 0 else math.sqrt(2 / 8)
                    acc += (
                        au * av * F64[u, v]
                        * math.cos((2 * y + 1) * u * math.pi / 16)
                        * math.cos((2 * x + 1) * v * math.pi / 16)
                    )
            out[y, x] = acc
    return out


def test_progressive_fixture_hand_built_scans():
    """r11 ADVICE (medium): progressive conformance was only self-verified
    (decode(encode_progressive(x)) vs decode(encode(x)), both through the
    module). This fixture is a progressive JPEG assembled BY HAND from
    T.81 — DQT/SOF2/DHT bytes and four hand-Huffman-coded scans (DC first
    at Al=1, AC first at Al=1, DC refinement, AC refinement with an EOB
    correction bit) — with expected pixels from an independent IDCT. A
    mirrored encoder/decoder misreading cannot pass it."""
    from helixdb_spark.operators.jpeg import decode_jpeg

    payload = b"\xff\xd8"
    payload += _seg(0xFFDB, bytes([0x00]) + bytes([1] * 64))  # q = all 1s
    payload += _seg(0xFFC2, bytes([8, 0, 8, 0, 8, 1, 1, 0x11, 0]))
    # DC table 0: one length-1 code -> symbol 4 (size of diff 8)
    payload += _seg(
        0xFFC4, bytes([0x00]) + bytes([1] + [0] * 15) + bytes([4])
    )
    # AC table 0: len-1 code '0' -> 0x02 (run0,size2); len-2 '10' -> EOB
    payload += _seg(
        0xFFC4, bytes([0x10]) + bytes([1, 1] + [0] * 14) + bytes([2, 0])
    )
    # scan 1 — DC first, Al=1: code('0') + diff 8 in 4 bits '1000'
    payload += _seg(0xFFDA, bytes([1, 1, 0x00, 0, 0, 0x01])) + b"\x47"
    # scan 2 — AC first, Ss=1..63, Al=1: sym 0x02 ('0'), value +2 ('10'),
    # EOB ('10') -> 01010 + pad = 0x57
    payload += _seg(0xFFDA, bytes([1, 1, 0x00, 1, 63, 0x01])) + b"\x57"
    # scan 3 — DC refinement (Ah=1, Al=0): one raw bit 0 -> 0x7F
    payload += _seg(0xFFDA, bytes([1, 1, 0x00, 0, 0, 0x10])) + b"\x7f"
    # scan 4 — AC refinement: EOB ('10') + correction bit 0 -> 0x9F
    payload += _seg(0xFFDA, bytes([1, 1, 0x00, 1, 63, 0x10])) + b"\x9f"
    payload += b"\xff\xd9"

    got = decode_jpeg(payload)
    # final coefficients: DC = (8<<1) | refinement bit 0 = 16;
    # AC natural (0,1) = (2<<1) with correction bit 0 = 4; q = 1
    F64 = np.zeros((8, 8))
    F64[0, 0] = 16.0
    F64[0, 1] = 4.0
    exp = np.clip(np.round(_idct_independent(F64) + 128.0), 0, 255)
    assert got.shape == (8, 8, 3)
    assert (got[:, :, 0].astype(np.float64) == exp).all()
    assert (got[:, :, 1] == got[:, :, 0]).all()


def test_progressive_fixture_eobn_run_and_restarts():
    """Hand-built progressive fixture for two features the module's own
    encoder NEVER emits (so self-round-trip cannot cover them): EOBn
    run symbols (r>0, with appended run-extension bits) spanning blocks,
    and restart markers inside a progressive DC scan (DRI, predictor
    reset, then a DRI=0 override for the AC scan)."""
    from helixdb_spark.operators.jpeg import decode_jpeg

    payload = b"\xff\xd8"
    payload += _seg(0xFFDB, bytes([0x00]) + bytes([1] * 64))
    payload += _seg(0xFFC2, bytes([8, 0, 8, 0, 16, 1, 1, 0x11, 0]))
    # DC table: one len-1 code -> symbol 5 (diffs 16 and 24 are size 5)
    payload += _seg(
        0xFFC4, bytes([0x00]) + bytes([1] + [0] * 15) + bytes([5])
    )
    # AC table: one len-1 code -> symbol 0x10 (EOB1: run of 2-3 blocks)
    payload += _seg(
        0xFFC4, bytes([0x10]) + bytes([1] + [0] * 15) + bytes([0x10])
    )
    payload += _seg(0xFFDD, bytes([0, 1]))  # DRI = 1 MCU
    # scan 1 — DC first Al=0, two blocks with RST0 between:
    # blk0 diff 16: '0'+'10000' pad -> 0x43 ; RST0 ; blk1 diff 24 (pred
    # reset): '0'+'11000' pad -> 0x63
    payload += _seg(0xFFDA, bytes([1, 1, 0x00, 0, 0, 0x00]))
    payload += b"\x43" + b"\xff\xd0" + b"\x63"
    payload += _seg(0xFFDD, bytes([0, 0]))  # DRI off for the AC scan
    # scan 2 — AC first: EOB1 code '0' + extension bit '0' covers BOTH
    # all-zero blocks in one symbol -> 0x3F
    payload += _seg(0xFFDA, bytes([1, 1, 0x00, 1, 63, 0x00])) + b"\x3f"
    payload += b"\xff\xd9"

    got = decode_jpeg(payload)
    assert got.shape == (8, 16, 3)
    # DC-only flat blocks: 16/8+128 = 130 left, 24/8+128 = 131 right
    assert (got[:, :8, 0] == 130).all()
    assert (got[:, 8:, 0] == 131).all()


# --------------------------- metadata-driven IVF drift statistics (r12) ----
def test_ivf_drift_meta_path_matches_scan_path(spark, tmp_path):
    """r12 optimization: per-list counts recorded in the descriptor at
    write time serve ivf_share_drift / ivf_share_drift_by_segment without
    scanning the lists table. The meta path must be BIT-identical to the
    scan path (same downstream expressions over the same exact integer
    counts), and compact_index must merge the counts exactly."""
    from pyspark.sql import functions as F

    from helixdb_spark.index_store import AnnIndexStore

    def emb(lo, hi, shift=0):
        return spark.range(lo, hi).select(
            F.col("id").alias("vec_id"),
            F.array(
                (F.col("id") % 7 + 1 + shift).cast("float"),
                (F.col("id") % 11 + 1).cast("float"),
                ((F.col("id") + shift) % 13 + 1).cast("float"),
            ).alias("embedding"),
        )

    store = AnnIndexStore(spark, str(tmp_path / "idx"))
    store.write_ivf(emb(0, 300), name="ivf", stride=50)
    store.append_ivf(emb(1000, 1150), name="ivf")
    store.append_ivf(emb(2000, 2100, shift=5), name="ivf")  # drifted batch

    desc = store._state["indexes"]["ivf"]
    segs = store._segments(desc)
    # counts recorded for every committed segment
    meta = store._list_counts_meta(desc)
    assert meta is not None and sorted(meta) == sorted(segs)
    assert sum(meta[segs[0]].values()) == 300
    assert sum(meta[segs[1]].values()) == 150

    scalar_meta = store.ivf_share_drift("ivf").collect()
    series_meta = store.ivf_share_drift_by_segment("ivf").collect()

    # force the scan fallback by hiding the metadata
    hidden = dict(desc)
    del hidden["list_counts"]
    store._state["indexes"]["ivf"] = hidden
    scalar_scan = store.ivf_share_drift("ivf").collect()
    series_scan = store.ivf_share_drift_by_segment("ivf").collect()
    store._state["indexes"]["ivf"] = desc

    assert [r.asDict() for r in scalar_meta] == [
        r.asDict() for r in scalar_scan
    ]
    assert [r.asDict() for r in series_meta] == [
        r.asDict() for r in series_scan
    ]
    assert scalar_meta[0]["n_fit"] == 300
    assert scalar_meta[0]["n_newest"] == 100
    assert scalar_meta[0]["share_drift"] > 0.0

    # the meta path must not read the lists table at all
    plan = store.ivf_share_drift("ivf")._jdf.queryExecution().toString()
    assert "lists" not in plan

    # compact_index folds the chain and merges the counts exactly
    folded = store.compact_index("ivf")
    fmeta = store._list_counts_meta(folded)
    assert fmeta is not None and list(fmeta) == store._segments(folded)
    merged = {}
    for seg_counts in meta.values():
        for c, n in seg_counts.items():
            merged[c] = merged.get(c, 0) + n
    assert fmeta[store._segments(folded)[0]] == merged
    # single segment -> drift degenerates to the no-append answer
    one = store.ivf_share_drift("ivf").collect()
    assert one[0]["share_drift"] == 0.0


def test_share_fp_round6_match_spark_expressions(spark):
    """The driver-side fixed-point twins (_share_fp/_round6) must be
    bit-identical to the Spark expressions the scan fallback evaluates —
    Spark's round() is HALF_UP over the double's shortest decimal repr,
    which Decimal(repr(x)) reproduces. Randomized counts plus adversarial
    near-tie ratios."""
    import random

    from pyspark.sql import functions as F

    from helixdb_spark.index_store import AnnIndexStore

    rng = random.Random(1207)
    cases = [(0, 0), (0, 5), (5, 5), (1, 3), (2, 3), (1, 7)]
    # adversarial: ratios that land near .5 boundaries of the 1e9 grid
    cases += [(k, 2_000_000_000) for k in (1, 3, 5, 999_999_999)]
    cases += [
        (rng.randint(0, 10**6), rng.randint(1, 10**6)) for _ in range(400)
    ]
    cases += [
        (rng.randint(0, 10**12), rng.randint(10**9, 10**12))
        for _ in range(100)
    ]
    df = spark.createDataFrame(
        [(i, n, t) for i, (n, t) in enumerate(cases)],
        "i int, _n long, _t long",
    )
    share_fp = F.when(
        F.col("_t") > 0,
        F.round(
            F.lit(1e-9) + F.col("_n").cast("double") / F.col("_t") * 1e9, 0
        ).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    got = {
        r["i"]: r["fp"]
        for r in df.select("i", share_fp.alias("fp")).collect()
    }
    for i, (n, t) in enumerate(cases):
        assert got[i] == AnnIndexStore._share_fp(n, t), (n, t)

    sds = [0, 1, 2, 499, 500, 501, 999, 1000, 1001, 1_999_999_999] + [
        rng.randint(0, 2 * 10**9) for _ in range(400)
    ]
    df2 = spark.createDataFrame(
        [(i, s) for i, s in enumerate(sds)], "i int, _sd long"
    )
    expr = F.round(F.lit(1e-9) + F.col("_sd") / 2e9, 6) + F.lit(0.0)
    got2 = {
        r["i"]: r["d"] for r in df2.select("i", expr.alias("d")).collect()
    }
    for i, s in enumerate(sds):
        assert repr(got2[i]) == repr(
            AnnIndexStore._round6(1e-9 + s / 2e9)
        ), s
