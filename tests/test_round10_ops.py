"""Round-10 operator tests: ADVICE fixes + new rows."""
from __future__ import annotations

import pytest  # noqa: F401


# ------------------------------------------- short-doc span-anchor guard ----
def test_remove_duplicate_spans_short_docs_pass_through(spark):
    """r9 ADVICE (high): documents shorter than k=30 must pass through
    WHOLE. The unguarded ``sequence(1, greatest(len-k+1, 0))`` was
    descending ``[1, 0]`` for len<k, emitting two identical whole-text
    anchors that made every short doc self-qualify as a corpus-wide
    duplicate and come back empty."""
    from helixdb_spark.operators.dedup import (
        duplicate_span_coverage,
        duplicate_spans,
        duplicate_spans_hashed,
        remove_duplicate_spans,
    )

    rows = [
        (1, "tiny unique doc"),  # 15 chars < k — MUST survive whole
        (2, "x"),  # degenerate 1-char doc
        (3, "another short one"),  # < k, unique
        (4, "AAA the quick brown fox jumps over the lazy dog again tail"),
        (5, "BBB the quick brown fox jumps over the lazy dog again end"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in remove_duplicate_spans(docs).collect()}
    for i in (1, 2, 3):
        assert got[i]["kept_chars"] == got[i]["n_chars"], i
        assert got[i]["kept_chars"] > 0, i
    # the long shared run is still excised from its two carriers
    assert got[4]["kept_chars"] < got[4]["n_chars"]
    assert got[5]["kept_chars"] < got[5]["n_chars"]

    # the measurement rows agree: short docs have zero spans, not two
    for fn in (duplicate_spans, duplicate_spans_hashed):
        prof = {r["doc_id"]: r for r in fn(docs).collect()}
        for i in (1, 2, 3):
            assert prof[i]["n_spans"] == 0, (fn.__name__, i)
            assert prof[i]["n_dup_spans"] == 0, (fn.__name__, i)
    cov = {r["doc_id"]: r for r in duplicate_span_coverage(docs).collect()}
    for i in (1, 2, 3):
        assert cov[i]["covered_chars"] == 0, i


# ------------------------------------------- minhash shared-stage factor ----
def test_minhash_calibration_uses_production_candidates(spark):
    """The calibration audit's candidate stage is the SAME code path as
    minhash_lsh_pairs (shared helpers) — every pair the production pass
    verifies above threshold 0.0 appears in the audit's n_pairs count."""
    from helixdb_spark.operators.dedup import (
        minhash_calibration,
        minhash_lsh_pairs,
    )

    base = "the quick brown fox jumps over the lazy dog wandering around town "
    rows = [
        (1, base + "alpha beta gamma"),
        (2, base + "alpha beta delta"),
        (3, "completely different content with no overlap whatsoever here"),
        (4, base + "alpha beta gamma"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = minhash_lsh_pairs(docs, threshold=0.0).collect()
    cal = minhash_calibration(docs).collect()[0]
    assert cal["n_pairs"] == len(pairs) > 0
    assert 0.0 <= cal["mean_abs_err"] <= cal["max_abs_err"] <= 1.0


# ------------------------------------------- native PNG decode ----
def test_png_round_trip_all_filters_and_color_types():
    """encode_png -> decode_png is the identity for RGB across every
    per-row filter type (each filter individually AND the cycling rule);
    RGBA drops alpha, grayscale broadcasts — the PIL convert("RGB")
    conventions decode_image's other paths follow."""
    import numpy as np

    from helixdb_spark.operators.multimodal import (
        decode_image,
        decode_png,
        encode_png,
    )

    rng = np.random.RandomState(7)
    for (h, w) in [(7, 5), (12, 9), (1, 1), (5, 1), (1, 8)]:
        arr = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
        assert np.array_equal(decode_png(encode_png(arr)), arr), (h, w)
    for ft in range(5):
        arr = rng.randint(0, 256, (6, 8, 3), dtype=np.uint8)
        got = decode_png(encode_png(arr, filter_rule=lambda r: ft))
        assert np.array_equal(got, arr), f"filter {ft}"
    arr4 = rng.randint(0, 256, (4, 6, 4), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(arr4)), arr4[:, :, :3])
    g = rng.randint(0, 256, (5, 4), dtype=np.uint8)
    out = decode_png(encode_png(g))
    for c in range(3):
        assert np.array_equal(out[:, :, c], g)
    # decode_image routes PNG by signature ahead of the PIL fallback
    arr = rng.randint(0, 256, (9, 7, 3), dtype=np.uint8)
    assert np.array_equal(decode_image(encode_png(arr)), arr)


def test_png_guards():
    """16-bit / interlaced / unknown color types raise the documented
    NotImplementedError; malformed payloads raise ValueError."""
    import struct
    import zlib

    import numpy as np
    import pytest

    from helixdb_spark.operators.multimodal import (
        PNG_SIG,
        decode_png,
        encode_png,
    )

    def png_with_ihdr(w, h, depth, ctype, interlace):
        ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, interlace)
        chunk = (
            struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr
            + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
        )
        return PNG_SIG + chunk

    with pytest.raises(ValueError):
        decode_png(b"not a png")
    with pytest.raises(NotImplementedError):
        decode_png(png_with_ihdr(2, 2, 16, 2, 0))  # 16-bit
    with pytest.raises(NotImplementedError):
        decode_png(png_with_ihdr(2, 2, 8, 2, 1))  # interlaced
    # truncated IDAT is a loud error, not silent garbage
    arr = np.zeros((3, 3, 3), dtype=np.uint8)
    good = encode_png(arr)
    with pytest.raises(Exception):
        decode_png(good[:-20])


# ------------------------------------------- empty-segment drift guard ----
def test_ivf_share_drift_empty_segment_stays_visible(spark, tmp_path):
    """r9 ADVICE: an appended segment with ZERO rows must appear in the
    per-segment drift series (share_drift 0.0, n_rows 0), not null out or
    vanish — the dashboard must show exactly the segment where ingest
    stalled."""
    from pyspark.sql import functions as F

    from helixdb_spark.index_store import AnnIndexStore

    emb = spark.range(200).select(
        F.col("id").alias("vec_id"),
        F.array(
            (F.col("id") % 7 + 1).cast("float"),
            (F.col("id") % 11 + 1).cast("float"),
            (F.col("id") % 13 + 1).cast("float"),
        ).alias("embedding"),
    )
    store = AnnIndexStore(spark, str(tmp_path / "idx"))
    store.write_ivf(emb, name="ivf", stride=50)
    # one real append, then a ZERO-ROW lists segment (a stalled ingest —
    # append_ivf's own empty-input early-return can't produce one, but a
    # crashed upstream writer or filtered-to-nothing batch can)
    more = emb.where(F.col("vec_id") < 50).select(
        (F.col("vec_id") + 1000).alias("vec_id"), "embedding"
    )
    store.append_ivf(more, name="ivf")
    desc, assigned, _ = store.read_ivf("ivf")
    gen = store._reserve_gen()
    store._stage(assigned.where(F.lit(False)), "ivf", "lists", gen, "centroid_id")
    new_desc = dict(desc)
    new_desc.update({"gen": gen, "segments": store._segments(desc) + [gen]})
    store._commit("ivf", new_desc)

    rows = {
        r["segment_idx"]: r
        for r in store.ivf_share_drift_by_segment("ivf").collect()
    }
    assert sorted(rows) == [0, 1, 2]
    assert rows[2]["n_rows"] == 0
    assert rows[2]["share_drift"] == 0.0  # visible, not null
    assert rows[1]["n_rows"] == 50
    assert rows[1]["share_drift"] is not None


# ------------------------------------------- streaming minhash dedup ----
def test_stream_dedup_lsh_lifecycle(spark, sf_dir):
    """The mid-stream MinHash index grows one segment per micro-batch
    (fit + 3 appends), every committed row is accounted for, and the
    per-batch dashboard stats are monotone-consistent (pairs never
    vanish once committed)."""
    from helixdb_spark.sources import load_table
    from helixdb_spark.streaming import stream_dedup_lsh

    debug = {}
    pairs = stream_dedup_lsh(spark, sf_dir, debug=debug).collect()
    assert debug["segments"] == 4  # fit + 3 streamed appends
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert debug["n_rows"] == n_docs
    assert len(debug["batches"]) == 3
    totals = [b["new_dup_pairs"] + b["known_pairs"] for b in debug["batches"]]
    assert totals == sorted(totals)  # committed pairs never vanish
    assert totals[-1] == len(pairs)


# ------------------------------------------- overflow-bounded moments ----
def test_bounded_moment_sum_adversarial_volumes(spark):
    """The shared int64-moment helper (r9 VERDICT #7): within the proven
    bound it sums EXACT int64; past it, it forms products on doubles so
    the job neither raises (ANSI) nor wraps (non-ANSI). Adversarial
    volume: y ~ 2^32, where y*y alone exceeds 2^63."""
    from pyspark.sql import functions as F

    from helixdb_spark.functions.numeric import (
        INT64_MAX,
        bounded_square_sum,
        int64_sum_product_fits,
    )

    assert int64_sum_product_fits(10**6, 10**6, 10**6)
    assert not int64_sum_product_fits(2**32, 2**32, 4)
    assert int64_sum_product_fits(0, 0, 0)
    # boundary: exactly INT64_MAX fits, one more does not
    assert int64_sum_product_fits(INT64_MAX, 1, 1)
    assert not int64_sum_product_fits(INT64_MAX, 2, 1)

    big = 2**32  # y*y = 2^64 > int64
    df = spark.createDataFrame([(big,)] * 4, "y long")
    # helper path: provably-unfittable bound -> double, correct value
    got = df.agg(
        bounded_square_sum(F.col("y"), big, 4).alias("q")
    ).first()["q"]
    assert abs(got - 4.0 * big * big) / (4.0 * big * big) < 1e-12
    # the small-volume path stays exact int64
    small = spark.createDataFrame([(3,), (4,)], "y long")
    got2 = small.agg(
        bounded_square_sum(F.col("y"), 4, 2).alias("q")
    ).first()["q"]
    assert got2 == 25 and isinstance(got2, int)
    # and the naive int64 product on the adversarial data fails loudly
    # under this session's ANSI mode (the failure the helper prevents)
    import pytest

    with pytest.raises(Exception):
        df.agg(F.sum(F.col("y") * F.col("y")).alias("q")).first()


# ------------------------------------------- native baseline JPEG ----
def test_jpeg_flat_blocks_round_trip_exactly():
    """DC-only content (flat color) survives the lossy pipeline exactly
    at q>=50 — the property that pins quantize/dequant, DC prediction,
    level shift and color-convert all at once."""
    import numpy as np

    from helixdb_spark.operators.jpeg import decode_jpeg, encode_jpeg

    for color in [(0, 0, 0), (255, 255, 255), (128, 64, 200), (1, 2, 3)]:
        arr = np.zeros((16, 24, 3), dtype=np.uint8)
        arr[:, :] = color
        out = decode_jpeg(encode_jpeg(arr, quality=90))
        assert np.array_equal(out, arr), color


def test_jpeg_smooth_content_small_error():
    """Smooth ramps at q90 stay within a few units per channel across
    4:4:4, 4:2:0 and grayscale; odd dimensions exercise MCU padding."""
    import numpy as np

    from helixdb_spark.operators.jpeg import decode_jpeg, encode_jpeg

    h, w = 23, 37  # odd: forces edge-replicated partial MCUs
    r = np.linspace(0, 255, w)[None, :].repeat(h, 0)
    g = np.linspace(0, 255, h)[:, None].repeat(w, 1)
    arr = np.stack([r, g, (r + g) / 2], 2).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(arr, quality=90))
    assert np.abs(out.astype(int) - arr.astype(int)).max() <= 8
    out420 = decode_jpeg(encode_jpeg(arr, quality=90, subsample=True))
    assert out420.shape == arr.shape
    assert np.abs(out420.astype(int) - arr.astype(int)).max() <= 16
    gray = np.linspace(10, 240, w)[None, :].repeat(h, 0).astype(np.uint8)
    outg = decode_jpeg(encode_jpeg(gray, quality=90))
    assert outg.shape == (h, w, 3)
    assert np.abs(outg[:, :, 0].astype(int) - gray.astype(int)).max() <= 8


def test_jpeg_guards_and_routing():
    """Non-baseline frames raise NotImplementedError; decode_image routes
    FFD8 payloads through the native decoder."""
    import numpy as np
    import pytest

    from helixdb_spark.operators.jpeg import decode_jpeg, encode_jpeg
    from helixdb_spark.operators.multimodal import decode_image

    with pytest.raises(ValueError):
        decode_jpeg(b"not a jpeg")
    # SOF2 decodes natively since r11 — but a SOF2 frame whose scan still
    # carries the baseline full-band header (Ss=0, Se=63) violates
    # T.81 G.1.1.1.1 and must be rejected as corrupt, not garbled
    good = bytearray(encode_jpeg(np.zeros((8, 8, 3), dtype=np.uint8)))
    sof = good.find(b"\xff\xc0")
    good[sof + 1] = 0xC2
    with pytest.raises(ValueError):
        decode_jpeg(bytes(good))
    # arithmetic-coded frames stay NotImplementedError
    good[sof + 1] = 0xC9
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(good))
    arr = np.full((8, 8, 3), 77, dtype=np.uint8)
    assert np.array_equal(decode_image(encode_jpeg(arr, quality=90)), arr)


def test_jpeg_restart_markers_are_transparent():
    """DRI/RSTn every N MCUs (the camera-JPEG resilience feature) must
    decode to EXACTLY the same pixels as the plain stream — restarts only
    reset DC predictors and byte-align, never change coefficients."""
    import numpy as np

    from helixdb_spark.operators.jpeg import decode_jpeg, encode_jpeg

    h, w = 40, 56  # 35 MCUs at 4:4:4
    r = np.linspace(0, 255, w)[None, :].repeat(h, 0)
    g = np.linspace(0, 255, h)[:, None].repeat(w, 1)
    arr = np.stack([r, g, (r + g) / 2], 2).astype(np.uint8)
    plain = decode_jpeg(encode_jpeg(arr, quality=90))
    for ri in (1, 3, 7, 35, 100):
        got = decode_jpeg(encode_jpeg(arr, quality=90, restart_interval=ri))
        assert np.array_equal(got, plain), f"restart_interval={ri}"
    rng = np.random.RandomState(5)
    noise = rng.randint(0, 256, (24, 32, 3), dtype=np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg(noise, quality=95, restart_interval=1)),
        decode_jpeg(encode_jpeg(noise, quality=95)),
    )


def test_multik_islands_nest(spark):
    """Monotonicity of the ladder: a run duplicated at k=100 contains
    duplicated k=30 windows everywhere inside it, so covered_chars and
    dup-span counts can only DECREASE as k grows — the mathematical
    reason the REMOVAL step only needs the smallest k while the
    measurement needs the whole ladder (long-duplication mass is the
    k=400 row; what to cut is the k=30 row)."""
    from helixdb_spark.operators.dedup import duplicate_spans_multik

    run120 = "x" * 50 + "the shared one hundred and twenty character run " * 3
    rows = [
        (1, "head A " + run120 + " tail A unique one"),
        (2, "head B " + run120 + " tail B other text"),
        (3, "entirely unique filler content with no duplication anywhere "
            "each word appearing once so no thirty char window can repeat "
            "within this document or across the other two documents here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    prof = {
        (r["doc_id"], r["k"]): r
        for r in duplicate_spans_multik(docs, ks=(30, 100)).collect()
    }
    for d in (1, 2, 3):
        assert prof[(d, 100)]["covered_chars"] <= prof[(d, 30)]["covered_chars"], d
        assert prof[(d, 100)]["n_dup_spans"] <= prof[(d, 30)]["n_dup_spans"], d
    # the long shared run is visible at BOTH widths for its carriers
    for d in (1, 2):
        assert prof[(d, 100)]["n_dup_spans"] > 0, d
        assert prof[(d, 30)]["covered_chars"] >= prof[(d, 100)]["covered_chars"] > 0
    assert prof[(3, 30)]["n_dup_spans"] == 0


def test_dct_phash_properties():
    """pHash invariants off the Spark path: identical pixels → identical
    hash; JPEG q85 recompression moves few bits; tonal inversion moves
    most; grayscale and RGB inputs of the same luma agree."""
    import numpy as np

    from helixdb_spark.operators.jpeg import decode_jpeg, encode_jpeg
    from helixdb_spark.operators.multimodal import dct_phash, phash_hamming

    # multi-wave content (the graded family's shape): several distinct
    # low frequencies keep the DCT block's coefficients well away from
    # the median, which is what makes the hash robust — a single
    # symmetric wave leaves half the block near zero and recompression
    # noise flips those bits freely (content-dependence is inherent to
    # pHash, not a codec bug)
    r = np.arange(40)[:, None]
    c = np.arange(52)[None, :]
    g = np.full((40, 52), 128.0)
    for j in range(4):
        g += 30 * np.sin((j % 5 + 1) * np.pi * r / 40 + j) * np.cos(
            (j % 4 + 1) * np.pi * c / 52 + j / 2
        )
    g = (g + r - c / 2).clip(0, 255)
    arr = np.stack([g, g, g], 2).astype(np.uint8)
    h0 = dct_phash(arr)
    assert phash_hamming(h0, dct_phash(arr.copy())) == 0
    assert phash_hamming(h0, dct_phash(g.astype(np.uint8))) == 0  # gray
    rec = decode_jpeg(encode_jpeg(arr, quality=85))
    assert phash_hamming(h0, dct_phash(rec)) <= 16
    assert phash_hamming(h0, dct_phash((255 - arr).astype(np.uint8))) >= 48
