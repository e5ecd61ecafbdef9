"""Edge-case unit tests for the document-pipeline operators that the
sf0.001 oracle-parity sweep can't hit (its corpus has no empty or
degenerate documents)."""

from __future__ import annotations

import hashlib

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


# ------------------------------------------------------ chunking / packing
def _chunk(spark, texts, window=8, stride=6):
    from helixdb_spark.operators import chunking

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = chunking.chunk_windows(df, window=window, stride=stride).collect()
    out: dict[int, list] = {}
    for r in rows:
        out.setdefault(r["doc_id"], []).append(r)
    return out


def test_chunk_windows_edge_cases(spark):
    texts = [
        "",  # no tokens -> no chunks
        "one two three",  # shorter than window -> exactly 1 chunk
        " ".join(f"w{i}" for i in range(8)),  # == window -> 1 chunk
        " ".join(f"w{i}" for i in range(9)),  # window+1 -> 2 chunks
        " ".join(f"w{i}" for i in range(20)),  # 1 + ceil(12/6) = 3 chunks
    ]
    chunks = _chunk(spark, texts)
    assert 0 not in chunks
    assert [len(chunks[i]) for i in (1, 2, 3, 4)] == [1, 1, 2, 3]
    # every token is covered: chunk j spans [j*stride, j*stride + window)
    r = chunks[4]
    assert [c["chunk_idx"] for c in r] == [0, 1, 2]
    assert [c["n_tokens"] for c in r] == [8, 8, 8]
    # the tail chunk of doc 3 holds the overlap remainder
    assert [c["n_tokens"] for c in chunks[3]] == [8, 3]


def test_pack_contexts_bins_are_monotone_and_exhaustive(spark):
    from helixdb_spark.operators import chunking

    # 7 docs of 100 tokens each in one source: offsets 0..600, context=256
    # => bins 0,0,0,1,1,1,2 (doc k starts at 100k)
    df = spark.createDataFrame(
        [(i, " ".join(f"t{j}" for j in range(100)), "s") for i in range(7)],
        "doc_id long, text string, source string",
    )
    rows = chunking.pack_contexts(df, context=256).collect()
    got = {r["bin_id"]: (r["n_docs"], r["first_doc"], r["last_doc"]) for r in rows}
    assert got == {0: (3, 0, 2), 1: (3, 3, 5), 2: (1, 6, 6)}
    assert sum(r["n_docs"] for r in rows) == 7
    assert sum(r["n_tokens"] for r in rows) == 700


def test_winnow_arrow_matches_hof_reference(spark, sf_dir):
    """The Arrow/numpy winnowing path must be bit-identical to the pure
    built-in HOF pipeline (the oracle's definition) on real data."""
    from helixdb_spark.functions.text import winnow_fingerprints_arrow
    from helixdb_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    d = docs.withColumn("__n", normalized_text(F.col("text")))

    def digest(col):
        return F.md5(F.array_join(F.transform(col, lambda x: x.cast("string")), ","))

    # two separate jobs: combining both in one plan lets CollapseProject
    # re-nest the staged HOF stages into one exponential expression
    hof = with_winnow_fingerprints(d, F.col("__n"), out="fps")
    a = dict(hof.select("doc_id", digest(F.col("fps")).alias("dg")).collect())
    b = dict(
        d.withColumn("fps", winnow_fingerprints_arrow(F.col("__n")))
        .select("doc_id", digest(F.col("fps")).alias("dg"))
        .collect()
    )
    assert a == b and len(a) > 0


def test_kmeans_assign_nearest_and_tiebreak(spark):
    from helixdb_spark.operators.similarity import kmeans_assign

    pts = spark.createDataFrame(
        [
            (0, [0.0, 0.0]),   # exactly on c0
            (1, [10.0, 0.0]),  # exactly on c1
            (2, [5.0, 0.0]),   # equidistant -> lower cluster id wins
            (3, [6.0, 0.0]),   # nearer c1
        ],
        "vec_id long, embedding array<double>",
    )
    cents = [(0, [0.0, 0.0]), (1, [10.0, 0.0])]
    got = {
        r["vec_id"]: (r["cluster_id"], r["sqdist"])
        for r in kmeans_assign(pts, cents).collect()
    }
    assert got[0] == (0, 0.0)
    assert got[1] == (1, 0.0)
    assert got[2][0] == 0  # tie -> lowest cluster id
    assert got[3] == (1, 16.0)


def test_kmeans_fit_deterministic(spark):
    from helixdb_spark.operators.similarity import kmeans_fit_assign

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a = [tuple(r) for r in kmeans_fit_assign(emb, k=4, n_iter=2).collect()]
    b = [tuple(r) for r in kmeans_fit_assign(emb, k=4, n_iter=2).collect()]
    assert a == b
    assert sum(n for _, n, _ in a) == emb.count()


def test_boilerplate_empty_and_hot_docs(spark):
    from helixdb_spark.operators.text_analysis import boilerplate_metrics

    boiler = "x y z " * 4  # shingles 'x y z','y z x','z x y' repeated
    rows = [
        (0, ""),  # empty: 0 shingles, kept
        (1, "a b"),  # shorter than shingle width: 0 shingles, kept
        (2, boiler),  # pure boilerplate once df >= threshold
        (3, boiler),
        (4, boiler),
        (5, boiler),
        (6, "p q r s t u v w"),  # unique content, kept
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r.asDict()
        for r in boilerplate_metrics(df, df_threshold=4).collect()
    }
    assert out[0]["n_shingles"] == 0 and out[0]["kept"] == 1
    assert out[0]["boiler_frac"] == 0.0
    assert out[1]["n_shingles"] == 0 and out[1]["kept"] == 1
    for d in (2, 3, 4, 5):  # every shingle appears in 4 docs -> all boiler
        assert out[d]["n_boiler"] == out[d]["n_shingles"] > 0
        assert out[d]["kept"] == 0
    assert out[6]["n_boiler"] == 0 and out[6]["kept"] == 1


def test_growth_accounting_ledger(spark, sf_dir):
    """Per-day identity: new + retained + resurrected == distinct active
    users; churned(d) == active(d-1) - retained(d)."""
    from helixdb_spark.plans.events import ev_growth_accounting
    from helixdb_spark.sources import load_table

    led = {r["day"]: r.asDict() for r in ev_growth_accounting(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events")
    active = {
        r["day"]: r["n"]
        for r in ev.select(F.to_date("ts").alias("day"), "user_id")
        .distinct()
        .groupBy("day")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    days = sorted(led)
    for d in days:
        row = led[d]
        assert row["n_new"] + row["n_retained"] + row["n_resurrected"] == active[d]
    for prev, cur in zip(days, days[1:]):
        if (cur - prev).days == 1:
            assert led[cur]["n_churned"] == active[prev] - led[cur]["n_retained"]


def test_source_cap_keeps_min_cap_n(spark, sf_dir):
    from helixdb_spark.plans.pipeline import SOURCE_CAP, curate_source_cap

    out = curate_source_cap(spark, sf_dir)
    per = (
        out.groupBy("source")
        .agg(F.count("*").alias("n"), F.sum("kept").alias("n_kept"))
        .collect()
    )
    assert per
    for r in per:
        assert r["n_kept"] == min(SOURCE_CAP, r["n"])


def test_semantic_pairs_subset_of_bruteforce_same_cluster(spark, sf_dir):
    """SemDeDup prunes cross-cluster pairs and nothing else: its pair set
    equals the brute-force pairs at the same threshold restricted to
    same-cluster ids, and the pair stage is an equi-join (no cartesian)."""
    from helixdb_spark.operators import dedup
    from helixdb_spark.operators.similarity import kmeans_fit
    from helixdb_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    sem = dedup.semantic_dup_pairs(emb, threshold=0.25)
    plan = sem._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    got = {(r["id_a"], r["id_b"]) for r in sem.collect()}
    cluster = {
        r["vec_id"]: r["cluster_id"] for r in kmeans_fit(emb).collect()
    }
    brute = {
        (r["id_a"], r["id_b"])
        for r in dedup.embedding_dup_pairs(emb, threshold=0.25).collect()
        if cluster[r["id_a"]] == cluster[r["id_b"]]
    }
    assert got == brute


def test_perceptual_hash_known_bits_and_empty(spark):
    from helixdb_spark.operators import multimodal as mm
    import pyspark.sql.functions as F

    media = spark.createDataFrame(
        [(1, bytearray(b"ab")), (2, bytearray(b"")), (3, bytearray(b"ab"))],
        "doc_id bigint, payload binary",
    )
    rows = {
        r["doc_id"]: r["phash_hex"]
        for r in mm.perceptual_hash(media).collect()
    }
    # payload "ab": samples = 32x97 then 32x98, mean 97.5 -> 0-bits then 1-bits
    assert rows[1] == "00000000ffffffff"
    assert rows[2] is None
    deg = {
        r["doc_id"]: r["n_candidates"]
        for r in mm.phash_candidate_degree(mm.perceptual_hash(media)).collect()
    }
    # identical payloads 1 and 3 share every block; empty doc has no blocks
    assert deg[1] == 1 and deg[3] == 1 and deg[2] == 0


def test_lm_score_hand_computed(spark):
    import math

    from helixdb_spark.operators import text_analysis as ta

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "b c"), (3, "   ")],
        "doc_id bigint, text string",
    )
    rows = {r["doc_id"]: r for r in ta.lm_score(docs).collect()}
    # corpus: a:2 b:2 c:1, N=5, V=3; add-one: p(a)=p(b)=3/8, p(c)=2/8
    assert set(rows) == {1, 2}  # the all-whitespace doc has no tokens
    assert rows[1]["n_tokens"] == 3
    assert abs(rows[1]["avg_logp"] - round(1e-9 + math.log(0.375), 6)) < 1e-9
    expect2 = (math.log(0.375) + math.log(0.25)) / 2
    assert abs(rows[2]["avg_logp"] - round(1e-9 + expect2, 6)) < 1e-9
    assert abs(
        rows[2]["lm_bits"] - round(1e-9 - expect2 / math.log(2.0), 6)
    ) < 1e-9


# ------------------------------------------------- pluggable image decoder
def _make_fake_decoder():
    """Deterministic stand-in for a real decoder: payload bytes tiled into
    an (len%7+3) x (len%5+4) uint8 'image'. Returned as a CLOSURE so
    cloudpickle ships it to executors by value (a module-level function in
    a test file pickles by reference, which workers cannot import — the
    same constraint a user's real decoder callable has)."""

    def fake(payload: bytes):
        import numpy as np

        n = len(payload)
        h, w = n % 7 + 3, n % 5 + 4
        flat = np.frombuffer(
            (payload * (h * w // n + 1))[: h * w], dtype=np.uint8
        )
        return flat.reshape(h, w)

    return fake


_fake_decoder = _make_fake_decoder()


def test_resize_media_with_injected_decoder(spark):
    """Decoder injection (round-3 verdict item 8): a real-decoder
    environment upgrades resize/features from the byte stub with no code
    edits — same schema, same 1-row-per-item plumbing, kernel swapped."""
    import hashlib

    import numpy as np

    from helixdb_spark.operators import multimodal as mm

    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "abc"), (3, "")], "doc_id long, text string"
    )
    media = mm.synthesize_media(docs)
    stub = {r["doc_id"]: r for r in mm.resize_media(media).collect()}
    real = {
        r["doc_id"]: r
        for r in mm.resize_media(media, decoder=_fake_decoder).collect()
    }
    assert set(real) == {1, 2, 3} and set(stub) == {1, 2, 3}
    # empty payload: both paths emit the 0/None row
    assert real[3]["out_len"] == 0 and real[3]["resized_md5"] is None
    # decoded path resamples the fake image — expected md5 computed locally
    for doc_id, text in ((1, "hello world"), (2, "abc")):
        arr = _fake_decoder(text.encode())
        h, w = arr.shape
        ri = (np.arange(mm.RESIZE_TARGET_H) * h) // mm.RESIZE_TARGET_H
        ci = (np.arange(mm.RESIZE_TARGET_W) * w) // mm.RESIZE_TARGET_W
        want = hashlib.md5(np.ascontiguousarray(arr[ri][:, ci]).tobytes()).hexdigest()
        assert real[doc_id]["resized_md5"] == want
        assert real[doc_id]["out_len"] == mm.RESIZE_TARGET_W * mm.RESIZE_TARGET_H
    # and the stub path is untouched by the feature's existence
    assert stub[1]["resized_md5"] != real[1]["resized_md5"]


def test_extract_features_with_injected_decoder(spark):
    import hashlib

    import numpy as np

    from helixdb_spark.operators import multimodal as mm

    docs = spark.createDataFrame([(7, "spark")], "doc_id long, text string")
    media = mm.synthesize_media(docs)
    row = mm.extract_features(media, decoder=_fake_decoder).collect()[0]
    buf = np.ascontiguousarray(_fake_decoder(b"spark")).tobytes()
    assert row["n_bytes"] == len(buf)
    assert row["first_byte"] == buf[0] and row["last_byte"] == buf[-1]
    assert row["checksum_hex"] == hashlib.md5(buf).hexdigest()[:8]


def test_set_decoder_routes_decode_image():
    import numpy as np

    from helixdb_spark.operators import multimodal as mm

    mm.set_decoder(_fake_decoder)
    try:
        out = mm.decode_image(b"hello world")
        assert out.shape == _fake_decoder(b"hello world").shape
        assert np.array_equal(out, _fake_decoder(b"hello world"))
    finally:
        mm.set_decoder(None)


# -------------------------------- collocations / quantize / shard assignment
def test_collocations_hand_computed(spark):
    """4 docs, 'data pipeline' appears together far above chance."""
    from helixdb_spark.operators.text_analysis import collocations

    docs = spark.createDataFrame(
        [
            (1, "data pipeline data pipeline data pipeline x"),
            (2, "data pipeline y data pipeline"),
            (3, "pipeline z data q"),
            (4, "a b a b a b a b a b"),
        ],
        "doc_id long, text string",
    )
    rows = collocations(docs, min_count=2, k=5).collect()
    top = rows[0]
    # unigrams N1 = 7+5+4+10 = 26; bigrams N2 = 6+4+3+9 = 22
    # 'a b': c_ab=5, c_a=5, c_b=5 -> pmi = ln(5*26*26/(22*5*5))
    # 'data pipeline': c_ab=5, c_a=6, c_b=6 -> ln(5*26*26/(22*6*6))
    import math

    assert (top["w1"], top["w2"]) == ("a", "b")
    want = round(math.log(5 * 26 * 26 / (22 * 5 * 5)) + 1e-9, 6)
    assert abs(top["pmi"] - want) < 1e-9
    dp = {(r["w1"], r["w2"]): r["pmi"] for r in rows}
    want_dp = round(math.log(5 * 26 * 26 / (22 * 6 * 6)) + 1e-9, 6)
    assert abs(dp[("data", "pipeline")] - want_dp) < 1e-9


def test_int8_quantize_error_bounded_by_half_scale(spark):
    """Quantization error can never exceed scale/2 (+fp dust); constant
    dims quantize losslessly to q=0."""
    from helixdb_spark.operators.similarity import int8_quantize_report

    emb = spark.createDataFrame(
        [
            (1, [0.0, 5.0], "a"),
            (2, [2.55, 5.0], "a"),
            (3, [1.0, 5.0], "b"),
        ],
        "vec_id long, embedding array<double>, label string",
    )
    rows = {r["label"]: r for r in int8_quantize_report(emb).collect()}
    # dim0: lo=0, hi=2.55 -> scale=0.01, every value lands on the grid
    # dim1: constant -> scale=0, error 0
    assert rows["a"]["max_abs_err"] <= 0.005 + 1e-6
    assert rows["b"]["max_abs_err"] <= 0.005 + 1e-6
    assert rows["a"]["n_values"] == 4 and rows["b"]["n_values"] == 2


def test_shard_assignment_partition_of_corpus(spark, sf_dir):
    """Shards partition the corpus exactly (no doc lost or duplicated) and
    the summary is stable across reruns (deterministic hash, no seed)."""
    import __spark_entry__ as entry

    qs = entry.queries()
    a = qs["curate_shard_assignment"](spark, sf_dir).collect()
    b = qs["curate_shard_assignment"](spark, sf_dir).collect()
    assert a == b
    from helixdb_spark.sources import load_table

    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(r["n_docs"] for r in a) == n_docs
    assert len({r["shard"] for r in a}) == len(a)


def test_subword_count_greedy_longest_match(spark):
    """The regex-alternation tokenizer must implement greedy
    longest-vocab-match: 'nation' = na|tion? No — greedy at position 0
    takes 'n' then 'ation' (5-char entry beats 'at'+'ion'), and counts
    must match a hand-computed greedy walk."""
    from helixdb_spark.functions.text import (
        SUBWORD_VOCAB,
        subword_count,
        subword_pattern,
    )
    import re

    from pyspark.sql import functions as F

    def greedy(word):
        ordered = sorted(SUBWORD_VOCAB, key=lambda v: (-len(v), v))
        n, pos = 0, 0
        while pos < len(word):
            for v in ordered:
                if word.startswith(v, pos):
                    pos += len(v)
                    break
            else:
                pos += 1
            n += 1
        return n

    samples = ["nation", "the information", "testing, 123!", "formation"]
    df = spark.createDataFrame([(s,) for s in samples], "text string")
    got = [
        r["c"]
        for r in df.select(subword_count(F.col("text")).alias("c"))
        .collect()
    ]
    # punctuation inside \S+ runs is consumed by the single-char fallback
    # class, which greedy() mirrors via its pos += 1 branch
    want = [
        sum(greedy(w) for w in re.findall(r"\S+", s.lower()))
        for s in samples
    ]
    assert got == want


def test_global_rank_matches_single_task_window(spark):
    """Distributed global rank (range partition + offsets) must equal the
    naive Window.orderBy ranking, under any input partitioning."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    from helixdb_spark.operators.dedup import global_rank

    df = spark.range(500).select(
        F.col("id"), F.md5(F.col("id").cast("string")).alias("k")
    )
    want = {
        r["id"]: r["rk"]
        for r in df.withColumn(
            "rk", F.row_number().over(W.orderBy("k", "id"))
        ).collect()
    }
    for parts in (1, 4, 16):
        got = {
            r["id"]: r["rk"]
            for r in global_rank(
                df.repartition(parts), ["k", F.col("id")]
            ).collect()
        }
        assert got == want


# ------------------------------------ pure-Python image decode (round 7)
def test_bmp_roundtrip_and_layout():
    """encode_bmp -> decode_bmp is the identity, including the cases a
    naive reader gets wrong: non-multiple-of-4 row widths (padding) and
    the bottom-up row order / BGR channel order."""
    import numpy as np

    from helixdb_spark.operators import multimodal as mm

    rng_vals = (np.arange(7 * 5 * 3, dtype=np.int64) * 37 % 256).astype(
        "uint8"
    )
    arr = rng_vals.reshape(7, 5, 3)  # width 5 -> row pad 1 byte
    payload = mm.encode_bmp(arr)
    assert payload[:2] == b"BM"
    out = mm.decode_bmp(payload)
    assert out.shape == (7, 5, 3) and np.array_equal(out, arr)
    # decode_image routes BMP natively (no PIL, no injected decoder)
    assert np.array_equal(mm.decode_image(payload), arr)
    # top-down BMP (negative height) decodes identically
    import struct

    neg = bytearray(payload)
    h = struct.unpack_from("<i", payload, 22)[0]
    struct.pack_into("<i", neg, 22, -h)
    body = np.frombuffer(payload, np.uint8, offset=54).reshape(7, -1)
    neg[54:] = body[::-1].tobytes()  # re-store rows top-down
    assert np.array_equal(mm.decode_bmp(bytes(neg)), arr)


def test_ppm_decode_with_comments():
    import numpy as np

    from helixdb_spark.operators import multimodal as mm

    arr = (np.arange(4 * 6 * 3, dtype=np.int64) * 11 % 256).astype("uint8")
    payload = (
        b"P6\n# a comment\n6 4\n# another\n255\n" + arr.tobytes()
    )
    out = mm.decode_image(payload)
    assert out.shape == (4, 6, 3) and np.array_equal(
        out, arr.reshape(4, 6, 3)
    )


def test_undecodable_format_still_raises():
    import pytest as _pytest

    from helixdb_spark.operators import multimodal as mm

    with _pytest.raises((NotImplementedError, ValueError)):
        mm.decode_image(b"\x89PNG\r\n\x1a\n....")


def test_mm_operators_run_on_decoded_bmp_pixels(spark):
    """extract_features/resize_media with decoder=decode_image run the
    SAME plumbing over genuinely decoded pixel buffers."""
    import hashlib

    import numpy as np

    from helixdb_spark.operators import multimodal as mm

    arr = (
        (np.arange(6 * 6 * 3, dtype=np.int64) * 13 % 256)
        .astype("uint8")
        .reshape(6, 6, 3)
    )
    payload = mm.encode_bmp(arr)
    media = spark.createDataFrame(
        [(1, bytearray(payload), "image/bmp", 6, 6, 1)],
        "doc_id long, payload binary, format string, width int, "
        "height int, n_frames int",
    )
    row = mm.extract_features(media, decoder=mm.decode_image).collect()[0]
    buf = arr.tobytes()
    assert row["n_bytes"] == len(buf)
    assert row["checksum_hex"] == hashlib.md5(buf).hexdigest()[:8]
    rrow = mm.resize_media(media, 4, 4, decoder=mm.decode_image).collect()[0]
    ri = (np.arange(4) * 6) // 4
    want = np.ascontiguousarray(arr[ri][:, ri]).tobytes()
    assert rrow["out_len"] == len(want)
    assert rrow["resized_md5"] == hashlib.md5(want).hexdigest()


def test_ivf_multiprobe_recall_dominates_single_probe(spark):
    """n_probe=2 scores a SUPERSET of the single-probe candidates, so its
    recall@k against brute-force truth can never be lower."""
    from helixdb_spark.operators import similarity as sim
    from helixdb_spark.sources import load_table
    from pyspark.sql import functions as F

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    q = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    centroids = emb.where(
        (F.col("vec_id") % sim.IVF_CENTROID_STRIDE) == 0
    ).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("_cvec"),
    )
    assigned = sim.assign_nearest_centroid(
        sim.spread(emb), centroids, "embedding", "vec_id"
    ).persist()
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in sim.brute_force_topk(emb, q, k=5).collect()
    }

    def recall(df):
        got = {(r["query_id"], r["neighbor_id"]) for r in df.collect()}
        return len(got & truth) / len(truth)

    r1 = recall(sim.ivf_probe_topk(assigned, centroids, q, k=5))
    r2 = recall(
        sim.ivf_multiprobe_topk(assigned, centroids, q, k=5, n_probe=2)
    )
    assigned.unpersist()
    assert r2 >= r1 > 0
