"""Round-8 operator tests: batched BPE, raw (no-decompress) reads,
auto-folded index chains under the maintenance loop, retention-driven
index invalidation, state-log torn-read retry, recursive corpus
fingerprints, and the pinned Spark watermark assumption."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from helixdb_spark.codecs import ARRAY_CODEC, CodecRegistry
from helixdb_spark.engine import HelixOptions, HelixSpark
from helixdb_spark.index_store import (
    AnnIndexStore,
    StaleIndexError,
    source_fingerprint,
)
from helixdb_spark.sources import load_table


# --------------------------------------------------------- batched BPE
def _doc_df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_bpe_batched_equals_serial_on_non_interacting_corpus(spark):
    """The docstring's exactness claim, pinned: when the top pairs are
    symbol-disjoint AND merging creates no new competitive pair (2-char
    words merge away completely), batched rounds equal serial training."""
    from helixdb_spark.operators.text_analysis import bpe_train_merges

    texts = (
        ["ab"] * 10 + ["cd"] * 9 + ["ef"] * 8 + ["gh"] * 7
    )
    docs = _doc_df(spark, [" ".join(texts)])
    serial = bpe_train_merges(docs, n_merges=4, batch=1)
    batched = bpe_train_merges(docs, n_merges=4, batch=4)
    assert serial == batched
    assert [m[0] for m in serial] == [1, 2, 3, 4]
    assert [m[4] for m in serial] == [10, 9, 8, 7]


def test_bpe_batch1_is_the_serial_trainer(spark, sf_dir):
    """batch=1 must BE the serial path (same argmax, same fold) — guards
    the round-8 refactor of the loop body on the graded corpus."""
    from helixdb_spark.operators.text_analysis import bpe_train_merges

    docs = load_table(spark, sf_dir, "documents").limit(60)
    assert bpe_train_merges(docs, n_merges=3) == bpe_train_merges(
        docs, n_merges=3, batch=1
    )


def test_bpe_batched_admission_is_disjoint(spark):
    """Interacting pairs must NOT land in one round: with 'aa ab' corpora
    the top-2 pairs share the symbol a, so batch=2 admits only the argmax
    per round and needs as many rounds — output still n_merges rows with
    contiguous ranks."""
    from helixdb_spark.operators.text_analysis import bpe_train_merges

    # words: "aaa" x 5, "ab" x 4 -> round-1 counts: (a,a)=10, (a,b)=4 share 'a'
    docs = _doc_df(spark, [" ".join(["aaa"] * 5 + ["ab"] * 4)])
    merges = bpe_train_merges(docs, n_merges=2, batch=2)
    assert [m[0] for m in merges] == [1, 2]
    # round 1 admits only (a,a); (a,b) interacts and waits for round 2
    assert (merges[0][1], merges[0][2]) == ("a", "a")


def test_assign_struct_sql_is_bit_identical_to_column_form(spark, sf_dir):
    """The SQL-text twin must produce the exact rows the Column-algebra
    form does — same casts, same literal-first addition, same rounding —
    or every persisted-PQ answer would silently shift."""
    from helixdb_spark.operators.similarity import (
        assign_struct,
        assign_struct_sql,
    )

    emb = load_table(spark, sf_dir, "embeddings").limit(200)
    centroids = [
        (3, [0.1] * 16),
        (7, [-0.25, 1e-05] * 8),
        (1, [0.0] * 16),
    ]
    a = emb.select(
        "vec_id",
        assign_struct(F.slice("embedding", 1, 16), centroids).alias("s"),
    )
    b = emb.select(
        "vec_id",
        assign_struct_sql("slice(embedding, 1, 16)", centroids).alias("s"),
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_lsh_multiprobe_recall_dominates_single_probe(spark, sf_dir):
    """The probe set is a superset of the single-bucket probe, so recall
    against the brute-force truth must never be lower."""
    from helixdb_spark.operators.similarity import (
        brute_force_topk,
        lsh_multiprobe_topk,
        lsh_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    truth = set(
        map(tuple, brute_force_topk(emb, q, k=5).select(
            "query_id", "neighbor_id").collect())
    )
    single = set(
        map(tuple, lsh_topk(emb, q, k=5).select(
            "query_id", "neighbor_id").collect())
    )
    multi = set(
        map(tuple, lsh_multiprobe_topk(emb, q, k=5).select(
            "query_id", "neighbor_id").collect())
    )
    assert len(multi & truth) >= len(single & truth)


# ------------------------------------------------- raw (no-decompress) reads
def _codec_db(spark, tmp_path):
    registry = CodecRegistry()
    registry.register_dispatch(
        lambda key: "delta_zlib" if key == b"blobkey" else ARRAY_CODEC
    )
    db = HelixSpark.open(
        spark,
        str(tmp_path / "kv"),
        HelixOptions(rick_range=100, outdate_range=1 << 30, auto_maintain=False),
        codecs=registry,
    )
    db.put(
        [(t, b"blobkey", b"v%03d" % t) for t in range(10, 14)]
        + [(t, b"arrkey", b"a%03d" % t) for t in range(10, 14)]
        + [(250, b"blobkey", b"hotv")]
    )
    db.compact(0, 199)  # bucket 0/1 -> cold; ts=250 stays hot
    return db


def test_get_raw_returns_stored_blob_byte_identically(spark, tmp_path):
    """src/option.rs:131-148 parity: the raw path hands back the stored
    compressed chunk without running the UDCF, byte-identical to the blob
    on disk, and the caller-side decompress recovers the series."""
    db = _codec_db(spark, tmp_path)
    codec, blob = db.get_raw(12, b"blobkey")
    assert codec == "delta_zlib"
    # byte-identical to what compaction wrote
    cold = spark.read.parquet(db.layout.cold_path)
    disk = cold.where(F.col("key") == F.lit(b"blobkey")).select("blob").first()
    assert bytes(disk["blob"]) == blob
    # caller-side decompress recovers the exact series
    pairs = db.codecs.get(codec).decompress(b"blobkey", blob)
    assert (12, b"v012") in [(t, bytes(v)) for t, v in pairs]
    # the decoded get agrees
    assert db.get(12, b"blobkey") == b"v012"
    db.close()


def test_get_raw_array_hot_and_retention_paths(spark, tmp_path):
    db = _codec_db(spark, tmp_path)
    # cold ARRAY chunk: nothing to decompress -> exact value, codec "raw"
    assert db.get_raw(11, b"arrkey") == ("raw", b"a011")
    # ts present in bucket but absent from the array chunk
    assert db.get_raw(99, b"arrkey") is None
    # hot row wins and reads raw
    assert db.get_raw(250, b"blobkey") == ("raw", b"hotv")
    # unknown key
    assert db.get_raw(12, b"nokey") is None
    # retention: retired ts reads None even though the chunk exists
    db.outdate(150)
    assert db.get_raw(12, b"blobkey") is None
    db.close()


def test_scan_raw_moves_stored_chunks_without_decode(spark, tmp_path):
    db = _codec_db(spark, tmp_path)
    rows = db.scan_raw(time_range=(0, 199)).collect()
    by_key = {bytes(r["key"]): r for r in rows}
    assert by_key[b"blobkey"]["codec"] == "delta_zlib"
    assert by_key[b"blobkey"]["chunk"] is None
    assert by_key[b"blobkey"]["blob"] is not None
    assert by_key[b"arrkey"]["codec"] == ARRAY_CODEC
    assert by_key[b"arrkey"]["blob"] is None
    # no Python decode node in the raw plan
    plan = (
        db.scan_raw(time_range=(0, 199))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    db.close()


def test_dsir_prefers_target_domain_docs(spark, sf_dir):
    """DSIR scores must actually separate the domains: the target slice
    (lang='en') averages a higher log importance than the rest, and the
    selected set is enriched in target docs."""
    from helixdb_spark.operators.text_analysis import dsir_importance

    docs = load_table(spark, sf_dir, "documents")
    scored = dsir_importance(docs, F.col("lang") == "en").join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    means = {
        r["t"]: r["m"]
        for r in scored.groupBy(
            (F.col("lang") == "en").alias("t")
        ).agg(F.avg("log_importance").alias("m")).collect()
    }
    assert means[True] > means[False]
    # an importance RESAMPLER keeps the top of the weight ranking; the
    # top quartile must be enriched in target docs (the sign-based
    # `selected` flag can be empty on a near-homogeneous corpus — this
    # synthetic one shares most vocabulary across langs, so every doc
    # scores <= 0 against the blended raw distribution)
    rows = scored.select("lang", "log_importance", "doc_id").collect()
    rows.sort(key=lambda r: (-r["log_importance"], r["doc_id"]))
    q = max(1, len(rows) // 4)
    top_rate = sum(r["lang"] == "en" for r in rows[:q]) / q
    base_rate = sum(r["lang"] == "en" for r in rows) / len(rows)
    assert top_rate > base_rate


# --------------------------------------------- Gorilla-style UDCF codec
def test_ts_delta_xor_roundtrip_and_compression():
    """Byte-exact roundtrip on metric-shaped series + the codec actually
    compresses a slowly-varying series (the Gorilla claim)."""
    import struct as st

    from helixdb_spark.codecs import (
        _ts_delta_xor_compress,
        _ts_delta_xor_decompress,
    )

    def pack(v: int) -> bytes:
        return st.pack(">q", v)

    series = [(1000 + 15 * i, pack(500_000 + (i % 7))) for i in range(200)]
    blob = _ts_delta_xor_compress(b"k", series)
    assert _ts_delta_xor_decompress(b"k", blob) == series
    raw = sum(8 + 8 for _ in series)
    assert len(blob) < raw / 3  # regular deltas + tiny XORs collapse
    # edge cases: empty, single, identical consecutive values, ts going
    # backwards (negative delta), high-entropy values
    for s in (
        [],
        [(5, pack(42))],
        [(1, pack(7)), (2, pack(7)), (3, pack(7))],
        [(100, pack(1)), (50, pack(2)), (200, pack(3))],
        [(i, st.pack(">Q", (i * 0x9E3779B97F4A7C15) % (1 << 64)))
         for i in range(50)],
    ):
        assert _ts_delta_xor_decompress(b"k", _ts_delta_xor_compress(b"k", s)) == s


def test_ts_delta_xor_rejects_non_8_byte_values():
    from helixdb_spark.codecs import _ts_delta_xor_compress

    with pytest.raises(ValueError):
        _ts_delta_xor_compress(b"k", [(1, b"short")])


def test_kv_codec_gorilla_scan_matches_plain_select(spark, sf_dir):
    """The graded row's transparency contract, locally: compacting through
    ts_delta_xor must not change what a scan returns."""
    from helixdb_spark.plans.kv import KV_GORILLA_SQL, kv_codec_gorilla

    import duckdb

    got = sorted(map(tuple, kv_codec_gorilla(spark, sf_dir).collect()))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"'{sf_dir}/events.parquet'"
    )
    want = sorted(map(tuple, con.execute(KV_GORILLA_SQL).fetchall()))
    assert got == want


def test_restore_chunks_crash_before_flip_leaves_replica_unchanged(
    spark, tmp_path
):
    """restore_chunks commits write-new-then-flip: a crash AFTER the data
    lands but BEFORE the manifest flip must leave the replica exactly as
    it was (staged dir invisible to readers), and vacuum() collects the
    debris."""
    import unittest.mock as mock

    src = _codec_db(spark, tmp_path / "src")
    exported = src.scan_raw(time_range=(0, 199))
    dst = HelixSpark.open(
        spark,
        str(tmp_path / "dst"),
        HelixOptions(rick_range=100, outdate_range=1 << 30, auto_maintain=False),
        codecs=src.codecs,
    )
    dst.put([(250, b"live", b"val")])
    before = sorted(map(tuple, dst.scan((0, 300)).collect()))

    calls = {"n": 0}
    real = HelixSpark._save_state

    def boom_on_flip(self):
        calls["n"] += 1
        if calls["n"] >= 2:  # call 1 = the gen reservation; 2 = the flip
            raise RuntimeError("crash before manifest flip")
        return real(self)

    with mock.patch.object(HelixSpark, "_save_state", boom_on_flip):
        with pytest.raises(RuntimeError, match="crash before"):
            dst.restore_chunks(exported)

    dst2 = HelixSpark.open(
        spark,
        str(tmp_path / "dst"),
        HelixOptions(rick_range=100, outdate_range=1 << 30, auto_maintain=False),
        codecs=src.codecs,
    )
    assert sorted(map(tuple, dst2.scan((0, 300)).collect())) == before
    assert not dst2._state.get("cold_manifest")  # nothing flipped
    dst2.vacuum()  # collects the staged-but-unreferenced generation
    import os

    cold = dst2.layout.cold_path
    leftovers = os.listdir(cold) if os.path.isdir(cold) else []
    assert not [d for d in leftovers if d.startswith("gen=")]
    # a retried restore on the reopened engine succeeds and reads back
    dst2.restore_chunks(exported)
    assert dst2.get(12, b"blobkey") == b"v012"
    src.close()
    dst2.close()


# --------------------------------------------------- batched as-of reads
def test_get_many_asof_matches_scalar_get_asof(spark, tmp_path):
    db = HelixSpark.open(
        spark,
        str(tmp_path / "kv"),
        HelixOptions(rick_range=100, outdate_range=1 << 30, auto_maintain=False),
    )
    db.put(
        [(t, b"a", b"av%03d" % t) for t in (10, 50, 150)]
        + [(t, b"b", b"bv%03d" % t) for t in (20, 120)]
    )
    db.compact(0, 99)  # span the hot/cold boundary
    probes = [(60, b"a"), (150, b"a"), (500, b"b"), (5, b"b"), (70, b"c")]
    got = db.get_many_asof(probes)
    for p_ts, key in probes:
        scalar = db.get_asof(p_ts, key)
        if scalar is None:
            assert (p_ts, key) not in got
        else:
            assert got[(p_ts, key)] == scalar
    assert got[(60, b"a")] == (50, b"av050")
    assert got[(500, b"b")] == (120, b"bv120")
    assert (70, b"c") not in got and (5, b"b") not in got
    # retention: outdated probes disappear, later ones clamp to live data
    db.outdate(15)
    got2 = db.get_many_asof([(12, b"a"), (60, b"a")])
    assert (12, b"a") not in got2 and got2[(60, b"a")] == (50, b"av050")
    db.close()


# ---------------------------------------- auto-folded index chains (M6/M8)
def test_registered_index_chain_is_bounded_and_exact(spark, sf_dir, tmp_path):
    """Verdict r7 #1: under register_index(max_segments=K) the maintenance
    loop appends AND folds — the chain never exceeds K+1 mid-cycle, ends
    <= K, and every cycle's probe equals a full rebuild."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    store = AnnIndexStore(spark, str(tmp_path / "idx"))
    store.write_lsh(emb.where(F.col("vec_id") % 5 == 0))
    db = HelixSpark.open(
        spark,
        str(tmp_path / "db"),
        HelixOptions(rick_range=10, outdate_range=1 << 30, auto_maintain=False),
    )
    grown = {"i": 0}
    db.register_index(
        store,
        "lsh",
        lambda _db: emb.where(F.col("vec_id") % 5 <= grown["i"]),
        max_segments=2,
    )
    lengths = []
    for i in range(1, 5):
        grown["i"] = i
        db.put([(i * 10, b"k", b"v%d" % i)])
        db.compact(i * 10, i * 10 + 9)
        lengths.append(len(store._segments(store._state["indexes"]["lsh"])))
    db.close()
    assert max(lengths) <= 2 and lengths[-1] <= 2, lengths
    full = AnnIndexStore(spark, str(tmp_path / "full"))
    full.write_lsh(emb)
    got = sorted(map(tuple, store.lsh_topk(queries, k=4).collect()))
    assert got == sorted(map(tuple, full.lsh_topk(queries, k=4).collect()))


def test_outdate_invalidates_shrunk_registered_index(spark, sf_dir, tmp_path):
    """ADVICE r7 #4 (r9 semantics): retention deletes can't remove appended
    index entries, so an outdate() that may have purged live rows (here:
    cutoff landing inside the occupied bucket 0) flips registered indexes
    STALE — probes raise instead of serving purged ids. Decided from the
    commit's own facts; corpus_fn is never called (see
    test_round9_ops.test_outdate_launches_no_corpus_jobs)."""
    emb = load_table(spark, sf_dir, "embeddings").limit(40)
    store = AnnIndexStore(spark, str(tmp_path / "idx"))
    store.write_lsh(emb)
    db = HelixSpark.open(
        spark,
        str(tmp_path / "db"),
        HelixOptions(rick_range=10, outdate_range=1 << 30, auto_maintain=False),
    )
    db.register_index(store, "lsh", lambda _db: emb)
    db.put([(5, b"k", b"v")])
    db.outdate(3)
    assert store._state["indexes"]["lsh"].get("stale")
    assert not store.validate("lsh", emb.limit(20))
    with pytest.raises(StaleIndexError):
        store.read_lsh("lsh")
    # the maintenance loop skips (never appends to) a stale index
    db._refresh_indexes()
    assert store._state["indexes"]["lsh"].get("stale")
    db.close()


# --------------------------------------------- state-log torn-read retry
def test_load_state_retries_once_on_torn_log(spark, tmp_path):
    """ADVICE r7 #2: a reader that lists a log whose base checkpoint a
    concurrent writer GC'd must re-list once and succeed instead of
    failing the open."""
    base = str(tmp_path / "kv")
    db = HelixSpark.open(
        spark, base, HelixOptions(rick_range=100, auto_maintain=False)
    )
    for t in range(3):
        db.put([(t, b"k%d" % t, b"v")])
    db.close()

    from helixdb_spark.fsio import EngineFS

    real = EngineFS.read_pointer_log
    calls = {"n": 0}

    def torn_once(self, p):
        log = real(self, p)
        calls["n"] += 1
        if calls["n"] == 1 and len(log) > 1:
            return log[1:]  # base checkpoint "GC'd" mid-list
        return log

    import unittest.mock as mock

    with mock.patch.object(EngineFS, "read_pointer_log", torn_once):
        db2 = HelixSpark.open(
            spark, base, HelixOptions(rick_range=100, auto_maintain=False)
        )
        assert calls["n"] >= 2  # first fold failed, retry succeeded
        assert db2.get(1, b"k1") == b"v"
        db2.close()

    # a PERSISTENTLY broken log still fails closed
    def torn_always(self, p):
        log = real(self, p)
        return log[1:] if len(log) > 1 else log

    with mock.patch.object(EngineFS, "read_pointer_log", torn_always):
        with pytest.raises(RuntimeError):
            HelixSpark.open(
                spark, base, HelixOptions(rick_range=100, auto_maintain=False)
            )


# ----------------------------------------- recursive corpus fingerprints
def test_fingerprint_sees_nested_partition_rewrites(tmp_path):
    """ADVICE r7 #1: rewriting a file nested in a partition subdir must
    change the fingerprint even when the parent dir's stat triple and the
    row count do not."""
    root = tmp_path / "corpus"
    part = root / "day=1"
    part.mkdir(parents=True)
    f = part / "part-0.parquet"
    f.write_bytes(b"aaaa")
    os.utime(part, (1_000_000_000, 1_000_000_000))
    fp1 = source_fingerprint(str(root))
    f.write_bytes(b"bbbb")  # same size possible; force distinct mtime
    os.utime(f, (1_000_000_777, 1_000_000_777))
    os.utime(part, (1_000_000_000, 1_000_000_000))  # parent stat unchanged
    fp2 = source_fingerprint(str(root))
    assert fp1 != fp2


# ------------------------------------- pinned Spark watermark assumption
def test_watermark_does_not_drop_late_rows_on_this_build(spark, tmp_path):
    """ADVICE r7 #3: stream_watermark_close's oracle relies on this
    build's (allowed but not guaranteed) behavior that beyond-watermark
    input is still aggregated. Pin it: if a Spark upgrade starts dropping
    those rows, THIS test fails loudly and the graded oracle must move to
    the guaranteed-direction form."""
    import glob
    import shutil

    src = tmp_path / "stream"
    src.mkdir()
    base = 1_700_000_000
    early = spark.createDataFrame(
        [(base + 2 * 86400,)], "sec long"
    ).select(F.timestamp_seconds("sec").alias("ts"))
    late = spark.createDataFrame([(base,)], "sec long").select(
        F.timestamp_seconds("sec").alias("ts")
    )  # 2 days BEFORE batch-0 max -> beyond a 1h watermark
    for i, df in enumerate((early, late)):
        tmp = tmp_path / f"w{i}"
        df.coalesce(1).write.mode("overwrite").parquet(str(tmp))
        part = glob.glob(f"{tmp}/part-*.parquet")[0]
        dst = src / f"{chr(97 + i)}.parquet"
        shutil.move(part, str(dst))
        os.utime(str(dst), (1_000_000_000 + i, 1_000_000_000 + i))
    schema = spark.read.parquet(str(src)).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    agg = stream.withWatermark("ts", "1 hour").groupBy(
        F.window("ts", "1 hour").alias("win")
    ).agg(F.count("*").alias("n"))
    name = "wm_pin_out"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    progress = list(q.recentProgress)
    q.stop()
    rows = spark.table(name).count()
    # both windows present: the beyond-watermark row was still aggregated
    assert rows == 2, (
        "Spark now drops beyond-watermark rows: move the "
        "stream_watermark_close oracle to the guaranteed-direction form"
    )
    drops = sum(
        (so.get("numRowsDroppedByWatermark") or 0)
        for p in progress
        for so in (p.get("stateOperators") or [])
    )
    assert drops == 0


def test_lpa_driver_and_distributed_paths_identical(spark, monkeypatch):
    import helixdb_spark.operators.graph as G

    # two triangles bridged by one edge: LPA should keep two communities
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (10, 11), (11, 12), (12, 10), (2, 10)],
        "src int, dst int",
    )
    fast = sorted(map(tuple, G.label_propagation(edges, rounds=4).collect()))
    monkeypatch.setattr(G, "SMALL_GRAPH_DRIVER_NODES", 0)
    slow = sorted(map(tuple, G.label_propagation(edges, rounds=4).collect()))
    assert fast == slow
    # label domain sanity: every endpoint labeled, labels are node ids
    nodes = {t[0] for t in fast}
    assert nodes == {0, 1, 2, 10, 11, 12}
    assert {t[1] for t in fast} <= nodes


# --------------------------- round-8 continuation: new operator units ----
def test_link_prediction_scores_hand_graph(spark):
    """Path graph 1-2-3 plus 2-4: non-adjacent pairs through center 2
    (deg 3) and the leaf wedges. AA(1,3)=AA(1,4)=AA(3,4)=1/ln(3); no
    adjacent pair appears; common-neighbor counts are exact."""
    import math

    from helixdb_spark.operators.graph import link_prediction_scores

    und = spark.createDataFrame(
        [(1, 2), (2, 3), (2, 4)], "a int, b int"
    )
    got = {
        (r["a"], r["b"]): (r["common_neighbors"], r["adamic_adar"])
        for r in link_prediction_scores(und).collect()
    }
    expect_aa = round(1e-9 + round(1e-9 + 1e9 / math.log(3)) / 1e9, 6)
    assert set(got) == {(1, 3), (1, 4), (3, 4)}
    assert all(v == (1, expect_aa) for v in got.values())


def test_link_prediction_excludes_adjacent_and_handles_squares(spark):
    """4-cycle 1-2-3-4-1: diagonals (1,3) and (2,4) each share TWO
    degree-2 neighbors -> cn=2, aa=2/ln(2); edges themselves never
    predicted."""
    import math

    from helixdb_spark.operators.graph import link_prediction_scores

    und = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 4)], "a int, b int"
    )
    rows = {
        (r["a"], r["b"]): (r["common_neighbors"], r["adamic_adar"])
        for r in link_prediction_scores(und).collect()
    }
    per_wedge = round(1e-9 + 1e9 / math.log(2))
    expect = round(1e-9 + 2 * per_wedge / 1e9, 6)
    assert rows == {(1, 3): (2, expect), (2, 4): (2, expect)}


def test_knn_graph_matches_per_vector_probe(spark, sf_dir):
    """The corpus kNN graph restricted to one vector equals lsh_topk
    probing that vector (minus the self hit) — same buckets, same scores,
    same tie-breaks."""
    from helixdb_spark.operators import similarity as sim
    from helixdb_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    g = sim.knn_graph(emb, k=3)
    probe_vec = emb.where(F.col("vec_id") == 7).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    probe = sim.lsh_topk(emb, probe_vec, k=4)  # self lands at rk 1
    got = [
        (r["neighbor_id"], r["cosine"])
        for r in g.where(F.col("src") == 7).orderBy("rk").collect()
    ]
    want = [
        (r["neighbor_id"], r["cosine"])
        for r in probe.orderBy("rk").collect()
        if r["neighbor_id"] != 7
    ]
    assert got == want[: len(got)] and len(got) == 3


def test_audio_vad_segments_threshold_edges(spark, monkeypatch):
    """Islands merge correctly and silent docs survive with zeros: force
    the threshold so doc windows alternate active/inactive predictably."""
    from helixdb_spark.operators import multimodal as mm

    media = spark.createDataFrame([(0,), (1,)], "doc_id long")
    # threshold below any possible RMS -> every window active, one segment
    all_on = {
        r["doc_id"]: (r["n_segments"], r["active_windows"], r["longest_run"])
        for r in mm.audio_vad_segments(media, threshold=-1.0).collect()
    }
    n_win = mm.AUDIO_N_SAMPLES // mm.VAD_WINDOW
    assert all_on == {0: (1, n_win, n_win), 1: (1, n_win, n_win)}
    # threshold above any possible RMS -> zero segments, docs retained
    all_off = {
        r["doc_id"]: (r["n_segments"], r["active_windows"], r["longest_run"])
        for r in mm.audio_vad_segments(media, threshold=1e9).collect()
    }
    assert all_off == {0: (0, 0, 0), 1: (0, 0, 0)}


def test_knn_refine_hits_monotone(spark):
    """knn_graph_refine's candidate set contains the previous edges, so
    per-node top-k can only improve in cosine order — overlap with the
    exact graph never shrinks round over round (tiny sf0.001 corpus)."""
    from helixdb_spark.operators import similarity as sim
    from helixdb_spark.sources import load_table
    from pyspark.sql.window import Window as W

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    base = sim.knn_graph(emb, k=3)
    g1 = sim.knn_graph_refine(emb, base, k=3)
    a = emb.select(F.col("vec_id").alias("src"), F.col("embedding").alias("_a"))
    b = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("_b")
    )
    from helixdb_spark.functions.vector import cosine_similarity

    w = W.partitionBy("src").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    exact = (
        a.join(F.broadcast(b), F.col("src") != F.col("neighbor_id"))
        .withColumn(
            "cosine",
            F.round(F.lit(1e-9) + cosine_similarity(F.col("_a"), F.col("_b")), 6),
        )
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select("src", "neighbor_id")
    )

    def hits(g):
        return g.select("src", "neighbor_id").join(
            exact, ["src", "neighbor_id"], "left_semi"
        ).count()

    assert hits(g1) >= hits(base)


def test_jl_distortion_is_a_contraction_audit(spark, sf_dir):
    """The JL audit's pair count is exactly C(|sample|, 2) (no pair lost to
    a zero original distance in this corpus) and mean <= max."""
    from helixdb_spark.plans.pipeline import (
        JL_SAMPLE_MOD,
        emb_jl_distortion,
    )
    from helixdb_spark.sources import load_table

    n = (
        load_table(spark, sf_dir, "embeddings")
        .where(F.col("vec_id") % JL_SAMPLE_MOD == 0)
        .count()
    )
    row = emb_jl_distortion(spark, sf_dir).collect()[0]
    assert row["n_pairs"] == n * (n - 1) // 2
    assert 0.0 <= row["mean_distortion"] <= row["max_distortion"]


def test_harmonic_centrality_path_graph(spark):
    """Path 1-2-3-4 with max_hops=2: ends reach 2 nodes (1 + 1/2), middles
    reach 3 (1 + 1 + 1/2); the d=3 pair (1,4) is beyond the horizon and
    contributes nothing."""
    from helixdb_spark.operators.graph import harmonic_centrality

    und = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "a int, b int"
    )
    got = {
        r["node"]: (r["n_reached"], r["harmonic"])
        for r in harmonic_centrality(und, max_hops=2).collect()
    }
    assert got == {
        1: (2, 1.5),
        2: (3, 2.5),
        3: (3, 2.5),
        4: (2, 1.5),
    }


def test_harmonic_centrality_horizon_extends(spark):
    """Same path with max_hops=3: the (1,4) pair now settles at d=3 and
    adds round(1e9/3)/1e9 to each end."""
    from helixdb_spark.operators.graph import harmonic_centrality

    und = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "a int, b int"
    )
    got = {
        r["node"]: (r["n_reached"], r["harmonic"])
        for r in harmonic_centrality(und, max_hops=3).collect()
    }
    third = round(1e-9 + round(1e-9 + 1e9 / 3) / 1e9, 6)
    assert got[1] == (3, round(1.5 + third, 6))
    assert got[4] == (3, round(1.5 + third, 6))
    assert got[2] == (3, 2.5) and got[3] == (3, 2.5)


def test_split_assignment_keys_on_content_not_id(spark):
    """Byte-identical text must land in the same split regardless of
    doc_id — the leakage rule curate_split_assignment exists to enforce
    (splitting by id would let a re-crawl of a train doc into test)."""
    from helixdb_spark.functions.text import normalized_text
    from helixdb_spark.plans.pipeline import SPLIT_BOUNDS

    docs = spark.createDataFrame(
        [(1, "The exact same sentence."), (999, "The exact same sentence."),
         (2, "A different one entirely.")],
        "doc_id long, text string",
    )
    pct = (
        F.conv(F.substring(F.md5(normalized_text(F.col("text"))), 1, 12), 16, 10)
        .cast("long") % 100
    )
    split = (
        F.when(pct < SPLIT_BOUNDS[0], "train")
        .when(pct < SPLIT_BOUNDS[1], "val")
        .otherwise("test")
    )
    got = {r["doc_id"]: r["s"] for r in docs.select("doc_id", split.alias("s")).collect()}
    assert got[1] == got[999]  # same content, different ids -> same split
