"""Property-based tests (hypothesis) — an addition over the reference, which
has only example-based inline tests (SURVEY.md §5).

Spark-backed properties keep example counts small (a Spark job per example);
the pure-Python codec properties run at full default example counts.
"""

from __future__ import annotations

import tempfile

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from helixdb_spark.codecs import CodecRegistry
from helixdb_spark.engine import HelixOptions, HelixSpark

# ------------------------------------------------------------------ codecs
pairs_st = st.lists(
    st.tuples(
        st.integers(min_value=-(2**40), max_value=2**40),
        st.binary(min_size=0, max_size=64),
    ),
    min_size=0,
    max_size=50,
)


@pytest.mark.parametrize("name", ["noop", "delta_zlib"])
@given(pairs=pairs_st)
@settings(max_examples=200, deadline=None)
def test_codec_roundtrip_property(name, pairs):
    codec = CodecRegistry().get(name)
    blob = codec.compress(b"k", pairs)
    assert codec.decompress(b"k", blob) == pairs


# ------------------------------------------------------------------ engine
entries_st = st.dictionaries(
    keys=st.tuples(
        st.integers(min_value=0, max_value=499),
        st.binary(min_size=1, max_size=8),
    ),
    values=st.binary(min_size=0, max_size=16),
    min_size=1,
    max_size=40,
)


@given(entries=entries_st, compact_split=st.integers(min_value=0, max_value=499))
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_put_compact_scan_roundtrip_property(spark, entries, compact_split):
    """For any (ts,key)-unique batch and any compaction split point:
    scan(full range) returns exactly the input set, before and after
    compaction (compaction transparency, reference src/level.rs:823-875)."""
    base = tempfile.mkdtemp(prefix="helix_prop_")
    import atexit, shutil

    atexit.register(shutil.rmtree, base, ignore_errors=True)
    db = HelixSpark.open(
        spark,
        base,
        HelixOptions(rick_range=100, outdate_range=1 << 40, auto_maintain=False),
    )
    rows = [(ts, key, val) for (ts, key), val in entries.items()]
    db.put(rows)

    expected = {(ts, key, val) for ts, key, val in rows}

    def scanned_set():
        return {
            (r["ts"], bytes(r["key"]), bytes(r["value"]))
            for r in db.scan((0, 499)).collect()
        }

    assert scanned_set() == expected
    db.compact(0, compact_split)
    assert scanned_set() == expected
    # point gets agree with the set, including a guaranteed miss
    ts0, key0, val0 = rows[0]
    assert db.get(ts0, key0) == val0
    assert db.get(ts0, b"\x00missing\xff") is None
    db.close()


# ------------------------------------------- mutation-sequence property
_op_st = st.one_of(
    st.tuples(st.just("put"), entries_st),
    st.tuples(
        st.just("compact"),
        st.tuples(
            st.integers(min_value=0, max_value=499),
            st.integers(min_value=0, max_value=499),
        ),
    ),
    st.tuples(st.just("outdate"), st.integers(min_value=0, max_value=400)),
    st.tuples(st.just("rollback"), st.none()),
)


@given(ops=st.lists(_op_st, min_size=2, max_size=6))
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_mutation_sequence_matches_model(spark, ops):
    """Any interleaving of put / compact / outdate / rollback agrees with
    a trivial last-write-wins + retention model. Exercises the generation-manifest
    commit across MULTIPLE compactions (gen chains, bucket re-merges) and
    the cutoff/manifest interplay — the state space the example tests
    can't enumerate."""
    base = tempfile.mkdtemp(prefix="helix_prop_seq_")
    import atexit, shutil

    atexit.register(shutil.rmtree, base, ignore_errors=True)
    db = HelixSpark.open(
        spark,
        base,
        HelixOptions(
            rick_range=100,
            outdate_range=1 << 40,
            auto_maintain=False,
            keep_generations=2,
        ),
    )
    model: dict[tuple[int, bytes], bytes] = {}
    cutoff = None
    for kind, arg in ops:
        if kind == "put":
            rows = [(ts, key, val) for (ts, key), val in arg.items()]
            db.put(rows)
            for ts, key, val in rows:
                model[(ts, key)] = val  # overwrite: highest seq wins
        elif kind == "compact":
            lo, hi = min(arg), max(arg)
            db.compact(lo, hi)
        elif kind == "outdate":
            db.outdate(arg)
            cutoff = arg if cutoff is None else max(cutoff, arg)
        else:
            # compaction is logically transparent, so its rollback is a
            # logical no-op too — under ANY interleaving with puts and
            # retention (the outdate cutoff lives in state, not in the
            # rolled-back manifest, and the read path re-applies it to
            # whatever directories the restore resurrects). The model
            # therefore doesn't change; only the physical layout does.
            db.rollback_compaction()

    expected = {
        (ts, key, val)
        for (ts, key), val in model.items()
        if cutoff is None or ts > cutoff
    }
    got = {
        (r["ts"], bytes(r["key"]), bytes(r["value"]))
        for r in db.scan((0, 499)).collect()
    }
    assert got == expected
    db.close()
