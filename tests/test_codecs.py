"""Codec roundtrips — parity with the reference's UDCF test
(reference src/fn_registry.rs:203-221; FIXTURES.md F3): compress→decompress
is identity and preserves order."""

import pytest

from helixdb_spark.codecs import ARRAY_CODEC, Codec, CodecRegistry

PAIRS = [
    (1, b"value1"),
    (2, b"value2"),
    (3, b"value3"),
    (4, b"value2"),
    (5, b"value1"),
    (6, b""),
]


@pytest.mark.parametrize("name", ["noop", "delta_zlib"])
def test_roundtrip(name):
    reg = CodecRegistry()
    codec = reg.get(name)
    blob = codec.compress(b"key", PAIRS)
    assert codec.decompress(b"key", blob) == PAIRS


def test_delta_zlib_compresses_repetitive_series():
    reg = CodecRegistry()
    pairs = [(i, b"x" * 100) for i in range(1000)]
    blob = reg.get("delta_zlib").compress(b"k", pairs)
    raw = reg.get("noop").compress(b"k", pairs)
    assert len(blob) < len(raw) / 5


def test_dispatch_default_and_custom():
    reg = CodecRegistry()
    assert reg.dispatch(b"anything") == ARRAY_CODEC
    reg.register_dispatch(lambda k: "noop" if k.startswith(b"blob:") else ARRAY_CODEC)
    assert reg.dispatch(b"blob:x") == "noop"
    assert reg.dispatch(b"plain") == ARRAY_CODEC


def test_array_name_reserved():
    reg = CodecRegistry()
    with pytest.raises(ValueError):
        reg.register(Codec(ARRAY_CODEC, lambda k, p: b"", lambda k, b: []))
