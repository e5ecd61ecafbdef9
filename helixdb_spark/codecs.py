"""UDCF codec registry — the reference's user-pluggable per-key time-series
compression (reference src/fn_registry.rs:8-55, README.md:14-15 "Custom
Compression").

Semantics ported:

- ``compress(key, [(ts, value), ...]) -> bytes`` (fn_registry.rs:8-12)
- ``decompress(key, bytes) -> [(ts, value), ...]`` (fn_registry.rs:14-16)
- ``dispatch(key) -> codec_name`` — per-key codec choice (fn_registry.rs:46-49)

Spark-first twist (SURVEY.md §7.2): the **default codec stores no blob at
all** — the compacted chunk stays a native ``array<struct<ts,value>>`` column
so Parquet's own encodings + min/max stats keep working and the read path
needs no Python. Blob codecs are the extension point for genuinely custom
compression; they run inside Arrow-batched pandas UDFs (never per-row
Python), so at 100 TB the codec cost is per-group vectorized work that scales
with executors.

Formats here are original to this engine (the reference's noop layout at
fn_registry.rs:124-197 is NOT copied; ours is a different, simpler framing).
"""

from __future__ import annotations

import struct
import zlib
from dataclasses import dataclass
from typing import Callable

Pairs = list[tuple[int, bytes]]

ARRAY_CODEC = "array"  # sentinel: native array<struct> storage, no blob


@dataclass(frozen=True)
class Codec:
    name: str
    compress: Callable[[bytes, Pairs], bytes]
    decompress: Callable[[bytes, bytes], Pairs]


def _noop_compress(key: bytes, pairs: Pairs) -> bytes:
    """Framing: u32 count, then per entry: i64 ts, u32 len, value bytes."""
    out = [struct.pack("<I", len(pairs))]
    for ts, value in pairs:
        out.append(struct.pack("<qI", ts, len(value)))
        out.append(bytes(value))
    return b"".join(out)


def _noop_decompress(key: bytes, blob: bytes) -> Pairs:
    (count,) = struct.unpack_from("<I", blob, 0)
    off = 4
    pairs: Pairs = []
    for _ in range(count):
        ts, vlen = struct.unpack_from("<qI", blob, off)
        off += 12
        pairs.append((ts, blob[off : off + vlen]))
        off += vlen
    return pairs


def _delta_zlib_compress(key: bytes, pairs: Pairs) -> bytes:
    """Delta-encode timestamps (sorted series compress well) + zlib values."""
    ts_deltas = []
    prev = 0
    for ts, _ in pairs:
        ts_deltas.append(ts - prev)
        prev = ts
    header = struct.pack("<I", len(pairs)) + struct.pack(f"<{len(pairs)}q", *ts_deltas)
    body = _noop_compress(key, [(0, v) for _, v in pairs])
    return header + zlib.compress(body, level=6)


def _delta_zlib_decompress(key: bytes, blob: bytes) -> Pairs:
    (count,) = struct.unpack_from("<I", blob, 0)
    deltas = struct.unpack_from(f"<{count}q", blob, 4)
    body = zlib.decompress(blob[4 + 8 * count :])
    values = [v for _, v in _noop_decompress(key, body)]
    pairs: Pairs = []
    acc = 0
    for d, v in zip(deltas, values):
        acc += d
        pairs.append((acc, v))
    return pairs


def _ts_delta_xor_compress(key: bytes, pairs: Pairs) -> bytes:
    """Gorilla-style series codec (Pelkonen et al., VLDB'15 — the
    byte-aligned variant): timestamps as zigzag-varint deltas, values as
    XOR against the previous value with leading/trailing zero BYTES
    elided (one control byte: 4-bit lead count, 4-bit significant
    length). Requires fixed 8-byte values — the natural payload of a
    metrics store (f64 bits or a scaled int64); slowly-varying series
    XOR to mostly-zero bytes and collapse. The reference exposes exactly
    this extension point as its UDCF pair (fn_registry.rs:8-16); format
    here is original."""
    out = bytearray(struct.pack("<I", len(pairs)))
    prev_ts = 0
    prev_v = b"\x00" * 8
    for ts, value in pairs:
        value = bytes(value)
        if len(value) != 8:
            raise ValueError(
                f"ts_delta_xor needs 8-byte values, got {len(value)} "
                f"(route this key to another codec in dispatch)"
            )
        # zigzag varint of the ts delta
        d = ts - prev_ts
        prev_ts = ts
        z = (d << 1) ^ (d >> 63) if d >= 0 else ((-d) << 1) - 1
        while z >= 0x80:
            out.append((z & 0x7F) | 0x80)
            z >>= 7
        out.append(z)
        x = bytes(a ^ b for a, b in zip(value, prev_v))
        prev_v = value
        lead = 0
        while lead < 8 and x[lead] == 0:
            lead += 1
        tail = 8
        while tail > lead and x[tail - 1] == 0:
            tail -= 1
        out.append((lead << 4) | (tail - lead))
        out.extend(x[lead:tail])
    return bytes(out)


def _ts_delta_xor_decompress(key: bytes, blob: bytes) -> Pairs:
    (count,) = struct.unpack_from("<I", blob, 0)
    off = 4
    pairs: Pairs = []
    ts = 0
    prev_v = b"\x00" * 8
    for _ in range(count):
        z, shift = 0, 0
        while True:
            b = blob[off]
            off += 1
            z |= (b & 0x7F) << shift
            if b < 0x80:
                break
            shift += 7
        d = (z >> 1) if (z & 1) == 0 else -((z + 1) >> 1)
        ts += d
        ctrl = blob[off]
        off += 1
        lead, sig = ctrl >> 4, ctrl & 0x0F
        x = b"\x00" * lead + blob[off : off + sig] + b"\x00" * (8 - lead - sig)
        off += sig
        v = bytes(a ^ b for a, b in zip(x, prev_v))
        prev_v = v
        pairs.append((ts, v))
    return pairs


class CodecRegistry:
    """Engine-level registry mirroring ``FnRegistry`` (fn_registry.rs:57-113).

    ``dispatch`` maps a user key to a codec name (default: everything to the
    native array codec). Registered via :meth:`register_dispatch`.
    """

    def __init__(self) -> None:
        self._codecs: dict[str, Codec] = {}
        self._dispatch: Callable[[bytes], str] = lambda key: ARRAY_CODEC
        # False until register_dispatch: with the default dispatch every key
        # stores natively, so the engine's compact/read paths can skip the
        # pandas-UDF stages entirely (pure-JVM plans — no Python workers)
        self.custom_dispatch = False
        self.register(Codec("noop", _noop_compress, _noop_decompress))
        self.register(Codec("delta_zlib", _delta_zlib_compress, _delta_zlib_decompress))
        self.register(
            Codec("ts_delta_xor", _ts_delta_xor_compress, _ts_delta_xor_decompress)
        )

    def register(self, codec: Codec) -> None:
        if codec.name == ARRAY_CODEC:
            raise ValueError(f"'{ARRAY_CODEC}' is reserved for native storage")
        self._codecs[codec.name] = codec

    def register_dispatch(self, fn: Callable[[bytes], str]) -> None:
        self._dispatch = fn
        self.custom_dispatch = True

    def dispatch(self, key: bytes) -> str:
        return self._dispatch(key)

    def get(self, name: str) -> Codec:
        return self._codecs[name]

    def names(self) -> list[str]:
        return sorted(self._codecs)
