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
