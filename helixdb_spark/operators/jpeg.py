"""Pure-Python/numpy baseline JPEG codec (round 10).

Closes the last native-decode gap of ``multimodal.decode_image``: BMP,
PPM and PNG decode natively since r6-r10; JPEG — the format most real
image corpora actually ship — previously required an injected decoder or
PIL. This module implements the baseline sequential DCT process of
ITU-T T.81 (JFIF): 8-bit samples, Huffman entropy coding, YCbCr with
4:4:4 or 4:2:0 subsampling, restart markers tolerated. Progressive,
arithmetic-coded, 12-bit and hierarchical modes raise
NotImplementedError (the decode_bmp/decode_png guard discipline).

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


def _huff_decode_tables(bits, values):
    """(length, code) -> symbol."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
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
                raise _EndOfScan()
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
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
def encode_jpeg(
    arr,
    quality: int = 90,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Encode an H×W×3 RGB (or H×W grayscale) uint8 array as a baseline
    JFIF JPEG: standard Annex K tables scaled by ``quality``,
    4:4:4 (or 4:2:0 when ``subsample``) YCbCr, Huffman entropy coding
    with byte stuffing; ``restart_interval`` > 0 emits DRI + RSTn markers
    every N MCUs (the error-resilience feature most camera JPEGs carry —
    and the decoder path's test vector). Output decodes in any standard
    reader."""
    import numpy as np

    arr = np.asarray(arr, dtype=np.uint8)
    gray = arr.ndim == 2
    h, w = arr.shape[0], arr.shape[1]
    if gray:
        planes = [arr.astype(np.float64) - 128.0]
    else:
        r = arr[:, :, 0].astype(np.float64)
        g = arr[:, :, 1].astype(np.float64)
        b = arr[:, :, 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            # 2x2 average over an edge-replicated even grid
            def down(p):
                pe = np.pad(p, ((0, h % 2), (0, w % 2)), mode="edge")
                return (
                    pe[0::2, 0::2] + pe[1::2, 0::2]
                    + pe[0::2, 1::2] + pe[1::2, 1::2]
                ) / 4.0
            planes = [y - 128.0, down(cb) - 128.0, down(cr) - 128.0]
        else:
            planes = [y - 128.0, cb - 128.0, cr - 128.0]

    qt = _scaled_qtables(quality)
    C = _dct_matrix()
    zz = np.array(ZIGZAG)
    dc_tabs = [_huff_encode_tables(*HUFF_DC_LUMA),
               _huff_encode_tables(*HUFF_DC_CHROMA)]
    ac_tabs = [_huff_encode_tables(*HUFF_AC_LUMA),
               _huff_encode_tables(*HUFF_AC_CHROMA)]

    n_comp = 1 if gray else 3
    if gray:
        sampling = [(1, 1)]
    elif subsample:
        sampling = [(2, 2), (1, 1), (1, 1)]
    else:
        sampling = [(1, 1), (1, 1), (1, 1)]
    maxh = max(s[0] for s in sampling)
    maxv = max(s[1] for s in sampling)
    mcux = -(-w // (8 * maxh))
    mcuy = -(-h // (8 * maxv))

    # pad each plane to its MCU-aligned size (edge replicate)
    padded = []
    for ci, p in enumerate(planes):
        ph = mcuy * 8 * sampling[ci][1] // 1
        pw = mcux * 8 * sampling[ci][0] // 1
        padded.append(
            np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])),
                   mode="edge")
        )

    def block_coeffs(p, by, bx, qtab):
        blk = p[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
        coef = C @ blk @ C.T
        q = np.round(coef / qtab.reshape(8, 8)).astype(np.int64)
        return q.reshape(64)[zz]

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
                        zc = block_coeffs(
                            padded[ci], my * sv + by, mx * sh + bx,
                            qt[0] if ci == 0 else qt[1],
                        )
                        diff = int(zc[0]) - pred[ci]
                        pred[ci] = int(zc[0])
                        size, code = _magnitude(diff)
                        hc, hl = dc_tabs[tsel][size]
                        bw.write(hc, hl)
                        if size:
                            bw.write(code, size)
                        run = 0
                        for k in range(1, 64):
                            v = int(zc[k])
                            if v == 0:
                                run += 1
                                continue
                            while run > 15:
                                hc, hl = ac_tabs[tsel][0xF0]  # ZRL
                                bw.write(hc, hl)
                                run -= 16
                            size, code = _magnitude(v)
                            hc, hl = ac_tabs[tsel][(run << 4) | size]
                            bw.write(hc, hl)
                            bw.write(code, size)
                            run = 0
                        if run:
                            hc, hl = ac_tabs[tsel][0x00]  # EOB
                            bw.write(hc, hl)
    bw.flush()

    # ------- marker segments
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
    out += seg(0xFFC0, sof)
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
    sos = bytes([n_comp])
    for ci in range(n_comp):
        t = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (t << 4) | t])
    sos += b"\x00\x3f\x00"
    out += seg(0xFFDA, sos)
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------- decoder
def decode_jpeg(payload: bytes):
    """Decode a baseline sequential JFIF JPEG to an H×W×3 RGB uint8 array
    (grayscale broadcasts): marker walk (DQT/SOF0/DHT/SOS/DRI), Huffman
    MCU decode with byte unstuffing and restart-marker resets, dequantize,
    inverse zigzag, IDCT, chroma upsample (nearest), YCbCr→RGB, clip.
    Progressive (SOF2), arithmetic (SOF9+), 12-bit, and non-1/3-component
    frames raise NotImplementedError (valid but unsupported — decode_image
    falls through to an injected decoder / PIL); truncated or foreign
    payloads raise a clean ValueError, never a raw IndexError."""
    import struct as _struct

    try:
        return _decode_jpeg(payload)
    except (IndexError, _struct.error) as e:
        # marker walk ran off the end of a cropped header segment
        raise ValueError("truncated or corrupt JPEG") from e


def _decode_jpeg(payload: bytes):
    import numpy as np

    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qtabs: dict = {}
    huff_dc: dict = {}
    huff_ac: dict = {}
    comps = None
    h = w = None
    restart_interval = 0
    scan_pos = None
    scan_comps = None
    while pos < len(payload):
        if payload[pos] != 0xFF:
            pos += 1
            continue
        marker = payload[pos + 1]
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
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise NotImplementedError("12-bit JPEG")
            if nc not in (1, 3):
                # valid-but-unsupported layouts (4-component Adobe
                # CMYK/YCCK, 2-component) — NotImplementedError so
                # decode_image falls through to an injected decoder / PIL
                raise NotImplementedError(
                    f"JPEG with {nc} components (only 1/3 supported)"
                )
            comps = []
            for i in range(nc):
                cid, samp, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append(
                    {"id": cid, "h": samp >> 4, "v": samp & 0xF, "tq": tq}
                )
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
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
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan_comps = []
            for i in range(ns):
                cs, tt = body[1 + 2 * i : 3 + 2 * i]
                scan_comps.append({"id": cs, "dc": tt >> 4, "ac": tt & 0xF})
            scan_pos = pos
            break
    if comps is None or scan_pos is None:
        raise ValueError("JPEG payload missing SOF/SOS")

    maxh = max(c["h"] for c in comps)
    maxv = max(c["v"] for c in comps)
    mcux = -(-w // (8 * maxh))
    mcuy = -(-h // (8 * maxv))
    for c in comps:
        c["cols"] = mcux * c["h"]
        c["rows"] = mcuy * c["v"]
        c["plane"] = np.zeros((c["rows"] * 8, c["cols"] * 8))
        sc = next(s for s in scan_comps if s["id"] == c["id"])
        c["dct"] = huff_dc[sc["dc"]]
        c["act"] = huff_ac[sc["ac"]]

    C = _dct_matrix()
    zz = np.array(ZIGZAG)
    br = _BitReader(payload, scan_pos)

    def read_symbol(table) -> int:
        length, code = 0, 0
        while length < 16:
            code = (code << 1) | br.read_bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in scan")

    pred = {c["id"]: 0 for c in comps}
    mcu_count = 0
    try:
        for my in range(mcuy):
            for mx in range(mcux):
                if restart_interval and mcu_count and (
                    mcu_count % restart_interval == 0
                ):
                    br.sync_restart()  # RSTn sits BETWEEN MCUs (T.81 E.1.4)
                    pred = {c["id"]: 0 for c in comps}
                for c in comps:
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            zc = np.zeros(64, dtype=np.int64)
                            size = read_symbol(c["dct"])
                            diff = _extend(br.receive(size), size)
                            pred[c["id"]] += diff
                            zc[0] = pred[c["id"]]
                            k = 1
                            while k < 64:
                                rs = read_symbol(c["act"])
                                if rs == 0x00:  # EOB
                                    break
                                if rs == 0xF0:  # ZRL
                                    k += 16
                                    continue
                                k += rs >> 4
                                sz = rs & 0xF
                                zc[k] = _extend(br.receive(sz), sz)
                                k += 1
                            blk = np.zeros(64)
                            blk[zz] = zc
                            coef = blk.reshape(8, 8) * qtabs[c["tq"]]
                            sp = C.T @ coef @ C
                            r0 = (my * c["v"] + by) * 8
                            c0 = (mx * c["h"] + bx) * 8
                            c["plane"][r0 : r0 + 8, c0 : c0 + 8] = sp
                mcu_count += 1
    except _EndOfScan as e:
        # a real marker mid-MCU means the entropy stream ended before the
        # frame's MCU grid was filled — truncated or foreign payload
        raise ValueError("truncated JPEG scan") from e

    # upsample + color convert
    out_planes = []
    for c in comps:
        p = c["plane"] + 128.0
        ry, rx = maxv // c["v"], maxh // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        out_planes.append(p[:h, :w])
    if len(out_planes) == 1:
        yv = np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
        return np.ascontiguousarray(np.repeat(yv[:, :, None], 3, axis=2))
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
