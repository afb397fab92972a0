"""Baseline sequential JPEG codec — pure numpy + stdlib, zero external
codec libraries (r4 verdict ask #8: un-stub the third modality).

Decoder (`decode_jpeg`): ITU-T T.81 baseline sequential DCT, 8-bit,
grayscale or YCbCr, any sampling factors (4:4:4 / 4:2:2 / 4:2:0 …),
restart intervals, 0xFF00 byte stuffing. Entropy decoding is a canonical
Huffman walk over a Python bit-reader (fixture-scale payloads — the
engine's mapInPandas plumbing is the scale path, not this loop); the
numeric pipeline (dequant, de-zigzag, separable IDCT, upsample, color
transform) is vectorized numpy per block/plane.

Encoder (`encode_jpeg`): the fixture twin — 4:4:4 (or grayscale),
Annex-K quantization tables with libjpeg-style quality scaling, Annex-K
Huffman tables, restart-free single scan. Exists so tests can plant
deterministic REAL baseline JPEGs with no external dependency; the
decoder is written to the spec, not to the twin (sampling-factor and
restart handling have no counterpart in the encoder).

Progressive/arithmetic/12-bit JPEGs and video containers remain declared
strict-mode stubs (multimodal._decode_image raises for them).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- constants
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)

# Annex K.1 / K.2 base quantization tables (natural order via ZIGZAG below)
_QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
_QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K.3 Huffman specs: (bits[1..16], values)
_HUFF_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HUFF_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HUFF_AC_LUMA = (
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
_HUFF_AC_CHROMA = (
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

# separable IDCT basis: M[x, u] = 0.5 * c(u) * cos((2x+1) u π / 16)
_M = np.array([
    [0.5 * (1 / np.sqrt(2) if u == 0 else 1.0)
     * np.cos((2 * x + 1) * u * np.pi / 16) for u in range(8)]
    for x in range(8)
])


def _idct2(block: np.ndarray) -> np.ndarray:
    return _M @ block @ _M.T


def _dct2(block: np.ndarray) -> np.ndarray:
    return _M.T @ block @ _M


# -------------------------------------------------------------- huffman dec
def _build_decode_table(bits: list[int], values: list[int]) -> dict[tuple[int, int], int]:
    """Canonical Huffman: {(length, code) -> symbol}."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first bit reader over entropy-coded bytes (0xFF00 already
    unstuffed by the caller)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise ValueError("JPEG entropy data truncated")
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: map an s-bit magnitude to its signed value."""
    return v if s == 0 or v >= (1 << (s - 1)) else v - (1 << s) + 1


# ------------------------------------------------------------------ decoder
def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline sequential JPEG → (h, w, 3) uint8 RGB (grayscale
    sources are replicated to 3 channels). Raises ``NotImplementedError``
    for progressive/arithmetic/12-bit streams and ``ValueError`` for
    malformed data."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> decode table
    frame = None  # (h, w, comps) where comps = [(cid, hs, vs, tq)]
    restart_interval = 0
    i = 2
    while i < len(data):
        if data[i] != 0xFF:
            raise ValueError(f"expected marker at {i}")
        marker = data[i + 1]
        i += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01, *range(0xD0, 0xD8)):  # TEM/RSTn: no payload
            continue
        (seg_len,) = struct.unpack(">H", data[i:i + 2])
        seg = data[i + 2:i + seg_len]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                p += 1
                if pq:
                    raise NotImplementedError("16-bit quantization tables")
                qt[tq] = np.frombuffer(seg[p:p + 64], dtype=np.uint8).astype(np.int64)
                p += 64
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                bits = list(seg[p + 1:p + 17])
                n = sum(bits)
                values = list(seg[p + 17:p + 17 + n])
                huff[(tc, th)] = _build_decode_table(bits, values)
                p += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = seg[0], struct.unpack(">H", seg[1:3])[0], \
                struct.unpack(">H", seg[3:5])[0], seg[5]
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + c * 3], seg[7 + c * 3], seg[8 + c * 3]
                comps.append((cid, hv >> 4, hv & 15, tq))
            frame = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF{marker - 0xC0}) — only baseline "
                "sequential (SOF0) is implemented"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF0")
            ns = seg[0]
            scan = {}
            for c in range(ns):
                cid, tt = seg[1 + c * 2], seg[2 + c * 2]
                scan[cid] = (tt >> 4, tt & 15)
            # entropy-coded bytes: unstuff FF00, stop/split at markers
            j = i + seg_len
            chunks: list[bytes] = []
            cur = bytearray()
            rst_breaks: list[int] = []
            while j < len(data):
                b = data[j]
                if b == 0xFF:
                    nxt = data[j + 1] if j + 1 < len(data) else 0xD9
                    if nxt == 0x00:
                        cur.append(0xFF)
                        j += 2
                        continue
                    if 0xD0 <= nxt <= 0xD7:  # restart marker
                        chunks.append(bytes(cur))
                        cur = bytearray()
                        j += 2
                        continue
                    break  # EOI or next segment
                cur.append(b)
                j += 1
            chunks.append(bytes(cur))
            rgb = _decode_scan(frame, scan, qt, huff, chunks, restart_interval)
            return rgb
        # else: APPn/COM and anything unknown is skipped
        i += seg_len
    raise ValueError("no SOS segment in JPEG")


def _decode_scan(frame, scan, qt, huff, chunks, restart_interval) -> np.ndarray:
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = {
        cid: np.zeros((mcuy * vs * 8, mcux * hs * 8), dtype=np.float64)
        for cid, hs, vs, _ in comps
    }
    pred = {cid: 0 for cid, *_ in comps}
    n_mcus = mcux * mcuy
    chunk_idx = 0
    reader = _BitReader(chunks[0])
    for m in range(n_mcus):
        if restart_interval and m and m % restart_interval == 0:
            chunk_idx += 1  # restart: fresh byte-aligned reader, reset preds
            if chunk_idx >= len(chunks):
                raise ValueError("missing JPEG restart segment")
            reader = _BitReader(chunks[chunk_idx])
            pred = {cid: 0 for cid, *_ in comps}
        my, mx = divmod(m, mcux)
        for cid, hs, vs, tq in comps:
            dc_tbl = huff.get((0, scan[cid][0]))
            ac_tbl = huff.get((1, scan[cid][1]))
            if dc_tbl is None or ac_tbl is None:
                raise ValueError("missing Huffman table for scan")
            q = qt[tq]
            for by in range(vs):
                for bx in range(hs):
                    zz = np.zeros(64, dtype=np.int64)
                    s = reader.decode_symbol(dc_tbl)
                    diff = _extend(reader.read_bits(s), s) if s else 0
                    pred[cid] += diff
                    zz[0] = pred[cid]
                    k = 1
                    while k < 64:
                        rs = reader.decode_symbol(ac_tbl)
                        r, ssz = rs >> 4, rs & 15
                        if ssz == 0:
                            if rs == 0xF0:  # ZRL
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("AC coefficient run overflow")
                        zz[k] = _extend(reader.read_bits(ssz), ssz)
                        k += 1
                    blk = np.zeros(64, dtype=np.float64)
                    blk[ZIGZAG] = (zz * q).astype(np.float64)
                    px = _idct2(blk.reshape(8, 8)) + 128.0
                    y0 = (my * vs + by) * 8
                    x0 = (mx * hs + bx) * 8
                    planes[cid][y0:y0 + 8, x0:x0 + 8] = px
    # upsample every component to the full-resolution grid and crop
    out = []
    for cid, hs, vs, _ in comps:
        p = planes[cid]
        if hs != hmax or vs != vmax:
            p = np.repeat(np.repeat(p, vmax // vs, axis=0), hmax // hs, axis=1)
        out.append(p[:h, :w])
    if len(out) == 1:
        g = np.clip(np.round(out[0]), 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=-1)
    y, cb, cr = out[0], out[1] - 128.0, out[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


# ------------------------------------------------------------------ encoder
def _build_encode_table(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman: {symbol -> (code, length)}."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # pad to byte with 1-bits (spec)
        return bytes(self.buf)


def _quality_scale(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * s + 50) // 100, 1, 255).astype(np.int64)


def _mag_cat(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def encode_jpeg(pixels: np.ndarray, quality: int = 90) -> bytes:
    """Encode (h, w, 3) RGB or (h, w) grayscale uint8 → baseline JPEG,
    4:4:4 sampling, Annex-K tables at libjpeg-style ``quality``."""
    gray = pixels.ndim == 2
    h, w = pixels.shape[:2]
    if gray:
        comps_px = [pixels.astype(np.float64)]
    else:
        p = pixels.astype(np.float64)
        y = 0.299 * p[..., 0] + 0.587 * p[..., 1] + 0.114 * p[..., 2]
        cb = -0.168736 * p[..., 0] - 0.331264 * p[..., 1] + 0.5 * p[..., 2] + 128
        cr = 0.5 * p[..., 0] - 0.418688 * p[..., 1] - 0.081312 * p[..., 2] + 128
        comps_px = [y, cb, cr]
    qts = [_quality_scale(_QT_LUMA, quality)]
    if not gray:
        qts.append(_quality_scale(_QT_CHROMA, quality))
    # tables are natural-order; the zigzag view divides zigzag-ordered
    # coefficient vectors (and feeds DQT emission, which is spec-zigzag)
    qts_zz = [q[ZIGZAG] for q in qts]

    dc_enc = [_build_encode_table(*_HUFF_DC_LUMA)]
    ac_enc = [_build_encode_table(*_HUFF_AC_LUMA)]
    if not gray:
        dc_enc.append(_build_encode_table(*_HUFF_DC_CHROMA))
        ac_enc.append(_build_encode_table(*_HUFF_AC_CHROMA))

    bw = _BitWriter()
    pred = [0] * len(comps_px)
    bh, bwid = -(-h // 8), -(-w // 8)
    # pad planes by edge replication to multiples of 8
    padded = [
        np.pad(c, ((0, bh * 8 - h), (0, bwid * 8 - w)), mode="edge") - 128.0
        for c in comps_px
    ]
    for by in range(bh):
        for bx in range(bwid):
            for ci, plane in enumerate(padded):
                ti = 0 if ci == 0 else 1
                blk = plane[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8]
                coef = _dct2(blk)
                zz = coef.reshape(64)[ZIGZAG]
                quant = np.round(zz / qts_zz[ti]).astype(np.int64)
                diff = int(quant[0]) - pred[ci]
                pred[ci] = int(quant[0])
                s = _mag_cat(diff)
                code, ln = dc_enc[ti][s]
                bw.write(code, ln)
                if s:
                    v = diff if diff > 0 else diff + (1 << s) - 1
                    bw.write(v, s)
                run = 0
                for k in range(1, 64):
                    v = int(quant[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = ac_enc[ti][0xF0]
                        bw.write(code, ln)
                        run -= 16
                    s = _mag_cat(v)
                    code, ln = ac_enc[ti][(run << 4) | s]
                    bw.write(code, ln)
                    vv = v if v > 0 else v + (1 << s) - 1
                    bw.write(vv, s)
                    run = 0
                if run:
                    code, ln = ac_enc[ti][0x00]
                    bw.write(code, ln)
    entropy = bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    for ti, q in enumerate(qts):
        # DQT stores values in ZIGZAG order; our tables are natural-order
        out += seg(0xDB, bytes([ti]) + bytes(int(q[z]) for z in ZIGZAG))
    nc = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci in range(nc):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    out += seg(0xC0, sof)
    specs = [(_HUFF_DC_LUMA, 0x00), (_HUFF_AC_LUMA, 0x10)]
    if not gray:
        specs += [(_HUFF_DC_CHROMA, 0x01), (_HUFF_AC_CHROMA, 0x11)]
    for (bits, values), tc_th in specs:
        out += seg(0xC4, bytes([tc_th]) + bytes(bits) + bytes(values))
    sos = bytes([nc])
    for ci in range(nc):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += entropy
    out += b"\xff\xd9"
    return bytes(out)
