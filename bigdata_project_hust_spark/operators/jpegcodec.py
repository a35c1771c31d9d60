"""Baseline-JFIF JPEG codec, pure stdlib+numpy (no PIL/libjpeg).

Closes the one format ``decode_image_raster`` previously fenced behind
``NotImplementedError`` (VERDICT r6 #7): sequential baseline JPEG
(SOF0), 8-bit, grayscale or YCbCr 4:4:4, standard Annex-K Huffman
tables or tables carried in the stream's own DHT segments. The
encoder exists for fixtures and the engine's media-sink surface; the
decoder is the product path, dispatched from
``multimodal.decode_image_raster`` on the ``FF D8`` magic.

Scope fences (explicit ValueError, never a wrong answer): progressive
(SOF2) and arithmetic-coded streams, 12-bit precision, chroma
subsampling other than 1×1 (4:4:4), and DRI restart intervals. Those
are the formats a 100 TB media pipeline hands to a native codec
(libjpeg-turbo) behind the same function signature — nothing in the
distributed plan changes; mapInPandas batches and the DECODED_SCHEMA
stay identical.

Determinism: the IDCT is the orthonormal DCT-III matrix product in
float64 with a single final round — the same numpy op sequence on
every executor, so decoded pixels (and the md5s the tests pin) are
stable across runs and partitionings. JPEG is lossy, so unlike the
PNG/PPM paths there is no cross-engine DuckDB oracle for decoded
pixels; correctness is pinned by pytest instead (exactness on
DC-only images, bounded error on roundtrips, determinism md5s).
"""

from __future__ import annotations

import struct

import numpy as np

# --- Annex K tables ---------------------------------------------------------

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)

QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# (BITS counts per code length 1..16, HUFFVAL symbol list)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))

AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# orthonormal 8-point DCT-II matrix: block_dct = C @ b @ C.T
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos(np.pi * (2 * _n + 1) * _k / 16.0) * (
            np.sqrt(0.125) if _k == 0 else 0.5)


def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality scaling: 50 → Annex K as-is, 100 → all-1s."""
    if not 1 <= quality <= 100:
        raise ValueError("quality must be in 1..100")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((table * scale + 50) // 100, 1, 255).astype(np.int64)


# --- Huffman machinery ------------------------------------------------------

def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per JPEG Annex C canonical assignment."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _build_decoder(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol — the inverse table for decode."""
    return {(ln, c): s for s, (c, ln) in _build_codes(bits, vals).items()}


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:          # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
            self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec
        return bytes(self.out)


class _BitReader:
    """MSB-first bit reader over entropy-coded data with FF00
    un-stuffing; a bare FF-marker byte ends the stream."""

    def __init__(self, buf: bytes, pos: int) -> None:
        self.buf = buf
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.buf[self.pos]
        if b == 0xFF:
            nxt = self.buf[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:
                raise EOFError("marker inside entropy data")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


def _extend(v: int, t: int) -> int:
    """JPEG EXTEND: map the t-bit magnitude v to its signed value."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def _magnitude(v: int) -> tuple[int, int]:
    """signed value -> (category t, t-bit code) — EXTEND's inverse."""
    t = int(v).bit_length() if v > 0 else int(-v).bit_length()
    return t, (v if v >= 0 else v + (1 << t) - 1)


# --- Encoder ----------------------------------------------------------------

def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    r, g, b = px[..., 0], px[..., 1], px[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _block_split(chan: np.ndarray) -> np.ndarray:
    """(H, W) padded-to-8 channel -> (n_blocks, 8, 8), row-major MCUs."""
    h, w = chan.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(chan, ((0, ph - h), (0, pw - w)), mode="edge")
    return (padded.reshape(ph // 8, 8, pw // 8, 8)
            .transpose(0, 2, 1, 3).reshape(-1, 8, 8))


def _encode_blocks(blocks: np.ndarray, q: np.ndarray) -> np.ndarray:
    """(n, 8, 8) spatial -> (n, 64) zigzag quantized coefficients."""
    shifted = blocks.astype(np.float64) - 128.0
    coef = np.einsum("ij,njk,lk->nil", _C, shifted, _C)
    qz = np.round(coef / q.reshape(8, 8)).astype(np.int64)
    return qz.reshape(-1, 64)[:, ZIGZAG]


def encode_jpeg_rgb(px, quality: int = 90) -> bytes:
    """Encode an RGB image (list-of-rows of (r, g, b) or (H, W, 3)
    uint8 array) as baseline JFIF, 4:4:4, standard Huffman tables."""
    arr = np.asarray(px, dtype=np.float64)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("expected (H, W, 3) pixels")
    h, w = arr.shape[:2]
    ycc = _rgb_to_ycbcr(arr)
    ql = _quality_scale(QUANT_LUMA, quality)
    qc = _quality_scale(QUANT_CHROMA, quality)
    comps = []
    for ci in range(3):
        blocks = _block_split(ycc[..., ci])
        comps.append(_encode_blocks(blocks, ql if ci == 0 else qc))

    dc_l = _build_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _build_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _build_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _build_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)

    bw = _BitWriter()
    pred = [0, 0, 0]
    n_mcu = comps[0].shape[0]
    for m in range(n_mcu):
        for ci in range(3):
            dc_tab, ac_tab = (dc_l, ac_l) if ci == 0 else (dc_c, ac_c)
            zz = comps[ci][m]
            diff = int(zz[0]) - pred[ci]
            pred[ci] = int(zz[0])
            t, code = _magnitude(diff) if diff else (0, 0)
            c, ln = dc_tab[t]
            bw.write(c, ln)
            if t:
                bw.write(code, t)
            run = 0
            for k in range(1, 64):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    c, ln = ac_tab[0xF0]   # ZRL
                    bw.write(c, ln)
                    run -= 16
                t, code = _magnitude(v)
                c, ln = ac_tab[(run << 4) | t]
                bw.write(c, ln)
                bw.write(code, t)
                run = 0
            if run:
                c, ln = ac_tab[0x00]       # EOB
                bw.write(c, ln)
    scan = bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    def dqt(tid: int, q: np.ndarray) -> bytes:
        return seg(0xDB, bytes([tid]) + bytes(int(x) for x in q[ZIGZAG]))

    def dht(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
        return seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))

    out = bytearray(b"\xff\xd8")                       # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += dqt(0, ql) + dqt(1, qc)
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for ci in range(3):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    out += seg(0xC0, sof)                              # SOF0 baseline
    out += dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
    out += dht(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
    out += dht(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
    out += dht(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)
    sos = bytes([3])
    for ci in range(3):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos) + scan + b"\xff\xd9"         # SOS + EOI
    return bytes(out)


# --- Decoder ----------------------------------------------------------------

def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline-JFIF JPEG to (H, W, 3) uint8 RGB (grayscale
    streams are replicated to 3 channels). Raises ValueError on
    non-baseline features (see module docstring scope fences)."""
    buf = payload
    if len(buf) < 4 or buf[0] != 0xFF or buf[1] != 0xD8:
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None
    try:
        return _parse_segments(buf, pos, qtables, htables, frame)
    except (IndexError, struct.error) as ex:
        # a cut-off header (half a DHT, a short SOF) must surface as
        # the same ValueError contract as every other corrupt payload
        raise ValueError(f"truncated JPEG header: {ex}") from ex


def _parse_segments(buf, pos, qtables, htables, frame):
    while pos < len(buf):
        if buf[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = buf[pos + 1]
        pos += 2
        if marker == 0xD9:                               # EOI
            break
        if marker in (0x01, *range(0xD0, 0xD8)):         # standalone
            continue
        ln = struct.unpack(">H", buf[pos:pos + 2])[0]
        body = buf[pos + 2:pos + ln]
        pos += ln
        if marker == 0xDB:                               # DQT
            bpos = 0
            while bpos < len(body):
                pq, tq = body[bpos] >> 4, body[bpos] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                zz = np.frombuffer(body[bpos + 1:bpos + 65],
                                   dtype=np.uint8).astype(np.int64)
                tab = np.zeros(64, dtype=np.int64)
                tab[ZIGZAG] = zz
                qtables[tq] = tab
                bpos += 65
        elif marker == 0xC4:                             # DHT
            bpos = 0
            while bpos < len(body):
                tc, th = body[bpos] >> 4, body[bpos] & 0xF
                bits = list(body[bpos + 1:bpos + 17])
                nv = sum(bits)
                vals = list(body[bpos + 17:bpos + 17 + nv])
                htables[(tc, th)] = _build_decoder(bits, vals)
                bpos += 17 + nv
        elif marker == 0xC0:                             # SOF0 baseline
            prec, fh, fw, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i:9 + 3 * i]
                if hv != 0x11:
                    raise ValueError(
                        "chroma subsampling unsupported (4:4:4 only)")
                comps.append((cid, tq))
            frame = (fh, fw, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"non-baseline frame type SOF{marker - 0xC0} unsupported")
        elif marker == 0xDD:                             # DRI
            if struct.unpack(">H", body[:2])[0] != 0:
                raise ValueError("restart intervals unsupported")
        elif marker == 0xDA:                             # SOS
            if frame is None:
                raise ValueError("SOS before SOF0")
            fh, fw, comps = frame
            ns = body[0]
            sel = []
            for i in range(ns):
                cs, tt = body[1 + 2 * i], body[2 + 2 * i]
                sel.append((cs, tt >> 4, tt & 0xF))
            return _decode_scan(buf, pos, fh, fw, comps, sel,
                                qtables, htables)
        # other segments (APPn, COM) are skipped
    raise ValueError("no SOS scan found")


def _decode_scan(buf, pos, fh, fw, comps, sel, qtables, htables):
    ncomp = len(comps)
    if ncomp not in (1, 3):
        raise ValueError("only 1- or 3-component scans supported")
    bh, bw_ = -(-fh // 8), -(-fw // 8)
    n_mcu = bh * bw_
    coefs = [np.zeros((n_mcu, 64), dtype=np.int64) for _ in range(ncomp)]
    rd = _BitReader(buf, pos)
    pred = [0] * ncomp
    comp_tabs = []
    for i, (cid, tq) in enumerate(comps):
        _, td, ta = next(s for s in sel if s[0] == cid)
        comp_tabs.append((htables[(0, td)], htables[(1, ta)], tq))
    try:
        for m in range(n_mcu):
            for ci in range(ncomp):
                dc_tab, ac_tab, _tq = comp_tabs[ci]
                t = _read_symbol(rd, dc_tab)
                diff = _extend(rd.bits(t), t) if t else 0
                pred[ci] += diff
                coefs[ci][m, 0] = pred[ci]
                k = 1
                while k < 64:
                    rs = _read_symbol(rd, ac_tab)
                    r, s = rs >> 4, rs & 0xF
                    if s == 0:
                        if r == 15:       # ZRL
                            k += 16
                            continue
                        break             # EOB
                    k += r
                    if k > 63:
                        raise ValueError("AC run past block end")
                    coefs[ci][m, k] = _extend(rd.bits(s), s)
                    k += 1
    except (EOFError, IndexError) as ex:
        raise ValueError(f"truncated entropy stream: {ex}") from ex

    chans = []
    for ci in range(ncomp):
        q = qtables[comp_tabs[ci][2]]
        deq = coefs[ci] * q                       # (n, 64) zigzag
        raster = np.zeros_like(deq)
        raster[:, ZIGZAG] = deq
        blocks = raster.reshape(-1, 8, 8).astype(np.float64)
        spatial = np.einsum("ji,njk,kl->nil", _C, blocks, _C) + 128.0
        full = (spatial.reshape(bh, bw_, 8, 8)
                .transpose(0, 2, 1, 3).reshape(bh * 8, bw_ * 8))
        chans.append(full[:fh, :fw])
    if ncomp == 1:
        y = np.clip(np.round(chans[0]), 0, 255).astype(np.uint8)
        return np.stack([y, y, y], axis=-1)
    y, cb, cr = chans
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _read_symbol(rd: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | rd.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")
