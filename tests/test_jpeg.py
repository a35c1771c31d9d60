"""Baseline-JFIF JPEG codec (operators/jpegcodec.py — VERDICT r6 #7:
the last fenced format in decode_image_raster is now a real decoder).

JPEG is lossy, so unlike PNG/PPM there is no exact cross-engine pixel
oracle; correctness is pinned here by (a) EXACT results on DC-only
images (solid colors survive quantization exactly), (b) bounded error
on gradient roundtrips, (c) a determinism md5 over the decoded array,
(d) honest ValueErrors on every non-baseline feature, and (e) the
dispatch + per-asset error isolation through the multimodal surface.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from bigdata_project_hust_spark.operators.jpegcodec import (
    _build_codes, AC_LUMA_BITS, AC_LUMA_VALS, decode_jpeg,
    encode_jpeg_rgb)
from bigdata_project_hust_spark.operators.multimodal import (
    decode_image_raster)


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([(yy * 255 // max(h - 1, 1)),
                     (xx * 255 // max(w - 1, 1)),
                     ((yy + xx) * 255 // max(h + w - 2, 1))],
                    axis=-1).astype(np.uint8)


def test_huffman_canonical_assignment():
    """Annex C canonical codes: lengths are non-decreasing in
    assignment order, codes are prefix-free, and the table is
    complete (162 AC luma symbols)."""
    codes = _build_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    assert len(codes) == 162
    seen = set()
    for sym, (code, ln) in codes.items():
        assert 1 <= ln <= 16 and 0 <= code < (1 << ln)
        # prefix-free: no code is a prefix of another
        for s2, (c2, l2) in codes.items():
            if s2 != sym and l2 >= ln:
                assert (c2 >> (l2 - ln)) != code or (sym, s2) == (s2, sym)
        seen.add((ln, code))
    assert len(seen) == 162
    # the spec pins EOB (symbol 0x00) to code 1010 (4 bits)
    assert codes[0x00] == (0b1010, 4)
    # and ZRL (0xF0) to 11111111001 (11 bits)
    assert codes[0xF0] == (0b11111111001, 11)


def test_solid_colors_roundtrip_exactly():
    """A solid image is DC-only; quantized DC of a flat block loses
    nothing at these amplitudes → decode is EXACT."""
    for color in [(128, 128, 128), (200, 30, 90), (0, 0, 0),
                  (255, 255, 255)]:
        px = np.zeros((16, 24, 3), dtype=np.uint8)
        px[...] = color
        out = decode_jpeg(encode_jpeg_rgb(px, quality=95))
        assert np.array_equal(out, px), color


def test_gradient_roundtrip_bounded_error_and_deterministic():
    px = _gradient(24, 40)
    data = encode_jpeg_rgb(px, quality=92)
    out = decode_jpeg(data)
    assert out.shape == px.shape and out.dtype == np.uint8
    err = np.abs(out.astype(int) - px.astype(int))
    assert err.max() <= 16 and err.mean() <= 5.0
    # byte-identical across repeated encode+decode (fixed FP sequence)
    again = decode_jpeg(encode_jpeg_rgb(px, quality=92))
    assert hashlib.md5(again.tobytes()).hexdigest() == \
        hashlib.md5(out.tobytes()).hexdigest()


def test_non_multiple_of_8_dimensions():
    """Edge-replication padding: dims are preserved, interior error
    stays JPEG-typical."""
    px = _gradient(17, 13)
    out = decode_jpeg(encode_jpeg_rgb(px, quality=90))
    assert out.shape == (17, 13, 3)
    err = np.abs(out.astype(int) - px.astype(int))
    # a steep 13px-wide gradient rings hard at the replicated block
    # edges — bound the interior tightly and the edges loosely
    assert err[:16, :8].max() <= 24
    assert err.max() <= 64 and err.mean() <= 12.0


def test_quality_monotonicity():
    """Higher quality → error no worse (on mean) and more bytes."""
    px = _gradient(32, 32)
    lo, hi = (encode_jpeg_rgb(px, quality=q) for q in (30, 95))
    e_lo = np.abs(decode_jpeg(lo).astype(int) - px.astype(int)).mean()
    e_hi = np.abs(decode_jpeg(hi).astype(int) - px.astype(int)).mean()
    assert e_hi <= e_lo
    assert len(hi) > len(lo)


def test_unsupported_features_raise_valueerror():
    px = _gradient(8, 8)
    data = bytearray(encode_jpeg_rgb(px, quality=90))
    # flip SOF0 (FFC0) to SOF2 (FFC2): progressive must be fenced
    i = bytes(data).index(b"\xff\xc0")
    prog = data[:i] + b"\xff\xc2" + data[i + 2:]
    with pytest.raises(ValueError, match="non-baseline"):
        decode_jpeg(bytes(prog))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG not a jpeg")
    with pytest.raises(ValueError, match="truncated"):
        decode_jpeg(bytes(data[:len(data) // 2]))  # mid-scan cut
    with pytest.raises(ValueError):
        encode_jpeg_rgb(px, quality=0)


def test_decode_image_raster_dispatches_jpeg():
    """The multimodal surface routes FF D8 payloads through the JPEG
    decoder and produces the standard 8-dim feature contract."""
    px = np.zeros((8, 8, 3), dtype=np.uint8)
    px[...] = (60, 120, 180)
    meta = decode_image_raster(encode_jpeg_rgb(px, quality=95))
    assert (meta["width"], meta["height"], meta["n_channels"]) == (8, 8, 3)
    assert len(meta["feature"]) == 8
    # solid color decodes exactly → channel means are exact
    assert meta["feature"][0] == pytest.approx(60 / 255)
    assert meta["feature"][1] == pytest.approx(120 / 255)
    assert meta["feature"][2] == pytest.approx(180 / 255)


def test_extract_image_features_jpeg_through_spark(spark):
    """End-to-end through the Arrow-batched mapInPandas operator: a
    frame mixing a JPEG, a PPM, and a corrupt payload — the corrupt
    asset is isolated (NULL feature), the others decode."""
    from bigdata_project_hust_spark.operators.multimodal import (
        extract_image_features)
    px = np.zeros((8, 8, 3), dtype=np.uint8)
    px[...] = (10, 20, 30)
    ppm = b"P6 2 2 255 " + bytes([10, 20, 30] * 4)
    rows = [(1, "image", bytearray(encode_jpeg_rgb(px, quality=95))),
            (2, "image", bytearray(ppm)),
            (3, "image", bytearray(b"\xff\xd8garbage"))]
    df = spark.createDataFrame(rows,
                               "asset_id long, kind string, payload binary")
    out = {r.asset_id: r for r in extract_image_features(df).collect()}
    assert out[1].feature is not None
    assert out[1].feature[0] == pytest.approx(10 / 255)
    assert out[2].feature is not None
    assert out[3].feature is None  # corrupt isolated, job survives
