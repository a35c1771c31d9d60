"""Staged JPEG-decode driver query (VERDICT r7 #4): full oracle-grade
parity at sf0.001 for q_multimodal_jpeg_features BEFORE it is
registered at the r9 unfreeze — the same row-count + column +
value-hash compare the driver runs, plus the exactness premise the
oracle's closed form rests on (flat-block baseline JPEG at quality=50
round-trips bit-for-bit)."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from bigdata_project_hust_spark.operators.jpegcodec import (
    decode_jpeg, encode_jpeg_rgb)
from bigdata_project_hust_spark.plans.queries import (
    ORACLE_MM_JPEG, q_multimodal_jpeg_features)
from tests.oracle_harness import compare, duck_connection

SF = "/root/testdata/sf0.001"


def _fixture_px(doc_id: int) -> np.ndarray:
    h = hashlib.md5(f"{doc_id}:jpg".encode()).digest()
    px = np.zeros((16, 16, 3), np.uint8)
    for k in range(4):
        px[(k // 2) * 8:(k // 2) * 8 + 8,
           (k % 2) * 8:(k % 2) * 8 + 8, :] = h[k] & 0xFE
    return px


@pytest.mark.parametrize("doc_id", [0, 1, 7, 123, 999983])
def test_flat_block_jpeg_roundtrip_exact(doc_id):
    """The oracle derives stats from INPUT pixels, so the codec must
    reproduce them exactly: blockwise-flat even-valued gray images are
    DC-only at quality=50 (unscaled Annex-K tables, DC step 16)."""
    px = _fixture_px(doc_id)
    assert np.array_equal(decode_jpeg(encode_jpeg_rgb(px, quality=50)), px)


def test_jpeg_features_vs_duckdb_oracle(spark):
    """Driver-identical compare of the staged query vs its oracle —
    what CORRECTNESS_r09 will run once the registry unfreezes."""
    res = compare(q_multimodal_jpeg_features(spark, SF),
                  duck_connection(SF), ORACLE_MM_JPEG)
    assert res["n_spark"] == res["n_duck"] > 0
    assert res["hash"], res
