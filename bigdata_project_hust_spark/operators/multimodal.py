"""Multimodal columns: image/audio/video as opaque binary + metadata.

The Spark-side plumbing is real — schema (schemas.MEDIA_ASSETS),
Arrow-batched ``mapInPandas`` operators, partition-aware batch shapes —
while the codec step is stubbed (no image/audio libraries in this
container): ``decode_image`` raises NotImplementedError unless
``fake=True``, in which case a deterministic md5-seeded feature vector
stands in for real pixels. Swapping the stub for Pillow/torchaudio is a
one-function change; nothing in the distributed plan moves.

Scale notes: binary payloads never pass through Python row-at-a-time —
mapInPandas streams Arrow record batches, so a 100 TB media table is
processed at batch granularity with zero driver involvement. Keep
payloads under the parquet row-group size (or store offsets into blob
storage and fetch inside the batch fn) — both patterns have the same
operator shape below.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

FEATURE_DIM = 8

DECODED_SCHEMA = ("asset_id long, kind string, n_bytes long, "
                  "payload_md5 string, feature array<double>")


def _fake_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in for a real decoder: dim floats in [0, 1)
    derived from the payload's md5. Stable across runs and engines."""
    out = []
    for i in range(dim):
        h = hashlib.md5(f"{i}:".encode() + (payload or b"")).digest()
        out.append(int.from_bytes(h[:8], "big") / 2**64)
    return out


def decode_image(payload: bytes, *, fake: bool = False) -> list[float]:
    """Codec stub — replace with a real decoder (e.g. PIL →
    resize(224) → normalize) when the library is available."""
    if not fake:
        raise NotImplementedError(
            "image decoding requires an image library not present in this "
            "container; call with fake=True for the deterministic stub")
    return _fake_features(payload)


def extract_features(df: DataFrame, *, fake: bool = True) -> DataFrame:
    """Batch feature extraction over a media-asset table via
    mapInPandas: bytes in, fixed-dim feature vector + integrity
    metadata out. Partitioning of the input is preserved (narrow op)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            yield pd.DataFrame({
                "asset_id": pdf["asset_id"],
                "kind": pdf["kind"],
                "n_bytes": payloads.map(lambda b: len(b or b"")).astype("int64"),
                "payload_md5": payloads.map(
                    lambda b: hashlib.md5(b or b"").hexdigest()),
                "feature": payloads.map(
                    lambda b: decode_image(b, fake=fake)),
            })

    return df.mapInPandas(batches, schema=DECODED_SCHEMA)


RESIZE_THUMB_BYTES = 64


def resize_images(df: DataFrame, width: int = 32,
                  height: int = 32) -> DataFrame:
    """Resize plumbing: emit a fixed-size "thumbnail" per image asset.

    The real implementation decodes pixels and interpolates (PIL/cv2 —
    not in this container); the stub keeps the operator contract — a
    bounded-size binary derivative plus target dims — by truncating the
    payload to RESIZE_THUMB_BYTES. Batch shape, schema, and
    partitioning (narrow, Arrow-batched) are exactly what the real
    codec version uses.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            thumbs = pdf["payload"].map(
                lambda b: (b or b"")[:RESIZE_THUMB_BYTES])
            yield pd.DataFrame({
                "asset_id": pdf["asset_id"],
                "width": width,
                "height": height,
                "thumb_md5": thumbs.map(
                    lambda b: hashlib.md5(b).hexdigest()),
                "thumb_bytes": thumbs.map(len).astype("int64"),
            })

    return df.mapInPandas(
        batches,
        schema="asset_id long, width int, height int, "
               "thumb_md5 string, thumb_bytes long")


def sample_frames(df: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame-sampling plumbing for video assets: emit one row per
    sampled "frame" (stubbed as byte-slices of the payload). Shows the
    1→N mapInPandas expansion shape a real ffmpeg-backed sampler uses."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for _, r in pdf.iterrows():
                payload = r["payload"] or b""
                n_frames = max(1, len(payload) // 16)
                for f in range(0, n_frames, every_n):
                    chunk = payload[f * 16:(f + 1) * 16]
                    rows.append((r["asset_id"], f,
                                 hashlib.md5(chunk).hexdigest()))
            yield pd.DataFrame(rows, columns=["asset_id", "frame_no",
                                              "frame_md5"])

    return df.mapInPandas(batches,
                          schema="asset_id long, frame_no int, frame_md5 string")
