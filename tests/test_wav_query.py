"""Staged WAV-decode driver query: full oracle-grade parity at
sf0.001 for q_multimodal_wav_stats BEFORE it is registered at the r9
unfreeze — upgrades the audio path from rows-only to the driver's
value-hash check — plus the codec premise (the Catalyst-built RIFF
header decodes through the stdlib ``wave`` module with the pinned
format fields)."""

from __future__ import annotations

import hashlib
import io
import wave

import numpy as np

from bigdata_project_hust_spark.plans.queries import (
    ORACLE_MM_WAV, q_multimodal_wav_stats)
from tests.oracle_harness import compare, duck_connection

SF = "/root/testdata/sf0.001"

_HEADER = bytes.fromhex(
    "524946464400000057415645666d7420100000000100010040"
    "1f0000401f00000100080064617461" + "20000000")


def test_wav_fixture_decodes_via_stdlib_wave():
    for doc_id in (0, 1, 42, 999983):
        payload = _HEADER + hashlib.md5(
            f"{doc_id}:wav0".encode()).digest() + hashlib.md5(
            f"{doc_id}:wav1".encode()).digest()
        with wave.open(io.BytesIO(payload), "rb") as w:
            assert (w.getframerate(), w.getnchannels(),
                    w.getsampwidth(), w.getnframes()) == (8000, 1, 1, 32)
            x = np.frombuffer(w.readframes(32), np.uint8)
        assert bytes(x) == payload[44:]


def test_wav_stats_vs_duckdb_oracle(spark):
    """Driver-identical compare of the staged query vs its oracle —
    what CORRECTNESS_r09 will run once the registry unfreezes."""
    res = compare(q_multimodal_wav_stats(spark, SF),
                  duck_connection(SF), ORACLE_MM_WAV)
    assert res["n_spark"] == res["n_duck"] > 0
    assert res["hash"], res


def test_wav_zero_frame_stream_yields_null_stats(spark):
    """A 0-frame PCM stream has NO samples: the sample statistics are
    NULL, not 0 — zero-fill would be indistinguishable from a genuine
    all-zero-sample stream (ADVICE r8)."""
    import struct

    from bigdata_project_hust_spark.operators import multimodal

    empty = struct.pack("<4sI4s4sIHHIIHH4sI", b"RIFF", 36, b"WAVE",
                        b"fmt ", 16, 1, 1, 8000, 8000, 1, 8,
                        b"data", 0)
    df = spark.createDataFrame([(1, "audio", bytearray(empty))],
                               "asset_id long, kind string, payload binary")
    row = multimodal.extract_audio_stats(df).collect()[0]
    assert row.ok and row.n_frames == 0
    assert (row.sum_samples, row.min_sample, row.max_sample,
            row.sum_absdiff, row.n_signflips) == (None,) * 5
