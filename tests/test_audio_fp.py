"""Audio energy-envelope fingerprint dedup (r14 Y-series, the audio
leg of the multimodal near-dup mandate).

Pins: 8-bit/16-bit PCM re-encode invariance, gain invariance with the
single forced bit flip (hamming exactly 1 vs both siblings), NULL
propagation for non-WAV payloads and too-short clips, and the
n_frames contract.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_ingestion_spark.functions.multimodal import (
    attach_pattern_audio,
    audio_fingerprint64,
    audio_frame_energies,
    wav_bytes,
)


def _fps(spark, ids):
    d = spark.createDataFrame([(i,) for i in ids], "doc_id bigint")
    return {
        r.doc_id: r.afp
        for r in audio_fingerprint64(attach_pattern_audio(d)).collect()
    }


def test_recode_and_gain_invariance(spark):
    # group 7: docs 21 (16-bit), 22 (8-bit re-encode), 23 (half gain +
    # forced bit-0 flip). p(7,1) = (259+53) % 97 != 0, so the flip is real.
    fp = _fps(spark, [21, 22, 23])
    assert fp[21] is not None
    # 8-bit re-encode: identical fingerprint through quantization
    assert fp[21] == fp[22]
    # half gain alone changes nothing; the forced frame-0 amplitude
    # flips exactly bit 0
    assert bin((fp[21] ^ fp[23]) & ((1 << 64) - 1)).count("1") == 1
    assert (fp[21] ^ fp[23]) & 1 == 1


def test_distinct_groups_differ(spark):
    fp = _fps(spark, [0, 3, 30])
    assert fp[0] != fp[3] and fp[0] != fp[30]


def test_null_for_non_wav_and_short_clip(spark):
    df = spark.createDataFrame(
        [
            (1, b"not audio at all"),
            # valid WAV but only 10 samples < 65 frames
            (2, wav_bytes(1, 8000, 16, 10)),
        ],
        "doc_id bigint, payload binary",
    )
    out = {r.doc_id: r.afp for r in audio_fingerprint64(df).collect()}
    assert out[1] is None and out[2] is None


def test_frame_energies_exact_square_wave(spark):
    """RMS of a constant-magnitude square wave is exactly |amp| —
    the bit-exactness claim the fixture's oracle relies on."""
    import struct as st

    import numpy as np

    val = 16384  # amp 0.5 exactly
    frame = np.empty(65 * 64, dtype="<i2")
    frame[0::2], frame[1::2] = val, -val
    data = frame.tobytes()
    fmt = st.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    wav = (
        b"RIFF" + st.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + st.pack("<I", 16) + fmt
        + b"data" + st.pack("<I", len(data)) + data
    )
    df = spark.createDataFrame([(1, wav)], "doc_id bigint, payload binary")
    e = audio_frame_energies(df).head().energies
    assert len(e) == 65 and all(x == 0.5 for x in e)


def test_contracts(spark):
    df = spark.createDataFrame([(1, b"x")], "doc_id bigint, payload binary")
    with pytest.raises(ValueError, match="must be 65"):
        audio_fingerprint64(df, n_frames=32)
    with pytest.raises(ValueError, match=">= 2"):
        audio_frame_energies(df, n_frames=1)
