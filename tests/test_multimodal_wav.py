"""REAL audio decode (VERDICT r8 item 4): the WAV path of the
multimodal decode kernel, golden-file pinned, end-to-end through the
Spark mapInPandas plumbing.

The golden files are COMMITTED real WAV containers
(tests/data/golden_*.wav); expected envelopes are recomputed here with
an independent stdlib-only implementation (struct loop, no numpy), so
kernel and oracle share no code."""

import math
import os
import struct
import wave

import pytest

from crypto_data_ingestion_module_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_assets,
    decode_wav_bytes,
    is_wav,
)

DATA = os.path.join(os.path.dirname(__file__), "data")
MONO16 = os.path.join(DATA, "golden_sine_mono16.wav")
STEREO8 = os.path.join(DATA, "golden_ramp_stereo8.wav")


def _oracle_envelope(path):
    """Independent pure-stdlib recomputation of (rate, n_frames,
    envelope): struct-unpacked samples, per-frame channel mean, mean
    |amplitude| per equal time bin / full scale."""
    with wave.open(path) as w:
        n_ch, sw, rate, n = (
            w.getnchannels(),
            w.getsampwidth(),
            w.getframerate(),
            w.getnframes(),
        )
        raw = w.readframes(n)
    if sw == 2:
        vals = struct.unpack(f"<{len(raw)//2}h", raw)
        scale = 32768.0
    else:
        vals = [b - 128 for b in raw]
        scale = 128.0
    mono = [
        sum(vals[i : i + n_ch]) / n_ch for i in range(0, len(vals), n_ch)
    ]
    feats = []
    for b in range(FEATURE_DIM):
        seg = mono[b * len(mono) // FEATURE_DIM : (b + 1) * len(mono) // FEATURE_DIM]
        feats.append(
            round(sum(abs(s) for s in seg) / (len(seg) * scale), 6)
            if seg
            else 0.0
        )
    return rate, n, feats


@pytest.mark.parametrize("path", [MONO16, STEREO8])
def test_decode_wav_bytes_matches_independent_oracle(path):
    payload = open(path, "rb").read()
    assert is_wav(payload)
    got = decode_wav_bytes(payload)
    assert got == _oracle_envelope(path)


def test_golden_sine_envelope_is_physical():
    """The 0.6-amplitude sine's mean |amplitude| per bin must sit at
    0.6 * 2/pi (the analytic mean of |sin|), every bin — a decoder that
    mis-parses the header or byte order cannot land there."""
    payload = open(MONO16, "rb").read()
    rate, n_frames, feats = decode_wav_bytes(payload)
    assert (rate, n_frames) == (8000, 800)
    expect = 0.6 * 2 / math.pi
    for f in feats:
        assert abs(f - expect) < 0.01, feats


def test_stereo8_mixdown_and_metadata():
    payload = open(STEREO8, "rb").read()
    rate, n_frames, feats = decode_wav_bytes(payload)
    assert (rate, n_frames) == (4000, 200)
    # L ramps 0..99 above center, R fixed at +64: frame mean is
    # (ramp + 64)/2, always positive, bounded by (99+64)/2/128
    assert all(0.2 < f < 0.7 for f in feats), feats


def test_wav_decode_end_to_end_through_spark_plumbing(spark):
    """Mixed-modality batch through decode_assets: WAV payloads take the
    REAL path (width/height = sample_rate/n_frames), non-WAV payloads
    the deterministic fake — one kernel, sniffed per row."""
    wav1 = open(MONO16, "rb").read()
    wav2 = open(STEREO8, "rb").read()
    assets = spark.createDataFrame(
        [
            (1, "audio", bytearray(wav1)),
            (2, "audio", bytearray(wav2)),
            (3, "image", bytearray(b"not a wav payload")),
        ],
        "asset_id long, modality string, payload binary",
    )
    rows = {r.asset_id: r for r in decode_assets(assets).collect()}
    assert len(rows) == 3
    r1, r2, r3 = rows[1], rows[2], rows[3]
    assert (r1.width, r1.height) == (8000, 800)
    assert (r2.width, r2.height) == (4000, 200)
    assert r1.n_bytes == len(wav1)
    # FloatType cast: compare at float32 precision
    want1 = decode_wav_bytes(wav1)[2]
    assert [round(f, 5) for f in r1.features] == [
        round(struct.unpack("f", struct.pack("f", v))[0], 5) for v in want1
    ]
    # the non-WAV row is quarantined (r12): no fabricated metadata
    assert r3.decode_ok is False
    assert r3.width is None and r3.height is None and r3.features is None
