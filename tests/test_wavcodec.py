"""WAV (RIFF PCM) decode + audio signature — pure Python + one Spark
check. The in-test writer emits spec-correct RIFF/WAVE at several bit
depths; the loudness-contour hash must be invariant to bit depth and
gain, and sensitive to a different contour."""

from __future__ import annotations

import math
import struct

from torspider_spark.weblib.wavcodec import (decode_wav, energy_hash64,
                                             wav_features)


def encode_wav(samples, rate=16000, channels=1, bits=16,
               extra_chunk=False):
    """samples: floats in [-1, 1] (mono) or list of per-channel lists."""
    if channels == 1:
        frames = [[s] for s in samples]
    else:
        frames = list(zip(*samples))
    data = bytearray()
    for frame in frames:
        for v in frame:
            if bits == 8:
                data.append(max(0, min(255, int(v * 128) + 128)))
            else:
                full = (1 << (bits - 1)) - 1
                iv = max(-full - 1, min(full, int(v * full)))
                data += iv.to_bytes(bits // 8, "little", signed=True)
    fmt = struct.pack("<HHIIHH", 1, channels, rate,
                      rate * channels * bits // 8,
                      channels * bits // 8, bits)
    chunks = b"fmt " + len(fmt).to_bytes(4, "little") + fmt
    if extra_chunk:                       # e.g. LIST/INFO before data
        chunks += b"LIST" + (5).to_bytes(4, "little") + b"INFOx" + b"\x00"
    chunks += b"data" + len(data).to_bytes(4, "little") + bytes(data)
    return b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" \
        + chunks


def _tone(freq, n, rate=16000, gain=0.8):
    return [gain * math.sin(2 * math.pi * freq * i / rate)
            for i in range(n)]


def _hamming(a, b):
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_wav_roundtrip_bit_depths_and_channels():
    mono = _tone(440, 1600)
    for bits in (8, 16, 24, 32):
        got = decode_wav(encode_wav(mono, bits=bits))
        assert got is not None
        rate, ch, out = got
        assert (rate, ch, len(out)) == (16000, 1, 1600)
        tol = 0.02 if bits == 8 else 0.001
        assert max(abs(a - b) for a, b in zip(mono, out)) < tol
    # stereo downmix: L == -R cancels to ~zero
    left, right = _tone(300, 800), [-v for v in _tone(300, 800)]
    rate, ch, out = decode_wav(encode_wav([left, right], channels=2))
    assert ch == 2 and max(abs(v) for v in out) < 0.001
    # extra RIFF chunks before data are skipped (word alignment)
    assert decode_wav(encode_wav(mono, extra_chunk=True)) is not None


def test_energy_hash_invariances():
    quiet = _tone(200, 4000, gain=0.2)
    loud = [v * 3 for v in quiet]
    ramp = [v * (i / 4000) for i, v in enumerate(_tone(200, 4000))]
    h8 = wav_features(encode_wav(quiet, bits=8))["audio_hash64"]
    h16 = wav_features(encode_wav(quiet, bits=16))["audio_hash64"]
    h_loud = energy_hash64(loud)
    assert _hamming(h8, h16) <= 4        # bit depth barely matters
    assert energy_hash64(quiet) == h_loud  # gain-invariant exactly
    assert _hamming(h16, energy_hash64(ramp)) >= 16  # different contour


def test_wav_features_values():
    n, rate = 3200, 16000
    feats = wav_features(encode_wav(_tone(440, n, rate=rate), rate=rate))
    assert feats["sample_rate"] == rate and feats["channels"] == 1
    assert feats["duration_ms"] == n * 1000 // rate
    # sine RMS = gain / sqrt(2)
    assert abs(feats["rms"] - 0.8 / math.sqrt(2)) < 0.01
    # 440 Hz over 0.2 s -> ~2 * 440 * 0.2 = 176 crossings
    assert abs(feats["zero_crossings"] - 176) <= 2


def test_wav_fallback_paths():
    mono = _tone(100, 400)
    good = encode_wav(mono)
    float_fmt = good.replace(struct.pack("<H", 1), struct.pack("<H", 3), 1)
    for bad in (good[:30], float_fmt, b"RIFFxxxxWAVO" + good[12:],
                b"ID3\x03mp3-ish data"):
        assert decode_wav(bad) is None
        assert wav_features(bad) is None


def test_spark_audio_features(spark):
    from torspider_spark.operators import multimodal

    rows = [(1, "audio", encode_wav(_tone(440, 1600)), "audio/wav", None),
            (2, "audio", b"ID3\x03 not decodable", "audio/mpeg", None)]
    media = spark.createDataFrame(rows, multimodal.MEDIA)
    got = {r.media_id: r for r in
           multimodal.decode_audio_features(media).collect()}
    assert got[1].decoded and got[1].sample_rate == 16000 \
        and got[1].duration_ms == 100
    assert not got[2].decoded            # fake path flagged, not hidden
