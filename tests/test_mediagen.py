"""Synthetic-media generators (weblib.mediagen) and the real-decode
driver oracle (VERDICT r4 "missing #1").

Two independent paths must land on the same numbers:

  source arrays --direct math--> expected features   (this file + the
                                                       inlined oracle
                                                       literals)
  source arrays --encode--> payload --REAL codec decode--> operator
                                                       features

The `_MEDIAGEN_*` literals in __spark_entry__ were computed by the
direct path; tests here recompute them from source (no codec, no
generator constants reused beyond the seeds) and drive the encode ->
decode path through the actual multimodal operators on Spark.
"""

from __future__ import annotations

import numpy as np
import pytest

from torspider_spark.weblib import mediagen as mg

SF_DIR = "/root/testdata/sf0.001"


def _ahash_direct(luma: np.ndarray) -> int:
    """Independent 8x8 average hash: plain reshape-mean over the aligned
    8x8 blocks (valid because mediagen images are 64x64)."""
    cells = luma.reshape(8, 8, 8, 8).mean(axis=(1, 3))
    mean = cells.mean()
    bits = 0
    for v in cells.ravel():
        bits = (bits << 1) | (1 if v > mean else 0)
    return bits - (1 << 64) if bits >= 1 << 63 else bits


def _energy_direct(mono: np.ndarray) -> int:
    n = len(mono)
    amp = np.abs(mono)
    means = []
    for i in range(64):
        lo = min(i * n // 64, n - 1)
        hi = min(max((i + 1) * n // 64, lo + 1), n)
        means.append(float(amp[lo:hi].sum()) / (hi - lo))
    mean = sum(means) / 64.0
    bits = 0
    for m in means:
        bits = (bits << 1) | (1 if m > mean else 0)
    return bits - (1 << 64) if bits >= 1 << 63 else bits


def _video_frames_direct(media_id: int) -> list[np.ndarray]:
    """Independent composition of video_payload's three frames."""
    base = mg.synth_luma(media_id)
    patch = mg.synth_luma(media_id + 1000)[16:48, 16:48]
    overlay = mg.synth_luma(media_id + 2000)
    f0 = base
    f1 = base.copy()
    f1[16:48, 16:48] = patch
    f2 = f1.copy()
    mask = overlay != 40          # dark pixels are the transparent index
    f2[mask] = overlay[mask]
    return [f0, f1, f2]


# ------------------------------------------------ pure roundtrips -------

def test_png_roundtrip_exact():
    from torspider_spark.weblib.pngcodec import decode_png

    luma = mg.synth_luma(3)
    w, h, ch, px = decode_png(mg.encode_png(luma))
    assert (w, h, ch) == (64, 64, 1)
    assert np.array_equal(
        np.frombuffer(bytes(px), dtype=np.uint8).reshape(64, 64), luma)


def test_gif_roundtrip_exact_and_cross_codec_hash():
    from torspider_spark.weblib.gifcodec import decode_gif
    from torspider_spark.weblib.pngcodec import average_hash64

    luma = mg.synth_luma(5)
    w, h, ch, px = decode_gif(mg.encode_gif(luma))
    assert (w, h, ch) == (64, 64, 3)
    rgb = np.frombuffer(bytes(px), dtype=np.uint8).reshape(64, 64, 3)
    assert np.array_equal(rgb[:, :, 0], luma)
    assert np.array_equal(rgb[:, :, 1], luma)
    # gray palette -> Rec.601 reproduces v exactly -> hashes identical
    assert (average_hash64(w, h, ch, px)
            == average_hash64(64, 64, 1, bytearray(luma.tobytes())))


def test_gif_lzw_stream_survives_multiple_clears():
    """>128 pixels forces re-emitted CLEAR codes; the decoder must resync
    without the code width ever leaving 9 bits."""
    from torspider_spark.weblib.gifcodec import decode_gif

    luma = mg.synth_luma(11, w=64, h=64)      # 4096 px -> 32 clears
    decoded = decode_gif(mg.encode_gif(luma))
    assert decoded is not None
    rgb = np.frombuffer(bytes(decoded[3]), dtype=np.uint8).reshape(
        64, 64, 3)
    assert np.array_equal(rgb[:, :, 0], luma)


def test_animated_gif_composition_matches_direct_overlay():
    from torspider_spark.weblib.gifcodec import decode_gif_frames

    for media_id in range(4):
        frames = decode_gif_frames(mg.video_payload(media_id))
        expected = _video_frames_direct(media_id)
        assert len(frames) == 3
        for (w, h, ch, px), exp in zip(frames, expected):
            assert (w, h, ch) == (64, 64, 3)
            got = np.frombuffer(bytes(px), dtype=np.uint8).reshape(
                64, 64, 3)
            assert np.array_equal(got[:, :, 0], exp)


def test_wav_roundtrip_exact():
    from torspider_spark.weblib.wavcodec import decode_wav

    s = mg.synth_samples(9)
    rate, channels, mono = decode_wav(mg.encode_wav(s))
    assert (rate, channels) == (8000, 1)
    assert np.array_equal(mono, s.astype(np.float64) / 32768.0)


# -------------------------------------- oracle-literal lock (no codec) --

def test_image_literals_recompute_from_source():
    import __spark_entry__ as entry

    for media_id, w, h, n_bytes, phash in entry._MEDIAGEN_IMAGE:
        assert (w, h) == (64, 64)
        assert n_bytes == len(mg.image_payload(media_id))
        assert phash == _ahash_direct(mg.synth_luma(media_id))


def test_audio_literals_recompute_from_source():
    import __spark_entry__ as entry

    for (media_id, rate, channels, dur_ms, rms_e4, zc, ehash,
         decoded) in entry._MEDIAGEN_AUDIO:
        mono = mg.synth_samples(media_id).astype(np.float64) / 32768.0
        rms = float(np.sqrt(np.square(mono).sum() / len(mono)))
        neg = mono < 0
        assert (rate, channels, dur_ms, decoded) == (8000, 1, 512, 1)
        assert rms_e4 == int(np.floor(rms * 10000 + 0.5))
        assert zc == int(np.count_nonzero(neg[1:] != neg[:-1]))
        assert ehash == _energy_direct(mono)


def test_frame_literals_recompute_from_source():
    import __spark_entry__ as entry

    expected = {}
    for media_id in range(4):
        for idx, frame in enumerate(_video_frames_direct(media_id)):
            expected[(media_id, idx)] = _ahash_direct(frame)
    assert {(m, i): h for m, i, h in entry._MEDIAGEN_FRAMES} == expected


def _thumb_direct(media_id: int) -> bytes:
    """Independent 16x16 box-average thumbnail: reshape-mean over 4x4
    boxes of the source luma, round-half-up (each box sits inside one
    constant 8x8 block, so the mean is exact)."""
    luma = mg.synth_luma(media_id)
    means = luma.reshape(16, 4, 16, 4).astype(np.int64).sum(
        axis=(1, 3)) / 16.0
    return np.minimum(255, (means + 0.5).astype(np.int64)).astype(
        np.uint8).tobytes()


def test_thumb_literals_recompute_from_source():
    import hashlib

    import __spark_entry__ as entry

    for media_id, tw, th, n_bytes, sha_quoted in entry._MEDIAGEN_THUMBS:
        thumb = _thumb_direct(media_id)
        assert (tw, th, n_bytes) == (16, 16, len(thumb))
        assert sha_quoted.strip("'") == hashlib.sha1(thumb).hexdigest()


def test_thumbnails_driver_query_hits_real_resize(spark):
    import __spark_entry__ as entry

    rows = [tuple(r) for r in
            entry.queries()["thumbnails_real"](spark, SF_DIR).collect()]
    expected = [(m, tw, th, nb, sha.strip("'"))
                for m, tw, th, nb, sha in entry._MEDIAGEN_THUMBS]
    assert rows == expected


# ------------------------------------------- Spark operator path --------

@pytest.mark.parametrize("query,literals", [
    ("media_real_decode", "_MEDIAGEN_IMAGE"),
    ("audio_real_decode", "_MEDIAGEN_AUDIO"),
    ("video_frames_real", "_MEDIAGEN_FRAMES"),
])
def test_driver_queries_hit_real_decode(spark, query, literals):
    import __spark_entry__ as entry

    rows = [tuple(r) for r in
            entry.queries()[query](spark, SF_DIR).collect()]
    assert rows == getattr(entry, literals)


def test_jpeg_flat_roundtrip_exact():
    """JPEG is lossy in general; for constant 8x8 blocks the DC-only
    encoding round-trips bit-exactly through the REAL baseline decoder
    (huffman build, DC prediction, EOB, dequant, IDCT all driven)."""
    from torspider_spark.weblib.jpegcodec import decode_jpeg

    for media_id in (2, 5, 8):
        luma = mg.synth_luma(media_id)
        w, h, ch, px = decode_jpeg(mg.encode_jpeg_flat(luma))
        assert (w, h, ch) == (64, 64, 3)
        got = np.frombuffer(bytes(px), dtype=np.uint8).reshape(64, 64, 3)
        assert np.array_equal(got[:, :, 0], luma)
        assert np.array_equal(got[:, :, 1], luma)


def test_jpeg_flat_rejects_nonconstant_blocks():
    luma = mg.synth_luma(0).copy()
    luma[0, 0] ^= 1
    with pytest.raises(ValueError):
        mg.encode_jpeg_flat(luma)
