"""Real PNG pixel decode + average hash (VERDICT r3 #3) — pure Python,
no Spark session needed. The in-test encoder writes spec-correct PNGs
with a chosen zlib level and per-row filter type, so the decoder's
unfilter path (None/Sub/Up/Average/Paeth) is exercised against known
pixels, and hash equality across compression levels is provable."""

from __future__ import annotations

import struct
import zlib

from torspider_spark.operators.multimodal import _fake_phash, _phash64
from torspider_spark.weblib.pngcodec import (average_hash64, decode_png,
                                             png_average_hash)

_COLOR_TYPE = {1: 0, 2: 4, 3: 2, 4: 6}  # channels -> PNG color type


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data)))


def _paeth(a, b, c):
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def encode_png(width, height, channels, pixels, *, level=6, filters=None,
               interlace=0, bit_depth=8):
    """Spec-correct PNG writer. ``filters``: per-row filter type list
    (default all 0); pixels is row-major bytes, 8-bit samples."""
    stride = width * channels
    filters = filters or [0] * height
    raw = bytearray()
    for y in range(height):
        ftype = filters[y]
        raw.append(ftype)
        for x in range(stride):
            cur = pixels[y * stride + x]
            a = pixels[y * stride + x - channels] if x >= channels else 0
            b = pixels[(y - 1) * stride + x] if y > 0 else 0
            c = (pixels[(y - 1) * stride + x - channels]
                 if y > 0 and x >= channels else 0)
            if ftype == 0:
                raw.append(cur)
            elif ftype == 1:
                raw.append((cur - a) & 0xFF)
            elif ftype == 2:
                raw.append((cur - b) & 0xFF)
            elif ftype == 3:
                raw.append((cur - (a + b) // 2) & 0xFF)
            elif ftype == 4:
                raw.append((cur - _paeth(a, b, c)) & 0xFF)
            else:
                raise ValueError(ftype)
    ihdr = struct.pack(">IIBBBBB", width, height, bit_depth,
                       _COLOR_TYPE[channels], 0, 0, interlace)
    return (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(raw), level))
            + _chunk(b"IEND", b""))


def _gradient(width, height, channels):
    px = bytearray()
    for y in range(height):
        for x in range(width):
            for ch in range(channels):
                px.append((x * 7 + y * 13 + ch * 31) % 256)
    return bytes(px)


def _hamming(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_roundtrip_every_filter_and_channel_count():
    for channels in (1, 2, 3, 4):
        px = _gradient(20, 15, channels)
        for ftype in range(5):
            payload = encode_png(20, 15, channels, px,
                                 filters=[ftype] * 15)
            got = decode_png(payload)
            assert got is not None, (channels, ftype)
            w, h, ch, out = got
            assert (w, h, ch) == (20, 15, channels)
            assert bytes(out) == px, f"filter {ftype} ch {channels}"
    # mixed filters per row too
    px = _gradient(33, 9, 3)
    payload = encode_png(33, 9, 3, px, filters=[0, 1, 2, 3, 4, 4, 3, 2, 1])
    assert bytes(decode_png(payload)[3]) == px


def test_hash_equal_across_compression_and_filters():
    """VERDICT r3 #3 done-criterion: visually identical PNGs (same
    pixels, different compression level / filter strategy) hash EQUAL."""
    px = _gradient(64, 48, 3)
    a = encode_png(64, 48, 3, px, level=0)
    b = encode_png(64, 48, 3, px, level=9, filters=[4] * 48)
    assert a != b  # genuinely different byte streams
    ha, hb = png_average_hash(a), png_average_hash(b)
    assert ha is not None and ha == hb
    # and the multimodal path uses the real hash for PNGs
    assert _phash64(a) == ha == _phash64(b)


def test_hash_perturbation_small_hamming():
    """A small pixel perturbation moves few bits; an unrelated image
    moves many."""
    px = bytearray(_gradient(64, 64, 3))
    base = png_average_hash(encode_png(64, 64, 3, bytes(px)))
    px2 = bytearray(px)
    for i in range(0, 48):  # brighten a 4x4 corner slightly
        px2[i] = min(255, px2[i] + 12)
    near = png_average_hash(encode_png(64, 64, 3, bytes(px2)))
    assert _hamming(base, near) <= 8

    inverted = bytes(255 - v for v in px)
    far = png_average_hash(encode_png(64, 64, 3, inverted))
    assert _hamming(base, far) >= 24


def test_tiny_and_grayscale_images():
    for w, h in ((1, 1), (3, 2), (8, 8), (5, 12)):
        px = _gradient(w, h, 1)
        payload = encode_png(w, h, 1, px, filters=[2] * h)
        got = decode_png(payload)
        assert got is not None and bytes(got[3]) == px
        assert isinstance(average_hash64(*got), int)


def test_unsupported_shapes_fall_back_to_fake():
    px = _gradient(10, 10, 3)
    interlaced = encode_png(10, 10, 3, px, interlace=1)
    sixteen_bit = encode_png(10, 10, 3, px, bit_depth=16)
    truncated = encode_png(10, 10, 3, px)[:40]
    corrupt_idat = encode_png(10, 10, 3, px).replace(b"IDAT", b"IDAx", 1)
    for bad in (interlaced, sixteen_bit, truncated, corrupt_idat,
                b"not a png at all"):
        assert decode_png(bad) is None
        assert png_average_hash(bad) is None
        # the engine path degrades to the deterministic fake, unchanged
        assert _phash64(bad) == _fake_phash(bad)


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        width=st.integers(1, 24), height=st.integers(1, 16),
        channels=st.sampled_from([1, 2, 3, 4]),
        level=st.integers(0, 9),
        seed=st.integers(0, 2**32 - 1),
        data=st.data())
    def test_roundtrip_property(width, height, channels, level, seed, data):
        """Any pixel buffer survives encode(filters, level) -> decode
        byte-exactly, for arbitrary per-row filter choices."""
        import random as _random

        rng = _random.Random(seed)
        px = bytes(rng.randrange(256)
                   for _ in range(width * height * channels))
        filters = data.draw(st.lists(st.integers(0, 4), min_size=height,
                                     max_size=height))
        payload = encode_png(width, height, channels, px, level=level,
                             filters=filters)
        got = decode_png(payload)
        assert got is not None
        assert (got[0], got[1], got[2]) == (width, height, channels)
        assert bytes(got[3]) == px
except ImportError:  # hypothesis is in this image, but stay import-safe
    pass


def test_signed_64bit_range():
    """Hashes must fit Spark LongType (signed)."""
    for seed in range(6):
        px = bytes((v * (seed + 3)) % 256 for v in _gradient(16, 16, 4))
        h = png_average_hash(encode_png(16, 16, 4, px))
        assert -(1 << 63) <= h < 1 << 63
