"""GIF pixel decode (LZW + palette + interlace) — pure Python, no Spark.

The in-test encoder implements the spec's variable-width LZW with the
standard early-change width rule, so the decoder is exercised against
independently-generated spec-correct streams. The strongest check is
cross-codec: the SAME pixels encoded as an RGB PNG and as a palette GIF
must produce the IDENTICAL average hash — two unrelated decode paths
only agree if both recover the exact pixel values."""

from __future__ import annotations

import pytest

from torspider_spark.operators.multimodal import _fake_phash, _phash64
from torspider_spark.weblib.gifcodec import decode_gif, gif_average_hash
from torspider_spark.weblib.pngcodec import average_hash64
from tests.test_pngcodec import encode_png

INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _lzw_encode(mcs: int, indices: bytes) -> bytes:
    clear, end = 1 << mcs, (1 << mcs) + 1
    codes: list[tuple[int, int]] = []
    table = {bytes([i]): i for i in range(1 << mcs)}
    next_code, width = end + 1, mcs + 1
    codes.append((clear, width))
    w = b""
    for k in indices:
        wk = w + bytes([k])
        if wk in table:
            w = wk
            continue
        codes.append((table[w], width))
        table[wk] = next_code
        next_code += 1
        if next_code == (1 << width) + 1 and width < 12:
            width += 1  # early-change: decoder widens one code earlier
        w = bytes([k])
    if w:
        codes.append((table[w], width))
    codes.append((end, width))
    acc = bits = 0
    out = bytearray()
    for code, cw in codes:
        acc |= code << bits
        bits += cw
        while bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            bits -= 8
    if bits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(width, height, palette, indices, *, interlace=False,
               version=b"GIF89a", extension=False):
    """Spec-correct single-frame GIF writer (global color table)."""
    n = len(palette)
    size_bits = max(1, (n - 1).bit_length())
    table = list(palette) + [(0, 0, 0)] * ((1 << size_bits) - n)
    out = bytearray(version)
    out += width.to_bytes(2, "little") + height.to_bytes(2, "little")
    out += bytes([0x80 | (size_bits - 1), 0, 0])      # GCT flag + size
    for rgb in table:
        out += bytes(rgb)
    if extension:                                     # e.g. a GCE block
        out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    rows = indices
    if interlace:
        reordered = bytearray()
        for start, step in INTERLACE_PASSES:
            for y in range(start, height, step):
                reordered += indices[y * width:(y + 1) * width]
        rows = bytes(reordered)
    out += b"\x2c" + b"\x00" * 4
    out += width.to_bytes(2, "little") + height.to_bytes(2, "little")
    out += bytes([0x40 if interlace else 0x00])
    mcs = max(2, size_bits)
    out += bytes([mcs])
    data = _lzw_encode(mcs, rows)
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)


def _checker(width, height, n_colors):
    return bytes((x // 3 + y // 2) % n_colors
                 for y in range(height) for x in range(width))


PALETTE8 = [(0, 0, 0), (255, 255, 255), (200, 30, 30), (30, 200, 30),
            (30, 30, 200), (120, 120, 0), (0, 120, 120), (120, 0, 120)]


@pytest.mark.parametrize("interlace", [False, True],
                         ids=["progressive", "interlaced"])
@pytest.mark.parametrize("version", [b"GIF87a", b"GIF89a"])
def test_gif_roundtrip(interlace, version):
    idx = _checker(37, 23, 8)
    payload = encode_gif(37, 23, PALETTE8, idx, interlace=interlace,
                         version=version, extension=version == b"GIF89a")
    got = decode_gif(payload)
    assert got is not None
    w, h, ch, rgb = got
    assert (w, h, ch) == (37, 23, 3)
    expect = b"".join(bytes(PALETTE8[i]) for i in idx)
    assert bytes(rgb) == expect


def test_gif_lzw_width_growth_and_kwkwk():
    """A 256-color image forces code widths 9->12 and hits the KwKwK
    (code == next_code) path; byte-exact recovery proves the decoder
    tracks the encoder's early-change schedule."""
    palette = [(i, 255 - i, i ^ 170) for i in range(256)]
    idx = bytes((x * x + 7 * y) % 256 for y in range(40) for x in range(40))
    # repeated runs produce KwKwK sequences
    idx += bytes([5]) * 120 + idx[:200]
    height = len(idx) // 40
    idx = idx[:height * 40]
    payload = encode_gif(40, height, palette, idx)
    got = decode_gif(payload)
    assert got is not None
    expect = b"".join(bytes(palette[i]) for i in idx)
    assert bytes(got[3]) == expect


def test_cross_codec_hash_identical():
    """Same pixels through two unrelated decoders (RGB PNG vs palette
    GIF, interlaced and not) -> identical average hash."""
    idx = _checker(48, 32, 8)
    rgb = b"".join(bytes(PALETTE8[i]) for i in idx)
    png_hash = average_hash64(48, 32, 3, rgb)
    via_png = _phash64(encode_png(48, 32, 3, rgb, level=9))
    via_gif = _phash64(encode_gif(48, 32, PALETTE8, idx))
    via_gif_i = _phash64(encode_gif(48, 32, PALETTE8, idx, interlace=True))
    assert via_png == via_gif == via_gif_i == png_hash


def test_gif_fallback_paths():
    idx = _checker(10, 10, 4)
    good = encode_gif(10, 10, PALETTE8[:4], idx)
    truncated = good[:20]
    no_trailer_data = good[:13]  # header + LSD only, no image
    for bad in (truncated, no_trailer_data, b"GIF89a" + b"\x00" * 4,
                b"not a gif"):
        assert decode_gif(bad) is None
        assert _phash64(bad) == _fake_phash(bad)
    # animated: only the first frame hashes — appending a second image
    # block must not change the result
    second = good[:-1] + good[13:]  # crude second frame + trailer
    assert gif_average_hash(second) == gif_average_hash(good)


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(width=st.integers(1, 24), height=st.integers(1, 16),
           n_colors=st.integers(2, 256), interlace=st.booleans(),
           seed=st.integers(0, 2**32 - 1))
    def test_gif_roundtrip_property(width, height, n_colors, interlace,
                                    seed):
        import random as _random

        rng = _random.Random(seed)
        palette = [(rng.randrange(256), rng.randrange(256),
                    rng.randrange(256)) for _ in range(n_colors)]
        idx = bytes(rng.randrange(n_colors)
                    for _ in range(width * height))
        payload = encode_gif(width, height, palette, idx,
                             interlace=interlace)
        got = decode_gif(payload)
        assert got is not None
        assert (got[0], got[1], got[2]) == (width, height, 3)
        assert bytes(got[3]) == b"".join(bytes(palette[i]) for i in idx)
except ImportError:
    pass


def encode_animated_gif(cw, ch, palette, frames, bg_idx=0):
    """Multi-frame GIF: frames = dicts(left, top, w, h, indices,
    disposal=0, transparent=None)."""
    n = len(palette)
    size_bits = max(1, (n - 1).bit_length())
    table = list(palette) + [(0, 0, 0)] * ((1 << size_bits) - n)
    out = bytearray(b"GIF89a")
    out += cw.to_bytes(2, "little") + ch.to_bytes(2, "little")
    out += bytes([0x80 | (size_bits - 1), bg_idx, 0])
    for rgb in table:
        out += bytes(rgb)
    mcs = max(2, size_bits)
    for f in frames:
        disposal = f.get("disposal", 0)
        transparent = f.get("transparent")
        gflags = (disposal << 2) | (1 if transparent is not None else 0)
        out += bytes([0x21, 0xF9, 4, gflags, 0, 0,
                      transparent or 0, 0])
        out += b"\x2c"
        out += f["left"].to_bytes(2, "little")
        out += f["top"].to_bytes(2, "little")
        out += f["w"].to_bytes(2, "little")
        out += f["h"].to_bytes(2, "little")
        out += b"\x00" + bytes([mcs])
        data = _lzw_encode(mcs, bytes(f["indices"]))
        for i in range(0, len(data), 255):
            chunk = data[i:i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def test_animated_gif_composition_transparency_disposal():
    from torspider_spark.weblib.gifcodec import decode_gif_frames

    pal = [(10, 10, 10), (250, 250, 250), (200, 0, 0), (0, 200, 0)]
    base = _checker(16, 12, 2)                    # colors 0/1 full canvas
    patch = bytes([2] * 4 + [3, 3] + [2] * 2 +    # 4x2 patch, color 3
                  [0] * 0)                        # transparent idx 3 later
    frames = [
        dict(left=0, top=0, w=16, h=12, indices=base),
        dict(left=5, top=4, w=4, h=2, indices=patch, transparent=3),
        dict(left=0, top=0, w=2, h=2, indices=bytes([2] * 4),
             disposal=2),
        dict(left=14, top=10, w=2, h=2, indices=bytes([3] * 4)),
    ]
    got = decode_gif_frames(encode_animated_gif(16, 12, pal, frames))
    assert got is not None and len(got) == 4
    w, h = 16, 12

    def px(frame, x, y):
        return tuple(frame[3][3 * (y * w + x):3 * (y * w + x) + 3])

    # frame 0: plain checker
    assert px(got[0], 0, 0) == pal[base[0]]
    # frame 1: patch overlays at (5,4); transparent index 3 shows through
    assert px(got[1], 5, 4) == pal[2]
    assert px(got[1], 9, 4) == pal[base[4 * w + 9]]   # transparent spot
    assert px(got[1], 10, 4) == pal[base[4 * w + 10]]  # outside patch
    # frame 2: 2x2 red block at origin (disposal=2 applies AFTER render)
    assert px(got[2], 0, 0) == pal[2]
    # frame 3: origin restored to BACKGROUND color; new block at (14,10)
    assert px(got[3], 0, 0) == pal[0]
    assert px(got[3], 14, 10) == pal[3]
    # patch from frame 1 persists (disposal 0 = leave in place)
    assert px(got[3], 5, 4) == pal[2]


def test_decode_gif_frames_first_matches_decode_gif():
    from torspider_spark.weblib.gifcodec import decode_gif_frames

    idx = _checker(20, 14, 8)
    payload = encode_gif(20, 14, PALETTE8, idx)
    frames = decode_gif_frames(payload)
    assert frames is not None and len(frames) == 1
    assert bytes(frames[0][3]) == bytes(decode_gif(payload)[3])
