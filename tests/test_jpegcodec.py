"""Baseline JPEG decode — pure Python, no Spark.

The in-test encoder writes spec-correct baseline JFIF (forward DCT,
quantization, canonical huffman tables declared in DHT, byte stuffing,
optional 4:2:0 subsampling and restart markers). JPEG is lossy, so the
checks are fidelity bounds (mean absolute pixel error under a fine
quantizer) and perceptual-hash stability (PNG-vs-JPEG of the same image
within a small Hamming distance), not byte equality."""

from __future__ import annotations

import math

from torspider_spark.operators.multimodal import _fake_phash, _phash64
from torspider_spark.weblib.jpegcodec import ZIGZAG, decode_jpeg
from torspider_spark.weblib.pngcodec import average_hash64
from tests.test_pngcodec import encode_png

_C = [[math.cos((2 * x + 1) * u * math.pi / 16)
       * (math.sqrt(0.5) if u == 0 else 1.0) / 2.0
       for u in range(8)] for x in range(8)]


def _fdct_quant(block, q):
    """8x8 forward DCT on level-shifted samples, quantized, zigzagged."""
    shifted = [v - 128.0 for v in block]
    tmp = [sum(shifted[y * 8 + x] * _C[x][u] for x in range(8))
           for y in range(8) for u in range(8)]
    out = [0] * 64
    for k in range(64):
        u, v = ZIGZAG[k] % 8, ZIGZAG[k] // 8
        s = sum(tmp[y * 8 + u] * _C[y][v] for y in range(8))
        out[k] = int(round(s / q[k]))
    return out


def _category(v: int) -> int:
    return abs(v).bit_length()


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)       # byte stuffing
                self.acc = self.n = 0

    def pad(self) -> None:
        while self.n:
            self.write(1, 1)


def _canonical_tables(symbol_sets):
    """Fixed-length canonical huffman per table: n symbols at length L
    with the all-ones code unused (spec-safe)."""
    tables = {}
    for key, syms in symbol_sets.items():
        syms = sorted(syms)
        length = max(2, (len(syms) + 1).bit_length())
        counts = [0] * 16
        counts[length - 1] = len(syms)
        codes = {s: (length, i) for i, s in enumerate(syms)}
        tables[key] = (bytes(counts), bytes(syms), codes)
    return tables


def _blocks_of(plane, pw, ph, ox, oy):
    return [plane[min(oy + y, ph - 1) * pw + min(ox + x, pw - 1)]
            for y in range(8) for x in range(8)]


def encode_jpeg(width, height, rgb, *, subsample=False, q_scale=1,
                restart_interval=0, grayscale=False,
                component_order=(1, 2, 3)):
    """Spec-correct baseline JFIF encoder (quantizer: mild default,
    scaled by q_scale; 4:4:4 or 4:2:0; optional restart markers).
    component_order permutes the SOF/SOS component LISTING (legal per
    spec — decoders must key on ids, not position)."""
    ql = [max(1, (4 + k // 4) * q_scale) for k in range(64)]   # luma
    qc = [max(1, (6 + k // 3) * q_scale) for k in range(64)]   # chroma
    if grayscale:
        comps = [{"id": 1, "h": 1, "v": 1, "tq": 0, "qt": ql}]
    else:
        hv = 2 if subsample else 1
        by_id = {1: {"id": 1, "h": hv, "v": hv, "tq": 0, "qt": ql},
                 2: {"id": 2, "h": 1, "v": 1, "tq": 1, "qt": qc},
                 3: {"id": 3, "h": 1, "v": 1, "tq": 1, "qt": qc}}
        comps = [by_id[i] for i in component_order]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)

    # color transform + per-component planes (chroma box-subsampled)
    planes = []
    for ci, c in enumerate(comps):
        pw = (width * c["h"] + hmax - 1) // hmax
        ph = (height * c["v"] + vmax - 1) // vmax
        plane = bytearray(pw * ph)
        for y in range(ph):
            for x in range(pw):
                sx = min(x * hmax // c["h"], width - 1)
                sy = min(y * vmax // c["v"], height - 1)
                if grayscale:
                    val = rgb[3 * (sy * width + sx)]
                else:
                    r = rgb[3 * (sy * width + sx)]
                    g = rgb[3 * (sy * width + sx) + 1]
                    b = rgb[3 * (sy * width + sx) + 2]
                    if c["id"] == 1:
                        val = 0.299 * r + 0.587 * g + 0.114 * b
                    elif c["id"] == 2:
                        val = 128 - 0.168736 * r - 0.331264 * g + 0.5 * b
                    else:
                        val = 128 + 0.5 * r - 0.418688 * g - 0.081312 * b
                plane[y * pw + x] = max(0, min(255, int(val + 0.5)))
        planes.append((plane, pw, ph))

    mcus_x = (width + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (height + 8 * vmax - 1) // (8 * vmax)

    # pass 1: quantized coefficients per MCU (restart-aware DC preds)
    def iter_units():
        pred = [0] * len(comps)
        count = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if restart_interval and count \
                        and count % restart_interval == 0:
                    yield ("RST", count // restart_interval - 1)
                    pred = [0] * len(comps)
                for ci, c in enumerate(comps):
                    plane, pw, ph = planes[ci]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            coef = _fdct_quant(
                                _blocks_of(plane, pw, ph,
                                           (mx * c["h"] + bx) * 8,
                                           (my * c["v"] + by) * 8),
                                c["qt"])
                            diff = coef[0] - pred[ci]
                            pred[ci] = coef[0]
                            yield ("BLK", ci, diff, coef)
                count += 1

    # collect symbols per huffman table (class, 0=lum 1=chroma)
    sets = {("dc", 0): set(), ("ac", 0): set()}
    if not grayscale:
        sets[("dc", 1)] = set()
        sets[("ac", 1)] = set()

    def ac_symbols(coef):
        run = 0
        for k in range(1, 64):
            if coef[k] == 0:
                run += 1
                continue
            while run > 15:
                yield 0xF0, 0, 0
                run -= 16
            s = _category(coef[k])
            yield (run << 4) | s, coef[k], s
            run = 0
        if run:
            yield 0x00, 0, 0

    units = list(iter_units())
    for u in units:
        if u[0] != "BLK":
            continue
        _, ci, diff, coef = u
        tid = 0 if comps[ci]["id"] == 1 else 1
        if grayscale:
            tid = 0
        sets[("dc", tid)].add(_category(diff))
        for sym, _, _ in ac_symbols(coef):
            sets[("ac", tid)].add(sym)
    tables = _canonical_tables(sets)

    # pass 2: emit
    def put_val(w, v, s):
        if s:
            w.write(v if v > 0 else v + (1 << s) - 1, s)

    writer = _BitWriter()
    for u in units:
        if u[0] == "RST":
            writer.pad()
            writer.out += bytes([0xFF, 0xD0 + (u[1] % 8)])
            continue
        _, ci, diff, coef = u
        tid = 0 if (comps[ci]["id"] == 1 or grayscale) else 1
        _, _, dc_codes = tables[("dc", tid)]
        _, _, ac_codes = tables[("ac", tid)]
        s = _category(diff)
        length, code = dc_codes[s]
        writer.write(code, length)
        put_val(writer, diff, s)
        for sym, val, vs in ac_symbols(coef):
            length, code = ac_codes[sym]
            writer.write(code, length)
            put_val(writer, val, vs)
    writer.pad()

    out = bytearray(b"\xff\xd8")
    for tid, q in ((0, ql),) if grayscale else ((0, ql), (1, qc)):
        out += b"\xff\xdb" + (67).to_bytes(2, "big") + bytes([tid])
        out += bytes(q)
    out += b"\xff\xc0" + (8 + 3 * len(comps)).to_bytes(2, "big")
    out += bytes([8]) + height.to_bytes(2, "big") + width.to_bytes(2, "big")
    out += bytes([len(comps)])
    for c in comps:
        out += bytes([c["id"], (c["h"] << 4) | c["v"], c["tq"]])
    for (cls, tid), (counts, syms, _) in tables.items():
        out += b"\xff\xc4" + (19 + len(syms)).to_bytes(2, "big")
        out += bytes([(0 if cls == "dc" else 0x10) | tid])
        out += counts + syms
    if restart_interval:
        out += b"\xff\xdd\x00\x04" + restart_interval.to_bytes(2, "big")
    out += b"\xff\xda" + (6 + 2 * len(comps)).to_bytes(2, "big")
    out += bytes([len(comps)])
    for c in comps:
        tid = 0 if (c["id"] == 1 or grayscale) else 1
        out += bytes([c["id"], (tid << 4) | tid])
    out += b"\x00\x3f\x00"
    out += writer.out
    out += b"\xff\xd9"
    return bytes(out)


def _gradient_rgb(width, height):
    px = bytearray()
    for y in range(height):
        for x in range(width):
            px += bytes(((x * 5 + y * 3) % 256, (x * 2 + y * 7) % 256,
                         (x * 11 + y) % 256))
    return bytes(px)


def _smooth_rgb(width, height):
    px = bytearray()
    for y in range(height):
        for x in range(width):
            px += bytes((min(255, 40 + x * 3), min(255, 60 + y * 4),
                         min(255, 30 + x + y)))
    return bytes(px)


def _hamming(a, b):
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def _mae(a, b):
    return sum(abs(x - y) for x, y in zip(a, b)) / len(a)


def test_jpeg_roundtrip_fidelity_444():
    rgb = _smooth_rgb(48, 32)
    payload = encode_jpeg(48, 32, rgb)
    got = decode_jpeg(payload)
    assert got is not None and (got[0], got[1], got[2]) == (48, 32, 3)
    assert _mae(rgb, bytes(got[3])) < 4.0


def test_jpeg_grayscale_and_nonaligned_dims():
    rgb_in = _smooth_rgb(21, 13)
    payload = encode_jpeg(21, 13, rgb_in, grayscale=True)
    got = decode_jpeg(payload)
    assert got is not None and (got[0], got[1], got[2]) == (21, 13, 3)
    # grayscale output: r == g == b, close to the encoder's source plane
    # (the test encoder feeds the R channel as the single component)
    source = [rgb_in[3 * i] for i in range(21 * 13)]
    out = got[3]
    assert all(out[3 * i] == out[3 * i + 1] == out[3 * i + 2]
               for i in range(21 * 13))
    assert _mae(source, [out[3 * i] for i in range(21 * 13)]) < 4.0


def test_jpeg_420_subsampling_and_restarts():
    rgb = _smooth_rgb(40, 24)
    plain = decode_jpeg(encode_jpeg(40, 24, rgb, subsample=True))
    assert plain is not None
    assert _mae(rgb, bytes(plain[3])) < 8.0   # chroma is subsampled
    with_rst = decode_jpeg(encode_jpeg(40, 24, rgb, subsample=True,
                                       restart_interval=2))
    assert with_rst is not None
    # restart markers change the byte stream, not the pixels
    assert bytes(with_rst[3]) == bytes(plain[3])


def test_jpeg_hash_stability_cross_codec():
    """PNG (lossless) and JPEG (lossy) of the same image hash within a
    small Hamming distance; two JPEG qualities agree similarly."""
    rgb = _gradient_rgb(64, 48)
    png_hash = _phash64(encode_png(64, 48, 3, rgb))
    assert png_hash == average_hash64(64, 48, 3, rgb)
    j_fine = _phash64(encode_jpeg(64, 48, rgb, q_scale=1))
    j_coarse = _phash64(encode_jpeg(64, 48, rgb, q_scale=4))
    assert _hamming(png_hash, j_fine) <= 6
    assert _hamming(j_fine, j_coarse) <= 8
    # and none of these came from the fake
    assert j_fine != _fake_phash(encode_jpeg(64, 48, rgb, q_scale=1))


def test_jpeg_out_of_scope_falls_back():
    rgb = _smooth_rgb(16, 16)
    good = encode_jpeg(16, 16, rgb)
    progressive = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    truncated = good[:40]
    for bad in (progressive, truncated, b"\xff\xd8\xff\xe0junk",
                b"not a jpeg"):
        assert decode_jpeg(bad) is None
        assert _phash64(bad) == _fake_phash(bad)
