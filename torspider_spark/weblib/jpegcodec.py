"""Pure-stdlib baseline JPEG decode for the perceptual hash.

Round-4 completion of the multimodal pixel path: baseline sequential
JPEG (SOF0, 8-bit, huffman) needs no external library either — markers,
huffman tables, dequantization, inverse zigzag, a float 2D IDCT, chroma
upsampling and the JFIF YCbCr->RGB transform are all stdlib-expressible.
``decode_jpeg`` returns RGB pixels for ``pngcodec.average_hash64``;
anything outside scope (progressive SOF2, arithmetic coding, 12-bit,
truncated streams) returns None and the caller falls back to the
deterministic fake.

The hash consumer tolerates JPEG's lossiness by construction: aHash
compares 8x8 box means against their global mean, so the decoder needs
deterministic, visually-faithful pixels — not bit-exactness against any
particular reference implementation. Supported sampling: any h/v factors
up to 2 (covers 4:4:4, 4:2:2, 4:2:0, grayscale); restart markers reset
the DC predictors and bit alignment per the spec.
"""

from __future__ import annotations

import math

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# Separable IDCT basis: cos((2x+1) u pi / 16) * C(u)/2, precomputed.
_COS = [[math.cos((2 * x + 1) * u * math.pi / 16)
         * (math.sqrt(0.5) if u == 0 else 1.0) / 2.0
         for u in range(8)] for x in range(8)]


class _Bits:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    byte-unstuffing; RSTn markers surface as alignment resets."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise ValueError("truncated entropy data")
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else None
            if nxt == 0x00:
                self.pos += 2
            elif nxt is not None and 0xD0 <= nxt <= 0xD7:
                raise _Restart
            else:
                raise ValueError("unexpected marker in entropy data")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bit(self) -> int:
        if not self.n:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

class _Restart(Exception):
    """An RSTn marker surfaced OUTSIDE a restart boundary — malformed
    stream; propagates so decode_jpeg falls back to None."""


def _build_huff(counts: bytes, symbols: bytes) -> dict:
    """(length, code) -> symbol, canonical per JPEG Annex C."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(bits: _Bits, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | bits.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid huffman code")


def _extend(v: int, t: int) -> int:
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


def _idct_block(coef: list) -> list:
    """8x8 2D IDCT (separable, float), output level-shifted + clamped."""
    tmp = [0.0] * 64
    for y in range(8):          # rows: over u
        row = coef[y * 8:(y + 1) * 8]
        for x in range(8):
            tmp[y * 8 + x] = sum(row[u] * _COS[x][u] for u in range(8))
    out = [0] * 64
    for x in range(8):          # cols: over v
        col = [tmp[v * 8 + x] for v in range(8)]
        for y in range(8):
            s = sum(col[v] * _COS[y][v] for v in range(8)) + 128.0
            out[y * 8 + x] = 0 if s < 0 else (255 if s > 255 else int(s + 0.5))
    return out


def decode_jpeg(payload: bytes):
    """payload -> (width, height, 3, rgb bytes) or None (out of scope)."""
    try:
        return _decode(payload)
    except Exception:
        return None


def _decode(data: bytes):
    if not data.startswith(b"\xff\xd8"):
        return None
    pos = 2
    qt: dict[int, list] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            return None
        marker = data[pos + 1]
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7 or marker == 0x01:
            pos += 2
            continue
        seg_len = int.from_bytes(data[pos + 2:pos + 4], "big")
        seg = data[pos + 4:pos + 2 + seg_len]
        if marker == 0xDB:                      # DQT
            i = 0
            while i < len(seg):
                prec, tid = seg[i] >> 4, seg[i] & 0x0F
                i += 1
                if prec:
                    vals = [int.from_bytes(seg[i + 2 * k:i + 2 * k + 2],
                                           "big") for k in range(64)]
                    i += 128
                else:
                    vals = list(seg[i:i + 64])
                    i += 64
                qt[tid] = vals
        elif marker == 0xC4:                    # DHT
            i = 0
            while i < len(seg):
                cls, tid = seg[i] >> 4, seg[i] & 0x0F
                counts = seg[i + 1:i + 17]
                n = sum(counts)
                symbols = seg[i + 17:i + 17 + n]
                (huff_ac if cls else huff_dc)[tid] = _build_huff(counts,
                                                                 symbols)
                i += 17 + n
        elif marker == 0xC0:                    # SOF0 baseline
            precision = seg[0]
            if precision != 8:
                return None
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                              "tq": tq})
            frame = {"w": w, "h": h, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            return None                         # non-baseline: fallback
        elif marker == 0xDD:                    # DRI
            restart_interval = int.from_bytes(seg[0:2], "big")
        elif marker == 0xDA:                    # SOS
            if frame is None:
                return None
            ns = seg[0]
            sel = {}
            for c in range(ns):
                cid, tabs = seg[1 + 2 * c], seg[2 + 2 * c]
                sel[cid] = (tabs >> 4, tabs & 0x0F)
            return _scan(data, pos + 2 + seg_len, frame, sel, qt,
                         huff_dc, huff_ac, restart_interval)
        elif marker == 0xD9:
            return None
        pos += 2 + seg_len
    return None


def _scan(data, pos, frame, sel, qt, huff_dc, huff_ac, restart_interval):
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if not (1 <= hmax <= 2 and 1 <= vmax <= 2):
        return None
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    planes = []
    for c in comps:
        cw, ch = mcus_x * 8 * c["h"], mcus_y * 8 * c["v"]
        planes.append(bytearray(cw * ch))
        c["cw"], c["ch"] = cw, ch
    bits = _Bits(data, pos)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count \
                    and mcu_count % restart_interval == 0:
                # Spec behavior at a restart boundary: discard the
                # partial byte, consume the RSTn marker, reset the DC
                # predictors.
                bits.acc = bits.n = 0
                if (bits.pos + 1 < len(data) and data[bits.pos] == 0xFF
                        and 0xD0 <= data[bits.pos + 1] <= 0xD7):
                    bits.pos += 2
                    pred = [0] * len(comps)
                else:
                    raise ValueError("expected restart marker")
            _decode_mcu(bits, comps, sel, qt, huff_dc, huff_ac, pred,
                        planes, mx, my)
            mcu_count += 1
    return _to_rgb(w, h, comps, planes, hmax, vmax)


def _decode_mcu(bits, comps, sel, qt, huff_dc, huff_ac, pred, planes,
                mx, my):
    for ci, c in enumerate(comps):
        dc_t, ac_t = sel[c["id"]]
        for by in range(c["v"]):
            for bx in range(c["h"]):
                coef = [0] * 64
                t = _huff_decode(bits, huff_dc[dc_t])
                diff = _extend(bits.bits(t), t) if t else 0
                pred[ci] += diff
                q = qt[c["tq"]]
                coef[0] = pred[ci] * q[0]
                k = 1
                while k < 64:
                    rs = _huff_decode(bits, huff_ac[ac_t])
                    r, s = rs >> 4, rs & 0x0F
                    if s == 0:
                        if r == 15:
                            k += 16
                            continue
                        break               # EOB
                    k += r
                    if k > 63:
                        raise ValueError("AC index out of range")
                    coef[ZIGZAG[k]] = _extend(bits.bits(s), s) * q[k]
                    k += 1
                block = _idct_block(coef)
                plane, cw = planes[ci], c["cw"]
                ox = (mx * c["h"] + bx) * 8
                oy = (my * c["v"] + by) * 8
                for y in range(8):
                    row = (oy + y) * cw + ox
                    plane[row:row + 8] = bytes(block[y * 8:y * 8 + 8])


def _to_rgb(w, h, comps, planes, hmax, vmax):
    if len(comps) == 1:
        plane, cw = planes[0], comps[0]["cw"]
        rgb = bytearray(w * h * 3)
        for y in range(h):
            for x in range(w):
                v = plane[y * cw + x]
                i = 3 * (y * w + x)
                rgb[i] = rgb[i + 1] = rgb[i + 2] = v
        return w, h, 3, rgb
    if len(comps) != 3:
        return None
    rgb = bytearray(w * h * 3)
    # Map components to Y/Cb/Cr by their SOF id (1=Y, 2=Cb, 3=Cr per
    # JFIF) rather than by position — a legal stream may list them in any
    # order, and a positional assumption would swap chroma (ADVICE r4).
    # Nonstandard ids fall back to positional order.
    order = list(range(3))
    ids = [c["id"] for c in comps]
    if sorted(ids) == [1, 2, 3]:
        order = [ids.index(1), ids.index(2), ids.index(3)]
    cy, cb, cr = (comps[i] for i in order)
    py, pb, pr = (planes[i] for i in order)
    for y in range(h):
        for x in range(w):
            Y = py[y * cy["cw"] + x] if cy["h"] == hmax and cy["v"] == vmax \
                else py[(y * cy["v"] // vmax) * cy["cw"]
                        + (x * cy["h"] // hmax)]
            B = pb[(y * cb["v"] // vmax) * cb["cw"] + (x * cb["h"] // hmax)]
            R = pr[(y * cr["v"] // vmax) * cr["cw"] + (x * cr["h"] // hmax)]
            r = Y + 1.402 * (R - 128)
            g = Y - 0.344136 * (B - 128) - 0.714136 * (R - 128)
            b = Y + 1.772 * (B - 128)
            i = 3 * (y * w + x)
            rgb[i] = 0 if r < 0 else (255 if r > 255 else int(r + 0.5))
            rgb[i + 1] = 0 if g < 0 else (255 if g > 255 else int(g + 0.5))
            rgb[i + 2] = 0 if b < 0 else (255 if b > 255 else int(b + 0.5))
    return w, h, 3, rgb


def jpeg_average_hash(payload: bytes):
    """payload -> signed 64-bit aHash, or None when out of baseline
    scope (progressive etc. — caller falls back to the fake)."""
    from torspider_spark.weblib.pngcodec import average_hash64

    decoded = decode_jpeg(payload)
    if decoded is None:
        return None
    return average_hash64(*decoded)
