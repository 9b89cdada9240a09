"""Independent scalar baseline-JPEG decoder — the media_embed oracle
(jpeg rows).

Decodes the same baseline (SOF0, 1x1-sampled, Huffman) files as
operators/jpeg.py decode_jpeg_rgb but deliberately shares NO code with
it: a MINCODE/MAXCODE-per-length Huffman walk (ITU-T.81 figure F.16)
instead of a (length, code)->symbol dict, per-coefficient nested loops
for the IDCT instead of integer matmuls, and per-pixel color
conversion. What IS shared is the decode SPEC — the 2^17-scaled cosine
table, the ((acc + 2^35) >> 36) + 128 pixel rule, and the 16-bit YCbCr
constants — shared constants in the same sense as BM25's k1/b, so that
both decoders produce BIT-IDENTICAL pixels and therefore bit-identical
exact-integer-sum features. tests/test_textops.py pits the two against
each other over gradients, noise, grayscale, and restart intervals.
"""

from __future__ import annotations

import math

_ZZ = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# spec constants: alpha(u)*cos((2x+1)*u*pi/16) scaled by 2^17, rounded
# (recomputed here rather than copied as literals; both land on the
# same 64 integers because round/cos are deterministic doubles)
_COS = [
    [
        round(
            (1 / math.sqrt(2) if u == 0 else 1.0)
            * math.cos((2 * x + 1) * u * math.pi / 16)
            * 131072
        )
        for u in range(8)
    ]
    for x in range(8)
]


class _Huff:
    """Figure F.16 decoder state: per-length min/max codes + value
    pointer into the symbol list."""

    def __init__(self, counts: list[int], symbols: list[int]) -> None:
        self.symbols = symbols
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code = 0
        k = 0
        for ln in range(1, 17):
            if counts[ln - 1] == 0:
                self.maxcode[ln] = -1
            else:
                self.valptr[ln] = k
                self.mincode[ln] = code
                code += counts[ln - 1]
                k += counts[ln - 1]
                self.maxcode[ln] = code - 1
            code <<= 1


class _Reader:
    def __init__(self, data: bytes, pos: int) -> None:
        self.d = data
        self.pos = pos
        self.cur = 0
        self.nleft = 0

    def next_bit(self) -> int:
        if self.nleft == 0:
            if self.pos >= len(self.d):
                raise ValueError("out of data")
            byte = self.d[self.pos]
            self.pos += 1
            if byte == 0xFF:
                if self.pos >= len(self.d) or self.d[self.pos] != 0x00:
                    raise ValueError("marker inside entropy data")
                self.pos += 1
            self.cur = byte
            self.nleft = 8
        self.nleft -= 1
        return (self.cur >> self.nleft) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = v * 2 + self.next_bit()
        return v

    def sync_restart(self) -> None:
        self.nleft = 0
        if (
            self.pos + 1 < len(self.d)
            and self.d[self.pos] == 0xFF
            and 0xD0 <= self.d[self.pos + 1] <= 0xD7
        ):
            self.pos += 2
        else:
            raise ValueError("expected RST marker")


def _decode_sym(r: _Reader, t: _Huff) -> int:
    code = r.next_bit()
    ln = 1
    while code > t.maxcode[ln]:
        ln += 1
        if ln > 16:
            raise ValueError("bad Huffman code")
        code = code * 2 + r.next_bit()
    return t.symbols[t.valptr[ln] + (code - t.mincode[ln])]


def _ext(v: int, size: int) -> int:
    if size == 0:
        return 0
    if v < (1 << (size - 1)):
        v = v - (1 << size) + 1
    return v


def decode_rgb(b: bytes) -> tuple[int, int, list[int]]:
    """(w, h, flat RGB int list, row-major)."""
    if b[0] != 0xFF or b[1] != 0xD8:
        raise ValueError("not a JPEG")
    i = 2
    quant: dict[int, list[int]] = {}
    dc_tabs: dict[int, _Huff] = {}
    ac_tabs: dict[int, _Huff] = {}
    comps: list[tuple[int, int]] = []
    order: list[tuple[int, int, int]] = []
    width = height = None
    rsti = 0
    while True:
        if b[i] != 0xFF:
            raise ValueError("lost marker sync")
        m = b[i + 1]
        length = (b[i + 2] << 8) | b[i + 3]
        body = b[i + 4 : i + 2 + length]
        if m == 0xC0:
            if body[0] != 8:
                raise ValueError("only 8-bit")
            height = (body[1] << 8) | body[2]
            width = (body[3] << 8) | body[4]
            for c in range(body[5]):
                if body[7 + 3 * c] != 0x11:
                    raise ValueError("only 1x1 sampling")
                comps.append((body[6 + 3 * c], body[8 + 3 * c]))
        elif m in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                   0xCB, 0xCC, 0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline SOF0")
        elif m == 0xDB:
            j = 0
            while j < len(body):
                if body[j] >> 4:
                    raise ValueError("only 8-bit quant")
                quant[body[j] & 15] = list(body[j + 1 : j + 65])
                j += 65
        elif m == 0xC4:
            j = 0
            while j < len(body):
                cls, tid = body[j] >> 4, body[j] & 15
                counts = list(body[j + 1 : j + 17])
                total = sum(counts)
                syms = list(body[j + 17 : j + 17 + total])
                tab = _Huff(counts, syms)
                (ac_tabs if cls else dc_tabs)[tid] = tab
                j += 17 + total
        elif m == 0xDD:
            rsti = (body[0] << 8) | body[1]
        elif m == 0xDA:
            for c in range(body[0]):
                cid = body[1 + 2 * c]
                sel = body[2 + 2 * c]
                pos_c = [k for k, (q, _) in enumerate(comps) if q == cid]
                if not pos_c:
                    raise ValueError("scan comp missing")
                order.append((pos_c[0], sel >> 4, sel & 15))
            i = i + 2 + length
            break
        i += 2 + length
    if width is None or not order:
        raise ValueError("missing SOF/SOS")
    if width * height > (1 << 26):
        raise ValueError("too large")
    nbx = (width + 7) // 8
    nby = (height + 7) // 8
    r = _Reader(b, i)
    nc = len(comps)
    planes = [
        [[0] * (nbx * 8) for _ in range(nby * 8)] for _ in range(nc)
    ]
    pred = [0] * nc
    done = 0
    for by in range(nby):
        for bx in range(nbx):
            if rsti and done and done % rsti == 0:
                r.sync_restart()
                pred = [0] * nc
            done += 1
            for (ci, dsel, asel) in order:
                zz = [0] * 64
                t = _decode_sym(r, dc_tabs[dsel])
                diff = _ext(r.receive(t), t)
                pred[ci] += diff
                zz[0] = pred[ci]
                k = 1
                while k < 64:
                    rs = _decode_sym(r, ac_tabs[asel])
                    rr, ss = rs >> 4, rs & 15
                    if ss == 0:
                        if rr != 15:
                            break
                        k += 16
                    else:
                        k += rr
                        if k > 63:
                            raise ValueError("overrun")
                        zz[k] = _ext(r.receive(ss), ss)
                        k += 1
                q = quant[comps[ci][1]]
                block = [0] * 64
                for k in range(64):
                    block[_ZZ[k]] = zz[k] * q[k]
                for y in range(8):
                    for x in range(8):
                        acc = 0
                        for v in range(8):
                            for u in range(8):
                                acc += (
                                    block[v * 8 + u]
                                    * _COS[y][v]
                                    * _COS[x][u]
                                )
                        val = ((acc + (1 << 35)) >> 36) + 128
                        if val < 0:
                            val = 0
                        elif val > 255:
                            val = 255
                        planes[ci][by * 8 + y][bx * 8 + x] = val
    out: list[int] = []
    for y in range(height):
        for x in range(width):
            if nc == 1:
                g = planes[0][y][x]
                out += [g, g, g]
                continue
            yy = planes[0][y][x]
            cb = planes[1][y][x] - 128
            cr = planes[2][y][x] - 128
            red = yy + ((91881 * cr + 32768) >> 16)
            grn = (
                yy
                - ((22554 * cb + 32768) >> 16)
                - ((46802 * cr + 32768) >> 16)
            )
            blu = yy + ((116130 * cb + 32768) >> 16)
            out += [
                min(255, max(0, red)),
                min(255, max(0, grn)),
                min(255, max(0, blu)),
            ]
    return width, height, out


def features(b: bytes) -> list[float]:
    """Same 8-component definition as the PNG/GIF oracles: mean
    R/G/B/A (alpha 255) + 4-bin luma histogram, exact integer sums."""
    w, h, px = decode_rgb(b)
    n = w * h
    sums = [0, 0, 0]
    hist = [0, 0, 0, 0]
    for i in range(n):
        r, g, bl = px[3 * i : 3 * i + 3]
        sums[0] += r
        sums[1] += g
        sums[2] += bl
        hist[((r + g + bl) // 3) >> 6] += 1
    return [s / n for s in sums] + [255.0] + [c / n for c in hist]
