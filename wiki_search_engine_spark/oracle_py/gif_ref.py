"""Independent scalar GIF decoder — the media_embed oracle (gif rows).

Reference implementation for the ``media_embed`` sidecar: decodes the
same single-frame GIF87a/89a payloads as operators/multimodal.py
decode_gif_rgba but deliberately shares NO code with it — pure-Python
ints and lists, a bit-at-a-time LZW reader written straight from the
GIF89a specification (appendix F) and the interlace table from
appendix E — so a bug in the vectorized kernel cannot self-verify.
tests/test_textops.py also pits the two implementations against each
other over interlaced/transparent frames and adversarial streams.
"""

from __future__ import annotations


class _Bits:
    """LSB-first bit reader over the concatenated image sub-blocks."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.byte = 0
        self.bit = 0

    def read(self, n: int) -> int:
        v = 0
        for i in range(n):
            if self.byte >= len(self.data):
                raise ValueError("LZW stream ran out of bits")
            if (self.data[self.byte] >> self.bit) & 1:
                v |= 1 << i
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
        return v


def _lzw(data: bytes, mcs: int, expect: int) -> list[int]:
    clear = 1 << mcs
    end = clear + 1
    bits = _Bits(data)
    out: list[int] = []
    table: list[list[int]] = []
    width = 0
    prev: list[int] | None = None

    def fresh() -> None:
        nonlocal table, width, prev
        table = [[i] for i in range(clear)] + [[], []]
        width = mcs + 1
        prev = None

    fresh()
    while True:
        code = bits.read(width)
        if code == clear:
            fresh()
            continue
        if code == end:
            break
        if prev is None:
            if code >= clear:
                raise ValueError("first code must be a root")
            entry = list(table[code])
        elif code < len(table):
            entry = list(table[code])
        elif code == len(table):
            entry = prev + [prev[0]]
        else:
            raise ValueError("code beyond table")
        if prev is not None and len(table) < 4096:
            table.append(prev + [entry[0]])
            if len(table) == (1 << width) and width < 12:
                width += 1
        out.extend(entry)
        if len(out) > expect:
            raise ValueError("more pixels than declared")
        prev = entry
    return out


def decode_rgba(b: bytes) -> tuple[int, int, list[int]]:
    """(w, h, flat RGBA int list, row-major) for the first frame."""
    if b[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    flags = b[10]
    p = 13
    gct: list[tuple[int, int, int]] | None = None
    if flags & 0x80:
        count = 2 << (flags & 7)
        gct = [
            (b[p + 3 * j], b[p + 3 * j + 1], b[p + 3 * j + 2])
            for j in range(count)
        ]
        p += 3 * count
    alpha_idx = None
    while p < len(b):
        marker = b[p]
        if marker == 0x21:
            label = b[p + 1]
            p += 2
            blocks = []
            while b[p] != 0:
                blocks.append(b[p + 1 : p + 1 + b[p]])
                p += 1 + b[p]
            p += 1
            if label == 0xF9 and blocks and (blocks[0][0] & 1):
                alpha_idx = blocks[0][3]
            continue
        if marker == 0x3B:
            break
        if marker != 0x2C:
            raise ValueError("unexpected block")
        w = b[p + 5] | (b[p + 6] << 8)
        h = b[p + 7] | (b[p + 8] << 8)
        ip = b[p + 9]
        p += 10
        pal = gct
        if ip & 0x80:
            count = 2 << (ip & 7)
            pal = [
                (b[p + 3 * j], b[p + 3 * j + 1], b[p + 3 * j + 2])
                for j in range(count)
            ]
            p += 3 * count
        if pal is None:
            raise ValueError("no palette")
        mcs = b[p]
        p += 1
        data = bytearray()
        while b[p] != 0:
            data += b[p + 1 : p + 1 + b[p]]
            p += 1 + b[p]
        idx = _lzw(bytes(data), mcs, w * h)
        if len(idx) != w * h:
            raise ValueError("pixel count mismatch")
        if ip & 0x40:
            rows: list[int] = []
            for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
                y = start
                while y < h:
                    rows.append(y)
                    y += step
            shuffled = [[0] * w for _ in range(h)]
            for src, y in enumerate(rows):
                shuffled[y] = idx[src * w : (src + 1) * w]
            idx = [v for row in shuffled for v in row]
        out: list[int] = []
        for v in idx:
            r, g, bl = pal[v]
            out += [r, g, bl, 0 if v == alpha_idx else 255]
        return w, h, out
    raise ValueError("no frame")


def features(b: bytes) -> list[float]:
    """Same 8-component definition as the PNG oracle: mean R/G/B/A +
    4-bin luma histogram, every component an exact integer sum divided
    once by the pixel count."""
    w, h, px = decode_rgba(b)
    n = w * h
    sums = [0, 0, 0, 0]
    hist = [0, 0, 0, 0]
    for i in range(n):
        r, g, bl, a = px[4 * i : 4 * i + 4]
        sums[0] += r
        sums[1] += g
        sums[2] += bl
        sums[3] += a
        hist[((r + g + bl) // 3) >> 6] += 1
    return [s / n for s in sums] + [c / n for c in hist]
