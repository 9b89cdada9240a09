"""Independent scalar PNG decoder — the media_embed oracle.

Reference implementation for the ``media_embed`` sidecar: decodes the
same 8-bit RGBA PNGs as operators/multimodal.py decode_png_rgba but
deliberately shares NO code with it — pure-Python ints, per-byte loops,
the filters written straight from RFC 2083 §6.x prose — so a bug in the
vectorized kernel cannot self-verify. tests/test_textops.py also pits
the two implementations against each other over all five filter types.
"""

from __future__ import annotations

import struct
import zlib


def decode_rgba(b: bytes) -> tuple[int, int, list[int]]:
    """(w, h, flat RGBA byte list, row-major) for an 8-bit RGBA PNG."""
    if b[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos = 8
    w = h = None
    idat = b""
    while pos + 8 <= len(b):
        (ln,) = struct.unpack(">I", b[pos : pos + 4])
        tag = b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + ln]
        if tag == b"IHDR":
            w, h = struct.unpack(">II", data[:8])
            if data[8] != 8 or data[9] != 6 or data[12] != 0:
                raise ValueError("reference decoder covers 8-bit RGBA only")
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
        pos += 12 + ln
    raw = zlib.decompress(idat)
    bpp = 4
    stride = w * bpp + 1
    assert len(raw) == h * stride, "scanline size mismatch"
    out: list[int] = []
    prior = [0] * (w * bpp)
    for y in range(h):
        line = raw[y * stride : (y + 1) * stride]
        ftype = line[0]
        cur = list(line[1:])
        rec = [0] * (w * bpp)
        for x in range(w * bpp):
            a = rec[x - bpp] if x >= bpp else 0  # left
            bb = prior[x]  # up
            c = prior[x - bpp] if x >= bpp else 0  # upper-left
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = bb
            elif ftype == 3:
                pred = (a + bb) // 2
            elif ftype == 4:
                p = a + bb - c
                pa, pb, pc = abs(p - a), abs(p - bb), abs(p - c)
                if pa <= pb and pa <= pc:
                    pred = a
                elif pb <= pc:
                    pred = bb
                else:
                    pred = c
            else:
                raise ValueError(f"bad filter {ftype}")
            rec[x] = (cur[x] + pred) % 256
        out.extend(rec)
        prior = rec
    return w, h, out


def features(b: bytes) -> list[float]:
    """mean R/G/B/A + 4-bin luma histogram, normalized — the same
    exact-integer-sum definition as multimodal.png_pixel_features, so
    correct implementations agree to the last double bit."""
    w, h, px = decode_rgba(b)
    n = w * h
    sums = [0, 0, 0, 0]
    hist = [0, 0, 0, 0]
    for i in range(n):
        r, g, bl, a = px[4 * i], px[4 * i + 1], px[4 * i + 2], px[4 * i + 3]
        sums[0] += r
        sums[1] += g
        sums[2] += bl
        sums[3] += a
        hist[((r + g + bl) // 3) >> 6] += 1
    return [s / n for s in sums] + [c / n for c in hist]
