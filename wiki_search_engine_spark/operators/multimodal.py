"""Multimodal columns: opaque binary payloads + typed metadata.

The reference stores up to 10 images per page on disk and an
``images:[{image_id, image_path}]`` array in the doc store
(Crawler/crawler.py:326-361, mongodb_scripts/insertScript.py:76-92). At
100 TB scale the payloads live IN the table as ``binary`` columns with
typed metadata, and decode/feature steps run as Arrow-batched
``mapInPandas`` kernels over partition-local batches.

Two decode levels:

- ``decode_media_meta`` — REAL, codec-free header decoding: container
  format + pixel dimensions parsed from PNG (IHDR), JPEG (marker walk to
  SOF0/1/2/3), and GIF (logical screen descriptor) byte layouts, plus a
  payload md5. ``synth_media`` emits payloads with valid headers, so the
  kernel is value-checked end-to-end (driver entry ``media_features``
  against a sidecar oracle of independently expected rows).
- ``decode_image_features(fake=False)`` — REAL pixel decode for all
  three formats, dependency-free: PNG (stdlib zlib IDAT inflate + the
  full RFC 2083 unfilter set, ``decode_png_rgba``), GIF (bounded LZW +
  deinterlace + transparency, ``decode_gif_rgba``), and baseline JPEG
  (Huffman + integer-exact IDCT, ``operators/jpeg.py``), producing
  exact-integer-sum feature vectors (``rgba_features``) that the
  independent scalar decoders (oracle_py/{png,gif,jpeg}_ref.py)
  reproduce bit-for-bit (driver entry ``media_embed``). The only
  remaining stub is the CNN-embed slot itself (a learned model is not
  re-derivable); ``fake=True`` keeps the deterministic md5-derived
  stand-in features for plumbing tests over every payload kind.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, doc_id long, kind string, payload binary, "
    "width int, height int, n_bytes int"
)

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def png_bytes(w: int, h: int, filler: bytes = b"") -> bytes:
    """Minimal valid PNG prefix: magic + IHDR chunk (width/height
    big-endian, 8-bit RGBA) + filler standing in for the IDAT stream.
    Header-parse fixtures only; ``png_bytes_full`` emits a complete
    decodable file."""
    return (
        PNG_MAGIC
        + (13).to_bytes(4, "big")
        + b"IHDR"
        + int(w).to_bytes(4, "big")
        + int(h).to_bytes(4, "big")
        + b"\x08\x06\x00\x00\x00"
        + filler
    )


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    return (
        len(data).to_bytes(4, "big")
        + tag
        + data
        + (zlib.crc32(tag + data) & 0xFFFFFFFF).to_bytes(4, "big")
    )


def png_bytes_full(
    w: int, h: int, rgba: np.ndarray, filters: list[int] | None = None
) -> bytes:
    """COMPLETE valid 8-bit RGBA PNG (RFC 2083): magic + IHDR(+CRC) +
    one zlib IDAT of filtered scanlines + IEND. ``rgba``: (h, w, 4)
    uint8. ``filters``: per-scanline filter type (0..4, default all 0) —
    rows are ENCODED with the given filter, so a decoder must implement
    the full unfilter set to reconstruct the pixels. Filtering at
    ENCODE time is fully vectorized (each predictor reads only raw
    bytes of the current/previous raw scanline); it is the DECODER that
    carries the sequential dependency."""
    rgba = np.ascontiguousarray(rgba, dtype=np.uint8)
    if rgba.shape != (h, w, 4):
        raise ValueError(f"rgba shape {rgba.shape} != {(h, w, 4)}")
    filters = [0] * h if filters is None else list(filters)
    if len(filters) != h:
        raise ValueError("one filter type per scanline")
    bpp = 4
    raw = rgba.reshape(h, w * bpp).astype(np.int64)
    zeros = np.zeros(w * bpp, dtype=np.int64)
    out = np.zeros((h, w * bpp + 1), dtype=np.uint8)
    for y in range(h):
        cur = raw[y]
        prior = raw[y - 1] if y else zeros
        left = np.concatenate([np.zeros(bpp, np.int64), cur[:-bpp]])
        ul = np.concatenate([np.zeros(bpp, np.int64), prior[:-bpp]])
        f = int(filters[y])
        if f == 0:
            enc = cur
        elif f == 1:  # Sub
            enc = cur - left
        elif f == 2:  # Up
            enc = cur - prior
        elif f == 3:  # Average
            enc = cur - ((left + prior) >> 1)
        elif f == 4:  # Paeth
            p = left + prior - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - prior), np.abs(p - ul)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prior, ul)
            )
            enc = cur - pred
        else:
            raise ValueError(f"bad filter type {f}")
        out[y, 0] = f
        out[y, 1:] = (enc & 0xFF).astype(np.uint8)
    ihdr = (
        int(w).to_bytes(4, "big")
        + int(h).to_bytes(4, "big")
        + b"\x08\x06\x00\x00\x00"  # 8-bit, truecolor+alpha, no interlace
    )
    return (
        PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(out.tobytes(), 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_png_rgba(b: bytes) -> np.ndarray:
    """(h, w, 4) uint8 pixels from an 8-bit RGBA PNG — stdlib-only
    (zlib inflate + per-scanline unfilter, all five filter types).
    Raises ValueError for other bit depths / color types / interlacing
    (out of scope: the synth corpus emits truecolor-alpha, and this is
    the documented boundary of the dependency-free decoder).

    Unfilter cost model: None/Up are pure array ops; Sub is a per-lane
    cumsum; Average/Paeth carry PNG's inherent left-neighbor dependency,
    so they loop over pixels of one row (w iterations) with the 4 byte
    lanes vectorized."""
    if b[:8] != PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos = 8
    w = h = None
    idat: list[bytes] = []
    while pos + 8 <= len(b):
        ln = int.from_bytes(b[pos : pos + 4], "big")
        tag = b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + ln]
        if tag == b"IHDR":
            if len(data) < 13:
                raise ValueError("truncated IHDR chunk")
            w = int.from_bytes(data[0:4], "big")
            h = int.from_bytes(data[4:8], "big")
            depth, ctype, interlace = data[8], data[9], data[12]
            if (depth, ctype, interlace) != (8, 6, 0):
                raise ValueError(
                    f"unsupported PNG (depth={depth}, color={ctype}, "
                    f"interlace={interlace}): decoder covers 8-bit RGBA"
                )
            if w < 1 or h < 1 or w * h > (1 << 26):
                # zero-pixel images have no features; a declared
                # multi-hundred-megapixel image is outside the
                # dependency-free decoder's remit (and an allocation
                # bomb) either way
                raise ValueError(f"refusing PNG dimensions {w}x{h}")
        elif tag == b"IDAT":
            idat.append(data)
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if w is None or not idat:
        raise ValueError("truncated PNG (no IHDR/IDAT)")
    bpp = 4
    stride = w * bpp + 1
    # BOUNDED inflate: a crafted ~100KB zlib bomb would otherwise
    # materialize gigabytes before the size check below could reject it
    # — cap output at the exact expected scanline size and reject any
    # unconsumed input
    dec = zlib.decompressobj()
    raw = dec.decompress(b"".join(idat), h * stride)
    # re-feeding the unconsumed tail with a 1-byte cap distinguishes "a
    # trailer left to consume" (returns b'') from "more pixel data than
    # the header declared" (returns a byte)
    if len(raw) != h * stride or dec.decompress(dec.unconsumed_tail, 1):
        raise ValueError(
            f"IDAT size mismatch vs {h}x{stride} scanlines"
        )
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride)
    ftypes = arr[:, 0]
    lines = arr[:, 1:].astype(np.int64)
    out = np.zeros((h, w * bpp), dtype=np.int64)
    zeros = np.zeros(w * bpp, dtype=np.int64)
    for y in range(h):
        f = int(ftypes[y])
        cur = lines[y]
        prior = out[y - 1] if y else zeros
        if f == 0:
            rec = cur
        elif f == 1:  # Sub: per-lane cumulative sum mod 256
            rec = np.cumsum(cur.reshape(w, bpp), axis=0).reshape(-1) & 0xFF
        elif f == 2:  # Up
            rec = (cur + prior) & 0xFF
        elif f in (3, 4):  # Average / Paeth: sequential in x
            c2 = cur.reshape(w, bpp)
            pr = prior.reshape(w, bpp)
            rec2 = np.zeros((w, bpp), dtype=np.int64)
            left = np.zeros(bpp, dtype=np.int64)
            ul = np.zeros(bpp, dtype=np.int64)
            for x in range(w):
                if f == 3:
                    pred = (left + pr[x]) >> 1
                else:
                    p = left + pr[x] - ul
                    pa = np.abs(p - left)
                    pb = np.abs(p - pr[x])
                    pc = np.abs(p - ul)
                    pred = np.where(
                        (pa <= pb) & (pa <= pc),
                        left,
                        np.where(pb <= pc, pr[x], ul),
                    )
                rec2[x] = (c2[x] + pred) & 0xFF
                left = rec2[x]
                ul = pr[x]
            rec = rec2.reshape(-1)
        else:
            raise ValueError(f"bad filter type {f} on row {y}")
        out[y] = rec
    return out.astype(np.uint8).reshape(h, w, bpp)


def rgba_features(px: np.ndarray) -> list[float]:
    """8-float feature vector from (h, w, 4) uint8 pixels: mean R/G/B/A
    plus a 4-bin luma histogram (luma = (r+g+b)//3, bin = luma >> 6),
    all normalized by pixel count. Every component is an exact integer
    sum divided once by n_pixels, so any correct decoder of any format
    produces BIT-IDENTICAL doubles — the media_embed oracle sidecar
    relies on this (no fp-accumulation-order slack)."""
    px = px.reshape(-1, 4).astype(np.int64)
    n = px.shape[0]
    sums = px.sum(axis=0)
    luma = (px[:, 0] + px[:, 1] + px[:, 2]) // 3
    hist = np.bincount(luma >> 6, minlength=4)
    return [float(s) / n for s in sums] + [float(c) / n for c in hist]


def png_pixel_features(b: bytes) -> list[float]:
    """``rgba_features`` over a decoded 8-bit RGBA PNG."""
    return rgba_features(decode_png_rgba(b))


def gif_pixel_features(b: bytes) -> list[float]:
    """``rgba_features`` over the decoded first frame of a GIF (alpha
    255 except graphic-control transparent pixels)."""
    return rgba_features(decode_gif_rgba(b))


def gif_bytes(w: int, h: int, filler: bytes = b"") -> bytes:
    """GIF89a header: width/height little-endian in the logical screen
    descriptor."""
    return (
        b"GIF89a"
        + int(w).to_bytes(2, "little")
        + int(h).to_bytes(2, "little")
        + filler
    )


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _gif_interlace_order(h: int) -> list[int]:
    """Row output order of an interlaced GIF (89a spec appendix E):
    four passes at strides 8/8/4/2 starting at rows 0/4/2/1."""
    return [
        y for start, step in _GIF_INTERLACE_PASSES
        for y in range(start, h, step)
    ]


def _gif_lzw_compress(indices: np.ndarray, min_code_size: int) -> bytes:
    """GIF-variant LZW over palette indices: variable code width
    starting at min_code_size+1, LSB-first bit packing, CLEAR emitted
    up front and whenever the table reaches 4096 codes. The width-bump
    rule mirrors the decoder exactly — width grows when the table
    length hits 2^width — so encode/decode stay code-aligned at every
    position (round-trip pytest sweeps table growth past every
    boundary including a forced CLEAR)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {
        bytes([i]): i for i in range(clear)
    }
    avail = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    w = b""
    for k in indices.tolist():
        wk = w + bytes([k])
        if wk in table:
            w = wk
            continue
        emit(table[w], width)
        if avail < 4096:
            table[wk] = avail
            avail += 1
            # the decoder's table lags the encoder's by one entry (the
            # KwKwK lag), so its length at the matching stream position
            # is avail-1 — bump width exactly when IT crosses 2^width
            if avail - 1 == (1 << width) and width < 12:
                width += 1
        else:
            # table full: reset, exactly as the decoder will
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            avail = eoi + 1
            width = min_code_size + 1
        w = bytes([k])
    if w:
        emit(table[w], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _gif_lzw_decompress(
    data: bytes, min_code_size: int, max_pixels: int
) -> bytes:
    """Inverse of ``_gif_lzw_compress`` with the standard KwKwK
    (code == next-table-slot) rule. BOUNDED: output is capped at the
    declared pixel count — a crafted stream that keeps expanding past
    the image size is rejected instead of materialized (same posture as
    the PNG bounded inflate)."""
    if not 2 <= min_code_size <= 8:
        raise ValueError(f"bad LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    pos = 0
    nbits = 0
    acc = 0
    n = len(data)
    out = bytearray()
    table: list[bytes] = []
    width = min_code_size + 1
    prev: bytes | None = None

    def reset() -> None:
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        width = min_code_size + 1
        prev = None

    reset()
    while True:
        while nbits < width:
            if pos >= n:
                raise ValueError("truncated LZW stream (no EOI)")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            reset()
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table) or code >= clear:
                raise ValueError(f"bad first LZW code {code}")
            entry = table[code]
        else:
            if code < len(table) and code != eoi and code != clear:
                entry = table[code]
            elif code == len(table):
                entry = prev + prev[:1]  # KwKwK
            else:
                raise ValueError(f"LZW code {code} out of range")
            if len(table) < 4096:
                table.append(prev + entry[:1])
                if len(table) == (1 << width) and width < 12:
                    width += 1
        out += entry
        if len(out) > max_pixels:
            raise ValueError(
                f"LZW output exceeds declared {max_pixels} pixels"
            )
        prev = entry
    return bytes(out)


def gif_bytes_full(
    w: int,
    h: int,
    indices: np.ndarray,
    palette: np.ndarray,
    interlace: bool = False,
    transparent_index: int | None = None,
) -> bytes:
    """COMPLETE valid GIF89a (one frame): header + logical screen
    descriptor + 256-entry global color table + optional graphic
    control extension (transparency) + image descriptor + LZW-coded
    index stream in <=255-byte sub-blocks + trailer. ``indices``:
    (h, w) uint8 palette indices; ``palette``: (256, 3) uint8 RGB.
    ``interlace=True`` writes rows in the 4-pass interlaced order, so a
    decoder must implement deinterlacing to reconstruct the frame."""
    indices = np.ascontiguousarray(indices, dtype=np.uint8)
    palette = np.ascontiguousarray(palette, dtype=np.uint8)
    if indices.shape != (h, w):
        raise ValueError(f"indices shape {indices.shape} != {(h, w)}")
    if palette.shape != (256, 3):
        raise ValueError("palette must be (256, 3) uint8")
    out = bytearray(b"GIF89a")
    out += int(w).to_bytes(2, "little") + int(h).to_bytes(2, "little")
    out.append(0xF7)  # GCT present, 8-bit color resolution, 256 entries
    out += b"\x00\x00"  # background index, aspect ratio
    out += palette.tobytes()
    if transparent_index is not None:
        out += bytes(
            [0x21, 0xF9, 0x04, 0x01, 0x00, 0x00,
             int(transparent_index), 0x00]
        )
    out.append(0x2C)  # image descriptor
    out += b"\x00\x00\x00\x00"  # left, top
    out += int(w).to_bytes(2, "little") + int(h).to_bytes(2, "little")
    out.append(0x40 if interlace else 0x00)  # no LCT
    rows = indices[_gif_interlace_order(h)] if interlace else indices
    lzw = _gif_lzw_compress(rows.reshape(-1), 8)
    out.append(8)  # LZW min code size
    for i in range(0, len(lzw), 255):
        block = lzw[i : i + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3b"  # block terminator, trailer
    return bytes(out)


def decode_gif_rgba(b: bytes) -> np.ndarray:
    """(h, w, 4) uint8 pixels from the FIRST frame of a GIF87a/89a —
    stdlib-only: block walk (extensions skipped, graphic-control
    transparency honored), global/local color table, bounded LZW
    decode, 4-pass deinterlace. Raises ValueError on truncated or
    out-of-spec payloads (no color table, dimension lies, LZW
    overruns); frames smaller than the logical screen are decoded at
    their own size (the feature contract is per-frame, not composited
    — multi-frame animation compositing is out of the dependency-free
    decoder's scope)."""
    if len(b) < 13 or b[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    packed = b[10]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(b[pos : pos + 3 * n], dtype=np.uint8)
        if gct.size != 3 * n:
            raise ValueError("truncated global color table")
        gct = gct.reshape(n, 3)
        pos += 3 * n
    transparent = None
    while pos < len(b):
        block = b[pos]
        if block == 0x21:  # extension
            if pos + 2 > len(b):
                raise ValueError("truncated extension block")
            label = b[pos + 1]
            pos += 2
            sub = []
            while True:
                if pos >= len(b):
                    raise ValueError("truncated extension sub-blocks")
                ln = b[pos]
                pos += 1
                if ln == 0:
                    break
                sub.append(b[pos : pos + ln])
                pos += ln
            if label == 0xF9 and sub and len(sub[0]) >= 4:
                if sub[0][0] & 0x01:
                    transparent = sub[0][3]
        elif block == 0x2C:  # image descriptor: the frame
            if pos + 10 > len(b):
                raise ValueError("truncated image descriptor")
            w = int.from_bytes(b[pos + 5 : pos + 7], "little")
            h = int.from_bytes(b[pos + 7 : pos + 9], "little")
            ipacked = b[pos + 9]
            pos += 10
            pal = gct
            if ipacked & 0x80:  # local color table wins
                n = 2 << (ipacked & 0x07)
                pal = np.frombuffer(
                    b[pos : pos + 3 * n], dtype=np.uint8
                )
                if pal.size != 3 * n:
                    raise ValueError("truncated local color table")
                pal = pal.reshape(n, 3)
                pos += 3 * n
            if pal is None:
                raise ValueError("GIF frame has no color table")
            if w < 1 or h < 1 or w * h > (1 << 26):
                raise ValueError(f"refusing GIF dimensions {w}x{h}")
            if pos >= len(b):
                raise ValueError("truncated before LZW data")
            mcs = b[pos]
            pos += 1
            chunks = []
            while True:
                if pos >= len(b):
                    raise ValueError("truncated LZW sub-blocks")
                ln = b[pos]
                pos += 1
                if ln == 0:
                    break
                chunks.append(b[pos : pos + ln])
                pos += ln
            idx = _gif_lzw_decompress(b"".join(chunks), mcs, w * h)
            if len(idx) != w * h:
                raise ValueError(
                    f"LZW yielded {len(idx)} of {w * h} pixels"
                )
            arr = np.frombuffer(idx, dtype=np.uint8)
            if arr.max(initial=0) >= pal.shape[0]:
                raise ValueError("palette index out of range")
            arr = arr.reshape(h, w)
            if ipacked & 0x40:  # deinterlace
                dst = np.empty_like(arr)
                dst[_gif_interlace_order(h)] = arr
                arr = dst
            rgba = np.empty((h, w, 4), dtype=np.uint8)
            rgba[:, :, :3] = pal[arr]
            rgba[:, :, 3] = 255
            if transparent is not None and transparent < pal.shape[0]:
                rgba[:, :, 3][arr == transparent] = 0
            return rgba
        elif block == 0x3B:  # trailer before any frame
            break
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    raise ValueError("GIF contains no image frame")


def jpeg_bytes(w: int, h: int, filler: bytes = b"") -> bytes:
    """JPEG: SOI + APP0(JFIF) + SOF0 (height then width, big-endian) +
    SOS marker + filler entropy data + EOI. The APP0 segment makes the
    parser actually walk markers rather than find SOF at a fixed
    offset."""
    app0 = (
        b"\xff\xe0"
        + (16).to_bytes(2, "big")
        + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    )
    sof0 = (
        b"\xff\xc0"
        + (11).to_bytes(2, "big")
        + b"\x08"
        + int(h).to_bytes(2, "big")
        + int(w).to_bytes(2, "big")
        + b"\x01\x11\x00"
    )
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xda" + filler + b"\xff\xd9"


IMAGE_FORMATS = ("png", "jpeg", "gif")


def synth_spec(i: int, n: int) -> tuple[int, str, str | None, int | None,
                                        int | None]:
    """Deterministic per-id media spec: (doc_id, kind, format, width,
    height). Shared by the Spark-side synth and the oracle-side expected
    rows (the CHECK is that build -> distribute -> parse round-trips the
    encoded values through the Arrow binary plumbing)."""
    kind = ["image", "audio", "video"][i % 3]
    doc_id = i % max(1, n // 4)
    if kind != "image":
        return doc_id, kind, None, None, None
    fmt = IMAGE_FORMATS[(i // 3) % 3]
    return doc_id, kind, fmt, 16 + (i % 32) * 4, 16 + (i % 24) * 4


def synth_payload(i: int, n: int, seed: int = 42) -> bytes:
    """Deterministic payload bytes for media_id ``i``. PNG payloads are
    COMPLETE decodable files: seeded pixel bytes wrapped through
    png_bytes_full with the scanline filter type cycling (i+y) % 5, so
    every filter of the unfilter set is exercised end-to-end. GIF
    payloads are likewise complete LZW-coded files (seeded 256-color
    palette + indices, interlace on every other gif, transparency on
    every third) so deinterlace and alpha handling are exercised too;
    JPEG payloads are complete baseline files (seeded RGB through the
    real FDCT/Huffman encoder, grayscale every fifth, restart
    intervals cycling 0/3/6/9) so entropy decode, DRI resync, and both
    color modes are exercised. Audio payloads are complete RIFF/WAVE
    PCM files (seeded samples, rate/channels/bit-depth cycling per
    (i//3), LIST chunks on every other file so parsers must walk
    chunks, odd data sizes exercising RIFF pad bytes). Video payloads
    are complete single-stream MJPG AVIs (2-5 seeded JPEG frames,
    geometry/fps/grayscale/restart-interval cycling per (i//3))."""
    _doc, kind, fmt, w, h = synth_spec(i, n)
    digest = hashlib.md5(f"{seed}|{i}".encode()).digest()
    if kind == "image" and fmt == "png":
        npx = w * h * 4
        raw = (digest * (npx // 16 + 1))[:npx]
        rgba = np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 4)
        return png_bytes_full(
            w, h, rgba, [(i + y) % 5 for y in range(h)]
        )
    if kind == "image" and fmt == "gif":
        raw = (digest * (w * h // 16 + 1))[: w * h]
        indices = np.frombuffer(raw, dtype=np.uint8).reshape(h, w)
        pal_raw = hashlib.md5(f"{seed}|pal|{i}".encode()).digest()
        palette = np.frombuffer(
            (pal_raw * (768 // 16 + 1))[:768], dtype=np.uint8
        ).reshape(256, 3)
        return gif_bytes_full(
            w, h, indices, palette,
            interlace=(i % 2 == 0),
            transparent_index=(i % 256) if i % 3 == 0 else None,
        )
    if kind == "image" and fmt == "jpeg":
        from wiki_search_engine_spark.operators.jpeg import (
            jpeg_bytes_full,
        )

        npx = w * h * 3
        raw = (digest * (npx // 16 + 1))[:npx]
        rgb = np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)
        return jpeg_bytes_full(
            rgb,
            gray=(i % 5 == 0),
            restart_interval=(i % 4) * 3,  # 0 (none), 3, 6, 9 MCUs
        )
    if kind == "audio":
        from wiki_search_engine_spark.operators.wav import wav_bytes_full

        k = i // 3  # audio-local index: i % 3 == 1 for every audio row
        sample_rate = (8000, 16000, 22050, 44100)[k % 4]
        channels = 1 + (k % 2)
        bits = 8 if k % 5 == 0 else 16
        n_frames = 40 + i % 37
        need = n_frames * channels * 2
        raw = (digest * (need // 16 + 1))[:need]
        pcm = np.frombuffer(raw, dtype="<i2").astype(np.int32)
        if bits == 8:
            pcm = pcm % 256 - 128  # deterministic signed 8-bit domain
        pcm = pcm.reshape(n_frames, channels)
        info = f"synth media {i}".encode() if k % 2 == 0 else None
        return wav_bytes_full(pcm, sample_rate, bits=bits, info=info)
    if kind == "video":
        from wiki_search_engine_spark.operators.avi import avi_bytes_full

        k = i // 3  # video-local index: i % 3 == 2 for every video row
        vw = 16 + (k % 3) * 8
        vh = 16 + (k % 2) * 8
        n_frames = 2 + k % 4
        need = n_frames * vw * vh * 3
        raw = (digest * (need // 16 + 1))[:need]
        frames = list(
            np.frombuffer(raw, dtype=np.uint8).reshape(n_frames, vh, vw, 3)
        )
        return avi_bytes_full(
            frames,
            us_per_frame=(33333, 40000, 66667, 100000)[k % 4],
            gray=(k % 7 == 0),
            restart_interval=(k % 3) * 2,
        )
    raise AssertionError(f"unhandled synth kind {kind}")  # unreachable


def synth_media(spark, n: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media table. Image payloads carry VALID
    PNG/JPEG/GIF headers (rotating by media_id) whose encoded dimensions
    are the width/height columns; audio payloads are complete RIFF/WAVE
    PCM files; video payloads are complete MJPG AVIs. All formulas
    live in synth_spec/synth_payload so expected values are
    recomputable without Spark."""

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                doc_id, kind, _fmt, w, h = synth_spec(i, n)
                payload = synth_payload(i, n, seed)
                rows.append(
                    {
                        "media_id": i,
                        "doc_id": doc_id,
                        "kind": kind,
                        "payload": payload,
                        "width": w,
                        "height": h,
                        "n_bytes": len(payload),
                    }
                )
            yield pd.DataFrame(rows)

    return spark.range(0, n).mapInPandas(gen, schema=MEDIA_SCHEMA)


def parse_media_header(b: bytes) -> tuple[str, int | None, int | None]:
    """(format, width, height) from raw bytes — pure byte-layout
    parsing, no codec: PNG IHDR, GIF logical screen descriptor, JPEG
    marker walk to a SOF0/1/2/3 frame header, RIFF form types (WAVE ->
    'wav', 'AVI ' -> 'avi'). Unrecognized payloads ->
    ('raw', None, None); a truncated JPEG -> ('jpeg', None, None)."""
    if len(b) >= 12 and b[:4] == b"RIFF":
        if b[8:12] == b"WAVE":
            return "wav", None, None
        if b[8:12] == b"AVI ":
            return "avi", None, None
        return "raw", None, None
    if len(b) >= 24 and b[:8] == PNG_MAGIC and b[12:16] == b"IHDR":
        return (
            "png",
            int.from_bytes(b[16:20], "big"),
            int.from_bytes(b[20:24], "big"),
        )
    if len(b) >= 10 and b[:6] in (b"GIF87a", b"GIF89a"):
        return (
            "gif",
            int.from_bytes(b[6:8], "little"),
            int.from_bytes(b[8:10], "little"),
        )
    if len(b) >= 2 and b[:2] == b"\xff\xd8":
        i = 2
        while i + 4 <= len(b):
            if b[i] != 0xFF:
                break
            marker = b[i + 1]
            if marker == 0xD9:  # EOI
                break
            if marker in (0x01, 0xD8) or 0xD0 <= marker <= 0xD7:
                i += 2  # parameterless markers
                continue
            seglen = int.from_bytes(b[i + 2 : i + 4], "big")
            if seglen < 2:
                break
            if marker in (0xC0, 0xC1, 0xC2, 0xC3):  # SOF frame header
                if i + 9 <= len(b):
                    return (
                        "jpeg",
                        int.from_bytes(b[i + 7 : i + 9], "big"),
                        int.from_bytes(b[i + 5 : i + 7], "big"),
                    )
                break
            if marker == 0xDA:  # SOS: entropy data follows, stop walking
                break
            i += 2 + seglen
        return "jpeg", None, None
    return "raw", None, None


META_SCHEMA = (
    "media_id long, kind string, format string, width int, height int, "
    "n_bytes int, payload_md5 string"
)


def decode_media_meta(media: DataFrame) -> DataFrame:
    """Binary payload -> typed metadata (format, width, height, md5),
    Arrow-batched. Header parsing is inherently per-payload, but each
    parse touches <= ~64 bytes and allocates nothing — the batch
    boundary (Arrow transfer, no per-row Python UDF) is where the cost
    lives at scale."""

    def kernel(batches):
        for pdf in batches:
            fmts, widths, heights, md5s = [], [], [], []
            for payload in pdf["payload"]:
                b = bytes(payload)
                fmt, w, h = parse_media_header(b)
                fmts.append(fmt)
                widths.append(w)
                heights.append(h)
                md5s.append(hashlib.md5(b).hexdigest())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "format": fmts,
                    "width": pd.array(widths, dtype="Int32"),
                    "height": pd.array(heights, dtype="Int32"),
                    "n_bytes": pdf["n_bytes"],
                    "payload_md5": md5s,
                }
            )

    return media.select(
        "media_id", "kind", "n_bytes", "payload"
    ).mapInPandas(kernel, schema=META_SCHEMA)


FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes int, payload_md5 string, "
    "feature array<float>"
)

FEATURE_DIM = 8


EMBED_SCHEMA = (
    "media_id long, kind string, format string, n_bytes int, "
    "payload_md5 string, feature array<double>"
)


def decode_image_features(
    media: DataFrame, fake: bool = True, feature_dim: int = FEATURE_DIM
) -> DataFrame:
    """Binary payload -> feature vector, Arrow-batched.

    ``fake=False`` (REAL pixel decode): PNG payloads are fully decoded
    dependency-free — stdlib zlib IDAT inflate + per-scanline unfilter
    (all five RFC 2083 filter types, decode_png_rgba) — GIF payloads
    likewise (bounded LZW + 4-pass deinterlace + transparency,
    decode_gif_rgba), and baseline JPEGs too (DQT/DHT/SOF0/SOS parse,
    canonical Huffman, integer-exact IDCT — operators/jpeg.py) — into
    an 8-double feature vector (rgba_features: mean RGBA + 4-bin luma
    histogram), schema EMBED_SCHEMA. Non-baseline JPEG variants
    (progressive/subsampled/12-bit) and unrecognized formats carry
    feature = NULL. A production CNN embed (decode -> resize -> model)
    drops into this same kernel signature; the learned model itself is
    the one genuinely environment-bound slot.

    ``fake=True``: deterministic md5-derived stand-in floats for every
    payload (schema FEATURE_SCHEMA) — the plumbing-only mode used where
    tests need features for non-PNG media too. Header-level metadata
    (always real) comes from ``decode_media_meta``.
    """
    if not fake:

        def kernel_real(batches):
            import zlib

            for pdf in batches:
                fmts, md5s, feats = [], [], []
                from wiki_search_engine_spark.operators.jpeg import (
                    jpeg_pixel_features,
                )

                for payload in pdf["payload"]:
                    b = bytes(payload)
                    md5s.append(hashlib.md5(b).hexdigest())
                    fmt, _w, _h = parse_media_header(b)
                    fmts.append(fmt)
                    if fmt == "png":
                        decode = png_pixel_features
                    elif fmt == "gif":
                        decode = gif_pixel_features
                    elif fmt == "jpeg":
                        decode = jpeg_pixel_features
                    else:
                        feats.append(None)
                        continue
                    # a corrupt payload (truncated IDAT/IHDR/LZW, bad
                    # filter byte, unsupported color type, declared-size
                    # lies) must yield a NULL feature row, never kill
                    # the job — at corpus scale malformed media is a
                    # certainty, not an edge case, and there is no
                    # enumeration of the ways bytes can be wrong (hence
                    # the broad except around the side-effect-free
                    # decode)
                    try:
                        feats.append(decode(b))
                    except Exception:
                        feats.append(None)
                yield pd.DataFrame(
                    {
                        "media_id": pdf["media_id"],
                        "kind": pdf["kind"],
                        "format": fmts,
                        "n_bytes": pdf["n_bytes"],
                        "payload_md5": md5s,
                        "feature": feats,
                    }
                )

        return media.select(
            "media_id", "kind", "n_bytes", "payload"
        ).mapInPandas(kernel_real, schema=EMBED_SCHEMA)

    def kernel(batches):
        for pdf in batches:
            feats, md5s = [], []
            for payload in pdf["payload"]:
                b = bytes(payload)
                digest = hashlib.md5(b).digest()
                md5s.append(digest.hex())
                raw = np.frombuffer(
                    (digest * ((feature_dim * 4) // 16 + 1))[
                        : feature_dim * 4
                    ],
                    dtype=np.uint8,
                ).astype(np.float32)
                feats.append(
                    (raw.reshape(feature_dim, 4).mean(axis=1) / 255.0)
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["n_bytes"],
                    "payload_md5": md5s,
                    "feature": feats,
                }
            )

    return media.select(
        "media_id", "kind", "n_bytes", "payload"
    ).mapInPandas(kernel, schema=FEATURE_SCHEMA)


def decode_audio_features(media: DataFrame) -> DataFrame:
    """Binary audio payload -> 8-double feature vector (rate, channels,
    frames, bits, integer sum / abs-sum / peak, zero-crossings),
    Arrow-batched, schema EMBED_SCHEMA.  The decode is the real
    dependency-free RIFF/WAVE PCM codec (operators/wav.py) — chunk
    walk, 8/16-bit framing, pad bytes — and the feature definition is
    exact-integer, so the independent stdlib-``wave`` reference decoder
    (oracle_py/wav_ref.py) matches bit-for-bit.  Non-WAV and corrupt
    payloads carry feature = NULL, never a failed job."""
    from wiki_search_engine_spark.operators.wav import wav_features

    def kernel(batches):
        for pdf in batches:
            fmts, md5s, feats = [], [], []
            for payload in pdf["payload"]:
                b = bytes(payload)
                md5s.append(hashlib.md5(b).hexdigest())
                fmt, _w, _h = parse_media_header(b)
                fmts.append(fmt)
                if fmt != "wav":
                    feats.append(None)
                    continue
                try:
                    feats.append(wav_features(b))
                except Exception:
                    feats.append(None)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "format": fmts,
                    "n_bytes": pdf["n_bytes"],
                    "payload_md5": md5s,
                    "feature": feats,
                }
            )

    return media.select(
        "media_id", "kind", "n_bytes", "payload"
    ).mapInPandas(kernel, schema=EMBED_SCHEMA)


FRAME_SCHEMA = (
    "media_id long, kind string, format string, n_bytes int, "
    "frame_idx int, feature array<double>"
)


def decode_video_features(media: DataFrame, every_n: int = 1) -> DataFrame:
    """REAL frame sampling: binary video payload -> one row per
    sampled frame (every ``every_n``-th), Arrow-batched, schema
    FRAME_SCHEMA.  The container decode is the dependency-free
    AVI/MJPG parser (operators/avi.py); each sampled frame goes through
    the integer-exact JPEG decode spec into a 12-double vector
    (container meta [w, h, n_frames, us_per_frame] + rgba_features),
    so the independent idx1-based reference parser
    (oracle_py/avi_ref.py) matches bit-for-bit.  Non-AVI and corrupt
    payloads carry one row with frame_idx/feature NULL — visible, never
    a failed job."""
    from wiki_search_engine_spark.operators.avi import avi_frame_features

    def kernel(batches):
        for pdf in batches:
            rows = []
            for mid, kind, nb, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["n_bytes"], pdf["payload"]
            ):
                b = bytes(payload)
                fmt, _w, _h = parse_media_header(b)
                base = {
                    "media_id": mid,
                    "kind": kind,
                    "format": fmt,
                    "n_bytes": nb,
                }
                if fmt != "avi":
                    rows.append({**base, "frame_idx": None, "feature": None})
                    continue
                try:
                    feats = avi_frame_features(b, every_n=every_n)
                except Exception:
                    feats = None
                if feats is None:
                    rows.append({**base, "frame_idx": None, "feature": None})
                else:
                    rows.extend(
                        {**base, "frame_idx": idx, "feature": f}
                        for idx, f in feats
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "kind", "format", "n_bytes", "frame_idx",
                    "feature",
                ],
            )

    return media.select(
        "media_id", "kind", "n_bytes", "payload"
    ).mapInPandas(kernel, schema=FRAME_SCHEMA)


def frame_sample(media: DataFrame, every_n_bytes: int = 32) -> DataFrame:
    """'Frame sampling' plumbing demo: one output row per sampled offset of
    each video payload (explode pattern for frame extraction)."""
    # n_bytes == 0 would make sequence(0, -1, step) throw at runtime --
    # an empty payload yields zero frames, not a failed job
    video = media.filter(
        (F.col("kind") == "video") & (F.col("n_bytes") > 0)
    )
    offsets = F.sequence(
        F.lit(0), F.col("n_bytes") - 1, F.lit(every_n_bytes)
    )
    return video.select(
        "media_id",
        F.explode(offsets).alias("frame_offset"),
    ).withColumn(
        "frame_id",
        F.concat_ws(":", F.col("media_id"), F.col("frame_offset")),
    )
