"""Dependency-free AVI/MJPEG container codec for the video rows of the
media table.

Reference analogue: the reference crawler stores raw media payloads
alongside documents (Crawler/crawler.py:326-361); this module gives the
engine's ``video`` payloads the same treatment the image and audio
formats got — complete, decodable files from the synth builder and a
real decode path in the frame-sampling kernel — using only ``struct``
plus the repo's own baseline JPEG codec (operators/jpeg.py) for the
per-frame payloads.

Scope: single-stream motion-JPEG AVI (RIFF 'AVI ', one 'vids'/'MJPG'
stream, '00dc' frame chunks, idx1 index).  Anything else — stream-count
or frame-count lies, chunk sizes past the buffer, missing headers,
frame-count bombs — raises ValueError, which the Arrow kernel converts
to a NULL feature row; at corpus scale malformed media is a certainty.

The frame decode itself is the integer-exact JPEG decode spec, so the
independent reference parser (oracle_py/avi_ref.py — locates frames
through the idx1 index instead of walking 'movi', and decodes them with
the independent scalar JPEG decoder) matches the kernel bit-for-bit.
"""

from __future__ import annotations

import struct

import numpy as np

# no payload may declare more frames than this — bounds the decode loop
# before trusting any header field
MAX_FRAMES = 1 << 12

VIDEO_META_DIM = 4  # width, height, n_frames, us_per_frame
VIDEO_FEATURE_DIM = VIDEO_META_DIM + 8  # + per-frame rgba_features


def _chunk(tag: bytes, body: bytes) -> bytes:
    out = tag + struct.pack("<I", len(body)) + body
    if len(body) % 2:
        out += b"\x00"  # RIFF word alignment pad (outside declared size)
    return out


def _list(form: bytes, body: bytes) -> bytes:
    return b"LIST" + struct.pack("<I", len(body) + 4) + form + body


def avi_bytes_full(
    frames_rgb: list[np.ndarray],
    us_per_frame: int = 33333,
    gray: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """COMPLETE valid single-stream MJPG AVI: RIFF 'AVI ' +
    LIST hdrl (avih + LIST strl (strh 'vids'/'MJPG' + strf
    BITMAPINFOHEADER)) + LIST movi ('00dc' JPEG chunks, word-aligned) +
    idx1 (keyframe entries, offsets relative to the 'movi' fourcc).
    Every frame is encoded through the repo's baseline JPEG encoder
    (operators/jpeg.py jpeg_bytes_full); all frames must share one
    (h, w) geometry."""
    from wiki_search_engine_spark.operators.jpeg import jpeg_bytes_full

    if not frames_rgb:
        raise ValueError("at least one frame required")
    h, w = frames_rgb[0].shape[:2]
    payloads = []
    for f in frames_rgb:
        if f.shape[:2] != (h, w):
            raise ValueError("all frames must share one geometry")
        payloads.append(
            jpeg_bytes_full(f, gray=gray, restart_interval=restart_interval)
        )
    n = len(payloads)
    max_bytes = max(len(p) for p in payloads)

    avih = _chunk(
        b"avih",
        struct.pack(
            "<14I",
            us_per_frame,
            max_bytes * max(1, 1_000_000 // us_per_frame),
            0,  # padding granularity
            0x10,  # AVIF_HASINDEX
            n,
            0,  # initial frames
            1,  # streams
            max_bytes,
            w,
            h,
            0, 0, 0, 0,  # reserved
        ),
    )
    strh = _chunk(
        b"strh",
        struct.pack(
            "<4s4sIHHIIIIIIII4H",
            b"vids",
            b"MJPG",
            0, 0, 0, 0,  # flags, priority, language, initial frames
            1,  # scale
            max(1, round(1_000_000 / us_per_frame)),  # rate (fps)
            0,  # start
            n,  # length in frames
            max_bytes,
            0xFFFFFFFF,  # quality: default
            0,  # sample size (varies per frame)
            0, 0, w, h,  # rcFrame
        ),
    )
    strf = _chunk(
        b"strf",
        struct.pack(
            "<IiiHH4sIiiII",
            40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0,
        ),
    )
    hdrl = _list(b"hdrl", avih + _list(b"strl", strh + strf))

    movi_body = b""
    index_entries = []
    for p in payloads:
        # idx1 offsets point at the chunk tag, measured from the 'movi'
        # fourcc itself (so the first chunk is at offset 4)
        index_entries.append((4 + len(movi_body), len(p)))
        movi_body += _chunk(b"00dc", p)
    movi = _list(b"movi", movi_body)
    idx1 = _chunk(
        b"idx1",
        b"".join(
            struct.pack("<4sIII", b"00dc", 0x10, off, size)
            for off, size in index_entries
        ),
    )
    riff_body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def _walk(b: bytes, pos: int, end: int):
    """Yield (tag, body_start, size) over a RIFF chunk run, skipping pad
    bytes; raises ValueError when a declared size runs past ``end``."""
    while pos + 8 <= end:
        tag = b[pos : pos + 4]
        size = struct.unpack_from("<I", b, pos + 4)[0]
        body = pos + 8
        if body + size > end:
            raise ValueError("chunk size past end of enclosure")
        yield tag, body, size
        pos = body + size + (size % 2)


def decode_avi_frames(b: bytes) -> tuple[list[bytes], int, int, int]:
    """(jpeg_frames, width, height, us_per_frame) from a single-stream
    MJPG AVI.  Walks the LIST tree linearly — hdrl for avih/strh/strf,
    movi for '00dc'/'00db' frame chunks (the independent reference
    parser goes through idx1 instead) — and raises ValueError on any
    structural problem: multi-stream files, non-'vids'/'MJPG' streams,
    frame counts disagreeing between avih/strh/movi, counts above
    MAX_FRAMES, or sizes past the buffer."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    declared = struct.unpack_from("<I", b, 4)[0]
    end = min(len(b), 8 + declared)
    header = None  # (width, height, us_per_frame, n_frames)
    frames: list[bytes] | None = None
    for tag, body, size in _walk(b, 12, end):
        if tag != b"LIST" or size < 4:
            continue
        form = b[body : body + 4]
        if form == b"hdrl":
            header = _parse_hdrl(b, body + 4, body + size)
        elif form == b"movi":
            frames = [
                b[fb : fb + fs]
                for ft, fb, fs in _walk(b, body + 4, body + size)
                if ft in (b"00dc", b"00db")
            ]
            if len(frames) > MAX_FRAMES:
                raise ValueError("frame count above MAX_FRAMES")
    if header is None:
        raise ValueError("no hdrl list")
    if frames is None:
        raise ValueError("no movi list")
    w, h, us_per_frame, n_frames = header
    if len(frames) != n_frames:
        raise ValueError(
            f"movi has {len(frames)} frames, header declares {n_frames}"
        )
    return frames, w, h, us_per_frame


def _parse_hdrl(b: bytes, pos: int, end: int) -> tuple[int, int, int, int]:
    avih = strh = None
    for tag, body, size in _walk(b, pos, end):
        if tag == b"avih" and size >= 56:
            avih = struct.unpack_from("<14I", b, body)
        elif tag == b"LIST" and b[body : body + 4] == b"strl":
            for t2, b2, s2 in _walk(b, body + 4, body + size):
                if t2 == b"strh" and s2 >= 48:
                    strh = struct.unpack_from("<4s4sI", b, b2)
    if avih is None:
        raise ValueError("no avih header")
    us_per_frame, _mbps, _pad, _flags, n_frames, _init, streams = avih[:7]
    w, h = avih[8], avih[9]
    if streams != 1:
        raise ValueError(f"unsupported stream count {streams}")
    if strh is None:
        raise ValueError("no strh header")
    if strh[0] != b"vids" or strh[1] != b"MJPG":
        raise ValueError("not a single MJPG video stream")
    if n_frames > MAX_FRAMES:
        raise ValueError("declared frame count above MAX_FRAMES")
    if us_per_frame == 0:
        raise ValueError("zero frame duration")
    return w, h, us_per_frame, n_frames


def avi_frame_features(b: bytes, every_n: int = 1) -> list[tuple[int, list[float]]]:
    """[(frame_idx, feature)] for every ``every_n``-th frame: a
    12-double vector of container metadata ([width, height, n_frames,
    us_per_frame] — exact integers) followed by the frame's
    ``rgba_features`` through the integer-exact JPEG decode spec.  Any
    sampled frame failing to decode fails the whole payload (raises) —
    partial media is corrupt media."""
    from wiki_search_engine_spark.operators.jpeg import jpeg_pixel_features

    frames, w, h, us_per_frame = decode_avi_frames(b)
    meta = [float(w), float(h), float(len(frames)), float(us_per_frame)]
    return [
        (idx, meta + jpeg_pixel_features(frames[idx]))
        for idx in range(0, len(frames), max(1, every_n))
    ]
