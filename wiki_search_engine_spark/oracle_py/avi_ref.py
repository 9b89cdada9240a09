"""Independent AVI/MJPEG reference parser for the video_frames oracle
sidecar.

Shares NO code with operators/avi.py and takes a structurally different
route through the file: instead of walking the LIST tree, it locates
the mandatory ``idx1`` index chunk and resolves every frame through the
index's (offset, size) entries against the position of the ``movi``
fourcc — the way a seeking player would.  Header fields come from
scanning for the ``avih`` fourcc directly.  Frames are decoded with the
independent scalar JPEG decoder (oracle_py/jpeg_ref.py), so a correct
kernel matches this reference to the last double bit.
"""

from __future__ import annotations

import struct

from wiki_search_engine_spark.oracle_py import jpeg_ref


def _find_chunk(b: bytes, tag: bytes, start: int = 12) -> int:
    """Absolute offset of a top-level chunk's tag, walking the RIFF
    body linearly (plain scan — only used to anchor movi/idx1)."""
    pos = start
    while pos + 8 <= len(b):
        t = b[pos : pos + 4]
        size = struct.unpack("<I", b[pos + 4 : pos + 8])[0]
        if t == tag:
            return pos
        if t == b"LIST" and b[pos + 8 : pos + 12] == tag:
            return pos + 8
        pos += 8 + size + (size % 2)
    raise ValueError(f"no {tag!r} chunk")


def frames(b: bytes) -> tuple[list[bytes], int, int, int]:
    """(jpeg_frames, width, height, us_per_frame) resolved through the
    idx1 index."""
    if b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise ValueError("not AVI")
    ah = b.index(b"avih")
    us_per_frame, n_frames, width, height = struct.unpack(
        "<I", b[ah + 8 : ah + 12]
    )[0], struct.unpack("<I", b[ah + 24 : ah + 28])[0], struct.unpack(
        "<I", b[ah + 40 : ah + 44]
    )[0], struct.unpack("<I", b[ah + 44 : ah + 48])[0]
    movi = _find_chunk(b, b"movi")
    idx1 = _find_chunk(b, b"idx1")
    idx_size = struct.unpack("<I", b[idx1 + 4 : idx1 + 8])[0]
    out = []
    for e in range(idx1 + 8, idx1 + 8 + idx_size, 16):
        ckid, _flags, off, size = struct.unpack("<4sIII", b[e : e + 16])
        if ckid not in (b"00dc", b"00db"):
            continue
        chunk_tag_pos = movi + off
        assert b[chunk_tag_pos : chunk_tag_pos + 4] == ckid, "index desync"
        declared = struct.unpack(
            "<I", b[chunk_tag_pos + 4 : chunk_tag_pos + 8]
        )[0]
        assert declared == size, "index size disagrees with chunk"
        out.append(b[chunk_tag_pos + 8 : chunk_tag_pos + 8 + size])
    if len(out) != n_frames:
        raise ValueError("index frame count disagrees with header")
    return out, width, height, us_per_frame


def frame_features(b: bytes, every_n: int = 1) -> list[tuple[int, list[float]]]:
    """[(frame_idx, 12-double feature)] matching
    operators/avi.py avi_frame_features: [width, height, n_frames,
    us_per_frame] + jpeg_ref.features of the sampled frame."""
    fr, w, h, us_per_frame = frames(b)
    meta = [float(w), float(h), float(len(fr)), float(us_per_frame)]
    return [
        (i, meta + jpeg_ref.features(fr[i]))
        for i in range(0, len(fr), max(1, every_n))
    ]
