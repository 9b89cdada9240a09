"""Dependency-free RIFF/WAVE PCM codec for the audio rows of the media
table.

Reference analogue: the reference crawler stores raw media payloads
alongside documents (Crawler/crawler.py:326-361 downloads and stores
image files); this module gives the engine's opaque ``audio`` payloads
the same treatment the image formats got — complete, decodable files
from the synth builder and a real decode path in the feature kernel —
using only ``struct`` + numpy.

Scope: canonical PCM (format tag 1), 8-bit unsigned / 16-bit signed
little-endian, 1..8 channels.  Anything else (float/ADPCM/extensible,
truncated chunks, size lies) raises ValueError from the decoder, which
the Arrow kernel converts to a NULL feature row — at corpus scale
malformed media is a certainty, not an edge case.

The feature definition (``wav_features``) uses only exact integer
quantities (rates, counts, integer sums, peaks) so any two correct
decoders agree to the last double bit — the independent stdlib-``wave``
reference decoder (oracle_py/wav_ref.py, zero shared code) value-checks
the Spark kernel with no rounding tolerance.
"""

from __future__ import annotations

import struct

import numpy as np

# a declared data chunk may not expand past this many samples total —
# bounds allocation before trusting any size field (64 Mi samples)
MAX_SAMPLES = 1 << 26

AUDIO_FEATURE_DIM = 8


def wav_bytes_full(
    pcm: np.ndarray,
    sample_rate: int,
    bits: int = 16,
    info: bytes | None = None,
) -> bytes:
    """COMPLETE valid RIFF/WAVE file: RIFF header + fmt chunk
    [+ LIST/INFO chunk] + data chunk (word-aligned per RIFF: a pad byte
    follows an odd-sized data chunk).

    ``pcm``: (n_frames, channels) integer samples, SIGNED values in the
    sample domain (8-bit values are stored unsigned-offset per the WAV
    spec, i.e. sample + 128).  ``info`` injects a LIST chunk between
    fmt and data so readers must actually walk chunks rather than
    assume data at byte 36.
    """
    pcm = np.asarray(pcm)
    if pcm.ndim == 1:
        pcm = pcm[:, None]
    n_frames, channels = pcm.shape
    if bits == 16:
        body = pcm.astype("<i2").tobytes()
    elif bits == 8:
        body = (pcm.astype(np.int16) + 128).astype(np.uint8).tobytes()
    else:
        raise ValueError(f"unsupported bits={bits}")
    block_align = channels * (bits // 8)
    fmt = b"fmt " + struct.pack(
        "<IHHIIHH",
        16,
        1,  # WAVE_FORMAT_PCM
        channels,
        sample_rate,
        sample_rate * block_align,
        block_align,
        bits,
    )
    chunks = fmt
    if info is not None:
        payload = b"INFO" + b"INAM" + struct.pack("<I", len(info)) + info
        if len(payload) % 2:
            payload += b"\x00"
        chunks += b"LIST" + struct.pack("<I", len(payload)) + payload
    data = b"data" + struct.pack("<I", len(body)) + body
    if len(body) % 2:
        data += b"\x00"  # RIFF word alignment pad (outside declared size)
    riff_body = b"WAVE" + chunks + data
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def decode_wav_pcm(b: bytes) -> tuple[np.ndarray, int, int]:
    """(samples, sample_rate, bits) from a canonical PCM WAV payload.

    ``samples`` is (n_frames, channels) int32 in the SIGNED sample
    domain (8-bit data is re-centered by -128).  Walks the chunk list —
    fmt must precede data, unknown chunks (LIST, fact, ...) are skipped
    with their pad bytes — and raises ValueError on any structural
    problem: non-PCM format tags, bits not in {8, 16}, channel counts
    outside 1..8, chunk sizes past the buffer, data not aligned to
    whole frames, or declared sizes above MAX_SAMPLES.
    """
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt_info = None
    while pos + 8 <= len(b):
        tag = b[pos : pos + 4]
        size = struct.unpack_from("<I", b, pos + 4)[0]
        body_start = pos + 8
        if body_start + size > len(b):
            raise ValueError("chunk size past end of payload")
        if tag == b"fmt ":
            if size < 16:
                raise ValueError("fmt chunk too short")
            audio_format, channels, sample_rate, _br, block_align, bits = (
                struct.unpack_from("<HHIIHH", b, body_start)
            )
            if audio_format != 1:
                raise ValueError(f"not PCM (format tag {audio_format})")
            if bits not in (8, 16):
                raise ValueError(f"unsupported bits={bits}")
            if not 1 <= channels <= 8:
                raise ValueError(f"unsupported channels={channels}")
            if block_align != channels * (bits // 8):
                raise ValueError("block_align inconsistent with fmt")
            fmt_info = (channels, sample_rate, bits)
        elif tag == b"data":
            if fmt_info is None:
                raise ValueError("data chunk before fmt chunk")
            channels, sample_rate, bits = fmt_info
            width = bits // 8
            if size % (channels * width):
                raise ValueError("data size not whole frames")
            if size // width > MAX_SAMPLES:
                raise ValueError("declared data size too large")
            raw = b[body_start : body_start + size]
            if bits == 16:
                samples = np.frombuffer(raw, dtype="<i2").astype(np.int32)
            else:
                samples = (
                    np.frombuffer(raw, dtype=np.uint8).astype(np.int32) - 128
                )
            return samples.reshape(-1, channels), sample_rate, bits
        pos = body_start + size + (size % 2)  # skip RIFF pad byte
    raise ValueError("no data chunk")


def wav_features(b: bytes) -> list[float]:
    """8-double feature vector over a decoded PCM payload — every entry
    an exact integer so independent decoders match bit-for-bit:

    [sample_rate, channels, n_frames, bits,
     sum(samples), sum(|samples|), max(|samples|),
     zero_crossings] — crossings counted per channel between
    consecutive frames with sign(x) = 1 if x >= 0 else -1 (the exact
    rule oracle_py/wav_ref.py replays), summed over channels.
    """
    samples, sample_rate, bits = decode_wav_pcm(b)
    n_frames, channels = samples.shape
    s64 = samples.astype(np.int64)
    if n_frames >= 2:
        signs = np.where(samples >= 0, 1, -1)
        crossings = int(np.sum(signs[1:, :] != signs[:-1, :]))
    else:
        crossings = 0
    peak = int(np.abs(s64).max()) if n_frames else 0
    return [
        float(sample_rate),
        float(channels),
        float(n_frames),
        float(bits),
        float(int(s64.sum())),
        float(int(np.abs(s64).sum())),
        float(peak),
        float(crossings),
    ]
