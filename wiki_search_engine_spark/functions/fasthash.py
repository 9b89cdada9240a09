"""Vectorized MD5 (RFC 1321) over arrays of short strings.

The SimHash kernel (operators/dedup.py) needs the first 8 digest bytes
of md5(token) for every UNIQUE token in an Arrow batch. Per-token
``hashlib.md5`` calls were the kernel's residual Python cost (~1us of
interpreter overhead each, dwarfing the hash itself on 5-15 byte
tokens); md5 itself must stay because the DuckDB oracle replays the
identical values in SQL (md5 is the only cross-engine hash both Spark
and DuckDB expose).

This module computes the SAME md5 values with NumPy: messages of <= 55
bytes pad into a single 512-bit block — the padding (0x80 terminator,
zero fill, 8-byte little-endian bit length) is appended from a
precomputed 56-entry table during one bytes-join, so the padded buffer
is a single ``np.frombuffer`` with no scatter — and the 64 MD5 rounds
then run as a few uint32 array ops each across ALL messages at once.
Longer messages (rare for word tokens) fall back to hashlib per item.

Measured on the dev box (200k ~10-byte tokens): 0.13s vs 0.17s for the
hashlib loop — and the box is memory-bus-bound (see BENCH/BASELINE.md),
so the array-op advantage is larger on CPU-rich executors.

Correctness is pinned by tests/test_textops.py: byte-identical to
hashlib across lengths 0..70, unicode, and seeded fuzz.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np

# RFC 1321 constants: K[i] = floor(abs(sin(i+1)) * 2^32), per-round
# left-rotation amounts S, message-word schedule G.
_K = np.array(
    [int(abs(math.sin(i + 1)) * (1 << 32)) & 0xFFFFFFFF for i in range(64)],
    dtype=np.uint32,
)
_S = [7, 12, 17, 22] * 4 + [5, 9, 14, 20] * 4 + [4, 11, 16, 23] * 4 + [
    6, 10, 15, 21
] * 4
_G = (
    [i for i in range(16)]
    + [(5 * i + 1) % 16 for i in range(16, 32)]
    + [(3 * i + 5) % 16 for i in range(32, 48)]
    + [(7 * i) % 16 for i in range(48, 64)]
)

_INIT = (0x67452301, 0xEFCDAB89, 0x98BADCFE, 0x10325476)

# single-block limit: 55 message bytes + 0x80 pad + 8 length bytes = 64.
# _PADS[L] completes an L-byte message to its full padded block.
_ONE_BLOCK_MAX = 55
_PADS = [
    b"\x80" + bytes(_ONE_BLOCK_MAX - L) + (L * 8).to_bytes(8, "little")
    for L in range(_ONE_BLOCK_MAX + 1)
]


def _md5_single_block(buf: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(a, b) result words (init-added, pre-byteswap) for an (n, 64)
    uint8 array of fully padded single-block messages."""
    m = buf.view("<u4").reshape(len(buf), 16)
    # one contiguous copy per message word (16) instead of one strided
    # gather per round (64)
    mc = [np.ascontiguousarray(m[:, j]) for j in range(16)]
    a = np.full(len(buf), _INIT[0], dtype=np.uint32)
    b = np.full(len(buf), _INIT[1], dtype=np.uint32)
    c = np.full(len(buf), _INIT[2], dtype=np.uint32)
    d = np.full(len(buf), _INIT[3], dtype=np.uint32)
    for i in range(64):
        if i < 16:
            f = (b & c) | (~b & d)
        elif i < 32:
            f = (d & b) | (~d & c)
        elif i < 48:
            f = b ^ c ^ d
        else:
            f = c ^ (b | ~d)
        f = f + a + _K[i] + mc[_G[i]]
        a, d, c = d, c, b
        s = np.uint32(_S[i])
        b = b + ((f << s) | (f >> np.uint32(32 - s)))
    return a + np.uint32(_INIT[0]), b + np.uint32(_INIT[1])


def md5_prefix64(tokens) -> np.ndarray:
    """uint64 array: int.from_bytes(md5(t.encode()).digest()[:8], 'big')
    for each string t — byte-identical to hashlib, vectorized for
    single-block (<= 55 byte) messages; longer items fall back to
    hashlib individually."""
    data = [t.encode() for t in tokens]
    n = len(data)
    out = np.zeros(n, dtype=np.uint64)
    if not n:
        return out
    big = [i for i, d in enumerate(data) if len(d) > _ONE_BLOCK_MAX]
    if not big:
        joined = b"".join(d + _PADS[len(d)] for d in data)
        buf = np.frombuffer(joined, dtype=np.uint8).reshape(n, 64)
        a, b = _md5_single_block(buf)
        # digest[:8] == a.to_bytes(4,'le') + b.to_bytes(4,'le'); read
        # big-endian that is byteswap(a) << 32 | byteswap(b)
        return (a.byteswap().astype(np.uint64) << np.uint64(32)) | (
            b.byteswap().astype(np.uint64)
        )
    big_set = set(big)
    small = [i for i in range(n) if i not in big_set]
    if small:
        joined = b"".join(data[i] + _PADS[len(data[i])] for i in small)
        buf = np.frombuffer(joined, dtype=np.uint8).reshape(len(small), 64)
        a, b = _md5_single_block(buf)
        out[small] = (a.byteswap().astype(np.uint64) << np.uint64(32)) | (
            b.byteswap().astype(np.uint64)
        )
    for i in big:
        out[i] = int.from_bytes(hashlib.md5(data[i]).digest()[:8], "big")
    return out
