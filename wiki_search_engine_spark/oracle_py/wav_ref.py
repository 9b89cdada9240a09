"""Independent scalar WAV reference decoder for the audio_features
oracle sidecar.

Shares NO code with operators/wav.py: the RIFF/chunk walking and PCM
framing come from the stdlib ``wave`` module (a third implementation
neither side wrote), and every feature is computed with plain Python
loops over ``struct``-unpacked samples — no numpy.  The feature
definition is exact-integer (see operators/wav.py wav_features), so a
correct kernel matches this reference to the last double bit.
"""

from __future__ import annotations

import io
import struct
import wave


def features(b: bytes) -> list[float]:
    with wave.open(io.BytesIO(b), "rb") as w:
        channels = w.getnchannels()
        sample_rate = w.getframerate()
        width = w.getsampwidth()
        n_frames = w.getnframes()
        raw = w.readframes(n_frames)
    bits = width * 8
    if bits == 16:
        flat = list(struct.unpack(f"<{len(raw) // 2}h", raw))
    elif bits == 8:
        flat = [x - 128 for x in raw]
    else:
        raise ValueError(f"unsupported bits={bits}")
    # frames actually present may be fewer than declared if truncated;
    # the synth corpus never is, but recompute from the decoded bytes
    n_frames = len(flat) // channels
    total = 0
    total_abs = 0
    peak = 0
    for v in flat:
        total += v
        a = -v if v < 0 else v
        total_abs += a
        if a > peak:
            peak = a
    crossings = 0
    for ch in range(channels):
        prev_sign = None
        for i in range(n_frames):
            v = flat[i * channels + ch]
            sign = 1 if v >= 0 else -1
            if prev_sign is not None and sign != prev_sign:
                crossings += 1
            prev_sign = sign
    return [
        float(sample_rate),
        float(channels),
        float(n_frames),
        float(bits),
        float(total),
        float(total_abs),
        float(peak),
        float(crossings),
    ]
