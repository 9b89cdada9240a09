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
- ``decode_image_features`` — the CNN-embed slot. The container has no
  image codecs/model runtimes, so ``fake=True`` produces deterministic
  md5-derived stand-in features and ``fake=False`` raises
  NotImplementedError where a real decoder (PIL/torchvision) would plug
  into the same kernel signature.
"""

from __future__ import annotations

import hashlib

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
    big-endian, 8-bit RGBA) + filler standing in for the IDAT stream."""
    return (
        PNG_MAGIC
        + (13).to_bytes(4, "big")
        + b"IHDR"
        + int(w).to_bytes(4, "big")
        + int(h).to_bytes(4, "big")
        + b"\x08\x06\x00\x00\x00"
        + filler
    )


def gif_bytes(w: int, h: int, filler: bytes = b"") -> bytes:
    """GIF89a header: width/height little-endian in the logical screen
    descriptor."""
    return (
        b"GIF89a"
        + int(w).to_bytes(2, "little")
        + int(h).to_bytes(2, "little")
        + filler
    )


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
_BUILDERS = {"png": png_bytes, "jpeg": jpeg_bytes, "gif": gif_bytes}


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
    """Deterministic payload bytes for media_id ``i``: a valid image
    header wrapping seeded filler for images; tagged opaque seeded bytes
    for audio/video (the RAW0 prefix keeps random bytes from colliding
    with the 2-byte JPEG magic)."""
    _doc, kind, fmt, w, h = synth_spec(i, n)
    digest = hashlib.md5(f"{seed}|{i}".encode()).digest()
    filler = (digest * ((64 + i % 192) // 16 + 1))[: 64 + i % 192]
    if kind == "image":
        return _BUILDERS[fmt](w, h, filler)
    return b"RAW0" + filler


def synth_media(spark, n: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media table. Image payloads carry VALID
    PNG/JPEG/GIF headers (rotating by media_id) whose encoded dimensions
    are the width/height columns; audio/video payloads are opaque seeded
    bytes. All formulas live in synth_spec/synth_payload so expected
    values are recomputable without Spark."""

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
    marker walk to a SOF0/1/2/3 frame header. Unrecognized payloads ->
    ('raw', None, None); a truncated JPEG -> ('jpeg', None, None)."""
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


def decode_image_features(
    media: DataFrame, fake: bool = True, feature_dim: int = FEATURE_DIM
) -> DataFrame:
    """Binary payload -> feature vector, Arrow-batched.

    ``fake=True``: deterministic stand-in features (md5-derived floats) —
    the real decoder (PIL decode -> resize -> CNN embed) is not available
    in this environment and would drop into the same kernel signature.
    Header-level metadata (real) comes from ``decode_media_meta``.
    """
    if not fake:
        raise NotImplementedError(
            "real image decoding requires PIL/torchvision; not available "
            "in this container — use fake=True (deterministic stub) or "
            "decode_media_meta for real header-level metadata"
        )

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
