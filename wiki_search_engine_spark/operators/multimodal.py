"""Multimodal columns: opaque binary payloads + typed metadata.

The reference stores up to 10 images per page on disk and an
``images:[{image_id, image_path}]`` array in the doc store
(Crawler/crawler.py:326-361, mongodb_scripts/insertScript.py:76-92). At
100 TB scale the payloads live IN the table as ``binary`` columns with
typed metadata, and decode/feature steps run as Arrow-batched
``mapInPandas`` kernels over partition-local batches.

The container has no image/audio codecs, so the decode step is STUBBED:
``decode_image_features(..., fake=True)`` produces deterministic features
derived from the bytes (documented fake), and ``fake=False`` raises
NotImplementedError where a real decoder (PIL/torchvision) would plug in.
The Spark-side plumbing — schema, batch shape, partitioning — is real and
tested.
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


def synth_media(spark, n: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes)."""

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                h = hashlib.md5(f"{seed}|{i}".encode()).digest()
                payload = (h * ((64 + i % 192) // 16 + 1))[: 64 + i % 192]
                rows.append(
                    {
                        "media_id": i,
                        "doc_id": i % max(1, n // 4),
                        "kind": ["image", "audio", "video"][i % 3],
                        "payload": payload,
                        "width": 16 + (i % 32) * 4,
                        "height": 16 + (i % 24) * 4,
                        "n_bytes": len(payload),
                    }
                )
            yield pd.DataFrame(rows)

    return spark.range(0, n).mapInPandas(gen, schema=MEDIA_SCHEMA)


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
    """
    if not fake:
        raise NotImplementedError(
            "real image decoding requires PIL/torchvision; not available "
            "in this container — use fake=True (deterministic stub)"
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
    video = media.filter(F.col("kind") == "video")
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
