"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as `binary` columns with a typed
metadata struct. The Spark-side plumbing — schema, partition sizing, Arrow
batch shape, UDF signatures — is real and tested; the actual media decode is
STUBBED (this container ships no imaging/audio libraries): decode functions
raise NotImplementedError unless `fake=True`, in which case a deterministic
fake decoder (seeded from the payload hash) produces stable features so the
downstream plumbing is exercisable end-to-end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

MEDIA_SCHEMA = (
    "media_id string, kind string, payload binary, "
    "meta struct<width:int, height:int, duration_ms:int, codec:string>"
)

FEATURE_SCHEMA = "media_id string, kind string, feat array<float>, feat_dim int"


def synth_media(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (binary payload = seeded bytes)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        h = hashlib.sha256(f"{seed}:{i}".encode()).digest()
        payload = h * 4  # 128 bytes of deterministic "media"
        kind = kinds[i % 3]
        rows.append(
            (
                f"m{i:05d}",
                kind,
                bytearray(payload),
                {
                    "width": 64 + (i % 8) * 16 if kind == "image" else None,
                    "height": 64 + (i % 5) * 16 if kind == "image" else None,
                    "duration_ms": 1000 + i * 37 if kind != "image" else None,
                    "codec": {"image": "png", "audio": "opus", "video": "av1"}[kind],
                },
            )
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def _fake_decode(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic fake feature vector derived from the payload digest."""
    h = hashlib.sha256(payload).digest()
    seed = int.from_bytes(h[:8], "little", signed=False) % (2**32)
    rng = np.random.RandomState(seed)
    v = rng.randn(dim).astype(np.float32)
    return v / np.linalg.norm(v)


def extract_features(
    media: DataFrame, dim: int = 16, fake: bool = True, batch_hint: int = 64
) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batches of binary).

    Real decode (fake=False) is intentionally unimplemented in this
    container — the operator's Spark surface (schema in/out, batching,
    partition parallelism) is the deliverable here.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                if not fake:
                    raise NotImplementedError(
                        "real media decode requires imaging/audio libs not "
                        "present in this environment"
                    )
                feats.append(_fake_decode(bytes(payload), dim).tolist())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feat": feats,
                    "feat_dim": dim,
                }
            )

    return media.mapInPandas(gen, schema=FEATURE_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int, fake: bool = True) -> DataFrame:
    """Image resize operator (stub): passes payload through, rewrites meta.
    Real implementation would decode/resize/encode inside the same
    mapInPandas shape."""
    if not fake:
        raise NotImplementedError("real image resize requires imaging libs")
    return media.filter(F.col("kind") == "image").withColumn(
        "meta",
        F.struct(
            F.lit(width).alias("width"),
            F.lit(height).alias("height"),
            F.col("meta.duration_ms").alias("duration_ms"),
            F.col("meta.codec").alias("codec"),
        ),
    )


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video rows: one output row per sampled
    timestamp (explode over a computed timestamp sequence — the decode of
    each frame is the stubbed part, the row explosion is real)."""
    vids = media.filter(F.col("kind") == "video")
    stamps = F.sequence(
        F.lit(0),
        F.coalesce(F.col("meta.duration_ms"), F.lit(0)),
        F.lit(every_ms),
    )
    return vids.select(
        "media_id",
        F.explode(stamps).alias("frame_ms"),
        "payload",
    )
