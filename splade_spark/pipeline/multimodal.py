"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The Spark-side machinery is real and tested — schema, partition-preserving
mapInPandas decode/feature stages, Arrow batch shapes, frame sampling — while
the actual media decode is stubbed (codec libraries are not available in this
environment): `decode_stub=True` produces a deterministic fake decode from
the payload bytes; `decode_stub=False` raises NotImplementedError at the
point where a real libjpeg/ffmpeg call would go.

Asset schema: (asset_id long, kind string in {image,audio,video},
payload binary, meta map<string,string>).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ASSET_SCHEMA = "asset_id long, kind string, payload binary, meta map<string,string>"

FEATURE_DIM = 32


def synthetic_assets(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic fake asset table for tests (payload = seeded bytes)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kinds = ["image", "audio", "video"]
        for pdf in batches:
            rows = []
            for i in pdf["id"].tolist():
                rng = np.random.default_rng(seed * 7919 + i)
                kind = kinds[i % 3]
                payload = rng.bytes(int(rng.integers(64, 512)))
                meta = {
                    "width": str(int(rng.integers(16, 512))),
                    "height": str(int(rng.integers(16, 512))),
                    "codec": {"image": "jpeg", "audio": "opus", "video": "h264"}[kind],
                }
                rows.append((int(i), kind, payload, meta))
            yield pd.DataFrame(rows, columns=["asset_id", "kind", "payload", "meta"])

    return spark.range(0, n, 1, max(2, n // 500)).mapInPandas(gen, schema=ASSET_SCHEMA)


def _fake_decode(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for a real decoder: sha256-seeded features."""
    h = hashlib.sha256(payload).digest()
    rng = np.random.default_rng(np.frombuffer(h[:8], dtype=np.uint64)[0])
    return rng.standard_normal(dim)


def extract_features(
    assets: DataFrame, dim: int = FEATURE_DIM, decode_stub: bool = True
) -> DataFrame:
    """(asset_id, kind, feature array<double>): decode + feature-extract.

    Real path would decode payload (libjpeg/ffmpeg) and run a vision/audio
    model per Arrow batch; the batch shape, schema, and partitioning are
    exactly what that deployment needs."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if not decode_stub:
                raise NotImplementedError(
                    "real media decode requires libjpeg/ffmpeg — not available; "
                    "run with decode_stub=True"
                )
            feats = [
                _fake_decode(bytes(p), dim).tolist() for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "feature": feats,
                }
            )

    return assets.select("asset_id", "kind", "payload").mapInPandas(
        kernel, schema="asset_id long, kind string, feature array<double>"
    )


def sample_frames(
    assets: DataFrame, every_n_bytes: int = 64, max_frames: int = 8
) -> DataFrame:
    """(asset_id, frame_idx, frame binary): frame sampling for video assets.

    Stub treats every_n_bytes-sized payload slices as 'frames' — the real
    implementation swaps the slicing for ffmpeg keyframe extraction; the
    explode shape (one row per sampled frame, partition-preserved) stays."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_idx, out_frame = [], [], []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                b = bytes(payload)
                for j in range(min(max_frames, max(1, len(b) // every_n_bytes))):
                    out_id.append(aid)
                    out_idx.append(j)
                    out_frame.append(b[j * every_n_bytes : (j + 1) * every_n_bytes])
            yield pd.DataFrame(
                {"asset_id": out_id, "frame_idx": out_idx, "frame": out_frame}
            )

    return (
        assets.filter(F.col("kind") == "video")
        .select("asset_id", "payload")
        .mapInPandas(kernel, schema="asset_id long, frame_idx int, frame binary")
    )


def resize_meta(assets: DataFrame, max_side: int = 256) -> DataFrame:
    """Pure-SQL resize planning: target dims preserving aspect ratio from
    typed metadata — the catalog-side half of a resize stage (the pixel
    work belongs in extract_features' kernel)."""
    w = F.col("meta")["width"].cast("int")
    h = F.col("meta")["height"].cast("int")
    scale = F.least(F.lit(max_side) / w, F.lit(max_side) / h, F.lit(1.0))
    return assets.withColumn("target_width", F.round(w * scale).cast("int")).withColumn(
        "target_height", F.round(h * scale).cast("int")
    )
