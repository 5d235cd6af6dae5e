"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with
a metadata struct; decode / feature-extract / resize / frame-sample are
Arrow-batched mapInPandas stages. The decode codecs (PIL/ffmpeg/
torchaudio) are NOT in this container, so the codec call itself is
stubbed: ``real_decode=True`` raises NotImplementedError at the exact
seam a codec would occupy, and the default is a deterministic fake
decoder (metadata derived from the payload bytes) so the Spark-side
plumbing — schema, batch shape, partitioning, UDF signatures — is real
and tested end-to-end.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

MEDIA_SCHEMA = "media_id long, kind string, payload binary, width int, height int, duration_ms int"
FEATURES_SCHEMA = "media_id long, kind string, n_bytes long, width int, height int, feature array<float>"
FRAMES_SCHEMA = "media_id long, frame_idx int, frame_feature array<float>"


def synth_media(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes)."""

    def gen(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kinds = ["image", "audio", "video"]
        for pdf in pdf_iter:
            ids = pdf["id"].to_numpy()
            rows = []
            for i in ids.tolist():
                rng = np.random.default_rng(seed * 1_000_003 + i)
                kind = kinds[i % 3]
                payload = rng.integers(0, 256, size=64 + (i % 192), dtype=np.uint8)
                rows.append(
                    (
                        i,
                        kind,
                        payload.tobytes(),
                        int(16 + (i % 64)) if kind != "audio" else 0,
                        int(16 + (i % 48)) if kind != "audio" else 0,
                        int(1000 + 37 * (i % 100)) if kind != "image" else 0,
                    )
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "payload", "width", "height", "duration_ms"]
            )

    return spark.range(n).mapInPandas(gen, schema=MEDIA_SCHEMA)


def _fake_decode(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for a codec: fold payload bytes into a
    fixed-size float feature."""
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float32)
    pad = (-len(arr)) % dim
    if pad:
        arr = np.concatenate([arr, np.zeros(pad, np.float32)])
    return arr.reshape(-1, dim).mean(axis=0) / 255.0


def decode_features(
    media: DataFrame, dim: int = 16, real_decode: bool = False
) -> DataFrame:
    """Per-item feature extraction (image decode / audio fingerprint
    analog). Arrow-batched; one numpy pass per batch."""

    def batch(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if real_decode:
            raise NotImplementedError(
                "real codecs (PIL/ffmpeg) are not available in this container; "
                "plug the decoder in here"
            )
        for pdf in pdf_iter:
            feats = [_fake_decode(p, dim).tolist() for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "width": pdf["width"],
                    "height": pdf["height"],
                    "feature": feats,
                }
            )

    return media.mapInPandas(batch, schema=FEATURES_SCHEMA)


def sample_frames(
    media: DataFrame, every_ms: int = 500, dim: int = 8, real_decode: bool = False
) -> DataFrame:
    """Frame-sampling analog for video rows: one feature row per sampled
    frame (frame payload slice -> fake decode)."""

    def batch(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if real_decode:
            raise NotImplementedError("frame decode requires ffmpeg; not in container")
        for pdf in pdf_iter:
            out_id, out_idx, out_feat = [], [], []
            for _, row in pdf.iterrows():
                if row["kind"] != "video" or row["duration_ms"] <= 0:
                    continue
                n_frames = max(1, row["duration_ms"] // every_ms)
                payload = row["payload"]
                for fi in range(int(n_frames)):
                    lo = (fi * 31) % max(len(payload) - dim, 1)
                    out_id.append(row["media_id"])
                    out_idx.append(fi)
                    out_feat.append(_fake_decode(payload[lo : lo + dim * 4], dim).tolist())
            if out_id:  # an all-empty batch would mistype the list column
                yield pd.DataFrame(
                    {"media_id": out_id, "frame_idx": out_idx, "frame_feature": out_feat}
                )

    return media.mapInPandas(batch, schema=FRAMES_SCHEMA)
