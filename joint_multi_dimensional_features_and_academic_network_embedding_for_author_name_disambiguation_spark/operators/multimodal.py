"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque `binary` columns + a typed metadata struct; all
Spark-side plumbing (schema, partitioning, Arrow batch shape, UDF
signatures) is real and tested. The codec step itself is STUBBED — the
image/audio libraries are not in this container — behind
``decode_stub``: a deterministic fake that derives "pixels"/"samples"
from sha256(payload) so tests are reproducible, and raises
``NotImplementedError`` when ``strict=True`` (the marker for where a real
decoder plugs in: replace `_fake_decode` with PIL/libav calls).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id string, kind string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, n_frames:int, codec:string>"
)

FEATURE_DIM = 64


def attach_media_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Derive cheap metadata JVM-side: byte length + sha256 fingerprint."""
    return df.withColumn("payload_bytes", F.length(F.col(payload_col))).withColumn(
        "payload_sha", F.sha2(F.col(payload_col), 256)
    )


def _fake_decode(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in for a real decoder: sha256-seeded feature
    vector in [-1, 1]. REPLACE with a real decode → embed when codecs are
    available."""
    h = hashlib.sha256(payload or b"").digest()
    raw = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype=np.uint32)
    return (raw.astype(np.float64) / np.iinfo(np.uint32).max * 2 - 1).astype(np.float32)


def extract_features(media: DataFrame, strict: bool = False, dim: int = FEATURE_DIM) -> DataFrame:
    """media(media_id, kind, payload, …) → (media_id, kind, feature array).

    mapInPandas with Arrow batches: the UDF sees a pandas DataFrame per
    batch and emits fixed-width vectors — the exact shape a real
    image/audio encoder would use.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "media decoding requires codec libraries not present in "
                    "this environment; wire a real decoder into _fake_decode"
                )
            feats = [
                _fake_decode(p, dim).tolist() if p is not None else [0.0] * dim
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "kind": pdf["kind"], "feature": feats}
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        run, "media_id string, kind string, feature array<float>"
    )


def frame_sample(media: DataFrame, every_n: int = 10, strict: bool = False) -> DataFrame:
    """video → one row per sampled frame index (UDTF-shaped mapInPandas).

    Frame count comes from meta.n_frames; the frame payload is stubbed as
    a sha256 of (payload, frame_idx) — the partitioning/explode shape is
    what matters at scale (a 2-hour video → ~700 rows, not 2 GB in one)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                raise NotImplementedError("frame extraction requires video codecs")
            out_id, out_idx, out_sha = [], [], []
            for mid, payload, nf in zip(pdf["media_id"], pdf["payload"], pdf["n_frames"]):
                n = 0 if pd.isna(nf) else int(nf)  # nullable int arrives as NaN
                for idx in range(0, n, every_n):
                    out_id.append(mid)
                    out_idx.append(idx)
                    out_sha.append(
                        hashlib.sha256((payload or b"") + idx.to_bytes(4, "big")).hexdigest()
                    )
            yield pd.DataFrame({"media_id": out_id, "frame_idx": out_idx, "frame_sha": out_sha})

    src = media.select("media_id", "payload", F.col("meta.n_frames").alias("n_frames"))
    return src.mapInPandas(run, "media_id string, frame_idx int, frame_sha string")
