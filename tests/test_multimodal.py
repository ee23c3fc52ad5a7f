"""Multimodal plumbing: schema, Arrow batch shape, deterministic stub, strict mode."""

import pytest
from pyspark.sql import Row

from jmdfane_spark.operators import multimodal as M


def _media(spark):
    rows = [
        Row(media_id="m1", kind="image", payload=b"\x89PNG fake bytes",
            meta=Row(width=64, height=64, sample_rate=None, n_frames=None, codec="png")),
        Row(media_id="m2", kind="video", payload=b"\x00\x00ftyp fake",
            meta=Row(width=320, height=240, sample_rate=None, n_frames=25, codec="h264")),
        Row(media_id="m3", kind="audio", payload=None,
            meta=Row(width=None, height=None, sample_rate=16000, n_frames=None, codec="wav")),
    ]
    return spark.createDataFrame(rows, M.MEDIA_SCHEMA)


def test_attach_meta_and_sha(spark):
    out = M.attach_media_meta(_media(spark)).collect()
    by_id = {r.media_id: r for r in out}
    assert by_id["m1"].payload_bytes == len(b"\x89PNG fake bytes")
    assert len(by_id["m1"].payload_sha) == 64


def test_extract_features_deterministic(spark):
    f1 = {r.media_id: r.feature for r in M.extract_features(_media(spark)).collect()}
    f2 = {r.media_id: r.feature for r in M.extract_features(_media(spark)).collect()}
    assert f1 == f2
    assert len(f1["m1"]) == M.FEATURE_DIM
    assert f1["m3"] == [0.0] * M.FEATURE_DIM  # null payload → zero vector


def test_frame_sample_shape(spark):
    rows = M.frame_sample(_media(spark), every_n=10).collect()
    vid = [r for r in rows if r.media_id == "m2"]
    assert [r.frame_idx for r in vid] == [0, 10, 20]
    assert all(len(r.frame_sha) == 64 for r in vid)


def test_strict_mode_raises(spark):
    with pytest.raises(Exception) as exc:
        M.extract_features(_media(spark), strict=True).collect()
    assert "NotImplementedError" in str(exc.value) or "media decoding" in str(exc.value)
