"""Multimodal binary-column operators (operators/multimodal.py):
decode / frame-sample / featurize over the deterministic FAKE1 container
— the Spark-side plumbing (schemas, mapInPandas signatures, Arrow batch
shapes, row fan-out) is real; only the codec itself is a stand-in.
"""

from __future__ import annotations

import hashlib

import pytest

from slowly_changing_dimensions_data_engineering_spark.operators.multimodal import (
    binary_stats,
    byte_histogram_features,
    decode_media,
    pack_fake_media,
    sample_frames,
)


def _media_df(spark):
    rows = [
        (0, pack_fake_media(2, 2, [bytes([0, 0, 0, 0]), bytes([255] * 4)])),
        (1, pack_fake_media(3, 1, [bytes([10, 20, 30])])),
    ]
    return spark.createDataFrame(rows, ["media_id", "content"])


def test_decode_media_fake_codec(spark):
    df = _media_df(spark)
    out = {r["media_id"]: r for r in decode_media(df).collect()}
    assert out[0]["meta"]["width"] == 2 and out[0]["meta"]["height"] == 2
    assert out[0]["meta"]["n_frames"] == 2
    assert out[0]["mean_pixel"] == 0.0          # first frame all zeros
    assert out[1]["meta"]["n_frames"] == 1
    assert out[1]["mean_pixel"] == pytest.approx(20.0)
    raw = bytes(df.filter("media_id = 1").head()["content"])
    assert out[1]["content_sha1"] == hashlib.sha1(raw).hexdigest()
    # content column is consumed by the decode stage
    assert "content" not in decode_media(df).columns


def test_decode_real_codec_is_import_gated(spark):
    with pytest.raises(NotImplementedError):
        decode_media(_media_df(spark), codec="jpeg")


def test_sample_frames_fan_out(spark):
    df = spark.createDataFrame(
        [(7, pack_fake_media(1, 2, [bytes([i, i]) for i in range(5)]))],
        ["media_id", "content"])
    out = sample_frames(df, every_k=2).collect()
    # frames 0, 2, 4 kept — mapInPandas emits more rows than it received
    assert [(r["frame_idx"], bytes(r["frame"])) for r in
            sorted(out, key=lambda r: r["frame_idx"])] == [
        (0, bytes([0, 0])), (2, bytes([2, 2])), (4, bytes([4, 4]))]


def test_byte_histogram_features(spark):
    df = spark.createDataFrame(
        [(0, bytes([0, 0, 255, 255]))], ["media_id", "content"])
    row = byte_histogram_features(df, n_bins=16).head()
    feats = row["features"]
    assert len(feats) == 16
    assert feats[0] == pytest.approx(0.5)    # two 0x00 bytes
    assert feats[15] == pytest.approx(0.5)   # two 0xff bytes
    assert sum(feats) == pytest.approx(1.0)


def test_binary_stats_jvm_side(spark):
    df = spark.createDataFrame([(0, b"abc")], ["media_id", "content"])
    row = binary_stats(df).head()
    assert row["n_bytes"] == 3
    assert row["digest"] == hashlib.md5(b"abc").hexdigest()
