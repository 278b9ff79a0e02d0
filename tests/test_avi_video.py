"""MJPEG-in-AVI video path (operators/avi.py): RIFF container walk,
per-frame JPEG extraction on real pixels, and the Spark-side
sample_frames / media_metadata / extract_features integration."""

import numpy as np
import pytest

from crux_spark.operators import avi as A
from crux_spark.operators.jpeg import decode_jpeg


def _clip(n_frames=6, w=64, h=48):
    frames = []
    for i in range(n_frames):
        f = np.zeros((h, w, 3), np.uint8)
        f[:, :, 0] = 40 * i          # red ramps over time
        f[10:20, 10:30, 1] = 200     # constant green box
        frames.append(f)
    return frames


def test_avi_metadata_and_frame_walk():
    frames = _clip()
    blob = A.encode_avi_mjpeg(frames, fps=10)
    meta = A.parse_avi(blob)
    assert meta == {
        "width": 64, "height": 48, "n_frames": 6, "fps": 10.0,
        "duration_ms": 600, "codec": "MJPG",
    }
    assert len(A.avi_frames(blob)) == 6
    assert A.parse_avi(b"not an avi") is None
    assert A.avi_frames(b"junk") == []


def test_frame_selection_decodes_real_pixels():
    """decode_avi_frame picks the frame covering ts_ms; its JPEG decodes
    to the expected red level — real pixels, not a byte slice."""
    blob = A.encode_avi_mjpeg(_clip(), fps=10)
    for ts, expect_r in ((0, 0), (250, 80), (550, 200)):
        img = decode_jpeg(A.decode_avi_frame(blob, ts))
        assert img.shape == (48, 64, 3)
        assert abs(float(img[:, :, 0].mean()) - expect_r) < 8.0
    # past-the-end timestamps clamp to the last frame
    last = decode_jpeg(A.decode_avi_frame(blob, 10_000))
    assert abs(float(last[:, :, 0].mean()) - 200) < 8.0


def test_spark_sample_frames_real_mjpeg(spark):
    """sample_frames fans out timestamps JVM-side and returns REAL
    standalone JPEGs for AVI blobs (stub slice only for unknown
    containers)."""
    from pyspark.sql import functions as F

    from crux_spark.operators.multimodal import media_metadata, sample_frames

    blob = A.encode_avi_mjpeg(_clip(), fps=10)
    media = spark.createDataFrame(
        [(7, bytearray(blob))], "media_id long, blob binary"
    ).withColumn(
        "meta",
        F.struct(
            F.lit("video/avi").alias("mime"),
            F.lit(64).alias("width"), F.lit(48).alias("height"),
            F.lit(600).cast("long").alias("duration_ms"),
        ),
    )
    rows = sample_frames(media, every_ms=100).orderBy("frame_idx").collect()
    assert [r.ts_ms for r in rows] == [0, 100, 200, 300, 400, 500]
    reds = [float(decode_jpeg(bytes(r.frame))[:, :, 0].mean()) for r in rows]
    assert reds == pytest.approx([0, 40, 80, 120, 160, 200], abs=8.0)

    cat = media_metadata(media).collect()[0]
    assert (cat.kind, cat.width, cat.height) == ("avi", 64, 48)
    assert cat.duration_s == pytest.approx(0.6)


def test_feature_path_uses_video_pixels(spark):
    """extract_features on an AVI blob = image features of the middle
    frame's DECODED pixels, not the byte-histogram fake."""
    from crux_spark.operators.multimodal import (
        _decode_image,
        _fake_decode,
        _image_features,
        extract_features,
    )

    blob = A.encode_avi_mjpeg(_clip(), fps=10)
    media = spark.createDataFrame(
        [(1, bytearray(blob))], "media_id long, blob binary"
    )
    feats = extract_features(media).collect()[0].features
    assert feats != pytest.approx(_fake_decode(blob), abs=1e-3)
    mid = _decode_image(A.avi_frames(blob)[3])
    assert feats == pytest.approx(_image_features(mid, 8), abs=1e-6)
