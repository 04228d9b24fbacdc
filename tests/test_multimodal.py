"""Multimodal binary-column plumbing: schemas, batch shapes, determinism."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lib_gdal_spark.operators import multimodal as MM


@pytest.fixture(scope="module")
def media(spark):
    return MM.generate_media(spark, 30).cache()


def test_media_schema(media):
    assert media.count() == 30
    kinds = {r["kind"]: r["count"] for r in
             media.groupBy("kind").count().collect()}
    assert kinds == {"image": 10, "audio": 10, "video": 10}
    img = media.where(F.col("kind") == "image").first()
    assert img["width"] is not None and img["sample_rate"] is None


def test_image_features_deterministic(spark, media):
    out1 = {r["media_id"]: r for r in
            MM.image_features(media, resize_to=(8, 8)).collect()}
    out2 = {r["media_id"]: r for r in
            MM.image_features(media, resize_to=(8, 8)).collect()}
    assert len(out1) == 10
    for k in out1:
        assert out1[k]["thumb"] == out2[k]["thumb"]  # deterministic decode
        assert len(out1[k]["thumb"]) == 8 * 8 * 3
        assert 0.0 <= out1[k]["mean"] <= 255.0
    # thumb mean equals the full-image mean (box filter conserves mass
    # when the grid divides evenly; holds approximately otherwise)
    r = out1[0]
    assert np.mean(r["thumb"]) == pytest.approx(r["mean"], rel=0.05)


def test_audio_features(media):
    rows = MM.audio_features(media).collect()
    assert len(rows) == 10
    for r in rows:
        assert r["duration_s"] > 0
        assert r["n_frames"] == len(r["frame_rms"])
        # rms of the frames aggregates back to ~overall rms
        fr = np.asarray(r["frame_rms"])
        assert np.sqrt((fr ** 2).mean()) == pytest.approx(r["rms"], rel=0.1)


def test_video_frame_sample(media):
    rows = MM.video_frame_sample(media, every_n=12).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["media_id"], []).append(r)
    assert len(by_id) == 10
    for vid, frs in by_id.items():
        idxs = sorted(f["frame_idx"] for f in frs)
        assert idxs[0] == 0 and all(i % 12 == 0 for i in idxs)
        ts = sorted(f["t_s"] for f in frs)
        assert ts == [i / 12.0 for i in idxs]


def test_strict_mode_raises(spark, media):
    with pytest.raises(Exception) as ei:
        MM.image_features(media, strict=True).collect()
    assert "NotImplementedError" in str(ei.value) or "codec" in str(ei.value)
