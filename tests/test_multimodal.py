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


def test_real_png_decode_in_pipeline(spark):
    """PNG payloads take the REAL decode path (strict mode passes and
    dims come from the bytes, not the metadata)."""
    import numpy as np
    import pandas as pd
    from lib_gdal_spark.operators.multimodal import (
        MEDIA_SCHEMA, decode_image, image_features)
    from lib_gdal_spark.sources.png import write_png

    img = np.arange(12 * 10, dtype=np.uint8).reshape(10, 12)
    payload = write_png([img, img // 2, img // 3])
    assert decode_image(payload).shape == (10, 12, 3)
    media = spark.createDataFrame(pd.DataFrame([
        dict(media_id=1, kind="image", payload=payload,
             width=0, height=0, channels=3, sample_rate=None,
             n_samples=None, fps=None, n_frames=None)]),
        schema=MEDIA_SCHEMA)
    row = image_features(media, resize_to=(4, 4), strict=True).collect()[0]
    assert (row["width"], row["height"]) == (12, 10)
    want = (img.astype(float) + img // 2 + img // 3).sum() / (120 * 3)
    assert abs(row["mean"] - want) < 1e-9


def test_with_mime_sniffing(spark):
    import gzip as _gz

    import numpy as np
    import pandas as pd

    from lib_gdal_spark.operators.multimodal import with_mime
    from lib_gdal_spark.sources.avi import write_avi_mjpeg
    from lib_gdal_spark.sources.jpeg import write_jpeg
    from lib_gdal_spark.sources.png import write_png
    from lib_gdal_spark.sources.wav import write_wav

    img = np.full((8, 8), 9, dtype=np.uint8)
    cases = [
        (write_png([img]), "image/png"),
        (write_jpeg(img), "image/jpeg"),
        (b"GIF89a......", "image/gif"),
        (b"II*\x00rest", "image/tiff"),
        (b"RIFF\x04\x00\x00\x00WEBPVP8 ", "image/webp"),
        (write_wav(np.zeros(10, dtype=np.int16), 8000), "audio/wav"),
        (write_avi_mjpeg([write_jpeg(img)], 5, 8, 8), "video/x-msvideo"),
        (b"%PDF-1.7\n", "application/pdf"),
        (_gz.compress(b"x", mtime=0), "application/gzip"),
        (b"PK\x03\x04....", "application/zip"),
        (b"WARC/1.0\r\n", "application/warc"),
        (b'<?xml version="1.0"?><a/>', "application/xml"),
        (b"\n<!DOCTYPE html><html></html>", "text/html"),
        (b'  {"k": 1}', "application/json"),
        (b"plain words here\n", "text/plain"),
        (b"\x00\x01\x02\xfe", "application/octet-stream"),
    ]
    df = spark.createDataFrame(pd.DataFrame(
        {"i": range(len(cases)), "payload": [c[0] for c in cases]}))
    got = {r["i"]: r["mime"] for r in with_mime(df).collect()}
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (i, got[i], want)
