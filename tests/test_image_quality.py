"""Image quality metrics (operators/imagehash.image_quality)."""

import numpy as np
import pandas as pd

from lib_gdal_spark.operators.imagehash import image_quality
from lib_gdal_spark.operators.multimodal import MEDIA_SCHEMA
from lib_gdal_spark.sources.png import write_png


def _media(spark, imgs):
    rows = [(i, "image", write_png([img.astype(np.uint8)]),
             0, 0, 1, None, None, None, None)
            for i, img in enumerate(imgs)]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=[
            "media_id", "kind", "payload", "width", "height", "channels",
            "sample_rate", "n_samples", "fps", "n_frames"]),
        schema=MEDIA_SCHEMA)


def test_flat_vs_sharp_vs_clipped(spark):
    flat = np.full((24, 24), 128)
    checker = np.indices((24, 24)).sum(axis=0) % 2 * 200 + 20
    rng = np.random.default_rng(43)
    blur = rng.integers(120, 136, size=(24, 24))   # low-contrast noise
    dark = np.full((24, 24), 3)
    got = {r["media_id"]: r for r in
           image_quality(_media(spark, [flat, checker, blur, dark]),
                         strict=True).collect()}
    assert got[0]["contrast"] == 0.0 and got[0]["sharpness"] == 0.0
    assert abs(got[0]["brightness"] - 128.0) < 1e-9
    # the checkerboard is maximally sharp, far above the noise image
    assert got[1]["sharpness"] > 100 * got[2]["sharpness"]
    assert got[3]["frac_dark"] == 1.0 and got[0]["frac_dark"] == 0.0


def test_metrics_match_numpy(spark):
    rng = np.random.default_rng(47)
    img = rng.integers(0, 256, size=(20, 30))
    got = image_quality(_media(spark, [img]), strict=True).first()
    g = img.astype(np.int64)
    assert abs(got["brightness"] - g.mean()) < 1e-9
    assert abs(got["contrast"] - g.std()) < 1e-6
    lap = (4 * g[1:-1, 1:-1] - g[:-2, 1:-1] - g[2:, 1:-1]
           - g[1:-1, :-2] - g[1:-1, 2:])
    assert abs(got["sharpness"] - lap.var()) < 1e-6
    assert abs(got["frac_dark"] - (g <= 15).mean()) < 1e-9
    assert abs(got["frac_bright"] - (g >= 240).mean()) < 1e-9
