"""Audio quality metrics (operators/multimodal.audio_quality)."""

import numpy as np
import pandas as pd

from lib_gdal_spark.operators.multimodal import MEDIA_SCHEMA, audio_quality
from lib_gdal_spark.sources.wav import write_wav


def _media(spark, clips):
    rows = [(i, "audio", write_wav(np.asarray(c, dtype=np.int16), 8000),
             0, 0, 1, 1, 1, None, None)
            for i, c in enumerate(clips)]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=[
            "media_id", "kind", "payload", "width", "height", "channels",
            "sample_rate", "n_samples", "fps", "n_frames"]),
        schema=MEDIA_SCHEMA)


def test_known_signals(spark):
    n = 8000
    t = np.arange(n)
    sine = (10000 * np.sin(2 * np.pi * 440 * t / 8000)).astype(np.int16)
    silent = np.zeros(n, dtype=np.int16)
    clipped = np.where(t % 2 == 0, 32767, -32768).astype(np.int16)
    got = {r["media_id"]: r for r in
           audio_quality(_media(spark, [sine, silent, clipped]),
                         strict=True).collect()}
    # 440 Hz sine: ZCR ~ 2 * 440 / 8000 = 0.11
    assert abs(got[0]["zcr"] - 0.11) < 0.005
    assert abs(got[0]["rms"] - 10000 / np.sqrt(2)) < 100
    assert got[0]["frac_clipped"] == 0.0
    assert got[1]["rms"] == 0.0 and got[1]["frac_silence"] == 1.0
    assert got[2]["frac_clipped"] == 1.0 and got[2]["peak"] == 32768
    assert abs(got[2]["zcr"] - 1.0) < 1e-9


def test_matches_numpy(spark):
    rng = np.random.default_rng(53)
    s = rng.integers(-20000, 20001, 5000).astype(np.int16)
    got = audio_quality(_media(spark, [s]), strict=True).first()
    g = s.astype(np.int64)
    assert abs(got["rms"] - np.sqrt((g * g).mean())) < 1e-6
    assert got["peak"] == int(np.abs(g).max())
    run = np.sign(g)[np.sign(g) != 0]
    zc = int((run[1:] * run[:-1] < 0).sum())
    assert abs(got["zcr"] - zc / (len(g) - 1)) < 1e-9
