"""WKT codec round trips + gdal_translate -scale."""

import numpy as np
from pyspark.sql import functions as F

from lib_gdal_spark.functions import geometry as G
from lib_gdal_spark.functions import wkt as W
from lib_gdal_spark.operators import translate as T
from lib_gdal_spark.sources.rasters import fixture_rasters


def test_wkt_round_trips():
    cases = [
        "POINT (1.5 -2.25)",
        "LINESTRING (0 0, 1 1, 2 0.5)",
        "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))",
        "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))",
        ("MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), "
         "((5 5, 6 5, 6 6, 5 6, 5 5), "
         "(5.2 5.2, 5.8 5.2, 5.8 5.8, 5.2 5.8, 5.2 5.2)))"),
    ]
    for c in cases:
        wkb = W.wkt_to_wkb(c)
        assert W.wkt_to_wkb(W.wkb_to_wkt(wkb)) == wkb
    # WKT ingests straight into the overlay pipeline
    rings = G.polygon_rings(W.wkt_to_wkb(cases[3]))
    assert len(rings) == 2 and len(rings[0]) == 5


def test_translate_scale(spark):
    tiles = fixture_rasters(spark).where(F.col("raster_id") == "gradient256")
    out = T.translate_scale(tiles, 0.0, 255.0, 0.0, 1.0).collect()
    vals = np.concatenate([np.asarray(r["pixels"]) for r in out])
    assert vals.min() == 0.0 and abs(vals.max() - 1.0) < 1e-12
    # exponent variant + integer rounding
    out2 = T.translate_scale(tiles, 0.0, 255.0, 0.0, 100.0,
                             exponent=2.0, out_dtype="uint8").collect()
    v2 = np.concatenate([np.asarray(r["pixels"]) for r in out2])
    # v=255 -> 100; v=128 (mid) -> (128/255)^2*100 ~ 25 (rounded)
    assert v2.max() == 100.0
    mid = np.floor((128.0 / 255.0) ** 2 * 100.0 + 0.5)
    rows0 = [r for r in out2 if r["tile_x"] == 0 and r["tile_y"] == 2]
    a = np.asarray(rows0[0]["pixels"]).reshape(64, 64)
    # pixel (0, 128): gradient v = (0 + 128)//2 = 64 -> check formula
    expect = np.floor((64.0 / 255.0) ** 2 * 100.0 + 0.5)
    assert a[0, 0] == expect
