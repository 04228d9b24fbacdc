"""Geomorphon landform classification (operators/dem.geomorphon_kernel).

Analytic surfaces whose ternary patterns are known in closed form pin
the (num_minus, num_plus) -> form lookup to the paper's table
(Jasiewicz & Stepinski 2013, Geomorphology 182)."""

import numpy as np
import pandas as pd

from lib_gdal_spark.operators.dem import (
    GEOMORPHON_FORMS, dem_op_k, geomorphon_kernel)
from lib_gdal_spark.sources import rasters as RS

K = 8


def _classify(spark, arr, tile=24):
    h, w = arr.shape
    rows = RS.tiles_from_array("t", arr.astype(float),
                               (0, 1, 0, h, 0, -1), tile=tile)
    tiles = spark.createDataFrame(pd.DataFrame(rows), schema=RS.RASTER_SCHEMA)
    out = {}
    for r in dem_op_k(tiles, K, geomorphon_kernel).collect():
        tw, th = r["tile_w"], r["tile_h"]
        for pos, v in enumerate(r["pixels"]):
            px = r["tile_x"] * tile + pos % tw
            py = r["tile_y"] * tile + pos // tw
            out[(px, py)] = (int(v) // 10000, int(v) // 100 % 100,
                             int(v) % 100)
    return out


def _name(form):
    return GEOMORPHON_FORMS[form - 1]


def test_flat_plane_is_flat(spark):
    got = _classify(spark, np.full((48, 48), 7.0))
    nm, np_, form = got[(24, 24)]
    assert (nm, np_) == (0, 0) and _name(form) == "flat"


def test_tilted_plane_is_slope(spark):
    # z = x/2: three + directions (downhill looks up... uphill), three -,
    # two neutral along the contour -> (3, 3) -> slope
    xs = np.arange(48, dtype=float)
    got = _classify(spark, np.tile(xs / 2.0, (48, 1)))
    nm, np_, form = got[(24, 24)]
    assert (nm, np_) == (3, 3) and _name(form) == "slope"


def test_cone_apex_is_peak_bowl_is_pit(spark):
    yy, xx = np.mgrid[0:48, 0:48]
    r = np.hypot(xx - 24.0, yy - 24.0)
    nm, np_, form = _classify(spark, -r)[(24, 24)]
    assert (nm, np_) == (8, 0) and _name(form) == "peak"
    nm, np_, form = _classify(spark, r)[(24, 24)]
    assert (nm, np_) == (0, 8) and _name(form) == "pit"


def test_vridge_and_vvalley(spark):
    xs = np.abs(np.arange(48, dtype=float) - 24.0)
    ridge = np.tile(-xs, (48, 1))
    nm, np_, form = _classify(spark, ridge)[(24, 24)]
    assert (nm, np_) == (6, 0) and _name(form) == "ridge"
    nm, np_, form = _classify(spark, -ridge)[(24, 24)]
    assert (nm, np_) == (0, 6) and _name(form) == "valley"


def test_matches_kernel_locally(spark):
    # distributed halo-exchange output == single-array kernel run
    rng = np.random.default_rng(5)
    arr = rng.integers(0, 60, size=(40, 40)).astype(float)
    got = _classify(spark, arr, tile=16)
    pad = np.full((40 + 2 * K, 40 + 2 * K), np.nan)
    pad[K:-K, K:-K] = arr
    ref = geomorphon_kernel(pad, K, 1.0, 1.0)
    for py in range(K, 40 - K):
        for px in range(K, 40 - K):
            v = got[(px, py)]
            assert v == (int(ref[py, px]) // 10000,
                         int(ref[py, px]) // 100 % 100,
                         int(ref[py, px]) % 100)
