"""Weiss multi-scale TPI landform classes (operators/dem.tpi_landforms)."""

import math

import numpy as np
import pandas as pd

from lib_gdal_spark.operators.dem import (
    TPI_LANDFORMS, slope_kernel, tpi_k_kernel, tpi_landforms)
from lib_gdal_spark.sources import rasters as RS


def _pad(arr, k):
    p = np.full((arr.shape[0] + 2 * k, arr.shape[1] + 2 * k), np.nan)
    p[k:-k, k:-k] = arr
    return p


def test_matches_local_pipeline(spark):
    rng = np.random.default_rng(14)
    h = w = 48
    arr = rng.integers(0, 120, size=(h, w)).astype(float)
    lo, hi = 8, h - 9
    rows = RS.tiles_from_array("t", arr, (0, 1, 0, h, 0, -1), tile=16)
    tiles = spark.createDataFrame(pd.DataFrame(rows),
                                  schema=RS.RASTER_SCHEMA)
    got = {(r["px"], r["py"]): r for r in
           tpi_landforms(tiles, lo=lo, hi=hi, tile=16).collect()}

    qs = np.floor(tpi_k_kernel(_pad(arr, 2), 2, 1.0, -1.0) * 1e6 + 0.5)
    ql = np.floor(tpi_k_kernel(_pad(arr, 8), 8, 1.0, -1.0) * 1e6 + 0.5)
    slope = slope_kernel(_pad(arr, 1), 1.0, -1.0)
    sl = slice(lo, hi + 1)
    qsw, qlw, slw = qs[sl, sl], ql[sl, sl], slope[sl, sl]
    n = qsw.size

    def z(q):
        s, s2 = q.sum(), (q * q).sum()
        return (q * n - s) / math.sqrt(n * s2 - s * s)

    zs, zl = z(qsw), z(qlw)
    assert len(got) == n
    for yy in range(lo, hi + 1):
        for xx in range(lo, hi + 1):
            g = got[(xx, yy)]
            i, j = yy - lo, xx - lo
            assert abs(g["zs"] - round(zs[i, j], 6)) < 1e-9, (xx, yy)
            assert abs(g["zl"] - round(zl[i, j], 6)) < 1e-9
            a, b, s = zs[i, j], zl[i, j], slw[i, j]
            if a <= -1 and b <= -1:
                f = 1
            elif a <= -1 and b < 1:
                f = 2
            elif a <= -1:
                f = 3
            elif a < 1 and b <= -1:
                f = 4
            elif a < 1 and b < 1 and s <= 5.0:
                f = 5
            elif a < 1 and b < 1:
                f = 6
            elif a < 1:
                f = 7
            elif b <= -1:
                f = 8
            elif b < 1:
                f = 9
            else:
                f = 10
            assert g["form"] == f and g["landform"] == TPI_LANDFORMS[f - 1]


def test_landform_names_cover_fixture(spark):
    # the world-style sin/cos surface must produce a diverse facet mix
    h = 64
    yy, xx = np.mgrid[0:h, 0:h]
    arr = np.trunc((np.sin(xx * 0.19) + np.cos(yy * 0.13)) * 60.0 + 128.0)
    rows = RS.tiles_from_array("t", arr, (0, 1.40625, 0, 45, 0, -0.703125),
                               tile=32)
    tiles = spark.createDataFrame(pd.DataFrame(rows),
                                  schema=RS.RASTER_SCHEMA)
    out = tpi_landforms(tiles, lo=8, hi=h - 9, tile=32)
    forms = {r["landform"] for r in out.select("landform").distinct()
             .collect()}
    assert len(forms) >= 4 and forms <= set(TPI_LANDFORMS)
