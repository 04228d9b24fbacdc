"""Zonal crosstab (r.cross): brute-force parity, tiling invariance,
mixed-resolution area accounting, misaligned-tile error."""

import numpy as np
import pandas as pd
import pytest

from lib_gdal_spark.operators.stats import zonal_crosstab
from lib_gdal_spark.sources.rasters import RASTER_SCHEMA, tiles_from_array


def _tiles(spark, rid, arr, tile, gt=None):
    gt = gt or (0.0, 1.0, 0.0, float(arr.shape[0]), 0.0, -1.0)
    rows = tiles_from_array(rid, arr.astype(np.float64), gt, tile=tile)
    return spark.createDataFrame(pd.DataFrame(rows), schema=RASTER_SCHEMA)


def _arrs(n=48):
    i, j = np.meshgrid(np.arange(n), np.arange(n), indexing="xy")
    return ((i * 7 + j * 3) % 5).astype(float), ((i + 2 * j) % 3).astype(float)


def test_matches_bruteforce_counts(spark):
    za, ca = _arrs()
    out = zonal_crosstab(_tiles(spark, "z", za, 16),
                         _tiles(spark, "c", ca, 16)).collect()
    got = {(r["zone"], r["cls"]): (r["n"], r["area"]) for r in out}
    want = {}
    for zv, cv in zip(za.ravel(), ca.ravel()):
        k = (int(zv), int(cv))
        want[k] = want.get(k, 0) + 1
    assert {k: v[0] for k, v in got.items()} == want
    # unit pixel area -> area == n exactly
    assert all(a == float(n) for n, a in got.values())


def test_tiling_invariance(spark):
    za, ca = _arrs()
    a = sorted(map(tuple, zonal_crosstab(
        _tiles(spark, "z", za, 16), _tiles(spark, "c", ca, 16)).collect()))
    b = sorted(map(tuple, zonal_crosstab(
        _tiles(spark, "z", za, 12), _tiles(spark, "c", ca, 12)).collect()))
    assert a == b


def test_banding_fns(spark):
    za, ca = _arrs()
    out = zonal_crosstab(
        _tiles(spark, "z", za, 16), _tiles(spark, "c", ca, 16),
        zone_fn=lambda a: a // 2.0, class_fn=lambda a: (a > 0).astype(float),
    ).collect()
    zones = {r["zone"] for r in out}
    clss = {r["cls"] for r in out}
    assert zones == {0, 1, 2} and clss == {0, 1}
    assert sum(r["n"] for r in out) == za.size


def test_area_uses_zone_geotransform(spark):
    za, ca = _arrs(16)
    gt = (0.0, 0.5, 0.0, 8.0, 0.0, -0.25)  # pixel area 0.125 (dyadic)
    out = zonal_crosstab(_tiles(spark, "z", za, 16, gt),
                         _tiles(spark, "c", ca, 16)).collect()
    for r in out:
        assert r["area"] == r["n"] * 0.125


def test_size_mismatch_raises(spark):
    za, ca = _arrs(32)
    zt = _tiles(spark, "z", za, 16)   # tile (0,0) holds 256 px
    ct = _tiles(spark, "c", ca, 32)   # tile (0,0) holds 1024 px
    with pytest.raises(Exception, match="size mismatch"):
        zonal_crosstab(zt, ct).collect()
