"""Pansharpen (JVM-side Brovey) and proximity vs NumPy references."""

from __future__ import annotations

import numpy as np

from lib_gdal_spark.operators import pansharpen as PS
from lib_gdal_spark.operators import proximity as PX
from lib_gdal_spark.sources import rasters as RS


def _assemble(rows, h, w, tile, band=None):
    full = np.full((h, w), np.nan)
    for r in rows:
        if band is not None and r["band"] != band:
            continue
        a = np.asarray(r["pixels"]).reshape(r["tile_h"], r["tile_w"])
        full[r["tile_y"] * tile : r["tile_y"] * tile + r["tile_h"],
             r["tile_x"] * tile : r["tile_x"] * tile + r["tile_w"]] = a
    return full


def test_pansharpen_matches_reference(spark):
    tiles = RS.multiband_tiles(spark, n=128, tile=64)
    out = PS.pansharpen(tiles, [1, 2, 3], 4).collect()
    bands = RS.multiband(128)
    w = 1.0 / 3.0
    pseudo = (bands[1] * w) + bands[2] * w + bands[3] * w
    ratio = np.where(pseudo != 0.0, bands[4] / np.where(pseudo == 0, 1, pseudo), 1.0)
    for b in (1, 2, 3):
        got = _assemble(out, 128, 128, 64, band=b)
        assert np.allclose(got, bands[b] * ratio, rtol=1e-12, atol=0)


def test_proximity_exact_small(spark):
    import pandas as pd
    arr = np.zeros((64, 64))
    arr[10, 12] = 5.0
    arr[40, 50] = 5.0
    rows = RS.tiles_from_array("p", arr, (0, 1, 0, 64, 0, -1), tile=32)
    tiles = spark.createDataFrame(pd.DataFrame(rows), schema=RS.RASTER_SCHEMA)
    out = PX.proximity(tiles, [5.0], max_dist=12.0, tile=32).collect()
    got = _assemble(out, 64, 64, 32)
    jj, ii = np.meshgrid(np.arange(64), np.arange(64), indexing="ij")
    d1 = np.sqrt((ii - 12.0) ** 2 + (jj - 10.0) ** 2)
    d2 = np.sqrt((ii - 50.0) ** 2 + (jj - 40.0) ** 2)
    ref = np.minimum(d1, d2)
    ref = np.where(ref <= 12.0, ref, -1.0)
    assert np.array_equal(got, ref)
    assert got[10, 12] == 0.0
    # cross-tile influence: pixel in another tile near target (10,12)
    assert got[10, 33] > 0 or got[10, 33] == -1.0  # in-range check below
    assert got[30, 12] == -1.0 or got[30, 12] > 12 - 1  # boundary sanity


def test_allocation_exact_brute_force(spark):
    """Euclidean allocation vs a brute-force argmin with the same
    (d2, ty, tx) tie-break, including an exact-tie pixel."""
    import pandas as pd
    arr = np.zeros((64, 64))
    arr[10, 12] = 5.0   # value 5
    arr[10, 20] = 7.0   # value 7 — pixel (10, 16) ties at d2=16
    arr[40, 50] = 9.0
    rows = RS.tiles_from_array("p", arr, (0, 1, 0, 64, 0, -1), tile=32)
    tiles = spark.createDataFrame(pd.DataFrame(rows), schema=RS.RASTER_SCHEMA)
    out = PX.allocation(tiles, [5.0, 7.0, 9.0], max_dist=12.0, tile=32)
    got = {(r["px"], r["py"]): (r["alloc"], r["d2"]) for r in out.collect()}
    assert len(got) == 64 * 64

    tgts = [(12, 10, 5.0), (20, 10, 7.0), (50, 40, 9.0)]
    for py in range(64):
        for px in range(64):
            cand = sorted(
                ((px - tx) ** 2 + (py - ty) ** 2, ty, tx, tv)
                for tx, ty, tv in tgts
            )
            d2, _, _, tv = cand[0]
            want = (tv, d2) if d2 <= 144 else (-1.0, -1)
            assert got[(px, py)] == want, (px, py)
    # the tie pixel resolves to the smaller (ty, tx) key -> value 5
    assert got[(16, 10)] == (5.0, 16)
