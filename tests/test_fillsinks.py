"""Sink filling (operators/fillsinks): Planchon-Darboux eps=0 fixed point."""

from __future__ import annotations

import numpy as np
import pandas as pd

from lib_gdal_spark.operators.fillsinks import fill_sinks
from lib_gdal_spark.sources import rasters as RS


def _jacobi_fill(z: np.ndarray, max_iter: int = 10_000) -> np.ndarray:
    """Independent reference: plain Jacobi iteration of the PD update."""
    h, w = z.shape
    W = np.full_like(z, np.inf, dtype=np.float64)
    W[0, :] = z[0, :]
    W[-1, :] = z[-1, :]
    W[:, 0] = z[:, 0]
    W[:, -1] = z[:, -1]
    for _ in range(max_iter):
        pad = np.pad(W, 1, constant_values=np.inf)
        nb = np.stack([
            pad[1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w]
            for dy in (-1, 0, 1) for dx in (-1, 0, 1)
            if (dy, dx) != (0, 0)
        ]).min(axis=0)
        new = np.maximum(z, nb)
        new[0, :] = z[0, :]
        new[-1, :] = z[-1, :]
        new[:, 0] = z[:, 0]
        new[:, -1] = z[:, -1]
        if np.array_equal(new, W):
            return new
        W = new
    raise AssertionError("jacobi did not converge")


def _run(spark, arr, tile):
    rows = RS.tiles_from_array("z", arr, (0, 1, 0, arr.shape[0], 0, -1),
                               tile=tile)
    tiles = spark.createDataFrame(pd.DataFrame(rows), schema=RS.RASTER_SCHEMA)
    out = fill_sinks(tiles, tile=tile)
    got = np.full(arr.shape, np.nan)
    for r in out.collect():
        got[r["py"], r["px"]] = r["fill"]
    return got


def test_single_depression(spark):
    z = np.full((16, 16), 10.0)
    z[5:9, 5:9] = 3.0     # closed pit
    z[6, 9:] = 7.0        # spill channel to the border at elevation 7
    want = _jacobi_fill(z)
    got = _run(spark, z, tile=16)
    assert np.array_equal(got, want)
    # the pit fills exactly to the pour elevation, nothing else moves
    assert np.all(got[5:9, 5:9] == 7.0)
    assert got[0, 0] == 10.0


def test_nested_and_multi_tile_invariance(spark):
    rng = np.random.RandomState(7)
    z = np.floor(rng.rand(32, 32) * 50)
    want = _jacobi_fill(z)
    one = _run(spark, z, tile=32)
    four = _run(spark, z, tile=16)
    sixteen = _run(spark, z, tile=8)
    assert np.array_equal(one, want)
    assert np.array_equal(four, want)
    assert np.array_equal(sixteen, want)
    # monotone: fill >= z, and untouched cells keep z exactly
    assert np.all(want >= z)
