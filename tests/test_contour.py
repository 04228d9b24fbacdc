"""Contour: distributed marching squares == single-array kernel; geometry
sanity on closed-form fixtures."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from lib_gdal_spark.kernels import contour as CK
from lib_gdal_spark.operators import contour as CO
from lib_gdal_spark.sources import rasters as RS


def _seg_set(segs, nd=9):
    """Order-insensitive canonical set of segments (endpoints sorted)."""
    out = set()
    for x1, y1, x2, y2 in np.round(np.asarray(segs), nd):
        p, q = (x1, y1), (x2, y2)
        out.add((p, q) if p <= q else (q, p))
    return out


def test_kernel_single_cell_cases():
    # one high corner -> one cutting segment
    v = np.array([[5.0, 0.0], [0.0, 0.0]])
    segs = CK.marching_squares(v, 2.5)
    assert len(segs) == 1
    # flat grid -> nothing
    assert len(CK.marching_squares(np.full((4, 4), 1.0), 2.0)) == 0
    # vertical gradient -> horizontal lines
    g = np.tile(np.arange(5, dtype=float)[:, None], (1, 5))
    segs = CK.marching_squares(g, 2.5)
    assert len(segs) == 4
    ys = np.unique(np.round(np.concatenate([segs[:, 1], segs[:, 3]]), 9))
    assert np.allclose(ys, 2.5)


def test_kernel_saddle_is_consistent():
    v = np.array([[1.0, 0.0], [0.0, 1.0]])  # case 10 saddle
    segs = CK.marching_squares(v, 0.6)
    assert len(segs) == 2


def test_distributed_matches_single_array(spark):
    arr, gt = RS.world4326(128)
    rows = RS.tiles_from_array("w", arr, gt, tile=32)
    tiles = spark.createDataFrame(pd.DataFrame(rows), schema=RS.RASTER_SCHEMA)
    levels = [100.0, 128.0, 150.0]
    got = CO.contour_segments(tiles, levels).collect()

    ref_sets = {}
    for lv in levels:
        segs = CK.marching_squares(arr.astype(np.float64), lv)
        # kernel coords are pixel-center indices; convert to world like the op
        w = np.column_stack([
            gt[0] + (segs[:, 0] + 0.5) * gt[1],
            gt[3] + (segs[:, 1] + 0.5) * gt[5],
            gt[0] + (segs[:, 2] + 0.5) * gt[1],
            gt[3] + (segs[:, 3] + 0.5) * gt[5],
        ])
        ref_sets[lv] = _seg_set(w)

    got_by_level = {}
    for r in got:
        got_by_level.setdefault(r["level"], []).append(
            (r["x1"], r["y1"], r["x2"], r["y2"])
        )
    for lv in levels:
        assert _seg_set(got_by_level[lv]) == ref_sets[lv]


def test_radial_contour_is_closed_ring(spark):
    # half-integer level: integer-quantized data never equals the level, so
    # crossings are strictly interior and the iso-line is a closed ring
    arr = RS.radial(64).astype(np.float64)
    segs = CK.marching_squares(arr, 128.5)
    assert len(segs) > 20
    # every endpoint appears exactly twice -> closed loop(s)
    pts: dict = {}
    for x1, y1, x2, y2 in np.round(segs, 9):
        for p in ((x1, y1), (x2, y2)):
            pts[p] = pts.get(p, 0) + 1
    assert all(v == 2 for v in pts.values())
