"""Axial hex binning (functions/cells.hex_axial_expr).

Pins the Spark expression tree to the NumPy twin (same op order), then
checks lattice properties: center-of-cell re-bins to the same cell, and
every point lands within one circumradius of its cell center (the
containment bound of cube rounding)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from lib_gdal_spark.functions import cells as C

SIZES = [4.0, 0.5]


@pytest.fixture(scope="module")
def pts(spark):
    rng = np.random.default_rng(20260819)
    n = 5000
    pdf = pd.DataFrame({
        "pid": np.arange(n, dtype=np.int64),
        "lon": rng.uniform(-180.0, 180.0, n),
        "lat": rng.uniform(-85.0, 85.0, n),
    })
    return pdf, spark.createDataFrame(pdf)


@pytest.mark.parametrize("size", SIZES)
def test_matches_numpy_twin(pts, size):
    pdf, df = pts
    h = C.hex_axial_expr(F.col("lon"), F.col("lat"), size)
    got = (df.select("pid", h["q"].alias("q"), h["r"].alias("r"))
           .orderBy("pid").toPandas())
    eq, er = C.hex_axial_np(pdf["lon"].to_numpy(), pdf["lat"].to_numpy(),
                            size)
    assert (got["q"].to_numpy() == eq).all()
    assert (got["r"].to_numpy() == er).all()


@pytest.mark.parametrize("size", SIZES)
def test_center_rebins_to_same_cell(pts, size):
    pdf, _ = pts
    q, r = C.hex_axial_np(pdf["lon"].to_numpy(), pdf["lat"].to_numpy(),
                          size)
    cx = (C.HEX_SQRT3 * (q + r / 2.0)) * size
    cy = r * 1.5 * size
    q2, r2 = C.hex_axial_np(cx, cy, size)
    assert (q2 == q).all() and (r2 == r).all()


@pytest.mark.parametrize("size", SIZES)
def test_containment_radius(pts, size):
    # cube rounding assigns each point to the nearest lattice center in
    # cube space; in the plane that bounds the distance by the
    # circumradius R (hexagon max half-diameter).
    pdf, _ = pts
    lon = pdf["lon"].to_numpy()
    lat = pdf["lat"].to_numpy()
    q, r = C.hex_axial_np(lon, lat, size)
    cx = (C.HEX_SQRT3 * (q + r / 2.0)) * size
    cy = r * 1.5 * size
    d = np.hypot(lon - cx, lat - cy)
    assert (d <= size * 1.0000001).all()


def test_adjacent_cells_share_edge_distance():
    # the 6 axial neighbors are exactly one hex distance away
    q0, r0 = 3, -2
    size = 1.0
    for dq, dr in [(1, 0), (-1, 0), (0, 1), (0, -1), (1, -1), (-1, 1)]:
        q, r = q0 + dq, r0 + dr
        dist = (abs(dq) + abs(dr) + abs(dq + dr)) // 2
        assert dist == 1
        cx0 = (C.HEX_SQRT3 * (q0 + r0 / 2.0)) * size
        cy0 = r0 * 1.5 * size
        cx = (C.HEX_SQRT3 * (q + r / 2.0)) * size
        cy = r * 1.5 * size
        assert np.hypot(cx - cx0, cy - cy0) == pytest.approx(
            C.HEX_SQRT3 * size)
