"""Minimum rotated rectangle (operators/vectorops.min_rotated_rect)."""

import math

import numpy as np
import pandas as pd

from lib_gdal_spark.operators.vectorops import min_rotated_rect


def _verts(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["fid", "idx", "x", "y"]),
        schema="fid long, idx long, x double, y double")


def test_rotated_rectangle_recovers_itself(spark):
    # a 4x2 rectangle rotated 30 deg: its min rotated rect is itself
    ang = math.radians(30)
    c, s = math.cos(ang), math.sin(ang)
    base = [(-2, -1), (2, -1), (2, 1), (-2, 1)]
    rows = [(1, i, 3 + x * c - y * s, 5 + x * s + y * c)
            for i, (x, y) in enumerate(base)]
    got = min_rotated_rect(_verts(spark, rows)).first()
    assert abs(got["area"] - 8.0) < 1e-9
    assert abs(min(got["width"], got["height"]) - 2.0) < 1e-9
    assert abs(max(got["width"], got["height"]) - 4.0) < 1e-9


def test_beats_or_matches_fine_angle_sweep(spark):
    rng = np.random.default_rng(37)
    pts = rng.uniform(0, 10, size=(9, 2))
    rows = [(1, i, float(x), float(y)) for i, (x, y) in enumerate(pts)]
    got = min_rotated_rect(_verts(spark, rows)).first()
    # dense angle sweep lower-bounds nothing but approximates the
    # optimum; the calipers result must be <= every sampled box + eps
    best_sweep = math.inf
    for ang in np.linspace(0, math.pi / 2, 5000):
        ca, sa = math.cos(ang), math.sin(ang)
        u = pts[:, 0] * ca + pts[:, 1] * sa
        v = -pts[:, 0] * sa + pts[:, 1] * ca
        best_sweep = min(best_sweep,
                         (u.max() - u.min()) * (v.max() - v.min()))
    assert got["area"] <= best_sweep + 1e-6
    assert abs(got["area"] - best_sweep) < 1e-2  # sweep approaches it
    # non-convex inputs still work (hull bridge is a vertex pair)
    star = [(2, i, float(3 * math.cos(2 * math.pi * i / 10)
                         * (1 if i % 2 == 0 else 0.4)),
             float(3 * math.sin(2 * math.pi * i / 10)
                   * (1 if i % 2 == 0 else 0.4)))
            for i in range(10)]
    got2 = min_rotated_rect(_verts(spark, star)).first()
    assert got2["area"] > 0
