"""Line density raster (operators/grid.line_density)."""

import math

import numpy as np
import pandas as pd

from lib_gdal_spark.operators.grid import line_density


def _segs(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["sid", "x0", "y0", "x1", "y1"]),
        schema="sid long, x0 double, y0 double, x1 double, y1 double")


def test_analytic_chord_lengths(spark):
    # one horizontal segment through the center row of a single-cell
    # grid: cell 0,0 center (1,1), radius 0.8
    segs = _segs(spark, [(0, -5.0, 1.0, 7.0, 1.0)])   # through center
    r = 0.8
    out = {(q["ci"], q["cj"]): q for q in
           line_density(segs, radius=r, cell=2.0, nx=1, ny=1).collect()}
    got = out[(0, 0)]
    assert abs(got["length_units"] / 1e9 - 2 * r) < 1e-8  # full chord
    assert abs(got["density"] - 2 * r / (math.pi * r * r)) < 1e-8
    # entirely inside the disc
    segs2 = _segs(spark, [(0, 0.8, 1.0, 1.3, 1.0)])
    got2 = line_density(segs2, radius=r, cell=2.0, nx=1, ny=1).first()
    assert abs(got2["length_units"] / 1e9 - 0.5) < 1e-8
    # far away: zero but the cell row still exists
    segs3 = _segs(spark, [(0, 50.0, 50.0, 51.0, 50.0)])
    got3 = line_density(segs3, radius=r, cell=2.0, nx=1, ny=1).first()
    assert got3["length_units"] == 0 and got3["density"] == 0.0


def test_matches_bruteforce_all_pairs(spark):
    rng = np.random.default_rng(17)
    rows = []
    for i in range(50):
        x0, y0 = rng.uniform(0, 20, 2)
        ang = rng.uniform(0, 2 * np.pi)
        ln = rng.uniform(0.1, 3.0)
        rows.append((i, x0, y0, x0 + ln * np.cos(ang),
                     y0 + ln * np.sin(ang)))
    r, cell, nx, ny = 1.2, 2.0, 10, 10
    got = {(q["ci"], q["cj"]): q["length_units"] for q in
           line_density(_segs(spark, rows), radius=r, cell=cell,
                        nx=nx, ny=ny).collect()}
    ref = {}
    for ci in range(nx):
        for cj in range(ny):
            cx, cy = (ci + 0.5) * cell, (cj + 0.5) * cell
            tot = 0
            for _, x0, y0, x1, y1 in rows:
                dx, dy = x1 - x0, y1 - y0
                a = dx * dx + dy * dy
                fx, fy = x0 - cx, y0 - cy
                b = 2.0 * (fx * dx + fy * dy)
                c0 = fx * fx + fy * fy - r * r
                disc = b * b - 4.0 * a * c0
                L = 0.0
                if a > 0 and disc > 0:
                    sq = math.sqrt(disc)
                    lo = max((-b - sq) / (2.0 * a), 0.0)
                    hi = min((-b + sq) / (2.0 * a), 1.0)
                    if hi > lo:
                        L = (hi - lo) * math.sqrt(a)
                tot += int(math.floor(L * 1e9 + 0.5))
            ref[(ci, cj)] = tot
    assert got == ref
