"""Lee's L: perfect co-clustering -> strongly positive; x clustered
where y is absent -> negative; matches a naive local computation."""

import random

from lib_gdal_spark.operators.spatialstats import lees_l
from lib_gdal_spark.session import local_df


def _df(spark, cells):
    rows = [(gx, gy, x, y) for (gx, gy), (x, y) in cells.items()]
    return local_df(spark, rows, "gx int, gy int, x long, y long")


def _naive(cells):
    n = len(cells)
    sx = sum(x for x, _ in cells.values())
    sy = sum(y for _, y in cells.values())
    dev = {k: (n * x - sx, n * y - sy) for k, (x, y) in cells.items()}
    offs = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
            if (dx, dy) != (0, 0)]
    num = sdeg2 = 0
    for (gx, gy) in cells:
        wx = wy = deg = 0
        for dx, dy in offs:
            nb = (gx + dx, gy + dy)
            if nb in cells:
                wx += dev[nb][0]
                wy += dev[nb][1]
                deg += 1
        num += wx * wy
        sdeg2 += deg * deg
    sxx = sum(d[0] ** 2 for d in dev.values())
    syy = sum(d[1] ** 2 for d in dev.values())
    return n / sdeg2 * num / (sxx * syy) ** 0.5


def test_co_clustered_positive(spark):
    # x and y both high in one corner block, low elsewhere
    cells = {(gx, gy): ((10, 10) if gx < 3 and gy < 3 else (1, 1))
             for gx in range(6) for gy in range(6)}
    r = lees_l(_df(spark, cells)).first()
    assert r["lees_l"] > 0.5


def test_anti_clustered_negative(spark):
    # x high where y low and vice versa (two separated blocks)
    cells = {}
    for gx in range(6):
        for gy in range(6):
            if gx < 3:
                cells[(gx, gy)] = (10, 1)
            else:
                cells[(gx, gy)] = (1, 10)
    r = lees_l(_df(spark, cells)).first()
    assert r["lees_l"] < -0.5


def test_matches_naive(spark):
    rng = random.Random(13)
    cells = {(gx, gy): (rng.randrange(1, 30), rng.randrange(1, 30))
             for gx in range(7) for gy in range(5) if rng.random() < 0.8}
    r = lees_l(_df(spark, cells)).first()
    assert abs(r["lees_l"] - _naive(cells)) < 1e-12
