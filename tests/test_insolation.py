"""Daily potential insolation kernel (dem.insolation_kernel) properties."""

import math

import numpy as np

from lib_gdal_spark.operators import dem as D


def _pad(arr):
    p = np.full((arr.shape[0] + 2, arr.shape[1] + 2), np.nan)
    p[1:-1, 1:-1] = arr.astype(np.float64)
    return p


def _flat_expected(lat=45.0, decl=23.439281, n=12):
    # flat terrain: cang_t == U_t, so insol is the quantized sum of the
    # positive solar altitudes, independently recomputed with math.*
    phi, d = math.radians(lat), math.radians(decl)
    acc = 0
    for t in range(n):
        h = -math.pi + (t + 0.5) * (2.0 * math.pi / n)
        u = (math.sin(phi) * math.sin(d)
             + math.cos(phi) * math.cos(d) * math.cos(h))
        if u > 0.0:
            acc += int(math.floor(u * 1e9 + 0.5))
    return acc * (24.0 / n) / 1e9


def test_flat_surface_matches_closed_form():
    out = D.insolation_kernel(_pad(np.full((8, 8), 100.0)), 1.0, -1.0)
    want = _flat_expected()
    assert np.all(out[1:-1, 1:-1] == want)
    assert 5.0 < want < 12.0  # sane cos-weighted daylight hours


def test_south_facing_beats_north_facing_in_north():
    # ramp rising northward => south-facing slope; reverse for north
    rows = np.arange(34, dtype=np.float64)[:, None] * np.ones(34)
    south = D.insolation_kernel(_pad(rows * 0.3), 1.0, -1.0)
    north = D.insolation_kernel(_pad(rows[::-1] * 0.3), 1.0, -1.0)
    assert south[17, 17] > north[17, 17] > 0.0


def test_polar_night_is_zero():
    # lat -80 in June: the sun never clears the horizon plane
    out = D.insolation_kernel(_pad(np.full((6, 6), 0.0)), 1.0, -1.0,
                              lat=-80.0)
    assert np.all(out[1:-1, 1:-1] == 0.0)


def test_polar_day_counts_all_steps():
    # lat 80 in June: U > 0 at every hour angle, flat cang == U
    out = D.insolation_kernel(_pad(np.full((6, 6), 0.0)), 1.0, -1.0,
                              lat=80.0)
    phi, d = math.radians(80.0), math.radians(23.439281)
    us = [math.sin(phi) * math.sin(d)
          + math.cos(phi) * math.cos(d)
          * math.cos(-math.pi + (t + 0.5) * math.pi / 6) for t in range(12)]
    assert all(u > 0 for u in us)
    want = sum(int(math.floor(u * 1e9 + 0.5)) for u in us) * 2.0 / 1e9
    assert np.all(out[1:-1, 1:-1] == want)


def test_nan_halo_stays_nan():
    out = D.insolation_kernel(_pad(np.full((5, 5), 7.0)), 1.0, -1.0)
    assert np.isnan(out[0]).all() and np.isnan(out[:, 0]).all()
    assert not np.isnan(out[1:-1, 1:-1]).any()
