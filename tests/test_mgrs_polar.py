"""Polar MGRS (UPS A/B/Y/Z lettering) — GEOTRANS scheme
(reference drivers/raster/nitf/mgrs.c:222,900,1007)."""

from __future__ import annotations

import numpy as np
import pytest

from lib_gdal_spark.functions import cells as C
from lib_gdal_spark.functions import crs as CRS


def test_pole_anchors():
    # published grid squares at the poles: ZAH (north), BAN (south)
    n = C.mgrs_polar_from_ups(np.array([True]), np.array([2e6]),
                              np.array([2e6]))
    s = C.mgrs_polar_from_ups(np.array([False]), np.array([2e6]),
                              np.array([2e6]))
    assert n[0] == "ZAH0000000000"
    assert s[0] == "BAN0000000000"


def test_cap_roundtrip_fuzz():
    rng = np.random.default_rng(7)
    n = 20000
    lon = rng.uniform(-180, 180, n)
    lat = np.where(rng.random(n) < 0.5,
                   rng.uniform(84, 90, n),
                   rng.uniform(-90, -80.0000001, n))
    north = lat >= 0
    E = np.empty(n)
    N = np.empty(n)
    ups_n = CRS.get_crs_transform(32661)
    ups_s = CRS.get_crs_transform(32761)
    E[north], N[north] = ups_n.forward(lon[north], lat[north])
    E[~north], N[~north] = ups_s.forward(lon[~north], lat[~north])
    for p in (1, 3, 5):
        codes = C.mgrs_polar_from_ups(north, E, N, precision=p)
        nb, Eb, Nb = C.mgrs_polar_to_ups(codes, precision=p)
        unit = 10.0 ** (5 - p)
        assert (nb == north).all()
        assert np.max(np.abs(Eb - np.round(E / unit) * unit)) == 0.0
        assert np.max(np.abs(Nb - np.round(N / unit) * unit)) == 0.0


def test_lonlat_entry_and_domain():
    codes = C.mgrs_polar_from_lonlat(
        np.array([0.0, 10.0]), np.array([88.0, -85.0]))
    assert codes[0][0] in "YZ" and codes[1][0] in "AB"
    with pytest.raises(ValueError):
        C.mgrs_polar_from_lonlat(np.array([0.0]), np.array([45.0]))


def test_decode_rejects_invalid_letters():
    # D/E/M/N/V/W never appear as second letters; I/O never as third
    for bad in ("ZDH0000000000", "YIM0000000000", "AXO0000000000"):
        with pytest.raises(ValueError):
            C.mgrs_polar_to_ups(np.array([bad], dtype=object))


def test_ups_south_epsg_convention():
    """EPSG GN7-2 south-pole case: at the pole (FE, FN); along 0E the
    northing INCREASES away from the pole; McMurdo (166.7E) has +E/-N
    in EPSG:3031 — the published quadrant."""
    ups = CRS.get_crs_transform(32761)
    E, N = ups.forward(np.array([0.0]), np.array([-85.0]))
    assert abs(E[0] - 2_000_000.0) < 1e-6 and N[0] > 2_000_000.0
    ps = CRS.get_crs_transform(3031)
    E, N = ps.forward(np.array([166.67]), np.array([-77.85]))
    assert E[0] > 0 and N[0] < 0
    lo, la = ps.inverse(E, N)
    assert abs(lo[0] - 166.67) < 1e-9 and abs(la[0] + 77.85) < 1e-9
