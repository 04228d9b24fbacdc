"""GCP polynomial fit: affine recovery, quadratic surfaces, warp plumbing."""

from __future__ import annotations

import numpy as np
import pytest

from lib_gdal_spark.functions import transforms as T
from lib_gdal_spark.kernels import resample as R


def _gcps_from(f, n=25):
    px, py = np.meshgrid(np.linspace(0, 100, 5), np.linspace(0, 100, 5))
    gx, gy = f(px.ravel(), py.ravel())
    return np.column_stack([px.ravel(), py.ravel(), gx, gy])


def test_order1_recovers_affine():
    gt = (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)

    def affine(x, y):
        return R.gt_apply(gt, x, y)

    gcps = _gcps_from(affine)
    cx, cy = T.fit_gcp_polynomial(gcps, order=1)
    x = np.array([3.7, 50.1, 99.9])
    y = np.array([12.0, 0.4, 77.7])
    gx, gy = T.apply_polynomial(cx, cy, x, y, order=1)
    ex, ey = affine(x, y)
    assert np.allclose(gx, ex, rtol=1e-12)
    assert np.allclose(gy, ey, rtol=1e-12)


def test_order2_recovers_quadratic():
    def quad(x, y):
        return 10 + x + 0.01 * x * y + 0.002 * x * x, 5 - y + 0.003 * y * y

    gcps = _gcps_from(quad)
    cx, cy = T.fit_gcp_polynomial(gcps, order=2)
    x = np.array([33.3, 66.6])
    y = np.array([11.1, 88.8])
    gx, gy = T.apply_polynomial(cx, cy, x, y, order=2)
    ex, ey = quad(x, y)
    assert np.allclose(gx, ex, rtol=1e-9)
    assert np.allclose(gy, ey, rtol=1e-9)


def test_too_few_gcps_raises():
    with pytest.raises(ValueError):
        T.fit_gcp_polynomial(np.zeros((4, 4)), order=2)


def test_gcp_transform_drives_warp():
    from lib_gdal_spark.sources import rasters as RS

    src = RS.gradient(64).astype(np.float64)
    src_gt = (0.0, 1.0, 0.0, 64.0, 0.0, -1.0)
    # identity-ish GCP transform: dst georef == src georef
    gcps = _gcps_from(lambda x, y: (x, y))
    t = T.gcp_transform(gcps, order=1)
    out = R.warp_tile(src, src_gt, (32, 32),
                      (0.0, 2.0, 0.0, 64.0, 0.0, -2.0),
                      alg="nearest", transform=t)
    direct = R.warp_tile(src, src_gt, (32, 32),
                         (0.0, 2.0, 0.0, 64.0, 0.0, -2.0), alg="nearest")
    assert np.array_equal(out, direct)
