"""GCP polynomial transformers (``core/alg/gdal_crs.cpp`` semantics).

Fit order-1..3 2-D polynomials mapping pixel space -> georeferenced space
from ground control points by least squares (the reference's CRS_compute);
apply vectorized. An order-1 fit on exact affine GCPs reproduces the
geotransform; higher orders absorb gentle warps. Plugs into
``kernels.resample.warp_tile(transform=...)`` like any coordinate pipeline
stage (``gdaltransformer.cpp:1070``).
"""

from __future__ import annotations

import numpy as np

_TERMS = {1: 3, 2: 6, 3: 10}


def _design(x: np.ndarray, y: np.ndarray, order: int) -> np.ndarray:
    cols = [np.ones_like(x), x, y]
    if order >= 2:
        cols += [x * y, x * x, y * y]
    if order >= 3:
        cols += [x * x * y, x * y * y, x**3, y**3]
    return np.column_stack(cols)


def fit_gcp_polynomial(gcps: np.ndarray, order: int = 1):
    """gcps: (n, 4) rows of (pixel, line, geo_x, geo_y) -> (cx, cy) coefs.

    Requires n >= number of terms (3/6/10 for order 1/2/3).
    """
    if order not in _TERMS:
        raise ValueError("order must be 1, 2 or 3")
    g = np.asarray(gcps, dtype=np.float64)
    if len(g) < _TERMS[order]:
        raise ValueError(f"need >= {_TERMS[order]} GCPs for order {order}")
    A = _design(g[:, 0], g[:, 1], order)
    cx, *_ = np.linalg.lstsq(A, g[:, 2], rcond=None)
    cy, *_ = np.linalg.lstsq(A, g[:, 3], rcond=None)
    return cx, cy


def apply_polynomial(cx: np.ndarray, cy: np.ndarray, x: np.ndarray,
                     y: np.ndarray, order: int = 1):
    """(pixel, line) arrays -> (geo_x, geo_y)."""
    A = _design(np.asarray(x, dtype=np.float64).ravel(),
                np.asarray(y, dtype=np.float64).ravel(), order)
    gx = (A @ cx).reshape(np.shape(x))
    gy = (A @ cy).reshape(np.shape(x))
    return gx, gy


def gcp_transform(gcps: np.ndarray, order: int = 1):
    """Closure usable as ``warp_tile(transform=...)`` (dst->src georef)."""
    cx, cy = fit_gcp_polynomial(gcps, order)

    def t(x: np.ndarray, y: np.ndarray):
        return apply_polynomial(cx, cy, x, y, order)

    return t
