"""Marching-squares contour kernel (``core/alg/contour.cpp:310,523`` and the
``core/alg/marching_squares/*.h`` templates, reimplemented).

Semantics: values live at **pixel centers**; each 2x2 block of centers is a
marching-squares cell. An iso-level L crosses a cell edge when one corner is
>= L and the other < L; the crossing point is linearly interpolated. The
saddle cases (5, 10) are disambiguated with the cell's center average, like
the reference's mid-point heuristic. Output segments are in pixel-center
coordinates (caller maps to world via the geotransform).
"""

from __future__ import annotations

import numpy as np

# per case: list of (edge_from, edge_to) pairs; edges 0=top,1=right,
# 2=bottom,3=left of the 2x2 cell; corners bit order: TL=8, TR=4, BR=2, BL=1
_CASES: dict[int, list[tuple[int, int]]] = {
    0: [], 15: [],
    8: [(3, 0)], 7: [(0, 3)],
    4: [(0, 1)], 11: [(1, 0)],
    2: [(1, 2)], 13: [(2, 1)],
    1: [(2, 3)], 14: [(3, 2)],
    12: [(3, 1)], 3: [(1, 3)],
    6: [(0, 2)], 9: [(2, 0)],
    # saddles resolved at runtime
    5: [], 10: [],
}


def _edge_point(edge: int, ii, jj, a, b, c, d, level):
    """Interpolated crossing on a cell edge, in pixel-center coords.

    Cell corners: a=(i,j) TL, b=(i+1,j) TR, c=(i+1,j+1) BR, d=(i,j+1) BL.
    """
    if edge == 0:  # top: a-b
        t = (level - a) / (b - a)
        return ii + t, jj
    if edge == 1:  # right: b-c
        t = (level - b) / (c - b)
        return ii + 1.0, jj + t
    if edge == 2:  # bottom: d-c
        t = (level - d) / (c - d)
        return ii + t, jj + 1.0
    t = (level - a) / (d - a)  # left: a-d
    return ii, jj + t


def marching_squares(vals: np.ndarray, level: float,
                     x0: int = 0, y0: int = 0):
    """All contour segments of one level over a value grid.

    Returns an (n, 4) array of (x1, y1, x2, y2) in pixel-center coords.
    NaN corners suppress their cells (missing halo at raster edges).

    ``x0``/``y0`` offset the emitted coordinates by an integer origin
    BEFORE the fractional crossing is added, so a coordinate is always
    ``fl(global_integer + t)`` — one rounding, bitwise identical for
    every tiling of the same raster (a locally-offset ``fl(fl(local + t)
    + origin)`` can differ in the last ulp between tilings).
    """
    h, w = vals.shape
    if h < 2 or w < 2:
        return np.empty((0, 4))
    a = vals[:-1, :-1]
    b = vals[:-1, 1:]
    c = vals[1:, 1:]
    d = vals[1:, :-1]
    ok = ~(np.isnan(a) | np.isnan(b) | np.isnan(c) | np.isnan(d))
    code = (
        (a >= level).astype(np.int8) * 8
        + (b >= level).astype(np.int8) * 4
        + (c >= level).astype(np.int8) * 2
        + (d >= level).astype(np.int8) * 1
    )
    code = np.where(ok, code, 0)
    segs = []
    jj_all, ii_all = np.meshgrid(np.arange(h - 1) + int(y0),
                                 np.arange(w - 1) + int(x0),
                                 indexing="ij")

    def emit(mask, e1, e2):
        if not mask.any():
            return
        ii = ii_all[mask].astype(np.float64)
        jj = jj_all[mask].astype(np.float64)
        av, bv, cv, dv = a[mask], b[mask], c[mask], d[mask]
        x1, y1 = _edge_point(e1, ii, jj, av, bv, cv, dv, level)
        x2, y2 = _edge_point(e2, ii, jj, av, bv, cv, dv, level)
        segs.append(np.column_stack([x1, y1, x2, y2]))

    for case, pairs in _CASES.items():
        if case in (5, 10) or not pairs:
            continue
        emit(code == case, pairs[0][0], pairs[0][1])

    # saddles: center average decides which corners connect
    for case in (5, 10):
        mask = code == case
        if not mask.any():
            continue
        center = (a + b + c + d) / 4.0
        hi = center >= level
        if case == 5:  # TR+BL high
            emit(mask & hi, 0, 1)
            emit(mask & hi, 2, 3)
            emit(mask & ~hi, 0, 3)
            emit(mask & ~hi, 2, 1)
        else:  # 10: TL+BR high
            emit(mask & hi, 3, 0)
            emit(mask & hi, 1, 2)
            emit(mask & ~hi, 1, 0)
            emit(mask & ~hi, 3, 2)

    if not segs:
        return np.empty((0, 4))
    return np.vstack(segs)
