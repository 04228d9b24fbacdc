"""Curve geometry linearization — CircularString / CompoundCurve /
CurvePolygon / MultiCurve / MultiSurface -> their linear counterparts.

Behavioral spec (reimplemented, not copied):
``OGRGeometryFactory::GetCurveParmeters`` (circumcenter through an arc's
3 defining points with magnitude normalization, CCW/CW by determinant
sign — ``core/ogr/ogrgeometryfactory.cpp:4649``), the stroking loop
(constant angle step, ``nSteps = max(4, int(|Δα|/step + 0.5))`` per arc
half — ``:StrokeArc``), the 4° default step (``OGR_ARC_STEPSIZE``,
``:3869``), the full-circle convention (p0 == p2 -> CCW circle through
the midpoint, like PostGIS), and direction symmetry (an arc called with
swapped endpoints strokes the reverse point-for-point —
``curveToLineString`` ``:4910``). Intermediate points are emitted
EXPLICITLY (the reference's ``ADD_INTERMEDIATE_POINT=YES`` mode; the
default "stealth" low-bit encoding is a PostGIS round-tripping hack this
engine doesn't need).

Everything here is batch NumPy, usable inside Arrow UDFs.
"""

from __future__ import annotations

import numpy as np

from lib_gdal_spark.functions import geometry as G

DEFAULT_ARC_STEP_DEG = 4.0  # OGR_ARC_STEPSIZE default


def get_curve_parameters(x0, y0, x1, y1, x2, y2):
    """3 arc points -> (R, cx, cy, alpha0, alpha1, alpha2) or None if the
    points are collinear/degenerate (caller falls back to straight lines).
    Angles are ordered monotonically (CCW positive)."""
    if any(map(np.isnan, (x0, y0, x1, y1, x2, y2))):
        return None
    if x0 == x2 and y0 == y2:
        if x0 == x1 and y0 == y1:
            return None
        cx, cy = (x0 + x1) / 2.0, (y0 + y1) / 2.0
        R = float(np.hypot(x0 - cx, y0 - cy))
        a0 = float(np.arctan2(y0 - cy, x0 - cx))
        return R, cx, cy, a0, a0 + np.pi, a0 + 2.0 * np.pi
    dx01, dy01 = x1 - x0, y1 - y0
    dx12, dy12 = x2 - x1, y2 - y1
    scale = max(abs(dx01), abs(dy01), abs(dx12), abs(dy12))
    inv = 1.0 / scale
    dx01 *= inv
    dy01 *= inv
    dx12 *= inv
    dy12 *= inv
    det = dx01 * dy12 - dx12 * dy01
    if abs(det) < 1e-8 or np.isnan(det):
        return None
    x01m, x12m = (x0 + x1) * inv, (x1 + x2) * inv
    y01m, y12m = (y0 + y1) * inv, (y1 + y2) * inv
    c01 = dx01 * x01m + dy01 * y01m
    c12 = dx12 * x12m + dy12 * y12m
    cx = 0.5 * scale * (c01 * dy12 - c12 * dy01) / det
    cy = 0.5 * scale * (-c01 * dx12 + c12 * dx01) / det
    a0 = float(np.arctan2((y0 - cy) * inv, (x0 - cx) * inv))
    a1 = float(np.arctan2((y1 - cy) * inv, (x1 - cx) * inv))
    a2 = float(np.arctan2((y2 - cy) * inv, (x2 - cx) * inv))
    R = float(np.hypot(x0 - cx, y0 - cy))
    if det < 0:  # clockwise
        if a1 > a0:
            a1 -= 2.0 * np.pi
        if a2 > a1:
            a2 -= 2.0 * np.pi
    else:
        if a1 < a0:
            a1 += 2.0 * np.pi
        if a2 < a1:
            a2 += 2.0 * np.pi
    return R, cx, cy, a0, a1, a2


def _stroke_half(cx, cy, R, a0, a1, step_rad):
    """Intermediate points STRICTLY between a0 and a1 at a constant step
    (nSteps >= 4 like the reference's non-stealth floor)."""
    sign = 1 if a1 >= a0 else -1
    n_steps = max(4, int(abs(a1 - a0) / step_rad + 0.5))
    step = sign * abs(a1 - a0) / n_steps
    alphas = a0 + step * np.arange(1, n_steps)
    keep = (alphas - a1) * sign < -1e-8
    alphas = alphas[keep]
    return np.column_stack([cx + R * np.cos(alphas),
                            cy + R * np.sin(alphas)])


def stroke_arc3(p0, p1, p2, step_deg: float = DEFAULT_ARC_STEP_DEG):
    """One 3-point arc -> (n, 2) vertices INCLUDING p0/p1/p2 explicitly.
    Collinear input degenerates to the 3 points themselves."""
    params = get_curve_parameters(p0[0], p0[1], p1[0], p1[1], p2[0], p2[1])
    pts = [np.asarray(p0, np.float64)[:2][None, :]]
    if params is None:
        pts.append(np.asarray(p1, np.float64)[:2][None, :])
    else:
        R, cx, cy, a0, a1, a2 = params
        step_rad = max(step_deg, 0.01) * np.pi / 180.0
        pts.append(_stroke_half(cx, cy, R, a0, a1, step_rad))
        pts.append(np.asarray(p1, np.float64)[:2][None, :])
        pts.append(_stroke_half(cx, cy, R, a1, a2, step_rad))
    pts.append(np.asarray(p2, np.float64)[:2][None, :])
    return np.vstack(pts)


def linearize_circularstring(
    arr: np.ndarray, step_deg: float = DEFAULT_ARC_STEP_DEG
) -> np.ndarray:
    """CircularString vertex array (odd n) -> stroked LineString array."""
    arr = np.asarray(arr, np.float64)
    out = [arr[0:1, :2]]
    for k in range(0, len(arr) - 2, 2):
        seg = stroke_arc3(arr[k], arr[k + 1], arr[k + 2], step_deg)
        out.append(seg[1:])
    return np.vstack(out)


def _linearize_ring(base, ndim, payload, step_deg) -> np.ndarray:
    """A curve ring/member -> (n, 2) vertex array."""
    if base == G.WKB_LINESTRING:
        return np.asarray(payload, np.float64)[:, :2]
    if base == G.WKB_CIRCULARSTRING:
        return linearize_circularstring(payload, step_deg)
    if base == G.WKB_COMPOUNDCURVE:
        parts = [_linearize_ring(b, nd, p, step_deg)
                 for b, nd, p in payload]
        out = [parts[0]]
        for seg in parts[1:]:
            out.append(seg[1:])  # components share endpoints
        return np.vstack(out)
    raise ValueError(f"not a curve component: type {base}")


def curve_to_line(wkb: bytes,
                  step_deg: float = DEFAULT_ARC_STEP_DEG) -> bytes:
    """WKB curve geometry -> WKB linear geometry (getLinearGeometry):
    CircularString/CompoundCurve -> LineString; CurvePolygon -> Polygon;
    MultiCurve -> MultiLineString; MultiSurface -> MultiPolygon. Linear
    input passes through unchanged."""
    base, ndim, payload = G.parse_wkb_full(wkb)
    if base == G.WKB_CIRCULARSTRING:
        return G.wkb_linestring(linearize_circularstring(payload, step_deg))
    if base == G.WKB_COMPOUNDCURVE:
        return G.wkb_linestring(
            _linearize_ring(base, ndim, payload, step_deg))
    if base == G.WKB_CURVEPOLYGON:
        return G.wkb_polygon([
            _linearize_ring(b, nd, p, step_deg) for b, nd, p in payload
        ])
    if base == G.WKB_MULTICURVE:
        return G.wkb_multilinestring([
            _linearize_ring(b, nd, p, step_deg) for b, nd, p in payload
        ])
    if base == G.WKB_MULTISURFACE:
        polys = []
        for b, nd, p in payload:
            if b == G.WKB_POLYGON:
                polys.append([np.asarray(r)[:, :2] for r in p])
            elif b == G.WKB_CURVEPOLYGON:
                polys.append([
                    _linearize_ring(rb, rnd, rp, step_deg)
                    for rb, rnd, rp in p
                ])
            else:
                raise ValueError(f"MultiSurface member type {b}")
        return G.wkb_multipolygon(polys)
    return wkb
