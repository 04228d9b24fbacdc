"""Constructive geometry: Distance / Centroid / Buffer / ConvexHull /
Simplify (VERDICT r1 "What's missing" #4).

Reference: ``core/ogr/ogrgeometry.cpp:3185`` (Distance), ``:5100``
(Centroid), ``:3896`` (Buffer), ``:3654`` (ConvexHull), ``:5354``
(Simplify / SimplifyPreserveTopology) — all GEOS delegations in the
reference; re-implemented here from the public algorithms:

- Distance: min pairwise segment-segment distance (0 if interiors
  overlap), vectorized over edge pairs.
- Centroid: area-weighted polygon centroid (holes negative), the
  standard shoelace moment formulas.
- Buffer: positive distance = boolean union of per-edge rectangles and
  per-vertex circle approximations (``quadsegs`` segments per quadrant,
  GEOS's parameter) over the slab kernel; negative distance = erosion via
  subtracting the boundary buffer.
- ConvexHull: Andrew monotone chain.
- Simplify: Douglas–Peucker on each ring (GDAL Simplify semantics, no
  topology preservation).
"""

from __future__ import annotations

import numpy as np

from lib_gdal_spark.functions import overlay as OV

Ring = np.ndarray


def _close(r: np.ndarray) -> np.ndarray:
    r = np.asarray(r, np.float64)
    if not np.array_equal(r[0], r[-1]):
        r = np.vstack([r, r[0]])
    return r


def _segments(rings: list[Ring]) -> np.ndarray:
    segs = []
    for r in rings:
        r = _close(r)
        segs.append(np.hstack([r[:-1], r[1:]]))
    return np.vstack(segs) if segs else np.empty((0, 4))


def _seg_point_dist(segs: np.ndarray, px: np.ndarray, py: np.ndarray):
    """Min distance from each point to the segment set."""
    a = segs[:, :2][None, :, :]
    b = segs[:, 2:][None, :, :]
    p = np.column_stack([px, py])[:, None, :]
    ab = b - a
    denom = (ab * ab).sum(-1)
    t = np.clip(((p - a) * ab).sum(-1) / np.where(denom == 0, 1.0, denom),
                0.0, 1.0)
    proj = a + t[..., None] * ab
    d = np.sqrt(((p - proj) ** 2).sum(-1))
    return d.min(axis=1)


def distance(rings_a: list[Ring], rings_b: list[Ring]) -> float:
    """Min distance between two polygon boundaries; 0 when they overlap
    (one contains a vertex of the other, or boundaries cross)."""
    sa = _segments(rings_a)
    sb = _segments(rings_b)
    if len(sa) == 0 or len(sb) == 0:
        return float("nan")
    # containment / crossing -> distance 0
    if OV._point_in_rings_eo(sa[0, 0], sa[0, 1], rings_b):
        return 0.0
    if OV._point_in_rings_eo(sb[0, 0], sb[0, 1], rings_a):
        return 0.0
    if OV.polys_area(OV.boolean_op(rings_a, rings_b, "intersection")) > 0:
        return 0.0
    # min over (endpoints of A to segs of B) and (endpoints of B to segs A)
    d1 = _seg_point_dist(sb, sa[:, 0], sa[:, 1]).min()
    d2 = _seg_point_dist(sa, sb[:, 0], sb[:, 1]).min()
    return float(min(d1, d2))


def centroid(rings: list[Ring]) -> tuple[float, float]:
    """Area centroid; holes (negative shoelace) subtract naturally."""
    A = cx = cy = 0.0
    for r in rings:
        r = _close(r)
        x0, y0 = r[:-1, 0], r[:-1, 1]
        x1, y1 = r[1:, 0], r[1:, 1]
        cross = x0 * y1 - x1 * y0
        A += cross.sum() / 2.0
        cx += ((x0 + x1) * cross).sum() / 6.0
        cy += ((y0 + y1) * cross).sum() / 6.0
    if A == 0.0:
        pts = np.vstack([_close(r)[:-1] for r in rings])
        return float(pts[:, 0].mean()), float(pts[:, 1].mean())
    return cx / A, cy / A


def convex_hull(points: np.ndarray) -> np.ndarray:
    """Andrew monotone chain -> closed CCW hull ring."""
    pts = np.unique(np.asarray(points, np.float64), axis=0)
    if len(pts) <= 2:
        return _close(pts) if len(pts) else pts
    # lexicographic sort is already the np.unique order
    def half(iterable):
        out = []
        for p in iterable:
            while len(out) >= 2 and np.cross(out[-1] - out[-2],
                                             p - out[-2]) <= 0:
                out.pop()
            out.append(p)
        return out
    lower = half(pts)
    upper = half(pts[::-1])
    hull = np.array(lower[:-1] + upper[:-1])
    return _close(hull)


def simplify(ring: np.ndarray, tolerance: float) -> np.ndarray:
    """Douglas–Peucker on a (closed or open) ring."""
    r = np.asarray(ring, np.float64)
    closed = np.array_equal(r[0], r[-1])
    pts = r[:-1] if closed else r
    if len(pts) < 3:
        return r.copy()

    keep = np.zeros(len(pts), dtype=bool)
    keep[0] = keep[-1] = True

    def dp(i0, i1):
        if i1 <= i0 + 1:
            return
        seg = np.array([[pts[i0][0], pts[i0][1], pts[i1][0], pts[i1][1]]])
        mid = pts[i0 + 1:i1]
        d = _seg_point_dist(seg, mid[:, 0], mid[:, 1])
        k = int(np.argmax(d))
        if d[k] > tolerance:
            keep[i0 + 1 + k] = True
            dp(i0, i0 + 1 + k)
            dp(i0 + 1 + k, i1)

    dp(0, len(pts) - 1)
    out = pts[keep]
    if closed:
        out = np.vstack([out, out[0]])
    return out


def _circle(cx: float, cy: float, d: float, quadsegs: int) -> np.ndarray:
    n = max(4 * quadsegs, 8)
    th = np.linspace(0.0, 2.0 * np.pi, n + 1)
    return np.column_stack([cx + d * np.cos(th), cy + d * np.sin(th)])


def buffer_point(x: float, y: float, dist: float,
                 quadsegs: int = 8) -> list[list[np.ndarray]]:
    return [[_circle(x, y, dist, quadsegs)]]


def _boundary_buffer_rings(rings: list[Ring], dist: float,
                           quadsegs: int) -> list[Ring]:
    """Union of edge rectangles + vertex circles as one ring soup, merged
    sequentially through the boolean kernel."""
    cur: list[np.ndarray] = []

    def union_in(piece_rings: list[np.ndarray]):
        nonlocal cur
        if not cur:
            cur = OV.boolean_op(piece_rings, [], "union")
            cur = [r for p in cur for r in p]
        else:
            polys = OV.boolean_op(cur, piece_rings, "union")
            cur = [r for p in polys for r in p]

    for r in rings:
        r = _close(r)
        for i in range(len(r) - 1):
            (x0, y0), (x1, y1) = r[i], r[i + 1]
            dx, dy = x1 - x0, y1 - y0
            ln = float(np.hypot(dx, dy))
            if ln > 0:
                nx, ny = -dy / ln * dist, dx / ln * dist
                rect = np.array([
                    [x0 + nx, y0 + ny], [x1 + nx, y1 + ny],
                    [x1 - nx, y1 - ny], [x0 - nx, y0 - ny],
                    [x0 + nx, y0 + ny],
                ])
                union_in([rect])
            union_in([_circle(x0, y0, dist, quadsegs)])
    return cur


def buffer_polygon(rings: list[Ring], dist: float,
                   quadsegs: int = 8) -> list[list[np.ndarray]]:
    """GEOS-style polygon buffer: dilation (dist > 0) or erosion (< 0)."""
    if dist == 0.0:
        return OV.boolean_op(rings, [], "union")
    bb = _boundary_buffer_rings(rings, abs(dist), quadsegs)
    if dist > 0.0:
        polys = OV.boolean_op(rings, bb, "union")
    else:
        polys = OV.boolean_op(rings, bb, "difference")
    return polys


def boundary(rings: list[Ring]) -> list[np.ndarray]:
    """OGR Boundary (``ogrgeometry.cpp:3769``): a polygon's boundary is its
    rings as closed linestrings."""
    return [_close(r).copy() for r in rings]


def segmentize(ring: np.ndarray, max_length: float) -> np.ndarray:
    """OGR Segmentize (``ogrgeometry.cpp`` / ogr2ogr -segmentize): insert
    vertices so no segment exceeds ``max_length`` (equal subdivisions)."""
    r = np.asarray(ring, np.float64)
    out = [r[0]]
    for i in range(len(r) - 1):
        a, b = r[i], r[i + 1]
        ln = float(np.hypot(*(b - a)))
        n = max(int(np.ceil(ln / max_length)), 1)
        for k in range(1, n + 1):
            out.append(a + (b - a) * (k / n))
    return np.asarray(out)


def make_valid(rings: list[Ring]) -> list[list[np.ndarray]]:
    """OGR MakeValid (``ogrgeometry.cpp:5433``): normalize an arbitrary
    ring soup (self-intersections, wrong orientations, overlapping rings)
    into valid polygons-with-holes under even-odd semantics."""
    return OV.boolean_op(rings, [], "union")


def point_on_surface(rings: list[Ring]) -> tuple[float, float]:
    """OGR PointOnSurface (``ogrgeometry.cpp:3536``): a point guaranteed
    interior — midpoint of the widest even-odd span on a scanline chosen
    between distinct vertex y's (the GEOS interior-point construction)."""
    ys = np.unique(np.concatenate([_close(r)[:, 1] for r in rings]))
    if len(ys) < 2:
        raise ValueError("degenerate polygon")
    # scan the gap between the two middle distinct vertex rows
    k = len(ys) // 2
    y = 0.5 * (ys[k - 1] + ys[k])
    xs = []
    for r in rings:
        rr = _close(r)
        x0, y0 = rr[:-1, 0], rr[:-1, 1]
        x1, y1 = rr[1:, 0], rr[1:, 1]
        cross = (y0 <= y) != (y1 <= y)
        with np.errstate(divide="ignore", invalid="ignore"):
            xi = x0 + (y - y0) * (x1 - x0) / np.where(y1 == y0, 1.0, y1 - y0)
        xs.extend(xi[cross].tolist())
    xs = sorted(xs)
    if len(xs) < 2:
        raise ValueError("no interior span found")
    spans = [(xs[i + 1] - xs[i], i) for i in range(0, len(xs) - 1, 2)]
    w, i = max(spans)
    return (0.5 * (xs[i] + xs[i + 1]), y)


def force_to_multipolygon(wkb: bytes) -> bytes:
    """OGR ForceToMultiPolygon (used by gensql,
    ``drivers/ogr_gensql.cpp:1396-1416``): wrap a Polygon as MultiPolygon;
    MultiPolygon passes through."""
    from lib_gdal_spark.functions import geometry as G

    gtype, payload = G.parse_wkb(wkb)
    if gtype == G.WKB_MULTIPOLYGON:
        return bytes(wkb)
    if gtype == G.WKB_POLYGON:
        return G.wkb_multipolygon([payload])
    raise ValueError(f"cannot force WKB type {gtype} to MultiPolygon")


# ---------------------------------------------------------------------------
# Distance3D (``core/ogr/ogrgeometry.cpp:3319``). The reference delegates to
# SFCGAL and returns -1.0 when either geometry is not 3-D (or SFCGAL is
# absent). Here: exact 3-D min distance over the geometries' points and
# segments (vertex/edge sets; polygon FACE interiors are not modeled —
# boundary distance, documented deviation), with the same -1.0 guard for
# non-3D input.
# ---------------------------------------------------------------------------

def _segs3(base, ndim, payload) -> np.ndarray:
    """Flatten a parsed 3-D geometry into (n, 6) [x0 y0 z0 x1 y1 z1] segs;
    points become zero-length segments."""
    from lib_gdal_spark.functions import geometry as G

    segs = []

    def add_line(arr):
        arr = np.asarray(arr, np.float64)
        if len(arr) == 1:
            segs.append(np.hstack([arr, arr]))
        else:
            segs.append(np.hstack([arr[:-1], arr[1:]]))

    if base == G.WKB_POINT:
        p = np.asarray(payload, np.float64)[None, :]
        segs.append(np.hstack([p, p]))
    elif base == G.WKB_MULTIPOINT:
        p = np.asarray(payload, np.float64)
        segs.append(np.hstack([p, p]))
    elif base == G.WKB_LINESTRING:
        add_line(payload)
    elif base in (G.WKB_MULTILINESTRING, G.WKB_POLYGON):
        for part in payload:
            add_line(part)
    elif base == G.WKB_MULTIPOLYGON:
        for poly in payload:
            for ring in poly:
                add_line(ring)
    elif base == G.WKB_GEOMETRYCOLLECTION:
        for mb, mnd, mp in payload:
            segs.append(_segs3(mb, mnd, mp))
    else:
        raise ValueError(f"distance3d: unsupported type {base}")
    return np.vstack([s for s in segs if len(s)]) if segs else np.empty((0, 6))


def _seg_seg_dist3(sa: np.ndarray, sb: np.ndarray) -> float:
    """Exact min distance between two 3-D segment sets — box-constrained
    coordinate descent on the (strictly convex) pairwise quadratic, which
    converges to the global optimum for 2 variables."""
    a0, a1 = sa[:, :3], sa[:, 3:]
    b0, b1 = sb[:, :3], sb[:, 3:]
    u = a1 - a0
    v = b1 - b0
    w0 = a0[:, None, :] - b0[None, :, :]
    aa = (u * u).sum(-1)[:, None]
    bb = (u[:, None, :] * v[None, :, :]).sum(-1)
    cc = (v * v).sum(-1)[None, :]
    dd = (u[:, None, :] * w0).sum(-1)
    ee = (v[None, :, :] * w0).sum(-1)
    D = aa * cc - bb * bb
    s = np.clip(np.where(D > 1e-14, (bb * ee - cc * dd)
                         / np.where(D <= 1e-14, 1.0, D), 0.0), 0.0, 1.0)
    for _ in range(16):
        t = np.clip(np.where(cc > 1e-14, (bb * s + ee)
                             / np.where(cc <= 1e-14, 1.0, cc), 0.0), 0.0, 1.0)
        s = np.clip(np.where(aa > 1e-14, (bb * t - dd)
                             / np.where(aa <= 1e-14, 1.0, aa), 0.0), 0.0, 1.0)
    diff = (a0[:, None, :] + s[..., None] * u[:, None, :]) \
        - (b0[None, :, :] + t[..., None] * v[None, :, :])
    return float(np.sqrt((diff * diff).sum(-1)).min())


def distance3d(wkb_a: bytes, wkb_b: bytes) -> float:
    """OGR_G_Distance3D semantics: -1.0 unless BOTH geometries carry Z
    (ogrgeometry.cpp:3328-3335), else the 3-D min distance."""
    from lib_gdal_spark.functions import geometry as G

    ba, nda, pa = G.parse_wkb_full(wkb_a)
    bb_, ndb, pb = G.parse_wkb_full(wkb_b)
    if nda != 3 or ndb != 3:
        return -1.0
    sa = _segs3(ba, nda, pa)
    sb = _segs3(bb_, ndb, pb)
    if len(sa) == 0 or len(sb) == 0:
        return -1.0
    return _seg_seg_dist3(sa, sb)
