"""Geometry model: WKB codec, envelopes, even-odd point-in-polygon, area.

Re-expresses the OGR geometry behaviors the engine needs
(``core/ogr/ogrgeometry.cpp`` — WKB import/export at :1368/:1598, Intersects
envelope shortcut at :486; ``core/ogr/ogrfeature.cpp:1883`` OGR_GEOM_AREA)
without GEOS: polygons are numpy ring arrays, predicates are vectorized
even-odd ray casts, area is the shoelace formula. Shapely-free by design —
these run inside Arrow-batched pandas UDFs on executors.

WKB here is the standard OGC little-endian subset: Point(1), LineString(2),
Polygon(3), MultiPolygon(6) in 2D. That covers the engine's polygon layers;
other OGR types can be added as needed.
"""

from __future__ import annotations

import struct

import numpy as np

WKB_POINT = 1
WKB_LINESTRING = 2
WKB_POLYGON = 3
WKB_MULTIPOLYGON = 6

Ring = np.ndarray  # (n, 2) float64, closed (first == last point)
Polygon = list[Ring]  # ring 0 = exterior, rest = holes
MultiPolygon = list[Polygon]


def wkb_point(lon: float, lat: float) -> bytes:
    return struct.pack("<BIdd", 1, WKB_POINT, lon, lat)


def wkb_linestring(pts: np.ndarray) -> bytes:
    pts = np.asarray(pts, dtype="<f8")
    return struct.pack("<BII", 1, WKB_LINESTRING, len(pts)) + pts.tobytes()


def wkb_polygon(rings: Polygon) -> bytes:
    out = [struct.pack("<BII", 1, WKB_POLYGON, len(rings))]
    for ring in rings:
        ring = np.asarray(ring, dtype="<f8")
        out.append(struct.pack("<I", len(ring)))
        out.append(ring.tobytes())
    return b"".join(out)


def wkb_multipolygon(polys: MultiPolygon) -> bytes:
    out = [struct.pack("<BII", 1, WKB_MULTIPOLYGON, len(polys))]
    for p in polys:
        out.append(wkb_polygon(p))
    return b"".join(out)


def _parse_polygon_body(buf: memoryview, off: int) -> tuple[Polygon, int]:
    (nrings,) = struct.unpack_from("<I", buf, off)
    off += 4
    rings: Polygon = []
    for _ in range(nrings):
        (npts,) = struct.unpack_from("<I", buf, off)
        off += 4
        ring = np.frombuffer(buf, dtype="<f8", count=npts * 2, offset=off).reshape(
            npts, 2
        )
        off += npts * 16
        rings.append(np.ascontiguousarray(ring, dtype=np.float64))
    return rings, off


def parse_wkb(wkb: bytes) -> tuple[int, object]:
    """Parse WKB -> (geom_type, payload).

    Payload: Point -> (x, y); LineString -> (n,2) array;
    Polygon -> list[Ring]; MultiPolygon -> list[list[Ring]].
    Big-endian WKB is normalized by byte-swapping coordinates.
    """
    buf = memoryview(wkb)
    byte_order = buf[0]
    endian = "<" if byte_order == 1 else ">"
    (gtype,) = struct.unpack_from(endian + "I", buf, 1)
    gtype &= 0xFF  # strip SRID / Z flags if present
    if endian == ">":  # normalize once; rare path
        wkb = _swap_wkb_to_le(bytes(wkb))
        return parse_wkb(wkb)
    off = 5
    if gtype == WKB_POINT:
        x, y = struct.unpack_from("<dd", buf, off)
        return gtype, (x, y)
    if gtype == WKB_LINESTRING:
        (npts,) = struct.unpack_from("<I", buf, off)
        arr = np.frombuffer(buf, dtype="<f8", count=npts * 2, offset=off + 4)
        return gtype, np.ascontiguousarray(arr.reshape(npts, 2), dtype=np.float64)
    if gtype == WKB_POLYGON:
        rings, _ = _parse_polygon_body(buf, off)
        return gtype, rings
    if gtype == WKB_MULTIPOLYGON:
        (npoly,) = struct.unpack_from("<I", buf, off)
        off += 4
        polys: MultiPolygon = []
        for _ in range(npoly):
            # skip inner byte-order + type header
            rings, off = _parse_polygon_body(buf, off + 5)
            polys.append(rings)
        return gtype, polys
    raise ValueError(f"unsupported WKB geometry type {gtype}")


def _swap_wkb_to_le(wkb: bytes) -> bytes:  # pragma: no cover - rare path
    raise ValueError("big-endian WKB not supported; write little-endian")


def polygon_rings(wkb: bytes) -> list[Ring]:
    """All rings of a Polygon/MultiPolygon as a flat list (even-odd safe)."""
    gtype, payload = parse_wkb(wkb)
    if gtype == WKB_POLYGON:
        return list(payload)
    if gtype == WKB_MULTIPOLYGON:
        return [r for poly in payload for r in poly]
    raise ValueError("expected Polygon or MultiPolygon WKB")


def envelope(wkb: bytes) -> tuple[float, float, float, float]:
    """(minx, miny, maxx, maxy) — the OGR envelope pre-test box
    (``drivers/ogrlayer.cpp:1377-1384``)."""
    gtype, payload = parse_wkb(wkb)
    if gtype == WKB_POINT:
        x, y = payload
        return x, y, x, y
    if gtype == WKB_LINESTRING:
        arr = payload
    elif gtype == WKB_POLYGON:
        arr = np.vstack(payload)
    else:
        arr = np.vstack([r for poly in payload for r in poly])
    mins = arr.min(axis=0)
    maxs = arr.max(axis=0)
    return float(mins[0]), float(mins[1]), float(maxs[0]), float(maxs[1])


def points_in_rings(px: np.ndarray, py: np.ndarray, rings: list[Ring]) -> np.ndarray:
    """Vectorized even-odd ray cast of many points against one polygon.

    Crossing rule: edge (i->j) crosses the horizontal ray from (px,py) iff
    ``(yi > py) != (yj > py)`` and the x-intersection is strictly right of
    px. Half-open on vertices (a vertex counts for exactly one of its two
    edges), consistent with the even-odd interior definition of the
    reference's scanline fill (``core/alg/llrasterize.cpp:92-246``) and with
    GEOS ``Intersects`` for interior points; boundary points are not
    guaranteed either way (callers keep test data off edges).

    Loops over edges (small), vectorizes over points (large).
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    inside = np.zeros(px.shape, dtype=bool)
    for ring in rings:
        xs = ring[:, 0]
        ys = ring[:, 1]
        n = len(ring) - 1 if np.array_equal(ring[0], ring[-1]) else len(ring)
        for i in range(n):
            j = (i + 1) % len(ring) if n == len(ring) else i + 1
            yi, yj = ys[i], ys[j]
            if yi == yj:
                continue  # horizontal edges never cross the ray
            xi, xj = xs[i], xs[j]
            crosses = (yi > py) != (yj > py)
            if not crosses.any():
                continue
            t = (py - yi) / (yj - yi)
            xint = xi + t * (xj - xi)
            inside ^= crosses & (px < xint)
    return inside


def shoelace_area(rings: list[Ring]) -> float:
    """Planar area, holes subtracted — OGR ``get_Area`` semantics
    (``core/ogr/ogrfeature.cpp:1883-1885``)."""
    total = 0.0
    for k, ring in enumerate(rings):
        x = ring[:, 0]
        y = ring[:, 1]
        a = 0.5 * abs(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]))
        total += a if k == 0 else -a
    return total


def clip_ring_convex(subject: Ring, clip_ring: Ring) -> Ring | None:
    """Sutherland–Hodgman: clip one ring by a CCW convex ring.

    Returns the clipped closed ring, or None if empty. Semantics of the
    layer-algebra Intersection (``drivers/ogrlayer.cpp:2062``) for the
    convex-method-polygon subset; the general GEOS overlay is out of scope
    for round 1 (documented in operators.layer_algebra).
    """
    subj = np.asarray(subject, dtype=np.float64)
    if len(subj) > 1 and np.array_equal(subj[0], subj[-1]):
        subj = subj[:-1]
    clip = np.asarray(clip_ring, dtype=np.float64)
    if len(clip) > 1 and np.array_equal(clip[0], clip[-1]):
        clip = clip[:-1]
    out = subj
    for i in range(len(clip)):
        if len(out) == 0:
            return None
        cx1, cy1 = clip[i]
        cx2, cy2 = clip[(i + 1) % len(clip)]
        ex, ey = cx2 - cx1, cy2 - cy1
        # inside = left of the directed clip edge (CCW polygon)
        d = ex * (out[:, 1] - cy1) - ey * (out[:, 0] - cx1)
        nxt = np.roll(out, -1, axis=0)
        dn = np.roll(d, -1)
        new_pts: list[tuple[float, float]] = []
        for j in range(len(out)):
            cur_in = d[j] >= 0.0
            nxt_in = dn[j] >= 0.0
            if cur_in:
                new_pts.append((out[j, 0], out[j, 1]))
            if cur_in != nxt_in:
                t = d[j] / (d[j] - dn[j])
                new_pts.append((
                    out[j, 0] + t * (nxt[j, 0] - out[j, 0]),
                    out[j, 1] + t * (nxt[j, 1] - out[j, 1]),
                ))
        out = np.asarray(new_pts, dtype=np.float64).reshape(-1, 2)
    if len(out) < 3:
        return None
    return np.vstack([out, out[:1]])


def clip_ring_halfplanes(
    subject: Ring, planes: list[tuple[float, float, float, float]]
) -> Ring | None:
    """Sutherland–Hodgman against an explicit half-plane sequence.

    Each plane is a directed edge (x1, y1, x2, y2); "inside" = left of it.
    The intersection of the half-planes must be convex (it always is).
    """
    subj = np.asarray(subject, dtype=np.float64)
    if len(subj) > 1 and np.array_equal(subj[0], subj[-1]):
        subj = subj[:-1]
    out = subj
    for (cx1, cy1, cx2, cy2) in planes:
        if len(out) == 0:
            return None
        ex, ey = cx2 - cx1, cy2 - cy1
        d = ex * (out[:, 1] - cy1) - ey * (out[:, 0] - cx1)
        nxt = np.roll(out, -1, axis=0)
        dn = np.roll(d, -1)
        new_pts: list[tuple[float, float]] = []
        for j in range(len(out)):
            if d[j] >= 0.0:
                new_pts.append((out[j, 0], out[j, 1]))
            if (d[j] >= 0.0) != (dn[j] >= 0.0):
                t = d[j] / (d[j] - dn[j])
                new_pts.append((
                    out[j, 0] + t * (nxt[j, 0] - out[j, 0]),
                    out[j, 1] + t * (nxt[j, 1] - out[j, 1]),
                ))
        out = np.asarray(new_pts, dtype=np.float64).reshape(-1, 2)
    if len(out) < 3:
        return None
    return np.vstack([out, out[:1]])


def erase_ring_convex(subject: Ring, clip_ring: Ring) -> list[Ring]:
    """subject \\ convex clip as DISJOINT pieces.

    Classic convex-difference decomposition: with clip edges e_1..e_n,
    piece_i = subject ∩ outside(e_i) ∩ inside(e_1..e_{i-1}) — each piece is
    a half-plane-sequence clip, pieces are disjoint, and their union is
    exactly subject minus the clip polygon.
    """
    clip = np.asarray(clip_ring, dtype=np.float64)
    if len(clip) > 1 and np.array_equal(clip[0], clip[-1]):
        clip = clip[:-1]
    n = len(clip)
    pieces: list[Ring] = []
    for i in range(n):
        x1, y1 = clip[i]
        x2, y2 = clip[(i + 1) % n]
        planes = [(x2, y2, x1, y1)]  # reversed edge = outside half-plane
        for j in range(i):
            a1, b1 = clip[j]
            a2, b2 = clip[(j + 1) % n]
            planes.append((a1, b1, a2, b2))
        piece = clip_ring_halfplanes(subject, planes)
        if piece is not None and shoelace_area([piece]) > 0.0:
            pieces.append(piece)
    return pieces


def box_ring(minx: float, miny: float, maxx: float, maxy: float) -> Ring:
    """Closed CCW rectangle ring."""
    return np.array(
        [
            [minx, miny],
            [maxx, miny],
            [maxx, maxy],
            [minx, maxy],
            [minx, miny],
        ],
        dtype=np.float64,
    )
