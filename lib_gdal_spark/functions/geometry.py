"""Geometry model: WKB codec, envelopes, even-odd point-in-polygon, area.

Re-expresses the OGR geometry behaviors the engine needs
(``core/ogr/ogrgeometry.cpp`` — WKB import/export at :1368/:1598, Intersects
envelope shortcut at :486; ``core/ogr/ogrfeature.cpp:1883`` OGR_GEOM_AREA)
without GEOS: polygons are numpy ring arrays, predicates are vectorized
even-odd ray casts, area is the shoelace formula. Shapely-free by design —
these run inside Arrow-batched pandas UDFs on executors.

WKB here is the standard OGC little-endian set: Point(1), LineString(2),
Polygon(3), MultiPoint(4), MultiLineString(5), MultiPolygon(6),
GeometryCollection(7), plus the ISO dimension variants Z (base+1000),
M (base+2000), ZM (base+3000) — ``ogr_core.h:456-478`` — written as ISO
codes and read as either ISO or the OGR 2.5D flag 0x80000000
(``wkb25DBit``, ``core/ogr/ogr_core.h:317-410``; importFromWkb
``ogrgeometry.cpp:1368``). Measured ordinates round-trip byte-exactly;
planar operators project to 2-D (:func:`parse_wkb` drops Z and M alike).
"""

from __future__ import annotations

import struct

import numpy as np

WKB_POINT = 1
WKB_LINESTRING = 2
WKB_POLYGON = 3
WKB_MULTIPOINT = 4
WKB_MULTILINESTRING = 5
WKB_MULTIPOLYGON = 6
WKB_GEOMETRYCOLLECTION = 7
WKB_CIRCULARSTRING = 8   # curve family (ogr_core.h:330-340); linearize
WKB_COMPOUNDCURVE = 9    # via functions.curves.curve_to_line before
WKB_CURVEPOLYGON = 10    # feeding the planar operators
WKB_MULTICURVE = 11
WKB_MULTISURFACE = 12
WKB_POLYHEDRALSURFACE = 15
WKB_TIN = 16
WKB_TRIANGLE = 17
WKB_25D_BIT = 0x80000000  # OGR wkb25DBit (ogr_core.h:410)

Ring = np.ndarray  # (n, 2|3) float64, closed (first == last point)
Polygon = list[Ring]  # ring 0 = exterior, rest = holes
MultiPolygon = list[Polygon]


def _dims(arr: np.ndarray) -> int:
    return int(np.asarray(arr).shape[-1])


def _type_code(base: int, ndim: int, m: bool = False) -> int:
    """ISO type word: Z = base+1000, M = base+2000, ZM = base+3000
    (``ogr_core.h:456-478`` wkbPointM/wkbPointZM families). ``ndim`` is
    the coordinate count; ``m`` disambiguates XYZ from XYM at count 3."""
    if ndim == 4:
        return base + 3000
    if ndim == 3:
        return base + (2000 if m else 1000)
    return base


def wkb_point(lon: float, lat: float, z: float | None = None,
              m: float | None = None, measured: bool = False) -> bytes:
    """Point WKB. ``measured=True`` with three coordinates makes the
    third coordinate M (XYM); a non-None ``m`` with ``z`` makes XYZM."""
    vals = [lon, lat]
    if z is not None:
        vals.append(z)
    if m is not None:
        vals.append(m)
        measured = True
    code = _type_code(WKB_POINT, len(vals), measured)
    return struct.pack(f"<BI{len(vals)}d", 1, code, *vals)


def wkb_linestring(pts: np.ndarray, m: bool = False) -> bytes:
    pts = np.asarray(pts, dtype="<f8")
    code = _type_code(WKB_LINESTRING, _dims(pts), m)
    return struct.pack("<BII", 1, code, len(pts)) + pts.tobytes()


def wkb_polygon(rings: Polygon, m: bool = False) -> bytes:
    code = _type_code(WKB_POLYGON, _dims(rings[0]) if rings else 2, m)
    out = [struct.pack("<BII", 1, code, len(rings))]
    for ring in rings:
        ring = np.asarray(ring, dtype="<f8")
        out.append(struct.pack("<I", len(ring)))
        out.append(ring.tobytes())
    return b"".join(out)


def wkb_multipolygon(polys: MultiPolygon, m: bool = False) -> bytes:
    ndim = _dims(polys[0][0]) if polys else 2
    out = [struct.pack("<BII", 1, _type_code(WKB_MULTIPOLYGON, ndim, m),
                       len(polys))]
    for p in polys:
        out.append(wkb_polygon(p, m))
    return b"".join(out)


def wkb_multipoint(pts: np.ndarray, m: bool = False) -> bytes:
    pts = np.asarray(pts, dtype="<f8")
    ndim = _dims(pts)
    out = [struct.pack("<BII", 1, _type_code(WKB_MULTIPOINT, ndim, m),
                       len(pts))]
    for p in pts:
        out.append(wkb_point(*p, measured=m))
    return b"".join(out)


def wkb_multilinestring(lines: list[np.ndarray], m: bool = False) -> bytes:
    ndim = _dims(lines[0]) if lines else 2
    out = [struct.pack("<BII", 1, _type_code(WKB_MULTILINESTRING, ndim, m),
                       len(lines))]
    for ln in lines:
        out.append(wkb_linestring(ln, m))
    return b"".join(out)


def _container_code(base: int, members: list[bytes]) -> int:
    """Container type word. ISO tags containers with their members'
    dimensionality (``ogrgeometrycollection.cpp`` setMeasured/set3D on
    addGeometry); M/ZM members tag the container so the measure variant
    survives the round-trip. Z/2-D containers keep the legacy untagged
    word (member words already carry Z)."""
    flags = {wkb_dim_flag(mm) for mm in members}
    if "ZM" in flags:
        return base + 3000
    if "M" in flags:
        return base + 2000
    return base


def wkb_geometrycollection(members: list[bytes]) -> bytes:
    code = _container_code(WKB_GEOMETRYCOLLECTION, members)
    out = [struct.pack("<BII", 1, code, len(members))]
    out.extend(members)
    return b"".join(out)


def wkb_circularstring(pts: np.ndarray, m: bool = False) -> bytes:
    pts = np.asarray(pts, dtype="<f8")
    if len(pts) % 2 == 0 or len(pts) < 3:
        raise ValueError("CircularString needs an odd point count >= 3")
    code = _type_code(WKB_CIRCULARSTRING, _dims(pts), m)
    return struct.pack("<BII", 1, code, len(pts)) + pts.tobytes()


def _wkb_container(code: int, members: list[bytes]) -> bytes:
    if code < 1000:  # don't re-derive when the caller passes a tagged word
        code = _container_code(code, members)
    return struct.pack("<BII", 1, code, len(members)) + b"".join(members)


def wkb_compoundcurve(members: list[bytes]) -> bytes:
    """Members: LineString / CircularString WKBs, endpoint-continuous."""
    return _wkb_container(WKB_COMPOUNDCURVE, members)


def wkb_curvepolygon(rings: list[bytes]) -> bytes:
    """Rings: closed LineString / CircularString / CompoundCurve WKBs."""
    return _wkb_container(WKB_CURVEPOLYGON, rings)


def wkb_multicurve(members: list[bytes]) -> bytes:
    return _wkb_container(WKB_MULTICURVE, members)


def wkb_multisurface(members: list[bytes]) -> bytes:
    return _wkb_container(WKB_MULTISURFACE, members)


def wkb_triangle(ring: np.ndarray, m: bool = False) -> bytes:
    ring = np.asarray(ring, dtype="<f8")
    code = _type_code(WKB_TRIANGLE, _dims(ring), m)
    return (struct.pack("<BII", 1, code, 1)
            + struct.pack("<I", len(ring)) + ring.tobytes())


def wkb_tin(triangles: list[bytes]) -> bytes:
    return _wkb_container(WKB_TIN, triangles)


def wkb_polyhedralsurface(polygons: list[bytes]) -> bytes:
    return _wkb_container(WKB_POLYHEDRALSURFACE, polygons)


def surface_to_multipolygon(wkb: bytes) -> bytes:
    """TIN / PolyhedralSurface / Triangle -> MultiPolygon (the
    CastToMultiPolygon coercion OGR applies when a planar consumer needs
    them — ogr_geometry.h TIN/PolyhedralSurface docs)."""
    base, ndim, payload = parse_wkb_full(wkb)
    if base == WKB_TRIANGLE:
        return wkb_multipolygon([payload])
    if base in (WKB_TIN, WKB_POLYHEDRALSURFACE):
        return wkb_multipolygon([p for _, _, p in payload])
    return wkb


def _decode_type(raw: int) -> tuple[int, int]:
    """Raw WKB type word -> (base type, coordinate count). Accepts ISO Z
    (base+1000), M (base+2000), ZM (base+3000) — ``ogr_core.h:456-478``
    wkbPointM/wkbPointZM families — and the OGR 2.5D flag
    (``ogr_core.h:410``). At coordinate count 3 the XYZ/XYM distinction
    is carried by the type word only; use :func:`wkb_dim_flag` on the
    geometry bytes when the variant matters (ISO geometries are
    dimension-uniform, so the root word is authoritative)."""
    ndim = 2
    if raw & WKB_25D_BIT:
        ndim = 3
        raw &= ~WKB_25D_BIT
    raw &= 0x0FFFFFFF  # strip any SRID-ish flags
    if raw >= 3000:
        ndim = 4
        raw -= 3000
    elif raw >= 2000:
        ndim = 3  # XYM: third coordinate is the measure
        raw -= 2000
    elif raw >= 1000:
        ndim = 3
        raw -= 1000
    return raw, ndim


def wkb_dim_flag(wkb: bytes) -> str:
    """ISO dimension variant of a WKB geometry: '', 'Z', 'M', or 'ZM',
    from the root type word (members of a valid ISO geometry share the
    root's dimensionality)."""
    (raw,) = struct.unpack_from("<I", wkb, 1)
    if raw & WKB_25D_BIT:
        return "Z"
    raw &= 0x0FFFFFFF
    if raw >= 3000:
        return "ZM"
    if raw >= 2000:
        return "M"
    if raw >= 1000:
        return "Z"
    return ""


def _parse_polygon_body(buf: memoryview, off: int,
                        ndim: int = 2) -> tuple[Polygon, int]:
    (nrings,) = struct.unpack_from("<I", buf, off)
    off += 4
    rings: Polygon = []
    for _ in range(nrings):
        (npts,) = struct.unpack_from("<I", buf, off)
        off += 4
        ring = np.frombuffer(
            buf, dtype="<f8", count=npts * ndim, offset=off
        ).reshape(npts, ndim)
        off += npts * 8 * ndim
        rings.append(np.ascontiguousarray(ring, dtype=np.float64))
    return rings, off


def _parse_full(buf: memoryview, off: int) -> tuple[int, int, object, int]:
    """Parse one geometry at ``off`` -> (base, ndim, payload, new_off)."""
    endian = "<" if buf[off] == 1 else ">"
    if endian == ">":
        _swap_wkb_to_le(bytes(buf))
    (raw,) = struct.unpack_from("<I", buf, off + 1)
    base, ndim = _decode_type(raw)
    off += 5
    if base == WKB_POINT:
        vals = struct.unpack_from(f"<{ndim}d", buf, off)
        return base, ndim, tuple(vals), off + 8 * ndim
    if base == WKB_LINESTRING:
        (npts,) = struct.unpack_from("<I", buf, off)
        arr = np.frombuffer(buf, dtype="<f8", count=npts * ndim,
                            offset=off + 4)
        return base, ndim, np.ascontiguousarray(
            arr.reshape(npts, ndim), dtype=np.float64), off + 4 + npts * 8 * ndim
    if base in (WKB_POLYGON, WKB_TRIANGLE):
        # Triangle shares the Polygon body layout (ogr_core.h:340)
        rings, off = _parse_polygon_body(buf, off, ndim)
        return base, ndim, rings, off
    if base == WKB_MULTIPOINT:
        (n,) = struct.unpack_from("<I", buf, off)
        off += 4
        pts = []
        for _ in range(n):
            _, nd, p, off = _parse_full(buf, off)
            pts.append(p)
        return base, ndim, np.asarray(pts, dtype=np.float64), off
    if base == WKB_MULTILINESTRING:
        (n,) = struct.unpack_from("<I", buf, off)
        off += 4
        lines = []
        for _ in range(n):
            _, nd, ln, off = _parse_full(buf, off)
            lines.append(ln)
        return base, ndim, lines, off
    if base == WKB_MULTIPOLYGON:
        (n,) = struct.unpack_from("<I", buf, off)
        off += 4
        polys: MultiPolygon = []
        for _ in range(n):
            _, nd, rings, off = _parse_full(buf, off)
            polys.append(rings)
        return base, ndim, polys, off
    if base == WKB_CIRCULARSTRING:
        # same layout as LineString: odd point count, consecutive
        # (start, mid, end) arc triples (ogr_core.h:330)
        (npts,) = struct.unpack_from("<I", buf, off)
        arr = np.frombuffer(buf, dtype="<f8", count=npts * ndim,
                            offset=off + 4)
        return base, ndim, np.ascontiguousarray(
            arr.reshape(npts, ndim), dtype=np.float64), off + 4 + npts * 8 * ndim
    if base in (WKB_GEOMETRYCOLLECTION, WKB_COMPOUNDCURVE,
                WKB_CURVEPOLYGON, WKB_MULTICURVE, WKB_MULTISURFACE,
                WKB_POLYHEDRALSURFACE, WKB_TIN):
        # all four curve containers share the collection layout: a count
        # followed by full sub-geometries with their own headers
        (n,) = struct.unpack_from("<I", buf, off)
        off += 4
        members = []
        for _ in range(n):
            b, nd, p, off = _parse_full(buf, off)
            members.append((b, nd, p))
        return base, ndim, members, off
    raise ValueError(f"unsupported WKB geometry type {raw}")


def parse_wkb_full(wkb: bytes) -> tuple[int, int, object]:
    """Full-fidelity parse -> (base_type, ndim, payload). Payloads keep
    their Z column; GeometryCollection members are (base, ndim, payload)
    triples."""
    base, ndim, payload, _ = _parse_full(memoryview(wkb), 0)
    return base, ndim, payload


def _drop_z(base: int, payload):
    if base == WKB_POINT:
        return payload[:2]
    if base in (WKB_LINESTRING, WKB_MULTIPOINT):
        return np.ascontiguousarray(np.asarray(payload)[:, :2])
    if base in (WKB_POLYGON, WKB_MULTILINESTRING):
        return [np.ascontiguousarray(r[:, :2]) for r in payload]
    if base == WKB_MULTIPOLYGON:
        return [[np.ascontiguousarray(r[:, :2]) for r in poly]
                for poly in payload]
    return payload


def parse_wkb(wkb: bytes) -> tuple[int, object]:
    """Parse WKB -> (geom_type, payload), projected to 2-D (Z dropped) —
    the engine's planar operators are 2-D; use :func:`parse_wkb_full` when
    the Z column matters.

    Payload: Point -> (x, y); LineString -> (n,2) array;
    Polygon -> list[Ring]; MultiPoint -> (n,2) array; MultiLineString ->
    list[array]; MultiPolygon -> list[list[Ring]]; GeometryCollection ->
    list of (base, ndim, payload) members.
    """
    base, ndim, payload = parse_wkb_full(wkb)
    if ndim >= 3:
        payload = _drop_z(base, payload)
    return base, payload


def _swap_wkb_to_le(wkb: bytes) -> bytes:  # pragma: no cover - rare path
    raise ValueError("big-endian WKB not supported; write little-endian")


def _coord_arrays(base: int, payload):
    """All coordinate arrays of a parsed payload, flattened."""
    if base == WKB_POINT:
        yield np.asarray(payload, dtype=np.float64)[None, :]
    elif base in (WKB_LINESTRING, WKB_MULTIPOINT, WKB_CIRCULARSTRING):
        yield np.asarray(payload, dtype=np.float64)
    elif base in (WKB_POLYGON, WKB_MULTILINESTRING, WKB_TRIANGLE):
        yield from payload
    elif base == WKB_MULTIPOLYGON:
        for poly in payload:
            yield from poly
    else:  # collection-layout containers: (base, ndim, payload) members
        for b, _nd, p in payload:
            yield from _coord_arrays(b, p)


def measure_bounds(wkb: bytes) -> tuple[float, float] | None:
    """(min, max) of the M ordinate for measured (M/ZM) geometries, or
    None for unmeasured ones — the accessor linear-referencing operators
    (``ogrlineref``) use to range-query measures. M is always the last
    coordinate (``ogr_core.h:456-478`` layouts)."""
    if "M" not in wkb_dim_flag(wkb):
        return None
    base, _ndim, payload = parse_wkb_full(wkb)
    ms = [np.asarray(a, dtype=np.float64)[:, -1]
          for a in _coord_arrays(base, payload)]
    allm = np.concatenate(ms)
    return float(allm.min()), float(allm.max())


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
    if gtype in (WKB_LINESTRING, WKB_MULTIPOINT):
        arr = np.asarray(payload)
    elif gtype in (WKB_POLYGON, WKB_MULTILINESTRING):
        arr = np.vstack(payload)
    elif gtype == WKB_MULTIPOLYGON:
        arr = np.vstack([r for poly in payload for r in poly])
    else:  # GeometryCollection: union of member envelopes
        boxes = [
            envelope(_reencode_member(b, nd, p)) for b, nd, p in payload
        ]
        return (min(b[0] for b in boxes), min(b[1] for b in boxes),
                max(b[2] for b in boxes), max(b[3] for b in boxes))
    mins = arr.min(axis=0)
    maxs = arr.max(axis=0)
    return float(mins[0]), float(mins[1]), float(maxs[0]), float(maxs[1])


def _reencode_member(base: int, ndim: int, payload, m: bool = False) -> bytes:
    """Re-serialize one parsed geometry (collection member round-trips).
    ``m=True`` marks a 3-coordinate payload as XYM (4 is always XYZM)."""
    if base == WKB_POINT:
        return wkb_point(*payload, measured=m)
    if base == WKB_LINESTRING:
        return wkb_linestring(np.asarray(payload), m)
    if base == WKB_POLYGON:
        return wkb_polygon(payload, m)
    if base == WKB_MULTIPOINT:
        return wkb_multipoint(np.asarray(payload), m)
    if base == WKB_MULTILINESTRING:
        return wkb_multilinestring(payload, m)
    if base == WKB_MULTIPOLYGON:
        return wkb_multipolygon(payload, m)
    if base == WKB_CIRCULARSTRING:
        return wkb_circularstring(np.asarray(payload), m)
    if base == WKB_TRIANGLE:
        return wkb_triangle(payload[0], m)
    if base in (WKB_COMPOUNDCURVE, WKB_CURVEPOLYGON, WKB_MULTICURVE,
                WKB_MULTISURFACE, WKB_TIN, WKB_POLYHEDRALSURFACE):
        members = [_reencode_member(b, nd, p, m) for b, nd, p in payload]
        return _wkb_container(base, members)
    raise ValueError(f"cannot re-encode member type {base}")


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


# ---------------------------------------------------------------------------
# Geometry coercions used by the gensql result layer
# (``drivers/ogr_gensql.cpp:1396-1416`` -> OGRGeometryFactory::forceTo*).
# WKB in -> WKB out; inconvertible inputs pass through unchanged, like the
# factory functions.
# ---------------------------------------------------------------------------

def force_to_polygon(wkb: bytes) -> bytes:
    """forceToPolygon: MultiPolygon/collection polygons collapse into one
    Polygon carrying all rings; Polygon unchanged; others pass through."""
    base, ndim, payload = parse_wkb_full(wkb)
    if base == WKB_POLYGON:
        return wkb
    if base == WKB_MULTIPOLYGON:
        rings = [r for poly in payload for r in poly]
        return wkb_polygon(rings) if rings else wkb
    if base == WKB_GEOMETRYCOLLECTION:
        rings = []
        for mb, mnd, mp in payload:
            if mb == WKB_POLYGON:
                rings.extend(mp)
            elif mb == WKB_MULTIPOLYGON:
                rings.extend(r for poly in mp for r in poly)
        return wkb_polygon(rings) if rings else wkb
    return wkb


def force_to_multilinestring(wkb: bytes) -> bytes:
    """forceToMultiLineString: LineString wraps; Polygon/MultiPolygon rings
    become member lines; collections flatten; others pass through."""
    base, ndim, payload = parse_wkb_full(wkb)
    if base == WKB_MULTILINESTRING:
        return wkb
    if base == WKB_LINESTRING:
        return wkb_multilinestring([np.asarray(payload)])
    if base == WKB_POLYGON:
        return wkb_multilinestring([np.asarray(r) for r in payload])
    if base == WKB_MULTIPOLYGON:
        return wkb_multilinestring(
            [np.asarray(r) for poly in payload for r in poly])
    if base == WKB_GEOMETRYCOLLECTION:
        lines = []
        for mb, mnd, mp in payload:
            if mb == WKB_LINESTRING:
                lines.append(np.asarray(mp))
            elif mb == WKB_MULTILINESTRING:
                lines.extend(np.asarray(ln) for ln in mp)
            elif mb == WKB_POLYGON:
                lines.extend(np.asarray(r) for r in mp)
            elif mb == WKB_MULTIPOLYGON:
                lines.extend(np.asarray(r) for poly in mp for r in poly)
        return wkb_multilinestring(lines) if lines else wkb
    return wkb
