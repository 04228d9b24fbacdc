"""Delaunay triangulation (Bowyer–Watson) + barycentric interpolation.

Backs gdal_grid's 'linear' algorithm (reference ``core/alg/gdalgrid.cpp:
542`` GDALGridLinear over ``core/alg/delaunay.c``) without scipy: the
classic incremental Bowyer–Watson construction with a super-triangle,
circumcircle tests vectorized over the current triangle set (O(n) numpy
work per insertion). Point location for interpolation is vectorized over
(query points x candidate triangles) in bounded chunks.
"""

from __future__ import annotations

import numpy as np


def delaunay(points: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """points (n,2) -> (verts (n+3,2), triangles (m,3) int indices).

    Triangles referencing the 3 synthetic super-triangle vertices
    (indices n..n+2) are already removed; `verts[:n]` == input order.
    """
    pts = np.asarray(points, dtype=np.float64)
    n = len(pts)
    if n < 3:
        return pts, np.empty((0, 3), dtype=np.int64)
    mn = pts.min(axis=0)
    mx = pts.max(axis=0)
    c = (mn + mx) / 2.0
    span = float(max(mx[0] - mn[0], mx[1] - mn[1], 1e-9))
    # The super-triangle must dwarf the point cloud: too tight and hull
    # triangles' circumcircles (which can be huge) swallow a super vertex,
    # silently dropping hull triangles. 1000x span keeps double precision
    # adequate while making that geometrically impossible in practice.
    superv = np.array([
        [c[0] - 1000.0 * span, c[1] - 50.0 * span],
        [c[0] + 1000.0 * span, c[1] - 50.0 * span],
        [c[0], c[1] + 1000.0 * span],
    ])
    verts = np.vstack([pts, superv])
    # growing flat arrays + alive mask: the hot bad-triangle scan is one
    # vectorized circumcircle test per insertion (no Python list rebuilds)
    cap = 8 * n + 16
    tri_arr = np.zeros((cap, 3), dtype=np.int64)
    cc = np.zeros((cap, 3), dtype=np.float64)  # (cx, cy, r2)
    alive = np.zeros(cap, dtype=bool)
    tri_arr[0] = (n, n + 1, n + 2)
    cc[0] = _circum(verts, tri_arr[0])
    alive[0] = True
    m = 1  # high-water mark
    for i in range(n):
        px, py = verts[i]
        d2 = (px - cc[:m, 0]) ** 2 + (py - cc[:m, 1]) ** 2
        bad_idx = np.nonzero(alive[:m] & (d2 <= cc[:m, 2]))[0]
        if len(bad_idx) == 0:
            continue  # degenerate (duplicate point) — skip
        # boundary polygon of the bad-triangle cavity: edges used once
        edge_count: dict[tuple[int, int], int] = {}
        for bi in bad_idx:
            a, b, c2 = tri_arr[bi]
            for e in ((a, b), (b, c2), (c2, a)):
                k = (int(min(e)), int(max(e)))
                edge_count[k] = edge_count.get(k, 0) + 1
        alive[bad_idx] = False
        keep = [k for k, v in sorted(edge_count.items()) if v == 1]
        if m + len(keep) > cap:
            grow = max(cap, m + len(keep))
            tri_arr = np.vstack([tri_arr, np.zeros((grow, 3), np.int64)])
            cc = np.vstack([cc, np.zeros((grow, 3))])
            alive = np.concatenate([alive, np.zeros(grow, bool)])
            cap += grow
        for (a, b) in keep:
            tri_arr[m] = (a, b, i)
            cc[m] = _circum(verts, tri_arr[m])
            alive[m] = True
            m += 1
    live = tri_arr[:m][alive[:m]]
    out = live[(live < n).all(axis=1)]
    return verts[:n], np.ascontiguousarray(out)


def _circum(verts: np.ndarray, tri) -> tuple[float, float, float]:
    """Circumcenter (x, y) + squared radius of one triangle."""
    ax, ay = verts[tri[0]]
    bx, by = verts[tri[1]]
    cx, cy = verts[tri[2]]
    d = 2.0 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
    if d == 0.0:
        return (0.0, 0.0, -1.0)  # collinear: never matches
    ux = ((ax * ax + ay * ay) * (by - cy) + (bx * bx + by * by) * (cy - ay)
          + (cx * cx + cy * cy) * (ay - by)) / d
    uy = ((ax * ax + ay * ay) * (cx - bx) + (bx * bx + by * by) * (ax - cx)
          + (cx * cx + cy * cy) * (bx - ax)) / d
    r2 = (ax - ux) ** 2 + (ay - uy) ** 2
    return (float(ux), float(uy), float(r2))


def interpolate_linear(
    verts: np.ndarray,
    tris: np.ndarray,
    vals: np.ndarray,
    qx: np.ndarray,
    qy: np.ndarray,
    nodata: float = 0.0,
    chunk: int = 2048,
) -> np.ndarray:
    """Barycentric interpolation at query points; outside hull -> nodata."""
    out = np.full(len(qx), nodata, dtype=np.float64)
    if len(tris) == 0:
        return out
    a = verts[tris[:, 0]]
    b = verts[tris[:, 1]]
    c = verts[tris[:, 2]]
    det = ((b[:, 1] - c[:, 1]) * (a[:, 0] - c[:, 0])
           + (c[:, 0] - b[:, 0]) * (a[:, 1] - c[:, 1]))
    ok_t = det != 0.0
    for s in range(0, len(qx), chunk):
        px = qx[s:s + chunk][:, None]
        py = qy[s:s + chunk][:, None]
        l1 = ((b[None, :, 1] - c[None, :, 1]) * (px - c[None, :, 0])
              + (c[None, :, 0] - b[None, :, 0]) * (py - c[None, :, 1])) / det
        l2 = ((c[None, :, 1] - a[None, :, 1]) * (px - c[None, :, 0])
              + (a[None, :, 0] - c[None, :, 0]) * (py - c[None, :, 1])) / det
        l3 = 1.0 - l1 - l2
        eps = -1e-12
        inside = (l1 >= eps) & (l2 >= eps) & (l3 >= eps) & ok_t[None, :]
        hit = inside.any(axis=1)
        ti = np.argmax(inside, axis=1)
        v = (l1[np.arange(len(px)), ti] * vals[tris[ti, 0]]
             + l2[np.arange(len(px)), ti] * vals[tris[ti, 1]]
             + l3[np.arange(len(px)), ti] * vals[tris[ti, 2]])
        seg = out[s:s + chunk]
        seg[hit] = v[hit]
    return out
