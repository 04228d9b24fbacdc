"""General polygon boolean operations (intersection/union/difference/xor)
for arbitrary simple polygons with holes — the geometry kernel behind the
OGR layer-algebra overlays (``drivers/ogrlayer.cpp:2408,2838,3183,3528,
4079`` call into GEOS; this is a from-scratch NumPy re-expression).

Algorithm: **slab (trapezoidal) decomposition** with even-odd semantics:

1. collect the non-horizontal edges of both operands (rings = "ring soup",
   inside = odd crossing parity — holes need no special casing);
2. break the y-axis at every vertex y and every pairwise edge-crossing y:
   within a slab no two active edges cross, so sorting by x at the slab
   midline gives the exact left-to-right region order;
3. walk each slab left to right toggling (inA, inB) parity per edge; the
   op predicate selects regions, maximal included runs become trapezoids;
4. trapezoid boundary segments are emitted CCW (interior left); shared
   pieces cancel exactly — horizontal pieces by a per-y signed interval
   sweep, slanted pieces by canonical endpoint matching (pieces of the
   same input edge are computed by one interpolation formula, so
   cancellation is bitwise);
5. the surviving segments stitch into closed rings (leftmost-turn walk);
   positive shoelace area = outer ring, negative = hole, holes nest into
   the outer that contains them.

Degenerate inputs (shared edges, vertices on edges, grid-aligned boxes)
are exactly the cases this decomposition handles robustly — they only
create zero-width regions, which are skipped.
"""

from __future__ import annotations

import numpy as np

Ring = np.ndarray  # (n, 2) float64, closed or open (auto-closed)
Poly = list[Ring]  # first ring outer, rest holes (even-odd: order-free)

_OPS = {
    "intersection": lambda a, b: a & b,
    "union": lambda a, b: a | b,
    "difference": lambda a, b: a & ~b,
    "xor": lambda a, b: a ^ b,
}


def _edges(rings: list[Ring]) -> np.ndarray:
    """Rings -> (m, 4) non-horizontal edges normalized to y0 < y1."""
    out = []
    for r in rings:
        pts = np.asarray(r, dtype=np.float64)
        if len(pts) < 3:
            continue
        if not np.array_equal(pts[0], pts[-1]):
            pts = np.vstack([pts, pts[0]])
        x0, y0 = pts[:-1, 0], pts[:-1, 1]
        x1, y1 = pts[1:, 0], pts[1:, 1]
        keep = y0 != y1
        x0, y0, x1, y1 = x0[keep], y0[keep], x1[keep], y1[keep]
        swap = y0 > y1
        x0s = np.where(swap, x1, x0)
        y0s = np.where(swap, y1, y0)
        x1s = np.where(swap, x0, x1)
        y1s = np.where(swap, y0, y1)
        out.append(np.column_stack([x0s, y0s, x1s, y1s]))
    if not out:
        return np.empty((0, 4))
    return np.vstack(out)


def _x_at(e: np.ndarray, y: float) -> np.ndarray:
    """x of each edge (m,4) at height y — ONE formula everywhere so shared
    pieces are bitwise identical."""
    return e[:, 0] + (y - e[:, 1]) * (e[:, 2] - e[:, 0]) / (e[:, 3] - e[:, 1])


def _crossing_ys(e: np.ndarray) -> np.ndarray:
    """y-coordinates of pairwise interior crossings of the edge set."""
    m = len(e)
    if m < 2:
        return np.empty(0)
    p = e[:, :2]
    d = e[:, 2:] - e[:, :2]
    i, j = np.triu_indices(m, 1)
    pi, di = p[i], d[i]
    pj, dj = p[j], d[j]
    denom = di[:, 0] * dj[:, 1] - di[:, 1] * dj[:, 0]
    ok = denom != 0.0
    w = pj - pi
    t = np.where(ok, (w[:, 0] * dj[:, 1] - w[:, 1] * dj[:, 0])
                 / np.where(ok, denom, 1.0), -1.0)
    u = np.where(ok, (w[:, 0] * di[:, 1] - w[:, 1] * di[:, 0])
                 / np.where(ok, denom, 1.0), -1.0)
    hit = ok & (t > 0.0) & (t < 1.0) & (u > 0.0) & (u < 1.0)
    return (pi[hit][:, 1] + t[hit] * di[hit][:, 1])


def _stitch(segs: list[tuple]) -> list[np.ndarray]:
    """Directed float segments -> closed rings (leftmost-turn walk)."""
    starts: dict[tuple, list[int]] = {}
    for k, (sx, sy, ex, ey) in enumerate(segs):
        starts.setdefault((sx, sy), []).append(k)
    used = [False] * len(segs)
    rings = []
    for s0 in range(len(segs)):
        if used[s0]:
            continue
        used[s0] = True
        sx, sy, ex, ey = segs[s0]
        ring = [(sx, sy), (ex, ey)]
        dx, dy = ex - sx, ey - sy
        while ring[-1] != ring[0]:
            cx, cy = ring[-1]
            cand = [k for k in starts.get((cx, cy), []) if not used[k]]
            if not cand:
                break
            if len(cand) == 1:
                k = cand[0]
            else:
                def rank(k):
                    ox, oy = segs[k][2] - cx, segs[k][3] - cy
                    ln = np.hypot(ox, oy) or 1.0
                    iln = np.hypot(dx, dy) or 1.0
                    cross = (dx * oy - dy * ox) / (ln * iln)
                    dot = (dx * ox + dy * oy) / (ln * iln)
                    return (-cross, -dot)
                k = min(cand, key=rank)
            used[k] = True
            nx, ny = segs[k][2], segs[k][3]
            ring.append((nx, ny))
            dx, dy = nx - cx, ny - cy
        if len(ring) >= 4 and ring[-1] == ring[0]:
            arr = np.asarray(ring, dtype=np.float64)
            # drop exactly-collinear chain vertices
            keep = np.ones(len(arr), dtype=bool)
            v1 = arr[1:-1] - arr[:-2]
            v2 = arr[2:] - arr[1:-1]
            collin = (v1[:, 0] * v2[:, 1] - v1[:, 1] * v2[:, 0]) == 0.0
            forward = (v1[:, 0] * v2[:, 0] + v1[:, 1] * v2[:, 1]) > 0.0
            keep[1:-1] = ~(collin & forward)
            arr = arr[keep]
            if len(arr) >= 4:
                rings.append(arr)
    return rings


def ring_area(ring: np.ndarray) -> float:
    x, y = ring[:, 0], ring[:, 1]
    return 0.5 * float(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]))


def _point_in_rings_eo(px: float, py: float, rings: list[np.ndarray]) -> bool:
    """Even-odd ray cast (half-open rule, robust off-vertex probes)."""
    inside = False
    for r in rings:
        x, y = r[:-1, 0], r[:-1, 1]
        x2, y2 = r[1:, 0], r[1:, 1]
        cond = (y <= py) != (y2 <= py)
        with np.errstate(divide="ignore", invalid="ignore"):
            xi = x + (py - y) * (x2 - x) / np.where(y2 == y, 1.0, y2 - y)
        inside ^= bool(np.sum(cond & (px < xi)) % 2)
    return inside


def boolean_op(
    subject: list[Ring],
    clip: list[Ring],
    op: str,
) -> list[Poly]:
    """Even-odd boolean of two ring soups -> list of polygons-with-holes."""
    pred = _OPS[op]
    ea = _edges(subject)
    eb = _edges(clip)
    if len(ea) == 0 and len(eb) == 0:
        return []
    alledges = np.vstack([e for e in (ea, eb) if len(e)])
    ys = [alledges[:, 1], alledges[:, 3], _crossing_ys(alledges)]
    ybreaks = np.unique(np.concatenate(ys))

    na = len(ea)
    horiz: dict[float, list[tuple[float, float, int]]] = {}
    slant: dict[tuple, int] = {}

    def add_h(y: float, xs: float, xe: float) -> None:
        if xs != xe:
            horiz.setdefault(y, []).append((xs, xe, 1 if xe > xs else -1))

    def add_s(p0: tuple, p1: tuple) -> None:
        key = (min(p0, p1), max(p0, p1))
        sgn = 1 if p0 == key[0] else -1
        slant[key] = slant.get(key, 0) + sgn

    for ya, yb in zip(ybreaks[:-1], ybreaks[1:]):
        ym = 0.5 * (ya + yb)
        act = alledges[(alledges[:, 1] <= ya) & (alledges[:, 3] >= yb)]
        act_is_a = ((alledges[:, 1] <= ya) & (alledges[:, 3] >= yb)).nonzero()[0] < na
        if len(act) == 0:
            continue
        xm = _x_at(act, ym)
        xlo = _x_at(act, ya)
        xhi = _x_at(act, yb)
        order = np.argsort(xm, kind="stable")
        in_a = in_b = False
        run_left = None  # (xlo, xhi) of the run's left boundary edge
        prev_state = False
        for idx in order:
            if act_is_a[idx]:
                in_a = not in_a
            else:
                in_b = not in_b
            state = bool(pred(in_a, in_b))
            if state and not prev_state:
                run_left = (xlo[idx], xhi[idx])
            elif prev_state and not state:
                lx0, lx1 = run_left
                rx0, rx1 = xlo[idx], xhi[idx]
                if rx0 > lx0 or rx1 > lx1:  # skip zero-width slivers
                    add_h(ya, lx0, rx0)                   # bottom, rightward
                    add_s((rx0, ya), (rx1, yb))           # right, upward
                    add_h(yb, rx1, lx1)                   # top, leftward
                    add_s((lx1, yb), (lx0, ya))           # left, downward
                run_left = None
            prev_state = state

    segs: list[tuple] = []
    for (p0, p1), net in slant.items():
        if net > 0:
            segs.extend([(p0[0], p0[1], p1[0], p1[1])] * net)
        elif net < 0:
            segs.extend([(p1[0], p1[1], p0[0], p0[1])] * (-net))
    for y, iv in horiz.items():
        xs = np.unique(np.concatenate([[a, b] for a, b, _ in iv]).ravel())
        for x0, x1 in zip(xs[:-1], xs[1:]):
            net = sum(
                s for a, b, s in iv
                if min(a, b) <= x0 and max(a, b) >= x1
            )
            if net > 0:
                segs.extend([(x0, y, x1, y)] * net)
            elif net < 0:
                segs.extend([(x1, y, x0, y)] * (-net))

    rings = _stitch(segs)
    pos = [(ring_area(r), r) for r in rings if ring_area(r) > 0]
    neg = [(ring_area(r), r) for r in rings if ring_area(r) < 0]
    polys: list[Poly] = [[r] for _, r in pos]
    for a, hole in neg:
        # probe just inside the hole boundary (interior-left of first edge)
        v0, v1 = hole[0], hole[1]
        d = v1 - v0
        nr = float(np.hypot(d[0], d[1])) or 1.0
        eps = 1e-9 * max(1.0, abs(v0[0]), abs(v0[1]))
        probe = (v0 + v1) / 2.0 + np.array([-d[1], d[0]]) / nr * eps
        placed = False
        for i, (_, outer) in enumerate(pos):
            if _point_in_rings_eo(probe[0], probe[1], [outer]):
                polys[i].append(hole)
                placed = True
                break
        if not placed and polys:
            polys[0].append(hole)
    return polys


def polys_area(polys: list[Poly]) -> float:
    """Total area: outer rings positive, holes negative."""
    return float(sum(ring_area(r) for p in polys for r in p))
