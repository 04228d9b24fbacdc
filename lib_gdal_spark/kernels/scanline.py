"""Even-odd scanline polygon fill — the rasterize core.

Behavioral spec from ``core/alg/llrasterize.cpp:92-246``
(``GDALdllImageFilledPolygon``, reimplemented): for each raster row ``y`` the
scan height is the **pixel center** ``dy = y + 0.5``; every non-horizontal
edge with ``dy1 <= dy < dy2`` (after orienting the edge upward) contributes a
crossing at ``x = floor(intersect + 0.5)``; crossings are sorted and
consecutive pairs fill **half-open spans** ``[x_i, x_{i+1})``. Bottom
horizontal segments (x decreasing) are filled separately as
``[floor(x2+0.5), floor(x1+0.5))``; top horizontal segments are skipped.
Row range is ``int(min_y) .. int(max_y)`` clipped to the raster.

This same even-odd pixel-center rule defines the engine's rasterize operator
AND the tile-assignment parity for polygon covers (SURVEY.md §7 step 3).
"""

from __future__ import annotations

import numpy as np


def fill_polygon_mask(
    width: int, height: int, rings: list[np.ndarray]
) -> np.ndarray:
    """Boolean mask of pixels whose centers are inside the polygon.

    ``rings``: list of (n,2) float arrays in *pixel* coordinates (closed or
    open; a closing duplicate vertex is dropped, matching the reference's
    "count a vertex only once" handling).
    """
    mask = np.zeros((height, width), dtype=bool)
    for y, x0, x1 in iter_spans(width, height, rings):
        mask[y, x0 : x1 + 1] = True
    return mask


def iter_spans(width: int, height: int, rings: list[np.ndarray]):
    """Yield (row, x_start, x_end_inclusive) spans of the even-odd fill."""
    parts = []
    for ring in rings:
        r = np.asarray(ring, dtype=np.float64)
        if len(r) > 1 and np.array_equal(r[0], r[-1]):
            r = r[:-1]
        if len(r) >= 3:
            parts.append(r)
    if not parts:
        return
    ally = np.concatenate([p[:, 1] for p in parts])
    miny = max(int(ally.min()), 0)
    maxy = min(int(ally.max()), height - 1)
    maxx = width - 1

    for y in range(miny, maxy + 1):
        dy = y + 0.5
        xs: list[int] = []
        for r in parts:
            n = len(r)
            for i in range(n):
                x1p, y1p = r[i - 1]  # edge (i-1 -> i), wrapping like the ref
                x2p, y2p = r[i]
                if (y1p < dy and y2p < dy) or (y1p > dy and y2p > dy):
                    continue
                if y1p == y2p:
                    # bottom horizontal segment (x decreasing): fill now
                    if x1p > x2p:
                        hx1 = int(np.floor(x2p + 0.5))
                        hx2 = int(np.floor(x1p + 0.5))
                        if hx1 > maxx or hx2 <= 0:
                            continue
                        yield y, max(hx1, 0), min(hx2 - 1, maxx)
                    continue
                if y1p < y2p:
                    dy1, dy2, dx1, dx2 = y1p, y2p, x1p, x2p
                else:
                    dy1, dy2, dx1, dx2 = y2p, y1p, x2p, x1p
                if dy1 <= dy < dy2:
                    intersect = (dy - dy1) * (dx2 - dx1) / (dy2 - dy1) + dx1
                    xs.append(int(np.floor(intersect + 0.5)))
        xs.sort()
        for i in range(0, len(xs) - 1, 2):
            x0, x1 = xs[i], xs[i + 1]
            if x0 <= maxx and x1 > 0:
                yield y, max(x0, 0), min(x1 - 1, maxx)


def burn_values(
    grid: np.ndarray,
    rings: list[np.ndarray],
    burn: float,
    merge_alg: str = "replace",
    all_touched: bool = False,
) -> np.ndarray:
    """Rasterize one polygon into ``grid`` (in place) —
    ``MERGE_ALG=REPLACE/ADD`` per ``core/alg/gdalrasterize.cpp:540-580``;
    ``all_touched`` adds the boundary-traversal pass."""
    h, w = grid.shape
    if all_touched:
        mask = fill_polygon_mask_all_touched(w, h, rings)
    else:
        mask = fill_polygon_mask(w, h, rings)
    if merge_alg == "add":
        grid[mask] += burn
    else:
        grid[mask] = burn
    return grid


def line_cells(
    x0: float, y0: float, x1: float, y1: float, all_touched: bool = False
) -> np.ndarray:
    """(k, 2) int cells burned by one segment in pixel coordinates.

    Default: the reference's Bresenham walk on floored endpoints
    (``core/alg/llrasterize.cpp:277`` GDALdllImageLine). ``all_touched``:
    Amanatides–Woo grid traversal visiting EVERY cell the segment passes
    through (``llrasterize.cpp:411`` GDALdllImageLineAllTouched).
    """
    if not all_touched:
        ix0, iy0 = int(np.floor(x0)), int(np.floor(y0))
        ix1, iy1 = int(np.floor(x1)), int(np.floor(y1))
        dx, dy = abs(ix1 - ix0), -abs(iy1 - iy0)
        sx = 1 if ix0 < ix1 else -1
        sy = 1 if iy0 < iy1 else -1
        err = dx + dy
        out = []
        x, y = ix0, iy0
        while True:
            out.append((x, y))
            if x == ix1 and y == iy1:
                break
            e2 = 2 * err
            if e2 >= dy:
                err += dy
                x += sx
            if e2 <= dx:
                err += dx
                y += sy
        return np.asarray(out, dtype=np.int64).reshape(-1, 2)

    # all-touched DDA
    cells = []
    cx, cy = int(np.floor(x0)), int(np.floor(y0))
    ex, ey = int(np.floor(x1)), int(np.floor(y1))
    dx, dy = x1 - x0, y1 - y0
    sx = 1 if dx > 0 else -1
    sy = 1 if dy > 0 else -1
    tmax_x = ((cx + (sx > 0)) - x0) / dx if dx != 0 else np.inf
    tmax_y = ((cy + (sy > 0)) - y0) / dy if dy != 0 else np.inf
    tdx = abs(1.0 / dx) if dx != 0 else np.inf
    tdy = abs(1.0 / dy) if dy != 0 else np.inf
    cells.append((cx, cy))
    guard = 0
    while (cx, cy) != (ex, ey) and guard < 10_000_000:
        guard += 1
        if tmax_x < tmax_y:
            cx += sx
            tmax_x += tdx
        else:
            cy += sy
            tmax_y += tdy
        cells.append((cx, cy))
    return np.asarray(cells, dtype=np.int64).reshape(-1, 2)


def fill_polygon_mask_all_touched(
    width: int, height: int, rings: list[np.ndarray]
) -> np.ndarray:
    """ALL_TOUCHED polygon mask: even-odd interior fill PLUS every cell the
    boundary passes through (``gdalrasterize.cpp`` outline pass with
    GDALdllImageLineAllTouched)."""
    mask = fill_polygon_mask(width, height, rings)
    for ring in rings:
        r = np.asarray(ring, dtype=np.float64)
        if len(r) > 1 and not np.array_equal(r[0], r[-1]):
            r = np.vstack([r, r[0]])
        for i in range(len(r) - 1):
            cells = line_cells(r[i, 0], r[i, 1], r[i + 1, 0], r[i + 1, 1],
                               all_touched=True)
            ok = ((cells[:, 0] >= 0) & (cells[:, 0] < width)
                  & (cells[:, 1] >= 0) & (cells[:, 1] < height))
            c = cells[ok]
            mask[c[:, 1], c[:, 0]] = True
    return mask
