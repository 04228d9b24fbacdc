"""Depression (sink) filling: the hydrology-conditioning step before
D8 flow direction / accumulation / basins (operators/dem.py).

Semantics: the Planchon & Darboux (2001) fixed point with eps=0 —
``W(c) = z(c)`` on the raster border and
``W(c) = max(z(c), min over 8-neighbors W(n))`` inside; the unique
least solution fills every closed depression exactly to its pour-point
elevation and leaves everything else untouched. W is built from min/max
lattice operations only (NO arithmetic), so every output value is one of
the input z values and the result is bit-exact in any engine and at any
parallelism — the oracle spells the same fixed point as an unrolled
Jacobi CTE chain.

Reference scope note: GDAL itself stops at gdal_fillnodata (interpolation
of masked holes — operators/fillnodata.py covers it); sink filling is the
GRASS ``r.fill.dir`` / Wang & Liu companion every DEM pipeline runs first.
Cited for parity bounds only: ``core/alg/gdal_alg.h`` has no fill-sink
entry point.

Distributed shape (the Barnes 2016 parallel priority-flood scheme):
each round, every tile emits its 1-px border of the CURRENT W to its 8
neighbors (keys-only strips, the dem_op halo pattern), then each tile
runs a LOCAL priority-flood to its own fixed point given those halo
values as boundary sources (heap-based Barnes/Wang-Liu sweep, O(n log n)
per tile instead of per-cell Jacobi rounds). Interior W only ever
decreases (it starts at +inf and every halo value is itself an
upper bound of the true fixed point), so the per-tile solves converge to
the global fixed point in O(tile-graph diameter along spill paths)
rounds — each round is ONE cogroup shuffle of border strips, never the
full raster. A 1000x1000-tile continental DEM is ~thousands of rounds in
the worst case but bounded by basin structure in practice (Barnes
reports <=  tens of rounds on real terrain); the per-round cost stays
O(border cells) in shuffle volume.
"""

from __future__ import annotations

import heapq
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_STATE_SCHEMA = (
    "tile_x int, tile_y int, tile_w int, tile_h int, "
    "z array<double>, w array<double>, changed int"
)

_STRIP_SCHEMA = (
    "dst_x int, dst_y int, src_dx int, src_dy int, "
    "strip_h int, strip_w int, pixels array<double>"
)


def _w_strips(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """State rows -> 8 neighbor border strips of the current W."""
    for b in batches:
        rows = []
        for _, r in b.iterrows():
            th, tw = int(r["tile_h"]), int(r["tile_w"])
            arr = np.asarray(r["w"], dtype=np.float64).reshape(th, tw)
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    if dx == 0 and dy == 0:
                        continue
                    ys = slice(th - 1, th) if dy == 1 else (
                        slice(0, 1) if dy == -1 else slice(0, th))
                    xs = slice(tw - 1, tw) if dx == 1 else (
                        slice(0, 1) if dx == -1 else slice(0, tw))
                    piece = arr[ys, xs]
                    rows.append({
                        "dst_x": int(r["tile_x"]) + dx,
                        "dst_y": int(r["tile_y"]) + dy,
                        "src_dx": dx, "src_dy": dy,
                        "strip_h": piece.shape[0],
                        "strip_w": piece.shape[1],
                        "pixels": piece.ravel().tolist(),
                    })
        yield pd.DataFrame(rows, columns=[
            "dst_x", "dst_y", "src_dx", "src_dy",
            "strip_h", "strip_w", "pixels"])


def _local_priority_flood(z: np.ndarray, pad_w: np.ndarray,
                          border: np.ndarray) -> np.ndarray:
    """Exact local fixed point given boundary sources.

    ``z``: (th, tw) elevations; ``pad_w``: (th+2, tw+2) halo W (NaN
    where no neighbor tile exists); ``border``: bool mask of cells on
    the GLOBAL raster border (W fixed = z there). Heap-based
    priority-flood: pop the lowest known W, relax the 8-neighborhood
    with max(z, W) — each cell finalizes on first pop (its minimax
    path cost to any source), the Wang & Liu (2006) argument.
    """
    th, tw = z.shape
    w = np.full((th, tw), np.inf)
    heap: list = []
    w[border] = z[border]
    for y, x in zip(*np.nonzero(border)):
        heapq.heappush(heap, (z[y, x], int(y), int(x)))
    # halo sources: ring cells of the padded frame relax the adjacent
    # interior cells directly (the source itself lives in another tile)
    hy, hx = np.nonzero(np.isfinite(pad_w))
    for y, x in zip(hy, hx):
        src = pad_w[y, x]
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                iy, ix = y - 1 + dy, x - 1 + dx
                if iy < 0 or iy >= th or ix < 0 or ix >= tw:
                    continue
                cand = max(z[iy, ix], src)
                if cand < w[iy, ix]:
                    w[iy, ix] = cand
                    heapq.heappush(heap, (cand, iy, ix))
    while heap:
        cur, y, x = heapq.heappop(heap)
        if cur > w[y, x]:
            continue  # stale lazy-deletion entry
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                ny, nx = y + dy, x + dx
                if (dy == 0 and dx == 0) or ny < 0 or ny >= th \
                        or nx < 0 or nx >= tw:
                    continue
                cand = max(z[ny, nx], cur)
                if cand < w[ny, nx]:
                    w[ny, nx] = cand
                    heapq.heappush(heap, (cand, ny, nx))
    return w


def fill_sinks(tiles: DataFrame, tile: int = 64,
               max_rounds: int = 64) -> DataFrame:
    """Tile table -> (px, py, fill) with every closed depression raised
    to its pour-point elevation (Planchon-Darboux eps=0 fixed point).

    ``max_rounds`` bounds the halo iterations (loudly — convergence on
    a connected raster is guaranteed within the tile-graph diameter
    along spill paths, so hitting the bound means a malformed input).
    """
    ext = tiles.agg(
        F.min(F.col("tile_x") * tile).alias("x0"),
        F.max(F.col("tile_x") * tile + F.col("tile_w") - 1).alias("x1"),
        F.min(F.col("tile_y") * tile).alias("y0"),
        F.max(F.col("tile_y") * tile + F.col("tile_h") - 1).alias("y1"),
    ).collect()[0]
    gpx0, gpx1, gpy0, gpy1 = ext["x0"], ext["x1"], ext["y0"], ext["y1"]

    state = tiles.select(
        "tile_x", "tile_y", "tile_w", "tile_h",
        F.col("pixels").alias("z"),
        F.transform(
            "pixels", lambda _: F.lit(float("inf"))
        ).alias("w"),
        F.lit(1).alias("changed"),
    ).localCheckpoint()

    def solve(key, left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty:
            return pd.DataFrame(
                columns=["tile_x", "tile_y", "tile_w", "tile_h",
                         "z", "w", "changed"])
        r = left.iloc[0]
        th, tw = int(r["tile_h"]), int(r["tile_w"])
        z = np.asarray(r["z"], dtype=np.float64).reshape(th, tw)
        w_old = np.asarray(r["w"], dtype=np.float64).reshape(th, tw)
        pad = np.full((th + 2, tw + 2), np.nan)
        for _, s in right.iterrows():
            sh, sw = int(s["strip_h"]), int(s["strip_w"])
            piece = np.asarray(s["pixels"], dtype=np.float64).reshape(sh, sw)
            dx, dy = int(s["src_dx"]), int(s["src_dy"])
            y0 = 0 if dy == 1 else (th + 1 if dy == -1 else 1)
            x0 = 0 if dx == 1 else (tw + 1 if dx == -1 else 1)
            pad[y0 : y0 + sh, x0 : x0 + sw] = piece
        gx0 = int(key[0]) * tile
        gy0 = int(key[1]) * tile
        jj, ii = np.meshgrid(np.arange(th), np.arange(tw), indexing="ij")
        border = ((ii + gx0 == gpx0) | (ii + gx0 == gpx1)
                  | (jj + gy0 == gpy0) | (jj + gy0 == gpy1))
        w_new = _local_priority_flood(z, pad, border)
        chg = int(np.any(w_new != w_old))
        return pd.DataFrame([{
            "tile_x": int(key[0]), "tile_y": int(key[1]),
            "tile_w": tw, "tile_h": th,
            "z": z.ravel().tolist(), "w": w_new.ravel().tolist(),
            "changed": chg,
        }])

    for _ in range(max_rounds):
        strips = state.mapInPandas(_w_strips, schema=_STRIP_SCHEMA)
        state = (
            state.groupBy("tile_x", "tile_y")
            .cogroup(strips.groupBy("dst_x", "dst_y"))
            .applyInPandas(solve, schema=_STATE_SCHEMA)
            .localCheckpoint()
        )
        if state.agg(F.sum("changed")).collect()[0][0] == 0:
            break
    else:
        raise RuntimeError(
            f"fill_sinks did not converge in {max_rounds} rounds")

    ex = state.select(
        "tile_x", "tile_y", "tile_w",
        F.posexplode("w").alias("pos", "fill"),
    )
    px = (F.col("tile_x") * tile + F.col("pos") % F.col("tile_w"))
    py = (F.col("tile_y") * tile
          + (F.col("pos") / F.col("tile_w")).cast("int"))
    return ex.select(
        px.cast("long").alias("px"), py.cast("long").alias("py"),
        F.col("fill").cast("double").alias("fill"),
    )
