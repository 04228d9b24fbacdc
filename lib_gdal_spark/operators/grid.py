"""Grid interpolation: scattered points -> raster (gdal_grid re-expressed).

Reference: ``core/alg/gdalgrid.cpp`` — IDW (``:127``), nearest (``:631``),
moving average (``:406``), data metrics (``:784-1316``); the quadtree
acceleration (``:2105``) becomes a *data layout*: points are bucketed to the
dst tile grid, each dst tile gathers the points of its own bucket plus a
caller-sized ring of neighbor buckets (radius / tile-span), and the kernel
vectorizes over (pixels x points) inside Arrow batches.

Scale shape: the point table shuffles ONCE (explode to the covering tile
buckets), tiles compute independently; a hot city tile is one task and AQE
splits skewed buckets.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lib_gdal_spark.operators.rasterize import GridSpec
from lib_gdal_spark.sources.rasters import RASTER_SCHEMA


def grid_interpolate(
    points: DataFrame,
    grid: GridSpec,
    alg: str = "invdist",
    radius: float = 0.0,
    power: float = 2.0,
    nodata: float = 0.0,
    raster_id: str = "grid",
    point_cols: tuple[str, str, str] = ("x", "y", "v"),
) -> DataFrame:
    """points(x, y, v) -> tile table under ``alg``.

    alg: 'invdist' (IDW power/radius, ``GDALGridInverseDistanceToAPower``),
    'nearest', 'average' (moving average in radius), 'count'/'minimum'/
    'maximum'/'range'/'average_distance'/'average_distance_pts' (data
    metrics, ``gdalgrid.cpp:784-1420``). ``radius`` = 0 means unbounded
    for invdist/nearest (all points; only sane for small point sets) and
    is required for 'average' and the metrics.

    GDAL semantics reproduced: grid nodes are **pixel centers**; a point at
    distance 0 short-circuits IDW to its value; an empty search yields
    ``nodata``.
    """
    xcol, ycol, vcol = point_cols
    ntx, nty = grid.n_tiles()
    tile = grid.tile
    gt = grid.gt
    # ring of neighbor buckets a search radius can reach — computed PER AXIS
    # (anisotropic grids: |gt5| may differ from |gt1|, so the radius spans a
    # different number of tile-buckets in y than in x)
    span_x = abs(gt[1]) * tile
    span_y = abs(gt[5]) * tile
    ring_x = 0 if radius <= 0.0 else int(math.ceil(radius / span_x))
    ring_y = 0 if radius <= 0.0 else int(math.ceil(radius / span_y))
    unbounded = radius <= 0.0
    if unbounded:
        # Guard (VERDICT r2 plan audit): the unbounded path replicates every
        # point to every tile — exact IDW over the full set, only sane for
        # small point layers. Refuse before the explode, not after.
        n_points = points.count()
        if n_points * ntx * nty > 50_000_000:
            raise ValueError(
                f"radius=0 (unbounded) replicates all {n_points} points to "
                f"all {ntx * nty} tiles ({n_points * ntx * nty} rows). Pass "
                f"a finite search radius for large point layers."
            )

    def bucket(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            x = b[xcol].to_numpy(np.float64)
            y = b[ycol].to_numpy(np.float64)
            v = b[vcol].to_numpy(np.float64)
            px, py = grid.world_to_px(x, y)
            if unbounded:
                # every tile sees every point (small-point-set exact path)
                tx = np.repeat(np.arange(ntx * nty, dtype=np.int64), len(x))
                out = pd.DataFrame({
                    "tile_x": tx % ntx,
                    "tile_y": tx // ntx,
                    "x": np.tile(x, ntx * nty),
                    "y": np.tile(y, ntx * nty),
                    "v": np.tile(v, ntx * nty),
                })
                yield out
                continue
            bx = np.clip(px // tile, 0, ntx - 1).astype(np.int64)
            by = np.clip(py // tile, 0, nty - 1).astype(np.int64)
            dx, dy = np.meshgrid(
                np.arange(-ring_x, ring_x + 1), np.arange(-ring_y, ring_y + 1)
            )
            dx = dx.ravel()
            dy = dy.ravel()
            n = len(x)
            m = len(dx)
            tx = (bx[:, None] + dx[None, :]).ravel()
            ty = (by[:, None] + dy[None, :]).ravel()
            ok = (tx >= 0) & (tx < ntx) & (ty >= 0) & (ty < nty)
            rep = np.repeat(np.arange(n), m)[ok]
            yield pd.DataFrame({
                "tile_x": tx[ok], "tile_y": ty[ok],
                "x": x[rep], "y": y[rep], "v": v[rep],
            })

    buckets = points.select(
        F.col(xcol).alias(xcol), F.col(ycol).alias(ycol), F.col(vcol).alias(vcol)
    ).mapInPandas(bucket, schema="tile_x long, tile_y long, x double, y double, v double")

    W, H = grid.width, grid.height

    CHUNK = 4096  # points per accumulation block: bounds the (pixels x
    # points) temporaries to ~tile^2*CHUNK*8B regardless of bucket size

    def interp(key, pdf: pd.DataFrame) -> pd.DataFrame:
        tx, ty = int(key[0]), int(key[1])
        x0, y0 = tx * tile, ty * tile
        tw = min(tile, W - x0)
        th = min(tile, H - y0)
        jj, ii = np.meshgrid(np.arange(th), np.arange(tw), indexing="ij")
        gx = (gt[0] + (x0 + ii + 0.5) * gt[1]).ravel()
        gy = (gt[3] + (y0 + jj + 0.5) * gt[5]).ravel()
        px_all = pdf["x"].to_numpy(np.float64)
        py_all = pdf["y"].to_numpy(np.float64)
        pv_all = pdf["v"].to_numpy(np.float64)
        npx = th * tw
        r2 = radius * radius

        # streaming accumulators (chunked over points -> bounded memory)
        num = np.zeros(npx)
        den = np.zeros(npx)
        cnt = np.zeros(npx, dtype=np.int64)
        small = np.full(npx, np.inf)
        big = np.full(npx, -np.inf)
        best_d2 = np.full(npx, np.inf)
        best_v = np.full(npx, nodata)
        zero_v = np.full(npx, np.nan)

        for c0 in range(0, len(px_all), CHUNK):
            px_ = px_all[c0 : c0 + CHUNK]
            py_ = py_all[c0 : c0 + CHUNK]
            pv = pv_all[c0 : c0 + CHUNK]
            d2 = (gx[:, None] - px_[None, :]) ** 2 + (
                gy[:, None] - py_[None, :]
            ) ** 2
            inr = d2 <= r2 if not unbounded else np.ones_like(d2, dtype=bool)
            if alg == "invdist":
                zero = inr & (d2 == 0.0)
                if zero.any():
                    first0 = np.argmax(zero, axis=1)
                    hit = zero.any(axis=1) & np.isnan(zero_v)
                    zero_v[hit] = pv[first0[hit]]
                with np.errstate(divide="ignore"):
                    w = np.where(inr, d2 ** (-power / 2.0), 0.0)
                num += (w * pv[None, :]).sum(axis=1)
                den += w.sum(axis=1)
            elif alg == "nearest":
                d2m = np.where(inr, d2, np.inf)
                idx = np.argmin(d2m, axis=1)
                dmin = d2m[np.arange(npx), idx]
                better = dmin < best_d2
                best_d2[better] = dmin[better]
                best_v[better] = pv[idx[better]]
            else:
                cnt += inr.sum(axis=1)
                if alg in ("minimum", "maximum", "range", "average"):
                    vm = np.where(inr, pv[None, :], np.inf)
                    small = np.minimum(small, vm.min(axis=1))
                    vM = np.where(inr, pv[None, :], -np.inf)
                    big = np.maximum(big, vM.max(axis=1))
                    if alg == "average":
                        num += np.where(inr, pv[None, :], 0.0).sum(axis=1)
                elif alg == "average_distance":
                    # GDALGridDataMetricAverageDistance
                    # (core/alg/gdalgrid.cpp:1211): mean node->point
                    # distance over the search circle — streamable
                    num += np.where(inr, np.sqrt(d2), 0.0).sum(axis=1)

        if alg == "invdist":
            vals = np.where(den > 0, num / np.where(den == 0, 1.0, den), nodata)
            out = np.where(np.isnan(zero_v), vals, zero_v)
        elif alg == "nearest":
            out = np.where(np.isfinite(best_d2), best_v, nodata)
        elif alg == "average":
            out = np.where(cnt > 0, num / np.maximum(cnt, 1), nodata)
        elif alg == "count":
            out = cnt.astype(np.float64)
        elif alg == "minimum":
            out = np.where(cnt > 0, small, nodata)
        elif alg == "maximum":
            out = np.where(cnt > 0, big, nodata)
        elif alg == "range":
            out = np.where(cnt > 0, big - small, nodata)
        elif alg == "average_distance":
            out = np.where(cnt > 0, num / np.maximum(cnt, 1), nodata)
        elif alg == "average_distance_pts":
            # GDALGridDataMetricAverageDistancePts (gdalgrid.cpp:1316):
            # mean PAIRWISE distance among the in-circle points. Pairs
            # cannot stream across chunks, so this branch loops nodes over
            # the tile's full bucketed point set (bounded by the search
            # ring — the same working set every other metric touches).
            out = np.full(npx, nodata)
            for node in range(npx):
                dx = px_all - gx[node]
                dy = py_all - gy[node]
                m = (dx * dx + dy * dy) <= r2
                sel_x = px_all[m]
                sel_y = py_all[m]
                n_in = len(sel_x)
                if n_in < 2:
                    continue
                ddx = sel_x[:, None] - sel_x[None, :]
                ddy = sel_y[:, None] - sel_y[None, :]
                tot = np.sqrt(ddx * ddx + ddy * ddy)[
                    np.triu_indices(n_in, 1)].sum()
                out[node] = tot / (n_in * (n_in - 1) / 2.0)
        else:
            raise ValueError(f"unknown grid alg {alg}")
        return pd.DataFrame([
            dict(
                raster_id=raster_id, band=1, zoom=0, tile_x=tx, tile_y=ty,
                dtype="float64", tile_w=tw, tile_h=th,
                gt0=gt[0] + x0 * gt[1], gt1=gt[1], gt2=0.0,
                gt3=gt[3] + y0 * gt[5], gt4=0.0, gt5=gt[5],
                nodata=nodata, pixels=out.tolist(),
            )
        ])

    return buckets.groupBy("tile_x", "tile_y").applyInPandas(
        interp, schema=RASTER_SCHEMA
    )


def grid_invdistnn(
    points: DataFrame,
    grid: GridSpec,
    radius: float,
    max_points: int = 12,
    min_points: int = 0,
    power: float = 2.0,
    nodata: float = 0.0,
    raster_id: str = "grid",
    point_cols: tuple[str, str, str] = ("x", "y", "v"),
) -> DataFrame:
    """gdal_grid 'invdistnn' (``core/alg/gdalgrid.cpp:260`` — IDW over the
    ``max_points`` nearest neighbors within ``radius``; fewer than
    ``min_points`` in range -> nodata).

    Same bucket layout as grid_interpolate; each tile keeps a running
    per-pixel top-``max_points`` heap merged chunk by chunk, so memory is
    bounded by pixels x max_points regardless of bucket size.
    """
    if radius <= 0.0:
        raise ValueError("invdistnn requires a positive search radius")
    xcol, ycol, vcol = point_cols
    ntx, nty = grid.n_tiles()
    tile = grid.tile
    gt = grid.gt
    span_x = abs(gt[1]) * tile
    span_y = abs(gt[5]) * tile
    ring_x = int(math.ceil(radius / span_x))
    ring_y = int(math.ceil(radius / span_y))

    def bucket(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            x = b[xcol].to_numpy(np.float64)
            y = b[ycol].to_numpy(np.float64)
            v = b[vcol].to_numpy(np.float64)
            px, py = grid.world_to_px(x, y)
            bx = np.clip(px // tile, 0, ntx - 1).astype(np.int64)
            by = np.clip(py // tile, 0, nty - 1).astype(np.int64)
            dx, dy = np.meshgrid(np.arange(-ring_x, ring_x + 1),
                                 np.arange(-ring_y, ring_y + 1))
            dx = dx.ravel()
            dy = dy.ravel()
            n, m = len(x), len(dx)
            tx = (bx[:, None] + dx[None, :]).ravel()
            ty = (by[:, None] + dy[None, :]).ravel()
            ok = (tx >= 0) & (tx < ntx) & (ty >= 0) & (ty < nty)
            rep = np.repeat(np.arange(n), m)[ok]
            yield pd.DataFrame({
                "tile_x": tx[ok], "tile_y": ty[ok],
                "x": x[rep], "y": y[rep], "v": v[rep],
            })

    buckets = points.select(xcol, ycol, vcol).mapInPandas(
        bucket, schema="tile_x long, tile_y long, x double, y double, v double"
    )
    W, H = grid.width, grid.height
    CHUNK = 4096
    r2 = radius * radius

    def interp(key, pdf: pd.DataFrame) -> pd.DataFrame:
        tx, ty = int(key[0]), int(key[1])
        x0, y0 = tx * tile, ty * tile
        tw = min(tile, W - x0)
        th = min(tile, H - y0)
        jj, ii = np.meshgrid(np.arange(th), np.arange(tw), indexing="ij")
        gx = (gt[0] + (x0 + ii + 0.5) * gt[1]).ravel()
        gy = (gt[3] + (y0 + jj + 0.5) * gt[5]).ravel()
        npx = th * tw
        top_d2 = np.full((npx, max_points), np.inf)
        top_v = np.zeros((npx, max_points))
        px_all = pdf["x"].to_numpy(np.float64)
        py_all = pdf["y"].to_numpy(np.float64)
        pv_all = pdf["v"].to_numpy(np.float64)
        for c0 in range(0, len(px_all), CHUNK):
            px_ = px_all[c0:c0 + CHUNK]
            py_ = py_all[c0:c0 + CHUNK]
            pv = pv_all[c0:c0 + CHUNK]
            d2 = (gx[:, None] - px_[None, :]) ** 2 + \
                 (gy[:, None] - py_[None, :]) ** 2
            d2 = np.where(d2 <= r2, d2, np.inf)
            vv = np.broadcast_to(pv[None, :], d2.shape)
            md = np.concatenate([top_d2, d2], axis=1)
            mv = np.concatenate([top_v, vv], axis=1)
            sel = np.argpartition(md, max_points - 1, axis=1)[:, :max_points]
            rows = np.arange(npx)[:, None]
            top_d2 = md[rows, sel]
            top_v = mv[rows, sel]
        finite = np.isfinite(top_d2)
        n_in = finite.sum(axis=1)
        zero = finite & (top_d2 == 0.0)
        with np.errstate(divide="ignore"):
            w = np.where(finite, top_d2 ** (-power / 2.0), 0.0)
        num = np.where(np.isfinite(w), w * top_v, 0.0).sum(axis=1)
        den = np.where(np.isfinite(w), w, 0.0).sum(axis=1)
        out = np.where(den > 0, num / np.where(den == 0, 1, den), nodata)
        # exact-hit short circuit (GDAL: dist 0 -> point value)
        zhit = zero.any(axis=1)
        zidx = np.argmax(zero, axis=1)
        out[zhit] = top_v[np.arange(npx), zidx][zhit]
        out = np.where(n_in >= max(min_points, 1), out, nodata)
        return pd.DataFrame([dict(
            raster_id=raster_id, band=1, zoom=0, tile_x=tx, tile_y=ty,
            dtype="float64", tile_w=tw, tile_h=th,
            gt0=gt[0] + x0 * gt[1], gt1=gt[1], gt2=0.0,
            gt3=gt[3] + y0 * gt[5], gt4=0.0, gt5=gt[5],
            nodata=nodata, pixels=out.tolist(),
        )])

    return buckets.groupBy("tile_x", "tile_y").applyInPandas(
        interp, schema=RASTER_SCHEMA
    )


def grid_linear(
    points: DataFrame,
    grid: GridSpec,
    nodata: float = 0.0,
    raster_id: str = "grid_linear",
    point_cols: tuple[str, str, str] = ("x", "y", "v"),
    max_driver_points: int = 2_000_000,
) -> DataFrame:
    """gdal_grid 'linear': Delaunay triangulation + barycentric interp
    (``core/alg/gdalgrid.cpp:542`` GDALGridLinear over delaunay.c).

    The triangulation is global over the POINT layer (the vector side —
    orders of magnitude smaller than the raster), built once on the driver
    under ``max_driver_points`` and closure-shipped to the per-tile
    interpolation tasks; the raster side stays fully distributed.
    """
    from lib_gdal_spark.functions import delaunay as DT

    xcol, ycol, vcol = point_cols
    rows = points.select(xcol, ycol, vcol).collect()
    if len(rows) > max_driver_points:
        raise RuntimeError(
            f"grid_linear point layer ({len(rows)}) exceeds "
            f"max_driver_points={max_driver_points}"
        )
    pts = np.array([[r[xcol], r[ycol]] for r in rows], dtype=np.float64)
    vals = np.array([r[vcol] for r in rows], dtype=np.float64)
    verts, tris = DT.delaunay(pts)

    ntx, nty = grid.n_tiles()
    tile = grid.tile
    gt = grid.gt
    W, H = grid.width, grid.height
    spark = points.sparkSession
    keys = spark.range(ntx * nty).select(
        (F.col("id") % ntx).cast("int").alias("tile_x"),
        (F.col("id") / ntx).cast("int").alias("tile_y"),
    )

    def interp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out_rows = []
            for _, r in b.iterrows():
                tx, ty = int(r["tile_x"]), int(r["tile_y"])
                x0, y0 = tx * tile, ty * tile
                tw = min(tile, W - x0)
                th = min(tile, H - y0)
                jj, ii = np.meshgrid(np.arange(th), np.arange(tw),
                                     indexing="ij")
                gx = (gt[0] + (x0 + ii + 0.5) * gt[1]).ravel()
                gy = (gt[3] + (y0 + jj + 0.5) * gt[5]).ravel()
                vals_px = DT.interpolate_linear(
                    verts, tris, vals, gx, gy, nodata=nodata
                )
                out_rows.append(dict(
                    raster_id=raster_id, band=1, zoom=0,
                    tile_x=tx, tile_y=ty, dtype="float64",
                    tile_w=tw, tile_h=th,
                    gt0=gt[0] + x0 * gt[1], gt1=gt[1], gt2=0.0,
                    gt3=gt[3] + y0 * gt[5], gt4=0.0, gt5=gt[5],
                    nodata=nodata, pixels=vals_px.tolist(),
                ))
            yield pd.DataFrame(out_rows)

    return keys.mapInPandas(interp, schema=RASTER_SCHEMA)


def grid_linear_dist(
    points: DataFrame,
    grid: GridSpec,
    nodata: float = 0.0,
    raster_id: str = "grid_linear",
    point_cols: tuple[str, str, str] = ("x", "y", "v"),
    cells: int = 8,
) -> DataFrame:
    """grid_linear WITHOUT the driver-side triangulation guard: the point
    layer triangulates distributively (operators.delaunay_dist, per-point
    settlement certificates), triangles bucket to the dst tiles they
    overlap, and each tile interpolates from exactly its triangles.
    """
    from lib_gdal_spark.functions import delaunay as DT
    from lib_gdal_spark.operators.delaunay_dist import delaunay_distributed

    xcol, ycol, vcol = point_cols
    spark = points.sparkSession
    pts = points.select(
        F.monotonically_increasing_id().alias("pid"),
        F.col(xcol).alias("x"), F.col(ycol).alias("y"),
        F.col(vcol).alias("v"),
    ).localCheckpoint()

    tris = delaunay_distributed(pts, spark, cells=cells)

    # attach vertex coords/values (three joins on the small point table)
    for side in ("a", "b", "c"):
        p = pts.select(
            F.col("pid").alias(f"i{side}"),
            F.col("x").alias(f"x{side}"), F.col("y").alias(f"y{side}"),
            F.col("v").alias(f"v{side}"),
        )
        tris = tris.join(p, f"i{side}")

    ntx, nty = grid.n_tiles()
    tile = grid.tile
    gt = grid.gt
    W, H = grid.width, grid.height

    # bucket triangles to the dst tiles their bbox overlaps (native math)
    px_of = lambda c: (c - gt[0]) / gt[1]
    py_of = lambda c: (c - gt[3]) / gt[5]
    bx0 = F.least("xa", "xb", "xc")
    bx1 = F.greatest("xa", "xb", "xc")
    # gt5 < 0: min py comes from MAX y
    by0 = F.greatest("ya", "yb", "yc")
    by1 = F.least("ya", "yb", "yc")
    t0 = F.greatest(F.floor(px_of(bx0) / tile).cast("int"), F.lit(0))
    t1 = F.least(F.floor(px_of(bx1) / tile).cast("int"), F.lit(ntx - 1))
    u0 = F.greatest(F.floor(py_of(by0) / tile).cast("int"), F.lit(0))
    u1 = F.least(F.floor(py_of(by1) / tile).cast("int"), F.lit(nty - 1))
    tris = tris.where((t1 >= t0) & (u1 >= u0)).select(
        "*",
        F.explode(F.sequence(t0, t1)).alias("tile_x"),
    ).select("*", F.explode(F.sequence(u0, u1)).alias("tile_y"))

    def interp(key, pdf: pd.DataFrame) -> pd.DataFrame:
        tx, ty = int(key[0]), int(key[1])
        x0, y0 = tx * tile, ty * tile
        tw = min(tile, W - x0)
        th = min(tile, H - y0)
        jj, ii = np.meshgrid(np.arange(th), np.arange(tw), indexing="ij")
        gx = (gt[0] + (x0 + ii + 0.5) * gt[1]).ravel()
        gy = (gt[3] + (y0 + jj + 0.5) * gt[5]).ravel()
        verts = np.vstack([
            pdf[["xa", "ya"]].to_numpy(np.float64),
            pdf[["xb", "yb"]].to_numpy(np.float64),
            pdf[["xc", "yc"]].to_numpy(np.float64),
        ])
        m = len(pdf)
        tri_idx = np.column_stack([
            np.arange(m), np.arange(m) + m, np.arange(m) + 2 * m
        ])
        vals = np.concatenate([
            pdf["va"].to_numpy(np.float64),
            pdf["vb"].to_numpy(np.float64),
            pdf["vc"].to_numpy(np.float64),
        ])
        out = DT.interpolate_linear(verts, tri_idx, vals, gx, gy,
                                    nodata=nodata)
        return pd.DataFrame([dict(
            raster_id=raster_id, band=1, zoom=0, tile_x=tx, tile_y=ty,
            dtype="float64", tile_w=tw, tile_h=th,
            gt0=gt[0] + x0 * gt[1], gt1=gt[1], gt2=0.0,
            gt3=gt[3] + y0 * gt[5], gt4=0.0, gt5=gt[5],
            nodata=nodata, pixels=out.tolist(),
        )])

    keys = spark.range(ntx * nty).select(
        (F.col("id") % ntx).cast("int").alias("tile_x"),
        (F.col("id") / ntx).cast("int").alias("tile_y"),
    )
    tasks = keys.join(tris, ["tile_x", "tile_y"], "left")
    return tasks.groupBy("tile_x", "tile_y").applyInPandas(
        interp, schema=RASTER_SCHEMA
    )


def _solve_fixed_order(A: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Batched (m, n, n) @ (m, n) linear solve by fixed-order pivot-free
    Gaussian elimination + sequential back-substitution — the exact
    operation order the generated SQL oracles replay (see
    __spark_entry__._elim_backsub_ctes), so results are bit-identical
    across engines. Callers must guarantee nonzero pivots (PD-plus-
    Lagrange kriging systems, weighted normal equations)."""
    A = A.copy()
    b = b.copy()
    m, n = b.shape
    for col in range(n - 1):
        piv = A[:, col, col].copy()
        for r in range(col + 1, n):
            f = A[:, r, col] / piv
            for cc in range(col + 1, n):
                A[:, r, cc] = A[:, r, cc] - f * A[:, col, cc]
            b[:, r] = b[:, r] - f * b[:, col]
    w = np.zeros((m, n))
    for i in range(n - 1, -1, -1):
        s = b[:, i].copy()
        for jcol in range(i + 1, n):
            s = s - A[:, i, jcol] * w[:, jcol]
        w[:, i] = s / A[:, i, i]
    return w


def grid_kriging(
    points: DataFrame,
    grid: GridSpec,
    radius: float,
    max_points: int = 8,
    min_points: int = 1,
    nugget: float = 0.0,
    psill: float = 1.0,
    vrange: float | None = None,
    model: str = "spherical",
    nodata: float = 0.0,
    raster_id: str = "grid",
    point_cols: tuple[str, str, str] = ("x", "y", "v"),
    id_col: str | None = None,
) -> DataFrame:
    """Ordinary kriging: scattered points -> raster, the geostatistical
    upgrade of gdal_grid IDW (the reference stops at invdist,
    ``core/alg/gdalgrid.cpp:127``; kriging per Matheron 1963 / Cressie
    1993 ch. 3 is what its users run through SAGA/ArcGIS after gdal_grid).

    Per pixel center: the ``max_points`` nearest in-radius samples
    (deterministic (d2, id) order), then the ordinary-kriging system in
    COVARIANCE form [C 1; 1 0][w; mu] = [c0; 1] with C(h) = sill - gamma(h)
    — the covariance form makes every pivot positive (C(0) = nugget+psill,
    then Schur complements of a PD matrix; the Lagrange pivot turns
    nonzero after the sample rows), so fixed-order Gaussian elimination
    WITHOUT pivoting is numerically safe and — crucially — the identical
    operation sequence is spellable in plain SQL, which is how the driver
    oracle reproduces the prediction bit-for-bit at k=3. Variogram models:
    'spherical' (default), 'exponential', 'gaussian', 'linear'; sill =
    nugget + psill, range ``vrange`` defaults to ``radius``.

    Fewer than ``min_points`` in radius -> nodata; between min and max ->
    the smaller exact system. Coincident sample coordinates make the
    system singular — pre-aggregate duplicates upstream.

    Scale shape: identical bucket layout to :func:`grid_invdistnn` (one
    shuffle to covering tile buckets, per-tile Arrow kernel, chunked
    top-k merge bounded by pixels x max_points); the solve is one
    vectorized batched elimination over (pixels, k+1, k+1).
    """
    if radius <= 0.0:
        raise ValueError("kriging requires a positive search radius")
    if nugget + psill <= 0.0:
        raise ValueError("nugget + psill must be positive")
    if model not in ("spherical", "exponential", "gaussian", "linear"):
        raise ValueError(f"unknown variogram model {model!r}")
    a = float(vrange if vrange is not None else radius)
    sill = nugget + psill
    xcol, ycol, vcol = point_cols
    ntx, nty = grid.n_tiles()
    tile = grid.tile
    gt = grid.gt
    span_x = abs(gt[1]) * tile
    span_y = abs(gt[5]) * tile
    ring_x = int(math.ceil(radius / span_x))
    ring_y = int(math.ceil(radius / span_y))

    def cov(h: np.ndarray) -> np.ndarray:
        """C(h) = sill - gamma(h); the h>0, h<a branch mirrors the SQL
        oracle operation-for-operation (see __spark_entry__ kriging)."""
        u = h / a
        if model == "spherical":
            g = 1.5 * u - 0.5 * u * u * u
        elif model == "exponential":
            g = 1.0 - np.exp(-3.0 * u)
        elif model == "gaussian":
            g = 1.0 - np.exp(-3.0 * u * u)
        else:  # linear
            g = u
        c = psill * (1.0 - g)
        if model in ("spherical", "linear"):
            c = np.where(h >= a, 0.0, c)
        return np.where(h == 0.0, sill, c)

    sel = [xcol, ycol, vcol] + ([id_col] if id_col else [])

    def bucket(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            x = b[xcol].to_numpy(np.float64)
            y = b[ycol].to_numpy(np.float64)
            v = b[vcol].to_numpy(np.float64)
            pid = (b[id_col].to_numpy(np.int64) if id_col
                   else np.zeros(len(x), np.int64))
            px, py = grid.world_to_px(x, y)
            bx = np.clip(px // tile, 0, ntx - 1).astype(np.int64)
            by = np.clip(py // tile, 0, nty - 1).astype(np.int64)
            dx, dy = np.meshgrid(np.arange(-ring_x, ring_x + 1),
                                 np.arange(-ring_y, ring_y + 1))
            dx = dx.ravel()
            dy = dy.ravel()
            n, m = len(x), len(dx)
            tx = (bx[:, None] + dx[None, :]).ravel()
            ty = (by[:, None] + dy[None, :]).ravel()
            ok = (tx >= 0) & (tx < ntx) & (ty >= 0) & (ty < nty)
            rep = np.repeat(np.arange(n), m)[ok]
            yield pd.DataFrame({
                "tile_x": tx[ok], "tile_y": ty[ok],
                "x": x[rep], "y": y[rep], "v": v[rep], "pid": pid[rep],
            })

    buckets = points.select(*sel).mapInPandas(
        bucket,
        schema="tile_x long, tile_y long, x double, y double, "
               "v double, pid long",
    )
    W, H = grid.width, grid.height
    CHUNK = 4096
    r2 = radius * radius
    k = max_points

    def interp(key, pdf: pd.DataFrame) -> pd.DataFrame:
        tx, ty = int(key[0]), int(key[1])
        x0, y0 = tx * tile, ty * tile
        tw = min(tile, W - x0)
        th = min(tile, H - y0)
        jj, ii = np.meshgrid(np.arange(th), np.arange(tw), indexing="ij")
        gx = (gt[0] + (x0 + ii + 0.5) * gt[1]).ravel()
        gy = (gt[3] + (y0 + jj + 0.5) * gt[5]).ravel()
        npx = th * tw
        # deterministic candidate order: (pid, x, y) so the top-k merge
        # tie-break on equal d2 is (d2, pid) — matching the oracle's
        # row_number() ORDER BY d2, pid
        order = np.lexsort((pdf["y"].to_numpy(), pdf["x"].to_numpy(),
                            pdf["pid"].to_numpy()))
        px_all = pdf["x"].to_numpy(np.float64)[order]
        py_all = pdf["y"].to_numpy(np.float64)[order]
        pv_all = pdf["v"].to_numpy(np.float64)[order]
        pi_all = pdf["pid"].to_numpy(np.int64)[order]
        top_d2 = np.full((npx, k), np.inf)
        top_x = np.zeros((npx, k))
        top_y = np.zeros((npx, k))
        top_v = np.zeros((npx, k))
        top_i = np.full((npx, k), np.iinfo(np.int64).max, np.int64)
        rows = np.arange(npx)[:, None]
        for c0 in range(0, len(px_all), CHUNK):
            px_ = px_all[c0:c0 + CHUNK]
            py_ = py_all[c0:c0 + CHUNK]
            d2 = (gx[:, None] - px_[None, :]) ** 2 + \
                 (gy[:, None] - py_[None, :]) ** 2
            d2 = np.where(d2 <= r2, d2, np.inf)
            md = np.concatenate([top_d2, d2], axis=1)
            mx = np.concatenate(
                [top_x, np.broadcast_to(px_[None, :], d2.shape)], axis=1)
            my = np.concatenate(
                [top_y, np.broadcast_to(py_[None, :], d2.shape)], axis=1)
            mv = np.concatenate(
                [top_v, np.broadcast_to(pv_all[c0:c0 + CHUNK][None, :],
                                        d2.shape)], axis=1)
            mi = np.concatenate(
                [top_i, np.broadcast_to(pi_all[c0:c0 + CHUNK][None, :],
                                        d2.shape)], axis=1)
            sel_k = np.lexsort((mi, md), axis=1)[:, :k]
            top_d2 = md[rows, sel_k]
            top_x = mx[rows, sel_k]
            top_y = my[rows, sel_k]
            top_v = mv[rows, sel_k]
            top_i = mi[rows, sel_k]
        n_in = np.isfinite(top_d2).sum(axis=1)
        out = np.full(npx, nodata)
        for c in range(max(min_points, 1), k + 1):
            mask = n_in == c
            m = int(mask.sum())
            if m == 0:
                continue
            cx = top_x[mask, :c]
            cy = top_y[mask, :c]
            cv = top_v[mask, :c]
            cd2 = top_d2[mask, :c]
            n = c + 1
            A = np.zeros((m, n, n))
            for i in range(c):
                for jcol in range(c):
                    if i == jcol:
                        A[:, i, jcol] = sill
                    else:
                        h = np.sqrt((cx[:, i] - cx[:, jcol]) ** 2
                                    + (cy[:, i] - cy[:, jcol]) ** 2)
                        A[:, i, jcol] = cov(h)
                A[:, i, c] = 1.0
                A[:, c, i] = 1.0
            b = np.empty((m, n))
            for i in range(c):
                b[:, i] = cov(np.sqrt(cd2[:, i]))
            b[:, c] = 1.0
            w = _solve_fixed_order(A, b)
            pred = np.zeros(m)
            for i in range(c):
                pred = pred + w[:, i] * cv[:, i]
            out[mask] = pred
        return pd.DataFrame([dict(
            raster_id=raster_id, band=1, zoom=0, tile_x=tx, tile_y=ty,
            dtype="float64", tile_w=tw, tile_h=th,
            gt0=gt[0] + x0 * gt[1], gt1=gt[1], gt2=0.0,
            gt3=gt[3] + y0 * gt[5], gt4=0.0, gt5=gt[5],
            nodata=nodata, pixels=out.tolist(),
        )])

    return buckets.groupBy("tile_x", "tile_y").applyInPandas(
        interp, schema=RASTER_SCHEMA
    )


def grid_gwr(
    points: DataFrame,
    grid: GridSpec,
    bandwidth: float,
    x_cols: tuple[str, str] = ("x1", "x2"),
    y_col: str = "y",
    min_points: int = 8,
    nodata: float = 0.0,
    raster_id: str = "gwr",
    point_cols: tuple[str, str] = ("x", "y"),
    quantize: int | None = 4096,
) -> DataFrame:
    """Geographically weighted regression (Fotheringham, Brunsdon &
    Charlton 2002) coefficient surfaces: at every pixel center, a local
    weighted least-squares fit y ~ b0 + b1*x1 + b2*x2 over the samples
    within ``bandwidth``, bisquare kernel w = (1 - (d/bw)^2)^2 — chosen
    over the Gaussian kernel because it is ALGEBRAIC (no exp), so the SQL
    oracle reproduces the weights bit-for-bit.

    Output raster bands: 1 = intercept, 2 = beta_x1, 3 = beta_x2,
    4 = local weighted R^2. Pixels with fewer than ``min_points`` samples
    in the bandwidth emit ``nodata`` in all four bands.

    ``quantize`` (default 4096): kernel weights snap to 1/4096 dyadic
    rationals (the KDE/GRA_Sum trick) — with integer-valued predictors
    every accumulated normal-equation sum is an exact dyadic rational,
    making the fit partitioning/chunk-order invariant and
    oracle-reproducible. ``None`` keeps raw weights.

    Scale shape: same one-shuffle bucket layout as grid_invdistnn/
    grid_kriging (ring from the bandwidth); per tile one vectorized
    accumulation over (pixels x points) chunks, then a batched 3x3
    fixed-order solve (:func:`_solve_fixed_order`). Degenerate local
    designs (constant predictor within a window) make the normal matrix
    singular — inf/nan propagates; keep min_points honest.
    """
    if bandwidth <= 0.0:
        raise ValueError("gwr requires a positive bandwidth")
    xcol, ycol = point_cols
    cols = [xcol, ycol, *x_cols, y_col]
    if len(set(cols)) != len(cols):
        raise ValueError(
            f"point/predictor/response column names must be distinct, got "
            f"{cols}")
    x1c, x2c = x_cols
    ntx, nty = grid.n_tiles()
    tile = grid.tile
    gt = grid.gt
    span_x = abs(gt[1]) * tile
    span_y = abs(gt[5]) * tile
    ring_x = int(math.ceil(bandwidth / span_x))
    ring_y = int(math.ceil(bandwidth / span_y))
    bw2 = bandwidth * bandwidth
    q = float(quantize) if quantize else 0.0

    def bucket(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            x = b[xcol].to_numpy(np.float64)
            y = b[ycol].to_numpy(np.float64)
            px, py = grid.world_to_px(x, y)
            bx = np.clip(px // tile, 0, ntx - 1).astype(np.int64)
            by = np.clip(py // tile, 0, nty - 1).astype(np.int64)
            dx, dy = np.meshgrid(np.arange(-ring_x, ring_x + 1),
                                 np.arange(-ring_y, ring_y + 1))
            dx = dx.ravel()
            dy = dy.ravel()
            n, m = len(x), len(dx)
            tx = (bx[:, None] + dx[None, :]).ravel()
            ty = (by[:, None] + dy[None, :]).ravel()
            ok = (tx >= 0) & (tx < ntx) & (ty >= 0) & (ty < nty)
            rep = np.repeat(np.arange(n), m)[ok]
            yield pd.DataFrame({
                "tile_x": tx[ok], "tile_y": ty[ok],
                "x": x[rep], "y": y[rep],
                "x1": b[x1c].to_numpy(np.float64)[rep],
                "x2": b[x2c].to_numpy(np.float64)[rep],
                "yv": b[y_col].to_numpy(np.float64)[rep],
            })

    buckets = points.select(xcol, ycol, x1c, x2c, y_col).mapInPandas(
        bucket,
        schema="tile_x long, tile_y long, x double, y double, "
               "x1 double, x2 double, yv double",
    )
    W, H = grid.width, grid.height
    CHUNK = 4096

    def fit(key, pdf: pd.DataFrame) -> pd.DataFrame:
        tx, ty = int(key[0]), int(key[1])
        x0, y0 = tx * tile, ty * tile
        tw = min(tile, W - x0)
        th = min(tile, H - y0)
        jj, ii = np.meshgrid(np.arange(th), np.arange(tw), indexing="ij")
        gx = (gt[0] + (x0 + ii + 0.5) * gt[1]).ravel()
        gy = (gt[3] + (y0 + jj + 0.5) * gt[5]).ravel()
        npx = th * tw
        names = ["w", "x1", "x2", "x11", "x12", "x22",
                 "y", "x1y", "x2y", "yy"]
        s = {k: np.zeros(npx) for k in names}
        n_in = np.zeros(npx, dtype=np.int64)
        PX = pdf["x"].to_numpy(np.float64)
        PY = pdf["y"].to_numpy(np.float64)
        X1 = pdf["x1"].to_numpy(np.float64)
        X2 = pdf["x2"].to_numpy(np.float64)
        YV = pdf["yv"].to_numpy(np.float64)
        for c0 in range(0, len(PX), CHUNK):
            px_ = PX[c0:c0 + CHUNK][None, :]
            py_ = PY[c0:c0 + CHUNK][None, :]
            x1 = X1[c0:c0 + CHUNK][None, :]
            x2 = X2[c0:c0 + CHUNK][None, :]
            yv = YV[c0:c0 + CHUNK][None, :]
            d2 = (gx[:, None] - px_) ** 2 + (gy[:, None] - py_) ** 2
            inside = d2 < bw2
            u = d2 / bw2
            base = (1.0 - u) * (1.0 - u)
            w = np.where(inside, base, 0.0)
            if q:
                w = np.floor(w * q + 0.5) / q
            n_in += inside.sum(axis=1)
            s["w"] += w.sum(axis=1)
            s["x1"] += (w * x1).sum(axis=1)
            s["x2"] += (w * x2).sum(axis=1)
            s["x11"] += (w * x1 * x1).sum(axis=1)
            s["x12"] += (w * x1 * x2).sum(axis=1)
            s["x22"] += (w * x2 * x2).sum(axis=1)
            s["y"] += (w * yv).sum(axis=1)
            s["x1y"] += (w * x1 * yv).sum(axis=1)
            s["x2y"] += (w * x2 * yv).sum(axis=1)
            s["yy"] += (w * yv * yv).sum(axis=1)
        ok = n_in >= min_points
        m = int(ok.sum())
        bands = {1: np.full(npx, nodata), 2: np.full(npx, nodata),
                 3: np.full(npx, nodata), 4: np.full(npx, nodata)}
        if m:
            A = np.empty((m, 3, 3))
            A[:, 0, 0] = s["w"][ok]
            A[:, 0, 1] = A[:, 1, 0] = s["x1"][ok]
            A[:, 0, 2] = A[:, 2, 0] = s["x2"][ok]
            A[:, 1, 1] = s["x11"][ok]
            A[:, 1, 2] = A[:, 2, 1] = s["x12"][ok]
            A[:, 2, 2] = s["x22"][ok]
            rhs = np.stack([s["y"][ok], s["x1y"][ok], s["x2y"][ok]], axis=1)
            w_ = _solve_fixed_order(A, rhs)
            b0, b1, b2 = w_[:, 0], w_[:, 1], w_[:, 2]
            # local weighted R^2 — term order mirrors the SQL oracle
            syh = b0 * s["y"][ok] + b1 * s["x1y"][ok] + b2 * s["x2y"][ok]
            sy2h = (b0 * b0 * s["w"][ok] + b1 * b1 * s["x11"][ok]
                    + b2 * b2 * s["x22"][ok] + 2.0 * b0 * b1 * s["x1"][ok]
                    + 2.0 * b0 * b2 * s["x2"][ok]
                    + 2.0 * b1 * b2 * s["x12"][ok])
            sse = s["yy"][ok] - 2.0 * syh + sy2h
            tss = s["yy"][ok] - s["y"][ok] * s["y"][ok] / s["w"][ok]
            r2 = 1.0 - sse / tss
            bands[1][ok] = b0
            bands[2][ok] = b1
            bands[3][ok] = b2
            bands[4][ok] = r2
        return pd.DataFrame([dict(
            raster_id=raster_id, band=bn, zoom=0, tile_x=tx, tile_y=ty,
            dtype="float64", tile_w=tw, tile_h=th,
            gt0=gt[0] + x0 * gt[1], gt1=gt[1], gt2=0.0,
            gt3=gt[3] + y0 * gt[5], gt4=0.0, gt5=gt[5],
            nodata=nodata, pixels=bands[bn].tolist(),
        ) for bn in (1, 2, 3, 4)])

    return buckets.groupBy("tile_x", "tile_y").applyInPandas(
        fit, schema=RASTER_SCHEMA
    )


def line_density(segments: DataFrame, radius: float, cell: float,
                 nx: int, ny: int, scale: int = 10**9) -> DataFrame:
    """Line density raster (ArcGIS Line Density / GRASS v.kernel line
    mode, simple-search-radius form): for each cell CENTER, the total
    length of line segments clipped to the radius-``radius`` disc
    around it, divided by the disc area pi*r^2 — the road/river/
    pipeline intensity surface. Grid: ``nx`` x ``ny`` cells of size
    ``cell`` anchored at the origin; centers at ((i+0.5)c, (j+0.5)c).

    ``segments``: (sid, x0, y0, x1, y1). The clipped length is the
    closed-form segment-disc intersection (quadratic in the segment
    parameter, one sqrt of the discriminant, greatest/least clamps to
    [0,1]) — a fixed IEEE expression reproducible in SQL. Each
    (segment, cell) contribution is quantized half-up to integer
    ``1/scale`` units so the per-cell sum is an exact int64
    (order-free); density divides once at the end.

    Scale shape: each segment explodes ONLY to the cell-index window of
    its bbox inflated by r (generous integer bounds; spurious cells
    contribute exactly 0 by the same formula) — candidate volume is
    O(segment length * r / cell^2), never |segments| x |cells|; then
    one combinable groupBy on the cell key. Returns (ci, cj,
    length_units, density) for ALL nx*ny cells."""
    r2 = float(radius) * float(radius)
    ilo = F.greatest(
        (F.floor((F.least("x0", "x1") - radius) / cell) - 1).cast("int"),
        F.lit(0))
    ihi = F.least(
        (F.floor((F.greatest("x0", "x1") + radius) / cell) + 1).cast("int"),
        F.lit(int(nx) - 1))
    jlo = F.greatest(
        (F.floor((F.least("y0", "y1") - radius) / cell) - 1).cast("int"),
        F.lit(0))
    jhi = F.least(
        (F.floor((F.greatest("y0", "y1") + radius) / cell) + 1).cast("int"),
        F.lit(int(ny) - 1))
    cand = (segments
            .withColumn("ci", F.explode(F.when(
                ilo <= ihi, F.sequence(ilo, ihi))
                .otherwise(F.array().cast("array<int>"))))
            .withColumn("cj", F.explode(F.when(
                jlo <= jhi, F.sequence(jlo, jhi))
                .otherwise(F.array().cast("array<int>")))))
    cxc = (F.col("ci") + 0.5) * cell
    cyc = (F.col("cj") + 0.5) * cell
    dx = F.col("x1") - F.col("x0")
    dy = F.col("y1") - F.col("y0")
    a = dx * dx + dy * dy
    fx = F.col("x0") - cxc
    fy = F.col("y0") - cyc
    b = 2.0 * (fx * dx + fy * dy)
    c0 = fx * fx + fy * fy - F.lit(r2)
    disc = b * b - 4.0 * a * c0
    sq = F.sqrt(disc)
    t1 = (-b - sq) / (2.0 * a)
    t2 = (-b + sq) / (2.0 * a)
    lo = F.greatest(t1, F.lit(0.0))
    hi = F.least(t2, F.lit(1.0))
    seg_len = F.when((a > 0.0) & (disc > 0.0) & (hi > lo),
                     (hi - lo) * F.sqrt(a)).otherwise(F.lit(0.0))
    units = F.floor(seg_len * F.lit(float(scale)) + 0.5).cast("long")
    contrib = cand.select("ci", "cj", units.alias("u")) \
        .groupBy("ci", "cj").agg(F.sum("u").alias("length_units"))
    spark = segments.sparkSession
    allcells = spark.range(int(nx)).select(
        F.col("id").cast("int").alias("ci")).crossJoin(
        spark.range(int(ny)).select(F.col("id").cast("int").alias("cj")))
    area = math.pi * r2
    return (allcells.join(contrib, ["ci", "cj"], "left")
            .select("ci", "cj",
                    F.coalesce("length_units", F.lit(0)).cast("long")
                    .alias("length_units"),
                    F.round(F.coalesce("length_units", F.lit(0))
                            / F.lit(float(scale)) / F.lit(area), 9)
                    .alias("density")))
