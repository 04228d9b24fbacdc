"""Warp / overview resampling kernels with GDAL's exact conventions.

Behavioral spec (reimplemented from the reference, not copied):

- Warp kernels sample **dst pixel centers** ``(i + 0.5, j + 0.5)``
  (``core/alg/gdalwarpkernel.cpp:4466,4477``), map them to fractional source
  pixel coordinates, then gather:

  * nearest: ``floor(srcX)`` cell (with a tiny epsilon like GDAL's),
  * bilinear: triangle kernel radius 1 around ``srcX − 0.5``,
  * cubic: Catmull-Rom a=−0.5 —
    ``|x|<=1: x^2(1.5|x| − 2.5) + 1;  1<|x|<=2: x^2(−0.5|x| + 2.5) − 4|x| + 2``
    (``gdalwarpkernel.cpp:3092-3111``),
  * cubicspline: cubic B-spline radius 2 (``:3164``),
  * lanczos: sinc·sinc radius 3 (``:3020``).

- Integer outputs round via ``floor(v + 0.5)`` and clamp to the dtype range
  (``GWKRoundValueT`` / ``GWKClampValueT``, ``gdalwarpkernel.cpp:1381``).

- Overview (pyramid) kernels follow ``core/gcore/overview.cpp``:

  * AVERAGE: src window per dst pixel is
    ``[int(i*ratio + 1e-8), ceil((i+1)*ratio − 1e-8))``; integer types
    round-half-up ``(total + count/2) // count`` (2×2 fast path
    ``(total+2)/4`` at ``overview.cpp:534-540``); floats take the mean.
  * NEAREST: source offset ``int(0.5 + i*ratio)`` (``overview.cpp:99,114``)
    — i.e. factor-2 decimation keeps the **top-left** pixel of each 2×2.
"""

from __future__ import annotations

import numpy as np

INT_RANGES = {
    "uint8": (0, 255),
    "int16": (-32768, 32767),
    "uint16": (0, 65535),
    "int32": (-2147483648, 2147483647),
    "uint32": (0, 4294967295),
}


def clamp_round(arr: np.ndarray, dtype: str) -> np.ndarray:
    """GDAL float→int store: floor(v+0.5), clamp to dtype range.
    Non-finite values (unwarped dst pixels with no nodata set) store as
    0 — gdalwarp's INIT_DEST=0 default — explicitly, not via the
    architecture-dependent NaN→int cast."""
    if dtype in ("float32", "float64"):
        return arr.astype(dtype)
    lo, hi = INT_RANGES[dtype]
    arr = np.asarray(arr, dtype=np.float64)
    out = np.floor(np.where(np.isfinite(arr), arr, -0.5) + 0.5)
    return np.clip(out, lo, hi).astype(dtype)


# ---------------------------------------------------------------------------
# Kernel weight functions (vectorized over offset arrays)
# ---------------------------------------------------------------------------

def cubic_weight(x: np.ndarray) -> np.ndarray:
    """Catmull-Rom a=−0.5 (``gdalwarpkernel.cpp:3092-3111``)."""
    ax = np.abs(x)
    w = np.where(
        ax <= 1.0,
        ax * ax * (1.5 * ax - 2.5) + 1.0,
        np.where(ax <= 2.0, ax * ax * (-0.5 * ax + 2.5) - 4.0 * ax + 2.0, 0.0),
    )
    return w


def cubicspline_weight(x: np.ndarray) -> np.ndarray:
    """Cubic B-spline, radius 2 (``gdalwarpkernel.cpp:3164``)."""
    ax = np.abs(x)
    w = np.where(
        ax <= 1.0,
        (4.0 - 6.0 * ax * ax + 3.0 * ax**3) / 6.0,
        np.where(ax <= 2.0, ((2.0 - ax) ** 3) / 6.0, 0.0),
    )
    return w


def lanczos_weight(x: np.ndarray) -> np.ndarray:
    """Lanczos a=3 windowed sinc (``gdalwarpkernel.cpp:3020``)."""
    ax = np.abs(np.asarray(x, dtype=np.float64))
    out = np.zeros_like(ax)
    nz = (ax > 1e-12) & (ax < 3.0)
    px = np.pi * ax[nz]
    out[nz] = 3.0 * np.sin(px) * np.sin(px / 3.0) / (px * px)
    out[ax <= 1e-12] = 1.0
    return out


KERNELS = {
    "bilinear": (lambda x: np.maximum(0.0, 1.0 - np.abs(x)), 1),
    "cubic": (cubic_weight, 2),
    "cubicspline": (cubicspline_weight, 2),
    "lanczos": (lanczos_weight, 3),
}


# ---------------------------------------------------------------------------
# Geotransform math (``core/alg/gdaltransformer.cpp:3761-3800``)
# ---------------------------------------------------------------------------

def gt_apply(gt, px: np.ndarray, ln: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Pixel/line -> georeferenced x/y via the 6-coefficient affine."""
    x = gt[0] + px * gt[1] + ln * gt[2]
    y = gt[3] + px * gt[4] + ln * gt[5]
    return x, y


def gt_invert(gt) -> tuple[float, float, float, float, float, float]:
    """Inverse affine (``GDALInvGeoTransform``)."""
    det = gt[1] * gt[5] - gt[2] * gt[4]
    if det == 0.0:
        raise ValueError("non-invertible geotransform")
    inv1 = gt[5] / det
    inv2 = -gt[2] / det
    inv4 = -gt[4] / det
    inv5 = gt[1] / det
    inv0 = -gt[0] * inv1 - gt[3] * inv2
    inv3 = -gt[0] * inv4 - gt[3] * inv5
    return (inv0, inv1, inv2, inv3, inv4, inv5)


# ---------------------------------------------------------------------------
# Warp resampling (same-CRS or caller-supplied coordinate transform)
# ---------------------------------------------------------------------------

def warp_tile(
    src: np.ndarray,
    src_gt,
    dst_shape: tuple[int, int],
    dst_gt,
    alg: str = "nearest",
    dtype: str | None = None,
    transform=None,
    nodata: float | None = None,
    src_origin: tuple[int, int] = (0, 0),
    src_full_shape: tuple[int, int] | None = None,
) -> np.ndarray:
    """Resample one dst tile from a src array (or a src *window*).

    ``transform(x, y) -> (x', y')`` maps dst-CRS georef coords to src-CRS
    georef coords (identity if None) — the analog of the GenImgProj pipeline
    (``core/alg/gdaltransformer.cpp:1070``): dst px -> dst georef ->
    [reproject] -> src georef -> src px.

    Windowed mode (the distributed path): ``src`` holds only the rows/cols
    ``src_origin .. src_origin + src.shape`` of a raster whose full size is
    ``src_full_shape``; ``src_gt`` stays the FULL raster's geotransform.
    All pixel indices are computed and floored in *global* coordinates and
    only then shifted by the (integer) origin, so windowed results are
    bit-identical to full-array results.
    """
    h, w = dst_shape
    jj, ii = np.meshgrid(
        np.arange(h, dtype=np.float64), np.arange(w, dtype=np.float64), indexing="ij"
    )
    # dst pixel centers (+0.5) -> dst georef
    gx, gy = gt_apply(dst_gt, ii + 0.5, jj + 0.5)
    if transform is not None:
        gx, gy = transform(gx, gy)
    inv = gt_invert(src_gt)
    sx, sy = gt_apply(inv, gx, gy)  # fractional GLOBAL src pixel coords

    ox, oy = src_origin
    win_h, win_w = src.shape
    sh, sw = src_full_shape or (oy + win_h, ox + win_w)
    srcf = src.astype(np.float64)

    def fetch(iy_glob: np.ndarray, ix_glob: np.ndarray) -> np.ndarray:
        """Window access by global index (clipped for memory safety; callers
        zero the weight/validity of any clipped tap)."""
        ly = np.clip(iy_glob - oy, 0, win_h - 1)
        lx = np.clip(ix_glob - ox, 0, win_w - 1)
        return srcf[ly, lx]

    if alg == "nearest":
        ix = np.floor(sx + 1e-10).astype(np.int64)
        iy = np.floor(sy + 1e-10).astype(np.int64)
        valid = (ix >= 0) & (ix < sw) & (iy >= 0) & (iy < sh)
        out = np.full(dst_shape, np.nan if nodata is None else nodata, dtype=np.float64)
        out[valid] = fetch(iy[valid], ix[valid])
        return clamp_round(out, dtype or str(src.dtype))

    weight_fn, radius = KERNELS[alg]
    # Kernel is centered at srcX − 0.5 (pixel-center coordinates).
    cx = sx - 0.5
    cy = sy - 0.5
    ix0 = np.floor(cx).astype(np.int64)
    iy0 = np.floor(cy).astype(np.int64)

    acc = np.zeros(dst_shape, dtype=np.float64)
    wacc = np.zeros(dst_shape, dtype=np.float64)
    for dy in range(-radius + 1, radius + 1):
        py = iy0 + dy
        wy = weight_fn(py.astype(np.float64) - cy)
        y_ok = (py >= 0) & (py < sh)
        for dx in range(-radius + 1, radius + 1):
            px = ix0 + dx
            wx = weight_fn(px.astype(np.float64) - cx)
            ok = y_ok & (px >= 0) & (px < sw)
            vals = fetch(py, px)
            if nodata is not None:
                ok = ok & (vals != nodata)
            wgt = np.where(ok, wy * wx, 0.0)
            acc += wgt * vals
            wacc += wgt
    out = np.where(wacc > 0, acc / np.where(wacc == 0, 1.0, wacc), np.nan)
    if nodata is not None:
        out = np.where(wacc > 0, out, nodata)
    return clamp_round(out, dtype or str(src.dtype))


AGG_ALGS = ("average", "minimum", "maximum", "median", "q1", "q3", "mode",
            "sum", "rms")


def warp_tile_stat(
    src: np.ndarray,
    src_gt,
    dst_shape: tuple[int, int],
    dst_gt,
    stat: str,
    dtype: str | None = None,
    transform=None,
    nodata: float | None = None,
    src_origin: tuple[int, int] = (0, 0),
    src_full_shape: tuple[int, int] | None = None,
) -> np.ndarray:
    """Aggregate warp (``GWKAverageOrMode``, ``gdalwarpkernel.cpp:5696``):
    each dst pixel aggregates all src pixels inside its transformed
    footprint box (dst pixel corners -> src coords; box
    ``[floor(min+1e-10), ceil(max-1e-10))``, never empty).

    Tie-breaks documented here (the reference's depend on scan order):
    median/q1/q3 take the element at index ``floor(q * (n-1))`` of the
    sorted population; mode takes the smallest value among the most
    frequent. ``sum`` is sum-preserving (``GWKSumPreserving``): source
    pixels are weighted by the fraction covered by the exact dst
    footprint box, weights quantized to 1/4096 for order-independent
    exact summation. Windowed mode mirrors ``warp_tile``.
    """
    h, w = dst_shape
    jj, ii = np.meshgrid(
        np.arange(h, dtype=np.float64), np.arange(w, dtype=np.float64),
        indexing="ij",
    )

    def to_src(px, py):
        gx, gy = gt_apply(dst_gt, px, py)
        if transform is not None:
            gx, gy = transform(gx, gy)
        inv = gt_invert(src_gt)
        return gt_apply(inv, gx, gy)

    sxa, sya = to_src(ii, jj)
    sxb, syb = to_src(ii + 1.0, jj + 1.0)

    ox, oy = src_origin
    win_h, win_w = src.shape
    sh, sw = src_full_shape or (oy + win_h, ox + win_w)
    srcf = src.astype(np.float64)

    xlo = np.floor(np.minimum(sxa, sxb) + 1e-10).astype(np.int64)
    xhi = np.ceil(np.maximum(sxa, sxb) - 1e-10).astype(np.int64)
    ylo = np.floor(np.minimum(sya, syb) + 1e-10).astype(np.int64)
    yhi = np.ceil(np.maximum(sya, syb) - 1e-10).astype(np.int64)
    xhi = np.maximum(xhi, xlo + 1)
    yhi = np.maximum(yhi, ylo + 1)

    max_bw = int((xhi - xlo).max())
    max_bh = int((yhi - ylo).max())
    need_w = stat == "sum"
    if need_w:
        bxlo, bxhi = np.minimum(sxa, sxb), np.maximum(sxa, sxb)
        bylo, byhi = np.minimum(sya, syb), np.maximum(sya, syb)
        wplanes = []
    planes = []
    for dy in range(max_bh):
        py = ylo + dy
        y_ok = (py < yhi) & (py >= 0) & (py < sh)
        for dx in range(max_bw):
            px = xlo + dx
            ok = y_ok & (px < xhi) & (px >= 0) & (px < sw)
            ly = np.clip(py - oy, 0, win_h - 1)
            lx = np.clip(px - ox, 0, win_w - 1)
            vals = srcf[ly, lx]
            if nodata is not None:
                ok = ok & (vals != nodata)
            planes.append(np.where(ok, vals, np.nan))
            if need_w:
                pxf, pyf = px.astype(np.float64), py.astype(np.float64)
                wx = np.clip(np.minimum(pxf + 1.0, bxhi)
                             - np.maximum(pxf, bxlo), 0.0, 1.0)
                wy = np.clip(np.minimum(pyf + 1.0, byhi)
                             - np.maximum(pyf, bylo), 0.0, 1.0)
                # quantize to 1/4096 so each term v*w is an exact dyadic
                # rational: the weighted sum is then order-independent and
                # the DuckDB oracle reproduces it bit-for-bit
                w = np.floor(wx * wy * 4096.0 + 0.5) / 4096.0
                wplanes.append(np.where(ok, w, 0.0))
    pop = np.stack(planes)  # (offsets, h, w)
    cnt = (~np.isnan(pop)).sum(axis=0)
    empty = cnt == 0
    fill = np.nan if nodata is None else nodata
    with np.errstate(all="ignore"):
        if stat == "average":
            out = np.nansum(pop, axis=0) / np.maximum(cnt, 1)
        elif stat == "minimum":
            out = np.nanmin(np.where(np.isnan(pop), np.inf, pop), axis=0)
        elif stat == "maximum":
            out = np.nanmax(np.where(np.isnan(pop), -np.inf, pop), axis=0)
        elif stat in ("median", "q1", "q3"):
            q = {"median": 0.5, "q1": 0.25, "q3": 0.75}[stat]
            srt = np.sort(pop, axis=0)  # NaNs sort last
            idx = np.floor(q * (np.maximum(cnt, 1) - 1)).astype(np.int64)
            out = np.take_along_axis(srt, idx[None, :, :], axis=0)[0]
        elif stat == "sum":
            # GRA_Sum (``gdalwarpkernel.cpp`` GWKSumPreserving): each src
            # pixel contributes weighted by the fraction of it covered by
            # the dst footprint box, so the resample preserves totals on
            # non-integer box edges (dst footprints tile the plane, so
            # every src pixel's weights sum to 1 across dst pixels).
            out = (np.nan_to_num(pop) * np.stack(wplanes)).sum(axis=0)
        elif stat == "rms":
            # GRA_RMS (``gdalwarpkernel.cpp`` GWKAverageOrMode RMS branch):
            # sqrt of the mean of squares over the box population.
            out = np.sqrt(np.nansum(pop * pop, axis=0) / np.maximum(cnt, 1))
        elif stat == "mode":
            srt = np.sort(pop, axis=0)
            out = np.full(dst_shape, np.nan)
            best = np.zeros(dst_shape, dtype=np.int64)
            run_val = np.full(dst_shape, np.nan)
            run_len = np.zeros(dst_shape, dtype=np.int64)
            for k in range(pop.shape[0]):
                v = srt[k]
                cont = v == run_val
                run_len = np.where(cont, run_len + 1, 1)
                run_val = v
                take = (~np.isnan(v)) & (run_len > best)
                best = np.where(take, run_len, best)
                out = np.where(take, v, out)
        else:
            raise ValueError(f"unknown stat {stat}")
    out = np.where(empty, fill, out)
    return clamp_round(out, dtype or str(src.dtype))


# ---------------------------------------------------------------------------
# Overview (pyramid) kernels — ``core/gcore/overview.cpp``
# ---------------------------------------------------------------------------

def _window_edges(dst_n: int, ratio: float, src_n: int) -> tuple[np.ndarray, np.ndarray]:
    i = np.arange(dst_n + 1, dtype=np.float64)
    lo = (i[:-1] * ratio + 1e-8).astype(np.int64)
    hi = np.ceil(i[1:] * ratio - 1e-8).astype(np.int64)
    hi = np.maximum(hi, lo + 1)
    return np.clip(lo, 0, src_n), np.clip(hi, 0, src_n)


def overview_average(
    src: np.ndarray, dst_shape: tuple[int, int], nodata: float | None = None
) -> np.ndarray:
    """AVERAGE overview: box-average with GDAL's window math + int rounding."""
    sh, sw = src.shape
    dh, dw = dst_shape
    xlo, xhi = _window_edges(dw, sw / dw, sw)
    ylo, yhi = _window_edges(dh, sh / dh, sh)
    is_int = np.issubdtype(src.dtype, np.integer)
    # Summed-area table makes every dst pixel O(1) regardless of box size.
    srcf = src.astype(np.float64)
    mask = np.ones_like(srcf) if nodata is None else (srcf != nodata).astype(np.float64)
    vals = np.where(mask > 0, srcf, 0.0)
    sat = np.zeros((sh + 1, sw + 1))
    satm = np.zeros((sh + 1, sw + 1))
    np.cumsum(np.cumsum(vals, axis=0), axis=1, out=sat[1:, 1:])
    np.cumsum(np.cumsum(mask, axis=0), axis=1, out=satm[1:, 1:])

    def box(s, y0, y1, x0, x1):
        return s[y1[:, None], x1[None, :]] - s[y0[:, None], x1[None, :]] - s[
            y1[:, None], x0[None, :]
        ] + s[y0[:, None], x0[None, :]]

    total = box(sat, ylo, yhi, xlo, xhi)
    count = box(satm, ylo, yhi, xlo, xhi)
    safe = np.maximum(count, 1.0)
    if is_int:
        # (total + count/2) // count with integer semantics
        out = np.floor((total + np.floor(safe / 2.0)) / safe)
    else:
        out = total / safe
    if nodata is not None:
        out = np.where(count > 0, out, nodata)
    return out.astype(src.dtype)


def overview_rms(
    src: np.ndarray, dst_shape: tuple[int, int], nodata: float | None = None
) -> np.ndarray:
    """RMS overview (``overview.cpp`` "RMS" path, GDAL >= 3.3):
    ``sqrt(mean(v^2))`` over the same source window as AVERAGE; integer
    types round half-up ``floor(rms + 0.5)`` (documented rule; matches the
    reference's QuadraticMean rounding for real dtypes)."""
    sh, sw = src.shape
    dh, dw = dst_shape
    xlo, xhi = _window_edges(dw, sw / dw, sw)
    ylo, yhi = _window_edges(dh, sh / dh, sh)
    srcf = src.astype(np.float64)
    mask = np.ones_like(srcf) if nodata is None else (srcf != nodata).astype(np.float64)
    vals2 = np.where(mask > 0, srcf * srcf, 0.0)
    sat = np.zeros((sh + 1, sw + 1))
    satm = np.zeros((sh + 1, sw + 1))
    np.cumsum(np.cumsum(vals2, axis=0), axis=1, out=sat[1:, 1:])
    np.cumsum(np.cumsum(mask, axis=0), axis=1, out=satm[1:, 1:])

    def box(s, y0, y1, x0, x1):
        return s[y1[:, None], x1[None, :]] - s[y0[:, None], x1[None, :]] - s[
            y1[:, None], x0[None, :]
        ] + s[y0[:, None], x0[None, :]]

    total2 = box(sat, ylo, yhi, xlo, xhi)
    count = box(satm, ylo, yhi, xlo, xhi)
    out = np.sqrt(total2 / np.maximum(count, 1.0))
    if np.issubdtype(src.dtype, np.integer):
        out = np.floor(out + 0.5)
    if nodata is not None:
        out = np.where(count > 0, out, nodata)
    return out.astype(src.dtype)


def overview_gauss(src: np.ndarray, dst_shape: tuple[int, int],
                   nodata: float | None = None) -> np.ndarray:
    """GAUSS overview (``overview.cpp`` Gauss path, 2:1): 3x3 kernel
    [1 2 1; 2 4 2; 1 2 1] centered on the top-left pixel of each 2x2 block;
    weights of out-of-raster / nodata samples drop out of the normalizer;
    integer types round half-up on the weighted mean."""
    sh, sw = src.shape
    dh, dw = dst_shape
    srcf = src.astype(np.float64)
    valid = np.ones((sh, sw)) if nodata is None else (srcf != nodata)
    k = np.array([[1.0, 2.0, 1.0], [2.0, 4.0, 2.0], [1.0, 2.0, 1.0]])
    acc = np.zeros(dst_shape)
    wacc = np.zeros(dst_shape)
    cy = np.minimum(np.arange(dh) * (sh // dh), sh - 1)
    cx = np.minimum(np.arange(dw) * (sw // dw), sw - 1)
    for dy in (-1, 0, 1):
        yy = cy[:, None] + dy
        y_ok = (yy >= 0) & (yy < sh)
        yc = np.clip(yy, 0, sh - 1)
        for dx in (-1, 0, 1):
            xx = cx[None, :] + dx
            ok = y_ok & (xx >= 0) & (xx < sw)
            xc = np.clip(xx, 0, sw - 1)
            w = k[dy + 1, dx + 1]
            vv = srcf[yc, xc]
            m = ok & (valid[yc, xc] > 0)
            acc += np.where(m, w * vv, 0.0)
            wacc += np.where(m, w, 0.0)
    is_int = np.issubdtype(src.dtype, np.integer)
    safe = np.maximum(wacc, 1.0)
    if is_int:
        out = np.floor((acc + np.floor(safe / 2.0)) / safe)
    else:
        out = acc / safe
    if nodata is not None:
        out = np.where(wacc > 0, out, nodata)
    return out.astype(src.dtype)


def overview_mode(src: np.ndarray, dst_shape: tuple[int, int],
                  nodata: float | None = None) -> np.ndarray:
    """MODE overview (``overview.cpp:1038``): most frequent value in each
    dst pixel's source box; ties take the smallest value (documented rule —
    the reference's depends on hash iteration order)."""
    sh, sw = src.shape
    dh, dw = dst_shape
    xlo, xhi = _window_edges(dw, sw / dw, sw)
    ylo, yhi = _window_edges(dh, sh / dh, sh)
    srcf = src.astype(np.float64)
    out = np.empty(dst_shape, dtype=np.float64)
    for j in range(dh):
        for i in range(dw):
            box = srcf[ylo[j]:yhi[j], xlo[i]:xhi[i]].ravel()
            if nodata is not None:
                box = box[box != nodata]
            if len(box) == 0:
                out[j, i] = nodata if nodata is not None else 0.0
                continue
            vals, counts = np.unique(box, return_counts=True)
            out[j, i] = vals[np.argmax(counts)]  # unique() is sorted ->
            # argmax picks the smallest among tied maxima
    return out.astype(src.dtype)


def overview_nearest(src: np.ndarray, dst_shape: tuple[int, int]) -> np.ndarray:
    """NEAREST overview decimation (``overview.cpp:99,114``)."""
    sh, sw = src.shape
    dh, dw = dst_shape
    xs = np.minimum((0.5 + np.arange(dw) * (sw / dw)).astype(np.int64), sw - 1)
    ys = np.minimum((0.5 + np.arange(dh) * (sh / dh)).astype(np.int64), sh - 1)
    return src[ys[:, None], xs[None, :]]


def overview_reduce_2x2(children: dict[tuple[int, int], np.ndarray], tile: int,
                        alg: str = "average", dtype: str = "uint8",
                        nodata: float | None = None) -> np.ndarray:
    """Pyramid step: assemble up to 2×2 child tiles, downsample to one tile.

    ``children`` maps (dx, dy) in {0,1}² to child pixel arrays. Missing
    children are nodata-filled. This is the groupBy((z−1, x//2, y//2))
    aggregate of the tile pyramid (SURVEY.md §2.9 overview build).
    """
    fill = nodata if nodata is not None else 0
    mosaic = np.full((2 * tile, 2 * tile), fill, dtype=dtype)
    for (dx, dy), arr in children.items():
        mosaic[dy * tile : (dy + 1) * tile, dx * tile : (dx + 1) * tile] = arr
    if alg == "average":
        return overview_average(mosaic, (tile, tile), nodata=nodata)
    if alg == "rms":
        return overview_rms(mosaic, (tile, tile), nodata=nodata)
    if alg == "gauss":
        return overview_gauss(mosaic, (tile, tile), nodata=nodata)
    if alg == "mode":
        return overview_mode(mosaic, (tile, tile), nodata=nodata)
    return overview_nearest(mosaic, (tile, tile))


def _conv_pass(a: np.ndarray, n_dst: int, ratio: float, kernel, radius: int
               ) -> np.ndarray:
    """One separable convolution pass along the LAST axis with GDAL edge
    renormalization (weights over missing/out-of-range taps drop out and
    the remainder renormalizes — ``overview.cpp:2429`` Convolution)."""
    n_src = a.shape[-1]
    centers = (np.arange(n_dst) + 0.5) * ratio - 0.5  # pixel-center coords
    half = radius * ratio
    lo = np.ceil(centers - half - 1e-9).astype(np.int64)
    ntap = int(np.floor(half * 2 + 1e-9)) + 1
    taps = lo[:, None] + np.arange(ntap)[None, :]
    w = kernel((taps - centers[:, None]) / ratio)
    w[(taps < 0) | (taps >= n_src)] = 0.0
    tt = np.clip(taps, 0, n_src - 1)
    vals = a[..., tt]                      # (..., n_dst, ntap)
    valid = ~np.isnan(vals)
    wfull = np.broadcast_to(w, vals.shape) * valid
    num = np.where(valid, vals, 0.0) * wfull
    ws = wfull.sum(axis=-1)
    with np.errstate(invalid="ignore"):
        out = np.where(ws != 0.0, num.sum(axis=-1) / np.where(ws == 0, 1, ws),
                       np.nan)
    return out


def overview_convolution(src: np.ndarray, dst_shape: tuple[int, int],
                         alg: str = "cubic",
                         nodata: float | None = None) -> np.ndarray:
    """Convolution overview reduce (CUBIC/CUBICSPLINE/LANCZOS resampling in
    gdaladdo — ``core/gcore/overview.cpp:2429`` ``GDALResampleChunk32R_
    Convolution``): the warp kernel family scaled by the decimation ratio,
    separable horizontal-then-vertical passes, edge weights renormalized."""
    kernel, radius = KERNELS[alg]
    sh, sw = src.shape
    dh, dw = dst_shape
    a = np.asarray(src, dtype=np.float64)
    if nodata is not None:
        a = np.where(a == nodata, np.nan, a)
    h = _conv_pass(a, dw, sw / dw, kernel, radius)           # along x
    v = _conv_pass(np.moveaxis(h, 0, -1), dh, sh / dh, kernel, radius)
    out = v.T  # (dw, dh) -> (dh, dw)
    if nodata is not None:
        out = np.where(np.isnan(out), nodata, out)
    return out
