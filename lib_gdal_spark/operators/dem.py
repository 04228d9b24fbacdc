"""DEM focal operators: 3x3 window ops with distributed 1-px halo exchange.

Re-expresses ``apps/gdaldem_lib.cpp`` (hillshade/slope/aspect/TRI/TPI/
roughness, window layout ``ComputeVal`` at ``:183``) for the tiled raster
table (SURVEY.md §2.9 "DEM ops"):

1. **Halo exchange**: every tile emits itself plus eight 1-px edge strips
   keyed by the neighbor tile that needs them — a shuffle of O(perimeter)
   extra bytes, the Spark form of the reference's overlapping scanline
   windows.
2. **groupBy(tile) + applyInPandas**: assemble the (h+2, w+2) padded array
   (NaN outside the raster) and run the vectorized NumPy stencil.
3. Output is a derived-band tile table with the same keys/geotransform.

Window naming matches the reference (gdaldem_lib.cpp):

    a b c
    d e f      ewres = gt1, nsres = gt5 (negative for north-up)
    g h i

Formulas (Horn):
  dzdx = ((c + 2f + i) - (a + 2d + g)) / (8 * ewres)
  dzdy = ((g + 2h + i) - (a + 2b + c)) / (8 * nsres)
  slope_deg  = degrees(atan(z * sqrt(dzdx^2 + dzdy^2) / scale))
  aspect_deg = degrees(atan2(dzdy, -dzdx))  (GDAL azimuth convention applied)
  hillshade  = 1 + 254 * max(cang, 0), cang = sin(alt)cos(slope)
               + cos(alt)sin(slope)cos(az - pi/2 - aspect)
  TRI = mean(|neighbor - e|); TPI = e - mean(neighbors);
  roughness = max(window) - min(window)

Raster-boundary pixels (missing halo) yield NaN, matching the reference's
default edge handling of skipping windows without full data.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lib_gdal_spark.sources.rasters import RASTER_SCHEMA

_STRIP_SCHEMA = (
    "raster_id string, band int, zoom int, tile_x int, tile_y int, "
    "dtype string, tile_w int, tile_h int, "
    "gt0 double, gt1 double, gt2 double, gt3 double, gt4 double, gt5 double, "
    "nodata double, pixels array<double>, "
    "dst_x int, dst_y int, src_dx int, src_dy int, "
    "strip_h int, strip_w int"
)


def _emit_strips(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Tile rows -> (self + 8 neighbor strips) keyed by destination tile."""
    for b in batches:
        rows = []
        for _, r in b.iterrows():
            th, tw = int(r["tile_h"]), int(r["tile_w"])
            arr = np.asarray(r["pixels"], dtype=np.float64).reshape(th, tw)
            base = {k: r[k] for k in (
                "raster_id", "band", "zoom", "tile_x", "tile_y", "dtype",
                "tile_w", "tile_h", "gt0", "gt1", "gt2", "gt3", "gt4", "gt5",
                "nodata",
            )}
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    if dx == 0 and dy == 0:
                        piece = arr
                    else:
                        # dy=+1 sends to the tile BELOW, which needs our
                        # bottom row in its top halo; dx=+1 sends to the
                        # tile RIGHT, which needs our rightmost column.
                        ys = slice(th - 1, th) if dy == 1 else (
                            slice(0, 1) if dy == -1 else slice(0, th))
                        xs = slice(tw - 1, tw) if dx == 1 else (
                            slice(0, 1) if dx == -1 else slice(0, tw))
                        piece = arr[ys, xs]
                    rows.append({
                        **base,
                        "pixels": piece.ravel().tolist(),
                        "dst_x": int(r["tile_x"]) + dx,
                        "dst_y": int(r["tile_y"]) + dy,
                        "src_dx": dx, "src_dy": dy,
                        "strip_h": piece.shape[0], "strip_w": piece.shape[1],
                    })
        yield pd.DataFrame(rows)


def _hs(arr: np.ndarray):
    """The 9 shifted views a..i of the padded array's interior."""
    a = arr[:-2, :-2]; b = arr[:-2, 1:-1]; c = arr[:-2, 2:]
    d = arr[1:-1, :-2]; e = arr[1:-1, 1:-1]; f = arr[1:-1, 2:]
    g = arr[2:, :-2]; h = arr[2:, 1:-1]; i = arr[2:, 2:]
    return a, b, c, d, e, f, g, h, i


def _horn(arr, ewres, nsres):
    a, b, c, d, e, f, g, h, i = _hs(arr)
    dzdx = ((c + 2.0 * f + i) - (a + 2.0 * d + g)) / (8.0 * ewres)
    dzdy = ((g + 2.0 * h + i) - (a + 2.0 * b + c)) / (8.0 * nsres)
    return dzdx, dzdy


def slope_kernel(arr, ewres, nsres, z=1.0, scale=1.0):
    dzdx, dzdy = _horn(arr, ewres, nsres)
    return np.degrees(np.arctan(z * np.sqrt(dzdx**2 + dzdy**2) / scale))


def aspect_kernel(arr, ewres, nsres):
    dzdx, dzdy = _horn(arr, ewres, nsres)
    asp = np.degrees(np.arctan2(dzdy, -dzdx))
    # GDAL maps to compass-like 0..360 (gdaldem_lib.cpp aspect branch)
    out = 90.0 - asp
    out = np.where(out < 0.0, out + 360.0, out)
    out = np.where(out >= 360.0, out - 360.0, out)
    return out


def hillshade_kernel(arr, ewres, nsres, z=1.0, scale=1.0,
                     azimuth=315.0, altitude=45.0):
    dzdx, dzdy = _horn(arr, ewres, nsres)
    slope = np.arctan(z * np.sqrt(dzdx**2 + dzdy**2) / scale)
    aspect = np.arctan2(dzdy, -dzdx)
    az = np.radians(azimuth)
    alt = np.radians(altitude)
    cang = (np.sin(alt) * np.cos(slope)
            + np.cos(alt) * np.sin(slope) * np.cos(az - np.pi / 2.0 - aspect))
    shade = np.where(cang <= 0.0, 1.0, 1.0 + 254.0 * cang)
    return np.floor(shade + 0.5)  # GDAL +0.5-floor rounding


def _grad_ref(arr, ewres, nsres):
    """Reference gradient convention (``apps/gdaldem_lib.cpp:740-751``
    Gradient<HORN>::calc): x/y BEFORE the z/(8*scale) factor, signs as the
    reference keeps them (x positive toward west)."""
    a, b, c, d, e, f, g, h, i = _hs(arr)
    x = ((a + 2.0 * d + g) - (c + 2.0 * f + i)) / ewres
    y = ((g + 2.0 * h + i) - (a + 2.0 * b + c)) / nsres
    return x, y


def aspect_trig_kernel(arr, ewres, nsres, zero_for_flat=False):
    """gdaldem aspect -trigonometric (``GDALAspectAlg`` with
    bAngleAsAzimuth=false): counter-clockwise angle from east, 0..360,
    flat cells -> -9999 (the reference's default nodata) or 0 with
    -zero_for_flat. Note the reference DIVIDES by degrees-to-radians
    rather than multiplying by 180/pi — mirrored here."""
    a, b, c, d, e, f, g, h, i = _hs(arr)
    dx = (c + 2.0 * f + i) - (a + 2.0 * d + g)
    dy = (g + 2.0 * h + i) - (a + 2.0 * b + c)
    asp = np.arctan2(dy, -dx) / (math.pi / 180.0)
    asp = np.where(asp < 0.0, asp + 360.0, asp)
    asp = np.where(asp == 360.0, 0.0, asp)
    flat = (dx == 0.0) & (dy == 0.0)
    return np.where(flat, 0.0 if zero_for_flat else -9999.0, asp)


def slope_percent_kernel(arr, ewres, nsres, z=1.0, scale=1.0):
    """gdaldem slope -p (``gdaldem_lib.cpp`` GDALSlopeHornAlg percent
    branch): ``100 * sqrt(key) / (8 * scale)``."""
    gx, gy = _grad_ref(arr, ewres, nsres)
    key = gx * gx + gy * gy
    return 100 * (np.sqrt(key) / (8.0 * scale))


def slope_zt_kernel(arr, ewres, nsres, z=1.0, scale=1.0, percent=False):
    """gdaldem slope -alg ZevenbergenThorne
    (``GDALSlopeZevenbergenThorneAlg``): 2-tap central differences."""
    a, b, c, d, e, f, g, h, i = _hs(arr)
    dx = (d - f) / ewres
    dy = (h - b) / nsres
    key = dx * dx + dy * dy
    if percent:
        return 100 * (np.sqrt(key) / (2.0 * scale))
    return np.degrees(np.arctan(np.sqrt(key) / (2.0 * scale)))


def aspect_zt_kernel(arr, ewres, nsres):
    """gdaldem aspect -alg ZevenbergenThorne
    (``GDALAspectZevenbergenThorneAlg``), compass azimuth 0..360 like the
    Horn variant above."""
    a, b, c, d, e, f, g, h, i = _hs(arr)
    asp = np.degrees(np.arctan2(h - b, d - f))
    out = 90.0 - asp
    out = np.where(out < 0.0, out + 360.0, out)
    out = np.where(out >= 360.0, out - 360.0, out)
    return out


_INV_SQUARE_OF_HALF_PI = 1.0 / ((math.pi * math.pi) / 4)


def hillshade_combined_kernel(arr, ewres, nsres, z=1.0, scale=1.0,
                              azimuth=315.0, altitude=45.0):
    """gdaldem hillshade -combined (``gdaldem_lib.cpp:1113``
    GDALHillshadeCombinedAlg): oblique shading angle attenuated by slope,
    ``cang = 1 - acos(dot) * atan(sqrt(slope)) * 4/pi^2``."""
    zs = z / (8.0 * scale)
    x, y = _grad_ref(arr, ewres, nsres)
    xx_plus_yy = x * x + y * y
    slope = xx_plus_yy * (zs * zs)
    sin_alt = math.sin(math.radians(altitude))
    cos_az_mul_cos_alt_mul_z = (math.cos(math.radians(azimuth))
                                * math.cos(math.radians(altitude)) * zs)
    sin_az_mul_cos_alt_mul_z = (math.sin(math.radians(azimuth))
                                * math.cos(math.radians(altitude)) * zs)
    cang = np.arccos(
        (sin_alt - (y * cos_az_mul_cos_alt_mul_z
                    - x * sin_az_mul_cos_alt_mul_z))
        / np.sqrt(1 + slope)
    )
    cang = 1 - cang * np.arctan(np.sqrt(slope)) * _INV_SQUARE_OF_HALF_PI
    shade = np.where(cang <= 0.0, 1.0, 1.0 + 254.0 * cang)
    return np.floor(shade + 0.5)


def hillshade_multidirectional_kernel(arr, ewres, nsres, z=1.0, scale=1.0,
                                      altitude=45.0):
    """gdaldem hillshade -multidirectional (``gdaldem_lib.cpp:1208``,
    USGS OF 92-422): four azimuths (225/270/315/360) weighted by
    sin^2(aspect - az), spelled with the reference's exact factored
    constants and clamp order."""
    zs = z / (8.0 * scale)
    cos_alt_mul_z = math.cos(math.radians(altitude)) * zs
    square_z = zs * zs
    sin_alt_127 = 127.0 * math.sin(math.radians(altitude))
    sin_alt_254 = 254.0 * math.sin(math.radians(altitude))
    cos_alt_z_127 = 127.0 * cos_alt_mul_z
    cos225_az_cos_alt_z_127 = (127.0 * math.cos(math.radians(225.0))
                               * cos_alt_mul_z)
    x, y = _grad_ref(arr, ewres, nsres)
    xx = x * x
    yy = y * y
    xx_plus_yy = xx + yy
    val225 = np.maximum(sin_alt_127 + (x - y) * cos225_az_cos_alt_z_127, 0.0)
    val270 = np.maximum(sin_alt_127 - x * cos_alt_z_127, 0.0)
    val315 = np.maximum(sin_alt_127 + (x + y) * cos225_az_cos_alt_z_127, 0.0)
    val360 = np.maximum(sin_alt_127 - y * cos_alt_z_127, 0.0)
    w225 = 0.5 * xx_plus_yy - x * y
    w270 = xx
    w315 = xx_plus_yy - w225
    w360 = yy
    safe = np.where(xx_plus_yy == 0.0, 1.0, xx_plus_yy)
    cang = 1.0 + ((w225 * val225 + w270 * val270
                   + w315 * val315 + w360 * val360) / safe
                  / np.sqrt(1 + square_z * xx_plus_yy))
    flat = 1.0 + sin_alt_254
    shade = np.where(xx_plus_yy == 0.0, flat, cang)
    return np.floor(shade + 0.5)


def _normalize_angle(angle: float, normalizer: float) -> float:
    a = math.fmod(angle, normalizer)
    return a + normalizer if a < 0 else a


def hillshade_igor_kernel(arr, ewres, nsres, z=1.0, scale=1.0,
                          azimuth=315.0):
    """gdaldem hillshade -igor (``gdaldem_lib.cpp:883``
    GDALHillshadeIgorAlg): shadowness = 1 - slopeStrength * aspectStrength,
    255-scaled; aspect measured WITHOUT the res division, slope WITH it."""
    zs = z / (8.0 * scale)
    a, b, c, d, e, f, g, h, i = _hs(arr)
    dx = ((a + 2.0 * d + g) - (c + 2.0 * f + i)) / ewres
    dy = ((g + 2.0 * h + i) - (a + 2.0 * b + c)) / nsres
    slope_degrees = np.degrees(np.arctan(np.sqrt(dx * dx + dy * dy) * zs))
    dx2 = (c + 2.0 * f + i) - (a + 2.0 * d + g)
    dy2 = (g + 2.0 * h + i) - (a + 2.0 * b + c)
    aspect = np.arctan2(dy2, -dx2)
    slope_strength = slope_degrees / 90.0
    two_pi = math.pi * 2
    target = _normalize_angle(math.pi * 3 / 2 - math.radians(azimuth), two_pi)
    norm_aspect = np.fmod(aspect, two_pi)
    norm_aspect = np.where(norm_aspect < 0, norm_aspect + two_pi, norm_aspect)
    diff = np.abs(norm_aspect - target)
    diff = np.where(diff > math.pi, two_pi - diff, diff)
    aspect_strength = 1.0 - diff / math.pi
    shadowness = 1.0 - slope_strength * aspect_strength
    return np.floor(255.0 * shadowness + 0.5)


def tri_kernel(arr, ewres, nsres):
    a, b, c, d, e, f, g, h, i = _hs(arr)
    s = sum(np.abs(x - e) for x in (a, b, c, d, f, g, h, i))
    return s / 8.0


def tpi_kernel(arr, ewres, nsres):
    a, b, c, d, e, f, g, h, i = _hs(arr)
    return e - (a + b + c + d + f + g + h + i) / 8.0


def roughness_kernel(arr, ewres, nsres):
    win = np.stack(_hs(arr))
    return win.max(axis=0) - win.min(axis=0)


def _zt_quadric(arr, ewres, nsres):
    """Zevenbergen & Thorne 1987 partial-quadric coefficients on the
    3x3 window, generalized to anisotropic cell sizes (ewres, nsres).
    Letters follow _hs: b=N, d=W, e=center, f=E, h=S."""
    a, b, c, d, e, f, g, h, i = _hs(arr)
    dd = ((d + f) / 2.0 - e) / (ewres * ewres)
    ee = ((b + h) / 2.0 - e) / (nsres * nsres)
    ff = (-a + c + g - i) / (4.0 * ewres * nsres)
    gg = (f - d) / (2.0 * ewres)
    hh = (b - h) / (2.0 * nsres)
    return dd, ee, ff, gg, hh


def curvature_profile_kernel(arr, ewres, nsres):
    """Profile curvature (Zevenbergen & Thorne 1987 eq. 14): the
    surface's curvature along the slope direction — negative where flow
    accelerates (convex), positive where it decelerates (concave).
    Flat cells (zero gradient) report 0."""
    dd, ee, ff, gg, hh = _zt_quadric(arr, ewres, nsres)
    p = gg * gg + hh * hh
    with np.errstate(invalid="ignore", divide="ignore"):
        out = -2.0 * (dd * gg * gg + ee * hh * hh + ff * gg * hh) / p
    return np.where(p == 0.0, 0.0, out)


def curvature_plan_kernel(arr, ewres, nsres):
    """Plan curvature (Zevenbergen & Thorne 1987 eq. 15): curvature of
    the contour line — positive where flow diverges (ridges), negative
    where it converges (channels). Flat cells report 0."""
    dd, ee, ff, gg, hh = _zt_quadric(arr, ewres, nsres)
    p = gg * gg + hh * hh
    with np.errstate(invalid="ignore", divide="ignore"):
        out = 2.0 * (dd * hh * hh + ee * gg * gg - ff * gg * hh) / p
    return np.where(p == 0.0, 0.0, out)


def curvature_total_kernel(arr, ewres, nsres):
    """General/total curvature -2(D + E) (Zevenbergen & Thorne 1987):
    the Laplacian of the fitted quadric — direction-free convexity."""
    dd, ee, _ff, _gg, _hh = _zt_quadric(arr, ewres, nsres)
    return -2.0 * (dd + ee)


def morph_erode_kernel(arr, ewres, nsres, threshold=0.5):
    """Binary 3x3 erosion: 1 where EVERY neighbor (8-conn + center) has
    value >= threshold. NaN (the outside-raster halo) is background, so
    the mask erodes inward at raster edges — the standard convention."""
    m = np.where(np.isnan(arr), 0.0, (arr >= threshold).astype(np.float64))
    return np.stack(_hs(m)).min(axis=0)


def morph_dilate_kernel(arr, ewres, nsres, threshold=0.5):
    """Binary 3x3 dilation: 1 where ANY neighbor has value >= threshold;
    NaN halo counts as background (cannot seed growth from outside)."""
    m = np.where(np.isnan(arr), 0.0, (arr >= threshold).astype(np.float64))
    return np.stack(_hs(m)).max(axis=0)


def flowdir_kernel(arr, ewres, nsres):
    """ESRI D8 flow direction (Jenson & Domingue 1988; the hydrology
    companion of the gdaldem family — the reference stops at slope/
    aspect): steepest descent among the 8 neighbors, drop divided by
    sqrt(2) on diagonals, encoded E=1 SE=2 S=4 SW=8 W=16 NW=32 N=64
    NE=128 with flats and pits (no positive drop) = 0. Ties take the
    LOWEST code (argmax first-occurrence over the ascending code list) —
    a fixed rule instead of ESRI's unspecified one, so the result is
    engine-reproducible."""
    a, b, c, d, e, f, g, h, i = _hs(arr)
    s2 = float(np.sqrt(2.0))
    # (neighbor, code, distance); y grows downward, so h is SOUTH
    nbrs = [(f, 1, 1.0), (i, 2, s2), (h, 4, 1.0), (g, 8, s2),
            (d, 16, 1.0), (a, 32, s2), (b, 64, 1.0), (c, 128, s2)]
    slopes = np.stack([(e - z) / dist for z, _, dist in nbrs])
    best = slopes.max(axis=0)
    codes = np.array([c0 for _, c0, _ in nbrs], dtype=np.float64)
    out = codes[slopes.argmax(axis=0)]
    return np.where(best <= 0.0, 0.0, out)


def insolation_kernel(arr, ewres, nsres, z=1.0, scale=1.0,
                      lat=45.0, decl=23.439281, n_steps=12):
    """Daily potential direct-beam insolation index (the r.sun-style
    clear-sky integration, WITHOUT cast shadows — the horizon-shadow
    variant needs a long-range halo like viewshed; this is the
    slope/aspect-only "potential" product GRASS calls mode 1).

    For each of ``n_steps`` hour angles H_t = -pi + (t+0.5)*2pi/n the
    sun's ENU direction at latitude ``lat`` with declination ``decl``
    is E = cos d sin H, N = cos(lat) sin d - sin(lat) cos d cos H,
    U = sin(lat) sin d + cos(lat) cos d cos H (U = cos of the zenith
    angle = sin of solar altitude). Daylight steps (U > 0) contribute
    the hillshade incidence expression with sin(alt) = U:

        cang_t = U cos S + sqrt(1 - U^2) sin S cos(azm_t - A)

    over the Horn slope S and math-convention aspect A, where azm_t =
    atan2(E, N) - pi/2 (hillshade's own azimuth offset). Contributions
    max(0, cang_t) are quantized to int64 nano-units and SUMMED IN
    INTEGERS (order-free, the lm_perplexity contract), then scaled to
    cos-incidence-weighted HOURS: insol = sum * (24/n) / 1e9. Multiply
    by the solar constant and an atmospheric transmittance outside the
    operator for physical W·h/m².
    """
    dzdx, dzdy = _horn(arr, ewres, nsres)
    slope = np.arctan(z * np.sqrt(dzdx**2 + dzdy**2) / scale)
    aspect = np.arctan2(dzdy, -dzdx)
    phi = np.radians(lat)
    d = np.radians(decl)
    acc = np.zeros(slope.shape, dtype=np.int64)
    for t in range(n_steps):
        h = -np.pi + (t + 0.5) * (2.0 * np.pi / n_steps)
        e = np.cos(d) * np.sin(h)
        nn = np.cos(phi) * np.sin(d) - np.sin(phi) * np.cos(d) * np.cos(h)
        u = np.sin(phi) * np.sin(d) + np.cos(phi) * np.cos(d) * np.cos(h)
        if u <= 0.0:
            continue  # sun below the horizon plane: no direct beam
        ct = np.sqrt(1.0 - u * u)
        azm = np.arctan2(e, nn) - np.pi / 2.0
        cang = u * np.cos(slope) + ct * np.sin(slope) * np.cos(azm - aspect)
        q = np.floor(np.maximum(cang, 0.0) * 1e9 + 0.5)
        acc += np.where(np.isfinite(q), q, 0.0).astype(np.int64)
    out = acc.astype(np.float64) * (24.0 / n_steps) / 1e9
    return np.where(np.isnan(slope), np.nan, out)


KERNELS = {
    "slope": slope_kernel,
    "aspect": aspect_kernel,
    "hillshade": hillshade_kernel,
    "aspect_trig": aspect_trig_kernel,
    "slope_percent": slope_percent_kernel,
    "slope_zt": slope_zt_kernel,
    "aspect_zt": aspect_zt_kernel,
    "hillshade_combined": hillshade_combined_kernel,
    "hillshade_multidirectional": hillshade_multidirectional_kernel,
    "hillshade_igor": hillshade_igor_kernel,
    "tri": tri_kernel,
    "tpi": tpi_kernel,
    "roughness": roughness_kernel,
    "flowdir": flowdir_kernel,
    "morph_erode": morph_erode_kernel,
    "morph_dilate": morph_dilate_kernel,
    "curv_profile": curvature_profile_kernel,
    "curv_plan": curvature_plan_kernel,
    "curv_total": curvature_total_kernel,
    "insolation": insolation_kernel,
}


def dem_op(tiles: DataFrame, op: str, **kw) -> DataFrame:
    """Apply a 3x3 DEM kernel over the tile table with halo exchange."""
    kernel = KERNELS[op]

    strips = tiles.mapInPandas(_emit_strips, schema=_STRIP_SCHEMA)

    def assemble(key, pdf: pd.DataFrame) -> pd.DataFrame:
        rid, band, zoom, tx, ty = key
        center = pdf[(pdf["src_dx"] == 0) & (pdf["src_dy"] == 0)]
        if center.empty:
            return pd.DataFrame(
                columns=[c.split()[0] for c in RASTER_SCHEMA.split(", ")]
            )
        crow = center.iloc[0]
        th, tw = int(crow["tile_h"]), int(crow["tile_w"])
        pad = np.full((th + 2, tw + 2), np.nan)
        for _, r in pdf.iterrows():
            sh, sw = int(r["strip_h"]), int(r["strip_w"])
            piece = np.asarray(r["pixels"], dtype=np.float64).reshape(sh, sw)
            dx, dy = int(r["src_dx"]), int(r["src_dy"])
            # piece came FROM tile (tx-dx, ty-dy): a dy=+1 piece is the
            # tile ABOVE's bottom row -> top halo row of this window
            y0 = 0 if dy == 1 else (th + 1 if dy == -1 else 1)
            x0 = 0 if dx == 1 else (tw + 1 if dx == -1 else 1)
            pad[y0 : y0 + sh, x0 : x0 + sw] = piece
        out = kernel(pad, float(crow["gt1"]), float(crow["gt5"]), **kw)
        row = {k: crow[k] for k in (
            "raster_id", "band", "zoom", "tile_x", "tile_y",
            "tile_w", "tile_h", "gt0", "gt1", "gt2", "gt3", "gt4", "gt5",
            "nodata",
        )}
        row["dtype"] = "float64"
        row["pixels"] = out.ravel().tolist()
        return pd.DataFrame([row])

    return strips.groupBy(
        "raster_id", "band", "zoom", F.col("dst_x").alias("tile_x"),
        F.col("dst_y").alias("tile_y"),
    ).applyInPandas(assemble, schema=RASTER_SCHEMA)


def focal_convolution(
    tiles: DataFrame,
    kernel: "np.ndarray",
    normalize: bool = False,
    out_id: str | None = None,
) -> DataFrame:
    """Generic focal kernel filter — the VRT KernelFilteredSource
    (``drivers/raster/vrt/vrtfilters.cpp``): an arbitrary odd-square
    convolution over the tile table with r-pixel halo exchange.

    ``normalize=True`` renormalizes the kernel over in-raster taps at the
    boundary (the VRT normalized option); otherwise missing-halo taps
    propagate NaN like the DEM edge convention.
    """
    k = np.asarray(kernel, dtype=np.float64)
    if k.ndim != 2 or k.shape[0] != k.shape[1] or k.shape[0] % 2 == 0:
        raise ValueError("kernel must be odd-square 2-D")
    r = k.shape[0] // 2

    def emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for _, row_ in b.iterrows():
                th, tw = int(row_["tile_h"]), int(row_["tile_w"])
                arr = np.asarray(row_["pixels"], np.float64).reshape(th, tw)
                base = {kk: row_[kk] for kk in (
                    "raster_id", "band", "zoom", "tile_x", "tile_y", "dtype",
                    "tile_w", "tile_h", "gt0", "gt1", "gt2", "gt3", "gt4",
                    "gt5", "nodata",
                )}
                for dy in (-1, 0, 1):
                    for dx in (-1, 0, 1):
                        ys = (slice(th - r, th) if dy == 1 else
                              slice(0, r) if dy == -1 else slice(0, th))
                        xs = (slice(tw - r, tw) if dx == 1 else
                              slice(0, r) if dx == -1 else slice(0, tw))
                        piece = arr[ys, xs]
                        if piece.size == 0:
                            continue
                        rows.append({
                            **base,
                            "pixels": piece.ravel().tolist(),
                            "dst_x": int(row_["tile_x"]) + dx,
                            "dst_y": int(row_["tile_y"]) + dy,
                            "src_dx": dx, "src_dy": dy,
                            "strip_h": piece.shape[0],
                            "strip_w": piece.shape[1],
                        })
            yield pd.DataFrame(rows)

    strips = tiles.mapInPandas(emit, schema=_STRIP_SCHEMA)

    def assemble(key, pdf: pd.DataFrame) -> pd.DataFrame:
        center = pdf[(pdf["src_dx"] == 0) & (pdf["src_dy"] == 0)]
        if center.empty:
            return pd.DataFrame(
                columns=[c.split()[0] for c in RASTER_SCHEMA.split(", ")]
            )
        crow = center.iloc[0]
        th, tw = int(crow["tile_h"]), int(crow["tile_w"])
        pad = np.full((th + 2 * r, tw + 2 * r), np.nan)
        for _, rr in pdf.iterrows():
            sh, sw = int(rr["strip_h"]), int(rr["strip_w"])
            piece = np.asarray(rr["pixels"], np.float64).reshape(sh, sw)
            dx, dy = int(rr["src_dx"]), int(rr["src_dy"])
            y0 = 0 if dy == 1 else (th + r if dy == -1 else r)
            x0 = 0 if dx == 1 else (tw + r if dx == -1 else r)
            pad[y0:y0 + sh, x0:x0 + sw] = piece
        num = np.zeros((th, tw))
        den = np.zeros((th, tw))
        anynan = np.zeros((th, tw), dtype=bool)
        for i in range(k.shape[0]):
            for j in range(k.shape[1]):
                v = pad[i:i + th, j:j + tw]
                valid = ~np.isnan(v)
                anynan |= ~valid
                num += np.where(valid, v, 0.0) * (k[i, j] * valid)
                den += k[i, j] * valid
        if normalize:
            with np.errstate(invalid="ignore"):
                out = np.where(den != 0, num / np.where(den == 0, 1, den),
                               np.nan)
        else:
            out = np.where(anynan, np.nan, num)
        row = {kk: crow[kk] for kk in (
            "band", "zoom", "tile_x", "tile_y",
            "tile_w", "tile_h", "gt0", "gt1", "gt2", "gt3", "gt4", "gt5",
            "nodata",
        )}
        row["raster_id"] = out_id or crow["raster_id"]
        row["dtype"] = "float64"
        row["pixels"] = out.ravel().tolist()
        return pd.DataFrame([row])

    return strips.groupBy(
        "raster_id", "band", "zoom", F.col("dst_x").alias("tile_x"),
        F.col("dst_y").alias("tile_y"),
    ).applyInPandas(assemble, schema=RASTER_SCHEMA)


def color_relief(
    tiles: DataFrame,
    ramp: list[tuple[float, int, int, int]],
    interpolate: bool = True,
    out_id: str = "color_relief",
) -> DataFrame:
    """gdaldem color-relief (``apps/gdaldem_lib.cpp`` ColorAssociation):
    elevation -> RGB via the breakpoint ramp — piecewise-linear between
    entries (default) or nearest-entry (``interpolate=False``, the
    -exact_color_entry/-nearest_color_entry family). Emits bands 1/2/3.

    No halo needed (pointwise) — one vectorized interp per tile.
    """
    ramp = sorted(ramp)
    ev = np.array([r[0] for r in ramp], dtype=np.float64)
    rgb = np.array([[r[1], r[2], r[3]] for r in ramp], dtype=np.float64)

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for _, r in b.iterrows():
                vals = np.asarray(r["pixels"], np.float64)
                if interpolate:
                    chans = [np.interp(vals, ev, rgb[:, c]) for c in range(3)]
                else:
                    idx = np.clip(np.searchsorted(ev, vals), 0, len(ev) - 1)
                    # nearest entry (ties -> lower, like the reference scan)
                    lo = np.clip(idx - 1, 0, len(ev) - 1)
                    pick = np.where(
                        np.abs(vals - ev[lo]) <= np.abs(ev[idx] - vals),
                        lo, idx,
                    )
                    chans = [rgb[pick, c] for c in range(3)]
                base = {k: r[k] for k in (
                    "zoom", "tile_x", "tile_y", "tile_w", "tile_h",
                    "gt0", "gt1", "gt2", "gt3", "gt4", "gt5", "nodata",
                )}
                for band, ch in enumerate(chans, start=1):
                    row = dict(base)
                    row.update(raster_id=out_id, band=band, dtype="uint8",
                               pixels=np.floor(ch + 0.5).tolist())
                    rows.append(row)
            yield pd.DataFrame(rows)[
                [c.split()[0] for c in RASTER_SCHEMA.split(", ")]
            ]

    return tiles.mapInPandas(work, schema=RASTER_SCHEMA)


# D8 code -> (dx, dy) successor offset, matching flowdir_kernel's order
D8_OFFSETS = {1: (1, 0), 2: (1, 1), 4: (0, 1), 8: (-1, 1),
              16: (-1, 0), 32: (-1, -1), 64: (0, -1), 128: (1, -1)}


def d8_basins(tiles: DataFrame, tile: int = 64,
              lo: int = 1, hi: int = 254,
              max_doublings: int = 16) -> DataFrame:
    """Drainage-basin delineation over the D8 flow raster (the Jenson &
    Domingue 1988 watershed step): every cell is labeled with the id of
    the SINK its steepest-descent path terminates in — pits and flats
    are their own sinks (flat-resolution is out of scope and documented;
    real DEMs pre-fill with fillnodata/sieve), and a path that exits the
    [lo, hi]^2 interior window sinks at its last interior cell.

    Returns (px, py, basin) for every interior cell, basin = sink's
    py * 2^16 + px key.

    Scale shape: the successor function is one row per cell (keys-only);
    the transitive closure runs by POINTER DOUBLING — successor tables
    self-joined log2(max path length) times, each round one equi-join on
    the cell key plus a combinable converged-count, lineage truncated
    per round. 64k cells converge in ~5 doublings on smooth terrain; a
    100 TB tiled DEM runs the identical plan with cell ids spanning
    tiles (the halo exchange already crosses tile seams upstream in
    flowdir).
    """
    fd = dem_op(tiles, "flowdir")
    ex = fd.select(
        "tile_x", "tile_y", "tile_w",
        F.posexplode("pixels").alias("pos", "code"),
    )
    px = (F.col("tile_x") * tile + F.col("pos") % F.col("tile_w"))
    py = (F.col("tile_y") * tile
          + (F.col("pos") / F.col("tile_w")).cast("int"))
    cells = ex.select(
        px.cast("long").alias("px"), py.cast("long").alias("py"),
        F.col("code").cast("int").alias("code"),
    ).where((F.col("px").between(lo, hi)) & (F.col("py").between(lo, hi)))

    dx = F.lit(0)
    dy = F.lit(0)
    for code, (cdx, cdy) in D8_OFFSETS.items():
        dx = F.when(F.col("code") == code, F.lit(cdx)).otherwise(dx)
        dy = F.when(F.col("code") == code, F.lit(cdy)).otherwise(dy)
    tx = F.col("px") + dx
    ty = F.col("py") + dy
    in_win = tx.between(lo, hi) & ty.between(lo, hi)
    key = (F.col("py") * 65536 + F.col("px")).alias("id")
    succ = cells.select(
        key,
        F.when(in_win, ty * 65536 + tx)
        .otherwise(F.col("py") * 65536 + F.col("px")).alias("nxt"),
    ).localCheckpoint()

    cur = succ
    for _ in range(max_doublings):
        nxt2 = (
            cur.alias("a")
            .join(cur.select(F.col("id").alias("nid"),
                             F.col("nxt").alias("n2")).alias("b"),
                  F.col("a.nxt") == F.col("nid"))
            .select(F.col("a.id").alias("id"), F.col("n2").alias("nxt"))
            .localCheckpoint()
        )
        moved = (
            nxt2.alias("x")
            .join(cur.select(F.col("id").alias("id2"),
                             F.col("nxt").alias("old")).alias("y"),
                  F.col("x.id") == F.col("id2"))
            .where(F.col("x.nxt") != F.col("old")).count()
        )
        cur = nxt2
        if moved == 0:
            break
    else:
        raise RuntimeError(
            f"d8_basins did not converge in {max_doublings} doublings")
    return cells.select(
        "px", "py", (F.col("py") * 65536 + F.col("px")).alias("id")
    ).join(cur, "id").select("px", "py", F.col("nxt").alias("basin"))


def _d8_flow_edges(tiles: DataFrame, tile: int, lo: int, hi: int):
    """flowdir -> (cells, edges) for the [lo, hi]^2 interior window.

    cells: (px, py, code); edges: (src, dst) int64 keys (py*2^16 + px)
    for every positive-drop cell whose D8 target stays interior —
    pits/flats (code 0, offset (0,0)) and window exits emit no edge.
    Shared by d8_flow_accumulation and strahler_order (d8_basins keeps
    its own successor table: its sinks SELF-LOOP, which the doubling
    fixpoint needs, while these consumers need terminating paths)."""
    fd = dem_op(tiles, "flowdir")
    ex = fd.select(
        "tile_x", "tile_y", "tile_w",
        F.posexplode("pixels").alias("pos", "code"),
    )
    px = (F.col("tile_x") * tile + F.col("pos") % F.col("tile_w"))
    py = (F.col("tile_y") * tile
          + (F.col("pos") / F.col("tile_w")).cast("int"))
    cells = ex.select(
        px.cast("long").alias("px"), py.cast("long").alias("py"),
        F.col("code").cast("int").alias("code"),
    ).where((F.col("px").between(lo, hi)) & (F.col("py").between(lo, hi)))

    dx = F.lit(0)
    dy = F.lit(0)
    for code, (cdx, cdy) in D8_OFFSETS.items():
        dx = F.when(F.col("code") == code, F.lit(cdx)).otherwise(dx)
        dy = F.when(F.col("code") == code, F.lit(cdy)).otherwise(dy)
    tx = F.col("px") + dx
    ty = F.col("py") + dy
    edges = cells.where(
        ((tx != F.col("px")) | (ty != F.col("py")))
        & tx.between(lo, hi) & ty.between(lo, hi)
    ).select(
        (F.col("py") * 65536 + F.col("px")).alias("src"),
        (ty * 65536 + tx).alias("dst"),
    ).localCheckpoint()
    return cells, edges


def d8_flow_length(tiles: DataFrame, tile: int = 64,
                   lo: int = 1, hi: int = 254,
                   max_doublings: int = 16) -> DataFrame:
    """Downstream D8 flow length (GRASS r.stream.distance / ESRI Flow
    Length DOWNSTREAM): the along-path distance from every cell to the
    terminus of its steepest-descent path (pit/flat or window exit),
    cardinal steps counting 1 cell and diagonals sqrt(2) — the
    hillslope-length input of erosion (LS-factor) and time-of-
    concentration models.

    Exactness: the path folds as two INTEGER step counts (n_card,
    n_diag) — associative, order-free — and the float
    ``n_card + sqrt(2) * n_diag`` is applied ONCE at the end, so the
    result is bit-identical in any engine and at any doubling schedule
    (summing sqrt(2)-weighted floats along the path would depend on the
    doubling tree's fold order; counts cannot).

    Scale shape: pointer doubling exactly like :func:`d8_basins` —
    successor table with self-looping terminals carrying (0, 0) counts,
    log2(longest path) equi-join rounds, lineage truncated per round.
    Returns (px, py, n_card, n_diag, flow_len)."""
    cells, edges = _d8_flow_edges(tiles, tile, lo, hi)
    dxe = F.abs(F.col("dst") % 65536 - F.col("src") % 65536)
    dye = F.abs(
        (F.col("dst") / 65536).cast("long")
        - (F.col("src") / 65536).cast("long"))
    diag = (dxe == 1) & (dye == 1)
    step = edges.select(
        "src", "dst",
        F.when(diag, F.lit(0)).otherwise(F.lit(1)).alias("nc"),
        F.when(diag, F.lit(1)).otherwise(F.lit(0)).alias("nd"),
    )
    ids = cells.select(
        "px", "py", (F.col("py") * 65536 + F.col("px")).alias("id"))
    cur = ids.join(step, ids["id"] == step["src"], "left").select(
        "id",
        F.coalesce("dst", "id").alias("nxt"),
        F.coalesce("nc", F.lit(0)).cast("long").alias("nc"),
        F.coalesce("nd", F.lit(0)).cast("long").alias("nd"),
    ).localCheckpoint()
    for _ in range(max_doublings):
        nxt2 = (
            cur.alias("a")
            .join(cur.select(F.col("id").alias("bid"),
                             F.col("nxt").alias("bnxt"),
                             F.col("nc").alias("bnc"),
                             F.col("nd").alias("bnd")).alias("b"),
                  F.col("a.nxt") == F.col("bid"))
            .select(F.col("a.id").alias("id"),
                    F.col("bnxt").alias("nxt"),
                    (F.col("a.nc") + F.col("bnc")).alias("nc"),
                    (F.col("a.nd") + F.col("bnd")).alias("nd"))
            .localCheckpoint()
        )
        moved = (
            nxt2.alias("x")
            .join(cur.select(F.col("id").alias("id2"),
                             F.col("nxt").alias("old")).alias("y"),
                  F.col("x.id") == F.col("id2"))
            .where(F.col("x.nxt") != F.col("old")).count()
        )
        cur = nxt2
        if moved == 0:
            break
    else:
        raise RuntimeError(
            f"d8_flow_length did not converge in {max_doublings} doublings")
    return ids.join(cur, "id").select(
        "px", "py", F.col("nc").alias("n_card"), F.col("nd").alias("n_diag"),
        F.round(F.col("nc") + math.sqrt(2.0) * F.col("nd"), 9)
        .alias("flow_len"))


# Upstream flow length integer units: cardinal = 1e6, diagonal =
# floor(sqrt(2)*1e6 + 0.5). Max-plus over paths needs ONE totally
# ordered weight, so the (n_card, n_diag) pair trick of d8_flow_length
# cannot apply; this explicit quantization is the documented contract.
FLOWLEN_CARD_UNITS = 1_000_000
FLOWLEN_DIAG_UNITS = 1_414_214


def d8_flow_length_upstream(tiles: DataFrame, tile: int = 64,
                            lo: int = 1, hi: int = 254,
                            max_doublings: int = 16) -> DataFrame:
    """Upstream D8 flow length (r.stream.distance upstream / ESRI Flow
    Length UPSTREAM): per cell, the MAXIMUM along-flow distance from any
    ancestor cell draining through it — the longest-flow-path input of
    time-of-concentration and watershed-shape metrics.

    Max-plus over a path's mixed cardinal/diagonal steps needs one
    totally ordered weight, so steps quantize to exact integer units
    (FLOWLEN_CARD_UNITS / FLOWLEN_DIAG_UNITS — half-up sqrt(2) at 1e-6;
    a documented quantization, unlike d8_flow_length's exact two-count
    fold which max cannot decompose over). All sums and the max are
    exact int64.

    Scale shape: the SAME log-round (pairs, jump) path expansion as
    :func:`d8_flow_accumulation` — the D8 graph is functional, so every
    (ancestor, node) pair materializes exactly once with its unique
    path counts — then one map-side-combinable max groupBy. Returns
    (px, py, upstream_units, upstream_len) with sources at 0."""
    cells, edges = _d8_flow_edges(tiles, tile, lo, hi)
    dxe = F.abs(F.col("dst") % 65536 - F.col("src") % 65536)
    dye = F.abs((F.col("dst") / 65536).cast("long")
                - (F.col("src") / 65536).cast("long"))
    diag = (dxe == 1) & (dye == 1)
    e2 = edges.select(
        "src", "dst",
        F.when(diag, F.lit(0)).otherwise(F.lit(1)).cast("long").alias("nc"),
        F.when(diag, F.lit(1)).otherwise(F.lit(0)).cast("long").alias("nd"),
    ).localCheckpoint()
    pairs = e2
    jump = e2
    for _ in range(max_doublings):
        ext = (
            jump.alias("j")
            .join(pairs.alias("p"), F.col("j.dst") == F.col("p.src"))
            .select(F.col("j.src").alias("src"), F.col("p.dst").alias("dst"),
                    (F.col("j.nc") + F.col("p.nc")).alias("nc"),
                    (F.col("j.nd") + F.col("p.nd")).alias("nd"))
            .localCheckpoint()
        )
        if ext.isEmpty():
            break
        pairs = pairs.unionByName(ext).localCheckpoint()
        jump = (
            jump.alias("a")
            .join(jump.select(F.col("src").alias("mid"),
                              F.col("dst").alias("d2"),
                              F.col("nc").alias("nc2"),
                              F.col("nd").alias("nd2")).alias("b"),
                  F.col("a.dst") == F.col("mid"))
            .select(F.col("a.src").alias("src"), F.col("d2").alias("dst"),
                    (F.col("a.nc") + F.col("nc2")).alias("nc"),
                    (F.col("a.nd") + F.col("nd2")).alias("nd"))
            .localCheckpoint()
        )
    else:
        raise RuntimeError(
            f"d8_flow_length_upstream did not converge in "
            f"{max_doublings} doublings")
    units = (F.col("nc") * FLOWLEN_CARD_UNITS
             + F.col("nd") * FLOWLEN_DIAG_UNITS)
    up = pairs.select("dst", units.alias("u")) \
        .groupBy("dst").agg(F.max("u").alias("upstream_units"))
    return (
        cells.select("px", "py",
                     (F.col("py") * 65536 + F.col("px")).alias("id"))
        .join(up, F.col("id") == F.col("dst"), "left")
        .select("px", "py",
                F.coalesce("upstream_units", F.lit(0)).cast("long")
                .alias("upstream_units"),
                F.round(F.coalesce("upstream_units", F.lit(0))
                        / 1e6, 6).alias("upstream_len"))
    )


def d8_flow_accumulation(tiles: DataFrame, tile: int = 64,
                         lo: int = 1, hi: int = 254,
                         max_doublings: int = 16) -> DataFrame:
    """D8 flow accumulation (Jenson & Domingue 1988; ESRI Flow
    Accumulation semantics): each cell's count of UPSTREAM cells — the
    number of cells whose steepest-descent path passes through it,
    excluding itself. Rivers emerge as high-accumulation lines; the
    composition flowdir -> accumulation -> (threshold) is the standard
    channel-network extraction.

    Flow edges are u -> v for cells with a positive-drop D8 code whose
    target stays inside the [lo, hi]^2 window; pits/flats (code 0) and
    window exits terminate the path. The D8 graph is acyclic (strictly
    decreasing elevation along every edge), so each (ancestor, node)
    pair occurs exactly once and accumulation(v) = |{u : v on path(u)}|.

    Scale shape: LOG-ROUND path expansion instead of per-level peeling
    (which would take O(longest flow path) driver rounds — 10^4+ on a
    continental river). ``pairs_k`` holds every (u, w) with
    dist(u, w) <= 2^k and ``jump_k`` maps u to its 2^k-th successor
    (NULL-saturating); one equi-join per round extends both, so
    log2(max path) rounds total. Intermediate volume is the total path
    length — the inherent cost of exact per-cell counts — but it is
    keys-only (two int64s per row) and each round's join is an
    equi-join on the cell key; lineage is truncated per round. The
    final count is one map-side-combinable groupBy.
    """
    cells, edges = _d8_flow_edges(tiles, tile, lo, hi)

    pairs = edges  # all (ancestor, node) pairs with distance <= 2^k
    jump = edges   # u -> its 2^k-th successor (rows absent once off-path)
    for _ in range(max_doublings):
        ext = (
            jump.alias("j")
            .join(pairs.alias("p"), F.col("j.dst") == F.col("p.src"))
            .select(F.col("j.src").alias("src"), F.col("p.dst").alias("dst"))
            .localCheckpoint()
        )
        n_new = ext.count()
        if n_new == 0:
            break
        pairs = pairs.unionByName(ext).localCheckpoint()
        jump = (
            jump.alias("a")
            .join(jump.select(F.col("src").alias("mid"),
                              F.col("dst").alias("d2")).alias("b"),
                  F.col("a.dst") == F.col("mid"))
            .select(F.col("a.src").alias("src"), F.col("d2").alias("dst"))
            .localCheckpoint()
        )
    else:
        raise RuntimeError(
            f"d8_flow_accumulation did not converge in "
            f"{max_doublings} doublings")
    acc = pairs.groupBy("dst").agg(F.count(F.lit(1)).alias("acc"))
    return (
        cells.select(
            "px", "py", (F.col("py") * 65536 + F.col("px")).alias("id"))
        .join(acc, F.col("id") == F.col("dst"), "left")
        .select("px", "py",
                F.coalesce(F.col("acc"), F.lit(0)).cast("long").alias("acc"))
    )


def _strahler_dp(cell_ids, edge_list, seed_orders=None):
    """Level-synchronous Strahler DP over a bounded flow forest
    (Strahler 1957 numbering): sources are order 1; a cell whose
    upstream maximum m is attained >= 2 times gets m + 1, else m.
    ``seed_orders`` supplies already-known orders for boundary cells
    feeding the residual (the distributed short-circuit contract)."""
    ups: dict = {}
    succ: dict = {}
    for u, v in edge_list:
        ups.setdefault(v, []).append(u)
        succ[u] = v
    order = dict(seed_orders or {})
    pend = {v: len(us) for v, us in ups.items()}
    got: dict = {v: [] for v in ups}
    frontier = []
    for c in cell_ids:
        if c not in ups and c not in order:
            order[c] = 1
            frontier.append(c)
    # seeded boundary cells act as already-emitted frontier members
    for c in list(order):
        if c in succ:
            frontier.append(c)
    seen_emit = set()
    while frontier:
        nxt = []
        for u in frontier:
            v = succ.get(u)
            if v is None or u in seen_emit:
                continue
            seen_emit.add(u)
            got[v].append(order[u])
            pend[v] -= 1
            if pend[v] == 0:
                m = max(got[v])
                order[v] = m + (1 if got[v].count(m) >= 2 else 0)
                nxt.append(v)
        frontier = nxt
    return order


def strahler_order(tiles: DataFrame, tile: int = 64,
                   lo: int = 1, hi: int = 254,
                   max_rounds: int = 10_000,
                   driver_threshold: int = 2_000_000) -> DataFrame:
    """Strahler stream order (Strahler 1957) over the D8 flow raster —
    the stream-network hierarchy step after flowdir/accumulation:
    sources (no upstream cell) are order 1; where two or more upstream
    branches of equal maximal order m meet, the downstream cell becomes
    m + 1, otherwise it keeps m. Returns (px, py, strahler) for every
    interior cell.

    Strahler is an inherently bottom-up tree DP (a cell needs ALL its
    upstream orders before its own), so the distributed form is
    LEVEL-SYNCHRONOUS PEELING: each round resolves every cell whose
    upstream set is fully resolved — one equi-join of the edge list
    against the resolved table plus one combinable groupBy per round,
    rounds = forest height. Heights grow with river length, so exactly
    like :func:`~lib_gdal_spark.operators.graph.kcore` the loop
    SHORT-CIRCUITS: once the unresolved residual fits
    ``driver_threshold`` rows it is collected (edges + the boundary
    orders feeding it) and finished by the exact in-memory DP — the
    distributed rounds only ever run while the frontier is genuinely
    large, and ``max_rounds`` bounds rounds-at-scale, not correctness.
    """
    cells, edges = _d8_flow_edges(tiles, tile, lo, hi)
    ids = cells.select(
        "px", "py", (F.col("py") * 65536 + F.col("px")).alias("id")
    ).localCheckpoint()
    spark = tiles.sparkSession

    def _attach(order: dict) -> DataFrame:
        odf = spark.createDataFrame(
            list(order.items()), "id long, strahler long")
        return ids.join(odf, "id").select("px", "py", "strahler")

    if edges.count() <= driver_threshold:
        order = _strahler_dp([r["id"] for r in ids.collect()],
                             [(r["src"], r["dst"]) for r in edges.collect()])
        return _attach(order)

    indeg = edges.groupBy("dst").agg(F.count(F.lit(1)).alias("n_up")) \
                 .select(F.col("dst").alias("id"), "n_up").localCheckpoint()
    resolved = (
        ids.join(indeg, "id", "left_anti")
        .select("id", F.lit(1).cast("long").alias("ord"))
        .localCheckpoint()
    )
    for _ in range(max_rounds):
        n_unres = ids.join(resolved, "id", "left_anti").count()
        if n_unres == 0:
            break
        if n_unres <= driver_threshold:
            unres = ids.join(resolved, "id", "left_anti").select("id")
            res_e = edges.join(
                unres.withColumnRenamed("id", "dst"), "dst")
            seed = (res_e.select(F.col("src").alias("id")).distinct()
                    .join(resolved, "id"))
            order = _strahler_dp(
                [r["id"] for r in unres.collect()],
                [(r["src"], r["dst"]) for r in res_e.collect()],
                {r["id"]: r["ord"] for r in seed.collect()})
            full = resolved.unionByName(spark.createDataFrame(
                list(order.items()), "id long, ord long"))
            return ids.join(
                full.withColumnRenamed("ord", "strahler").dropDuplicates(
                    ["id"]), "id").select("px", "py", "strahler")
        j = (
            edges.join(resolved.withColumnRenamed("id", "src"), "src")
            .join(resolved.select(F.col("id").alias("dst")),
                  "dst", "left_anti")
            .join(indeg.withColumnRenamed("id", "dst"), "dst")
        )
        cand = (
            j.groupBy("dst")
            .agg(F.count(F.lit(1)).alias("n_res"),
                 F.first("n_up").alias("n_up"),
                 F.collect_list("ord").alias("os"))
            .where(F.col("n_res") == F.col("n_up"))
            .select(
                F.col("dst").alias("id"),
                (F.array_max("os")
                 + F.when(
                     F.size(F.filter(
                         "os",
                         lambda x: x == F.array_max(F.col("os")))) >= 2,
                     1).otherwise(0)).cast("long").alias("ord"))
        )
        resolved = resolved.unionByName(cand).localCheckpoint()
    else:
        raise RuntimeError(
            f"strahler_order did not converge in {max_rounds} rounds")
    return ids.join(resolved.withColumnRenamed("ord", "strahler"), "id") \
              .select("px", "py", "strahler")


def dem_twi(tiles: DataFrame, tile: int = 64,
            lo: int = 1, hi: int = 254,
            flow_lo: int = 1, flow_hi: int = 126,
            min_tan: float = 0.001) -> DataFrame:
    """Topographic wetness index (Beven & Kirkby 1979):
    ``TWI = ln((acc + 1) / max(tan(slope), min_tan))`` per cell — the
    standard saturation-propensity composite of the two hydrology
    rasters this module already computes. ``acc + 1`` stands in for the
    specific catchment area in unit cells (the per-meter scaling is a
    constant offset in log space); ``min_tan`` clamps flats the way
    every TWI implementation does (tan 0 would blow up).

    Distributed shape: pure composition — Horn slope (3x3 halo
    exchange, :func:`dem_op`) joined to D8 flow accumulation
    (:func:`d8_flow_accumulation`, log-round jump table) on the cell
    key, then one JVM-side ln/tan projection; no new shuffle beyond
    the two operands' own. Window [flow_lo, flow_hi]^2 is the flow
    window (its interior contract is tighter than slope's).
    """
    acc = d8_flow_accumulation(tiles, tile=tile, lo=flow_lo, hi=flow_hi)
    sl = dem_op(tiles, "slope")
    ex = sl.select(
        "tile_x", "tile_y", "tile_w",
        F.posexplode("pixels").alias("pos", "slope_deg"),
    )
    px = (F.col("tile_x") * tile + F.col("pos") % F.col("tile_w"))
    py = (F.col("tile_y") * tile
          + (F.col("pos") / F.col("tile_w")).cast("int"))
    sl_px = ex.select(
        px.cast("long").alias("px"), py.cast("long").alias("py"),
        "slope_deg",
    ).where(F.col("px").between(flow_lo, flow_hi)
            & F.col("py").between(flow_lo, flow_hi))
    return (
        sl_px.join(acc, ["px", "py"])
        .select(
            "px", "py",
            F.log(
                (F.col("acc") + F.lit(1.0))
                / F.greatest(F.tan(F.radians("slope_deg")),
                             F.lit(float(min_tan)))
            ).alias("twi"),
        )
    )


def morphology(tiles: DataFrame, op: str, threshold: float = 0.5) -> DataFrame:
    """Binary mathematical morphology over the tile table: ``erode`` /
    ``dilate`` (one 3x3 halo-exchange round) and their compositions
    ``open`` = dilate(erode) / ``close`` = erode(dilate) (two rounds —
    each stage is a full dem_op, so tiles stay distributed and only
    1-pixel strips move between rounds). The input is binarized at
    ``threshold``; stage two re-binarizes at 0.5 since stage one's
    output is already a 0/1 raster. Output values are 0.0 / 1.0.

    Opening removes speckle smaller than the structuring element,
    closing fills pin-holes — the standard mask-cleanup pair for
    rasterized footprints / validity masks (cheaper than sieve when the
    size criterion is 'fits the 3x3 element', not an area threshold).
    """
    if op == "erode":
        return dem_op(tiles, "morph_erode", threshold=threshold)
    if op == "dilate":
        return dem_op(tiles, "morph_dilate", threshold=threshold)
    if op == "open":
        er = dem_op(tiles, "morph_erode", threshold=threshold)
        return dem_op(er, "morph_dilate", threshold=0.5)
    if op == "close":
        di = dem_op(tiles, "morph_dilate", threshold=threshold)
        return dem_op(di, "morph_erode", threshold=0.5)
    raise ValueError(f"unknown morphology op {op!r}")


def _emit_strips_k(k: int):
    """Like :func:`_emit_strips` but with ``k``-pixel-wide edge strips
    and k x k corners — the halo for kernels that look k pixels out."""

    def emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for _, r in b.iterrows():
                th, tw = int(r["tile_h"]), int(r["tile_w"])
                arr = np.asarray(r["pixels"], dtype=np.float64).reshape(
                    th, tw)
                kh, kw = min(k, th), min(k, tw)
                base = {kk: r[kk] for kk in (
                    "raster_id", "band", "zoom", "tile_x", "tile_y",
                    "dtype", "tile_w", "tile_h", "gt0", "gt1", "gt2",
                    "gt3", "gt4", "gt5", "nodata",
                )}
                for dy in (-1, 0, 1):
                    for dx in (-1, 0, 1):
                        if dx == 0 and dy == 0:
                            piece = arr
                        else:
                            ys = slice(th - kh, th) if dy == 1 else (
                                slice(0, kh) if dy == -1 else slice(0, th))
                            xs = slice(tw - kw, tw) if dx == 1 else (
                                slice(0, kw) if dx == -1 else slice(0, tw))
                            piece = arr[ys, xs]
                        rows.append({
                            **base,
                            "pixels": piece.ravel().tolist(),
                            "dst_x": int(r["tile_x"]) + dx,
                            "dst_y": int(r["tile_y"]) + dy,
                            "src_dx": dx, "src_dy": dy,
                            "strip_h": piece.shape[0],
                            "strip_w": piece.shape[1],
                        })
            yield pd.DataFrame(rows)

    return emit


def dem_op_k(tiles: DataFrame, k: int, kernel, **kw) -> DataFrame:
    """Generalized :func:`dem_op`: a k-pixel halo exchange feeding a
    kernel ``kernel(pad, k, ewres, nsres, **kw)`` over the
    (th+2k, tw+2k) padded array (NaN outside the raster). Shuffle volume
    is O(k * perimeter) per tile — still strips, never whole rasters."""
    strips = tiles.mapInPandas(_emit_strips_k(k), schema=_STRIP_SCHEMA)

    def assemble(key, pdf: pd.DataFrame) -> pd.DataFrame:
        center = pdf[(pdf["src_dx"] == 0) & (pdf["src_dy"] == 0)]
        if center.empty:
            return pd.DataFrame(
                columns=[c.split()[0] for c in RASTER_SCHEMA.split(", ")])
        crow = center.iloc[0]
        th, tw = int(crow["tile_h"]), int(crow["tile_w"])
        pad = np.full((th + 2 * k, tw + 2 * k), np.nan)
        for _, r in pdf.iterrows():
            sh, sw = int(r["strip_h"]), int(r["strip_w"])
            piece = np.asarray(r["pixels"], dtype=np.float64).reshape(sh, sw)
            dx, dy = int(r["src_dx"]), int(r["src_dy"])
            y0 = (k - sh if dy == 1 else (th + k if dy == -1 else k))
            x0 = (k - sw if dx == 1 else (tw + k if dx == -1 else k))
            pad[y0:y0 + sh, x0:x0 + sw] = piece
        out = kernel(pad, k, float(crow["gt1"]), float(crow["gt5"]), **kw)
        row = {kk: crow[kk] for kk in (
            "raster_id", "band", "zoom", "tile_x", "tile_y",
            "tile_w", "tile_h", "gt0", "gt1", "gt2", "gt3", "gt4", "gt5",
            "nodata",
        )}
        row["dtype"] = "float64"
        row["pixels"] = out.ravel().tolist()
        return pd.DataFrame([row])

    return strips.groupBy(
        "raster_id", "band", "zoom", F.col("dst_x").alias("tile_x"),
        F.col("dst_y").alias("tile_y"),
    ).applyInPandas(assemble, schema=RASTER_SCHEMA)


# direction order is the cross-engine contract: the openness sum is a
# LEFT FOLD over exactly this sequence in both NumPy and the SQL oracle
OPENNESS_DIRS = ((1, 0), (-1, 0), (0, 1), (0, -1),
                 (1, 1), (1, -1), (-1, 1), (-1, -1))


def openness_kernel(pad: np.ndarray, k: int, ewres: float, nsres: float,
                    pixel_units: bool = True) -> np.ndarray:
    """Positive topographic openness (Yokoyama, Shirasawa & Pike, PE&RS
    2002): mean over 8 azimuths of (90 deg - the maximum elevation angle
    within radial distance L=k). High values = ridges/plains, low =
    valleys; the standard terrain-texture visualization beside
    hillshade. Distances are in pixels (``pixel_units``, the common
    square-grid form; diagonals scale by sqrt(2)).

    Exactness contract: per direction, the angle maximum is taken on the
    monotone slope ratio (dz / (t * dist), one subtraction and one
    division per sample with precomputed float denominators), atan runs
    ONCE on the max, and the 8 direction values accumulate by left fold
    in OPENNESS_DIRS order — every step reproducible in SQL."""
    th, tw = pad.shape[0] - 2 * k, pad.shape[1] - 2 * k
    z0 = pad[k:k + th, k:k + tw]
    total = None
    sqrt2 = math.sqrt(2.0)
    for dx, dy in OPENNESS_DIRS:
        dist = sqrt2 if (dx != 0 and dy != 0) else 1.0
        mx = None
        for t in range(1, k + 1):
            zs = pad[k + t * dy:k + t * dy + th, k + t * dx:k + t * dx + tw]
            slope = (zs - z0) / (t * dist)
            mx = slope if mx is None else np.maximum(mx, slope)
        o = 90.0 - np.degrees(np.arctan(mx))
        total = o if total is None else total + o
    return total / 8.0


def sky_view_factor_kernel(pad: np.ndarray, k: int, ewres: float,
                           nsres: float) -> np.ndarray:
    """Sky-view factor (Zaksek, Ostir & Kokalj, Remote Sensing 2011):
    the fraction of the sky hemisphere visible from each cell,
    SVF = mean over 8 azimuths of (1 - sin(horizon angle)) with the
    horizon angle clamped at the horizontal (terrain below eye level
    never blocks sky). The relief-visualization standard beside
    hillshade/openness.

    Trig-free exactness: sin(atan(s)) = s / sqrt(1 + s^2), so per
    direction the kernel needs only the slope-ratio maximum (shared with
    :func:`openness_kernel`), one multiply-add, one sqrt, one division —
    every op IEEE correctly-rounded, no libm atan/sin anywhere, making
    the SQL oracle bit-exact by construction rather than by libm luck."""
    th, tw = pad.shape[0] - 2 * k, pad.shape[1] - 2 * k
    z0 = pad[k:k + th, k:k + tw]
    total = None
    sqrt2 = math.sqrt(2.0)
    for dx, dy in OPENNESS_DIRS:
        dist = sqrt2 if (dx != 0 and dy != 0) else 1.0
        mx = None
        for t in range(1, k + 1):
            zs = pad[k + t * dy:k + t * dy + th, k + t * dx:k + t * dx + tw]
            slope = (zs - z0) / (t * dist)
            mx = slope if mx is None else np.maximum(mx, slope)
        s = np.maximum(mx, 0.0)
        term = 1.0 - s / np.sqrt(1.0 + s * s)
        total = term if total is None else total + term
    return total / 8.0


# Geomorphon landform names, 1-based (Jasiewicz & Stepinski,
# Geomorphology 182 (2013) "Geomorphons - a pattern recognition approach
# to classification and mapping of landforms", Fig. 5 / GRASS
# r.geomorphon forms.c): the 10 most common geomorphons.
GEOMORPHON_FORMS = ("flat", "peak", "ridge", "shoulder", "spur",
                    "slope", "hollow", "footslope", "valley", "pit")

# (num_minus, num_plus) -> 1-based form code; 0 marks the impossible
# cells (num_minus + num_plus > 8). Row = count of '-' directions,
# column = count of '+' directions, per the paper's lookup table.
GEOMORPHON_MATRIX = (
    (1, 1, 1, 8, 8, 9, 9, 9, 10),
    (1, 1, 8, 8, 8, 9, 9, 9, 0),
    (1, 4, 6, 6, 7, 7, 9, 0, 0),
    (4, 4, 6, 6, 6, 7, 0, 0, 0),
    (4, 4, 5, 6, 6, 0, 0, 0, 0),
    (3, 3, 5, 5, 0, 0, 0, 0, 0),
    (3, 3, 3, 0, 0, 0, 0, 0, 0),
    (3, 3, 0, 0, 0, 0, 0, 0, 0),
    (2, 0, 0, 0, 0, 0, 0, 0, 0),
)


def geomorphon_kernel(pad: np.ndarray, k: int, ewres: float,
                      nsres: float, flat_deg: float = 1.0) -> np.ndarray:
    """Geomorphon landform classification (Jasiewicz & Stepinski 2013;
    GRASS r.geomorphon): per cell, an 8-direction ternary line-of-sight
    pattern — for each azimuth the zenith/nadir angle pair reduces to
    the SIGN of (max elevation angle + min elevation angle) within
    lookup radius L=k, thresholded at the flatness angle — then the
    (num_minus, num_plus) pair indexes the paper's 9x9 lookup table of
    the 10 most common landform elements (flat, peak, ridge, shoulder,
    spur, slope, hollow, footslope, valley, pit).

    Trig-free exactness: with a = atan(mx), b = atan(mn) both in
    (-90, 90) deg, a + b > flat iff (den > 0 and mx + mn > tan(flat) *
    den) or (den <= 0 and mx > 0), where den = 1 - mx * mn (the tangent
    addition identity; den <= 0 puts |a + b| beyond 90 deg, whose sign
    is mx's sign). Only +, -, *, comparisons — IEEE-exact in any
    engine, no libm atan near a class boundary. Direction counts are
    commutative integer adds, so no fold-order contract is needed.

    Returns packed floats num_minus * 10000 + num_plus * 100 + form
    (all exact small integers); unpack with floor-division/modulo."""
    th, tw = pad.shape[0] - 2 * k, pad.shape[1] - 2 * k
    z0 = pad[k:k + th, k:k + tw]
    f = math.tan(math.radians(flat_deg))
    nplus = np.zeros((th, tw))
    nminus = np.zeros((th, tw))
    sqrt2 = math.sqrt(2.0)
    for dx, dy in OPENNESS_DIRS:
        dist = sqrt2 if (dx != 0 and dy != 0) else 1.0
        mx = mn = None
        for t in range(1, k + 1):
            zs = pad[k + t * dy:k + t * dy + th, k + t * dx:k + t * dx + tw]
            slope = (zs - z0) / (t * dist)
            if mx is None:
                mx, mn = slope, slope
            else:
                mx = np.maximum(mx, slope)
                mn = np.minimum(mn, slope)
        num = mx + mn
        den = 1.0 - mx * mn
        with np.errstate(invalid="ignore"):
            nplus += np.where(den > 0.0, num > f * den, mx > 0.0)
            nminus += np.where(den > 0.0, num < -f * den, mx < 0.0)
    lut = np.asarray(GEOMORPHON_MATRIX, dtype=np.float64)
    form = lut[nminus.astype(np.int64), nplus.astype(np.int64)]
    return nminus * 10000.0 + nplus * 100.0 + form


def tpi_k_kernel(pad: np.ndarray, k: int, ewres: float,
                 nsres: float) -> np.ndarray:
    """Generalized-radius Topographic Position Index: center elevation
    minus the mean of the full (2k+1)^2 window EXCLUDING the center
    (Weiss 2001 / gdaldem TPI generalized beyond 3x3). Window sums of
    integer-valued DEMs are exact, so the result is one subtraction and
    one division — order-free and SQL-reproducible."""
    th, tw = pad.shape[0] - 2 * k, pad.shape[1] - 2 * k
    z0 = pad[k:k + th, k:k + tw]
    total = None
    for dy in range(-k, k + 1):
        for dx in range(-k, k + 1):
            if dx == 0 and dy == 0:
                continue
            zs = pad[k + dy:k + dy + th, k + dx:k + dx + tw]
            total = zs if total is None else total + zs
    n = (2 * k + 1) ** 2 - 1
    return z0 - total / float(n)


# Weiss (2001, ESRI poster) 10-class multi-scale TPI landform names,
# 1-based, in the classification CASE's order.
TPI_LANDFORMS = ("canyon", "midslope_drainage", "upland_drainage",
                 "u_valley", "plains", "open_slopes", "upper_slopes",
                 "local_ridge", "midslope_ridge", "mountain_top")


def tpi_landforms(tiles: DataFrame, k_small: int = 2, k_large: int = 8,
                  slope_limit: float = 5.0, lo: int = 8, hi: int = 247,
                  tile: int = 64, scale: int = 10**6) -> DataFrame:
    """Weiss multi-scale TPI landform classification (Weiss 2001; the
    ArcGIS Land Facet Analysis / GRASS r.tpi scheme, complementing
    :func:`geomorphon_kernel`'s pattern approach): standardize TPI at a
    small and a large neighborhood to z-scores over the study window,
    then classify the (z_small, z_large, slope) triple into the 10
    canonical landform facets (canyon ... mountain top; slope <=
    ``slope_limit`` deg splits plains from open slopes).

    Exactness: TPI values are quantized half-up to integer ``1/scale``
    units so the window moments are exact int64/decimal sums, and each
    z-score is computed in the single-division form
    (q * n - sum) / sqrt(n * sumsq - sum^2) — one exact-integer
    numerator, one sqrt, one division, reproducible op-for-op in SQL.
    Slope is the Horn kernel (same libm contract as every dem op).

    Scale shape: two k-halo exchanges + the 3x3 slope pass, one keyed
    join on the pixel key, two 1-row moment aggregates broadcast back.
    Returns (px, py, zs, zl, slope, form, landform) for the [lo, hi]^2
    interior."""
    def q_of(kk: int) -> DataFrame:
        out = dem_op_k(tiles, kk, tpi_k_kernel)
        ex = out.select(
            "tile_x", "tile_y", "tile_w",
            F.posexplode("pixels").alias("pos", "v"))
        px = (F.col("tile_x") * tile
              + F.col("pos") % F.col("tile_w")).cast("long")
        py = (F.col("tile_y") * tile
              + (F.col("pos") / F.col("tile_w")).cast("int")).cast("long")
        return ex.select(
            px.alias("px"), py.alias("py"),
            F.floor(F.col("v") * float(scale) + 0.5).cast("long")
            .alias("q")).where(
            F.col("px").between(lo, hi) & F.col("py").between(lo, hi))

    qs = q_of(k_small).withColumnRenamed("q", "qs")
    ql = q_of(k_large).withColumnRenamed("q", "ql")
    slp = dem_op(tiles, "slope")
    exs = slp.select(
        "tile_x", "tile_y", "tile_w",
        F.posexplode("pixels").alias("pos", "v"))
    px = (F.col("tile_x") * tile
          + F.col("pos") % F.col("tile_w")).cast("long")
    py = (F.col("tile_y") * tile
          + (F.col("pos") / F.col("tile_w")).cast("int")).cast("long")
    sl = exs.select(px.alias("px"), py.alias("py"),
                    F.col("v").alias("slope")).where(
        F.col("px").between(lo, hi) & F.col("py").between(lo, hi))

    j = qs.join(ql, ["px", "py"]).join(sl, ["px", "py"]).persist()
    mo = j.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("qs").alias("ss"), F.sum("ql").alias("sl_"),
        F.sum(F.col("qs").cast("decimal(38,0)")
              * F.col("qs").cast("decimal(38,0)")).alias("ss2"),
        F.sum(F.col("ql").cast("decimal(38,0)")
              * F.col("ql").cast("decimal(38,0)")).alias("sl2"))
    z = j.crossJoin(F.broadcast(mo))
    zs = ((F.col("qs") * F.col("n") - F.col("ss")).cast("double")
          / F.sqrt((F.col("n") * F.col("ss2")
                    - F.col("ss").cast("decimal(38,0)")
                    * F.col("ss").cast("decimal(38,0)")).cast("double")))
    zl = ((F.col("ql") * F.col("n") - F.col("sl_")).cast("double")
          / F.sqrt((F.col("n") * F.col("sl2")
                    - F.col("sl_").cast("decimal(38,0)")
                    * F.col("sl_").cast("decimal(38,0)")).cast("double")))
    z = z.withColumn("zs", zs).withColumn("zl", zl)
    form = (
        F.when((F.col("zs") <= -1.0) & (F.col("zl") <= -1.0), 1)
        .when((F.col("zs") <= -1.0) & (F.col("zl") < 1.0), 2)
        .when(F.col("zs") <= -1.0, 3)
        .when((F.col("zs") < 1.0) & (F.col("zl") <= -1.0), 4)
        .when((F.col("zs") < 1.0) & (F.col("zl") < 1.0)
              & (F.col("slope") <= slope_limit), 5)
        .when((F.col("zs") < 1.0) & (F.col("zl") < 1.0), 6)
        .when(F.col("zs") < 1.0, 7)
        .when(F.col("zl") <= -1.0, 8)
        .when(F.col("zl") < 1.0, 9)
        .otherwise(10))
    name = F.when(form == 1, TPI_LANDFORMS[0])
    for i, nm in enumerate(TPI_LANDFORMS[1:], start=2):
        name = name.when(form == i, nm)
    return z.select(
        "px", "py",
        F.round("zs", 6).alias("zs"), F.round("zl", 6).alias("zl"),
        F.round("slope", 6).alias("slope"),
        form.cast("int").alias("form"), name.alias("landform"))


def focal_stats_kernel(pad: np.ndarray, k: int, ewres: float,
                       nsres: float) -> np.ndarray:
    """Focal statistics beyond the mean (ArcGIS Focal Statistics / GRASS
    r.neighbors RANGE/STDDEV/MODE) over the 3x3 window: value range,
    population standard deviation, and majority (mode, ties broken to
    the SMALLEST value — a stated contract, not an implementation
    accident).

    Exactness: inputs are integer-valued, so sum and sum-of-squares are
    exact; var = (9*s2 - s*s)/81 and std = sqrt(var) are one fixed
    float expression reproducible in SQL; the std is quantized half-up
    to integer 1e-6 units (floor(std*1e6 + 0.5) — explicit, engine-
    independent, unlike banker's-rounding library calls). Majority uses
    only equality counts and min — integer-exact.

    Returns packed floats majority * 1e12 + range * 1e9 +
    floor(std * 1e6 + 0.5); all components exact integers < 2^53."""
    if k != 1:
        raise ValueError("focal_stats_kernel is a 3x3 (k=1) kernel")
    th, tw = pad.shape[0] - 2, pad.shape[1] - 2
    vs = [pad[1 + dy:1 + dy + th, 1 + dx:1 + dx + tw]
          for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
    stack = np.stack(vs)
    s = stack.sum(axis=0)
    s2 = (stack * stack).sum(axis=0)
    var = (9.0 * s2 - s * s) / 81.0
    with np.errstate(invalid="ignore"):
        std6 = np.floor(np.sqrt(var) * 1e6 + 0.5)
        rng = stack.max(axis=0) - stack.min(axis=0)
        cnts = (stack[:, None, :, :] == stack[None, :, :, :]).sum(axis=1)
        maxc = cnts.max(axis=0)
        maj = np.where(cnts == maxc[None, :, :], stack, np.inf).min(axis=0)
    return maj * 1e12 + rng * 1e9 + std6


# row-major 3x3 offsets: the VRM accumulation order shared with the oracle
VRM_OFFS = ((-1, -1), (0, -1), (1, -1),
            (-1, 0), (0, 0), (1, 0),
            (-1, 1), (0, 1), (1, 1))


def vrm_kernel(pad: np.ndarray, k: int, ewres: float,
               nsres: float) -> np.ndarray:
    """Vector ruggedness measure (Sappington, Longshore & Thompson,
    J. Wildlife Mgmt 2007): 1 - |sum of the 9 unit surface normals| / 9
    over the 3x3 neighborhood — decouples ruggedness from slope (a
    steep smooth face scores ~0, broken terrain scores high), the
    standard habitat/terrain-heterogeneity metric.

    Needs k >= 2 (each neighbor's normal needs its own 3x3). Normals
    come from Horn gradients: n = (-p, -q, 1)/sqrt(1+p^2+q^2) — only
    squares, sums, one sqrt, divisions, all in the fixed VRM_OFFS fold
    order, so the oracle is exact by construction (no trig: the
    published sin/cos-of-slope/aspect formulation is algebraically this)."""
    if k < 2:
        raise ValueError("vrm needs a k >= 2 halo")
    th, tw = pad.shape[0] - 2 * k, pad.shape[1] - 2 * k
    sub = pad[k - 2:k + th + 2, k - 2:k + tw + 2]
    p, q = _horn(sub, ewres, nsres)        # (th+2, tw+2)
    den = np.sqrt(1.0 + (p * p + q * q))
    nx, ny, nz = (0.0 - p) / den, (0.0 - q) / den, 1.0 / den
    sx = sy = sz = None
    for ox, oy in VRM_OFFS:
        ys, xs = slice(1 + oy, 1 + oy + th), slice(1 + ox, 1 + ox + tw)
        if sx is None:
            sx, sy, sz = nx[ys, xs], ny[ys, xs], nz[ys, xs]
        else:
            sx = sx + nx[ys, xs]
            sy = sy + ny[ys, xs]
            sz = sz + nz[ys, xs]
    mag = np.sqrt((sx * sx + sy * sy) + sz * sz)
    return 1.0 - mag / 9.0


def solar_exposure_kernel(pad: np.ndarray, k: int, ewres: float,
                          nsres: float, tan_alt: float = 0.25
                          ) -> np.ndarray:
    """Clear-sky solar exposure with cast shadows (the r.sun/ArcGIS
    Solar-Analyst core, reduced to one sun position): sun due EAST at
    altitude atan(tan_alt); a cell is shadowed when the max elevation-
    angle ratio toward the sun within k pixels exceeds tan_alt
    (the openness-style horizon scan); otherwise exposure is the
    Lambertian incidence of the Horn-normal with the unit sun vector
    (4, 0, 1)/sqrt(17) for the default tan_alt=1/4.

    Shadowed cells emit -1.0 (distinguishable from a zero-incidence
    lit cell); lit cells emit max(incidence, 0). Every op is a fixed
    expression (subtractions, divisions, one sqrt, max-fold) — the SQL
    oracle is exact by construction, no trig."""
    th, tw = pad.shape[0] - 2 * k, pad.shape[1] - 2 * k
    z0 = pad[k:k + th, k:k + tw]
    m = None
    for t in range(1, k + 1):
        r = (pad[k:k + th, k + t:k + t + tw] - z0) / float(t)
        m = r if m is None else np.maximum(m, r)
    sub = pad[k - 1:k + th + 1, k - 1:k + tw + 1]
    p, q = _horn(sub, ewres, nsres)
    den = np.sqrt(1.0 + (p * p + q * q))
    cosa = 4.0 / np.sqrt(17.0)
    sina = 1.0 / np.sqrt(17.0)
    inc = ((0.0 - p) * cosa + sina) / den
    with np.errstate(invalid="ignore"):
        return np.where(m > tan_alt, -1.0, np.maximum(inc, 0.0))


def hand(tiles: DataFrame, threshold: int = 40, tile: int = 64,
         lo: int = 1, hi: int = 126,
         max_doublings: int = 10) -> DataFrame:
    """Height Above Nearest Drainage (Rennó et al., RSE 2008; the
    flood-mapping terrain normalization): the drainage network is the
    accumulation >= ``threshold`` cell set; every cell follows its D8
    path to the FIRST drainage cell downstream and reports
    z(cell) - z(drainage). Cells whose path terminates (pit / window
    exit) before touching drainage report NULL with drained = 0.

    Same pointer-doubling shape as :func:`d8_basins`, with the
    successor function edited so drainage cells SELF-LOOP — the
    fixpoint then lands every cell exactly on its first downstream
    drainage cell. Elevations are integer-valued, so HAND is an exact
    BIGINT.

    PATH-LENGTH CONTRACT: the adaptive loop runs up to
    ``max_doublings`` squarings (2**max_doublings = 1024 path steps at
    the default) and STOPS EARLY at the moved==0 fixpoint; it raises if
    the pointer table has not converged after ``max_doublings`` rounds,
    so a window whose longest flow path exceeds 2**max_doublings steps
    fails loudly instead of landing short (a 126x126 window can hold a
    boustrophedon path of ~15k steps — raise ``max_doublings`` to 14
    for adversarial snakes). The ``dem_hand`` driver oracle unrolls a
    FIXED 8 doubling stages (256 steps) with no convergence check: it
    is anchored to the gated fixture (longest path ~60 steps, fixpoint
    by stage 6) and is NOT valid for other windows — re-anchor the
    stage count if the fixture changes."""
    acc = d8_flow_accumulation(tiles, tile, lo, hi)

    fd = dem_op(tiles, "flowdir")
    ex = fd.select(
        "tile_x", "tile_y", "tile_w",
        F.posexplode("pixels").alias("pos", "code"),
    )
    px = (F.col("tile_x") * tile + F.col("pos") % F.col("tile_w"))
    py = (F.col("tile_y") * tile
          + (F.col("pos") / F.col("tile_w")).cast("int"))
    cells = ex.select(
        px.cast("long").alias("px"), py.cast("long").alias("py"),
        F.col("code").cast("int").alias("code"),
    ).where((F.col("px").between(lo, hi)) & (F.col("py").between(lo, hi)))

    zv = tiles.select(
        "tile_x", "tile_y", "tile_w",
        F.posexplode("pixels").alias("pos", "z"))
    zpx = (F.col("tile_x") * tile + F.col("pos") % F.col("tile_w"))
    zpy = (F.col("tile_y") * tile
           + (F.col("pos") / F.col("tile_w")).cast("int"))
    zs = zv.select(
        (zpy.cast("long") * 65536 + zpx.cast("long")).alias("zid"),
        F.col("z").cast("long").alias("z"))

    dx = F.lit(0)
    dy = F.lit(0)
    for code, (cdx, cdy) in D8_OFFSETS.items():
        dx = F.when(F.col("code") == code, F.lit(cdx)).otherwise(dx)
        dy = F.when(F.col("code") == code, F.lit(cdy)).otherwise(dy)
    tx = F.col("px") + dx
    ty = F.col("py") + dy
    in_win = tx.between(lo, hi) & ty.between(lo, hi)
    self_key = F.col("py") * 65536 + F.col("px")
    c2 = cells.join(acc, ["px", "py"])
    succ = c2.select(
        self_key.alias("id"),
        F.when(F.col("acc") >= threshold, self_key)
        .when(in_win, ty * 65536 + tx)
        .otherwise(self_key).alias("nxt"),
    ).localCheckpoint()

    cur = succ
    for _ in range(max_doublings):
        nxt2 = (
            cur.alias("a")
            .join(cur.select(F.col("id").alias("nid"),
                             F.col("nxt").alias("n2")).alias("b"),
                  F.col("a.nxt") == F.col("nid"))
            .select(F.col("a.id").alias("id"), F.col("n2").alias("nxt"))
            .localCheckpoint()
        )
        moved = (
            nxt2.alias("x")
            .join(cur.select(F.col("id").alias("id2"),
                             F.col("nxt").alias("old")).alias("y"),
                  F.col("x.id") == F.col("id2"))
            .where(F.col("x.nxt") != F.col("old")).count()
        )
        cur = nxt2
        if moved == 0:
            break
    else:
        raise RuntimeError(
            f"hand did not converge in {max_doublings} doublings")

    land_acc = acc.select(
        (F.col("py") * 65536 + F.col("px")).alias("land"),
        F.col("acc").alias("land_acc"))
    out = (cells.select(
        "px", "py", (F.col("py") * 65536 + F.col("px")).alias("id"))
        .join(cur, "id")
        .withColumnRenamed("nxt", "land")
        .join(land_acc, "land")
        .join(zs.withColumnRenamed("zid", "id2"),
              F.col("id") == F.col("id2"))
        .withColumnRenamed("z", "z_self")
        .join(zs.withColumnRenamed("zid", "id3")
              .withColumnRenamed("z", "z_land"),
              F.col("land") == F.col("id3")))
    drained = (F.col("land_acc") >= threshold)
    return out.select(
        "px", "py", F.col("land").cast("long").alias("land"),
        drained.cast("long").alias("drained"),
        F.when(drained, F.col("z_self") - F.col("z_land"))
        .cast("long").alias("hand"))
