"""GCP polynomial transformers (``core/alg/gdal_crs.cpp`` semantics).

Fit order-1..3 2-D polynomials mapping pixel space -> georeferenced space
from ground control points by least squares (the reference's CRS_compute);
apply vectorized. An order-1 fit on exact affine GCPs reproduces the
geotransform; higher orders absorb gentle warps. Plugs into
``kernels.resample.warp_tile(transform=...)`` like any coordinate pipeline
stage (``gdaltransformer.cpp:1070``).
"""

from __future__ import annotations

import numpy as np

_TERMS = {1: 3, 2: 6, 3: 10}


def _design(x: np.ndarray, y: np.ndarray, order: int) -> np.ndarray:
    cols = [np.ones_like(x), x, y]
    if order >= 2:
        cols += [x * y, x * x, y * y]
    if order >= 3:
        cols += [x * x * y, x * y * y, x**3, y**3]
    return np.column_stack(cols)


def fit_gcp_polynomial(gcps: np.ndarray, order: int = 1):
    """gcps: (n, 4) rows of (pixel, line, geo_x, geo_y) -> (cx, cy) coefs.

    Requires n >= number of terms (3/6/10 for order 1/2/3).
    """
    if order not in _TERMS:
        raise ValueError("order must be 1, 2 or 3")
    g = np.asarray(gcps, dtype=np.float64)
    if len(g) < _TERMS[order]:
        raise ValueError(f"need >= {_TERMS[order]} GCPs for order {order}")
    A = _design(g[:, 0], g[:, 1], order)
    cx, *_ = np.linalg.lstsq(A, g[:, 2], rcond=None)
    cy, *_ = np.linalg.lstsq(A, g[:, 3], rcond=None)
    return cx, cy


def apply_polynomial(cx: np.ndarray, cy: np.ndarray, x: np.ndarray,
                     y: np.ndarray, order: int = 1):
    """(pixel, line) arrays -> (geo_x, geo_y)."""
    A = _design(np.asarray(x, dtype=np.float64).ravel(),
                np.asarray(y, dtype=np.float64).ravel(), order)
    gx = (A @ cx).reshape(np.shape(x))
    gy = (A @ cy).reshape(np.shape(x))
    return gx, gy


def gcp_transform(gcps: np.ndarray, order: int = 1):
    """Closure usable as ``warp_tile(transform=...)`` (dst->src georef)."""
    cx, cy = fit_gcp_polynomial(gcps, order)

    def t(x: np.ndarray, y: np.ndarray):
        return apply_polynomial(cx, cy, x, y, order)

    return t


class ThinPlateSpline:
    """TPS transformer (``core/alg/thinplatespline.cpp`` VizGeorefSpline2D
    semantics): radial basis r^2 ln r^2 + affine part, exact interpolation
    through the control points, least-change bending energy."""

    def __init__(self, src: np.ndarray, dst: np.ndarray) -> None:
        """src (n,2) control coords -> dst (n,2) target coords."""
        src = np.asarray(src, dtype=np.float64)
        dst = np.asarray(dst, dtype=np.float64)
        n = len(src)
        if n < 3:
            raise ValueError("TPS needs >= 3 control points")
        d2 = ((src[:, None, :] - src[None, :, :]) ** 2).sum(-1)
        K = np.where(d2 > 0, d2 * np.log(np.where(d2 > 0, d2, 1.0)), 0.0)
        P = np.column_stack([np.ones(n), src])
        A = np.zeros((n + 3, n + 3))
        A[:n, :n] = K
        A[:n, n:] = P
        A[n:, :n] = P.T
        rhs = np.zeros((n + 3, 2))
        rhs[:n] = dst
        sol = np.linalg.solve(A, rhs)
        self.src = src
        self.w = sol[:n]
        self.a = sol[n:]

    def __call__(self, x: np.ndarray, y: np.ndarray):
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        shp = x.shape
        q = np.column_stack([x.ravel(), y.ravel()])
        d2 = ((q[:, None, :] - self.src[None, :, :]) ** 2).sum(-1)
        U = np.where(d2 > 0, d2 * np.log(np.where(d2 > 0, d2, 1.0)), 0.0)
        out = (U @ self.w
               + self.a[0][None, :]
               + q[:, 0:1] * self.a[1][None, :]
               + q[:, 1:2] * self.a[2][None, :])
        return out[:, 0].reshape(shp), out[:, 1].reshape(shp)


class RPCTransformer:
    """Rational polynomial camera model (``core/alg/gdal_rpc.cpp``).

    Forward: (lon, lat, height) -> (pixel, line) by the standard RPC00B
    20-coefficient cubic rational polynomials over normalized coordinates.
    Inverse (pixel,line)->(lon,lat) iterates a local affine approximation
    exactly like GDALRPCTransform's iterative solution (``gdal_rpc.cpp``
    RPCInverseTransformPoint).
    """

    def __init__(self, coefs: dict, height: float = 0.0) -> None:
        """coefs: LINE_NUM/LINE_DEN/SAMP_NUM/SAMP_DEN (20 each) +
        *_OFF/_SCALE for LAT, LONG, HEIGHT, LINE, SAMP."""
        self.c = coefs
        self.height = height

    @staticmethod
    def _poly(c: np.ndarray, P, L, H):
        """RPC00B term order (gdal_rpc.cpp RPCEvaluate)."""
        return (c[0] + c[1] * L + c[2] * P + c[3] * H
                + c[4] * L * P + c[5] * L * H + c[6] * P * H
                + c[7] * L * L + c[8] * P * P + c[9] * H * H
                + c[10] * P * L * H + c[11] * L ** 3 + c[12] * L * P * P
                + c[13] * L * H * H + c[14] * L * L * P + c[15] * P ** 3
                + c[16] * P * H * H + c[17] * L * L * H + c[18] * P * P * H
                + c[19] * H ** 3)

    def forward(self, lon: np.ndarray, lat: np.ndarray,
                height: np.ndarray | None = None):
        c = self.c
        H0 = self.height if height is None else height
        P = (np.asarray(lat, np.float64) - c["LAT_OFF"]) / c["LAT_SCALE"]
        L = (np.asarray(lon, np.float64) - c["LONG_OFF"]) / c["LONG_SCALE"]
        H = (np.asarray(H0, np.float64) - c["HEIGHT_OFF"]) / c["HEIGHT_SCALE"]
        rn = self._poly(np.asarray(c["LINE_NUM"]), P, L, H)
        rd = self._poly(np.asarray(c["LINE_DEN"]), P, L, H)
        cn = self._poly(np.asarray(c["SAMP_NUM"]), P, L, H)
        cd = self._poly(np.asarray(c["SAMP_DEN"]), P, L, H)
        line = rn / rd * c["LINE_SCALE"] + c["LINE_OFF"]
        samp = cn / cd * c["SAMP_SCALE"] + c["SAMP_OFF"]
        return samp, line

    def inverse(self, samp: np.ndarray, line: np.ndarray,
                iters: int = 10):
        """(pixel, line) -> (lon, lat) by iterative local linearization."""
        c = self.c
        lon = np.full(np.shape(samp), float(c["LONG_OFF"]), dtype=np.float64)
        lat = np.full(np.shape(samp), float(c["LAT_OFF"]), dtype=np.float64)
        dl = 1e-7
        for _ in range(iters):
            s0, l0 = self.forward(lon, lat)
            ds_dlon = (self.forward(lon + dl, lat)[0] - s0) / dl
            dl_dlon = (self.forward(lon + dl, lat)[1] - l0) / dl
            ds_dlat = (self.forward(lon, lat + dl)[0] - s0) / dl
            dl_dlat = (self.forward(lon, lat + dl)[1] - l0) / dl
            det = ds_dlon * dl_dlat - ds_dlat * dl_dlon
            det = np.where(det == 0, 1e-30, det)
            es = samp - s0
            el = line - l0
            lon = lon + (es * dl_dlat - el * ds_dlat) / det
            lat = lat + (el * ds_dlon - es * dl_dlon) / det
        return lon, lat


class GeolocTransformer:
    """Geolocation-array transformer (``core/alg/gdalgeoloc.cpp``): a
    GEOLOCATION dataset carries per-(sub)pixel lon/lat arrays; forward is
    bilinear lookup in the arrays, inverse is a backmap grid built by
    scattering the array then filling holes (GDALCreateGeoLocTransformer's
    backmap generation), here queried by nearest-cell + local refinement."""

    def __init__(self, lon_arr: np.ndarray, lat_arr: np.ndarray,
                 pixel_offset: float = 0.0, line_offset: float = 0.0,
                 pixel_step: float = 1.0, line_step: float = 1.0) -> None:
        self.lon = np.asarray(lon_arr, np.float64)
        self.lat = np.asarray(lat_arr, np.float64)
        self.off = (pixel_offset, line_offset)
        self.step = (pixel_step, line_step)

    def forward(self, px: np.ndarray, ln: np.ndarray):
        """raster pixel/line -> lon/lat (bilinear in the geoloc arrays)."""
        h, w = self.lon.shape
        gx = (np.asarray(px, np.float64) - self.off[0]) / self.step[0]
        gy = (np.asarray(ln, np.float64) - self.off[1]) / self.step[1]
        x0 = np.clip(np.floor(gx).astype(np.int64), 0, w - 2)
        y0 = np.clip(np.floor(gy).astype(np.int64), 0, h - 2)
        fx = np.clip(gx - x0, 0.0, 1.0)
        fy = np.clip(gy - y0, 0.0, 1.0)

        def bil(a):
            return (a[y0, x0] * (1 - fx) * (1 - fy)
                    + a[y0, x0 + 1] * fx * (1 - fy)
                    + a[y0 + 1, x0] * (1 - fx) * fy
                    + a[y0 + 1, x0 + 1] * fx * fy)
        return bil(self.lon), bil(self.lat)

    def inverse(self, lon: np.ndarray, lat: np.ndarray, iters: int = 8):
        """lon/lat -> pixel/line by global nearest seed + Newton refine."""
        h, w = self.lon.shape
        lo = np.asarray(lon, np.float64).ravel()
        la = np.asarray(lat, np.float64).ravel()
        # seed: nearest geoloc sample over a SUBSAMPLED mesh (the Newton
        # refinement below converges from a coarse seed on smooth meshes;
        # full-mesh search would be O(queries x h x w))
        stride = max(1, int(np.sqrt(h * w / 4096.0)))
        sub_lon = self.lon[::stride, ::stride]
        sub_lat = self.lat[::stride, ::stride]
        sh, sw = sub_lon.shape
        d2 = ((sub_lon.ravel()[None, :] - lo[:, None]) ** 2
              + (sub_lat.ravel()[None, :] - la[:, None]) ** 2)
        seed = np.argmin(d2, axis=1)
        gy, gx = np.divmod(seed, sw)
        px = (gx * stride).astype(np.float64) * self.step[0] + self.off[0]
        ln = (gy * stride).astype(np.float64) * self.step[1] + self.off[1]
        d = 1e-3
        for _ in range(iters):
            f0x, f0y = self.forward(px, ln)
            dxx = (self.forward(px + d, ln)[0] - f0x) / d
            dyx = (self.forward(px + d, ln)[1] - f0y) / d
            dxy = (self.forward(px, ln + d)[0] - f0x) / d
            dyy = (self.forward(px, ln + d)[1] - f0y) / d
            det = dxx * dyy - dxy * dyx
            det = np.where(det == 0, 1e-30, det)
            ex = lo - f0x
            ey = la - f0y
            px = px + (ex * dyy - ey * dxy) / det
            ln = ln + (ey * dxx - ex * dyx) / det
        return px.reshape(np.shape(lon)), ln.reshape(np.shape(lon))


def approx_transformer(exact, tol: float, x0: float, x1: float):
    """1-D anchor-interpolated approximation of an expensive transform
    (``core/alg/gdaltransformer.cpp:3102`` GDALApproxTransform semantics):
    evaluate exactly at segment ends + midpoint; if the midpoint's linear
    interpolation error <= tol, interpolate the whole scanline, else
    recurse on both halves. Returns f(xs) for a full scanline given
    ``exact(xs) -> (gx, gy)``."""

    def run(xs: np.ndarray):
        xs = np.asarray(xs, dtype=np.float64)
        out_x = np.empty_like(xs)
        out_y = np.empty_like(xs)

        def solve(i0: int, i1: int, f0, f1):
            if i1 - i0 <= 1:
                out_x[i0], out_y[i0] = f0
                out_x[i1], out_y[i1] = f1
                return
            im = (i0 + i1) // 2
            fm = exact(np.array([xs[im]]))
            fmx, fmy = float(fm[0][0]), float(fm[1][0])
            t = (xs[im] - xs[i0]) / (xs[i1] - xs[i0])
            ix = f0[0] + t * (f1[0] - f0[0])
            iy = f0[1] + t * (f1[1] - f0[1])
            if abs(ix - fmx) <= tol and abs(iy - fmy) <= tol:
                tt = (xs[i0:i1 + 1] - xs[i0]) / (xs[i1] - xs[i0])
                out_x[i0:i1 + 1] = f0[0] + tt * (f1[0] - f0[0])
                out_y[i0:i1 + 1] = f0[1] + tt * (f1[1] - f0[1])
                # midpoint keeps its exact value (GDAL reuses it)
                out_x[im], out_y[im] = fmx, fmy
            else:
                solve(i0, im, f0, (fmx, fmy))
                solve(im, i1, (fmx, fmy), f1)

        fa = exact(np.array([xs[0]]))
        fb = exact(np.array([xs[-1]]))
        solve(0, len(xs) - 1,
              (float(fa[0][0]), float(fa[1][0])),
              (float(fb[0][0]), float(fb[1][0])))
        return out_x, out_y

    return run
