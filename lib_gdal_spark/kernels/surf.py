"""SURF-style feature detection + matching kernels (NumPy, per image).

Vectorized re-expression of the reference correlator
(``core/alg/gdal_octave.cpp``, ``core/alg/gdal_simplesurf.cpp``):
integral image, clamped rectangle sums, Haar wavelets, fast-Hessian
octave layers, 3x3x3 scale-space extremum detection, the 64-float
descriptor, and the greedy ratio-test matcher.  Semantics follow the
reference exactly (same clamping, same normalization ``filterSize²``,
same ``0.9·0.9`` mixed-derivative weight, same point ordering, same
order-dependent greedy matching), but every per-pixel loop is a NumPy
array op over the whole layer.
"""

from __future__ import annotations

import numpy as np

INTERVALS = 4       # GDALOctaveMap::INTERVALS
DESC_SIZE = 64      # GDALFeaturePoint::DESC_SIZE
RATIO_THRESHOLD = 0.8


def integral_image(img: np.ndarray) -> np.ndarray:
    """Summed-area table (gdal_octave.cpp:44-81)."""
    return np.cumsum(np.cumsum(np.asarray(img, np.float64), axis=0), axis=1)


def _sat_value(sat: np.ndarray, r, c):
    """GDALIntegralImage::GetValue — 0 outside the image."""
    h, w = sat.shape
    ok = (r >= 0) & (r < h) & (c >= 0) & (c < w)
    rr = np.clip(r, 0, h - 1)
    cc = np.clip(c, 0, w - 1)
    return np.where(ok, sat[rr, cc], 0.0)


def rect_sum(sat: np.ndarray, row, col, width: int, height: int):
    """GDALIntegralImage::GetRectangleSum (gdal_octave.cpp:94-131):
    left-top anchored, clamped to the image, never negative."""
    h, w = sat.shape
    row = np.asarray(row)
    col = np.asarray(col)
    lt_row = np.where(row <= h, row - 1, -1)
    lt_col = np.where(col <= w, col - 1, -1)
    rb_row = np.minimum(row + (height - 1), h - 1)
    rb_col = np.minimum(col + (width - 1), w - 1)
    res = (_sat_value(sat, lt_row, lt_col)
           + _sat_value(sat, rb_row, rb_col)
           - _sat_value(sat, lt_row, rb_col)
           - _sat_value(sat, rb_row, lt_col))
    return np.maximum(res, 0.0)


def haar_x(sat, row, col, size: int):
    """HaarWavelet_X (gdal_octave.cpp:133-137)."""
    return (rect_sum(sat, row, col + size // 2, size // 2, size)
            - rect_sum(sat, row, col, size // 2, size))


def haar_y(sat, row, col, size: int):
    """HaarWavelet_Y (gdal_octave.cpp:139-143)."""
    return (rect_sum(sat, row + size // 2, col, size, size // 2)
            - rect_sum(sat, row, col, size, size // 2))


class OctaveLayer:
    """GDALOctaveLayer (gdal_octave.cpp:159-226): fast-Hessian filter
    responses at one (octave, interval)."""

    def __init__(self, octave: int, interval: int):
        self.octave = octave
        self.filter_size = 3 * (2 ** octave) * interval + 1
        self.radius = (self.filter_size - 1) // 2
        self.scale = 2 ** octave
        self.det = None
        self.sign = None

    def compute(self, sat: np.ndarray) -> "OctaveLayer":
        h, w = sat.shape
        fs, radius = self.filter_size, self.radius
        lobe = fs // 3
        long_part = 2 * lobe - 1
        norm = fs * fs
        det = np.zeros((h, w))
        sign = np.zeros((h, w), np.int64)
        rs = np.arange(radius, h - radius + 1)   # inclusive, like the C loop
        cs = np.arange(radius, w - radius + 1)
        if len(rs) == 0 or len(cs) == 0:
            self.det, self.sign = det, sign
            return self
        R, C = np.meshgrid(rs, cs, indexing="ij")
        dxx = (rect_sum(sat, R - lobe + 1, C - radius, fs, long_part)
               - 3 * rect_sum(sat, R - lobe + 1, C - (lobe - 1) // 2,
                              lobe, long_part))
        dyy = (rect_sum(sat, R - radius, C - lobe - 1, long_part, fs)
               - 3 * rect_sum(sat, R - lobe + 1, C - lobe + 1,
                              long_part, lobe))
        dxy = (rect_sum(sat, R - lobe, C - lobe, lobe, lobe)
               + rect_sum(sat, R + 1, C + 1, lobe, lobe)
               - rect_sum(sat, R - lobe, C + 1, lobe, lobe)
               - rect_sum(sat, R + 1, C - lobe, lobe, lobe))
        dxx = dxx / norm
        dyy = dyy / norm
        dxy = dxy / norm
        # same association as `dxx*dyy - 0.9*0.9*dxy*dxy`
        det[radius:radius + len(rs), radius:radius + len(cs)] = (
            dxx * dyy - (0.9 * 0.9 * dxy) * dxy)
        sign[radius:radius + len(rs), radius:radius + len(cs)] = np.where(
            dxx + dyy >= 0, 1, -1)
        self.det, self.sign = det, sign
        return self


def _extrema(bot: OctaveLayer, mid: OctaveLayer, top: OctaveLayer,
             threshold: float) -> np.ndarray:
    """PointIsExtremum over the whole mid layer (gdal_octave.cpp:264-297):
    strictly greater than all 26 scale-space neighbors, above threshold,
    with the full top-layer neighborhood inside the image."""
    h, w = mid.det.shape
    cur = mid.det
    ok = cur >= threshold
    rr = np.arange(h)[:, None]
    cc = np.arange(w)[None, :]
    ok &= (rr > top.radius) & (cc > top.radius)
    ok &= (rr + top.radius < h) & (cc + top.radius < w)
    pad = lambda a: np.pad(a, 1, constant_values=np.inf)
    pb, pm, pt = pad(bot.det), pad(mid.det), pad(top.det)
    for di in (-1, 0, 1):
        for dj in (-1, 0, 1):
            sl = (slice(1 + di, 1 + di + h), slice(1 + dj, 1 + dj + w))
            ok &= pt[sl] < cur
            ok &= pb[sl] < cur
            if (di, dj) != (0, 0):
                ok &= pm[sl] < cur
    return ok


def set_descriptor(sat: np.ndarray, x: int, y: int, scale: int) -> np.ndarray:
    """64-float SURF descriptor (gdal_simplesurf.cpp:279-337): 4x4
    quadrants x 5x5 sub-quadrants of Haar responses, accumulated as
    (dx, dy, |dx|, |dy|) per quadrant."""
    haar_size = 2 * scale
    desc_side = 20 * scale
    quad_step = desc_side // 4
    sub_step = quad_step // 5
    lt_row = y - desc_side // 2
    lt_col = x - desc_side // 2
    desc = np.empty(DESC_SIZE)
    count = 0
    for r in range(lt_row, lt_row + desc_side, quad_step):
        for c in range(lt_col, lt_col + desc_side, quad_step):
            sub_r = np.arange(r, r + quad_step, sub_step)
            sub_c = np.arange(c, c + quad_step, sub_step)
            SR, SC = np.meshgrid(sub_r, sub_c, indexing="ij")
            cur_r = SR + sub_step // 2 - haar_size // 2
            cur_c = SC + sub_step // 2 - haar_size // 2
            dx = haar_x(sat, cur_r, cur_c, haar_size)
            dy = haar_y(sat, cur_r, cur_c, haar_size)
            desc[count] = dx.sum()
            desc[count + 1] = dy.sum()
            desc[count + 2] = np.abs(dx).sum()
            desc[count + 3] = np.abs(dy).sum()
            count += 4
    return desc


def extract_feature_points(img: np.ndarray, octave_start: int = 2,
                           octave_end: int = 2,
                           threshold: float = 0.001) -> list[dict]:
    """ExtractFeaturePoints (gdal_simplesurf.cpp:212-250): scale-space
    extrema with descriptors, in the reference's collection order
    (octave, layer-pair, row-major)."""
    sat = integral_image(img)
    points: list[dict] = []
    for octv in range(octave_start, octave_end + 1):
        layers = [OctaveLayer(octv, i).compute(sat)
                  for i in range(1, INTERVALS + 1)]
        for k in range(INTERVALS - 2):
            bot, mid, top = layers[k], layers[k + 1], layers[k + 2]
            mask = _extrema(bot, mid, top, threshold)
            for i, j in np.argwhere(mask):
                points.append(dict(
                    x=int(j), y=int(i), scale=mid.scale, radius=mid.radius,
                    sign=int(mid.sign[i, j]),
                    descriptor=set_descriptor(sat, int(j), int(i), mid.scale),
                ))
    return points


def luminosity(red, green, blue) -> np.ndarray:
    """ConvertRGBToLuminosity (gdal_simplesurf.cpp:137-211):
    (0.21 R + 0.72 G + 0.07 B) / 255."""
    return (np.asarray(red, np.float64) * 0.21
            + np.asarray(green, np.float64) * 0.72
            + np.asarray(blue, np.float64) * 0.07) / 255.0


def match_feature_points(fp1: list[dict], fp2: list[dict],
                         threshold: float = 0.015) -> list[tuple]:
    """MatchFeaturePoints (gdal_simplesurf.cpp:365-524): greedy nearest/
    second-nearest ratio test over same-sign pairs, max-normalized
    distance pruning.  Returns [(idx1, idx2, normalized_dist), ...] with
    indices into the ORIGINAL collections.  Order-dependent by design —
    faithful to the sequential reference loop.
    """
    swapped = len(fp2) < len(fp1)
    p1, p2 = (fp2, fp1) if swapped else (fp1, fp2)
    if not p1 or not p2:
        return []
    d1 = np.array([p["descriptor"] for p in p1])
    d2 = np.array([p["descriptor"] for p in p2])
    s1 = np.array([p["sign"] for p in p1])
    s2 = np.array([p["sign"] for p in p2])
    # pairwise distances once; the greedy pass stays sequential
    dist = np.sqrt(
        np.maximum(((d1[:, None, :] - d2[None, :, :]) ** 2).sum(-1), 0.0))
    matched = np.zeros(len(p2), bool)
    pairs: list[list] = []
    for i in range(len(p1)):
        cand = ~matched & (s2 == s1[i])
        if not cand.any():
            continue
        dd = dist[i][cand]                # in ascending j order
        idxs = np.flatnonzero(cand)
        runmin = np.minimum.accumulate(dd)
        best = float(runmin[-1])
        best_idx = int(idxs[np.argmin(dd)])  # first strict improvement wins
        # bestDist_2 quirk (gdal_simplesurf.cpp:465-470): seeded with the
        # FIRST candidate's distance and only ever lowered by values that
        # exceed the running best — NOT the true second-minimum.
        best2 = float(dd[0])
        if len(dd) > 1:
            later = dd[1:][dd[1:] > runmin[:-1]]
            if len(later):
                best2 = min(best2, float(later.min()))
        if best2 > 0 and best >= 0 and best / best2 < RATIO_THRESHOLD:
            pairs.append([i, best_idx, best])
            matched[best_idx] = True
    mx = max((p[2] for p in pairs), default=0.0)
    if mx != 0.0:
        for p in pairs:
            p[2] /= mx
    out = []
    for i, j, d in pairs:
        if d <= threshold:
            out.append((j, i, d) if swapped else (i, j, d))
    return out
