"""Image-processing focal filters + histogram matching over the tiled
raster table.

Extends the map-algebra family (SURVEY.md §2.5/§2.9 neighborhood ops;
reference analogs: ``apps/gdalenhance.cpp`` for global radiometric
transforms, the ``alg/`` focal machinery for windows) with four classic
imagery filters the reference ecosystem reaches via gdal_calc / numpy
plugins:

- **median3**: 3x3 median (salt-and-pepper denoise). Integer-exact: the
  fixture rasters are integer-valued, the median of 9 integers is an
  integer (sort + middle element, no averaging).
- **unsharp mask**: out = v + amount * (v - blur) with the binomial
  (1,2,1)x(1,2,1)/16 blur. With integer pixels and a dyadic ``amount``
  (default 1/2) every intermediate is an exact dyadic rational, so the
  result is bit-identical across engines regardless of op order.
- **Kuwahara**: edge-preserving smoothing (Kuwahara et al. 1976): the
  四 overlapping (k+1)x(k+1) quadrants of the (2k+1)^2 window; output
  the mean of the quadrant with the smallest variance. Variance
  comparison uses the integer statistic n*s2 - s*s (no division), ties
  break to the first quadrant in (NW, NE, SW, SE) order — a stated
  contract shared with the SQL oracle. The packed output carries both
  the chosen quadrant and its integer sum so the oracle checks the
  selection, not just the mean.
- **histogram matching**: remap source-band values so their empirical
  CDF matches a reference band's (standard radiometric normalization
  before mosaicking). Pure integer counting: dst(v) = min r such that
  cdf_ref(r) * n_src >= cdf_src(v) * n_ref (cross-multiplied, no
  division). Runs as two tiny value-histogram aggregations + a
  broadcast range join — no pixel shuffle.

All focal kernels plug into :func:`operators.dem.dem_op_k`'s halo
exchange: shuffle volume stays O(k * perimeter) per tile at any raster
size, and tiles process independently — the layout that survives a
1000-executor scale-up.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def median3_kernel(pad: np.ndarray, k: int, ewres: float,
                   nsres: float) -> np.ndarray:
    """3x3 median filter. Median of 9 integer samples = the 5th order
    statistic — integer-exact, no interpolation."""
    if k != 1:
        raise ValueError("median3_kernel is a 3x3 (k=1) kernel")
    th, tw = pad.shape[0] - 2, pad.shape[1] - 2
    stack = np.stack([pad[1 + dy:1 + dy + th, 1 + dx:1 + dx + tw]
                      for dy in (-1, 0, 1) for dx in (-1, 0, 1)])
    return np.sort(stack, axis=0)[4]


def unsharp_kernel(pad: np.ndarray, k: int, ewres: float, nsres: float,
                   amount: float = 0.5) -> np.ndarray:
    """Unsharp mask with the separable binomial 3x3 blur:
    blur = (a + 2b + c + 2d + 4e + 2f + g + 2h + i) / 16,
    out = e + amount * (e - blur).

    Exactness: integer pixels make the 16-weighted sum exact; /16 and
    a dyadic ``amount`` keep every float dyadic, so the value is
    bit-identical in any evaluation order."""
    if k != 1:
        raise ValueError("unsharp_kernel is a 3x3 (k=1) kernel")
    th, tw = pad.shape[0] - 2, pad.shape[1] - 2

    def w(dx: int, dy: int) -> np.ndarray:
        return pad[1 + dy:1 + dy + th, 1 + dx:1 + dx + tw]

    conv = (w(-1, -1) + 2.0 * w(0, -1) + w(1, -1)
            + 2.0 * w(-1, 0) + 4.0 * w(0, 0) + 2.0 * w(1, 0)
            + w(-1, 1) + 2.0 * w(0, 1) + w(1, 1))
    e = w(0, 0)
    return e + amount * (e - conv / 16.0)


# quadrant corner offsets in selection order: NW, NE, SW, SE — the
# tie-break contract shared with the SQL oracle.
KUWAHARA_QUADS = ((-1, -1), (1, -1), (-1, 1), (1, 1))


def kuwahara_kernel(pad: np.ndarray, k: int, ewres: float,
                    nsres: float) -> np.ndarray:
    """Kuwahara edge-preserving filter on the 5x5 window (k=2): four
    overlapping 3x3 quadrants centered at the four diagonal neighbors;
    emit the mean of the minimum-variance quadrant.

    Integer contract: per quadrant s = sum, s2 = sum of squares; the
    variance ranking uses t = 9*s2 - s*s (exact integers), ties to the
    first quadrant in KUWAHARA_QUADS order. Output packs
    quad_index * 4096 + s (s <= 9*255 < 4096); the query decodes
    both and derives mean = s / 9.0 with one division."""
    if k != 2:
        raise ValueError("kuwahara_kernel needs the k=2 (5x5) halo")
    th, tw = pad.shape[0] - 4, pad.shape[1] - 4

    best_t = None
    best_pack = None
    for qi, (cx, cy) in enumerate(KUWAHARA_QUADS):
        s = np.zeros((th, tw))
        s2 = np.zeros((th, tw))
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                v = pad[2 + cy + dy:2 + cy + dy + th,
                        2 + cx + dx:2 + cx + dx + tw]
                s = s + v
                s2 = s2 + v * v
        t = 9.0 * s2 - s * s
        pack = qi * 4096.0 + s
        if best_t is None:
            best_t, best_pack = t, pack
        else:
            take = t < best_t           # strict: ties keep earlier quad
            best_pack = np.where(take, pack, best_pack)
            best_t = np.where(take, t, best_t)
    return best_pack


def value_histogram(tiles: DataFrame) -> DataFrame:
    """(v, n) value histogram of an integer-valued tile table — the
    distributed partial-aggregate path (explode is map-side, the
    shuffle carries <= n_distinct rows)."""
    ex = tiles.select(F.explode("pixels").alias("v"))
    return ex.groupBy(F.col("v").cast("long").alias("v")).agg(
        F.count(F.lit(1)).alias("n"))


def histogram_match_table(src_tiles: DataFrame,
                          ref_tiles: DataFrame) -> DataFrame:
    """Histogram-matching lookup table: for every source value v, the
    smallest reference value r with cdf_ref(r) >= cdf_src(v), compared
    cross-multiplied in integers (cum_r * n_src >= cum_v * n_ref).

    Returns (v, n_px, dst). Both histograms are tiny (<= 256 rows for
    byte data), so the quantile alignment is a broadcast non-equi join;
    applying the mapping to pixels is then a broadcast hash join —
    nothing about this moves pixel data through a shuffle."""
    from pyspark.sql import Window

    hs = value_histogram(src_tiles)
    hr = value_histogram(ref_tiles)
    ws = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cs = hs.select("v", "n", F.sum("n").over(ws).alias("cum"))
    cr = hr.select(F.col("v").alias("r"), F.sum("n").over(ws).alias("rcum"))
    ns = hs.agg(F.sum("n")).first()[0]
    nr = hr.agg(F.sum("n")).first()[0]
    j = cs.join(
        F.broadcast(cr),
        F.col("rcum") * F.lit(int(ns)) >= F.col("cum") * F.lit(int(nr)),
        "left")
    return j.groupBy("v").agg(
        F.max("n").alias("n_px"),
        F.min("r").alias("dst"))
