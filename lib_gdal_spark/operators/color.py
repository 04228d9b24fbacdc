"""Color-table operators: median-cut palette, Floyd–Steinberg dither,
nearblack border cleanup.

References: ``core/alg/gdalmediancut.cpp:107`` (GDALComputeMedianCutPCT),
``core/alg/gdaldither.cpp`` (GDALDitherRGB2PCT, Floyd–Steinberg error
diffusion), ``apps/nearblack_lib.cpp`` (border near-black flood).

Distribution notes:
- The median-cut HISTOGRAM is a distributed aggregate (5-bit-per-channel
  color counts, <= 32768 rows); the box-splitting runs on the driver over
  that tiny histogram, exactly like the reference.
- Dither diffuses error serially; the distributed form diffuses within
  each tile independently (errors do not cross tile seams — documented
  deviation; per-tile output is bit-exact vs the per-tile reference).
- Nearblack = connected near-target region touching the image border;
  re-expressed on the distributed component machinery (per-tile labeling
  + large-star/small-star merge + border-touch flag), so it scales like
  polygonize instead of scanning on one node.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lib_gdal_spark.operators.components import connected_components
from lib_gdal_spark.operators.polygonize import _label_tile
from lib_gdal_spark.sources.rasters import RASTER_COLS, RASTER_SCHEMA


def median_cut_palette(
    tiles: DataFrame,
    n_colors: int = 256,
    bands: tuple[int, int, int] = (1, 2, 3),
) -> list[tuple[int, int, int]]:
    """RGB tile table -> palette of ``n_colors`` (r, g, b) entries.

    Distributed 5-bit histogram (GDAL's 32768-cell cube) + driver-side
    median-cut box splitting (largest box by count, split at the median of
    its widest channel — gdalmediancut.cpp semantics).
    """
    rb, gb, bb = bands

    # per-tile partial 5-bit histograms in ONE Arrow pass (bands zipped
    # inside the tile group — no O(pixels) explode/join shuffle; shuffle
    # volume is tiles x <=32768 nonzero color cells)
    def tile_hist(key, pdf: pd.DataFrame) -> pd.DataFrame:
        by_band = {int(r["band"]): r for _, r in pdf.iterrows()}
        if not all(k in by_band for k in (rb, gb, bb)):
            return pd.DataFrame(columns=["code", "n"])
        chans = [
            (np.asarray(by_band[k]["pixels"], np.float64)
             .astype(np.int64) >> 3)
            for k in (rb, gb, bb)
        ]
        code = (chans[0] << 10) | (chans[1] << 5) | chans[2]
        cnt = np.bincount(code, minlength=1)
        nz = np.nonzero(cnt)[0]
        return pd.DataFrame({"code": nz.astype(np.int64),
                             "n": cnt[nz].astype(np.int64)})

    hist_df = (
        tiles.where(F.col("band").isin([rb, gb, bb]))
        .groupBy("tile_x", "tile_y")
        .applyInPandas(tile_hist, schema="code long, n long")
        .groupBy("code").agg(F.sum("n").alias("n"))
    )
    hist = hist_df.select(
        F.shiftright("code", 10).bitwiseAND(F.lit(31)).alias("r5"),
        F.shiftright("code", 5).bitwiseAND(F.lit(31)).alias("g5"),
        F.col("code").bitwiseAND(F.lit(31)).alias("b5"),
        "n",
    ).collect()
    cells = np.array([(h["r5"], h["g5"], h["b5"], h["n"]) for h in hist],
                     dtype=np.int64)

    boxes = [cells]
    while len(boxes) < n_colors:
        # split the most-populated splittable box
        boxes.sort(key=lambda c: -int(c[:, 3].sum()))
        for bi, box in enumerate(boxes):
            spans = [box[:, k].max() - box[:, k].min() for k in range(3)]
            axis = int(np.argmax(spans))
            if spans[axis] == 0:
                continue
            order = np.argsort(box[:, axis], kind="stable")
            sorted_box = box[order]
            csum = np.cumsum(sorted_box[:, 3])
            half = csum[-1] / 2.0
            cut = int(np.searchsorted(csum, half)) + 1
            cut = min(max(cut, 1), len(sorted_box) - 1)
            boxes.pop(bi)
            boxes.append(sorted_box[:cut])
            boxes.append(sorted_box[cut:])
            break
        else:
            break  # nothing splittable
    palette = []
    for box in boxes:
        w = box[:, 3].astype(np.float64)
        tot = w.sum()
        palette.append(tuple(
            int(round(((box[:, k] * 8 + 4) * w).sum() / tot))
            for k in range(3)
        ))
    return sorted(palette)


def dither_rgb_to_pct(
    tiles: DataFrame,
    palette: list[tuple[int, int, int]],
    bands: tuple[int, int, int] = (1, 2, 3),
    out_id: str = "dithered",
) -> DataFrame:
    """Floyd–Steinberg dither to the palette, per tile (seam-independent).

    Error weights 7/16 right, 3/16 down-left, 5/16 down, 1/16 down-right —
    gdaldither.cpp's kernel; palette lookup is nearest-RGB (squared
    distance), like the reference without the optional hash cache.
    """
    pal = np.asarray(palette, dtype=np.float64)
    rb, gb, bb = bands

    def work(key, pdf: pd.DataFrame) -> pd.DataFrame:
        tx, ty = int(key[0]), int(key[1])
        by_band = {int(r["band"]): r for _, r in pdf.iterrows()}
        if not all(k in by_band for k in (rb, gb, bb)):
            return pd.DataFrame(columns=RASTER_COLS)
        r0 = by_band[rb]
        th, tw = int(r0["tile_h"]), int(r0["tile_w"])
        img = np.stack([
            np.asarray(by_band[k]["pixels"], np.float64).reshape(th, tw)
            for k in (rb, gb, bb)
        ], axis=-1)
        out = np.zeros((th, tw), dtype=np.float64)
        err = np.zeros((th, tw, 3))
        for y in range(th):
            for x in range(tw):
                v = img[y, x] + err[y, x]
                d2 = ((pal - v[None, :]) ** 2).sum(1)
                k = int(np.argmin(d2))
                out[y, x] = k
                e = v - pal[k]
                if x + 1 < tw:
                    err[y, x + 1] += e * (7 / 16)
                if y + 1 < th:
                    if x > 0:
                        err[y + 1, x - 1] += e * (3 / 16)
                    err[y + 1, x] += e * (5 / 16)
                    if x + 1 < tw:
                        err[y + 1, x + 1] += e * (1 / 16)
        row = {k: r0[k] for k in (
            "zoom", "tile_x", "tile_y", "tile_w", "tile_h",
            "gt0", "gt1", "gt2", "gt3", "gt4", "gt5", "nodata",
        )}
        row.update(raster_id=out_id, band=1, dtype="uint8",
                   pixels=out.ravel().tolist())
        return pd.DataFrame([row])[RASTER_COLS]

    return tiles.where(F.col("band").isin([rb, gb, bb])).groupBy(
        "tile_x", "tile_y"
    ).applyInPandas(work, schema=RASTER_SCHEMA)


def nearblack(
    tiles: DataFrame,
    spark: SparkSession,
    grid_w: int,
    grid_h: int,
    near: float = 15.0,
    target: float = 0.0,
    tile: int = 64,
    out_id: str = "nearblack",
    max_driver_rows: int = 5_000_000,
) -> DataFrame:
    """Set the border-connected near-``target`` region to ``target``.

    nearblack_lib.cpp collapses the near-black collar scanned inward from
    the image edges; the equivalent set is the 4-connected component(s) of
    ``|v - target| <= near`` pixels touching the raster border. Runs on
    the distributed component machinery — per-tile labeling of the near
    mask, large-star/small-star seam merge, border-touch aggregation, and
    a one-pass rewrite of only the flagged labels.
    """
    def label_pass(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            outs = []
            for _, r in b.iterrows():
                th, tw = int(r["tile_h"]), int(r["tile_w"])
                vals = np.asarray(r["pixels"], np.float64).reshape(th, tw)
                x0 = int(r["tile_x"]) * tile
                y0 = int(r["tile_y"]) * tile
                nearm = np.where(np.abs(vals - target) <= near, 1.0, 0.0)
                lab = _label_tile(nearm, background=0.0)
                fg = lab >= 0
                if not fg.any():
                    continue
                ly, lx = np.divmod(lab[fg], tw)
                glab = (y0 + ly) * grid_w + (x0 + lx)
                py, px = np.nonzero(fg)
                gx, gy = px + x0, py + y0
                touches = ((gx == 0) | (gx == grid_w - 1)
                           | (gy == 0) | (gy == grid_h - 1))
                outs.append(pd.DataFrame({
                    "kind": 0, "label": glab, "px": gx, "py": gy,
                    "touch": touches.astype(np.int64),
                }))
                edge = (px == 0) | (px == tw - 1) | (py == 0) | (py == th - 1)
                outs.append(pd.DataFrame({
                    "kind": 1, "label": glab[edge],
                    "px": gx[edge], "py": gy[edge], "touch": 0,
                }))
            yield (pd.concat(outs, ignore_index=True) if outs else
                   pd.DataFrame({"kind": [], "label": [], "px": [],
                                 "py": [], "touch": []}))

    pieces = tiles.mapInPandas(
        label_pass,
        schema="kind int, label long, px long, py long, touch long",
    ).persist()
    borders = pieces.where(F.col("kind") == 1)

    def adj(dx, dy):
        a = borders.select((F.col("px") + dx).alias("jx"),
                           (F.col("py") + dy).alias("jy"),
                           F.col("label").alias("la"))
        bdf = borders.select(F.col("px").alias("jx"),
                             F.col("py").alias("jy"),
                             F.col("label").alias("lb"))
        return a.join(bdf, ["jx", "jy"]).where(
            F.col("la") != F.col("lb")).select("la", "lb")

    mapping = connected_components(adj(1, 0).unionByName(adj(0, 1)))
    labs = pieces.where(F.col("kind") == 0).select("label", "touch")
    lab_comp = labs.join(mapping, "label", "left").withColumn(
        "component", F.coalesce("component", "label")
    )
    flagged_comps = (
        lab_comp.groupBy("component").agg(F.max("touch").alias("t"))
        .where(F.col("t") > 0).select("component")
    )
    flagged_df = lab_comp.join(
        F.broadcast(flagged_comps), "component", "leftsemi"
    ).select("label").distinct().localCheckpoint()
    n_flag = flagged_df.count()
    if n_flag > max_driver_rows:
        raise RuntimeError(
            f"nearblack collar spans {n_flag} per-tile labels (> "
            f"max_driver_rows); shrink `near` or raise the guard"
        )
    flagged_labels = [r["label"] for r in flagged_df.collect()]
    flag = np.sort(np.array(flagged_labels, dtype=np.int64))
    pieces.unpersist()

    def rewrite(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for _, r in b.iterrows():
                th, tw = int(r["tile_h"]), int(r["tile_w"])
                vals = np.array(r["pixels"], np.float64).reshape(th, tw)
                x0 = int(r["tile_x"]) * tile
                y0 = int(r["tile_y"]) * tile
                nearm = np.where(np.abs(vals - target) <= near, 1.0, 0.0)
                lab = _label_tile(nearm, background=0.0)
                fg = lab >= 0
                if fg.any() and len(flag):
                    ly, lx = np.divmod(lab[fg], tw)
                    glab = (y0 + ly) * grid_w + (x0 + lx)
                    pos = np.clip(np.searchsorted(flag, glab), 0,
                                  len(flag) - 1)
                    hit = flag[pos] == glab
                    v = vals[fg]
                    v[hit] = target
                    vals[fg] = v
                row = {k: r[k] for k in RASTER_COLS if k not in
                       ("raster_id", "pixels")}
                row["raster_id"] = out_id
                row["pixels"] = vals.ravel().tolist()
                rows.append(row)
            yield pd.DataFrame(rows, columns=RASTER_COLS)

    return tiles.mapInPandas(rewrite, schema=RASTER_SCHEMA)


def dither_rgb_to_pct_exact(
    tiles: DataFrame,
    palette: list[tuple[int, int, int]],
    grid_w: int,
    grid_h: int,
    tile: int = 64,
    bands: tuple[int, int, int] = (1, 2, 3),
    out_id: str = "dithered",
) -> DataFrame:
    """Whole-image Floyd–Steinberg, bit-exact to gdaldither.cpp's serial
    top-to-bottom / left-to-right scan.

    Error diffusion is inherently sequential in BOTH directions, so exact
    parity assembles each raster in ONE task (parallelism across rasters,
    like the reference's per-dataset call); ``dither_rgb_to_pct`` is the
    per-tile seam-independent scale path.
    """
    pal = np.asarray(palette, dtype=np.float64)
    rb, gb, bb = bands

    def work(key, pdf: pd.DataFrame) -> pd.DataFrame:
        rid = key[0]
        img = np.zeros((grid_h, grid_w, 3))
        meta = {}
        for _, r in pdf.iterrows():
            band = int(r["band"])
            ch = {rb: 0, gb: 1, bb: 2}.get(band)
            if ch is None:
                continue
            th, tw = int(r["tile_h"]), int(r["tile_w"])
            y0 = int(r["tile_y"]) * tile
            x0 = int(r["tile_x"]) * tile
            img[y0:y0 + th, x0:x0 + tw, ch] = np.asarray(
                r["pixels"], np.float64).reshape(th, tw)
            meta[(int(r["tile_x"]), int(r["tile_y"]))] = r
        out = np.zeros((grid_h, grid_w))
        err = np.zeros((grid_h, grid_w, 3))
        for y in range(grid_h):
            for x in range(grid_w):
                v = img[y, x] + err[y, x]
                k = int(np.argmin(((pal - v[None, :]) ** 2).sum(1)))
                out[y, x] = k
                e = v - pal[k]
                if x + 1 < grid_w:
                    err[y, x + 1] += e * (7 / 16)
                if y + 1 < grid_h:
                    if x > 0:
                        err[y + 1, x - 1] += e * (3 / 16)
                    err[y + 1, x] += e * (5 / 16)
                    if x + 1 < grid_w:
                        err[y + 1, x + 1] += e * (1 / 16)
        rows = []
        for (tx, ty), r in meta.items():
            th, tw = int(r["tile_h"]), int(r["tile_w"])
            patch = out[ty * tile:ty * tile + th, tx * tile:tx * tile + tw]
            row = {k2: r[k2] for k2 in (
                "zoom", "tile_x", "tile_y", "tile_w", "tile_h",
                "gt0", "gt1", "gt2", "gt3", "gt4", "gt5", "nodata",
            )}
            row.update(raster_id=out_id, band=1, dtype="uint8",
                       pixels=patch.ravel().tolist())
            rows.append(row)
        return pd.DataFrame(rows)[RASTER_COLS]

    return tiles.where(F.col("band").isin([rb, gb, bb])).groupBy(
        "raster_id"
    ).applyInPandas(work, schema=RASTER_SCHEMA)


def pct_to_rgb(
    tiles: DataFrame,
    palette: list[tuple[int, int, int]],
    out_id: str = "rgb",
) -> DataFrame:
    """pct2rgb (the inverse of GDALDitherRGB2PCT): expand palette-index
    tiles back to 3 RGB bands — a pure JVM array lookup per channel."""
    out = []
    for ch in range(3):
        lut = F.array(*[F.lit(float(c[ch])) for c in palette])
        out.append(
            tiles.select(
                F.lit(out_id).alias("raster_id"),
                F.lit(ch + 1).alias("band"),
                "zoom", "tile_x", "tile_y",
                F.lit("uint8").alias("dtype"), "tile_w", "tile_h",
                "gt0", "gt1", "gt2", "gt3", "gt4", "gt5", "nodata",
                F.transform(
                    "pixels",
                    lambda v: F.element_at(lut, v.cast("int") + 1),
                ).alias("pixels"),
            )
        )
    res = out[0]
    for o in out[1:]:
        res = res.unionByName(o)
    return res


def equalize(tiles: DataFrame, bins: int = 256,
             out_id: str = "equalized") -> DataFrame:
    """gdalenhance -equalize (``apps/gdalenhance.cpp``): per-band
    histogram-equalization LUT, reference arithmetic exactly —

    - default byte histogram over [-0.5, 255.5) with ``bins`` buckets;
    - extreme bins zeroed (nodata guard, ``panHistogram[0] =
      panHistogram[n-1] = 0``);
    - cumulative ``cum[i] = total_before + hist[i] // 2`` (integer);
    - ``LUT[i] = clamp(cum[i] * bins // total, 0, bins-1)``;
    - output pixel = LUT[bin(v)].

    The histogram is the existing distributed per-tile bincount (tiny
    per-band result to the driver); the LUT applies JVM-side via
    ``element_at`` on a literal array — no Python in the pixel path.
    """
    from lib_gdal_spark.operators.stats import band_histogram

    vmin, vmax = -0.5, 255.5
    hist_rows = band_histogram(tiles, vmin, vmax, buckets=bins).collect()
    hists: dict[tuple, np.ndarray] = {}
    for r in hist_rows:
        key = (r["raster_id"], r["band"], r["zoom"])
        h = hists.setdefault(key, np.zeros(bins, dtype=np.int64))
        h[int(r["bucket"])] += int(r["count"])
    luts = {}
    for key, h in hists.items():
        h = h.copy()
        h[0] = 0
        h[-1] = 0
        cum = np.zeros(bins, dtype=np.int64)
        total = 0
        for i in range(bins):
            cum[i] = total + h[i] // 2
            total += int(h[i])
        total = max(total, 1)
        lut = np.clip(cum * bins // total, 0, bins - 1).astype(np.int64)
        luts[key] = lut

    scale = bins / (vmax - vmin)
    out = None
    for (rid, band, zoom), lut in sorted(luts.items()):
        part = tiles.where(
            (F.col("raster_id") == rid) & (F.col("band") == band)
            & (F.col("zoom") == zoom)
        )
        lut_col = F.array(*[F.lit(int(v)) for v in lut])
        px = F.transform(
            "pixels",
            lambda v: F.element_at(
                lut_col,
                F.greatest(
                    F.lit(1),
                    F.least(
                        F.lit(bins),
                        (F.floor((v - F.lit(vmin)) * F.lit(scale)) + 1)
                        .cast("int"),
                    ),
                ),
            ).cast("double"),
        )
        p = part.withColumn("pixels", px).withColumn(
            "raster_id", F.lit(out_id)
        )
        out = p if out is None else out.unionByName(p)
    if out is None:
        return tiles.limit(0)
    return out
