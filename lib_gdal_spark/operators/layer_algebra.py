"""OGR layer algebra: Intersection / Clip as distributed cell-join overlays.

Reference semantics: ``drivers/ogrlayer.cpp:2062`` (Intersection, pairwise
nested loop with spatial-filter pushdown + envelope pre-test) and ``:3820``
(Clip: input ∩ union(method), keeping input attributes). Spark shape
(SURVEY.md §2.3):

1. both layers explode to covering cells of their envelopes at ``res``;
2. equi-join on cell -> candidate (input, method) pairs, deduplicated;
3. native envelope-overlap pre-test (the ``ogrlayer.cpp:1377`` shortcut)
   prunes inside codegen;
4. exact geometry clip in an Arrow-batched UDF.

Round-1 geometry scope: method polygons must be **convex** (the
Sutherland–Hodgman kernel, ``geometry.clip_ring_convex``); input polygons
are arbitrary simple rings (holes clipped per-ring). The remaining overlay
modes (Union/SymDifference/Identity/Update/Erase) need a general polygon
difference and are planned on the same join skeleton.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lib_gdal_spark.functions import cells as C
from lib_gdal_spark.functions import geometry as G

_PAIR_SCHEMA = (
    "in_fid long, m_fid long, geom_wkb binary, area double"
)


def _cover_cells(df: DataFrame, res: int, fid_col: str) -> DataFrame:
    def cover(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = {"fid": [], "cell": [], "minx": [], "miny": [],
                   "maxx": [], "maxy": []}
            for fid, wkb in zip(b[fid_col], b["geom_wkb"]):
                minx, miny, maxx, maxy = G.envelope(bytes(wkb))
                x0, y0 = C.lonlat_to_tile(np.array([minx]), np.array([maxy]), res)
                x1, y1 = C.lonlat_to_tile(np.array([maxx]), np.array([miny]), res)
                xs = np.arange(x0[0], x1[0] + 1)
                ys = np.arange(y0[0], y1[0] + 1)
                gx, gy = np.meshgrid(xs, ys)
                cells = C.pack_cell(res, gx.ravel(), gy.ravel())
                k = len(cells)
                out["fid"].extend([fid] * k)
                out["cell"].extend(cells.tolist())
                out["minx"].extend([minx] * k)
                out["miny"].extend([miny] * k)
                out["maxx"].extend([maxx] * k)
                out["maxy"].extend([maxy] * k)
            yield pd.DataFrame(out)

    return df.select(F.col(fid_col).alias(fid_col), "geom_wkb").mapInPandas(
        cover,
        schema="fid long, cell long, minx double, miny double, "
               "maxx double, maxy double",
    )


def intersection(
    input_layer: DataFrame,
    method_layer: DataFrame,
    res: int = 6,
) -> DataFrame:
    """Pairwise intersection -> (in_fid, m_fid, geom_wkb, area).

    ``input_layer``/``method_layer``: (fid long, geom_wkb binary). The
    method layer is assumed broadcastable (the common overlay shape: a big
    feature table against a small zone layer).
    """
    icov = _cover_cells(input_layer, res, "fid").withColumnRenamed("fid", "in_fid")
    mcov = _cover_cells(method_layer, res, "fid").withColumnRenamed("fid", "m_fid")
    pairs = (
        icov.alias("a")
        .join(F.broadcast(mcov.alias("b")), F.col("a.cell") == F.col("b.cell"))
        # envelope-overlap pre-test, native (ogrlayer.cpp:1377)
        .where(
            (F.col("a.minx") <= F.col("b.maxx"))
            & (F.col("a.maxx") >= F.col("b.minx"))
            & (F.col("a.miny") <= F.col("b.maxy"))
            & (F.col("a.maxy") >= F.col("b.miny"))
        )
        .select("in_fid", "m_fid")
        .distinct()
    )
    igeo = input_layer.select(F.col("fid").alias("in_fid"),
                              F.col("geom_wkb").alias("in_wkb"))
    mgeo = F.broadcast(method_layer.select(F.col("fid").alias("m_fid"),
                                           F.col("geom_wkb").alias("m_wkb")))
    cand = pairs.join(igeo, "in_fid").join(mgeo, "m_fid")

    def clip_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for _, r in b.iterrows():
                m_rings = G.polygon_rings(bytes(r["m_wkb"]))
                clip_ring = m_rings[0]  # convex method polygon, no holes
                out_rings = []
                for ring in G.polygon_rings(bytes(r["in_wkb"])):
                    c = G.clip_ring_convex(ring, clip_ring)
                    if c is not None:
                        out_rings.append(c)
                if not out_rings:
                    continue
                area = G.shoelace_area(out_rings)
                if area <= 0.0:
                    continue
                rows.append({
                    "in_fid": r["in_fid"], "m_fid": r["m_fid"],
                    "geom_wkb": G.wkb_polygon(out_rings),
                    "area": area,
                })
            yield pd.DataFrame(
                rows, columns=["in_fid", "m_fid", "geom_wkb", "area"]
            )

    return cand.mapInPandas(clip_batch, schema=_PAIR_SCHEMA)


def clip(
    input_layer: DataFrame,
    method_layer: DataFrame,
    res: int = 6,
) -> DataFrame:
    """OGR Clip (ogrlayer.cpp:3820): input ∩ union(method), input attrs.

    With disjoint method polygons (the typical zone layer) the union is the
    concatenation of per-method pieces; the result keeps one row per
    (in_fid) with total clipped area and a MultiPolygon of the pieces.
    """
    pieces = intersection(input_layer, method_layer, res=res)

    def merge(key, pdf: pd.DataFrame) -> pd.DataFrame:
        polys = [G.polygon_rings(bytes(w)) for w in pdf["geom_wkb"]]
        return pd.DataFrame([{
            "in_fid": key[0],
            "geom_wkb": G.wkb_multipolygon(polys),
            "area": float(pdf["area"].sum()),
            "n_pieces": len(polys),
        }])

    return pieces.groupBy("in_fid").applyInPandas(
        merge,
        schema="in_fid long, geom_wkb binary, area double, n_pieces long",
    )
