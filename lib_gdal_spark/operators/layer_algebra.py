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


def erase(
    input_layer: DataFrame,
    method_layer: DataFrame,
) -> DataFrame:
    """OGR Erase (ogrlayer.cpp:4079): input minus union(method), input attrs.

    Method polygons must be convex (the convex-difference decomposition,
    ``geometry.erase_ring_convex``); the method layer is collected as the
    broadcast dim (zone-layer shape), so the big input side never shuffles —
    one mapInPandas pass with per-feature envelope pre-tests. Output one row
    per surviving input feature: (in_fid, geom_wkb MultiPolygon, area);
    fully-erased features are dropped (reference emits no empty features).
    """
    methods = [
        (G.envelope(bytes(r["geom_wkb"])),
         G.polygon_rings(bytes(r["geom_wkb"]))[0])
        for r in method_layer.select("geom_wkb").collect()
    ]

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for _, r in b.iterrows():
                env = G.envelope(bytes(r["geom_wkb"]))
                # hole-free inputs (each ring treated as its own polygon)
                cur: list[list[np.ndarray]] = [
                    [ring] for ring in G.polygon_rings(bytes(r["geom_wkb"]))
                ]
                for (menv, mring) in methods:
                    if (env[0] > menv[2] or env[2] < menv[0]
                            or env[1] > menv[3] or env[3] < menv[1]):
                        continue
                    nxt: list[list[np.ndarray]] = []
                    for poly in cur:
                        for ring in poly:
                            for piece in G.erase_ring_convex(ring, mring):
                                nxt.append([piece])
                    cur = nxt
                if not cur:
                    continue
                area = sum(G.shoelace_area(p) for p in cur)
                if area <= 0.0:
                    continue
                rows.append({
                    "in_fid": r["fid"],
                    "geom_wkb": G.wkb_multipolygon(cur),
                    "area": area,
                })
            yield pd.DataFrame(rows,
                               columns=["in_fid", "geom_wkb", "area"])

    return input_layer.select("fid", "geom_wkb").mapInPandas(
        work, schema="in_fid long, geom_wkb binary, area double"
    )


def identity_overlay(
    input_layer: DataFrame,
    method_layer: DataFrame,
    res: int = 6,
) -> DataFrame:
    """OGR Identity (ogrlayer.cpp:3183): input split by the method layer —
    intersection pieces carry m_fid, the erased remainder carries NULL."""
    inter = intersection(input_layer, method_layer, res=res)
    rem = erase(input_layer, method_layer).select(
        "in_fid", F.lit(None).cast("long").alias("m_fid"), "geom_wkb", "area"
    )
    return inter.select("in_fid", "m_fid", "geom_wkb", "area").unionByName(rem)


def update_overlay(
    input_layer: DataFrame,
    method_layer: DataFrame,
) -> DataFrame:
    """OGR Update (ogrlayer.cpp:3528): method features replace overlapping
    input areas — erased input remainders plus the method features."""
    rem = erase(input_layer, method_layer).select(
        "in_fid", F.lit("input").alias("src"), "geom_wkb", "area"
    )

    def with_area(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for _, r in b.iterrows():
                rings = G.polygon_rings(bytes(r["geom_wkb"]))
                rows.append({
                    "in_fid": r["fid"], "src": "method",
                    "geom_wkb": bytes(r["geom_wkb"]),
                    "area": G.shoelace_area(rings),
                })
            yield pd.DataFrame(rows,
                               columns=["in_fid", "src", "geom_wkb", "area"])

    m = method_layer.select("fid", "geom_wkb").mapInPandas(
        with_area, schema="in_fid long, src string, geom_wkb binary, area double"
    )
    return rem.unionByName(m)


def sym_difference(
    input_layer: DataFrame,
    method_layer: DataFrame,
) -> DataFrame:
    """OGR SymDifference (ogrlayer.cpp:2838): areas in exactly one layer.
    Requires both layers convex (each direction erases by the other)."""
    a = erase(input_layer, method_layer).select(
        F.col("in_fid").alias("fid"), F.lit("input").alias("src"),
        "geom_wkb", "area",
    )
    b = erase(method_layer, input_layer).select(
        F.col("in_fid").alias("fid"), F.lit("method").alias("src"),
        "geom_wkb", "area",
    )
    return a.unionByName(b)


def union_overlay(
    input_layer: DataFrame,
    method_layer: DataFrame,
    res: int = 6,
) -> DataFrame:
    """OGR Union (ogrlayer.cpp:2408): the overlay split — A∩B pieces plus
    A\\B plus B\\A (both layers convex for the difference directions)."""
    inter = intersection(input_layer, method_layer, res=res).select(
        "in_fid", "m_fid", "geom_wkb", "area"
    )
    a = erase(input_layer, method_layer).select(
        "in_fid", F.lit(None).cast("long").alias("m_fid"), "geom_wkb", "area"
    )
    b = erase(method_layer, input_layer).select(
        F.lit(None).cast("long").alias("in_fid"),
        F.col("in_fid").alias("m_fid"), "geom_wkb", "area",
    )
    return inter.unionByName(a).unionByName(b)


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
