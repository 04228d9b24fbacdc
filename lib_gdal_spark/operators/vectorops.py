"""ogr2ogr geometry restructuring flags: -explodecollections and
-wrapdateline.

Re-expressed from ``apps/ogr2ogr_lib.cpp`` (option handling) and
``core/ogr/ogrgeometryfactory.cpp`` (the WRAPDATELINE transform): both are
narrow Arrow-batched maps over the WKB column — no shuffle, no driver
state; row counts may grow (one row per part), which is exactly the
semantics of the reference flags.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: F401 (kept for callers)

from lib_gdal_spark.functions import geometry as G

_SINGLE_OF = {
    G.WKB_MULTIPOINT: lambda p: [G.wkb_point(*pt[:2]) for pt in np.asarray(p)],
    G.WKB_MULTILINESTRING: lambda p: [G.wkb_linestring(np.asarray(ln))
                                      for ln in p],
    G.WKB_MULTIPOLYGON: lambda p: [G.wkb_polygon([np.asarray(r) for r in poly])
                                   for poly in p],
}


def _explode_parsed(base: int, ndim: int, payload) -> list[bytes]:
    if base in _SINGLE_OF:
        return _SINGLE_OF[base](payload)
    if base == G.WKB_GEOMETRYCOLLECTION:
        out = []
        for b, nd, p in payload:
            out.extend(_explode_parsed(b, nd, p))
        return out
    return [G._reencode_member(base, ndim, payload)]


def _explode_one(wkb: bytes) -> list[bytes]:
    base, ndim, payload = G.parse_wkb_full(wkb)
    if base in _SINGLE_OF or base == G.WKB_GEOMETRYCOLLECTION:
        return _explode_parsed(base, ndim, payload)
    return [bytes(wkb)]


def explode_collections(df: DataFrame, wkb_col: str = "geom_wkb",
                        id_col: str = "fid") -> DataFrame:
    """ogr2ogr -explodecollections: one output feature per collection
    member (nested GeometryCollections flatten recursively); singles pass
    through with part 0. Adds a ``part`` column; other columns carry over.
    """
    cols = df.columns
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", part int"

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for _, r in b.iterrows():
                parts = _explode_one(bytes(r[wkb_col]))
                for i, p in enumerate(parts):
                    row = {c: r[c] for c in cols}
                    row[wkb_col] = p
                    row["part"] = i
                    rows.append(row)
            yield pd.DataFrame(rows, columns=[*cols, "part"])

    return df.mapInPandas(work, schema=schema)


def _crosses_dateline(lons: np.ndarray) -> bool:
    return bool(np.any(np.abs(np.diff(lons)) > 180.0))


def _norm360(pts: np.ndarray) -> np.ndarray:
    out = np.array(pts, dtype=np.float64)
    out[:, 0] = np.where(out[:, 0] < 0.0, out[:, 0] + 360.0, out[:, 0])
    return out


def _wrap_line(pts: np.ndarray) -> list[np.ndarray]:
    """Split a crossing LineString at lon=180 (linear interpolation at the
    crossing, like OGRGeometryFactory::SplitLineStringAtDateline)."""
    n = _norm360(pts)
    parts: list[list[list[float]]] = [[]]
    for i in range(len(n)):
        x, y = n[i, 0], n[i, 1]
        if i > 0:
            x0, y0 = n[i - 1, 0], n[i - 1, 1]
            if (x0 - 180.0) * (x - 180.0) < 0.0:  # segment crosses 180
                t = (180.0 - x0) / (x - x0)
                yc = y0 + t * (y - y0)
                xc_prev = 180.0 if x0 < 180.0 else -180.0
                parts[-1].append([xc_prev, yc])
                parts.append([[-xc_prev, yc]])
        parts[-1].append([x - 360.0 if x > 180.0 else x, y])
    return [np.asarray(p) for p in parts if len(p) >= 2]


_WEST_BOX = G.box_ring(0.0, -91.0, 180.0, 91.0)
_EAST_BOX = G.box_ring(180.0, -91.0, 360.0, 91.0)


def _wrap_polygon(rings: list[np.ndarray]) -> list[list[np.ndarray]]:
    """Clip a crossing polygon into the [..180] and [180..] halves
    (the relational analog of the reference's
    CutGeometryOnDateLineAndAddToMulti; holes that THEMSELVES straddle
    the seam go through the general overlay — ``apps/ogr2ogr_lib.cpp``
    routes those through transformWithOptions' full geometry factory).

    Fast path (outer crosses, holes don't): Sutherland-Hodgman per ring
    against the half-world boxes — intersection distributes over the
    even-odd difference, so clipping rings independently is exact.
    General path (a hole crosses the seam): even-odd ring-soup boolean
    intersection with each half box (functions/overlay.py), which
    re-nodes hole edges that land on the cut line and splits the outer
    when a seam-spanning hole severs it."""
    if any(_crosses_dateline(_norm360(r)[:, 0]) for r in rings[1:]):
        from lib_gdal_spark.functions import overlay as OV

        soup = [_norm360(r) for r in rings]
        out = []
        for box, shift in ((_WEST_BOX, 0.0), (_EAST_BOX, -360.0)):
            for poly in OV.boolean_op(soup, [np.asarray(box)],
                                      "intersection"):
                shifted = []
                for r in poly:
                    r = np.array(r, dtype=np.float64)
                    r[:, 0] += shift
                    shifted.append(r)
                out.append(shifted)
        return out
    out = []
    for box, shift in ((_WEST_BOX, 0.0), (_EAST_BOX, -360.0)):
        clipped = []
        for ring in rings:
            c = G.clip_ring_convex(_norm360(ring), box)
            if c is not None and len(c) >= 3:
                c = np.array(c, dtype=np.float64)
                c[:, 0] += shift
                clipped.append(c)
        if clipped:
            out.append(clipped)
    return out


def wrap_dateline(df: DataFrame, wkb_col: str = "geom_wkb") -> DataFrame:
    """ogr2ogr -wrapdateline: geometries crossing the antimeridian split
    into parts whose longitudes all lie in [-180, 180]; non-crossing
    geometries pass through untouched with part 0. LineString/Polygon
    (holes included — each ring clips independently) and their Multi*
    containers are supported — each member splits independently, like the
    reference's per-geometry CutGeometryOnDateLineAndAddToMulti loop."""
    cols = df.columns
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", part int"

    def split_line(payload) -> list[bytes] | None:
        pts = np.asarray(payload, dtype=np.float64)
        if not _crosses_dateline(pts[:, 0]):
            return None
        return [G.wkb_linestring(p) for p in _wrap_line(pts)]

    def split_poly(payload) -> list[bytes] | None:
        rings = [np.asarray(r, dtype=np.float64) for r in payload]
        if not _crosses_dateline(rings[0][:, 0]):
            return None
        return [G.wkb_polygon(r) for r in _wrap_polygon(rings)]

    def split_one(wkb: bytes) -> list[bytes]:
        base, _, payload = G.parse_wkb_full(wkb)
        if base == G.WKB_LINESTRING:
            return split_line(payload) or [bytes(wkb)]
        if base == G.WKB_POLYGON:
            return split_poly(payload) or [bytes(wkb)]
        if base == G.WKB_MULTILINESTRING:
            out = []
            for ln in payload:
                out.extend(split_line(ln)
                           or [G.wkb_linestring(np.asarray(ln, np.float64))])
            return out
        if base == G.WKB_MULTIPOLYGON:
            out = []
            for poly in payload:
                out.extend(split_poly(poly) or [G.wkb_polygon(
                    [np.asarray(r, np.float64) for r in poly])])
            return out
        return [bytes(wkb)]

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for _, r in b.iterrows():
                for i, p in enumerate(split_one(bytes(r[wkb_col]))):
                    row = {c: r[c] for c in cols}
                    row[wkb_col] = p
                    row["part"] = i
                    rows.append(row)
            yield pd.DataFrame(rows, columns=[*cols, "part"])

    return df.mapInPandas(work, schema=schema)


def min_rotated_rect(verts: DataFrame) -> DataFrame:
    """Minimum-area rotated (oriented) bounding rectangle per feature —
    GEOS ``MinimumRotatedRectangle`` parity (the reference exposes it
    through OGR's GEOS bridge) via rotating calipers (Toussaint 1983):
    the optimal rectangle has one side collinear with a CONVEX-HULL
    edge, so minimize over hull edges the product of the vertex extents
    along the edge direction and its normal.

    ``verts``: (fid, idx, x, y) — one row per ring vertex, any order.
    The optimal rectangle has a side collinear with a CONVEX-HULL edge
    (which for a non-convex ring need not be a polygon edge), so the
    candidate directions are ALL vertex pairs — a superset of every
    hull edge, guaranteeing the optimum without computing the hull
    (documented trade: O(V^2) directions x O(V) projections per
    feature; fine for cartographic rings — hull-prune first for very
    dense geometries).

    Fully declarative — pair explode + vertex join + min/max groupBy +
    row_number argmin, no UDF: per direction d = (dx, dy), projections
    p.d and p.n (n the left normal), width = extent_d / |d|, height =
    extent_n / |d|, area = width * height; ties break to the smallest
    pair key. Every expression is the same fixed float chain in the
    SQL oracle. Returns (fid, area, width, height)."""
    from pyspark.sql import Window

    nxt = verts.select(F.col("fid").alias("f2"),
                       F.col("idx").alias("i2"),
                       F.col("x").alias("x2"), F.col("y").alias("y2"))
    edges = (verts
             .join(nxt, (F.col("fid") == F.col("f2"))
                   & (F.col("idx") < F.col("i2")))
             .select("fid",
                     (F.col("idx") * 65536 + F.col("i2")).alias("e"),
                     (F.col("x2") - F.col("x")).alias("dx"),
                     (F.col("y2") - F.col("y")).alias("dy"))
             .where((F.col("dx") != 0) | (F.col("dy") != 0)))
    pv = verts.select(F.col("fid").alias("pf"),
                      F.col("x").alias("px"), F.col("y").alias("py"))
    pr = (edges.join(pv, F.col("fid") == F.col("pf"))
          .select("fid", "e", "dx", "dy",
                  (F.col("px") * F.col("dx")
                   + F.col("py") * F.col("dy")).alias("u"),
                  (F.col("px") * (-F.col("dy"))
                   + F.col("py") * F.col("dx")).alias("v")))
    ext = pr.groupBy("fid", "e", "dx", "dy").agg(
        F.max("u").alias("u1"), F.min("u").alias("u0"),
        F.max("v").alias("v1"), F.min("v").alias("v0"))
    ln = F.sqrt(F.col("dx") * F.col("dx") + F.col("dy") * F.col("dy"))
    w = (F.col("u1") - F.col("u0")) / ln
    h = (F.col("v1") - F.col("v0")) / ln
    scored = ext.select("fid", "e", w.alias("w"), h.alias("h"),
                        (w * h).alias("area"))
    win = Window.partitionBy("fid").orderBy("area", "e")
    return (scored.withColumn("rn", F.row_number().over(win))
            .where(F.col("rn") == 1)
            .select("fid", F.round("area", 9).alias("area"),
                    F.round("w", 9).alias("width"),
                    F.round("h", 9).alias("height")))
