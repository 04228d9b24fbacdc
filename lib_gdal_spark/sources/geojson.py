"""GeoJSON vector source — the reference's geojson driver
(``drivers/vector/geojson``) re-expressed as a distributed reader.

RFC 7946 geometries map onto the engine's WKB codec (Point, MultiPoint,
LineString, MultiLineString, Polygon, MultiPolygon, GeometryCollection,
with optional Z); properties land in a ``map<string,string>`` column the
OGR-SQL helpers (``HSTORE_GET_VALUE``-style access) can reach, plus FID
from the feature ``id`` when present (sequential otherwise, the driver's
AUTO_FID behavior).

Two layouts:

- :func:`read_geojson` — one FeatureCollection document (possibly
  pretty-printed): parsed once, features distributed afterwards. Fine
  for layer-sized files.
- :func:`read_geojson_seq` — newline-delimited GeoJSON (GeoJSONSeq / one
  feature per line): ``spark.read.text`` + per-batch parse, fully
  distributed end to end — the layout to use at scale.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from lib_gdal_spark.functions import geometry as G

LAYER_SCHEMA = ("fid long, geom_wkb binary, "
                "properties map<string,string>")


def geojson_geometry_to_wkb(geom: dict | None) -> bytes | None:
    """RFC 7946 geometry object -> WKB (None-geometry features pass
    through as NULL, the OGR null-geometry path)."""
    if geom is None:
        return None
    t = geom["type"]
    c = geom.get("coordinates")
    if t == "Point":
        return G.wkb_point(*c[:3]) if len(c) >= 3 else G.wkb_point(c[0], c[1])
    if t == "MultiPoint":
        return G.wkb_multipoint(np.asarray(c, dtype=np.float64))
    if t == "LineString":
        return G.wkb_linestring(np.asarray(c, dtype=np.float64))
    if t == "MultiLineString":
        return G.wkb_multilinestring(
            [np.asarray(ln, dtype=np.float64) for ln in c])
    if t == "Polygon":
        return G.wkb_polygon([np.asarray(r, dtype=np.float64) for r in c])
    if t == "MultiPolygon":
        return G.wkb_multipolygon(
            [[np.asarray(r, dtype=np.float64) for r in poly] for poly in c])
    if t == "GeometryCollection":
        return G.wkb_geometrycollection(
            [geojson_geometry_to_wkb(g) for g in geom["geometries"]])
    raise ValueError(f"unsupported GeoJSON geometry type {t!r}")


def _feature_row(feat: dict, auto_fid: int) -> tuple:
    fid = feat.get("id", auto_fid)
    try:
        fid = int(fid)
    except (TypeError, ValueError):
        fid = auto_fid
    props = {
        str(k): (json.dumps(v) if isinstance(v, (dict, list))
                 else None if v is None else str(v))
        for k, v in (feat.get("properties") or {}).items()
    }
    return (fid, geojson_geometry_to_wkb(feat.get("geometry")), props)


def read_geojson(spark: SparkSession, path: str) -> DataFrame:
    """One FeatureCollection file -> layer DataFrame (fid, geom_wkb,
    properties)."""
    with open(path) as f:
        doc = json.load(f)
    feats = doc["features"] if doc.get("type") == "FeatureCollection" \
        else [doc]
    rows = [_feature_row(feat, i) for i, feat in enumerate(feats)]
    return spark.createDataFrame(rows, LAYER_SCHEMA)


def read_geojson_seq(spark: SparkSession, path: str) -> DataFrame:
    """Newline-delimited GeoJSON -> layer DataFrame, distributed parse.

    FIDs come from the feature ``id`` or the line's position within its
    file-partition offset hash (stable, unique; the seq layout has no
    global order to number against)."""
    txt = spark.read.text(path)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for i, line in enumerate(b["value"]):
                s = line.strip().rstrip(",")
                if not s or s in ("[", "]", "{", "}"):
                    continue
                feat = json.loads(s.lstrip("\x1e"))  # RFC 8142 RS allowed
                fid, wkb, props = _feature_row(feat, i)
                rows.append((fid, wkb, props))
            yield pd.DataFrame(rows,
                               columns=["fid", "geom_wkb", "properties"])

    return txt.mapInPandas(parse, schema=LAYER_SCHEMA)


def write_geojson_seq(df: DataFrame, path: str,
                      geom_col: str = "geom_wkb",
                      fid_col: str = "fid") -> None:
    """Layer DataFrame -> newline-delimited GeoJSON (the sink side);
    coordinates via the WKT formatter's %.15g rule."""
    from lib_gdal_spark.functions.wkt import wkb_to_wkt  # noqa: F401

    def fmt(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            lines = []
            for _, r in b.iterrows():
                geo = None
                if r[geom_col] is not None:
                    geo = _wkb_to_geojson(bytes(r[geom_col]))
                props = dict(r["properties"]) if "properties" in b else {}
                lines.append(json.dumps({
                    "type": "Feature", "id": int(r[fid_col]),
                    "geometry": geo, "properties": props,
                }, separators=(",", ":")))
            yield pd.DataFrame({"value": lines})

    df.mapInPandas(fmt, schema="value string").write.mode(
        "overwrite").text(path)


def _wkb_to_geojson(wkb: bytes):
    base, ndim, payload = G.parse_wkb_full(wkb)
    if base == G.WKB_POINT:
        return {"type": "Point", "coordinates": list(payload)}
    if base == G.WKB_LINESTRING:
        return {"type": "LineString",
                "coordinates": np.asarray(payload).tolist()}
    if base == G.WKB_POLYGON:
        return {"type": "Polygon",
                "coordinates": [np.asarray(r).tolist() for r in payload]}
    if base == G.WKB_MULTIPOINT:
        return {"type": "MultiPoint",
                "coordinates": np.asarray(payload).tolist()}
    if base == G.WKB_MULTILINESTRING:
        return {"type": "MultiLineString",
                "coordinates": [np.asarray(r).tolist() for r in payload]}
    if base == G.WKB_MULTIPOLYGON:
        return {"type": "MultiPolygon",
                "coordinates": [[np.asarray(r).tolist() for r in poly]
                                for poly in payload]}
    if base == G.WKB_GEOMETRYCOLLECTION:
        return {"type": "GeometryCollection",
                "geometries": [
                    _wkb_to_geojson(G._reencode_member(b, nd, p))
                    for b, nd, p in payload
                ]}
    raise ValueError(f"cannot export type {base} to GeoJSON")
