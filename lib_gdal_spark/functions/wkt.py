"""WKT geometry codec (``core/ogr/ogrgeometry.cpp:1598`` exportToWkt /
``ogr_api.h`` OGR_G_ImportFromWkt semantics, reimplemented).

Supports the polygon-pipeline types the engine uses: POINT, LINESTRING,
POLYGON (with holes), MULTIPOLYGON — enough to ingest WKT columns from
CSV/GeoJSON-ish vector sources into the WKB-based operators.
"""

from __future__ import annotations

import re

import numpy as np

from lib_gdal_spark.functions import geometry as G

_NUM = r"[-+]?\d*\.?\d+(?:[eE][-+]?\d+)?"


def _coords(body: str) -> np.ndarray:
    pts = []
    for pair in body.split(","):
        xy = re.findall(_NUM, pair)
        pts.append((float(xy[0]), float(xy[1])))
    return np.asarray(pts, dtype=np.float64)


def _rings(body: str) -> list[np.ndarray]:
    return [_coords(m) for m in re.findall(r"\(([^()]*)\)", body)]


def wkt_to_wkb(wkt: str) -> bytes:
    s = wkt.strip()
    up = s.upper()
    if up.startswith("POINT"):
        xy = re.findall(_NUM, s)
        return G.wkb_point(float(xy[0]), float(xy[1]))
    if up.startswith("LINESTRING"):
        return G.wkb_linestring(_coords(s[s.index("(") + 1:s.rindex(")")]))
    if up.startswith("POLYGON"):
        return G.wkb_polygon(_rings(s[s.index("("):]))
    if up.startswith("MULTIPOLYGON"):
        body = s[s.index("(") + 1:s.rindex(")")]
        polys = [
            _rings(m.group(0))
            for m in re.finditer(r"\((?:[^()]*\([^()]*\)[^()]*)+\)", body)
        ]
        return G.wkb_multipolygon(polys)
    raise ValueError(f"unsupported WKT type: {s[:24]}")


def _fmt(v: float) -> str:
    return f"{v:.15g}"


def _ring_txt(r: np.ndarray) -> str:
    return "(" + ", ".join(f"{_fmt(x)} {_fmt(y)}" for x, y in r) + ")"


def wkb_to_wkt(wkb: bytes) -> str:
    gtype, payload = G.parse_wkb(wkb)
    if gtype == G.WKB_POINT:
        return f"POINT ({_fmt(payload[0])} {_fmt(payload[1])})"
    if gtype == G.WKB_LINESTRING:
        return ("LINESTRING " + _ring_txt(payload))
    if gtype == G.WKB_POLYGON:
        return "POLYGON (" + ", ".join(_ring_txt(r) for r in payload) + ")"
    if gtype == G.WKB_MULTIPOLYGON:
        parts = [
            "(" + ", ".join(_ring_txt(r) for r in poly) + ")"
            for poly in payload
        ]
        return "MULTIPOLYGON (" + ", ".join(parts) + ")"
    raise ValueError(f"unsupported WKB type {gtype}")
