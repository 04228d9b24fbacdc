"""KML vector source — the reference's KML driver layer model
(``drivers/vector/kml/ogrkmllayer.cpp``, ``kmlvector.cpp``): Placemark
features with Point / LineString / Polygon / MultiGeometry, the
``name`` / ``description`` fields, and ExtendedData ``Data``/``value``
pairs, reimplemented over the repo's WKB model.

Coordinates parse per the OGC KML 2.2 spec ``coordinates`` grammar:
whitespace-separated tuples of ``lon,lat[,alt]``; altitude (when
present on every tuple) yields Z geometries.

Distributed shape: identical to the GPX source — documents are small,
the scalable unit is many of them, so parsing is an Arrow-batched
``mapInPandas`` narrow map (one C-backed ElementTree parse per document,
zero shuffle).
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from lib_gdal_spark.functions import geometry as G

_TAG_RE = re.compile(r"\{[^}]*\}")

FEATURE_SCHEMA = ("fid long, name string, description string, "
                  "geom_wkb binary, attrs map<string,string>")


def _bare(el: ET.Element) -> str:
    return _TAG_RE.sub("", el.tag)


def _find(el: ET.Element, name: str) -> ET.Element | None:
    for c in el.iter():
        if _bare(c) == name:
            return c
    return None


def _child(el: ET.Element, name: str) -> ET.Element | None:
    for c in el:
        if _bare(c) == name:
            return c
    return None


def _coords(el: ET.Element) -> np.ndarray:
    """<coordinates> text -> (n, 2|3) array (3 iff every tuple has alt)."""
    node = _find(el, "coordinates")
    txt = (node.text or "") if node is not None else ""
    tuples = [t.split(",") for t in txt.split()]
    if not tuples:
        return np.zeros((0, 2))
    ndim = 3 if all(len(t) >= 3 for t in tuples) else 2
    return np.asarray([[float(v) for v in t[:ndim]] for t in tuples])


def _geom_to_wkb(el: ET.Element) -> bytes | None:
    kind = _bare(el)
    if kind == "Point":
        c = _coords(el)
        if not len(c):
            return None
        return G.wkb_point(*c[0][:3]) if c.shape[1] > 2 \
            else G.wkb_point(c[0][0], c[0][1])
    if kind == "LineString":
        return G.wkb_linestring(_coords(el))
    if kind == "Polygon":
        outer = _child(el, "outerBoundaryIs")
        rings = [_coords(outer)] if outer is not None else []
        for inner in el:
            if _bare(inner) == "innerBoundaryIs":
                rings.append(_coords(inner))
        return G.wkb_polygon(rings) if rings else None
    if kind == "MultiGeometry":
        members = [w for w in (_geom_to_wkb(c) for c in el)
                   if w is not None]
        if not members:
            return None
        kinds = {_bare(c) for c in el}
        if kinds == {"Point"}:
            pts = np.vstack([_coords(c) for c in el])
            return G.wkb_multipoint(pts)
        if kinds == {"LineString"}:
            return G.wkb_multilinestring([_coords(c) for c in el])
        if kinds == {"Polygon"}:
            polys = []
            for c in el:
                outer = _child(c, "outerBoundaryIs")
                rings = [_coords(outer)] if outer is not None else []
                for inner in c:
                    if _bare(inner) == "innerBoundaryIs":
                        rings.append(_coords(inner))
                polys.append(rings)
            return G.wkb_multipolygon(polys)
        return G.wkb_geometrycollection(members)
    return None


_GEOM_TAGS = {"Point", "LineString", "Polygon", "MultiGeometry"}


def parse_kml(doc: str) -> list[tuple]:
    """One KML document -> [(fid, name, description, wkb, attrs)] over
    its Placemarks, in document order (fid 0-based, OGR numbering)."""
    root = ET.fromstring(doc)
    rows: list[tuple] = []
    fid = 0
    for pm in root.iter():
        if _bare(pm) != "Placemark":
            continue
        name = desc = None
        wkb = None
        attrs: dict[str, str] = {}
        for c in pm:
            tag = _bare(c)
            if tag == "name":
                name = c.text
            elif tag == "description":
                desc = c.text
            elif tag in _GEOM_TAGS:
                wkb = _geom_to_wkb(c)
            elif tag == "ExtendedData":
                for d in c:
                    if _bare(d) == "Data":
                        v = _child(d, "value")
                        attrs[d.get("name", "")] = \
                            v.text if v is not None else None
        rows.append((fid, name, desc, wkb, attrs or None))
        fid += 1
    return rows


def parse_kml_documents(docs: DataFrame, doc_col: str = "kml") -> DataFrame:
    """Document-string column -> distributed Placemark feature table
    (keeps ``doc_id`` if present, like the GPX source)."""
    has_id = "doc_id" in docs.columns
    cols = (["doc_id", doc_col] if has_id else [doc_col])
    schema = ("doc_id long, " if has_id else "") + FEATURE_SCHEMA

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        names = [c.split()[0] for c in schema.split(", ")]
        for b in batches:
            out = []
            for _, row in b.iterrows():
                feats = parse_kml(row[doc_col])
                if has_id:
                    out.extend((row["doc_id"], *f) for f in feats)
                else:
                    out.extend(feats)
            yield pd.DataFrame(out, columns=names)

    return docs.select(*cols).mapInPandas(work, schema=schema)


def read_kml(spark: SparkSession, path: str) -> DataFrame:
    """KML file(s) at ``path`` (glob ok) -> distributed feature table."""
    files = spark.read.text(path, wholetext=True) \
        .withColumnRenamed("value", "kml")
    return parse_kml_documents(files)
