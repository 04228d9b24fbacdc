"""GPX vector source — the reference's GPX driver layer model
(``drivers/vector/gpx/ogrgpxdatasource.cpp:173-187``,
``ogrgpxlayer.cpp``): one GPX document exposes the five OGR layers
``waypoints`` (Point), ``routes`` (LineString), ``tracks``
(MultiLineString, one part per <trkseg>), ``route_points`` and
``track_points`` (Point per <rtept>/<trkpt>, with route/track/segment
back-references), reimplemented over the repo's WKB model.

Distributed shape: GPX files are small XML documents; the scalable unit
is *many files* (or many embedded document strings), so parsing runs as
an Arrow-batched mapInPandas over a document column — one C-backed
ElementTree parse per document inside the batch loop, features emitted
as plain rows. No shuffle: a corpus of a billion GPX traces is a pure
narrow map from documents to feature rows.
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

FEATURE_SCHEMA = (
    "layer string, fid long, geom_wkb binary, name string, ele double, "
    "track_fid long, track_seg_id long, track_seg_point_id long"
)


def _bare(el: ET.Element) -> str:
    return _TAG_RE.sub("", el.tag)


def _kids(el: ET.Element, name: str) -> list[ET.Element]:
    return [c for c in el if _bare(c) == name]


def _text(el: ET.Element, name: str) -> str | None:
    for c in el:
        if _bare(c) == name:
            return c.text
    return None


def _pt(el: ET.Element) -> tuple[float, float, float | None]:
    lon = float(el.get("lon"))
    lat = float(el.get("lat"))
    ele = _text(el, "ele")
    return lon, lat, (float(ele) if ele is not None else None)


def parse_gpx(doc: str) -> list[tuple]:
    """One GPX document -> feature rows matching FEATURE_SCHEMA.

    fids are 0-based per layer in document order, the reference's
    feature numbering for a single file.
    """
    root = ET.fromstring(doc)
    rows: list[tuple] = []
    fids = {"waypoints": 0, "routes": 0, "tracks": 0,
            "route_points": 0, "track_points": 0}

    def emit(layer, wkb, name=None, ele=None, tfid=None, seg=None, spt=None):
        rows.append((layer, fids[layer], wkb, name, ele, tfid, seg, spt))
        fids[layer] += 1

    for w in _kids(root, "wpt"):
        lon, lat, ele = _pt(w)
        wkb = G.wkb_point(lon, lat, ele) if ele is not None \
            else G.wkb_point(lon, lat)
        emit("waypoints", wkb, _text(w, "name"), ele)
    for rte in _kids(root, "rte"):
        rfid = fids["routes"]
        pts = []
        for i, p in enumerate(_kids(rte, "rtept")):
            lon, lat, ele = _pt(p)
            pts.append((lon, lat))
            wkb = G.wkb_point(lon, lat, ele) if ele is not None \
                else G.wkb_point(lon, lat)
            emit("route_points", wkb, _text(p, "name"), ele, rfid, None, i)
        emit("routes",
             G.wkb_linestring(np.asarray(pts, dtype=np.float64)),
             _text(rte, "name"))
    for trk in _kids(root, "trk"):
        tfid = fids["tracks"]
        segs = []
        for sid, seg in enumerate(_kids(trk, "trkseg")):
            pts = []
            for i, p in enumerate(_kids(seg, "trkpt")):
                lon, lat, ele = _pt(p)
                pts.append((lon, lat))
                wkb = G.wkb_point(lon, lat, ele) if ele is not None \
                    else G.wkb_point(lon, lat)
                emit("track_points", wkb, _text(p, "name"), ele,
                     tfid, sid, i)
            segs.append(np.asarray(pts, dtype=np.float64))
        emit("tracks", G.wkb_multilinestring(segs), _text(trk, "name"))
    return rows


def parse_gpx_documents(docs: DataFrame, doc_col: str = "gpx") -> DataFrame:
    """Document-string column -> distributed feature table. Adds
    ``doc_id`` from the input's ``doc_id`` column if present so features
    stay attributable to their source document."""
    has_id = "doc_id" in docs.columns
    cols = (["doc_id", doc_col] if has_id else [doc_col])
    schema = ("doc_id long, " if has_id else "") + FEATURE_SCHEMA

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        names = [c.split()[0] for c in schema.split(", ")]
        for b in batches:
            out = []
            for _, row in b.iterrows():
                feats = parse_gpx(row[doc_col])
                if has_id:
                    out.extend((row["doc_id"], *f) for f in feats)
                else:
                    out.extend(feats)
            yield pd.DataFrame(out, columns=names)

    return docs.select(*cols).mapInPandas(work, schema=schema)


def read_gpx(spark: SparkSession, path: str) -> DataFrame:
    """GPX file(s) at ``path`` (glob ok) -> distributed feature table."""
    files = spark.read.text(path, wholetext=True) \
        .withColumnRenamed("value", "gpx")
    return parse_gpx_documents(files)
