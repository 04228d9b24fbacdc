"""OpenStreetMap XML source — the reference's OSM driver layer model
(``drivers/vector/osm/ogrosmdatasource.cpp``): nodes / ways / relations
with tag maps, and way-geometry assembly from node references.

This is the one source where the Spark-first design is structurally
DIFFERENT from the reference, on purpose: the reference resolves way
node-refs through an in-process "node cache" (a giant id->coord hash or
sqlite spill — ``ogrosmdatasource.cpp`` IndexPoint/LookupNodes), which
caps out at one machine's memory. Here the node table and the exploded
(way_id, pos, node_ref) list are both DataFrames, and coordinate lookup
is a plain equi-join on node id followed by an ordered regroup on way
id — two shuffles that scale to the full planet file (~10^10 nodes)
because no single task ever holds the node set.

Parsing is the usual Arrow-batched narrow map over document strings
(one ElementTree parse per doc); multi-GB single files would need a
pre-split on ``<node``/``<way`` boundaries, documented not built.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lib_gdal_spark.functions import geometry as G

ELEMENT_SCHEMA = (
    "kind string, osm_id long, lon double, lat double, "
    "refs array<long>, "
    "members array<struct<mtype:string,mref:long,role:string>>, "
    "tags map<string,string>"
)
_COLS = ["kind", "osm_id", "lon", "lat", "refs", "members", "tags"]


def parse_osm(doc: str) -> list[tuple]:
    """One OSM XML document -> element rows (nodes, ways, relations)."""
    root = ET.fromstring(doc)
    rows: list[tuple] = []
    for el in root:
        tags = {t.get("k"): t.get("v") for t in el if t.tag == "tag"}
        if el.tag == "node":
            rows.append(("node", int(el.get("id")),
                         float(el.get("lon")), float(el.get("lat")),
                         None, None, tags or None))
        elif el.tag == "way":
            refs = [int(nd.get("ref")) for nd in el if nd.tag == "nd"]
            rows.append(("way", int(el.get("id")), None, None,
                         refs, None, tags or None))
        elif el.tag == "relation":
            members = [(m.get("type"), int(m.get("ref")),
                        m.get("role") or "")
                       for m in el if m.tag == "member"]
            rows.append(("relation", int(el.get("id")), None, None,
                         None, members, tags or None))
    return rows


def parse_osm_documents(docs: DataFrame, doc_col: str = "osm") -> DataFrame:
    """Document-string column -> one distributed element table (filter
    ``kind`` for the nodes / ways / relations layers)."""

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out: list[tuple] = []
            for d in b[doc_col]:
                out.extend(parse_osm(d))
            yield pd.DataFrame(out, columns=_COLS)

    return docs.select(doc_col).mapInPandas(work, schema=ELEMENT_SCHEMA)


def way_geometries(elements: DataFrame) -> DataFrame:
    """Element table -> (way_id, n_pts, is_closed, geom_wkb, tags).

    The reference's node-cache lookup as a distributed plan:
    posexplode(refs) ⋈ nodes on node id (shuffle keyed by node id, the
    hot-node skew is bounded because a node appears in few ways), then
    an ordered regroup per way. Closed rings whose tags mark an area
    (``area=yes`` or any ``building``/``landuse``/``natural`` key, the
    core of the reference's multipolygon heuristic) become Polygons,
    everything else LineStrings.
    """
    nodes = elements.where(F.col("kind") == "node").select(
        F.col("osm_id").alias("node_id"), "lon", "lat")
    ways = elements.where(F.col("kind") == "way").select(
        F.col("osm_id").alias("way_id"), "refs", "tags")
    exploded = ways.select(
        "way_id", F.posexplode("refs").alias("pos", "node_id"))
    joined = exploded.join(nodes, "node_id")
    pts = joined.groupBy("way_id").agg(
        F.sort_array(F.collect_list(F.struct("pos", "lon", "lat")))
        .alias("pts"))
    out = pts.join(ways.select("way_id", "tags"), "way_id")

    area_keys = ("building", "landuse", "natural", "leisure", "amenity")

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for _, r in b.iterrows():
                arr = np.asarray([[p["lon"], p["lat"]] for p in r["pts"]])
                closed = len(arr) >= 4 and bool(np.all(arr[0] == arr[-1]))
                tags = r["tags"] or {}
                is_area = closed and (
                    tags.get("area") == "yes"
                    or any(k in tags for k in area_keys))
                wkb = G.wkb_polygon([arr]) if is_area \
                    else G.wkb_linestring(arr)
                rows.append((int(r["way_id"]), len(arr), closed, wkb,
                             r["tags"]))
            yield pd.DataFrame(rows, columns=[
                "way_id", "n_pts", "is_closed", "geom_wkb", "tags"])

    return out.mapInPandas(
        build, schema="way_id long, n_pts int, is_closed boolean, "
                      "geom_wkb binary, tags map<string,string>")
