"""DXF source (sources/dxf.py)."""

import numpy as np
import pandas as pd

from lib_gdal_spark.functions import geometry as G
from lib_gdal_spark.functions.wkt import wkb_to_wkt
from lib_gdal_spark.sources.dxf import (
    parse_dxf, parse_dxf_documents, write_dxf,
)

ENTS = [
    {"type": "POINT", "layer": "pts", "point": (3.0, 4.0, 5.0)},
    {"type": "LINE", "layer": "rd", "pts": [(0, 0), (10, 5)]},
    {"type": "LWPOLYLINE", "pts": [(0, 0), (4, 0), (4, 4), (0, 4)],
     "closed": True},
    {"type": "LWPOLYLINE", "pts": [(1, 1), (2, 3), (5, 3)]},
    {"type": "CIRCLE", "point": (10.0, 10.0), "radius": 2.0},
    {"type": "ARC", "point": (0.0, 0.0), "radius": 1.0,
     "angles": (0.0, 90.0)},
    {"type": "TEXT", "point": (7.0, 8.0), "text": "label"},
]


def test_parse_dxf_entities():
    rows = parse_dxf(write_dxf(ENTS), src="d")
    by = {r[2]: r for r in rows}
    assert len(rows) == 7
    assert wkb_to_wkt(by["POINT"][5]) == "POINT Z (3 4 5)"
    assert by["POINT"][3] == "pts"
    assert wkb_to_wkt(by["LINE"][5]) == "LINESTRING (0 0, 10 5)"
    polys = [r for r in rows if r[2] == "LWPOLYLINE"]
    assert wkb_to_wkt(polys[0][5]) == "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"
    assert wkb_to_wkt(polys[1][5]) == "LINESTRING (1 1, 2 3, 5 3)"
    # circle -> 4-degree-step polygon with area ~ pi r^2
    circ = by["CIRCLE"][5]
    area = G.shoelace_area(G.polygon_rings(circ))
    assert abs(area - np.pi * 4) < 0.02
    # quarter arc: endpoints on the axes
    arc = by["ARC"][5]
    _b, _nd, pts = G.parse_wkb_full(arc)
    assert abs(pts[0][0] - 1.0) < 1e-12 and abs(pts[-1][1] - 1.0) < 1e-12
    assert by["TEXT"][4] == "label"


def test_distributed(spark):
    doc = write_dxf(ENTS)
    df = spark.createDataFrame(
        pd.DataFrame({"src": ["a", "b"], "dxf": [doc, doc]}),
        schema="src string, dxf string")
    out = parse_dxf_documents(df)
    assert out.count() == 14
    assert out.where("entity = 'CIRCLE'").count() == 2
