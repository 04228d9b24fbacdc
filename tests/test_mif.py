"""MapInfo MIF/MID source (sources/mif.py)."""

import pandas as pd

from lib_gdal_spark.functions.wkt import wkb_to_wkt
from lib_gdal_spark.sources.mif import (
    parse_mif, parse_mif_documents, write_mid, write_mif,
)

MIF = """Version 300
Charset "Neutral"
Delimiter ","
Columns 2
  name Char(10)
  pop Integer
Data

POINT 10 20
    SYMBOL (34,0,12)
PLINE 3
0 0
5 5
10 3
    PEN (1,2,0)
REGION 2
  5
0 0
0 10
10 10
10 0
0 0
  5
2 2
2 4
4 4
4 2
2 2
    BRUSH (2,16777215)
LINE 1 2 3 4
NONE
PLINE MULTIPLE 2
2
0 0
1 0
3
5 5
6 5
7 6
"""

MID = '"wien",1900\n"graz",290\n"r",1\n"l",2\n"n",3\n"m",4\n'


def test_parse_mif():
    rows = parse_mif(MIF, MID, src="t")
    assert len(rows) == 6
    assert wkb_to_wkt(rows[0][2]) == "POINT (10 20)"
    assert rows[0][3] == {"name": "wien", "pop": "1900"}
    assert wkb_to_wkt(rows[1][2]) == "LINESTRING (0 0, 5 5, 10 3)"
    wkt = wkb_to_wkt(rows[2][2])
    assert wkt.startswith("POLYGON") and "(2 2" in wkt  # hole assembled
    assert wkb_to_wkt(rows[3][2]) == "LINESTRING (1 2, 3 4)"
    assert rows[4][2] is None and rows[4][3] == {"name": "n", "pop": "3"}
    assert wkb_to_wkt(rows[5][2]) == \
        "MULTILINESTRING ((0 0, 1 0), (5 5, 6 5, 7 6))"


def test_writer_roundtrip():
    feats = [("point", (3.5, -2.0)),
             ("pline", [(0.0, 0.0), (2.0, 1.0)]),
             ("region", [[(0.0, 0.0), (0.0, 8.0), (8.0, 8.0), (0.0, 0.0)],
                         [(1.0, 2.0), (2.0, 2.0), (2.0, 3.0), (1.0, 2.0)]]),
             ("none", None)]
    mif = write_mif(feats, [("tag", "Char(8)")])
    mid = write_mid([["a"], ["b"], ["c"], ["d"]])
    rows = parse_mif(mif, mid)
    assert wkb_to_wkt(rows[0][2]) == "POINT (3.5 -2)"
    assert wkb_to_wkt(rows[1][2]) == "LINESTRING (0 0, 2 1)"
    assert wkb_to_wkt(rows[2][2]) == ("POLYGON ((0 0, 0 8, 8 8, 0 0), "
                                      "(1 2, 2 2, 2 3, 1 2))")
    assert [r[3]["tag"] for r in rows] == ["a", "b", "c", "d"]


def test_distributed(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"src": ["x", "y"], "mif": [MIF, MIF],
                      "mid": [MID, MID]}),
        schema="src string, mif string, mid string")
    out = parse_mif_documents(df).collect()
    assert len(out) == 12
    assert {r["src"] for r in out} == {"x", "y"}
