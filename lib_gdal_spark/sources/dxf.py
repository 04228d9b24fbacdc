"""AutoCAD DXF vector source — the reference's DXF driver
(``drivers/vector/dxf/ogrdxflayer.cpp``), reimplemented from the public
DXF group-code format description for the entity types that dominate
real files: POINT, LINE, LWPOLYLINE (open/closed), CIRCLE, ARC, and
TEXT (as a point + text attribute).

Group codes used: 0 entity type, 8 layer, 10/20/30 first point,
11/21/31 second point, 40 radius, 50/51 start/end angle, 90 vertex
count, 70 closed flag, 1 text. CIRCLE/ARC linearize with a fixed
angular step (default 4°, the reference's ``OGR_ARC_STEPSIZE``
default); a closed LWPOLYLINE becomes a Polygon ring.

Distributed shape: many DXF documents, one Arrow-batched parse per
document string — the standard zero-shuffle narrow map.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from lib_gdal_spark.functions import geometry as G

FEATURE_SCHEMA = ("src string, fid long, entity string, layer string, "
                  "text string, geom_wkb binary")

ARC_STEP_DEG = 4.0  # OGR_ARC_STEPSIZE default (ogr_api docs)


def _arc_points(cx: float, cy: float, r: float, a0: float, a1: float,
                step: float = ARC_STEP_DEG) -> np.ndarray:
    if a1 <= a0:
        a1 += 360.0
    n = max(int(math.ceil((a1 - a0) / step)), 1)
    ang = np.radians(np.linspace(a0, a1, n + 1))
    return np.column_stack([cx + r * np.cos(ang), cy + r * np.sin(ang)])


def parse_dxf(doc: str, src: str = "",
              arc_step: float = ARC_STEP_DEG) -> list[tuple]:
    """One DXF document -> [(src, fid, entity, layer, text, wkb)]."""
    lines = doc.splitlines()
    pairs: list[tuple[int, str]] = []
    for i in range(0, len(lines) - 1, 2):
        try:
            pairs.append((int(lines[i].strip()), lines[i + 1].strip()))
        except ValueError:
            continue
    # slice the ENTITIES section
    ents: list[dict] = []
    cur: dict | None = None
    in_section = False
    for code, val in pairs:
        if code == 0 and val == "SECTION":
            cur = None
            continue
        if code == 2 and not in_section:
            in_section = val == "ENTITIES"
            continue
        if not in_section:
            continue
        if code == 0:
            if val == "ENDSEC":
                in_section = False
                cur = None
                continue
            cur = {"type": val, "pts": [], "codes": {}}
            ents.append(cur)
        elif cur is not None:
            if code in (10, 20, 11, 21):
                cur.setdefault(code, []).append(float(val))
            elif code in (30, 31, 40, 50, 51, 70, 90):
                cur["codes"][code] = float(val)
            elif code == 8:
                cur["codes"][8] = val
            elif code == 1:
                cur["codes"][1] = val

    rows: list[tuple] = []
    fid = 0
    for e in ents:
        t = e["type"]
        c = e["codes"]
        layer = c.get(8, "0")
        text = c.get(1)
        wkb = None
        xs, ys = e.get(10, []), e.get(20, [])
        if t in ("POINT", "TEXT", "MTEXT"):
            if xs and ys:
                z = c.get(30)
                wkb = G.wkb_point(xs[0], ys[0], z) if z is not None \
                    else G.wkb_point(xs[0], ys[0])
        elif t == "LINE":
            x2, y2 = e.get(11, [None]), e.get(21, [None])
            if xs and x2[0] is not None:
                wkb = G.wkb_linestring(np.array(
                    [[xs[0], ys[0]], [x2[0], y2[0]]]))
        elif t == "LWPOLYLINE":
            pts = np.column_stack([xs, ys])
            closed = int(c.get(70, 0)) & 1
            if closed and len(pts) >= 3:
                ring = np.vstack([pts, pts[:1]])
                wkb = G.wkb_polygon([ring])
            elif len(pts) >= 2:
                wkb = G.wkb_linestring(pts)
        elif t == "CIRCLE":
            pts = _arc_points(xs[0], ys[0], c[40], 0.0, 360.0, arc_step)
            wkb = G.wkb_polygon([pts])
        elif t == "ARC":
            pts = _arc_points(xs[0], ys[0], c[40], c.get(50, 0.0),
                              c.get(51, 360.0), arc_step)
            wkb = G.wkb_linestring(pts)
        else:
            continue
        if wkb is not None:
            rows.append((src, fid, t, layer, text, wkb))
            fid += 1
    return rows


def parse_dxf_documents(docs: DataFrame, doc_col: str = "dxf",
                        id_col: str = "src") -> DataFrame:
    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["src", "fid", "entity", "layer", "text", "geom_wkb"]
        for b in batches:
            rows: list[tuple] = []
            for s, d in zip(b[id_col], b[doc_col]):
                rows.extend(parse_dxf(str(d), str(s)))
            yield pd.DataFrame(rows, columns=cols)

    return docs.select(id_col, doc_col).mapInPandas(work,
                                                    schema=FEATURE_SCHEMA)


def write_dxf(entities: list[dict]) -> str:
    """[{type, layer?, pts|point|radius|angles|text}] -> minimal DXF
    text (ENTITIES section only — what the reader consumes)."""
    out = ["0", "SECTION", "2", "ENTITIES"]

    def emit(*vals):
        out.extend(str(v) for v in vals)

    for e in entities:
        t = e["type"]
        emit(0, t, 8, e.get("layer", "0"))
        if t in ("POINT", "TEXT"):
            x, y = e["point"][:2]
            emit(10, repr(float(x)), 20, repr(float(y)))
            if len(e["point"]) > 2:
                emit(30, repr(float(e["point"][2])))
            if t == "TEXT":
                emit(1, e.get("text", ""))
        elif t == "LINE":
            (x1, y1), (x2, y2) = e["pts"]
            emit(10, repr(float(x1)), 20, repr(float(y1)),
                 11, repr(float(x2)), 21, repr(float(y2)))
        elif t == "LWPOLYLINE":
            pts = e["pts"]
            emit(90, len(pts), 70, 1 if e.get("closed") else 0)
            for x, y in pts:
                emit(10, repr(float(x)), 20, repr(float(y)))
        elif t == "CIRCLE":
            emit(10, repr(float(e["point"][0])),
                 20, repr(float(e["point"][1])), 40, repr(float(e["radius"])))
        elif t == "ARC":
            emit(10, repr(float(e["point"][0])),
                 20, repr(float(e["point"][1])), 40, repr(float(e["radius"])),
                 50, repr(float(e["angles"][0])),
                 51, repr(float(e["angles"][1])))
    emit(0, "ENDSEC", 0, "EOF")
    return "\n".join(out) + "\n"
