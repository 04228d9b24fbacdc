"""MapInfo MIF/MID vector source — the reference's MITAB interchange
driver (``drivers/vector/mitab/mitab_miffile.cpp``), reimplemented from
the public MapInfo Interchange Format description.

MIF carries the schema (``Columns``) and geometry records (``POINT``,
``LINE``, ``PLINE [MULTIPLE n]``, ``REGION n``, ``MULTIPOINT``,
``NONE``); MID carries one delimited attribute row per feature. Style
clauses (``PEN/BRUSH/SYMBOL/SMOOTH/CENTER``) are skipped, as the
reference does when only geometry+attributes are requested.

REGION rings have no reliable orientation in the wild, so polygon
assembly is containment-based (largest-|area| ring starts a shell, each
following ring becomes a hole of the first shell containing it, else a
new shell) — the even-odd convention MITAB applies.

Distributed shape: many (mif, mid) document pairs, one Arrow-batched
parse per pair, zero shuffle — identical to the shapefile source.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from lib_gdal_spark.functions import geometry as G
from lib_gdal_spark.sources.shapefile import (
    _point_in_ring, _ring_signed_area,
)

FEATURE_SCHEMA = ("src string, fid long, geom_wkb binary, "
                  "attrs map<string,string>")

_STYLE = ("pen", "brush", "symbol", "smooth", "center")


def _assemble_region(rings: list[np.ndarray]) -> bytes:
    order = sorted(range(len(rings)),
                   key=lambda i: -abs(_ring_signed_area(rings[i])))
    shells: list[list[np.ndarray]] = []
    for i in order:
        r = rings[i]
        px, py = float(r[0, 0]), float(r[0, 1])
        host = next((s for s in shells if _point_in_ring(px, py, s[0])),
                    None)
        if host is None:
            shells.append([r])
        else:
            host.append(r)
    if len(shells) == 1:
        return G.wkb_polygon(shells[0])
    return G.wkb_multipolygon(shells)


def parse_mif(mif: str, mid: str | None = None,
              src: str = "") -> list[tuple]:
    """MIF (+ optional MID) text -> [(src, fid, wkb, attrs)]."""
    lines = [ln.strip() for ln in mif.splitlines()]
    delim = ","
    columns: list[str] = []
    i = 0
    # header
    while i < len(lines):
        low = lines[i].lower()
        if low.startswith("delimiter"):
            q = lines[i].split('"')
            if len(q) >= 2:
                delim = q[1]
        elif low.startswith("columns"):
            n = int(low.split()[1])
            for j in range(n):
                columns.append(lines[i + 1 + j].split()[0])
            i += n
        elif low == "data":
            i += 1
            break
        i += 1

    def read_pts(k: int, at: int) -> tuple[np.ndarray, int]:
        pts = []
        while len(pts) < k:
            if lines[at]:
                vals = lines[at].split()
                pts.append((float(vals[0]), float(vals[1])))
            at += 1
        return np.asarray(pts), at

    feats: list[bytes | None] = []
    while i < len(lines):
        ln = lines[i]
        if not ln:
            i += 1
            continue
        tok = ln.split()
        kind = tok[0].lower()
        if kind in _STYLE or kind.startswith("("):
            i += 1
            continue
        if kind == "none":
            feats.append(None)
            i += 1
        elif kind == "point":
            feats.append(G.wkb_point(float(tok[1]), float(tok[2])))
            i += 1
        elif kind == "line":
            feats.append(G.wkb_linestring(np.asarray(
                [[float(tok[1]), float(tok[2])],
                 [float(tok[3]), float(tok[4])]])))
            i += 1
        elif kind == "multipoint":
            pts, i = read_pts(int(tok[1]), i + 1)
            feats.append(G.wkb_multipoint(pts))
        elif kind == "pline":
            if len(tok) >= 3 and tok[1].lower() == "multiple":
                nsec = int(tok[2])
                i += 1
                parts = []
                for _ in range(nsec):
                    while not lines[i].strip():
                        i += 1
                    k = int(lines[i].split()[0])
                    pts, i = read_pts(k, i + 1)
                    parts.append(pts)
                feats.append(G.wkb_multilinestring(parts))
            else:
                pts, i = read_pts(int(tok[1]), i + 1)
                feats.append(G.wkb_linestring(pts))
        elif kind == "region":
            nring = int(tok[1])
            i += 1
            rings = []
            for _ in range(nring):
                while not lines[i].strip():
                    i += 1
                k = int(lines[i].split()[0])
                pts, i = read_pts(k, i + 1)
                rings.append(pts)
            feats.append(_assemble_region(rings))
        else:
            i += 1

    attrs: list[dict | None] = [None] * len(feats)
    if mid is not None and columns:
        rows = [r for r in mid.splitlines() if r.strip() != ""]
        for fi, row in enumerate(rows[:len(feats)]):
            vals = _split_mid(row, delim)
            attrs[fi] = {c: v for c, v in zip(columns, vals)}
    return [(src, fi, w, a)
            for fi, (w, a) in enumerate(zip(feats, attrs))]


def _split_mid(row: str, delim: str) -> list[str]:
    out, cur, inq = [], [], False
    for ch in row:
        if ch == '"':
            inq = not inq
        elif ch == delim and not inq:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    out.append("".join(cur))
    return [v.strip() for v in out]


def parse_mif_documents(pairs: DataFrame, mif_col: str = "mif",
                        mid_col: str = "mid",
                        id_col: str = "src") -> DataFrame:
    """(src, mif_text, mid_text?) rows -> distributed feature table."""

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows: list[tuple] = []
            for _, r in b.iterrows():
                mid = r[mid_col] if mid_col in b.columns else None
                rows.extend(parse_mif(
                    str(r[mif_col]),
                    str(mid) if mid is not None else None,
                    str(r[id_col])))
            yield pd.DataFrame(rows,
                               columns=["src", "fid", "geom_wkb", "attrs"])

    return pairs.mapInPandas(work, schema=FEATURE_SCHEMA)


def write_mif(feats: list[tuple], columns: list[tuple[str, str]]) -> str:
    """[(kind, payload)] + [(name, miftype)] -> MIF text. kinds:
    'point' (x, y), 'line' (x1,y1,x2,y2), 'pline' ([pts...]),
    'region' ([rings...]), 'none'."""
    out = ["Version 300", 'Charset "Neutral"', 'Delimiter ","',
           f"Columns {len(columns)}"]
    out += [f"  {n} {t}" for n, t in columns]
    out.append("Data")
    out.append("")
    for kind, payload in feats:
        if kind == "none":
            out.append("NONE")
        elif kind == "point":
            out.append(f"POINT {payload[0]!r} {payload[1]!r}")
        elif kind == "line":
            out.append("LINE " + " ".join(repr(v) for v in payload))
        elif kind == "pline":
            out.append(f"PLINE {len(payload)}")
            out += [f"{x!r} {y!r}" for x, y in payload]
        elif kind == "region":
            out.append(f"REGION {len(payload)}")
            for ring in payload:
                out.append(f"  {len(ring)}")
                out += [f"{x!r} {y!r}" for x, y in ring]
            out.append('    BRUSH (2,16777215)')
    return "\n".join(out) + "\n"


def write_mid(rows: list[list], delim: str = ",") -> str:
    return "\n".join(
        delim.join(f'"{v}"' if isinstance(v, str) else repr(v)
                   for v in row) for row in rows) + "\n"
