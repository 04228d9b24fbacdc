"""OGR CSV vector layer codec — ``drivers/vector/csv`` re-expressed.

The reference's CSV driver reads a geometry from a WKT column
(``GEOM_POSSIBLE_NAMES`` / the canonical ``WKT`` header), types the
attribute columns from a ``.csvt`` sidecar (``Integer``/``Real``/
``String``), and follows RFC-4180 quoting (embedded commas, quotes doubled,
newlines in quoted fields). Both directions here run executor-side over
Arrow batches; at scale the read path is ``spark.read.text`` + this parser
per line group — no driver-side file handling.
"""

from __future__ import annotations

import csv as _csv
import io

from lib_gdal_spark.functions.wkt import wkb_to_wkt, wkt_to_wkb

CSVT_TYPES = ("Integer", "Real", "String")


def write_csv_layer(rows: list[dict], fields: list[tuple[str, str]],
                    geometry_col: str = "WKT") -> tuple[str, str]:
    """rows (dicts with 'wkb' + attributes) -> (csv text, csvt line).

    ``fields`` is [(name, csvt_type)] in column order; the geometry column
    leads, like ogr2ogr -f CSV -lco GEOMETRY=AS_WKT output.
    """
    buf = io.StringIO()
    w = _csv.writer(buf, quoting=_csv.QUOTE_MINIMAL, lineterminator="\n")
    w.writerow([geometry_col, *[n for n, _ in fields]])
    for r in rows:
        w.writerow([wkb_to_wkt(r["wkb"]), *[r[n] for n, _ in fields]])
    csvt = ",".join(["WKT", *[t for _, t in fields]])
    return buf.getvalue(), csvt


def parse_csv_layer(text: str, csvt: str | None = None,
                    geometry_col: str = "WKT") -> list[dict]:
    """csv text (+ optional .csvt type line) -> feature dicts with 'wkb'
    and Python-typed attributes (Integer -> int, Real -> float)."""
    rd = _csv.reader(io.StringIO(text))
    header = next(rd)
    types = csvt.split(",") if csvt else ["String"] * len(header)
    gi = header.index(geometry_col)
    out = []
    for rec in rd:
        row: dict = {}
        for i, (name, val) in enumerate(zip(header, rec)):
            if i == gi:
                row["wkb"] = wkt_to_wkb(val)
            elif types[i] == "Integer":
                row[name] = int(val)
            elif types[i] == "Real":
                row[name] = float(val)
            else:
                row[name] = val
        out.append(row)
    return out
