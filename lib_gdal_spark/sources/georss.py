"""GeoRSS vector source — the reference's GeoRSS driver
(``drivers/vector/georss/ogrgeorsslayer.cpp``): RSS ``<item>`` / Atom
``<entry>`` features carrying GeoRSS-Simple geometries
(``georss:point|line|polygon`` — coordinates in LAT LON order, the
opposite of every other format here) or W3C ``geo:lat``/``geo:long``
pairs, plus title/link/pubDate fields.

Same distributed shape as the other XML sources: Arrow-batched
ElementTree parse per document, zero shuffle.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from lib_gdal_spark.functions import geometry as G

_TAG_RE = re.compile(r"\{[^}]*\}")

FEATURE_SCHEMA = ("src string, fid long, title string, link string, "
                  "pubdate string, geom_wkb binary")


def _bare(el: ET.Element) -> str:
    return _TAG_RE.sub("", el.tag)


def _latlon_pairs(text: str) -> np.ndarray:
    """GeoRSS-Simple 'lat lon lat lon ...' -> (n, 2) lon/lat array."""
    vals = np.asarray(text.split(), dtype=np.float64)
    pairs = vals.reshape(-1, 2)
    return pairs[:, ::-1].copy()  # swap to lon, lat


def parse_georss(doc: str, src: str = "") -> list[tuple]:
    """One RSS/Atom document -> [(src, fid, title, link, pubdate, wkb)]
    over its items/entries, in document order."""
    root = ET.fromstring(doc)
    rows: list[tuple] = []
    fid = 0
    for item in root.iter():
        if _bare(item) not in ("item", "entry"):
            continue
        title = link = pubdate = None
        wkb = None
        w3c_lat = w3c_lon = None
        for c in item:
            tag = _bare(c)
            txt = (c.text or "").strip()
            if tag == "title":
                title = txt
            elif tag == "link":
                link = txt or c.get("href")
            elif tag in ("pubDate", "updated"):
                pubdate = txt
            elif tag == "point":
                ll = _latlon_pairs(txt)
                wkb = G.wkb_point(ll[0, 0], ll[0, 1])
            elif tag == "line":
                wkb = G.wkb_linestring(_latlon_pairs(txt))
            elif tag == "polygon":
                ring = _latlon_pairs(txt)
                if not np.array_equal(ring[0], ring[-1]):
                    ring = np.vstack([ring, ring[:1]])
                wkb = G.wkb_polygon([ring])
            elif tag == "lat":
                w3c_lat = float(txt)
            elif tag in ("long", "lon"):
                w3c_lon = float(txt)
        if wkb is None and w3c_lat is not None and w3c_lon is not None:
            wkb = G.wkb_point(w3c_lon, w3c_lat)
        rows.append((src, fid, title, link, pubdate, wkb))
        fid += 1
    return rows


def parse_georss_documents(docs: DataFrame, doc_col: str = "rss",
                           id_col: str = "src") -> DataFrame:
    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["src", "fid", "title", "link", "pubdate", "geom_wkb"]
        for b in batches:
            rows: list[tuple] = []
            for s, d in zip(b[id_col], b[doc_col]):
                rows.extend(parse_georss(str(d), str(s)))
            yield pd.DataFrame(rows, columns=cols)

    return docs.select(id_col, doc_col).mapInPandas(
        work, schema=FEATURE_SCHEMA)
