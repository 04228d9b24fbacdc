"""Deterministic Common-Crawl-style pages table (the input_hint table).

Schema (``BASELINE.json:input_hint``):
``(url string, warc_ts timestamp, html binary, text string, lang string)``.

Generation is a pure function of (page id, seed): the table is produced
distributed via ``spark.range(n)`` + ``mapInPandas`` so no driver-side
materialization happens at any scale; the same id always yields the same
bytes regardless of partitioning (splitmix64-style mixing, a public-domain
construction).

Spatial skew is intentional (FIXTURES.md §1): ~80% of geo-tagged pages
cluster Zipf-style around city centers, ~20% are uniform background, and a
fraction of pages carries no coordinates at all (NULL-geometry path of
``drivers/ogr_gensql.cpp:1310-1316``).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"

LANGS = np.array(["en", "de", "fr", "es", "ru", "zh"])
N_CITIES = 40
GEO_FRACTION = 0.8  # pages carrying coordinates
CITY_FRACTION = 0.8  # of geo pages, drawn around city centers
DUP_FRACTION = 0.05  # exact-duplicate text pages (dedup fixtures)

_WORDS = np.array(
    "data tile raster vector layer cell grid zoom pixel band warp scan line "
    "point polygon spatial join index query page city river mountain road "
    "map coast valley bridge harbor market".split()
)


def _mix(ids: np.ndarray, stream: int, seed: int) -> np.ndarray:
    """splitmix64 finalizer over (id, stream, seed) -> uint64."""
    stream_salt = np.uint64((0x9E3779B97F4A7C15 * (stream * 2654435761 + seed + 1))
                            & 0xFFFFFFFFFFFFFFFF)
    z = ids.astype(np.uint64) + stream_salt
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _uniform(ids: np.ndarray, stream: int, seed: int) -> np.ndarray:
    return (_mix(ids, stream, seed) >> np.uint64(11)).astype(np.float64) / float(
        1 << 53
    )


def city_centers(seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic city centers: lon in [-180, 180), lat in [-55, 65]."""
    k = np.arange(N_CITIES, dtype=np.int64)
    lon = _uniform(k, 101, seed) * 360.0 - 180.0
    lat = _uniform(k, 102, seed) * 120.0 - 55.0
    return np.round(lon, 4), np.round(lat, 4)


def page_coords(ids: np.ndarray, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    """(lon, lat) per page id; NaN for the no-geo fraction. 1e-4 lattice."""
    u_geo = _uniform(ids, 1, seed)
    u_kind = _uniform(ids, 2, seed)
    u_city = _uniform(ids, 3, seed)
    u_dx = _uniform(ids, 4, seed)
    u_dy = _uniform(ids, 5, seed)

    clon, clat = city_centers(seed)
    # Zipf-ish over cities: p(k) ~ 1/(k+1); inverse-CDF on the harmonic sum.
    weights = 1.0 / (np.arange(N_CITIES) + 1.0)
    cdf = np.cumsum(weights) / weights.sum()
    city = np.searchsorted(cdf, u_city, side="right").clip(0, N_CITIES - 1)

    # Box-Muller from two uniforms -> gaussian offsets (sigma ~ 0.05 deg)
    r = np.sqrt(-2.0 * np.log(np.clip(u_dx, 1e-12, 1.0)))
    lon = np.where(
        u_kind < CITY_FRACTION,
        clon[city] + 0.05 * r * np.cos(2 * np.pi * u_dy),
        u_dx * 360.0 - 180.0,
    )
    lat = np.where(
        u_kind < CITY_FRACTION,
        clat[city] + 0.05 * r * np.sin(2 * np.pi * u_dy),
        u_dy * 120.0 - 55.0,
    )
    lon = np.round(np.clip(lon, -179.9999, 179.9999), 4)
    lat = np.round(np.clip(lat, -54.9999, 64.9999), 4)
    nan = np.float64(np.nan)
    has_geo = u_geo < GEO_FRACTION
    return np.where(has_geo, lon, nan), np.where(has_geo, lat, nan)


def _body_text(ids: np.ndarray, seed: int) -> pd.Series:
    """Deterministic ~8-word body; duplicate groups share identical bodies."""
    u_dup = _uniform(ids, 6, seed)
    gid = np.where(u_dup < DUP_FRACTION, ids - (ids % 53), ids)
    picks = [(_mix(gid, 10 + w, seed) % len(_WORDS)).astype(np.int64) for w in range(8)]
    body = pd.Series(_WORDS[picks[0]])
    for p in picks[1:]:
        body = body.str.cat(pd.Series(_WORDS[p]), sep=" ")
    return body


def build_batch(ids: np.ndarray, seed: int = 42) -> pd.DataFrame:
    """Pure-function batch of pages for an array of int64 ids."""
    ids = np.asarray(ids, dtype=np.int64)
    lon, lat = page_coords(ids, seed)
    has_geo = ~np.isnan(lon)

    url = pd.Series(ids % 1000).astype(str)
    url = "https://host" + url + ".example/page/" + pd.Series(ids).astype(str)
    title = "Page " + pd.Series(ids).astype(str)
    body = _body_text(ids, seed)
    lang = pd.Series(LANGS[(_mix(ids, 7, seed) % len(LANGS)).astype(np.int64)])

    lat_s = pd.Series(np.where(has_geo, lat, 0.0)).map(lambda v: f"{v:.4f}")
    lon_s = pd.Series(np.where(has_geo, lon, 0.0)).map(lambda v: f"{v:.4f}")
    geo_txt = "geo: " + lat_s + "," + lon_s

    meta = (
        '<meta name="geo.position" content="' + lat_s + ";" + lon_s + '">'
    ).where(has_geo, "")
    span = (
        '<span data-lat="' + lat_s + '" data-lon="' + lon_s + '">' + geo_txt + "</span>"
    ).where(has_geo, "")

    html = (
        "<html><head><title>" + title + "</title>" + meta + "</head><body><h1>"
        + title + "</h1><p>" + body + "</p>" + span + "</body></html>"
    )
    text = (title + "\n" + body).where(~has_geo, title + "\n" + body + "\n" + geo_txt)

    ts = pd.to_datetime("2024-01-01", utc=True) + pd.to_timedelta(
        (_mix(ids, 8, seed) % np.uint64(365 * 24 * 3600)).astype(np.int64), unit="s"
    )
    return pd.DataFrame(
        {
            "url": url,
            "warc_ts": ts.tz_localize(None),
            "html": html.str.encode("utf-8"),
            "text": text,
            "lang": lang,
        }
    )


def generate_pages(
    spark: SparkSession, n: int, seed: int = 42, partitions: int | None = None
) -> DataFrame:
    """Distributed pages table of ``n`` rows (never touches the driver)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            yield build_batch(b["id"].to_numpy(), seed)

    n_parts = partitions or max(
        spark.sparkContext.defaultParallelism, n // 250_000
    )
    rng = spark.range(0, n, numPartitions=n_parts)
    return rng.mapInPandas(gen, schema=PAGES_SCHEMA)
