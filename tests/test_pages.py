"""Pages generator + extraction invariants (pure pandas, no Spark)."""

import numpy as np

from lib_gdal_spark.functions import cells as C
from lib_gdal_spark.functions import extract as X
from lib_gdal_spark.sources import pages as P


def test_deterministic_across_batching():
    ids = np.arange(0, 200)
    full = P.build_batch(ids)
    a = P.build_batch(ids[:97])
    b = P.build_batch(ids[97:])
    assert (full["html"].iloc[:97].to_numpy() == a["html"].to_numpy()).all()
    assert (full["html"].iloc[97:].to_numpy() == b["html"].to_numpy()).all()


def test_text_invariant_byte_identical():
    b = P.build_batch(np.arange(0, 500))
    got = X.html_to_text(X.decode_html(b["html"]))
    assert (got.str.encode("utf-8") == b["text"].str.encode("utf-8")).all()


def test_coords_roundtrip():
    ids = np.arange(0, 1000)
    b = P.build_batch(ids)
    lon_e, lat_e = X.extract_coords(X.decode_html(b["html"]))
    lon_g, lat_g = P.page_coords(ids)
    has = ~np.isnan(lon_g)
    assert has.mean() > 0.5  # GEO_FRACTION ~ 0.8
    assert np.isnan(lon_e.to_numpy()[~has]).all()
    # 4-decimal string round trip is exact
    assert np.array_equal(lon_e.to_numpy()[has], lon_g[has])
    assert np.array_equal(lat_e.to_numpy()[has], lat_g[has])


def test_skew_present():
    ids = np.arange(0, 20000)
    lon, lat = P.page_coords(ids)
    ok = ~np.isnan(lon)
    cell = C.lonlat_to_cell(lon[ok], lat[ok], 7)
    _, counts = np.unique(cell, return_counts=True)
    # Zipf over cities: the hottest cell should dominate the median cell.
    assert counts.max() > 20 * np.median(counts)


def test_duplicates_exist():
    b = P.build_batch(np.arange(0, 5000))
    body = b["text"].str.split("\n").str[1]
    assert body.duplicated().mean() > 0.02
