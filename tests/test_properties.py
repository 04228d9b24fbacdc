"""Property-based tests (Hypothesis) over the pure NumPy kernels.

These pin cross-kernel invariants the unit tests can't enumerate:
ray-cast == half-plane on convex polygons, scanline fill == center PIP,
clip/erase partition areas, cell round-trips.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from lib_gdal_spark.functions import cells as C
from lib_gdal_spark.functions import geometry as G
from lib_gdal_spark.kernels import scanline as S

settings.register_profile("ci", max_examples=60, deadline=None)
settings.load_profile("ci")


def _hull(pts: np.ndarray) -> np.ndarray:
    """Monotone-chain convex hull, CCW, closed ring."""
    pts = pts[np.lexsort((pts[:, 1], pts[:, 0]))]

    def half(points):
        out = []
        for p in points:
            while len(out) >= 2 and np.cross(out[-1] - out[-2],
                                             p - out[-2]) <= 0:
                out.pop()
            out.append(p)
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    hull = np.array(lower[:-1] + upper[:-1])
    return np.vstack([hull, hull[:1]])


@st.composite
def convex_polys(draw):
    from hypothesis import assume

    cx = draw(st.floats(-50, 50))
    cy = draw(st.floats(-30, 30))
    n = draw(st.integers(3, 10))
    pts = np.array([
        (cx + draw(st.floats(-8, 8)), cy + draw(st.floats(-8, 8)))
        for _ in range(n)
    ])
    ring = _hull(pts)
    assume(len(ring) >= 4)  # >= 3 distinct hull vertices
    assume(G.shoelace_area([ring]) > 1e-3)
    return ring


@given(convex_polys(), st.lists(
    st.tuples(st.floats(-70, 70), st.floats(-50, 50)), min_size=5, max_size=40))
def test_raycast_matches_halfplane_on_convex(poly, pts):
    px = np.array([p[0] for p in pts])
    py = np.array([p[1] for p in pts])
    got = G.points_in_rings(px, py, [poly])
    # strict half-plane interior (CCW)
    inside = np.ones(len(px), dtype=bool)
    margin = np.full(len(px), np.inf)
    for i in range(len(poly) - 1):
        x1, y1 = poly[i]
        x2, y2 = poly[i + 1]
        d = (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)
        inside &= d > 0
        margin = np.minimum(margin, np.abs(d))
    # ignore near-boundary points (both rules are half-open there)
    clear = margin > 1e-9
    assert np.array_equal(got[clear], inside[clear])


@given(convex_polys())
def test_scanline_fill_matches_center_pip(poly):
    # shift into a 32x32 pixel grid
    p = poly - poly.min(axis=0) + 2.0
    mask = S.fill_polygon_mask(32, 32, [p])
    jj, ii = np.meshgrid(np.arange(32), np.arange(32), indexing="ij")
    centers = G.points_in_rings((ii + 0.5).ravel(), (jj + 0.5).ravel(), [p])
    # pixel centers on edges are ambiguous; require agreement where the
    # center is clearly inside/outside (distance via half-planes)
    margin = np.full(32 * 32, np.inf)
    for i in range(len(p) - 1):
        x1, y1 = p[i]
        x2, y2 = p[i + 1]
        e = np.hypot(x2 - x1, y2 - y1)
        if e == 0:
            continue
        d = ((x2 - x1) * ((jj + 0.5).ravel() - y1)
             - (y2 - y1) * ((ii + 0.5).ravel() - x1)) / e
        margin = np.minimum(margin, np.abs(d))
    clear = margin > 1e-6
    assert np.array_equal(mask.ravel()[clear], centers[clear])


@given(convex_polys(), convex_polys())
def test_clip_erase_partition_area(a, b):
    area_a = G.shoelace_area([a])
    clipped = G.clip_ring_convex(a, b)
    inter = G.shoelace_area([clipped]) if clipped is not None else 0.0
    pieces = G.erase_ring_convex(a, b)
    erased = sum(G.shoelace_area([p]) for p in pieces)
    assert inter >= -1e-9 and erased >= -1e-9
    assert abs((inter + erased) - area_a) < 1e-6 * max(area_a, 1.0)
    assert inter <= min(area_a, G.shoelace_area([b])) + 1e-6


@given(st.lists(st.tuples(st.floats(-179.9, 179.9), st.floats(-84.9, 84.9)),
                min_size=1, max_size=30), st.integers(3, 20))
def test_cell_roundtrip(points, res):
    lon = np.array([p[0] for p in points])
    lat = np.array([p[1] for p in points])
    cell = C.lonlat_to_cell(lon, lat, res)
    r, x, y = C.unpack_cell(cell)
    assert np.all(r == res)
    # the center of the cell maps back to the same cell
    clon, clat = C.cell_center(cell)
    assert np.array_equal(C.lonlat_to_cell(clon, clat, res), cell)
    # parent chain: coarser cell contains the finer cell's center
    if res > 3:
        parent = C.cell_parent(cell, res - 2)
        assert np.array_equal(
            C.lonlat_to_cell(clon, clat, res - 2), parent
        )


@given(st.floats(-179.0, 179.0), st.floats(-80.0, 80.0),
       st.floats(-179.0, 179.0), st.floats(-80.0, 80.0))
def test_haversine_metric_properties(lon1, lat1, lon2, lat2):
    d12 = C.haversine_km(np.array([lon1]), np.array([lat1]),
                         np.array([lon2]), np.array([lat2]))[0]
    d21 = C.haversine_km(np.array([lon2]), np.array([lat2]),
                         np.array([lon1]), np.array([lat1]))[0]
    assert abs(d12 - d21) < 1e-9
    assert d12 >= 0.0
    assert d12 <= 6371.0088 * np.pi + 1e-6  # half circumference


def test_cosine_topk_ivf_contract(spark, sf_dir):
    """IVF: candidates always come from probed lists; full probe == exact;
    recall grows monotonically with nprobe."""
    from pyspark.sql import functions as F

    from lib_gdal_spark.operators import ann as ANN

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    corpus = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    queries = corpus.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    exact = {(r["qid"], r["rank"]): r["vec_id"]
             for r in ANN.cosine_topk(queries, corpus, k=5).collect()}
    last = -1
    for nprobe in (4, 16, 32):
        got = {(r["qid"], r["rank"]): r["vec_id"]
               for r in ANN.cosine_topk_ivf(
                   queries, corpus, k=5, n_lists=32, nprobe=nprobe
               ).collect()}
        overlap = sum(1 for k2 in exact if got.get(k2) == exact[k2])
        assert overlap >= last
        last = overlap
    assert got == exact  # full probe degenerates to exact
