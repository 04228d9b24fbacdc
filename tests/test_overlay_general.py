"""General boolean overlay kernel + non-convex layer algebra.

Kernel oracle: even-odd membership sampled on a dense grid must match the
boolean of the two operands' sampled memberships for every op — concave,
holed, shared-edge, and slanted fixtures included. Layer-level tests run
Erase/Union/SymDifference with a CONCAVE, HOLED method layer (the round-1
convex-only restriction) and check closed-form areas.
"""

import numpy as np
import pytest

from lib_gdal_spark.functions import geometry as G
from lib_gdal_spark.functions import overlay as OV
from lib_gdal_spark.operators import layer_algebra as LA


def box(x0, y0, x1, y1):
    return np.array(
        [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], float
    )


C_SHAPE = np.array(
    [[0, 0], [6, 0], [6, 2], [2, 2], [2, 4], [6, 4], [6, 6], [0, 6], [0, 0]],
    float,
)


def _sample_inside(rings, xs, ys):
    gx, gy = np.meshgrid(xs, ys)
    out = np.zeros(gx.shape, dtype=bool)
    flat = out.ravel()
    for i, (x, y) in enumerate(zip(gx.ravel(), gy.ravel())):
        flat[i] = OV._point_in_rings_eo(x, y, rings)
    return flat.reshape(gx.shape)


@pytest.mark.parametrize("op,pyop", [
    ("intersection", lambda a, b: a & b),
    ("union", lambda a, b: a | b),
    ("difference", lambda a, b: a & ~b),
    ("xor", lambda a, b: a ^ b),
])
def test_kernel_membership_oracle(op, pyop):
    fixtures = [
        ([C_SHAPE], [box(1, 1, 5, 5)]),
        ([box(0, 0, 6, 6), box(2, 2, 4, 4)], [box(1, 1, 3, 3)]),  # holed A
        ([box(0, 0, 3, 3)], [box(3, 0, 6, 3)]),                   # shared edge
        ([np.array([[0, 0], [6, 0], [3, 5], [0, 0]], float)],
         [box(0, 1, 6, 2)]),                                      # slanted
    ]
    # off-lattice sample points (never on an edge)
    xs = np.linspace(0.137, 5.861, 23)
    ys = np.linspace(0.171, 5.903, 23)
    for a_rings, b_rings in fixtures:
        polys = OV.boolean_op(a_rings, b_rings, op)
        out_rings = [r for p in polys for r in p]
        got = _sample_inside(out_rings, xs, ys)
        want = pyop(_sample_inside(a_rings, xs, ys),
                    _sample_inside(b_rings, xs, ys))
        assert np.array_equal(got, want), (op, a_rings[0][:3])


def test_kernel_area_additivity():
    a = [C_SHAPE]
    b = [box(1, 1, 5, 5)]
    ai = OV.polys_area(OV.boolean_op(a, b, "intersection"))
    ad = OV.polys_area(OV.boolean_op(a, b, "difference"))
    bd = OV.polys_area(OV.boolean_op(b, a, "difference"))
    au = OV.polys_area(OV.boolean_op(a, b, "union"))
    ax = OV.polys_area(OV.boolean_op(a, b, "xor"))
    area_a = OV.polys_area(OV.boolean_op(a, [], "union"))
    area_b = OV.polys_area(OV.boolean_op(b, [], "union"))
    assert abs(ai + ad - area_a) < 1e-9
    assert abs(ai + bd - area_b) < 1e-9
    assert abs(au - (area_a + area_b - ai)) < 1e-9
    assert abs(ax - (ad + bd)) < 1e-9


def _layers(spark):
    # inputs: two boxes; method: concave C-shape with a hole, shifted
    hole = box(0.5, 4.5, 1.5, 5.5)
    inputs = spark.createDataFrame(
        [(1, bytearray(G.wkb_polygon([box(-2, -2, 3, 3)]))),
         (2, bytearray(G.wkb_polygon([box(10, 10, 12, 12)])))],
        "fid long, geom_wkb binary",
    ).coalesce(1)
    method = spark.createDataFrame(
        [(7, bytearray(G.wkb_polygon([C_SHAPE, hole])))],
        "fid long, geom_wkb binary",
    ).coalesce(1)
    return inputs, method


def test_erase_concave_holed_method(spark):
    inputs, method = _layers(spark)
    rows = {r["in_fid"]: r for r in LA.erase(inputs, method, res=3).collect()}
    # input 1 (25 units) minus C∩box1: C covers [0,3]x[0,2] + [0,2]x[2,3]
    #   within box1 => 6 + 2 = 8; hole is outside box1 -> area 25 - 8 = 17
    assert rows[1]["area"] == pytest.approx(17.0, abs=1e-9)
    # input 2 does not touch the method layer -> unchanged
    assert rows[2]["area"] == pytest.approx(4.0, abs=1e-9)


def test_union_and_symdiff_concave(spark):
    inputs, method = _layers(spark)
    area_c = OV.polys_area(
        OV.boolean_op([C_SHAPE, box(0.5, 4.5, 1.5, 5.5)], [], "union")
    )  # 36 - 8 (notch) - 1 (hole) = 27
    assert area_c == pytest.approx(27.0)
    u = LA.union_overlay(inputs, method, res=3).collect()
    inter = [r for r in u if r["in_fid"] is not None and r["m_fid"] is not None]
    a_only = [r for r in u if r["m_fid"] is None]
    b_only = [r for r in u if r["in_fid"] is None]
    ai = sum(r["area"] for r in inter)
    assert ai == pytest.approx(8.0, abs=1e-9)
    assert sum(r["area"] for r in a_only) == pytest.approx(17.0 + 4.0, abs=1e-9)
    assert sum(r["area"] for r in b_only) == pytest.approx(27.0 - 8.0, abs=1e-9)
    s = LA.sym_difference(inputs, method, res=3).collect()
    assert sum(r["area"] for r in s) == pytest.approx(
        (17.0 + 4.0) + (27.0 - 8.0), abs=1e-9
    )


def test_kernel_random_rectangles_property():
    """Property: boolean areas of random axis-aligned rect pairs match
    independent interval arithmetic for every op (200 cases)."""
    rng = np.random.default_rng(99)
    for _ in range(200):
        a = np.sort(rng.uniform(0, 10, 2))
        b = np.sort(rng.uniform(0, 10, 2))
        c = np.sort(rng.uniform(0, 10, 2))
        d = np.sort(rng.uniform(0, 10, 2))
        ra = box(a[0], b[0], a[1], b[1])
        rb = box(c[0], d[0], c[1], d[1])
        ox = max(0.0, min(a[1], c[1]) - max(a[0], c[0]))
        oy = max(0.0, min(b[1], d[1]) - max(b[0], d[0]))
        ia = ox * oy
        aa = (a[1] - a[0]) * (b[1] - b[0])
        ab = (c[1] - c[0]) * (d[1] - d[0])
        want = {
            "intersection": ia,
            "union": aa + ab - ia,
            "difference": aa - ia,
            "xor": aa + ab - 2 * ia,
        }
        for op, w in want.items():
            got = OV.polys_area(OV.boolean_op([ra], [rb], op))
            assert abs(got - w) < 1e-9, (op, a, b, c, d, got, w)


def test_kernel_random_triangle_membership():
    """Random triangle pairs: sampled even-odd membership oracle."""
    rng = np.random.default_rng(123)
    xs = np.linspace(0.313, 9.687, 13)
    ys = np.linspace(0.171, 9.829, 13)
    for _ in range(30):
        t1 = rng.uniform(0, 10, (3, 2))
        t2 = rng.uniform(0, 10, (3, 2))
        a = [np.vstack([t1, t1[:1]])]
        b = [np.vstack([t2, t2[:1]])]
        for op, pyop in [("intersection", lambda x, y: x & y),
                         ("union", lambda x, y: x | y),
                         ("difference", lambda x, y: x & ~y)]:
            polys = OV.boolean_op(a, b, op)
            rings = [r for p in polys for r in p]
            got = _sample_inside(rings, xs, ys)
            want = pyop(_sample_inside(a, xs, ys), _sample_inside(b, xs, ys))
            assert np.array_equal(got, want), op


def _random_simple_polygon(rng, n_verts, cx, cy, rmin, rmax):
    """Star-shaped (hence simple) polygon: radially sorted random vertices."""
    ang = np.sort(rng.uniform(0, 2 * np.pi, n_verts))
    rad = rng.uniform(rmin, rmax, n_verts)
    pts = np.column_stack([cx + rad * np.cos(ang), cy + rad * np.sin(ang)])
    return np.vstack([pts, pts[:1]])


def test_kernel_fuzz_random_concave_pairs():
    """50 random concave polygon pairs x 4 ops vs the sampled even-odd
    membership oracle — the strongest stress of the slab kernel."""
    rng = np.random.default_rng(77)
    xs = np.linspace(0.119, 9.881, 17)
    ys = np.linspace(0.233, 9.767, 17)
    for trial in range(50):
        a = [_random_simple_polygon(rng, rng.integers(5, 12), 4.5, 4.5,
                                    1.0, 4.4)]
        b = [_random_simple_polygon(rng, rng.integers(5, 12), 5.5, 5.5,
                                    1.0, 4.4)]
        for op, pyop in [("intersection", lambda x, y: x & y),
                         ("union", lambda x, y: x | y),
                         ("difference", lambda x, y: x & ~y),
                         ("xor", lambda x, y: x ^ y)]:
            polys = OV.boolean_op(a, b, op)
            rings = [r for p in polys for r in p]
            got = _sample_inside(rings, xs, ys)
            want = pyop(_sample_inside(a, xs, ys), _sample_inside(b, xs, ys))
            assert np.array_equal(got, want), (trial, op)
        # area identity on every trial
        ai = OV.polys_area(OV.boolean_op(a, b, "intersection"))
        au = OV.polys_area(OV.boolean_op(a, b, "union"))
        aa = OV.polys_area(OV.boolean_op(a, [], "union"))
        ab = OV.polys_area(OV.boolean_op(b, [], "union"))
        assert abs(au - (aa + ab - ai)) < 1e-9, trial
