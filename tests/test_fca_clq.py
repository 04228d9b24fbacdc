"""2SFCA accessibility and colocation quotient
(operators/spatialstats.two_step_fca / colocation_quotient)."""

import numpy as np
import pandas as pd

from lib_gdal_spark.operators.spatialstats import (
    colocation_quotient, two_step_fca)


def test_two_step_fca_hand_computed(spark):
    # supply A (cap 4) at (0,0) reaches demands 1,2; supply B (cap 6)
    # at (10,0) reaches demands 2,3; demand 4 is out of every catchment
    sup = spark.createDataFrame(
        pd.DataFrame([(100, 0.0, 0.0, 4), (200, 10.0, 0.0, 6)],
                     columns=["pid", "x", "y", "s"]),
        schema="pid long, x double, y double, s long")
    dem = spark.createDataFrame(
        pd.DataFrame([(1, 3.0, 0.0, 2), (2, 5.0, 0.0, 1),
                      (3, 13.0, 0.0, 5), (4, 50.0, 50.0, 9)],
                     columns=["pid", "x", "y", "d"]),
        schema="pid long, x double, y double, d long")
    got = {r["pid"]: r["access_units"]
           for r in two_step_fca(sup, dem, radius=6.0).collect()}
    ra = int(np.floor(4 / 3 * 1e9 + 0.5))   # A: demands 2+1
    rb = int(np.floor(6 / 6 * 1e9 + 0.5))   # B: demands 1+5
    assert got == {1: ra, 2: ra + rb, 3: rb, 4: 0}


def test_clq_segregated_clusters(spark):
    # two tight same-category blobs far apart: every NN is same-type,
    # so CLQ_aa and CLQ_bb >> 1 and cross pairs are absent
    rng = np.random.default_rng(2)
    rows = []
    for i, (x, y) in enumerate(rng.uniform(0, 1, size=(20, 2))):
        rows.append((i, float(x), float(y), "a"))
    for i, (x, y) in enumerate(rng.uniform(100, 101, size=(20, 2))):
        rows.append((100 + i, float(x), float(y), "b"))
    pts = spark.createDataFrame(
        pd.DataFrame(rows, columns=["pid", "x", "y", "cat"]),
        schema="pid long, x double, y double, cat string")
    got = {(r["cat_a"], r["cat_b"]): r for r in
           colocation_quotient(pts, cell=2.0).collect()}
    assert set(got) == {("a", "a"), ("b", "b")}
    # C_aa/N_a = 1; expected share = (20-1)/39 -> CLQ = 39/19
    assert abs(got[("a", "a")]["clq"] - 39.0 / 19.0) < 1e-9
    assert got[("a", "a")]["c_ab"] == 20


def test_clq_matches_bruteforce_nn(spark):
    rng = np.random.default_rng(4)
    xy = rng.uniform(0, 20, size=(60, 2))
    cats = [("c%d" % (i % 3)) for i in range(60)]
    pts = spark.createDataFrame(
        pd.DataFrame([(i, *xy[i], cats[i]) for i in range(60)],
                     columns=["pid", "x", "y", "cat"]),
        schema="pid long, x double, y double, cat string")
    got = {(r["cat_a"], r["cat_b"]): r["c_ab"] for r in
           colocation_quotient(pts, cell=1.0).collect()}
    d = np.hypot(xy[:, None, 0] - xy[None, :, 0],
                 xy[:, None, 1] - xy[None, :, 1])
    np.fill_diagonal(d, np.inf)
    ref = {}
    for i in range(60):
        j = int(d[i].argmin())  # unique distances w.p. 1 for uniforms
        k = (cats[i], cats[j])
        ref[k] = ref.get(k, 0) + 1
    assert got == ref
