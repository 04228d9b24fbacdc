"""Degree mixing stats and rich-club (operators/graph.degree_mixing /
rich_club)."""

import numpy as np
import pandas as pd

from lib_gdal_spark.operators.graph import degree_mixing, rich_club


def _e(spark, edges):
    return spark.createDataFrame(pd.DataFrame(edges, columns=["u", "v"]),
                                 schema="u long, v long")


def test_reciprocity_counts(spark):
    # 4 edges, one mutual pair (1<->2)
    got = degree_mixing(_e(spark, [(1, 2), (2, 1), (1, 3), (3, 4)])).first()
    assert got["n_edges"] == 4 and got["n_reciprocal"] == 2
    assert abs(got["reciprocity"] - 0.5) < 1e-12


def test_assortativity_matches_numpy(spark):
    rng = np.random.default_rng(19)
    edges = list({(int(a), int(b)) for a, b in
                  rng.integers(0, 40, size=(150, 2)) if a != b})
    got = degree_mixing(_e(spark, edges)).first()
    ind = {}
    for _, v in edges:
        ind[v] = ind.get(v, 0) + 1
    x = np.array([ind.get(u, 0) for u, _ in edges], dtype=float)
    y = np.array([ind.get(v, 0) for _, v in edges], dtype=float)
    r = np.corrcoef(x, y)[0, 1]
    assert abs(got["assortativity"] - r) < 1e-6


def test_rich_club_bruteforce(spark):
    rng = np.random.default_rng(23)
    edges = list({(int(a), int(b)) for a, b in
                  rng.integers(0, 30, size=(120, 2)) if a != b})
    got = {r["k"]: (r["n_k"], r["e_k"], r["phi"])
           for r in rich_club(_e(spark, edges), ks=[1, 3, 5]).collect()}
    und = {tuple(sorted(p)) for p in edges}
    deg = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    for k in (1, 3, 5):
        club = {n for n, d in deg.items() if d > k}
        ek = sum(1 for a, b in und if a in club and b in club)
        nk = len(club)
        assert got[k][0] == nk and got[k][1] == ek
        if nk > 1:
            assert abs(got[k][2] - 2.0 * ek / (nk * (nk - 1))) < 1e-9
