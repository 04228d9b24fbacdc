"""Borůvka MST vs a local Kruskal reference (union-find), plus known
small trees, a disconnected forest, and a chain-merge stress that
exercises deep pointer jumping in a single round."""

import random

from lib_gdal_spark.operators.graph import boruvka_mst
from lib_gdal_spark.session import local_df


def _edges(spark, rows):
    return local_df(spark, rows, "u long, v long, w long")


def _kruskal(rows):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    out = []
    for u, v, w in sorted(rows, key=lambda r: r[2]):
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
            out.append((min(u, v), max(u, v), w))
    return sorted(out)


def test_known_triangle(spark):
    rows = [(0, 1, 5), (1, 2, 3), (0, 2, 4)]
    got = sorted((r["ea"], r["eb"], r["w"])
                 for r in boruvka_mst(_edges(spark, rows)).collect())
    assert got == [(0, 2, 4), (1, 2, 3)]


def test_matches_kruskal_random(spark):
    rng = random.Random(23)
    n = 60
    rows, seen = [], set()
    # spanning ring + random chords, all-distinct weights
    ws = rng.sample(range(1, 10_000), n + 120)
    for i in range(n):
        rows.append((i, (i + 1) % n, ws[i]))
        seen.add(frozenset((i, (i + 1) % n)))
    k = n
    while k < n + 120:
        u, v = rng.randrange(n), rng.randrange(n)
        if u == v or frozenset((u, v)) in seen:
            k += 1
            continue
        seen.add(frozenset((u, v)))
        rows.append((u, v, ws[k]))
        k += 1
    got = sorted((r["ea"], r["eb"], r["w"])
                 for r in boruvka_mst(_edges(spark, rows)).collect())
    want = _kruskal(rows)
    assert len(got) == n - 1
    assert got == want


def test_disconnected_forest(spark):
    rows = [(0, 1, 1), (1, 2, 2),          # component A
            (10, 11, 3), (11, 12, 4), (10, 12, 5)]   # component B
    got = sorted((r["ea"], r["eb"], r["w"])
                 for r in boruvka_mst(_edges(spark, rows)).collect())
    assert got == [(0, 1, 1), (1, 2, 2), (10, 11, 3), (11, 12, 4)]


def test_chain_merge_single_round(spark):
    # weights decrease along a path: every component's cheapest edge
    # points "rightward", producing one long merge chain in round one —
    # the pointer-jumping depth test
    n = 40
    rows = [(i, i + 1, 1000 - i) for i in range(n)]
    got = sorted((r["ea"], r["eb"], r["w"])
                 for r in boruvka_mst(_edges(spark, rows)).collect())
    assert got == sorted((i, i + 1, 1000 - i) for i in range(n))
