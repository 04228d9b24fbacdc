"""connected_components (large-star/small-star) vs a reference union-find."""

import random

from lib_gdal_spark.operators.components import connected_components


def _uf_reference(edges):
    parent = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            if ra > rb:
                ra, rb = rb, ra
            parent[rb] = ra
    nodes = {n for e in edges for n in e}
    return {n: find(n) for n in nodes}


def _check(spark, edges):
    df = spark.createDataFrame(edges, "u long, v long")
    ref = _uf_reference(edges)
    # both paths: the driver fast path AND the large-star/small-star rounds
    for thresh in (200_000, 0):
        got = {
            r["label"]: r["component"]
            for r in connected_components(df, driver_threshold=thresh).collect()
        }
        for n, root in ref.items():
            assert got.get(n, n) == root, (thresh, n, got.get(n), root)


def test_chain_and_star(spark):
    # long chain (worst case for plain label propagation)
    _check(spark, [(i, i + 1) for i in range(0, 200)])
    # star + disjoint pair
    _check(spark, [(100, i) for i in range(101, 130)] + [(7, 3)])


def test_random_graphs(spark):
    rng = random.Random(1234)
    nodes = list(range(0, 500, 7))
    edges = [
        (rng.choice(nodes), rng.choice(nodes))
        for _ in range(300)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    _check(spark, edges)
