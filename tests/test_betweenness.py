"""Seed-sampled Brandes betweenness (operators/graph.betweenness)."""

from collections import defaultdict, deque
from fractions import Fraction

import pandas as pd

from lib_gdal_spark.operators.graph import betweenness

SCALE = 10**6


def _local_brandes_quantized(edges, seeds):
    """The identical integer fixed-point recursion, single-threaded."""
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
    dep_total = defaultdict(int)
    for s in seeds:
        dist, sig = {s: 0}, {s: 1}
        order = [s]
        q = deque([s])
        while q:
            u = q.popleft()
            for w in adj[u]:
                if w not in dist:
                    dist[w] = dist[u] + 1
                    sig[w] = 0
                    order.append(w)
                    q.append(w)
                if dist[w] == dist[u] + 1:
                    sig[w] += sig[u]
        dep = defaultdict(int)
        for v in reversed(order):
            for w in adj[v]:
                if dist.get(w) == dist[v] + 1:
                    dep[v] += sig[v] * (SCALE + dep.get(w, 0)) // sig[w]
        for v, d in dep.items():
            if v != s:
                dep_total[v] += d
    return dict(dep_total)


def _run(spark, edges, seeds):
    e = spark.createDataFrame(pd.DataFrame(edges, columns=["u", "v"]),
                              schema="u long, v long")
    return {r["node"]: r["bc_units"]
            for r in betweenness(e, seeds, max_dist=16).collect()}


def test_path_graph_middle_dominates(spark):
    # directed path 0->1->...->6 from source 0: dep(v) = hops usable
    # below v; node 1 carries the most
    edges = [(i, i + 1) for i in range(6)]
    got = _run(spark, edges, [0])
    assert got[1] > got[2] > got[3] > got[4] > got[5]
    # exact: D(5)=SCALE, D(4)=2*SCALE, ... D(1)=5*SCALE (sigma all 1)
    for v in range(1, 6):
        assert got[v] == (6 - v) * SCALE
    assert 0 not in got and 6 not in got  # source excluded; leaf no row


def test_matches_local_quantized_brandes(spark):
    edges = list({((i * 7 + 3) % 60, (i * 13 + 5) % 60) for i in range(60)}
                 | {((i * 11 + 1) % 60, (i * 5 + 2) % 60) for i in range(60)})
    edges = [(u, v) for u, v in edges if u != v]
    seeds = [1, 7, 13]
    got = _run(spark, edges, seeds)
    ref = _local_brandes_quantized(edges, seeds)
    assert got == ref


def test_quantization_close_to_exact_rationals(spark):
    # the fixed-point floor error is bounded: each DAG edge floors once,
    # so |bc_units/SCALE - exact| < (#DAG edges) / SCALE per seed chain
    edges = [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4)]
    got = _run(spark, edges, [0])
    # exact Brandes from 0: sigma(3)=2, dep(1)=dep(2)=1/2*(1+1)=1,
    # dep(3)=1 (via 4), dep of 4 = 0
    exact = {1: Fraction(1), 2: Fraction(1), 3: Fraction(1)}
    for v, e in exact.items():
        assert abs(got[v] / SCALE - float(e)) < 5e-6
