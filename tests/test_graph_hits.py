"""HITS hubs/authorities (operators/graph.py::hits)."""

from lib_gdal_spark.operators.graph import hits
from lib_gdal_spark.session import local_df


def test_hits_hub_authority_structure(spark):
    # 1 links to both sinks, 4 links to one: 1 must out-hub 4;
    # 2 receives from both hubs plus nothing else? structure:
    e = local_df(spark, [(1, 2), (1, 3), (4, 2), (2, 3)],
                 "u long, v long")
    got = {r["node"]: r for r in hits(e, n_iters=3).collect()}
    assert got[1]["hub_units"] > got[4]["hub_units"] > 0
    assert got[3]["auth_units"] >= got[2]["auth_units"] > 0
    assert got[3]["hub_units"] == 0 and got[1]["auth_units"] == 0
    # L1 normalization: units sum to <= scale (floor loss only)
    assert sum(r["hub_units"] for r in got.values()) <= 10**6
    assert sum(r["auth_units"] for r in got.values()) <= 10**6


def test_hits_deterministic_across_parallelism(spark):
    e = local_df(spark, [(i, (i * 3 + 1) % 40) for i in range(40)],
                 "u long, v long")
    a = {(r["node"], r["hub_units"], r["auth_units"])
         for r in hits(e).collect()}
    b = {(r["node"], r["hub_units"], r["auth_units"])
         for r in hits(e.repartition(13)).collect()}
    assert a == b


def test_neighborhood_function_path_graph(spark):
    import pandas as pd

    from lib_gdal_spark.operators.graph import neighborhood_function

    # directed path 0->1->...->9, seed 0: N(d) counts d+1 pairs
    e = spark.createDataFrame(
        pd.DataFrame([(i, i + 1) for i in range(9)], columns=["u", "v"]),
        schema="u long, v long")
    rows = sorted(neighborhood_function(e, seeds=[0]).collect(),
                  key=lambda r: r["d"])
    assert [r["n_at"] for r in rows] == [1] * 10
    assert [r["n_cum"] for r in rows] == list(range(1, 11))
    # effective diameter at 90%: smallest d with cum*10 >= 9*10 -> d=8
    eff = [r["d"] for r in rows if r["is_effective"]]
    assert eff == [8]


def test_coreness_matches_batagelj_zaversnik(spark):
    import heapq
    from collections import defaultdict

    import pandas as pd

    from lib_gdal_spark.operators.graph import coreness

    rng_edges = {((i * 11 + 1) % 50, (i * 7 + 3) % 50) for i in range(120)}
    rng_edges = [(u, v) for u, v in rng_edges if u != v]
    e = spark.createDataFrame(pd.DataFrame(rng_edges, columns=["u", "v"]),
                              schema="u long, v long")
    got = {r["node"]: r["coreness"] for r in coreness(e).collect()}
    adj = defaultdict(set)
    for u, v in rng_edges:
        adj[u].add(v)
        adj[v].add(u)
    cur = {n: len(a) for n, a in adj.items()}
    h = [(d, n) for n, d in cur.items()]
    heapq.heapify(h)
    alive, k, ref = set(adj), 0, {}
    while h:
        d, n = heapq.heappop(h)
        if n not in alive or cur[n] != d:
            continue
        k = max(k, d)
        ref[n] = k
        alive.discard(n)
        for m in adj[n]:
            if m in alive:
                cur[m] -= 1
                heapq.heappush(h, (cur[m], m))
    assert got == ref
