"""GNM graph operators vs hand-computed references."""

import pytest

from lib_gdal_spark.operators import graph as GG

# weighted test graph:
#   0 -1- 1 -1- 2
#   |         /
#   4 ------2
#   plus a long cheap detour 0-3-2 (cost 2.5+0.1)
EDGES = [
    (0, 1, 1.0), (1, 2, 1.0), (0, 4, 4.0), (4, 2, 2.0),
    (0, 3, 2.5), (3, 2, 0.1),
]


def _edges_df(spark):
    return spark.createDataFrame(EDGES, "u long, v long, w double")


def test_shortest_path_tree_and_path(spark):
    e = _edges_df(spark)
    path, cost = GG.shortest_path(e, 0, 2)
    assert cost == pytest.approx(2.0)
    assert path == [0, 1, 2]
    tree = {r["node"]: r["dist"] for r in
            GG.shortest_path_tree(e, 0).collect()}
    assert tree[0] == 0.0 and tree[1] == 1.0
    assert tree[2] == pytest.approx(2.0)
    assert tree[3] == pytest.approx(2.1)  # undirected: 0-1-2-3
    assert tree[4] == pytest.approx(4.0)


def test_shortest_path_long_chain(spark):
    # 20-hop chain: needs one relaxation round per hop to converge
    chain = [(i, i + 1, 1.0) for i in range(20)]
    e = spark.createDataFrame(chain, "u long, v long, w double")
    path, cost = GG.shortest_path(e, 0, 20)
    assert cost == pytest.approx(20.0)
    assert len(path) == 21


def test_k_shortest(spark):
    e = _edges_df(spark)
    paths = GG.k_shortest_paths(e, 0, 2, k=3)
    assert [round(c, 6) for _, c in paths] == [2.0, 2.6, 6.0]
    assert paths[0][0] == [0, 1, 2]
    assert paths[1][0] == [0, 3, 2]
    assert paths[2][0] == [0, 4, 2]


def test_graph_components(spark):
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "u long, v long"
    )
    got = {r["label"]: r["component"] for r in
           GG.graph_connected_components(e).collect()}
    assert got[2] == 1 and got[3] == 1 and got[11] == 10


def test_pagerank_exact_and_ordering(spark):
    from pyspark.sql import functions as F

    from lib_gdal_spark.operators import graph as GG

    # star: everyone links to hub 0; hub links to 1. Hub must dominate.
    edges = [(i, 0) for i in range(1, 20)] + [(0, 1)]
    e = spark.createDataFrame(edges, "u long, v long")
    out = {r["node"]: r for r in GG.pagerank(e, n_iters=4).collect()}
    ranks = {k: v["rank_units"] for k, v in out.items()}
    # the 2-cycle 0<->1 makes the power iteration oscillate (periodic
    # graph, fixed iteration count): mass sloshes between 0 and 1, but
    # both always dominate every leaf, and all leaves tie exactly
    assert min(ranks[0], ranks[1]) > ranks[2]
    assert len(set(ranks[i] for i in range(2, 20))) == 1  # leaves tie
    # integer mass conservation: floor losses only, bounded per division
    total = sum(ranks.values())
    assert 0 <= 10**12 - total <= 20 * 100 * 4

    # bit-identical at any parallelism (the whole point of integer mode)
    out2 = {r["node"]: r["rank_units"]
            for r in GG.pagerank(e.repartition(7), n_iters=4).collect()}
    assert out2 == ranks


def test_pagerank_dangling_redistribution(spark):
    from lib_gdal_spark.operators import graph as GG

    # 1 -> 2, 2 dangling: without redistribution node 2's mass vanishes
    e = spark.createDataFrame([(1, 2)], "u long, v long")
    out = {r["node"]: r["rank_units"]
           for r in GG.pagerank(e, n_iters=3).collect()}
    total = sum(out.values())
    assert 10**12 - total < 100           # dangling mass is recycled
    assert out[2] > out[1]                # 2 receives 1's full outflow


def test_harmonic_centrality_matches_bfs(spark):
    """Path graph 0->1->2->3 plus a shortcut 0->3: known distances."""
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (0, 3)], "u long, v long")
    got = {r["node"]: r["harmonic_units"]
           for r in GG.harmonic_centrality(edges, seeds=[0, 1]).collect()}
    S = 10**6
    # from 0: d(1)=1 d(2)=2 d(3)=1; from 1: d(2)=1 d(3)=2
    assert got == {
        1: S // 1,
        2: S // 2 + S // 1,
        3: S // 1 + S // 2,
    }


def test_harmonic_unreachable_contributes_zero(spark):
    edges = spark.createDataFrame([(0, 1), (2, 3)], "u long, v long")
    got = {r["node"]: r["harmonic_units"]
           for r in GG.harmonic_centrality(edges, seeds=[0]).collect()}
    assert got == {1: 10**6}  # 2, 3 unreachable from 0; seed itself d=0


def test_salsa_degree_normalization(spark):
    """Star u0 -> {v1, v2} vs the parallel pair u1 -> v1, u2 -> v2:
    after one authority step every contribution is h div outdeg, so the
    star's children each get half of u0's mass while v1 also gets all
    of u1's. Verified against a tiny numpy-free manual unroll."""
    edges = spark.createDataFrame(
        [(0, 10), (0, 11), (1, 10)], "u long, v long")
    out = {r["node"]: (r["hub_units"], r["auth_units"])
           for r in GG.salsa(edges, n_iters=1, scale=100).collect()}
    # h0 = 100 everywhere. a(10) = 100 div 2 + 100 div 1 = 150,
    # a(11) = 50. Then id(10)=2, id(11)=1:
    # h(0) = a(10) div 2 + a(11) div 1 = 75 + 50 = 125
    # h(1) = a(10) div 2 = 75; sinks have no out-edges -> hub 0.
    assert out[10] == (0, 150)
    assert out[11] == (0, 50)
    assert out[0] == (125, 0)
    assert out[1] == (75, 0)


def test_salsa_partition_invariance(spark):
    edges = spark.createDataFrame(
        [(i, (i * 7 + 3) % 40) for i in range(40)], "u long, v long")
    a = GG.salsa(edges).collect()
    b = GG.salsa(edges.repartition(13)).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


# square 1-2-3-4 with diagonal 1-3, pendant 5 on 4:
#   N(1)={2,3,4} N(2)={1,3} N(3)={1,2,4} N(4)={1,3,5} N(5)={4}
LP_EDGES = [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3), (4, 5)]


def test_link_prediction_square_diagonal(spark):
    e = spark.createDataFrame(LP_EDGES, "u long, v long")
    rows = GG.link_prediction(e).collect()
    assert len(rows) == 1  # only (2,4) has >= 2 common neighbors
    r = rows[0]
    assert (r["a"], r["b"], r["cn"]) == (2, 4, 2)  # via 1 and 3
    assert (r["deg_a"], r["deg_b"]) == (2, 3)
    assert r["jaccard"] == pytest.approx(round(2 / 3, 6))
    assert r["pref_attach"] == 6


def test_link_prediction_min_common_and_dupes(spark):
    # duplicated / reversed / self-loop edges collapse in the
    # symmetrize-distinct; min_common=1 admits the pendant wedges
    e = spark.createDataFrame(
        LP_EDGES + [(2, 1), (4, 3), (4, 5), (5, 5)], "u long, v long")
    got = {(r["a"], r["b"]): r["cn"]
           for r in GG.link_prediction(e, min_common=1).collect()}
    assert got == {(2, 4): 2, (1, 5): 1, (3, 5): 1}


def test_link_prediction_hub_cap_drops_hub_wedges(spark):
    # cap 2 removes wedges through the degree-3 nodes 1, 3, 4; the
    # surviving wedge midpoints (2, 5) only generate existing edges
    e = spark.createDataFrame(LP_EDGES, "u long, v long")
    assert GG.link_prediction(e, min_common=1, hub_cap=2).count() == 0
