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
