"""Discrete Fréchet / Hausdorff vs brute-force DP and analytic cases."""

import itertools

import numpy as np
import pytest

from lib_gdal_spark.operators.trajectory import trajectory_similarity


def _df(spark, tracks):
    rows = [(tid, s, int(x), int(y))
            for tid, pts in tracks.items()
            for s, (x, y) in enumerate(pts)]
    return spark.createDataFrame(rows, "tid long, seq int, x long, y long")


def _brute_frechet2(a, b):
    la, lb = len(a), len(b)
    d2 = [[(a[i][0] - b[j][0]) ** 2 + (a[i][1] - b[j][1]) ** 2
           for j in range(lb)] for i in range(la)]
    f = [[0] * lb for _ in range(la)]
    for i in range(la):
        for j in range(lb):
            if i == 0 and j == 0:
                f[i][j] = d2[0][0]
            elif i == 0:
                f[i][j] = max(f[0][j - 1], d2[0][j])
            elif j == 0:
                f[i][j] = max(f[i - 1][0], d2[i][0])
            else:
                f[i][j] = max(d2[i][j], min(f[i - 1][j], f[i - 1][j - 1],
                                            f[i][j - 1]))
    return f[la - 1][lb - 1]


def _brute_hausdorff2(a, b):
    d2 = [[(p[0] - q[0]) ** 2 + (p[1] - q[1]) ** 2 for q in b] for p in a]
    return max(max(min(row) for row in d2),
               max(min(d2[i][j] for i in range(len(a)))
                   for j in range(len(b))))


def test_vs_brute_force(spark):
    rng = np.random.default_rng(4)
    tracks = {t: [(int(rng.integers(0, 100)), int(rng.integers(0, 100)))
                  for _ in range(int(rng.integers(3, 9)))]
              for t in range(6)}
    out = {(r["tid_a"], r["tid_b"]): r
           for r in trajectory_similarity(_df(spark, tracks)).collect()}
    for ta, tb in itertools.combinations(range(6), 2):
        assert out[(ta, tb)]["frechet2"] == \
            _brute_frechet2(tracks[ta], tracks[tb]), (ta, tb)
        assert out[(ta, tb)]["hausdorff2"] == \
            _brute_hausdorff2(tracks[ta], tracks[tb]), (ta, tb)


def test_analytic_cases(spark):
    # identical tracks -> 0; parallel offset lines -> offset^2 for both;
    # frechet >= hausdorff always
    line = [(i, 0) for i in range(6)]
    shifted = [(i, 3) for i in range(6)]
    rev = list(reversed(line))
    out = {(r["tid_a"], r["tid_b"]): r for r in trajectory_similarity(
        _df(spark, {0: line, 1: list(line), 2: shifted, 3: rev})).collect()}
    assert out[(0, 1)]["frechet2"] == 0 and out[(0, 1)]["hausdorff2"] == 0
    assert out[(0, 2)]["frechet2"] == 9 and out[(0, 2)]["hausdorff2"] == 9
    # reversed direction: Hausdorff blind (same point set), Fréchet not
    assert out[(0, 3)]["hausdorff2"] == 0
    assert out[(0, 3)]["frechet2"] == 25  # forced crossing at distance 5
    for r in out.values():
        assert r["frechet2"] >= r["hausdorff2"]


def test_guards(spark):
    df = _df(spark, {0: [(0, 0)] * 5, 1: [(1, 1)] * 5})
    with pytest.raises(ValueError):
        trajectory_similarity(df, max_len=3)
    many = _df(spark, {t: [(t, t)] for t in range(10)})
    with pytest.raises(ValueError):
        trajectory_similarity(many, max_pairs=10)


def test_partition_invariance(spark):
    rng = np.random.default_rng(2)
    tracks = {t: [(int(rng.integers(0, 50)), int(rng.integers(0, 50)))
                  for _ in range(5)] for t in range(8)}
    a = sorted(map(tuple, trajectory_similarity(
        _df(spark, tracks)).collect()))
    b = sorted(map(tuple, trajectory_similarity(
        _df(spark, tracks).repartition(9)).collect()))
    assert a == b
