"""IPF gravity model: margins converge to targets, zero-margin
safety, and equivalence with a naive local IPF using the identical
integer half-up quantization."""

from lib_gdal_spark.operators.gravity import ipf_gravity
from lib_gdal_spark.session import local_df


def _dfs(spark, seed, row_t, col_t):
    s = local_df(spark, [(i, j, v) for (i, j), v in seed.items()],
                 "i long, j long, v long")
    r = local_df(spark, list(row_t.items()), "i long, t long")
    c = local_df(spark, list(col_t.items()), "j long, t long")
    return s, r, c


def _naive_ipf(seed, row_t, col_t, rounds):
    cells = dict(seed)
    for _ in range(rounds):
        for key_idx, targets in ((0, row_t), (1, col_t)):
            sums = {}
            for (i, j), v in cells.items():
                k = (i, j)[key_idx]
                sums[k] = sums.get(k, 0) + v
            cells = {
                (i, j): (0 if sums[(i, j)[key_idx]] == 0 else
                         (2 * v * targets[(i, j)[key_idx]]
                          + sums[(i, j)[key_idx]])
                         // (2 * sums[(i, j)[key_idx]]))
                for (i, j), v in cells.items()}
    return cells


def test_margins_hit_targets(spark):
    n = 6
    seed = {(i, j): (1 + (i + 2 * j) % 4) * 1000
            for i in range(n) for j in range(n)}
    row_t = {i: (30 + 5 * i) * 1000 for i in range(n)}
    tot = sum(row_t.values())
    col_t = {j: (30 + 5 * j) * 1000 for j in range(n)}
    assert sum(col_t.values()) == tot
    out = ipf_gravity(*_dfs(spark, seed, row_t, col_t), rounds=6).collect()
    rows, cols = {}, {}
    for r in out:
        rows[r["i"]] = rows.get(r["i"], 0) + r["t_milli"]
        cols[r["j"]] = cols.get(r["j"], 0) + r["t_milli"]
    # after 6 rounds margins land within quantization noise (n cells of
    # <=0.5 milli each per margin, doubly-stochastic residual < 1%)
    for i in range(n):
        assert abs(rows[i] - row_t[i]) <= max(10, row_t[i] // 100)
        assert abs(cols[i] - col_t[i]) <= max(10, col_t[i] // 100)


def test_matches_naive_integer_ipf(spark):
    n = 5
    seed = {(i, j): (1 + (3 * i + j) % 7) * 1000
            for i in range(n) for j in range(n)}
    row_t = {i: (20 + 7 * i) * 1000 for i in range(n)}
    col_t = {j: (20 + 7 * j) * 1000 for j in range(n)}
    out = {(r["i"], r["j"]): r["t_milli"]
           for r in ipf_gravity(
               *_dfs(spark, seed, row_t, col_t), rounds=3).collect()}
    want = _naive_ipf(seed, row_t, col_t, 3)
    assert out == want


def test_zero_row_stays_zero(spark):
    seed = {(0, 0): 1000, (0, 1): 2000, (1, 0): 0, (1, 1): 0}
    row_t = {0: 3000, 1: 0}
    col_t = {0: 1000, 1: 2000}
    out = {(r["i"], r["j"]): r["t_milli"]
           for r in ipf_gravity(
               *_dfs(spark, seed, row_t, col_t), rounds=2).collect()}
    assert out[(1, 0)] == 0 and out[(1, 1)] == 0
    assert out[(0, 0)] + out[(0, 1)] == 3000
