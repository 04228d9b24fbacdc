"""Kleinberg burst detection (operators/burst.py) vs brute-force Viterbi."""

import pandas as pd

from lib_gdal_spark.operators.burst import cost_units, kleinberg_bursts

INF = 1 << 60


def viterbi(series, costs, gamma):
    """Reference integer Viterbi with the operator's exact tie rules."""
    c0r, c0n = costs["c0_r"], costs["c0_n"]
    c1r, c1n = costs["c1_r"], costs["c1_n"]
    dp0, dp1 = 0, INF
    hist = []
    for _, r, d in series:
        e0 = c0r * r + c0n * (d - r)
        e1 = c1r * r + c1n * (d - r)
        enter = dp0 + gamma
        a0 = 0 if dp0 <= dp1 else 1
        a1 = 0 if enter < dp1 else 1
        dp0, dp1 = min(dp0, dp1) + e0, min(enter, dp1) + e1
        hist.append((a0, a1))
    cur = 0 if dp0 <= dp1 else 1
    states = []
    for a0, a1 in reversed(hist):
        states.append(cur)
        cur = a0 if cur == 0 else a1
    return list(reversed(states))


def _run(spark, data, p0, p1, gamma):
    rows = [(k, t, r, d) for k, series in data.items() for t, r, d in series]
    bins = spark.createDataFrame(
        pd.DataFrame(rows, columns=["key", "tbin", "r", "d"]))
    costs = cost_units(p0, p1)
    out = kleinberg_bursts(bins, costs, gamma)
    got = {(r.key, r.tbin): r.state for r in out.collect()}
    for k, series in data.items():
        want = viterbi(series, costs, gamma)
        for (t, _, _), s in zip(series, want):
            assert got[(k, t)] == s, (k, t, got[(k, t)], s)
    return got


def test_clear_burst_window(spark):
    # baseline 10/100, burst of 50/100 in the middle
    series = [(t, 50 if 8 <= t < 12 else 10, 100) for t in range(20)]
    got = _run(spark, {"a": series}, p0=0.1, p1=0.4, gamma=5 * 10**9)
    assert [got[("a", t)] for t in range(20)] == \
        [0] * 8 + [1] * 4 + [0] * 8


def test_gamma_suppresses_blips(spark):
    # a single elevated bin is not worth the entry cost at high gamma
    series = [(t, 40 if t == 5 else 10, 100) for t in range(10)]
    got_hi = _run(spark, {"k": series}, p0=0.1, p1=0.4, gamma=40 * 10**9)
    assert all(got_hi[("k", t)] == 0 for t in range(10))
    got_lo = _run(spark, {"k": series}, p0=0.1, p1=0.4, gamma=10**8)
    assert got_lo[("k", 5)] == 1


def test_multi_key_and_noise(spark):
    import random
    rng = random.Random(7)
    data = {}
    for k in ("x", "y", "z"):
        data[k] = [(t, rng.randint(5, 35), 100) for t in range(30)]
    _run(spark, data, p0=0.12, p1=0.3, gamma=3 * 10**9)  # asserts inside
