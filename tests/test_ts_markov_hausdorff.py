"""Closed-form checks for periodogram, Holt smoothing, Markov chain,
and discrete Hausdorff."""

from __future__ import annotations

import math

import pandas as pd
import pytest
from pyspark.sql import functions as F

from lib_gdal_spark.operators.events import markov_chain
from lib_gdal_spark.operators.timeseries import holt_smoothing, periodogram
from lib_gdal_spark.operators.trajectory import hausdorff_pairs


def test_periodogram_detects_harmonic(spark):
    n = 48
    rows = [(t, 10 + round(8 * math.cos(2 * math.pi * 2 * t / n)))
            for t in range(n)]
    s = spark.createDataFrame(rows, "t long, x long")
    out = {r["k"]: r["power"] for r in periodogram(s, 6).collect()}
    assert out[2] == max(out.values())
    assert out[2] > 100 * max(v for k, v in out.items() if k != 2)


def test_periodogram_constant_is_flat(spark):
    s = spark.createDataFrame([(t, 7) for t in range(24)], "t long, x long")
    for r in periodogram(s, 5).collect():
        assert abs(r["power"]) < 1e-6


def test_holt_alpha1(spark):
    s = spark.createDataFrame([(t, t * t) for t in range(10)],
                              "t long, x long")
    out = holt_smoothing(s, alpha=1.0, beta=0.0).orderBy("t").collect()
    for r in out:
        assert r["level"] == r["x"]        # alpha=1 tracks exactly
        assert r["trend"] == 1.0           # b stays at x1 - x0 = 1
    assert out[0]["fitted"] is None
    assert out[3]["fitted"] == out[2]["level"] + 1.0


def test_markov_chain_counts_and_occupancy(spark):
    # user 1: a->b->a->b, user 2: a->a->c — known transitions
    rows = [
        (1, 1, "a"), (2, 1, "b"), (3, 1, "a"), (4, 1, "b"),
        (5, 2, "a"), (6, 2, "a"), (7, 2, "c"),
    ]
    ev = spark.createDataFrame(
        pd.DataFrame(rows, columns=["event_id", "user_id", "event_type"])
    ).withColumn("ts", F.col("event_id").cast("timestamp"))
    out = {(r["src"], r["dst"]): r for r in
           markov_chain(ev, steps=1).collect()}
    assert out[("a", "b")]["n_trans"] == 2
    assert out[("a", "a")]["n_trans"] == 1
    assert out[("b", "a")]["n_trans"] == 1
    assert out[("a", "c")]["n_trans"] == 1
    assert out[("a", "b")]["p"] == 0.5
    # both users start at 'a'; 1-step occupancy = P[a, :]
    assert out[("a", "b")]["occ_dst"] == 0.5
    assert out[("a", "a")]["occ_dst"] == 0.25
    assert out[("a", "c")]["occ_dst"] == 0.25


def test_hausdorff_known_pair(spark):
    # A = unit square corners at origin; B = same shifted by (3, 4)
    pts = spark.createDataFrame(
        [(0, 0.0, 0.0), (0, 1.0, 0.0), (0, 0.0, 1.0), (0, 1.0, 1.0),
         (1, 3.0, 4.0), (1, 4.0, 4.0), (1, 3.0, 5.0), (1, 4.0, 5.0)],
        "tid long, x double, y double")
    pairs = spark.createDataFrame([(0, 1)], "tid_a long, tid_b long")
    r = hausdorff_pairs(pts, pairs).collect()[0]
    # nearest-corner map: every corner's nearest counterpart is the
    # matching corner at offset (3,4) minus the inner ones; extremes:
    # (0,0)->(3,4) dist 5; (1,1)->(3,4) dist sqrt(4+9)=sqrt(13)
    assert r["h_ab"] == 5.0
    assert r["h_ba"] == 5.0
    assert r["hausdorff"] == 5.0


def test_hausdorff_asymmetry(spark):
    # B contains A plus a far outlier: h(A,B) small, h(B,A) large
    pts = spark.createDataFrame(
        [(0, 0.0, 0.0), (0, 1.0, 0.0),
         (1, 0.0, 0.0), (1, 1.0, 0.0), (1, 100.0, 0.0)],
        "tid long, x double, y double")
    pairs = spark.createDataFrame([(0, 1)], "tid_a long, tid_b long")
    r = hausdorff_pairs(pts, pairs).collect()[0]
    assert r["h_ab"] == 0.0
    assert r["h_ba"] == 99.0
    assert r["hausdorff"] == 99.0


def test_dtw_identical_and_shifted(spark):
    from lib_gdal_spark.operators.trajectory import dtw_pairs
    # identical tracks -> cost 0; constant-offset track -> n * offset^2
    rows = []
    for vi in range(5):
        rows.append((0, vi, vi * 10, 0))
        rows.append((1, vi, vi * 10, 0))
        rows.append((2, vi, vi * 10, 3))   # shifted by (0, 3)
    pts = spark.createDataFrame(rows, "tid long, vi long, x long, y long")
    pairs = spark.createDataFrame([(0, 1), (0, 2)],
                                  "tid_a long, tid_b long")
    got = {(r["tid_a"], r["tid_b"]): r["dtw_cost"]
           for r in dtw_pairs(pts, pairs).collect()}
    assert got[(0, 1)] == 0
    assert got[(0, 2)] == 5 * 9  # diagonal path,per-step cost 9


def test_dtw_warping_beats_lockstep(spark):
    from lib_gdal_spark.operators.trajectory import dtw_pairs
    # A = [0, 0, 10]; B = [0, 10, 10]: warping aligns the plateaus
    pts = spark.createDataFrame(
        [(0, 0, 0, 0), (0, 1, 0, 0), (0, 2, 10, 0),
         (1, 0, 0, 0), (1, 1, 10, 0), (1, 2, 10, 0)],
        "tid long, vi long, x long, y long")
    pairs = spark.createDataFrame([(0, 1)], "tid_a long, tid_b long")
    r = dtw_pairs(pts, pairs).collect()[0]
    assert r["dtw_cost"] == 0  # perfect warp; lockstep would cost 200


def test_dtw_max_len_guard(spark):
    from lib_gdal_spark.operators.trajectory import dtw_pairs
    pts = spark.createDataFrame(
        [(0, i, i, 0) for i in range(10)] + [(1, i, i, 0) for i in range(10)],
        "tid long, vi long, x long, y long")
    pairs = spark.createDataFrame([(0, 1)], "tid_a long, tid_b long")
    import pytest as _pt
    with _pt.raises(Exception):
        dtw_pairs(pts, pairs, max_len=4).collect()


def test_viterbi_textbook(spark):
    """Rabiner-style sanity: with strongly-diagnostic emissions the
    decoded path follows the observations."""
    import math
    from lib_gdal_spark.operators.events import viterbi_decode
    pi = [math.log(0.5), math.log(0.5)]
    a = [[math.log(0.9), math.log(0.1)], [math.log(0.1), math.log(0.9)]]
    b = {"x": [math.log(0.9), math.log(0.1)],
         "y": [math.log(0.1), math.log(0.9)]}
    rows = [(i, 1, o) for i, o in enumerate(["x", "x", "y", "y", "y"])]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string"
    ).withColumn("ts", F.col("event_id").cast("timestamp"))
    r = viterbi_decode(ev, pi, a, b).collect()[0]
    assert r["path"] == "00111"
    assert r["n_obs"] == 5
    # exact log-likelihood of that path
    import math as m
    ll = (pi[0] + b["x"][0] + a[0][0] + b["x"][0] + a[0][1] + b["y"][1]
          + a[1][1] + b["y"][1] + a[1][1] + b["y"][1])
    assert r["loglik"] == round(ll, 9)


def test_viterbi_tie_prefers_smaller_state(spark):
    import math
    from lib_gdal_spark.operators.events import viterbi_decode
    # fully symmetric model: every comparison ties -> all-zeros path
    pi = [math.log(0.5), math.log(0.5)]
    a = [[math.log(0.5), math.log(0.5)], [math.log(0.5), math.log(0.5)]]
    b = {"x": [math.log(1.0), math.log(1.0)]}
    ev = spark.createDataFrame(
        [(i, 1, "x") for i in range(4)],
        "event_id long, user_id long, event_type string"
    ).withColumn("ts", F.col("event_id").cast("timestamp"))
    r = viterbi_decode(ev, pi, a, b).collect()[0]
    assert r["path"] == "0000"


def test_frechet_identical_and_shifted(spark):
    from lib_gdal_spark.operators.trajectory import frechet_pairs
    rows = []
    for vi in range(5):
        rows.append((0, vi, vi * 10, 0))
        rows.append((1, vi, vi * 10, 0))
        rows.append((2, vi, vi * 10, 4))
    pts = spark.createDataFrame(rows, "tid long, vi long, x long, y long")
    pairs = spark.createDataFrame([(0, 1), (0, 2)],
                                  "tid_a long, tid_b long")
    got = {(r["tid_a"], r["tid_b"]): r["frechet_d2"]
           for r in frechet_pairs(pts, pairs).collect()}
    assert got[(0, 1)] == 0
    assert got[(0, 2)] == 16  # constant offset -> max over lockstep = 16


def test_frechet_dog_leash(spark):
    from lib_gdal_spark.operators.trajectory import frechet_pairs
    # A walks 0->40 in x; B walks the same but with a detour point far
    # in y at the middle: frechet must visit it -> d2 = detour^2
    pts = spark.createDataFrame(
        [(0, i, i * 10, 0) for i in range(5)]
        + [(1, 0, 0, 0), (1, 1, 10, 0), (1, 2, 20, 30),
           (1, 3, 30, 0), (1, 4, 40, 0)],
        "tid long, vi long, x long, y long")
    pairs = spark.createDataFrame([(0, 1)], "tid_a long, tid_b long")
    r = frechet_pairs(pts, pairs).collect()[0]
    assert r["frechet_d2"] == 900


def test_lcss_matches(spark):
    from lib_gdal_spark.operators.trajectory import lcss_pairs
    # identical -> full length; disjoint far tracks -> 0
    pts = spark.createDataFrame(
        [(0, i, i * 10, 0) for i in range(6)]
        + [(1, i, i * 10, 1) for i in range(6)]
        + [(2, i, i * 10 + 5000, 0) for i in range(6)],
        "tid long, vi long, x long, y long")
    pairs = spark.createDataFrame([(0, 1), (0, 2)],
                                  "tid_a long, tid_b long")
    got = {(r["tid_a"], r["tid_b"]): r for r in
           lcss_pairs(pts, pairs, eps2=4).collect()}
    assert got[(0, 1)]["lcss_len"] == 6
    assert got[(0, 1)]["lcss_sim"] == 1.0
    assert got[(0, 2)]["lcss_len"] == 0


def test_circular_stats_directed_vs_uniform(spark):
    from lib_gdal_spark.operators.trajectory import circular_stats
    # straight-line track: all headings equal -> R = 1, variance 0
    pts = spark.createDataFrame(
        [(0, i, i * 3, i * 4) for i in range(10)],
        "tid long, vi long, x long, y long")
    r = circular_stats(pts).collect()[0]
    assert r["r_len"] == pytest.approx(1.0, abs=1e-9)
    assert r["circ_var"] == pytest.approx(0.0, abs=1e-9)
    assert r["mean_deg"] == pytest.approx(53.130102354, abs=1e-6)
    # perfectly balanced opposite headings -> R = 0
    pts2 = spark.createDataFrame(
        [(0, 0, 0, 0), (0, 1, 10, 0), (0, 2, 0, 0)],
        "tid long, vi long, x long, y long")
    r2 = circular_stats(pts2).collect()[0]
    assert r2["r_len"] == pytest.approx(0.0, abs=1e-9)


def test_jonckheere_monotone_groups(spark):
    from lib_gdal_spark.operators.hypotests import jonckheere_terpstra
    # strictly increasing group levels -> J maximal, z strongly positive
    rows = [(g, g * 100 + i) for g in range(3) for i in range(20)]
    d = spark.createDataFrame(rows, "g int, v long")
    r = jonckheere_terpstra(d, "g", "v", [0, 1, 2]).collect()[0]
    # every cross-pair concordant: J = 3 * 20*20 = 1200 -> j_x2 = 2400
    assert r["j_x2"] == 2400
    assert r["z"] > 5
    # reversed order -> strongly negative
    r2 = jonckheere_terpstra(d, "g", "v", [2, 1, 0]).collect()[0]
    assert r2["z"] < -5
