"""A/B two-proportion z-test: hand-checked z, assignment determinism,
degenerate pools."""

import math

import pytest

from lib_gdal_spark.operators.events import ab_test
from lib_gdal_spark.operators.mixing import M53, _hash53


def _events(spark, rows):
    return spark.createDataFrame(rows, "user_id long, event_type string")


def test_hand_checked_z(spark):
    # force known assignment by probing the hash, then build conversions
    rows = [(u, "view") for u in range(60)]
    df = _events(spark, rows)
    av = {r["user_id"]: r["v"] for r in df.select(
        "user_id",
        (_hash53("user_id", 77, 42) < M53 // 2).alias("v")).collect()}
    a_users = [u for u in range(60) if av[u]]
    b_users = [u for u in range(60) if not av[u]]
    # convert half of A (rounded down) and a quarter of B
    conv = a_users[: len(a_users) // 2] + b_users[: len(b_users) // 4]
    rows += [(u, "purchase") for u in conv]
    r = ab_test(_events(spark, rows)).first()
    assert r["n_a"] == len(a_users) and r["n_b"] == len(b_users)
    assert r["x_a"] == len(a_users) // 2 and r["x_b"] == len(b_users) // 4
    pa, pb = r["x_a"] / r["n_a"], r["x_b"] / r["n_b"]
    pp = (r["x_a"] + r["x_b"]) / (r["n_a"] + r["n_b"])
    se = math.sqrt(pp * (1 - pp) * (1 / r["n_a"] + 1 / r["n_b"]))
    assert r["z"] == round((pa - pb) / se, 6)
    assert r["p_a"] == round(pa, 6) and r["p_b"] == round(pb, 6)


def test_no_conversions_gives_zero_z(spark):
    rows = [(u, "view") for u in range(40)]
    r = ab_test(_events(spark, rows)).first()
    assert r["x_a"] == 0 and r["x_b"] == 0 and r["z"] == 0.0


def test_all_convert_gives_zero_z(spark):
    rows = [(u, "purchase") for u in range(40)]
    r = ab_test(_events(spark, rows)).first()
    assert r["p_a"] == 1.0 and r["p_b"] == 1.0 and r["z"] == 0.0


def test_assignment_is_deterministic(spark):
    rows = [(u, "view") for u in range(100)]
    rows += [(u, "purchase") for u in range(0, 100, 3)]
    df = _events(spark, rows)
    a = ab_test(df).first()
    b = ab_test(df.repartition(13)).first()
    assert tuple(a) == tuple(b)


def test_multiple_purchases_count_once(spark):
    rows = [(u, "view") for u in range(20)]
    rows += [(0, "purchase")] * 5  # user 0 converts once, not 5 times
    r = ab_test(_events(spark, rows)).first()
    assert r["x_a"] + r["x_b"] == 1
