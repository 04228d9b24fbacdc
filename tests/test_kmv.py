"""KMV distinct sketch: exact rank construction, mergeability,
estimator behavior on small (exact) and large (approximate) sets."""

import numpy as np
import pytest

from lib_gdal_spark.operators import sketch as SK
from lib_gdal_spark.operators.sketch import kmv_hash_batch


def _tokens(spark, n_groups=2, per_group=400):
    rows = []
    for g in range(n_groups):
        for i in range(per_group):
            # overlapping vocab: group g sees tokens [g*100, g*100+400)
            rows.append((f"g{g}", f"tok{g * 100 + i}"))
    return spark.createDataFrame(rows, "g string, v string")


def test_kmv_sketch_is_k_smallest_distinct_hashes(spark):
    df = _tokens(spark, n_groups=1)
    k = 32
    sk = SK.kmv_sketch(df, "v", k=k, group_col="g").collect()
    toks = [f"tok{i}" for i in range(400)]
    want = np.sort(np.unique(kmv_hash_batch(toks)))[:k]
    got = sorted(int(r["hv"]) for r in sk)
    assert got == [int(x) for x in want]
    assert sorted(r["rk"] for r in sk) == list(range(1, k + 1))


def test_kmv_partition_invariance(spark):
    df = _tokens(spark)
    a = sorted(map(tuple, SK.kmv_sketch(df, "v", k=16).collect()))
    b = sorted(map(tuple,
                   SK.kmv_sketch(df.repartition(13), "v", k=16).collect()))
    assert a == b


def test_kmv_exact_when_under_k(spark):
    df = _tokens(spark, n_groups=2, per_group=50)
    row = SK.kmv_two_set_stats(df, "v", "g", "g0", "g1", k=256).first()
    # fewer than k distinct per side -> estimates ARE the exact counts
    assert row["est_a"] == row["exact_a"] == 50
    assert row["est_b"] == row["exact_b"] == 50
    assert row["est_u"] == row["exact_u"] == 100
    assert row["exact_inter"] == 0
    assert row["est_inter"] == 0.0


def test_kmv_estimates_track_truth(spark):
    df = _tokens(spark, n_groups=2, per_group=400)  # overlap = 300
    row = SK.kmv_two_set_stats(df, "v", "g", "g0", "g1", k=128).first()
    assert row["exact_a"] == row["exact_b"] == 400
    assert row["exact_u"] == 500
    assert row["exact_inter"] == 300
    # KMV with k=128 on n=400..500: expect well within 35% relative error
    for est, true in [(row["est_a"], 400), (row["est_b"], 400),
                      (row["est_u"], 500), (row["est_inter"], 300)]:
        assert abs(est - true) / true < 0.35, (est, true)
    assert 0.3 < row["jaccard_est"] < 0.9  # true J = 300/500 = 0.6


def test_kmv_rejects_tiny_k(spark):
    with pytest.raises(ValueError):
        SK.kmv_sketch(_tokens(spark), "v", k=1)
