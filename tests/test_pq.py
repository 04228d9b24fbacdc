"""Product quantization: subspace independence, exact reconstruction
error additivity, determinism, validation."""

import numpy as np
import pytest

from lib_gdal_spark.operators.cluster import kmeans, pq_encode


def _vecs(spark, n=40, dim=8, seed=3):
    rng = np.random.default_rng(seed)
    rows = [(i, rng.uniform(-1, 1, dim).tolist()) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_codes_match_per_subspace_kmeans(spark):
    from pyspark.sql import functions as F
    df = _vecs(spark)
    got = {r["vec_id"]: r for r in
           pq_encode(df, m=2, k=3, iters=2).collect()}
    tot = 0
    for j, lo in enumerate((0, 4)):
        sub = df.select("vec_id",
                        F.slice("embedding", lo + 1, 4).alias("embedding"))
        want = {r["vec_id"]: r for r in
                kmeans(sub, k=3, iters=2).collect()}
        for i, r in want.items():
            assert got[i][f"code_{j}"] == r["cid"]
        tot += sum(r["dist2"] for r in want.values())
    assert sum(r["dist2"] for r in got.values()) == tot  # exact additivity


def test_deterministic_across_partitioning(spark):
    df = _vecs(spark, n=60)
    a = sorted(map(tuple, pq_encode(df, m=4, k=4, iters=2).collect()))
    b = sorted(map(tuple,
                   pq_encode(df.repartition(11), m=4, k=4, iters=2).collect()))
    assert a == b


def test_identical_vectors_share_codes(spark):
    rows = [(i, [float(i % 3)] * 8) for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = pq_encode(df, m=2, k=3, iters=3).collect()
    by_val = {}
    for r in out:
        by_val.setdefault(r["vec_id"] % 3, set()).add(
            (r["code_0"], r["code_1"], r["dist2"]))
    assert all(len(s) == 1 for s in by_val.values())
    assert all(next(iter(s))[2] == 0 for s in by_val.values())  # exact recon


def test_dim_not_divisible_raises(spark):
    df = _vecs(spark, dim=6)
    with pytest.raises(ValueError, match="not divisible"):
        pq_encode(df, m=4)
