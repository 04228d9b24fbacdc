"""PQ asymmetric-distance top-k: brute-force ADC parity, exact-dist
sanity, determinism."""

import numpy as np
import pytest

from lib_gdal_spark.operators.cluster import kmeans_fit, pq_topk


def _vecs(spark, n=50, dim=8, seed=9):
    rng = np.random.default_rng(seed)
    rows = [(i, rng.uniform(-1, 1, dim).tolist()) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>"), rows


def test_matches_bruteforce_adc(spark):
    from pyspark.sql import functions as F
    df, rows = _vecs(spark)
    m, k, iters, s = 2, 3, 2, 4
    out = pq_topk(df, query_id=7, topk=10, m=m, k=k, iters=iters).collect()
    # brute: per subspace, kmeans_fit gives codes + cents
    q = np.round(np.array(rows[7][1]) * 1e6).astype(np.int64)
    adc = {i: 0 for i, _ in rows}
    for j in range(m):
        sub = df.select("vec_id",
                        F.slice("embedding", j * s + 1, s).alias("embedding"))
        asg, cents = kmeans_fit(sub, k=k, iters=iters)
        qj = q[j * s:(j + 1) * s]
        lut = [int(((qj - np.array(c)) ** 2).sum()) for c in cents]
        for r in asg.collect():
            adc[r["vec_id"]] += lut[r["cid"]]
    want = sorted(adc.items(), key=lambda t: (t[1], t[0]))[:10]
    got = [(r["vec_id"], r["adc_dist2"]) for r in
           sorted(out, key=lambda r: r["rank"])]
    assert got == want


def test_query_exact_dist_is_zero(spark):
    df, _ = _vecs(spark)
    out = pq_topk(df, query_id=3, topk=50, m=2, k=3, iters=1).collect()
    me = [r for r in out if r["vec_id"] == 3]
    assert me and me[0]["exact_dist2"] == 0


def test_deterministic_across_partitioning(spark):
    df, _ = _vecs(spark)
    a = [tuple(r) for r in pq_topk(df, 0, topk=8, m=2, k=3).collect()]
    b = [tuple(r) for r in
         pq_topk(df.repartition(7), 0, topk=8, m=2, k=3).collect()]
    assert a == b


def test_missing_query_raises(spark):
    df, _ = _vecs(spark)
    with pytest.raises(ValueError, match="not found"):
        pq_topk(df, query_id=999)
