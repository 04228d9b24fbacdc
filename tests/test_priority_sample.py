"""Priority sampling: per-group k, weight-proportional inclusion trend,
determinism, and the zero/heavy-weight edge cases."""

from pyspark.sql import functions as F

from lib_gdal_spark.operators.mixing import priority_sample
from lib_gdal_spark.session import local_df


def _docs(spark, rows):
    return local_df(spark, rows, "doc_id long, source string, w double")


def test_k_per_group_and_determinism(spark):
    rows = [(i, "s%d" % (i % 3), float(1 + i % 10)) for i in range(600)]
    df = _docs(spark, rows)
    out = priority_sample(df, k=10, weight_col="w", group_col="source",
                          id_col="doc_id")
    got = out.collect()
    assert len(got) == 30
    per = {}
    for r in got:
        per.setdefault(r["source"], []).append(r["rk"])
    assert all(sorted(v) == list(range(1, 11)) for v in per.values())
    again = priority_sample(df.repartition(7), k=10, weight_col="w",
                            group_col="source", id_col="doc_id").collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))


def test_heavy_weights_dominate(spark):
    # 20 heavy rows (w=1000) vs 980 light rows (w=1): priority p = w/u
    # with u <= 1 means every heavy row has p >= 1000 while a light row
    # needs u < 1e-3 (rare); expect most of the k=25 to be heavy
    rows = [(i, "s", 1000.0 if i < 20 else 1.0) for i in range(1000)]
    out = priority_sample(_docs(spark, rows), k=25, weight_col="w",
                          group_col="source", id_col="doc_id")
    heavy = out.where(F.col("doc_id") < 20).count()
    assert heavy == 20  # all heavy rows always make a k=25 sample


def test_k_larger_than_group(spark):
    rows = [(1, "s", 2.0), (2, "s", 3.0)]
    out = priority_sample(_docs(spark, rows), k=10, weight_col="w",
                          group_col="source", id_col="doc_id").collect()
    assert len(out) == 2
