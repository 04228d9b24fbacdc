

def test_sample_temperature_upweights_small_sources(spark):
    """alpha < 1 keeps a larger FRACTION of small sources; rates are
    deterministic and the overall volume lands near target_frac."""
    from pyspark.sql import functions as F

    from lib_gdal_spark.operators import mixing as MX

    rows = [(i, "big", "x") for i in range(2000)]
    rows += [(10000 + i, "small", "x") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = MX.sample_temperature(df, alpha=0.3, target_frac=0.5)
    rates = {r["source"]: r["keep_rate"] for r in
             out.select("source", "keep_rate").distinct().collect()}
    # the small source is kept at a strictly higher rate
    assert rates["small"] > rates["big"]
    # expected math: p ~ c^0.3; rate_s = min(1, 0.5*N*p_s/(sum_p*c_s))
    import math
    pb, ps = 2000 ** 0.3, 100 ** 0.3
    tot = pb + ps
    exp_big = min(1.0, 0.5 * 2100 * (pb / tot) / 2000)
    exp_small = min(1.0, 0.5 * 2100 * (ps / tot) / 100)
    assert abs(rates["big"] - exp_big) < 1e-9
    assert abs(rates["small"] - exp_small) < 1e-9
    # kept volume within 15% of the target (Bernoulli variance)
    n = out.count()
    assert abs(n - 0.5 * 2100) < 0.15 * 2100
    # deterministic: same ids on a second run
    out2 = MX.sample_temperature(df, alpha=0.3, target_frac=0.5)
    assert sorted(r["doc_id"] for r in out.collect()) == \
        sorted(r["doc_id"] for r in out2.collect())


def test_sample_temperature_alpha_one_is_uniform(spark):
    """alpha = 1 reduces to a flat target_frac rate for every source."""
    from lib_gdal_spark.operators import mixing as MX

    rows = [(i, "a", "x") for i in range(500)]
    rows += [(1000 + i, "b", "x") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = MX.sample_temperature(df, alpha=1.0, target_frac=0.4)
    rates = {r["source"]: r["keep_rate"] for r in
             out.select("source", "keep_rate").distinct().collect()}
    assert abs(rates["a"] - 0.4) < 1e-12
    assert abs(rates["b"] - 0.4) < 1e-12
