"""CUSUM drift: the closed form (prefix sum minus clamped prefix min)
must equal the textbook max(0, .) recursion; drift fires after an
injected level shift and stays silent on the stable series."""

import random

from lib_gdal_spark.operators.events import cusum_drift
from lib_gdal_spark.session import local_df


def _series(spark, rows):
    return local_df(spark, rows, "key string, t long, x double")


def _naive(xs, slack):
    mu = sum(xs) / len(xs)
    s, out = 0.0, []
    for x in xs:
        s = max(0.0, s + (x - mu - slack))
        out.append(round(s, 6))
    return out


def test_closed_form_equals_recursion(spark):
    rng = random.Random(5)
    xs = [float(rng.randrange(0, 40)) for _ in range(60)]
    rows = [("a", t, x) for t, x in enumerate(xs)]
    got = {r["t"]: r["cusum"]
           for r in cusum_drift(_series(spark, rows), slack=1.5).collect()}
    want = _naive(xs, 1.5)
    assert [got[t] for t in range(60)] == want


def test_level_shift_fires_only_after_shift(spark):
    xs = [10.0] * 20 + [30.0] * 10          # mean ~16.67
    rows = [("h", t, x) for t, x in enumerate(xs)]
    out = {r["t"]: r["drift"] for r in
           cusum_drift(_series(spark, rows), slack=2.0,
                       threshold=30.0).collect()}
    assert not any(out[t] for t in range(20))     # silent pre-shift
    assert out[29]                                # fires by the end
    # stable series never fires
    rows2 = [("h", t, 10.0) for t in range(30)]
    out2 = cusum_drift(_series(spark, rows2), slack=2.0, threshold=30.0)
    assert out2.where("drift").count() == 0


def test_per_key_independence(spark):
    rows = ([("a", t, 5.0) for t in range(10)]
            + [("b", t, 5.0 if t < 5 else 50.0) for t in range(10)])
    out = cusum_drift(_series(spark, rows), slack=1.0, threshold=20.0)
    flags = {(r["key"], r["t"]): r["drift"] for r in out.collect()}
    assert not any(v for (k, _), v in flags.items() if k == "a")
    assert flags[("b", 9)]
