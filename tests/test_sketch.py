"""Count-min sketch: exactness of the construction, CMS guarantees."""

import pytest

from lib_gdal_spark.operators import sketch as SK


def _docs(spark):
    rows = [(i, " ".join(f"w{(i * 7 + k) % 23}" for k in range(30)))
            for i in range(40)]
    rows.append((99, "needle " * 5))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_cms_never_underestimates_and_exact_for_needle(spark):
    d = _docs(spark)
    probes = [f"w{i}" for i in range(23)] + ["needle", "absent_token"]
    out = {r["token"]: r for r in
           SK.cms_token_counts(d, probes, width=4096).collect()}
    assert len(out) == 25
    for tok, r in out.items():
        assert r["cms_count"] >= r["true_count"], tok
    assert out["needle"]["true_count"] == 5
    assert out["absent_token"]["true_count"] == 0
    # at width=4096 with ~24 distinct tokens, collisions are unlikely:
    # the needle estimate is exact unless a slice collides in all 3 rows
    assert out["needle"]["cms_count"] == 5


def test_cms_partition_invariance(spark):
    d = _docs(spark)
    probes = ["w0", "w11", "needle"]
    a = sorted(map(tuple, SK.cms_token_counts(d, probes).collect()))
    b = sorted(map(tuple,
                   SK.cms_token_counts(d.repartition(17), probes).collect()))
    assert a == b


def test_cms_forced_collisions_overestimate(spark):
    # width=2 forces every token into 2 buckets per row: estimates
    # collapse toward the total token count but never go below truth
    d = _docs(spark)
    out = {r["token"]: r for r in
           SK.cms_token_counts(d, ["needle"], width=2, depth=3).collect()}
    assert out["needle"]["cms_count"] >= out["needle"]["true_count"]
    assert out["needle"]["cms_count"] > 5   # collisions guaranteed


def test_cms_validations(spark):
    d = _docs(spark)
    with pytest.raises(ValueError):
        SK.count_min_sketch(d, width=1000)
    with pytest.raises(ValueError):
        SK.count_min_sketch(d, width=1 << 22, depth=3)


def test_hll_distinct_accuracy_and_invariance(spark):
    import math

    rows = [(i, f"value-{i % 700}") for i in range(5000)]
    d = spark.createDataFrame(rows, "doc_id long, v string")
    out = SK.hll_distinct(d, "v", p=10).collect()[0]
    assert out["m"] == 1024
    # ~3.25% std error at p=10; allow 4 sigma
    assert abs(out["hll_estimate"] - 700) / 700 < 0.13
    # duplicates don't move the estimate; partitioning doesn't either
    out2 = SK.hll_distinct(d.repartition(19), "v", p=10).collect()[0]
    assert out2["hll_estimate"] == out["hll_estimate"]
    d3 = spark.createDataFrame(
        [(0, f"value-{i % 700}") for i in range(700)],
        "doc_id long, v string")
    out3 = SK.hll_distinct(d3, "v", p=10).collect()[0]
    assert out3["hll_estimate"] == out["hll_estimate"]


def test_hll_small_range_linear_counting(spark):
    d = spark.createDataFrame([(i, f"u{i % 9}") for i in range(100)],
                              "doc_id long, v string")
    out = SK.hll_distinct(d, "v", p=10).collect()[0]
    # 9 distinct << 2.5*m -> linear counting; V=9 set registers (no
    # bucket collisions at 9/1024 w.h.p. for this fixed data)
    import math
    exp = 1024.0 * math.log(1024.0 / (1024 - out["n_registers_set"]))
    assert abs(out["hll_estimate"] - round(exp, 6)) < 1e-9
    # estimate is near-exact here (a rare fixed-hash bucket collision
    # would drop V by 1 and the estimate by ~1 — still within 2.1)
    assert abs(out["hll_estimate"] - 9) < 2.1


def test_hll_validations(spark):
    d = spark.createDataFrame([(1, "a")], "doc_id long, v string")
    with pytest.raises(ValueError):
        SK.hll_distinct(d, "v", p=3)
    with pytest.raises(ValueError):
        SK.hll_distinct(d, "v", p=19)
