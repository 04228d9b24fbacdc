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
