"""Leakage-safe group split: determinism, group atomicity, weight
coverage, validation errors."""

import pytest

from lib_gdal_spark.operators.mixing import split_by_group, split_report


def _docs(spark, n_groups=40, per_group=5):
    rows = [(g * 100 + i, f"host{g}", f"text {g} {i} xyz")
            for g in range(n_groups) for i in range(per_group)]
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


W = {"train": 0.8, "val": 0.1, "test": 0.1}


def test_groups_are_atomic(spark):
    out = split_by_group(_docs(spark), W).collect()
    by_group = {}
    for r in out:
        by_group.setdefault(r["source"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_group.values())


def test_deterministic_and_partition_invariant(spark):
    d = _docs(spark)
    a = sorted((r["doc_id"], r["split"]) for r in split_by_group(d, W).collect())
    b = sorted((r["doc_id"], r["split"])
               for r in split_by_group(d.repartition(13), W).collect())
    assert a == b


def test_report_conserves_groups_and_docs(spark):
    d = _docs(spark)
    rep = split_report(d, W).collect()
    assert sum(r["n_docs"] for r in rep) == 200
    assert sum(r["n_groups"] for r in rep) == 40   # no group straddles
    # with 40 groups at 80/10/10 the train split should dominate
    rep = {r["split"]: r for r in rep}
    assert rep["train"]["n_docs"] > rep.get("val", rep["train"])["n_docs"] or \
           "val" not in rep


def test_full_draw_range_is_covered(spark):
    # a single split of weight 1.0 takes everything, incl. draw == max
    d = _docs(spark)
    out = split_by_group(d, {"all": 1.0}).collect()
    assert {r["split"] for r in out} == {"all"}


def test_weight_validation(spark):
    d = _docs(spark)
    with pytest.raises(ValueError):
        split_by_group(d, {})
    with pytest.raises(ValueError):
        split_by_group(d, {"a": 0.5, "b": 0.4})


def test_seed_changes_assignment(spark):
    d = _docs(spark)
    a = {r["source"]: r["split"] for r in split_by_group(d, W, seed=1).collect()}
    b = {r["source"]: r["split"] for r in split_by_group(d, W, seed=2).collect()}
    assert a != b
