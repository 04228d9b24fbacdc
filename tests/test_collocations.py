"""PMI collocations: hand-checked lift, min-count floor, ranking
determinism, partition invariance."""

import pytest

from lib_gdal_spark.operators.textops import collocations


def test_hand_checked_lift(spark):
    # corpus engineered so "new york" is a perfect collocation:
    # both words appear ONLY together
    rows = [(i, "new york") for i in range(5)]
    rows += [(100 + i, "foo bar baz") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {(r["w1"], r["w2"]): r for r in collocations(df, min_count=2).collect()}
    r = out[("new", "york")]
    # N = 25 tokens, B = 15 bigrams, c_xy = 5, c_new = c_york = 5
    assert r["n_pair"] == 5
    assert r["lift"] == round((5 * 25.0 * 25.0) / ((15.0 * 5) * 5), 6)


def test_min_count_floor(spark):
    rows = [(1, "rare pair"), (2, "common word common word common word")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r["w1"], r["w2"]) for r in collocations(df, min_count=2).collect()}
    assert ("rare", "pair") not in got
    assert ("common", "word") in got


def test_rank_is_dense_and_deterministic(spark):
    rows = [(i, f"a{i % 4} b{i % 4} a{i % 4} b{i % 4}") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = collocations(df, min_count=1, top_k=10).collect()
    assert [r["rank"] for r in out] == list(range(1, len(out) + 1))
    a = [tuple(r) for r in out]
    b = [tuple(r) for r in
         collocations(df.repartition(13), min_count=1, top_k=10).collect()]
    assert a == b


def test_single_token_docs_contribute_no_bigrams(spark):
    df = spark.createDataFrame(
        [(1, "solo"), (2, "x y"), (3, "x y")], "doc_id long, text string")
    out = collocations(df, min_count=1).collect()
    assert {(r["w1"], r["w2"]) for r in out} == {("x", "y")}
    # totals still count the solo token in N (4 tokens, 2 bigrams)
    r = out[0]
    assert r["lift"] == round((2 * 5.0 * 5.0) / ((2.0 * 2) * 2), 6)
