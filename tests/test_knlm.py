"""Interpolated Kneser-Ney bigram LM table (textops.kneser_ney_bigram)."""

import pytest

from lib_gdal_spark.operators import textops as TXT


def _table(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_kn_hand_computed(spark):
    # corpus: "a b a b c" + "a b"
    # c2: (a,b)=3 (b,a)=1 (b,c)=1; prefix counts c1: a=3, b=2
    # N1+(a,*)=1 N1+(b,*)=2; N1+(*,a)=N1+(*,b)=N1+(*,c)=1; N1+(*,*)=3
    docs = _table(spark, [(1, "a b a b c"), (2, "a b")])
    got = {(r["w1"], r["w2"]): r for r in
           TXT.kneser_ney_bigram(docs).collect()}
    assert set(got) == {("a", "b"), ("b", "a"), ("b", "c")}
    ab = got[("a", "b")]
    assert (ab["c2"], ab["c1"], ab["n1_fwd"], ab["n1_bwd"]) == (3, 3, 1, 1)
    # max(3-.75,0)/3 + .75*1/3 * 1/3
    assert ab["p_kn"] == pytest.approx(0.75 + 0.25 / 3, abs=1e-9)
    ba = got[("b", "a")]
    assert (ba["c2"], ba["c1"], ba["n1_fwd"], ba["n1_bwd"]) == (1, 2, 2, 1)
    # max(1-.75,0)/2 + .75*2/2 * 1/3
    assert ba["p_kn"] == pytest.approx(0.125 + 0.25, abs=1e-9)
    assert got[("b", "c")]["p_kn"] == ba["p_kn"]


def test_kn_prefix_count_is_bigram_count_not_token_count(spark):
    # 'c' ends the doc: it appears as a token but heads no bigram, so it
    # must be absent from the prefix table rather than carry c1=1
    docs = _table(spark, [(1, "a c"), (2, "a c")])
    rows = TXT.kneser_ney_bigram(docs).collect()
    assert [(r["w1"], r["w2"], r["c2"], r["c1"]) for r in rows] == \
        [("a", "c", 2, 2)]


def test_kn_seen_mass_below_one(spark):
    # per prefix, the seen-continuation mass must be < 1 (the discount
    # reserves mass for unseen continuations via the backoff term)
    docs = _table(spark, [
        (1, "the cat sat on the mat"),
        (2, "the dog sat on the log"),
        (3, "a cat and a dog"),
    ])
    tbl = TXT.kneser_ney_bigram(docs).collect()
    mass = {}
    for r in tbl:
        mass[r["w1"]] = mass.get(r["w1"], 0.0) + r["p_kn"]
        assert 0.0 < r["p_kn"] < 1.0
    assert all(m < 1.0 + 1e-12 for m in mass.values())


def test_kn_min_count_filters_output_not_counts(spark):
    docs = _table(spark, [(1, "a b a b c"), (2, "a b")])
    rows = TXT.kneser_ney_bigram(docs, min_count=2).collect()
    assert [(r["w1"], r["w2"]) for r in rows] == [("a", "b")]
    # counts reflect the full corpus: c1 of 'a' is still 3
    assert rows[0]["p_kn"] == pytest.approx(0.75 + 0.25 / 3, abs=1e-9)


def test_kn_partition_invariance(spark):
    docs = _table(spark, [
        (i, f"w{i % 7} w{(i * 3) % 7} w{(i * 5 + 1) % 7} w{i % 7}")
        for i in range(60)
    ])
    a = sorted(map(tuple, TXT.kneser_ney_bigram(docs).collect()))
    b = sorted(map(tuple,
                   TXT.kneser_ney_bigram(docs.repartition(13)).collect()))
    assert a == b
