"""TextRank keywords (operators/textops.textrank_terms)."""

import pandas as pd

from lib_gdal_spark.operators.textops import textrank_terms


def test_hub_term_ranks_first(spark):
    # "spark" co-occurs with every other term; satellites only with it
    docs = spark.createDataFrame(pd.DataFrame({
        "text": ["spark join", "spark shuffle", "spark agg",
                 "spark scan", "join spark", "shuffle spark"],
    }))
    out = textrank_terms(docs, window=2, k=10).orderBy("pos").collect()
    assert out[0].term == "spark"
    assert out[0].rank_units > out[1].rank_units
    assert {r.term for r in out} == {"spark", "join", "shuffle", "agg", "scan"}


def test_window_controls_edges(spark):
    # window 1: a-b and b-c only; c never pairs with a
    docs = spark.createDataFrame(pd.DataFrame({"text": ["aa bb cc"]}))
    r1 = textrank_terms(docs, window=1, k=10).collect()
    r2 = textrank_terms(docs, window=2, k=10).collect()
    # bb is the hub at window 1; at window 2 the graph is complete so
    # all three ranks are equal
    by1 = {r.term: r.rank_units for r in r1}
    by2 = {r.term: r.rank_units for r in r2}
    assert by1["bb"] > by1["aa"] == by1["cc"]
    assert len(set(by2.values())) == 1


def test_pos_is_deterministic_tiebreak(spark):
    docs = spark.createDataFrame(pd.DataFrame({"text": ["xx yy", "yy xx"]}))
    out = textrank_terms(docs, window=1, k=10).orderBy("pos").collect()
    assert [r.term for r in out] == ["xx", "yy"]  # equal rank, name order
