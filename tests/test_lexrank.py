"""LexRank sentence extraction (operators/textops.lexrank_sentences)."""

import pandas as pd

from lib_gdal_spark.operators.textops import lexrank_sentences


def _docs(spark, texts):
    return spark.createDataFrame(
        pd.DataFrame([(i, t) for i, t in enumerate(texts)],
                     columns=["doc_id", "text"]),
        schema="doc_id long, text string")


def test_hub_sentence_wins(spark):
    # sentence 0 shares words with every other sentence; the others
    # share nothing among themselves -> s0 is the most central
    text = ("alpha beta gamma. "
            "alpha delta epsilon. "
            "beta zeta eta. "
            "gamma theta iota")
    got = sorted(lexrank_sentences(_docs(spark, [text]), top_k=1)
                 .collect(), key=lambda r: r["doc_id"])
    assert got[0]["sidx"] == 0
    assert got[0]["sentence"].startswith("alpha beta gamma")


def test_single_sentence_and_topk(spark):
    texts = ["only one sentence here",
             "aa bb. aa bb. cc dd"]
    out = lexrank_sentences(_docs(spark, texts), top_k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc[0]) == 1 and by_doc[0][0]["sidx"] == 0
    # doc 1: the twin "aa bb" sentences reinforce each other; ties
    # break to the smaller index -> sidx 0 then 1
    top = sorted(by_doc[1], key=lambda r: -r["rank_units"])
    assert {r["sidx"] for r in by_doc[1]} == {0, 1}


def test_deterministic_under_repartition(spark):
    texts = ["x y z. x q r. y s t. z u v"] * 6
    d = _docs(spark, texts)
    a = {(r["doc_id"], r["sidx"], r["rank_units"])
         for r in lexrank_sentences(d, top_k=2).collect()}
    b = {(r["doc_id"], r["sidx"], r["rank_units"])
         for r in lexrank_sentences(d.repartition(7), top_k=2).collect()}
    assert a == b
