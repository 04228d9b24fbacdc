"""All-pairs tf cosine: brute-force parity, weighting semantics, df cap."""

import math

import numpy as np
import pytest

from lib_gdal_spark.operators.dedup import allpairs_cosine_tf


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {(r["doc_a"], r["doc_b"]): r
            for r in allpairs_cosine_tf(df, **kw).collect()}


def _brute(rows, threshold):
    vecs = []
    for i, t in rows:
        tf = {}
        for w in t.lower().split():
            tf[w] = tf.get(w, 0) + 1
        vecs.append((i, tf))
    out = {}
    for x in range(len(vecs)):
        for y in range(x + 1, len(vecs)):
            ia, ta = vecs[x]
            ib, tb = vecs[y]
            dot = sum(ta[w] * tb.get(w, 0) for w in ta)
            if dot == 0:
                continue
            cos = round(dot / (math.sqrt(sum(v * v for v in ta.values()))
                               * math.sqrt(sum(v * v for v in tb.values()))), 6)
            if cos >= threshold:
                out[(min(ia, ib), max(ia, ib))] = (dot, cos)
    return out


def test_matches_bruteforce(spark):
    rows = [(i, " ".join(f"w{(i * j + j) % 7}" for j in range(10)))
            for i in range(25)]
    got = _run(spark, rows, threshold=0.3, max_doc_freq=None)
    want = _brute(rows, 0.3)
    assert {k: (r["dot"], r["cosine"]) for k, r in got.items()} == want


def test_weighting_separates_emphasis(spark):
    rows = [(1, "cat cat cat dog"), (2, "cat dog dog dog"), (3, "cat dog")]
    got = _run(spark, rows, threshold=0.0, max_doc_freq=None)
    # doc3 is equidistant; docs 1 and 2 differ in emphasis
    assert got[(1, 3)]["cosine"] == got[(2, 3)]["cosine"]
    assert got[(1, 2)]["cosine"] < got[(1, 3)]["cosine"]


def test_df_cap_removes_stopword_terms(spark):
    rows = [(i, "the") for i in range(10)] + [(100, "the rare pair"),
                                              (101, "rare pair")]
    got = _run(spark, rows, threshold=0.1, max_doc_freq=5)
    # "the" df=11 > 5: dropped from the space; only rare/pair connect
    assert set(got) == {(100, 101)}
    r = got[(100, 101)]
    assert r["dot"] == 2 and r["cosine"] == round(2 / (math.sqrt(2) * math.sqrt(2)), 6)


def test_partition_invariance(spark):
    rows = [(i, " ".join(f"t{(i + j) % 9}" for j in range(6)))
            for i in range(40)]
    df1 = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(map(tuple, allpairs_cosine_tf(df1, 0.2).collect()))
    b = sorted(map(tuple,
                   allpairs_cosine_tf(df1.repartition(17), 0.2).collect()))
    assert a == b
