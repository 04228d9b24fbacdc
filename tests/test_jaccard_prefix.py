"""Prefix-filtered exact Jaccard join (operators/dedup.jaccard_prefix_join)."""

import itertools

import pandas as pd

from lib_gdal_spark.operators.dedup import jaccard_prefix_join


def _docs(spark, texts):
    return spark.createDataFrame(
        pd.DataFrame([(i, t) for i, t in enumerate(texts)],
                     columns=["doc_id", "text"]),
        schema="doc_id long, text string")


def _brute(texts, t_num, t_den):
    sets = [set(t.lower().split()) for t in texts]
    out = {}
    for a, b in itertools.combinations(range(len(texts)), 2):
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        if union and inter * t_den >= t_num * union:
            out[(a, b)] = (inter, len(sets[a]), len(sets[b]))
    return out


def test_complete_vs_bruteforce(spark):
    base = "the quick brown fox jumps over the lazy dog tonight"
    texts = [base,
             base + " again",                       # superset
             "the quick brown fox jumps over a lazy cat tonight",
             "completely different words here now",
             "completely different words here now indeed",
             "quick brown dog fox the over jumps lazy tonight the"]  # perm
    got = {(r["id_a"], r["id_b"]): (r["inter"], r["size_a"], r["size_b"])
           for r in jaccard_prefix_join(_docs(spark, texts),
                                        t_num=3, t_den=5).collect()}
    assert got == _brute(texts, 3, 5)
    # permutation of the same word set is an exact duplicate (J = 1)
    assert (0, 5) in got and got[(0, 5)][0] == got[(0, 5)][1]


def test_integer_threshold_boundary(spark):
    # J exactly t: sets of size 5 and 5 with inter 4 -> J = 4/6 = 2/3.
    # At t = 2/3 the pair MUST be kept; a float 0.6666... comparison
    # could drop it.
    texts = ["a b c d e", "a b c d f"]
    got = jaccard_prefix_join(_docs(spark, texts), t_num=2,
                              t_den=3).collect()
    assert len(got) == 1 and got[0]["inter"] == 4
    # and just above t it must go
    got2 = jaccard_prefix_join(_docs(spark, texts), t_num=7,
                               t_den=10).collect()
    assert got2 == []
