"""Clipped n-gram precision (BLEU p_n): hand-checked values, clipping,
short-doc and empty edge cases, partition invariance."""

import math

import pytest

from lib_gdal_spark.operators.textops import ngram_precision_pairs


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "pair_id long, cand string, ref string")


def test_hand_checked_example(spark):
    # classic clipping example: cand repeats "the"; ref has it twice
    df = _pairs(spark, [
        (1, "the the the the the the the", "the cat is on the mat"),
    ])
    r = ngram_precision_pairs(df).first()
    assert r["den1"] == 7 and r["hits1"] == 2  # clipped to ref count
    assert r["p1"] == round(2 / 7, 6)
    assert r["den2"] == 6  # six "the the" candidate bigrams
    # ref has no "the the" bigram -> hits2 = 0
    assert r["hits2"] == 0 and r["p2"] == 0.0
    assert r["bleu"] == 0.0
    assert r["brevity"] == round(7 / 6, 6)


def test_identical_pair_is_perfect(spark):
    df = _pairs(spark, [(1, "a b c d e", "a b c d e")])
    r = ngram_precision_pairs(df).first()
    assert r["p1"] == 1.0 and r["p2"] == 1.0 and r["bleu"] == 1.0
    assert r["brevity"] == 1.0


def test_short_and_empty_docs(spark):
    df = _pairs(spark, [
        (1, "word", "word"),      # 1 token: p2 denominator 0
        (2, "", "a b"),           # empty candidate
        (3, "a b", ""),           # empty reference
    ])
    out = {r["pair_id"]: r for r in ngram_precision_pairs(df).collect()}
    assert out[1]["p1"] == 1.0 and out[1]["den2"] == 0 and out[1]["p2"] == 0.0
    assert out[2]["den1"] == 0 and out[2]["p1"] == 0.0
    assert out[3]["p1"] == 0.0 and out[3]["brevity"] == 0.0


def test_case_and_whitespace_normalization(spark):
    df = _pairs(spark, [(1, "  The   CAT ", "the cat")])
    r = ngram_precision_pairs(df).first()
    assert r["p1"] == 1.0 and r["p2"] == 1.0


def test_partition_invariance(spark):
    rows = [(i, f"tok{i} tok{i+1} tok{i+2} tok{i%3}",
             f"tok{i+1} tok{i+2} tok{i+3}") for i in range(60)]
    df = _pairs(spark, rows)
    a = sorted(map(tuple, ngram_precision_pairs(df).collect()))
    b = sorted(map(tuple,
                   ngram_precision_pairs(df.repartition(17)).collect()))
    assert a == b


def test_bleu_is_sqrt_of_unrounded_product(spark):
    df = _pairs(spark, [(1, "a b c x", "a b y z")])
    r = ngram_precision_pairs(df).first()
    # p1 = 2/4 (a, b), p2 = 1/3 ("a b")
    assert r["p1"] == 0.5 and r["p2"] == round(1 / 3, 6)
    assert r["bleu"] == round(math.sqrt(0.5 * (1 / 3)), 6)


def test_rejects_bad_ns(spark):
    df = _pairs(spark, [(1, "a", "a")])
    with pytest.raises(ValueError):
        ngram_precision_pairs(df, ns=())
    with pytest.raises(ValueError):
        ngram_precision_pairs(df, ns=(1, 1))
