"""ROUGE-L LCS: brute-force DP parity, hand cases, truncation, edges."""

import itertools

import pytest

from lib_gdal_spark.operators.textops import rouge_l_pairs


def _brute_lcs(a, b):
    dp = [[0] * (len(b) + 1) for _ in range(len(a) + 1)]
    for i in range(1, len(a) + 1):
        for j in range(1, len(b) + 1):
            dp[i][j] = (dp[i - 1][j - 1] + 1 if a[i - 1] == b[j - 1]
                        else max(dp[i - 1][j], dp[i][j - 1]))
    return dp[-1][-1]


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "pair_id long, cand string, ref string")
    return {r["pair_id"]: r for r in rouge_l_pairs(df, **kw).collect()}


def test_hand_cases(spark):
    out = _run(spark, [
        (1, "the cat sat on the mat", "the cat is on the mat"),
        (2, "a b c", "c b a"),
        (3, "same same", "same same"),
    ])
    assert out[1]["lcs"] == 5          # the cat ... on the mat
    assert out[2]["lcs"] == 1
    assert out[3]["lcs"] == 2 and out[3]["f1"] == 1.0


def test_matches_bruteforce_fuzz(spark):
    rows = []
    vocab = ["a", "b", "c", "d"]
    want = {}
    k = 0
    for n in range(0, 6):
        for m in range(0, 6):
            a = [vocab[(i * 7 + n) % 4] for i in range(n)]
            b = [vocab[(i * 5 + m) % 4] for i in range(m)]
            rows.append((k, " ".join(a), " ".join(b)))
            want[k] = _brute_lcs(a, b)
            k += 1
    out = _run(spark, rows)
    assert {i: r["lcs"] for i, r in out.items()} == want


def test_empty_sides_score_zero(spark):
    out = _run(spark, [(1, "", "x y"), (2, "x y", ""), (3, "", "")])
    for i in (1, 2, 3):
        assert out[i]["lcs"] == 0 and out[i]["f1"] == 0.0


def test_truncation(spark):
    long = " ".join(f"w{i}" for i in range(50))
    out = _run(spark, [(1, long, long)], max_tokens=12)
    assert out[1]["c_len"] == 12 and out[1]["lcs"] == 12
    assert out[1]["f1"] == 1.0


def test_f1_is_harmonic_mean(spark):
    out = _run(spark, [(1, "a b c d", "a b")])
    r = out[1]
    assert r["lcs"] == 2
    assert r["precision"] == 0.5 and r["recall"] == 1.0
    assert r["f1"] == round(2 * 0.5 * 1.0 / 1.5, 6)
