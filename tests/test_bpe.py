"""Distributed BPE training/encoding vs a straight-line reference
(Sennrich et al. 2016 learn_bpe semantics, leftmost-greedy application)."""

from collections import Counter

import pandas as pd

from lib_gdal_spark.operators import bpe as B


def _docs(spark, texts):
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts}),
        schema="doc_id long, text string",
    )


def _ref_train(texts, n):
    words = Counter()
    for t in texts:
        for w in t.strip().lower().split():
            if w:
                words[w] += 1
    st = {w: tuple(list(w) + ["</w>"]) for w in words}
    rules = []
    for rank in range(1, n + 1):
        pc = Counter()
        for w, syms in st.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += words[w]
        if not pc:
            break
        (left, right), c = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        rules.append((rank, left, right, left + right, c))
        st = {w: _ref_apply(s, left, right) for w, s in st.items()}
    return rules


def _ref_apply(syms, left, right):
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


TEXTS = [
    "low lower lowest low low",
    "new newer newest new",
    "wide wider widest",
    "aaaa aa aaa aaaa",          # a==b merge runs: greedy parity case
    "the cat sat on the mat the cat",
]


def test_train_matches_reference(spark):
    want = _ref_train(TEXTS, 10)
    for parts in (1, 16):
        got = [(r["rank"], r["left"], r["right"], r["merged"],
                r["pair_count"])
               for r in B.bpe_train(_docs(spark, TEXTS).repartition(parts),
                                    10).orderBy("rank").collect()]
        assert got == want, (parts, got, want)


def test_encode_respells_words(spark):
    """Concatenated subwords reproduce each word + one </w> per word."""
    rules = [(r["left"], r["right"]) for r in
             B.bpe_train(_docs(spark, TEXTS), 6).orderBy("rank").collect()]
    enc = {r["doc_id"]: r for r in
           B.bpe_encode(_docs(spark, TEXTS), rules).collect()}
    for i, t in enumerate(TEXTS):
        words = t.lower().split()
        assert enc[i]["n_words"] == len(words)
        joined = "".join(enc[i]["tokens"])
        assert joined == "</w>".join(words) + "</w>"
        assert enc[i]["n_tokens"] == len(enc[i]["tokens"])
        # merges only shrink the stream vs characters + markers
        assert enc[i]["n_tokens"] <= sum(len(w) + 1 for w in words)


def test_encode_greedy_application(spark):
    """aaa under merge (a,a) -> [aa, a</w>-ish]: leftmost, non-overlap."""
    enc = B.bpe_encode(_docs(spark, ["aaa"]), [("a", "a")]).collect()[0]
    assert enc["tokens"] == ["aa", "a", "</w>"]


def test_train_param_guard(spark):
    import pytest

    with pytest.raises(ValueError):
        B.bpe_train(_docs(spark, ["x"]), 0)
