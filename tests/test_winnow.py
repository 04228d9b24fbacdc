"""Winnowing fingerprints (Schleimer et al. 2003): the paper's guarantee
and tie rule, verified against a straight-line reference implementation."""

import numpy as np
import pandas as pd
import pytest

from lib_gdal_spark.operators import textops as TX


def _docs(spark, texts):
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts}),
        schema="doc_id long, text string",
    )


def _reference(text, k, w):
    """Straight-line winnowing for one doc (independent of the operator)."""
    import re

    s = re.sub(r"[^a-z0-9]", "", text.lower())
    if len(s) < k:
        return set()
    h = [sum(ord(s[i + j]) * 257 ** (k - 1 - j) for j in range(k))
         for i in range(len(s) - k + 1)]
    ws = min(w, len(h))
    out = set()
    for st in range(len(h) - ws + 1):
        window = h[st:st + ws]
        mh = min(window)
        # rightmost occurrence of the minimum
        pos = st + max(i for i, v in enumerate(window) if v == mh)
        out.add((pos + 1, mh))
    return out


def test_matches_reference(spark):
    texts = [
        "The quick brown fox jumps over the lazy dog again and again!",
        "aaaaaaaaaaaaaaaa",          # all-equal hashes: tie rule everywhere
        "abcabcabcabcabc",           # periodic text
        "xy",                        # shorter than k -> no fingerprints
        "hello",                     # exactly k chars -> one gram, one window
        "",                          # empty
    ]
    got = {}
    for r in TX.winnow_fingerprints(_docs(spark, texts), k=5, w=4).collect():
        got.setdefault(r["doc_id"], set()).add((r["pos"], r["fingerprint"]))
    for i, t in enumerate(texts):
        want = _reference(t, 5, 4)
        assert got.get(i, set()) == want, (i, t)


def test_shared_substring_guarantee(spark):
    """Any substring of length >= k + w - 1 shared by two docs must share
    at least one selected fingerprint (the paper's correctness property)."""
    shared = "thecommonpassagebothdocumentsquoteverbatim"
    texts = [f"prefix one {shared} suffix alpha",
             f"completely different lead-in {shared} other tail"]
    rows = TX.winnow_fingerprints(_docs(spark, texts), k=5, w=4).collect()
    fps = {0: set(), 1: set()}
    for r in rows:
        fps[r["doc_id"]].add(r["fingerprint"])
    assert fps[0] & fps[1], "no shared fingerprint for a shared passage"


def test_density_bound(spark):
    """Selected fingerprints per doc stay near the 2/(w+1) winnowing
    density (sanity that windows aren't selecting everything)."""
    rng = np.random.default_rng(7)
    text = "".join(rng.choice(list("abcdefghijklmnopqrstuvwxyz"), 5000))
    n = TX.winnow_fingerprints(_docs(spark, [text]), k=5, w=8).count()
    grams = 5000 - 5 + 1
    assert n <= grams * 2 / (8 + 1) * 1.5
    assert n >= grams / (8 + 1) * 0.5


def test_param_guard(spark):
    with pytest.raises(ValueError):
        TX.winnow_fingerprints(_docs(spark, ["x"]), k=0)
