"""Content-defined chunking (operators/dedup.py: cdc_chunks)."""

import hashlib

import pandas as pd
import pytest
from pyspark.sql import functions as F

from lib_gdal_spark.operators.dedup import cdc_chunks, cdc_duplicate_chunks


def _boundary(tok: str, divisor: int = 4) -> bool:
    return int(hashlib.md5(tok.encode()).hexdigest()[-1], 16) % divisor == 0


def _ref_chunks(text: str, divisor=4, min_tokens=1, max_tokens=None):
    toks = [t for t in text.lower().split() if t]
    out, cur = [], []
    for t in toks:
        cur.append(t)
        cut = _boundary(t, divisor) and len(cur) >= min_tokens
        if max_tokens is not None and len(cur) >= max_tokens:
            cut = True
        if cut:
            out.append(" ".join(cur))
            cur = []
    if cur:
        out.append(" ".join(cur))
    return out


DOCS = pd.DataFrame({
    "doc_id": [0, 1, 2, 3],
    "text": [
        "the quick brown fox jumps over the lazy dog again and again",
        "  Mixed   CASE   And   extra   whitespace here  ",
        "solo",
        "",
    ],
})


def test_matches_reference_chunker(spark):
    df = spark.createDataFrame(DOCS)
    got = (cdc_chunks(df).orderBy("doc_id", "chunk_no")
           .groupBy("doc_id").agg(F.collect_list("chunk_text").alias("c"))
           .collect())
    by_id = {r["doc_id"]: list(r["c"]) for r in got}
    for _, row in DOCS.iterrows():
        want = _ref_chunks(row["text"])
        assert by_id.get(row["doc_id"], []) == want
    # empty doc yields no chunk rows at all
    assert 3 not in by_id


def test_chunks_partition_the_tokens(spark):
    df = spark.createDataFrame(DOCS)
    out = cdc_chunks(df).collect()
    for r in out:
        assert r["n_tokens"] == len(r["chunk_text"].split(" "))
        assert r["chunk_hash"] == hashlib.md5(
            r["chunk_text"].encode()).hexdigest()
    rebuilt = {}
    for r in sorted(out, key=lambda r: (r["doc_id"], r["chunk_no"])):
        rebuilt.setdefault(r["doc_id"], []).append(r["chunk_text"])
    assert " ".join(rebuilt[0]) == DOCS["text"][0]


def test_min_max_clamps(spark):
    df = spark.createDataFrame(DOCS[:1])
    for kw in ({"min_tokens": 3}, {"max_tokens": 2},
               {"min_tokens": 2, "max_tokens": 4}):
        got = [r["chunk_text"] for r in
               cdc_chunks(df, **kw).orderBy("chunk_no").collect()]
        assert got == _ref_chunks(DOCS["text"][0], **kw)
    capped = cdc_chunks(df, max_tokens=2).collect()
    assert all(r["n_tokens"] <= 2 for r in capped)


def test_boundary_stability_under_insertion(spark):
    """The CDC property: prepending text changes only leading chunks."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": [0, 1], "text": [base, "inserted words here " + base]}))
    sets = (cdc_chunks(df).groupBy("doc_id")
            .agg(F.collect_set("chunk_hash").alias("h")).collect())
    h = {r["doc_id"]: set(r["h"]) for r in sets}
    shared = h[0] & h[1]
    assert len(shared) >= len(h[0]) - 1  # at most the first chunk differs


def test_duplicate_chunk_report(spark):
    boiler = "subscribe to our newsletter for more updates every week"
    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": [f"unique one {boiler}", f"other stuff {boiler}",
                 "nothing shared at all"]}))
    dup = cdc_duplicate_chunks(df).collect()
    assert len(dup) >= 1
    ref_hashes = {hashlib.md5(c.encode()).hexdigest()
                  for c in _ref_chunks(boiler)}
    assert any(r["chunk_hash"] in ref_hashes and r["n_docs"] == 2
               for r in dup)


def test_divisor_validation(spark):
    df = spark.createDataFrame(DOCS)
    with pytest.raises(ValueError):
        cdc_chunks(df, divisor=5)
