"""Dunning G2 keyness and Burrows' Delta vs independent references."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from lib_gdal_spark.operators.textops import (burrows_delta,
                                               js_divergence, keyness_g2)


class TestKeynessG2:
    def test_detects_planted_keyword(self, spark):
        # 'zebra' appears only in the focus slice; 'common' everywhere
        rows = []
        for i in range(40):
            focus = i % 2 == 0
            words = ["common"] * 10 + (["zebra"] * 5 if focus else
                                       ["plain"] * 5)
            rows.append((i, " ".join(words), focus))
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, in_focus boolean")
        out = {r["term"]: r for r in keyness_g2(docs).collect()}
        assert out["zebra"]["direction"] == 1
        assert out["plain"]["direction"] == -1
        assert out["zebra"]["g2"] > out["common"]["g2"]
        # 'common' has identical rates -> G2 exactly 0
        assert out["common"]["g2"] == pytest.approx(0.0, abs=1e-9)

    def test_matches_scalar_formula(self, spark):
        rows = [(0, "a a a b", True), (1, "a b b b c c", False)]
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, in_focus boolean")
        out = {r["term"]: r for r in keyness_g2(docs, min_count=1).collect()}
        na, nb = 4, 6
        for term, a, b in (("a", 3, 1), ("b", 1, 3), ("c", 0, 2)):
            e1 = na * (a + b) / (na + nb)
            e2 = nb * (a + b) / (na + nb)
            g2 = 2 * ((a * math.log(a / e1) if a else 0.0)
                      + (b * math.log(b / e2) if b else 0.0))
            assert out[term]["g2"] == pytest.approx(g2, abs=1e-6), term
            assert out[term]["a"] == a and out[term]["b"] == b


class TestBurrowsDelta:
    def _corpus(self, spark):
        # two "authors" with distinct function-word habits + query docs
        rng = np.random.default_rng(8)
        def prose(the, of, n=120):
            pool = ["the"] * the + ["of"] * of + ["x", "y", "z", "w"]
            return " ".join(rng.choice(pool, n))
        rows = [(i, prose(12, 2)) for i in range(10)]          # style A
        rows += [(10 + i, prose(2, 12)) for i in range(10)]    # style B
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        cands = spark.createDataFrame(
            [(100, prose(12, 2, 400)), (200, prose(2, 12, 400))],
            "cand_id long, text string")
        return docs, cands

    def test_attribution_separates_styles(self, spark):
        docs, cands = self._corpus(spark)
        out = burrows_delta(docs, cands, k_words=6).where(
            F.col("rank") == 1).collect()
        att = {r["doc_id"]: r["cand_id"] for r in out}
        a_hits = sum(1 for d in range(10) if att[d] == 100)
        b_hits = sum(1 for d in range(10, 20) if att[d] == 200)
        assert a_hits >= 9 and b_hits >= 9

    def test_self_candidate_is_nearest(self, spark):
        docs, _ = self._corpus(spark)
        cands = docs.where(F.col("doc_id") == 0).select(
            F.col("doc_id").alias("cand_id"), "text")
        extra = docs.where(F.col("doc_id") == 15).select(
            F.col("doc_id").alias("cand_id"), "text")
        out = burrows_delta(docs, cands.unionByName(extra),
                            k_words=6).collect()
        row0 = [r for r in out if r["doc_id"] == 0 and r["rank"] == 1][0]
        assert row0["cand_id"] == 0 and row0["delta"] == 0.0

    def test_partition_invariance(self, spark):
        docs, cands = self._corpus(spark)
        a = sorted(map(tuple, burrows_delta(
            docs, cands, k_words=6).collect()))
        b = sorted(map(tuple, burrows_delta(
            docs.repartition(7), cands, k_words=6).collect()))
        assert [x[:2] + (x[3],) for x in a] == \
            [x[:2] + (x[3],) for x in b]  # ids + rank identical
        assert all(abs(x[2] - y[2]) < 1e-9 for x, y in zip(a, b))


class TestJsDivergence:
    def test_identical_slices_zero(self, spark):
        rows = [(i, "alpha beta gamma", i % 2 == 0) for i in range(20)]
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, in_focus boolean")
        row = js_divergence(docs).collect()[0]
        assert row["jsd"] == 0.0 and row["kl_p"] == 0.0

    def test_disjoint_slices_ln2(self, spark):
        rows = [(0, "xx yy zz", True), (1, "aa bb cc", False)]
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, in_focus boolean")
        row = js_divergence(docs).collect()[0]
        assert row["jsd"] == pytest.approx(math.log(2), abs=1e-9)

    def test_matches_scipy_style_formula(self, spark):
        rows = [(0, "a a a b", True), (1, "a b b c", False)]
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, in_focus boolean")
        row = js_divergence(docs).collect()[0]
        import numpy as _np
        p = _np.array([3, 1, 0]) / 4
        q = _np.array([1, 2, 1]) / 4
        m = (p + q) / 2
        klp = sum(pi * math.log(pi / mi) for pi, mi in zip(p, m) if pi > 0)
        klq = sum(qi * math.log(qi / mi) for qi, mi in zip(q, m) if qi > 0)
        assert row["kl_p"] == pytest.approx(klp, abs=1e-9)
        assert row["kl_q"] == pytest.approx(klq, abs=1e-9)
        assert row["jsd"] == pytest.approx((klp + klq) / 2, abs=1e-9)
        assert row["n_terms"] == 3  # union vocab {a, b, c}
