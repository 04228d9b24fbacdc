"""Heaps'-law fit: known-exponent synthetic corpus, determinism,
degenerate corpora."""

import numpy as np
import pytest

from lib_gdal_spark.operators.textops import heaps_law


def test_fit_recovers_planted_exponent(spark):
    # corpus engineered so V ~ N^0.5: doc d introduces new types only
    # when d is a perfect square boundary; with 10 tokens per doc,
    # N_d = 10d and V_d ~ c*sqrt(d) -> beta ~ 0.5
    rng = np.random.default_rng(7)
    rows = []
    v = 0
    for d in range(1, 300):
        target_v = int(10 * np.sqrt(d))
        fresh = max(target_v - v, 0)
        words = [f"new{v + i}" for i in range(fresh)]
        v += fresh
        while len(words) < 10:
            words.append(f"new{rng.integers(0, max(v, 1))}")
        rows.append((d, " ".join(words[:10])))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    r = heaps_law(df).first()
    assert r["n_points"] == 299
    assert 0.4 < r["beta"] < 0.6
    assert r["n_tokens"] == 2990 and r["v_types"] == v


def test_deterministic_across_partitioning(spark):
    rows = [(d, " ".join(f"w{(d * 7 + i) % 50}" for i in range(8)))
            for d in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = tuple(heaps_law(df).first())
    b = tuple(heaps_law(df.repartition(13)).first())
    assert a == b


def test_constant_vocab_beta_near_zero(spark):
    rows = [(d, "alpha beta gamma") for d in range(1, 200)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    r = heaps_law(df).first()
    assert r["v_types"] == 3
    assert abs(r["beta"]) < 0.05


def test_all_unique_beta_near_one(spark):
    rows = [(d, " ".join(f"u{d}_{i}" for i in range(5)))
            for d in range(1, 200)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    r = heaps_law(df).first()
    assert r["beta"] == pytest.approx(1.0, abs=0.01)
