"""Perceptual image hashes (operators/imagehash.py)."""

import numpy as np
import pandas as pd
import pytest

from lib_gdal_spark.operators.imagehash import (
    ahash64, dhash64, hash_near_dup_pairs, image_hashes,
)
from lib_gdal_spark.sources.png import write_png


def _ref_ahash(gray):
    """Independent straight-from-definition reimplementation."""
    h, w = gray.shape
    s = np.zeros((8, 8), dtype=object)
    n = np.zeros((8, 8), dtype=object)
    for y in range(h):
        for x in range(w):
            s[y * 8 // h, x * 8 // w] += int(gray[y, x])
            n[y * 8 // h, x * 8 // w] += 1
    tot_s, tot_n = s.sum(), n.sum()
    v = 0
    for r in range(8):
        for c in range(8):
            if s[r, c] * tot_n > tot_s * n[r, c]:
                v |= 1 << (r * 8 + c)
    return v - (1 << 64) if v >= 1 << 63 else v


def test_matches_reference_definition():
    rng = np.random.default_rng(0)
    for shape in [(24, 32), (19, 37), (8, 8), (64, 64)]:
        g = rng.integers(0, 766, shape)  # 3-channel sums
        assert ahash64(g) == _ref_ahash(g)


def test_hash_properties():
    rng = np.random.default_rng(1)
    g = rng.integers(0, 256, (32, 32))
    assert ahash64(g) == ahash64(np.kron(g, np.ones((2, 2), dtype=int)))
    # constant image: no cell exceeds the mean -> all-zero hashes
    flat = np.full((16, 16), 77)
    assert ahash64(flat) == 0 and dhash64(flat) == 0
    # left-right gradient: every dhash bit set
    grad = np.tile(np.arange(36), (16, 1))
    assert dhash64(grad) == -1  # 64 ones wraps to -1 in int64


def test_small_perturbation_small_hamming():
    rng = np.random.default_rng(2)
    g = rng.integers(0, 256, (32, 24)).astype(np.int64)
    g2 = g.copy()
    g2[:4, :3] += 300    # push one ahash cell up...
    g2[-4:, -3:] -= 300  # ...and another down: global mean unchanged
    d = bin((ahash64(g) ^ ahash64(g2)) & ((1 << 64) - 1)).count("1")
    assert d <= 2


def test_spark_hashes_and_pairs(spark):
    rng = np.random.default_rng(3)
    rows = []
    grays = {}
    for grp in range(4):
        base = rng.integers(0, 256, (24, 32))
        for j in range(3):
            m = grp * 3 + j
            img = base.copy()
            img[(3 * j):(3 * j + 3), :4] = (img[:3, :4] + 40 * j) % 256
            grays[m] = img.astype(np.int64) * 3  # 3 equal channels
            rows.append((m, "image",
                         write_png([img.astype(np.uint8)] * 3),
                         0, 0, 3, None, None, None, None))
    media = spark.createDataFrame(pd.DataFrame(rows, columns=[
        "media_id", "kind", "payload", "width", "height", "channels",
        "sample_rate", "n_samples", "fps", "n_frames"]))
    hashes = image_hashes(media, strict=True)
    got = {r["media_id"]: (r["ahash"], r["dhash"]) for r in hashes.collect()}
    for m, g in grays.items():
        assert got[m] == (ahash64(g), dhash64(g))
    # pairs: block-join result must equal brute force at k=3
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in hash_near_dup_pairs(hashes, k=3).collect()}
    brute = {}
    ids = sorted(got)
    for i in ids:
        for j in ids:
            if i < j:
                d = bin((got[i][0] ^ got[j][0]) & ((1 << 64) - 1)) \
                    .count("1")
                if d <= 3:
                    brute[(i, j)] = d
    assert pairs == brute


def test_pair_k_validation(spark):
    df = spark.createDataFrame(pd.DataFrame(
        {"media_id": [1], "ahash": [0]}))
    with pytest.raises(ValueError):
        hash_near_dup_pairs(df, k=4)
