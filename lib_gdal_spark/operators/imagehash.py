"""Perceptual image hashing for image-level dedup — the image-side
analog of SimHash in a web training-data pipeline (near-identical
thumbnails, recompressed logos, resized banners all collapse to nearby
hashes).

Two classic 64-bit hashes, defined INTEGER-EXACTLY so a SQL oracle can
reproduce every bit:

- aHash (average hash): grayscale -> 8x8 grid -> bit(r,c) = 1 iff the
  cell mean exceeds the global mean. Grayness is the channel SUM (never
  divided); cell membership is ``col = x*8 // w`` / ``row = y*8 // h``;
  the mean comparison is cross-multiplied (``s_cell * n_total >
  s_total * n_cell``), so no float ever appears.
- dHash (difference hash): 8x9 grid, bit(r,c) = 1 iff cell (r, c+1)'s
  mean exceeds cell (r, c)'s — again cross-multiplied.

Bit (r, c) contributes 2^(r*8+c); the 64-bit value wraps into a signed
int64 like every other hash column in the repo.

Near-dup pairs use the Manku-style pigeonhole block join (4 x 16-bit
blocks: any pair within Hamming distance k <= 3 shares at least one
exact block), then an exact JVM ``bit_count(xor)`` verify — identical
scale shape to operators/dedup.simhash_pairs: candidate generation is an
equi-join on (block_idx, block_value), never all-pairs.

Decode is the real multimodal path (PNG/TIFF/JPEG via the in-repo
codecs); non-image formats fall back to the deterministic fake exactly
like operators/multimodal.image_features.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _grid_sums(gray: np.ndarray, gh: int, gw: int):
    """Integer cell sums + counts for the (gh, gw) grid."""
    h, w = gray.shape
    rows = (np.arange(h) * gh) // h
    cols = (np.arange(w) * gw) // w
    s = np.zeros((gh, gw), dtype=np.int64)
    n = np.zeros((gh, gw), dtype=np.int64)
    np.add.at(s, (rows[:, None], cols[None, :]), gray)
    np.add.at(n, (rows[:, None], cols[None, :]),
              np.ones((h, w), dtype=np.int64))
    return s, n


def _pack(bits: np.ndarray) -> int:
    """(8, 8) bool, bit (r, c) -> 2^(r*8+c), wrapped to signed int64."""
    v = 0
    flat = bits.ravel()
    for k in range(64):
        if flat[k]:
            v |= 1 << k
    if v >= 1 << 63:
        v -= 1 << 64
    return v


def ahash64(gray: np.ndarray) -> int:
    s, n = _grid_sums(gray.astype(np.int64), 8, 8)
    tot_s, tot_n = int(s.sum()), int(n.sum())
    return _pack(s * tot_n > tot_s * n)


def dhash64(gray: np.ndarray) -> int:
    s, n = _grid_sums(gray.astype(np.int64), 8, 9)
    return _pack(s[:, 1:] * n[:, :-1] > s[:, :-1] * n[:, 1:])


def image_hashes(media: DataFrame, strict: bool = False) -> DataFrame:
    """image rows -> (media_id, width, height, ahash, dhash)."""
    from lib_gdal_spark.operators.multimodal import (
        _fake_decode_image, decode_image, decode_image_strict)

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for _, r in b.iterrows():
                payload = bytes(r["payload"])
                img = decode_image_strict(payload) if strict \
                    else decode_image(payload)
                if img is None:
                    img = _fake_decode_image(
                        payload, int(r["width"]), int(r["height"]),
                        int(r["channels"]))
                gray = img.astype(np.int64).sum(axis=2)
                rows.append({
                    "media_id": int(r["media_id"]),
                    "width": img.shape[1], "height": img.shape[0],
                    "ahash": ahash64(gray), "dhash": dhash64(gray),
                })
            yield pd.DataFrame(rows, columns=[
                "media_id", "width", "height", "ahash", "dhash"])

    return media.where(F.col("kind") == "image").mapInPandas(
        work,
        schema="media_id long, width int, height int, "
               "ahash long, dhash long")


def hash_near_dup_pairs(
    hashes: DataFrame,
    k: int = 3,
    hash_col: str = "ahash",
    id_col: str = "media_id",
    max_block_freq: int | None = 10_000,
) -> DataFrame:
    """(id, hash) rows -> exact Hamming-<=k pairs (id_a, id_b, hamming).

    Pigeonhole: 4 disjoint 16-bit blocks; distance <= 3 forces an exact
    match in >= 1 block, so candidates come from a (block_idx,
    block_value) equi-join. ``max_block_freq`` drops degenerate blocks
    (e.g. the all-zero block of blank images) whose frequency² would
    dominate the join — same guard as SimHash pairs.
    """
    if not 0 <= k <= 3:
        raise ValueError("pigeonhole with 4 blocks is exact for k <= 3")
    h = F.col(hash_col)
    blocks = hashes.select(
        F.col(id_col).alias("id"), h.alias("h"),
        F.explode(F.array(*[
            F.struct(
                F.lit(i).alias("bi"),
                F.shiftrightunsigned(h, 16 * i)
                .bitwiseAND(0xFFFF).alias("bv"))
            for i in range(4)])).alias("b"),
    ).select("id", "h", F.col("b.bi").alias("bi"),
             F.col("b.bv").alias("bv"))
    if max_block_freq is not None:
        hot = (blocks.groupBy("bi", "bv")
               .agg(F.count(F.lit(1)).alias("nf"))
               .where(F.col("nf") > max_block_freq).select("bi", "bv"))
        blocks = blocks.join(hot, ["bi", "bv"], "left_anti")
    a = blocks.select(F.col("id").alias("id_a"), F.col("h").alias("ha"),
                      "bi", "bv")
    b = blocks.select(F.col("id").alias("id_b"), F.col("h").alias("hb"),
                      "bi", "bv")
    cand = (a.join(b, ["bi", "bv"])
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", "ha", "hb").distinct())
    return cand.select(
        "id_a", "id_b",
        F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
        .cast("int").alias("hamming"),
    ).where(F.col("hamming") <= k)


def image_quality(media: DataFrame, dark_max: int = 15,
                  bright_min: int = 240,
                  strict: bool = False) -> DataFrame:
    """Per-image quality metrics for training-data filtering — the
    image-side analog of the Gopher/C4 text rules (drop black frames,
    blown-out scans, and blurry thumbnails before they cost GPU time):

    - **brightness**: mean gray level (channel-sum units),
    - **contrast**: population std of gray,
    - **sharpness**: variance of the 4-neighbour Laplacian response
      (4c - up - down - left - right over interior pixels) — the
      classic variance-of-Laplacian blur detector (Pech-Pacheco et al.,
      ICPR 2000),
    - **frac_dark / frac_bright**: the clipped-exposure pixel shares at
      ``dark_max`` / ``bright_min`` per-channel thresholds.

    Exactness: the Arrow-batched decoder emits only EXACT integer
    sums/counts per image (gray and Laplacian values are ints); every
    metric is one float expression over those int64 columns, evaluated
    engine-side — reproducible op-for-op in SQL. Narrow map, no
    shuffle. Returns (media_id, n_px, brightness, contrast, sharpness,
    frac_dark, frac_bright)."""
    from lib_gdal_spark.operators.multimodal import (
        _fake_decode_image, decode_image, decode_image_strict)

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for _, r in b.iterrows():
                payload = bytes(r["payload"])
                img = decode_image_strict(payload) if strict \
                    else decode_image(payload)
                if img is None:
                    img = _fake_decode_image(
                        payload, int(r["width"]), int(r["height"]),
                        int(r["channels"]))
                ch = img.shape[2]
                gray = img.astype(np.int64).sum(axis=2)
                lap = (4 * gray[1:-1, 1:-1] - gray[:-2, 1:-1]
                       - gray[2:, 1:-1] - gray[1:-1, :-2]
                       - gray[1:-1, 2:])
                rows.append({
                    "media_id": int(r["media_id"]),
                    "n": int(gray.size),
                    "s": int(gray.sum()), "s2": int((gray * gray).sum()),
                    "nl": int(lap.size),
                    "ls": int(lap.sum()), "ls2": int((lap * lap).sum()),
                    "dark": int((gray <= dark_max * ch).sum()),
                    "bright": int((gray >= bright_min * ch).sum()),
                })
            yield pd.DataFrame(rows, columns=[
                "media_id", "n", "s", "s2", "nl", "ls", "ls2",
                "dark", "bright"])

    sums = media.mapInPandas(
        work, schema="media_id long, n long, s long, s2 long, nl long, "
                     "ls long, ls2 long, dark long, bright long")
    def _d(c):  # decimal(38) guard: n*s2 etc. overflow int64 at ~1 MP
        return F.col(c).cast("decimal(38,0)")

    return sums.select(
        "media_id", F.col("n").alias("n_px"),
        F.round(F.col("s") / F.col("n"), 9).alias("brightness"),
        F.round(F.sqrt((_d("n") * _d("s2")
                        - _d("s") * _d("s")).cast("double"))
                / F.col("n"), 9).alias("contrast"),
        F.round((_d("nl") * _d("ls2")
                 - _d("ls") * _d("ls")).cast("double")
                / (F.col("nl") * F.col("nl")), 9).alias("sharpness"),
        F.round(F.col("dark") / F.col("n"), 9).alias("frac_dark"),
        F.round(F.col("bright") / F.col("n"), 9).alias("frac_bright"))
