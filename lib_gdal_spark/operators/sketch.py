"""Mergeable frequency sketches for corpus-scale token statistics.

Count-min sketch (Cormode & Muthukrishnan 2005): a depth x width counter
matrix; token t increments row j at bucket_j(t); the estimate is the min
over rows — always >= the true count, overestimating by at most
2N/width with probability 1 - (1/2)^depth.

Engine-exact by construction: the j-th bucket is a bit-slice of ONE
FNV-1a 64-bit hash ((h >> j*log2(width)) & (width-1) — the same
partitioned-hash scheme as ``dedup.bloom_membership``), so the sketch is
deterministic and the DuckDB oracle reproduces it bit-for-bit.

Scale shape: each Arrow batch reduces to a sparse partial sketch
(<= depth*width rows) inside the Python worker, so the shuffle carries
bounded-size partials, never tokens; the merge is a map-side-combinable
groupBy(j, bucket).sum — the classic mergeable-sketch contract. The
corpus is read once and never re-shuffled.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import fnv1a64_batch


def _check_dims(width: int, depth: int) -> int:
    if width & (width - 1):
        raise ValueError("width must be a power of two")
    s = width.bit_length() - 1
    if depth * s > 64:
        raise ValueError("depth*log2(width) exceeds the 64 hash bits")
    return s


def count_min_sketch(
    docs: DataFrame,
    width: int = 4096,
    depth: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """Build the sketch over whitespace tokens of ``text_col``. Returns
    the sparse counter table (j, bucket, cnt) with <= depth*width rows —
    driver- and broadcast-sized regardless of corpus size."""
    s = _check_dims(width, depth)
    mask = np.uint64(width - 1)

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            toks: list[str] = []
            for txt in pdf[text_col]:
                toks.extend((txt or "").lower().split())
            if not toks:
                continue
            hv = fnv1a64_batch(toks)
            frames = []
            for j in range(depth):
                b = ((hv >> np.uint64(j * s)) & mask).astype(np.int64)
                cnt = np.bincount(b, minlength=width)
                nz = np.nonzero(cnt)[0]
                frames.append(
                    pd.DataFrame(
                        {
                            "j": np.full(len(nz), j, dtype=np.int32),
                            "bucket": nz.astype(np.int32),
                            "cnt": cnt[nz].astype(np.int64),
                        }
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    part = docs.select(text_col).mapInPandas(
        partial, "j int, bucket int, cnt long"
    )
    return part.groupBy("j", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    probes: Sequence[str],
    width: int = 4096,
    depth: int = 3,
) -> DataFrame:
    """Point-query the sketch for each probe token: (token, cms_count)
    with cms_count = min over rows, 0 when a bucket was never touched.
    The probe list is driver-sized by contract (heavy-hitter candidates,
    a vocabulary slice) and becomes a broadcast build side."""
    s = _check_dims(width, depth)
    spark = sketch.sparkSession
    hv = fnv1a64_batch(list(probes))
    rows = [
        (tok, j, int((int(h) >> (j * s)) & (width - 1)))
        for tok, h in zip(probes, hv)
        for j in range(depth)
    ]
    p = spark.createDataFrame(rows, "token string, j int, bucket int")
    return (
        p.join(F.broadcast(sketch), ["j", "bucket"], "left")
        .groupBy("token")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_count"))
    )


def cms_token_counts(
    docs: DataFrame,
    probes: Sequence[str],
    width: int = 4096,
    depth: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """Sketch-estimated vs exact counts for the probe tokens:
    (token, cms_count, true_count) — cms_count >= true_count always
    (count-min never underestimates). The exact side filters to the probe
    set before its groupBy, so only probe occurrences shuffle."""
    est = cms_estimate(
        count_min_sketch(docs, width, depth, text_col), probes, width, depth
    )
    toks = F.filter(
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+"),
        lambda x: x != F.lit(""),
    )
    true = (
        docs.select(F.explode(toks).alias("token"))
        .where(F.col("token").isin(list(probes)))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("true_count"))
    )
    return est.join(true, "token", "left").select(
        "token",
        "cms_count",
        F.coalesce("true_count", F.lit(0)).alias("true_count"),
    )


def hll_distinct(
    docs: DataFrame,
    col: str,
    p: int = 10,
) -> DataFrame:
    """HyperLogLog distinct-count estimate (Flajolet et al. 2007) of a
    string column — "how many distinct URLs in the crawl" without a
    global distinct shuffle. Returns ONE row:
    (m, n_registers_set, hll_estimate).

    Deterministic by construction: value -> FNV-1a 64-bit hash; bucket =
    low ``p`` bits; rho = position of the leftmost 1-bit in the remaining
    64-p bits, computed as (64-p) - bitlength + 1 with ``bin()`` string
    length (identical builtin in Spark and DuckDB — no float log2). The
    harmonic sum uses EXACT integer numerators over a common 2^64
    denominator (sum of 2^(64-reg) as decimal(38)), so the only float
    ops are one division and one optional ln — engine-exact after 6 dp
    rounding, unlike Spark's own approx_count_distinct whose HLL++
    layout no other engine reproduces.

    Scale shape: one narrow map computes (bucket, rho); a map-side
    combinable groupBy(bucket).max keeps 2^p rows; the final agg is one
    row. Standard error ~1.04/sqrt(2^p) (~3.25% at p=10). Includes the
    small-range linear-counting correction (E < 2.5m with empty
    registers); the large-range correction is omitted (needs 2^57+
    distinct values).
    """
    if not 4 <= p <= 18:
        raise ValueError("p must be in [4, 18]")
    m = 1 << p

    @F.pandas_udf("long")
    def fnv(vals: pd.Series) -> pd.Series:
        h = fnv1a64_batch(vals.fillna("").astype(str).tolist())
        return pd.Series(h.view(np.int64))

    h = F.col("__h")
    w = F.shiftrightunsigned(h, p)
    rho = F.when(w == 0, F.lit(64 - p + 1)).otherwise(
        F.lit(64 - p) - (F.length(F.bin(w)) - 1)
    )
    regs = (
        docs.select(fnv(col).alias("__h"))
        .select(
            h.bitwiseAND(m - 1).alias("bucket"), rho.alias("rho")
        )
        .groupBy("bucket")
        .agg(F.max("rho").alias("reg"))
    )
    # alpha_m for m >= 128 (p >= 7); exact constants below
    alpha = {4: 0.673, 5: 0.697, 6: 0.709}.get(p, 0.7213 / (1 + 1.079 / m))
    num = F.sum(
        F.pow(F.lit(2), 64 - F.col("reg")).cast("decimal(38,0)")
    )
    agg = regs.agg(
        num.alias("__S"), F.count(F.lit(1)).alias("__V")
    )
    # empty buckets contribute 2^64 each (reg = 0)
    S_full = (
        F.col("__S").cast("double")
        + (F.lit(m) - F.col("__V")) * F.lit(float(2**64))
    )
    raw = F.lit(alpha * m * m * float(2**64)) / S_full
    zeros = F.lit(m) - F.col("__V")
    est = F.when(
        (raw <= 2.5 * m) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
    ).otherwise(raw)
    return agg.select(
        F.lit(m).alias("m"),
        F.col("__V").cast("long").alias("n_registers_set"),
        F.round(est, 6).alias("hll_estimate"),
    )


def kmv_hash_batch(vals: list[str], stream: int = 55,
                   seed: int = 42) -> np.ndarray:
    """FNV-1a 64 then the splitmix64 finalizer (sources/pages._mix):
    FNV alone clusters order statistics on short similar strings (its
    k-th min can sit 4x low), and KMV is exactly an order-statistic
    estimator — the finalizer restores uniformity. Both stages are
    already spelled in DuckDB SQL elsewhere in the repo (_FNV, _mix_sql),
    so composition stays engine-exact."""
    from lib_gdal_spark.sources.pages import _mix

    return _mix(fnv1a64_batch(vals), stream, seed)


def kmv_sketch(
    df: DataFrame,
    col: str,
    k: int = 256,
    group_col: str = "g",
) -> DataFrame:
    """K-minimum-values distinct sketch (Bar-Yossef et al. 2002 /
    Beyer et al. SIGMOD 2007, the "KMV synopsis") of a string column,
    one sketch per ``group_col`` value: the ``k`` smallest DISTINCT
    splitmix64(FNV-1a) hash values, returned as
    ``(group, hv decimal(20,0), rk int)`` with rk = 1..k ascending.

    Unlike HLL (one register array, distinct COUNT only), a KMV sketch
    supports set operations — the k smallest hashes of ``A UNION B`` are
    computable from the two sketches alone, which gives intersection /
    Jaccard estimates between corpus slices without ever joining them.

    Deterministic by construction: hashes are exact integers carried as
    ``decimal(20,0)`` in UNSIGNED order (no float anywhere), so the
    DuckDB oracle reproduces every rank bit-for-bit.

    Scale shape: each Arrow partition reduces to at most ``k`` distinct
    hashes per group inside the Python worker (np.unique + slice), so
    the shuffle carries <= n_partitions * k rows per group, never
    values; the global merge is one distinct + one per-group rank window
    over that bounded set — the classic mergeable-synopsis contract.
    """
    if k < 2:
        raise ValueError("k must be >= 2 (the estimator uses the k-th min)")

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        best: dict[str, np.ndarray] = {}
        for pdf in batches:
            for g, vals in pdf.groupby(group_col, sort=False)[col]:
                hv = np.unique(kmv_hash_batch(
                    vals.dropna().astype(str).tolist()))
                prev = best.get(g)
                if prev is not None:
                    hv = np.union1d(prev, hv)
                best[g] = hv[:k]
        for g, hv in best.items():
            yield pd.DataFrame({
                group_col: np.full(len(hv), g, dtype=object),
                "hv": [str(int(x)) for x in hv],
            })

    cand = df.select(group_col, col).mapInPandas(
        partial, f"{group_col} string, hv string"
    ).select(group_col, F.col("hv").cast("decimal(20,0)").alias("hv"))
    from pyspark.sql import Window
    win = Window.partitionBy(group_col).orderBy("hv")
    return (
        cand.distinct()
        .withColumn("rk", F.row_number().over(win))
        .where(F.col("rk") <= k)
    )


# (k-1) * 2^64 as a shared decimal literal: repr() round-trips the exact
# double, so Spark and DuckDB parse the *same* rounded constant and the
# single IEEE division below is bit-identical in both engines.
def _kmv_numerator(k: int) -> float:
    return float((k - 1) * (1 << 64))


def kmv_estimate_expr(k: int) -> "F.Column":
    """Distinct-count estimate from an aggregated sketch row set:
    expects columns ``k_used`` (count of sketch rows) and ``kth``
    (max hv = the k_used-th smallest). Unbiased KMV estimator
    (k-1) * 2^64 / h_(k); when the sketch saw fewer than k distinct
    values it IS the distinct set, so the estimate is exact."""
    return F.when(
        F.col("k_used") < k, F.col("k_used").cast("double")
    ).otherwise(
        F.lit(_kmv_numerator(k)) / F.col("kth").cast("double")
    )


def kmv_two_set_stats(
    df: DataFrame,
    col: str,
    group_col: str,
    group_a: str,
    group_b: str,
    k: int = 256,
) -> DataFrame:
    """Distinct / union / intersection / Jaccard estimates between two
    corpus slices from their KMV sketches, next to the exact answers
    (the exact side is the small-scale verification; at 100 TB only the
    sketch side runs). ONE wide row:

    (k, ka, kth_a, est_a, exact_a, kb, kth_b, est_b, exact_b,
     ku, kth_u, est_u, exact_u, overlap, jaccard_est, est_inter,
     exact_inter)

    Union sketch = k smallest of the union of the two sketches' hash
    sets (provably the KMV sketch of A UNION B); ``overlap`` counts
    union-sketch hashes present in BOTH input sketches; Jaccard ~=
    overlap/k (Beyer et al. 2007 Thm 3); intersection ~= Jaccard * |A u B|.

    Scale: everything after the two bounded sketches is driver-trivial
    (<= 2k rows); the exact sides are keys-only distinct aggregates.
    """
    two = df.where(F.col(group_col).isin([group_a, group_b])).select(
        F.when(F.col(group_col) == group_a, F.lit("a"))
        .otherwise(F.lit("b")).alias("g"),
        F.col(col).alias("v"),
    )
    sk = kmv_sketch(two, "v", k=k, group_col="g").cache()
    a = sk.where(F.col("g") == "a").select("hv")
    b = sk.where(F.col("g") == "b").select("hv")

    def topstats(hvs: DataFrame, name: str) -> DataFrame:
        from pyspark.sql import Window
        win = Window.orderBy("hv")
        t = (hvs.distinct().withColumn("rk", F.row_number().over(win))
             .where(F.col("rk") <= k))
        return t.agg(
            F.count(F.lit(1)).alias("k_used"),
            F.max("hv").alias("kth"),
        ).select(
            F.col("k_used").alias(f"k{name}"),
            F.col("kth").cast("double").alias(f"kth_{name}"),
            F.round(kmv_estimate_expr(k), 6).alias(f"est_{name}"),
        )

    # union sketch: k smallest of the union of the two sketches
    u_hv = a.union(b)
    from pyspark.sql import Window
    uwin = Window.orderBy("hv")
    u_sk = (u_hv.distinct().withColumn("rk", F.row_number().over(uwin))
            .where(F.col("rk") <= k).cache())
    overlap = (
        u_sk.join(a.withColumnRenamed("hv", "hv_a"),
                  u_sk["hv"] == F.col("hv_a"), "left_semi")
        .join(b.withColumnRenamed("hv", "hv_b"),
              F.col("hv") == F.col("hv_b"), "left_semi")
        .agg(F.count(F.lit(1)).alias("overlap"))
    )
    u_stats = u_sk.agg(
        F.count(F.lit(1)).alias("k_used"), F.max("hv").alias("kth"),
    ).select(
        F.col("k_used").alias("ku"),
        F.col("kth").cast("double").alias("kth_u"),
        kmv_estimate_expr(k).alias("__est_u_raw"),
    )

    exact = two.groupBy("v").agg(
        F.max(F.when(F.col("g") == "a", 1).otherwise(0)).alias("ia"),
        F.max(F.when(F.col("g") == "b", 1).otherwise(0)).alias("ib"),
    ).agg(
        F.sum("ia").alias("exact_a"),
        F.sum("ib").alias("exact_b"),
        F.count(F.lit(1)).alias("exact_u"),
        F.sum(F.col("ia") * F.col("ib")).alias("exact_inter"),
    )

    row = (
        topstats(a, "a").crossJoin(topstats(b, "b"))
        .crossJoin(u_stats).crossJoin(overlap).crossJoin(exact)
    )
    jac = F.col("overlap").cast("double") / F.lit(float(k))
    return row.select(
        F.lit(k).alias("k"),
        "ka", "kth_a", "est_a", "exact_a",
        "kb", "kth_b", "est_b", "exact_b",
        "ku", "kth_u", F.round("__est_u_raw", 6).alias("est_u"), "exact_u",
        "overlap",
        F.round(jac, 6).alias("jaccard_est"),
        F.round(jac * F.col("__est_u_raw"), 6).alias("est_inter"),
        "exact_inter",
    )
