"""Similarity search over embedding columns (training-data pipeline ops).

- ``cosine_topk``: exact brute-force top-k cosine neighbors — JVM-side only:
  the dot product and norms use ``zip_with`` + ``aggregate`` higher-order
  functions, so no Python runs on the big side at all.
- ``cosine_topk_lsh``: the scale path — random-hyperplane (SimHash) bucket
  join: each vector hashes to a b-bit signature via a broadcast plane
  matrix (pandas UDF, one matmul per Arrow batch); candidates share a
  bucket in at least one of ``tables`` independent hash tables; exact
  cosine re-ranks. Collision probability per table: (1 − θ/π)^b.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a) -> F.Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    query_cols: tuple[str, str] = ("qid", "qvec"),
    corpus_cols: tuple[str, str] = ("vec_id", "embedding"),
    round_decimals: int = 6,
) -> DataFrame:
    """Exact top-k cosine neighbors of each query vector.

    Output (qid, vec_id, rank, cos_sim); self-matches (qid == vec_id) are
    excluded. Queries broadcast; corpus streams once. cos_sim is rounded
    *before* ranking so sub-ulp accumulation-order differences across
    engines cannot flip ranks; ties break on vec_id.
    """
    qid, qvec = query_cols
    cid, cvec = corpus_cols
    j = corpus.crossJoin(F.broadcast(queries))
    cos = F.round(
        _dot(F.col(qvec), F.col(cvec))
        / (_norm(F.col(qvec)) * _norm(F.col(cvec))),
        round_decimals,
    ).alias("cos_sim")
    j = j.select(qid, cid, cos).where(F.col(qid) != F.col(cid))
    w = Window.partitionBy(qid).orderBy(F.col("cos_sim").desc(), F.col(cid).asc())
    return (
        j.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(qid, cid, "rank", "cos_sim")
    )


def cosine_near_dup_pairs(
    corpus: DataFrame,
    threshold: float,
    corpus_cols: tuple[str, str] = ("vec_id", "embedding"),
    round_decimals: int = 6,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a, id_b, cos_sim) with
    cos >= threshold, id_a < id_b — exact all-pairs baseline, JVM-side only
    (the LSH-bucketed scale path is ``cosine_topk_lsh`` with a threshold
    filter)."""
    cid, cvec = corpus_cols
    a = corpus.select(F.col(cid).alias("id_a"), F.col(cvec).alias("va"))
    b = corpus.select(F.col(cid).alias("id_b"), F.col(cvec).alias("vb"))
    j = a.crossJoin(b).where(F.col("id_a") < F.col("id_b"))
    cos = F.round(
        _dot(F.col("va"), F.col("vb"))
        / (_norm(F.col("va")) * _norm(F.col("vb"))),
        round_decimals,
    ).alias("cos_sim")
    return j.select("id_a", "id_b", cos).where(F.col("cos_sim") >= threshold)


def simhash_signature(df: DataFrame, vec_col: str, bits: int = 16,
                      dim: int = 32, seed: int = 42, out_col: str = "sig") -> DataFrame:
    """Random-hyperplane signature: sign pattern of W @ v packed to int64."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, bits))

    @F.pandas_udf("long")
    def sig(vs: pd.Series) -> pd.Series:
        mat = np.stack(vs.to_numpy())  # (n, dim)
        proj = mat @ planes  # (n, bits)
        weights = (1 << np.arange(bits, dtype=np.int64))
        return pd.Series(((proj > 0).astype(np.int64) * weights).sum(axis=1))

    return df.withColumn(out_col, sig(F.col(vec_col)))


def cosine_topk_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    bits: int = 12,
    tables: int = 4,
    dim: int = 32,
    query_cols: tuple[str, str] = ("qid", "qvec"),
    corpus_cols: tuple[str, str] = ("vec_id", "embedding"),
    seed: int = 42,
    round_decimals: int = 6,
) -> DataFrame:
    """LSH-bucketed approximate top-k cosine neighbors.

    Plan: per hash table t, both sides get signature sig_t; candidates are
    the union over t of equi-joins on (t, sig_t) — expressed as one join on
    exploded (table_id, sig) pairs with dedup. Exact cosine re-ranks.
    """
    qid, qvec = query_cols
    cid, cvec = corpus_cols

    def with_sigs(df: DataFrame, vec: str, key: str) -> DataFrame:
        for t in range(tables):
            df = simhash_signature(df, vec, bits=bits, dim=dim,
                                   seed=seed + 1000 * t, out_col=f"__sig{t}")
        pairs = F.array(*[
            F.struct(F.lit(t).alias("t"), F.col(f"__sig{t}").alias("s"))
            for t in range(tables)
        ])
        df = df.withColumn("__ts", F.explode(pairs))
        return df.select(key, vec, F.col("__ts.t").alias("t"),
                         F.col("__ts.s").alias("s"))

    qs = with_sigs(queries, qvec, qid)
    cs = with_sigs(corpus, cvec, cid)
    cand = cs.join(F.broadcast(qs), ["t", "s"], "inner").where(
        F.col(qid) != F.col(cid)
    ).select(qid, qvec, cid, cvec).dropDuplicates([qid, cid])
    cos = F.round(
        _dot(F.col(qvec), F.col(cvec))
        / (_norm(F.col(qvec)) * _norm(F.col(cvec))),
        round_decimals,
    ).alias("cos_sim")  # round BEFORE ranking: rank flips from sub-ulp
    # accumulation-order differences would break cross-engine determinism
    cand = cand.select(qid, cid, cos)
    w = Window.partitionBy(qid).orderBy(F.col("cos_sim").desc(), F.col(cid).asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(qid, cid, "rank", "cos_sim")
    )


def cosine_topk_ivf(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    n_lists: int = 32,
    nprobe: int = 8,
    dim: int = 64,
    seed: int = 42,
    query_cols: tuple[str, str] = ("qid", "qvec"),
    corpus_cols: tuple[str, str] = ("vec_id", "embedding"),
    round_decimals: int = 6,
) -> DataFrame:
    """IVF-style ANN: coarse quantization to a FIXED spherical codebook +
    inverted-list probe + exact cosine re-rank.

    The codebook is ``n_lists`` seeded random unit vectors (data-
    independent, so it ships as literals into every engine — including
    the SQL oracle). Corpus vectors land in their nearest list by cosine;
    each query probes its ``nprobe`` nearest lists; candidates re-rank
    exactly. One equi-join on the list id — the same bucketed shape as
    the LSH path, trading table count for probe count.
    """
    rng = np.random.default_rng(seed)
    cb = rng.standard_normal((n_lists, dim))
    cb /= np.linalg.norm(cb, axis=1, keepdims=True)
    qid, qvec = query_cols
    cid, cvec = corpus_cols

    @F.pandas_udf("int")
    def assign1(vs: pd.Series) -> pd.Series:
        mat = np.stack(vs.to_numpy()).astype(np.float64)
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        return pd.Series(np.argmax(mat @ cb.T, axis=1).astype(np.int32))

    @F.pandas_udf("array<int>")
    def assign_probe(vs: pd.Series) -> pd.Series:
        mat = np.stack(vs.to_numpy()).astype(np.float64)
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        sims = mat @ cb.T
        idx = np.argsort(-sims, axis=1)[:, :nprobe]
        return pd.Series(list(idx.astype(np.int32)))

    c = corpus.withColumn("list_id", assign1(F.col(cvec)))
    q = queries.withColumn(
        "list_id", F.explode(assign_probe(F.col(qvec)))
    )
    cand = c.join(F.broadcast(q), "list_id").where(
        F.col(qid) != F.col(cid)
    ).dropDuplicates([qid, cid])
    cos = F.round(
        _dot(F.col(qvec), F.col(cvec))
        / (_norm(F.col(qvec)) * _norm(F.col(cvec))),
        round_decimals,
    ).alias("cos_sim")
    cand = cand.select(qid, cid, cos)
    w = Window.partitionBy(qid).orderBy(F.col("cos_sim").desc(), F.col(cid).asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(qid, cid, "rank", "cos_sim")
    )


def quantize_embeddings(
    corpus: DataFrame,
    corpus_cols: tuple[str, str] = ("vec_id", "embedding"),
) -> DataFrame:
    """Scalar int8 quantization with a per-vector max-abs scale — the
    standard embedding-compression stage (8x smaller than float64; the
    asymmetric-distance search below reads the int8 column directly).

    ``q_i = clamp(floor(v_i / scale * 127 + 0.5), -127, 127)`` with
    ``scale = max|v_i|`` (GDAL-style floor(+0.5) rounding so the oracle
    mirrors bit-for-bit); all-zero vectors quantize to all zeros. Pure JVM
    (aggregate + transform), zero shuffle, streams the corpus once.
    Returns (id, qvec array<int>, scale double).
    """
    cid, cvec = corpus_cols
    v = F.col(cvec)
    scale = F.aggregate(v, F.lit(0.0),
                        lambda acc, x: F.greatest(acc, F.abs(x)))
    out = corpus.select(F.col(cid), v.alias("__v"),
                        scale.alias("scale"))
    q = F.transform(
        F.col("__v"),
        lambda x: F.when(
            F.col("scale") == 0.0, F.lit(0.0)
        ).otherwise(
            F.least(F.greatest(F.floor(x / F.col("scale") * 127.0 + 0.5),
                               F.lit(-127.0)), F.lit(127.0))
        ).cast("int"),
    )
    return out.select(cid, q.alias("qvec"), "scale")


def cosine_topk_int8(
    queries: DataFrame,
    qcorpus: DataFrame,
    k: int,
    query_cols: tuple[str, str] = ("qid", "qvec_f"),
    corpus_cols: tuple[str, str, str] = ("vec_id", "qvec", "scale"),
    round_decimals: int = 6,
) -> DataFrame:
    """Asymmetric-distance top-k: float queries against the int8-quantized
    corpus (``x~_i = q_i * scale / 127``), exact cosine on the
    reconstruction. Same broadcast/stream/rank shape as :func:`cosine_topk`
    — the quantized corpus is what actually sits on disk at scale, so the
    scan reads 1/8th the bytes of the float64 baseline."""
    qid, qvec = query_cols
    cid, cq, cs = corpus_cols
    deq = F.transform(F.col(cq),
                      lambda e: e * (F.col(cs) / F.lit(127.0)))
    corpus = qcorpus.select(F.col(cid), deq.alias("__xr"))
    return cosine_topk(
        queries, corpus, k,
        query_cols=(qid, qvec), corpus_cols=(cid, "__xr"),
        round_decimals=round_decimals,
    )


def embedding_qa(
    vecs: DataFrame,
    expected_dims: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    min_norm: float = 1e-6,
    max_norm: float = 1e6,
) -> DataFrame:
    """Embedding hygiene pass (the QA gate every ANN/clustering pipeline
    runs before indexing — wrong-dimension, NaN-poisoned, zero, or
    exploded vectors corrupt a whole IVF cell or LSH bucket): per
    vector, dimension count, L2 norm (squares accumulated in DOUBLE —
    float32*float32 is exact in double, so the left-to-right fold is
    engine-reproducible), NaN/zero flags, and an ``ok`` verdict against
    [min_norm, max_norm]. One zero-shuffle JVM projection.
    """
    e = F.col(vec_col)
    n_dims = F.size(e)
    sq = F.aggregate(
        F.transform(e, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda a, x: a + x)
    has_nan = F.exists(e, lambda x: F.isnan(x))
    norm = F.sqrt(sq)
    ok = ((n_dims == expected_dims) & ~has_nan
          & (norm >= min_norm) & (norm <= max_norm))
    return vecs.select(
        F.col(id_col),
        n_dims.alias("n_dims"),
        F.round(norm, 6).alias("l2_norm"),
        has_nan.cast("int").alias("has_nan"),
        (sq == 0.0).cast("int").alias("is_zero"),
        ok.cast("int").alias("ok"),
    )


def jl_sign_matrix(d: int, k: int, seed: int = 42,
                   stream: int = 4242) -> np.ndarray:
    """The (k, d) +-1 sign matrix for :func:`random_projection`, from
    splitmix64(i * 4096 + j) parity — the same deterministic generator
    as the sampling ops, so any engine can reproduce it (the oracle
    inlines this matrix's literals; single-sourced here)."""
    from lib_gdal_spark.sources.pages import _mix

    idx = np.arange(d * k, dtype=np.int64)
    bits = _mix(idx, stream, seed).astype(np.uint64) & np.uint64(1)
    return np.where(bits == 0, 1.0, -1.0).reshape(k, d)


def random_projection(emb: DataFrame, k: int = 16, seed: int = 42,
                      stream: int = 4242, id_col: str = "vec_id",
                      vec_col: str = "embedding") -> DataFrame:
    """Johnson-Lindenstrauss sign random projection (Achlioptas, JCSS
    2003: +-1 entries scaled by 1/sqrt(k) preserve pairwise distances
    within (1 +- eps) for k = O(log n / eps^2)) — the embedding
    compression step before ANN / semantic dedup: d -> k dims cuts
    every downstream shuffle and scan by d/k with a fixed, data-
    independent matrix (no training pass, unlike PQ/IVF).

    Pure JVM narrow map: each output dim j is one zip_with + aggregate
    LEFT fold of the input against a broadcast literal sign row (the
    fold-order contract every embedding op here uses), then one divide
    by sqrt(k). Deterministic: signs from :func:`jl_sign_matrix`.
    Returns (id, j, v) rows, v rounded to 6 dp."""
    d = len(emb.select(vec_col).first()[0])
    signs = jl_sign_matrix(d, k, seed, stream)
    rt = math.sqrt(float(k))
    cols = []
    for j in range(k):
        srow = F.array(*[F.lit(float(s)) for s in signs[j]])
        cols.append(F.round(_dot(F.col(vec_col), srow) / rt, 6))
    return emb.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.array(*cols)).alias("j", "v"))
