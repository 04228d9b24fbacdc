"""Deterministic data-mixing samplers (the "mix the sources to a recipe"
stage of a pre-training pipeline: per-source Bernoulli rates a la
Pile/DoReMi weights, and per-source token budgets).

Both samplers are reproducible pure functions of (doc_id, seed): the keep
decision derives from the splitmix64 finalizer already used by the pages
generator (`sources/pages.py`), evaluated vectorized over Arrow batches
(no per-row Python). Deterministic sampling matters at 100 TB: a re-run
(or a resumed job) must pick the SAME rows without persisting a keep-list,
and downstream exact-dedup of a re-mixed corpus must see identical ids.

Scale notes: the Bernoulli sampler is a stateless narrow map (no shuffle
at all). The budget sampler needs a per-source ordering, i.e. one shuffle
on the source key; a single giant source is the skew case — AQE skew
splitting does not apply to window functions, so ``salt_buckets > 1``
switches to a two-pass range-bucketed cumsum (exactly the same output;
see ``sample_to_token_budget``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..sources.pages import _mix

M53 = 1 << 53


def _hash53(id_col: str, stream: int, seed: int) -> F.Column:
    """splitmix64(id, stream, seed) >> 11 — a deterministic 53-bit draw,
    exact in int64 on every engine (the float [0,1) form is this / 2^53)."""

    @F.pandas_udf("long")
    def h(ids: pd.Series) -> pd.Series:
        m = _mix(ids.to_numpy(dtype=np.int64), stream, seed)
        return pd.Series((m >> np.uint64(11)).astype(np.int64))

    return h(F.col(id_col))


def sample_sources(
    docs: DataFrame,
    rates: dict[str, float],
    default_rate: float = 1.0,
    id_col: str = "doc_id",
    source_col: str = "source",
    seed: int = 42,
    stream: int = 9001,
) -> DataFrame:
    """Per-source Bernoulli subsampling at the given rates.

    A row is kept iff hash53(id) < floor(rate * 2^53) — the integer-
    threshold form, so the decision is bit-exact and engine-independent
    (no float comparison at the boundary). Sources absent from ``rates``
    use ``default_rate``. Stateless narrow map: no shuffle, no state, and
    the same ids survive any partitioning or re-run.
    """
    thr = F.lit(int(default_rate * M53))
    for src, rate in sorted(rates.items()):
        thr = F.when(
            F.col(source_col) == src, F.lit(int(rate * M53))
        ).otherwise(thr)
    return docs.withColumn("__h", _hash53(id_col, stream, seed)).where(
        F.col("__h") < thr
    ).drop("__h")


def sample_to_token_budget(
    docs: DataFrame,
    budget_tokens: int,
    id_col: str = "doc_id",
    source_col: str = "source",
    text_col: str = "text",
    seed: int = 42,
    stream: int = 9002,
    salt_buckets: int = 1,
) -> DataFrame:
    """Keep a deterministic pseudo-random prefix of each source worth at
    most ``budget_tokens`` whitespace tokens: docs are ordered by (hash,
    id) and kept while the running total stays within budget (the first
    overflowing doc and everything after it are dropped — pure prefix
    semantics; the under-fill bias is negligible when budget >> max doc
    length).

    Output adds (n_tokens, cum_tokens).

    ``salt_buckets=1`` runs one window per source — fine while every
    source fits a partition. For a web-scale source, pass
    ``salt_buckets=B``: rows are range-bucketed by the high bits of the
    hash (bucket boundaries partition the (hash, id) order, so the global
    cumsum is EXACTLY reproduced), each (source, bucket) windows
    independently, and the per-bucket totals — a sources x B frame —
    broadcast back as prefix offsets. Identical output, bounded
    partitions.
    """
    toks = F.filter(
        F.split(F.trim(F.col(text_col)), r"\s+"), lambda x: x != F.lit("")
    )
    d = (
        docs.withColumn("__h", _hash53(id_col, stream, seed))
        .withColumn("n_tokens", F.size(toks).cast("long"))
    )
    if salt_buckets <= 1:
        w = Window.partitionBy(source_col).orderBy("__h", id_col)
        return (
            d.withColumn("cum_tokens", F.sum("n_tokens").over(w))
            .where(F.col("cum_tokens") <= budget_tokens)
            .drop("__h")
        )
    span = M53 // salt_buckets + 1
    d = d.withColumn("__b", (F.col("__h") / span).cast("int"))
    wb = Window.partitionBy(source_col, "__b").orderBy("__h", id_col)
    d = d.withColumn("__cum_in_b", F.sum("n_tokens").over(wb))
    totals = d.groupBy(source_col, "__b").agg(
        F.sum("n_tokens").alias("__tot")
    )
    wt = (
        Window.partitionBy(source_col)
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.withColumn(
        "__off", F.coalesce(F.sum("__tot").over(wt), F.lit(0))
    ).select(source_col, "__b", "__off")
    return (
        d.join(F.broadcast(offsets), [source_col, "__b"])
        .withColumn("cum_tokens", F.col("__off") + F.col("__cum_in_b"))
        .where(F.col("cum_tokens") <= budget_tokens)
        .drop("__h", "__b", "__cum_in_b", "__off")
    )


def pack_sequences(
    docs: DataFrame,
    seq_len: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 42,
    stream: int = 9003,
    salt_buckets: int = 32,
) -> DataFrame:
    """GPT-style sequence packing plan: concatenate the corpus in a
    deterministic pseudo-random order (splitmix64 hash, then id) and cut
    the token stream into fixed ``seq_len`` windows. Returns one row per
    document with its place in the packed stream:

    (id, n_tokens, gstart, first_seq, last_seq) — the doc's tokens occupy
    global positions [gstart, gstart + n_tokens); sequence s covers
    [s * seq_len, (s+1) * seq_len), so a doc spans sequences
    first_seq..last_seq. Zero-token docs occupy no positions and are
    dropped.

    The global exclusive prefix sum uses the same range-bucket trick as
    ``sample_to_token_budget``, but corpus-wide: bucket by the hash high
    bits (buckets partition the (hash, id) order), window within each
    bucket, then broadcast the B bucket totals back as offsets — an exact
    global ordering with NO global sort and NO single-partition window.
    The actual tensor materialization (slice tokens, emit (seq_id, slot)
    rows) is a downstream explode keyed by this plan; the plan itself is
    the shuffle-bound part.
    """
    toks = F.filter(
        F.split(F.trim(F.col(text_col)), r"\s+"), lambda x: x != F.lit("")
    )
    d = (
        docs.withColumn("__h", _hash53(id_col, stream, seed))
        .withColumn("n_tokens", F.size(toks).cast("long"))
        .where(F.col("n_tokens") > 0)
    )
    span = M53 // salt_buckets + 1
    d = d.withColumn("__b", (F.col("__h") / span).cast("int"))
    wb = Window.partitionBy("__b").orderBy("__h", id_col)
    d = d.withColumn("__cum_in_b", F.sum("n_tokens").over(wb))
    totals = d.groupBy("__b").agg(F.sum("n_tokens").alias("__tot"))
    wt = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.withColumn(
        "__off", F.coalesce(F.sum("__tot").over(wt), F.lit(0))
    ).select("__b", "__off")
    gstart = (F.col("__off") + F.col("__cum_in_b") - F.col("n_tokens"))
    return (
        d.join(F.broadcast(offsets), "__b")
        .select(
            id_col,
            "n_tokens",
            gstart.alias("gstart"),
            F.floor(gstart / seq_len).cast("long").alias("first_seq"),
            F.floor((gstart + F.col("n_tokens") - 1) / seq_len)
            .cast("long").alias("last_seq"),
        )
    )
