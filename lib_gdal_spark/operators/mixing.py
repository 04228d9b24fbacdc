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

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
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


def chunk_documents(
    docs: DataFrame,
    chunk_size: int = 256,
    overlap: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Cut each document's whitespace token stream into fixed-size chunks
    with ``overlap`` tokens of context carried between consecutive chunks
    (the context-window preparation stage of a training/RAG pipeline).

    Chunk k starts at token ``k * (chunk_size - overlap)`` (1-based) and
    takes up to ``chunk_size`` tokens; the trailing chunk may be shorter
    and every token belongs to at least one chunk. Entirely JVM built-ins
    (split / sequence / slice / posexplode) — a narrow zero-shuffle map
    whose output is ~``1/(1-overlap/chunk_size)``x the corpus.

    Returns (id, chunk_idx, start_tok, n_chunk_tokens, chunk_text).
    """
    if not 0 <= overlap < chunk_size:
        raise ValueError(
            f"need 0 <= overlap < chunk_size, got {overlap}/{chunk_size}"
        )
    step = chunk_size - overlap
    toks = F.split(F.trim(F.col(text_col)), r"\s+", -1)
    n = F.size(toks)
    n_chunks = F.floor((n - 1) / F.lit(step)).cast("int") + 1
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda k: F.slice(toks, k * step + 1, F.lit(chunk_size)),
    )
    return (
        docs.where(F.length(F.trim(F.col(text_col))) > 0)
        .select(id_col, F.posexplode(chunks).alias("chunk_idx", "ck"))
        .select(
            id_col,
            "chunk_idx",
            (F.col("chunk_idx") * step + 1).alias("start_tok"),
            F.size("ck").alias("n_chunk_tokens"),
            F.array_join("ck", " ").alias("chunk_text"),
        )
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


def dsir_importance(
    docs: DataFrame,
    target: Column,
    n_buckets: int = 256,
    alpha: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every document by
    how much more likely its hashed n-gram bag is under the target-domain
    distribution than under the raw-corpus distribution.

    ``target`` is a boolean Column marking the in-domain examples (the
    small seed set the selection should imitate). Features are unigrams
    plus word bigrams, FNV-1a-hashed into ``n_buckets`` buckets (bag
    counts, not a set). Bucket distributions use add-``alpha`` smoothing;
    each bucket's log-ratio ln(p_target/p_raw) is quantized to int64
    micro-nats (two separately-quantized logs, subtracted), so a
    document's weight is an EXACT integer sum — order-free, engine-
    independent, reproducible (the same trick as ``ngram_lm_perplexity``).

    Returns one row per input document:
    (id, is_target, n_grams, log_weight, selected) where
    log_weight = sum over gram occurrences of the bucket log-ratio (nats,
    rounded to 6 dp) and selected = log_weight > 0 (doc looks more
    target-like than corpus-average). Empty documents get n_grams = 0 and
    NULL weight.

    Scale shape: one narrow mapInPandas emits per-(doc, bucket) counts
    (≤ n_buckets rows per doc — NOT one row per gram); the two bucket
    tables are map-side-combinable groupBys of n_buckets rows; scores
    broadcast back (n_buckets rows); the per-doc weight is one more
    combinable groupBy on the id. No driver collect, no gram-string
    shuffle, no skew key (buckets are hash-uniform).
    """
    from .dedup import fnv1a64_batch

    d = docs.select(
        F.col(id_col), F.col(text_col), target.alias("__t")
    )
    out_schema = f"{id_col} long, __t boolean, bucket int, cnt long"
    nb = np.uint64(n_buckets)

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            grams_all: list[str] = []
            counts = np.zeros(len(pdf), dtype=np.int64)
            for i, txt in enumerate(pdf[text_col]):
                toks = (txt or "").lower().split()
                grams = toks + [
                    toks[j] + " " + toks[j + 1]
                    for j in range(len(toks) - 1)
                ]
                grams_all.extend(grams)
                counts[i] = len(grams)
            if not grams_all:
                continue
            buckets = (fnv1a64_batch(grams_all) % nb).astype(np.int64)
            docix = np.repeat(np.arange(len(pdf)), counts)
            flat = np.bincount(
                docix * n_buckets + buckets,
                minlength=len(pdf) * n_buckets,
            ).reshape(len(pdf), n_buckets)
            dix, bix = np.nonzero(flat)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy()[dix],
                    "__t": pdf["__t"].to_numpy()[dix],
                    "bucket": bix.astype(np.int32),
                    "cnt": flat[dix, bix],
                }
            )

    fe = d.mapInPandas(feats, out_schema)
    cb = fe.groupBy("bucket").agg(
        F.sum("cnt").alias("cr"),
        F.sum(F.when(F.col("__t"), F.col("cnt")).otherwise(0)).alias("ct"),
    )
    tot = cb.agg(
        F.sum("cr").alias("__Tr"), F.sum("ct").alias("__Tt")
    )
    a, aB = float(alpha), float(alpha) * n_buckets

    def _qlog(num: Column, den: Column) -> Column:
        return F.round(F.log((num + a) / (den + aB)) * 1e6).cast("long")

    scores = cb.crossJoin(F.broadcast(tot)).select(
        "bucket",
        (_qlog(F.col("ct"), F.col("__Tt"))
         - _qlog(F.col("cr"), F.col("__Tr"))).alias("__q"),
    )
    w = (
        fe.join(F.broadcast(scores), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum(F.col("cnt") * F.col("__q")).alias("__w"),
            F.sum("cnt").alias("n_grams"),
        )
    )
    return (
        docs.select(F.col(id_col), target.alias("is_target"))
        .join(w, id_col, "left")
        .select(
            id_col,
            "is_target",
            F.coalesce(F.col("n_grams"), F.lit(0)).alias("n_grams"),
            F.round(F.col("__w") / 1e6, 6).alias("log_weight"),
            (F.col("__w") > 0).alias("selected"),
        )
    )


def cap_per_source(
    docs: DataFrame,
    cap: int,
    id_col: str = "doc_id",
    source_col: str = "source",
    seed: int = 42,
    stream: int = 9004,
    salt_buckets: int = 1,
) -> DataFrame:
    """RefinedWeb-style per-source document cap: keep at most ``cap``
    documents per source, selected in deterministic splitmix64 hash order
    — a uniform without-replacement sample per source that reproduces
    bit-identically at any parallelism (the anti-overfitting "no domain
    dominates the mix" rule). Output adds ``rank`` (1-based position in
    the source's hash order).

    ``salt_buckets=1`` ranks with one window per source; for web-scale
    sources pass ``salt_buckets=B`` to range-bucket the hash order and
    rank per (source, bucket) with broadcast prefix-count offsets — the
    same exact-global-order trick as :func:`sample_to_token_budget`, no
    single-partition window over a giant source.
    """
    d = docs.withColumn("__h", _hash53(id_col, stream, seed))
    if salt_buckets <= 1:
        w = Window.partitionBy(source_col).orderBy("__h", id_col)
        return (
            d.withColumn("rank", F.row_number().over(w).cast("long"))
            .where(F.col("rank") <= cap)
            .drop("__h")
        )
    span = M53 // salt_buckets + 1
    d = d.withColumn("__b", (F.col("__h") / span).cast("int"))
    wb = Window.partitionBy(source_col, "__b").orderBy("__h", id_col)
    d = d.withColumn("__rn_b", F.row_number().over(wb).cast("long"))
    totals = d.groupBy(source_col, "__b").agg(
        F.count(F.lit(1)).alias("__cnt")
    )
    wt = (
        Window.partitionBy(source_col)
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.withColumn(
        "__off", F.coalesce(F.sum("__cnt").over(wt), F.lit(0))
    ).select(source_col, "__b", "__off")
    return (
        d.join(F.broadcast(offsets), [source_col, "__b"])
        .withColumn("rank", F.col("__off") + F.col("__rn_b"))
        .where(F.col("rank") <= cap)
        .drop("__h", "__b", "__rn_b", "__off")
    )


def sample_temperature(
    docs: DataFrame,
    alpha: float = 0.3,
    target_frac: float = 0.5,
    id_col: str = "doc_id",
    source_col: str = "source",
    seed: int = 42,
    stream: int = 9005,
) -> DataFrame:
    """Temperature-weighted source mixing — the multilingual-LM sampling
    standard (mBERT/XLM-R/mT5: draw sources with p_s proportional to
    c_s^alpha, alpha < 1 up-weighting low-resource sources). The target
    corpus size is ``target_frac`` of the input; per-source keep rates

        rate_s = min(1, target_frac * N * (c_s^alpha / sum c^alpha) / c_s)

    are computed from exact source counts (one combinable groupBy; the
    count table is tiny — #sources rows — and collected; the power sum
    folds in SORTED source order so the double arithmetic is
    reproducible), then applied with :func:`sample_sources`'s
    integer-threshold Bernoulli draw — bit-exact keep decisions at any
    parallelism. Output keeps the surviving rows plus their
    ``keep_rate``.
    """
    n_src = docs.select(source_col).distinct().count()
    if n_src > 10_000:
        raise ValueError(
            f"sample_temperature: {n_src} distinct sources — the rate "
            f"table is driver-collected and meant for mixing DOMAINS "
            f"(languages/corpora), not per-host keys; pre-aggregate "
            f"sources (e.g. registrable domain -> corpus bucket) first"
        )
    sizes = {
        r[source_col]: r["c"]
        for r in docs.groupBy(source_col)
        .agg(F.count(F.lit(1)).alias("c")).collect()
    }
    pows = {s: float(c) ** alpha for s, c in sizes.items()}
    tot = 0.0
    for s in sorted(pows):
        tot = tot + pows[s]
    n_total = sum(sizes.values())
    rates = {
        s: min(1.0, target_frac * n_total * (pows[s] / tot) / sizes[s])
        for s in sizes
    }
    kept = sample_sources(docs, rates, default_rate=0.0, id_col=id_col,
                          source_col=source_col, seed=seed, stream=stream)
    rate_col = F.lit(0.0)
    for s, r in sorted(rates.items()):
        rate_col = F.when(F.col(source_col) == s, F.lit(r)) \
            .otherwise(rate_col)
    return kept.withColumn("keep_rate", rate_col)


def priority_sample(
    docs: DataFrame,
    k: int,
    weight_col: Column | str,
    group_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 42,
    stream: int = 7331,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, k rows per group, via
    priority sampling (Duffield, Lund & Thorup, JACM 2007): each row
    draws u_i in (0, 1] and gets priority p_i = w_i / u_i; the k highest
    priorities per group are the sample. Inclusion probability is
    proportional-to-weight in expectation, and the scheme is the
    published variance-optimal one for subset-sum estimation.

    Determinism contract (cross-engine oracle-able, unlike the classic
    Efraimidis-Spirakis u^(1/w) key, whose pow/log differ across libms):
    u_i = (hash53(id) + 1) / 2^53 is an EXACT double (numerator <= 2^53,
    power-of-two denominator), and p_i = w_i / u_i is ONE correctly-
    rounded IEEE division — bit-identical in the JVM and DuckDB. Ties
    break on id.

    Scale shape: the hash is a narrow Arrow map; per-group top-k is one
    rank window keyed by ``group_col`` (keys-only shuffle). A group's
    rows land on one task — same contract as every per-source mixer
    here; salt-and-merge if one source dominates the corpus.
    """
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    h = _hash53(id_col, stream, seed)
    u = (h + F.lit(1).cast("long")).cast("double") / F.lit(float(M53))
    p = w.cast("double") / u
    win = Window.partitionBy(group_col).orderBy(
        F.col("__p").desc(), F.col(id_col))
    return (
        docs.withColumn("__p", p)
        .withColumn("__rk", F.row_number().over(win))
        .where(F.col("__rk") <= k)
        .select(
            F.col(id_col), F.col(group_col),
            w.cast("double").alias("weight"),
            F.round(F.col("__p"), 6).alias("priority"),
            F.col("__rk").alias("rk"),
        )
    )


def _hash53_str(col: str, stream: int, seed: int) -> Column:
    """53-bit draw for STRING keys: splitmix64(fnv1a64(key)) >> 11 —
    the same FNV+finalizer composition as sketch.kmv_hash_batch, so the
    DuckDB oracle spells it as _mix_sql over _FNV."""
    from lib_gdal_spark.operators.dedup import fnv1a64_batch

    @F.pandas_udf("long")
    def h(keys: pd.Series) -> pd.Series:
        hv = fnv1a64_batch(keys.fillna("").astype(str).tolist())
        m = _mix(hv, stream, seed)
        return pd.Series((m >> np.uint64(11)).astype(np.int64))

    return h(F.col(col))


def split_by_group(
    docs: DataFrame,
    weights: dict[str, float],
    group_col: str = "source",
    seed: int = 42,
    stream: int = 4242,
) -> DataFrame:
    """Leakage-safe train/val/test assignment: the split is a pure
    function of the GROUP key (source, registered domain, …), so every
    document of a group lands in the same split — the standard guard
    against near-duplicate leakage across splits (pages of one host are
    correlated; splitting by row would leak them between train and
    eval). Adds a ``split`` column.

    Deterministic integer-threshold form: draw = splitmix64(fnv1a64(
    group)) >> 11 in [0, 2^53); split s_i covers draws in
    [floor(c_{i-1} * 2^53), floor(c_i * 2^53)) with c_i the cumulative
    weights in the INSERTION order of ``weights`` (dict order is the
    contract — name your splits in priority order). Weights must sum to
    1 (exactly, after float addition — use dyadic fractions like
    0.8/0.15/0.05 if bit-certainty matters).

    Scale shape: one narrow Arrow map adds the draw; no shuffle at all —
    the assignment is embarrassingly parallel and reproducible across
    reruns, clusters, and engines (no sampleBy nondeterminism).
    """
    if not weights:
        raise ValueError("weights must name at least one split")
    tot = sum(weights.values())
    if abs(tot - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {tot}")
    draw = _hash53_str(group_col, stream, seed)
    cum = 0.0
    bounds: list[tuple[str, int]] = []
    for name, w in weights.items():
        cum += w
        bounds.append((name, int(cum * M53)))
    bounds[-1] = (bounds[-1][0], M53)  # close the last interval exactly
    # nested whens, lowest threshold innermost: first matching interval wins
    out = F.lit(bounds[-1][0])
    for name, hi in reversed(bounds[:-1]):
        out = F.when(draw < hi, F.lit(name)).otherwise(out)
    return docs.withColumn("split", out)


def split_report(
    docs: DataFrame,
    weights: dict[str, float],
    group_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 42,
    stream: int = 4242,
) -> DataFrame:
    """Split assignment + the audit a pipeline actually reviews: one row
    per split with document count, group count, and char volume. Group
    counts across splits sum to the total distinct groups by
    construction (a group maps to exactly one split) — the no-leakage
    invariant made visible."""
    s = split_by_group(docs, weights, group_col, seed, stream)
    return (
        s.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct(group_col).alias("n_groups"),
            F.sum(F.length("text")).alias("n_chars"),
        )
        .orderBy("split")
    )


def k_anonymity(df: DataFrame, quasi_cols: list, sensitive_col: str,
                k: int = 5, l: int = 2) -> DataFrame:
    """k-anonymity / l-diversity audit (Sweeney, IJUFKS 2002;
    Machanavajjhala et al., ICDE 2006) — the release-gate check before
    publishing user-derived training data: every quasi-identifier
    equivalence class must contain >= k rows (k-anonymity) and >= l
    distinct sensitive values (l-diversity).

    One combinable groupBy over the quasi columns + exact int64
    counts; the report is corpus-level (one row): class counts,
    violating classes, rows at risk, the minimum class size and
    minimum diversity, and the pass flags. Engine-exact. Returns
    (n_rows, n_classes, k_violations, rows_at_risk_k, min_class,
    l_violations, rows_at_risk_l, min_diversity, k_anonymous,
    l_diverse)."""
    g = df.groupBy(*[F.col(c) for c in quasi_cols]).agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct(sensitive_col).alias("div"))
    return g.agg(
        F.sum("n").alias("n_rows"),
        F.count(F.lit(1)).alias("n_classes"),
        F.sum((F.col("n") < k).cast("long")).alias("k_violations"),
        F.sum(F.when(F.col("n") < k, F.col("n")).otherwise(0))
        .alias("rows_at_risk_k"),
        F.min("n").alias("min_class"),
        F.sum((F.col("div") < l).cast("long")).alias("l_violations"),
        F.sum(F.when(F.col("div") < l, F.col("n")).otherwise(0))
        .alias("rows_at_risk_l"),
        F.min("div").alias("min_diversity"),
    ).select(
        "n_rows", "n_classes", "k_violations", "rows_at_risk_k",
        "min_class", "l_violations", "rows_at_risk_l", "min_diversity",
        (F.col("k_violations") == 0).alias("k_anonymous"),
        (F.col("l_violations") == 0).alias("l_diverse"))
