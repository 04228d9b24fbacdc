"""Text analysis operators (language ID, quality, tokens, fingerprints).

All built-in-function compositions (JVM-side, codegen-friendly); only the
n-gram language heuristic uses a pandas UDF (one matmul per Arrow batch).
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = r"\s+"

# Tiny deterministic stopword-profile language model: characteristic words
# per language (public-knowledge heuristic; good enough for synthetic data).
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "ist", "nicht"],
    "fr": ["le", "la", "et", "est", "les"],
    "es": ["el", "la", "que", "de", "los"],
    "ru": ["и", "в", "не", "на", "что"],
    "zh": ["的", "是", "了", "在", "我"],
}


def with_token_count(docs: DataFrame, text_col: str = "text",
                     out_col: str = "n_tokens") -> DataFrame:
    """Whitespace token count, empty-safe, JVM-side only."""
    toks = F.filter(
        F.split(F.col(text_col), TOKEN_SPLIT_RE), lambda x: x != F.lit("")
    )
    return docs.withColumn(out_col, F.size(toks))


# GPT-2-style pre-tokenizer, simplified to constructs shared by Java
# regex and RE2 (no lookahead; ASCII classes — the corpus is ASCII):
# contractions, space-prefixed letter runs, digit runs, punct runs, spaces.
BPE_TOKEN_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"


def with_token_count_bpe(docs: DataFrame, text_col: str = "text",
                         out_col: str = "n_bpe_tokens") -> DataFrame:
    """BPE-ish token count (the LLM-pipeline estimate): the GPT-2 split
    pattern applied via regexp_extract_all, whitespace runs excluded —
    JVM-side only."""
    toks = F.regexp_extract_all(F.col(text_col), F.lit(BPE_TOKEN_RE), 0)
    non_ws = F.filter(toks, lambda t: F.trim(t) != F.lit(""))
    return docs.withColumn(out_col, F.size(non_ws))


STOPWORDS = (
    "the a an and or of to in for on with at by is are was be this that "
    "it as from".split()
)


def with_quality(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / digit / space / STOPWORD ratios + a 0..1
    quality score.

    All ratios are built-ins over the string column (the stopword ratio is
    a filter over the whitespace token array — JVM higher-order, no
    Python); the score is a fixed linear blend (deterministic, documented
    here so the oracle can mirror it).
    """
    length = F.length(F.col(text_col)).cast("double")
    safe_len = F.greatest(length, F.lit(1.0))
    n_punct = length - F.length(F.regexp_replace(F.col(text_col), r"[^\w\s]", ""))
    n_digit = length - F.length(F.regexp_replace(F.col(text_col), r"[0-9]", ""))
    n_space = length - F.length(F.regexp_replace(F.col(text_col), r"\s", ""))
    punct_ratio = n_punct / safe_len
    digit_ratio = n_digit / safe_len
    space_ratio = n_space / safe_len
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    n_toks = F.greatest(F.size(toks).cast("double"), F.lit(1.0))
    n_stop = F.size(
        F.filter(toks, lambda t: t.isin(*STOPWORDS))
    ).cast("double")
    stopword_ratio = n_stop / n_toks
    score = (
        F.least(length / F.lit(500.0), F.lit(1.0)) * 0.4
        + (F.lit(1.0) - F.least(punct_ratio * 4.0, F.lit(1.0))) * 0.3
        + (F.lit(1.0) - F.least(digit_ratio * 4.0, F.lit(1.0))) * 0.3
    )
    return (
        docs.withColumn("text_len", length.cast("long"))
        .withColumn("punct_ratio", F.round(punct_ratio, 6))
        .withColumn("digit_ratio", F.round(digit_ratio, 6))
        .withColumn("space_ratio", F.round(space_ratio, 6))
        .withColumn("stopword_ratio", F.round(stopword_ratio, 6))
        .withColumn("quality_score", F.round(score, 6))
    )


def with_fingerprint(docs: DataFrame, text_col: str = "text",
                     out_col: str = "fingerprint") -> DataFrame:
    """Document fingerprint: xxhash64 of normalized text (lower, collapsed
    whitespace) — a rolling-hash-style identity for shard-local dedup."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return docs.withColumn(out_col, F.xxhash64(norm))


def c4_clean(
    docs: DataFrame,
    blocklist: tuple[str, ...] = (),
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words_per_line: int = 5,
    min_kept_lines: int = 3,
) -> DataFrame:
    """C4 cleaning heuristics (Raffel et al. 2020, "Exploring the Limits
    of Transfer Learning" §2.2 — the C4 corpus construction rules).

    Line rules — a line survives iff it (a) ends in a terminal
    punctuation mark (``. ! ? "``), (b) has at least
    ``min_words_per_line`` words, and (c) does not contain the word
    "javascript". Page rules — a page is kept iff it retains at least
    ``min_kept_lines`` lines, contains no ``{``, no "lorem ipsum"
    (case-insensitive), and no word from ``blocklist``.

    Everything is JVM built-ins (split / filter / rlike) in one narrow
    zero-shuffle projection — at 100 TB this is a pure map stage.
    Returns (id, n_lines, n_kept, kept, clean_text); ``kept`` is int
    0/1 and dropped pages still emit their row (filter on ``kept``
    downstream), so row counts are stable for auditing.
    """
    lines = F.split(F.col(text_col), "\n", -1)
    good = F.filter(
        lines,
        lambda l: F.trim(l).rlike('[.!?"]$')
        & (F.size(F.split(F.trim(l), r"\s+", -1)) >= min_words_per_line)
        & ~F.lower(l).contains("javascript"),
    )
    kept = (
        (F.size(good) >= min_kept_lines)
        & ~F.col(text_col).contains("{")
        & ~F.lower(F.col(text_col)).contains("lorem ipsum")
    )
    if blocklist:
        toks = F.split(F.lower(F.col(text_col)), "[^a-z0-9]+", -1)
        kept = kept & ~F.arrays_overlap(
            toks, F.array(*[F.lit(wd) for wd in blocklist])
        )
    return docs.select(
        id_col,
        F.size(lines).alias("n_lines"),
        F.size(good).alias("n_kept"),
        kept.cast("int").alias("kept"),
        F.array_join(good, "\n").alias("clean_text"),
    )


def bm25_scores(
    docs: DataFrame,
    query_terms: tuple[str, ...],
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Okapi BM25 scores (Robertson et al., TREC-3 1994) of every document
    against a fixed bag of query terms.

    Corpus statistics (N, avgdl, per-term document frequency) are
    computed distributed; the per-doc score is assembled by pivoting the
    per-term contributions into FIXED columns and adding them in query
    order, so the floating-point sum is deterministic at any parallelism
    (a groupBy(sum) of doubles is not). idf = ln(1 + (N - df + .5)/(df + .5))
    (the non-negative "plus one" variant, as in Lucene).

    Scale shape: one narrow explode filtered to the broadcast term set,
    one map-side-combinable (doc, term) count, a <=|terms|-row broadcast
    df join, one groupBy(doc) pivot — the corpus streams exactly once.
    Returns (id, n_matched, score) for docs matching >= 1 term, score
    rounded to 6 dp.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = [t.lower() for t in query_terms]
    term_arr = F.array(*[F.lit(t) for t in terms])

    toks = docs.select(
        F.col(id_col),
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+", -1).alias("toks"),
    ).select(
        id_col, F.size("toks").alias("dl"),
        F.explode(F.array_intersect("toks", term_arr)).alias("term"),
        # array_intersect dedups, so a second pass counts raw tf
        F.col("toks"),
    ).select(
        id_col, "dl", "term",
        F.size(F.filter("toks", lambda x: x == F.col("term"))).alias("tf"),
    )

    stats = docs.select(
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+", -1).alias("toks")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size("toks")).alias("sum_dl"),
    )
    dfreq = toks.groupBy("term").agg(
        F.countDistinct(id_col).alias("df_term")
    )

    contrib = (
        toks.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            id_col, "term",
            (
                F.log(
                    F.lit(1.0)
                    + (F.col("n_docs") - F.col("df_term") + F.lit(0.5))
                    / (F.col("df_term") + F.lit(0.5))
                )
                * (F.col("tf") * F.lit(k1 + 1.0))
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (
                        F.lit(1.0 - b)
                        + F.lit(b) * F.col("dl")
                        / (F.col("sum_dl").cast("double") / F.col("n_docs"))
                    )
                )
            ).alias("c"),
        )
    )
    per_term = [
        F.coalesce(
            F.max(F.when(F.col("term") == t, F.col("c"))), F.lit(0.0)
        ).alias(f"c{i}")
        for i, t in enumerate(terms)
    ]
    agg = contrib.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_matched"), *per_term
    )
    score = F.col("c0")
    for i in range(1, len(terms)):
        score = score + F.col(f"c{i}")
    return agg.select(
        id_col, "n_matched", F.round(score, 6).alias("score")
    )


_WINNOW_BASE = 257


def winnow_fingerprints(
    docs: DataFrame,
    k: int = 5,
    w: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Winnowing fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD 2003 —
    the MOSS local document-fingerprinting algorithm).

    Text is normalized to ``[a-z0-9]`` (lowercase, everything else
    dropped), hashed as character ``k``-grams with an exact small-base
    polynomial (base 257, fits int64 — no modular wrap, so both engines
    agree bit-for-bit), then each window of ``w`` consecutive gram hashes
    selects its minimum, rightmost on ties (the paper's rule; guarantees
    any shared substring of length >= k + w - 1 shares a fingerprint).

    The whole algorithm is per-document local: ONE zero-shuffle
    mapInPandas pass, no joins — winnowing density is 2/(w+1) regardless
    of corpus size, so this scales linearly to any corpus. Docs with
    fewer than ``k`` normalized chars yield no rows; docs with fewer than
    ``w`` gram windows use one window over all grams.

    Returns (id, pos, fingerprint) where pos is the 1-based offset of the
    selected k-gram in the normalized text.
    """
    if k < 1 or w < 1:
        raise ValueError(f"need k >= 1 and w >= 1, got k={k} w={w}")
    weights = np.array(
        [_WINNOW_BASE ** (k - 1 - j) for j in range(k)], dtype=np.int64
    )

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import re

        drop = re.compile(r"[^a-z0-9]")
        for batch in batches:
            ids: list[int] = []
            poss: list[np.ndarray] = []
            vals: list[np.ndarray] = []
            for did, t in zip(batch[id_col], batch[text_col]):
                norm = drop.sub("", t.lower())
                codes = np.frombuffer(norm.encode("ascii", "ignore"),
                                      dtype=np.uint8).astype(np.int64)
                if len(codes) < k:
                    continue
                h = np.convolve(codes, weights[::-1], mode="valid")
                ws = min(w, len(h))
                win = np.lib.stride_tricks.sliding_window_view(h, ws)
                # rightmost-min: argmin over the flipped window axis
                j = np.argmin(win[:, ::-1], axis=1)
                pos = np.arange(len(win), dtype=np.int64) + (ws - 1 - j)
                sel = np.unique(pos)
                ids.extend([did] * len(sel))
                poss.append(sel + 1)
                vals.append(h[sel])
            yield pd.DataFrame({
                id_col: pd.Series(ids, dtype="int64"),
                "pos": np.concatenate(poss) if poss
                else np.empty(0, np.int64),
                "fingerprint": np.concatenate(vals) if vals
                else np.empty(0, np.int64),
            })

    return docs.select(id_col, text_col).mapInPandas(
        work, schema=f"{id_col} long, pos long, fingerprint long"
    )


def with_lang_id(docs: DataFrame, text_col: str = "text",
                 out_col: str = "lang_pred") -> DataFrame:
    """Marker-word language scoring in a pandas UDF (one pass per batch)."""
    langs = list(_LANG_MARKERS)

    @F.pandas_udf("string")
    def lang_udf(texts: pd.Series) -> pd.Series:
        low = texts.str.lower()
        scores = np.zeros((len(texts), len(langs)), dtype=np.int64)
        for j, lg in enumerate(langs):
            for w in _LANG_MARKERS[lg]:
                scores[:, j] += low.str.count(rf"(?<!\w){w}(?!\w)").to_numpy(
                    dtype=np.int64, na_value=0
                )
        best = scores.argmax(axis=1)
        none = scores.max(axis=1) == 0
        out = pd.Series(np.array(langs, dtype=object)[best])
        out[none] = "und"
        return out

    return docs.withColumn(out_col, lang_udf(F.col(text_col)))


def with_repetition(docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021 §A1.1), pure JVM:

    - ``dup_word_frac``: 1 − distinct/total tokens (array functions);
    - ``top_bigram_frac``: occurrences of the most frequent bigram over
      total bigrams;
    - ``dup_trigram_frac``: fraction of trigram occurrences whose trigram
      appears more than once.

    The bigram/trigram counts run as explode + map-side-combinable
    groupBys keyed by (doc, gram) — O(corpus tokens) shuffle of small
    keys, the same scale shape as the shingle dedup path.
    """
    toks = docs.select(
        id_col, F.split(F.col(text_col), " +").alias("t")
    ).withColumn("n_tok", F.size("t"))
    # Grams via slice + zip_with, NOT transform-with-element_at: a lambda
    # that references the outer array column re-evaluates the split() per
    # ELEMENT (O(n^2) per row — measured 11 s on 270k tokens vs ~1 s for
    # the slice form). zip_with walks aligned slices once.
    t = F.col("t")
    n = F.size("t")
    bigram = F.when(
        n >= 2,
        F.zip_with(F.slice(t, 1, n - 1), F.slice(t, 2, n - 1),
                   lambda a, b: F.concat_ws(" ", a, b)),
    ).otherwise(F.array())
    trigram = F.when(
        n >= 3,
        F.zip_with(
            F.zip_with(F.slice(t, 1, n - 2), F.slice(t, 2, n - 2),
                       lambda a, b: F.concat_ws(" ", a, b)),
            F.slice(t, 3, n - 2),
            lambda ab, c: F.concat_ws(" ", ab, c),
        ),
    ).otherwise(F.array())
    base = toks.select(
        id_col, "n_tok",
        (1.0 - F.size(F.array_distinct("t"))
         / F.greatest(F.col("n_tok"), F.lit(1))).alias("dup_word_frac"),
        bigram.alias("bigrams"),
        trigram.alias("trigrams"),
    )
    bg = (
        base.select(id_col, F.explode("bigrams").alias("g"))
        .groupBy(id_col, "g").agg(F.count(F.lit(1)).alias("c"))
        .groupBy(id_col).agg(
            (F.max("c") / F.sum("c")).alias("top_bigram_frac"))
    )
    tg = (
        base.select(id_col, F.explode("trigrams").alias("g"))
        .groupBy(id_col, "g").agg(F.count(F.lit(1)).alias("c"))
        .groupBy(id_col).agg(
            (F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0))
             / F.sum("c")).alias("dup_trigram_frac"))
    )
    return (
        base.select(id_col, "dup_word_frac")
        .join(bg, id_col, "left").join(tg, id_col, "left")
        .fillna(0.0, ["top_bigram_frac", "dup_trigram_frac"])
    )


def canonical_url(col: Column) -> Column:
    """Canonical URL for dedup keys, pure JVM (the standard CC-pipeline
    normalization): lowercase scheme+host, strip a leading 'www.', drop
    the fragment, drop utm_*/fbclid/gclid tracking params, collapse a
    trailing '/', default-port removal. Returns a string column."""
    u = F.trim(col)
    # split off fragment
    u = F.regexp_replace(u, r"#.*$", "")
    # scheme + host lowercased; keep path/query case
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    host = F.lower(F.regexp_extract(rest, r"^([^/?]*)", 1))
    host = F.regexp_replace(host, r"^www\.", "")
    host = F.regexp_replace(host, r":(80|443)$", "")
    tail = F.regexp_replace(rest, r"^[^/?]*", "")
    # strip tracking params (handles first/middle/last positions)
    tail = F.regexp_replace(
        tail, r"([?&])(utm_[A-Za-z]+|fbclid|gclid)=[^&#]*", "$1")
    tail = F.regexp_replace(tail, r"[?&]+$", "")
    tail = F.regexp_replace(tail, r"\?&", "?")
    tail = F.regexp_replace(tail, r"&&+", "&")
    # collapse trailing slash on a bare path
    tail = F.when(tail == "/", F.lit("")).otherwise(tail)
    return F.when(
        scheme == "", u  # not a URL; pass through untouched
    ).otherwise(F.concat(scheme, F.lit("://"), host, tail))


def dedup_by_canonical_url(pages: DataFrame,
                           url_col: str = "url") -> DataFrame:
    """First page per canonical URL wins (storage order via warc_ts then
    raw url — deterministic), the URL-level exact-dedup stage every CC
    pipeline runs before content dedup."""
    key = canonical_url(F.col(url_col)).alias("__canon")
    w = Window.partitionBy("__canon").orderBy("warc_ts", url_col)
    return (
        pages.withColumn("__canon", key)
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_decimals: int = 6,
) -> DataFrame:
    """Top-k terms per document by smoothed TF-IDF (the classic keyword /
    relevance primitive of every text pipeline).

    tf = term count within the doc; idf = ln((N + 1) / (df + 1)) + 1
    (sklearn's smooth_idf); score = tf * idf rounded to ``round_decimals``
    BEFORE ranking so accumulation order can't flip ranks; ties break on
    the term string ascending.

    Scale: one explode to (doc, term) counts (map-side combinable), a
    keys-only doc-frequency aggregate joined back broadcast-style (the
    vocabulary is tiny next to the corpus), and a per-doc window top-k —
    all JVM built-ins, no Python anywhere.
    """
    toks = F.filter(
        F.split(F.trim(F.lower(F.col(text_col))), TOKEN_SPLIT_RE),
        lambda x: x != F.lit(""),
    )
    n_docs = docs.count()
    tf = (
        docs.select(id_col, F.explode(toks).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    idf = F.log(F.lit(float(n_docs + 1)) / (F.col("df") + 1.0)) + 1.0
    scored = tf.join(F.broadcast(df_), "term").select(
        id_col,
        "term",
        F.round(F.col("tf") * idf, round_decimals).alias("tfidf"),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(id_col, "term", "rank", "tfidf")
    )


# PII patterns restricted to the regex subset shared by Java regex and
# RE2 (no lookaround): email, IPv4, international-ish phone, US SSN,
# 16-digit card numbers (with optional group separators).
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
    ("card", r"\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b"),
    ("phone", r"\+\d{1,2}[- ]\d{3}[- ]\d{3}[- ]\d{4}\b"),
]


def redact_pii(
    docs: DataFrame,
    text_col: str = "text",
    out_col: str = "redacted",
) -> DataFrame:
    """Redact common PII (email / IPv4 / card / SSN / phone) with typed
    placeholder tokens, and count matches per category — the standard
    pre-training scrub stage (e.g. BigCode/The-Stack PII pipeline shape).

    Counts are computed on the ORIGINAL text per category (so overlapping
    categories each see the raw string); redaction applies sequentially
    in PII_PATTERNS order. Pure
    JVM ``regexp_replace`` / ``regexp_extract_all`` — codegen-friendly,
    zero Python.
    """
    out = docs
    red = F.col(text_col)
    for name, pat in PII_PATTERNS:
        out = out.withColumn(
            f"n_{name}",
            F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), 0)),
        )
        red = F.regexp_replace(red, pat, f"<{name.upper()}>")
    return out.withColumn(out_col, red)


def ngram_lm_perplexity(
    docs: DataFrame,
    k: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_decimals: int = 6,
) -> DataFrame:
    """CCNet-style LM quality scoring: train an add-k-smoothed bigram LM
    on the corpus ITSELF, then score every document by per-bigram
    cross-entropy (high = atypical/garbled text; the classic
    "perplexity filter" of Wenzek et al. 2020, with the corpus standing
    in for the external KenLM).

    P(w2 | w1) = (C(w1 w2) + k) / (C(w1) + k * V), V = corpus vocabulary.
    Each log-prob is quantized to int64 micro-nats (round(ln * 1e6)) and
    SUMMED IN INTEGERS, so the per-doc entropy is independent of
    aggregation order — the same determinism contract as the k-means
    operator. Docs with < 2 tokens get NULL entropy (row count preserved).

    Output: (id, n_bigrams, cross_entropy, ppl).

    Scale: two count aggregations (map-side combinable, keys only), then
    one equi-join of the corpus bigram stream against the count tables —
    co-partitioned on the gram key, AQE broadcasts them when small. No
    Python anywhere.
    """
    toks = F.filter(
        F.split(F.trim(F.lower(F.col(text_col))), TOKEN_SPLIT_RE),
        lambda x: x != F.lit(""),
    )
    base = docs.select(F.col(id_col).alias("id"), toks.alias("__t"))
    bigrams = base.select(
        "id",
        F.explode(
            F.when(
                F.size("__t") >= 2,
                F.transform(
                    F.sequence(F.lit(0), F.size("__t") - 2),
                    lambda i: F.struct(
                        F.element_at("__t", i + 1).alias("w1"),
                        F.element_at("__t", i + 2).alias("w2"),
                    ),
                ),
            ).otherwise(F.array().cast(
                "array<struct<w1:string,w2:string>>")),
        ).alias("g"),
    ).select("id", "g.w1", "g.w2")
    c2 = bigrams.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    c1 = (
        base.select(F.explode("__t").alias("w1"))
        .groupBy("w1")
        .agg(F.count("*").alias("c1"))
    )
    v = c1.count()  # vocabulary size (exact integer, both engines)
    logp = F.log(
        (F.col("c2") + F.lit(float(k)))
        / (F.col("c1") + F.lit(float(k * v)))
    )
    q = F.round(logp * 1e6).cast("long")  # micro-nats, exact int64 sum
    scored = (
        bigrams.join(c2, ["w1", "w2"])
        .join(c1, "w1")
        .groupBy("id")
        .agg(F.sum(q).alias("__s"), F.count("*").alias("n_bigrams"))
    )
    ent = F.round(-F.col("__s") / (F.col("n_bigrams") * 1e6),
                  round_decimals)
    return (
        base.select("id").join(scored, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            ent.alias("cross_entropy"),
            F.round(F.exp(ent), round_decimals).alias("ppl"),
        )
    )


def nb_classifier(
    docs: DataFrame,
    label: Column,
    n_buckets: int = 256,
    alpha: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """fastText-style supervised quality classifier as multinomial Naive
    Bayes over hashed n-gram bags — the "train a tiny classifier on a
    labeled seed set, score the whole crawl" step of CCNet/LLaMA-class
    pipelines. ``label`` is a nullable boolean Column: TRUE/FALSE rows
    are the training set; NULL rows are unlabeled and only scored.

    Features are unigrams + word bigrams FNV-1a-hashed into ``n_buckets``
    bag buckets (fastText's hashing trick). Per-class bucket likelihoods
    use add-``alpha`` smoothing; each bucket's ln(p|pos) - ln(p|neg) and
    the class prior ln(Npos+1) - ln(Nneg+1) are quantized to int64
    micro-nats, so every document's log-odds is an EXACT integer sum
    (same determinism trick as ``dsir_importance``, which this extends
    with a prior and a labeled/unlabeled split).

    Returns (id, label, n_grams, log_odds, pred_pos) for EVERY input doc;
    empty docs score the bare prior.

    Scale shape: identical to DSIR — one narrow mapInPandas emitting
    <= n_buckets rows per doc, two tiny combinable groupBys for the
    model (n_buckets rows, broadcast back), one combinable groupBy per
    doc for the score. The model "training" never leaves the cluster.
    """
    from .dedup import fnv1a64_batch

    d = docs.select(F.col(id_col), F.col(text_col), label.alias("__y"))
    out_schema = f"{id_col} long, __y boolean, bucket int, cnt long"
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
                    "__y": pdf["__y"].to_numpy()[dix],
                    "bucket": bix.astype(np.int32),
                    "cnt": flat[dix, bix],
                }
            )

    fe = d.mapInPandas(feats, out_schema)
    lab = fe.where(F.col("__y").isNotNull())
    cb = lab.groupBy("bucket").agg(
        F.sum(F.when(F.col("__y"), F.col("cnt")).otherwise(0)).alias("cp"),
        F.sum(F.when(~F.col("__y"), F.col("cnt")).otherwise(0)).alias("cn"),
    )
    tot = cb.agg(F.sum("cp").alias("__Tp"), F.sum("cn").alias("__Tn"))
    a, aB = float(alpha), float(alpha) * n_buckets

    def _qlog(num: Column, den: Column) -> Column:
        return F.round(F.log((num + a) / (den + aB)) * 1e6).cast("long")

    scores = cb.crossJoin(F.broadcast(tot)).select(
        "bucket",
        (_qlog(F.col("cp"), F.col("__Tp"))
         - _qlog(F.col("cn"), F.col("__Tn"))).alias("__q"),
    )
    npos = F.sum(F.when(label, 1).otherwise(0))
    nneg = F.sum(F.when(~label, 1).otherwise(0))
    prior = docs.agg(
        (F.round(F.log(npos + 1) * 1e6).cast("long")
         - F.round(F.log(nneg + 1) * 1e6).cast("long")).alias("__prior")
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
        docs.select(F.col(id_col), label.alias("label"))
        .join(w, id_col, "left")
        .crossJoin(F.broadcast(prior))
        .select(
            id_col,
            "label",
            F.coalesce(F.col("n_grams"), F.lit(0)).alias("n_grams"),
            F.round(
                (F.coalesce(F.col("__w"), F.lit(0)) + F.col("__prior"))
                / 1e6, 6
            ).alias("log_odds"),
            ((F.coalesce(F.col("__w"), F.lit(0)) + F.col("__prior")) > 0
             ).alias("pred_pos"),
        )
    )


# ---------------------------------------------------------------------------
# Unicode normalization + encoding repair (the "fix the text" stage every
# web-crawl pipeline runs before dedup/quality — cf. ftfy / CCNet cleanup)
# ---------------------------------------------------------------------------

def normalize_unicode(docs: DataFrame, text_col: str = "text",
                      form: str = "NFC",
                      out_col: str = "text_norm") -> DataFrame:
    """Unicode-normalize a text column (NFC/NFKC/NFD/NFKD).

    Spark has no normalization builtin, so this is the one deliberate
    Pandas-UDF stage of the cleanup path: Arrow batches in, one
    ``unicodedata.normalize`` call per value, no per-row Python overhead
    beyond the string op itself. Normalization is embarrassingly parallel —
    a narrow map, no shuffle, scales linearly with the corpus.
    """
    import unicodedata

    @F.pandas_udf("string")
    def norm(s: pd.Series) -> pd.Series:
        return s.map(lambda v: None if v is None
                     else unicodedata.normalize(form, v))

    return docs.withColumn(out_col, norm(F.col(text_col)))


# Windows-1252 specials: the 0x80-0x9F byte gap that latin-1 round-trips
# miss. "Sloppy" variant: unmapped control code points pass through as
# their byte value (what ftfy's sloppy-windows-1252 does).
_CP1252_REV = {
    0x20AC: 0x80, 0x201A: 0x82, 0x0192: 0x83, 0x201E: 0x84, 0x2026: 0x85,
    0x2020: 0x86, 0x2021: 0x87, 0x02C6: 0x88, 0x2030: 0x89, 0x0160: 0x8A,
    0x2039: 0x8B, 0x0152: 0x8C, 0x017D: 0x8E, 0x2018: 0x91, 0x2019: 0x92,
    0x201C: 0x93, 0x201D: 0x94, 0x2022: 0x95, 0x2013: 0x96, 0x2014: 0x97,
    0x02DC: 0x98, 0x2122: 0x99, 0x0161: 0x9A, 0x203A: 0x9B, 0x0153: 0x9C,
    0x017E: 0x9E, 0x0178: 0x9F,
}

# UTF-8 lead bytes seen through a cp1252 decode: C2/C3 (2-byte seqs) and
# E0-EF (3-byte seqs). Pure-ASCII text can never match.
MOJIBAKE_MARKER_RE = "[ÂÃà-ï]"


def _repair_mojibake_str(s: str) -> str:
    out = bytearray()
    for ch in s:
        cp = ord(ch)
        b = _CP1252_REV.get(cp, cp)
        if b > 0xFF:
            return s  # not byte-shaped: leave untouched
        out.append(b)
    try:
        return out.decode("utf-8")
    except UnicodeDecodeError:
        return s  # marker was a real accented char, not mojibake


def fix_mojibake(docs: DataFrame, text_col: str = "text",
                 out_col: str = "text_fixed") -> DataFrame:
    """Repair UTF-8-read-as-cp1252 mojibake ('cafÃ©' -> 'café').

    Deterministic rule (so the oracle can mirror it exactly): a string is a
    repair candidate iff it matches :data:`MOJIBAKE_MARKER_RE`; candidates
    map each char to its sloppy-cp1252 byte and re-decode as UTF-8; any
    unmappable char or invalid UTF-8 keeps the original. The marker gate is
    a JVM ``rlike`` so the Pandas UDF only ever sees candidate rows.
    """

    @F.pandas_udf("string")
    def repair(s: pd.Series) -> pd.Series:
        return s.map(lambda v: None if v is None else _repair_mojibake_str(v))

    cand = F.col(text_col).rlike(MOJIBAKE_MARKER_RE)
    return docs.withColumn(
        out_col,
        F.when(cand, repair(F.col(text_col))).otherwise(F.col(text_col)),
    )


# ---------------------------------------------------------------------------
# Domain-suffix blocklist (UT1/adult-blocklist style filtering: blocking
# "ads.example.com" also blocks every subdomain under it)
# ---------------------------------------------------------------------------

def url_host(col: Column) -> Column:
    """Lowercased host of a URL (port stripped), pure JVM."""
    host = F.lower(F.regexp_extract(col, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]*)", 1))
    return F.regexp_replace(host, r":\d+$", "")


def host_suffixes(host: Column) -> Column:
    """array of dot-suffixes: a.b.c -> [a.b.c, b.c, c] (JVM transform)."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    return F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.array_join(F.slice(labels, i, n), "."),
    )


def block_by_domain_suffix(pages: DataFrame, blocklist,
                           url_col: str = "url") -> DataFrame:
    """Drop rows whose URL host equals or is a subdomain of a blocked
    domain.

    ``blocklist`` as a Python list stays zero-shuffle (``arrays_overlap``
    against a literal array — right for the usual few-thousand-entry UT1
    category). Pass a one-column DataFrame for huge lists: suffixes explode
    (x #labels, ~4) into a **broadcast** semi-join, then an anti-join back
    on a synthetic row id — no corpus shuffle either way.
    """
    sufx = host_suffixes(url_host(F.col(url_col)))
    if isinstance(blocklist, (list, tuple)):
        arr = F.array([F.lit(b) for b in blocklist])
        return pages.where(~F.arrays_overlap(sufx, arr))
    bl = blocklist.toDF("__blocked_suffix")
    withid = pages.withColumn(
        "__rid", F.monotonically_increasing_id()
    ).withColumn("__sufx", sufx)
    blocked = (
        withid.select("__rid", F.explode("__sufx").alias("__blocked_suffix"))
        .join(F.broadcast(bl), "__blocked_suffix", "left_semi")
        .select("__rid").distinct()
    )
    return (
        withid.join(blocked, "__rid", "left_anti")
        .drop("__rid", "__sufx")
    )


def with_char_entropy(docs: DataFrame, text_col: str = "text",
                      out_col: str = "char_entropy") -> DataFrame:
    """Shannon entropy (bits/char) of each document's character
    distribution — the classic gibberish/boilerplate quality signal
    (low entropy = repeated filler, high = random noise).

    Zero shuffle and zero Python: a JVM ``aggregate`` fold over the SORTED
    distinct characters (sorted so the float summation order is
    deterministic at any parallelism), with per-char counts from
    ``length - length(replace(...))``; O(distinct_chars x len) per row.
    """
    t = F.col(text_col)
    n = F.length(t)
    chars = F.array_sort(F.array_distinct(F.split(t, "")))

    def term(acc, c):
        cnt = (n - F.length(F.replace(t, c))).cast("double")
        p = cnt / n.cast("double")
        return acc + p * F.log2(p)

    ent = -F.aggregate(chars, F.lit(0.0), term)
    return docs.withColumn(out_col,
                           F.when(n > 0, ent).otherwise(F.lit(0.0)))


def with_length_percentile(docs: DataFrame, len_col: str = "n_chars",
                           by: str = "lang", id_col: str = "doc_id",
                           out_col: str = "len_pct") -> DataFrame:
    """Per-group length percentile (percent_rank over (lang, length)):
    the rank-based form of the length filter every quality pipeline
    applies per language — rank math is exact, so unlike z-scores it
    needs no float-sum determinism care. One shuffle on the group key."""
    w = Window.partitionBy(by).orderBy(len_col, id_col)
    return docs.withColumn(out_col, F.percent_rank().over(w))


def boilerplate_lines(
    docs: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
) -> DataFrame:
    """Densitometric boilerplate removal (Kohlschütter, Fankhauser &
    Nejdl, WSDM 2010, "Boilerplate Detection using Shallow Text
    Features" — the boilerpipe ``NumWordsRulesClassifier`` decision
    tree). Blocks are newline-separated lines; per line the classifier
    sees only ``numWords`` (whitespace tokens after tag stripping) and
    ``linkDensity`` (tokens inside ``<a>`` anchors / all tokens), plus
    the same two features of the previous and next line (absent
    neighbors count as empty blocks, the boilerpipe convention):

        curr.linkDensity > 1/3                      -> boilerplate
        prev.linkDensity <= 0.555556:
            curr.numWords > 16 or next.numWords > 15 -> content
            else prev.numWords > 4                   -> content
        prev.linkDensity  > 0.555556:
            curr.numWords > 40 or next.numWords > 17 -> content

    Everything is JVM built-ins (split / regexp / transform over the
    line array) in ONE zero-shuffle narrow projection — per-line
    neighbor context never leaves the row, so at 100 TB this is a pure
    map stage with no window shuffle. Returns
    (id, n_lines, n_content, content_text).
    """
    lines = F.split(F.col(html_col), "\n", -1)

    def nwords(s):
        stripped = F.regexp_replace(s, "<[^>]*>", " ")
        return F.size(F.filter(F.split(stripped, r"\s+", -1),
                               lambda x: x != ""))

    def awords(s):
        atext = F.array_join(
            F.regexp_extract_all(s, F.lit("<a [^>]*>(.*?)</a>"), 1), " ")
        return F.size(F.filter(F.split(atext, r"\s+", -1),
                               lambda x: x != ""))

    d = docs.select(
        F.col(id_col), lines.alias("_lines"),
        F.transform(lines, nwords).alias("_nw"),
        F.transform(lines, awords).alias("_aw"),
    ).select(
        id_col, "_lines", "_nw",
        F.zip_with(
            "_aw", "_nw",
            lambda a, n: F.when(n > 0, a.cast("double") / n.cast("double"))
            .otherwise(F.lit(0.0)),
        ).alias("_ld"),
    )

    n = F.size(F.col("_lines"))

    verdicts = F.transform(
        F.sequence(F.lit(0), n - 1),
        lambda i: F.when(
            F.element_at(F.col("_ld"), (i + 1).cast("int")) > 0.333333,
            F.lit(False),
        ).otherwise(
            F.when(
                F.coalesce(
                    F.element_at(F.col("_ld"), F.when(i > 0, i)
                                 .otherwise(F.lit(None)).cast("int")),
                    F.lit(0.0)) <= 0.555556,
                # low-link-density neighborhood branch
                (F.element_at(F.col("_nw"), (i + 1).cast("int")) > 16)
                | (F.coalesce(
                    F.element_at(F.col("_nw"), F.when(i + 2 <= n, i + 2)
                                 .otherwise(F.lit(None)).cast("int")),
                    F.lit(0)) > 15)
                | (F.coalesce(
                    F.element_at(F.col("_nw"), F.when(i > 0, i)
                                 .otherwise(F.lit(None)).cast("int")),
                    F.lit(0)) > 4),
            ).otherwise(
                # prev line is link-dense (nav context)
                (F.element_at(F.col("_nw"), (i + 1).cast("int")) > 40)
                | (F.coalesce(
                    F.element_at(F.col("_nw"), F.when(i + 2 <= n, i + 2)
                                 .otherwise(F.lit(None)).cast("int")),
                    F.lit(0)) > 17),
            )
        ),
    )

    kept = F.transform(
        F.filter(
            F.zip_with("_lines", "_keep",
                       lambda s, k: F.when(k, s).otherwise(F.lit(None))),
            lambda s: s.isNotNull(),
        ),
        lambda s: F.trim(F.regexp_replace(
            F.regexp_replace(s, "<[^>]*>", " "), r"\s+", " ")),
    )
    return d.select(
        id_col,
        F.col("_lines").alias("_lines"),
        verdicts.alias("_keep"),
    ).select(
        id_col,
        F.size("_lines").alias("n_lines"),
        F.size(F.filter("_keep", lambda k: k)).alias("n_content"),
        F.array_join(kept, "\n").alias("content_text"),
    )


def dup_ngram_char_frac(
    docs: DataFrame,
    ns: tuple[int, ...] = (5, 10),
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The remaining Gopher repetition rule (Rae et al. 2021 §A1.1):
    per document, the fraction of characters contained in any word
    n-gram that occurs more than once, for each n in ``ns`` (the paper
    uses n = 5..10; the common thresholds are 0.15/0.14/0.13/0.12/
    0.11/0.10). A character is counted once no matter how many
    duplicated grams cover it (span-union semantics, the DataTrove /
    NeMo-Curator reproduction); characters are TOKEN characters —
    separators are not attributed to either side.

    Relational formulation, no per-row quadratic folds: grams with
    start positions (zip_with over aligned slices), a keys-only
    (doc, gram) count to find duplicated grams, join-back to recover
    their start positions, an explode of each duplicated start into its
    n covered token positions, distinct, then one sum of token lengths
    over covered positions. Every shuffle is keyed by (doc, gram) or
    (doc, pos) — map-side combinable, O(corpus tokens) keys, the same
    scale shape as the shingle-dedup path; the n-fold position explode
    amplifies only DUPLICATED gram starts, not the corpus.

    Returns (id, n_chars, dup_{n}gram_char_frac ...).
    """
    toks = docs.select(
        id_col, F.split(F.col(text_col), " +").alias("t")
    ).withColumn("n_tok", F.size("t"))

    t = F.col("t")
    ntok = F.col("n_tok")

    def gram_array(n: int):
        out = F.slice(t, 1, F.greatest(ntok - (n - 1), F.lit(0)))
        for j in range(1, n):
            out = F.zip_with(
                out, F.slice(t, 1 + j, F.greatest(ntok - (n - 1), F.lit(0))),
                lambda a, b: F.concat_ws(" ", a, b),
            )
        return F.when(ntok >= n, out).otherwise(F.array())

    total = toks.select(
        id_col, "t", "n_tok",
        F.aggregate(F.transform(t, F.length), F.lit(0),
                    lambda acc, x: acc + x).alias("n_chars"),
    )

    out = total.select(id_col, "n_chars")
    for n in ns:
        gpos = total.select(
            id_col, F.posexplode(gram_array(n)).alias("s", "g"))
        dup = (gpos.groupBy(id_col, "g")
               .agg(F.count(F.lit(1)).alias("c"))
               .filter(F.col("c") > 1)
               .select(id_col, "g"))
        cov = (
            gpos.join(dup, [id_col, "g"])
            .select(id_col,
                    F.explode(F.sequence(F.col("s"),
                                         F.col("s") + (n - 1))).alias("p"))
            .distinct()
        )
        toklen = total.select(
            id_col, F.posexplode(F.transform(t, F.length))
            .alias("p", "len"))
        covered = (
            cov.join(toklen, [id_col, "p"])
            .groupBy(id_col)
            .agg(F.sum("len").alias("cchars"))
        )
        out = (
            out.join(covered, id_col, "left")
            .withColumn(
                f"dup_{n}gram_char_frac",
                F.coalesce(F.col("cchars"), F.lit(0)).cast("double")
                / F.greatest(F.col("n_chars"), F.lit(1)).cast("double"),
            )
            .drop("cchars")
        )
    return out


GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
GOPHER_BULLETS = ("•", "●", "‣", "-", "*")


def gopher_quality_signals(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The document-level Gopher quality rules (Rae et al. 2021 §A1.1),
    completing the repo's Gopher coverage beside the repetition filters
    (:func:`with_repetition`, :func:`dup_ngram_char_frac`). Signals and
    the paper's thresholds (verdict ``gopher_pass`` applies all):

    - ``n_words`` in [50, 100,000];
    - ``mean_word_len`` in [3, 10] (token chars / tokens);
    - ``symbol_word_ratio`` <= 0.1 (# and ellipsis symbols per word;
      ``…`` and the three-dot form both count);
    - ``bullet_line_frac`` <= 0.9 (lines starting with a bullet mark);
    - ``ellipsis_line_frac`` <= 0.3 (lines ending with an ellipsis);
    - ``alpha_word_frac`` >= 0.8 (words containing >=1 [A-Za-z]);
    - ``n_stop_hits`` >= 2 (distinct members of the paper's 8-word stop
      list {the, be, to, of, and, that, have, with} present).

    One zero-shuffle JVM projection (split / filter / rlike) — a pure
    map stage at any scale. Bullet/ellipsis character sets are pinned
    here so the oracle can mirror them exactly.
    """
    txt = F.col(text_col)
    words = F.filter(F.split(txt, r"\s+", -1), lambda x: x != "")
    n_words = F.size(words)
    safe_w = F.greatest(n_words, F.lit(1)).cast("double")
    n_tok_chars = F.aggregate(F.transform(words, F.length), F.lit(0),
                              lambda a, x: a + x)
    mean_wl = n_tok_chars.cast("double") / safe_w

    n_hash = F.length(txt) - F.length(F.regexp_replace(txt, "#", ""))
    n_uni_ell = F.length(txt) - F.length(F.regexp_replace(txt, "…", ""))
    n_dot_ell = (F.length(txt)
                 - F.length(F.regexp_replace(txt, r"\.\.\.", ""))) / 3
    sym_ratio = (n_hash + n_uni_ell + n_dot_ell).cast("double") / safe_w

    lines = F.filter(F.split(txt, "\n", -1), lambda s: F.trim(s) != "")
    n_lines = F.size(lines)
    safe_l = F.greatest(n_lines, F.lit(1)).cast("double")
    bullet_re = "^[" + "".join(GOPHER_BULLETS).replace("-", r"\-") + "]"
    bullet_frac = F.size(F.filter(
        lines, lambda s: F.trim(s).rlike(bullet_re))).cast("double") / safe_l
    ell_frac = F.size(F.filter(
        lines, lambda s: F.trim(s).rlike(r"(\.\.\.|…)$"))
    ).cast("double") / safe_l

    alpha_frac = F.size(F.filter(
        words, lambda w: w.rlike("[A-Za-z]"))).cast("double") / safe_w

    lowered = F.transform(words, F.lower)
    stop_hits = F.size(F.array_intersect(
        F.array_distinct(lowered),
        F.array(*[F.lit(s) for s in GOPHER_STOPWORDS])))

    sig = docs.select(
        F.col(id_col),
        n_words.alias("n_words"),
        F.round(mean_wl, 9).alias("mean_word_len"),
        F.round(sym_ratio, 9).alias("symbol_word_ratio"),
        F.round(bullet_frac, 9).alias("bullet_line_frac"),
        F.round(ell_frac, 9).alias("ellipsis_line_frac"),
        F.round(alpha_frac, 9).alias("alpha_word_frac"),
        stop_hits.alias("n_stop_hits"),
    )
    return sig.withColumn(
        "gopher_pass",
        ((F.col("n_words") >= 50) & (F.col("n_words") <= 100000)
         & (F.col("mean_word_len") >= 3.0) & (F.col("mean_word_len") <= 10.0)
         & (F.col("symbol_word_ratio") <= 0.1)
         & (F.col("bullet_line_frac") <= 0.9)
         & (F.col("ellipsis_line_frac") <= 0.3)
         & (F.col("alpha_word_frac") >= 0.8)
         & (F.col("n_stop_hits") >= 2)).cast("int"),
    )


def top_ngram_char_frac(
    docs: DataFrame,
    ns: tuple[int, ...] = (2, 3, 4),
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The other half of Gopher's repetition table (Rae et al. 2021
    §A1.1): for n in {2,3,4}, the fraction of characters contained in
    the MOST FREQUENT n-gram (occurrence count x gram token chars /
    total token chars; thresholds 0.20/0.18/0.16). Deterministic
    argmax: ties break toward the lexicographically smallest gram.

    Keys-only (doc, gram) counts, then a relational argmax (max count
    per doc, min gram among ties) — every stage map-side combinable,
    the corpus token stream is never collected. Character totals are
    token chars (separators excluded), matching
    :func:`dup_ngram_char_frac`.
    """
    toks = docs.select(
        id_col, F.split(F.col(text_col), " +").alias("t")
    ).withColumn("n_tok", F.size("t"))
    t = F.col("t")
    ntok = F.col("n_tok")

    def gram_array(n: int):
        out = F.slice(t, 1, F.greatest(ntok - (n - 1), F.lit(0)))
        for j in range(1, n):
            out = F.zip_with(
                out, F.slice(t, 1 + j, F.greatest(ntok - (n - 1), F.lit(0))),
                lambda a, b: F.concat_ws(" ", a, b),
            )
        return F.when(ntok >= n, out).otherwise(F.array())

    total = toks.select(
        id_col, "t", "n_tok",
        F.aggregate(F.transform(t, F.length), F.lit(0),
                    lambda a, x: a + x).alias("n_chars"),
    )
    out = total.select(id_col, F.col("n_chars").cast("long").alias("n_chars"))
    for n in ns:
        counts = (
            total.select(id_col, F.explode(gram_array(n)).alias("g"))
            .groupBy(id_col, "g").agg(F.count(F.lit(1)).alias("c"))
        )
        # deterministic argmax in ONE combinable pass (audited: the
        # two-join form re-read the counts exchange twice): min_by on
        # (-count, gram) = max count, lexicographic-min gram on ties
        top = counts.groupBy(id_col).agg(
            F.min_by(
                F.struct(F.col("g"), F.col("c")),
                F.struct((-F.col("c")).alias("nc"), F.col("g")),
            ).alias("top"))
        frac = top.select(
            id_col,
            (F.col("top.c")
             * (F.length("top.g") - (n - 1))).alias("cc"),
        )
        out = (
            out.join(frac, id_col, "left")
            .withColumn(
                f"top_{n}gram_char_frac",
                F.coalesce(F.col("cc"), F.lit(0)).cast("double")
                / F.greatest(F.col("n_chars"), F.lit(1)).cast("double"),
            )
            .drop("cc")
        )
    return out


def readability_scores(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Flesch Reading Ease and Flesch-Kincaid grade level (Flesch 1948;
    Kincaid et al. 1975 - the published formulas):

        FRE   = 206.835 - 1.015 (words/sentences) - 84.6 (syllables/words)
        grade = 0.39 (words/sentences) + 11.8 (syllables/words) - 15.59

    Sentences are maximal runs ending in ``. ! ?`` (a text with no
    terminal mark counts as one sentence). Syllables use the standard
    vowel-group heuristic, pinned here so the oracle can mirror it
    exactly: per lowercase word, the number of maximal ``[aeiouy]+``
    runs, minus one when the word ends in a silent ``e`` (ends with
    ``e`` but not ``le``, and has >= 2 vowel groups), floored at 1 for
    any word containing a letter. Words with no [a-z] letter contribute
    0 syllables but still count as words (token-count semantics).

    One zero-shuffle JVM projection (split / regexp / transform) - a
    pure map stage. Returns (id, n_words, n_sentences, n_syllables,
    fre, fk_grade), scores rounded to 6 dp.
    """
    txt = F.col(text_col)
    words = F.filter(F.split(txt, r"\s+", -1), lambda x: x != "")
    n_words = F.size(words)
    safe_w = F.greatest(n_words, F.lit(1)).cast("double")

    sentences = F.filter(
        F.split(txt, r"[.!?]+", -1), lambda s: F.trim(s) != "")
    n_sent = F.greatest(F.size(sentences), F.lit(1))

    def syl(w):
        lw = F.lower(w)
        # vowel GROUPS: split on non-vowel runs, count non-empty parts
        groups = F.size(F.filter(
            F.split(lw, "[^aeiouy]+", -1), lambda seg: seg != ""))
        silent_e = (lw.rlike("e$") & ~lw.rlike("le$")
                    & (groups >= 2)).cast("int")
        has_letter = lw.rlike("[a-z]").cast("int")
        return F.greatest(groups - silent_e, F.lit(1)) * has_letter

    n_syll = F.aggregate(F.transform(words, syl), F.lit(0),
                         lambda a, x: a + x)

    wps = n_words.cast("double") / n_sent.cast("double")
    spw = n_syll.cast("double") / safe_w
    fre = F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw
    grade = F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59)
    return docs.select(
        F.col(id_col),
        n_words.alias("n_words"),
        n_sent.alias("n_sentences"),
        n_syll.alias("n_syllables"),
        F.round(fre, 6).alias("fre"),
        F.round(grade, 6).alias("fk_grade"),
    )


def url_quality_features(
    pages: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """URL-shape quality signals (the RefinedWeb / Dolma URL-filter
    feature set — beside the blocklist in :func:`block_by_domain_suffix`
    and the canonicalizer in :func:`canonical_url`):

    - ``path_depth``: number of non-empty ``/`` path segments;
    - ``n_query_params``: ``&``-separated pairs in the query string;
    - ``n_tracking_params``: utm_* / fbclid / gclid pairs among them;
    - ``url_len``: total characters;
    - ``digit_seg_frac``: fraction of path segments that are purely
      digits (pagination/ID paths — a boilerplate-page signal);
    - ``max_seg_len``: longest path segment (hash-like blobs);
    - ``has_port``: explicit non-default port present.

    One zero-shuffle JVM projection (regexp/split/filter) — a pure map
    stage; every rule is spelled here so the oracle mirrors it exactly.
    """
    u = F.trim(F.col(url_col))
    no_frag = F.regexp_replace(u, r"#.*$", "")
    rest = F.regexp_replace(no_frag, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    hostport = F.regexp_extract(rest, r"^([^/?]*)", 1)
    tail = F.regexp_replace(rest, r"^[^/?]*", "")
    path = F.regexp_extract(tail, r"^([^?]*)", 1)
    query = F.regexp_replace(F.regexp_extract(tail, r"\?(.*)$", 1), r"^$", "")
    segs = F.filter(F.split(path, "/", -1), lambda s: s != "")
    qparams = F.filter(F.split(query, "&", -1), lambda s: s != "")
    n_seg = F.size(segs)
    digit_segs = F.size(F.filter(segs, lambda s: s.rlike("^[0-9]+$")))
    return pages.withColumns({
        "path_depth": n_seg,
        "n_query_params": F.size(qparams),
        "n_tracking_params": F.size(F.filter(
            qparams,
            lambda p: p.rlike("^(utm_[A-Za-z]+|fbclid|gclid)="))),
        "url_len": F.length(u),
        "digit_seg_frac": (digit_segs.cast("double")
                           / F.greatest(n_seg, F.lit(1)).cast("double")),
        "max_seg_len": F.coalesce(
            F.array_max(F.transform(segs, F.length)), F.lit(0)),
        "has_port": hostport.rlike(":[0-9]+$").cast("int"),
    })


def ccnet_perplexity_buckets(
    docs: DataFrame,
    by: str = "lang",
    k: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    method: str = "rank",
) -> DataFrame:
    """CCNet's signature head/middle/tail split (Wenzek et al. 2020
    §4.3): per language, rank documents by LM cross-entropy
    (:func:`ngram_lm_perplexity`) and cut into equal thirds —
    ``head`` = most fluent (lowest perplexity), ``tail`` = worst.
    ``method="rank"`` (default) uses percent_rank over
    (lang, entropy, id) — exact and deterministic at any parallelism,
    but the window sorts each language in ONE task, so a web-scale run
    where English is 70% of the corpus hot-spots one reducer.
    ``method="quantile"`` is the 100 TB path: the per-language 1/3 and
    2/3 ENTROPY THRESHOLDS come from the exact distributed quantile
    operator (operators/quantiles.exact_quantiles — combinable
    histogram passes, no global sort; one call per language, languages
    are few), then bucketing is a broadcast-join comparison. The two
    methods agree except exactly AT a threshold value (rank splits
    ties by id; thresholds put the whole tie in one bucket), so the
    oracle gates the rank path and pytest checks cross-method
    agreement away from ties. Documents too short to score (< 2
    tokens) keep their row with a NULL bucket; ``ppl_pct`` is NULL in
    quantile mode. Returns (id, by, n_bigrams, cross_entropy, ppl_pct,
    bucket).
    """
    if method not in ("rank", "quantile"):
        raise ValueError("method must be 'rank' or 'quantile'")
    scored = ngram_lm_perplexity(docs, k=k, id_col=id_col,
                                 text_col=text_col)
    joined = docs.select(F.col(id_col), F.col(by)).join(scored, id_col)
    has = joined.filter(F.col("cross_entropy").isNotNull())
    if method == "quantile":
        from lib_gdal_spark.operators.quantiles import exact_quantiles

        langs = [r[0] for r in has.select(by).distinct().collect()]
        rows = []
        for lg in sorted(langs):
            qv = {r["q"]: r["value"] for r in exact_quantiles(
                has.filter(F.col(by) == lg), "cross_entropy",
                [1.0 / 3.0, 2.0 / 3.0]).collect()}
            rows.append((lg, qv[1.0 / 3.0], qv[2.0 / 3.0]))
        th = docs.sparkSession.createDataFrame(
            rows, f"{by} string, q13 double, q23 double")
        ranked = (
            has.join(F.broadcast(th), by)
            .withColumn("ppl_pct", F.lit(None).cast("double"))
            .withColumn(
                "bucket",
                F.when(F.col("cross_entropy") <= F.col("q13"),
                       F.lit("head"))
                .when(F.col("cross_entropy") <= F.col("q23"),
                      F.lit("middle"))
                .otherwise(F.lit("tail")),
            )
            .drop("q13", "q23")
        )
        rest = (
            joined.filter(F.col("cross_entropy").isNull())
            .withColumn("ppl_pct", F.lit(None).cast("double"))
            .withColumn("bucket", F.lit(None).cast("string"))
        )
        return ranked.unionByName(rest).select(
            id_col, by, "n_bigrams", "cross_entropy", "ppl_pct",
            "bucket")
    w = Window.partitionBy(by).orderBy("cross_entropy", id_col)
    ranked = has.withColumn("ppl_pct", F.percent_rank().over(w))
    bucket = (
        F.when(F.col("ppl_pct") < 1.0 / 3.0, F.lit("head"))
        .when(F.col("ppl_pct") < 2.0 / 3.0, F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    ranked = ranked.withColumn("bucket", bucket)
    rest = (
        joined.filter(F.col("cross_entropy").isNull())
        .withColumn("ppl_pct", F.lit(None).cast("double"))
        .withColumn("bucket", F.lit(None).cast("string"))
    )
    return ranked.unionByName(rest).select(
        id_col, by, "n_bigrams", "cross_entropy", "ppl_pct", "bucket")


def luhn_valid(digits: Column) -> Column:
    """Luhn mod-10 checksum (ISO/IEC 7812 — the card-number check the
    PII scrubber's regex alone can't do): True iff the digit-string
    Column passes. Pure JVM: reverse the digits, double every second
    one, subtract 9 when > 9, sum mod 10. Non-digit or empty input
    yields false (never null), so it composes as a filter."""
    ds = F.filter(F.split(F.reverse(digits), "", -1), lambda c: c != "")
    term = F.aggregate(
        F.zip_with(
            ds,
            F.sequence(F.lit(0), F.greatest(F.size(ds) - 1, F.lit(0))),
            lambda c, i: F.when(
                i % 2 == 1,
                F.when((c.cast("int") * 2) > 9, c.cast("int") * 2 - 9)
                .otherwise(c.cast("int") * 2),
            ).otherwise(c.cast("int")),
        ),
        F.lit(0),
        lambda a, x: a + x,
    )
    return (
        digits.rlike("^[0-9]{2,}$") & ((term % 10) == 0)
    )


def validate_card_candidates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Find 13-19 digit card-number candidates (with optional space/dash
    group separators, the redact_pii pattern) and split them into
    Luhn-valid cards vs regex-only false positives — the precision
    upgrade every PII pipeline applies after the regex pass. One narrow
    JVM projection (regexp_extract_all + the luhn_valid fold).
    Returns (id, n_candidates, n_luhn_valid, valid_cards: array of
    digit strings)."""
    cand = F.regexp_extract_all(
        F.col(text_col),
        F.lit(r"\b(?:\d[ -]?){12,18}\d\b"), 0)
    digits = F.transform(
        cand, lambda s: F.regexp_replace(s, "[^0-9]", ""))
    in_range = F.filter(
        digits, lambda d: (F.length(d) >= 13) & (F.length(d) <= 19))
    valid = F.filter(in_range, luhn_valid)
    return docs.select(
        id_col,
        F.size(in_range).alias("n_candidates"),
        F.size(valid).alias("n_luhn_valid"),
        valid.alias("valid_cards"),
    )


def iban_valid(iban: Column) -> Column:
    """ISO 13616 IBAN mod-97 check (the bank-account companion of
    :func:`luhn_valid`): move the first four characters to the end, map
    letters to two-digit values (A=10..Z=35), and fold the digit stream
    into a running remainder mod 97 — the fold never materializes the
    big integer, so it is exact in int64. Valid iff the remainder is 1,
    the length is 15..34, and the shape is 2 letters + 2 digits + BBAN.
    Uppercases and strips spaces first (the display form).
    """
    s = F.upper(F.regexp_replace(iban, r"\s+", ""))
    shape_ok = s.rlike("^[A-Z]{2}[0-9]{2}[A-Z0-9]{15,30}$") & \
        (F.length(s) <= 34)
    rearr = F.concat(F.substr(s, F.lit(5)), F.substring(s, 1, 4))
    chars = F.filter(F.split(rearr, "", -1), lambda c: c != "")
    rem = F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: F.when(
            c.rlike("[0-9]"),
            (acc * 10 + c.cast("long")) % 97,
        ).otherwise(
            (acc * 100 + (F.ascii(c) - 55).cast("long")) % 97
        ),
    )
    return shape_ok & (rem == 1)


# NARA soundex letter codes: digit, '0' for vowels+Y (code separators),
# '7' for H/W (transparent — do NOT separate equal codes).
_SOUNDEX_MAP = {
    **{c: "1" for c in "BFPV"}, **{c: "2" for c in "CGJKQSXZ"},
    **{c: "3" for c in "DT"}, "L": "4", **{c: "5" for c in "MN"},
    "R": "6", **{c: "0" for c in "AEIOUY"}, "H": "7", "W": "7",
}
SOUNDEX_CODES = "".join(
    _SOUNDEX_MAP.get(chr(ordc), "0") for ordc in range(65, 91))


def soundex_nara(name: Column) -> Column:
    """Strict American/NARA Soundex (the census rules, including the
    H/W subtlety most SQL built-ins get wrong): same-code letters
    separated by H or W code ONCE, separated by a vowel code twice.
    Published anchors: Robert/Rupert -> R163, Ashcraft -> A261 (the
    H/W rule), Tymczak -> T522, Pfister -> P236, Honeyman -> H555.

    Pure JVM fold: letters map through a 26-char code string, then one
    ``aggregate`` walk with a (digits, prev_code) struct accumulator —
    vowels reset prev, H/W leave it, new codes append. Non-letter input
    characters are dropped; empty input yields NULL.
    """
    up = F.regexp_replace(F.upper(name), "[^A-Z]", "")
    chars = F.filter(F.split(up, "", -1), lambda c: c != "")

    def code(c):
        return F.substring(F.lit(SOUNDEX_CODES), F.ascii(c) - 64, 1)

    first = F.element_at(chars, 1)
    acc0 = F.struct(F.lit("").alias("out"), code(first).alias("prev"))
    walked = F.aggregate(
        F.slice(chars, 2, F.greatest(F.size(chars) - 1, F.lit(0))),
        acc0,
        lambda a, c: F.when(
            code(c) == "0",  # vowel/Y: codes nothing, separates
            F.struct(a["out"].alias("out"), F.lit("0").alias("prev")),
        ).when(
            code(c) == "7",  # H/W: transparent
            a,
        ).when(
            code(c) == a["prev"],  # run (possibly across H/W): skip
            a,
        ).otherwise(
            F.struct(F.concat(a["out"], code(c)).alias("out"),
                     code(c).alias("prev")),
        ),
    )
    sx = F.concat(first, F.rpad(F.substring(walked["out"], 1, 3), 3, "0"))
    return F.when(F.length(up) > 0, sx).otherwise(F.lit(None))


def zipf_fit(docs: DataFrame, text_col: str = "text",
             lang_col: str = "lang", top_k: int = 50) -> DataFrame:
    """Zipf rank-frequency fit per language: OLS of ln(freq) on
    ln(rank) over the ``top_k`` most frequent tokens (Zipf 1949; slope
    near -1 signals natural-language-like token distributions — a
    corpus-health diagnostic that flags template/boilerplate-dominated
    sources, whose slopes flatten).

    Returns (lang, n_types, slope, intercept) with slope/intercept
    rounded to 6 dp (the closed-form OLS sums run over ``top_k`` <= a
    few hundred doubles, so cross-engine accumulation-order error is
    far below the rounding grain).

    Scale shape: token counts are a combinable (lang, token) groupBy;
    ranking is a window over each language's counts where only the
    top_k survive — at web scale prune with an approximate pre-filter
    (count >= per-partition threshold) before the window; the fit
    itself aggregates top_k rows per language. No UDFs."""
    toks = docs.select(
        F.col(lang_col).alias("lang"),
        F.explode(F.split(F.col(text_col), TOKEN_SPLIT_RE)).alias("tok"))
    counts = (toks.filter(F.col("tok") != "")
              .groupBy("lang", "tok").agg(F.count(F.lit(1)).alias("c")))
    w = Window.partitionBy("lang").orderBy(F.col("c").desc(),
                                           F.col("tok").asc())
    ranked = (counts
              .withColumn("rank", F.row_number().over(w))
              .filter(F.col("rank") <= top_k))
    x = F.log(F.col("rank").cast("double"))
    y = F.log(F.col("c").cast("double"))
    agg = ranked.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"), F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"), F.sum(x * x).alias("sxx"))
    totals = counts.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_types"),
        F.sum("c").alias("n_tokens"))
    nf = F.col("n").cast("double")
    slope = ((nf * F.col("sxy") - F.col("sx") * F.col("sy"))
             / (nf * F.col("sxx") - F.col("sx") * F.col("sx")))
    intercept = (F.col("sy") - slope * F.col("sx")) / nf
    return agg.join(totals, "lang").select(
        "lang", "n_types", "n_tokens",
        F.round(slope, 6).alias("slope"),
        F.round(intercept, 6).alias("intercept"))


def textrank_terms(docs: DataFrame, text_col: str = "text",
                   window: int = 2, n_iters: int = 4,
                   k: int = 25) -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau, EMNLP 2004) over
    the whole corpus: terms are nodes, two terms co-occurring within
    ``window`` token positions anywhere are an (unweighted, undirected)
    edge, and the ranking is the repo's EXACT integer PageRank
    (operators/graph.pagerank — fixed-point units, so the scores are
    bit-identical at any parallelism and reproducible by a SQL oracle
    keyed on the term strings themselves).

    Returns the top ``k`` terms as (pos, term, rank_units): pos the
    1-based rank ordinal (ties broken by term), rank_units the exact
    fixed-point PageRank mass.

    Scale shape: tokenize (narrow map) -> windowed position self-join
    per doc (equi-join on doc_id, |pairs| = tokens * window before the
    distinct) -> DISTINCT canonical term-pair edges (the aggregated
    vocabulary graph, tiny vs the corpus) -> 4 pagerank rounds on it.
    Node ids are xxhash64(term) Spark-side (collisions would be caught
    by the oracle, which ranks the strings directly).
    """
    from lib_gdal_spark.operators.graph import pagerank

    # the row id must be assigned BEFORE the explode — inside the same
    # select, monotonically_increasing_id() would be evaluated once per
    # GENERATED row, giving every token its own id and no pairs at all
    toks = (
        docs.withColumn("__rid", F.monotonically_increasing_id())
        .select(
            "__rid",
            F.posexplode(
                F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
            ).alias("pos", "term"),
        )
        .where(F.col("term") != "")
    )
    # the probe side explodes each token to its `window` forward
    # offsets so the join key is (doc, EXACT position) — an equi-join
    # with O(tokens * window) probe rows. Joining on the doc id alone
    # and range-filtering positions would scan O(tokens^2) candidate
    # pairs inside every long document.
    offs = F.array(*[F.lit(i) for i in range(1, window + 1)])
    a = toks.select(
        F.col("__rid").alias("d"), F.col("term").alias("ta"),
        "pos", F.explode(offs).alias("off"),
    ).select("d", "ta", (F.col("pos") + F.col("off")).alias("pb"))
    b = toks.select(F.col("__rid").alias("d"), F.col("pos").alias("pb"),
                    F.col("term").alias("tb"))
    pairs = (
        a.join(b, ["d", "pb"])
        .where(F.col("ta") != F.col("tb"))
        .select(F.least("ta", "tb").alias("ta"),
                F.greatest("ta", "tb").alias("tb"))
        .distinct()
        .localCheckpoint()
    )
    e = pairs.select(F.xxhash64("ta").alias("u"), F.xxhash64("tb").alias("v"))
    e = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    pr = pagerank(e, n_iters=n_iters)
    terms = (
        pairs.select(F.col("ta").alias("term"))
        .unionByName(pairs.select(F.col("tb").alias("term")))
        .distinct()
        .withColumn("id", F.xxhash64("term"))
    )
    ranked = pr.join(terms, pr.node == terms.id).select("term", "rank_units")
    # vocabulary-sized table: the global window is over the aggregated
    # term graph, never the corpus
    w = Window.orderBy(F.col("rank_units").desc(), F.col("term"))
    return (
        ranked.select(F.row_number().over(w).alias("pos"), "term",
                      "rank_units")
        .where(F.col("pos") <= k)
    )


def bleu_word_ngrams(text_col: str, n: int) -> Column:
    """Strict word n-gram array (BLEU convention): lowercase whitespace
    tokens; a document with fewer than ``n`` tokens yields the EMPTY
    array — unlike dedup.word_ngrams, which collapses short docs to one
    catch-all gram (right for dedup recall, wrong for precision
    denominators). JVM-native (split/sequence/slice), no Python."""
    toks = F.filter(
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+"),
        lambda x: x != F.lit(""),
    )
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
    )
    empty = F.array().cast("array<string>")
    return F.when(F.size(toks) >= n, grams).otherwise(empty)


def ngram_precision_pairs(
    pairs: DataFrame,
    cand_col: str = "cand",
    ref_col: str = "ref",
    id_col: str = "pair_id",
    ns: Sequence[int] = (1, 2),
) -> DataFrame:
    """BLEU-style clipped (modified) n-gram precision per (candidate,
    reference) text pair — Papineni et al. ACL 2002 — the standard
    overlap metric for eval-vs-generation comparison and a sharper
    near-duplicate diagnostic than boolean Jaccard.

    For each n in ``ns``: p_n = sum_g min(count_cand(g), count_ref(g))
    / #cand-n-grams (clipping stops a candidate from farming credit by
    repeating one reference gram). Output per pair: den_n / hits_n / p_n
    for each n, the 2-gram geometric mean ``bleu`` = sqrt(p_1 * p_2)
    (sqrt is IEEE correctly-rounded -> engine-exact, unlike exp/log, so
    the published brevity-penalty exponential is intentionally reported
    as the raw ``brevity`` length ratio instead), and ``brevity`` =
    len_cand / len_ref.

    Scale shape: gram counts are map-side-combinable groupBys keyed on
    (pair, gram) — the only shuffles, both O(tokens); the clip join is
    an equi-join on the same key, so AQE plans it shuffle-free after the
    counts. No Python anywhere; everything is whole-stage codegen.
    """
    if len(set(ns)) != len(ns) or not ns:
        raise ValueError("ns must be a non-empty set of distinct orders")
    base = pairs.select(id_col, cand_col, ref_col).cache()
    ids = base.select(id_col)

    def counts(col: str, n: int, name: str) -> DataFrame:
        return (
            base.select(id_col,
                        F.explode(bleu_word_ngrams(col, n)).alias("gram"))
            .groupBy(id_col, "gram")
            .agg(F.count(F.lit(1)).alias(name))
        )

    out = ids
    p_cols: list[str] = []
    for n in ns:
        cg = counts(cand_col, n, "c_c")
        rg = counts(ref_col, n, "c_r")
        agg = (
            cg.join(rg, [id_col, "gram"], "left")
            .groupBy(id_col)
            .agg(
                F.sum("c_c").alias(f"den{n}"),
                F.sum(F.least(F.col("c_c"),
                              F.coalesce(F.col("c_r"), F.lit(0))))
                .alias(f"hits{n}"),
            )
        )
        out = out.join(agg, id_col, "left").na.fill(
            {f"den{n}": 0, f"hits{n}": 0})
        p = F.when(
            F.col(f"den{n}") == 0, F.lit(0.0)
        ).otherwise(
            F.col(f"hits{n}").cast("double")
            / F.col(f"den{n}").cast("double")
        )
        out = out.withColumn(f"p{n}", F.round(p, 6))
        p_cols.append(f"p{n}")

    lc = F.size(F.filter(
        F.split(F.trim(F.lower(F.col(cand_col))), r"\s+"),
        lambda x: x != F.lit("")))
    lr = F.size(F.filter(
        F.split(F.trim(F.lower(F.col(ref_col))), r"\s+"),
        lambda x: x != F.lit("")))
    lens = base.select(
        id_col, lc.alias("__lc"), lr.alias("__lr"))
    out = out.join(lens, id_col)
    if len(ns) >= 2:
        a, b = ns[0], ns[1]
        pa = F.when(F.col(f"den{a}") == 0, F.lit(0.0)).otherwise(
            F.col(f"hits{a}").cast("double") / F.col(f"den{a}").cast("double"))
        pb = F.when(F.col(f"den{b}") == 0, F.lit(0.0)).otherwise(
            F.col(f"hits{b}").cast("double") / F.col(f"den{b}").cast("double"))
        out = out.withColumn("bleu", F.round(F.sqrt(pa * pb), 6))
    brevity = F.when(F.col("__lr") == 0, F.lit(0.0)).otherwise(
        F.col("__lc").cast("double") / F.col("__lr").cast("double"))
    out = out.withColumn("brevity", F.round(brevity, 6))
    keep = [id_col]
    for n in ns:
        keep += [f"den{n}", f"hits{n}", f"p{n}"]
    if len(ns) >= 2:
        keep.append("bleu")
    keep.append("brevity")
    return out.select(*keep)


def collocations(
    docs: DataFrame,
    min_count: int = 3,
    top_k: int = 25,
    text_col: str = "text",
) -> DataFrame:
    """PMI collocation mining (Church & Hanks 1990): adjacent word pairs
    that co-occur far more than their unigram frequencies predict —
    corpus phrase discovery for tokenizer/vocab curation. Returns the
    ``top_k`` bigrams by lift with ``min_count`` support:
    (rank, w1, w2, n_pair, lift) where

        lift = (c_xy * N^2) / (B * c_x * c_y)

    — the exp of PMI with unigram probabilities c/N and bigram
    probability c_xy/B. Reported as the raw lift ratio rather than its
    log: the ranking is identical (log is monotone) and the arithmetic
    stays engine-exact (products/divisions of integer-valued doubles in
    a fixed order), where libm log would not be.

    Scale shape: two map-side-combinable groupBys (unigrams, bigrams),
    two equi-joins against the unigram counts, two scalar totals, and a
    TakeOrdered top-k — no Python, no driver loop; the min_count filter
    prunes the join's probe side before it shuffles.
    """
    toks = F.filter(
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+"),
        lambda x: x != F.lit(""),
    )
    base = docs.select(toks.alias("t")).cache()
    uni = (
        base.select(F.explode("t").alias("w"))
        .groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    )
    pair_arr = F.transform(
        F.sequence(F.lit(0), F.size(F.col("t")) - 2),
        lambda i: F.struct(
            F.element_at(F.col("t"), i + 1).alias("w1"),
            F.element_at(F.col("t"), i + 2).alias("w2"),
        ),
    )
    bi = (
        base.where(F.size("t") >= 2)
        .select(F.explode(pair_arr).alias("p"))
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n_pair"))
        .where(F.col("n_pair") >= min_count)
    )
    totals = base.agg(
        F.sum(F.size("t")).alias("N"),
        F.sum(F.greatest(F.size("t") - 1, F.lit(0))).alias("B"),
    )
    j = (
        bi.join(uni.select(F.col("w").alias("w1"), F.col("c").alias("c1")),
                "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("c").alias("c2")),
              "w2")
        .crossJoin(F.broadcast(totals))
    )
    nd = F.col("N").cast("double")
    lift = (F.col("n_pair").cast("double") * (nd * nd)) / (
        (F.col("B").cast("double") * F.col("c1").cast("double"))
        * F.col("c2").cast("double")
    )
    ranked = (
        j.withColumn("__lift", lift)
        .orderBy(F.col("__lift").desc(), "w1", "w2")
        .limit(top_k)
    )
    win = Window.orderBy(F.col("__lift").desc(), "w1", "w2")
    return ranked.select(
        F.row_number().over(win).alias("rank"),
        "w1", "w2", "n_pair",
        F.round("__lift", 6).alias("lift"),
    )


def rouge_l_pairs(
    pairs: DataFrame,
    cand_col: str = "cand",
    ref_col: str = "ref",
    id_col: str = "pair_id",
    max_tokens: int | None = None,
) -> DataFrame:
    """ROUGE-L (Lin 2004): longest-common-subsequence overlap per
    (candidate, reference) pair — order-aware similarity that BLEU's
    bag-of-ngrams misses. Output: (pair_id, c_len, r_len, lcs,
    precision, recall, f1) with precision = lcs/c_len, recall =
    lcs/r_len, f1 their harmonic mean (the beta=1 ROUGE-L score);
    empty sides score 0. ``max_tokens`` truncates both token lists —
    the documented oracle-tractability knob (the SQL DP is O(n*m)).

    The DP is the vectorized running-max row update: per candidate
    token, base[j] = max(old[j], old[j-1]+1 if match) and new =
    cummax(base) — O(n) NumPy row ops per pair instead of O(n*m) Python,
    and the same two-window formulation the SQL oracle uses (lag + max
    OVER ORDER BY j inside a recursive CTE).

    Scale shape: one narrow mapInPandas — per-pair work only, no
    shuffle; LCS is quadratic per pair by nature, so the operator's
    distribution axis is pairs, the only one that grows with the corpus.
    """

    def dp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in
                   ("pair_id", "c_len", "r_len", "lcs",
                    "precision", "recall", "f1")}
            for pid, cs, rs in zip(pdf[id_col], pdf[cand_col],
                                   pdf[ref_col]):
                ct = [w for w in (cs or "").lower().split() if w]
                rt = [w for w in (rs or "").lower().split() if w]
                if max_tokens is not None:
                    ct, rt = ct[:max_tokens], rt[:max_tokens]
                nc, nr = len(ct), len(rt)
                if nc and nr:
                    r_arr = np.array(rt, dtype=object)
                    old = np.zeros(nr + 1, dtype=np.int64)
                    for c in ct:
                        tmp = np.where(r_arr == c, old[:-1] + 1, 0)
                        base = np.maximum(old[1:], tmp)
                        old = np.concatenate(
                            ([0], np.maximum.accumulate(base)))
                    lcs = int(old[-1])
                else:
                    lcs = 0
                p = lcs / nc if nc else 0.0
                r = lcs / nr if nr else 0.0
                f1 = (2.0 * (p * r)) / (p + r) if (p + r) > 0.0 else 0.0
                out["pair_id"].append(pid)
                out["c_len"].append(nc)
                out["r_len"].append(nr)
                out["lcs"].append(lcs)
                # raw doubles out; rounding happens in F.round below so
                # the decimal convention is Spark's (== the oracle's),
                # not Python's
                out["precision"].append(p)
                out["recall"].append(r)
                out["f1"].append(f1)
            yield pd.DataFrame(out)

    raw = pairs.select(id_col, cand_col, ref_col).mapInPandas(
        dp,
        f"{id_col} long, c_len int, r_len int, lcs int, "
        "precision double, recall double, f1 double",
    )
    return raw.select(
        id_col, "c_len", "r_len", "lcs",
        F.round("precision", 6).alias("precision"),
        F.round("recall", 6).alias("recall"),
        F.round("f1", 6).alias("f1"),
    )


def heaps_law(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    quant: int = 10_000,
) -> DataFrame:
    """Heaps'-law fit V(N) = K * N^beta of vocabulary growth — the
    corpus-health diagnostic beside zipf_fit (a crawl whose beta drifts
    up is accumulating junk tokens; one whose beta collapses is
    duplicating). ONE row: (n_points, n_tokens, v_types, beta, ln_k).

    Construction is exact end-to-end: per-doc token counts and per-token
    first-document ids are integer aggregates; the (N_d, V_d) curve is
    two cumulative sums over the doc-id order; the log-log least-squares
    fit quantizes ln N / ln V to ``quant`` micro-units (int64) and takes
    all five regression sums as DECIMAL(38,0), so accumulation order
    cannot perturb the fit (float log-sums are order-dependent; the
    lm_perplexity trick). beta / ln_k are fixed-order IEEE divisions of
    the exact sums.

    Scale shape: one token explode feeding two combinable groupBys, a
    keys-only lattice of O(#docs) checkpoint rows, and the global
    cumulative window over that lattice (at 100 TB, thin the lattice by
    sampling checkpoint doc-ids first — the fit needs hundreds of
    points, not billions).
    """
    toks = F.explode(F.filter(
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+"),
        lambda x: x != F.lit(""),
    )).alias("tok")
    tok_tbl = docs.select(F.col(id_col).alias("d"), toks).cache()
    per_doc = tok_tbl.groupBy("d").agg(F.count(F.lit(1)).alias("nt"))
    new_types = (
        tok_tbl.groupBy("tok").agg(F.min("d").alias("d"))
        .groupBy("d").agg(F.count(F.lit(1)).alias("nv"))
    )
    lattice = per_doc.join(new_types, "d", "left").na.fill({"nv": 0})
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    curve = lattice.select(
        "d",
        F.sum("nt").over(w).alias("N"),
        F.sum("nv").over(w).alias("V"),
    ).where((F.col("N") > 0) & (F.col("V") > 0))
    q = float(quant)
    pts = curve.select(
        F.round(F.log("N") * q).cast("long").alias("x"),
        F.round(F.log("V") * q).cast("long").alias("y"),
    )
    d38 = "decimal(38,0)"
    agg = pts.agg(
        F.count(F.lit(1)).cast(d38).alias("n"),
        F.sum(F.col("x").cast(d38)).alias("sx"),
        F.sum(F.col("y").cast(d38)).alias("sy"),
        F.sum((F.col("x").cast(d38) * F.col("x").cast(d38))).alias("sxx"),
        F.sum((F.col("x").cast(d38) * F.col("y").cast(d38))).alias("sxy"),
    )
    tot = curve.agg(F.max("N").alias("n_tokens"),
                    F.max("V").alias("v_types"))
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
    beta = num.cast("double") / den.cast("double")
    nn = F.col("n").cast("double")
    ln_k = ((F.col("sy").cast("double") / F.lit(q))
            - beta * (F.col("sx").cast("double") / F.lit(q))) / nn
    return agg.crossJoin(tot).select(
        F.col("n").cast("long").alias("n_points"),
        "n_tokens", "v_types",
        F.round(beta, 6).alias("beta"),
        F.round(ln_k, 6).alias("ln_k"),
    )


def kneser_ney_bigram(
    docs: DataFrame,
    discount: float = 0.75,
    min_count: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_decimals: int = 9,
) -> DataFrame:
    """Interpolated Kneser-Ney bigram LM table over the corpus — the
    model KenLM actually trains for the CCNet perplexity filter
    (Wenzek et al. 2020; Kneser & Ney 1995, Chen & Goodman 1999), where
    :func:`ngram_lm_perplexity` stands in with add-k smoothing.

    Per bigram type (w1, w2):

        P_KN(w2|w1) = max(c(w1 w2) - D, 0) / c(w1 •)
                      + D * N1+(w1 •) / c(w1 •) * N1+(• w2) / N1+(• •)

    with fixed discount ``D`` (0.75, Chen & Goodman's heuristic; exact
    dyadic so c2 - D is exact), c(w1 •) the bigram-prefix count (NOT the
    unigram token count — they differ at document ends), N1+(w1 •) /
    N1+(• w2) the distinct-continuation / distinct-history type counts,
    and N1+(• •) the total number of bigram types. Every input is an
    exact int64 count; the probability is one fixed-order IEEE double
    expression, identical in the DuckDB oracle, rounded once.

    Output: (w1, w2, c2, c1, n1_fwd, n1_bwd, p_kn) for bigram types with
    c2 >= min_count (counts over the FULL corpus either way).

    Scale: one bigram explode feeding four map-side-combinable count
    aggregations (two of them keyed groupBys, one keys-only distinct
    count, one 1-row total), then equi-joins back on the gram keys —
    AQE broadcasts the type-count sides when small. No Python anywhere.
    """
    toks = F.filter(
        F.split(F.trim(F.lower(F.col(text_col))), TOKEN_SPLIT_RE),
        lambda x: x != F.lit(""),
    )
    base = docs.select(toks.alias("__t")).where(F.size("__t") >= 2)
    bigrams = base.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("__t") - 2),
                lambda i: F.struct(
                    F.element_at("__t", i + 1).alias("w1"),
                    F.element_at("__t", i + 2).alias("w2"),
                ),
            )
        ).alias("g")
    ).select("g.w1", "g.w2")
    types = bigrams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    types = types.persist()
    pre = types.groupBy("w1").agg(
        F.sum("c2").alias("c1"),
        F.count(F.lit(1)).alias("n1_fwd"),
    )
    post = types.groupBy("w2").agg(F.count(F.lit(1)).alias("n1_bwd"))
    n_types = types.count()  # N1+(• •), exact integer in both engines
    d = float(discount)
    p_kn = (
        F.greatest(F.col("c2") - F.lit(d), F.lit(0.0)) / F.col("c1")
        + (F.lit(d) * F.col("n1_fwd") / F.col("c1"))
        * (F.col("n1_bwd") / F.lit(float(n_types)))
    )
    try:
        out = (
            types.join(pre, "w1")
            .join(post, "w2")
            .where(F.col("c2") >= int(min_count))
            .select(
                "w1", "w2",
                F.col("c2").cast("long").alias("c2"),
                F.col("c1").cast("long").alias("c1"),
                F.col("n1_fwd").cast("long").alias("n1_fwd"),
                F.col("n1_bwd").cast("long").alias("n1_bwd"),
                F.round(p_kn, round_decimals).alias("p_kn"),
            )
            .localCheckpoint()  # pin before dropping the cached types
        )
    finally:
        types.unpersist()
    return out


# The classic function-word stoplist RAKE splits candidate phrases on
# (Rose et al. 2010 use the Fox 1989 stoplist; this is the high-frequency
# core — the operator takes any list, this is just the default).
RAKE_STOPWORDS = (
    "a about above after again all am an and any are as at be because been"
    " before being below between both but by could did do does doing down"
    " during each few for from further had has have having he her here hers"
    " him his how i if in into is it its just me more most my no nor not of"
    " off on once only or other our out over own same she should so some"
    " such than that the their them then there these they this those"
    " through to too under until up very was we were what when where which"
    " while who whom why will with would you your"
).split()


def rake_keywords(
    docs: DataFrame,
    stopwords: list[str] | None = None,
    top_n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """RAKE keyword extraction (Rose, Engel, Cramer & Cowley 2010):
    candidate phrases are maximal stopword/punctuation-free token runs;
    each word scores deg(w)/freq(w) within the document (deg = summed
    length of the phrases containing w, freq = occurrence count); a
    phrase scores the sum of its words' scores; the per-document top-N
    phrases are the keywords.

    Determinism contract: deg and freq are exact int64 counts; each
    word score is quantized to round(deg/freq * 1e6) micro-units (one
    IEEE division + multiply, identical in the oracle) and phrase
    scores are SUMMED IN INTEGERS, so aggregation order cannot perturb
    the ranking; ties break on the phrase string (ASCII-binary in both
    engines) so row_number is reproducible.

    Output: (id, phrase, n_words, n_occ, score_micro, rank), rank 1..N
    per document by (score desc, phrase asc); duplicate phrase texts
    collapse to one row carrying their occurrence count.

    Scale: everything is per-document — the phrase-id window, the two
    count groupBys, and the rank window all partition on the doc id, so
    there is no corpus-wide hot key; shuffles carry (id, token) /
    (id, phrase) keys only. No Python anywhere.
    """
    stops = RAKE_STOPWORDS if stopwords is None else list(stopwords)
    toks = F.filter(
        F.split(
            F.regexp_replace(F.lower(F.col(text_col)),
                             r"[^a-z0-9'\s]+", " § "),
            r"\s+",
        ),
        lambda x: x != F.lit(""),
    )
    tok = (
        docs.select(F.col(id_col).alias("id"),
                    F.posexplode(toks).alias("i", "tok"))
    )
    brk = F.col("tok").isin(*stops) | (F.col("tok") == "§")
    w = Window.partitionBy("id").orderBy("i")
    tok = tok.select(
        "id", "i", "tok",
        F.sum(brk.cast("int")).over(w).alias("pid"),
        brk.alias("brk"),
    ).where(~F.col("brk"))
    plen = tok.groupBy("id", "pid").agg(F.count(F.lit(1)).alias("plen"))
    words = tok.join(plen, ["id", "pid"])
    wstat = words.groupBy("id", "tok").agg(
        F.count(F.lit(1)).alias("freq"),
        F.sum("plen").alias("deg"),
    ).select(
        "id", "tok",
        F.round(F.col("deg") / F.col("freq") * 1e6)
         .cast("long").alias("wscore"),
    )
    phrases = (
        words.join(wstat, ["id", "tok"])
        .groupBy("id", "pid")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("i", "tok"))),
                    lambda s: s["tok"],
                ), " ",
            ).alias("phrase"),
            F.count(F.lit(1)).alias("n_words"),
            F.sum("wscore").alias("score_micro"),
        )
    )
    uniq = phrases.groupBy("id", "phrase").agg(
        F.max("n_words").alias("n_words"),
        F.count(F.lit(1)).alias("n_occ"),
        F.max("score_micro").alias("score_micro"),
    )
    rw = Window.partitionBy("id").orderBy(
        F.col("score_micro").desc(), F.col("phrase"))
    return (
        uniq.select(
            F.col("id").alias(id_col), "phrase",
            F.col("n_words").cast("long").alias("n_words"),
            F.col("n_occ").cast("long").alias("n_occ"),
            F.col("score_micro").cast("long").alias("score_micro"),
            F.row_number().over(rw).alias("rank"),
        )
        .where(F.col("rank") <= int(top_n))
    )


def keyness_g2(
    docs: DataFrame,
    focus_col: str = "in_focus",
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 5,
) -> DataFrame:
    """Dunning log-likelihood keyness (Dunning 1993, "Accurate Methods
    for the Statistics of Surprise and Coincidence"): which terms are
    over/under-represented in a focus slice vs the rest of the corpus —
    the standard corpus-linguistics keyword test, and the slice-drift
    diagnostic of a training-data pipeline (what vocabulary did this
    domain/date/language filter change?).

    Per term with a + b >= ``min_count``:
      G2 = 2 * (a*ln(a/e1) + b*ln(b/e2)),  e1 = NA*(a+b)/(NA+NB),
                                           e2 = NB*(a+b)/(NA+NB)
    (0*ln(0) = 0), with ``direction`` +1 when the focus rate a/NA exceeds
    b/NB. All counts are exact int64 one-shuffle aggregates; the final
    expression is one float formula an oracle spells identically.

    Returns (term, a, b, g2, direction).
    """
    toks = F.filter(
        F.split(F.trim(F.lower(F.col(text_col))), TOKEN_SPLIT_RE),
        lambda x: x != F.lit(""),
    )
    t = docs.select(F.col(focus_col).alias("foc"),
                    F.explode(toks).alias("term"))
    counts = t.groupBy("term").agg(
        F.sum(F.when(F.col("foc"), 1).otherwise(0)).alias("a"),
        F.sum(F.when(F.col("foc"), 0).otherwise(1)).alias("b"),
    )
    tot = t.agg(
        F.sum(F.when(F.col("foc"), 1).otherwise(0)).alias("na"),
        F.sum(F.when(F.col("foc"), 0).otherwise(1)).alias("nb"),
    )
    j = counts.where(F.col("a") + F.col("b") >= min_count) \
              .crossJoin(F.broadcast(tot))
    e1 = F.col("na") * (F.col("a") + F.col("b")) / (F.col("na") + F.col("nb"))
    e2 = F.col("nb") * (F.col("a") + F.col("b")) / (F.col("na") + F.col("nb"))
    term_a = F.when(F.col("a") > 0, F.col("a") * F.log(F.col("a") / e1)) \
              .otherwise(F.lit(0.0))
    term_b = F.when(F.col("b") > 0, F.col("b") * F.log(F.col("b") / e2)) \
              .otherwise(F.lit(0.0))
    g2 = 2.0 * (term_a + term_b)
    direction = F.when(F.col("a") * F.col("nb") > F.col("b") * F.col("na"),
                       1).otherwise(-1)
    return j.select("term", "a", "b", F.round(g2, 6).alias("g2"),
                    direction.alias("direction"))


def burrows_delta(
    docs: DataFrame,
    candidates: DataFrame,
    k_words: int = 30,
    id_col: str = "doc_id",
    text_col: str = "text",
    cand_id_col: str = "cand_id",
) -> DataFrame:
    """Burrows' Delta (Burrows 2002; Evert et al. 2017 formulation) —
    the standard stylometric attribution distance: z-score the relative
    frequencies of the ``k_words`` most frequent corpus terms (the
    "function words"), then Delta(doc, candidate) = mean |z_doc - z_cand|.

    ``candidates`` is the SMALL profile table (cand_id, text) — candidate
    author samples, broadcast everywhere; ``docs`` is the big table.
    Corpus statistics (term means/stds over docs, population std) come
    from ``docs`` only, so candidate profiles are scored in the docs'
    z-space. Missing terms count as frequency 0 (the zeros matter — they
    carry authorship signal).

    Scale shape: one explode+groupBy over docs for counts; the k-word
    vocabulary and its (mu, sigma) moments are tiny broadcasts; the
    doc x candidate x k join is |docs| * |candidates| * k rows of pure
    JVM arithmetic — linear in the corpus for a bounded candidate set.

    Returns (doc_id, cand_id, delta, rank) — rank 1 is the attribution.
    """
    from pyspark.sql import Window

    def term_freqs(df, idc):
        toks = F.filter(
            F.split(F.trim(F.lower(F.col(text_col))), TOKEN_SPLIT_RE),
            lambda x: x != F.lit(""),
        )
        t = df.select(F.col(idc).alias("_id"), F.explode(toks).alias("term"))
        cnt = t.groupBy("_id", "term").agg(F.count("*").alias("c"))
        length = t.groupBy("_id").agg(F.count("*").alias("len"))
        return cnt, length

    cnt, dlen = term_freqs(docs, id_col)
    n_docs = docs.count()
    vocab = (
        cnt.groupBy("term").agg(F.sum("c").alias("tot"))
        .orderBy(F.col("tot").desc(), F.col("term").asc())
        .limit(k_words)
        .select("term")
    )
    # per-(doc, term) relative frequency over the k vocabulary
    f = (cnt.join(F.broadcast(vocab), "term")
            .join(dlen, "_id")
            .select("_id", "term", (F.col("c") / F.col("len")).alias("f")))
    # population moments over ALL docs (absent terms are zeros: they
    # contribute to n but not to the sums)
    mom = f.groupBy("term").agg(F.sum("f").alias("sf"),
                                F.sum(F.col("f") * F.col("f")).alias("sff"))
    mu = F.col("sf") / n_docs
    sg = F.sqrt(F.col("sff") / n_docs - mu * mu)
    stats = F.broadcast(
        mom.select("term", mu.alias("mu"), sg.alias("sigma")))

    ccnt, clen = term_freqs(candidates, cand_id_col)
    cf = (ccnt.join(F.broadcast(vocab), "term")
              .join(clen, "_id")
              .select(F.col("_id").alias("cid"), "term",
                      (F.col("c") / F.col("len")).alias("cf")))
    # dense doc x vocab grid so zero frequencies are explicit
    dgrid = (docs.select(F.col(id_col).alias("_id"))
                 .crossJoin(F.broadcast(vocab)))
    dz = (dgrid.join(f, ["_id", "term"], "left")
               .join(stats, "term")
               .select("_id", "term",
                       ((F.coalesce(F.col("f"), F.lit(0.0)) - F.col("mu"))
                        / F.col("sigma")).alias("z")))
    cgrid = (candidates.select(F.col(cand_id_col).alias("cid"))
                       .crossJoin(F.broadcast(vocab)))
    cz = F.broadcast(
        cgrid.join(cf, ["cid", "term"], "left")
             .join(stats, "term")
             .select("cid", "term",
                     ((F.coalesce(F.col("cf"), F.lit(0.0)) - F.col("mu"))
                      / F.col("sigma")).alias("cz")))
    pairs = (dz.join(cz, "term")
               .groupBy("_id", "cid")
               .agg((F.sum(F.abs(F.col("z") - F.col("cz"))) / k_words)
                    .alias("delta")))
    return pairs.select(F.col("_id").alias(id_col),
                        F.col("cid").alias(cand_id_col),
                        F.round("delta", 6).alias("delta")) \
                .withColumn("rank", F.row_number().over(
                    Window.partitionBy(id_col).orderBy(
                        F.col("delta").asc(), F.col(cand_id_col).asc())))


def js_divergence(
    docs: DataFrame,
    focus_col: str = "in_focus",
    text_col: str = "text",
) -> DataFrame:
    """Jensen-Shannon divergence (Lin 1991) between the token
    distributions of two corpus slices — the bounded, symmetric drift
    metric that complements :func:`keyness_g2`'s per-term test: one
    number for "how different did this filter/domain/date slice make the
    corpus", 0 = identical, ln(2) = disjoint (nats).

    JSD = 0.5*KL(P||M) + 0.5*KL(Q||M), M = (P+Q)/2, zero-count terms
    contribute nothing to their side's KL (0*ln(0) = 0 and M > 0
    whenever either side is present — no smoothing needed).

    All counts are exact int64 one-shuffle aggregates; the divergence is
    one ln expression per term summed over the (tiny) vocabulary.
    Returns one row: (n_terms, na, nb, kl_p, kl_q, jsd).
    """
    toks = F.filter(
        F.split(F.trim(F.lower(F.col(text_col))), TOKEN_SPLIT_RE),
        lambda x: x != F.lit(""),
    )
    t = docs.select(F.col(focus_col).alias("foc"),
                    F.explode(toks).alias("term"))
    counts = t.groupBy("term").agg(
        F.sum(F.when(F.col("foc"), 1).otherwise(0)).alias("a"),
        F.sum(F.when(F.col("foc"), 0).otherwise(1)).alias("b"),
    )
    tot = t.agg(
        F.sum(F.when(F.col("foc"), 1).otherwise(0)).alias("na"),
        F.sum(F.when(F.col("foc"), 0).otherwise(1)).alias("nb"),
    )
    j = counts.crossJoin(F.broadcast(tot))
    p = F.col("a") / F.col("na")
    q = F.col("b") / F.col("nb")
    mm = (p + q) / 2.0
    kl_p_t = F.when(F.col("a") > 0, p * F.log(p / mm)).otherwise(F.lit(0.0))
    kl_q_t = F.when(F.col("b") > 0, q * F.log(q / mm)).otherwise(F.lit(0.0))
    return (
        j.agg(F.count(F.lit(1)).alias("n_terms"),
              F.max("na").alias("na"), F.max("nb").alias("nb"),
              F.sum(kl_p_t).alias("klp"), F.sum(kl_q_t).alias("klq"))
        .select("n_terms", "na", "nb",
                F.round(F.col("klp"), 9).alias("kl_p"),
                F.round(F.col("klq"), 9).alias("kl_q"),
                F.round((F.col("klp") + F.col("klq")) / 2.0, 9)
                 .alias("jsd"))
    )


def mattr(docs: DataFrame, window: int = 20, id_col: str = "doc_id",
          text_col: str = "text") -> DataFrame:
    """MATTR — moving-average type-token ratio (Covington & McFall,
    J. Quantitative Linguistics 2010), the length-robust lexical-
    diversity measure (plain TTR shrinks with document length, making
    cross-length comparisons meaningless): average the type-token ratio
    over every length-``window`` sliding window of the token stream;
    documents shorter than the window fall back to their whole-document
    TTR (the reference implementation's rule).

    Exactness: per-window distinct counts are exact integers and MATTR
    = sum(distinct_w) / (n_windows * window) is ONE float division of
    exact int64 sums — no per-window float mean to accumulate.

    Scale shape: O(tokens) — the naive form explodes every token to
    its <= ``window`` covering window-starts and countDistincts each
    window; instead, the LAST-OCCURRENCE closed form counts, per
    token, how many windows see it as their distinct representative:
    token at ``pos`` with previous same-term occurrence ``prev`` is
    the first of its term in window-start s iff s > prev, so its
    contribution is |[max(0, pos-W+1), min(pos, n-W)] ∩ (prev, inf)|
    — one lag window + one groupBy, no fan-out (9s -> s at sf0.1).
    Tokenization is the lower/whitespace contract shared with
    operators/index.py so the oracle reproduces positions in SQL.
    Returns (doc_id, n_tokens, n_windows, sum_distinct, mattr)."""
    from pyspark.sql import Window as _W

    toks = F.filter(
        F.split(F.trim(F.lower(F.col(text_col))), TOKEN_SPLIT_RE),
        lambda x: x != F.lit(""))
    pos = docs.select(
        F.col(id_col).alias("doc"), F.size(toks).alias("n"),
        F.posexplode(toks).alias("pos", "term"))
    W = int(window)
    long_docs = pos.where(F.col("n") >= W)
    wprev = _W.partitionBy("doc", "term").orderBy("pos")
    prev = F.coalesce(F.lag("pos").over(wprev), F.lit(-1))
    lo = F.greatest(F.col("pos") - (W - 1), F.lit(0))
    hi = F.least(F.col("pos"), F.col("n") - W)
    contrib = F.greatest(
        hi - F.greatest(lo, prev + 1) + 1, F.lit(0))
    agg_long = (long_docs.select("doc", "n", contrib.alias("c"))
                .groupBy("doc", "n")
                .agg(F.sum("c").alias("sum_distinct"))
                .select("doc", F.col("n").alias("n_tokens"),
                        (F.col("n") - W + 1).cast("long")
                        .alias("n_windows"),
                        F.col("sum_distinct").cast("long")
                        .alias("sum_distinct"),
                        F.round(F.col("sum_distinct")
                                / ((F.col("n") - W + 1) * F.lit(W))
                                .cast("double"), 9).alias("mattr")))
    short = (pos.where((F.col("n") > 0) & (F.col("n") < W))
             .groupBy("doc", "n")
             .agg(F.countDistinct("term").alias("d"))
             .select("doc", F.col("n").alias("n_tokens"),
                     F.lit(1).cast("long").alias("n_windows"),
                     F.col("d").alias("sum_distinct"),
                     F.round(F.col("d") / F.col("n").cast("double"), 9)
                     .alias("mattr")))
    return agg_long.unionByName(short) \
        .withColumnRenamed("doc", id_col)


def lexrank_sentences(docs: DataFrame, top_k: int = 2, n_iters: int = 4,
                      damping_pct: int = 85, scale: int = 10**12,
                      id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Extractive sentence ranking (LexRank, Erkan & Radev, JAIR 2004 —
    the summarization/densest-sentence selector; for curation it picks
    each document's most central sentences before expensive scoring):
    sentences are nodes, intra-document edges weighted by the DISTINCT
    shared-token count (the documented integer simplification of
    idf-cosine — exact and engine-reproducible where tf-idf floats are
    not), ranked by 4 rounds of WEIGHTED PageRank in exact int64 fixed
    point (contribution = rank * w div strength; teleport and dangling
    mass normalized per document).

    Scale shape: sentence split + token explode are narrow; the pair
    join is per-document (bounded by sentences-per-doc squared over
    shared tokens); every round is one keyed join + combinable groupBy,
    all keyed by (doc, sentence). Ties in the final top-k break to the
    smallest sentence index. Tokenization/splitting use RE2-safe
    patterns shared with the oracle. Returns
    (doc_id, sidx, rank_units, sentence) — top_k rows per doc."""
    from pyspark.sql import Window

    sents = docs.select(
        F.col(id_col).alias("doc"),
        F.posexplode(F.filter(
            F.split(F.col(text_col), r"\.\s+"),
            lambda x: F.trim(x) != F.lit(""))).alias("sidx", "sentence"))
    toks = sents.select(
        "doc", "sidx",
        F.explode(F.filter(
            F.split(F.trim(F.lower(F.col("sentence"))), r"\s+"),
            lambda x: x != F.lit(""))).alias("term")).distinct()
    ta = toks.select("doc", F.col("sidx").alias("sa"), "term")
    tb = toks.select(F.col("doc").alias("doc2"),
                     F.col("sidx").alias("sb"),
                     F.col("term").alias("term2"))
    w = (ta.join(tb, (F.col("doc") == F.col("doc2"))
                 & (F.col("term") == F.col("term2"))
                 & (F.col("sa") != F.col("sb")))
         .groupBy("doc", "sa", "sb")
         .agg(F.count(F.lit(1)).alias("w")).localCheckpoint())
    strength = w.groupBy("doc", "sa").agg(F.sum("w").alias("st"))
    nd = sents.groupBy("doc").agg(F.count(F.lit(1)).alias("n"))
    ranks = sents.select("doc", "sidx").join(nd, "doc").select(
        "doc", "sidx",
        F.expr(f"CAST({int(scale)} AS BIGINT) div n").alias("r"),
        "n").localCheckpoint()
    d = int(damping_pct)
    for _ in range(n_iters):
        contrib = (w.join(strength, ["doc", "sa"])
                   .join(ranks.select("doc",
                                      F.col("sidx").alias("sa"),
                                      F.col("r").alias("ra")),
                         ["doc", "sa"])
                   .select("doc", F.col("sb").alias("sidx"),
                           F.expr("ra * w div st").alias("c")))
        inflow = contrib.groupBy("doc", "sidx").agg(F.sum("c").alias("s"))
        dang = (ranks.join(strength.select("doc",
                                           F.col("sa").alias("sidx")),
                           ["doc", "sidx"], "left_anti")
                .groupBy("doc").agg(F.sum("r").alias("dg")))
        ranks = (ranks.drop("r")
                 .join(inflow, ["doc", "sidx"], "left")
                 .join(dang, "doc", "left")
                 .select("doc", "sidx", "n",
                         (F.expr(f"((100 - {d}) * CAST({int(scale)} AS "
                                 f"BIGINT)) div (100 * n)")
                          + F.expr(f"({d} * (coalesce(s, 0) "
                                   f"+ (coalesce(dg, 0) div n))) div 100")
                          ).alias("r"))
                 .localCheckpoint())
    wtop = Window.partitionBy("doc").orderBy(F.desc("r"), F.asc("sidx"))
    return (ranks.withColumn("rn", F.row_number().over(wtop))
            .where(F.col("rn") <= top_k)
            .join(sents, ["doc", "sidx"])
            .select(F.col("doc").alias(id_col), "sidx",
                    F.col("r").alias("rank_units"), "sentence"))


def smith_waterman_pairs(
    chars: DataFrame,
    pairs: DataFrame,
    match: int = 3,
    mismatch: int = -1,
    gap: int = 2,
    tid_col: str = "tid",
    pos_col: str = "pos",
    ch_col: str = "ch",
    max_len: int = 256,
) -> DataFrame:
    """Smith-Waterman local alignment score for each (tid_a, tid_b)
    pair of character sequences (Smith & Waterman 1981):

        H(i,j) = max(0, H(i-1,j-1) + s(a_i,b_j),
                     H(i-1,j) - gap, H(i,j-1) - gap)

    answer = max cell. All-integer DP — exact BIGINT everywhere, the
    near-dup DIFF primitive at the character level (which substring
    actually matches, not just how many n-grams). One Arrow group per
    explicit pair (never all-pairs); ``max_len`` guards the O(n*m)
    table loudly. Returns (tid_a, tid_b, n_a, n_b, sw_score)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    a = chars.select(F.col(tid_col).alias("tid_a"),
                     F.col(pos_col).alias("ia"), F.col(ch_col).alias("ca"))
    b = chars.select(F.col(tid_col).alias("tid_b"),
                     F.col(pos_col).alias("ib"), F.col(ch_col).alias("cb"))
    j = pairs.join(a, "tid_a").join(b, "tid_b")

    def run(key, pdf: pd.DataFrame) -> pd.DataFrame:
        aa = (pdf[["ia", "ca"]].drop_duplicates()
              .sort_values("ia", ignore_index=True))
        bb = (pdf[["ib", "cb"]].drop_duplicates()
              .sort_values("ib", ignore_index=True))
        n, m = len(aa), len(bb)
        if n > max_len or m > max_len:
            raise ValueError(
                f"smith_waterman_pairs: sequence over max_len={max_len}")
        ca = aa["ca"].to_numpy()
        cb = bb["cb"].to_numpy()
        h = np.zeros((n + 1, m + 1), dtype=np.int64)
        best = 0
        for i2 in range(1, n + 1):
            for j2 in range(1, m + 1):
                s = match if ca[i2 - 1] == cb[j2 - 1] else mismatch
                v = max(0, h[i2 - 1, j2 - 1] + s,
                        h[i2 - 1, j2] - gap, h[i2, j2 - 1] - gap)
                h[i2, j2] = v
                if v > best:
                    best = v
        return pd.DataFrame([{
            "tid_a": key[0], "tid_b": key[1],
            "n_a": n, "n_b": m, "sw_score": int(best),
        }])

    return j.groupBy("tid_a", "tid_b").applyInPandas(
        run, schema="tid_a long, tid_b long, n_a long, n_b long, "
                    "sw_score long")
