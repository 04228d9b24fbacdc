"""Distributed byte-pair-encoding tokenizer training and encoding.

BPE merge learning (Sennrich, Haddow & Birch, ACL 2016 — the subword
tokenizer construction used by GPT-2-family vocabularies) over the
word-TYPE table, which is what makes it distributable: the corpus is
reduced once to (word, count) — a groupBy that shrinks web-scale text by
orders of magnitude — and every merge iteration is then one map-side-
combinable pair-count aggregation plus one narrow array rewrite. Only
the single winning pair (1 row) ever reaches the driver per iteration;
that drives the NEXT iteration's expression, so it is inherently a
driver-sequenced loop, exactly like the reference implementations.

Merge application is a leftmost-greedy non-overlapping rewrite done as a
JVM ``aggregate`` fold over the symbol array (no Python in the loop):
append each symbol, but when the accumulator tail equals the merge left
and the incoming symbol equals the merge right, replace the tail with
the concatenation. Because the merged symbol is strictly longer than the
left symbol, it can never re-merge within the same iteration, which is
precisely the greedy semantics (handles ``aaa`` under merge (a,a) ->
``[aa, a]``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END_OF_WORD = "</w>"


def _word_types(docs: DataFrame, text_col: str) -> DataFrame:
    """(word, cnt) for whitespace-split lowercased tokens."""
    return (
        docs.select(
            F.explode(
                F.split(F.trim(F.lower(F.col(text_col))), r"\s+", -1)
            ).alias("word")
        )
        .where(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _init_symbols(words: DataFrame) -> DataFrame:
    chars = F.transform(
        F.sequence(F.lit(1), F.length("word")),
        lambda i: F.col("word").substr(i, F.lit(1)),
    )
    return words.select(
        "word", "cnt",
        F.concat(chars, F.array(F.lit(END_OF_WORD))).alias("syms"),
    )


def _apply_merge(syms, left: str, right: str):
    """Leftmost-greedy non-overlapping replacement of (left, right)."""
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1),
                F.array(F.lit(left + right)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_train(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
) -> DataFrame:
    """Learn ``n_merges`` BPE merge rules from the corpus.

    Ties on pair count break deterministically by (left ASC, right ASC),
    so the result is independent of partitioning. Returns the ordered
    merge table (rank, left, right, merged, pair_count).
    """
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    spark = docs.sparkSession
    st = _init_symbols(_word_types(docs, text_col)).localCheckpoint()
    rules: list[tuple[int, str, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        pair = F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("syms") - 1),
                lambda i: F.struct(
                    F.element_at("syms", i).alias("l"),
                    F.element_at("syms", i + 1).alias("r"),
                ),
            )
        ).alias("p")
        best = (
            st.where(F.size("syms") >= 2)
            .select("cnt", pair)
            .groupBy("p.l", "p.r")
            .agg(F.sum("cnt").alias("c"))
            .orderBy(F.col("c").desc(), F.col("l"), F.col("r"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        left, right, c = best[0]["l"], best[0]["r"], int(best[0]["c"])
        rules.append((rank, left, right, left + right, c))
        st = st.select(
            "word", "cnt", _apply_merge(F.col("syms"), left, right).alias("syms")
        ).localCheckpoint()
    return spark.createDataFrame(
        rules, "rank int, left string, right string, merged string, "
               "pair_count long",
    )


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Encode documents with an ordered merge list: per-word symbol
    arrays rewritten by each rule in rank order (JVM folds chained —
    no shuffle, the corpus streams once). Returns (id, n_words,
    n_tokens, tokens) where tokens is the concatenated subword stream.
    """
    words = F.split(F.trim(F.lower(F.col(text_col))), r"\s+", -1)
    chars = lambda w: F.concat(  # noqa: E731
        F.transform(
            F.sequence(F.lit(1), F.length(w)),
            lambda i: w.substr(i, F.lit(1)),
        ),
        F.array(F.lit(END_OF_WORD)),
    )
    sym_stream = F.transform(
        F.filter(words, lambda w: F.length(w) > 0), lambda w: chars(w)
    )
    for left, right in merges:
        sym_stream = F.transform(
            sym_stream, lambda s: _apply_merge(s, left, right)  # noqa: B023
        )
    return docs.select(
        id_col,
        F.size(F.filter(words, lambda w: F.length(w) > 0)).alias("n_words"),
        F.size(F.flatten(sym_stream)).alias("n_tokens"),
        F.flatten(sym_stream).alias("tokens"),
    )
