"""Inverted-index construction and positional phrase search over the
``documents`` table — the retrieval-side primitives of a web-scale text
pipeline (the index BM25 / phrase queries run against; complements
``textops.bm25_scores`` which scores an ad-hoc query without an index).

Distributed shapes:
- **inverted_index**: one posexplode to (term, doc, pos) — O(corpus
  tokens) rows, keys-only — then two map-side-combinable aggregates
  (per (term, doc) position list, per term posting list). The posting
  list is serialized canonically (docs ascending, positions ascending)
  so the output is deterministic under any parallelism. Per-term
  posting lists are the natural unit of a sharded index: the final
  groupBy(term) IS the index partitioning a real deployment would use.
  A stop-word-grade hot term makes one big posting row, not a skewed
  join — nothing downstream joins on term.
- **phrase_search**: positional adjacency — docs where ``w1`` is
  immediately followed by ``w2`` — as an equi-join of the two terms'
  (doc, pos) postings on (doc, pos+1). Both sides are single-term
  selections (tiny next to the corpus), so the join is
  broadcast-friendly; the corpus itself is touched once for the
  explode.

Tokenization matches ``textops.TOKEN_SPLIT_RE`` (whitespace split of
the trimmed, lower-cased text; positions are 0-based over the
non-empty tokens) so the same positions are reproducible in ANSI SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lib_gdal_spark.operators.textops import TOKEN_SPLIT_RE


def _positions(text_col: str) -> Column:
    toks = F.filter(
        F.split(F.trim(F.lower(F.col(text_col))), TOKEN_SPLIT_RE),
        lambda x: x != F.lit(""),
    )
    return F.posexplode(toks)


def term_postings(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(term, doc_id, pos) — the exploded positional postings stream."""
    return docs.select(
        F.col(id_col).alias("doc_id"), _positions(text_col).alias("pos", "term")
    ).select("term", "doc_id", "pos")


def inverted_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 1,
) -> DataFrame:
    """Positional inverted index: one row per term.

    Columns: ``term``, ``df`` (documents containing it), ``tf`` (total
    occurrences), ``postings`` — the canonical string
    ``doc:pos,pos,...;doc:pos,...`` with docs ascending and positions
    ascending, byte-identical regardless of partitioning.
    """
    p = term_postings(docs, id_col, text_col)
    per_doc = p.groupBy("term", "doc_id").agg(
        F.concat(
            F.col("doc_id").cast("string"),
            F.lit(":"),
            F.array_join(F.sort_array(F.collect_list("pos")), ","),
        ).alias("entry"),
        F.count("*").alias("tf_doc"),
    )
    out = per_doc.groupBy("term").agg(
        F.count("*").cast("long").alias("df"),
        F.sum("tf_doc").cast("long").alias("tf"),
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct("doc_id", "entry"))
                ),
                lambda s: s["entry"],
            ),
            ";",
        ).alias("postings"),
    )
    if min_df > 1:
        out = out.where(F.col("df") >= min_df)
    return out


def phrase_search(
    docs: DataFrame,
    w1: str,
    w2: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Docs where token ``w1`` is immediately followed by ``w2``:
    (doc_id, n_hits, first_pos) per matching document."""
    p = term_postings(docs, id_col, text_col)
    a = p.where(F.col("term") == w1.lower()).select(
        "doc_id", F.col("pos").alias("p1")
    )
    b = p.where(F.col("term") == w2.lower()).select(
        "doc_id", (F.col("pos") - 1).alias("p1")
    )
    return (
        a.join(b, ["doc_id", "p1"])
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_hits"),
            F.min("p1").cast("long").alias("first_pos"),
        )
    )
