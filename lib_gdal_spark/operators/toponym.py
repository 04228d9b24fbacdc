"""Gazetteer toponym resolution (geotagging) over a document corpus.

The classic web-scale geotagging stage (beyond the reference, which
stops at coordinate handling once coordinates exist — ``ogr_geocoding``
in GDAL delegates to remote services, `core/ogr/ogr_geocoding.cpp`):
extract dictionary place-name mentions from free text and resolve each
document to one location with the population-prior heuristic (most
populous matched place wins — the standard baseline in toponym
resolution literature, e.g. Leidner 2007).

Spark shape, 100 TB-safe:
- tokenize = narrow map (split + explode), no shuffle;
- the gazetteer is the SMALL side and is always broadcast — here it is
  derived deterministically from the corpus vocabulary (a pseudo-random
  third of the distinct >=5-char tokens, coordinates/population from an
  unrolled 31-polynomial ascii hash) so tests need no external fixture,
  but the join shape is identical when a real GeoNames-style dim table
  is supplied;
- disambiguation = one row_number window partitioned by doc_id (a
  keyed shuffle on doc_id only, combinable upstream).

Every op is plain string/integer math, so the DuckDB oracle replays the
identical sequence and values match exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# polynomial fold over the first 8 chars: ascii('') == 0 pads short
# tokens, 31^8 * 128 < 2^63 so the fold never overflows a long
_HASH_CHARS = 8


def token_hash(tok: Column) -> Column:
    """Deterministic positive long from the first 8 chars of a token —
    unrolled acc = acc*31 + ascii(char), identical in SQL."""
    acc = F.lit(0).cast("long")
    for i in range(1, _HASH_CHARS + 1):
        acc = acc * 31 + F.ascii(F.substring(tok, i, 1)).cast("long")
    return acc


def token_hash_sql(expr: str) -> str:
    """The DuckDB twin of :func:`token_hash` as a SQL expression."""
    acc = "CAST(0 AS BIGINT)"
    for i in range(1, _HASH_CHARS + 1):
        acc = f"({acc} * 31 + ascii(substr({expr}, {i}, 1)))"
    return acc


def corpus_gazetteer(docs: DataFrame, text_col: str = "text",
                     min_len: int = 5, keep_mod: int = 3) -> DataFrame:
    """Synthetic gazetteer from the corpus vocabulary: distinct tokens
    of length >= ``min_len`` whose hash % ``keep_mod`` == 0 are places;
    lat/lon/population derive from the hash. Returns
    (place, lat, lon, pop). In production this is replaced by a real
    gazetteer dim table of the same schema; the join shape is unchanged
    (small side, broadcast)."""
    toks = docs.select(
        F.explode(F.split(F.col(text_col), " ")).alias("place"))
    vocab = (toks.filter(F.length("place") >= min_len)
             .select("place").distinct())
    h = token_hash(F.col("place"))
    return (vocab.withColumn("h", h)
            .filter(F.col("h") % keep_mod == 0)
            .select(
                "place",
                ((F.col("h") % 17000) / 100.0 - 85.0).alias("lat"),
                (((F.col("h") * 7919) % 36000) / 100.0 - 180.0)
                .alias("lon"),
                (F.col("h") % 1000000).alias("pop")))


def toponym_resolve(docs: DataFrame, gazetteer: DataFrame,
                    id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Resolve each document to its most-populous matched place.

    Returns (doc_id, place, pop, lat, lon, n_mentions, n_places) — one
    row per document that mentions at least one gazetteer entry;
    ``n_mentions`` counts total mention tokens, ``n_places`` distinct
    matched places. Ties on population break on place name ascending
    (deterministic)."""
    toks = docs.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), " ")).alias("place"))
    hits = toks.join(F.broadcast(gazetteer), "place")
    per_place = hits.groupBy(id_col, "place", "pop", "lat", "lon").agg(
        F.count(F.lit(1)).alias("mentions"))
    w = (Window.partitionBy(id_col)
         .orderBy(F.col("pop").desc(), F.col("place").asc()))
    totals = (Window.partitionBy(id_col)
              .rowsBetween(Window.unboundedPreceding,
                           Window.unboundedFollowing))
    return (per_place
            .withColumn("rn", F.row_number().over(w))
            .withColumn("n_mentions", F.sum("mentions").over(totals))
            .withColumn("n_places", F.count(F.lit(1)).over(totals))
            .filter(F.col("rn") == 1)
            .select(id_col, "place", "pop", "lat", "lon",
                    "n_mentions", "n_places"))
