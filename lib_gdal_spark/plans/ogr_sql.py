"""OGR SQL dialect semantics, encoded once as DataFrame helpers.

The reference's SWQ engine differs from ANSI/Spark SQL in three load-bearing
ways (SURVEY.md §2.2/§2.3); every engine query goes through these helpers so
the semantics are applied consistently:

1. **Two-valued logic**: a comparison involving NULL yields boolean FALSE,
   never UNKNOWN (``core/ogr/swq_op_general.cpp:318-343``). Arithmetic with
   NULL stays NULL.
2. **LIKE is case-insensitive**, with optional ESCAPE
   (``core/ogr/swq_op_general.cpp:56-103``).
3. **LEFT JOIN is first-match-only**: each primary row pairs with at most one
   secondary row — the first in the secondary's storage order
   (``drivers/ogr_gensql.cpp:1294-1325``); a NULL primary key skips the probe
   and NULL-pads (``:1310-1316``).

Also provides the three SWQ query modes (``core/ogr/swq.h:265-267``):
RECORDSET (plain select), SUMMARY_RECORD (whole-table aggregates -> one row),
DISTINCT_LIST (SELECT DISTINCT col, NULLs first).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def ogr_bool(cmp: Column) -> Column:
    """Collapse three-valued logic to OGR's two-valued: NULL -> FALSE."""
    return F.coalesce(cmp, F.lit(False))


def ogr_eq(a: Column, b: Column) -> Column:
    return ogr_bool(a == b)


def ogr_ne(a: Column, b: Column) -> Column:
    return ogr_bool(a != b)


def ogr_gt(a: Column, b: Column) -> Column:
    return ogr_bool(a > b)


def ogr_ge(a: Column, b: Column) -> Column:
    return ogr_bool(a >= b)


def ogr_lt(a: Column, b: Column) -> Column:
    return ogr_bool(a < b)


def ogr_le(a: Column, b: Column) -> Column:
    return ogr_bool(a <= b)


def ogr_between(x: Column, lo: Column, hi: Column) -> Column:
    """BETWEEN is rewritten to >= AND <= (``core/ogr/swq.h:138``)."""
    return ogr_bool((x >= lo) & (x <= hi))


def ogr_like(col: Column, pattern: str, escape: str | None = None) -> Column:
    """Case-insensitive LIKE (tolower both sides, ``swq_op_general.cpp:56``),
    with optional ESCAPE (grammar ``swq_parser.y:254-266``)."""
    if escape:
        # Column.like has no escape arg; the 3-arg SQL builtin does
        return ogr_bool(F.call_function(
            "like", F.lower(col), F.lit(pattern.lower()), F.lit(escape)
        ))
    return ogr_bool(F.lower(col).like(pattern.lower()))


def ogr_in(col: Column, values: list) -> Column:
    """IN over a literal list (the only form the dialect has,
    ``swq_parser.y:106``)."""
    return ogr_bool(col.isin(values))


def hstore_get_value(col: Column, key: str) -> Column:
    """``HSTORE_GET_VALUE('"k"=>"v", ...', key)`` (``core/ogr/swq.h:417``)."""
    m = F.str_to_map(F.regexp_replace(col, '"', ""), F.lit(","), F.lit("=>"))
    return m[F.lit(key)]


def first_match_left_join(
    primary: DataFrame,
    secondary: DataFrame,
    on: Column,
    primary_key: str,
    secondary_order: str,
) -> DataFrame:
    """OGR LEFT JOIN: at most one (the first) secondary match per primary row.

    ``secondary_order`` stands in for the secondary layer's storage (FID)
    order, which defines "first" in the reference.

    The window partitions by a per-row id generated on the primary side, not
    by ``primary_key``: the reference emits one output row per primary *row*,
    so duplicate primary keys must not collapse. ``primary_key`` is kept for
    API compatibility but only documents the join key.
    """
    prim = primary.withColumn("__row", F.monotonically_increasing_id())
    joined = prim.join(secondary, on=on, how="left")
    w = Window.partitionBy("__row").orderBy(
        F.col(secondary_order).asc_nulls_last()
    )
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn", "__row")
    )


def summary_record(df: DataFrame, aggs: list[Column]) -> DataFrame:
    """SWQM_SUMMARY_RECORD: whole-table aggregates, exactly one output row."""
    return df.agg(*aggs)


def distinct_list(df: DataFrame, col: str, ascending: bool = True) -> DataFrame:
    """SWQM_DISTINCT_LIST: distinct values; NULLs first asc / last desc
    (``drivers/ogr_gensql.cpp:2223-2236,2292-2293``)."""
    c = F.col(col)
    order = c.asc_nulls_first() if ascending else c.desc_nulls_last()
    return df.select(col).distinct().orderBy(order)


def order_by(df: DataFrame, *specs: tuple[str, bool]) -> DataFrame:
    """Multi-key ORDER BY with OGR null placement (NULLs low)."""
    cols = [
        F.col(name).asc_nulls_first() if asc else F.col(name).desc_nulls_last()
        for name, asc in specs
    ]
    return df.orderBy(*cols)


def limit_offset(
    df: DataFrame,
    limit: int | None,
    offset: int = 0,
    order: list[tuple[str, bool]] | None = None,
) -> DataFrame:
    """LIMIT/OFFSET; OFFSET maps to the reference's SetNextByIndex skip
    (``drivers/ogr_gensql.cpp:1559-1569``).

    For OFFSET != 0 the caller must pass the query's ORDER BY as
    ``order=[(col, asc), ...]`` — the skip is only well-defined under a total
    order, and the sort keys are carried into the row_number window so the
    skip honors the caller's order across partitions (a
    ``monotonically_increasing_id`` window would not: ids do not preserve the
    sort after an exchange). The window input is already bounded by
    ``df.limit(offset + limit)`` so the single-partition window sort is
    driver-sized, not data-sized.
    """
    if offset == 0:
        return df.limit(limit) if limit is not None else df
    if not order:
        raise ValueError(
            "limit_offset with offset != 0 requires order=[(col, asc), ...] "
            "(OFFSET is undefined without a total order)"
        )
    if limit is not None:
        df = df.limit(offset + limit)
    cols = [
        F.col(name).asc_nulls_first() if asc else F.col(name).desc_nulls_last()
        for name, asc in order
    ]
    w = Window.orderBy(*cols)
    out = df.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") > offset)
    return out.drop("__rn")


# ---------------------------------------------------------------------------
# Special virtual fields (``core/ogr/ogr_p.h:121-128``, evaluated at
# ``core/ogr/ogrfeature.cpp:1868-1885``): FID, OGR_GEOMETRY (type name),
# OGR_GEOM_WKT, OGR_GEOM_AREA, OGR_STYLE.
# ---------------------------------------------------------------------------

SPECIAL_FIELDS = ("FID", "OGR_GEOMETRY", "OGR_GEOM_WKT", "OGR_GEOM_AREA",
                  "OGR_STYLE")


def ogr_geometry_type(geom: Column) -> Column:
    """Geometry type NAME from the WKB header — pure JVM: the little-endian
    type word's low two bytes decode with a hex swap; ISO Z (base+1000) and
    the 2.5D flag (high byte, not read) both leave the low bytes intact."""
    word = F.conv(
        F.concat(F.hex(F.substring(geom, 3, 1)), F.hex(F.substring(geom, 2, 1))),
        16, 10,
    ).cast("int")
    base = word % 1000
    from lib_gdal_spark.functions.wkt import GEOM_TYPE_NAMES

    expr = F.lit(None).cast("string")
    for code, name in GEOM_TYPE_NAMES.items():
        expr = F.when(base == code, F.lit(name)).otherwise(expr)
    return F.when(geom.isNull(), F.lit(None)).otherwise(expr)


def ogr_geom_wkt(geom: Column) -> Column:
    """WKT export (exportToWkt, ``ogrgeometry.cpp:1598``) — Arrow-batched."""
    @F.pandas_udf("string")
    def _wkt(wkb: pd.Series) -> pd.Series:
        from lib_gdal_spark.functions.wkt import wkb_to_wkt

        return wkb.map(
            lambda b: None if b is None else wkb_to_wkt(bytes(b))
        )

    return _wkt(geom)


def ogr_geom_area(geom: Column) -> Column:
    """OGR_G_Area semantics (``ogrfeature.cpp:1883``): polygon = |outer| −
    Σ|holes|; multipolygon sums; non-surface types → 0.0. Arrow-batched."""
    @F.pandas_udf("double")
    def _area(wkb: pd.Series) -> pd.Series:
        import numpy as np

        from lib_gdal_spark.functions import geometry as G

        def ring_area(r):
            x, y = r[:, 0], r[:, 1]
            return 0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))

        def poly_area(rings):
            if not rings:
                return 0.0
            return ring_area(rings[0]) - sum(ring_area(r) for r in rings[1:])

        def area(b):
            if b is None:
                return None
            base, payload = G.parse_wkb(bytes(b))
            if base == G.WKB_POLYGON:
                return poly_area(payload)
            if base == G.WKB_MULTIPOLYGON:
                return sum(poly_area(p) for p in payload)
            if base == G.WKB_GEOMETRYCOLLECTION:
                total = 0.0
                for mb, nd, p in payload:
                    if mb == G.WKB_POLYGON:
                        total += poly_area(p)
                    elif mb == G.WKB_MULTIPOLYGON:
                        total += sum(poly_area(q) for q in p)
                return total
            return 0.0

        return wkb.map(area)

    return _area(geom)
