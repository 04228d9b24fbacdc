"""Google Encoded Polyline Algorithm Format (the public spec used by the
Maps/Directions APIs and OSRM): per-vertex 1e-5-degree quantization,
delta from the previous vertex, zigzag sign fold, then little-endian
5-bit groups with a 0x20 continuation bit, each printed as chr(group+63).

The whole codec is JVM column math — quantize/zigzag/shift/substr on a
printable-ASCII alphabet literal — so encoding never leaves Tungsten; the
per-line assembly is one lag window + one groupBy with an array_sort
(both shuffle only (line, seq, 2 longs) keys). The identical arithmetic
is spelled in the DuckDB oracle (``__spark_entry__.oracle_sql``), and the
spec's own published worked example anchors the bytes in pytest.

Reference parity: lib_gdal has no polyline codec (its string keys are
WKT/geohash-era); this extends the repo's spatial string-codec family
(geohash, OLC, quadkey, MGRS) with the de-facto web linestring wire
format. Public spec: developers.google.com "Encoded Polyline Algorithm
Format".
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# chr(63)..chr(126): every character the format can emit (group+63 with
# group in [0, 63]); indexing this literal avoids needing a chr() builtin
# and gives the SQL oracle the same table to substr.
PL_ALPHA = "".join(chr(c) for c in range(63, 127))

# 7 x 5-bit groups cover |delta| <= 2^34 — far beyond the +-1.8e7 range of
# a 1e-5-quantized longitude, so the unrolled emitter is lossless.
PL_GROUPS = 7


def pl_quantize(deg) -> Column:
    """Spec quantization round(deg * 1e5), half away from zero, spelled
    as floor(x + 0.5) / -floor(-x + 0.5) so Spark and SQL agree bit-for-
    bit on negative halves."""
    x = deg * 1e5
    return F.when(x >= 0, F.floor(x + 0.5)).otherwise(
        -F.floor(-x + 0.5)).cast("long")


def pl_encode_value(v) -> Column:
    """One signed quantized delta -> its encoded chunk string (pure
    column expression; ``v`` is a long Column)."""
    sv = F.when(v < 0, -(v * 2) - 1).otherwise(v * 2)  # zigzag == ~(v<<1)
    parts = []
    for i in range(PL_GROUPS):
        rest = F.shiftright(sv, 5 * i)
        group = rest.bitwiseAND(F.lit(31))
        more = F.shiftright(sv, 5 * (i + 1)) > 0
        idx = group + F.when(more, F.lit(32)).otherwise(F.lit(0))
        ch = F.lit(PL_ALPHA).substr((idx + 1).cast("int"), F.lit(1))
        emit = F.lit(i == 0) | (rest > 0)
        parts.append(F.when(emit, ch).otherwise(F.lit("")))
    return F.concat(*parts)


def polyline_encode(
    points: DataFrame,
    line_col: str = "line_id",
    seq_col: str = "seq",
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """(line, seq, lon, lat) rows -> one row per line:
    (line_col, n_pts, polyline). Vertices are consumed in ``seq_col``
    order (lat before lon per the spec)."""
    from pyspark.sql import Window

    q = points.select(
        F.col(line_col), F.col(seq_col).alias("__seq"),
        pl_quantize(F.col(lat_col)).alias("qlat"),
        pl_quantize(F.col(lon_col)).alias("qlon"),
    )
    w = Window.partitionBy(line_col).orderBy("__seq")
    d = q.select(
        line_col, "__seq",
        (F.col("qlat") - F.lag("qlat", 1, 0).over(w)).alias("dlat"),
        (F.col("qlon") - F.lag("qlon", 1, 0).over(w)).alias("dlon"),
    )
    enc = d.select(
        line_col, "__seq",
        F.concat(pl_encode_value(F.col("dlat")),
                 pl_encode_value(F.col("dlon"))).alias("enc"),
    )
    return (
        enc.groupBy(line_col)
        .agg(F.count(F.lit(1)).alias("n_pts"),
             F.array_join(
                 F.transform(
                     F.array_sort(F.collect_list(
                         F.struct(F.col("__seq"), F.col("enc")))),
                     lambda s: s["enc"]),
                 "").alias("polyline"))
    )


def polyline_decode(encoded: str) -> list[tuple[float, float]]:
    """Driver-side reference decoder (tests + spot checks, not a Spark
    path): returns [(lon, lat), ...]."""
    coords, idx, lat, lon = [], 0, 0, 0
    while idx < len(encoded):
        out = []
        for _ in range(2):
            result, shift = 0, 0
            while True:
                b = ord(encoded[idx]) - 63
                idx += 1
                result |= (b & 0x1F) << shift
                shift += 5
                if b < 0x20:
                    break
            out.append(~(result >> 1) if result & 1 else result >> 1)
        lat += out[0]
        lon += out[1]
        coords.append((lon / 1e5, lat / 1e5))
    return coords
