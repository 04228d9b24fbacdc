"""k-nearest-neighbor joins.

Two strategies, mirroring SURVEY.md §2.3 (reference analog: quadtree radius
growth, ``core/alg/gdalgrid.cpp:281-301,631``):

- ``knn_bruteforce``: exact broadcast nested-loop — the correct baseline when
  the query side is small (grid interpolation, oracle checks). The big side
  streams once; top-k per query via a window.
- ``knn_kring``: the scale path — candidate generation by k-ring expansion
  equi-join on cell keys, then exact Haversine ranking. With ring radius k,
  results are exact whenever the true k-th neighbor lies within
  ``k * cell_width`` of the query's cell boundary; callers size (res, k)
  from the data density (``cells.cell_radius_km``).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lib_gdal_spark.functions import cells as C


def _haversine_col(lon1, lat1, lon2, lat2) -> F.Column:
    """Haversine distance (km) as a native Spark expression — stays inside
    whole-stage codegen; must match ``cells.haversine_km`` numerically."""
    rl1, rl2 = F.radians(lat1), F.radians(lat2)
    dlat = rl2 - rl1
    dlon = F.radians(lon2) - F.radians(lon1)
    h = F.pow(F.sin(dlat / 2), 2) + F.cos(rl1) * F.cos(rl2) * F.pow(
        F.sin(dlon / 2), 2
    )
    return 2.0 * 6371.0088 * F.asin(F.sqrt(F.least(h, F.lit(1.0))))


def knn_bruteforce(
    queries: DataFrame,
    targets: DataFrame,
    k: int,
    query_cols: tuple[str, str, str] = ("qid", "qlon", "qlat"),
    target_cols: tuple[str, str, str] = ("tid", "tlon", "tlat"),
    round_decimals: int = 6,
) -> DataFrame:
    """Exact kNN: broadcast the (small) query side, scan targets once.

    Output: (qid, tid, rank, dist_km) — rank 1..k by (distance, tid).
    Distances are rounded to ``round_decimals`` (µm scale at 6) *before*
    ranking so that 1-ulp libm differences across engines/platforms cannot
    flip ranks; residual ties break on tid.
    """
    qid, qlon, qlat = query_cols
    tid, tlon, tlat = target_cols
    joined = targets.crossJoin(F.broadcast(queries))
    d = _haversine_col(F.col(qlon), F.col(qlat), F.col(tlon), F.col(tlat))
    joined = joined.withColumn("dist_km", F.round(d, round_decimals))
    w = Window.partitionBy(qid).orderBy(F.col("dist_km").asc(), F.col(tid).asc())
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(qid, tid, "rank", "dist_km")
    )


def knn_kring(
    queries: DataFrame,
    targets: DataFrame,
    k: int,
    res: int = 6,
    rings: int = 1,
    query_cols: tuple[str, str, str] = ("qid", "qlon", "qlat"),
    target_cols: tuple[str, str, str] = ("tid", "tlon", "tlat"),
    round_decimals: int = 6,
) -> DataFrame:
    """Approximate-exact kNN via k-ring expansion equi-join.

    Each query explodes to its (2*rings+1)^2 ring cells (a pandas UDF over
    the query side only); targets carry their cell key; an equi-join on cell
    generates candidates; exact Haversine + window keeps top-k. Hot cells
    are handled by AQE skew-join splitting; queries are typically the small
    side and broadcast.
    """
    qid, qlon, qlat = query_cols
    tid, tlon, tlat = target_cols

    def explode_rings(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            lon = b[qlon].to_numpy(dtype=np.float64)
            lat = b[qlat].to_numpy(dtype=np.float64)
            cell = C.lonlat_to_cell(lon, lat, res)
            ring = C.k_ring(cell, rings)  # (n, (2r+1)^2)
            n, m = ring.shape
            rep = np.repeat(np.arange(n), m)
            flat = ring.ravel()
            okm = flat >= 0
            yield pd.DataFrame(
                {
                    qid: b[qid].to_numpy()[rep][okm],
                    qlon: lon[rep][okm],
                    qlat: lat[rep][okm],
                    "cell": flat[okm],
                }
            )

    qschema = f"{qid} long, {qlon} double, {qlat} double, cell long"
    qcells = queries.select(qid, qlon, qlat).mapInPandas(explode_rings, schema=qschema)

    # Big side stays JVM-native: the cell key is candidate-generation only
    # (a 1-ulp libm difference shifts an edge point one cell, still inside
    # the ring), so no Python runs over the target table at all.
    tcells = targets.select(
        tid, tlon, tlat,
        C.cell_expr(F.col(tlon), F.col(tlat), res).alias("cell"),
    )

    cand = tcells.join(F.broadcast(qcells), "cell", "inner")
    d = _haversine_col(F.col(qlon), F.col(qlat), F.col(tlon), F.col(tlat))
    cand = cand.withColumn("dist_km", F.round(d, round_decimals))
    w = Window.partitionBy(qid).orderBy(F.col("dist_km").asc(), F.col(tid).asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(qid, tid, "rank", "dist_km")
    )
