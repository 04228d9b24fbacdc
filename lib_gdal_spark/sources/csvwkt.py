"""CSV-with-WKT vector source — the reference's CSV driver reading a WKT
geometry column (``drivers/vector/csv`` with ``GEOM_POSSIBLE_NAMES``),
Spark-first: the distributed csv reader does the scanning/splitting and
only the WKT->WKB decode runs in an Arrow batch."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_csv_wkt(
    spark: SparkSession,
    path: str,
    wkt_col: str = "WKT",
    fid_col: str | None = None,
    header: bool = True,
    **csv_options,
) -> DataFrame:
    """CSV file(s) -> layer DataFrame: all attribute columns preserved,
    ``wkt_col`` replaced by ``geom_wkb`` (NULL for empty cells), ``fid``
    from ``fid_col`` or a monotonically increasing id."""
    df = spark.read.options(header=header, **csv_options).csv(path)
    if wkt_col not in df.columns:
        raise ValueError(
            f"column {wkt_col!r} not in CSV header {df.columns}")

    @F.pandas_udf("binary")
    def _to_wkb(s: pd.Series) -> pd.Series:
        from lib_gdal_spark.functions.wkt import wkt_to_wkb

        return s.map(
            lambda v: None if v is None or not str(v).strip()
            else wkt_to_wkb(str(v))
        )

    out = df.withColumn("geom_wkb", _to_wkb(F.col(wkt_col))).drop(wkt_col)
    if fid_col and fid_col in out.columns:
        out = out.withColumn("fid", F.col(fid_col).cast("long"))
    else:
        out = out.withColumn("fid", F.monotonically_increasing_id())
    return out
