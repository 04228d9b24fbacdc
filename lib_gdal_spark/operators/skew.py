"""Spatial-skew machinery: hot-cell salting + range repartitioning.

North rule: "cell-key salting and adaptive repartitioning to handle spatial
skew". Web pages cluster in cities, so a handful of cells carry orders of
magnitude more rows than the median — a plain equi-join on cell puts each
hot cell in ONE shuffle partition. Two mitigations compose here:

- **AQE skew-join splitting** (on in session.get_spark) handles hot
  *shuffle partitions* transparently — the first line of defense.
- **Explicit salting** (this module) handles the harder case of a hot *key*
  inside a broadcast/aggregation: the big side gets a deterministic salt in
  [0, n_salt) appended to the key; the small side explodes once per salt
  value. Results are identical to the unsalted join, shuffle load spreads
  n_salt-ways.
- **spatial_repartition** range-partitions by cell key so co-located cells
  stay together for downstream tile writes (the Iceberg write-layout step).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def detect_hot_keys(
    df: DataFrame, key: str, threshold_ratio: float = 10.0
) -> DataFrame:
    """Keys whose row count exceeds ``threshold_ratio`` x the mean count.

    One aggregation pass (map-side combinable); at 100 TB this is the same
    cost as any groupBy-count and typically runs on a sample instead.
    """
    counts = df.groupBy(key).agg(F.count(F.lit(1)).alias("n"))
    mean = counts.agg(F.avg("n").alias("m"))
    return (
        counts.crossJoin(F.broadcast(mean))
        .where(F.col("n") > F.col("m") * threshold_ratio)
        .select(key, "n")
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on ``key`` with n_salt-way salting of the big side.

    big rows get salt = pmod(hash(all columns), n_salt) (deterministic);
    small rows replicate once per salt. Output == unsalted join, with the
    hot key's probe work spread across ``n_salt`` partitions.

    Only ``inner`` and ``left`` are supported: for right/full joins an
    unmatched small-side row would surface once per salt replica,
    duplicating rows versus the unsalted join.
    """
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(
            f"salted_join supports how='inner'/'left', got {how!r}: "
            "right/full would duplicate unmatched small-side replicas"
        )
    bsalt = big.withColumn(
        "__salt", F.pmod(F.xxhash64(*big.columns), F.lit(n_salt)).cast("int")
    )
    ssalt = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    out = bsalt.join(ssalt, [key, "__salt"], how)
    return out.drop("__salt")


def spatial_repartition(
    df: DataFrame, cell_col: str = "cell", num_partitions: int | None = None
) -> DataFrame:
    """Range-partition by cell key: neighboring cells land in the same or
    adjacent partitions (Z-order-like locality for tile-table writes)."""
    if num_partitions:
        return df.repartitionByRange(num_partitions, F.col(cell_col))
    return df.repartitionByRange(F.col(cell_col))
