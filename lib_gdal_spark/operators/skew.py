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


def _global_ranks(df: DataFrame, cols: list, n_parts: int = 32) -> DataFrame:
    """Exact dense 1-based global ranks under ORDER BY ``cols`` WITHOUT a
    single-reducer global window: range-repartition on the sort key,
    count rows per physical partition (tiny driver collect), then
    rank = partition offset + intra-partition row_number — the windows
    partition by ``spark_partition_id`` and run fully parallel. The
    sampled range boundaries affect only WHERE the cut lands, never the
    final rank, so the result is deterministic and partition-invariant.
    Appends column ``__rank`` to ``df``."""
    from pyspark.sql import Window

    b = df.repartitionByRange(n_parts, *[F.col(c) for c in cols]) \
        .withColumn("__pt", F.spark_partition_id()).persist()
    counts = {r["__pt"]: r["cnt"] for r in
              b.groupBy("__pt").agg(F.count(F.lit(1)).alias("cnt"))
              .collect()}
    off, acc = {}, 0
    for p in sorted(counts):
        off[p] = acc
        acc += counts[p]
    om = F.create_map(*[F.lit(v) for kv in off.items() for v in kv]) \
        if off else F.create_map()
    w = Window.partitionBy("__pt").orderBy(*[F.col(c) for c in cols])
    out = b.withColumn(
        "__rank", om[F.col("__pt")] + F.row_number().over(w))
    return out.drop("__pt")


def str_partition(points: DataFrame, nx: int, ny: int) -> DataFrame:
    """Sort-tile-recursive (STR) spatial partitioning (Leutenegger,
    Lopez & Edgington, ICDE 1997 — the R-tree bulk-load packing order,
    used here as a BALANCED spatial partitioner): rank all points by
    (x, pid) and cut into ``nx`` equal-count vertical slabs; rank each
    slab by (y, pid) and cut into ``ny`` equal-count cells. Every
    partition holds floor/ceil(n / (nx*ny)) spatially-contiguous points
    regardless of skew — a million-point city block occupies many
    partitions instead of melting one, which is exactly what a
    co-located spatial join or a balanced tile write wants (compare
    ``spatial_repartition``, which keys on a FIXED grid and inherits
    its skew).

    Exactness: ranks are exact integers from :func:`_global_ranks`
    (range-repartition + per-partition offsets, no single-reducer
    window; ties broken on pid), and the slab/cell cuts are integer
    floor arithmetic — bit-identical in any engine.

    Returns (pid, x, y, slab, cell, part) with part = slab * ny + cell.
    """
    n = points.count()
    if n == 0 or nx < 1 or ny < 1:
        raise ValueError("str_partition needs rows and nx, ny >= 1")
    rx = _global_ranks(points.select("pid", "x", "y"), ["x", "pid"])
    slabbed = rx.withColumn(
        "slab", F.expr(f"((__rank - 1) * {int(nx)}) div {int(n)}")
        .cast("long")).drop("__rank")
    from pyspark.sql import Window
    wy = Window.partitionBy("slab").orderBy("y", "pid")
    sized = slabbed.withColumn("__r2", F.row_number().over(wy)) \
        .withColumn("__m", F.count(F.lit(1)).over(
            Window.partitionBy("slab")))
    out = sized.withColumn(
        "cell", F.expr(f"((__r2 - 1) * {int(ny)}) div __m").cast("long"))
    return out.select(
        "pid", "x", "y", "slab", "cell",
        (F.col("slab") * ny + F.col("cell")).alias("part"))
