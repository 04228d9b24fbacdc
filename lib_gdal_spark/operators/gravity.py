"""Doubly-constrained gravity model (trip distribution) calibrated by
iterative proportional fitting — the Fratar/Furness balancing used in
transport planning and the matrix-scaling core of origin-destination
synthesis (Wilson 1967 entropy-maximizing form).

Distributed shape: the matrix lives as (i, j, v) rows; each IPF
half-step is one integer groupBy (row or column sums) + one broadcast
join back — the canonical Spark pattern, linear in matrix cells and
shuffling only the margin keys. Zone counts in the millions are fine;
nothing is collected.

Exactness doctrine (shared with the SQL oracle): cells are integer
MILLI-units, re-quantized half-up after every scaling, so margins are
exact integer sums (order-independent) and each cell update is the
pure-integer expression

    v' = (2*v*target + s) // (2*s)        (floor division, all >= 0)

i.e. round-half-up of v * target / s without ever leaving int64
(bounds: v <= 1e7 milli, target <= 1e7 milli -> 2vt <= 2e14 << 2^63).
The µ-rounding perturbs convergence by < 1e-3 per cell per step —
far below the model's own tolerance — and buys bit-exact
reproducibility on any engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _rescale(cells: DataFrame, targets: DataFrame, key: str) -> DataFrame:
    """One IPF half-step: scale cells so the ``key`` margin (``'i'``
    rows or ``'j'`` columns) hits its integer target, with the half-up
    integer update. Zero margins keep their cells at 0."""
    sums = cells.groupBy(key).agg(F.sum("v").alias("s"))
    return (
        cells.join(sums, key).join(targets, key)
        .select(
            "i", "j",
            F.when(F.col("s") == 0, F.lit(0)).otherwise(
                F.expr("(2 * v * t + s) DIV (2 * s)")).alias("v")))


def ipf_gravity(seed: DataFrame, row_targets: DataFrame,
                col_targets: DataFrame, rounds: int = 4) -> DataFrame:
    """``seed``: (i, j, v) integer milli-unit cells; ``row_targets``:
    (i, t); ``col_targets``: (j, t) — both integer milli-units.
    Runs ``rounds`` full IPF iterations (row half-step then column
    half-step each). Returns (i, j, t_milli, t)."""
    cells = seed
    for _ in range(rounds):
        cells = _rescale(cells, row_targets, "i")
        cells = _rescale(cells, col_targets, "j")
        cells = cells.localCheckpoint(eager=False)
    return cells.select(
        "i", "j",
        F.col("v").cast("long").alias("t_milli"),
        (F.col("v").cast("double") / 1000.0).alias("t"))
