"""Cartographic line generalization as pure array expressions:
Chaikin corner cutting and snap-to-grid with consecutive-duplicate
collapse.

Both stay entirely inside Catalyst higher-order functions (transform /
flatten / filter on array columns) — no Python crosses the boundary, so
they run at JVM speed per partition and scale embarrassingly (one track
per row, no shuffle at all).

Exactness: Chaikin's 1/4 / 3/4 weights are dyadic, and both engines
evaluate the identical ``0.75*a + 0.25*b`` expression, so outputs are
bit-identical. Snap uses the explicit half-up ``floor(v/step + 0.5)``
(engine-independent, unlike library round())."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def chaikin_step(xs: Column) -> Column:
    """One Chaikin (1974) corner-cutting pass over a coordinate array
    (endpoints preserved): keep p1; per edge (p_i, p_{i+1}) emit
    Q = 0.75*p_i + 0.25*p_{i+1} and R = 0.25*p_i + 0.75*p_{i+1};
    keep p_n. n points -> 2n points. 1-indexed element_at mirrors the
    SQL oracle's list indexing."""
    n = F.size(xs)
    qr = F.flatten(F.transform(
        F.sequence(F.lit(1), n - 1),
        lambda i: F.array(
            0.75 * F.element_at(xs, i) + 0.25 * F.element_at(xs, i + 1),
            0.25 * F.element_at(xs, i) + 0.75 * F.element_at(xs, i + 1))))
    return F.concat(F.slice(xs, 1, 1), qr, F.slice(xs, -1, 1))


def chaikin(xs: Column, iterations: int = 2) -> Column:
    """``iterations`` Chaikin passes (default 2: 8 -> 32 vertices)."""
    for _ in range(iterations):
        xs = chaikin_step(xs)
    return xs


def snap_coord(v: Column, step: float) -> Column:
    """Snap one coordinate to the grid: floor(v/step + 0.5) * step —
    explicit half-up, identical in SQL."""
    return F.floor(v / F.lit(step) + 0.5) * F.lit(step)


