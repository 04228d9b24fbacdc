"""VRT complex pixel functions as pure JVM column expressions.

Re-expresses ``drivers/raster/vrt/pixelfunctions.cpp:36-121`` (real, imag,
mod, phase, conj, cmul, intensity) over the interleaved-word complex tile
representation (``kernels/complexpx.py``): every function is a
``pyspark.sql.functions`` lambda-expression over ``pixels array<double>``
— no Python UDF, whole-stage-codegen friendly, so the complex dtype family
costs the same per-row as the real one.

Real-dtype variants follow the same C source: ``mod`` falls back to
``fabs``, ``phase`` to ``(v < 0) ? pi : 0``, ``intensity`` to ``v*v``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

import math


def _half_seq(px: Column) -> Column:
    """[0 .. n_complex_pixels-1] for an interleaved array."""
    return F.sequence(
        F.lit(0), (F.size(px) / F.lit(2)).cast("int") - F.lit(1)
    )


def _re(px: Column, k: Column) -> Column:
    return F.element_at(px, (k * 2 + 1).cast("int"))


def _im(px: Column, k: Column) -> Column:
    return F.element_at(px, (k * 2 + 2).cast("int"))


def real(px: Column, is_complex: bool = True) -> Column:
    """Real part (pixelfunctions.cpp RealPixelFunc)."""
    if not is_complex:
        return px
    return F.filter(px, lambda x, i: i % 2 == 0)


def imag(px: Column, is_complex: bool = True) -> Column:
    """Imaginary part; all-zero for real input (ImagPixelFunc)."""
    if not is_complex:
        return F.transform(px, lambda x: F.lit(0.0))
    return F.filter(px, lambda x, i: i % 2 == 1)


def modulus(px: Column, is_complex: bool = True) -> Column:
    """sqrt(re^2+im^2), or fabs for real (ModulePixelFunc)."""
    if not is_complex:
        return F.transform(px, F.abs)
    return F.transform(
        _half_seq(px),
        lambda k: F.sqrt(_re(px, k) * _re(px, k) + _im(px, k) * _im(px, k)),
    )


def phase(px: Column, is_complex: bool = True) -> Column:
    """atan2(im, re); real input maps to 0 / pi by sign (PhasePixelFunc)."""
    if not is_complex:
        return F.transform(
            px, lambda x: F.when(x < 0, F.lit(math.pi)).otherwise(F.lit(0.0))
        )
    return F.transform(
        _half_seq(px), lambda k: F.atan2(_im(px, k), _re(px, k))
    )


def conj(px: Column, is_complex: bool = True) -> Column:
    """Complex conjugate: negate the odd (imaginary) words (ConjPixelFunc)."""
    if not is_complex:
        return px
    return F.transform(
        px, lambda x, i: F.when(i % 2 == 1, -x).otherwise(x)
    )


def intensity(px: Column, is_complex: bool = True) -> Column:
    """re^2 + im^2 (IntensityPixelFunc)."""
    if not is_complex:
        return F.transform(px, lambda x: x * x)
    return F.transform(
        _half_seq(px),
        lambda k: _re(px, k) * _re(px, k) + _im(px, k) * _im(px, k),
    )


def cmul(pa: Column, pb: Column) -> Column:
    """First band times CONJUGATE of second (CMulPixelFunc):
    re = ar*br + ai*bi ; im = ai*br - ar*bi. Interleaved output."""
    return F.flatten(
        F.transform(
            _half_seq(pa),
            lambda k: F.array(
                _re(pa, k) * _re(pb, k) + _im(pa, k) * _im(pb, k),
                _im(pa, k) * _re(pb, k) - _re(pa, k) * _im(pb, k),
            ),
        )
    )
