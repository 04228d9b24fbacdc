"""OGC spatial predicates for polygons (DE-9IM-style, area semantics).

Reference: ``core/ogr/ogrgeometry.cpp`` Intersects (:4903), Contains,
Within, Touches, Crosses, Overlaps, Disjoint, Equals — GEOS delegations
re-expressed over the even-odd boolean kernel (``functions/overlay.py``):
for areal geometries every predicate reduces to the areas of A∩B, A\\B,
B\\A plus boundary contact, all of which the slab kernel computes exactly.

Semantics (polygon x polygon):
- intersects: A∩B nonempty (positive area OR boundary contact)
- disjoint:   not intersects
- contains:   B\\A empty and A∩B == area(B) > 0   (A contains B)
- within:     contains flipped
- equals:     A∩B == area(A) == area(B)
- touches:    boundaries meet but interiors do not (A∩B area == 0, contact)
- overlaps:   interiors intersect, neither contains the other
- crosses:    n/a for polygon pairs (dimension rule); provided for
  completeness as False, matching GEOS for area/area inputs
"""

from __future__ import annotations

import numpy as np

from lib_gdal_spark.functions import constructive as CG
from lib_gdal_spark.functions import overlay as OV

Ring = np.ndarray
_EPS = 1e-12


def _areas(a: list[Ring], b: list[Ring]) -> tuple[float, float, float]:
    ai = OV.polys_area(OV.boolean_op(a, b, "intersection"))
    aa = OV.polys_area(OV.boolean_op(a, [], "union"))
    ab = OV.polys_area(OV.boolean_op(b, [], "union"))
    return ai, aa, ab


def _boundary_contact(a: list[Ring], b: list[Ring]) -> bool:
    """True when the boundaries come within numerical contact distance."""
    d = CG.distance(a, b)
    return bool(d <= _EPS)


def intersects(a: list[Ring], b: list[Ring]) -> bool:
    ai, _, _ = _areas(a, b)
    if ai > _EPS:
        return True
    return _boundary_contact(a, b)


def disjoint(a: list[Ring], b: list[Ring]) -> bool:
    return not intersects(a, b)


def contains(a: list[Ring], b: list[Ring]) -> bool:
    ai, _, ab = _areas(a, b)
    return ab > _EPS and abs(ai - ab) <= _EPS * max(1.0, ab)


def within(a: list[Ring], b: list[Ring]) -> bool:
    return contains(b, a)


def equals(a: list[Ring], b: list[Ring]) -> bool:
    ai, aa, ab = _areas(a, b)
    tol = _EPS * max(1.0, aa, ab)
    return abs(ai - aa) <= tol and abs(ai - ab) <= tol


def touches(a: list[Ring], b: list[Ring]) -> bool:
    ai, _, _ = _areas(a, b)
    return ai <= _EPS and _boundary_contact(a, b)


def overlaps(a: list[Ring], b: list[Ring]) -> bool:
    ai, aa, ab = _areas(a, b)
    tol = _EPS * max(1.0, aa, ab)
    return (ai > tol and abs(ai - aa) > tol and abs(ai - ab) > tol)


def crosses(a: list[Ring], b: list[Ring]) -> bool:
    # polygon/polygon pairs can never "cross" under the DE-9IM dimension
    # rule (GEOS returns false for area/area inputs)
    return False
