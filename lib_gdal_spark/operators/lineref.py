"""Linear referencing (``apps/ogrlineref.cpp``) over DataFrames.

The reference tool builds a *linearly referenced* parts table from a path
polyline plus measured reference points ("repers"), then answers three
queries against it:

* ``create_parts``   — ``-create``  (ogrlineref.cpp:596-1028): cut the
  path at the repers, extrapolate unmeasured head/tail, drop "pickets"
  at round multiples of ``step`` and emit one part row per picket
  interval with fields ``beg`` / ``end`` / ``scale_factor``.
* ``get_position``   — ``-get_pos`` (ogrlineref.cpp:1175-1237): nearest
  part to a query point → reference distance ``beg + proj/scale``.
* ``get_coordinates``— ``-get_coord`` (ogrlineref.cpp:1242-1297): part
  with ``beg < m < end`` → point at ``(m-beg)*scale`` along it.
* ``get_subline``    — ``-get_subline`` (ogrlineref.cpp:434-572):
  concatenated trimmed parts between two positions.

Spark shape: one path + its repers is one *group* — ``create_parts`` is
a cogrouped ``applyInPandas`` keyed by ``path_id``, so a layer of many
paths (the common case: a road/rail network) fans out across executors
with no shuffle beyond the group-by.  ``get_position`` joins query
points to a small broadcast parts table with an optional JVM envelope
prefilter before the vectorized exact distance; ``get_coordinates`` is a
broadcast range join.  Planar CRS only (the reference's geographic
branch measures part lengths through a UTM transform).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lib_gdal_spark.functions import geometry as G

DELTA = 1e-8            # ogrlineref.cpp:58
TOLERANCE_METER = 10.0  # ogrlineref.cpp:61

PARTS_SCHEMA = ("path_id string, part_id int, beg double, end double, "
                "scale_factor double, geom_wkb binary")


# ---------------------------------------------------------------------------
# polyline primitives (vectorized NumPy; one polyline at a time)
# ---------------------------------------------------------------------------

def _cumlen(xs: np.ndarray, ys: np.ndarray) -> np.ndarray:
    seg = np.hypot(np.diff(xs), np.diff(ys))
    return np.concatenate(([0.0], np.cumsum(seg)))


def polyline_project(xs, ys, px, py):
    """OGRLineString::Project for many points at once →
    (arc_distance, euclidean_distance)."""
    px = np.atleast_1d(np.asarray(px, dtype=np.float64))
    py = np.atleast_1d(np.asarray(py, dtype=np.float64))
    ax, ay = xs[:-1], ys[:-1]
    dx, dy = np.diff(xs), np.diff(ys)
    L2 = dx * dx + dy * dy
    safe = np.where(L2 > 0, L2, 1.0)
    t = ((px[:, None] - ax) * dx + (py[:, None] - ay) * dy) / safe
    t = np.clip(np.where(L2 > 0, t, 0.0), 0.0, 1.0)
    fx = ax + t * dx
    fy = ay + t * dy
    d2 = (px[:, None] - fx) ** 2 + (py[:, None] - fy) ** 2
    k = np.argmin(d2, axis=1)
    cum = _cumlen(xs, ys)
    rows = np.arange(len(px))
    arc = cum[k] + t[rows, k] * np.sqrt(L2[k])
    return arc, np.sqrt(d2[rows, k])


def polyline_value(xs, ys, dist):
    """OGRLineString::Value — point at arc length (clamped to the ends)."""
    dist = np.atleast_1d(np.asarray(dist, dtype=np.float64))
    cum = _cumlen(xs, ys)
    d = np.clip(dist, 0.0, cum[-1])
    k = np.clip(np.searchsorted(cum, d, side="right") - 1, 0, len(xs) - 2)
    seg = cum[k + 1] - cum[k]
    t = np.where(seg > 0, (d - cum[k]) / np.where(seg > 0, seg, 1.0), 0.0)
    return xs[k] + t * np.diff(xs)[k], ys[k] + t * np.diff(ys)[k]


def polyline_subline(xs, ys, d0: float, d1: float):
    """OGRLineString::getSubLine(d0, d1): interpolated endpoints plus the
    source vertices whose arc length lies strictly between."""
    cum = _cumlen(xs, ys)
    d0 = max(0.0, min(d0, cum[-1]))
    d1 = max(0.0, min(d1, cum[-1]))
    x0, y0 = polyline_value(xs, ys, d0)
    x1, y1 = polyline_value(xs, ys, d1)
    inner = (cum > d0) & (cum < d1)
    ox = np.concatenate((x0, xs[inner], x1))
    oy = np.concatenate((y0, ys[inner], y1))
    return ox, oy


def _linestring_xy(wkb: bytes):
    base, payload = G.parse_wkb(bytes(wkb))
    if base == G.WKB_LINESTRING:
        pts = np.asarray(payload, dtype=np.float64)
        return pts[:, 0].copy(), pts[:, 1].copy()
    raise ValueError("lineref path must be a LineString")


# ---------------------------------------------------------------------------
# -create
# ---------------------------------------------------------------------------

def _parts_for_path(path_id, xs, ys, mvals, rx, ry, step, tolerance):
    """Single-path CreatePartsFromLineString (ogrlineref.cpp:596-1028)."""
    arc, dist = polyline_project(xs, ys, rx, ry)
    keep = dist < tolerance
    mvals, arc = np.asarray(mvals, float)[keep], arc[keep]
    order = np.argsort(mvals, kind="stable")
    mvals, arc = mvals[order], arc[order]
    # reference keys repers by measure in a std::map — dedupe, last wins
    uniq = {}
    for m, a in zip(mvals, arc):
        uniq[m] = a
    mvals = np.array(sorted(uniq), dtype=np.float64)
    if len(mvals) < 2:
        raise ValueError(f"path {path_id}: not enough repers to proceed")
    arc = np.array([uniq[m] for m in mvals])

    # direction check: reverse path if repers run against vertex order
    if arc[0] > arc[1]:
        xs, ys = xs[::-1].copy(), ys[::-1].copy()
        arc = _cumlen(xs, ys)[-1] - arc

    total = _cumlen(xs, ys)[-1]
    sublines = []  # (sx, sy, beg_m, end_m, factor)
    pt_beg_pos = pt_end_pos = None

    if arc[0] > DELTA:  # unmeasured head: scale 1 (planar)
        sx, sy = polyline_subline(xs, ys, 0.0, arc[0])
        ln = _cumlen(sx, sy)[-1]
        sublines.append((sx, sy, mvals[0] - ln, mvals[0], 1.0))
        pt_beg_pos = mvals[0] - ln
    for i in range(len(mvals) - 1):
        if arc[i + 1] - arc[i] > DELTA:
            sx, sy = polyline_subline(xs, ys, arc[i], arc[i + 1])
            ln = _cumlen(sx, sy)[-1]
            sublines.append((sx, sy, mvals[i], mvals[i + 1],
                             ln / (mvals[i + 1] - mvals[i])))
    if total - arc[-1] > DELTA:  # unmeasured tail
        sx, sy = polyline_subline(xs, ys, arc[-1], total)
        ln = _cumlen(sx, sy)[-1]
        sublines.append((sx, sy, mvals[-1], mvals[-1] + ln, 1.0))
        pt_end_pos = mvals[-1] + ln

    # pickets at round multiples of step (ogrlineref.cpp:921-975)
    begin_pos = pt_beg_pos if pt_beg_pos is not None else mvals[0]
    end_pos = pt_end_pos if pt_end_pos is not None else mvals[-1]
    round_beg = np.ceil(begin_pos / step) * step
    pickets: dict[float, tuple[float, float]] = {}
    if pt_beg_pos is not None:
        pickets[pt_beg_pos] = (xs[0], ys[0])
    if pt_end_pos is not None:
        pickets[pt_end_pos] = (xs[-1], ys[-1])
    d = round_beg
    while d <= end_pos:  # float accumulation, like the reference loop
        for sx, sy, b, e, f in sublines:
            if d + DELTA >= b and d - DELTA <= e:  # CURVE_DATA::IsInside
                vx, vy = polyline_value(sx, sy, (d - b) * f)
                pickets[d] = (float(vx[0]), float(vy[0]))
                break
        d += step

    # final parts between consecutive pickets (ogrlineref.cpp:982-1008)
    out = []
    arc1 = 0.0
    keys = sorted(pickets)
    pos = keys[0]
    for kpos in keys:
        px, py = pickets[kpos]
        arc2, _ = polyline_project(xs, ys, [px], [py])
        arc2 = float(arc2[0])
        if arc2 - arc1 > DELTA:
            if kpos - pos <= 0:
                # the reference divides by zero here (first reper off the
                # step grid with no unmeasured head); fail loudly instead
                raise ValueError(
                    f"path {path_id}: zero-measure picket span at {kpos}")
            sx, sy = polyline_subline(xs, ys, arc1, arc2)
            ln = _cumlen(sx, sy)[-1]
            out.append((path_id, len(out), pos, kpos, ln / (kpos - pos),
                        G.wkb_linestring(np.column_stack((sx, sy)))))
            arc1, pos = arc2, kpos
    return out


def create_parts(
    path_df: DataFrame,
    repers_df: DataFrame,
    step: float,
    path_id_col: str = "path_id",
    measure_col: str = "measure",
    tolerance: float = TOLERANCE_METER,
) -> DataFrame:
    """``ogrlineref -create``: parts table with beg/end/scale_factor.

    ``path_df``: (path_id, geom_wkb LineString); ``repers_df``:
    (path_id, measure, x, y).  Cogrouped by path — each path's parts are
    built independently, so a network of paths parallelizes; one path is
    never split across tasks (its geometry is a single row by contract).
    """
    def build(key, paths: pd.DataFrame, repers: pd.DataFrame) -> pd.DataFrame:
        cols = ["path_id", "part_id", "beg", "end", "scale_factor",
                "geom_wkb"]
        if paths.empty:
            return pd.DataFrame(columns=cols)
        if len(repers) < 2:  # "Not enough repers to proceed"
            raise ValueError(
                f"path {key[0]}: not enough repers to proceed")
        xs, ys = _linestring_xy(paths.iloc[0]["geom_wkb"])
        rows = _parts_for_path(
            str(key[0]), xs, ys,
            repers[measure_col].to_numpy(np.float64),
            repers["x"].to_numpy(np.float64),
            repers["y"].to_numpy(np.float64),
            step, tolerance)
        return pd.DataFrame(rows, columns=cols)

    return path_df.groupBy(path_id_col).cogroup(
        repers_df.groupBy(path_id_col)
    ).applyInPandas(build, schema=PARTS_SCHEMA)


# ---------------------------------------------------------------------------
# -get_pos
# ---------------------------------------------------------------------------

def get_position(
    parts_df: DataFrame,
    points_df: DataFrame,
    max_dist: float | None = None,
) -> DataFrame:
    """``ogrlineref -get_pos``: reference distance of the part nearest to
    each query point — ``beg + Project(part, pt)/scale``
    (ogrlineref.cpp:1217-1222).

    The parts table is the broadcast side (one row per picket interval —
    metadata-sized); query points stream.  With ``max_dist`` the pair
    candidates are prefiltered in the JVM on expanded part envelopes, so
    the exact vectorized distance UDF only sees nearby pairs.
    """
    env = parts_df.withColumn("_env", _envelope_udf("geom_wkb")).select(
        "path_id", "part_id", "beg", "scale_factor", "geom_wkb",
        F.col("_env.x0").alias("_x0"), F.col("_env.y0").alias("_y0"),
        F.col("_env.x1").alias("_x1"), F.col("_env.y1").alias("_y1"))
    pairs = points_df.crossJoin(F.broadcast(env))
    if max_dist is not None:
        pairs = pairs.where(
            (F.col("x") >= F.col("_x0") - max_dist)
            & (F.col("x") <= F.col("_x1") + max_dist)
            & (F.col("y") >= F.col("_y0") - max_dist)
            & (F.col("y") <= F.col("_y1") + max_dist))

    pt_cols = [f.name for f in points_df.schema.fields]
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in points_df.schema.fields
    ) + ", part_id int, refdist double, dist double"

    def proj(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[bytes, tuple] = {}
        for pdf in batches:
            if pdf.empty:
                continue
            arcs = np.empty(len(pdf))
            dists = np.empty(len(pdf))
            for wkb, idx in pdf.groupby("geom_wkb", sort=False).groups.items():
                key = bytes(wkb)
                if key not in cache:
                    cache[key] = _linestring_xy(key)
                xs, ys = cache[key]
                a, dd = polyline_project(
                    xs, ys, pdf.loc[idx, "x"].to_numpy(),
                    pdf.loc[idx, "y"].to_numpy())
                pos = pdf.index.get_indexer(idx)
                arcs[pos], dists[pos] = a, dd
            res = pdf[pt_cols + ["part_id"]].copy()
            res["refdist"] = pdf["beg"].to_numpy() \
                + arcs / pdf["scale_factor"].to_numpy()
            res["dist"] = dists
            yield res

    projected = pairs.mapInPandas(proj, schema=out_schema)
    w = Window.partitionBy(*pt_cols).orderBy("dist", "part_id")
    return (projected
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn"))


def _envelope_udf(col):
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("struct<x0:double,y0:double,x1:double,y1:double>")
    def env(wkbs: pd.Series) -> pd.DataFrame:
        rows = []
        for w in wkbs:
            xs, ys = _linestring_xy(w)
            rows.append((xs.min(), ys.min(), xs.max(), ys.max()))
        return pd.DataFrame(rows, columns=["x0", "y0", "x1", "y1"])

    return env(col)


# ---------------------------------------------------------------------------
# -get_coord
# ---------------------------------------------------------------------------

def get_coordinates(parts_df: DataFrame, positions_df: DataFrame) -> DataFrame:
    """``ogrlineref -get_coord``: point at measure ``m`` — every part with
    ``beg < m AND end > m`` answers (ogrlineref.cpp:1253-1256), evaluated
    at ``(m - beg) * scale_factor`` along the part.

    Positions are the small broadcast side of a range join; parts stream.
    """
    pos = F.broadcast(positions_df)
    pairs = parts_df.join(
        pos, (parts_df["beg"] < positions_df["m"])
        & (parts_df["end"] > positions_df["m"]))

    id_fields = [f.name for f in positions_df.schema.fields]
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in positions_df.schema.fields
    ) + ", path_id string, part_id int, x double, y double"

    def val(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            outx = np.empty(len(pdf))
            outy = np.empty(len(pdf))
            for i, r in enumerate(pdf.itertuples(index=False)):
                xs, ys = _linestring_xy(r.geom_wkb)
                vx, vy = polyline_value(
                    xs, ys, (r.m - r.beg) * r.scale_factor)
                outx[i], outy[i] = vx[0], vy[0]
            res = pdf[id_fields + ["path_id", "part_id"]].copy()
            res["x"], res["y"] = outx, outy
            yield res

    return pairs.mapInPandas(val, schema=out_schema)


# ---------------------------------------------------------------------------
# -get_subline
# ---------------------------------------------------------------------------

def get_subline(
    parts_df: DataFrame, pos_beg: float, pos_end: float,
    max_parts: int = 100_000,
) -> tuple[float, float, np.ndarray, np.ndarray]:
    """``ogrlineref -get_subline`` (ogrlineref.cpp:434-572): concatenate
    the parts overlapping ``[pos_beg, pos_end]``, trimming the first and
    last to the exact positions.  The step is inferred from the second
    part (like the reference, which reads it off the second feature).

    Driver-sized by construction (the answer is one line covering the
    queried span); guarded by ``max_parts``.
    """
    two = [r for r in parts_df.orderBy("beg").limit(2).collect()]
    if len(two) < 2:
        raise ValueError("parts table needs at least two parts")
    step = two[1]["end"] - two[1]["beg"]
    lo = np.floor(pos_beg / step) * step
    hi = np.ceil(pos_end / step) * step
    sel = parts_df.where((F.col("beg") >= lo) & (F.col("end") <= hi))
    if sel.count() > max_parts:
        raise ValueError("subline span covers too many parts")
    rows = sorted(sel.collect(), key=lambda r: r["beg"])
    if not rows:
        raise ValueError(f"no parts for positions {pos_beg}..{pos_end}")

    def xy(r):
        return _linestring_xy(r["geom_wkb"])

    if len(rows) == 1:
        r = rows[0]
        xs, ys = xy(r)
        sx, sy = polyline_subline(
            xs, ys, (pos_beg - r["beg"]) * r["scale_factor"],
            (pos_end - r["beg"]) * r["scale_factor"])
        return pos_beg, pos_end, sx, sy
    ox, oy = [], []
    r0 = rows[0]
    xs, ys = xy(r0)
    sx, sy = polyline_subline(
        xs, ys, (pos_beg - r0["beg"]) * r0["scale_factor"],
        _cumlen(xs, ys)[-1])
    ox.append(sx), oy.append(sy)
    for r in rows[1:-1]:
        xs, ys = xy(r)
        ox.append(xs), oy.append(ys)
    rn = rows[-1]
    xs, ys = xy(rn)
    sx, sy = polyline_subline(
        xs, ys, 0.0, (pos_end - rn["beg"]) * rn["scale_factor"])
    ox.append(sx), oy.append(sy)
    return pos_beg, pos_end, np.concatenate(ox), np.concatenate(oy)
