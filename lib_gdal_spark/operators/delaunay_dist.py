"""Distributed Delaunay triangulation (removes grid_linear's driver guard).

Block-partitioned Bowyer–Watson with a PER-POINT settlement certificate:

1. Points hash to a ``cells x cells`` grid over their bbox; each round,
   every ACTIVE cell gathers its points plus all points within halo ``h``
   of its box and triangulates the window locally.
2. **Triangle proof**: a local triangle whose circumcircle lies entirely
   inside the gathered window is a GLOBAL Delaunay triangle — the whole
   empty-circumcircle region was observed, so no unseen point can break
   it. (General position assumed, as for any Delaunay consumer.)
3. **Point settlement**: an interior point p is SETTLED when its local
   incident triangles are all proven AND they close a full 2π fan around
   p. A closed fan of globally-valid triangles *is* p's global fan — no
   further global triangle can be incident to p. Settlement is evaluated
   only by p's owner cell (the one containing it, last row/column edges
   closed), so it fires exactly once.
4. **Emission**: each triangle is emitted in the round where its
   lexicographically-smallest vertex settles (that vertex's fan contains
   the triangle) — exactly-once without a dedup shuffle.
5. Unsettled points (global-hull vertices, whose fans never close, and
   points needing larger context) escalate with doubled halo; the final
   guarded fallback triangulates once and emits only triangles owned by
   still-unsettled vertices. On geographic data the unsettled tail is
   the convex hull plus a thin fringe — vanishingly small next to n.

The union is the exact global triangle set, verified against the
single-node construction (unique in general position).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lib_gdal_spark.functions import delaunay as DT


def _settle_and_emit(
    pid: np.ndarray,
    pts: np.ndarray,
    own_mask: np.ndarray,
    window,
) -> tuple[list[tuple[int, int, int]], np.ndarray]:
    """Triangulate a window -> (emitted triangles, settled pids).

    ``own_mask``: which local points this task may settle.
    """
    wx0, wy0, wx1, wy1 = window
    verts, tris = DT.delaunay(pts)
    n = len(pts)
    if len(tris) == 0:
        return [], np.empty(0, dtype=np.int64)
    proven = np.zeros(len(tris), dtype=bool)
    for ti, t in enumerate(tris):
        cx, cy, r2 = DT._circum(verts, t)
        r = float(np.sqrt(max(r2, 0.0)))
        proven[ti] = (cx - r >= wx0 and cx + r <= wx1
                      and cy - r >= wy0 and cy + r <= wy1)
    # per-point incident angle sums + all-incident-proven flags
    ang = np.zeros(n)
    allprov = np.ones(n, dtype=bool)
    has_tri = np.zeros(n, dtype=bool)
    for ti, t in enumerate(tris):
        for k in range(3):
            p = t[k]
            a = pts[t[(k + 1) % 3]] - pts[p]
            b = pts[t[(k + 2) % 3]] - pts[p]
            na = float(np.hypot(a[0], a[1]))
            nb = float(np.hypot(b[0], b[1]))
            cosang = np.clip((a @ b) / (na * nb), -1.0, 1.0)
            ang[p] += float(np.arccos(cosang))
            has_tri[p] = True
            if not proven[ti]:
                allprov[p] = False
    settled_local = (own_mask & has_tri & allprov
                     & (np.abs(ang - 2.0 * np.pi) < 1e-9))
    # emit triangles whose lex-min vertex settles here
    emitted: list[tuple[int, int, int]] = []
    for ti, t in enumerate(tris):
        if not proven[ti]:
            continue
        tx = pts[list(t), 0]
        ty = pts[list(t), 1]
        owner = t[int(np.lexsort((ty, tx))[0])]
        if settled_local[owner]:
            ids = sorted(int(pid[v]) for v in t)
            emitted.append((ids[0], ids[1], ids[2]))
    return emitted, pid[settled_local]


def delaunay_distributed(
    points: DataFrame,
    spark: SparkSession,
    cells: int = 8,
    max_rounds: int = 4,
    point_cols: tuple[str, str, str] = ("pid", "x", "y"),
    max_fallback_points: int = 2_000_000,
) -> DataFrame:
    """points(pid, x, y) -> triangles (ia, ib, ic) of the global Delaunay."""
    pidc, xc, yc = point_cols
    ext = points.agg(
        F.min(xc).alias("x0"), F.max(xc).alias("x1"),
        F.min(yc).alias("y0"), F.max(yc).alias("y1"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    if ext["n"] < 3:
        return spark.createDataFrame([], "ia long, ib long, ic long")
    x0g, x1g = float(ext["x0"]), float(ext["x1"])
    y0g, y1g = float(ext["y0"]), float(ext["y1"])
    wx = max(x1g - x0g, 1e-9) / cells
    wy = max(y1g - y0g, 1e-9) / cells

    pts_df = points.select(
        F.col(pidc).alias("pid"), F.col(xc).alias("x"), F.col(yc).alias("y")
    ).localCheckpoint()

    unsettled: DataFrame | None = pts_df
    results: list[DataFrame] = []
    h = h_init = 1.5 * max(wx, wy)

    for _ in range(max_rounds):
        act = (
            unsettled.select(
                F.least(F.floor((F.col("x") - x0g) / wx).cast("int"),
                        F.lit(cells - 1)).alias("ci"),
                F.least(F.floor((F.col("y") - y0g) / wy).cast("int"),
                        F.lit(cells - 1)).alias("cj"),
            ).distinct().collect()
        )
        active_set = {(r["ci"], r["cj"]) for r in act}
        if not active_set:
            unsettled = None
            break
        unsettled_flags = unsettled.select(
            "pid", F.lit(1).alias("__u")
        )

        def gather(batches: Iterator[pd.DataFrame], h=h,
                   active_set=active_set) -> Iterator[pd.DataFrame]:
            for b in batches:
                px = b["x"].to_numpy(np.float64)
                py = b["y"].to_numpy(np.float64)
                rows = {"cx": [], "cy": [], "pid": [], "x": [], "y": []}
                ci0 = np.floor((px - h - x0g) / wx).astype(np.int64)
                ci1 = np.floor((px + h - x0g) / wx).astype(np.int64)
                cj0 = np.floor((py - h - y0g) / wy).astype(np.int64)
                cj1 = np.floor((py + h - y0g) / wy).astype(np.int64)
                for idx in range(len(b)):
                    for ci in range(max(ci0[idx], 0),
                                    min(ci1[idx], cells - 1) + 1):
                        for cj in range(max(cj0[idx], 0),
                                        min(cj1[idx], cells - 1) + 1):
                            if (ci, cj) not in active_set:
                                continue
                            rows["cx"].append(ci)
                            rows["cy"].append(cj)
                            rows["pid"].append(int(b["pid"].iloc[idx]))
                            rows["x"].append(px[idx])
                            rows["y"].append(py[idx])
                yield pd.DataFrame(rows)

        gathered = pts_df.mapInPandas(
            gather, schema="cx int, cy int, pid long, x double, y double"
        ).join(unsettled_flags, "pid", "left")

        def make_task(h_local):
            def task(key, pdf: pd.DataFrame) -> pd.DataFrame:
                ci, cj = int(key[0]), int(key[1])
                box = (x0g + ci * wx, y0g + cj * wy,
                       x0g + (ci + 1) * wx, y0g + (cj + 1) * wy)
                window = (box[0] - h_local, box[1] - h_local,
                          box[2] + h_local, box[3] + h_local)
                cols = ["kind", "ia", "ib", "ic"]
                pid = pdf["pid"].to_numpy(np.int64)
                pts = pdf[["x", "y"]].to_numpy(np.float64)
                if len(pts) < 3:
                    return pd.DataFrame(columns=cols)
                is_unsettled = pdf["__u"].notna().to_numpy()
                in_x = (pts[:, 0] >= box[0]) & (
                    (pts[:, 0] < box[2])
                    | ((ci == cells - 1) & (pts[:, 0] == box[2])))
                in_y = (pts[:, 1] >= box[1]) & (
                    (pts[:, 1] < box[3])
                    | ((cj == cells - 1) & (pts[:, 1] == box[3])))
                own = in_x & in_y & is_unsettled
                emitted, settled = _settle_and_emit(pid, pts, own, window)
                rows = [{"kind": 0, "ia": a, "ib": b2, "ic": c}
                        for a, b2, c in emitted]
                rows += [{"kind": 1, "ia": int(s), "ib": -1, "ic": -1}
                         for s in settled]
                return pd.DataFrame(rows, columns=cols)
            return task

        out = gathered.groupBy("cx", "cy").applyInPandas(
            make_task(h),
            schema="kind int, ia long, ib long, ic long",
        ).localCheckpoint()

        results.append(out.where(F.col("kind") == 0).select("ia", "ib", "ic"))
        settled_ids = out.where(F.col("kind") == 1).select(
            F.col("ia").alias("pid")
        )
        unsettled = unsettled.join(settled_ids, "pid", "left_anti") \
            .localCheckpoint()
        if unsettled.isEmpty():
            unsettled = None
            break
        h *= 2.0

    if unsettled is not None:
        fb = _fallback_fringe(
            pts_df, unsettled, (x0g, y0g, x1g, y1g), h_init,
            max_fallback_points,
        )
        results.append(fb)

    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    return out




def _subset_triangulate(pdf: pd.DataFrame, upid: np.ndarray, left: set):
    """Triangulate the gathered subset; return (emit_rows, circles, wedges).

    ``circles``: (cx, cy, r2) of every unsettled-owned triangle — its
    global empty-circumcircle property is what emission asserts.
    ``wedges``: (px, py, th1, th2) open fan sectors (CCW gap th1->th2) of
    unsettled points — a global triangle with a far vertex could only
    attach there.
    """
    pid = pdf["pid"].to_numpy(np.int64)
    pts = pdf[["x", "y"]].to_numpy(np.float64)
    verts, tris = DT.delaunay(pts)
    is_u = np.isin(pid, upid)
    fans: dict[int, list[tuple[float, float]]] = {
        int(i): [] for i in np.where(is_u)[0]
    }
    rows = []
    circles = []
    for t in tris:
        tx = pts[list(t), 0]
        ty = pts[list(t), 1]
        owner = t[int(np.lexsort((ty, tx))[0])]
        for k in range(3):
            pl = int(t[k])
            if pl in fans:
                a = pts[t[(k + 1) % 3]] - pts[pl]
                b2 = pts[t[(k + 2) % 3]] - pts[pl]
                fans[pl].append((
                    float(np.arctan2(a[1], a[0])),
                    float(np.arctan2(b2[1], b2[0])),
                ))
        if int(pid[owner]) not in left:
            continue
        cx, cy, r2 = DT._circum(verts, t)
        circles.append((float(cx), float(cy), float(r2)))
        ids = sorted(int(pid[v]) for v in t)
        rows.append((ids[0], ids[1], ids[2]))
    wedges = []
    two_pi = 2.0 * np.pi
    for pl, edges in fans.items():
        px, py = float(pts[pl, 0]), float(pts[pl, 1])
        if not edges:
            wedges.append((px, py, 0.0, two_pi))
            continue
        # normalize each incident interval CCW with span < pi (triangle
        # vertex angles are < pi), then walk the union to find gaps
        ivs = []
        for tha, thb in edges:
            lo, hi = tha % two_pi, thb % two_pi
            if ((hi - lo) % two_pi) > np.pi:
                lo, hi = hi, lo
            ivs.append((lo, (hi - lo) % two_pi))
        ivs.sort()
        total = sum(s for _, s in ivs)
        if total >= two_pi - 1e-9:
            continue
        end = ivs[0][0] + ivs[0][1]
        for j in range(1, len(ivs)):
            lo, span = ivs[j]
            if lo > end + 1e-12:
                wedges.append((px, py, end % two_pi, lo % two_pi))
            end = max(end, lo + span)
        wrap_gap = (ivs[0][0] + two_pi) - end
        if wrap_gap > 1e-12:
            wedges.append((px, py, end % two_pi, ivs[0][0] % two_pi))
    return rows, circles, wedges


def _fallback_fringe(
    pts_df: DataFrame,
    unsettled: DataFrame,
    bbox: tuple[float, float, float, float],
    h0: float,
    max_fallback_points: int,
    max_iters: int = 8,
) -> DataFrame:
    """Self-certifying fringe fallback (VERDICT r2 #9 / TODO #2).

    Instead of gathering the FULL point set into one task, gather only
    points within reach ``D = 4*h0`` of the unsettled fringe, triangulate
    that subset on the driver-sized gather, and CERTIFY the result with an
    exact DISTRIBUTED check: broadcast every unsettled-owned triangle's
    circumcircle and every unsettled point's open fan wedge, and scan the
    full point table for ungathered points strictly inside any of them. A
    violator is precisely a point that could change the fringe fan — it
    joins the gather and the subset retriangulates. No violators ==
    certificate: each emitted triangle's circumcircle is globally empty
    (it is a global Delaunay triangle) and each open fan faces a globally
    point-free sector (the true hull gap), so every global triangle owned
    by an unsettled vertex is present. Converges in one or two iterations
    on real data (the violators are the hull fringe); the guard applies
    to the GATHERED subset, not the total point count.
    """
    spark = pts_df.sparkSession
    urows = unsettled.select("pid", "x", "y").collect()
    if len(urows) > max_fallback_points:
        raise RuntimeError(
            f"delaunay fallback: {len(urows)} unsettled points exceed "
            f"max_fallback_points={max_fallback_points}"
        )
    upid = np.array([int(r["pid"]) for r in urows], dtype=np.int64)
    uxy = np.array([[float(r["x"]), float(r["y"])] for r in urows])
    left = set(int(v) for v in upid)
    # density-based initial reach: a few nearest-neighbor spacings around
    # each unsettled point — the violation loop below grows the gather
    # EXACTLY where the certificate demands, so undershooting only costs
    # an extra iteration while overshooting (the old 4*halo) degenerates
    # to a near-full gather on small grids
    x0g, y0g, x1g, y1g = bbox
    n_total = pts_df.count()
    area = max((x1g - x0g) * (y1g - y0g), 1e-18)
    D = max(4.0 * float(np.sqrt(area / max(n_total, 1))), 1e-9)
    two_pi = 2.0 * np.pi
    extra: set[int] = set()

    for _ in range(max_iters):
        extra_ids = np.array(sorted(extra), dtype=np.int64)

        def within(batches: Iterator[pd.DataFrame], D=D,
                   extra_ids=extra_ids) -> Iterator[pd.DataFrame]:
            for b in batches:
                px = b["x"].to_numpy(np.float64)
                py = b["y"].to_numpy(np.float64)
                keep = np.isin(b["pid"].to_numpy(np.int64), extra_ids)
                for j0 in range(0, len(uxy), 256):
                    q = uxy[j0:j0 + 256]
                    d2 = ((px[:, None] - q[None, :, 0]) ** 2
                          + (py[:, None] - q[None, :, 1]) ** 2)
                    keep |= (d2 <= D * D).any(axis=1)
                yield b.loc[keep]

        gathered = pts_df.mapInPandas(
            within, schema="pid long, x double, y double"
        ).localCheckpoint()
        n_g = gathered.count()
        if n_g > max_fallback_points:
            raise RuntimeError(
                f"delaunay fallback gather ({n_g} points at reach {D:.3g})"
                f" exceeds max_fallback_points={max_fallback_points}"
            )
        gpdf = gathered.toPandas()
        rows, circles, wedges = _subset_triangulate(gpdf, upid, left)
        gids = np.sort(gpdf["pid"].to_numpy(np.int64))
        carr = np.asarray(circles, dtype=np.float64).reshape(-1, 3)
        warr = np.asarray(wedges, dtype=np.float64).reshape(-1, 4)

        def violators(batches: Iterator[pd.DataFrame], carr=carr,
                      warr=warr, gids=gids) -> Iterator[pd.DataFrame]:
            for b in batches:
                pidb = b["pid"].to_numpy(np.int64)
                ung = ~np.isin(pidb, gids)
                if not ung.any():
                    yield b.loc[[]]
                    continue
                px = b["x"].to_numpy(np.float64)[ung]
                py = b["y"].to_numpy(np.float64)[ung]
                bad = np.zeros(len(px), dtype=bool)
                for j0 in range(0, len(carr), 512):
                    c = carr[j0:j0 + 512]
                    d2 = ((px[:, None] - c[None, :, 0]) ** 2
                          + (py[:, None] - c[None, :, 1]) ** 2)
                    r2 = c[None, :, 2]
                    bad |= (d2 < r2 * (1.0 - 1e-12)).any(axis=1)
                for j0 in range(0, len(warr), 512):
                    w = warr[j0:j0 + 512]
                    dx = px[:, None] - w[None, :, 0]
                    dy = py[:, None] - w[None, :, 1]
                    th = np.arctan2(dy, dx) % (2.0 * np.pi)
                    span = (w[None, :, 3] - w[None, :, 2]) % (2.0 * np.pi)
                    span = np.where(span == 0.0, 2.0 * np.pi, span)
                    rel = (th - w[None, :, 2]) % (2.0 * np.pi)
                    inside = (rel < span) & (dx * dx + dy * dy > 1e-18)
                    bad |= inside.any(axis=1)
                out = b.loc[ung].loc[bad]
                yield out

        viol = pts_df.mapInPandas(
            violators, schema="pid long, x double, y double"
        ).select("pid").collect()
        if not viol:
            return spark.createDataFrame(
                pd.DataFrame(rows, columns=["ia", "ib", "ic"])
                if rows else pd.DataFrame(columns=["ia", "ib", "ic"]),
                schema="ia long, ib long, ic long",
            )
        new_ids = {int(r["pid"]) for r in viol}
        if new_ids <= extra:
            raise RuntimeError("delaunay fallback did not converge")
        extra |= new_ids

    raise RuntimeError(
        f"delaunay fallback: certificate did not converge in "
        f"{max_iters} iterations ({len(extra)} violators gathered)"
    )
