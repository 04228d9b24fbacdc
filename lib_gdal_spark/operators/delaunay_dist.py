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
    h = 1.5 * max(wx, wy)

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
        n_total = pts_df.count()
        if n_total > max_fallback_points:
            raise RuntimeError(
                f"delaunay fallback needs the full point set ({n_total}); "
                "raise max_rounds/max_fallback_points"
            )
        left = {int(r["pid"]) for r in unsettled.select("pid").collect()}

        def tri_all(key, pdf: pd.DataFrame) -> pd.DataFrame:
            pid = pdf["pid"].to_numpy(np.int64)
            pts = pdf[["x", "y"]].to_numpy(np.float64)
            verts, tris = DT.delaunay(pts)
            rows = []
            for t in tris:
                tx = pts[list(t), 0]
                ty = pts[list(t), 1]
                owner = t[int(np.lexsort((ty, tx))[0])]
                if int(pid[owner]) in left:
                    ids = sorted(int(pid[v]) for v in t)
                    rows.append({"ia": ids[0], "ib": ids[1], "ic": ids[2]})
            return pd.DataFrame(rows, columns=["ia", "ib", "ic"])

        fb = pts_df.withColumn("g", F.lit(1)).groupBy("g").applyInPandas(
            tri_all, schema="ia long, ib long, ic long"
        )
        results.append(fb)

    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    return out
