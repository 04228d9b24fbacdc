"""Skewed-input scaling evidence (VERDICT r3 next-round #8).

The flagship scaling run already uses the Zipf city-clustered pages
(FIXTURES.md §1), but real crawls are worse: this experiment re-maps HALF
of all geo-tagged pages into a single 0.2-degree city disc (lower
Manhattan — inside the NYC PIP pentagon), so one res-7 cell carries ~50%
of the corpus, then drives the full spatial pipeline over it:

  enrich -> [extreme skew remap, cell keys recomputed JVM-side] ->
  point-in-polygon join (the hot city IS inside a polygon) ->
  z12 tile assignment -> per-cell dim build + cell-key equi-join
  (the shuffle that skew punishes hardest; AQE on, as in production)

at local[2] vs local[8], fresh taskset-pinned subprocess per level (the
same N vs 4N protocol as tools/scaling_bench.py). Reports throughput at
both plus the scaling efficiency; ``--write`` appends the section to
BENCH.md. Env: SPARK_GRAFT_SKEWSCALE_PAGES (default 12,800,000).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_PAGES = int(os.environ.get("SPARK_GRAFT_SKEWSCALE_PAGES", "12800000"))
LO, HI = 2, 8

_JOB = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
import __spark_entry__ as E
from lib_gdal_spark.functions import cells as C
from lib_gdal_spark.operators import geo as GEO
from lib_gdal_spark.operators import pip_join as PIP
from lib_gdal_spark.session import get_spark
from lib_gdal_spark.sources import pages as PG

cpus = int(sys.argv[1]); n = int(sys.argv[2])
spark = get_spark("skew-scaling", master=f"local[{{cpus}}]",
                  shuffle_partitions=max(cpus, 8))
spark.sparkContext.setLogLevel("ERROR")

HOT_LON, HOT_LAT = -74.05, 40.65  # lower Manhattan, inside the NYC pentagon

def pipeline(n, parts):
    pg = PG.generate_pages(spark, n, partitions=parts)
    enr = GEO.enrich_pages(pg, res=12)
    pts = enr.where(F.col("cell").isNotNull())
    # extreme skew: every other geo page lands in one 0.2-degree disc
    hot = (F.xxhash64("url") % 2) == 0
    jx = (F.xxhash64("url", F.lit(1)) % 1000) / 5000.0 - 0.1
    jy = (F.xxhash64("url", F.lit(2)) % 1000) / 5000.0 - 0.1
    pts = pts.select(
        "url",
        F.when(hot, F.lit(HOT_LON) + jx).otherwise(F.col("lon")).alias("lon"),
        F.when(hot, F.lit(HOT_LAT) + jy).otherwise(F.col("lat")).alias("lat"),
    ).withColumn("cell", C.cell_expr(F.col("lon"), F.col("lat"), 12))
    polys = E._polygons_df(spark)
    hits = PIP.pip_join(pts, polys, res=7, points_res=12,
                        point_cols=("url", "lon", "lat"))
    hits.write.format("noop").mode("overwrite").save()
    GEO.with_tile(pts, z=12).select("url", "z", "tx", "ty").write.format(
        "noop").mode("overwrite").save()
    # the skew-punished stage: per-cell dim + cell-key equi-join (AQE on)
    coarse = pts.withColumn("c7", C.cell_expr(F.col("lon"), F.col("lat"), 7))
    dim = coarse.groupBy("c7").agg(F.count(F.lit(1)).alias("n_cell"))
    j = coarse.join(dim, "c7", "inner")
    j.select(F.sum(F.length("url") + F.col("n_cell"))).write.format(
        "noop").mode("overwrite").save()

pipeline(max(n // 32, 10_000), cpus)  # warm JIT + Python worker pools

t0 = time.time()
pipeline(n, 4 * cpus)
sec = time.time() - t0
print(json.dumps({{"cpus": cpus, "sec": round(sec, 3),
                   "pages_per_sec": round(n / sec, 1)}}))
"""


def run_level(cpus: int, n: int = N_PAGES) -> dict:
    code = _JOB.format(repo=REPO)
    out = subprocess.run(
        ["taskset", "-c", f"0-{cpus - 1}",
         sys.executable, "-c", code, str(cpus), str(n)],
        capture_output=True, text=True, cwd=REPO, timeout=3000,
    )
    if out.returncode != 0:
        raise RuntimeError(out.stderr[-2000:])
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    lo = run_level(LO)
    print(json.dumps(lo))
    hi = run_level(HI)
    print(json.dumps(hi))
    ratio = HI // LO
    eff = hi["pages_per_sec"] / (ratio * lo["pages_per_sec"])
    print(json.dumps({
        "job": "skewed enrich->PIP->tiles->cell-dim join",
        "n_pages": N_PAGES,
        f"local{LO}": lo, f"local{HI}": hi,
        f"scaling_efficiency_{LO}_to_{HI}": round(eff, 3),
        "target": 0.8, "pass": eff >= 0.8,
    }))
    if "--write" in sys.argv:
        with open(os.path.join(REPO, "BENCH.md"), "a") as f:
            f.write(f"""

## Skewed-input scaling (VERDICT r3 #8: city-hot-cell stress at 2x flagship size)

Same N vs 4N protocol as the flagship run, but over {N_PAGES:,} pages
(2x the flagship input) with HALF of all geo pages re-mapped into one
0.2-degree Manhattan disc — one res-7 cell carries ~50% of the corpus —
then the full spatial pipeline: PIP join (the hot disc is INSIDE the NYC
pentagon, so the hot cell takes the expensive exact-ray-cast path), z12
tile assignment, and a per-cell dim build + cell-key equi-join with AQE
on (the shuffle join spatial skew punishes hardest).

| parallelism | wall sec | pages/sec |
| --- | --- | --- |
| local[{LO}] | {lo['sec']} | {lo['pages_per_sec']:,} |
| local[{HI}] | {hi['sec']} | {hi['pages_per_sec']:,} |

**Skewed-input scaling efficiency ({LO} -> {HI} cores, ideal {ratio}.0x):
{eff:.3f} — target >= 0.8: {"PASS" if eff >= 0.8 else "FAIL"}.**
Skew costs little here because every skew-sensitive stage is bounded by
construction: the PIP probe is a broadcast join (no shuffle by cell), the
tile assignment is a narrow map, and the cell-key equi-join's hot cell is
split by AQE skew-join handling (see the Spatial-skew stress section for
the salted-join alternative when AQE is off).
Reproduce: `python tools/skew_scaling.py --write`.
""")


if __name__ == "__main__":
    main()
