"""The north-star pipeline as a ``spark-submit`` entry script.

Run (the deployment shape the north rule names — the package ships to
executors via --py-files, no worker-side install):

    python tools/make_submit_zip.py
    spark-submit --master local[8] \\
        --py-files dist/lib_gdal_spark.zip \\
        tools/submit_job.py 100000

On a real cluster swap the master URL and executor counts; the job itself
is unchanged (pages -> extraction -> PIP spatial join + tile assignment),
and prints ONE JSON line with the throughput.
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    spark = SparkSession.builder.appName("lib_gdal_spark-submit").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    # imports resolve from the --py-files zip on driver AND executors
    from lib_gdal_spark.functions import geometry as G
    from lib_gdal_spark.operators import geo as GEO
    from lib_gdal_spark.operators import pip_join as PIP
    from lib_gdal_spark.sources import pages as PG

    t0 = time.time()
    pg = PG.generate_pages(spark, n)
    enr = GEO.enrich_pages(pg, res=12).persist()
    try:
        ring = G.box_ring(-30.0, 20.0, 40.0, 60.0)
        polys = spark.createDataFrame(
            [(1, bytearray(G.wkb_polygon([ring])))],
            "fid long, geom_wkb binary",
        )
        pts = enr.where(F.col("cell").isNotNull())
        hits = PIP.pip_join(pts, polys, res=7, points_res=12,
                            point_cols=("url", "lon", "lat"))
        n_hits = hits.count()
        tiled = GEO.with_tile(enr, z=12)
        n_tiles = tiled.select("tx", "ty").distinct().count()
    finally:
        enr.unpersist()
    dt = time.time() - t0
    print(json.dumps({
        "pages": n, "pip_hits": n_hits, "distinct_tiles": n_tiles,
        "sec": round(dt, 3), "pages_per_sec": round(n / dt, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
