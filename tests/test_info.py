"""Dataset-report + raster->vector export operators (apps/gdalinfo_lib.cpp,
apps/gdal2ogr.c, apps/dumpoverviews.cpp, apps/ogrinfo.cpp,
apps/gdalsrsinfo.cpp)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from lib_gdal_spark.functions import crs as CRS
from lib_gdal_spark.functions import geometry as G
from lib_gdal_spark.operators import info as I
from lib_gdal_spark.sources import rasters as RS


@pytest.fixture(scope="module")
def tiles(spark):
    return RS.fixture_rasters(spark).cache()


def test_raster_info_byte20_reference_stats(spark, tiles):
    """byte.tif's published gdalinfo statistics reproduce exactly."""
    row = (
        I.raster_info(tiles)
        .where(F.col("raster_id") == "byte20")
        .collect()[0]
    )
    assert (row["width"], row["height"]) == (20, 20)
    # corners through the UTM11 geotransform (440720, 60, 0, 3751320, 0, -60)
    assert (row["ulx"], row["uly"]) == (440720.0, 3751320.0)
    assert (row["lrx"], row["lry"]) == (441920.0, 3750120.0)
    assert (row["vmin"], row["vmax"]) == (74.0, 255.0)
    assert row["mean"] == pytest.approx(126.765, abs=1e-9)
    assert row["stddev"] == pytest.approx(22.928471, abs=1e-6)


def test_raster_info_multi_tile_size(spark, tiles):
    sizes = {
        r["raster_id"]: (r["width"], r["height"])
        for r in I.raster_info(tiles).collect()
    }
    assert sizes["gradient256"] == (256, 256)
    assert sizes["checker64"] == (64, 64)
    assert sizes["world4326"] == (256, 256)


def test_raster_to_points_centers_and_stride(spark, tiles):
    pts = I.raster_to_points(
        tiles.where(F.col("raster_id") == "byte20"), step=5
    ).toPandas().sort_values("fid").reset_index(drop=True)
    arr = RS.byte20()
    # 20/5 = 4 per axis
    assert len(pts) == 16
    g = RS.BYTE20_GT
    for _, r in pts.iterrows():
        py, px = divmod(int(r["fid"]), 20)
        assert px % 5 == 0 and py % 5 == 0
        assert r["x"] == g[0] + (px + 0.5) * g[1]
        assert r["y"] == g[3] + (py + 0.5) * g[5]
        assert r["z"] == float(arr[py, px])


def test_raster_to_points_polygon_boxes(spark, tiles):
    out = I.raster_to_points(
        tiles.where(F.col("raster_id") == "checker64"), step=32, polygon=True
    ).toPandas().sort_values("fid").reset_index(drop=True)
    assert len(out) == 4
    # pixel box of global pixel (32, 32): gt (0,1,0,64,0,-1)
    r = out[out["fid"] == 32 * 64 + 32].iloc[0]
    rings = G.polygon_rings(bytes(r["geom_wkb"]))
    xs, ys = rings[0][:, 0], rings[0][:, 1]
    assert (xs.min(), xs.max()) == (32.0, 33.0)
    assert (ys.min(), ys.max()) == (31.0, 32.0)
    assert r["value"] == 20.0  # (32//8 + 32//8) even -> lo


def test_dump_overviews_levels_and_crop(spark, tiles):
    d = I.dump_overviews(
        tiles.where(F.col("raster_id") == "checker64"), 3, alg="average"
    )
    got = {
        (r["level"],): (r["tile_w"], r["tile_h"], len(r["pixels"]))
        for r in d.collect()
    }
    assert got[(1,)] == (32, 32, 1024)
    assert got[(2,)] == (16, 16, 256)
    # level 3: 2x2 blocks align with level 2's 2-px squares -> the
    # 8x8 per-pixel checkerboard survives intact
    l3 = d.where(F.col("level") == 3).collect()[0]
    assert (l3["tile_w"], l3["tile_h"]) == (8, 8)
    px = np.array(l3["pixels"]).reshape(8, 8)
    assert set(px.ravel()) == {20.0, 235.0}
    assert px[0, 0] == 20.0 and px[0, 1] == 235.0 and px[1, 0] == 235.0


def test_dump_overviews_odd_size_rule(spark):
    # 45x45 -> 23x23 -> 12x12 (GDAL (n+1)//2 rule)
    arr = np.arange(45 * 45, dtype=np.float64).reshape(45, 45) % 251
    df = spark.createDataFrame(
        pd.DataFrame(
            RS.tiles_from_array("odd", arr.astype(np.uint8),
                                (0, 1, 0, 45, 0, -1), tile=32)
        ),
        schema=RS.RASTER_SCHEMA,
    )
    d = I.dump_overviews(df, 2, alg="nearest", tile=32)
    dims = (
        d.groupBy("level")
        .agg(F.sum(F.col("tile_w") * F.col("tile_h")).alias("npx"))
        .orderBy("level")
        .collect()
    )
    assert [r["npx"] for r in dims] == [45 * 45, 23 * 23, 12 * 12]


def test_layer_summary_mixed_types(spark):
    rows = [(i, bytes(G.wkb_point(float(i), float(-i)))) for i in range(7)]
    rows += [
        (10 + i, bytes(G.wkb_polygon([G.box_ring(i, i, i + 2.0, i + 3.0)])))
        for i in range(3)
    ]
    rows.append(
        (99, bytes(G.wkb_linestring(np.array([[0.0, 0.0], [10.0, 5.0]]))))
    )
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["fid", "geom_wkb"]),
        "fid long, geom_wkb binary",
    )
    s = {r["geom_type"]: r for r in I.layer_summary(df).collect()}
    assert s[1]["n_features"] == 7
    assert (s[1]["minx"], s[1]["maxy"]) == (0.0, 0.0)
    assert (s[1]["maxx"], s[1]["miny"]) == (6.0, -6.0)
    assert s[3]["n_features"] == 3
    assert (s[3]["maxx"], s[3]["maxy"]) == (4.0, 5.0)
    assert s[2]["n_features"] == 1


def test_srs_info_roundtrip_parameters():
    # every registry family reports, and derived k0 matches the projector
    info = CRS.srs_info(3031)
    t = CRS.get_crs_transform(3031)
    assert info["proj"] == "stere"
    assert info["k0"] == pytest.approx(t.k0, rel=0, abs=0)
    assert info["lat_ts"] == -71.0
    utm = CRS.srs_info(32733)
    assert utm["false_n"] == 10000000.0 and utm["k0"] == 0.9996
    lcc = CRS.srs_info(2154)
    assert (lcc["lat1"], lcc["lat2"], lcc["lat0"]) == (49.0, 44.0, 46.5)
    assert math.isnan(CRS.srs_info(4326)["lon0"])


def test_srs_info_unknown_code_raises():
    with pytest.raises(KeyError):
        CRS.srs_info(99999)
