"""Zonal statistics (raster x vector composition)."""


def test_zonal_stats(spark):
    import numpy as np
    import pandas as pd
    from lib_gdal_spark.operators.stats import zonal_stats

    # 2 tiles of 2x2; zones: tile0 = [1,1,2,0], tile1 = [2,2,0,0]
    # values:               tile0 = [10,20,30,40], tile1 = [5,7,9,11]
    zp = [[1.0, 1.0, 2.0, 0.0], [2.0, 2.0, 0.0, 0.0]]
    vp = [[10.0, 20.0, 30.0, 40.0], [5.0, 7.0, 9.0, 11.0]]
    zdf = spark.createDataFrame(
        pd.DataFrame({"tile_x": [0, 1], "tile_y": [0, 0],
                      "pixels": [np.array(p) for p in zp]}),
        schema="tile_x int, tile_y int, pixels array<double>")
    vdf = spark.createDataFrame(
        pd.DataFrame({"tile_x": [0, 1], "tile_y": [0, 0],
                      "pixels": [np.array(p) for p in vp]}),
        schema="tile_x int, tile_y int, pixels array<double>")
    got = {r["zone"]: (r["n_pixels"], r["v_sum"], r["v_min"], r["v_max"],
                       r["v_mean"])
           for r in zonal_stats(zdf, vdf).collect()}
    assert got == {
        1.0: (2, 30.0, 10.0, 20.0, 15.0),
        2.0: (3, 42.0, 5.0, 30.0, 14.0),
    }


def test_hypsometric_known_distribution(spark):
    """A 4-step staircase raster: each elevation quarter holds 1/4 of
    the area, so frac_above descends 1.0, 0.75, 0.5, 0.25."""
    import numpy as np
    import pandas as pd

    from lib_gdal_spark.operators.stats import hypsometric
    from lib_gdal_spark.sources.rasters import RASTER_SCHEMA, tiles_from_array

    arr = np.repeat(np.array([10.0, 30.0, 50.0, 70.0]), 16 * 64).reshape(64, 64)
    rows = tiles_from_array("stairs", arr, (0, 1, 0, 64, 0, -1), tile=32)
    tiles = spark.createDataFrame(pd.DataFrame(rows), schema=RASTER_SCHEMA)
    out = {r["bucket"]: r for r in
           hypsometric(tiles, 0.0, 80.0, buckets=4).collect()}
    assert sorted(out) == [0, 1, 2, 3]
    for b in out.values():
        assert b["count"] == 1024
    assert [out[b]["frac_above"] for b in (0, 1, 2, 3)] == [1.0, 0.75, 0.5, 0.25]
    assert [out[b]["elev_lo"] for b in (0, 1, 2, 3)] == [0.0, 20.0, 40.0, 60.0]


def test_classify_quantiles_equal_frequency(spark):
    import numpy as np
    import pandas as pd
    from lib_gdal_spark.operators.stats import classify_quantiles
    from lib_gdal_spark.sources import rasters as RS

    # values 0..4095 once each: quartiles split exactly into 4 x 1024
    arr = np.arange(64 * 64, dtype=float).reshape(64, 64)
    rows = RS.tiles_from_array("t", arr, (0, 1, 0, 64, 0, -1), tile=32)
    tiles = spark.createDataFrame(pd.DataFrame(rows), schema=RS.RASTER_SCHEMA)
    out = classify_quantiles(tiles, k=4, tile=32).toPandas()
    counts = out.groupby("cls").size().to_dict()
    assert counts == {0: 1024, 1: 1024, 2: 1024, 3: 1024}
    # class is monotone in value
    s = out.sort_values("v")
    assert (s.cls.diff().fillna(0) >= 0).all()
