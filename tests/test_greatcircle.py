"""OGR great-circle helpers (ogr_geo_utils.cpp parity anchors)."""

import math

from pyspark.sql import functions as F

from lib_gdal_spark.functions.greatcircle import (
    RAD2METER,
    great_circle_distance,
    great_circle_extend_position,
    great_circle_initial_heading,
)


def _one(spark, lat_a, lon_a, lat_b, lon_b):
    df = spark.createDataFrame([(lat_a, lon_a, lat_b, lon_b)],
                               "la double, loa double, lb double, lob double")
    d = great_circle_distance(F.col("la"), F.col("loa"),
                              F.col("lb"), F.col("lob"))
    h = great_circle_initial_heading(F.col("la"), F.col("loa"),
                                     F.col("lb"), F.col("lob"))
    pos = great_circle_extend_position(F.col("la"), F.col("loa"), d, h)
    return df.select(d.alias("d"), h.alias("h"),
                     pos["lat"].alias("lat2"),
                     pos["lon"].alias("lon2")).collect()[0]


class TestGreatCircle:
    def test_equator_quarter(self, spark):
        r = _one(spark, 0.0, 0.0, 0.0, 90.0)
        assert abs(r.d - (math.pi / 2) * RAD2METER) < 1e-6
        assert r.h == 90.0  # equator special case

    def test_meridian_heading(self, spark):
        r = _one(spark, 10.0, 5.0, 40.0, 5.0)
        assert r.h == 0.0
        r = _one(spark, 40.0, 5.0, 10.0, 5.0)
        assert r.h == 180.0

    def test_pole_heading(self, spark):
        assert _one(spark, 90.0, 0.0, 10.0, 20.0).h == 180.0
        assert _one(spark, -90.0, 0.0, 10.0, 20.0).h == 0.0

    def test_extend_roundtrip(self, spark):
        # generic pair: dead-reckoning distance+heading from A lands on B
        r = _one(spark, 12.3, -45.6, 33.3, 7.7)
        assert abs(r.lat2 - 33.3) < 1e-8
        assert abs(r.lon2 - 7.7) < 1e-8

    def test_zero_distance(self, spark):
        r = _one(spark, 12.0, 34.0, 12.0, 34.0)
        assert r.d == 0.0 and r.lat2 == 12.0 and r.lon2 == 34.0
