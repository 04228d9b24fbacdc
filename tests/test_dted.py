"""DTED codec (sources/dted.py) — reference-anchor + round-trip."""

import os

import numpy as np
import pytest

from lib_gdal_spark.kernels.checksum import gdal_checksum
from lib_gdal_spark.sources.dted import parse_dted, read_dted, write_dted

REF = "/root/reference/tests/cpp/data/n43.dt0"


@pytest.mark.skipif(not os.path.exists(REF),
                    reason="reference test data not present")
def test_reference_anchor_49187():
    """test_gdal_dted.cpp:73 pins n43.dt0 band 1 at checksum 49187."""
    arr, gt = parse_dted(open(REF, "rb").read())
    assert arr.shape == (121, 121)
    assert gdal_checksum(arr) == 49187
    assert round(gt[0], 9) == -80.004166667
    assert round(gt[3], 9) == 44.004166667
    assert round(gt[1], 9) == 0.008333333 and gt[2] == 0.0


def test_roundtrip_signed_magnitude():
    rng = np.random.default_rng(5)
    a = rng.integers(-500, 3000, (121, 121)).astype(np.float64)
    got, gt = parse_dted(write_dted(a, lon0=-80, lat0=43))
    assert np.array_equal(got, a)
    assert round(gt[0], 9) == -80.004166667


def test_distributed(spark, tmp_path):
    a = (np.arange(121 * 121, dtype=np.float64).reshape(121, 121)
         % 1000) - 100
    (tmp_path / "n43.dt0").write_bytes(write_dted(a, lon0=-80, lat0=43))
    tiles = read_dted(spark, str(tmp_path / "*.dt0"), tile=64).collect()
    assert len(tiles) == 4  # 2x2 tiles of 64 over 121x121
    assert sum(sum(r["pixels"]) for r in tiles) == float(a.sum())
