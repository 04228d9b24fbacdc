"""AAIGrid + XYZ ASCII raster codecs (sources/asciigrid.py)."""

import numpy as np

from lib_gdal_spark.kernels.checksum import gdal_checksum
from lib_gdal_spark.sources.asciigrid import (
    parse_aaigrid, parse_xyz, read_aaigrid, read_xyz,
    write_aaigrid, write_xyz,
)
from lib_gdal_spark.sources.rasters import byte20


GT = (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)


def test_aaigrid_roundtrip():
    arr = byte20().astype(np.float64)
    txt = write_aaigrid(arr, GT, nodata=-9999.0)
    got, gt, nodata = parse_aaigrid(txt)
    assert np.array_equal(got, arr) and gt == GT and nodata == -9999.0
    assert gdal_checksum(got) == 4672


def test_aaigrid_llcenter():
    txt = ("ncols 2\nnrows 2\nxllcenter 10\nyllcenter 20\ncellsize 4\n"
           "1 2\n3 4\n")
    arr, gt, nodata = parse_aaigrid(txt)
    # center -> corner shift of half a cell
    assert gt == (8.0, 4.0, 0.0, 26.0, 0.0, -4.0)
    assert arr.tolist() == [[1.0, 2.0], [3.0, 4.0]]
    assert nodata is None


def test_xyz_roundtrip_any_row_order():
    arr = byte20().astype(np.float64)
    txt = write_xyz(arr, GT)
    got, gt = parse_xyz(txt)
    assert np.array_equal(got, arr) and gt == GT
    # bottom-up line order parses identically
    lines = txt.strip().split("\n")
    got2, gt2 = parse_xyz("\n".join(reversed(lines)))
    assert np.array_equal(got2, arr) and gt2 == GT


def test_distributed_reads(spark, tmp_path):
    arr = byte20().astype(np.float64)
    (tmp_path / "a.asc").write_text(write_aaigrid(arr, GT))
    (tmp_path / "b.xyz").write_text(write_xyz(arr, GT))
    for df in (read_aaigrid(spark, str(tmp_path / "*.asc"), tile=16),
               read_xyz(spark, str(tmp_path / "*.xyz"), tile=16)):
        rows = df.collect()
        assert len(rows) == 4  # 2x2 tiles of 16 over 20x20
        assert sum(sum(r["pixels"]) for r in rows) == float(arr.sum())


def test_reference_anchors():
    """test_gdal_aaigrid.cpp pins pixel_per_line.asc at checksum 1123
    and byte.tif.grd at 4672 — files written by the real toolchain
    (incl. Fortran scientific-notation headers)."""
    import os
    import pytest as _pt
    base = "/root/reference/tests/cpp/data"
    if not os.path.exists(f"{base}/pixel_per_line.asc"):
        _pt.skip("reference test data not present")
    arr, gt, nd = parse_aaigrid(open(f"{base}/pixel_per_line.asc").read())
    assert gdal_checksum(arr) == 1123
    assert gt == (100000.0, 50.0, 0.0, 650600.0, 0.0, -50.0)
    assert nd == -99999.0
    arr, gt, _ = parse_aaigrid(open(f"{base}/byte.tif.grd").read())
    assert gdal_checksum(arr) == 4672 and gt == GT
