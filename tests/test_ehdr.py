"""EHdr/ENVI flat-binary raster source (sources/ehdr.py)."""

import numpy as np
import pytest

from lib_gdal_spark.kernels.checksum import gdal_checksum
from lib_gdal_spark.sources.ehdr import parse_ehdr, read_ehdr, write_ehdr
from lib_gdal_spark.sources.rasters import byte20

GT = (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)


@pytest.mark.parametrize("layout", ["BIL", "BIP", "BSQ"])
def test_roundtrip_layouts(layout):
    b20 = byte20()
    bands = [b20, (b20 // 2 + 3).astype(np.uint8)]
    hdr, blob = write_ehdr(bands, GT, layout=layout, nodata=0.0)
    got, gt, nodata = parse_ehdr(hdr, blob)
    assert gt == GT and nodata == 0.0 and len(got) == 2
    for g, w in zip(got, bands):
        assert np.array_equal(g, w)
    assert gdal_checksum(got[0].astype(np.float64)) == 4672


def test_dtypes():
    for arr in (byte20().astype(np.int16) - 100,
                byte20().astype(np.float32) / 3,
                byte20().astype(np.uint32) * 7):
        hdr, blob = write_ehdr(arr, GT)
        got, gt, _ = parse_ehdr(hdr, blob)
        assert np.array_equal(got[0], arr) and gt == GT


def test_center_convention():
    hdr = ("ncols 2\nnrows 2\nnbands 1\nnbits 8\nlayout BIL\n"
           "ulxmap 100\nulymap 50\nxdim 10\nydim 10\n")
    bands, gt, _ = parse_ehdr(hdr, bytes([1, 2, 3, 4]))
    assert gt == (95.0, 10.0, 0.0, 55.0, 0.0, -10.0)
    assert bands[0].tolist() == [[1, 2], [3, 4]]


def test_distributed(spark, tmp_path):
    b20 = (byte20() // 2).astype(np.uint8)
    for i in range(2):
        hdr, blob = write_ehdr((b20 + i).astype(np.uint8), GT)
        (tmp_path / f"r{i}.bil").write_bytes(blob)
        (tmp_path / f"r{i}.hdr").write_text(hdr)
    tiles = read_ehdr(spark, str(tmp_path / "*.bil"), tile=16).collect()
    assert len(tiles) == 8
    tot = sum(sum(r["pixels"]) for r in tiles)
    assert tot == float(b20.sum()) * 2 + 400.0
