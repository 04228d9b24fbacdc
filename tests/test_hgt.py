"""SRTM .hgt source (sources/hgt.py)."""

import numpy as np

from lib_gdal_spark.sources.hgt import (
    parse_hgt, parse_hgt_name, read_hgt, write_hgt,
)


def test_name_parse():
    assert parse_hgt_name("N43W080.hgt") == (43, -80)
    assert parse_hgt_name("/x/y/S01E102.HGT") == (-1, 102)


def test_roundtrip_and_georef():
    rng = np.random.default_rng(2)
    a = rng.integers(-400, 8000, (121, 121)).astype(np.float64)
    a[0, 0] = -32768  # void
    got, gt = parse_hgt("N43W080.hgt", write_hgt(a))
    assert np.array_equal(got, a)
    step = 1.0 / 120
    assert gt == (-80 - step / 2, step, 0.0, 44 + step / 2, 0.0, -step)


def test_distributed(spark, tmp_path):
    a = (np.arange(121 * 121, dtype=np.float64) % 5000).reshape(121, 121)
    (tmp_path / "N43W080.hgt").write_bytes(write_hgt(a))
    tiles = read_hgt(spark, str(tmp_path / "*.hgt"), tile=64).collect()
    assert len(tiles) == 4
    assert sum(sum(r["pixels"]) for r in tiles) == float(a.sum())
    assert tiles[0]["nodata"] == -32768.0
