"""PNG codec (sources/png.py) — filters, color types, bit depths."""

import struct
import zlib

import numpy as np
import pytest

from lib_gdal_spark.sources.png import (
    _chunk, _SIG, parse_png, png_to_rgb, read_png, write_png,
)
from lib_gdal_spark.sources.rasters import byte20


def _manual_png(rows_filtered: list[tuple[int, bytes]], w: int, h: int,
                depth: int, ct: int, plte: bytes = None,
                trns: bytes = None) -> bytes:
    body = b"".join(bytes([f]) + d for f, d in rows_filtered)
    out = _SIG + _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, depth,
                                             ct, 0, 0, 0))
    if plte:
        out += _chunk(b"PLTE", plte)
    if trns:
        out += _chunk(b"tRNS", trns)
    return out + _chunk(b"IDAT", zlib.compress(body)) + _chunk(b"IEND",
                                                               b"")


def test_all_five_filters_gray8():
    """Rows hand-filtered with each filter type decode to the target."""
    img = np.array([[10, 20, 30, 40],
                    [15, 25, 35, 45],
                    [17, 28, 39, 50],
                    [20, 30, 40, 55],
                    [90, 80, 70, 60]], dtype=np.uint8)
    rows = []
    prev = np.zeros(4, np.int32)
    filters = [0, 1, 2, 3, 4]
    for y, f in enumerate(filters):
        cur = img[y].astype(np.int32)
        if f == 0:
            enc = cur
        elif f == 1:
            enc = cur.copy()
            enc[1:] = cur[1:] - cur[:-1]
        elif f == 2:
            enc = cur - prev
        elif f == 3:
            enc = cur.copy()
            for x in range(4):
                left = int(img[y, x - 1]) if x else 0
                enc[x] = cur[x] - ((left + int(prev[x])) >> 1)
        else:
            enc = cur.copy()
            for x in range(4):
                a = int(img[y, x - 1]) if x else 0
                b = int(prev[x])
                c = int(img[y - 1, x - 1]) if (x and y) else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else \
                    (b if pb <= pc else c)
                enc[x] = cur[x] - pr
        rows.append((f, (enc & 255).astype(np.uint8).tobytes()))
        prev = img[y].astype(np.int32)
    p = parse_png(_manual_png(rows, 4, 5, 8, 0))
    assert np.array_equal(p.bands[0], img)


@pytest.mark.parametrize("nbands,depth", [(1, 8), (2, 8), (3, 8),
                                          (4, 8), (1, 16), (3, 16)])
def test_roundtrip(nbands, depth):
    b20 = byte20()
    mk = (lambda a: a.astype(np.uint16) * 257) if depth == 16 \
        else (lambda a: a)
    bands = [mk((b20 + 7 * i).astype(np.uint8)) for i in range(nbands)]
    for ft in (0, 2):
        p = parse_png(write_png(bands, depth=depth, filter_type=ft))
        assert p.depth == depth and len(p.bands) == nbands
        for got, want in zip(p.bands, bands):
            assert np.array_equal(got, want)


def test_palette_and_trns():
    idx = np.array([[0, 1], [2, 1]], dtype=np.uint8)
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    rows = [(0, idx[0].tobytes()), (0, idx[1].tobytes())]
    p = parse_png(_manual_png(rows, 2, 2, 8, 3, plte=plte,
                              trns=bytes([128])))
    rgba = png_to_rgb(p)
    assert len(rgba) == 4
    assert rgba[0].tolist() == [[255, 0], [0, 0]]
    assert rgba[3].tolist() == [[128, 255], [255, 255]]


def test_subbyte_depths():
    # depth 2 gray, 6 px wide: values 0..3 packed 4/byte
    vals = np.array([[0, 1, 2, 3, 1, 2]], dtype=np.uint8)
    packed = bytes([0b00011011, 0b01100000])
    p = parse_png(_manual_png([(0, packed)], 6, 1, 2, 0))
    assert np.array_equal(p.bands[0], vals)


def test_real_gdal_icon():
    import os
    path = "/root/reference/data/gdalicon.png"
    if not os.path.exists(path):
        pytest.skip("reference icon not present")
    p = parse_png(open(path, "rb").read())
    assert p.depth == 8 and len(p.bands) == 4
    assert p.bands[0].shape == (32, 32)
    # stable content fingerprint (validated against the codec itself
    # decoding a real-encoder file; any filter bug shifts these)
    assert [int(b.sum()) for b in p.bands] == \
        [65953, 93647, 97361, 143589]


def test_read_png_distributed(spark, tmp_path):
    b20 = byte20()
    (tmp_path / "g.png").write_bytes(write_png(b20))
    (tmp_path / "rgb.png").write_bytes(
        write_png([b20, b20, b20]))
    tiles = read_png(spark, str(tmp_path / "*.png"), tile=16).collect()
    assert len(tiles) == 4 * (1 + 3)
    assert {r["band"] for r in tiles} == {1, 2, 3}


def test_adam7_interlaced():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (9, 11, 3), dtype=np.uint8)
    ADAM7 = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
             (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]
    body = bytearray()
    for x0, y0, xs, ys in ADAM7:
        sub = img[y0::ys, x0::xs]
        for row in sub:
            body.append(0)  # filter None
            body += row.tobytes()
    import struct as s_, zlib as z_
    data = (_SIG
            + _chunk(b"IHDR", s_.pack(">IIBBBBB", 11, 9, 8, 2, 0, 0, 1))
            + _chunk(b"IDAT", z_.compress(bytes(body)))
            + _chunk(b"IEND", b""))
    p = parse_png(data)
    assert p.depth == 8 and len(p.bands) == 3
    for c in range(3):
        assert np.array_equal(p.bands[c], img[:, :, c])
