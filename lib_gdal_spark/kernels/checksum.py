"""GDAL image checksum — the golden-output correctness oracle.

Behavioral spec from ``core/alg/gdalchecksum.cpp:66-180`` (reimplemented, not
copied): iterate pixels row-major; integer types go through Int32; float
types add 0.5, clamp to ±2147483647, floor to Int32 (GDALCopyWords float→int
rounding); NaN/Inf force 0x80000000 (as a signed int, i.e. −2^31); each
pixel contributes ``value % primes[i mod 11]`` with **C truncated division**
(remainder takes the dividend's sign); the accumulator is masked ``& 0xffff``
after every pixel.

Because ``& 0xffff`` is mod 2^16 and addition commutes with it, the whole
thing vectorizes: sum all C-remainders in int64, then mask once. Anchors:
``byte.tif`` band 1 == 4672 (``tests/cpp/test_gdal_gtiff.cpp:70``).
"""

from __future__ import annotations

import numpy as np

PRIMES = np.array([7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43], dtype=np.int64)
_NAN_SENTINEL = np.int64(-2147483648)  # (int)0x80000000


def to_checksum_int32(values: np.ndarray) -> np.ndarray:
    """Apply the float→Int32 conversion rule; pass integers through."""
    arr = np.asarray(values)
    if np.issubdtype(arr.dtype, np.integer):
        return arr.astype(np.int64)
    arr = arr.astype(np.float64)
    bad = ~np.isfinite(arr)
    shifted = arr + 0.5
    out = np.empty(arr.shape, dtype=np.int64)
    low = shifted < -2147483647.0
    high = shifted > 2147483647.0
    mid = ~(low | high | bad)
    out[low] = -2147483647
    out[high] = 2147483647
    out[mid] = np.floor(shifted[mid]).astype(np.int64)
    out[bad] = _NAN_SENTINEL
    return out


def gdal_checksum(pixels: np.ndarray) -> int:
    """Checksum of a full 2-D (or flattened row-major) pixel array."""
    vals = to_checksum_int32(pixels).ravel()
    idx = np.arange(vals.size, dtype=np.int64) % 11
    # np.fmod truncates toward zero == C's % on ints.
    rem = np.fmod(vals, PRIMES[idx])
    return int(rem.sum()) & 0xFFFF


def checksum_partial(pixels: np.ndarray, start_index: int) -> int:
    """Partial sum for a pixel run starting at global row-major ``start_index``.

    Lets the checksum run as a distributed aggregate: each tile computes its
    partial with its global offset, partials add, final ``& 0xffff``.
    """
    vals = to_checksum_int32(pixels).ravel()
    idx = (np.arange(vals.size, dtype=np.int64) + start_index) % 11
    rem = np.fmod(vals, PRIMES[idx])
    return int(rem.sum())


def checksum_tile_partial(pixels: np.ndarray, x0: int, y0: int,
                          width: int) -> int:
    """Partial sum for a whole 2-D tile placed at (x0, y0) in a raster of
    global row-major ``width`` pixels per scanline.

    Fully vectorized: the global index of pixel (r, c) is
    ``(y0 + r) * width + x0 + c``; only ``idx % 11`` matters, so the prime
    lookup broadcasts over the tile in one shot. Summing partials across
    tiles then masking once is exact because ``& 0xffff`` is mod 2^16 and
    addition commutes with it (``core/alg/gdalchecksum.cpp:66-180``).
    """
    vals = to_checksum_int32(pixels)
    if vals.ndim != 2:
        raise ValueError("checksum_tile_partial expects a 2-D tile")
    h, w = vals.shape
    rows = (np.arange(h, dtype=np.int64) + y0) * width
    cols = np.arange(w, dtype=np.int64) + x0
    idx = (rows[:, None] + cols[None, :]) % 11
    rem = np.fmod(vals, PRIMES[idx])
    return int(rem.sum())


def combine_partials(partials) -> int:
    return int(sum(int(p) for p in partials)) & 0xFFFF
