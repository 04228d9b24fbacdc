"""Complex pixel types (CInt16/CInt32/CFloat32/CFloat64) — kernels.

The reference carries a whole complex dtype family (``core/gcore/gdal.h:
60-76``); tiles here store them as INTERLEAVED words in the existing
``pixels array<double>`` column: ``[re0, im0, re1, im1, ...]`` with
``tile_w``/``tile_h`` counting LOGICAL (complex) pixels. That matches the
reference's memory layout and — critically — the checksum contract:
``GDALChecksumImage`` walks the interleaved words with the prime phase
advancing per WORD (``core/alg/gdalchecksum.cpp``: ``nCount = nXSize*2``),
which is how the cint16/cint32/cfloat32/cfloat64 variants of byte.tif all
anchor at **5028** (``tests/cpp/test_gdal_gtiff.cpp:70-82``).

Overview kernels re-express ``GDALRegenerateOverviewsComplex``
(``core/gcore/overview.cpp:2560-2700``): NEAREST copies both words;
AVERAGE means re and im separately; AVERAGE_MAGPHASE means the components,
then rescales the mean vector to the mean MAGNITUDE — with the reference's
float32 intermediate rounding reproduced bit-for-bit (the C scanline
buffers are ``float``).
"""

from __future__ import annotations

import numpy as np

COMPLEX_DTYPES = ("cint16", "cint32", "cfloat32", "cfloat64")

_CINT_RANGES = {"cint16": (-32768, 32767), "cint32": (-2147483648, 2147483647)}


def is_complex_dtype(dtype: str) -> bool:
    return dtype in COMPLEX_DTYPES


def split_words(words: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(h, 2w) interleaved words -> (re, im) each (h, w)."""
    return words[:, 0::2], words[:, 1::2]


def interleave(re: np.ndarray, im: np.ndarray) -> np.ndarray:
    h, w = re.shape
    out = np.empty((h, 2 * w), dtype=np.float64)
    out[:, 0::2] = re
    out[:, 1::2] = im
    return out


def clamp_round_complex(words: np.ndarray, dtype: str) -> np.ndarray:
    """GDALCopyWords store back to the complex dtype: float32 rounding for
    cfloat32, exact for cfloat64, floor(v+0.5)+saturate for cint."""
    if dtype == "cfloat64":
        return words.astype(np.float64)
    if dtype == "cfloat32":
        return words.astype(np.float32).astype(np.float64)
    lo, hi = _CINT_RANGES[dtype]
    out = np.floor(np.asarray(words, np.float64) + 0.5)
    return np.clip(out, lo, hi)


def _box_edges(dst_n: int, ratio: float, src_n: int):
    """overview.cpp window math: nSrcOff = (int)(0.5 + i*ratio)."""
    i = np.arange(dst_n, dtype=np.float64)
    lo = (0.5 + i * ratio).astype(np.int64)
    hi = (0.5 + (i + 1) * ratio).astype(np.int64)
    hi = np.where(hi == lo, lo + 1, hi)
    hi = np.minimum(hi, src_n)
    hi[-1] = src_n
    lo = np.minimum(lo, src_n - 1)
    return lo, hi


def overview_complex(words: np.ndarray, dst_shape: tuple[int, int],
                     alg: str = "average") -> np.ndarray:
    """One complex overview reduce over an interleaved (h, 2w) array."""
    re, im = split_words(np.asarray(words, np.float64))
    sh, sw = re.shape
    dh, dw = dst_shape
    if alg == "nearest":
        ys = np.minimum((0.5 + np.arange(dh) * (sh / dh)).astype(np.int64),
                        sh - 1)
        xs = np.minimum((0.5 + np.arange(dw) * (sw / dw)).astype(np.int64),
                        sw - 1)
        return interleave(re[ys[:, None], xs[None, :]],
                          im[ys[:, None], xs[None, :]])

    if sh == 2 * dh and sw == 2 * dw:
        # exact 2:1 reduce (the pyramid step): fully vectorized
        br = re.reshape(dh, 2, dw, 2).transpose(0, 2, 1, 3).reshape(dh, dw, 4)
        bi = im.reshape(dh, 2, dw, 2).transpose(0, 2, 1, 3).reshape(dh, dw, 4)
        mr = (br.sum(axis=2) / 4.0).astype(np.float32)
        mi = (bi.sum(axis=2) / 4.0).astype(np.float32)
        if alg == "average_magphase":
            m = np.sqrt(mr.astype(np.float64) ** 2 + mi.astype(np.float64) ** 2)
            desired = np.hypot(br, bi).sum(axis=2) / 4.0
            ratio = np.where(m != 0.0, desired / np.where(m == 0.0, 1.0, m),
                             1.0)
            mr = (mr.astype(np.float64) * ratio).astype(np.float32)
            mi = (mi.astype(np.float64) * ratio).astype(np.float32)
        return interleave(mr.astype(np.float64), mi.astype(np.float64))

    xlo, xhi = _box_edges(dw, sw / dw, sw)
    ylo, yhi = _box_edges(dh, sh / dh, sh)
    out_re = np.empty((dh, dw))
    out_im = np.empty((dh, dw))
    for j in range(dh):
        rs = re[ylo[j]:yhi[j]]
        is_ = im[ylo[j]:yhi[j]]
        for i in range(dw):
            br = rs[:, xlo[i]:xhi[i]]
            bi = is_[:, xlo[i]:xhi[i]]
            n = br.size
            mr = np.float32(br.sum() / n)   # reference stores through float
            mi = np.float32(bi.sum() / n)
            if alg == "average_magphase":
                m = np.sqrt(np.float64(mr) * np.float64(mr)
                            + np.float64(mi) * np.float64(mi))
                desired = np.hypot(br, bi).sum() / n
                ratio = desired / m if m != 0.0 else 1.0
                mr = np.float32(np.float64(mr) * ratio)
                mi = np.float32(np.float64(mi) * ratio)
            out_re[j, i] = mr
            out_im[j, i] = mi
    return interleave(out_re, out_im)
