"""Exact-semantics MDCT / IMDCT / QMF / overlap-add, vectorized over frames.

Every function reproduces the reference's arithmetic bit-for-bit when fed
float32 data (f64 compute, f32 store at each point the JS stores into a
Float32Array); fed float64 data the stores don't round, which gives the exact
linear operators used to derive TPU basis matrices.

Parity: codec/transforms/mdct.js, codec/transforms/qmf.js.
"""

from __future__ import annotations

import functools

import numpy as np

from carta1_tpu.constants import (
    QMF_DELAY,
    QMF_EVEN,
    QMF_ODD,
    WINDOW_SHORT,
)
from carta1_tpu.gold.fftjs import fft_js


@functools.lru_cache(maxsize=None)
def _sincos_table(size: int, scale: float) -> np.ndarray:
    """f64 twiddle table of MDCTBase (mdct.js:20-38): [halfSize] interleaved
    (cos, sin) pairs scaled by sqrt(scale/size)."""
    quarter = size >> 2
    alpha = 2.0 * np.pi / (8.0 * size)
    omega = 2.0 * np.pi / size
    root = np.sqrt(scale / size)
    table = np.zeros(size >> 1, dtype=np.float64)
    i = np.arange(quarter, dtype=np.float64)
    angle = omega * i + alpha
    table[0::2] = root * np.cos(angle)
    table[1::2] = root * np.sin(angle)
    return table


def mdct_js(x: np.ndarray, size: int, scale: float) -> np.ndarray:
    """Forward MDCT (mdct.js:54-122): [..., size] -> [..., size/2]."""
    store = x.dtype
    half, quarter = size >> 1, size >> 2
    fft_size = half >> 1
    n34 = 3 * quarter
    tbl = _sincos_table(size, scale)
    xv = x.astype(np.float64)

    re = np.zeros(x.shape[:-1] + (fft_size,), dtype=store)
    im = np.zeros_like(re)

    # pre-FFT butterfly, first region: i = 0, 2, .. quarter-2
    i = np.arange(0, quarter, 2)
    r = xv[..., n34 - 1 - i] + xv[..., n34 + i]
    s_ = xv[..., quarter + i] - xv[..., quarter - 1 - i]
    c, s = tbl[i], tbl[i + 1]
    re[..., i >> 1] = (r * c + s_ * s).astype(store)
    im[..., i >> 1] = (s_ * c - r * s).astype(store)

    # second region: i = quarter, .. half-2
    i = np.arange(quarter, half, 2)
    r = xv[..., n34 - 1 - i] - xv[..., i - quarter]
    s_ = xv[..., quarter + i] + xv[..., 5 * quarter - 1 - i]
    c, s = tbl[i], tbl[i + 1]
    re[..., i >> 1] = (r * c + s_ * s).astype(store)
    im[..., i >> 1] = (s_ * c - r * s).astype(store)

    re, im = fft_js(re, im)

    out = np.zeros(x.shape[:-1] + (half,), dtype=store)
    i = np.arange(fft_size)
    c, s = tbl[i * 2], tbl[i * 2 + 1]
    rev = re.astype(np.float64)
    imv = im.astype(np.float64)
    out[..., i * 2] = (-rev * c - imv * s).astype(store)
    out[..., half - 1 - i * 2] = (-rev * s + imv * c).astype(store)
    return out


def imdct_js(x: np.ndarray, size: int, scale: float | None = None) -> np.ndarray:
    """Inverse MDCT (mdct.js:139-211): [..., size/2] -> [..., size]."""
    if scale is None:
        scale = float(size)
    store = x.dtype
    half, quarter = size >> 1, size >> 2
    fft_size = half >> 1
    n34 = 3 * quarter
    tbl = _sincos_table(size, scale)
    xv = x.astype(np.float64)

    i = np.arange(fft_size)
    i2 = i * 2
    r = -xv[..., i2]
    s_ = -xv[..., half - 1 - i2]
    c, s = tbl[i2], tbl[i2 + 1]
    re = (s_ * s + r * c).astype(store)
    im = (s_ * c - r * s).astype(store)

    re, im = fft_js(re, im)
    rev = re.astype(np.float64)
    imv = im.astype(np.float64)

    out = np.zeros(x.shape[:-1] + (size,), dtype=store)

    i = np.arange(fft_size // 2)
    i2 = i * 2
    c, s = tbl[i2], tbl[i2 + 1]
    r1 = rev[..., i] * c + imv[..., i] * s
    i1 = rev[..., i] * s - imv[..., i] * c
    out[..., n34 - 1 - i2] = r1.astype(store)
    out[..., n34 + i2] = r1.astype(store)
    out[..., quarter + i2] = i1.astype(store)
    out[..., quarter - 1 - i2] = (-i1).astype(store)

    i = np.arange(fft_size // 2, fft_size)
    idx = (i - fft_size // 2) * 2 + quarter
    i2 = i * 2
    c, s = tbl[i2], tbl[i2 + 1]
    r1 = rev[..., i] * c + imv[..., i] * s
    i1 = rev[..., i] * s - imv[..., i] * c
    out[..., n34 - 1 - idx] = r1.astype(store)
    out[..., idx - quarter] = (-r1).astype(store)
    out[..., quarter + idx] = i1.astype(store)
    out[..., 5 * quarter - 1 - idx] = i1.astype(store)
    return out


# Reference transform instances (mdct.js:215-221)
MDCT_SCALES = {64: 0.5, 256: 0.5, 512: 1.0}
IMDCT_SCALES = {64: 512.0, 256: 2048.0, 512: 2048.0}


def mdct(x: np.ndarray, size: int) -> np.ndarray:
    return mdct_js(x, size, MDCT_SCALES[size])


def imdct(x: np.ndarray, size: int) -> np.ndarray:
    return imdct_js(x, size, IMDCT_SCALES[size])


@functools.lru_cache(maxsize=None)
def mdct_basis(size: int) -> np.ndarray:
    """Exact f64 forward-MDCT matrix: out = x @ mdct_basis(size).

    Shape [size, size/2].  Derived by feeding the identity through the f64
    path of the reference algorithm (the transform is linear, so this equals
    the exact operator)."""
    eye = np.eye(size, dtype=np.float64)
    return mdct(eye, size).astype(np.float64)


@functools.lru_cache(maxsize=None)
def imdct_basis(size: int) -> np.ndarray:
    """Exact f64 inverse-MDCT matrix: out = x @ imdct_basis(size).

    Shape [size/2, size]."""
    eye = np.eye(size >> 1, dtype=np.float64)
    return imdct(eye, size).astype(np.float64)


def overlap_add_js(prev: np.ndarray, curr: np.ndarray) -> np.ndarray:
    """Windowed cross-fade (mdct.js:230-245) with WINDOW_SHORT, size 16.

    prev, curr: [..., 16] -> [..., 32].
    """
    store = prev.dtype
    size = prev.shape[-1]
    w = WINDOW_SHORT  # f64 [32]
    p = prev.astype(np.float64)
    c = curr.astype(np.float64)[..., ::-1]  # c[i] = curr[size-1-i]
    i = np.arange(size)
    w1, w2 = w[i], w[2 * size - 1 - i]
    out = np.zeros(prev.shape[:-1] + (2 * size,), dtype=store)
    out[..., i] = (p * w2 - c * w1).astype(store)
    out[..., 2 * size - 1 - i] = (p * w1 + c * w2).astype(store)
    return out


def qmf_analysis_stream(signal: np.ndarray, delay: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Whole-stream QMF analysis (qmf.js:19-50), chained over all frames.

    signal: [..., N] f32, delay: [..., 46] f32 (the stream's carry state).
    Returns (low [..., N/2], high [..., N/2], new_delay [..., 46]).

    Equivalent to the reference's per-frame calls because the per-frame delay
    line is just the last 46 samples of [delay; input].
    """
    work = np.concatenate([delay, signal], axis=-1)
    n_out = signal.shape[-1] >> 1
    base = 2 * np.arange(n_out)
    wv = work.astype(np.float64)
    even = np.zeros(work.shape[:-1] + (n_out,), dtype=np.float64)
    odd = np.zeros_like(even)
    for j in range(24):
        even += wv[..., base + 47 - 2 * j] * np.float64(QMF_EVEN[j])
        odd += wv[..., base + 46 - 2 * j] * np.float64(QMF_ODD[j])
    low = (even + odd).astype(signal.dtype)
    high = (even - odd).astype(signal.dtype)
    return low, high, work[..., -QMF_DELAY:]


def qmf_synthesis_stream(low: np.ndarray, high: np.ndarray, delay: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Whole-stream QMF synthesis (qmf.js:60-105).

    low, high: [..., S] f32; delay: [..., 46] f32.
    Returns (output [..., 2S], new_delay [..., 46]).
    """
    store = low.dtype
    s = low.shape[-1]
    lv = low.astype(np.float64)
    hv = high.astype(np.float64)
    merged = np.zeros(low.shape[:-1] + (2 * s,), dtype=store)
    merged[..., 0::2] = (0.5 * (lv + hv)).astype(store)
    merged[..., 1::2] = (0.5 * (lv - hv)).astype(store)
    work = np.concatenate([delay, merged], axis=-1)
    wv = work.astype(np.float64)
    base = 2 * np.arange(s)
    s0 = np.zeros(low.shape[:-1] + (s,), dtype=np.float64)
    s1 = np.zeros_like(s0)
    for j in range(24):
        idx = base + 2 * j
        s0 += wv[..., idx] * np.float64(QMF_EVEN[j])
        s1 += wv[..., idx + 1] * np.float64(QMF_ODD[j])
    out = np.zeros(low.shape[:-1] + (2 * s,), dtype=store)
    out[..., 0::2] = s1.astype(store)
    out[..., 1::2] = s0.astype(store)
    return out, work[..., -QMF_DELAY:]
