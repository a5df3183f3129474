"""Radix-2 DIT FFT with the reference's exact rounding semantics.

The reference (codec/transforms/fft.js:14-68) runs an in-place complex FFT on
Float32Arrays: every butterfly result is computed in f64 and rounded to f32 on
store, while the twiddle factors are carried in f64 *local variables* updated
by a multiplicative recurrence (never rounded to f32).  Within one butterfly
stage all (even, odd) pairs are disjoint, so the stage can be vectorized over
both the butterfly index and any number of leading batch axes without changing
a single rounding decision.

``fft_js(re, im)`` reproduces the reference bit-for-bit when called on float32
arrays; called on float64 arrays the stores don't round, which yields the
exact linear transform (used to derive the TPU MDCT basis matrices).
"""

from __future__ import annotations

import functools

import numpy as np


@functools.lru_cache(maxsize=None)
def _bit_reverse_perm(n: int) -> np.ndarray:
    bits = int(np.log2(n))
    perm = np.zeros(n, dtype=np.int64)
    for i in range(n):
        r = 0
        t = i
        for _ in range(bits):
            r = (r << 1) | (t & 1)
            t >>= 1
        perm[i] = r
    return perm


@functools.lru_cache(maxsize=None)
def _twiddles(stride: int) -> tuple[np.ndarray, np.ndarray]:
    """f64 twiddle factors for one stage, via the reference's recurrence.

    Must NOT be replaced with cos/sin(k*angle): the reference generates
    twiddle k by k complex multiplications in f64 (fft.js:42-65) and the
    accumulated rounding differs from the closed form in the last ulps.
    """
    half = stride >> 1
    angle = -2.0 * np.pi / stride
    w_re, w_im = np.cos(angle), np.sin(angle)
    tr = np.empty(half, dtype=np.float64)
    ti = np.empty(half, dtype=np.float64)
    cr, ci = 1.0, 0.0
    for k in range(half):
        tr[k], ti[k] = cr, ci
        cr, ci = cr * w_re - ci * w_im, cr * w_im + ci * w_re
    return tr, ti


def fft_js(re: np.ndarray, im: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Batched FFT over the last axis; rounding matches the storage dtype.

    Parameters
    ----------
    re, im : float32 or float64 arrays of shape [..., n]

    Returns new arrays (inputs are not mutated).
    """
    n = re.shape[-1]
    store = re.dtype
    if n == 1:
        return re.copy(), im.copy()

    perm = _bit_reverse_perm(n)
    re = np.ascontiguousarray(re[..., perm])
    im = np.ascontiguousarray(im[..., perm])

    stride = 2
    while stride <= n:
        half = stride >> 1
        tr, ti = _twiddles(stride)
        shape = re.shape[:-1] + (n // stride, stride)
        rev = re.reshape(shape).astype(np.float64)
        imv = im.reshape(shape).astype(np.float64)
        er, ei = rev[..., :half], imv[..., :half]
        orr, oi = rev[..., half:], imv[..., half:]
        t_r = orr * tr - oi * ti
        t_i = orr * ti + oi * tr
        out_r = np.concatenate([er + t_r, er - t_r], axis=-1).astype(store)
        out_i = np.concatenate([ei + t_i, ei - t_i], axis=-1).astype(store)
        re = out_r.reshape(re.shape)
        im = out_i.reshape(im.shape)
        stride <<= 1
    return re, im


def magnitude_spectrum_js(samples: np.ndarray, fft_size: int) -> np.ndarray:
    """Zero-padded FFT magnitude of the positive frequencies, f32 rounded.

    Mirrors performFFT (codec/analysis/transient.js:17-35): real input copied
    into an f32 buffer (zero padded / truncated to fft_size), FFT with f32
    stores, then sqrt(re^2+im^2) computed in f64 and stored f32.
    """
    store = np.float32
    lead = samples.shape[:-1]
    n = min(samples.shape[-1], fft_size)
    re = np.zeros(lead + (fft_size,), dtype=store)
    re[..., :n] = samples[..., :n]
    im = np.zeros_like(re)
    re, im = fft_js(re, im)
    half = fft_size // 2
    r = re[..., :half].astype(np.float64)
    i = im[..., :half].astype(np.float64)
    return np.sqrt(r * r + i * i).astype(store)
