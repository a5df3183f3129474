"""Transient detection with the reference's exact f64 semantics, vectorized.

Parity: codec/analysis/transient.js.  The spectral feature accumulations in
the reference are sequential f64 sums over f32 magnitudes; we reproduce the
sequential rounding order with cumsum (its last element is the left-to-right
running sum).
"""

from __future__ import annotations

import numpy as np


def _seqsum(x: np.ndarray) -> np.ndarray:
    """Left-to-right sequential f64 sum over the last axis."""
    if x.shape[-1] == 0:
        return np.zeros(x.shape[:-1], dtype=np.float64)
    return np.cumsum(x.astype(np.float64), axis=-1)[..., -1]


def transient_score(cur: np.ndarray, prev: np.ndarray) -> np.ndarray:
    """Combined transient score (transient.js:44-226).

    cur, prev: [..., bins] f32 magnitude spectra.  Returns f64 [...] scores.
    """
    c = cur.astype(np.float64)
    p = prev.astype(np.float64)

    # spectral flux, normalized by current energy (transient.js:92-112)
    diff = np.abs(c) - np.abs(p)
    flux = _seqsum(np.where(diff > 0, diff, 0.0))
    cur_energy = _seqsum(np.abs(c) * np.abs(c))
    norm = np.sqrt(cur_energy)
    norm = np.where(norm == 0.0, 1e-6, norm)
    flux = flux / norm

    # spectral flatness change (transient.js:120-141)
    def flatness(m):
        valid = np.abs(m) > 1e-10
        n = valid.sum(axis=-1)
        sum_log = _seqsum(np.where(valid, np.log(np.abs(m), where=valid, out=np.zeros_like(m)), 0.0))
        sum_lin = _seqsum(np.where(valid, np.abs(m), 0.0))
        n_safe = np.maximum(n, 1)
        geo = np.exp(sum_log / n_safe)
        arith = sum_lin / n_safe
        flat = np.where(arith > 1e-10, geo / np.where(arith > 0, arith, 1.0), 0.0)
        return np.where(n == 0, 0.0, flat)

    flat_change = np.abs(flatness(c) - flatness(p))

    # high-frequency energy ratio change (transient.js:149-164)
    def hf_ratio(m):
        mid = m.shape[-1] // 2
        low = _seqsum(m[..., :mid] * m[..., :mid])
        high = _seqsum(m[..., mid:] * m[..., mid:])
        total = low + high
        return np.where(total > 0, high / np.where(total > 0, total, 1.0), 0.0)

    hf_change = np.abs(hf_ratio(c) - hf_ratio(p))

    # energy change in dB, increases only (transient.js:172-189)
    ce = np.maximum(_seqsum(c * c), 1e-10)
    pe = np.maximum(_seqsum(p * p), 1e-10)
    energy_change = np.maximum(0.0, 10.0 * np.log10(ce / pe))

    # combined score (transient.js:197-226)
    return (
        flux
        + np.sqrt(flat_change)
        + np.log1p(hf_change * 10.0) / np.log1p(10.0)
        + np.minimum(energy_change / 30.0, 1.0)
    ) / 4.0
