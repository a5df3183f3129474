"""Batched transient detection (parity: codec/analysis/transient.js).

All four spectral features reduce over the bin axis, vectorized over frames.
The previous frame's spectrum is a one-frame shift with a stream-state halo.
Device math is f32 (the gold oracle keeps the f64 semantics)."""

from __future__ import annotations

import jax.numpy as jnp

from carta1_tpu import constants as C
from carta1_tpu.ops.common import shift_frames


def magnitude_spectrum(band: jnp.ndarray, fft_size: int) -> jnp.ndarray:
    """[F, L] -> positive-frequency magnitudes [F, fft_size//2]."""
    nframes, length = band.shape
    if length < fft_size:
        band = jnp.pad(band, ((0, 0), (0, fft_size - length)))
    else:
        band = band[:, :fft_size]
    spec = jnp.fft.rfft(band, n=fft_size, axis=-1)[:, : fft_size // 2]
    return jnp.abs(spec).astype(jnp.float32)


def transient_score(cur: jnp.ndarray, prev: jnp.ndarray) -> jnp.ndarray:
    """Combined 4-feature score, [F, bins] x2 -> [F] (transient.js:44-226)."""
    c = cur
    p = prev

    diff = c - p  # magnitudes are non-negative
    flux = jnp.sum(jnp.maximum(diff, 0.0), axis=-1)
    energy = jnp.sum(c * c, axis=-1)
    norm = jnp.sqrt(energy)
    flux = flux / jnp.where(norm == 0.0, 1e-6, norm)

    def flatness(m):
        valid = m > 1e-10
        n = jnp.sum(valid, axis=-1)
        n_safe = jnp.maximum(n, 1)
        sum_log = jnp.sum(jnp.where(valid, jnp.log(jnp.maximum(m, 1e-30)), 0.0), axis=-1)
        sum_lin = jnp.sum(jnp.where(valid, m, 0.0), axis=-1)
        geo = jnp.exp(sum_log / n_safe)
        arith = sum_lin / n_safe
        return jnp.where((n > 0) & (arith > 1e-10), geo / jnp.maximum(arith, 1e-30), 0.0)

    flat_change = jnp.abs(flatness(c) - flatness(p))

    def hf_ratio(m):
        mid = m.shape[-1] // 2
        low = jnp.sum(m[..., :mid] ** 2, axis=-1)
        high = jnp.sum(m[..., mid:] ** 2, axis=-1)
        total = low + high
        return jnp.where(total > 0, high / jnp.maximum(total, 1e-30), 0.0)

    hf_change = jnp.abs(hf_ratio(c) - hf_ratio(p))

    ce = jnp.maximum(jnp.sum(c * c, axis=-1), 1e-10)
    pe = jnp.maximum(jnp.sum(p * p, axis=-1), 1e-10)
    energy_change = jnp.maximum(0.0, 10.0 * jnp.log10(ce / pe))

    return (
        flux
        + jnp.sqrt(flat_change)
        + jnp.log1p(hf_change * 10.0) / jnp.log1p(10.0)
        + jnp.minimum(energy_change / 30.0, 1.0)
    ) / 4.0


def block_modes(bands: list[jnp.ndarray], prev_specs: list[jnp.ndarray], thresholds: tuple[float, float, float]) -> tuple[jnp.ndarray, list[jnp.ndarray]]:
    """Per-band transient detection -> block modes (encoder.js:126-145).

    bands: [F,128],[F,128],[F,256]; prev_specs: stream carries [64],[64],[128].
    Returns (modes int32 [F, 3], new_prev_specs)."""
    cols = []
    new_specs = []
    for band in range(3):
        spec = magnitude_spectrum(bands[band], C.TRANSIENT_FFT_SIZES[band])
        prev = shift_frames(spec, prev_specs[band])
        score = transient_score(spec, prev)
        mode = jnp.where(score > thresholds[band], max(band + 1, 2), 0).astype(jnp.int32)
        cols.append(mode)
        new_specs.append(spec[-1])
    return jnp.stack(cols, axis=1), new_specs
