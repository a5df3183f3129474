"""Batched windowed MDCT / IMDCT + overlap-add as MXU matmuls.

The reference transforms each band per frame through an FFT-based MDCT with
explicit windowing buffers (codec/pipeline/encoder.js:163-341,
decoder.js:116-330).  Here the window geometry, spectral reversal and the
decoder's middle-half extraction are all folded into precomputed basis
matrices (ops/tables.py), so each band is two batched matmuls (long + short
paths, selected per frame) and the only cross-frame coupling is a 32-sample
(encoder) / 16-sample (decoder) tail halo.
"""

from __future__ import annotations

import jax.numpy as jnp

from carta1_tpu import constants as C
from carta1_tpu.ops.common import fmatmul, shift_frames
from carta1_tpu.ops.tables import decoder_imdct_tables, encoder_mdct_tables

_W = C.WINDOW_SHORT.astype("float32")  # [32]
_TAIL = C.MDCT_TAIL_WINDOW_SIZE        # 16


def encoder_mdct_band(band: jnp.ndarray, band_idx: int, modes: jnp.ndarray, tail_state: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """band: [F, size]; modes: int32 [F]; tail_state: [32] previous-stream
    raw band tail.  Returns (coeffs [F, size], new_tail [32])."""
    t = encoder_mdct_tables()
    nframes, size = band.shape
    nb = C.MDCT_NUM_SHORT_BLOCKS[band_idx]

    tail_prev = shift_frames(band[:, size - 32:], tail_state)  # [F, 32] raw

    long_cf = fmatmul(tail_prev, jnp.asarray(t[f"long_ov{band_idx}"])) + fmatmul(band, jnp.asarray(t[f"long_main{band_idx}"]))

    blocks = band.reshape(nframes, nb, 32)
    ov_blocks = jnp.concatenate([tail_prev[:, None, :], blocks[:, :-1]], axis=1)
    sov = jnp.asarray(t["short_ov_rev" if band_idx > 0 else "short_ov"])
    smain = jnp.asarray(t["short_main_rev" if band_idx > 0 else "short_main"])
    short_cf = (fmatmul(ov_blocks, sov) + fmatmul(blocks, smain)).reshape(nframes, size)

    coeffs = jnp.where((modes == 0)[:, None], long_cf, short_cf)
    return coeffs, band[-1, size - 32:]


def _overlap_add(prev: jnp.ndarray, curr: jnp.ndarray) -> jnp.ndarray:
    """Windowed cross-fade (mdct.js:230-245): [F,16] x2 -> [F,32]."""
    w_lo = _W[_TAIL:][::-1]  # W[31-i] for i in 0..15
    c = curr[:, ::-1]          # c[i] = curr[15-i]
    lo = prev * w_lo - c * _W[:_TAIL]
    hi = prev * _W[:_TAIL] + c * w_lo
    return jnp.concatenate([lo, hi[:, ::-1]], axis=1)


def decoder_imdct_band(coeffs: jnp.ndarray, band_idx: int, modes: jnp.ndarray, tail_state: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """coeffs: [F, size] band spectra; modes: int32 [F]; tail_state: [16].

    Returns (band samples [F, size], new_tail [16])."""
    t = decoder_imdct_tables()
    nframes, size = coeffs.shape
    nb = C.MDCT_NUM_SHORT_BLOCKS[band_idx]

    inv_long = fmatmul(coeffs, jnp.asarray(t[f"long{band_idx}"]))  # [F, size]
    blocks = coeffs.reshape(nframes, nb, 32)
    short_basis = jnp.asarray(t["short_rev" if band_idx > 0 else "short"])
    inv_short = fmatmul(blocks, short_basis).reshape(nframes, size)

    inv = jnp.where((modes == 0)[:, None], inv_long, inv_short)
    tail = inv[:, size - _TAIL:]
    prev_tail = shift_frames(tail, tail_state)  # [F, 16]

    # long assembly (decoder.js:203-232)
    out_long = jnp.concatenate(
        [_overlap_add(prev_tail, inv[:, :_TAIL]), inv[:, _TAIL: size - _TAIL]],
        axis=1,
    )

    # short assembly: chained per-block overlap-add (decoder.js:263-297)
    parts = []
    prev = prev_tail
    for b in range(nb):
        s = b * 32
        parts.append(_overlap_add(prev, inv[:, s: s + _TAIL]))
        prev = inv[:, s + _TAIL: s + 32]
    out_short = jnp.concatenate(parts, axis=1)

    out = jnp.where((modes == 0)[:, None], out_long, out_short)
    return out, tail[-1]
