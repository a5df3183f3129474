"""Device-side PCM <-> int16 conversion, bit-identical to the host path.

Read direction (bin/cli.js:316-353): int16 -> f32 is ``s / 32768`` — exact
in f32 (15-bit integers over a power of two), so converting ON DEVICE after
an int16 upload is bitwise identical to converting on host and uploading
f32, at half the transfer bytes.

Write direction (codec/io/processor.js:347-426): clamp to [-1, 1], scale
negatives by 32768 and positives by 32767, truncate toward zero — computed
by the reference in f64.  ``x * 32768`` is exact in f32, but ``x * 32767``
is not, and a plain f32 product can land on the other side of an integer
boundary than the f64 product, flipping the emitted sample by one LSB.
The f64 product fits 53 bits exactly (24-bit mantissa x 15-bit constant),
so TwoProd's (p, e) pair IS the reference's value, and an exact fractional
carry recovers the f64 truncation bit-for-bit (proof in _trunc_exact).
"""

from __future__ import annotations

import jax.numpy as jnp

from carta1_tpu.ops.df import two_prod, two_sum


def int16_to_float(pcm_i16: jnp.ndarray) -> jnp.ndarray:
    """int16 -> f32, bitwise equal to io.wav.int16_to_float (exact op)."""
    return pcm_i16.astype(jnp.float32) / jnp.float32(32768.0)


def _trunc_exact(p: jnp.ndarray, e: jnp.ndarray) -> jnp.ndarray:
    """trunc(p + e) for an exact nonnegative pair (p, e), |e| <= ulp(p)/2.

    t = trunc(p) and f = p - t are exact (p < 2^16 has all its fraction
    bits inside a 24-bit mantissa).  The true value is t + f + e with
    f in [0, 1) and |e| < 2^-9, so trunc is t, t+1 (f + e reaches 1) or
    t-1 (f == 0 and e < 0 pulls the value below t).  two_sum(f, e) keeps
    the >=1 / <0 comparisons exact at the boundaries."""
    t = jnp.trunc(p)
    f = p - t
    s, r = two_sum(f, e)
    inc = (s > 1.0) | ((s == 1.0) & (r >= 0.0))
    dec = ((s < 0.0) | ((s == 0.0) & (r < 0.0))) & (t > 0.0)
    return t + jnp.where(inc, 1.0, 0.0) - jnp.where(dec, 1.0, 0.0)


def float_to_int16(pcm: jnp.ndarray) -> jnp.ndarray:
    """f32 -> int16, bitwise equal to io.wav.float_to_int16 (f64 semantics).

    Negative branch: x * 32768 is exact in f32 == the f64 product; trunc
    toward zero of a negative v is -trunc(-v).  Positive branch: TwoProd
    recovers the exact (== f64) product, _trunc_exact its truncation."""
    x = jnp.clip(pcm, -1.0, 1.0)
    neg = -_trunc_exact(*two_prod(-jnp.minimum(x, 0.0), jnp.float32(32768.0)))
    pos = _trunc_exact(*two_prod(jnp.maximum(x, 0.0), jnp.float32(32767.0)))
    return jnp.where(x < 0, neg, pos).astype(jnp.int16)
