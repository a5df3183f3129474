"""Shared batched-op helpers for the TPU engine."""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

# All signal-path contractions must run at true f32: JAX's DEFAULT matmul
# precision truncates f32 operands to bf16 on the TPU MXU, which (a) adds a
# ~2^-8 relative noise floor to the MDCT/QMF spectra -- the RDO allocator
# then wastes budget coding that junk (measured: -12 dB round-trip SNR) --
# and (b) breaks the exact-selection one-hot contractions (permutations,
# table lookups) the bit-exact decode contract depends on.  HIGHEST is the
# f32-faithful 6-pass algorithm; it is bit-exact for 0/1-matrix selection
# (each operand's 3-way bf16 split is an exact decomposition of f32).
FP = lax.Precision.HIGHEST


def fmatmul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """f32-faithful matmul (see FP note above)."""
    return jnp.matmul(a, b, precision=FP)


def halo_prefix(x: jnp.ndarray, stream_prefix: jnp.ndarray) -> jnp.ndarray:
    """Prepend each frame with the last P samples of the previous frame.

    x: [F, L]; stream_prefix: [P] carry for frame 0 (the stream state).
    Returns [F, P + L].  This is how every inter-frame delay line in the
    reference (codec/core/buffers.js:31-42) becomes a pure batched halo.
    """
    p = stream_prefix.shape[-1]
    prev = jnp.concatenate([stream_prefix[None, :], x[:-1, -p:]], axis=0)
    return jnp.concatenate([prev, x], axis=1)


def shift_frames(x: jnp.ndarray, first: jnp.ndarray) -> jnp.ndarray:
    """[F, ...] -> previous frame's row, with `first` for frame 0."""
    return jnp.concatenate([first[None], x[:-1]], axis=0)
