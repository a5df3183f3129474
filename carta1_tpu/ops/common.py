"""Shared batched-op helpers for the TPU engine."""

from __future__ import annotations

import jax.numpy as jnp


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
