"""Pallas TPU kernel for the bitstream demux window read (experimental).

The sound-unit demux needs, per (frame, field), one arbitrary 32-bit window
out of the unit's 128 halfword anchors — an exact gather.  The shipped
default (ops/bitpack._window_reduce) is a fused one-hot compare/select
reduction that XLA keeps at the VPU single-issue bound.  This kernel is the
same algorithm with the unit windows VMEM-resident and the whole reduction
inside one Mosaic kernel (the design called for by the r1 review): enable
with CARTA1_PALLAS_DEMUX=1 and A/B at the bench level (PERF.md — measured
within noise of the XLA fusion, as the op-count argument predicts; kept
in-tree as real, runnable evidence rather than a paper prototype).

Alternatives tried and rejected:
  * in-kernel jnp.take_along_axis — Mosaic on this version has no per-lane
    dynamic gather lowering for [bf, 128] uint32 blocks;
  * MXU byte-plane factorization — measured ~20% slower end-to-end (r1).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _demux_kernel(j_lo: int, j_hi: int, win_ref, h_ref, out_ref):
    win = win_ref[:]                      # [BF, 128] uint32, VMEM-resident
    h = h_ref[:]                          # [BF, M] int32 anchor indices
    acc = jnp.zeros(h.shape, jnp.uint32)
    for j in range(j_lo, j_hi):
        acc = acc | jnp.where(h == j, win[:, j][:, None], jnp.uint32(0))
    out_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("j_lo", "j_hi", "block_frames"))
def window_reduce_pallas(win32: jnp.ndarray, h: jnp.ndarray, j_lo: int, j_hi: int,
                         block_frames: int = 256) -> jnp.ndarray:
    """win[f, m] = win32[f, h[f, m]] for h in [j_lo, j_hi), else 0.

    win32: uint32 [F, 128]; h: int32 [F, M].  F must be a multiple of
    block_frames (the callers' chunk shapes are)."""
    nframes, m = h.shape
    bf = min(block_frames, nframes)
    while nframes % bf:
        bf //= 2
    grid = (nframes // bf,)
    return pl.pallas_call(
        functools.partial(_demux_kernel, j_lo, j_hi),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bf, win32.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bf, m), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bf, m), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nframes, m), jnp.uint32),
    )(win32, h)
