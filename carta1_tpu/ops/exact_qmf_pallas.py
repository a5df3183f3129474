"""VMEM-resident Pallas kernel for the bit-exact QMF synthesis taps.

The XLA formulation of ops/exact_decode.qmf_synthesis_exact runs 24 taps x
2 accumulators of error-free arithmetic (TwoProd + triple-compensated
accumulation) as ~50 separate elementwise fusions with HBM round-trips
between them.  This kernel keeps the whole tap loop on one VMEM tile:
load the even/odd work streams once, accumulate all 24 taps, store the two
output blocks — HBM is touched twice per synthesis stage instead of per
fusion boundary.

Bitwise contract: identical stored bits to the XLA path.  The kernel body
runs the SAME df.py op sequence (split -> two_prod_presplit -> acc3_add ->
acc3_to_f32) in the same tap order with the same scalar constants; exact
arithmetic is deterministic regardless of code generator.  Pinned by the
A/B test in tests/test_exact_decode.py and the golden decode gate.

Index algebra (qmf.js:60-105 semantics, via exact_decode's formulation):
with work = [46-sample delay | interleaved merged stream], the outputs are

  s0[i] = sum_j ev[j] * work[2i + 2j]     = sum_j ev[j] * we[i + j]
  s1[i] = sum_j od[j] * work[2i + 2j + 1] = sum_j od[j] * wo[i + j]

where we/wo are the even/odd position streams — the stride-2 taps become
contiguous sliding dot products, so the kernel sees only static
unit-stride slices.  The 6x24 tap constants (value + Dekker hi/lo per
tap) are baked as scalar immediates: the XLA path multiplies by the same
jnp.float32 scalars, and 144 immediates are not the embedded-array
liability PERF.md warns about.

Layout: position-major [P, B] like the IMDCT kernel; frames x channels
ride the VPU lanes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from carta1_tpu.ops.df import acc3_add, acc3_to_f32, acc3_zero, split, two_prod_presplit

_NTAPS = 24


@functools.lru_cache(maxsize=None)
def _taps() -> tuple[np.ndarray, ...]:
    from carta1_tpu.ops.exact_decode import _qmf_tap_splits

    return _qmf_tap_splits()  # (ev, evh, evl, od, odh, odl), each [24] f64/f32


def _tap_body(we, wo, s: int):
    """The exact tap loop on one ([P, T], [P, T]) tile (pure jnp; runs
    inside the Pallas kernel).  Mirrors qmf_synthesis_exact's op order."""
    ev, evh, evl, od, odh, odl = _taps()
    weh, wel = split(we)
    woh, wol = split(wo)
    acc0 = acc3_zero(we[:s].shape)
    acc1 = acc3_zero(we[:s].shape)
    for j in range(_NTAPS):
        sl = slice(j, j + s)
        p, e = two_prod_presplit(
            we[sl], weh[sl], wel[sl],
            jnp.float32(ev[j]), jnp.float32(evh[j]), jnp.float32(evl[j]),
        )
        acc0 = acc3_add(acc0, p, e)
        p, e = two_prod_presplit(
            wo[sl], woh[sl], wol[sl],
            jnp.float32(od[j]), jnp.float32(odh[j]), jnp.float32(odl[j]),
        )
        acc1 = acc3_add(acc1, p, e)
    # block order (s1 | s0): the caller interleaves to out[2i]=s1, out[2i+1]=s0
    return jnp.concatenate([acc3_to_f32(acc1), acc3_to_f32(acc0)], axis=0)


@functools.lru_cache(maxsize=None)
def _qmf_core_call(s: int, tile: int, nb: int, interpret: bool = False, vma: tuple = ()):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    p_len = s + _NTAPS - 1

    def kernel(we_ref, wo_ref, out_ref):
        out_ref[:] = _tap_body(we_ref[:], wo_ref[:], s)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((2 * s, nb * tile), jnp.float32, vma=frozenset(vma)),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((p_len, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((p_len, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2 * s, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        interpret=interpret,
    )


def _qmf_taps_impl(work: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """work: [..., 46 + 2s] halo-prefixed interleaved stream ->
    [..., 2s] synthesized output (interleaved s1, s0)."""
    w = work.shape[-1]
    s = (w - 2 * _NTAPS + 2) // 2
    assert w == 2 * s + 2 * _NTAPS - 2, work.shape
    lead = work.shape[:-1]

    wt = jnp.moveaxis(work.reshape(-1, w), 0, -1)     # [W, B] position-major
    we, wo = wt[0::2], wt[1::2]                       # [s+23, B] each
    b = wt.shape[-1]
    # live set is ~16 [s+23, tile] f32 arrays (~5 MB at these tiles), well
    # inside the 16 MB scoped-VMEM limit the IMDCT kernel measured against
    tile = 512 if s <= 128 else 256
    tile = tile if b >= tile else max(128, -(-b // 128) * 128)
    pad = (-b) % tile
    if pad:
        we = jnp.pad(we, ((0, 0), (0, pad)))
        wo = jnp.pad(wo, ((0, 0), (0, pad)))
    nb = we.shape[-1] // tile

    from carta1_tpu.ops.exact_fft_pallas import _out_vma

    out = _qmf_core_call(s, tile, nb, interpret, _out_vma(we))(we, wo)  # [2s, B+pad]
    if pad:
        out = out[:, :b]
    # [2s, B] blocks (s1 | s0) -> interleaved [B, 2s]
    out = out.reshape(2, s, b).transpose(2, 1, 0).reshape(lead + (2 * s,))
    return out


@functools.lru_cache(maxsize=None)
def _batched_qmf_taps(interpret: bool):
    """Per-config callable with the same trivial vmap rule as the IMDCT
    kernel: leading axes flatten into the lane dimension."""

    @jax.custom_batching.custom_vmap
    def f(work):
        return _qmf_taps_impl(work, interpret)

    @f.def_vmap
    def _rule(axis_size, in_batched, work):  # noqa: ANN001
        assert in_batched[0], "qmf_taps_pallas under vmap needs a batched operand"
        return f(work), True

    return f


def qmf_taps_pallas(work: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """Drop-in for the tap loop of ops.exact_decode.qmf_synthesis_exact:
    [..., 46+2s] work -> [..., 2s] interleaved output, bit-identical."""
    return _batched_qmf_taps(interpret)(work)
