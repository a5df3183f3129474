"""VMEM-resident Pallas kernel for the bit-exact IMDCT core.

The XLA formulation of ops/exact_decode.imdct_exact compiles to ~hundreds
of small elementwise fusions with an HBM round-trip between each — PERF.md
measured ~10 of the 18.7 ms exact-decode step as fusion-boundary/HBM
overhead.  This kernel runs the ENTIRE transform core — pre-twiddle,
staged radix-2 DIT FFT (f32 store per butterfly, RN64-emulated hazard
columns) and post-twiddle — on one VMEM tile per batch slice, touching HBM
exactly twice (read input / write output).

Bitwise contract: identical stored bits to the XLA path.  Both run the
same error-free-transformation sequences (ops/df: two_sum / presplit
TwoProd / triple-compensated accumulation / rn64) — exact arithmetic is
deterministic regardless of code generator, so fusing cannot change a bit.
Verified on-chip: tests/test_exact_decode.py pallas A/B + the golden
decode gate (verify_tpu.py).

Layout: position-major [half, B] like the XLA core; the batch axis rides
the VPU lanes.  The input-side data movement (even/odd de-interleave,
mid/high flip, FFT bit-reversal, the r/s negations) is folded into ONE
signed permutation matmul applied OUTSIDE the kernel (exact: one ±1 entry
per output row), and the pre-twiddle constants are permuted to match at
build time; the post-twiddle scatter stays the existing one-hot matmul.

Constants (the f64-exact ConstTriple components) are packed into two
small f32 arrays and passed as kernel INPUTS — Pallas forbids captured
array constants, and on this runtime embedded literals are poison anyway
(PERF.md "Relay transfer pathology").

Reference semantics pinned: codec/transforms/mdct.js:139-211 (IMDCT),
fft.js:14-68 (FFT store points, twiddle recurrence, RN64 hazard ties).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from carta1_tpu.gold.fftjs import _bit_reverse_perm
from carta1_tpu.ops.common import fmatmul
from carta1_tpu.ops.df import ConstTriple, split


class _CT:
    """ConstTriple-shaped view over traced (in-kernel) component arrays.

    Duck-types ConstTriple for ops.exact_decode's _mul_terms /
    _hazard_butterfly: same component names, same .index slicing."""

    __slots__ = ConstTriple._COMPONENTS

    def __init__(self, rows=None, shape=None):
        if rows is not None:
            for i, name in enumerate(self.__slots__):
                setattr(self, name, rows[i].reshape(shape))

    def index(self, sl) -> "_CT":
        out = _CT()
        for name in self.__slots__:
            setattr(out, name, getattr(self, name)[sl])
        return out


def _pack_ct(*triples: ConstTriple) -> np.ndarray:
    """ConstTriples (equal length L) -> [9 * len(triples), L] f32."""
    rows = []
    for t in triples:
        for name in ConstTriple._COMPONENTS:
            rows.append(np.asarray(getattr(t, name), np.float32))
    return np.stack(rows)


@functools.lru_cache(maxsize=None)
def _kernel_consts(size: int):
    """Host-side constant preparation for one transform size.

    Returns (pin [half, half] signed permutation, prepost [36, fft],
    stages [18, sum(half_s)], stage_meta tuple)."""
    from carta1_tpu.ops.exact_decode import _imdct_consts, _stage_twiddles

    half = size >> 1
    fft = half >> 1
    # cos/sin triples exactly as the XLA path builds them
    from carta1_tpu.gold.transforms import IMDCT_SCALES, _sincos_table

    tbl = _sincos_table(size, IMDCT_SCALES[size])
    cos_t = ConstTriple(tbl[0::2])
    sin_t = ConstTriple(tbl[1::2])

    br = _bit_reverse_perm(fft)

    # PIN: row r<fft  -> -x2[2*br[r]]           (r = -a, bit-reversed)
    #      row fft+r  -> -x2[half-1-2*br[r]]    (s = -b, bit-reversed)
    pin = np.zeros((half, half), np.float32)
    for r in range(fft):
        pin[r, 2 * br[r]] = -1.0
        pin[fft + r, half - 1 - 2 * br[r]] = -1.0

    prepost = np.concatenate(
        [
            _pack_ct(cos_t.index(br), sin_t.index(br)),  # pre, bit-reversed
            _pack_ct(cos_t, sin_t),                      # post, natural
        ]
    )  # [36, fft]

    stage_parts = []
    stage_meta = []
    off = 0
    stride = 4
    while stride <= fft:
        ctr, cti, hazard = _stage_twiddles(stride)
        h = stride >> 1
        stage_parts.append(_pack_ct(ctr, cti))  # [18, h]
        stage_meta.append((stride, off, hazard))
        off += h
        stride <<= 1
    stages = np.concatenate(stage_parts, axis=1) if stage_parts else np.zeros((18, 1), np.float32)
    return pin, prepost, stages, tuple(stage_meta)


def _core_body(xp, pp, st, size: int):
    """The transform core on one [half, T] tile (pure jnp; runs inside the
    Pallas kernel).  Mirrors ops.exact_decode store-point for store-point."""
    from carta1_tpu.ops.exact_decode import (
        _hazard_butterfly,
        _mul_terms,
        _patch_col,
        _store,
    )

    half = size >> 1
    fft = half >> 1
    t = xp.shape[-1]

    r = xp[:fft]          # -a, bit-reversed (PIN applied outside)
    s_ = xp[fft:]         # -b, bit-reversed
    pre_cos = _CT(pp[0:9], (fft, 1))
    pre_sin = _CT(pp[9:18], (fft, 1))
    rh, rl = split(r)
    sh, sl = split(s_)
    re = _store(None, (1, _mul_terms(s_, sh, sl, pre_sin)), (1, _mul_terms(r, rh, rl, pre_cos)))
    im = _store(None, (1, _mul_terms(s_, sh, sl, pre_cos)), (-1, _mul_terms(r, rh, rl, pre_sin)))

    n = fft
    # stride-2 stage: twiddle (1, 0) -> plain f32 butterflies (innocuous
    # double rounding, see _fft_exact_pm)
    shape = (n // 2, 2, t)
    rev, imv = re.reshape(shape), im.reshape(shape)
    er, orr = rev[:, :1], rev[:, 1:]
    ei, oi = imv[:, :1], imv[:, 1:]
    re = jnp.concatenate([er + orr, er - orr], axis=1).reshape(n, t)
    im = jnp.concatenate([ei + oi, ei - oi], axis=1).reshape(n, t)

    from carta1_tpu.ops.exact_decode import _stage_twiddles  # hazard sets only

    stride = 4
    s_off = 0
    while stride <= n:
        h = stride >> 1
        _, _, hazard = _stage_twiddles(stride)
        ctr = _CT(st[0:9, s_off : s_off + h], (h, 1))
        cti = _CT(st[9:18, s_off : s_off + h], (h, 1))
        shape = (n // stride, stride, t)
        rev, imv = re.reshape(shape), im.reshape(shape)
        er, orr = rev[:, :h], rev[:, h:]
        ei, oi = imv[:, :h], imv[:, h:]
        orh, orl = split(orr)
        oih, oil = split(oi)
        t_or_tr = _mul_terms(orr, orh, orl, ctr)
        t_oi_ti = _mul_terms(oi, oih, oil, cti)
        t_or_ti = _mul_terms(orr, orh, orl, cti)
        t_oi_tr = _mul_terms(oi, oih, oil, ctr)
        re_even = _store(er, (1, t_or_tr), (-1, t_oi_ti))
        re_odd = _store(er, (-1, t_or_tr), (1, t_oi_ti))
        im_even = _store(ei, (1, t_or_ti), (1, t_oi_tr))
        im_odd = _store(ei, (-1, t_or_ti), (-1, t_oi_tr))
        for k in hazard:
            sl2 = np.s_[k : k + 1]
            r0, r1_, i0, i1_ = _hazard_butterfly(
                er[:, sl2], ei[:, sl2], orr[:, sl2], oi[:, sl2],
                ctr.index(sl2), cti.index(sl2),
            )
            re_even = _patch_col(re_even, k, r0)
            re_odd = _patch_col(re_odd, k, r1_)
            im_even = _patch_col(im_even, k, i0)
            im_odd = _patch_col(im_odd, k, i1_)
        re = jnp.concatenate([re_even, re_odd], axis=1).reshape(n, t)
        im = jnp.concatenate([im_even, im_odd], axis=1).reshape(n, t)
        stride <<= 1
        s_off += h

    post_cos = _CT(pp[18:27], (fft, 1))
    post_sin = _CT(pp[27:36], (fft, 1))
    reh, rel = split(re)
    imh, iml = split(im)
    r1 = _store(None, (1, _mul_terms(re, reh, rel, post_cos)), (1, _mul_terms(im, imh, iml, post_sin)))
    i1 = _store(None, (1, _mul_terms(re, reh, rel, post_sin)), (-1, _mul_terms(im, imh, iml, post_cos)))
    return jnp.concatenate([r1, i1], axis=0)  # [half, T]


def _out_vma(x) -> tuple:
    """Varying-mesh-axes of a traced operand, as a hashable key.

    Inside `jax.shard_map` (check_vma=True) a pallas_call's out_shape must
    declare how the output varies across mesh axes; outside, vma is empty.
    The kernel output varies exactly like its batched operand."""
    return tuple(sorted(getattr(jax.typeof(x), "vma", ()) or ()))


@functools.lru_cache(maxsize=None)
def _imdct_core_call(size: int, tile: int, nb: int, interpret: bool = False, vma: tuple = ()):
    """pallas_call for one (size, tile, grid, vma) configuration.

    interpret=True runs the kernel in the Pallas interpreter (any backend)
    — used by the CPU test suite to pin Pallas==XLA bitwise equality
    without TPU hardware."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    half = size >> 1

    def kernel(xp_ref, pp_ref, st_ref, out_ref):
        out_ref[:] = _core_body(xp_ref[:], pp_ref[:], st_ref[:], size)

    pp_shape = _kernel_consts(size)[1].shape
    st_shape = _kernel_consts(size)[2].shape
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((half, nb * tile), jnp.float32, vma=frozenset(vma)),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((half, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(pp_shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(st_shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((half, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        interpret=interpret,
    )


@functools.lru_cache(maxsize=None)
def _batched_imdct(size: int, interpret: bool, mid: bool = False):
    """Per-size callable with a trivial vmap rule.

    The transform is independent per coefficient row, and _imdct_impl
    already flattens ALL leading axes into the kernel's lane (batch)
    dimension — so vmap just feeds the batched array straight in.  The
    default Pallas batching rule (insert a Squeezed grid axis) rejects
    this kernel's blockspec shape; this rule is also faster (the extra
    axis rides the existing lane tiling instead of a new grid dim)."""

    @jax.custom_batching.custom_vmap
    def f(x):
        return _imdct_impl(x, size, interpret, mid)

    @f.def_vmap
    def _rule(axis_size, in_batched, x):  # noqa: ANN001
        # the kernel flattens leading axes into its lane dim, which is only
        # correct when the operand really carries the vmapped axis; a
        # closed-over unbatched operand would silently produce the wrong
        # shape — fail loudly instead (ADVICE r3)
        assert in_batched[0], "imdct_exact_pallas under vmap needs a batched operand"
        return f(x), True

    return f


def imdct_exact_pallas(
    x: jnp.ndarray, size: int, interpret: bool = False, mid: bool = False
) -> jnp.ndarray:
    """Drop-in for ops.exact_decode.imdct_exact: [..., size/2] -> [..., size]
    (middle half only with mid=True — see imdct_exact), bit-identical,
    with the transform core in one VMEM-resident kernel."""
    return _batched_imdct(size, interpret, mid)(x)


def _imdct_impl(x: jnp.ndarray, size: int, interpret: bool = False, mid: bool = False) -> jnp.ndarray:
    from carta1_tpu.ops.exact_decode import _imdct_consts

    half = size >> 1
    assert x.shape[-1] == half
    pin, prepost, stages, _ = _kernel_consts(size)
    p_t = _imdct_consts(size)[2]  # post-twiddle scatter [size, half]
    if mid:
        # row selection only: the one-hot scatter keeps exactly the middle
        # half, so kept outputs are bit-identical and the discarded half
        # never costs MXU work or an HBM write
        p_t = p_t[size >> 2 : (3 * size) >> 2]

    lead = x.shape[:-1]
    x2 = jnp.moveaxis(x.reshape(-1, half), 0, -1)   # [half, B]
    b = x2.shape[-1]
    # scoped-VMEM budget: the live set is ~64 [half, tile] f32 arrays;
    # half*tile = 32K keeps it ~8 MB, inside the 16 MB scoped limit
    # (measured: 26.4 MB OOM at half=256 tile=512; 16.07 MB at tile=256).
    # r4 negative result: raising the 64-point transform's tile to 1024
    # lanes (headroom exists) measured ~10% SLOWER at the imdct substage
    # — the 512-lane tile stands
    tile = min(32768 // half, 512)
    tile = tile if b >= tile else max(128, -(-b // 128) * 128)
    pad = (-b) % tile
    if pad:
        x2 = jnp.pad(x2, ((0, 0), (0, pad)))
    nb = x2.shape[-1] // tile

    xp = fmatmul(jnp.asarray(pin), x2)               # fold deinterleave+flip+bitrev+negate
    core = _imdct_core_call(size, tile, nb, interpret, _out_vma(xp))(
        xp, jnp.asarray(prepost), jnp.asarray(stages)
    )
    out = fmatmul(jnp.asarray(p_t), core)            # [size (or size/2), B+pad]
    if pad:
        out = out[:, :b]
    return jnp.moveaxis(out, 0, -1).reshape(lead + (out.shape[0],))
