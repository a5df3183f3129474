"""Bit-exact batched decoder ops for the TPU engine.

Every function reproduces the reference decoder's arithmetic *at the bit
level* — the f64-compute / f32-store semantics of codec/transforms/fft.js,
mdct.js:139-245, qmf.js:60-105 and codec/coding/quantization.js:65-78 — on
hardware that has no IEEE f64, using the error-free f32 expansion arithmetic
in ops/df.py (see that module's docstring for the precision argument).

Structure mirrors the gold NumPy oracle (gold/transforms.py, gold/decoder.py)
store-point for store-point:

  * dequantize_exact   — RN32(RN64(RN64(q*sf)/range))   (quantization.js:65-78)
  * fft_exact          — staged radix-2 DIT, f32 store per butterfly
                         (fft.js:14-68; twiddles from the f64 recurrence)
  * imdct_exact        — pre-twiddle / FFT / post-twiddle stores (mdct.js:139-211)
  * overlap_add_exact  — windowed cross-fade stores (mdct.js:230-245)
  * qmf_synthesis_exact— 24-tap f64 accumulation per output (qmf.js:60-105)

All data movement (bit-reversal, post-twiddle scatter, spectral reversal,
interleave) is exact: strided slices, reshape/transpose, and ±1 one-hot
matmuls (each output column has exactly one ±1 entry; verified at build
time).  Everything vectorizes over arbitrary leading batch axes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from carta1_tpu import constants as C
from carta1_tpu.gold.fftjs import _bit_reverse_perm, _twiddles
from carta1_tpu.gold.transforms import IMDCT_SCALES, _sincos_table
from carta1_tpu.ops.common import fmatmul, halo_prefix, shift_frames
from carta1_tpu.ops.df import (
    ConstTriple,
    acc3_add,
    acc3_to_f32,
    acc3_zero,
    dekker_split_const,
    rn64,
    split,
    two_prod,
    two_prod_presplit,
)


# ---------------------------------------------------------------------------
# Shared accumulation helpers
# ---------------------------------------------------------------------------
def _mul_terms(x, xh, xl, ct: ConstTriple):
    """Exact term list for x * ct (f32 x, f64-constant-triple ct).

    All three products are exact TwoProds: a plain ``x * ct.c2`` would be a
    raw float multiply feeding adds — the pattern FMA contraction corrupts
    (see ops/df.split)."""
    p0, e0 = two_prod_presplit(x, xh, xl, ct.c0, ct.c0h, ct.c0l)
    p1, e1 = two_prod_presplit(x, xh, xl, ct.c1, ct.c1h, ct.c1l)
    p2, e2 = two_prod_presplit(x, xh, xl, ct.c2, ct.c2h, ct.c2l)
    return ((p0, e0), (p1, e1), (p2, e2))


def _store(base, *signed_term_lists):
    """RN32(base + Σ ±terms): base may be None; each entry is (sign, terms)."""
    shape = None
    for _, terms in signed_term_lists:
        shape = terms[0][0].shape
        break
    acc = acc3_zero(shape if base is None else jnp.broadcast_shapes(base.shape, shape))
    if base is not None:
        acc = acc3_add(acc, jnp.broadcast_to(base, acc[0].shape))
    for sign, terms in signed_term_lists:
        for p, e in terms:
            if sign < 0:
                acc = acc3_add(acc, -p, None if e is None else -e)
            else:
                acc = acc3_add(acc, p, e)
    return acc3_to_f32(acc)


# ---------------------------------------------------------------------------
# FFT (fft.js:14-68): staged radix-2 DIT with an f32 store per butterfly
# ---------------------------------------------------------------------------
def _bit_reverse(x: jnp.ndarray) -> jnp.ndarray:
    """Exact bit-reversal permutation of the FIRST axis via digit transpose."""
    n = x.shape[0]
    k = n.bit_length() - 1
    tail = x.shape[1:]
    y = x.reshape((2,) * k + tail)
    axes = tuple(reversed(range(k))) + tuple(range(k, k + len(tail)))
    return y.transpose(axes).reshape((n,) + tail)


def _dist_dyadic(c: float) -> float:
    """Distance from |c| to the nearest of {0, 1} (the hazard anchors)."""
    a = abs(float(c))
    return min(a, abs(a - 1.0))


@functools.lru_cache(maxsize=None)
def _stage_twiddles(stride: int) -> tuple[ConstTriple, ConstTriple, tuple[int, ...]]:
    """Per-stage twiddle triples from the reference's f64 recurrence
    (fft.js:42-65 — NOT the closed form; the last-ulp drift matters), plus
    the *hazardous* column set.

    A column k is hazardous when a twiddle component is within 2^-20 of
    0 or ±1 (in practice: k = half/2, where w ≈ (6.1e-17, -1)).  There the
    butterfly output is an exact copy of an f32 input plus a tiny
    correction, so f32 stores land on rounding midpoints routinely and the
    reference's own f64 rounding of the correction DECIDES the stored bit —
    those columns must reproduce RN64, not just the exact value.  For every
    other column the twiddle mantissas are generic, ties occur with
    probability ~2^-29 per store, and the near-exact path matches (see
    ops/df.py docstring for the full argument).
    """
    tr, ti = _twiddles(stride)
    half = stride >> 1
    hazard = tuple(
        k for k in range(1, half)
        if _dist_dyadic(tr[k]) < 2.0**-20 or _dist_dyadic(ti[k]) < 2.0**-20
    )
    return ConstTriple(tr), ConstTriple(ti), hazard


def _flat(pairs):
    """(p, e) pair list -> plain term list (skipping structural Nones)."""
    out = []
    for p, e in pairs:
        out.append(p)
        if e is not None:
            out.append(e)
    return out


def _neg(terms):
    return [-t for t in terms]


def _store_terms(terms):
    """RN32 of an exact expansion (tie-correct); list or term-major array."""
    if not isinstance(terms, (list, tuple)):
        terms = [terms[i] for i in range(terms.shape[0])]
    acc = acc3_zero(terms[0].shape)
    for t in terms:
        acc = acc3_add(acc, t)
    return acc3_to_f32(acc)


def _stack_terms(pairs):
    """(p, e) pair list -> term-major [T, ...] expansion array."""
    return jnp.stack(jnp.broadcast_arrays(*_flat(pairs)), axis=0)


def _patch_col(x, k: int, col):
    """Replace column k of the butterfly axis (axis 1 of [m, half, B]).

    Empty edge slices are skipped — Mosaic (the Pallas TPU backend)
    rejects zero-size vectors, and stride-4 stages patch the LAST column."""
    parts = []
    if k > 0:
        parts.append(x[:, :k])
    parts.append(col)
    if k + 1 < x.shape[1]:
        parts.append(x[:, k + 1 :])
    return jnp.concatenate(parts, axis=1) if len(parts) > 1 else col


def _hazard_butterfly(er, ei, orr, oi, ctr_k, cti_k):
    """One butterfly column with the reference's full RN64 chain
    (fft.js:52-57): t = w*o rounded per-op in f64, outputs RN32(RN64(e±t)).

    The four products, two combinations and four output roundings are each
    batched into ONE rn64 call on a stacked axis — rn64 dominates compile
    cost, so instances matter more than elements."""
    orh, orl = split(orr)
    oih, oil = split(oi)
    # group axis 1, term axis 0: the big data axes stay minor (lane-resident)
    prods = jnp.stack(
        [
            _stack_terms(_mul_terms(orr, orh, orl, ctr_k)),  # or * w_re
            _stack_terms(_mul_terms(oi, oih, oil, cti_k)),   # oi * w_im
            _stack_terms(_mul_terms(orr, orh, orl, cti_k)),  # or * w_im
            _stack_terms(_mul_terms(oi, oih, oil, ctr_k)),   # oi * w_re
        ],
        axis=1,
    )
    p = jnp.stack(rn64(prods), axis=0)                        # [4t, 4g, ...]
    a, b, c, d = (p[:, i] for i in range(4))
    comb = jnp.stack(
        [jnp.concatenate([a, -b], axis=0), jnp.concatenate([c, d], axis=0)], axis=1
    )
    t = jnp.stack(rn64(comb), axis=0)                         # [4t, 2g, ...]
    t_r, t_i = t[:, 0], t[:, 1]
    outs = jnp.stack(
        [
            jnp.concatenate([er[None], t_r], axis=0),
            jnp.concatenate([er[None], -t_r], axis=0),
            jnp.concatenate([ei[None], t_i], axis=0),
            jnp.concatenate([ei[None], -t_i], axis=0),
        ],
        axis=1,
    )
    o = jnp.stack(rn64(outs), axis=0)                         # [4t, 4g, ...]
    stored = _store_terms(o)                                  # [4g, ...]
    return (stored[0], stored[1], stored[2], stored[3])


def _fft_exact_pm(re: jnp.ndarray, im: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Position-major FFT core: re, im are [n, B].

    Keeping the batch axis minor means every stage's [m, half, B] ops run
    with full VPU lanes; the earlier [..., m, stride] layout left the lanes
    mostly idle (stride as small as 4) and cost ~50x throughput."""
    n = re.shape[0]
    b = re.shape[1:]
    re = _bit_reverse(re)
    im = _bit_reverse(im)

    # stride 2: twiddle is exactly (1, 0) -> plain f32 butterflies (the f64
    # compute / f32 store of a single add double-rounds innocuously: 53 >= 2*24+2)
    shape = (n // 2, 2) + b
    rev, imv = re.reshape(shape), im.reshape(shape)
    er, orr = rev[:, :1], rev[:, 1:]
    ei, oi = imv[:, :1], imv[:, 1:]
    re = jnp.concatenate([er + orr, er - orr], axis=1).reshape(re.shape)
    im = jnp.concatenate([ei + oi, ei - oi], axis=1).reshape(im.shape)

    stride = 4
    while stride <= n:
        half = stride >> 1
        ctr, cti, hazard = _stage_twiddles(stride)
        bshape = (half,) + (1,) * len(b)
        ctr_b, cti_b = ctr.reshape(bshape), cti.reshape(bshape)
        shape = (n // stride, stride) + b
        rev, imv = re.reshape(shape), im.reshape(shape)
        er, orr = rev[:, :half], rev[:, half:]
        ei, oi = imv[:, :half], imv[:, half:]
        orh, orl = split(orr)
        oih, oil = split(oi)
        t_or_tr = _mul_terms(orr, orh, orl, ctr_b)   # or * w_re
        t_oi_ti = _mul_terms(oi, oih, oil, cti_b)    # oi * w_im
        t_or_ti = _mul_terms(orr, orh, orl, cti_b)   # or * w_im
        t_oi_tr = _mul_terms(oi, oih, oil, ctr_b)    # oi * w_re
        # t_re = or*w_re - oi*w_im ; t_im = or*w_im + oi*w_re (fft.js:52-53)
        re_even = _store(er, (1, t_or_tr), (-1, t_oi_ti))
        re_odd = _store(er, (-1, t_or_tr), (1, t_oi_ti))
        im_even = _store(ei, (1, t_or_ti), (1, t_oi_tr))
        im_odd = _store(ei, (-1, t_or_ti), (-1, t_oi_tr))
        for k in hazard:
            sl = np.s_[k : k + 1]
            r0, r1, i0, i1 = _hazard_butterfly(
                er[:, sl], ei[:, sl], orr[:, sl], oi[:, sl],
                ctr_b.index(sl), cti_b.index(sl),
            )
            re_even = _patch_col(re_even, k, r0)
            re_odd = _patch_col(re_odd, k, r1)
            im_even = _patch_col(im_even, k, i0)
            im_odd = _patch_col(im_odd, k, i1)
        re = jnp.concatenate([re_even, re_odd], axis=1).reshape(re.shape)
        im = jnp.concatenate([im_even, im_odd], axis=1).reshape(im.shape)
        stride <<= 1
    return re, im


def fft_exact(re: jnp.ndarray, im: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Batched FFT over the last axis, bit-identical to gold.fftjs.fft_js
    on float32 inputs."""
    shape = re.shape
    n = shape[-1]
    re2 = jnp.moveaxis(re.reshape(-1, n), 0, -1)   # [n, B]
    im2 = jnp.moveaxis(im.reshape(-1, n), 0, -1)
    ro, io = _fft_exact_pm(re2, im2)
    ro = jnp.moveaxis(ro, 0, -1).reshape(shape)
    io = jnp.moveaxis(io, 0, -1).reshape(shape)
    return ro, io


# ---------------------------------------------------------------------------
# IMDCT (mdct.js:139-211)
# ---------------------------------------------------------------------------
def _assert_no_dyadic_hazard(values: np.ndarray, what: str) -> None:
    """Constants multiplying signal outside the RN64-emulated paths must not
    be near-dyadic (see _stage_twiddles); all current tables clear 2^-19."""
    d = np.array([_dist_dyadic(v) for v in np.asarray(values, np.float64).ravel()])
    assert (d > 2.0**-20).all(), f"{what}: near-dyadic constant needs the RN64 path"


@functools.lru_cache(maxsize=None)
def _imdct_consts(size: int) -> tuple[ConstTriple, ConstTriple, jnp.ndarray]:
    """(cos, sin) twiddle triples and the signed post-twiddle scatter matrix."""
    scale = IMDCT_SCALES[size]
    tbl = _sincos_table(size, scale)  # f64 [size/2] interleaved (cos, sin)
    _assert_no_dyadic_hazard(tbl, f"imdct{size} sincos")
    cos_t = ConstTriple(tbl[0::2])
    sin_t = ConstTriple(tbl[1::2])

    half, quarter = size >> 1, size >> 2
    fft_size = half >> 1
    n34 = 3 * quarter
    # P[src, dst]: src 0..fft_size-1 = r1[i], src fft_size.. = i1[i]
    P = np.zeros((2 * fft_size, size), np.float32)
    for i in range(fft_size // 2):
        i2 = 2 * i
        P[i, n34 - 1 - i2] = 1.0
        P[i, n34 + i2] = 1.0
        P[fft_size + i, quarter + i2] = 1.0
        P[fft_size + i, quarter - 1 - i2] = -1.0
    for i in range(fft_size // 2, fft_size):
        idx = (i - fft_size // 2) * 2 + quarter
        P[i, n34 - 1 - idx] = 1.0
        P[i, idx - quarter] = -1.0
        P[fft_size + i, quarter + idx] = 1.0
        P[fft_size + i, 5 * quarter - 1 - idx] = 1.0
    assert (np.abs(P).sum(axis=0) == 1.0).all(), "post-twiddle scatter must cover each output once"
    # transposed for the position-major core: out[size, B] = P.T @ [2fft, B]
    return cos_t, sin_t, np.ascontiguousarray(P.T)  # host numpy (lru-safe)


# Read once at import: the choice is baked into lru-cached jits
# (_decode_vmap_jit, _batched_imdct), so changing the env var mid-process
# would silently do nothing — making it process-start-only is the honest
# contract (ADVICE r3).
import os as _os

_EXACT_PALLAS_MODE = _os.environ.get("CARTA1_EXACT_PALLAS", "auto")


def _use_pallas_imdct() -> bool:
    """Pallas transform core on TPU (default), XLA elsewhere.

    CARTA1_EXACT_PALLAS=0 forces the XLA path, =1 forces Pallas; the
    variable is read ONCE at import (process-start-only).  Both paths are
    bit-identical (same error-free op sequences; pinned by the A/B test
    in tests/test_exact_decode.py and the on-chip golden gate)."""
    if _EXACT_PALLAS_MODE == "0":
        return False
    if _EXACT_PALLAS_MODE == "1":
        return True
    return jax.default_backend() == "tpu"


def imdct_exact(x: jnp.ndarray, size: int, mid: bool = False) -> jnp.ndarray:
    """[..., size/2] f32 spectra -> [..., size] f32, bit-identical to
    gold.transforms.imdct (mdct.js:139-211 with the reference scales).

    Dispatches to the VMEM-resident Pallas core on TPU
    (ops/exact_fft_pallas.py) and the XLA formulation elsewhere.

    `mid=True` returns only the middle half [size/4, 3*size/4) — the only
    region the decoder's overlap assembly ever reads (decoder.js:203-303
    copies windowStart..windowStart+size samples).  Implemented by slicing
    the one-hot post-twiddle scatter matrix's ROWS at build time, so it is
    a pure selection: the kept outputs are bit-identical to the full
    transform's, and the discarded half never costs MXU work or an HBM
    write (r5)."""
    if _use_pallas_imdct():
        from carta1_tpu.ops.exact_fft_pallas import imdct_exact_pallas

        return imdct_exact_pallas(x, size, mid=mid)
    return imdct_exact_xla(x, size, mid=mid)


def imdct_exact_xla(x: jnp.ndarray, size: int, mid: bool = False) -> jnp.ndarray:
    """XLA formulation of the exact IMDCT (the CPU/test path).

    Internally position-major ([half, B]) so the batch axis stays in the
    VPU lanes throughout (see _fft_exact_pm)."""
    half = size >> 1
    assert x.shape[-1] == half
    fft_size = half >> 1
    cos_t, sin_t, p_t = _imdct_consts(size)
    if mid:
        p_t = p_t[size >> 2 : (3 * size) >> 2]
    ct_c = cos_t.reshape((fft_size, 1))
    ct_s = sin_t.reshape((fft_size, 1))

    lead = x.shape[:-1]
    x2 = jnp.moveaxis(x.reshape(-1, half), 0, -1)    # [half, B]

    # pre-twiddle (mdct.js:149-157): r = -x[2i], s = -x[half-1-2i]
    a = x2[0::2]
    b = jnp.flip(x2[1::2], axis=0)
    r, s_ = -a, -b
    rh, rl = split(r)
    sh, sl = split(s_)
    re = _store(None, (1, _mul_terms(s_, sh, sl, ct_s)), (1, _mul_terms(r, rh, rl, ct_c)))
    im = _store(None, (1, _mul_terms(s_, sh, sl, ct_c)), (-1, _mul_terms(r, rh, rl, ct_s)))

    re, im = _fft_exact_pm(re, im)

    # post-twiddle (mdct.js:168-205): r1 = re*c + im*s ; i1 = re*s - im*c
    reh, rel = split(re)
    imh, iml = split(im)
    r1 = _store(None, (1, _mul_terms(re, reh, rel, ct_c)), (1, _mul_terms(im, imh, iml, ct_s)))
    i1 = _store(None, (1, _mul_terms(re, reh, rel, ct_s)), (-1, _mul_terms(im, imh, iml, ct_c)))
    out = fmatmul(p_t, jnp.concatenate([r1, i1], axis=0))   # [size (or size/2), B]
    return jnp.moveaxis(out, 0, -1).reshape(lead + (out.shape[0],))


# ---------------------------------------------------------------------------
# Overlap-add (mdct.js:230-245)
# ---------------------------------------------------------------------------
@functools.lru_cache(maxsize=None)
def _ola_windows() -> tuple[ConstTriple, ConstTriple]:
    w = C.WINDOW_SHORT  # f64 [32]
    t = C.MDCT_TAIL_WINDOW_SIZE
    _assert_no_dyadic_hazard(w, "WINDOW_SHORT")
    return ConstTriple(w[:t]), ConstTriple(w[2 * t - 1 : t - 1 : -1])  # w1[i]=w[i], w2[i]=w[31-i]


def overlap_add_exact(prev: jnp.ndarray, curr: jnp.ndarray) -> jnp.ndarray:
    """[..., 16] x2 -> [..., 32], bit-identical to gold overlap_add_js."""
    w1, w2 = _ola_windows()
    c = jnp.flip(curr, axis=-1)  # c[i] = curr[15-i]
    ph, pl = split(prev)
    ch, cl = split(c)
    lo = _store(None, (1, _mul_terms(prev, ph, pl, w2)), (-1, _mul_terms(c, ch, cl, w1)))
    hi = _store(None, (1, _mul_terms(prev, ph, pl, w1)), (1, _mul_terms(c, ch, cl, w2)))
    return jnp.concatenate([lo, jnp.flip(hi, axis=-1)], axis=-1)


# ---------------------------------------------------------------------------
# Dequantization (quantization.js:65-78): RN32(RN64(RN64(q*sf)/range))
# ---------------------------------------------------------------------------
class _SFView:
    """ConstTriple components looked up per-element via one-hot contraction
    (exact: 0/1 selection) and broadcast to the coefficient axis."""

    __slots__ = ("c0", "c1", "c2", "c0h", "c0l", "c1h", "c1l", "c2h", "c2l")

    def __init__(self, base: ConstTriple, one_hot: jnp.ndarray):
        from carta1_tpu.ops.common import FP

        for name in self.__slots__:
            table = getattr(base, name)
            v = jnp.einsum("...n,n->...", one_hot, table, precision=FP)
            setattr(self, name, v[..., None])


@functools.lru_cache(maxsize=None)
def _sf_triple() -> ConstTriple:
    return ConstTriple(C.SCALE_FACTORS)


def dequantize_exact(quantized: jnp.ndarray, sf_idx: jnp.ndarray, word_len: jnp.ndarray) -> jnp.ndarray:
    """int32 [..., 52, 20] -> f32, bit-identical to gold dequantize_js.

    The heavy math runs on a [..., 1040] flattening: a 20-wide minor axis
    leaves most of the VPU lanes idle (measured ~6x slower)."""
    from carta1_tpu.ops.coding import quant_range

    lead = quantized.shape[:-2]
    nslot = quantized.shape[-2] * quantized.shape[-1]
    width = quantized.shape[-1]

    sf = _SFView(_sf_triple(), jax.nn.one_hot(sf_idx, 64, dtype=jnp.float32))
    for name in _SFView.__slots__:
        v = getattr(sf, name)  # [..., 52, 1]
        setattr(sf, name, jnp.broadcast_to(v, v.shape[:-1] + (width,)).reshape(lead + (nslot,)))
    rng = quant_range(word_len)                      # int32 [..., 52]
    active = jnp.broadcast_to(
        ((rng > 0) & (sf_idx > 0))[..., None], lead + (52, width)
    ).reshape(lead + (nslot,))
    d = jnp.broadcast_to(
        jnp.where(rng > 0, rng, 1).astype(jnp.float32)[..., None], lead + (52, width)
    ).reshape(lead + (nslot,))

    qf = quantized.astype(jnp.float32).reshape(lead + (nslot,))  # exact (|q| <= 32767)
    qh, ql = split(qf)
    # v = q * sf, exact to ~2^-72 (the reference's own RN64 here is the
    # dominant deviation, ~2^-53 -> flip probability ~2^-29 per store)
    vacc = acc3_zero(qf.shape)
    for p, e in _mul_terms(qf, qh, ql, sf):
        vacc = acc3_add(vacc, p, e)

    # v / d by Newton residual refinement (robust to the TPU's ~1-ulp div)
    q0 = acc3_to_f32(vacc) / d
    ph, pe = two_prod(q0, d)
    racc = acc3_add(acc3_add(vacc, -ph), -pe)
    q1 = acc3_to_f32(racc) / d
    ph2, pe2 = two_prod(q1, d)
    racc = acc3_add(acc3_add(racc, -ph2), -pe2)
    q2 = acc3_to_f32(racc) / d
    out = acc3_to_f32(acc3_add(acc3_add(acc3_zero(q0.shape), q0), q1, q2))
    return jnp.where(active, out, 0.0).reshape(lead + (52, width))


# ---------------------------------------------------------------------------
# QMF synthesis (qmf.js:60-105)
# ---------------------------------------------------------------------------
@functools.lru_cache(maxsize=None)
def _qmf_tap_splits() -> tuple[np.ndarray, ...]:
    _assert_no_dyadic_hazard(C.QMF_EVEN, "QMF_EVEN")
    _assert_no_dyadic_hazard(C.QMF_ODD, "QMF_ODD")
    eh, el = dekker_split_const(C.QMF_EVEN)
    oh, ol = dekker_split_const(C.QMF_ODD)
    return (np.asarray(C.QMF_EVEN), eh, el, np.asarray(C.QMF_ODD), oh, ol)


def qmf_synthesis_exact(low: jnp.ndarray, high: jnp.ndarray, delay: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """low, high: [F, S]; delay: [46].  Returns (out [F, 2S], new_delay).

    Bit-identical to gold qmf_synthesis_stream chained over the frames.
    The 24-tap exact accumulation runs as a VMEM-resident Pallas kernel on
    TPU (ops/exact_qmf_pallas.py, same op sequence → same bits); the XLA
    loop below is the CPU/test path and the CARTA1_EXACT_PALLAS=0 fallback."""
    nframes, s = low.shape
    # merged stores: 0.5*(l±h) — a single f64 add + exact halving double-rounds
    # innocuously, so plain f32 matches the reference bit-for-bit
    merged = jnp.stack([0.5 * (low + high), 0.5 * (low - high)], axis=-1).reshape(nframes, 2 * s)
    work = halo_prefix(merged, delay)                # [F, 46 + 2S]
    if _use_pallas_imdct():
        from carta1_tpu.ops.exact_qmf_pallas import qmf_taps_pallas

        return qmf_taps_pallas(work), merged[-1, -C.QMF_DELAY:]
    wh, wl = split(work)
    ev, evh, evl, od, odh, odl = _qmf_tap_splits()

    acc0 = acc3_zero((nframes, s))
    acc1 = acc3_zero((nframes, s))
    for j in range(24):
        sl0 = slice(2 * j, 2 * j + 2 * s, 2)         # work[2i + 2j]
        sl1 = slice(2 * j + 1, 2 * j + 2 * s + 1, 2)  # work[2i + 2j + 1]
        p, e = two_prod_presplit(work[:, sl0], wh[:, sl0], wl[:, sl0],
                                 jnp.float32(ev[j]), jnp.float32(evh[j]), jnp.float32(evl[j]))
        acc0 = acc3_add(acc0, p, e)
        p, e = two_prod_presplit(work[:, sl1], wh[:, sl1], wl[:, sl1],
                                 jnp.float32(od[j]), jnp.float32(odh[j]), jnp.float32(odl[j]))
        acc1 = acc3_add(acc1, p, e)
    s0 = acc3_to_f32(acc0)
    s1 = acc3_to_f32(acc1)
    out = jnp.stack([s1, s0], axis=-1).reshape(nframes, 2 * s)  # qmf.js:98-101
    return out, merged[-1, -C.QMF_DELAY:]


# ---------------------------------------------------------------------------
# Per-band IMDCT + overlap assembly (decoder.js:116-330)
# ---------------------------------------------------------------------------
def _short_path_full(bands: list, nframes: int) -> list:
    """Short-block IMDCTs for EVERY frame: 4 + 4 + 8 imdct64 blocks, one
    batched instance (compute-both+select's short half)."""
    blocks = jnp.concatenate(
        [
            bands[0].reshape(nframes, 4, 32),
            jnp.flip(bands[1].reshape(nframes, 4, 32), axis=-1),
            jnp.flip(bands[2].reshape(nframes, 8, 32), axis=-1),
        ],
        axis=1,
    )                                                            # [F, 16, 32]
    inv64 = imdct_exact(blocks, 64, mid=True)                    # [F, 16, 32]
    return [
        inv64[:, 0:4].reshape(nframes, 128),
        inv64[:, 4:8].reshape(nframes, 128),
        inv64[:, 8:16].reshape(nframes, 256),
    ]


def _short_path_partitioned(
    bands: list, is_short: jnp.ndarray, nframes: int, cap: int
) -> list:
    """Short-block IMDCTs for only the (<= cap) short-mode frames per band.

    In real material short (transient) frames are a small minority, yet
    compute-both+select pays all 16 imdct64 transforms for every frame —
    measured ~38% of the IMDCT stage (PROFILE_r04).  Here each band's
    short frames are compacted into a fixed [cap] bucket, transformed, and
    scattered back to frame order, so the per-frame short cost drops by
    ~F/cap.  Long/decode semantics are untouched: the reference's own
    long/short dispatch is decoder.js:175-306.

    Compaction is rank-based one-hot matmuls, NOT dynamic gathers (which
    this runtime punishes globally, PERF.md "Gather poisoning"): frame f
    with rank r = cumsum(is_short)-1 contributes S[r, f] = 1; rows beyond
    the band's short count are all-zero, transform zeros, and scatter
    nothing.  Selection matmuls are 0/1 at HIGHEST precision — exact
    (ops/common.FP note) — and the expansion arithmetic is elementwise
    with fixed accumulation order, so batch compaction cannot change any
    stored bit.

    CONTRACT: every band's short count must be <= cap; frames whose rank
    overflows cap would silently decode as zeros.  Callers either check
    counts on the host or wrap this in the lax.cond in imdct_bands_exact."""
    lanes = jnp.arange(cap, dtype=jnp.int32)[:, None]            # [cap, 1]
    sel = []
    for b in range(3):
        flag = is_short[:, b]
        rank = jnp.cumsum(flag.astype(jnp.int32)) - 1            # [F]
        sel.append(((rank[None, :] == lanes) & flag[None, :]).astype(jnp.float32))
    g0 = fmatmul(sel[0], bands[0])                               # [cap, 128]
    g1 = fmatmul(sel[1], bands[1])                               # [cap, 128]
    g2 = fmatmul(sel[2], bands[2])                               # [cap, 256]
    blocks = jnp.concatenate(
        [
            g0.reshape(cap, 4, 32),
            jnp.flip(g1.reshape(cap, 4, 32), axis=-1),
            jnp.flip(g2.reshape(cap, 8, 32), axis=-1),
        ],
        axis=1,
    )                                                            # [cap, 16, 32]
    inv64 = imdct_exact(blocks, 64, mid=True)                    # [cap, 16, 32]
    parts = [
        inv64[:, 0:4].reshape(cap, 128),
        inv64[:, 4:8].reshape(cap, 128),
        inv64[:, 8:16].reshape(cap, 256),
    ]
    return [fmatmul(sel[b].T, parts[b]) for b in range(3)]       # [F, size_b]


def imdct_bands_exact(
    coeffs: jnp.ndarray,
    modes: jnp.ndarray,
    tail_states: tuple,
    short_cap: int | None = None,
    assume_fits: bool = False,
) -> tuple[list, list]:
    """All three bands' IMDCT + overlap assembly, one batched graph.

    coeffs [F, 512]; modes int32 [F, 3]; tail_states: three [16] carries.
    Returns (band outputs [[F,128],[F,128],[F,256]], new tails).

    Per-band arithmetic is bit-identical to gold.decoder._imdct_band
    (decoder.js:116-330); this formulation only widens batch axes so the
    work compiles as THREE transform builds instead of six and ONE
    overlap-add build instead of nineteen: the two imdct256 instances
    (bands 0-1 long path) share one build, all 16 short-path imdct64
    blocks share one, and every overlap-add window runs in a single
    [F, 19, 16] call.  Expansion arithmetic is elementwise with a fixed
    accumulation order, so batching cannot change any stored bit — and it
    halves both XLA:CPU compile time and the number of fusion boundaries
    (HBM round-trips) on device.

    `short_cap` (static) partitions the short path by block mode: only a
    [cap]-frame bucket pays the 16 imdct64 transforms instead of all F
    frames (_short_path_partitioned).  None = compute-both+select.  An
    int is one capacity; a TUPLE of ints is a capacity ladder (r5): the
    in-graph conds pick the smallest tier that fits the chunk's short
    counts, so typical material (shorts ~1%) pays a tiny bucket while
    percussive material still gets a partitioned tier before the
    compute-both fallback.  With `assume_fits=False` the final fallback
    is the full short path, so the output is bit-identical for EVERY
    input; `assume_fits=True` skips the conds (for callers under vmap,
    where cond degenerates to both-branches-executed), uses the FIRST
    tier, and requires the caller to have verified the counts."""
    nframes = coeffs.shape[0]
    t = C.MDCT_TAIL_WINDOW_SIZE
    sizes = C.MDCT_BAND_SIZES  # (128, 128, 256)
    bands = [coeffs[:, 0:128], coeffs[:, 128:256], coeffs[:, 256:512]]

    # long path: mid/high spectra are reversed (utils.js:42-48)
    spec0 = bands[0]
    spec1 = jnp.flip(bands[1], axis=-1)
    spec2 = jnp.flip(bands[2], axis=-1)
    inv01 = imdct_exact(jnp.stack([spec0, spec1], axis=0), 256, mid=True)  # [2, F, 128]
    inv2 = imdct_exact(spec2, 512, mid=True)                               # [F, 256]
    inv_long = [inv01[0], inv01[1], inv2]

    caps = short_cap if isinstance(short_cap, tuple) else (
        () if short_cap is None else (short_cap,)
    )
    caps = tuple(sorted({c for c in caps if 0 < c < nframes}))
    if not caps:
        inv_short = _short_path_full(bands, nframes)
    else:
        is_short = modes != 0                                    # [F, 3]
        if assume_fits:
            inv_short = _short_path_partitioned(bands, is_short, nframes, caps[0])
        else:
            max_count = jnp.max(jnp.sum(is_short, axis=0, dtype=jnp.int32))

            def _select(i: int):
                if i == len(caps):
                    return _short_path_full(bands, nframes)
                return jax.lax.cond(
                    max_count <= caps[i],
                    lambda: _short_path_partitioned(bands, is_short, nframes, caps[i]),
                    lambda: _select(i + 1),
                )

            inv_short = _select(0)

    inv_bufs, tails, prev_tails = [], [], []
    for b in range(3):
        is_long = (modes[:, b] == 0)[:, None]
        buf = jnp.where(is_long, inv_long[b], inv_short[b])
        inv_bufs.append(buf)
        tl = buf[:, sizes[b] - t :]
        tails.append(tl)
        prev_tails.append(shift_frames(tl, tail_states[b]))

    # every overlap-add in one call: per band the long-path OLA plus nb
    # short-block OLAs — the short-block chain is NOT sequential (each
    # block's `prev` is a slice of inv_buf, decoder.js:286-303), so all 19
    # windows batch on one axis
    prev_list, curr_list = [], []
    for b in range(3):
        nb = C.MDCT_NUM_SHORT_BLOCKS[b]
        buf = inv_bufs[b]
        prev_list.append(prev_tails[b][:, None])                 # long-path prev
        curr_list.append(buf[:, None, :t])                       # long-path curr
        prevs = [prev_tails[b]] + [buf[:, 32 * j - t : 32 * j] for j in range(1, nb)]
        prev_list.append(jnp.stack(prevs, axis=1))
        curr_list.append(buf.reshape(nframes, nb, 32)[:, :, :t])
    ola = overlap_add_exact(
        jnp.concatenate(prev_list, axis=1), jnp.concatenate(curr_list, axis=1)
    )                                                            # [F, 19, 32]

    outs = []
    off = 0
    for b in range(3):
        nb = C.MDCT_NUM_SHORT_BLOCKS[b]
        is_long = (modes[:, b] == 0)[:, None]
        out_long = jnp.concatenate(
            [ola[:, off], inv_bufs[b][:, t : sizes[b] - t]], axis=1
        )
        out_short = ola[:, off + 1 : off + 1 + nb].reshape(nframes, sizes[b])
        outs.append(jnp.where(is_long, out_long, out_short))
        off += 1 + nb
    return outs, [tl[-1] for tl in tails]
