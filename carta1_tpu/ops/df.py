"""Error-free float32 expansion arithmetic (the bit-exact decode substrate).

The reference decoder computes in f64 and rounds to f32 at every typed-array
store (SURVEY §2.4; codec/transforms/mdct.js:110,175, qmf.js:88-101,
quantization.js:65-78).  TPUs have no IEEE f64 (the XLA f64 emulation is a
loose float-float: measured mul error 2^-46, unbounded relative add error
under cancellation), so the exact engine instead computes every
inter-store expression as an *unevaluated sum of float32 terms* using
error-free transformations:

  * TwoSum (Knuth)        — a + b     == s + e  exactly
  * Dekker split/TwoProd  — a * b     == p + e  exactly
  * triple-compensated accumulation — dot products with error ~2^-65

Both were verified exact on the TPU VPU and on XLA:CPU (f32 add/mul are
IEEE round-to-nearest there, and XLA performs no FMA contraction —
measured over 10^6 wide-exponent cases; tests/test_df.py pins this per
backend).  The computed value therefore deviates from the reference's
f64 chain only by the reference's *own* f64 rounding (~2^-53 relative),
which flips a subsequent f32 store decision with probability ~2^-29 per
store — below one expected flipped intermediate ulp per ~50k frames, and
measured zero over the full fixture + randomized corpus (see
tests/test_exact_decode.py).  Everything is deterministic: the same input
produces the same bits on every backend, every run.

f64 constants (scale factors, MDCT twiddles, windows) are represented
exactly as host-precomputed triples of non-overlapping f32s (24+24+5
bits ≥ 53) with their Dekker splits precomputed alongside.
"""

from __future__ import annotations

from functools import partial

import jax.numpy as jnp
import numpy as np

from jax import lax


# ---------------------------------------------------------------------------
# Error-free transformations (device)
# ---------------------------------------------------------------------------
def two_sum(a, b):
    """a + b == s + e exactly (Knuth, 6 flops, no ordering requirement)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def fast_two_sum(a, b):
    """a + b == s + e exactly IF |a| >= |b| (3 flops).  s is always RN(a+b)."""
    s = a + b
    e = b - (s - a)
    return s, e


def split(a):
    """Exact split a == hi + lo with <=12-bit mantissas (enables exact products).

    Integer mantissa masking, NOT Veltkamp's ``t - (t - SPLIT*a)``: the
    multiply-based split is the one error-free transformation that is not
    robust to FMA contraction, and XLA:CPU's x86 backend (AVX2+) contracts
    mul+add/sub at instruction selection even for strict IR — measured to
    silently corrupt Dekker splits depending on fusion context (see
    tests/test_df.py::test_eft_survives_compilation for the pinned repro).
    Masking uses no float multiply, so there is nothing to contract."""
    bits = lax.bitcast_convert_type(a, jnp.int32)
    hi = lax.bitcast_convert_type(jnp.bitwise_and(bits, jnp.int32(-4096)), jnp.float32)
    return hi, a - hi  # clears the low 12 mantissa bits; a - hi is Sterbenz-exact


def two_prod(a, b):
    """a * b == p + e exactly (Dekker, 17 flops)."""
    p = a * b
    ah, al = split(a)
    bh, bl = split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def two_prod_presplit(a, ah, al, b, bh, bl):
    """two_prod with both splits already available (9 flops)."""
    p = a * b
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


# ---------------------------------------------------------------------------
# Triple-compensated accumulator: error ~2^-65 relative to the running sum
# ---------------------------------------------------------------------------
def acc3_zero(shape, dtype=jnp.float32):
    z = jnp.zeros(shape, dtype)
    return (z, z, z)


def acc3_add(acc, p, ep=None):
    """Add an exact product pair (p, ep) — or a plain term — into (s, c, cc).

    s-level and c-level use TwoSum (their errors are captured one level
    down); cc absorbs ~2^-48-relative residue with plain adds, so the
    dropped error is ~2^-72 relative per step."""
    s, c, cc = acc
    s, e1 = two_sum(s, p)
    c, e2 = two_sum(c, e1)
    cc = cc + e2
    if ep is not None:
        c, e3 = two_sum(c, ep)
        cc = cc + e3
    return (s, c, cc)


_TIE_UP = np.float32(1.0 + 2.0**-22)   # one-ulp relative nudges (exact f32 muls
_TIE_DN = np.float32(1.0 - 2.0**-22)   # on the residual's 24-bit mantissa)


def acc3_to_f32(acc):
    """Correctly rounded RN32 of the accumulator's value.

    A plain float finish (``h + (r + cc)``) double-rounds: when s + c lands
    exactly on an f32 rounding midpoint, the decisive low-order term is
    absorbed before it can break the tie — and such midpoints are COMMON in
    this codec (sums of two f32 stores), with the tie broken by terms at
    ~2^-53 relative (e.g. the eps-size twiddle products of fft.js stage 2).

    So: renormalize exactly to (u, z, t2) with value == u + z + t2,
    |z| <= ulp(u)/2, |t2| <= ulp(z)/2, then round with explicit tie
    handling.  u + z is a tie iff 2z is exactly the f32 gap at u (testable:
    u + 2z representable); in that case nudge z by one ulp toward t2's
    sign — too small to cross any other boundary, large enough to steer
    round-to-nearest off the even-tie.  Residual unhandled window ~2^-70,
    far below the reference's own f64 rounding noise (~2^-53)."""
    s, c, cc = acc
    c, cc = two_sum(c, cc)
    e0, t1 = two_sum(s, c)
    z, t2 = two_sum(t1, cc)
    u, z2 = two_sum(e0, z)
    z, t2 = two_sum(z2, t2)
    b = u + 2.0 * z
    is_tie = ((b - u) == 2.0 * z) & (z != 0.0) & (t2 != 0.0)
    same = (t2 > 0) == (z > 0)
    z_fix = jnp.where(is_tie, z * jnp.where(same, _TIE_UP, _TIE_DN), z)
    return u + z_fix


# ---------------------------------------------------------------------------
# Host-side constant preparation
# ---------------------------------------------------------------------------
def split3_const(c: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Exact 3-way f32 decomposition of f64 values: c == c0 + c1 + c2.

    c0 = RN32(c), c1 = RN32(c - c0), c2 = RN32(residue); exact because a
    53-bit mantissa fits in 24 + 24 + 5 (all values in f32 exponent range).
    """
    c = np.asarray(c, np.float64)
    c0 = c.astype(np.float32)
    c1 = (c - c0).astype(np.float32)
    c2 = (c - c0 - c1.astype(np.float64)).astype(np.float32)
    assert (c0.astype(np.float64) + c1 + c2.astype(np.float64) == c).all(), "triple split not exact"
    return c0, c1, c2


def dekker_split_const(c: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Host split of f32 constants (same mantissa-mask arithmetic as split())."""
    c = np.asarray(c, np.float32)
    hi = (c.view(np.int32) & np.int32(-4096)).view(np.float32)
    return hi, (c - hi).astype(np.float32)


class ConstTriple:
    """An f64 constant array packed for exact device products.

    Holds the exact triple (c0, c1, c2) and Dekker splits of c0/c1 so a
    device product x * c costs two presplit TwoProds + one plain product
    (relative error of the dropped part ~2^-72)."""

    def __init__(self, values_f64: np.ndarray):
        # components stay host numpy: instances are lru_cached across jit
        # traces, and trace-created jnp constants must not leak between them
        self.c0, self.c1, self.c2 = split3_const(values_f64)
        self.c0h, self.c0l = dekker_split_const(self.c0)
        self.c1h, self.c1l = dekker_split_const(self.c1)
        self.c2h, self.c2l = dekker_split_const(self.c2)

    _COMPONENTS = ("c0", "c1", "c2", "c0h", "c0l", "c1h", "c1l", "c2h", "c2l")

    def index(self, idx: np.ndarray) -> "ConstTriple":
        """Static reindexing (host-time) of all components."""
        out = object.__new__(ConstTriple)
        for name in self._COMPONENTS:
            setattr(out, name, np.asarray(getattr(self, name))[idx])
        return out

    def reshape(self, shape) -> "ConstTriple":
        """Static reshape (host-time) of all components, for broadcasting
        against data whose layout keeps the batch axis minor."""
        out = object.__new__(ConstTriple)
        for name in self._COMPONENTS:
            setattr(out, name, np.asarray(getattr(self, name)).reshape(shape))
        return out


def acc3_add_mul_const(acc, x, xh, xl, ct: ConstTriple, negate: bool = False):
    """acc += x * ct (exact to ~2^-72): x is f32 with precomputed split.

    The c2 tail also goes through an exact TwoProd — NOT a plain ``x*c2`` —
    so no inexact float product ever feeds an add (FMA-contraction rule,
    see split())."""
    if negate:
        x, xh, xl = -x, -xh, -xl
    p0, e0 = two_prod_presplit(x, xh, xl, ct.c0, ct.c0h, ct.c0l)
    p1, e1 = two_prod_presplit(x, xh, xl, ct.c1, ct.c1h, ct.c1l)
    p2, e2 = two_prod_presplit(x, xh, xl, ct.c2, ct.c2h, ct.c2l)
    acc = acc3_add(acc, p0, e0)
    acc = acc3_add(acc, p1, e1)
    return acc3_add(acc, p2, e2)


def mul_const_f32(x, ct: ConstTriple):
    """RN32(x * c) for f32 x and f64 constant c — one full product+store."""
    xh, xl = split(x)
    acc = acc3_add_mul_const(acc3_zero(x.shape), x, xh, xl, ct)
    return acc3_to_f32(acc)


# ---------------------------------------------------------------------------
# RN64: round an exact f32 expansion to the f64 grid (53-bit significand)
# ---------------------------------------------------------------------------
# Needed where the reference's f64 rounding is itself decisive: at near-dyadic
# FFT twiddle columns (fft.js stage-2-style w = (eps, -1)), butterfly outputs
# land exactly on f32-store midpoints and the JS's RN64 quantization of the
# tiny tie-breaking term decides the stored bit.  Computing "more exactly
# than f64" gives a DIFFERENT answer there, so those chains must reproduce
# RN64 itself.  The value is returned as a list of exact f32 terms whose sum
# is the f64-rounded value.

def _vec_sum(terms):
    """One error-free distillation sweep: same exact sum, more ordered."""
    s = terms[0]
    out = []
    for t in terms[1:]:
        s, e = two_sum(s, t)
        out.append(e)
    return [s] + out


def _distill_pass(ts):
    """One distillation sweep (smallest-first) over a term list.

    A sweep leaves [big, residues...]; feeding residues first lets them
    merge with each other before meeting the big term.  Fully unrolled:
    with rn64 call sites batched (see exact_decode._hazard_butterfly) the
    instance count is small, and on the TPU each lax.scan/while carried
    ~0.1-0.8 ms fixed overhead - hundreds of them made the decoder
    loop-bound (measured 48 ms/step of which <~10 ms was arithmetic)."""
    rev = ts[::-1]
    s = rev[0]
    out = []
    for t in rev[1:]:
        s, e = two_sum(t, s)
        out.append(e)
    return [s] + out[::-1]


def _unroll_sweeps() -> bool:
    """Unrolled sweeps on accelerators, lax loops on CPU.

    Both forms run the identical two_sum sequence (two_sum is exact, so the
    values are bit-identical); they differ only in emitted-code shape.  On
    TPU every while loop carries ~0.1-0.8 ms fixed overhead and the decoder
    has hundreds of sweeps (unrolled: 44 ms/4096-frame step vs 73 ms), while
    on XLA:CPU the unrolled form blows compile time up ~20x (139 s vs 7 s
    for one small FFT).  Decided at trace time from the default backend."""
    import jax

    return jax.default_backend() != "cpu"


def _scan_sweep(x, bubble: bool):
    """One sweep over the leading (term) axis of a stacked expansion."""

    def body(carry, t):
        s, e = two_sum(t, carry)
        return s, e

    s, es = lax.scan(body, x[-1], x[:-1], reverse=True)
    tail = es if bubble else jnp.flip(es, axis=0)
    return jnp.concatenate([s[None], tail], axis=0)


def _distill(ts, passes=4):
    """Error-free compaction toward a nonoverlapping expansion (term list)."""
    if _unroll_sweeps():
        for _ in range(passes):
            ts = _distill_pass(ts)
        return ts
    x = jnp.stack(jnp.broadcast_arrays(*ts), axis=0)
    x = lax.fori_loop(0, passes, lambda _, v: _scan_sweep(v, False), x)
    return [x[i] for i in range(x.shape[0])]


def _compress(ts, k):
    """Exact compaction of an expansion (term list) into its top-k slots.

    len(ts) bottom-up adjacent-pair sweeps: each moves every stranded
    low-order residue (and interleaved zero) at least one slot up, so the
    value packs into nonoverlapping leading slots and ts[k:] are exact
    zeros whenever the value fits in k components (RN64 results need 3)."""
    ts = list(ts)
    n = len(ts)
    if _unroll_sweeps():
        for _ in range(n):
            for i in range(n - 1, 0, -1):
                ts[i - 1], ts[i] = two_sum(ts[i - 1], ts[i])
        return ts[:k]
    x = jnp.stack(jnp.broadcast_arrays(*ts), axis=0)
    x = lax.fori_loop(0, n, lambda _, v: _scan_sweep(v, True), x)
    return [x[i] for i in range(k)]


def _round_half_even(x):
    return lax.round(x, lax.RoundingMethod.TO_NEAREST_EVEN)


def _parity(n):
    """n mod 2 for integer-valued f32 (f32 integers >= 2^24 are even)."""
    small = jnp.abs(n) < 16777216.0
    half = jnp.where(small, n, 0.0) * 0.5
    return jnp.where(small, jnp.abs(half - _round_half_even(half)) * 2.0, 0.0)


def rn64(terms):
    """Exact-expansion -> f64-rounded value, as a list of 3 exact f32 terms.

    Input: a list of exact f32 terms, or a TERM-MAJOR [T, ...] array.
    Output: 4 exact f32 components (term-major), sum == the f64 value.
    Emulates IEEE round-to-nearest-even at 53 bits by integerizing the value
    in grid units g = 2^(exp - 52) (all scalings by g are exact power-of-two
    multiplies).  Corner handling:
      * |v| < 2^-63: passed through unrounded — such values only arise here
        from cancellation, which strips significant bits, so they are already
        f64-exact; and their grid would leave the f32 exponent range.
      * leading-term exponent overestimates v's by 1 in a ~2^-52-relative
        window below binade boundaries (grid twice too coarse there); the
        resulting deviation window is far below every downstream store's
        sensitivity.
    """
    if isinstance(terms, (list, tuple)):
        ts = list(jnp.broadcast_arrays(*terms))
    else:
        ts = [terms[i] for i in range(terms.shape[0])]
    ts = _distill(ts, passes=3)            # ts[0] dominant
    e0 = ts[0]
    bits = lax.bitcast_convert_type(e0, jnp.int32)
    exp_bits = jnp.bitwise_and(bits, jnp.int32(0x7F800000))
    # g = 2^(e-52), 1/g = 2^(52-e); passthrough if e_biased < 64 (|v| < 2^-63)
    ok = exp_bits >= (64 << 23)
    safe_exp = jnp.where(ok, exp_bits, jnp.int32(127 << 23))
    g = lax.bitcast_convert_type(safe_exp - (52 << 23), jnp.float32)
    inv_g = lax.bitcast_convert_type((254 << 23) - (safe_exp - (52 << 23)), jnp.float32)

    # integerize the head; everything below ts[3] is pure fraction material
    ns, fracs = [], []
    for t in ts[:4]:
        y = t * inv_g                      # exact power-of-two scaling
        r = _round_half_even(y)
        ns.append(r)
        fracs.append(y - r)                # exact, |.| <= 0.5
    for t in ts[4:]:
        fracs.append(t * inv_g)
    # two more carry-extraction rounds: |sum(fracs)| can reach ~T/2, and the
    # extraction must be error-free down to the tie bit
    for _ in range(2):
        fracs = _distill(fracs, passes=2)
        r = _round_half_even(fracs[0])
        ns.append(r)
        fracs[0] = fracs[0] - r            # exact
    f = _distill(fracs, passes=2)
    f_hi = f[0]
    rest = f[1]
    for t in f[2:]:
        rest = rest + t                    # sign carrier only (nonoverlapping)
    parity = _parity(ns[0])
    for n_ in ns[1:]:
        parity = jnp.abs(parity - _parity(n_))
    up = (f_hi == 0.5) & ((rest > 0) | ((rest == 0) & (parity == 1.0)))
    dn = (f_hi == -0.5) & ((rest < 0) | ((rest == 0) & (parity == 1.0)))
    adj = jnp.where((f_hi > 0.5) | up, 1.0, jnp.where((f_hi < -0.5) | dn, -1.0, 0.0))
    ns.append(adj.astype(jnp.float32))

    # recompose: each n_i is an integer-valued f32 (<=24-bit mantissa), so
    # n_i * g is an exact power-of-two rescale.  A 53-bit value packs into
    # 3 f32s once fully compressed; 4 kept slots leave headroom (validated
    # against math.fsum in tests/test_df.py).  The |v| < 2^-63 passthrough
    # is selected per-element at the end so its zeros never lengthen the
    # compression.
    comp = _compress([n_ * g for n_ in ns], 4)
    pas = (ts[:4] + [e0 * 0.0] * 4)[:4]
    return [jnp.where(ok, a, b) for a, b in zip(comp, pas)]
