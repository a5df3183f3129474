"""Error-free f32 expansion arithmetic: exactness pinned per backend.

These tests are the foundation of the bit-exact decode contract: if any of
them fails on a backend, every exactness claim of ops/exact_decode is void
there.  They are cheap and adversarial:

  * EFT identities (TwoSum / mask-split TwoProd) verified exactly in f64.
  * The compiled-context regression that caught XLA:CPU's FMA contraction
    (AVX2+ instruction selection fuses mul+add in strict IR, silently
    corrupting Veltkamp-style splits; conftest pins --xla_cpu_max_isa=SSE4_2
    and ops/df.py uses a mantissa-mask split with no float multiply).
  * rn64 (f64 round-to-nearest-even emulation) against math.fsum, including
    constructed exact-tie cases.
"""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from carta1_tpu.ops.df import (
    acc3_add,
    acc3_to_f32,
    acc3_zero,
    rn64,
    split,
    two_prod,
    two_sum,
)

rng = np.random.default_rng(20240817)
N = 100_000


def _wide(n, lo=-20, hi=20):
    return (rng.standard_normal(n) * np.exp2(rng.integers(lo, hi, n))).astype(np.float32)


def test_two_sum_exact_compiled():
    a, b = _wide(N), _wide(N)
    s, e = jax.jit(two_sum)(jnp.asarray(a), jnp.asarray(b))
    lhs = np.asarray(s).astype(np.float64) + np.asarray(e).astype(np.float64)
    assert (lhs == a.astype(np.float64) + b.astype(np.float64)).all()


def test_two_prod_exact_compiled():
    a, b = _wide(N), _wide(N)
    p, e = jax.jit(two_prod)(jnp.asarray(a), jnp.asarray(b))
    lhs = np.asarray(p).astype(np.float64) + np.asarray(e).astype(np.float64)
    assert (lhs == a.astype(np.float64) * b.astype(np.float64)).all()


def test_split_is_exact_and_narrow():
    a = _wide(N)
    hi, lo = jax.jit(split)(jnp.asarray(a))
    hi, lo = np.asarray(hi), np.asarray(lo)
    assert (hi + lo == a).all()
    # products of split halves must be exact in f32: <=12-bit mantissas
    m = np.abs(hi[hi != 0]).view(np.int32) & 0xFFF
    assert (m == 0).all(), "split hi keeps low mantissa bits"


def test_eft_survives_compilation():
    """Pinned repro of the XLA:CPU miscompile class: a TwoProd feeding a
    Newton-division residual inside a larger jit.  With Veltkamp splits and
    AVX2+ FMA contraction this silently returned 3x the true residual
    depending on which intermediates were program outputs."""

    def chain(v, d):
        q0 = v / d
        ph, pe = two_prod(q0, d)
        acc = acc3_add(acc3_add(acc3_add(acc3_zero(v.shape), v), -ph), -pe)
        q1 = acc3_to_f32(acc) / d
        ph2, pe2 = two_prod(q1, d)
        acc = acc3_add(acc3_add(acc, -ph2), -pe2)
        q2 = acc3_to_f32(acc) / d
        out = acc3_to_f32(acc3_add(acc3_add(acc3_zero(v.shape), q0), q1, q2))
        return q1, q2, out

    v = (rng.integers(-32767, 32768, N) * np.exp2(rng.integers(-8, 8, N))).astype(np.float32)
    d = np.exp2(rng.integers(0, 15, N)).astype(np.float32) * 2 - 1  # 1,3,...  odd-ish
    _, _, out = jax.jit(chain)(jnp.asarray(v), jnp.asarray(d))
    ref = np.array(
        [np.float32(vv / dd) for vv, dd in zip(v.astype(np.float64)[:2000], d.astype(np.float64)[:2000])]
    )
    assert np.array_equal(np.asarray(out)[:2000], ref)


@pytest.mark.parametrize("case", ["wide", "tie", "tie_tiny", "products"])
def test_rn64_matches_fsum(case):
    n = 20_000
    if case == "wide":
        cols = [_wide(n), _wide(n), _wide(n, -45, -20), _wide(n, -70, -45)]
    elif case == "tie":
        x = _wide(n, -5, 5)
        e = np.frexp(x)[1].astype(np.int32)
        cols = [x, (np.exp2(e - 54) * np.sign(x)).astype(np.float32)]
    elif case == "tie_tiny":
        x = _wide(n, -5, 5)
        e = np.frexp(x)[1].astype(np.int32)
        cols = [x, (np.exp2(e - 54) * np.sign(x)).astype(np.float32),
                (rng.standard_normal(n) * np.exp2(-80)).astype(np.float32)]
    else:
        cols = []
        for _ in range(3):
            u, w = _wide(n, -10, 10), _wide(n, -30, 0)
            p = np.float32(u * w)
            cols += [p, np.float32(u.astype(np.float64) * w - p.astype(np.float64))]

    outs = jax.jit(lambda *ts: tuple(rn64(list(ts))))(*[jnp.asarray(c) for c in cols])
    outs = [np.asarray(o) for o in outs]
    for i in range(0, n, max(1, n // 5000)):
        ref = math.fsum([float(c[i]) for c in cols])
        got = math.fsum([float(o[i]) for o in outs])
        assert got == ref, (i, [float(c[i]) for c in cols], got, ref)
