"""Vectorized greedy rate-distortion bit allocation.

Exact reformulation of the reference's max-heap greedy
(codec/coding/bitallocation.js:78-164):

Per BFU the step priorities sf^bias * (2^-b1 - 2^-b2)/db are strictly
decreasing in word length, so the heap's pop order equals a single global
descending-priority sweep over all 52x15 candidate steps, with the heap's
"abandon on overflow" rule (a BFU whose next step doesn't fit is dropped and
never revisited while cheaper steps of other BFUs continue).

Implementation (TPU-tuned):
  * ONE single-operand int32 sort orders the candidates.  The priority is a
    function of only (sf index in 0..63, step wl in 0..14) and the static
    allocation bias, so the full 64x15 f32 priority table -- computed at
    trace time with exactly the sweep spec's float32 semantics -- collapses
    to a 10-bit descending *rank*, which is packed above the payload:
    rank 10 bits | bfu 6 | cost 12 | valid 1.  Ascending non-stable sort of
    that one int32 reproduces the spec's stable descending-priority order
    bit-for-bit: equal f32 priorities share a rank, and the payload bits
    break the tie in (bfu, wl) order (for equal priorities the candidate
    with the smaller bfu always has the smaller candidate index).  The
    bitonic network moves ONE array with a trivial comparator, instead of a
    float key + payload + the hidden iota a stable sort adds.
  * The sweep is ONE `lax.scan` over candidate positions, batched over all
    frames on the 128-lane axis.  The entire per-frame state is bit-packed
    into eleven [F] int32 registers: the budget, a 52-bit abandoned mask in
    two registers, and 52 4-bit accepted-step counters nibble-packed into
    seven registers (a word length gains at most 15 steps, so a nibble never
    overflows).  The body is ~30 elementwise [F] ops -- an order of
    magnitude less vector work than a [52, F] mask formulation -- and the
    scan emits no stacked output, so no [780, F] intermediate ever touches
    HBM and the word lengths fall out of the final carry with 52 static
    shift/mask extractions instead of a one-hot contraction.

Spec (exactly matched): gold.coding.allocate_bits_sweep.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from carta1_tpu import constants as C
from carta1_tpu.ops.tables import (
    RDO_BUDGET,
    RDO_CAND_BFU,
    RDO_CAND_COST,
    RDO_STEP_BITS,
    RDO_STEP_GAIN,
)

_NCAND = C.NUM_BFUS * 15
_SLOT_MASK_B = jnp.asarray(C.BFU_SLOT_MASK)[None]  # [1, 52, 20] bool


def _sweep(s_bfu: jnp.ndarray, s_cost: jnp.ndarray, s_valid: jnp.ndarray, like: jnp.ndarray) -> jnp.ndarray:
    """Budgeted greedy sweep over pre-ordered candidates (see module doc).

    s_bfu/s_cost/s_valid: [F, 780] in descending-priority order.
    Returns word_lengths int32 [F, 52]."""
    iota2 = jnp.arange(2, dtype=jnp.int32)[:, None]                  # [2, 1]
    iota7 = jnp.arange(7, dtype=jnp.int32)[:, None]                  # [7, 1]
    one = jnp.int32(1)

    def step(carry, xs):
        remaining, ab, cnt = carry                   # [F], [2, F], [7, F]
        bfu, cost, ok = xs                           # [F] each
        hi = bfu >> 5                                # which abandoned register
        bit = jnp.left_shift(one, bfu & 31)
        cur = jnp.where(hi == 1, ab[1], ab[0])
        is_abandoned = (cur & bit) != 0
        can = ok & ~is_abandoned
        fits = can & (cost <= remaining)
        remaining = remaining - jnp.where(fits, cost, 0)
        abit = jnp.where(can & ~fits, bit, 0)
        ab = ab | jnp.where(iota2 == hi[None, :], abit[None, :], 0)
        inc = jnp.left_shift(fits.astype(jnp.int32), (bfu & 7) << 2)
        cnt = cnt + jnp.where(iota7 == (bfu >> 3)[None, :], inc[None, :], 0)
        return (remaining, ab, cnt), None

    # init derived from the input so it inherits collective varying axes
    # (shard_map requires carry in/out types to match)
    zero_col = jnp.zeros_like(like)
    init = (
        jnp.full_like(zero_col, RDO_BUDGET),
        jnp.stack([zero_col, zero_col]),                       # [2, F]
        jnp.stack([zero_col] * 7),                             # [7, F]
    )
    xs = (s_bfu.T, s_cost.T, s_valid.T)              # [780, F]
    (_, _, cnt), _ = lax.scan(step, init, xs, unroll=8)

    # unpack the nibble counters into per-BFU word lengths: 52 static
    # shift/mask extractions (fused by XLA), no gathers, no contraction.
    return jnp.stack(
        [(cnt[b >> 3] >> ((b & 7) << 2)) & 0xF for b in range(C.NUM_BFUS)],
        axis=1,
    )


def allocate_bits_rdo(bfu_data: jnp.ndarray, sf_idx: jnp.ndarray, allocation_bias: float) -> jnp.ndarray:
    """Measured-distortion greedy RDO — the default allocator; strictly a
    better-or-equal replacement for the reference heap (BASELINE: encode
    contract is PSNR >= reference, not bitstream equality).

    The reference prices every word-length step with the scale-factor proxy
    sf^bias * (2^-b1 - 2^-b2)/db (bitallocation.js:91-105), which ignores how
    energy is distributed inside a BFU.  This allocator instead quantizes the
    actual coefficients at every word length (16 elementwise passes), prices
    each step by the measured squared-error reduction per bit, takes the
    upper concave hull per BFU (so the greedy order is optimal for the
    measured curve and prerequisites sort first), and spends the same bit
    budget through the same abandon-on-overflow sweep.  Measured against the
    reference heap: +0.15 dB (sine) to +3.2 dB (chirp/transients) round-trip
    PSNR on the verify_tpu.py signal classes.

    bfu_data: f32 [F, 52, 20]; sf_idx: int32 [F, 52].
    Returns word_lengths int32 [F, 52] honoring used + 40 + 10*52 <= 1696.
    """
    import numpy as np

    nframes = sf_idx.shape[0]
    bias = float(allocation_bias)

    # one traced quantize/dequantize graph vmapped over the 16 word
    # lengths (was an unrolled 16x Python loop), with the scale-factor
    # one-hot lookup hoisted out of the vmapped body — together the
    # encode program's cold compile drops ~2x (it was dominated by this
    # error block; see PERF.md "Compile time r4").  The body replicates
    # ops/coding.quantize + dequantize op-for-op on the precomputed sf32.
    from carta1_tpu.ops.coding import _SF_TABLE32, quant_range, table_lookup

    sf32 = table_lookup(_SF_TABLE32, sf_idx)                     # [F, 52]
    sf_on = sf_idx > 0

    def _err_at(wl):
        wla = jnp.full_like(sf_idx, wl)
        rng = quant_range(wla)
        active = (rng > 0) & sf_on
        norm = jnp.where(active, rng.astype(jnp.float32) / jnp.where(sf32 > 0, sf32, 1.0), 0.0)[..., None]
        x = bfu_data * norm
        q = jnp.clip(
            jnp.trunc(x + jnp.where(x >= 0, 0.5, -0.5)).astype(jnp.int32),
            -rng[..., None], rng[..., None],
        )
        step = jnp.where(active, sf32 / jnp.maximum(rng, 1).astype(jnp.float32), 0.0)[..., None]
        d = jnp.where(_SLOT_MASK_B, bfu_data - q.astype(jnp.float32) * step, 0.0)
        return jnp.sum(d * d, axis=-1)                           # [F, 52]

    err = jnp.moveaxis(
        jax.vmap(_err_at)(jnp.arange(16, dtype=sf_idx.dtype)), 0, -1
    )                                                            # [F, 52, 16]
    if bias != 1.0:
        # reference --bias semantics carried over: weight loud BFUs
        sfv = jnp.einsum(
            "fbs,s->fb", jax.nn.one_hot(sf_idx, 64, dtype=jnp.float32),
            jnp.asarray((C.SCALE_FACTORS.astype(np.float32) ** np.float32(bias - 1.0)).astype(np.float32)),
            precision=jax.lax.Precision.HIGHEST,
        )
        err = err * sfv[..., None]

    # per-bit slopes of the error curve, then the upper concave hull
    # (backward running max, one cummax instead of 14 sequential updates)
    # so earlier steps always price >= later ones
    per_bit = jnp.asarray(1.0 / (RDO_STEP_BITS * C.SPECS_PER_BFU[:, None]).astype(np.float32))  # [52, 15]
    slopes = (err[..., :-1] - err[..., 1:]) * per_bit[None]      # [F, 52, 15]
    slopes = lax.cummax(slopes, axis=slopes.ndim - 1, reverse=True)
    prio = slopes.reshape(nframes, _NCAND)

    valid = jnp.repeat(sf_idx > 0, 15, axis=1) & (prio > 0)
    # non-negative f32 bit patterns sort like the floats; negate for a
    # descending sweep via one ascending stable sort (ties keep candidate
    # order, i.e. lower word lengths first within a BFU)
    key = jnp.where(valid, -lax.bitcast_convert_type(jnp.maximum(prio, 0.0), jnp.int32), jnp.int32(2**31 - 1))
    payload = jnp.broadcast_to(
        jnp.asarray((RDO_CAND_BFU << 13) | (RDO_CAND_COST << 1))[None, :] | valid.astype(jnp.int32),
        key.shape,
    )
    s_key, s_payload = lax.sort((key, payload), dimension=-1, is_stable=True, num_keys=1)
    s_bfu = (s_payload >> 13) & 0x3F
    s_valid = (s_payload & 1) == 1
    s_cost = jnp.where(s_valid, (s_payload >> 1) & 0xFFF, 0)
    return _sweep(s_bfu, s_cost, s_valid, sf_idx[:, 0])


def allocate_bits(sf_idx: jnp.ndarray, allocation_bias: float) -> jnp.ndarray:
    """sf_idx: int32 [F, 52] scale factor indices.

    Returns word_lengths int32 [F, 52] honoring the bit budget
    used + 40 + 10*52 <= 1696."""
    import numpy as np

    nframes = sf_idx.shape[0]
    bias = float(allocation_bias)

    # trace-time priority table, float32 semantics identical to the sweep
    # spec (gold.coding.allocate_bits_sweep): sf32^bias * gain32
    sf32 = C.SCALE_FACTORS.astype(np.float32)
    prio = ((sf32 ** np.float32(bias)).astype(np.float32)[:, None] * RDO_STEP_GAIN[None, :]).astype(np.float32)  # [64, 15]
    uniq = np.unique(prio)  # ascending, deduplicated
    rank_tbl = (len(uniq) - 1 - np.searchsorted(uniq, prio)).astype(np.float32)

    # per-candidate rank via one-hot contraction over the 64 sf values (no
    # gathers); HIGHEST keeps the integer ranks (< 1024 << 2^24) exact
    oh = jax.nn.one_hot(sf_idx, 64, dtype=jnp.float32)               # [F, 52, 64]
    ranks = jnp.einsum(
        "fbs,sk->fbk", oh, jnp.asarray(rank_tbl), precision=jax.lax.Precision.HIGHEST
    ).astype(jnp.int32).reshape(nframes, _NCAND)                     # [F, 780]

    payload = (RDO_CAND_BFU << 13) | (RDO_CAND_COST << 1) | 1        # [780] host
    key = (ranks << 19) | jnp.asarray(payload)[None, :]
    valid = jnp.repeat(sf_idx > 0, 15, axis=1)                       # [F, 780]
    key = jnp.where(valid, key, jnp.int32(0x7FFFFFFE))               # sentinel: valid bit 0
    s_key = lax.sort(key, dimension=-1, is_stable=False)

    s_bfu = (s_key >> 13) & 0x3F
    s_valid = (s_key & 1) == 1
    s_cost = jnp.where(s_valid, (s_key >> 1) & 0xFFF, 0)
    return _sweep(s_bfu, s_cost, s_valid, sf_idx[:, 0])
