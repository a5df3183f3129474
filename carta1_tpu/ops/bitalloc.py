"""Vectorized greedy rate-distortion bit allocation.

Exact reformulation of the reference's max-heap greedy
(codec/coding/bitallocation.js:78-164):

Per BFU the step priorities sf^bias * (2^-b1 - 2^-b2)/db are strictly
decreasing in word length, so the heap's pop order equals a single global
descending-priority sweep over all 52x15 candidate steps, with the heap's
"abandon on overflow" rule (a BFU whose next step doesn't fit is dropped and
never revisited while cheaper steps of other BFUs continue).

Implementation: argsort the 780 candidates by priority once, then run the
sweep as ONE `lax.scan` over candidate positions with a [F] budget register
and a [F, 52] abandoned mask, batched over all frames (each step is a few
ops on [F]/[F,52] vectors; unrolled to amortize loop overhead).  The
accepted-step flags come back as the scan's stacked output and fold into
word lengths with a one-hot einsum.  Exactly equivalent to processing the
sorted list sequentially per frame (spec: gold.coding.allocate_bits_sweep).
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
    RDO_CAND_WL,
    RDO_STEP_GAIN,
)

_NCAND = C.NUM_BFUS * 15


def allocate_bits(sf_idx: jnp.ndarray, allocation_bias: float) -> jnp.ndarray:
    """sf_idx: int32 [F, 52] scale factor indices.

    Returns word_lengths int32 [F, 52] honoring the bit budget
    used + 40 + 10*52 <= 1696."""
    nframes = sf_idx.shape[0]

    from carta1_tpu.ops.coding import table_lookup

    sf = table_lookup(jnp.asarray(C.SCALE_FACTORS.astype("float32")), sf_idx)  # [F, 52]
    sf_eff = jnp.power(sf, jnp.float32(allocation_bias))
    # candidate (bfu, wl) layout is a static repeat/tile -- no gathers
    prio = jnp.repeat(sf_eff, 15, axis=1) * jnp.tile(jnp.asarray(RDO_STEP_GAIN), C.NUM_BFUS)
    valid = jnp.repeat(sf_idx > 0, 15, axis=1)                       # [F, 780]

    # global descending-priority order; ONE stable multi-operand sort carries
    # (bfu, cost, valid) along with the key (take_along_axis gathers are the
    # slow path on TPU; lax.sort's bitonic network is not).  Stable sort
    # keeps (bfu, wl) order on ties, which also guarantees a BFU's steps
    # stay wl-sorted.
    key = jnp.where(valid, -prio, jnp.inf)
    bcast = lambda x: jnp.broadcast_to(x, (nframes, _NCAND))
    _, s_bfu, s_cost, s_valid = jax.lax.sort(
        (key, bcast(jnp.asarray(RDO_CAND_BFU)), bcast(jnp.asarray(RDO_CAND_COST)), valid),
        dimension=-1,
        is_stable=True,
        num_keys=1,
    )
    s_cost = jnp.where(s_valid, s_cost, 0)

    bfu_iota = jnp.arange(C.NUM_BFUS, dtype=jnp.int32)[None, :]     # [1, 52]

    def step(carry, xs):
        remaining, abandoned = carry                 # [F], [F, 52] bool
        bfu, cost, ok = xs                           # [F] each
        oh = bfu[:, None] == bfu_iota                # [F, 52]
        is_abandoned = jnp.any(abandoned & oh, axis=1)
        can = ok & ~is_abandoned
        fits = can & (cost <= remaining)
        remaining = remaining - jnp.where(fits, cost, 0)
        abandoned = abandoned | (oh & (can & ~fits)[:, None])
        return (remaining, abandoned), fits

    # derive the init from the input so it inherits the input's collective
    # varying axes (shard_map requires carry in/out types to match)
    init = (
        jnp.full_like(sf_idx[:, 0], RDO_BUDGET),
        sf_idx < 0,  # all-False [F, 52]
    )
    xs = (s_bfu.T, s_cost.T, s_valid.T)              # [780, F]
    _, fits = lax.scan(step, init, xs, unroll=16)    # fits: [780, F]

    # fold accepted steps into per-BFU word lengths: one-hot contraction
    word_lengths = jnp.einsum(
        "if,ifb->fb",
        fits.astype(jnp.float32),
        jax.nn.one_hot(s_bfu.T, C.NUM_BFUS, dtype=jnp.float32),
    ).astype(jnp.int32)
    return word_lengths
