"""Vectorized greedy rate-distortion bit allocation.

Exact reformulation of the reference's max-heap greedy
(codec/coding/bitallocation.js:78-164):

Per BFU the step priorities sf^bias * (2^-b1 - 2^-b2)/db are strictly
decreasing in word length, so the heap's pop order equals a single global
descending-priority sweep over all 52x15 candidate steps.  The heap's
"abandon on overflow" rule (a BFU whose next step doesn't fit is popped and
never revisited while cheaper steps of other BFUs continue) becomes a
masked-cumulative-sum fixpoint: find the first over-budget candidate in
sorted order, kill that BFU's remaining candidates, repeat.  Each round
abandons at least one BFU, so it converges in <= 52 rounds (typically 1-3);
all rounds are O(F * 780) vector work batched over frames.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

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
    cand_bfu = jnp.asarray(RDO_CAND_BFU)        # [780]
    cand_wl = jnp.asarray(RDO_CAND_WL)
    cand_cost = jnp.asarray(RDO_CAND_COST)

    sf = jnp.asarray(C.SCALE_FACTORS.astype("float32"))[sf_idx]     # [F, 52]
    sf_eff = jnp.power(sf, jnp.float32(allocation_bias))
    prio = sf_eff[:, cand_bfu] * jnp.asarray(RDO_STEP_GAIN)[cand_wl]  # [F, 780]
    valid = (sf_idx[:, cand_bfu] > 0)

    # global descending-priority order; stable sort keeps (bfu, wl) order on
    # ties, which also guarantees a BFU's steps stay wl-sorted.
    order = jnp.argsort(-jnp.where(valid, prio, -jnp.inf), axis=1, stable=True)
    s_bfu = jnp.take_along_axis(cand_bfu[None].repeat(nframes, 0), order, axis=1)
    s_cost = jnp.take_along_axis(cand_cost[None].repeat(nframes, 0), order, axis=1)
    s_valid = jnp.take_along_axis(valid, order, axis=1)

    pos = jnp.arange(_NCAND)[None, :]

    def body(state):
        active, _ = state
        csum = jnp.cumsum(jnp.where(active, s_cost, 0), axis=1)
        over = active & (csum > RDO_BUDGET)
        any_over = jnp.any(over, axis=1)                     # [F]
        first = jnp.argmax(over, axis=1)                     # [F]
        bfu_first = jnp.take_along_axis(s_bfu, first[:, None], axis=1)  # [F,1]
        kill = (
            active
            & (s_bfu == bfu_first)
            & (pos >= first[:, None])
            & any_over[:, None]
        )
        return active & ~kill, jnp.any(any_over)

    def cond(state):
        return state[1]

    active0, flag0 = body((s_valid, jnp.bool_(True)))
    active, _ = jax.lax.while_loop(cond, lambda s: body(s), (active0, flag0))
    # final pass: recompute acceptance under the converged mask
    csum = jnp.cumsum(jnp.where(active, s_cost, 0), axis=1)
    accepted = active & (csum <= RDO_BUDGET)

    word_lengths = jnp.zeros((nframes, C.NUM_BFUS), jnp.int32)
    word_lengths = word_lengths.at[jnp.arange(nframes)[:, None], s_bfu].add(accepted.astype(jnp.int32))
    return word_lengths
