"""Vectorized greedy rate-distortion bit allocation.

Exact reformulation of the reference's max-heap greedy
(codec/coding/bitallocation.js:78-164):

Per BFU the step priorities sf^bias * (2^-b1 - 2^-b2)/db are strictly
decreasing in word length, so the heap's pop order equals a single global
descending-priority sweep over all 52x15 candidate steps, with the heap's
"abandon on overflow" rule (a BFU whose next step doesn't fit is dropped and
never revisited while cheaper steps of other BFUs continue).

Implementation (TPU-tuned):
  * ONE stable sort orders the candidates; (bfu, cost, valid) ride along
    packed into a single int32 operand (bfu 6 bits | cost 12 | valid 1), so
    the bitonic network moves 2 arrays, not 4, and there are no post-sort
    gathers.
  * The sweep is ONE `lax.scan` over candidate positions, batched over all
    frames in lane-major [52, F] layout (frames on the 128-lane axis), with
    a [F] budget register and a [52, F] abandoned mask.
  * Accepted-step flags come back as the scan's stacked output and fold
    into word lengths with a one-hot contraction.

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

    key = jnp.where(valid, -prio, jnp.inf)
    packed = jnp.broadcast_to(
        (jnp.asarray(RDO_CAND_BFU) << 13) | (jnp.asarray(RDO_CAND_COST) << 1), (nframes, _NCAND)
    ) | valid.astype(jnp.int32)
    _, s_packed = jax.lax.sort((key, packed), dimension=-1, is_stable=True, num_keys=1)

    s_bfu = (s_packed >> 13) & 0x3F
    s_valid = (s_packed & 1) == 1
    s_cost = jnp.where(s_valid, (s_packed >> 1) & 0xFFF, 0)

    # lane-major sweep: frames ride the 128-lane axis
    bfu_iota = jnp.arange(C.NUM_BFUS, dtype=jnp.int32)[:, None]      # [52, 1]

    def step(carry, xs):
        remaining, abandoned = carry                 # [F], [52, F] bool
        bfu, cost, ok = xs                           # [F] each
        oh = bfu[None, :] == bfu_iota                # [52, F]
        is_abandoned = jnp.any(abandoned & oh, axis=0)
        can = ok & ~is_abandoned
        fits = can & (cost <= remaining)
        remaining = remaining - jnp.where(fits, cost, 0)
        abandoned = abandoned | (oh & (can & ~fits)[None, :])
        return (remaining, abandoned), fits

    # init derived from the input so it inherits collective varying axes
    # (shard_map requires carry in/out types to match)
    init = (
        jnp.full_like(sf_idx[:, 0], RDO_BUDGET),
        (sf_idx.T < 0),  # all-False [52, F]
    )
    xs = (s_bfu.T, s_cost.T, s_valid.T)              # [780, F]
    _, fits = lax.scan(step, init, xs, unroll=8)    # fits: [780, F]

    # fold accepted steps into per-BFU word lengths: one-hot contraction.
    # DEFAULT matmul precision is safe here (unlike the signal path): both
    # operands are 0/1 and the per-BFU sums are < 16, all exact in bf16.
    word_lengths = jnp.einsum(
        "if,ifb->fb",
        fits.astype(jnp.float32),
        jax.nn.one_hot(s_bfu.T, C.NUM_BFUS, dtype=jnp.float32),
    ).astype(jnp.int32)
    return word_lengths
