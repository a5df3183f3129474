"""Scale factors, quantization and the greedy RDO allocator, gold semantics.

Parity: codec/coding/bitallocation.js, codec/coding/quantization.js.
"""

from __future__ import annotations

import numpy as np

from carta1_tpu.constants import (
    BITS_PER_BFU_METADATA,
    FRAME_BITS,
    FRAME_OVERHEAD_BITS,
    INV_POWER_OF_TWO,
    MAX_WORD_LENGTH_INDEX,
    NUM_BFUS,
    SCALE_FACTORS,
    WORD_LENGTH_BITS,
)


def find_scale_factors(bfu_data: np.ndarray, slot_mask: np.ndarray) -> np.ndarray:
    """Per-BFU scale factor index (bitallocation.js:172-181).

    bfu_data: f32 [..., NUM_BFUS, MAX_BFU_SIZE]; slot_mask: bool broadcastable.
    Returns int32 [..., NUM_BFUS]; 0 where the BFU is all-zero.
    """
    mags = np.where(slot_mask, np.abs(bfu_data.astype(np.float64)), 0.0)
    max_amp = mags.max(axis=-1)
    with np.errstate(divide="ignore"):
        idx = np.ceil(3.0 * (np.log2(np.where(max_amp > 0, max_amp, 1.0)) + 21.0))
    idx = np.clip(idx, 0, 63).astype(np.int32)
    return np.where(max_amp == 0.0, np.int32(0), idx)


def quantize_js(coeffs: np.ndarray, sf_idx: np.ndarray, word_len: np.ndarray) -> np.ndarray:
    """Midtread quantizer with round-half-away-from-zero via truncation
    (quantization.js:34-56).

    coeffs: f32 [..., NUM_BFUS, MAX_BFU_SIZE]
    sf_idx, word_len: int32 [..., NUM_BFUS]
    Returns int32 quantized values (0 where bits==0 or sf_idx==0).
    """
    bits = WORD_LENGTH_BITS[word_len]  # [..., NUM_BFUS]
    active = (bits > 0) & (sf_idx > 0)
    sf = SCALE_FACTORS[sf_idx]
    rng = (1 << np.maximum(bits - 1, 0)).astype(np.float64) - 1.0
    norm = np.where(active, rng / np.where(sf > 0, sf, 1.0), 0.0)
    x = coeffs.astype(np.float64) * norm[..., None]
    y = np.trunc(x + np.where(x >= 0, 0.5, -0.5)).astype(np.int64)
    hi = rng.astype(np.int64)[..., None]
    y = np.clip(y, -hi, hi)
    return np.where(active[..., None], y, 0).astype(np.int32)


def dequantize_js(quantized: np.ndarray, sf_idx: np.ndarray, word_len: np.ndarray) -> np.ndarray:
    """Inverse quantizer (quantization.js:65-78): f64 compute, f32 store.

    Returns f32 [..., NUM_BFUS, MAX_BFU_SIZE].
    """
    bits = WORD_LENGTH_BITS[word_len]
    active = (bits > 0) & (sf_idx > 0)
    sf = SCALE_FACTORS[sf_idx]
    rng = (1 << np.maximum(bits - 1, 0)).astype(np.float64) - 1.0
    scale = np.where(active, sf, 0.0)
    out = quantized.astype(np.float64) * scale[..., None] / np.where(rng > 0, rng, 1.0)[..., None]
    return out.astype(np.float32)


def allocate_bits_frame(bfu_data: np.ndarray, bfu_sizes: np.ndarray, allocation_bias: float) -> tuple[np.ndarray, np.ndarray]:
    """Faithful single-frame greedy RDO with the reference's max-heap
    (bitallocation.js:44-164), including its tie-breaking and the
    abandon-on-overflow semantics.

    bfu_data: f32 [NUM_BFUS, MAX_BFU_SIZE]; bfu_sizes: int32 [NUM_BFUS].
    Returns (word_lengths int32 [NUM_BFUS], scale_factor_indices int32 [NUM_BFUS]).
    """
    wlb = WORD_LENGTH_BITS
    slot = np.arange(bfu_data.shape[-1])[None, :] < bfu_sizes[:, None]
    sf_table = find_scale_factors(bfu_data, slot)
    word_lengths = np.zeros(NUM_BFUS, dtype=np.int32)

    remaining = FRAME_BITS - FRAME_OVERHEAD_BITS - NUM_BFUS * BITS_PER_BFU_METADATA

    def priority(bfu: int, cur: int, nxt: int) -> float:
        sf = SCALE_FACTORS[sf_table[bfu]]
        eff = sf ** allocation_bias
        b1, b2 = int(wlb[cur]), int(wlb[nxt])
        f1 = 2.0 if b1 == 0 else INV_POWER_OF_TWO[b1]
        f2 = INV_POWER_OF_TWO[b2]
        return eff * (f1 - f2) / (b2 - b1)

    heap_idx: list[int] = []
    heap_pri: list[float] = []
    for bfu in range(NUM_BFUS):
        if bfu_sizes[bfu] == 0 or sf_table[bfu] == 0:
            continue
        heap_idx.append(bfu)
        heap_pri.append(priority(bfu, 0, 1))

    def sift_down(start: int) -> None:
        n = len(heap_idx)
        i = start
        iv, pv = heap_idx[i], heap_pri[i]
        while True:
            l = 2 * i + 1
            r = l + 1
            mi, mp = i, pv
            if l < n and heap_pri[l] > mp:
                mi, mp = l, heap_pri[l]
            if r < n and heap_pri[r] > mp:
                mi = r
            if mi == i:
                break
            heap_idx[i], heap_pri[i] = heap_idx[mi], heap_pri[mi]
            i = mi
        heap_idx[i], heap_pri[i] = iv, pv

    def pop_root() -> None:
        last = len(heap_idx) - 1
        heap_idx[0], heap_pri[0] = heap_idx[last], heap_pri[last]
        heap_idx.pop()
        heap_pri.pop()
        if heap_idx:
            sift_down(0)

    for i in range(len(heap_idx) // 2 - 1, -1, -1):
        sift_down(i)

    while remaining > 0 and heap_idx:
        bfu = heap_idx[0]
        cur = int(word_lengths[bfu])
        nxt = cur + 1
        delta = int(wlb[nxt] - wlb[cur])
        cost = delta * int(bfu_sizes[bfu])
        if cost > remaining or cost <= 0:
            pop_root()
            continue
        remaining -= cost
        word_lengths[bfu] = nxt
        if nxt < MAX_WORD_LENGTH_INDEX:
            delta2 = int(wlb[nxt + 1] - wlb[nxt])
            if delta2 > 0:
                heap_pri[0] = priority(bfu, nxt, nxt + 1)
                sift_down(0)
            else:
                pop_root()
        else:
            pop_root()

    return word_lengths, sf_table


def allocate_bits(bfu_data: np.ndarray, bfu_sizes: np.ndarray, allocation_bias: float) -> tuple[np.ndarray, np.ndarray]:
    """Batched wrapper: bfu_data [F, NUM_BFUS, MAX_BFU_SIZE]."""
    nframes = bfu_data.shape[0]
    wl = np.zeros((nframes, NUM_BFUS), dtype=np.int32)
    sf = np.zeros((nframes, NUM_BFUS), dtype=np.int32)
    for f in range(nframes):
        wl[f], sf[f] = allocate_bits_frame(bfu_data[f], bfu_sizes, allocation_bias)
    return wl, sf


def allocate_bits_sweep(sf_table: np.ndarray, bfu_sizes: np.ndarray, allocation_bias: float) -> np.ndarray:
    """Deterministic sorted-sweep formulation of the greedy RDO -- the spec
    the TPU allocator (ops/bitalloc.py) implements.

    Identical to the reference heap except on exact priority ties (the
    scale-factor grid makes P ratios powers of 2^(1/3), so ties are common):
    the heap breaks them in heap-array order, the sweep in (bfu, wl) order.
    Both spend the same budget at the same marginal distortion, so encode
    quality is unchanged.

    sf_table: int32 [F, 52] -> word_lengths int32 [F, 52].
    """
    nframes = sf_table.shape[0]
    wlb = WORD_LENGTH_BITS.astype(np.int64)
    budget = FRAME_BITS - FRAME_OVERHEAD_BITS - NUM_BFUS * BITS_PER_BFU_METADATA

    wl_steps = np.arange(15)
    gain = np.where(wlb[wl_steps] == 0, 2.0, INV_POWER_OF_TWO[wlb[wl_steps]])
    gain = (gain - INV_POWER_OF_TWO[wlb[wl_steps + 1]]) / (wlb[wl_steps + 1] - wlb[wl_steps])
    cand_bfu = np.repeat(np.arange(NUM_BFUS), 15)
    cand_wl = np.tile(wl_steps, NUM_BFUS)
    cand_cost = (wlb[cand_wl + 1] - wlb[cand_wl]) * bfu_sizes[cand_bfu]

    # f32 priorities, matching the device allocator bit-for-bit.  Many
    # priorities are mathematically equal (scale factors 3k indices apart are
    # exactly 2^k x); f64 table noise breaks those ties arbitrarily while f32
    # restores them, so the spec pins the device's precision.
    sf = (SCALE_FACTORS.astype(np.float32)[sf_table].astype(np.float32) ** np.float32(allocation_bias)).astype(np.float32)
    prio = (sf[:, cand_bfu] * gain.astype(np.float32)[cand_wl]).astype(np.float32)
    valid = (sf_table[:, cand_bfu] > 0) & (bfu_sizes[cand_bfu] > 0)

    out = np.zeros((nframes, NUM_BFUS), np.int32)
    for f in range(nframes):
        order = np.argsort(-np.where(valid[f], prio[f], -np.inf), kind="stable")
        remaining = budget
        abandoned = np.zeros(NUM_BFUS, bool)
        for c in order:
            if not valid[f, c]:
                continue
            bfu = cand_bfu[c]
            if abandoned[bfu]:
                continue
            cost = cand_cost[c]
            if cost > remaining:
                abandoned[bfu] = True
                continue
            remaining -= cost
            out[f, bfu] += 1
    return out
