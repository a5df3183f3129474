"""In-graph batched sound-unit pack/unpack, TPU-tuned.

Bit layout parity: codec/io/serialization.js:41-176 (MSB-first,
two's-complement coefficients).  The host oracle is io/bitstream_np.py.

Design notes (measured on TPU v5e, 4096..8192-frame batches):
  * The unit is viewed as 106 big-endian halfwords padded to 128; a field of
    width <= 16 at bit offset r in [0,16) of halfword h lives inside the
    32-bit window (half[h] << 16) | half[h+1], held exactly in uint32.
  * All dynamic window reads/writes are fused compare/select/accumulate
    reductions over a *statically bounded* anchor range (never a gather: any
    executed small-table gather poisons every later gather in the process,
    and unaligned gathers never hit XLA's fast path -- see PERF.md):
      - word lengths sit at static bit offsets 16+4i (serialization.js:57-61)
        -> free nibble extraction, no reduction at all;
      - scale factors start at the halfword-aligned offset 16+4*nBfu
        (nBfu is even, serialization.js:64-68) -> anchors in [6, 34);
      - coefficients start at >= 16+10*nBfu >= 216 bits and the unit is
        1696 bits -> anchors in [13, 107).
    The previous formulation reduced over all 128 anchors in two f32
    channels; the uint32 single-channel restricted-range reduction is the
    same exact arithmetic at ~2.5x less VPU work.
  * Pack: coefficient fields are carry-free within their anchored 32-bit
    window (fields never share a bit), so the per-anchor sum of aligned
    images is exact in uint32 and windows recombine with shifts; the
    header/wl/sf section has a fully static 536-bit layout (nBfu == 52, the
    encoder invariant, bitallocation.js:45) built with elementwise ops.
"""

from __future__ import annotations

import os as _os

import jax
import jax.numpy as jnp

from carta1_tpu import constants as C
from carta1_tpu.framedata import FrameData
from carta1_tpu.ops.coding import word_length_bits

_NF = C.NUM_BFUS
_NS = C.MAX_BFU_SIZE
_SPECS = jnp.asarray(C.SPECS_PER_BFU)
_SLOT = jnp.asarray(C.BFU_SLOT_MASK)

_COEFF_BASE = C.FRAME_HEADER_BITS + 10 * _NF  # 536 when n_bfu == 52
_STATIC_BYTES = _COEFF_BASE // 8              # 67: header+wl+sf bytes
_NHALF = C.SOUND_UNIT_SIZE // 2               # 106 halfwords per unit
_NHALF_PAD = 128                              # lane-aligned window array

# Anchor ranges (halfword index of a field's 32-bit window), statically
# bounded by the format: sf section starts at 16+4*nBfu with nBfu >= 20;
# coefficients at 16+10*nBfu; everything ends at FRAME_BITS.
_SF_J = (6, 34)
_COEFF_J = (13, _NHALF + 1)            # [13, 107): +1 for the straddle window
_PACK_J = (_COEFF_BASE // 16, _NHALF + 1)  # [33, 107): pack is nBfu=52 only

# Dynamic gathers inside the full transcode program fall off XLA's fast
# custom-call path (measured: 320k -> 26k frames/s), so the fused reduction
# is the default; CARTA1_UNPACK_GATHER=1 re-enables the gather formulation
# for experimentation, CARTA1_PALLAS_DEMUX=1 the VMEM-resident Pallas kernel
# (ops/bitpack_pallas.py; measured within noise of the XLA fusion).
_USE_GATHER_READ = _os.environ.get("CARTA1_UNPACK_GATHER") == "1"
_USE_PALLAS_DEMUX = _os.environ.get("CARTA1_PALLAS_DEMUX") == "1"


def _halfwords(units: jnp.ndarray) -> jnp.ndarray:
    """uint8 [F, 212] -> big-endian halfwords uint32 [F, 128] (zero padded)."""
    nframes = units.shape[0]
    b = jnp.zeros((nframes, 2 * _NHALF_PAD), jnp.uint32)
    b = b.at[:, : C.SOUND_UNIT_SIZE].set(units.astype(jnp.uint32))
    return (b[:, 0::2] << 8) | b[:, 1::2]


def _window_reduce(win32: jnp.ndarray, h: jnp.ndarray, j_lo: int, j_hi: int) -> jnp.ndarray:
    """win[f, m] = win32[f, h[f, m]] for h in [j_lo, j_hi), else 0.

    One fused compare/select/sum over the restricted anchor range; exactly
    one (or zero) terms are selected per output, so uint32 summation is an
    exact window read."""
    j = jnp.arange(j_lo, j_hi, dtype=jnp.int32)
    sel = h[:, :, None] == j[None, None, :]
    return jnp.where(sel, win32[:, None, j_lo:j_hi], jnp.uint32(0)).sum(
        axis=-1, dtype=jnp.uint32
    )


def _read_fields(
    win32: jnp.ndarray,
    half: jnp.ndarray,
    offsets: jnp.ndarray,
    widths: jnp.ndarray,
    j_range: tuple[int, int],
) -> jnp.ndarray:
    """Read one field per (frame, slot): offsets/widths int32 [F, M].

    Returns unsigned values [F, M].  Out-of-range offsets land outside the
    anchor range and read 0 (corrupt-frame tolerance)."""
    h = offsets >> 4
    r = (offsets & 15).astype(jnp.uint32)
    if _USE_GATHER_READ:
        hc = jnp.clip(h, 0, _NHALF_PAD - 2)
        hi = jnp.take_along_axis(half, hc, axis=1)
        lo = jnp.take_along_axis(half, hc + 1, axis=1)
        win = (hi << 16) | lo
    elif _USE_PALLAS_DEMUX and offsets.ndim == 2 and offsets.shape[-1] >= 128:
        from carta1_tpu.ops.bitpack_pallas import window_reduce_pallas

        win = window_reduce_pallas(win32, h, *j_range)
    else:
        win = _window_reduce(win32, h, *j_range)
    # JS reader semantics for malformed frames (bitstream.js:55): a field
    # truncated by the unit boundary keeps only the bits it read, un-shifted.
    eff_w = jnp.clip(C.FRAME_BITS - offsets, 0, widths).astype(jnp.uint32)
    shift = 32 - r - eff_w
    mask = jnp.where(eff_w > 0, (jnp.uint32(1) << eff_w) - 1, 0)
    return ((win >> shift) & mask).astype(jnp.int32)


def pack_frames(fd: FrameData) -> jnp.ndarray:
    """FrameData (n_bfu must be 52, the encoder invariant) -> uint8 [F, 212]."""
    wl = fd.word_lengths.astype(jnp.int32)
    sf = fd.scale_factors.astype(jnp.int32)
    q = fd.quantized.astype(jnp.int32)
    modes = fd.block_modes.astype(jnp.int32)
    nframes = wl.shape[0]

    header = (
        ((2 - modes[:, 0]) << 14)
        | ((2 - modes[:, 1]) << 12)
        | ((3 - modes[:, 2]) << 10)
        | (7 << 5)  # BFU_AMOUNTS.index(52)
    )

    widths_bfu = word_length_bits(wl)                           # [F, 52]
    slot_w = jnp.where(_SLOT[None], widths_bfu[:, :, None], 0)  # [F, 52, 20]
    flat_w = slot_w.reshape(nframes, _NF * _NS)
    csum = jnp.cumsum(flat_w, axis=1)
    coeff_starts = _COEFF_BASE + csum - flat_w                  # [F, 1040]

    # --- static section: header + word lengths + scale factors occupy a
    # fixed layout of exactly 536 bits = 67 bytes when n_bfu == 52; build
    # its bit image with pure elementwise/reshape ops (no scatter at all)
    jh = jnp.arange(16)
    header_bits = (header[:, None] >> (15 - jh)) & 1                     # [F,16]
    j4 = jnp.arange(4)
    wl_bits = ((wl[:, :, None] >> (3 - j4)) & 1).reshape(nframes, _NF * 4)
    j6 = jnp.arange(6)
    sf_bits = ((sf[:, :, None] >> (5 - j6)) & 1).reshape(nframes, _NF * 6)
    static_bits = jnp.concatenate([header_bits, wl_bits, sf_bits], axis=1)  # [F,536]
    weights = (1 << jnp.arange(7, -1, -1)).astype(jnp.int32)
    static_bytes = (static_bits.reshape(nframes, _STATIC_BYTES, 8) * weights).sum(-1)

    # --- coefficient section (data-dependent offsets): carry-free 32-bit
    # window images summed per anchor halfword (uint32-exact: fields within
    # one window never share a bit), restricted to the coefficient anchors
    coeff_vals = (q & ((1 << jnp.maximum(widths_bfu, 1)) - 1)[:, :, None]).reshape(nframes, -1)
    coeff_vals = jnp.where(flat_w > 0, coeff_vals, 0).astype(jnp.uint32)

    k = coeff_starts >> 4                     # anchor halfword, in [33, 106]
    r = (coeff_starts & 15).astype(jnp.uint32)
    # max(w, 1) keeps the discarded w == 0 lanes' shift < 32 (a 32-bit shift
    # on uint32 is undefined in XLA even when the result is masked out)
    aligned = jnp.where(
        flat_w > 0,
        coeff_vals << (32 - r - jnp.maximum(flat_w, 1).astype(jnp.uint32)),
        jnp.uint32(0),
    )

    j_lo, j_hi = _PACK_J
    j = jnp.arange(j_lo, j_hi, dtype=jnp.int32)
    sel = k[:, :, None] == j[None, None, :]
    s32 = jnp.where(sel, aligned[:, :, None], jnp.uint32(0)).sum(
        axis=1, dtype=jnp.uint32
    )  # [F, 74]; anchors beyond the unit fall outside the range and are
    # dropped (reference stops at the buffer end, bitstream.js:24)

    # window j covers halfwords (j, j+1); globally bit-disjoint fields make
    # the halfword recombination carry-free
    zero = jnp.zeros((nframes, 1), jnp.uint32)
    half_out = (s32 >> 16) | jnp.concatenate([zero, s32[:, :-1] & 0xFFFF], axis=1)
    coeff_bytes = jnp.stack([half_out >> 8, half_out & 0xFF], axis=-1).reshape(nframes, -1)
    # half_out[0] is halfword 33 whose top byte (66) belongs to the static
    # section (coefficients start at bit 536 = byte 67): drop it
    coeff_bytes = coeff_bytes[:, 1 : 1 + C.SOUND_UNIT_SIZE - _STATIC_BYTES].astype(jnp.int32)

    bytes_ = jnp.concatenate([static_bytes, coeff_bytes], axis=1)
    return bytes_.astype(jnp.uint8)


def unpack_frames(units: jnp.ndarray) -> FrameData:
    """uint8 [F, 212] -> FrameData (honors all BFU_AMOUNTS values)."""
    nframes = units.shape[0]
    half = _halfwords(units)                                        # [F, 128]
    shifted = jnp.concatenate(
        [half[:, 1:], jnp.zeros((nframes, 1), jnp.uint32)], axis=1
    )
    win32 = (half << 16) | shifted

    header = half[:, 0].astype(jnp.int32)
    block_modes = jnp.stack(
        [2 - ((header >> 14) & 3), 2 - ((header >> 12) & 3), 3 - ((header >> 10) & 3)],
        axis=1,
    ).astype(jnp.int32)
    bfu_amount_idx = (header >> 5) & 7
    # BFU_AMOUNTS closed form: [20, 28, 32, 36, 40, 44, 48, 52]
    n_bfu = jnp.where(bfu_amount_idx > 0, 4 * bfu_amount_idx + 24, 20).astype(jnp.int32)

    i = jnp.arange(_NF, dtype=jnp.int32)[None, :]
    active = i < n_bfu[:, None]

    # word lengths: static 4-bit fields at bits 16+4i = nibbles of
    # halfwords 1..13 (serialization.js:57-61) -- no dynamic read at all
    nib = jnp.arange(4, dtype=jnp.uint32)
    wl_all = ((half[:, 1 : 1 + _NF // 4, None] >> (12 - 4 * nib)) & 15).reshape(
        nframes, _NF
    ).astype(jnp.int32)
    word_lengths = jnp.where(active, wl_all, 0)

    sf_off = C.FRAME_HEADER_BITS + 4 * n_bfu[:, None] + 6 * i
    scale_factors = jnp.where(
        active,
        _read_fields(win32, half, sf_off, jnp.full((nframes, _NF), 6, jnp.int32), _SF_J),
        0,
    )

    widths = jnp.where(active, word_length_bits(word_lengths), 0)  # [F, 52]
    slot_w = jnp.where(_SLOT[None], widths[:, :, None], 0)         # [F, 52, 20]
    flat_w = slot_w.reshape(nframes, _NF * _NS)
    csum = jnp.cumsum(flat_w, axis=1)
    coeff_base = C.FRAME_HEADER_BITS + 10 * n_bfu[:, None]
    offsets = coeff_base + csum - flat_w

    vals = _read_fields(win32, half, offsets, flat_w, _COEFF_J)    # [F, 1040]
    sign_bit = jnp.where(flat_w > 0, 1 << jnp.maximum(flat_w - 1, 0), 0)
    vals = jnp.where(vals >= jnp.maximum(sign_bit, 1), vals - (sign_bit << 1), vals)
    quantized = jnp.where(flat_w > 0, vals, 0).reshape(nframes, _NF, _NS).astype(jnp.int32)

    return FrameData(
        n_bfu=n_bfu,
        block_modes=block_modes,
        scale_factors=scale_factors,
        word_lengths=word_lengths,
        quantized=quantized,
    )
