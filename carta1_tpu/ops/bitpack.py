"""In-graph batched sound-unit pack/unpack.

Pack side (encode) inverts the scatter: for each of the 1696 output bit
positions we binary-search which field covers it (fields are laid out in
nondecreasing start order: header, 52 word lengths, 52 scale factors, 1040
coefficient slots) and gather that field's bit -- gather-only, no scatter, so
it vectorizes cleanly on TPU.  Unpack side is plain gathers at closed-form
offsets.  Bit layout parity: codec/io/serialization.js:41-176 (MSB-first,
two's-complement coefficients).

The encoder always emits n_bfu == 52 (bitallocation.js:45), which makes the
word-length/scale-factor offsets static; only coefficient offsets are
data-dependent (a prefix sum of word-length bit widths).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from carta1_tpu import constants as C
from carta1_tpu.framedata import FrameData

_NF = C.NUM_BFUS
_NS = C.MAX_BFU_SIZE
_NFIELDS = 1 + _NF + _NF + _NF * _NS  # header + wl + sf + coeff slots
_WLB = jnp.asarray(C.WORD_LENGTH_BITS)
_SPECS = jnp.asarray(C.SPECS_PER_BFU)
_SLOT = jnp.asarray(C.BFU_SLOT_MASK)


def pack_frames(fd: FrameData) -> jnp.ndarray:
    """FrameData (n_bfu must be 52) -> uint8 [F, 212]."""
    nframes = fd.word_lengths.shape[0]

    wl = fd.word_lengths.astype(jnp.int32)
    sf = fd.scale_factors.astype(jnp.int32)
    q = fd.quantized.astype(jnp.int32)
    modes = fd.block_modes.astype(jnp.int32)

    bfu_idx = jnp.int32(7)  # BFU_AMOUNTS.index(52)
    header = (
        ((2 - modes[:, 0]) << 14)
        | ((2 - modes[:, 1]) << 12)
        | ((3 - modes[:, 2]) << 10)
        | (bfu_idx << 5)
    )

    widths_bfu = _WLB[wl]                                   # [F, 52]
    field_bits = widths_bfu * _SPECS[None, :]
    coeff_base = C.FRAME_HEADER_BITS + 10 * _NF
    coeff_off = coeff_base + jnp.cumsum(field_bits, axis=1) - field_bits

    # field tables, layout order: header, wl[52], sf[52], coeff[52*20]
    i = jnp.arange(_NF)
    wl_starts = (C.FRAME_HEADER_BITS + 4 * i)[None, :].repeat(nframes, 0)
    sf_starts = (C.FRAME_HEADER_BITS + 4 * _NF + 6 * i)[None, :].repeat(nframes, 0)
    slot_w = jnp.where(_SLOT[None], widths_bfu[:, :, None], 0)   # [F,52,20]
    k = jnp.arange(_NS)[None, None, :]
    slot_starts = coeff_off[:, :, None] + k * widths_bfu[:, :, None]
    # masked slots get zero width but keep a consistent nondecreasing start
    slot_starts = jnp.where(_SLOT[None], slot_starts, coeff_off[:, :, None] + field_bits[:, :, None])

    starts = jnp.concatenate(
        [jnp.zeros((nframes, 1), jnp.int32), wl_starts, sf_starts, slot_starts.reshape(nframes, -1)],
        axis=1,
    )  # [F, NFIELDS]
    widths = jnp.concatenate(
        [jnp.full((nframes, 1), 16, jnp.int32),
         jnp.full((nframes, _NF), 4, jnp.int32),
         jnp.full((nframes, _NF), 6, jnp.int32),
         slot_w.reshape(nframes, -1)],
        axis=1,
    )
    mask16 = (1 << jnp.maximum(widths_bfu, 1)) - 1
    coeff_vals = (q & mask16[:, :, None]).reshape(nframes, -1)
    values = jnp.concatenate([header[:, None], wl, sf, coeff_vals], axis=1)

    # for every output bit, find its covering field (last field with
    # start <= p; zero-width fields sort before the real one at equal starts)
    p = jnp.arange(C.FRAME_BITS)
    fi = jax.vmap(lambda s: jnp.searchsorted(s, p, side="right"))(starts) - 1  # [F, 1696]
    f_start = jnp.take_along_axis(starts, fi, axis=1)
    f_width = jnp.take_along_axis(widths, fi, axis=1)
    f_value = jnp.take_along_axis(values, fi, axis=1)
    rel = p[None, :] - f_start
    inside = rel < f_width
    bit = (f_value >> jnp.maximum(f_width - 1 - rel, 0)) & 1
    bits = jnp.where(inside, bit, 0).astype(jnp.uint8)

    weights = (1 << jnp.arange(7, -1, -1)).astype(jnp.uint8)
    return (bits.reshape(nframes, C.SOUND_UNIT_SIZE, 8) * weights).sum(axis=-1).astype(jnp.uint8)


def unpack_frames(units: jnp.ndarray) -> FrameData:
    """uint8 [F, 212] -> FrameData (honors all BFU_AMOUNTS values)."""
    nframes = units.shape[0]
    # bytes -> bits, MSB first; one guard column for out-of-range reads
    shifts = jnp.arange(7, -1, -1)
    bits = ((units[:, :, None].astype(jnp.int32) >> shifts) & 1).reshape(nframes, C.FRAME_BITS)
    bits = jnp.concatenate([bits, jnp.zeros((nframes, 1), jnp.int32)], axis=1)

    def get(offsets: jnp.ndarray, width: int) -> jnp.ndarray:
        jj = jnp.arange(width)
        pos = jnp.minimum(offsets[..., None] + jj, C.FRAME_BITS)
        vals = jnp.take_along_axis(bits, pos.reshape(nframes, -1), axis=1)
        vals = vals.reshape(nframes, offsets.shape[1], width)
        return (vals << (width - 1 - jj)).sum(axis=-1)

    header = (bits[:, :16] << jnp.arange(15, -1, -1)).sum(axis=-1)
    block_modes = jnp.stack(
        [2 - ((header >> 14) & 3), 2 - ((header >> 12) & 3), 3 - ((header >> 10) & 3)],
        axis=1,
    ).astype(jnp.int32)
    n_bfu = jnp.asarray(C.BFU_AMOUNTS)[(header >> 5) & 7].astype(jnp.int32)

    i = jnp.arange(_NF)[None, :]
    active = i < n_bfu[:, None]
    wl_off = C.FRAME_HEADER_BITS + 4 * i + jnp.zeros((nframes, 1), jnp.int32)
    word_lengths = jnp.where(active, get(wl_off, 4), 0).astype(jnp.int32)
    sf_off = C.FRAME_HEADER_BITS + 4 * n_bfu[:, None] + 6 * i
    scale_factors = jnp.where(active, get(sf_off, 6), 0).astype(jnp.int32)

    widths = jnp.where(active, _WLB[word_lengths], 0)
    field_bits = widths * _SPECS[None, :]
    coeff_base = C.FRAME_HEADER_BITS + 10 * n_bfu[:, None]
    coeff_off = coeff_base + jnp.cumsum(field_bits, axis=1) - field_bits

    k = jnp.arange(_NS)[None, None, :]
    slot_valid = _SLOT[None] & (widths[:, :, None] > 0)
    pos0 = coeff_off[:, :, None] + k * widths[:, :, None]
    jj = jnp.arange(16)[None, None, None, :]
    in_width = jj < widths[:, :, None, None]
    bitpos = jnp.where(in_width & slot_valid[..., None], pos0[..., None] + jj, C.FRAME_BITS)
    bitpos = jnp.clip(bitpos, 0, C.FRAME_BITS)
    g = jnp.take_along_axis(bits, bitpos.reshape(nframes, -1), axis=1).reshape(bitpos.shape)
    g = jnp.where(in_width & slot_valid[..., None], g, 0)
    shift = jnp.where(in_width, widths[:, :, None, None] - 1 - jj, 0)
    vals = (g << shift).sum(axis=-1)
    sign_bit = jnp.where(slot_valid, 1 << jnp.maximum(widths[:, :, None] - 1, 0), 0)
    vals = jnp.where((vals >= sign_bit) & (sign_bit > 0), vals - (sign_bit << 1), vals)
    quantized = jnp.where(slot_valid, vals, 0).astype(jnp.int32)

    return FrameData(
        n_bfu=n_bfu,
        block_modes=block_modes,
        scale_factors=scale_factors,
        word_lengths=word_lengths,
        quantized=quantized,
    )
