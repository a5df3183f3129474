"""Vectorized ATRAC1 sound-unit (de)serialization, NumPy host version.

Packs/unpacks batches of frames to/from 212-byte sound units in one shot.
Bit layout parity: codec/io/serialization.js:41-176 and bitstream.js (MSB
first within bytes; signed coefficients stored two's-complement in their
word-length width).

The same layout math drives the in-graph JAX kernels (ops/bitpack.py); this
module is the authoritative host implementation used for file IO and tests.
"""

from __future__ import annotations

import numpy as np

from carta1_tpu.constants import (
    BFU_AMOUNTS,
    FRAME_BITS,
    FRAME_HEADER_BITS,
    FRAME_SCALE_FACTOR_BITS,
    FRAME_WORD_LENGTH_BITS,
    MAX_BFU_SIZE,
    NUM_BFUS,
    SOUND_UNIT_SIZE,
    SPECS_PER_BFU,
    WORD_LENGTH_BITS,
)
from carta1_tpu.framedata import FrameData


def _field_layout(n_bfu: np.ndarray, word_lengths: np.ndarray):
    """Per-frame bit offsets of every field.

    n_bfu: int32 [F]; word_lengths: int32 [F, 52].
    Returns (wl_off [F,52], sf_off [F,52], coeff_off [F,52], widths [F,52],
    active [F,52]) where coeff_off is the bit offset of each BFU's first
    coefficient and widths its per-coefficient bit width (0 if inactive).
    """
    nf = n_bfu.shape[0]
    i = np.arange(NUM_BFUS)[None, :]
    active = i < n_bfu[:, None]
    wl_off = FRAME_HEADER_BITS + FRAME_WORD_LENGTH_BITS * i + np.zeros((nf, 1), np.int64)
    sf_off = FRAME_HEADER_BITS + FRAME_WORD_LENGTH_BITS * n_bfu[:, None] + FRAME_SCALE_FACTOR_BITS * i
    widths = np.where(active, WORD_LENGTH_BITS[word_lengths], 0).astype(np.int64)
    field_bits = widths * SPECS_PER_BFU[None, :]
    coeff_base = FRAME_HEADER_BITS + (FRAME_WORD_LENGTH_BITS + FRAME_SCALE_FACTOR_BITS) * n_bfu[:, None]
    coeff_off = coeff_base + np.cumsum(field_bits, axis=1) - field_bits
    return wl_off.astype(np.int64), sf_off.astype(np.int64), coeff_off, widths, active


def pack_frames(fd: FrameData) -> np.ndarray:
    """FrameData -> uint8 [F, 212] sound units."""
    fd = fd.to_numpy()
    nf = fd.num_frames
    bits = np.zeros((nf, FRAME_BITS + 1), np.uint8)  # last column = dump slot
    frame_ix = np.arange(nf)[:, None]

    bfu_idx = np.searchsorted(BFU_AMOUNTS, fd.n_bfu)
    header = (
        ((2 - fd.block_modes[:, 0]) << 14)
        | ((2 - fd.block_modes[:, 1]) << 12)
        | ((3 - fd.block_modes[:, 2]) << 10)
        | (bfu_idx << 5)
    ).astype(np.int64)
    j = np.arange(16)[None, :]
    bits[frame_ix, j] = ((header[:, None] >> (15 - j)) & 1).astype(np.uint8)

    wl_off, sf_off, coeff_off, widths, active = _field_layout(fd.n_bfu, fd.word_lengths)

    def put(values: np.ndarray, offsets: np.ndarray, width: int, mask: np.ndarray) -> None:
        jj = np.arange(width)[None, None, :]
        pos = offsets[..., None] + jj
        bit = ((values[..., None] >> (width - 1 - jj)) & 1).astype(np.uint8)
        # bits beyond the sound unit are dropped (bitstream.js:24 stops at
        # the buffer end) -- clip into the dump column
        pos = np.minimum(np.where(mask[..., None], pos, FRAME_BITS), FRAME_BITS)
        bits[np.arange(nf)[:, None, None], pos] = bit

    put(fd.word_lengths.astype(np.int64), wl_off, FRAME_WORD_LENGTH_BITS, active)
    put(fd.scale_factors.astype(np.int64), sf_off, FRAME_SCALE_FACTOR_BITS, active)

    # coefficients: [F, 52, 20] values at coeff_off + k*width, two's complement
    k = np.arange(MAX_BFU_SIZE)[None, None, :]
    slot_valid = (k < SPECS_PER_BFU[None, :, None]) & (widths[..., None] > 0)
    pos0 = coeff_off[..., None] + k * widths[..., None]          # [F,52,20]
    vals = fd.quantized.astype(np.int64) & ((1 << np.maximum(widths, 1))[..., None] - 1)
    jj = np.arange(16)[None, None, None, :]
    bitpos = pos0[..., None] + jj                                 # [F,52,20,16]
    valid = slot_valid[..., None] & (jj < widths[..., None, None])
    shift = widths[..., None, None] - 1 - jj
    bit = ((vals[..., None] >> np.maximum(shift, 0)) & 1).astype(np.uint8)
    bitpos = np.minimum(np.where(valid, bitpos, FRAME_BITS), FRAME_BITS)
    bits[np.arange(nf)[:, None, None, None], bitpos] = np.where(valid, bit, 0)

    payload = bits[:, :FRAME_BITS].reshape(nf, SOUND_UNIT_SIZE, 8)
    weights = (1 << np.arange(7, -1, -1)).astype(np.uint16)
    return (payload * weights).sum(axis=-1).astype(np.uint8)


def unpack_frames(units: np.ndarray) -> FrameData:
    """uint8 [F, 212] sound units -> FrameData.

    Honors every BFU_AMOUNTS value for foreign AEA files
    (serialization.js:111-176); fields beyond n_bfu are zero.
    """
    units = np.ascontiguousarray(units, dtype=np.uint8)
    nf = units.shape[0]
    bits = np.unpackbits(units, axis=1).astype(np.int64)  # [F, 1696], MSB first
    # guard column: out-of-range reads (corrupt frames) yield zero bits
    bits = np.concatenate([bits, np.zeros((nf, 1), np.int64)], axis=1)

    def get(offsets: np.ndarray, width: int) -> np.ndarray:
        """Read fixed-width fields: offsets [F, M] -> values [F, M]."""
        jj = np.arange(width)
        pos = np.minimum(offsets[..., None] + jj, FRAME_BITS).reshape(nf, -1)
        vals = np.take_along_axis(bits, pos, axis=-1).reshape(nf, offsets.shape[1], width)
        return (vals << (width - 1 - jj)).sum(axis=-1)

    header = (bits[:, :16] << np.arange(15, -1, -1)).sum(axis=-1)
    block_modes = np.stack(
        [
            2 - ((header >> 14) & 3),
            2 - ((header >> 12) & 3),
            3 - ((header >> 10) & 3),
        ],
        axis=1,
    ).astype(np.int32)
    n_bfu = BFU_AMOUNTS[(header >> 5) & 7].astype(np.int32)

    i = np.arange(NUM_BFUS)[None, :]
    active = i < n_bfu[:, None]
    wl_off = FRAME_HEADER_BITS + FRAME_WORD_LENGTH_BITS * i + np.zeros((nf, 1), np.int64)
    word_lengths = np.where(active, get(wl_off, FRAME_WORD_LENGTH_BITS), 0).astype(np.int32)

    sf_off = FRAME_HEADER_BITS + FRAME_WORD_LENGTH_BITS * n_bfu[:, None] + FRAME_SCALE_FACTOR_BITS * i
    scale_factors = np.where(active, get(sf_off, FRAME_SCALE_FACTOR_BITS), 0).astype(np.int32)

    _, _, coeff_off, widths, _ = _field_layout(n_bfu, word_lengths)
    k = np.arange(MAX_BFU_SIZE)[None, None, :]
    slot_valid = (k < SPECS_PER_BFU[None, :, None]) & (widths[..., None] > 0)
    pos0 = coeff_off[..., None] + k * widths[..., None]
    # JS reader semantics for malformed frames (bitstream.js:55): reading
    # stops at the buffer end, so a truncated field keeps only the bits it
    # actually read, un-shifted -- effective width = bits available.
    eff_w = np.clip(FRAME_BITS - pos0, 0, widths[..., None])
    jj = np.arange(16)[None, None, None, :]
    in_width = jj < eff_w[..., None]
    bitpos = np.where(in_width & slot_valid[..., None], pos0[..., None] + jj, FRAME_BITS)
    bitpos = np.clip(bitpos, 0, FRAME_BITS)
    gathered = np.take_along_axis(bits, bitpos.reshape(nf, -1), axis=-1).reshape(bitpos.shape)
    gathered = np.where(in_width & slot_valid[..., None], gathered, 0)
    shift = np.where(in_width, eff_w[..., None] - 1 - jj, 0)
    vals = (gathered << shift).sum(axis=-1)  # [F,52,20] unsigned
    sign_bit = np.where(slot_valid, 1 << np.maximum(widths[..., None] - 1, 0), 0)
    vals = np.where((vals >= sign_bit) & (sign_bit > 0), vals - (sign_bit << 1), vals)
    quantized = np.where(slot_valid, vals, 0).astype(np.int32)

    return FrameData(
        n_bfu=n_bfu,
        block_modes=block_modes,
        scale_factors=scale_factors,
        word_lengths=word_lengths,
        quantized=quantized,
    )


def pack_frames_fast(fd: FrameData) -> np.ndarray:
    """Host pack via the native C++ tier when available (bit-identical,
    ~500x faster), NumPy otherwise.  CARTA1_NO_NATIVE=1 forces NumPy."""
    import os

    if os.environ.get("CARTA1_NO_NATIVE") != "1":
        from carta1_tpu import native

        out = native.pack_frames(fd)
        if out is not None:
            return out
    return pack_frames(fd)


def unpack_frames_fast(units: np.ndarray) -> FrameData:
    """Host unpack via the native C++ tier when available."""
    import os

    if os.environ.get("CARTA1_NO_NATIVE") != "1":
        from carta1_tpu import native

        out = native.unpack_frames(units)
        if out is not None:
            return out
    return unpack_frames(units)
