"""Batched BFU grouping, quantization and dequantization (device).

Parity: codec/coding/quantization.js.  Grouping and its inverse are single
2-D `take_along_axis` gathers through the precomputed index maps in
constants.py (2-D form with 128-lane-aligned sources is XLA's fast gather
path); quantization uses flattened 1-D table lookups.
"""

from __future__ import annotations

import jax.numpy as jnp

from carta1_tpu import constants as C
from carta1_tpu.ops.tables import DEQUANT_STEP, QUANT_NORM, QUANT_RANGES

_BFU_BAND = jnp.asarray(C.BFU_BAND)                    # [52]
_GATHER = jnp.asarray(C.BFU_GATHER_IDX)                # [2, 52, 20]
_SCATTER = jnp.asarray(C.BFU_SCATTER_IDX)              # [2, 512]
_SLOT_MASK = jnp.asarray(C.BFU_SLOT_MASK)              # [52, 20]
_POS_BAND = jnp.minimum(jnp.arange(512) // 128, 2)     # [512]

_NSLOT = C.NUM_BFUS * C.MAX_BFU_SIZE                   # 1040
_NSLOT_PAD = 1152                                      # lane-aligned gather source

_DEQUANT_FLAT = jnp.asarray(DEQUANT_STEP.reshape(-1))  # [64*16]
_QUANT_NORM_FLAT = jnp.asarray(QUANT_NORM.reshape(-1))
_QUANT_RANGES = jnp.asarray(QUANT_RANGES.astype("int32"))  # [16]


def group_bfus(coeffs: jnp.ndarray, modes: jnp.ndarray) -> jnp.ndarray:
    """[F, 512] spectra -> [F, 52, 20] BFU slots (zero padding).

    quantization.js:106-149: slot positions depend on the owning band's
    block mode; out-of-band slots are zero-filled."""
    nframes = coeffs.shape[0]
    bfu_mode = (modes[:, _BFU_BAND] != 0).astype(jnp.int32)        # [F, 52]
    idx = _GATHER[bfu_mode, jnp.arange(C.NUM_BFUS)[None, :]]       # [F, 52, 20]
    valid = idx >= 0
    flat_idx = jnp.where(valid, idx, 0).reshape(nframes, _NSLOT)
    out = jnp.take_along_axis(coeffs, flat_idx, axis=1).reshape(idx.shape)
    return jnp.where(valid, out, 0.0)


def scatter_bfus(values: jnp.ndarray, modes: jnp.ndarray, n_bfu: jnp.ndarray) -> jnp.ndarray:
    """[F, 52, 20] BFU slot values -> [F, 512] spectra (decoder.js:52-98).

    Inverse of group_bfus via the precomputed position->slot map; BFUs at or
    beyond n_bfu contribute silence."""
    nframes = values.shape[0]
    active = jnp.arange(C.NUM_BFUS)[None, :] < n_bfu[:, None]
    vals = jnp.where(active[..., None], values, 0.0).reshape(nframes, _NSLOT)
    vals = jnp.pad(vals, ((0, 0), (0, _NSLOT_PAD - _NSLOT)))
    pos_mode = (modes[:, _POS_BAND] != 0).astype(jnp.int32)        # [F, 512]
    slot = _SCATTER[pos_mode, jnp.arange(512)[None, :]]            # [F, 512]
    valid = slot >= 0
    out = jnp.take_along_axis(vals, jnp.where(valid, slot, _NSLOT), axis=1)
    return jnp.where(valid, out, 0.0)


def find_scale_factors(bfu_data: jnp.ndarray) -> jnp.ndarray:
    """[F, 52, 20] -> int32 [F, 52] (bitallocation.js:172-181)."""
    max_amp = jnp.max(jnp.where(_SLOT_MASK[None], jnp.abs(bfu_data), 0.0), axis=-1)
    idx = jnp.ceil(3.0 * (jnp.log2(jnp.maximum(max_amp, 1e-38)) + 21.0))
    idx = jnp.clip(idx, 0, 63).astype(jnp.int32)
    return jnp.where(max_amp > 0, idx, 0)


def quantize(bfu_data: jnp.ndarray, sf_idx: jnp.ndarray, word_len: jnp.ndarray) -> jnp.ndarray:
    """Midtread quantizer, round-half-away-from-zero then clamp
    (quantization.js:42-55).  [F,52,20] -> int32."""
    norm = _QUANT_NORM_FLAT[sf_idx * 16 + word_len][..., None]     # [F,52,1]
    x = bfu_data * norm
    y = jnp.trunc(x + jnp.where(x >= 0, 0.5, -0.5)).astype(jnp.int32)
    rng = _QUANT_RANGES[word_len][..., None]
    return jnp.clip(y, -rng, rng)


def dequantize(quantized: jnp.ndarray, sf_idx: jnp.ndarray, word_len: jnp.ndarray) -> jnp.ndarray:
    """int32 [F,52,20] -> f32 (quantization.js:65-78)."""
    step = _DEQUANT_FLAT[sf_idx * 16 + word_len][..., None]
    return quantized.astype(jnp.float32) * step
