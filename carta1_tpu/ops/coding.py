"""Batched BFU grouping, quantization and dequantization (device).

Parity: codec/coding/quantization.js.

TPU design: dynamic gathers run ~100M elem/s on TPU v5e, so this layer uses
none.  Grouping and its inverse are matmuls against static 0/1 permutation
matrices (exact f32 copies, MXU speed); table lookups go through fused
one-hot contractions or exact closed forms (WORD_LENGTH_BITS[w] == w+1 for
w > 0); band-to-BFU index maps are static concat/broadcasts.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from carta1_tpu import constants as C
from carta1_tpu.ops.common import FP
from carta1_tpu.ops.tables import DEQUANT_STEP, QUANT_NORM

_SLOT_MASK = jnp.asarray(C.BFU_SLOT_MASK)              # [52, 20]
_NSLOT = C.NUM_BFUS * C.MAX_BFU_SIZE                   # 1040

_DEQUANT_FLAT = jnp.asarray(DEQUANT_STEP.reshape(-1))  # [1024] f32
_QUANT_NORM_FLAT = jnp.asarray(QUANT_NORM.reshape(-1))

# BFU band sizes: band0 = 20 BFUs, band1 = 16, band2 = 16 (BFU_BAND_BOUNDARIES)
_BFUS_PER_BAND = (20, 16, 16)
# coefficient positions per band: 128 + 128 + 256
_COEFFS_PER_BAND = (128, 128, 256)


def word_length_bits(wl: jnp.ndarray) -> jnp.ndarray:
    """WORD_LENGTH_BITS[wl] in closed form: 0, then wl+1 (constants.js:141)."""
    return jnp.where(wl > 0, wl + 1, 0)


def quant_range(wl: jnp.ndarray) -> jnp.ndarray:
    """(1 << (bits-1)) - 1, 0 at wl == 0 (quantization.js:43)."""
    bits = word_length_bits(wl)
    return jnp.where(bits > 0, (1 << jnp.maximum(bits - 1, 0)) - 1, 0)


def expand_band_to_bfu(per_band: jnp.ndarray) -> jnp.ndarray:
    """[F, 3] band values -> [F, 52] per-BFU values (static broadcast)."""
    return jnp.concatenate(
        [jnp.repeat(per_band[:, b:b + 1], n, axis=1) for b, n in enumerate(_BFUS_PER_BAND)],
        axis=1,
    )


def expand_band_to_coeff(per_band: jnp.ndarray) -> jnp.ndarray:
    """[F, 3] band values -> [F, 512] per-position values."""
    return jnp.concatenate(
        [jnp.repeat(per_band[:, b:b + 1], n, axis=1) for b, n in enumerate(_COEFFS_PER_BAND)],
        axis=1,
    )


def table_lookup(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Exact f32 table lookup via a fused one-hot contraction (no gather)."""
    oh = jax.nn.one_hot(idx, table.shape[0], dtype=jnp.float32)
    return jnp.einsum("...n,n->...", oh, table, precision=FP)


def _bfu_runs(mode: int) -> list[tuple[int, int]]:
    """Static (coeff_start, length) of each BFU's contiguous coefficient run.

    BFU_GATHER_IDX rows are contiguous ascending runs (quantization.js reads
    `coefficients[start + k]` consecutively); verified here at build time."""
    idx = C.BFU_GATHER_IDX[mode]  # [52, 20], -1 padding
    runs = []
    for bfu in range(C.NUM_BFUS):
        row = idx[bfu]
        valid = row[row >= 0]
        n = len(valid)
        assert n > 0 and (valid == valid[0] + np.arange(n)).all(), "non-contiguous BFU run"
        runs.append((int(valid[0]), n))
    return runs


def _group_one_mode(coeffs: jnp.ndarray, mode: int) -> jnp.ndarray:
    """[F, 512] -> [F, 1040] flat slots: pure static slice/concat (exact,
    zero FLOPs -- replaces a [512, 1040] permutation matmul)."""
    nframes = coeffs.shape[0]
    pieces = []
    for start, n in _bfu_runs(mode):
        pieces.append(coeffs[:, start : start + n])
        if n < C.MAX_BFU_SIZE:
            pieces.append(jnp.zeros((nframes, C.MAX_BFU_SIZE - n), coeffs.dtype))
    return jnp.concatenate(pieces, axis=1)


def _scatter_one_mode(vals: jnp.ndarray, mode: int) -> jnp.ndarray:
    """[F, 1040] flat slots -> [F, 512]: static inverse of _group_one_mode.

    BFU runs tile [0, 512) exactly (asserted); emitting them in ascending
    coefficient order is a concat of slot slices."""
    order = []
    for bfu, (start, n) in enumerate(_bfu_runs(mode)):
        order.append((start, bfu * C.MAX_BFU_SIZE, n))
    order.sort()
    pos = 0
    pieces = []
    for start, slot, n in order:
        assert start == pos, "BFU runs must tile the spectrum"
        pieces.append(vals[:, slot : slot + n])
        pos += n
    assert pos == C.SAMPLES_PER_FRAME
    return jnp.concatenate(pieces, axis=1)


def group_bfus(coeffs: jnp.ndarray, modes: jnp.ndarray) -> jnp.ndarray:
    """[F, 512] spectra -> [F, 52, 20] BFU slots (zero padding).

    quantization.js:106-149: slot positions depend on the owning band's
    block mode; out-of-band slots are zero-filled."""
    nframes = coeffs.shape[0]
    long_slots = _group_one_mode(coeffs, 0)              # [F, 1040]
    short_slots = _group_one_mode(coeffs, 1)
    bfu_mode = expand_band_to_bfu(modes) != 0            # [F, 52]
    slot_mode = jnp.repeat(bfu_mode, C.MAX_BFU_SIZE, axis=1)
    out = jnp.where(slot_mode, short_slots, long_slots)
    return out.reshape(nframes, C.NUM_BFUS, C.MAX_BFU_SIZE)


def scatter_bfus(values: jnp.ndarray, modes: jnp.ndarray, n_bfu: jnp.ndarray) -> jnp.ndarray:
    """[F, 52, 20] BFU slot values -> [F, 512] spectra (decoder.js:52-98).

    Inverse of group_bfus; BFUs at or beyond n_bfu contribute silence."""
    nframes = values.shape[0]
    active = jnp.arange(C.NUM_BFUS)[None, :] < n_bfu[:, None]
    vals = jnp.where(active[..., None], values, 0.0).reshape(nframes, _NSLOT)
    long_out = _scatter_one_mode(vals, 0)                # [F, 512]
    short_out = _scatter_one_mode(vals, 1)
    pos_mode = expand_band_to_coeff(modes) != 0          # [F, 512]
    return jnp.where(pos_mode, short_out, long_out)


def find_scale_factors(bfu_data: jnp.ndarray) -> jnp.ndarray:
    """[F, 52, 20] -> int32 [F, 52] (bitallocation.js:172-181)."""
    max_amp = jnp.max(jnp.where(_SLOT_MASK[None], jnp.abs(bfu_data), 0.0), axis=-1)
    idx = jnp.ceil(3.0 * (jnp.log2(jnp.maximum(max_amp, 1e-38)) + 21.0))
    idx = jnp.clip(idx, 0, 63).astype(jnp.int32)
    return jnp.where(max_amp > 0, idx, 0)


_SF_TABLE32 = jnp.asarray(C.SCALE_FACTORS.astype(np.float32))  # [64] f32


def quantize(bfu_data: jnp.ndarray, sf_idx: jnp.ndarray, word_len: jnp.ndarray) -> jnp.ndarray:
    """Midtread quantizer, round-half-away-from-zero then clamp
    (quantization.js:42-55).  [F,52,20] -> int32.

    norm = range/sf computed as one correctly-rounded f32 division of the
    f32 scale-factor table value (the reference divides in f64; both are
    within 1 ulp -- boundary-rare, inside the documented encode envelope)."""
    sf = table_lookup(_SF_TABLE32, sf_idx)                           # [F, 52]
    rng = quant_range(word_len)
    active = (rng > 0) & (sf_idx > 0)
    norm = jnp.where(active, rng.astype(jnp.float32) / jnp.where(sf > 0, sf, 1.0), 0.0)[..., None]
    x = bfu_data * norm
    y = jnp.trunc(x + jnp.where(x >= 0, 0.5, -0.5)).astype(jnp.int32)
    return jnp.clip(y, -rng[..., None], rng[..., None])


def dequantize(quantized: jnp.ndarray, sf_idx: jnp.ndarray, word_len: jnp.ndarray) -> jnp.ndarray:
    """int32 [F,52,20] -> f32 (quantization.js:65-78).

    step = sf/range as one f32 division (1-ulp class, see quantize)."""
    sf = table_lookup(_SF_TABLE32, sf_idx)
    rng = quant_range(word_len)
    active = (rng > 0) & (sf_idx > 0)
    step = jnp.where(active, sf / jnp.maximum(rng, 1).astype(jnp.float32), 0.0)[..., None]
    return quantized.astype(jnp.float32) * step
