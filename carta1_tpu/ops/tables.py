"""Device-resident tables for the TPU engine.

All tables are precomputed in float64 on the host (matching the reference's
table precision, codec/core/constants.js) and cast once to the device dtype.
The MDCT/IMDCT basis matrices come from the gold model's exact f64 operators
(gold/transforms.py) with the encoder/decoder windowing geometry *folded in*,
so the hot path is pure batched matmul on the MXU:

  encoder long  : coeffs = tail_prev @ ENC_LONG_OV[b] + band @ ENC_LONG_MAIN[b]
  encoder short : coeffs = ov_blocks @ ENC_SHORT_OV + blocks @ ENC_SHORT_MAIN
  decoder long  : inv_mid = band_coeffs @ DEC_LONG[b]
  decoder short : inv_mid = block_coeffs @ DEC_SHORT

Spectral reversal of mid/high bands (utils.js:42-48) is folded into the
basis matrices as a column/row flip.
"""

from __future__ import annotations

import functools

import numpy as np

from carta1_tpu import constants as C
from carta1_tpu.gold.transforms import imdct_basis, mdct_basis

_W_UP = C.WINDOW_SHORT          # f64 [32] ascending
_W_DOWN = C.WINDOW_SHORT[::-1]  # f64 [32] descending


def _f32(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float64).astype(np.float32)


@functools.lru_cache(maxsize=None)
def encoder_mdct_tables() -> dict[str, tuple]:
    """Window-folded forward-MDCT matrices.

    Long blocks (encoder.js:221-251): MDCT input of size `tsize` is
    [zeros(ws), W_up*tail_prev, band(with last 32 down-windowed), zeros] so
      coeffs = tail_prev @ OV + band @ MAIN
    with OV  = diag(W_up)  @ B[ws:ws+32]          [32, size]
         MAIN = diag(w_vec) @ B[ws+32:ws+32+size]  [size, size]
    where w_vec is 1 except W_down on the last 32 samples, and B is the f64
    basis of mdct256/mdct512.  Mid/high band spectra are reversed (column
    flip folded in).

    Short blocks (encoder.js:262-300): per 32-block,
      coeffs_b = ov_raw_b @ SOV + block_b @ SMAIN  (each [32, 32])
    with per-block spectral reversal folded in for mid/high.
    """
    out = {}
    for band in range(3):
        size = C.MDCT_BAND_SIZES[band]
        tsize = C.MDCT_TRANSFORM_SIZES[band]
        ws = C.MDCT_WINDOW_START[band]
        basis = mdct_basis(tsize)  # f64 [tsize, tsize/2]; tsize/2 == size
        ov = _W_UP[:, None] * basis[ws:ws + 32]
        w_vec = np.ones(size)
        w_vec[-32:] = _W_DOWN
        main = w_vec[:, None] * basis[ws + 32: ws + 32 + size]
        if band > 0:
            ov = ov[:, ::-1]
            main = main[:, ::-1]
        out[f"long_ov{band}"] = _f32(ov)
        out[f"long_main{band}"] = _f32(main)

    b64 = mdct_basis(64)  # [64, 32]
    sov = _W_UP[:, None] * b64[:32]
    smain = _W_DOWN[:, None] * b64[32:]
    out["short_ov"] = _f32(sov)
    out["short_main"] = _f32(smain)
    out["short_ov_rev"] = _f32(sov[:, ::-1])
    out["short_main_rev"] = _f32(smain[:, ::-1])
    return out


@functools.lru_cache(maxsize=None)
def decoder_imdct_tables() -> dict[str, np.ndarray]:
    """IMDCT matrices producing directly the middle half the decoder keeps
    (decoder.js:190-199: invBuf = inv[size/2 : size/2 + size] of a 2*size
    transform), with mid/high spectral reversal folded in as a row flip."""
    out = {}
    for band in range(3):
        size = C.MDCT_BAND_SIZES[band]
        basis = imdct_basis(2 * size)  # f64 [size, 2*size]
        mid = basis[:, size // 2: size // 2 + size]
        if band > 0:
            mid = mid[::-1]
        out[f"long{band}"] = _f32(mid)
    b64 = imdct_basis(64)  # [32, 64]
    out["short"] = _f32(b64[:, 16:48])
    out["short_rev"] = _f32(b64[::-1, 16:48])
    return out


# ---------------------------------------------------------------------------
# Quantization tables
# ---------------------------------------------------------------------------
def _quant_ranges() -> np.ndarray:
    bits = C.WORD_LENGTH_BITS.astype(np.int64)
    return np.where(bits > 0, (1 << np.maximum(bits - 1, 0)) - 1, 0)


QUANT_RANGES = _quant_ranges()  # [16] int

# dequant step f32[64, 16]: scale_factor / quant_range (0 where inactive)
DEQUANT_STEP = np.zeros((64, 16), np.float64)
_r = _quant_ranges()
for _wl in range(16):
    if _r[_wl] > 0:
        DEQUANT_STEP[:, _wl] = C.SCALE_FACTORS / _r[_wl]
DEQUANT_STEP[0, :] = 0.0  # sf index 0 -> silence (quantization.js:37,66)
DEQUANT_STEP = DEQUANT_STEP.astype(np.float32)

# quantizer norm f32[64, 16]: quant_range / scale_factor
QUANT_NORM = np.zeros((64, 16), np.float64)
for _wl in range(16):
    QUANT_NORM[:, _wl] = _r[_wl] / C.SCALE_FACTORS
QUANT_NORM[0, :] = 0.0
QUANT_NORM = QUANT_NORM.astype(np.float32)

# ---------------------------------------------------------------------------
# RDO candidate tables: wl step wl -> wl+1 for wl in 0..14
# ---------------------------------------------------------------------------
_wl = np.arange(15)
_b1 = C.WORD_LENGTH_BITS[_wl].astype(np.float64)
_b2 = C.WORD_LENGTH_BITS[_wl + 1].astype(np.float64)
_f1 = np.where(_b1 == 0, 2.0, 2.0 ** -_b1)
_f2 = 2.0 ** -_b2
RDO_STEP_GAIN = ((_f1 - _f2) / (_b2 - _b1)).astype(np.float32)   # [15]
RDO_STEP_BITS = (_b2 - _b1).astype(np.int32)                     # [15]

# per-candidate (bfu, wl) static tables, flattened [52*15]
RDO_CAND_BFU = np.repeat(np.arange(C.NUM_BFUS, dtype=np.int32), 15)
RDO_CAND_WL = np.tile(np.arange(15, dtype=np.int32), C.NUM_BFUS)
RDO_CAND_COST = (RDO_STEP_BITS[RDO_CAND_WL] * C.SPECS_PER_BFU[RDO_CAND_BFU]).astype(np.int32)
RDO_BUDGET = int(C.FRAME_BITS - C.FRAME_OVERHEAD_BITS - C.NUM_BFUS * C.BITS_PER_BFU_METADATA)


@functools.lru_cache(maxsize=None)
def bfu_permutation_matrices() -> tuple[np.ndarray, np.ndarray]:
    """0/1 permutation matrices turning BFU grouping into MXU matmuls.

    M[mode][p, s] = 1 iff coefficient position p feeds flat BFU slot
    s = bfu*20+k under block mode `mode`.  Then
      group:   slots  = coeffs @ M[mode]        [F,512]x[512,1040]
      scatter: coeffs = slots  @ M[mode].T      [F,1040]x[1040,512]
    A matmul against a 0/1 matrix with one nonzero per column/row copies f32
    values exactly, so this is bit-identical to the gather it replaces
    (dynamic gathers run ~100M elem/s on TPU; these matmuls are ~0.5 ms at
    4096 frames)."""
    mats = []
    for mode in range(2):
        m = np.zeros((512, C.NUM_BFUS * C.MAX_BFU_SIZE), np.float32)
        idx = C.BFU_GATHER_IDX[mode]  # [52, 20]
        for bfu in range(C.NUM_BFUS):
            for k in range(C.MAX_BFU_SIZE):
                p = idx[bfu, k]
                if p >= 0:
                    m[p, bfu * C.MAX_BFU_SIZE + k] = 1.0
        mats.append(m)
    return mats[0], mats[1]
