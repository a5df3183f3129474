"""Gold (bit-faithful NumPy) batched ATRAC1 decoder.

Reproduces codec/pipeline/decoder.js arithmetic exactly (f64 compute / f32
store), with the frame loop turned into array axes.  The only cross-frame
coupling is a 16-sample IMDCT tail per band and the QMF synthesis delay
lines, both carried in an explicit state dict.
"""

from __future__ import annotations

import numpy as np

from carta1_tpu.constants import (
    BFU_BAND,
    BFU_SCATTER_IDX,
    MAX_BFU_SIZE,
    MDCT_BAND_SIZES,
    MDCT_NUM_SHORT_BLOCKS,
    MDCT_TAIL_WINDOW_SIZE,
    NUM_BFUS,
    QMF_DELAY,
    QMF_HIGH_BAND_DELAY,
)
from carta1_tpu.framedata import FrameData
from carta1_tpu.gold.coding import dequantize_js
from carta1_tpu.gold.transforms import imdct, overlap_add_js, qmf_synthesis_stream


def decoder_init_state() -> dict[str, np.ndarray]:
    return {
        "tail0": np.zeros(MDCT_TAIL_WINDOW_SIZE, np.float32),
        "tail1": np.zeros(MDCT_TAIL_WINDOW_SIZE, np.float32),
        "tail2": np.zeros(MDCT_TAIL_WINDOW_SIZE, np.float32),
        "synth_low_delay": np.zeros(QMF_DELAY, np.float32),
        "synth_mid_delay": np.zeros(QMF_DELAY, np.float32),
        "synth_high_delay": np.zeros(QMF_HIGH_BAND_DELAY, np.float32),
    }


def _dequantize_coefficients(fd: FrameData) -> np.ndarray:
    """FrameData -> dense [F, 512] spectral coefficients
    (decoder.js:52-98)."""
    nframes = fd.num_frames
    deq = dequantize_js(fd.quantized, fd.scale_factors, fd.word_lengths)  # [F,52,20]
    active_bfu = np.arange(NUM_BFUS)[None, :] < fd.n_bfu[:, None]          # [F,52]
    deq = np.where(active_bfu[..., None], deq, np.float32(0.0))
    deq_flat = deq.reshape(nframes, NUM_BFUS * MAX_BFU_SIZE)

    pos_band = np.minimum(np.arange(512) // 128, 2)                        # [512]
    pos_mode = (fd.block_modes[:, pos_band] != 0).astype(np.int32)         # [F,512]
    slot = BFU_SCATTER_IDX[pos_mode, np.arange(512)[None, :]]              # [F,512]
    valid = slot >= 0
    out = deq_flat[np.arange(nframes)[:, None], np.where(valid, slot, 0)]
    return np.where(valid, out, np.float32(0.0))


def _imdct_band(coeffs: np.ndarray, band_idx: int, modes: np.ndarray, tail0: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Inverse transform + overlap-add of one band for all frames
    (decoder.js:116-330).

    coeffs: f32 [F, size]; modes: int32 [F]; tail0: f32 [16] stream carry.
    Returns (band output [F, size], new_tail [16]).
    """
    nframes, size = coeffs.shape
    nb = MDCT_NUM_SHORT_BLOCKS[band_idx]
    t = MDCT_TAIL_WINDOW_SIZE

    # ---- long block: reverse whole band (mid/high), IMDCT, keep mid half
    spec_long = coeffs[:, ::-1] if band_idx > 0 else coeffs
    inv = imdct(spec_long, 2 * size)              # [F, 2*size]
    inv_long = inv[:, size // 2: size // 2 + size]

    # ---- short blocks: reverse per 32-spectrum, imdct64, keep inv[16:48]
    blocks = coeffs.reshape(nframes, nb, 32)
    if band_idx > 0:
        blocks = blocks[:, :, ::-1]
    inv64 = imdct(blocks, 64)                     # [F, nb, 64]
    inv_short = inv64[:, :, 16:48].reshape(nframes, size)

    is_long = (modes == 0)[:, None]
    inv_buf = np.where(is_long, inv_long, inv_short)

    tails = inv_buf[:, size - t:]
    prev_tail = np.concatenate([tail0[None], tails[:-1]], axis=0)  # [F,16]

    # long-path assembly (decoder.js:203-232)
    out_long = np.empty((nframes, size), np.float32)
    out_long[:, :2 * t] = overlap_add_js(prev_tail, inv_buf[:, :t])
    out_long[:, 2 * t:] = inv_buf[:, t: size - t]

    # short-path assembly: chained per-block overlap-add (decoder.js:263-297)
    out_short = np.empty((nframes, size), np.float32)
    prev = prev_tail
    for b in range(nb):
        s = b * 32
        out_short[:, s:s + 32] = overlap_add_js(prev, inv_buf[:, s:s + t])
        prev = inv_buf[:, s + t:s + 32]

    out = np.where(is_long, out_long, out_short)
    return out, tails[-1].copy()


def gold_decode_frames(fd: FrameData, state: dict | None = None) -> tuple[np.ndarray, dict]:
    """Decode a batch of frames -> (pcm f32 [F, 512], new_state)."""
    state = state if state is not None else decoder_init_state()
    fd = fd.to_numpy()
    nframes = fd.num_frames
    if nframes == 0:
        return np.zeros((0, 512), np.float32), state

    coeffs = _dequantize_coefficients(fd)

    band_out = []
    new_state = dict(state)
    offset = 0
    for b in range(3):
        size = MDCT_BAND_SIZES[b]
        out, tail = _imdct_band(coeffs[:, offset:offset + size], b, fd.block_modes[:, b], state[f"tail{b}"])
        band_out.append(out)
        new_state[f"tail{b}"] = tail
        offset += size

    low = band_out[0].reshape(-1)
    mid = band_out[1].reshape(-1)
    high = band_out[2].reshape(-1)

    # high-band delay compensation (decoder.js:360-367)
    high_shift = np.concatenate([state["synth_high_delay"], high])
    high_delayed = high_shift[: high.shape[0]]
    new_state["synth_high_delay"] = high_shift[high.shape[0]:]

    stage2, mid_d = qmf_synthesis_stream(low, mid, state["synth_mid_delay"])
    pcm, low_d = qmf_synthesis_stream(stage2, high_delayed, state["synth_low_delay"])
    new_state["synth_mid_delay"] = mid_d
    new_state["synth_low_delay"] = low_d
    return pcm.reshape(nframes, 512), new_state
