"""Gold (bit-faithful NumPy) batched ATRAC1 encoder.

Functionally identical to the reference pipeline (codec/pipeline/encoder.js)
with the frame loop turned into array axes.  Inter-frame state (QMF delay
lines, transient spectra, MDCT overlap tails -- codec/core/buffers.js:31-65)
becomes an explicit, serializable state dict so streams can be chunked.
"""

from __future__ import annotations

import numpy as np

from carta1_tpu.constants import (
    BFU_GATHER_IDX,
    BFU_BAND,
    MAX_BFU_SIZE,
    MDCT_BAND_SIZES,
    MDCT_NUM_SHORT_BLOCKS,
    MDCT_TRANSFORM_SIZES,
    MDCT_WINDOW_START,
    NUM_BFUS,
    QMF_DELAY,
    QMF_HIGH_BAND_DELAY,
    SAMPLES_PER_FRAME,
    SPECS_PER_BFU,
    TRANSIENT_FFT_SIZES,
    WINDOW_SHORT,
)
from carta1_tpu.framedata import FrameData
from carta1_tpu.gold.coding import allocate_bits, quantize_js
from carta1_tpu.gold.fftjs import magnitude_spectrum_js
from carta1_tpu.gold.transforms import mdct, qmf_analysis_stream
from carta1_tpu.gold.transient import transient_score
from carta1_tpu.options import EncoderOptions

_W_UP = WINDOW_SHORT            # f64 ascending half-sine
_W_DOWN = WINDOW_SHORT[::-1]    # descending


def encoder_init_state() -> dict[str, np.ndarray]:
    """Zero state at stream start (mirrors BufferPool zero-init)."""
    return {
        "qmf_low_delay": np.zeros(QMF_DELAY, np.float32),
        "qmf_mid_delay": np.zeros(QMF_DELAY, np.float32),
        "qmf_high_delay": np.zeros(QMF_HIGH_BAND_DELAY, np.float32),
        "prev_spectrum0": np.zeros(TRANSIENT_FFT_SIZES[0] // 2, np.float32),
        "prev_spectrum1": np.zeros(TRANSIENT_FFT_SIZES[1] // 2, np.float32),
        "prev_spectrum2": np.zeros(TRANSIENT_FFT_SIZES[2] // 2, np.float32),
        "band_tail0": np.zeros(32, np.float32),
        "band_tail1": np.zeros(32, np.float32),
        "band_tail2": np.zeros(32, np.float32),
    }


def _analysis_bands(pcm: np.ndarray, state: dict) -> tuple[list[np.ndarray], dict]:
    """Two-level QMF tree (encoder.js:57-96) over the whole stream.

    pcm: f32 [F, 512] -> bands [F,128],[F,128],[F,256] and updated delays.
    """
    nframes = pcm.shape[0]
    signal = pcm.reshape(-1)
    low1, high1, low_d = qmf_analysis_stream(signal, state["qmf_low_delay"])
    low2, mid2, mid_d = qmf_analysis_stream(low1, state["qmf_mid_delay"])
    high_shift = np.concatenate([state["qmf_high_delay"], high1])
    band2 = high_shift[: high1.shape[0]]
    high_d = high_shift[high1.shape[0]:]
    bands = [
        low2.reshape(nframes, 128),
        mid2.reshape(nframes, 128),
        band2.reshape(nframes, 256),
    ]
    new_state = dict(state)
    new_state.update(qmf_low_delay=low_d, qmf_mid_delay=mid_d, qmf_high_delay=high_d)
    return bands, new_state


def _block_modes(bands: list[np.ndarray], options: EncoderOptions, state: dict) -> tuple[np.ndarray, dict]:
    """Per-band transient detection -> block modes (encoder.js:111-145).

    Reference quirk kept: all three bands compare against
    transientThresholdLow (encoder.js:134).
    """
    nframes = bands[0].shape[0]
    modes = np.zeros((nframes, 3), dtype=np.int32)
    new_state = dict(state)
    thresholds = options.band_thresholds
    for band in range(3):
        spec = magnitude_spectrum_js(bands[band], TRANSIENT_FFT_SIZES[band])
        prev = np.concatenate([state[f"prev_spectrum{band}"][None], spec[:-1]], axis=0)
        score = transient_score(spec, prev)
        transient = score > thresholds[band]
        modes[:, band] = np.where(transient, max(band + 1, 2), 0)
        new_state[f"prev_spectrum{band}"] = spec[-1]
    return modes, new_state


def _mdct_band(band: np.ndarray, band_idx: int, modes: np.ndarray, tail0: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Windowed MDCT of one band for all frames, both block modes computed
    and selected per frame (encoder.js:163-341).

    band: f32 [F, size]; modes: int32 [F] (this band's column);
    tail0: f32 [32] previous-stream raw band tail.
    Returns (coeffs [F, size], new_tail [32]).
    """
    nframes, size = band.shape
    tsize = MDCT_TRANSFORM_SIZES[band_idx]
    ws = MDCT_WINDOW_START[band_idx]
    nb = MDCT_NUM_SHORT_BLOCKS[band_idx]

    # previous frame's raw tail; the reference stores it up-windowed
    # (encoder.js:302-309), mathematically identical to windowing on use.
    prev_tail = np.concatenate([tail0[None], band[:-1, size - 32:]], axis=0)
    overlap = (prev_tail.astype(np.float64) * _W_UP).astype(np.float32)

    # ---- long block ----
    long_in = np.zeros((nframes, tsize), np.float32)
    long_in[:, ws:ws + 32] = overlap
    windowed = band.copy()
    windowed[:, size - 32:] = (band[:, size - 32:].astype(np.float64) * _W_DOWN).astype(np.float32)
    long_in[:, ws + 32: ws + 32 + size] = windowed
    spec_long = mdct(long_in, tsize)  # [F, size]
    if band_idx > 0:
        spec_long = spec_long[:, ::-1]

    # ---- short blocks ----
    blocks = band.reshape(nframes, nb, 32)
    ov = np.empty((nframes, nb, 32), np.float32)
    ov[:, 0] = overlap
    ov[:, 1:] = (blocks[:, :-1].astype(np.float64) * _W_UP).astype(np.float32)
    win_blocks = (blocks.astype(np.float64) * _W_DOWN).astype(np.float32)
    short_in = np.concatenate([ov, win_blocks], axis=-1)  # [F, nb, 64]
    spec = mdct(short_in, 64)  # [F, nb, 32]
    if band_idx > 0:
        spec = spec[:, :, ::-1]
    spec_short = spec.reshape(nframes, size)

    is_long = (modes == 0)[:, None]
    coeffs = np.where(is_long, spec_long, spec_short)
    return coeffs, band[-1, size - 32:].copy()


def _group_bfus(coeffs: np.ndarray, modes: np.ndarray) -> np.ndarray:
    """Gather the 512 coefficients into [F, 52, 20] BFU slots
    (quantization.js:106-149); padding slots are zero."""
    nframes = coeffs.shape[0]
    bfu_mode = (modes[:, BFU_BAND] != 0).astype(np.int32)        # [F, 52]
    idx = BFU_GATHER_IDX[bfu_mode, np.arange(NUM_BFUS)[None, :]]  # [F, 52, 20]
    valid = idx >= 0
    out = coeffs[np.arange(nframes)[:, None, None], np.where(valid, idx, 0)]
    return np.where(valid, out, np.float32(0.0))


def gold_encode_frames(pcm: np.ndarray, options: EncoderOptions | None = None, state: dict | None = None) -> tuple[FrameData, dict]:
    """Encode a batch of frames.

    pcm: f32 [F, 512] (one channel).  Returns (FrameData, new_state).
    """
    options = options or EncoderOptions()
    state = state if state is not None else encoder_init_state()
    pcm = np.ascontiguousarray(pcm, dtype=np.float32)
    nframes = pcm.shape[0]
    if nframes == 0:
        return FrameData.zeros(0), state

    bands, state = _analysis_bands(pcm, state)
    modes, state = _block_modes(bands, options, state)

    coeffs = np.zeros((nframes, 512), np.float32)
    offset = 0
    for b in range(3):
        c, tail = _mdct_band(bands[b], b, modes[:, b], state[f"band_tail{b}"])
        coeffs[:, offset:offset + MDCT_BAND_SIZES[b]] = c
        state = dict(state)
        state[f"band_tail{b}"] = tail
        offset += MDCT_BAND_SIZES[b]

    bfu_data = _group_bfus(coeffs, modes)
    word_lengths, scale_factors = allocate_bits(bfu_data, SPECS_PER_BFU, options.allocation_bias)
    quantized = quantize_js(bfu_data, scale_factors, word_lengths)

    fd = FrameData(
        n_bfu=np.full(nframes, NUM_BFUS, np.int32),
        block_modes=modes,
        scale_factors=scale_factors,
        word_lengths=word_lengths,
        quantized=quantized,
    )
    return fd, state
