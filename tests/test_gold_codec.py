"""Gold encoder/decoder pipeline properties (parity: tests/encoder.test.js,
decoder.test.js, bitallocation.test.js, quantization.test.js)."""

import numpy as np
import pytest

from carta1_tpu.constants import (
    BITS_PER_BFU_METADATA,
    CODEC_DELAY,
    FRAME_BITS,
    FRAME_OVERHEAD_BITS,
    NUM_BFUS,
    SPECS_PER_BFU,
    WORD_LENGTH_BITS,
)
from carta1_tpu.framedata import FrameData
from carta1_tpu.gold import (
    decoder_init_state,
    encoder_init_state,
    gold_decode_frames,
    gold_encode_frames,
)
from carta1_tpu.gold.coding import dequantize_js, find_scale_factors, quantize_js
from carta1_tpu.options import EncoderOptions

from signals import frames, sine, white_noise


def encode(pcm_frames: np.ndarray, **opts):
    fd, _ = gold_encode_frames(pcm_frames, EncoderOptions(**opts))
    return fd


def test_encode_shape_and_budget_whitenoise():
    pcm = frames(white_noise(1, 512 * 4))
    fd = encode(pcm)
    assert fd.n_bfu.tolist() == [NUM_BFUS] * 4
    used = (WORD_LENGTH_BITS[fd.word_lengths] * SPECS_PER_BFU[None, :]).sum(axis=1)
    budget = FRAME_BITS - FRAME_OVERHEAD_BITS - NUM_BFUS * BITS_PER_BFU_METADATA
    assert np.all(used <= budget)
    # noise should consume nearly the whole budget
    assert np.all(used > budget - 64)


def test_silence_gets_zero_allocation():
    fd = encode(np.zeros((3, 512), np.float32))
    assert np.all(fd.word_lengths == 0)
    assert np.all(fd.scale_factors == 0)
    assert np.all(fd.quantized == 0)


def test_transient_triggers_short_blocks():
    """Silence then a loud multi-tone burst must switch at least one band to
    short blocks within a frame of the onset (encoder.test.js:26-91)."""
    burst = (
        sine(1000, length=1024) + sine(5000, length=1024) + sine(12000, length=1024)
    ) / 3.0
    pcm = np.concatenate([np.zeros(1024, np.float32), burst.astype(np.float32)])
    fd = encode(pcm.reshape(-1, 512))
    assert np.any(fd.block_modes[2:4] != 0)


def test_steady_sine_stays_long():
    pcm = frames(sine(440, length=512 * 6))
    fd = encode(pcm)
    # after the onset frame, steady state must use long blocks
    assert np.all(fd.block_modes[2:] == 0)


def test_scale_factor_covers_max_amplitude():
    rng = np.random.default_rng(3)
    data = (rng.standard_normal((2, NUM_BFUS, 20)) * 0.3).astype(np.float32)
    mask = np.arange(20)[None, :] < SPECS_PER_BFU[:, None]
    sf = find_scale_factors(data, mask[None])
    from carta1_tpu.constants import SCALE_FACTORS

    max_amp = np.abs(np.where(mask[None], data, 0)).max(axis=-1)
    # the covering property holds for amplitudes within the table range (<= 1)
    active = (max_amp > 0) & (max_amp <= 1.0)
    assert np.all(SCALE_FACTORS[sf][active] >= max_amp[active] * (1 - 1e-12))
    # and it is the smallest such scale factor
    not_first = active & (sf > 0)
    assert np.all(SCALE_FACTORS[np.maximum(sf - 1, 0)][not_first] < max_amp[not_first] * (1 + 1e-12))


def test_quantize_roundtrip_error_bounded():
    rng = np.random.default_rng(4)
    data = (rng.uniform(-0.9, 0.9, (1, NUM_BFUS, 20))).astype(np.float32)
    mask = np.arange(20)[None, :] < SPECS_PER_BFU[:, None]
    data = np.where(mask[None], data, 0).astype(np.float32)
    sf = find_scale_factors(data, mask[None])
    wl = np.full((1, NUM_BFUS), 8, np.int32)
    q = quantize_js(data, sf, wl)
    deq = dequantize_js(q, sf, wl)
    from carta1_tpu.constants import SCALE_FACTORS

    step = SCALE_FACTORS[sf] / (2 ** (WORD_LENGTH_BITS[wl] - 1) - 1)
    err = np.abs(deq - data)
    assert np.all(err <= step[..., None] * (0.5 + 1e-6))


def test_quantize_clipping():
    data = np.zeros((1, NUM_BFUS, 20), np.float32)
    data[0, 0, :8] = 100.0  # way above any scale factor
    sf = np.full((1, NUM_BFUS), 63, np.int32)
    wl = np.full((1, NUM_BFUS), 2, np.int32)  # 3 bits -> range +-3
    q = quantize_js(data, sf, wl)
    assert np.all(q[0, 0, :8] == 3)


def test_roundtrip_440hz_sine():
    """Encode->decode a 440 Hz sine; after CODEC_DELAY compensation the mean
    absolute error must be < 0.1 (decoder.test.js:19-68)."""
    nframes = 10
    signal = sine(440, length=512 * nframes)
    fd = encode(signal.reshape(nframes, 512))
    pcm, _ = gold_decode_frames(fd)
    out = pcm.reshape(-1)
    n = len(signal) - CODEC_DELAY
    err = np.abs(out[CODEC_DELAY:].astype(np.float64) - signal[:n].astype(np.float64))
    assert err.mean() < 0.1
    # and substantially better than the test bound in steady state
    assert err[2048:].mean() < 0.05


def test_decode_is_deterministic_and_stateful():
    signal = frames(white_noise(7, 512 * 6))
    fd = encode(signal)
    full, _ = gold_decode_frames(fd)
    # chunked decode with state carry must equal whole-batch decode
    state = decoder_init_state()
    parts = []
    for start, end in ((0, 2), (2, 3), (3, 6)):
        part, state = gold_decode_frames(fd[slice(start, end)], state)
        parts.append(part)
    chunked = np.concatenate(parts, axis=0)
    assert np.array_equal(full, chunked)


def test_encode_is_stateful_chunkable():
    signal = frames(white_noise(9, 512 * 6))
    fd_full, _ = gold_encode_frames(signal, EncoderOptions())
    state = encoder_init_state()
    parts = []
    for start, end in ((0, 1), (1, 4), (4, 6)):
        fd, state = gold_encode_frames(signal[start:end], EncoderOptions(), state)
        parts.append(fd)
    fd_chunked = FrameData.concatenate(parts)
    assert np.array_equal(fd_full.block_modes, fd_chunked.block_modes)
    assert np.array_equal(fd_full.scale_factors, fd_chunked.scale_factors)
    assert np.array_equal(fd_full.word_lengths, fd_chunked.word_lengths)
    assert np.array_equal(fd_full.quantized, fd_chunked.quantized)


def test_zero_word_length_decodes_to_silence():
    fd = FrameData.zeros(2)
    fd.n_bfu[:] = NUM_BFUS
    pcm, _ = gold_decode_frames(fd)
    assert np.all(pcm == 0)


def test_all_short_blocks_decode():
    fd = FrameData.zeros(1)
    fd.n_bfu[:] = NUM_BFUS
    fd.block_modes[0] = [2, 2, 3]
    fd.scale_factors[0, :] = 40
    fd.word_lengths[0, :] = 4
    fd.quantized[0, :, :] = 3
    pcm, _ = gold_decode_frames(fd)
    assert np.all(np.isfinite(pcm))
    assert np.any(pcm != 0)
