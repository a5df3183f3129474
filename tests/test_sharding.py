"""Multi-device frame-axis sharding on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from carta1_tpu.framedata import FrameData
from carta1_tpu.gold import gold_decode_frames, gold_encode_frames
from carta1_tpu.io.wav import float_to_int16
from carta1_tpu.parallel import decode_frames_sharded, encode_frames_sharded, make_mesh
from carta1_tpu.pipeline import decode_frames, encode_frames

from signals import frames, sine, white_noise


pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs the virtual multi-device CPU mesh"
)


def _signal(nframes, seed=5):
    sig = white_noise(seed, 512 * nframes) * 0.4
    sig += sine(700, length=512 * nframes) * 0.4
    return frames(sig.astype(np.float32))


def test_sharded_encode_matches_single_device():
    mesh = make_mesh()
    ndev = mesh.devices.size
    assert ndev == 8
    pcm = _signal(ndev * 5, seed=2)
    fd_single, _ = encode_frames(pcm)
    fd_shard = encode_frames_sharded(pcm, mesh=mesh)
    a, b = fd_single.to_numpy(), fd_shard.to_numpy()
    assert np.array_equal(a.block_modes, b.block_modes)
    assert np.array_equal(a.scale_factors, b.scale_factors)
    # ULP wobble across shapes may flip a quantizer boundary; must be rare
    qdiff = np.abs(a.quantized - b.quantized)
    assert qdiff.max() <= 1
    assert (qdiff != 0).mean() < 1e-3


def _bits_equal(a, b) -> bool:
    a, b = np.asarray(a), np.asarray(b)
    return bool(((a.view(np.int32) == b.view(np.int32)) | ((a == 0) & (b == 0))).all())


def test_sharded_decode_bitwise_single_device():
    """The exact decoder is bitwise shape-invariant by construction (fixed
    elementwise accumulation order), so sharded == batched must hold at the
    stored-bit level, not just within an envelope (PERF.md 'chunked ==
    batched == sharded, bitwise')."""
    pcm = _signal(8 * 4, seed=7)
    fd, _ = gold_encode_frames(pcm)
    want, _ = decode_frames(fd)
    got = decode_frames_sharded(fd)
    assert _bits_equal(got, want)


def test_sharded_decode_bitwise_gold_oracle():
    """Boundary-state reconstruction must be exact: halo-reconstructed shard
    state feeds the bit-exact decoder, so the sharded result equals the gold
    oracle (and therefore the reference) bit-for-bit."""
    pcm = _signal(8 * 3, seed=9)
    fd, _ = gold_encode_frames(pcm)
    want, _ = gold_decode_frames(fd)
    got = np.asarray(decode_frames_sharded(fd))
    assert _bits_equal(got, want)
    assert np.array_equal(float_to_int16(got), float_to_int16(want))


def test_allocator_reaches_every_encode_path():
    """options.allocator must take effect on the batched, sharded, and scan
    paths alike (engines-interchangeable contract): allocator="reference"
    yields the same word lengths everywhere, and those word lengths differ
    from the rdo default's somewhere (proving the option was not dropped)."""
    from carta1_tpu.options import EncoderOptions
    from carta1_tpu.pipeline.streaming import chunk_frames_array, encode_stream

    pcm = _signal(8 * 4, seed=11)
    opts_ref = EncoderOptions(allocator="reference")

    fd_batched, _ = encode_frames(pcm, opts_ref)
    wl_batched = np.asarray(fd_batched.word_lengths)

    fd_default, _ = encode_frames(pcm)
    assert not np.array_equal(wl_batched, np.asarray(fd_default.word_lengths)), (
        "signal must discriminate the allocators for this test to mean anything"
    )

    fd_shard = encode_frames_sharded(pcm, opts_ref)
    assert np.array_equal(np.asarray(fd_shard.word_lengths), wl_batched)

    chunks, _ = chunk_frames_array(pcm, 8)
    fd_scan, _ = encode_stream(chunks, opts_ref)
    wl_scan = np.asarray(fd_scan.word_lengths).reshape(-1, wl_batched.shape[1])
    assert np.array_equal(wl_scan, wl_batched)


def test_sharded_ragged_frame_count():
    """Frame counts that don't divide the mesh get tail-padded and trimmed."""
    pcm = _signal(21, seed=3)  # 21 frames on 8 devices
    fd = encode_frames_sharded(pcm)
    assert fd.to_numpy().num_frames == 21
    out = decode_frames_sharded(fd)
    assert np.asarray(out).shape == (21, 512)


def test_sharded_roundtrip_quality():
    nframes = 8 * 4
    signal = sine(440, length=512 * nframes)
    fd = encode_frames_sharded(signal.reshape(nframes, 512))
    out = np.asarray(decode_frames_sharded(fd)).reshape(-1)
    from carta1_tpu.constants import CODEC_DELAY

    n = len(signal) - CODEC_DELAY
    err = np.abs(out[CODEC_DELAY:] - signal[:n])
    assert err.mean() < 0.1
