"""Golden fixture regression: pins the codec's exact semantics across
versions.

fixtures/golden.aea was produced by the exact engine (bit-faithful to the
reference JavaScript) from a deterministic 1-second signal; any change to
encoder decisions, bitstream layout, or decoder arithmetic that alters these
bytes is a semantic regression, not a refactor."""

import os

import numpy as np

from carta1_tpu.gold import gold_decode_frames, gold_encode_frames
from carta1_tpu.io import aea
from carta1_tpu.io.bitstream_np import pack_frames, unpack_frames
from carta1_tpu.io.wav import float_to_int16
from carta1_tpu.pipeline import decode_frames

from signals import chirp, sine, white_noise

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def _golden_signal():
    n = 44100
    sig = 0.4 * sine(440, length=n) + 0.2 * chirp(100, 8000, length=n)
    sig[22050:22306] += 0.35
    sig += 0.05 * white_noise(7, n)
    sig = np.clip(sig, -1, 1).astype(np.float32)
    frames = np.zeros((-(-n // 512) * 512,), np.float32)
    frames[:n] = sig
    return frames.reshape(-1, 512)


def test_exact_encode_bitstream_is_stable():
    _, golden_units = aea.read_aea(os.path.join(FIXTURES, "golden.aea"))
    fd, _ = gold_encode_frames(_golden_signal())
    units = pack_frames(fd)
    assert np.array_equal(units, golden_units)


def test_exact_decode_int16_is_stable():
    _, units = aea.read_aea(os.path.join(FIXTURES, "golden.aea"))
    golden = np.load(os.path.join(FIXTURES, "golden_decode.npz"))
    pcm, _ = gold_decode_frames(unpack_frames(units))
    int16 = float_to_int16(pcm.reshape(-1))
    assert np.array_equal(int16, golden["int16"])


def test_tpu_decode_bit_exact_against_golden():
    """The default (bit-exact) device decoder reproduces the pinned golden
    int16 PCM exactly — the BASELINE decode contract."""
    _, units = aea.read_aea(os.path.join(FIXTURES, "golden.aea"))
    golden = np.load(os.path.join(FIXTURES, "golden_decode.npz"))
    pcm, _ = decode_frames(unpack_frames(units))
    int16 = float_to_int16(np.asarray(pcm).reshape(-1))
    assert np.array_equal(int16, golden["int16"])


def test_tpu_fast_decode_within_envelope_of_golden():
    """The optional fast engine stays inside its documented 1-LSB envelope."""
    _, units = aea.read_aea(os.path.join(FIXTURES, "golden.aea"))
    golden = np.load(os.path.join(FIXTURES, "golden_decode.npz"))
    pcm, _ = decode_frames(unpack_frames(units), fast=True)
    int16 = float_to_int16(np.asarray(pcm).reshape(-1))
    d = np.abs(int16.astype(np.int32) - golden["int16"].astype(np.int32))
    assert d.max() <= 1
    assert (d != 0).mean() < 0.01
