"""Native C++ host tier vs the NumPy oracle: bit-exact equivalence."""

import numpy as np
import pytest

from carta1_tpu import native
from carta1_tpu.gold import gold_encode_frames
from carta1_tpu.io.bitstream_np import pack_frames as np_pack
from carta1_tpu.io.bitstream_np import unpack_frames as np_unpack
from carta1_tpu.io.wav import float_to_int16 as np_f2i

from signals import frames, white_noise
from test_bitstream import random_framedata

pytestmark = pytest.mark.skipif(not native.is_available(), reason=f"native tier unavailable: {native.build_error()}")


def test_native_pack_matches_numpy():
    pcm = frames(white_noise(5, 512 * 16))
    fd, _ = gold_encode_frames(pcm)
    want = np_pack(fd)
    got = native.pack_frames(fd)
    assert np.array_equal(got, want)


@pytest.mark.parametrize("n_bfu", [20, 36, 52])
def test_native_unpack_matches_numpy(n_bfu):
    fd = random_framedata(9, seed=n_bfu, n_bfu=n_bfu)
    units = np_pack(fd)
    got = native.unpack_frames(units)
    want = np_unpack(units)
    for field in ("n_bfu", "block_modes", "scale_factors", "word_lengths", "quantized"):
        assert np.array_equal(getattr(got, field), getattr(want, field)), field


def test_native_roundtrip():
    fd = random_framedata(17, seed=3)
    units = native.pack_frames(fd)
    got = native.unpack_frames(units)
    assert np.array_equal(got.quantized, fd.quantized)
    assert np.array_equal(got.scale_factors, fd.scale_factors)


def test_native_float_to_int16():
    rng = np.random.default_rng(0)
    x = np.concatenate([
        rng.uniform(-1.5, 1.5, 10000).astype(np.float32),
        np.array([0.0, 1.0, -1.0, 0.5, -0.5, 1e-9, -1e-9], np.float32),
    ])
    want = np_f2i(x)
    got = native.float_to_int16(x)
    assert np.array_equal(got, want)


def test_malformed_overflow_frames_consistent_everywhere():
    """Frames whose declared fields overflow the 212-byte unit must decode
    identically (JS truncated-read semantics) in numpy, native and device
    implementations, with no crash or overrun."""
    import jax.numpy as jnp

    from carta1_tpu.ops.bitpack import unpack_frames as j_unpack

    fd = random_framedata(64, seed=99)
    fd.word_lengths[:, :] = 0
    fd.word_lengths[:, : 30] = 10  # 11 bits x wide BFUs -> overflows 1696
    units_np = np_pack(fd)
    units_nat = native.pack_frames(fd)
    assert np.array_equal(units_np, units_nat)

    a = np_unpack(units_np)
    b = native.unpack_frames(units_np)
    c = j_unpack(jnp.asarray(units_np)).to_numpy()
    for field in ("n_bfu", "block_modes", "scale_factors", "word_lengths", "quantized"):
        assert np.array_equal(getattr(a, field), getattr(b, field)), f"np vs native: {field}"
        assert np.array_equal(getattr(a, field), getattr(c, field)), f"np vs device: {field}"
