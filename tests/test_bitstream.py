"""Serialization round trips (parity: tests/bitstream.test.js,
serialization.test.js, readers.test.js)."""

import numpy as np
import pytest

from carta1_tpu.constants import NUM_BFUS, SOUND_UNIT_SIZE, SPECS_PER_BFU, WORD_LENGTH_BITS
from carta1_tpu.framedata import FrameData
from carta1_tpu.gold import gold_encode_frames
from carta1_tpu.io import aea
from carta1_tpu.io.bitstream_np import pack_frames, unpack_frames

from signals import frames, sine, white_noise


def random_framedata(nframes: int, seed: int = 0, n_bfu: int = NUM_BFUS) -> FrameData:
    rng = np.random.default_rng(seed)
    fd = FrameData.zeros(nframes)
    fd.n_bfu[:] = n_bfu
    fd.block_modes[:] = rng.choice([0, 2], size=(nframes, 3))
    fd.block_modes[:, 2] *= 0
    fd.block_modes[:, 2] += np.where(rng.random(nframes) < 0.5, 3, 0)
    fd.scale_factors[:, :n_bfu] = rng.integers(0, 64, (nframes, n_bfu))
    # keep total coefficient bits within the frame: use small word lengths
    fd.word_lengths[:, :n_bfu] = rng.integers(0, 3, (nframes, n_bfu))
    bits = WORD_LENGTH_BITS[fd.word_lengths]
    rng_max = np.maximum((1 << np.maximum(bits - 1, 0)) - 1, 0)
    vals = rng.integers(-32768, 32768, (nframes, NUM_BFUS, 20))
    fd.quantized[:] = np.clip(vals, -rng_max[..., None], rng_max[..., None])
    slot = np.arange(20)[None, None, :] < SPECS_PER_BFU[None, :, None]
    active = np.arange(NUM_BFUS)[None, :, None] < n_bfu
    fd.quantized[:] = np.where(slot & active & (bits[..., None] > 0), fd.quantized, 0)
    return fd


def test_pack_unit_size():
    fd = random_framedata(5)
    units = pack_frames(fd)
    assert units.shape == (5, SOUND_UNIT_SIZE)
    assert units.dtype == np.uint8
    # last 3 bytes are always zero padding (serialization.js:93-95)
    assert np.all(units[:, -3:] == 0)


@pytest.mark.parametrize("n_bfu", [20, 28, 36, 52])
def test_pack_unpack_roundtrip(n_bfu):
    fd = random_framedata(7, seed=n_bfu, n_bfu=n_bfu)
    out = unpack_frames(pack_frames(fd))
    assert np.array_equal(out.n_bfu, fd.n_bfu)
    assert np.array_equal(out.block_modes, fd.block_modes)
    assert np.array_equal(out.scale_factors, fd.scale_factors)
    assert np.array_equal(out.word_lengths, fd.word_lengths)
    assert np.array_equal(out.quantized, fd.quantized)


def test_pack_unpack_real_encoded_frames():
    pcm = frames(white_noise(5, 512 * 8))
    fd, _ = gold_encode_frames(pcm)
    out = unpack_frames(pack_frames(fd))
    assert np.array_equal(out.n_bfu, fd.n_bfu)
    assert np.array_equal(out.block_modes, fd.block_modes)
    assert np.array_equal(out.scale_factors, fd.scale_factors)
    assert np.array_equal(out.word_lengths, fd.word_lengths)
    assert np.array_equal(out.quantized, fd.quantized)


def test_signed_extremes_roundtrip():
    fd = FrameData.zeros(1)
    fd.n_bfu[:] = NUM_BFUS
    fd.word_lengths[0, :4] = [15, 15, 1, 1]  # 16-bit and 2-bit fields
    fd.scale_factors[0, :4] = 1
    fd.quantized[0, 0, :8] = -32767
    fd.quantized[0, 1, :8] = 32767
    fd.quantized[0, 2, :8] = -1
    fd.quantized[0, 3, :8] = 1
    out = unpack_frames(pack_frames(fd))
    assert np.array_equal(out.quantized, fd.quantized)


def test_aea_header_roundtrip(tmp_path):
    path = str(tmp_path / "t.aea")
    units = np.zeros((6, SOUND_UNIT_SIZE), np.uint8)
    aea.write_aea(path, units, title="hello world", channel_count=2)
    meta, got = aea.read_aea(path)
    assert meta.title == "hello world"
    assert meta.frame_count == 6
    assert meta.channel_count == 2
    assert got.shape == (6, SOUND_UNIT_SIZE)


def test_aea_magic_validation():
    with pytest.raises(ValueError):
        aea.parse_header(b"\x00" * 2048)


def test_aea_truncated_tail_dropped(tmp_path):
    path = str(tmp_path / "t.aea")
    with open(path, "wb") as f:
        f.write(aea.make_header("x", 2, 1))
        f.write(bytes(SOUND_UNIT_SIZE))
        f.write(bytes(100))  # partial trailing frame
    _, units = aea.read_aea(path)
    assert units.shape[0] == 1


def test_stereo_interleave_roundtrip():
    left = np.full((3, SOUND_UNIT_SIZE), 1, np.uint8)
    right = np.full((3, SOUND_UNIT_SIZE), 2, np.uint8)
    inter = aea.interleave_stereo(left, right)
    assert inter.shape == (6, SOUND_UNIT_SIZE)
    l2, r2 = aea.deinterleave_stereo(inter)
    assert np.array_equal(l2, left)
    assert np.array_equal(r2, right)
