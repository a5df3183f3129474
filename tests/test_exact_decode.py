"""Bit-exactness of the TPU engine's decoder against the gold oracle.

The contract (BASELINE.md): decoded output bit-exact vs the reference
decoder, pinned at decoded 16-bit PCM.  These tests pin the stronger
property — bitwise-equal float32 PCM — op by op and end to end.  The gold
package reproduces the reference JavaScript's arithmetic exactly, so
equality here is equality with carta1 itself.

Run on the CPU backend these tests validate the arithmetic design (with
conftest's FMA-free ISA pin); verify_tpu.py re-asserts the same equalities
compiled for the real chip.
"""

import os

import numpy as np
import jax
import pytest

from carta1_tpu.framedata import FrameData
from carta1_tpu.gold import gold_decode_frames, gold_encode_frames
from carta1_tpu.gold.coding import dequantize_js
from carta1_tpu.gold.fftjs import fft_js
from carta1_tpu.gold.transforms import imdct, overlap_add_js, qmf_synthesis_stream
from carta1_tpu.io import aea
from carta1_tpu.io.bitstream_np import unpack_frames
from carta1_tpu.io.wav import float_to_int16
from carta1_tpu.ops.exact_decode import (
    dequantize_exact,
    fft_exact,
    imdct_exact,
    overlap_add_exact,
    qmf_synthesis_exact,
)
from carta1_tpu.pipeline.decoder import decode_frames

from signals import sine, white_noise

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")
rng = np.random.default_rng(1789)


def _bits_equal(a, b) -> bool:
    a, b = np.asarray(a), np.asarray(b)
    return bool(((a.view(np.int32) == b.view(np.int32)) | ((a == 0) & (b == 0))).all())


@pytest.mark.parametrize("n", [16, 64, 128])
def test_fft_exact_bitwise(n):
    re = (rng.standard_normal((40, n)) * np.exp2(rng.integers(-8, 8, (40, n)))).astype(np.float32)
    im = rng.standard_normal((40, n)).astype(np.float32)
    gr, gi = fft_js(re, im)
    xr, xi = jax.jit(fft_exact)(re, im)
    assert _bits_equal(xr, gr) and _bits_equal(xi, gi)


@pytest.mark.parametrize("size", [64, 256, 512])
def test_imdct_exact_bitwise(size):
    x = (rng.standard_normal((20, size // 2)) * np.exp2(rng.integers(-10, 4, (20, size // 2)))).astype(np.float32)
    assert _bits_equal(jax.jit(lambda v: imdct_exact(v, size))(x), imdct(x, size))


@pytest.mark.parametrize("size", [64, 256, 512])
def test_imdct_exact_mid_is_middle_half(size):
    """mid=True must equal the full transform's [size/4, 3size/4) slice
    bitwise (it is a row selection of the one-hot scatter, r5)."""
    x = (rng.standard_normal((12, size // 2)) * 0.5).astype(np.float32)
    full = jax.jit(lambda v: imdct_exact(v, size))(x)
    midv = jax.jit(lambda v: imdct_exact(v, size, mid=True))(x)
    assert _bits_equal(midv, np.asarray(full)[:, size // 4 : 3 * size // 4])


def test_overlap_add_exact_bitwise():
    p = rng.standard_normal((200, 16)).astype(np.float32)
    c = rng.standard_normal((200, 16)).astype(np.float32)
    assert _bits_equal(jax.jit(overlap_add_exact)(p, c), overlap_add_js(p, c))


def test_dequantize_exact_bitwise():
    from carta1_tpu.constants import WORD_LENGTH_BITS

    q = rng.integers(-32767, 32768, (64, 52, 20)).astype(np.int32)
    sf = rng.integers(0, 64, (64, 52)).astype(np.int32)
    wl = rng.integers(0, 16, (64, 52)).astype(np.int32)
    r = (1 << np.maximum(WORD_LENGTH_BITS[wl] - 1, 0)) - 1
    q = np.clip(q, -r[..., None], r[..., None]).astype(np.int32)
    assert _bits_equal(jax.jit(dequantize_exact)(q, sf, wl), dequantize_js(q, sf, wl))


def test_qmf_synthesis_exact_bitwise():
    low = rng.standard_normal((40, 256)).astype(np.float32)
    high = rng.standard_normal((40, 256)).astype(np.float32)
    delay = rng.standard_normal(46).astype(np.float32)
    g_out, g_d = qmf_synthesis_stream(low.reshape(-1), high.reshape(-1), delay)
    e_out, e_d = jax.jit(qmf_synthesis_exact)(low, high, delay)
    assert _bits_equal(e_out, g_out.reshape(40, 512)) and _bits_equal(e_d, g_d)


def test_decode_frames_bitwise_golden_fixture():
    """The headline contract on the pinned fixture: f32-bitwise, therefore
    int16-bit-exact, including carried stream state."""
    _, units = aea.read_aea(os.path.join(FIXTURES, "golden.aea"))
    fd = unpack_frames(units)
    pcm, st = decode_frames(fd)
    gpcm, gst = gold_decode_frames(fd)
    assert _bits_equal(pcm, gpcm)
    d = np.abs(
        float_to_int16(np.asarray(pcm).reshape(-1)).astype(np.int32)
        - float_to_int16(gpcm.reshape(-1)).astype(np.int32)
    )
    assert d.max() == 0
    for k in gst:
        assert _bits_equal(st[k], gst[k]), k


def test_decode_frames_bitwise_random_stream_chunked():
    """Encode 2 s of adversarial material, decode in uneven chunks with
    state carry, and require bitwise equality with gold throughout."""
    n = 2 * 44100
    sig = 0.5 * sine(440, length=n) + 0.2 * white_noise(3, n)
    sig[30000:30512] += 0.4  # force short blocks
    sig = np.clip(sig, -1, 1).astype(np.float32)
    frames = np.zeros((-(-n // 512) * 512,), np.float32)
    frames[:n] = sig
    fd, _ = gold_encode_frames(frames.reshape(-1, 512))

    gpcm, _ = gold_decode_frames(fd)
    state = None
    outs = []
    for lo, hi in ((0, 37), (37, 100), (100, fd.num_frames)):
        pcm, state = decode_frames(fd[slice(lo, hi)], state)
        outs.append(np.asarray(pcm))
    assert _bits_equal(np.concatenate(outs), gpcm)


# ---------------------------------------------------------------------------
# Block-mode partitioned IMDCT (r5): with any short_cap, decode output and
# stream state must be bitwise identical to the compute-both default —
# including the in-graph overflow fallback and the vmap-safe assume_fits
# variant (ops/exact_decode._short_path_partitioned).
# ---------------------------------------------------------------------------
def _mixed_mode_fd(nframes=120):
    """FrameData with a healthy mix of long and short frames per band."""
    n = nframes * 512
    sig = 0.15 * sine(440, length=n)
    for pos in range(4096, n - 2048, 7 * 512):  # hard wideband bursts
        sig[pos:pos + 256] += 0.7 * white_noise(pos, 256)
    sig = np.clip(sig, -1, 1).astype(np.float32)
    fd, _ = gold_encode_frames(sig.reshape(nframes, 512))
    counts = (np.asarray(fd.block_modes) != 0).sum(axis=0)
    assert counts.max() >= 4 and counts.min() < nframes  # mixed, not degenerate
    return fd, counts


def _decode_with_cap(fd, cap, assume_fits=False):
    from carta1_tpu.pipeline.decoder import decode_step, decoder_init_state

    fn = jax.jit(decode_step, static_argnames=("short_cap", "assume_fits"))
    return fn(fd.to_numpy(), decoder_init_state(), short_cap=cap, assume_fits=assume_fits)


def _assert_same_decode(fd, cap, assume_fits=False):
    want_pcm, want_st = _decode_with_cap(fd, None)
    got_pcm, got_st = _decode_with_cap(fd, cap, assume_fits)
    assert _bits_equal(got_pcm, want_pcm)
    for k in want_st:
        assert _bits_equal(got_st[k], want_st[k]), k


def test_decode_partitioned_bitwise_fits():
    fd, counts = _mixed_mode_fd()
    cap = int(counts.max()) + 3
    _assert_same_decode(fd, cap)
    _assert_same_decode(fd, cap, assume_fits=True)


def test_decode_partitioned_overflow_falls_back():
    """cap below the true short count: the in-graph cond must take the
    compute-both branch and still produce bit-identical output."""
    fd, counts = _mixed_mode_fd()
    assert counts.max() >= 2
    _assert_same_decode(fd, int(counts.max()) - 1)


def test_decode_partitioned_mode_extremes():
    """All-long and all-short batches through the partitioned path."""
    fd, _ = _mixed_mode_fd(nframes=48)
    for mode_row in ([0, 0, 0], [2, 2, 3]):
        forced = FrameData(
            n_bfu=np.asarray(fd.n_bfu),
            block_modes=np.tile(np.array(mode_row, np.int32), (fd.num_frames, 1)),
            scale_factors=np.asarray(fd.scale_factors),
            word_lengths=np.asarray(fd.word_lengths),
            quantized=np.asarray(fd.quantized),
        )
        _assert_same_decode(forced, 8)  # all-short overflows 8 -> fallback
        _assert_same_decode(forced, fd.num_frames - 1)  # exact-capacity fit


def test_decode_vmap_partitioned_hoisted_cond():
    """The processor's stereo path: header-derived mode counts hoist the
    overflow cond above the channel vmap; output must match the
    compute-both graph byte for byte, fitting or not."""
    from carta1_tpu.io.bitstream_np import pack_frames_fast
    from carta1_tpu.processor import _broadcast_state_np, _decode_vmap_jit
    from carta1_tpu.pipeline.decoder import decoder_init_state

    fd, counts = _mixed_mode_fd()
    units = pack_frames_fast(fd)
    stacked = np.stack([units, units[::-1].copy()])  # 2 "channels"
    state = _broadcast_state_np(decoder_init_state(), 2)
    want_pcm, want_st = _decode_vmap_jit(False, None)(stacked, state)
    for cap in (int(counts.max()) + 2, max(1, int(counts.max()) - 1)):
        got_pcm, got_st = _decode_vmap_jit(False, cap)(stacked, state)
        assert _bits_equal(got_pcm, want_pcm)
        for k in want_st:
            assert _bits_equal(got_st[k], want_st[k]), k


def _forced_short_counts(fd, k):
    """fd with the first k frames short-mode in every band, the rest long
    (modes are plain input data to the decoder, so forcing them only
    changes which IMDCT path interprets the same coefficients)."""
    modes = np.zeros((fd.num_frames, 3), np.int32)
    modes[:k] = [2, 2, 3]
    return FrameData(
        n_bfu=np.asarray(fd.n_bfu),
        block_modes=modes,
        scale_factors=np.asarray(fd.scale_factors),
        word_lengths=np.asarray(fd.word_lengths),
        quantized=np.asarray(fd.quantized),
    )


def test_decode_partitioned_capacity_ladder():
    """Tuple short_cap (r5): ONE (4, 16) ladder program, three inputs that
    land in the small tier / the large tier / the compute-both fallback —
    all bitwise identical to the unpartitioned decode."""
    fd, _ = _mixed_mode_fd(nframes=48)
    for k in (3, 11, 20):  # <=4 / <=16 / overflow
        _assert_same_decode(_forced_short_counts(fd, k), (4, 16))
    # assume_fits with a ladder uses the first (smallest) tier
    _assert_same_decode(_forced_short_counts(fd, 3), (4, 16), assume_fits=True)


def test_decode_vmap_partitioned_ladder():
    """The processor's stereo path with a capacity ladder: ONE hoisted
    nested-cond program, inputs landing in each tier, all matching the
    compute-both graph byte for byte."""
    from carta1_tpu.io.bitstream_np import pack_frames_fast
    from carta1_tpu.processor import _broadcast_state_np, _decode_vmap_jit
    from carta1_tpu.pipeline.decoder import decoder_init_state

    fd, _ = _mixed_mode_fd(nframes=48)
    state = _broadcast_state_np(decoder_init_state(), 2)
    for k in (3, 11, 20):
        units = pack_frames_fast(_forced_short_counts(fd, k))
        stacked = np.stack([units, units[::-1].copy()])
        want_pcm, want_st = _decode_vmap_jit(False, None)(stacked, state)
        got_pcm, got_st = _decode_vmap_jit(False, (4, 16))(stacked, state)
        assert _bits_equal(got_pcm, want_pcm)
        for k2 in want_st:
            assert _bits_equal(got_st[k2], want_st[k2]), k2


# ---------------------------------------------------------------------------
# Pallas transform core (ops/exact_fft_pallas): bitwise == the XLA path.
# Interpreter mode — runs on the CPU test backend; the compiled TPU kernel
# is pinned by the on-chip gate (verify_tpu.py / QUALITY_r*.json).
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("s,lead", [(128, (6,)), (256, (3,)), (128, (2, 4))])
def test_qmf_taps_pallas_interpret_bitwise(s, lead):
    """The QMF-synthesis tap kernel must equal the XLA loop bit-for-bit.

    Replicates qmf_synthesis_exact's XLA branch by hand (the dispatch gate
    picks exactly one path per backend, so the A/B must build both)."""
    import jax.numpy as jnp

    from carta1_tpu.ops.df import acc3_add, acc3_to_f32, acc3_zero, split, two_prod_presplit
    from carta1_tpu.ops.exact_decode import _qmf_tap_splits
    from carta1_tpu.ops.exact_qmf_pallas import qmf_taps_pallas

    rng = np.random.default_rng(s + len(lead))
    work = (rng.standard_normal(lead + (46 + 2 * s,)) * 0.6).astype(np.float32)

    def xla_taps(work):
        wh, wl = split(work)
        ev, evh, evl, od, odh, odl = _qmf_tap_splits()
        acc0 = acc3_zero(work.shape[:-1] + (s,))
        acc1 = acc3_zero(work.shape[:-1] + (s,))
        for j in range(24):
            sl0 = (..., slice(2 * j, 2 * j + 2 * s, 2))
            sl1 = (..., slice(2 * j + 1, 2 * j + 2 * s + 1, 2))
            p, e = two_prod_presplit(work[sl0], wh[sl0], wl[sl0],
                                     jnp.float32(ev[j]), jnp.float32(evh[j]), jnp.float32(evl[j]))
            acc0 = acc3_add(acc0, p, e)
            p, e = two_prod_presplit(work[sl1], wh[sl1], wl[sl1],
                                     jnp.float32(od[j]), jnp.float32(odh[j]), jnp.float32(odl[j]))
            acc1 = acc3_add(acc1, p, e)
        return jnp.stack([acc3_to_f32(acc1), acc3_to_f32(acc0)], axis=-1).reshape(
            work.shape[:-1] + (2 * s,)
        )

    a = np.asarray(jax.jit(xla_taps)(work))
    b = np.asarray(jax.jit(lambda w: qmf_taps_pallas(w, interpret=True))(work))
    assert (a.view(np.int32) == b.view(np.int32)).all()


@pytest.mark.parametrize("size,lead", [(64, (4, 16)), (256, (2, 3)), (512, (5,))])
def test_imdct_pallas_interpret_bitwise(size, lead):
    from carta1_tpu.ops.exact_decode import imdct_exact_xla
    from carta1_tpu.ops.exact_fft_pallas import imdct_exact_pallas

    rng = np.random.default_rng(size)
    x = (rng.standard_normal(lead + (size // 2,)) * 0.5).astype(np.float32)
    a = np.asarray(jax.jit(lambda v: imdct_exact_xla(v, size))(x))
    b = np.asarray(
        jax.jit(lambda v: imdct_exact_pallas(v, size, interpret=True))(x)
    )
    assert (a.view(np.int32) == b.view(np.int32)).all()
