"""Transient detection properties (parity: tests/transient.test.js),
checked against both the gold and the device implementations."""

import numpy as np
import pytest

from carta1_tpu.gold.fftjs import magnitude_spectrum_js
from carta1_tpu.gold.transient import transient_score

from signals import silence, sine, step, white_noise


def detect(cur_sig, prev_sig, fft_size, threshold):
    cur = magnitude_spectrum_js(cur_sig[:fft_size], fft_size)
    prev = magnitude_spectrum_js(prev_sig[:fft_size], fft_size)
    return bool(transient_score(cur[None], prev[None])[0] > threshold)


def test_magnitude_spectrum_energy_concentration():
    mag = magnitude_spectrum_js(sine(1000, 44100, 256), 256)
    assert mag.shape == (128,)
    assert mag.max() / mag.sum() > 0.1


def test_step_detected():
    assert detect(step(0, 512), silence(512), 512, 0.1)


def test_steady_state_ignored():
    s = sine(440, 44100, 512)
    assert not detect(s, s, 512, 0.1)


def test_threshold_sensitivity():
    assert detect(step(0, 512), silence(512), 512, 0.01)
    assert not detect(step(0, 512), silence(512), 512, 0.99)


def _gentle_noise(rng):
    white = (rng.random(512) - 0.5) * 0.05
    out = np.zeros(512, np.float32)
    p1 = p2 = 0.0
    for i in range(512):
        p1 = p1 * 0.95 + white[i] * 0.05
        p2 = p2 * 0.95 + p1 * 0.05
        out[i] = p2
    return out


def _burst(freqs_amps):
    frame = np.zeros(512, np.float64)
    i = np.arange(256, 512)
    for freq, amp in freqs_amps:
        frame[256:] += amp * np.sin(2 * np.pi * freq * i / 44100)
    return frame.astype(np.float32)


BAND_CASES = [
    ("low", 256, 1000, [(80, 0.9), (160, 0.8), (320, 0.7)]),
    ("mid", 256, 7000, [(6000, 0.8), (7500, 0.7), (9000, 0.6)]),
    ("high", 512, 15000, [(12000, 0.7), (15000, 0.6), (18000, 0.5)]),
]


@pytest.mark.parametrize("band,fft_size,tone_freq,burst_spec", BAND_CASES)
def test_band_matrix(band, fft_size, tone_freq, burst_spec):
    """Per-band: silence and gentle noise never trigger; a sudden burst
    (second half vs silence baseline) triggers at threshold 0.5
    (transient.test.js:105-283)."""
    baseline = silence(fft_size)
    # silence vs silence: never a transient
    assert not detect(silence(512), baseline, fft_size, 0.5)
    # gentle noise at very low level: high threshold holds
    noise = _gentle_noise(np.random.default_rng(1))
    assert not detect(noise, baseline, fft_size, 2.0)
    # burst second half vs silence: triggers at 0.5
    burst = _burst(burst_spec)
    assert detect(burst[256:256 + fft_size], baseline, fft_size, 0.5)


def test_device_scores_close_to_gold():
    """f32 device features vs f64 gold features: scores agree closely."""
    import jax.numpy as jnp

    from carta1_tpu.ops.transient import magnitude_spectrum as dev_mag
    from carta1_tpu.ops.transient import transient_score as dev_score

    sigs = np.stack([
        step(0, 512)[:256], sine(1000, 44100, 256), white_noise(3, 256) * 0.2,
        silence(256),
    ])
    prevs = np.stack([silence(256)] * 4)
    gold_cur = magnitude_spectrum_js(sigs, 256)
    gold_prev = magnitude_spectrum_js(prevs, 256)
    want = transient_score(gold_cur, gold_prev)
    got = np.asarray(dev_score(dev_mag(jnp.asarray(sigs), 256), dev_mag(jnp.asarray(prevs), 256)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)
