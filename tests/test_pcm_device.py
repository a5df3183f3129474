"""Device-side PCM <-> int16 conversion (ops/pcm) is bitwise equal to the
host conversions the WAV layer uses (io/wav.py; reference semantics:
bin/cli.js:316-353 read, codec/io/processor.js:347-426 write)."""

import jax
import numpy as np
import pytest

from carta1_tpu.io.wav import float_to_int16 as host_f2i
from carta1_tpu.ops.pcm import float_to_int16 as dev_f2i
from carta1_tpu.ops.pcm import int16_to_float as dev_i2f


def _adversarial_samples() -> np.ndarray:
    rng = np.random.default_rng(7)
    ks = rng.integers(-32768, 32768, 5000)
    x = (ks / 32767.0).astype(np.float32)
    return np.concatenate(
        [
            x,
            x + np.float32(1e-7),
            x - np.float32(1e-7),
            (ks / 32768.0).astype(np.float32),
            rng.standard_normal(20000).astype(np.float32) * 1.2,  # incl. clipping
            np.array(
                [1.0, -1.0, 0.0, -0.0, 0.9999999, -0.9999999, 0.5, -0.5], np.float32
            ),
        ]
    )


def test_float_to_int16_bitwise_vs_host():
    x = _adversarial_samples()
    got = np.asarray(jax.jit(dev_f2i)(x))
    want = host_f2i(x[None])[0]
    assert (got == want).all()


def test_int16_to_float_exact():
    i16 = np.arange(-32768, 32768, dtype=np.int16)
    got = np.asarray(jax.jit(dev_i2f)(i16))
    want = i16.astype(np.float32) / np.float32(32768.0)
    assert (got.view(np.int32) == want.view(np.int32)).all()
