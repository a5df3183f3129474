"""Deterministic test-signal generators (parity: tests/testSignals.js)."""

from __future__ import annotations

import numpy as np


def silence(length: int = 512) -> np.ndarray:
    return np.zeros(length, np.float32)


def dc(value: float = 1.0, length: int = 512) -> np.ndarray:
    return np.full(length, value, np.float32)


def sine(freq: float, sample_rate: int = 44100, length: int = 512) -> np.ndarray:
    i = np.arange(length, dtype=np.float64)
    return np.sin(2.0 * np.pi * freq * i / sample_rate).astype(np.float32)


def impulse(position: int = 0, length: int = 512) -> np.ndarray:
    arr = np.zeros(length, np.float32)
    arr[position] = 1.0
    return arr


def white_noise(seed: float = 1.0, length: int = 512) -> np.ndarray:
    """The reference's deterministic chaotic generator: x = sin(x) * 1e4,
    sample = frac(x)."""
    arr = np.zeros(length, np.float32)
    x = float(seed)
    for i in range(length):
        x = np.sin(x) * 10000.0
        arr[i] = x - np.floor(x)
    return arr


def chirp(start_freq: float, end_freq: float, length: int = 512, sample_rate: int = 44100) -> np.ndarray:
    i = np.arange(length, dtype=np.float64)
    t = i / sample_rate
    phase = 2.0 * np.pi * (start_freq * t + (end_freq - start_freq) * t * t / (2.0 * length / sample_rate))
    return np.sin(phase).astype(np.float32)


def step(position: int = 256, length: int = 512) -> np.ndarray:
    arr = np.zeros(length, np.float32)
    arr[position:] = 1.0
    return arr


def frames(signal: np.ndarray, frame_size: int = 512) -> np.ndarray:
    """Zero-pad to a whole number of frames and reshape to [F, frame_size]."""
    n = len(signal)
    nframes = max(1, -(-n // frame_size))
    out = np.zeros(nframes * frame_size, np.float32)
    out[:n] = signal
    return out.reshape(nframes, frame_size)
