"""WAV read/write with the reference's exact PCM conversion conventions.

Read parity (bin/cli.js:316-353): 16/24/32-bit integer PCM -> f32 by dividing
by 32768 / 8388608 / 2147483648.

Write parity (codec/io/processor.js:347-426): clamp to [-1, 1], scale by
32768 for negative and 32767 for positive samples, then truncate toward zero
(JavaScript's DataView.setInt16 ToInteger conversion), little-endian 16-bit.
"""

from __future__ import annotations

import dataclasses
import struct

import numpy as np

from carta1_tpu.constants import (
    SAMPLE_RATE,
    WAV_BITS_PER_SAMPLE,
    WAV_BYTES_PER_SAMPLE,
    WAV_PCM_MAX_NEGATIVE,
    WAV_PCM_MAX_POSITIVE,
)


@dataclasses.dataclass
class WavInfo:
    channels: int
    sample_rate: int
    bit_depth: int
    num_samples: int  # per channel

    @property
    def duration(self) -> float:
        return self.num_samples / self.sample_rate


def float_to_int16(pcm: np.ndarray) -> np.ndarray:
    """f32 [-1,1] -> int16 with the reference's asymmetric scale + truncation."""
    x = np.clip(pcm.astype(np.float64), -1.0, 1.0)
    scaled = np.where(x < 0, x * WAV_PCM_MAX_NEGATIVE, x * WAV_PCM_MAX_POSITIVE)
    return np.trunc(scaled).astype(np.int16)


def int16_to_float(pcm: np.ndarray) -> np.ndarray:
    return (pcm.astype(np.float32)) / np.float32(32768.0)


def read_wav(path: str) -> tuple[WavInfo, np.ndarray]:
    """Returns (info, f32 [channels, num_samples])."""
    with open(path, "rb") as f:
        data = f.read()
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("Not a RIFF/WAVE file")
    pos = 12
    fmt = None
    pcm_bytes = None
    while pos + 8 <= len(data):
        chunk_id = data[pos:pos + 4]
        chunk_size = int.from_bytes(data[pos + 4:pos + 8], "little")
        body = data[pos + 8:pos + 8 + chunk_size]
        if chunk_id == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif chunk_id == b"data":
            pcm_bytes = body
        pos += 8 + chunk_size + (chunk_size & 1)
    if fmt is None or pcm_bytes is None:
        raise ValueError("Missing fmt/data chunk")
    audio_format, channels, sample_rate, _, _, bit_depth = fmt
    if audio_format not in (1, 0xFFFE):
        raise ValueError(f"Unsupported WAV format code {audio_format}")

    if bit_depth == 16:
        samples = np.frombuffer(pcm_bytes, dtype="<i2").astype(np.float32) / 32768.0
    elif bit_depth == 24:
        raw = np.frombuffer(pcm_bytes, dtype=np.uint8)
        raw = raw[: (len(raw) // 3) * 3].reshape(-1, 3).astype(np.int32)
        vals = raw[:, 0] | (raw[:, 1] << 8) | (raw[:, 2] << 16)
        vals = np.where(vals > 0x7FFFFF, vals - 0x1000000, vals)
        samples = vals.astype(np.float32) / 8388608.0
    elif bit_depth == 32:
        samples = np.frombuffer(pcm_bytes, dtype="<i4").astype(np.float32) / 2147483648.0
    else:
        raise ValueError(f"Unsupported bit depth {bit_depth}")

    n = len(samples) // channels
    deinterleaved = samples[: n * channels].reshape(n, channels).T.copy()
    info = WavInfo(channels=channels, sample_rate=sample_rate, bit_depth=bit_depth, num_samples=n)
    return info, deinterleaved


def write_wav(path: str, pcm: np.ndarray, sample_rate: int = SAMPLE_RATE) -> None:
    """pcm: f32 [channels, num_samples] -> 16-bit PCM WAV."""
    pcm = np.atleast_2d(pcm)
    channels, n = pcm.shape
    int16 = float_to_int16(pcm)
    interleaved = np.ascontiguousarray(int16.T).astype("<i2")

    byte_rate = sample_rate * channels * WAV_BYTES_PER_SAMPLE
    block_align = channels * WAV_BYTES_PER_SAMPLE
    data_size = n * block_align
    with open(path, "wb") as f:
        f.write(b"RIFF")
        f.write(struct.pack("<I", 36 + data_size))
        f.write(b"WAVE")
        f.write(b"fmt ")
        f.write(struct.pack("<IHHIIHH", 16, 1, channels, sample_rate, byte_rate, block_align, WAV_BITS_PER_SAMPLE))
        f.write(b"data")
        f.write(struct.pack("<I", data_size))
        f.write(interleaved.tobytes())
