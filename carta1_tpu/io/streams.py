"""Bounded-memory streaming host IO: chunked WAV/AEA readers and writers
plus mid-stream checkpoints.

Reference parity: the JS pipeline streams end-to-end (WavReader
bin/cli.js:165-354, AeaReader codec/io/readers.js:41-55, async generators in
codec/io/processor.js).  The batch engine needs the host side to do the
same: a 10-hour 44.1 kHz stereo WAV is ~6 GB of samples — whole-file reads
(io/wav.py) are fine for clips but not for corpus configs 3/5.

Pieces:
  * WavStreamReader  — header parse + np.memmap of the data chunk; converts
    only the requested frame range to f32 (same 16/24/32-bit conventions as
    io/wav.py).
  * WavStreamWriter  — incremental 16-bit PCM writer; sizes patched on close.
  * AeaStreamWriter  — incremental sound-unit writer; frame count patched on
    close; seekable for idempotent resume.
  * AeaStreamReader  — memmap over the unit table (partial trailing unit
    dropped, readers.js:49-54).
  * StreamCheckpoint — atomic (tmp+rename) snapshot of (input, output,
    frame offset, codec-state pytree) so a killed transcode resumes
    mid-file with byte-identical output (SURVEY §5 checkpoint/resume).
"""

from __future__ import annotations

import dataclasses
import json
import os
import struct

import numpy as np

from carta1_tpu.constants import (
    AEA_HEADER_SIZE,
    SAMPLE_RATE,
    SAMPLES_PER_FRAME,
    SOUND_UNIT_SIZE,
    WAV_BITS_PER_SAMPLE,
    WAV_BYTES_PER_SAMPLE,
)
from carta1_tpu.io import aea
from carta1_tpu.io.wav import WavInfo, float_to_int16


# ---------------------------------------------------------------------------
# WAV streaming
# ---------------------------------------------------------------------------
class WavStreamReader:
    """Chunked WAV reader over a memory map (no whole-file materialization).

    read_frames(start, count) returns f32 [channels, count*512], zero-padded
    past end-of-file like the reference's frame splitter
    (processor.js:225-258)."""

    def __init__(self, path: str):
        self.path = path
        size = os.path.getsize(path)
        with open(path, "rb") as f:
            head = f.read(12)
            if head[:4] != b"RIFF" or head[8:12] != b"WAVE":
                raise ValueError("Not a RIFF/WAVE file")
            pos = 12
            fmt = None
            data_off = data_len = None
            while pos + 8 <= size:
                f.seek(pos)
                hdr = f.read(8)
                if len(hdr) < 8:
                    break
                chunk_id = hdr[:4]
                chunk_size = int.from_bytes(hdr[4:8], "little")
                if chunk_id == b"fmt ":
                    fmt = struct.unpack("<HHIIHH", f.read(16))
                elif chunk_id == b"data":
                    data_off, data_len = pos + 8, min(chunk_size, size - pos - 8)
                pos += 8 + chunk_size + (chunk_size & 1)
        if fmt is None or data_off is None:
            raise ValueError("Missing fmt/data chunk")
        audio_format, channels, sample_rate, _, _, bit_depth = fmt
        if audio_format not in (1, 0xFFFE):
            raise ValueError(f"Unsupported WAV format code {audio_format}")
        if bit_depth not in (16, 24, 32):
            raise ValueError(f"Unsupported bit depth {bit_depth}")
        self._bps = bit_depth // 8
        frame_bytes = channels * self._bps
        n = data_len // frame_bytes
        self.info = WavInfo(channels=channels, sample_rate=sample_rate, bit_depth=bit_depth, num_samples=n)
        self.num_frames = max(1, -(-n // SAMPLES_PER_FRAME))
        self._mm = np.memmap(path, dtype=np.uint8, mode="r", offset=data_off, shape=(n * frame_bytes,))

    def read_frames_i16(self, start_frame: int, count: int) -> np.ndarray | None:
        """int16 [channels, count*512] zero-padded, or None if not 16-bit.

        Raw samples for device-side conversion (ops/pcm.int16_to_float is
        bitwise equal to the host conversion): half the upload bytes of the
        f32 path, which matters on relay-attached devices (PERF.md)."""
        if self._bps != 2:
            return None
        c = self.info.channels
        s0 = start_frame * SAMPLES_PER_FRAME
        s1 = min((start_frame + count) * SAMPLES_PER_FRAME, self.info.num_samples)
        navail = max(s1 - s0, 0)
        out = np.zeros((c, count * SAMPLES_PER_FRAME), np.int16)
        if navail > 0:
            raw = self._mm[s0 * c * 2 : s1 * c * 2]
            out[:, :navail] = raw.view("<i2").reshape(navail, c).T
        return out

    def read_frames(self, start_frame: int, count: int) -> np.ndarray:
        c = self.info.channels
        s0 = start_frame * SAMPLES_PER_FRAME
        s1 = min((start_frame + count) * SAMPLES_PER_FRAME, self.info.num_samples)
        navail = max(s1 - s0, 0)
        raw = self._mm[s0 * c * self._bps : s1 * c * self._bps]
        if self._bps == 2:
            vals = raw.view("<i2").astype(np.float32) / 32768.0
        elif self._bps == 4:
            vals = raw.view("<i4").astype(np.float32) / 2147483648.0
        else:  # 24-bit
            b = raw.reshape(-1, 3).astype(np.int32)
            v = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
            v = np.where(v > 0x7FFFFF, v - 0x1000000, v)
            vals = v.astype(np.float32) / 8388608.0
        out = np.zeros((c, count * SAMPLES_PER_FRAME), np.float32)
        if navail > 0:
            out[:, :navail] = vals.reshape(navail, c).T
        return out


class WavStreamWriter:
    """Incremental 16-bit PCM WAV writer (sizes patched on close)."""

    def __init__(self, path: str, channels: int, sample_rate: int = SAMPLE_RATE,
                 resume_at_samples: int | None = None):
        self.path = path
        self.channels = channels
        if resume_at_samples is not None and os.path.exists(path):
            # keep the partial run's bytes; rewind to the checkpointed sample
            self._f = open(path, "r+b")
            self._f.seek(44 + resume_at_samples * channels * WAV_BYTES_PER_SAMPLE)
            self._f.truncate()
            self._n = resume_at_samples
            return
        self._n = 0
        self._f = open(path, "wb")
        byte_rate = sample_rate * channels * WAV_BYTES_PER_SAMPLE
        block_align = channels * WAV_BYTES_PER_SAMPLE
        self._f.write(b"RIFF" + struct.pack("<I", 0) + b"WAVE")
        self._f.write(b"fmt " + struct.pack(
            "<IHHIIHH", 16, 1, channels, sample_rate, byte_rate, block_align, WAV_BITS_PER_SAMPLE))
        self._f.write(b"data" + struct.pack("<I", 0))

    def append(self, pcm: np.ndarray) -> None:
        """pcm: f32 [channels, n] appended with the reference conversion."""
        self.append_i16(float_to_int16(np.atleast_2d(pcm)))

    def append_i16(self, int16: np.ndarray) -> None:
        """int16 [channels, n] already converted (ops/pcm.float_to_int16
        on device is bitwise equal to the host conversion).

        Interleaves channel-by-channel into one preallocated buffer and
        writes it via the buffer protocol: the old
        ``ascontiguousarray(x.T).astype(...).tobytes()`` chain made three
        full copies, the first a 2-byte-stride transpose gather — measured
        ~6 s of the 11.7 s decode-corpus run (write_s, BENCH r5 wip)."""
        int16 = np.atleast_2d(np.asarray(int16, np.int16))
        nch, n = int16.shape
        out = np.empty((n, nch), np.dtype("<i2"))
        for c in range(nch):
            out[:, c] = int16[c]
        self._f.write(memoryview(out).cast("B"))
        self._n += n

    def close(self) -> None:
        data_size = self._n * self.channels * WAV_BYTES_PER_SAMPLE
        self._f.seek(4)
        self._f.write(struct.pack("<I", 36 + data_size))
        self._f.seek(40)
        self._f.write(struct.pack("<I", data_size))
        self._f.close()


# ---------------------------------------------------------------------------
# AEA streaming
# ---------------------------------------------------------------------------
class AeaStreamWriter:
    """Incremental sound-unit writer; frame count patched on close."""

    def __init__(self, path: str, title: str = "", channel_count: int = 1, resume_at_frame: int | None = None):
        self.path = path
        self.channel_count = channel_count
        if resume_at_frame is not None and os.path.exists(path):
            self._f = open(path, "r+b")
            self._f.seek(AEA_HEADER_SIZE + resume_at_frame * SOUND_UNIT_SIZE)
            self._f.truncate()
            self._n = resume_at_frame
        else:
            self._f = open(path, "wb")
            self._f.write(aea.make_header(title, 0, channel_count))
            self._n = 0

    @property
    def frames_written(self) -> int:
        return self._n

    def append(self, units: np.ndarray) -> None:
        units = np.ascontiguousarray(units, dtype=np.uint8)
        self._f.write(memoryview(units).cast("B"))  # buffer protocol: no tobytes copy
        self._n += units.shape[0]

    def flush(self) -> None:
        self._f.flush()
        os.fsync(self._f.fileno())

    def close(self) -> None:
        self._f.seek(260)
        self._f.write(int(self._n).to_bytes(4, "little"))
        self._f.close()


class AeaStreamReader:
    """Memmapped unit-table reader (drops trailing partial units)."""

    def __init__(self, path: str):
        with open(path, "rb") as f:
            self.meta = aea.parse_header(f.read(AEA_HEADER_SIZE))
        body = os.path.getsize(path) - AEA_HEADER_SIZE
        self.num_units = body // SOUND_UNIT_SIZE
        self._mm = np.memmap(
            path, dtype=np.uint8, mode="r", offset=AEA_HEADER_SIZE,
            shape=(self.num_units, SOUND_UNIT_SIZE),
        )

    def read_units(self, start: int, count: int) -> np.ndarray:
        return np.asarray(self._mm[start : start + count])


# ---------------------------------------------------------------------------
# Mid-stream checkpoint
# ---------------------------------------------------------------------------
@dataclasses.dataclass
class StreamCheckpoint:
    """Atomic (input, output, frame offset, codec-state pytree) snapshot.

    `state` is a list of per-channel state dicts (numpy leaves).  Writing is
    tmp+rename so a crash never leaves a torn checkpoint."""

    path: str

    def save(self, frame_offset: int, state: list[dict[str, np.ndarray]], extra: dict | None = None) -> None:
        arrays: dict[str, np.ndarray] = {}
        for ch, st in enumerate(state):
            for k, v in st.items():
                arrays[f"ch{ch}__{k}"] = np.asarray(v)
        meta = {"frame_offset": int(frame_offset), "channels": len(state), **(extra or {})}
        tmp = self.path + ".tmp"
        with open(tmp, "wb") as f:
            np.savez(f, __meta__=np.frombuffer(json.dumps(meta).encode(), np.uint8), **arrays)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self.path)

    def load(self) -> tuple[int, list[dict[str, np.ndarray]], dict] | None:
        if not os.path.exists(self.path):
            return None
        z = np.load(self.path)
        meta = json.loads(bytes(z["__meta__"]).decode())
        state = [dict() for _ in range(meta["channels"])]
        for key in z.files:
            if key == "__meta__":
                continue
            ch, name = key.split("__", 1)
            state[int(ch[2:])][name] = z[key]
        return meta["frame_offset"], state, meta

    def remove(self) -> None:
        if os.path.exists(self.path):
            os.remove(self.path)
