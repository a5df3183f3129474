"""High-level transcode API (parity: codec/io/processor.js AudioProcessor).

Dispatches between engines:
  * "tpu"   -- jitted JAX pipelines; stereo channels ride a vmapped batch axis
  * "exact" -- gold NumPy engine, bit-faithful to the reference JavaScript

Both engines share the FrameData layout, the stream-state keys and the host
serializer, so they are interchangeable (including mid-stream).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Iterator

import numpy as np

from carta1_tpu import constants as C
from carta1_tpu.framedata import FrameData
from carta1_tpu.io import aea
from carta1_tpu.io.bitstream_np import pack_frames_fast as pack_frames
from carta1_tpu.io.bitstream_np import unpack_frames_fast as unpack_frames
from carta1_tpu.io.wav import WavInfo, read_wav, write_wav
from carta1_tpu.options import EncoderOptions

DEFAULT_CHUNK_FRAMES = 8192


def pcm_to_frames(pcm: np.ndarray) -> np.ndarray:
    """[N] samples -> zero-padded [F, 512] (processor.js:225-258)."""
    n = pcm.shape[-1]
    nframes = max(1, -(-n // C.SAMPLES_PER_FRAME))
    out = np.zeros((nframes, C.SAMPLES_PER_FRAME), np.float32)
    out.reshape(-1)[:n] = pcm
    return out


def _encode_batch(frames: np.ndarray, options: EncoderOptions, state, engine: str):
    """frames: [channels, F, 512].  Returns (FrameData [channels, F, ...]
    stacked as leading axis list, new_state)."""
    if engine == "exact":
        from carta1_tpu.gold import encoder_init_state, gold_encode_frames

        states = state if state is not None else [encoder_init_state() for _ in frames]
        fds, new_states = [], []
        for ch, st in zip(frames, states):
            fd, st2 = gold_encode_frames(ch, options, st)
            fds.append(fd)
            new_states.append(st2)
        return fds, new_states
    elif engine == "tpu":
        import jax

        from carta1_tpu.pipeline.encoder import _encode_jit, encoder_init_state

        nch = frames.shape[0]
        if state is None:
            state = jax.tree.map(lambda x: np.broadcast_to(x, (nch,) + x.shape), encoder_init_state())
        fd, new_state = jax.vmap(
            lambda p, s: _encode_jit(p, s, options.band_thresholds, options.allocation_bias)
        )(np.ascontiguousarray(frames, np.float32), state)
        fd = fd.to_numpy()
        return [fd[ch] for ch in range(nch)], new_state
    raise ValueError(f"Unknown engine: {engine}")


def _decode_batch(fds: list[FrameData], state, engine: str):
    """fds: one FrameData per channel (equal frame counts).

    Returns (pcm [channels, F, 512], new_state)."""
    if engine == "exact":
        from carta1_tpu.gold import decoder_init_state, gold_decode_frames

        states = state if state is not None else [decoder_init_state() for _ in fds]
        outs, new_states = [], []
        for fd, st in zip(fds, states):
            pcm, st2 = gold_decode_frames(fd, st)
            outs.append(pcm)
            new_states.append(st2)
        return np.stack(outs), new_states
    elif engine == "tpu":
        import jax
        import jax.numpy as jnp

        from carta1_tpu.pipeline.decoder import _decode_jit, decoder_init_state

        nch = len(fds)
        if state is None:
            state = jax.tree.map(lambda x: np.broadcast_to(np.asarray(x), (nch,) + x.shape), decoder_init_state())
        stacked = FrameData(
            n_bfu=np.stack([fd.n_bfu for fd in fds]).astype(np.int32),
            block_modes=np.stack([fd.block_modes for fd in fds]).astype(np.int32),
            scale_factors=np.stack([fd.scale_factors for fd in fds]).astype(np.int32),
            word_lengths=np.stack([fd.word_lengths for fd in fds]).astype(np.int32),
            quantized=np.stack([fd.quantized for fd in fds]).astype(np.int32),
        )
        pcm, new_state = jax.vmap(_decode_jit)(stacked, state)
        return np.asarray(pcm), new_state
    raise ValueError(f"Unknown engine: {engine}")


def encode_pcm(
    pcm: np.ndarray,
    options: EncoderOptions | None = None,
    engine: str = "tpu",
    chunk_frames: int = DEFAULT_CHUNK_FRAMES,
    on_progress: Callable[[int, int], None] | None = None,
) -> np.ndarray:
    """pcm: f32 [channels, N] -> interleaved sound units uint8 [F*C, 212].

    Long inputs stream through fixed-size chunks with stream-state carry
    (bounded memory, stable jit shapes)."""
    options = options or EncoderOptions()
    frames = np.stack([pcm_to_frames(ch) for ch in pcm])  # [C, F, 512]
    nch, nframes = frames.shape[0], frames.shape[1]
    state = None
    per_channel_units: list[list[np.ndarray]] = [[] for _ in range(nch)]
    for start in range(0, nframes, chunk_frames):
        chunk = frames[:, start:start + chunk_frames]
        fds, state = _encode_batch(chunk, options, state, engine)
        for ch, fd in enumerate(fds):
            per_channel_units[ch].append(pack_frames(fd))
        if on_progress:
            on_progress(min(start + chunk_frames, nframes), nframes)
    channel_units = [np.concatenate(u) for u in per_channel_units]
    if nch == 1:
        return channel_units[0]
    return aea.interleave_stereo(channel_units[0], channel_units[1])


def decode_units(
    units: np.ndarray,
    channel_count: int,
    engine: str = "tpu",
    chunk_frames: int = DEFAULT_CHUNK_FRAMES,
    on_progress: Callable[[int, int], None] | None = None,
) -> np.ndarray:
    """Interleaved sound units -> pcm f32 [channels, F*512].

    Odd stereo frame counts are padded with a silent dummy frame
    (processor.js:201-211)."""
    if channel_count == 2 and units.shape[0] % 2 == 1:
        units = np.concatenate([units, pack_frames(FrameData.zeros(1))])
    if channel_count == 1:
        channels = [units]
    else:
        channels = list(aea.deinterleave_stereo(units))
    nframes = channels[0].shape[0]
    state = None
    outs: list[np.ndarray] = []
    for start in range(0, nframes, chunk_frames):
        fds = [unpack_frames(ch[start:start + chunk_frames]) for ch in channels]
        pcm, state = _decode_batch(fds, state, engine)
        outs.append(pcm)
        if on_progress:
            on_progress(min(start + chunk_frames, nframes), nframes)
    pcm = np.concatenate(outs, axis=1)  # [C, F, 512]
    return pcm.reshape(len(channels), -1)


@dataclasses.dataclass
class TranscodeResult:
    frames: int
    channels: int
    samples: int
    duration: float


def encode_file(
    input_wav: str,
    output_aea: str,
    options: EncoderOptions | None = None,
    engine: str = "tpu",
    title: str = "",
    chunk_frames: int = DEFAULT_CHUNK_FRAMES,
    on_progress: Callable[[int, int], None] | None = None,
) -> TranscodeResult:
    info, pcm = read_wav(input_wav)
    if info.channels not in (1, 2):
        raise ValueError(f"Unsupported channel count: {info.channels}")
    units = encode_pcm(pcm, options, engine, chunk_frames, on_progress)
    aea.write_aea(output_aea, units, title=title, channel_count=info.channels)
    return TranscodeResult(
        frames=units.shape[0],
        channels=info.channels,
        samples=info.num_samples,
        duration=info.duration,
    )


def decode_file(
    input_aea: str,
    output_wav: str,
    engine: str = "tpu",
    chunk_frames: int = DEFAULT_CHUNK_FRAMES,
    on_progress: Callable[[int, int], None] | None = None,
) -> TranscodeResult:
    meta, units = aea.read_aea(input_aea)
    if meta.channel_count not in (1, 2):
        raise ValueError(f"Unsupported channel count: {meta.channel_count}")
    pcm = decode_units(units, meta.channel_count, engine, chunk_frames, on_progress)
    write_wav(output_wav, pcm)
    return TranscodeResult(
        frames=units.shape[0],
        channels=meta.channel_count,
        samples=pcm.shape[1],
        duration=pcm.shape[1] / C.SAMPLE_RATE,
    )


def encode_clips(
    clips: list[np.ndarray],
    options: EncoderOptions | None = None,
    on_progress: Callable[[int, int], None] | None = None,
) -> list[np.ndarray]:
    """Encode many independent mono clips in parallel on one chip
    (BASELINE config 4: clip axis + frame axis both vectorized).

    clips: list of f32 [N_i] sample arrays (ragged).  Each clip is an
    independent stream (fresh codec state, zero-padded tail frames like the
    reference's frame splitter).  Clips are right-padded to the longest
    clip's frame count, encoded as one [clips, F, 512] vmapped batch, and
    the padding frames are dropped per clip afterwards.

    Returns a list of uint8 [F_i, 212] sound-unit arrays, one per clip.
    """
    import jax

    from carta1_tpu.pipeline.encoder import _encode_jit, encoder_init_state

    options = options or EncoderOptions()
    frame_counts = [max(1, -(-len(c) // C.SAMPLES_PER_FRAME)) for c in clips]
    max_frames = max(frame_counts)
    batch = np.zeros((len(clips), max_frames, C.SAMPLES_PER_FRAME), np.float32)
    for i, clip in enumerate(clips):
        batch[i, : frame_counts[i]] = pcm_to_frames(clip)

    state = jax.tree.map(
        lambda x: np.broadcast_to(np.asarray(x), (len(clips),) + x.shape),
        encoder_init_state(),
    )
    fd, _ = jax.vmap(
        lambda p, s: _encode_jit(p, s, options.band_thresholds, options.allocation_bias)
    )(batch, state)
    fd = fd.to_numpy()

    out = []
    for i, nf in enumerate(frame_counts):
        out.append(pack_frames(fd[i][slice(0, nf)]))
        if on_progress:
            on_progress(i + 1, len(clips))
    return out
