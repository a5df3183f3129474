"""High-level transcode API (parity: codec/io/processor.js AudioProcessor).

Dispatches between engines:
  * "tpu"   -- jitted JAX pipelines; stereo channels ride a vmapped batch axis
  * "exact" -- gold NumPy engine, bit-faithful to the reference JavaScript

Both engines share the FrameData layout, the stream-state keys and the host
serializer, so they are interchangeable (including mid-stream).
"""

from __future__ import annotations

import dataclasses
import os
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


import functools


@functools.lru_cache(maxsize=None)
def _encode_vmap_jit(thresholds, allocation_bias, allocator, from_i16=False):
    """hoisted_jit(vmap(encode_step + in-graph pack)) cached per option set.

    Lessons baked in here (all measured; PERF.md "Relay transfer
    pathology"):
      * vmap applied at call time re-TRACES the whole encoder graph on
        every chunk (measured ~5 s/chunk host time); the transform is
        built once.
      * the bitstream is packed ON DEVICE (ops/bitpack) so only the
        212-byte sound units cross the host boundary.  Downloading raw
        FrameData is ~136 MB per 2x8192-frame chunk vs ~3.5 MB of units.
      * hoisted_jit passes table constants as device-resident arguments
        instead of embedding them in the executable (relay rule 2).
      * from_i16 converts raw int16 WAV samples ON DEVICE (bitwise equal
        to the host conversion — exact power-of-two divide) at half the
        upload bytes."""
    import jax

    from carta1_tpu.jaxtools import hoisted_jit
    from carta1_tpu.ops.bitpack import pack_frames as pack_device
    from carta1_tpu.ops.pcm import int16_to_float
    from carta1_tpu.pipeline.encoder import encode_step

    def one(p, s):
        if from_i16:
            p = int16_to_float(p)
        fd, s2 = encode_step(p, s, thresholds, allocation_bias, allocator)
        return pack_device(fd), s2

    return hoisted_jit(jax.vmap(one))


@functools.lru_cache(maxsize=None)
def _decode_vmap_jit(to_i16=False, short_cap=None):
    """hoisted_jit(vmap(in-graph unpack + decode_step)) (see _encode_vmap_jit).

    to_i16 applies the reference's f32->int16 WAV conversion ON DEVICE
    (ops/pcm.float_to_int16, bitwise equal to the host conversion) so the
    decoded stream crosses the relay at 2 bytes/sample.

    short_cap enables block-mode partitioning of the IMDCT stage
    (ops/exact_decode._short_path_partitioned); an int is one capacity, a
    tuple a capacity ladder (r5).  Under vmap lax.cond degenerates to
    both-branches-executed, so the fits-in-cap check is hoisted HERE,
    above the channel vmap: block modes are read straight from each
    unit's 16-bit header (serialization.js:46-53 — the same bits
    ops/bitpack.unpack_frames decodes) and nested conds pick the smallest
    fitting partitioned graph — or compute-both — for the whole chunk."""
    import jax
    import jax.numpy as jnp

    from carta1_tpu.jaxtools import hoisted_jit
    from carta1_tpu.ops.bitpack import unpack_frames as unpack_device
    from carta1_tpu.ops.pcm import float_to_int16
    from carta1_tpu.pipeline.decoder import decode_step

    def one(cap):
        def f(units, s):
            pcm, s2 = decode_step(
                unpack_device(units), s, short_cap=cap, assume_fits=cap is not None
            )
            if to_i16:
                pcm = float_to_int16(pcm)
            return pcm, s2

        return jax.vmap(f)

    caps = short_cap if isinstance(short_cap, tuple) else (
        () if short_cap is None else (short_cap,)
    )
    caps = tuple(sorted({c for c in caps if c > 0}))
    if not caps:
        return hoisted_jit(one(None))

    parts, full = [one(c) for c in caps], one(None)

    def dispatch(units, s):
        # units [C, F, 212]: header halfword = (b0 << 8) | b1; a band is
        # short-mode when its stored 2-bit field != the long-mode value
        h = (units[..., 0].astype(jnp.int32) << 8) | units[..., 1].astype(jnp.int32)
        is_short = jnp.stack(
            [
                (2 - ((h >> 14) & 3)) != 0,
                (2 - ((h >> 12) & 3)) != 0,
                (3 - ((h >> 10) & 3)) != 0,
            ],
            axis=-1,
        )                                                # [C, F, 3]
        max_count = jnp.max(jnp.sum(is_short, axis=1, dtype=jnp.int32))

        def _select(i: int):
            if i == len(caps):
                return full(units, s)
            return jax.lax.cond(
                max_count <= caps[i],
                lambda: parts[i](units, s),
                lambda: _select(i + 1),
            )

        return _select(0)

    return hoisted_jit(dispatch)


def _broadcast_state_np(template, nch: int):
    """Host zero state [nch, ...] from a device template's METADATA only.

    np.broadcast_to on a jnp leaf would call __array__ — a tiny D2H that
    permanently poisons this runtime's H2D path (jaxtools docstring)."""
    import jax

    return jax.tree.map(
        lambda x: np.zeros((nch,) + np.shape(x), np.result_type(x)), template
    )


def _encode_batch(frames: np.ndarray, options: EncoderOptions, state, engine: str):
    """frames: [channels, F, 512].  Returns (per-channel packed sound units
    [uint8 [F, 212], ...], new_state)."""
    if engine == "exact":
        from carta1_tpu.gold import encoder_init_state, gold_encode_frames

        states = state if state is not None else [encoder_init_state() for _ in frames]
        fds, new_states = [], []
        for ch, st in zip(frames, states):
            fd, st2 = gold_encode_frames(ch, options, st)
            fds.append(pack_frames(fd))
            new_states.append(st2)
        return fds, new_states
    elif engine == "tpu":
        units, new_state = _encode_batch_dev(frames, options, state)
        from carta1_tpu.jaxtools import fetch

        units = fetch(units)
        return [units[ch] for ch in range(units.shape[0])], new_state
    raise ValueError(f"Unknown engine: {engine}")


def _encode_batch_dev(frames: np.ndarray, options: EncoderOptions, state):
    """Device encode of one chunk; units STAY on device ([C, F, 212]).

    frames: [channels, F, 512] f32 — or int16 raw WAV samples, converted
    in-graph (bitwise equal, half the upload).  Dispatch is async: callers
    may pipeline reads against device compute and defer every download
    (jaxtools.fetch) to the end of the stream."""
    from carta1_tpu.pipeline.encoder import encoder_init_state

    nch = frames.shape[0]
    if state is None:
        state = _broadcast_state_np(encoder_init_state(), nch)
    from_i16 = frames.dtype == np.int16
    if not from_i16 and frames.dtype != np.float32:
        # normalize exotic dtypes (f64 PCM, int32, ...) on host: one jit
        # variant, no reliance on implicit downcast semantics
        frames = np.ascontiguousarray(frames, np.float32)
    fn = _encode_vmap_jit(
        options.band_thresholds, options.allocation_bias, options.allocator, from_i16
    )
    return fn(np.ascontiguousarray(frames), state)


def _decode_batch(chans: list[np.ndarray], state, engine: str):
    """chans: one uint8 [F, 212] unit array per channel (equal counts).

    Returns (pcm [channels, F, 512], new_state).  The tpu engine unpacks
    in-graph, so only the 212-byte units travel to the device."""
    if engine == "exact":
        from carta1_tpu.gold import decoder_init_state, gold_decode_frames

        states = state if state is not None else [decoder_init_state() for _ in chans]
        outs, new_states = [], []
        for units, st in zip(chans, states):
            pcm, st2 = gold_decode_frames(unpack_frames(units), st)
            outs.append(pcm)
            new_states.append(st2)
        return np.stack(outs), new_states
    elif engine == "tpu":
        from carta1_tpu.jaxtools import fetch

        pcm, new_state = _decode_batch_dev(chans, state)
        return fetch(pcm), new_state
    raise ValueError(f"Unknown engine: {engine}")


def _decode_batch_dev(chans: list[np.ndarray], state, to_i16: bool = False):
    """Device decode of one chunk; PCM STAYS on device ([C, F, 512]).

    to_i16 emits int16 samples (in-graph reference WAV conversion,
    bitwise equal to the host path) — half the download bytes."""
    from carta1_tpu.pipeline.decoder import auto_short_cap, decoder_init_state

    nch = len(chans)
    if state is None:
        state = _broadcast_state_np(decoder_init_state(), nch)
    stacked = np.ascontiguousarray(np.stack(chans), dtype=np.uint8)
    return _decode_vmap_jit(to_i16, auto_short_cap(stacked.shape[1]))(stacked, state)


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
    if engine == "tpu":
        # defer every download to the end (PERF.md relay rules): the
        # first D2H would slow all later chunk uploads ~50x.  The spool
        # honors CARTA1_SPOOL_LIMIT_BYTES like encode_file does, so
        # hour-scale in-memory inputs cannot exhaust HBM (drains early —
        # correct, just slower).
        from carta1_tpu.jaxtools import fetch

        spool = []
        spool_bytes = 0
        spool_limit = int(os.environ.get("CARTA1_SPOOL_LIMIT_BYTES", 2 << 30))

        def _drain():
            nonlocal spool_bytes
            for units_dev in spool:
                u = fetch(units_dev)
                for ch in range(nch):
                    per_channel_units[ch].append(u[ch])
            spool.clear()
            spool_bytes = 0

        for start in range(0, nframes, chunk_frames):
            units_dev, state = _encode_batch_dev(frames[:, start:start + chunk_frames], options, state)
            spool.append(units_dev)
            spool_bytes += nch * chunk_frames * C.SOUND_UNIT_SIZE
            if spool_bytes >= spool_limit:
                _drain()
            if on_progress:
                on_progress(min(start + chunk_frames, nframes), nframes)
        _drain()
    else:
        for start in range(0, nframes, chunk_frames):
            chunk = frames[:, start:start + chunk_frames]
            units, state = _encode_batch(chunk, options, state, engine)
            for ch, u in enumerate(units):
                per_channel_units[ch].append(u)
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
    if engine == "tpu":
        # decoded chunks are [C, chunk, 512] f32 (~16 MB per stereo 8192-
        # frame chunk) — the spool guard matters even more than on the
        # encode side (ADVICE r3): drain early past the HBM budget.
        from carta1_tpu.jaxtools import fetch

        spool = []
        spool_bytes = 0
        spool_limit = int(os.environ.get("CARTA1_SPOOL_LIMIT_BYTES", 2 << 30))

        def _drain():
            nonlocal spool_bytes
            for p in spool:
                outs.append(fetch(p))
            spool.clear()
            spool_bytes = 0

        for start in range(0, nframes, chunk_frames):
            pcm_dev, state = _decode_batch_dev([ch[start:start + chunk_frames] for ch in channels], state)
            spool.append(pcm_dev)
            spool_bytes += len(channels) * chunk_frames * C.SAMPLES_PER_FRAME * 4
            if spool_bytes >= spool_limit:
                _drain()
            if on_progress:
                on_progress(min(start + chunk_frames, nframes), nframes)
        _drain()
    else:
        for start in range(0, nframes, chunk_frames):
            pcm, state = _decode_batch([ch[start:start + chunk_frames] for ch in channels], state, engine)
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


_SHARD_HALO = 2  # frames of lookback that fully determine codec state


def _encode_chunk_sharded(chunk: np.ndarray, state, options: EncoderOptions, mesh):
    """Sharded encode of one streaming chunk with exact state carry.

    Codec state after frame k is a function of raw frames k-1..k alone
    (parallel/sharding.py), so carrying the previous chunk's last two raw
    frames as an in-batch prefix reconstructs the stream state exactly —
    the file-striping axis (corpus driver) and the frame-sharding axis
    (device mesh) compose without any cross-chunk pytree plumbing.

    chunk: [C, n, 512].  state: None | per-channel {"prev_pcm": [2, 512]}.
    Returns (fds, new_state) matching _encode_batch's contract."""
    from carta1_tpu.parallel.sharding import encode_frames_sharded

    nch = chunk.shape[0]
    fds = []
    for ch in range(nch):
        if state is None:
            fd = encode_frames_sharded(chunk[ch], options, mesh)
        else:
            ext = np.concatenate([state[ch]["prev_pcm"], chunk[ch]])
            fd = encode_frames_sharded(ext, options, mesh)[slice(_SHARD_HALO, None)]
        fds.append(fd.to_numpy())
    tail = chunk[:, -_SHARD_HALO:]
    if tail.shape[1] < _SHARD_HALO:  # sub-halo chunk: keep carry from before
        prev = np.stack([state[ch]["prev_pcm"] for ch in range(nch)]) if state else np.zeros((nch, _SHARD_HALO, 512), np.float32)
        tail = np.concatenate([prev, chunk], axis=1)[:, -_SHARD_HALO:]
    new_state = [{"prev_pcm": tail[ch]} for ch in range(nch)]
    return fds, new_state


def _decode_chunk_sharded(chans: list[np.ndarray], state, mesh):
    """Sharded decode of one streaming chunk (mirror of the encode side).

    chans: per-channel uint8 [n, 212].  state: None | per-channel
    {"prev_units": [2, 212]}.  Returns (pcm [C, n, 512], new_state)."""
    from carta1_tpu.parallel.sharding import decode_frames_sharded

    outs = []
    new_state = []
    for ch, units in enumerate(chans):
        if state is None:
            fd = unpack_frames(units)
            pcm = decode_frames_sharded(fd, mesh)
        else:
            ext = np.concatenate([state[ch]["prev_units"], units])
            pcm = decode_frames_sharded(unpack_frames(ext), mesh)[_SHARD_HALO:]
        outs.append(np.asarray(pcm))
        if units.shape[0] >= _SHARD_HALO:
            tail = units[-_SHARD_HALO:]
        else:
            prev = state[ch]["prev_units"] if state else np.zeros((_SHARD_HALO, C.SOUND_UNIT_SIZE), np.uint8)
            tail = np.concatenate([prev, units])[-_SHARD_HALO:]
        new_state.append({"prev_units": np.asarray(tail)})
    return np.stack(outs), new_state


def _state_to_list(state, nch: int) -> list[dict[str, np.ndarray]]:
    """Engine state -> per-channel list of numpy dicts (checkpoint form)."""
    if state is None:
        return []
    if isinstance(state, list):  # exact engine
        return [{k: np.asarray(v) for k, v in st.items()} for st in state]
    return [{k: np.asarray(v)[ch] for k, v in state.items()} for ch in range(nch)]


def _state_from_list(states: list[dict[str, np.ndarray]], engine: str):
    if not states:
        return None
    if engine == "exact":
        return [dict(st) for st in states]
    return {k: np.stack([st[k] for st in states]) for k in states[0]}


def encode_file(
    input_wav: str,
    output_aea: str,
    options: EncoderOptions | None = None,
    engine: str = "tpu",
    title: str = "",
    chunk_frames: int = DEFAULT_CHUNK_FRAMES,
    on_progress: Callable[[int, int], None] | None = None,
    checkpoint: str | None = None,
    checkpoint_every: int = 4,
    mesh=None,
    timings: dict | None = None,
) -> TranscodeResult:
    """Bounded-memory streaming encode: memmapped WAV in, incremental AEA
    out, O(chunk) host memory regardless of file length (reference streams
    the same way, bin/cli.js:165-354).

    With `checkpoint`, progress is snapshotted atomically every
    `checkpoint_every` chunks as (frame offset, codec-state pytree); a
    killed run resumes mid-file and produces byte-identical output (chunk
    boundaries are part of the checkpoint, so the jit batch split — and
    therefore every rounding — replays identically).

    `timings`, if given, is filled with a wall-clock phase breakdown
    (read_s, dispatch_s, drain_fetch_s, write_s, n_drains) so a slow run
    is attributable — no opaque single number (VERDICT r3 item 2)."""
    import time as _time
    from carta1_tpu.io.streams import AeaStreamWriter, StreamCheckpoint, WavStreamReader

    reader = WavStreamReader(input_wav)
    nch = reader.info.channels
    if nch not in (1, 2):
        raise ValueError(f"Unsupported channel count: {nch}")
    nframes = reader.num_frames
    options = options or EncoderOptions()

    start = 0
    state = None
    ckpt = StreamCheckpoint(checkpoint) if checkpoint else None
    if ckpt is not None:
        loaded = ckpt.load()
        if loaded is not None:
            off, st_list, meta = loaded
            if (
                meta.get("input") == os.path.abspath(input_wav)
                and meta.get("chunk_frames") == chunk_frames
                and os.path.exists(output_aea)
            ):
                start = off
                state = st_list if mesh is not None else _state_from_list(st_list, engine)
    writer = AeaStreamWriter(
        output_aea, title=title, channel_count=nch,
        resume_at_frame=(start * nch if start else None),
    )

    # Device spool: unit outputs accumulate ON DEVICE and are downloaded
    # once at end-of-stream (or at checkpoint / memory-guard boundaries).
    # Rationale (PERF.md "Relay transfer pathology"): the first D2H copy
    # permanently degrades this runtime's H2D path ~50x, so the fast plan
    # is all-uploads-then-all-downloads.  212 B/frame/ch means ~0.9 GB of
    # HBM per hour of stereo audio — the guard drains early if a stream
    # outgrows the budget (correct, just slower).
    spool: list[tuple[object, int]] = []  # (device units [C, n_chunk, 212], n_real)
    spool_bytes = 0
    spool_limit = int(os.environ.get("CARTA1_SPOOL_LIMIT_BYTES", 2 << 30))
    ph = {"read_s": 0.0, "dispatch_s": 0.0, "drain_fetch_s": 0.0, "write_s": 0.0,
          "n_drains": 0, "drain_bytes": 0}

    def _drain() -> None:
        nonlocal spool_bytes
        from carta1_tpu.jaxtools import fetch_many

        # pipelined drain (r5): the next chunk's slice copies stream over
        # the relay while this chunk is assembled and written — a plain
        # fetch() loop serialized chunk transfers behind host writes and
        # ran ~4-5x under the k-sliced plateau (VERDICT r4 item 2)
        fetched = fetch_many([units_dev for units_dev, _ in spool])
        for _, n_real in spool:
            t = _time.perf_counter()
            u = next(fetched)
            ph["drain_fetch_s"] += _time.perf_counter() - t
            ph["drain_bytes"] += u.nbytes
            per_ch = [u[ch, :n_real] for ch in range(nch)]
            t = _time.perf_counter()
            writer.append(per_ch[0] if nch == 1 else aea.interleave_stereo(per_ch[0], per_ch[1]))
            ph["write_s"] += _time.perf_counter() - t
        if spool:
            ph["n_drains"] += 1
        spool.clear()
        spool_bytes = 0

    use_dev_spool = mesh is None and engine == "tpu"
    chunk_idx = 0
    for cs in range(start, nframes, chunk_frames):
        n = min(chunk_frames, nframes - cs)
        # always feed the full chunk shape (reader zero-pads past EOF) so a
        # stream of any length compiles exactly one encode program; padding
        # frames are silence appended AFTER the real data and their units
        # are sliced away
        if use_dev_spool:
            t = _time.perf_counter()
            raw = reader.read_frames_i16(cs, chunk_frames)
            if raw is None:  # 24/32-bit input: f32 upload path
                raw = reader.read_frames(cs, chunk_frames)
            chunk = raw.reshape(nch, chunk_frames, C.SAMPLES_PER_FRAME)
            ph["read_s"] += _time.perf_counter() - t
            t = _time.perf_counter()
            units_dev, state = _encode_batch_dev(chunk, options, state)
            ph["dispatch_s"] += _time.perf_counter() - t
            spool.append((units_dev, n))
            spool_bytes += nch * chunk_frames * C.SOUND_UNIT_SIZE
            if spool_bytes >= spool_limit:
                _drain()
        else:
            chunk = reader.read_frames(cs, chunk_frames).reshape(nch, chunk_frames, C.SAMPLES_PER_FRAME)
            if mesh is not None:
                fds, state = _encode_chunk_sharded(chunk, state, options, mesh)
                per_ch = [pack_frames(fd)[:n] for fd in fds]
            else:
                per_ch, state = _encode_batch(chunk, options, state, engine)
                per_ch = [u[:n] for u in per_ch]
            writer.append(per_ch[0] if nch == 1 else aea.interleave_stereo(per_ch[0], per_ch[1]))
        chunk_idx += 1
        if ckpt is not None and (chunk_idx % checkpoint_every == 0):
            _drain()
            writer.flush()
            ckpt.save(cs + n, _state_to_list(state, nch),
                      {"input": os.path.abspath(input_wav), "chunk_frames": chunk_frames})
        if on_progress:
            on_progress(cs + n, nframes)
    _drain()
    if timings is not None:
        timings.update({k: (round(v, 4) if isinstance(v, float) else v) for k, v in ph.items()})
    total_units = writer.frames_written
    writer.close()
    if ckpt is not None:
        ckpt.remove()
    return TranscodeResult(
        frames=total_units,
        channels=nch,
        samples=reader.info.num_samples,
        duration=reader.info.duration,
    )


def decode_file(
    input_aea: str,
    output_wav: str,
    engine: str = "tpu",
    chunk_frames: int = DEFAULT_CHUNK_FRAMES,
    on_progress: Callable[[int, int], None] | None = None,
    checkpoint: str | None = None,
    checkpoint_every: int = 4,
    mesh=None,
    timings: dict | None = None,
) -> TranscodeResult:
    """Bounded-memory streaming decode (mirror of encode_file, including
    the per-phase wall-clock attribution via `timings`)."""
    import time as _time
    from carta1_tpu.io.streams import AeaStreamReader, StreamCheckpoint, WavStreamWriter

    reader = AeaStreamReader(input_aea)
    nch = reader.meta.channel_count
    if nch not in (1, 2):
        raise ValueError(f"Unsupported channel count: {nch}")
    total_units = reader.num_units
    # odd stereo unit counts get a silent dummy tail frame (processor.js:201-211)
    pad_unit = total_units % 2 == 1 and nch == 2
    frames_per_ch = (total_units + (1 if pad_unit else 0)) // nch

    start = 0
    state = None
    ckpt = StreamCheckpoint(checkpoint) if checkpoint else None
    if ckpt is not None:
        loaded = ckpt.load()
        if loaded is not None:
            off, st_list, meta = loaded
            if (
                meta.get("input") == os.path.abspath(input_aea)
                and meta.get("chunk_frames") == chunk_frames
                and os.path.exists(output_wav)
            ):
                start = off
                state = st_list if mesh is not None else _state_from_list(st_list, engine)
    writer = WavStreamWriter(
        output_wav, channels=nch,
        resume_at_samples=(start * C.SAMPLES_PER_FRAME if start else None),
    )

    # Device spool, mirror of encode_file: decoded PCM accumulates on
    # device as int16 (in-graph reference WAV conversion, bitwise equal to
    # the host path at half the bytes) and downloads once at end-of-stream.
    spool: list[tuple[object, int]] = []  # (device int16 [C, n_chunk, 512], n_real)
    spool_bytes = 0
    spool_limit = int(os.environ.get("CARTA1_SPOOL_LIMIT_BYTES", 2 << 30))
    ph = {"read_s": 0.0, "dispatch_s": 0.0, "drain_fetch_s": 0.0, "write_s": 0.0,
          "n_drains": 0, "drain_bytes": 0}

    def _drain() -> None:
        nonlocal spool_bytes
        from carta1_tpu.jaxtools import fetch_many

        # pipelined drain (see encode_file._drain): next chunk's slices
        # stream while this chunk is written
        fetched = fetch_many([pcm_dev for pcm_dev, _ in spool])
        for _, n_real in spool:
            t = _time.perf_counter()
            pcm = next(fetched)
            ph["drain_fetch_s"] += _time.perf_counter() - t
            ph["drain_bytes"] += pcm.nbytes
            t = _time.perf_counter()
            writer.append_i16(pcm[:, :n_real].reshape(nch, -1))
            ph["write_s"] += _time.perf_counter() - t
        if spool:
            ph["n_drains"] += 1
        spool.clear()
        spool_bytes = 0

    use_dev_spool = mesh is None and engine == "tpu"
    chunk_idx = 0
    zero_unit = pack_frames(FrameData.zeros(1))
    for cs in range(start, frames_per_ch, chunk_frames):
        n = min(chunk_frames, frames_per_ch - cs)
        t = _time.perf_counter()
        if nch == 1:
            chans = [reader.read_units(cs, n)]
        else:
            raw = reader.read_units(2 * cs, 2 * n)
            if raw.shape[0] % 2 == 1:  # padded tail
                raw = np.concatenate([raw, zero_unit])
            chans = list(aea.deinterleave_stereo(raw))
        # fixed chunk shape (see encode_file): pad the tail with silent
        # units, decode, slice the padding back off
        if n < chunk_frames:
            pad = np.broadcast_to(zero_unit, (chunk_frames - n, C.SOUND_UNIT_SIZE))
            chans = [np.concatenate([ch, pad]) for ch in chans]
        ph["read_s"] += _time.perf_counter() - t
        if use_dev_spool:
            t = _time.perf_counter()
            pcm_dev, state = _decode_batch_dev(chans, state, to_i16=True)
            ph["dispatch_s"] += _time.perf_counter() - t
            spool.append((pcm_dev, n))
            spool_bytes += nch * chunk_frames * C.SAMPLES_PER_FRAME * 2
            if spool_bytes >= spool_limit:
                _drain()
        elif mesh is not None:
            pcm, state = _decode_chunk_sharded(chans, state, mesh)
            writer.append(pcm[:, :n].reshape(nch, -1))
        else:
            pcm, state = _decode_batch(chans, state, engine)
            writer.append(pcm[:, :n].reshape(nch, -1))
        chunk_idx += 1
        if ckpt is not None and (chunk_idx % checkpoint_every == 0):
            _drain()
            ckpt.save(cs + n, _state_to_list(state, nch),
                      {"input": os.path.abspath(input_aea), "chunk_frames": chunk_frames})
        if on_progress:
            on_progress(cs + n, frames_per_ch)
    _drain()
    if timings is not None:
        timings.update({k: (round(v, 4) if isinstance(v, float) else v) for k, v in ph.items()})
    samples = frames_per_ch * C.SAMPLES_PER_FRAME
    writer.close()
    if ckpt is not None:
        ckpt.remove()
    return TranscodeResult(
        frames=total_units,
        channels=nch,
        samples=samples,
        duration=samples / C.SAMPLE_RATE,
    )


def encode_clips(
    clips: list[np.ndarray],
    options: EncoderOptions | None = None,
    on_progress: Callable[[int, int], None] | None = None,
) -> list[np.ndarray]:
    """Encode many independent clips in parallel on one chip
    (BASELINE config 4: clip axis + frame axis both vectorized).

    clips: list of f32 sample arrays (ragged): [N_i] mono or
    [channels, N_i] with 1 or 2 channels.  Each clip is an independent
    stream (fresh codec state, zero-padded tail frames like the
    reference's frame splitter).  Every channel of every clip becomes one
    row of a single [rows, F, 512] vmapped batch (right-padded to the
    longest clip), so a mixed mono/stereo corpus still encodes as one
    device dispatch; the padding frames are dropped per clip afterwards.

    Returns one uint8 sound-unit array per clip: [F_i, 212] for mono,
    [2*F_i, 212] interleaved L,R for stereo (the reference's stereo frame
    order, processor.js:100-115).
    """
    import jax

    from carta1_tpu.pipeline.encoder import encoder_init_state

    options = options or EncoderOptions()
    chans: list[np.ndarray] = []       # flattened channel rows
    row_of: list[tuple[int, ...]] = [] # per clip: row index per channel
    for clip in clips:
        clip = np.asarray(clip, np.float32)
        if clip.ndim == 1:
            clip = clip[None]
        if clip.ndim != 2 or clip.shape[0] not in (1, 2):
            raise ValueError(f"clip must be [N] or [1|2, N], got shape {clip.shape}")
        row_of.append(tuple(range(len(chans), len(chans) + clip.shape[0])))
        chans.extend(clip)
    frame_counts = [max(1, -(-c.shape[-1] // C.SAMPLES_PER_FRAME)) for c in chans]
    max_frames = max(frame_counts)
    batch = np.zeros((len(chans), max_frames, C.SAMPLES_PER_FRAME), np.float32)
    for i, ch in enumerate(chans):
        batch[i, : frame_counts[i]] = pcm_to_frames(ch)

    from carta1_tpu.jaxtools import fetch

    state = _broadcast_state_np(encoder_init_state(), len(chans))
    units, _ = _encode_vmap_jit(options.band_thresholds, options.allocation_bias, options.allocator)(batch, state)
    units = fetch(units)  # [rows, F, 212], packed on device

    out = []
    for i, rows in enumerate(row_of):
        if len(rows) == 1:
            out.append(units[rows[0], : frame_counts[rows[0]]])
        else:
            l, r = rows
            nf = frame_counts[l]
            out.append(aea.interleave_stereo(units[l, :nf], units[r, :nf]))
        if on_progress:
            on_progress(i + 1, len(clips))
    return out
