"""Frame-axis data parallelism over a device mesh.

The reference codec is frame-sequential with mutable state
(codec/core/buffers.js).  Every inter-frame dependency is a finite window of
the previous <= 2 raw frames:

  encoder state after frame k  = G(raw[k-1], raw[k])      (QMF delay lines,
    transient spectra, MDCT band tails -- all derived from recent samples)
  decoder state after frame k  = H(frameData[k-1], frameData[k])

so sharding the frame axis needs NO sequential chain at all: each shard
receives its left neighbor's last two frames via `ppermute` over ICI, locally
reconstructs the exact boundary state by running the (cheap) 2-frame pipeline
from zero state, and then processes its whole shard as one batch.  Shard 0
uses the true zero stream state.  Results are bit-identical to the
single-device batched pipeline up to XLA's shape-dependent ULP wobble.

This is the TPU-native replacement for the reference's single-threaded
stream loop; stereo/file axes batch on top (processor.py), and multi-host
runs use the same code with `jax.distributed` + a host x chip mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from carta1_tpu.framedata import FrameData
from carta1_tpu.options import EncoderOptions
from carta1_tpu.pipeline.decoder import decode_step, decoder_init_state
from carta1_tpu.pipeline.encoder import encode_step, encoder_init_state

HALO_FRAMES = 2
AXIS = "frames"


def make_mesh(devices=None, axis: str = AXIS) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def _left_halo(x: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """Each shard receives its left neighbor's last HALO_FRAMES rows
    (wraparound garbage on shard 0 is masked by the caller)."""
    n = lax.axis_size(axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]
    return lax.ppermute(x[-HALO_FRAMES:], axis_name, perm)


def _mask_state(state: dict, zero_state: dict, axis_name: str) -> dict:
    """Replace the reconstructed state with the stream-start zero state on
    shard 0."""
    is_first = lax.axis_index(axis_name) == 0
    return jax.tree.map(lambda z, s: jnp.where(is_first, z, s), zero_state, state)


def _encode_local(pcm_local: jnp.ndarray, thresholds, allocation_bias, allocator, axis_name: str):
    halo = _left_halo(pcm_local, axis_name)
    _, boundary = encode_step(halo, encoder_init_state(), thresholds, allocation_bias, allocator)
    state = _mask_state(boundary, encoder_init_state(), axis_name)
    fd, _ = encode_step(pcm_local, state, thresholds, allocation_bias, allocator)
    return fd


def _decode_local(fd_local: FrameData, axis_name: str):
    halo = jax.tree.map(lambda x: _left_halo(x, axis_name), fd_local)
    _, boundary = decode_step(halo, decoder_init_state())
    state = _mask_state(boundary, decoder_init_state(), axis_name)
    pcm, _ = decode_step(fd_local, state)
    return pcm


@functools.partial(jax.jit, static_argnames=("mesh", "thresholds", "allocation_bias", "allocator"))
def _encode_sharded_jit(pcm, mesh, thresholds, allocation_bias, allocator="rdo"):
    fn = jax.shard_map(
        functools.partial(
            _encode_local,
            thresholds=thresholds,
            allocation_bias=allocation_bias,
            allocator=allocator,
            axis_name=AXIS,
        ),
        mesh=mesh,
        in_specs=P(AXIS, None),
        out_specs=P(AXIS),
    )
    return fn(pcm)


@functools.partial(jax.jit, static_argnames=("mesh",))
def _decode_sharded_jit(fd, mesh):
    fn = jax.shard_map(
        functools.partial(_decode_local, axis_name=AXIS),
        mesh=mesh,
        in_specs=P(AXIS),
        out_specs=P(AXIS),
    )
    return fn(fd)


def _pad_frames(n: int, shards: int) -> int:
    per = -(-n // shards)
    per = max(per, HALO_FRAMES)  # each shard must own >= halo frames
    return per * shards


def encode_frames_sharded(pcm, options: EncoderOptions | None = None, mesh: Mesh | None = None) -> FrameData:
    """pcm: [F, 512] f32 -> FrameData, frames sharded across the mesh.

    Pads the tail to a multiple of the shard count (padding frames encode
    silence and are dropped)."""
    options = options or EncoderOptions()
    mesh = mesh or make_mesh()
    shards = mesh.devices.size
    pcm = np.ascontiguousarray(pcm, np.float32)
    nframes = pcm.shape[0]
    total = _pad_frames(nframes, shards)
    if total != nframes:
        pcm = np.concatenate([pcm, np.zeros((total - nframes, 512), np.float32)])
    sharding = NamedSharding(mesh, P(AXIS, None))
    pcm = jax.device_put(pcm, sharding)
    fd = _encode_sharded_jit(
        pcm, mesh, options.band_thresholds, options.allocation_bias, options.allocator
    )
    return fd[slice(0, nframes)] if total != nframes else fd


def decode_frames_sharded(fd: FrameData, mesh: Mesh | None = None) -> jnp.ndarray:
    """FrameData -> pcm [F, 512], frames sharded across the mesh."""
    mesh = mesh or make_mesh()
    shards = mesh.devices.size
    fd = fd.to_numpy()
    nframes = fd.num_frames
    total = _pad_frames(nframes, shards)
    if total != nframes:
        fd = FrameData.concatenate([fd, FrameData.zeros(total - nframes)])
    fd = FrameData(
        n_bfu=fd.n_bfu.astype(np.int32),
        block_modes=fd.block_modes.astype(np.int32),
        scale_factors=fd.scale_factors.astype(np.int32),
        word_lengths=fd.word_lengths.astype(np.int32),
        quantized=fd.quantized.astype(np.int32),
    )
    put = lambda x: jax.device_put(
        x, NamedSharding(mesh, P(*([AXIS] + [None] * (x.ndim - 1))))
    )
    fd = jax.tree.map(put, fd)
    pcm = _decode_sharded_jit(fd, mesh)
    return pcm[:nframes]
