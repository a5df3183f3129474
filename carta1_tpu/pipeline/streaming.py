"""Single-dispatch streaming: `lax.scan` over chunk batches with codec-state
carry.

The processor's Python chunk loop (processor.py) re-dispatches per chunk;
for very long streams this scans all chunks inside one jitted program
instead -- the state pytree is the scan carry, exactly the reference's
BufferPool role (codec/core/buffers.js:31-72) made explicit.

Equivalent to the batched pipeline (same per-chunk math); useful when
dispatch overhead or host round-trips dominate, e.g. hour-long stereo
streams (BASELINE config 3).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from carta1_tpu.framedata import FrameData
from carta1_tpu.options import EncoderOptions
from carta1_tpu.pipeline.decoder import decode_step, decoder_init_state
from carta1_tpu.pipeline.encoder import encode_step, encoder_init_state


@functools.partial(jax.jit, static_argnames=("thresholds", "allocation_bias", "allocator"))
def _encode_scan_jit(chunks, state, thresholds, allocation_bias, allocator="rdo"):
    def body(carry, pcm_chunk):
        fd, carry = encode_step(pcm_chunk, carry, thresholds, allocation_bias, allocator)
        return carry, fd

    state, fds = jax.lax.scan(body, state, chunks)
    return fds, state


def encode_stream(pcm_chunks, options: EncoderOptions | None = None, state=None):
    """pcm_chunks: f32 [nchunks, chunk_frames, 512] -> (FrameData with a
    leading [nchunks, chunk_frames] shape, final state)."""
    options = options or EncoderOptions()
    state = state if state is not None else encoder_init_state()
    return _encode_scan_jit(
        jnp.asarray(pcm_chunks),
        state,
        options.band_thresholds,
        options.allocation_bias,
        options.allocator,
    )


@jax.jit
def _decode_scan_jit(fds, state):
    def body(carry, fd):
        pcm, carry = decode_step(fd, carry)
        return carry, pcm

    state, pcm = jax.lax.scan(body, state, fds)
    return pcm, state


def decode_stream(fds: FrameData, state=None):
    """fds: FrameData with leading [nchunks, chunk_frames] axes ->
    (pcm [nchunks, chunk_frames, 512], final state)."""
    state = state if state is not None else decoder_init_state()
    return _decode_scan_jit(fds, state)


def chunk_frames_array(frames, chunk: int):
    """[F, 512] -> ([nchunks, chunk, 512], valid_frame_count) zero-padding
    the tail chunk."""
    import numpy as np

    nframes = frames.shape[0]
    nchunks = max(1, -(-nframes // chunk))
    out = np.zeros((nchunks * chunk, 512), np.float32)
    out[:nframes] = frames
    return out.reshape(nchunks, chunk, 512), nframes
