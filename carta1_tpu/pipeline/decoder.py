"""TPU batched decoder pipeline.

One jitted function turns quantized frame data into [F, 512] PCM.  Two
device paths share the structure (dequantize -> scatter -> per-band IMDCT
with a 16-sample tail halo -> high-band delay -> two QMF merges):

  * decode_step       — the default engine: BIT-EXACT against the reference
    decoder's f64-compute/f32-store arithmetic, built on the error-free f32
    expansion ops in ops/exact_decode (TPUs have no IEEE f64).
  * decode_step_fast  — plain-f32 basis-matmul/conv path (MXU), within a
    1-LSB int16 envelope of the reference; kept for throughput comparison
    and as the building block of latency-insensitive bulk pipelines.

Reference pipeline: codec/pipeline/decoder.js:408-411.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from carta1_tpu import constants as C
from carta1_tpu.framedata import FrameData
from carta1_tpu.ops import exact_decode as X
from carta1_tpu.ops.coding import dequantize, scatter_bfus
from carta1_tpu.ops.mdct import decoder_imdct_band
from carta1_tpu.ops.qmf import delay_stream, qmf_synthesis


def decoder_init_state() -> dict[str, jnp.ndarray]:
    """Zero stream state (same keys/shapes as gold.decoder_init_state)."""
    return {
        "tail0": jnp.zeros(C.MDCT_TAIL_WINDOW_SIZE, jnp.float32),
        "tail1": jnp.zeros(C.MDCT_TAIL_WINDOW_SIZE, jnp.float32),
        "tail2": jnp.zeros(C.MDCT_TAIL_WINDOW_SIZE, jnp.float32),
        "synth_low_delay": jnp.zeros(C.QMF_DELAY, jnp.float32),
        "synth_mid_delay": jnp.zeros(C.QMF_DELAY, jnp.float32),
        "synth_high_delay": jnp.zeros(C.QMF_HIGH_BAND_DELAY, jnp.float32),
    }


def decode_step(
    fd: FrameData,
    state: dict,
    short_cap: int | tuple | None = None,
    assume_fits: bool = False,
) -> tuple[jnp.ndarray, dict]:
    """Bit-exact batched decode: FrameData -> (pcm [F, 512], state).

    Every arithmetic step reproduces gold/decoder.py (and therefore the
    reference JavaScript) at the stored-bit level; see ops/exact_decode.

    `short_cap` (static) enables block-mode partitioning of the IMDCT
    stage: only a [cap]-frame compacted bucket pays the short-block
    transforms (the reference's own long/short dispatch,
    decoder.js:175-306).  An int is one capacity; a tuple is a capacity
    ladder whose in-graph conds pick the smallest fitting tier (r5).
    Bit-identical output for every input — with assume_fits=False the
    final fallback is compute-both when a band's short count exceeds the
    largest cap; assume_fits=True is for callers that hoist that check
    above a vmap (see ops/exact_decode.imdct_bands_exact)."""
    deq = X.dequantize_exact(fd.quantized, fd.scale_factors, fd.word_lengths)
    coeffs = scatter_bfus(deq, fd.block_modes, fd.n_bfu)  # [F, 512]

    outs, new_tails = X.imdct_bands_exact(
        coeffs, fd.block_modes, (state["tail0"], state["tail1"], state["tail2"]),
        short_cap=short_cap, assume_fits=assume_fits,
    )

    high_delayed, high_d = delay_stream(outs[2], state["synth_high_delay"])
    stage2, mid_d = X.qmf_synthesis_exact(outs[0], outs[1], state["synth_mid_delay"])
    pcm, low_d = X.qmf_synthesis_exact(stage2, high_delayed, state["synth_low_delay"])

    new_state = {
        "tail0": new_tails[0],
        "tail1": new_tails[1],
        "tail2": new_tails[2],
        "synth_low_delay": low_d,
        "synth_mid_delay": mid_d,
        "synth_high_delay": high_d,
    }
    return pcm, new_state


def decode_step_fast(fd: FrameData, state: dict) -> tuple[jnp.ndarray, dict]:
    """Fast (1-LSB-envelope) batched decode: FrameData -> (pcm, state)."""
    deq = dequantize(fd.quantized, fd.scale_factors, fd.word_lengths)
    coeffs = scatter_bfus(deq, fd.block_modes, fd.n_bfu)  # [F, 512]

    outs = []
    new_tails = []
    offset = 0
    for b in range(3):
        size = C.MDCT_BAND_SIZES[b]
        out, tail = decoder_imdct_band(
            coeffs[:, offset:offset + size], b, fd.block_modes[:, b], state[f"tail{b}"]
        )
        outs.append(out)
        new_tails.append(tail)
        offset += size

    high_delayed, high_d = delay_stream(outs[2], state["synth_high_delay"])
    stage2, mid_d = qmf_synthesis(outs[0], outs[1], state["synth_mid_delay"])
    pcm, low_d = qmf_synthesis(stage2, high_delayed, state["synth_low_delay"])

    new_state = {
        "tail0": new_tails[0],
        "tail1": new_tails[1],
        "tail2": new_tails[2],
        "synth_low_delay": low_d,
        "synth_mid_delay": mid_d,
        "synth_high_delay": high_d,
    }
    return pcm, new_state


_decode_jit = jax.jit(decode_step, static_argnames=("short_cap", "assume_fits"))
_decode_fast_jit = jax.jit(decode_step_fast)


def auto_short_cap(nframes: int) -> int | tuple | None:
    """Default block-mode partition capacities for an F-frame decode batch.

    A two-tier ladder (F/32, F/8), each rounded up to a 128-lane tile:
    typical material (~1% transient frames per band on the bench and
    noise signals, measured r5) fits the small tier — worth ~+3% headline
    over a single F/8 cap — while percussion-dense material (a click
    every 8 frames measures ~12.5% shorts per band) still gets the F/8
    partitioned tier before the in-graph compute-both fallback.
    Small batches keep compute-both — the bucket matmuls wouldn't pay for
    themselves, and tests with tiny F should exercise the default path.
    CARTA1_SHORT_CAP=0 disables partitioning; =N forces one capacity;
    a comma list (e.g. "256,1024") forces a ladder."""
    env = os.environ.get("CARTA1_SHORT_CAP")
    if env is not None:
        caps = tuple(sorted({min(int(s), nframes) for s in env.split(",") if int(s) > 0}))
        return caps if len(caps) > 1 else (caps[0] if caps else None)
    if nframes < 2048:
        return None
    tile = lambda n: min(nframes, -(-n // 128) * 128)  # noqa: E731
    lo, hi = tile(nframes // 32), tile(nframes // 8)
    return (lo, hi) if lo < hi else hi


def decode_frames(fd: FrameData, state: dict | None = None, fast: bool = False) -> tuple[jnp.ndarray, dict]:
    """Public entry: decode batched FrameData on the default JAX backend."""
    if state is None:
        state = decoder_init_state()
    fd = FrameData(
        n_bfu=jnp.asarray(np.asarray(fd.n_bfu, dtype=np.int32)),
        block_modes=jnp.asarray(np.asarray(fd.block_modes, dtype=np.int32)),
        scale_factors=jnp.asarray(np.asarray(fd.scale_factors, dtype=np.int32)),
        word_lengths=jnp.asarray(np.asarray(fd.word_lengths, dtype=np.int32)),
        quantized=jnp.asarray(np.asarray(fd.quantized, dtype=np.int32)),
    )
    if fast:
        return _decode_fast_jit(fd, state)
    return _decode_jit(fd, state, short_cap=auto_short_cap(int(fd.block_modes.shape[0])))
