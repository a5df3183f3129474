"""TPU batched encoder pipeline.

One jitted function turns [F, 512] PCM into quantized frame data: QMF tree as
batched convs, transient detection as batched FFT features, windowed MDCT as
basis matmuls, vectorized greedy RDO, table-driven quantization.  The stream
state pytree uses the same keys as the gold engine so the engines are
interchangeable mid-stream.

Reference pipeline: codec/pipeline/encoder.js:426-438.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from carta1_tpu import constants as C
from carta1_tpu.framedata import FrameData
from carta1_tpu.options import EncoderOptions
from carta1_tpu.ops.bitalloc import allocate_bits, allocate_bits_rdo
from carta1_tpu.ops.coding import find_scale_factors, group_bfus, quantize
from carta1_tpu.ops.mdct import encoder_mdct_band
from carta1_tpu.ops.qmf import delay_stream, qmf_analysis
from carta1_tpu.ops.transient import block_modes


def encoder_init_state() -> dict[str, jnp.ndarray]:
    """Zero stream state (same keys/shapes as gold.encoder_init_state)."""
    return {
        "qmf_low_delay": jnp.zeros(C.QMF_DELAY, jnp.float32),
        "qmf_mid_delay": jnp.zeros(C.QMF_DELAY, jnp.float32),
        "qmf_high_delay": jnp.zeros(C.QMF_HIGH_BAND_DELAY, jnp.float32),
        "prev_spectrum0": jnp.zeros(C.TRANSIENT_FFT_SIZES[0] // 2, jnp.float32),
        "prev_spectrum1": jnp.zeros(C.TRANSIENT_FFT_SIZES[1] // 2, jnp.float32),
        "prev_spectrum2": jnp.zeros(C.TRANSIENT_FFT_SIZES[2] // 2, jnp.float32),
        "band_tail0": jnp.zeros(32, jnp.float32),
        "band_tail1": jnp.zeros(32, jnp.float32),
        "band_tail2": jnp.zeros(32, jnp.float32),
    }


def encode_step(pcm: jnp.ndarray, state: dict, thresholds: tuple, allocation_bias: float, allocator: str = "rdo") -> tuple[FrameData, dict]:
    """Pure (trace-able) batched encode: pcm [F, 512] -> (FrameData, state).

    allocator: "rdo" (default) prices word-length steps by measured
    quantization-error reduction (>= reference quality on every measured
    signal class); "reference" replicates the reference heap's proxy."""
    nframes = pcm.shape[0]

    # QMF analysis tree (encoder.js:57-96)
    low1, high1, low_d = qmf_analysis(pcm, state["qmf_low_delay"])
    low2, mid2, mid_d = qmf_analysis(low1, state["qmf_mid_delay"])
    band2, high_d = delay_stream(high1, state["qmf_high_delay"])
    bands = [low2, mid2, band2]

    # transient detection -> block modes (encoder.js:111-145)
    prev_specs = [state["prev_spectrum0"], state["prev_spectrum1"], state["prev_spectrum2"]]
    modes, new_specs = block_modes(bands, prev_specs, thresholds)

    # windowed MDCT per band (encoder.js:163-341)
    parts = []
    new_tails = []
    for b in range(3):
        cf, tail = encoder_mdct_band(bands[b], b, modes[:, b], state[f"band_tail{b}"])
        parts.append(cf)
        new_tails.append(tail)
    coeffs = jnp.concatenate(parts, axis=1)  # [F, 512]

    # RDO + quantization (encoder.js:374-405)
    bfu = group_bfus(coeffs, modes)
    sf = find_scale_factors(bfu)
    if allocator == "rdo":
        wl = allocate_bits_rdo(bfu, sf, allocation_bias)
    else:
        wl = allocate_bits(sf, allocation_bias)
    q = quantize(bfu, sf, wl)

    fd = FrameData(
        n_bfu=jnp.full((nframes,), C.NUM_BFUS, jnp.int32),
        block_modes=modes,
        scale_factors=sf,
        word_lengths=wl,
        quantized=q,
    )
    new_state = {
        "qmf_low_delay": low_d,
        "qmf_mid_delay": mid_d,
        "qmf_high_delay": high_d,
        "prev_spectrum0": new_specs[0],
        "prev_spectrum1": new_specs[1],
        "prev_spectrum2": new_specs[2],
        "band_tail0": new_tails[0],
        "band_tail1": new_tails[1],
        "band_tail2": new_tails[2],
    }
    return fd, new_state


@functools.partial(jax.jit, static_argnames=("thresholds", "allocation_bias", "allocator"))
def _encode_jit(pcm, state, thresholds, allocation_bias, allocator="rdo"):
    return encode_step(pcm, state, thresholds, allocation_bias, allocator)


def encode_frames(pcm, options: EncoderOptions | None = None, state: dict | None = None) -> tuple[FrameData, dict]:
    """Public entry: encode [F, 512] f32 PCM on the default JAX backend."""
    options = options or EncoderOptions()
    if state is None:
        state = encoder_init_state()
    pcm = jnp.asarray(np.ascontiguousarray(pcm, dtype=np.float32))
    return _encode_jit(pcm, state, options.band_thresholds, options.allocation_bias, options.allocator)
