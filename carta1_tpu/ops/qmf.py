"""Batched QMF filterbank as strided convolutions.

The reference's per-frame delay-line filtering (codec/transforms/qmf.js)
is a 48-tap stride-2 correlation over [delay; signal]; batched over frames
it becomes one `lax.conv_general_dilated` with a 46-sample inter-frame halo.
Analysis emits (low, high) as two output channels of a single conv; synthesis
interleaves even/odd phases from a single two-channel conv.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

from carta1_tpu import constants as C
from carta1_tpu.ops.common import FP, halo_prefix

_DN = ("NCH", "OIH", "NCH")

# analysis kernels [2, 1, 48]: low[i] = sum_t work[2i+t]*W[47-t],
# high[i] = same with odd-t positive / even-t negative (qmf.js:32-45)
_ANALYSIS_KERNEL = np.stack([C.QMF_KERNEL_LOW, C.QMF_KERNEL_HIGH])[:, None, :]

# synthesis kernels [2, 1, 48] (qmf.js:88-101):
#   out[2i]   = sum_j work[2i + 2j + 1] * QMF_ODD[j]
#   out[2i+1] = sum_j work[2i + 2j]     * QMF_EVEN[j]
_SYN_EVEN_PHASE = np.zeros(C.QMF_TAPS, np.float32)
_SYN_EVEN_PHASE[1::2] = C.QMF_ODD
_SYN_ODD_PHASE = np.zeros(C.QMF_TAPS, np.float32)
_SYN_ODD_PHASE[0::2] = C.QMF_EVEN
_SYNTHESIS_KERNEL = np.stack([_SYN_EVEN_PHASE, _SYN_ODD_PHASE])[:, None, :]


def qmf_analysis(x: jnp.ndarray, delay: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """x: [F, L] one stream chunk as frames; delay: [46] stream carry.

    Returns (low [F, L/2], high [F, L/2], new_delay [46])."""
    work = halo_prefix(x, delay)  # [F, 46+L]
    out = lax.conv_general_dilated(
        work[:, None, :],
        jnp.asarray(_ANALYSIS_KERNEL),
        window_strides=(2,),
        padding="VALID",
        dimension_numbers=_DN,
        precision=FP,
    )  # [F, 2, L/2]
    return out[:, 0], out[:, 1], x[-1, -C.QMF_DELAY:]


def qmf_synthesis(low: jnp.ndarray, high: jnp.ndarray, delay: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """low, high: [F, S]; delay: [46].  Returns (out [F, 2S], new_delay)."""
    nframes, s = low.shape
    merged = jnp.stack([0.5 * (low + high), 0.5 * (low - high)], axis=-1).reshape(nframes, 2 * s)
    work = halo_prefix(merged, delay)  # [F, 46+2S]
    out = lax.conv_general_dilated(
        work[:, None, :],
        jnp.asarray(_SYNTHESIS_KERNEL),
        window_strides=(2,),
        padding="VALID",
        dimension_numbers=_DN,
        precision=FP,
    )  # [F, 2, S]
    interleaved = jnp.stack([out[:, 0], out[:, 1]], axis=-1).reshape(nframes, 2 * s)
    return interleaved, merged[-1, -C.QMF_DELAY:]


def delay_stream(x: jnp.ndarray, delay: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Shift a band stream right by len(delay) samples (the high-band
    alignment FIFO, encoder.js:84-90 / decoder.js:360-367).

    x: [F, L]; delay: [D].  Returns (shifted [F, L], new_delay [D])."""
    d = delay.shape[-1]
    return halo_prefix(x, delay)[:, : x.shape[1]], x[-1, -d:]
