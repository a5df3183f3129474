"""Tracing / profiling / numerical-sanitizer hooks (SURVEY §5).

The reference's only instrumentation is a live RT-multiple meter
(bin/cli.js:95-152).  Here:
  * `trace(dir)`     -- jax.profiler device trace around any region
                        (view with TensorBoard / xprof).
  * `enable_nan_debugging()` -- jax_debug_nans: any NaN produced inside a
                        jitted codec stage raises at the op that made it
                        (the numerical equivalent of a race sanitizer; the
                        device pipeline is data-race-free by construction).
  * `stream_stats(fd)` -- structured frame statistics (bits/frame histogram,
                        block-mode rates) for observability dashboards.
"""

from __future__ import annotations

import contextlib

import numpy as np

from carta1_tpu import constants as C
from carta1_tpu.framedata import FrameData


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace of the enclosed region."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_nan_debugging(enabled: bool = True) -> None:
    import jax

    jax.config.update("jax_debug_nans", enabled)


def stream_stats(fd: FrameData) -> dict:
    """Structured observability metrics for a batch of encoded frames."""
    fd = fd.to_numpy()
    wl_bits = np.where(fd.word_lengths > 0, fd.word_lengths + 1, 0)
    bits_per_frame = (wl_bits * C.SPECS_PER_BFU[None, :]).sum(axis=1)
    short_any = (fd.block_modes != 0).any(axis=1)
    hist, edges = np.histogram(bits_per_frame, bins=[0, 1, 256, 512, 768, 1024, 1137])
    return {
        "frames": int(fd.num_frames),
        "bitsPerFrame": {
            "mean": float(bits_per_frame.mean()) if fd.num_frames else 0.0,
            "min": int(bits_per_frame.min()) if fd.num_frames else 0,
            "max": int(bits_per_frame.max()) if fd.num_frames else 0,
            "histogram": {f"[{int(a)},{int(b)})": int(n) for a, b, n in zip(edges[:-1], edges[1:], hist)},
        },
        "blockModes": {
            "shortFrameRate": float(short_any.mean()) if fd.num_frames else 0.0,
            "perBandShortRate": [float((fd.block_modes[:, b] != 0).mean()) if fd.num_frames else 0.0 for b in range(3)],
        },
        "silentFrames": int(((fd.word_lengths == 0).all(axis=1) & (fd.scale_factors == 0).all(axis=1)).sum()),
    }
