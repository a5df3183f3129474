"""Scaling-efficiency harness: sharded transcode throughput at 1..N devices.

Measures `encode_frames_sharded` + `decode_frames_sharded` (frame-axis data
parallelism with 2-frame halo exchange, parallel/sharding.py) against the
single-device pipeline and reports scaling efficiency per device count.

On a multi-chip/multi-host slice this measures real ICI/DCN scaling; on a
single-chip or CPU host it still validates the collective path end-to-end by
running on a virtual device mesh (set
XLA_FLAGS=--xla_force_host_platform_device_count=8 CARTA1_PLATFORM=cpu).

Output: one JSON line per mesh size.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def main() -> None:
    if os.environ.get("CARTA1_PLATFORM"):
        import jax

        jax.config.update("jax_platforms", os.environ["CARTA1_PLATFORM"])
    import jax

    from bench import synth_audio
    from carta1_tpu.parallel import decode_frames_sharded, encode_frames_sharded, make_mesh

    devices = jax.devices()
    frames_per_device = int(os.environ.get("CARTA1_SCALE_FRAMES", "2048"))
    iters = int(os.environ.get("CARTA1_SCALE_ITERS", "5"))

    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= len(devices)]
    base_fps = None
    for n in sizes:
        mesh = make_mesh(devices[:n])
        nframes = frames_per_device * n
        pcm = synth_audio(nframes, channels=1)[0].reshape(nframes, 512)

        fd = encode_frames_sharded(pcm, mesh=mesh)
        out = decode_frames_sharded(fd, mesh=mesh)
        jax.block_until_ready(out)

        t0 = time.perf_counter()
        for _ in range(iters):
            fd = encode_frames_sharded(pcm, mesh=mesh)
            out = decode_frames_sharded(fd, mesh=mesh)
        jax.block_until_ready(out)
        fps = nframes * iters / (time.perf_counter() - t0)
        if base_fps is None:
            base_fps = fps
        eff = fps / (base_fps * n)
        print(
            json.dumps(
                {
                    "devices": n,
                    "frames_per_s": round(fps, 1),
                    "scaling_efficiency": round(eff, 3),
                    "platform": devices[0].platform,
                }
            )
        )


if __name__ == "__main__":
    main()
