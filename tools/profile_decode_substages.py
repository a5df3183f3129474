"""Decode-substage profiling: split the bit-exact decoder's per-frame cost.

Same methodology as tools/profile_stages.py (one program per process, pay
the first sync untimed, two value-synced chains in-process).  Substages:

  dequant   — dequantize_exact + scatter_bfus ([F,52,20] -> [F,512] coeffs)
  imdct     — imdct_bands_exact (Pallas IMDCT cores + OLA + assembly)
  qmf       — both qmf_synthesis_exact stages + the high-band delay
  decode    — the whole decode_step (sanity: should ~= sum of the above)

Inputs are host-built by the gold engine.  Usage:
  python tools/profile_decode_substages.py                # orchestrate
  python tools/profile_decode_substages.py --stage imdct  # one child
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FRAMES = 8192
# imdct / decode run the production configuration (block-mode partition at
# auto_short_cap(FRAMES)); imdct_both is the r4 compute-both formulation,
# kept as the in-artifact A/B for the r5 partition
STAGES = ["dequant", "imdct", "imdct_both", "qmf", "decode"]


def stage_chains(stage: str, n1: int, n2: int, frames: int = FRAMES) -> dict:
    import functools

    import jax
    import jax.numpy as jnp

    from carta1_tpu import constants as C
    from carta1_tpu.gold import gold_encode_frames
    from carta1_tpu.jaxtools import hoisted_jit
    from carta1_tpu.ops import exact_decode as X
    from carta1_tpu.ops.coding import scatter_bfus
    from carta1_tpu.pipeline.decoder import decode_step, decoder_init_state
    from bench import synth_audio

    fd, _ = gold_encode_frames(synth_audio(frames, channels=1)[0].reshape(frames, 512))
    dev = lambda a, dt: jax.device_put(np.asarray(a, dt))
    q = dev(fd.quantized, np.int32)
    sf = dev(fd.scale_factors, np.int32)
    wl = dev(fd.word_lengths, np.int32)
    modes = dev(fd.block_modes, np.int32)
    nbfu = dev(fd.n_bfu, np.int32)

    def cksum(x):
        return jnp.abs(x).astype(jnp.float32).sum()

    if stage == "dequant":

        @functools.partial(hoisted_jit, donate_argnums=(5,))
        def step(q, sf, wl, modes, nbfu, acc):
            deq = X.dequantize_exact(q, sf, wl)
            coeffs = scatter_bfus(deq, modes, nbfu)
            return acc + cksum(coeffs)

        args = [q, sf, wl, modes, nbfu]
    elif stage in ("imdct", "imdct_both"):
        # fixed coeffs input (host-built once via the CPU path is too slow;
        # build on device from the same fields, outside the timed program)
        from carta1_tpu.ops.coding import dequantize
        from carta1_tpu.pipeline.decoder import auto_short_cap

        coeffs_host = np.asarray(
            jax.jit(lambda q, sf, wl, m, n: scatter_bfus(dequantize(q, sf, wl), m, n))(
                q, sf, wl, modes, nbfu
            )
        )
        coeffs = jax.device_put(coeffs_host)
        tails = tuple(jnp.zeros(C.MDCT_TAIL_WINDOW_SIZE, jnp.float32) for _ in range(3))
        cap = auto_short_cap(frames) if stage == "imdct" else None

        @functools.partial(hoisted_jit, donate_argnums=(2,))
        def step(coeffs, modes, acc):
            outs, _ = X.imdct_bands_exact(coeffs, modes, tails, short_cap=cap)
            return acc + cksum(outs[0]) + cksum(outs[1]) + cksum(outs[2])

        args = [coeffs, modes]
    elif stage == "qmf":
        rng = np.random.default_rng(7)
        b0 = jax.device_put((rng.standard_normal((frames, 128)) * 0.3).astype(np.float32))
        b1 = jax.device_put((rng.standard_normal((frames, 128)) * 0.3).astype(np.float32))
        b2 = jax.device_put((rng.standard_normal((frames, 256)) * 0.3).astype(np.float32))

        from carta1_tpu.ops.qmf import delay_stream

        @functools.partial(hoisted_jit, donate_argnums=(3,))
        def step(b0, b1, b2, acc):
            hi, _ = delay_stream(b2, jnp.zeros(C.QMF_HIGH_BAND_DELAY, jnp.float32))
            st2, _ = X.qmf_synthesis_exact(b0, b1, jnp.zeros(C.QMF_DELAY, jnp.float32))
            pcm, _ = X.qmf_synthesis_exact(st2, hi, jnp.zeros(C.QMF_DELAY, jnp.float32))
            return acc + cksum(pcm)

        args = [b0, b1, b2]
    elif stage == "decode":
        from carta1_tpu.framedata import FrameData
        from carta1_tpu.pipeline.decoder import auto_short_cap

        fdd = FrameData(n_bfu=nbfu, block_modes=modes, scale_factors=sf, word_lengths=wl, quantized=q)
        state = decoder_init_state()
        cap = auto_short_cap(frames)

        @functools.partial(hoisted_jit, donate_argnums=(1, 2))
        def step(fdd, state, acc):
            pcm, state = decode_step(fdd, state, short_cap=cap)
            return acc + cksum(pcm), state

        args = [fdd, state]
    else:
        raise ValueError(stage)

    t0 = time.perf_counter()
    out = step(*args, jnp.float32(0))
    carry = list(out) if isinstance(out, tuple) else [out]
    jax.block_until_ready(carry)
    warm_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    sink = float(np.asarray(carry[0]))
    first_sync_s = time.perf_counter() - t0
    assert np.isfinite(sink)

    def call(carry):
        if len(carry) == 1:          # stateless stages: fixed inputs + acc
            return step(*args, carry[0])
        return step(args[0], carry[1], carry[0])  # decode: fd, state, acc

    def chain(iters: int) -> float:
        nonlocal carry
        t0 = time.perf_counter()
        for _ in range(iters):
            out = call(carry)
            carry = list(out) if isinstance(out, tuple) else [out]
        s = float(np.asarray(carry[0]))
        assert np.isfinite(s)
        return time.perf_counter() - t0

    t_a, t_b = chain(n1), chain(n2)
    return {
        "warm_s": round(warm_s, 2),
        "first_sync_s": round(first_sync_s, 2),
        "n1": n1, "t1_s": round(t_a, 3), "fps1": round(frames * n1 / t_a, 1),
        "n2": n2, "t2_s": round(t_b, 3), "fps2": round(frames * n2 / t_b, 1),
        "fps_marginal": round(frames * (n2 - n1) / (t_b - t_a), 1) if t_b > t_a else None,
        "us_per_frame": round(1e6 * t_b / (frames * n2), 3),
    }


def main(n1: int, n2: int) -> None:
    results = {}
    for stage in STAGES:
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--stage", stage,
                 "--n1", str(n1), "--n2", str(n2)],
                capture_output=True, text=True, timeout=3000, cwd=REPO,
            )
            if r.returncode != 0:
                sys.stderr.write(f"[{stage}] rc={r.returncode}\n{r.stderr[-2000:]}\n")
                results[stage] = {"error": f"rc={r.returncode}"}
                continue
            results[stage] = json.loads(r.stdout.strip().splitlines()[-1])
            print(f"{stage:8s} {results[stage]}", flush=True)
        except (subprocess.TimeoutExpired, ValueError, IndexError) as e:
            results[stage] = {"error": str(e)}
    print(json.dumps(results))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--stage")
    p.add_argument("--n1", type=int, default=16)
    p.add_argument("--n2", type=int, default=64)
    a = p.parse_args()
    if a.stage:
        print(json.dumps(stage_chains(a.stage, a.n1, a.n2)))
    else:
        main(a.n1, a.n2)
