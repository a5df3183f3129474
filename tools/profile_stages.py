"""Honest per-stage profiling of the transcode pipeline (VERDICT r3 item 1).

Methodology (r4, PERF.md "Honest timing r4"): ``jax.block_until_ready`` can
return before execution completes on this relay runtime, so every chain ends
with a host VALUE.  The FIRST host sync in a process costs a large and
wildly variable fixed latency (30-177 s measured); all later syncs are
milliseconds — so each stage process pays the first sync once, UNTIMED,
then times two chain lengths in-process (the pair is an internal
consistency check; their marginal cancels any residual fixed cost).

Stage isolation rules (PERF.md r2 finding 8 — program-cache thrash): one
timed device program per process.  Stage INPUTS are built on the host by
the gold engine (bit-faithful reference semantics), so e.g. the pack chain
never compiles the encode program.

Usage:
  python tools/profile_stages.py                 # orchestrate, print table,
                                                 # write PROFILE_r05.json
  python tools/profile_stages.py --stage encode  # one stage, prints JSON
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

STAGES = [
    "dispatch",      # empty-ish program: per-call overhead floor
    "encode",        # pcm -> FrameData (QMF, transient, MDCT, RDO, quantize)
    "pack",          # FrameData -> 212-byte units (in-graph)
    "unpack",        # units -> FrameData (in-graph)
    "decode",        # bit-exact decode (expansion arithmetic + Pallas IMDCT)
    "decode_fast",   # plain-f32 decode (1-LSB envelope)
    "full",          # the whole transcode (bench.py's exact program)
]


def _bench_signal(frames: int) -> np.ndarray:
    from bench import synth_audio

    return synth_audio(frames, channels=1)[0].reshape(frames, 512)


def _gold_fd(frames: int):
    """Host-built FrameData for decode/pack inputs (no device encode program)."""
    from carta1_tpu.gold import gold_encode_frames

    fd, _ = gold_encode_frames(_bench_signal(frames))
    return fd


def _fd_to_device(fd):
    import jax

    from carta1_tpu.framedata import FrameData

    return FrameData(
        n_bfu=jax.device_put(np.asarray(fd.n_bfu, np.int32)),
        block_modes=jax.device_put(np.asarray(fd.block_modes, np.int32)),
        scale_factors=jax.device_put(np.asarray(fd.scale_factors, np.int32)),
        word_lengths=jax.device_put(np.asarray(fd.word_lengths, np.int32)),
        quantized=jax.device_put(np.asarray(fd.quantized, np.int32)),
    )


def stage_chains(stage: str, n1: int, n2: int, frames: int = FRAMES) -> dict:
    """Warm one stage program, pay the first sync, time two chains."""
    import functools

    import jax
    import jax.numpy as jnp

    from carta1_tpu.jaxtools import hoisted_jit

    if stage == "full":
        from bench import bench_tpu_chains

        return bench_tpu_chains(n1, n2, frames)

    def cksum(x):
        return jnp.abs(x).astype(jnp.float32).sum()

    if stage == "dispatch":
        pcm = jax.device_put(_bench_signal(frames))

        @functools.partial(hoisted_jit, donate_argnums=(1,))
        def step(pcm, acc):
            return acc + pcm[0, 0]

        args = [pcm]
    elif stage == "encode":
        from carta1_tpu.pipeline.encoder import encode_step, encoder_init_state

        pcm = jax.device_put(_bench_signal(frames))
        state = encoder_init_state()

        @functools.partial(hoisted_jit, donate_argnums=(1, 2))
        def step(pcm, state, acc):
            fd, state = encode_step(pcm, state, (1.0, 1.0, 1.0), 1.0)
            acc = acc + cksum(fd.quantized) + cksum(fd.scale_factors) + cksum(fd.word_lengths)
            return acc, state

        args = [pcm, state]
    elif stage in ("pack", "unpack"):
        from carta1_tpu.io.bitstream_np import pack_frames_fast
        from carta1_tpu.ops.bitpack import pack_frames, unpack_frames

        fd = _gold_fd(frames)
        if stage == "pack":
            fd_dev = _fd_to_device(fd)

            @functools.partial(hoisted_jit, donate_argnums=(1,))
            def step(fd, acc):
                return acc + cksum(pack_frames(fd))

            args = [fd_dev]
        else:
            units = jax.device_put(pack_frames_fast(fd))

            @functools.partial(hoisted_jit, donate_argnums=(1,))
            def step(units, acc):
                fd = unpack_frames(units)
                return acc + cksum(fd.quantized) + cksum(fd.scale_factors) + cksum(fd.word_lengths)

            args = [units]
    elif stage in ("decode", "decode_fast"):
        from carta1_tpu.pipeline.decoder import (
            decode_step,
            decode_step_fast,
            decoder_init_state,
        )

        from carta1_tpu.pipeline.decoder import auto_short_cap

        fd_dev = _fd_to_device(_gold_fd(frames))
        state = decoder_init_state()
        if stage == "decode_fast":
            fn = decode_step_fast
        else:
            # production configuration: block-mode partitioned IMDCT (r5)
            import functools as _ft

            fn = _ft.partial(decode_step, short_cap=auto_short_cap(frames))

        @functools.partial(hoisted_jit, donate_argnums=(1, 2))
        def step(fd, state, acc):
            pcm, state = fn(fd, state)
            return acc + cksum(pcm), state

        args = [fd_dev, state]
    else:
        raise ValueError(f"unknown stage {stage!r}")

    # warm (compile) outside the timed region
    t0 = time.perf_counter()
    out = step(*args, jnp.float32(0))
    carry = list(out) if isinstance(out, tuple) else [out]
    jax.block_until_ready(carry)
    warm_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    sink = float(np.asarray(carry[0]))  # pay the variable first-sync cost
    first_sync_s = time.perf_counter() - t0
    assert np.isfinite(sink)

    def chain(iters: int) -> float:
        nonlocal carry
        t0 = time.perf_counter()
        for _ in range(iters):
            out = step(args[0], *carry[1:], carry[0])
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
    }


def _run_sub(stage: str, n1: int, n2: int) -> dict | None:
    try:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--stage", stage,
             "--n1", str(n1), "--n2", str(n2)],
            capture_output=True, text=True, timeout=3000, cwd=REPO,
        )
        if r.returncode != 0:
            sys.stderr.write(f"[{stage}] failed rc={r.returncode}:\n{r.stderr[-2000:]}\n")
            return None
        return json.loads(r.stdout.strip().splitlines()[-1])
    except (subprocess.TimeoutExpired, ValueError, IndexError) as e:
        sys.stderr.write(f"[{stage}] {e}\n")
        return None


def main(n1: int, n2: int, stages: list[str]) -> None:
    results = {}
    for stage in stages:
        r = _run_sub(stage, n1, n2)
        if r is None:
            results[stage] = {"error": "subprocess failed"}
            continue
        fps = r.get("fps2") or 0.0
        if fps:
            r["us_per_frame"] = round(1e6 / fps, 3)
        results[stage] = r
        print(f"{stage:12s} {r}", flush=True)

    out = {"frames_per_call": FRAMES, "stages": results}
    path = os.path.join(REPO, "PROFILE_r05.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--stage")
    p.add_argument("--n1", type=int, default=16)
    p.add_argument("--n2", type=int, default=64)
    p.add_argument("--stages", default=",".join(STAGES))
    a = p.parse_args()
    if a.stage:
        print(json.dumps(stage_chains(a.stage, a.n1, a.n2)))
    else:
        main(a.n1, a.n2, a.stages.split(","))
