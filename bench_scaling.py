"""Scaling-efficiency harness: sharded transcode throughput at 1..N devices.

Measures the sharded transcode (frame-axis data parallelism with 2-frame
halo exchange, parallel/sharding.py) per mesh size under the repo's honest
timing methodology (PERF.md "Honest timing r4"): ``jax.block_until_ready``
is NOT a reliable completion signal on this relay runtime, so every chain
ends in a host VALUE; the first host sync in a process has a large variable
fixed cost, so each mesh size's subprocess pays it once, untimed, then
times two chain lengths in-process (the pair is a consistency check).

The timed program is pure device work (shard_map(encode -> decode) over the
mesh, input resident and sharded) — the host plumbing of
encode_frames_sharded/decode_frames_sharded is deliberately outside it.

On a multi-chip slice this measures real ICI scaling; on this single-chip
host the driver story is (BASELINE "scaling efficiency measured at 1 chip /
1 host / N hosts"):
  * virtual 8-device CPU mesh — validates the collective path end-to-end
    (a correctness signal, NOT an ICI measurement), and
  * the real chip at n=1.

Output: one JSON line per mesh size + SCALING_r04.json next to this file.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
ARTIFACT = os.path.join(REPO, "SCALING_r05.json")

# Written into the artifact so it is readable standalone (VERDICT r4
# item 3): the virtual-CPU rows are a collective-path CORRECTNESS signal.
NOTE = (
    "Virtual-CPU mesh rows: all N 'devices' share the same physical cores, so "
    "per-device scaling_efficiency is EXPECTED to be ~1/N — it is not a failed "
    "gate.  The actual signal is (a) the sharded program compiles and runs the "
    "collective path at every mesh size, and (b) total_fps stays roughly flat "
    "as shards multiply (no super-linear collective overhead).  Each CPU row "
    "is best-of-2 subprocess runs, with both raw runs recorded, because "
    "XLA:CPU throughput jitters run-to-run (the r4 n=8 total-fps dip was a "
    "single unrepeated sample).  Real ICI efficiency "
    "(BASELINE '>=85% at 2 hosts') is unmeasurable on this single-chip host "
    "by construction; the real chip appears as the n=1 default-platform row."
)


def chain_seconds(n_devices: int, n1: int, n2: int, frames_per_device: int) -> dict:
    """Child mode: warm the sharded transcode, pay the first sync, time two
    chains; print a JSON dict."""
    import functools

    import jax

    if os.environ.get("CARTA1_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["CARTA1_PLATFORM"])

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from bench import synth_audio
    from carta1_tpu.jaxtools import hoisted_jit
    from carta1_tpu.parallel.sharding import AXIS, _decode_local, _encode_local, make_mesh

    devices = jax.devices()[:n_devices]
    assert len(devices) == n_devices, f"need {n_devices} devices, have {len(devices)}"
    mesh = make_mesh(devices)
    nframes = frames_per_device * n_devices
    pcm_host = synth_audio(nframes, channels=1)[0].reshape(nframes, 512)
    pcm = jax.device_put(pcm_host, NamedSharding(mesh, P(AXIS, None)))

    def transcode(p):
        fd = _encode_local(p, (1.0, 1.0, 1.0), 1.0, "rdo", AXIS)
        return _decode_local(fd, AXIS)

    sharded = jax.shard_map(transcode, mesh=mesh, in_specs=P(AXIS, None), out_specs=P(AXIS))

    @functools.partial(hoisted_jit, donate_argnums=(1,))
    def step(p, acc):
        return acc + jnp.abs(sharded(p)).astype(jnp.float32).sum()

    t0 = time.perf_counter()
    acc = step(pcm, jnp.float32(0))  # warm/compile
    jax.block_until_ready(acc)
    warm_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    sink = float(np.asarray(acc))  # pay the variable first-sync cost
    first_sync_s = time.perf_counter() - t0
    assert np.isfinite(sink)

    def chain(iters: int) -> float:
        nonlocal acc
        t0 = time.perf_counter()
        for _ in range(iters):
            acc = step(pcm, acc)
        s = float(np.asarray(acc))
        assert np.isfinite(s)
        return time.perf_counter() - t0

    chain(4)  # untimed: XLA:CPU warms up dramatically over the first calls
              # (thread pools, page-faulting the big executable) — measured
              # 6x drift between a cold and a warmed chain in one process
    t_a, t_b = chain(n1), chain(n2)
    return {
        "devices": n_devices,
        "warm_s": round(warm_s, 2),
        "first_sync_s": round(first_sync_s, 2),
        "n1": n1, "t1_s": round(t_a, 3), "fps1": round(nframes * n1 / t_a, 1),
        "n2": n2, "t2_s": round(t_b, 3), "fps2": round(nframes * n2 / t_b, 1),
        "fps_marginal": round(nframes * (n2 - n1) / (t_b - t_a), 1) if t_b > t_a else None,
    }


def measure(n: int, platform: str | None, frames_per_device: int, n1: int, n2: int) -> dict | None:
    env = dict(os.environ)
    if platform == "cpu":
        env["CARTA1_PLATFORM"] = "cpu"
        flags = env.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    try:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--chain", str(n),
             "--n1", str(n1), "--n2", str(n2),
             "--frames-per-device", str(frames_per_device)],
            capture_output=True, text=True, timeout=3000, cwd=REPO, env=env,
        )
        if r.returncode != 0:
            sys.stderr.write(f"[n={n} {platform}] rc={r.returncode}\n{r.stderr[-2000:]}\n")
            return None
        d = json.loads(r.stdout.strip().splitlines()[-1])
    except (subprocess.TimeoutExpired, ValueError, IndexError) as e:
        sys.stderr.write(f"[n={n} {platform}] {e}\n")
        return None
    d["platform"] = platform or "default"
    d["frames_per_s"] = d.get("fps2") or 0.0
    return d


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--chain", type=int)
    p.add_argument("--frames-per-device", type=int, default=2048)
    p.add_argument("--n1", type=int, default=8)
    p.add_argument("--n2", type=int, default=24)
    a = p.parse_args()

    if a.chain:
        print(json.dumps(chain_seconds(a.chain, a.n1, a.n2, a.frames_per_device)))
        return

    results = []
    # virtual CPU mesh: collective-path correctness signal (see NOTE);
    # best-of-2 per mesh size with both raw samples recorded
    cpu_base = None
    for n in (1, 2, 4, 8):
        runs = [measure(n, "cpu", a.frames_per_device, a.n1, a.n2) for _ in range(2)]
        runs = [x for x in runs if x is not None]
        if not runs:
            continue
        r = max(runs, key=lambda x: x["frames_per_s"])
        r["total_fps_runs"] = [x["frames_per_s"] for x in runs]
        r["total_fps"] = r["frames_per_s"]
        # efficiency only against a real 1-device base (ADVICE r4: a missing
        # n=1 run must not silently rebase every later row)
        if n == 1 and cpu_base is None:
            cpu_base = r["frames_per_s"]
        if cpu_base is not None:
            r["scaling_efficiency"] = round(r["frames_per_s"] / (cpu_base * n), 3)
            r["expected_efficiency_virtual"] = round(1.0 / n, 3)
        results.append(r)
        print(json.dumps(r), flush=True)
    # the real chip at n=1 (the only real device count on this host)
    r = measure(1, None, a.frames_per_device, a.n1, a.n2)
    if r is not None:
        r["scaling_efficiency"] = 1.0
        r["total_fps"] = r["frames_per_s"]
        results.append(r)
        print(json.dumps(r), flush=True)

    with open(ARTIFACT, "w") as f:
        json.dump({"note": NOTE, "frames_per_device": a.frames_per_device,
                   "n1": a.n1, "n2": a.n2, "results": results}, f, indent=1)


if __name__ == "__main__":
    main()
