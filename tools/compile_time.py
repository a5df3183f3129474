"""Pin the cold-compile-time claim with an artifact (VERDICT r4 item 4).

r4 asserted "the RDO restructure drops cold compile ~2x" from scattered
single runs — but this machine's compile time for the SAME program varies
3-6x across processes (PERF.md "Compile time r4"), so single samples
cannot support such claims.  This tool runs each program's
``jit(...).lower(args).compile()`` in N FRESH subprocesses with a
throwaway compilation-cache dir (no persistent cache, no prewarm seed)
and records every sample plus the median/min/max, so compile-time claims
can be made (or retracted) from distributions, not anecdotes.

Programs measured (the two biggest cold-start costs a fresh machine pays):
  * encode      — the [2, 8192]-frame vmapped default-allocator encode +
                  in-graph pack (the corpus/file program shape)
  * decode      — the [8192]-frame bit-exact decoder with the r5
                  block-mode partition (capacity ladder, in-graph conds)
  * decode_r4   — same decoder, compute-both formulation (short_cap=None):
                  isolates what the r5 partition cond costs at compile time

AOT compile only — nothing executes, so the relay's first-sync pathology
cannot pollute the numbers (it applies to host VALUE syncs, not compiles).

Usage: python tools/compile_time.py [--runs 5] [--out COMPILE_r05.json]
       python tools/compile_time.py --child <program>   (internal)
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PROGRAMS = ("encode", "decode", "decode_r4")


def child(program: str) -> None:
    import functools

    import jax
    import numpy as np

    from carta1_tpu.framedata import FrameData

    if program == "encode":
        from carta1_tpu.ops.bitpack import pack_frames
        from carta1_tpu.pipeline.encoder import encode_step, encoder_init_state

        def one(p, s):
            fd, s2 = encode_step(p, s, (1.0, 1.0, 1.0), 1.0, "rdo")
            return pack_frames(fd), s2

        fn = jax.jit(jax.vmap(one))
        state = jax.tree.map(
            lambda x: np.zeros((2,) + np.shape(x), np.result_type(x)), encoder_init_state()
        )
        args = (np.zeros((2, 8192, 512), np.float32), state)
    else:
        from carta1_tpu.pipeline.decoder import auto_short_cap, decode_step, decoder_init_state

        cap = auto_short_cap(8192) if program == "decode" else None
        fn = jax.jit(functools.partial(decode_step, short_cap=cap))
        state = jax.tree.map(lambda x: np.asarray(x), decoder_init_state())
        args = (FrameData.zeros(8192), state)

    t0 = time.perf_counter()
    lowered = fn.lower(*args)
    lower_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    lowered.compile()
    compile_s = time.perf_counter() - t0
    print(json.dumps({"lower_s": round(lower_s, 2), "compile_s": round(compile_s, 2),
                      "backend": jax.default_backend()}))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", default=None)
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--out", default=os.path.join(REPO, "COMPILE_r05.json"))
    ap.add_argument("--programs", default=",".join(PROGRAMS))
    args = ap.parse_args()
    if args.child:
        child(args.child)
        return 0

    report: dict = {
        "note": (
            "Cold .lower().compile() wall-clock, one fresh subprocess per sample, "
            "throwaway cache dir (no persistent cache / prewarm seed).  Compile "
            "time for the SAME program varies several-fold across processes on "
            "this machine — judge medians and spreads, never single runs."
        ),
        "runs_per_program": args.runs,
        "programs": {},
    }
    for prog in args.programs.split(","):
        samples = []
        for i in range(args.runs):
            with tempfile.TemporaryDirectory() as d:
                env = dict(os.environ)
                env["CARTA1_JAX_CACHE"] = d
                env["CARTA1_NO_PREWARM_SEED"] = "1"
                # running by script path puts tools/ (not the repo) on
                # sys.path — the child needs the package importable
                env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
                r = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "--child", prog],
                    capture_output=True, text=True, timeout=3600, cwd=REPO, env=env,
                )
            if r.returncode != 0:
                sys.stderr.write(f"[{prog} run {i}] rc={r.returncode}\n{r.stderr[-2000:]}\n")
                samples.append({"error": r.returncode})
                continue
            d = json.loads(r.stdout.strip().splitlines()[-1])
            samples.append(d)
            print(f"{prog} run {i}: compile {d['compile_s']} s (lower {d['lower_s']} s)",
                  flush=True)
        ok = [s["compile_s"] for s in samples if "compile_s" in s]
        report["programs"][prog] = {
            "samples": samples,
            "compile_s_median": round(statistics.median(ok), 2) if ok else None,
            "compile_s_min": min(ok) if ok else None,
            "compile_s_max": max(ok) if ok else None,
        }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
