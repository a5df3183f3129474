"""Multi-host initialization and corpus orchestration glue.

A pod-slice launch is:

    # on every host (same command; coordinator resolves rank 0):
    python -m carta1_tpu.parallel.multihost --coordinator host0:8476 \
        --encode 'corpus/*.wav' --out-dir encoded/ --checkpoint ckpt.json

Files stripe across hosts by process index (stateless above the file level,
so a lost host's share is simply re-run -- see parallel/corpus.py); within a
host, frames shard across local chips via parallel/sharding.py and channels
batch via vmap.  Collectives ride ICI within a slice and DCN across hosts
through jax.distributed; there is no NCCL/MPI analog to manage.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys


def initialize(coordinator: str | None = None, num_processes: int | None = None, process_id: int | None = None) -> tuple[int, int]:
    """Initialize jax.distributed when launched multi-host; no-op solo.

    Returns (process_index, process_count)."""
    import jax

    if coordinator:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    return jax.process_index(), jax.process_count()


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="carta1-multihost", description="Distributed corpus transcoder")
    p.add_argument("--coordinator", help="host:port of process 0 (omit for single-host)")
    p.add_argument("--num-processes", type=int, help="total process count (with --coordinator)")
    p.add_argument("--process-id", type=int, help="this process's id (with --coordinator)")
    p.add_argument("--encode", metavar="GLOB", help="encode WAV files matching GLOB")
    p.add_argument("--decode", metavar="GLOB", help="decode AEA files matching GLOB")
    p.add_argument("--out-dir", required=True)
    p.add_argument("--checkpoint", help="JSON checkpoint path for resume")
    p.add_argument("--engine", choices=("tpu", "exact"), default="tpu")
    p.add_argument("--bias", type=float)
    args = p.parse_args(argv)

    if bool(args.encode) == bool(args.decode):
        print("Error: exactly one of --encode/--decode required", file=sys.stderr)
        return 1

    pi, pc = initialize(args.coordinator, args.num_processes, args.process_id)

    from carta1_tpu.options import EncoderOptions
    from carta1_tpu.parallel.corpus import transcode_corpus

    options = EncoderOptions()
    if args.bias is not None:
        options = options.replace(allocation_bias=args.bias)

    mode = "encode" if args.encode else "decode"
    pattern = args.encode or args.decode
    ext = ".aea" if mode == "encode" else ".wav"
    inputs = sorted(glob.glob(pattern))
    os.makedirs(args.out_dir, exist_ok=True)
    jobs = [
        (path, os.path.join(args.out_dir, os.path.splitext(os.path.basename(path))[0] + ext))
        for path in inputs
    ]

    ckpt = args.checkpoint
    if ckpt and pc > 1:
        ckpt = f"{ckpt}.p{pi}"  # per-process checkpoint files
    result = transcode_corpus(
        jobs, mode=mode, options=options, engine=args.engine, checkpoint_path=ckpt,
        process_index=pi, process_count=pc,
    )
    print(json.dumps({
        "process": pi,
        "processes": pc,
        "completed": len(result.completed),
        "skipped": len(result.skipped),
        "failed": len(result.failed),
        "frames": result.frames,
        "realtime_multiple": round(result.realtime_multiple, 1),
    }))
    for path, err in result.failed.items():
        print(f"FAILED {path}: {err.splitlines()[0]}", file=sys.stderr)
    return 0 if not result.failed else 2


if __name__ == "__main__":
    sys.exit(main())
