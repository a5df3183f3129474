"""Bounded-memory streaming stress: synthesize a long stereo WAV on disk,
transcode it WAV -> AEA -> WAV through the streaming host pipeline, and
report peak RSS (must stay far below the file size) plus throughput.

Evidence for BASELINE configs 3/5 (long single streams): the reference
streams end-to-end, and so does this engine's host pipeline.

Usage: python tools/stream_stress.py [--minutes 60] [--chunk-frames 8192]
"""

from __future__ import annotations

import argparse
import os
import resource
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def synth_wav(path: str, minutes: float) -> None:
    """Write a [minutes]-long stereo 16-bit WAV in 10 s slabs (bounded gen)."""
    from carta1_tpu.io.streams import WavStreamWriter

    n = int(minutes * 60 * 44100)
    w = WavStreamWriter(path, channels=2)
    written = 0
    rng = np.random.default_rng(7)
    while written < n:
        m = min(441000, n - written)
        t = (np.arange(written, written + m)) / 44100.0
        sig = np.stack([
            0.35 * np.sin(2 * np.pi * 220 * t) + 0.1 * rng.standard_normal(m),
            0.35 * np.sin(2 * np.pi * 330 * t) + 0.1 * rng.standard_normal(m),
        ]).astype(np.float32)
        w.append(np.clip(sig, -1, 1))
        written += m
    w.close()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--minutes", type=float, default=60.0)
    ap.add_argument("--chunk-frames", type=int, default=8192)
    ap.add_argument("--engine", default="tpu")
    ap.add_argument("--workdir", default="/tmp/carta1_stream_stress")
    args = ap.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    wav_in = os.path.join(args.workdir, "in.wav")
    aea_out = os.path.join(args.workdir, "out.aea")
    wav_out = os.path.join(args.workdir, "round.wav")

    print(f"synthesizing {args.minutes:.0f} min stereo WAV ...", flush=True)
    t0 = time.time()
    synth_wav(wav_in, args.minutes)
    size_gb = os.path.getsize(wav_in) / 2**30
    print(f"  {size_gb:.2f} GiB in {time.time()-t0:.0f}s; rss {rss_mb():.0f} MB", flush=True)

    from carta1_tpu import processor

    # warm up the compiles first so steady-state growth is separable from
    # XLA's one-time compile footprint (which peaks RSS by gigabytes)
    warm = os.path.join(args.workdir, "warm")
    synth_wav(warm + ".wav", args.chunk_frames * 3 * 512 / 44100 / 60)
    processor.encode_file(warm + ".wav", warm + ".aea", engine=args.engine, chunk_frames=args.chunk_frames)
    processor.decode_file(warm + ".aea", warm + ".out.wav", engine=args.engine, chunk_frames=args.chunk_frames)
    rss_after_compile = rss_mb()
    print(f"compiles warm; rss {rss_after_compile:.0f} MB (XLA compile footprint)", flush=True)

    t0 = time.time()
    r = processor.encode_file(
        wav_in, aea_out, engine=args.engine, chunk_frames=args.chunk_frames,
        checkpoint=os.path.join(args.workdir, "enc.ck.npz"),
    )
    enc_s = time.time() - t0
    print(
        f"encode: {r.frames} units in {enc_s:.1f}s "
        f"({r.frames/enc_s:,.0f} units/s, {r.duration/enc_s:.0f}x realtime); "
        f"peak rss {rss_mb():.0f} MB",
        flush=True,
    )

    t0 = time.time()
    r2 = processor.decode_file(
        aea_out, wav_out, engine=args.engine, chunk_frames=args.chunk_frames,
        checkpoint=os.path.join(args.workdir, "dec.ck.npz"),
    )
    dec_s = time.time() - t0
    print(
        f"decode: {r2.frames} units in {dec_s:.1f}s "
        f"({r2.frames/dec_s:,.0f} units/s, {r2.duration/dec_s:.0f}x realtime); "
        f"peak rss {rss_mb():.0f} MB",
        flush=True,
    )

    peak = rss_mb()
    growth = peak - rss_after_compile
    budget = 512.0
    print(
        f"peak RSS {peak:.0f} MB; streaming growth beyond the compile "
        f"footprint: {growth:.0f} MB over a {size_gb*1024:.0f} MB input; "
        f"{'PASS' if growth < budget else 'FAIL'} (growth < {budget:.0f} MB)",
        flush=True,
    )
    return 0 if growth < budget else 1


if __name__ == "__main__":
    raise SystemExit(main())
