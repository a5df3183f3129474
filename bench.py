"""Headline benchmark: full-codec throughput, frames/s/chip.

Measures the complete device transcode pipeline (batched encode -> in-graph
bitstream pack -> unpack -> batched decode) on 44.1 kHz stereo material,
steady-state (compile excluded), on the default JAX backend (the real TPU
chip under the driver).

`vs_baseline` is measured against the north-star target from BASELINE.json:
100x a single-core reference-algorithm encoder.  Since Node.js is not
available in this image, the stand-in single-core baseline is this repo's
gold engine (a vectorized NumPy implementation of the exact reference
algorithm -- itself several times faster than the single-core JS it
emulates, making the target strictly harder).  vs_baseline >= 1.0 means the
chip beats 100x that baseline.

Output: one JSON line {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np


def synth_audio(nframes: int, channels: int = 2) -> np.ndarray:
    """Deterministic music-like test signal: tones + noise + transients."""
    n = nframes * 512
    t = np.arange(n, dtype=np.float64) / 44100.0
    rng = np.random.default_rng(42)
    out = np.zeros((channels, n), np.float32)
    for ch in range(channels):
        sig = (
            0.35 * np.sin(2 * np.pi * (220 + 110 * ch) * t)
            + 0.2 * np.sin(2 * np.pi * (3000 + 500 * ch) * t + 0.1 * np.sin(2 * np.pi * 3 * t))
            + 0.1 * rng.standard_normal(n)
        )
        # periodic transients to exercise the short-block path
        for pos in range(2048, n, 44100 // 3):
            sig[pos:pos + 256] += 0.3
        out[ch] = np.clip(sig, -1, 1).astype(np.float32)
    return out


def bench_tpu_chain(iters: int, frames_per_chunk: int = 8192) -> float:
    """Wall seconds for `iters` full-transcode iterations + forced sync.

    Measurement rules this methodology encodes (all measured, r3; PERF.md
    "Relay transfer pathology" + "Honest timing"):

    * ``jax.block_until_ready`` does NOT guarantee execution completion on
      this relay runtime (chains "finished" 20x faster than the VPU can
      compute) — the only reliable sync is materializing a VALUE on host.
      Each call folds its outputs into a scalar checksum accumulator; the
      chain ends with ONE scalar download.
    * That download is the process's first D2H, with a large but stable
      fixed latency — so throughput must be taken as a MARGINAL rate
      between two chain lengths, each in a fresh process (any second
      measurement in the same process runs with poisoned ~60 ms/call
      dispatch).
    * Per-iteration outputs must not be retained: hundreds of queued
      [8192, 512] buffers stall the allocator.  The checksum wrapper
      returns only scalars + states, so deep chains are memory-safe.

    Two channels alternate as independent state chains, states donated."""
    import functools

    import jax
    import jax.numpy as jnp

    from carta1_tpu.jaxtools import hoisted_jit
    from carta1_tpu.ops.bitpack import pack_frames, unpack_frames
    from carta1_tpu.pipeline.decoder import decode_step, decoder_init_state
    from carta1_tpu.pipeline.encoder import encode_step, encoder_init_state

    @functools.partial(hoisted_jit, donate_argnums=(1, 2, 3))
    def transcode_step(pcm, enc_state, dec_state, acc):
        fd, enc_state = encode_step(pcm, enc_state, (1.0, 1.0, 1.0), 1.0)
        units = pack_frames(fd)
        fd2 = unpack_frames(units)
        out, dec_state = decode_step(fd2, dec_state)
        acc = acc + jnp.abs(out).sum() + units.astype(jnp.uint32).sum().astype(jnp.float32)
        return acc, enc_state, dec_state

    host = synth_audio(frames_per_chunk, channels=2).reshape(2, frames_per_chunk, 512)
    # one device array per channel, materialized BEFORE the loop: an
    # in-loop pcm[ch] slice is its own device program, and alternating a
    # second program with the ~150-270 MB transcode executable makes the
    # runtime re-ship the binary every call (~2.6 s/call measured — the
    # r1 "program-cache thrash" note, scaled up by executable size)
    pcm = [jax.device_put(np.ascontiguousarray(host[ch])) for ch in range(2)]
    chans = []
    for ch in range(2):  # warmup / compile
        acc, es, ds = transcode_step(
            pcm[ch], encoder_init_state(), decoder_init_state(), jnp.float32(0)
        )
        chans.append([acc, es, ds])
    jax.block_until_ready(chans)

    t0 = time.perf_counter()
    for _ in range(iters):
        for ch in range(2):
            acc, es, ds = chans[ch]
            chans[ch] = list(transcode_step(pcm[ch], es, ds, acc))
    sink = float(np.asarray(chans[0][0])) + float(np.asarray(chans[1][0]))
    assert np.isfinite(sink)
    return time.perf_counter() - t0


def bench_tpu(n1: int = 16, n2: int = 96) -> float:
    """Steady-state frames/s/chip of the full device pipeline.

    Marginal rate between two chain lengths, each in a fresh subprocess
    (see bench_tpu_chain).  Retries once on a non-positive delta (relay
    weather); falls back to the conservative whole-run rate."""
    import os
    import subprocess
    import sys

    def chain(n: int) -> float | None:
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--tpu-chain", str(n)],
                capture_output=True, text=True, timeout=1200,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            return float(r.stdout.strip().splitlines()[-1])
        except (subprocess.TimeoutExpired, ValueError, IndexError):
            return None

    t1, t2 = chain(n1), chain(n2)
    if t1 is not None and t2 is not None and t2 > t1 * 1.05:
        return 2 * 8192 * (n2 - n1) / (t2 - t1)
    if t2 is not None:  # weather: report the conservative whole-run rate
        return 2 * 8192 * n2 / t2
    if t1 is not None:
        return 2 * 8192 * n1 / t1
    return 0.0


def bench_encode_corpus(nframes: int = 49152) -> float:
    """BASELINE config 2: streaming corpus encode, WAV -> AEA, one chip.

    The actual north-star metric (BASELINE.md:32): wall-clock frames/s of
    `encode_file` on real files — memmapped WAV reader, chunked device
    encode with in-graph pack, incremental AEA writer — including all host
    IO (tmpfs), not just device steady state."""
    import os
    import tempfile

    from carta1_tpu.io.wav import write_wav
    from carta1_tpu.processor import encode_file

    import jax

    from carta1_tpu.options import EncoderOptions
    from carta1_tpu.processor import DEFAULT_CHUNK_FRAMES, _encode_batch_dev

    with tempfile.TemporaryDirectory() as d:
        wav = os.path.join(d, "bench.wav")
        out = os.path.join(d, "bench.aea")
        write_wav(wav, synth_audio(nframes // 2, channels=2).reshape(2, -1))
        # warm the compile WITHOUT any device->host copy: the first D2H in
        # a process permanently degrades H2D ~50x on this relay runtime
        # (PERF.md), so warming via a small encode_file (which downloads
        # its units) would poison the very path being measured
        warm_units, warm_state = _encode_batch_dev(
            np.zeros((2, DEFAULT_CHUNK_FRAMES, 512), np.int16), EncoderOptions(), None
        )
        jax.block_until_ready((warm_units, warm_state))
        del warm_units, warm_state
        t0 = time.perf_counter()
        r = encode_file(wav, out)
        elapsed = time.perf_counter() - t0
        assert r.frames == nframes
    return nframes / elapsed


def bench_gold_encode_baseline(nframes: int = 512) -> float:
    """Single-core reference-algorithm encode-only (incl. pack) frames/s."""
    import os

    os.environ.setdefault("OMP_NUM_THREADS", "1")
    from carta1_tpu.gold import gold_encode_frames
    from carta1_tpu.io.bitstream_np import pack_frames_fast

    pcm = synth_audio(nframes, channels=1)[0].reshape(nframes, 512)
    gold_encode_frames(pcm[:8])  # warm caches
    t0 = time.perf_counter()
    fd, _ = gold_encode_frames(pcm)
    pack_frames_fast(fd)
    elapsed = time.perf_counter() - t0
    return nframes / elapsed


def bench_gold_baseline(nframes: int = 512) -> float:
    """Single-core reference-algorithm encode+decode frames/s.

    Gold NumPy codec + the native C++ serializer pinned to ONE OpenMP
    thread: the strongest honest stand-in for a single-core reference
    implementation (the vectorized NumPy transforms are already much faster
    than the JS they emulate)."""
    import os

    os.environ.setdefault("OMP_NUM_THREADS", "1")
    from carta1_tpu.gold import gold_decode_frames, gold_encode_frames
    from carta1_tpu.io.bitstream_np import pack_frames_fast, unpack_frames_fast

    pcm = synth_audio(nframes, channels=1)[0].reshape(nframes, 512)
    # warm caches
    gold_encode_frames(pcm[:8])
    t0 = time.perf_counter()
    fd, _ = gold_encode_frames(pcm)
    units = pack_frames_fast(fd)
    fd2 = unpack_frames_fast(units)
    gold_decode_frames(fd2)
    elapsed = time.perf_counter() - t0
    return nframes / elapsed


def _corpus_fps_subprocess() -> float:
    """bench_encode_corpus in a FRESH process.

    Two reasons (PERF.md "Relay transfer pathology"): the metric needs the
    un-poisoned H2D path, which any prior D2H in this process destroys;
    and relay bandwidth swings ~4x run-to-run, so main() takes the best
    of two isolated runs."""
    import os
    import subprocess
    import sys

    try:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--corpus-only"],
            capture_output=True, text=True, timeout=900,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        return float(r.stdout.strip().splitlines()[-1])
    except (subprocess.TimeoutExpired, ValueError, IndexError):
        return 0.0


def main() -> None:
    # Order matters on the relay runtime: the corpus bench needs the fast
    # H2D path, which the first D2H copy in the process destroys — so it
    # runs in fresh subprocesses (its own final unit download is part of
    # its measurement).  bench_tpu's timed loop is transfer-free, so it is
    # immune to the poisoned state it then runs under.
    encode_fps = max(_corpus_fps_subprocess() for _ in range(2))
    tpu_fps = bench_tpu()
    # single-core baselines are host-only; best-of-3 to shed machine noise
    gold_fps = max(bench_gold_baseline() for _ in range(3))
    gold_encode_fps = max(bench_gold_encode_baseline() for _ in range(3))
    target = 100.0 * gold_fps
    print(
        json.dumps(
            {
                "metric": "encode+decode frames/s/chip (full pipeline incl. bitstream)",
                "value": round(tpu_fps, 1),
                "unit": "frames/s",
                "vs_baseline": round(tpu_fps / target, 3),
                # BASELINE config 2 (the nominal north star): streaming
                # corpus WAV->AEA encode incl. host IO, vs 100x the
                # single-core gold encoder
                "encode_corpus_fps": round(encode_fps, 1),
                "encode_corpus_vs_baseline": round(
                    encode_fps / (100.0 * gold_encode_fps), 3
                ),
            }
        )
    )


if __name__ == "__main__":
    import os
    import sys

    if "--corpus-only" in sys.argv:
        print(bench_encode_corpus())
    elif "--tpu-chain" in sys.argv:
        n = int(sys.argv[sys.argv.index("--tpu-chain") + 1])
        print(bench_tpu_chain(n))
    else:
        main()
