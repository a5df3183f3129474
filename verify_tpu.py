"""On-TPU verification gate: run the device engine on the real chip and
assert the correctness contracts, persisting the evidence.

Checks (all on the actual accelerator, not the CPU test backend):
  1. Golden-fixture decode is BIT-EXACT vs the gold oracle: float32 bitwise
     and int16 max diff == 0 (BASELINE "bit-exact ... pinned at decoded
     16-bit PCM"), including carried stream state.
  2. Randomized 2-second stream decode is bit-exact, chunked with state carry.
  3. Per-signal-class round-trip PSNR of the TPU encoder >= the gold
     encoder's, with NO slack (the encode contract).

Writes QUALITY_r{N}.json (round from --round, default unnumbered
QUALITY.json) with the measured numbers.

Usage:  python verify_tpu.py [--round 2] [--out QUALITY_r02.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _signal_classes(n: int) -> dict[str, np.ndarray]:
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))
    from signals import chirp, sine, white_noise

    t = np.arange(n) / 44100.0
    burst = 0.05 * sine(440, length=n)
    burst[n // 2 : n // 2 + 256] += 0.7
    return {
        "sine440": (0.6 * sine(440, length=n)).astype(np.float32),
        "multitone": (0.3 * sine(440, length=n) + 0.2 * sine(3000, length=n) + 0.1 * sine(11000, length=n)).astype(np.float32),
        "chirp": (0.5 * chirp(50, 15000, length=n)).astype(np.float32),
        "noise": (0.3 * white_noise(11, n)).astype(np.float32),
        "transient_burst": np.clip(burst, -1, 1).astype(np.float32),
    }


# One canonical decode shape for the entire gate.  r4's gate compiled FOUR
# distinct exact-decoder programs (fixture batch + three ad-hoc chunk
# shapes), each a multi-minute cold compile — 587 s total (VERDICT r4 item
# 6).  Every decode below runs in [DECODE_CHUNK]-frame chunks with state
# carry instead (bit-identical by the pinned chunked==batched property),
# so the gate pays ONE decode compile.  2048 also turns on the block-mode
# partitioned IMDCT path (pipeline/decoder.auto_short_cap), putting the
# r5 partition + its overflow cond under the on-chip bitwise contract.
DECODE_CHUNK = 2048


def _pad_fd(fd, mult: int):
    """Pad FrameData to a multiple of `mult` frames with silent units.

    Padding frames are part of the compared stream (gold decodes the same
    padded FrameData), so every bitwise assertion still covers them."""
    from carta1_tpu.framedata import FrameData

    f = fd.num_frames
    total = -(-f // mult) * mult
    if total == f:
        return fd
    return FrameData.concatenate([fd.to_numpy(), FrameData.zeros(total - f)])


def _device_decode_chunked(fd, decode_frames):
    """Device decode in DECODE_CHUNK-frame chunks with stream-state carry."""
    outs, state = [], None
    for lo in range(0, fd.num_frames, DECODE_CHUNK):
        p, state = decode_frames(fd[slice(lo, lo + DECODE_CHUNK)], state)
        outs.append(np.asarray(p))
    return np.concatenate(outs), state


def _psnr(ref: np.ndarray, out: np.ndarray, delay: int = 266) -> float:
    x = ref[: len(out) - delay].astype(np.float64)
    y = out[delay : delay + len(x)].astype(np.float64)
    err = ((x - y) ** 2).mean()
    return float(10.0 * np.log10(1.0 / max(err, 1e-30)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=None)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    out_path = args.out or (f"QUALITY_r{args.round:02d}.json" if args.round else "QUALITY.json")

    import jax

    devices = jax.devices()
    platform = devices[0].platform
    print(f"devices: {devices}", flush=True)

    from carta1_tpu.gold import gold_decode_frames, gold_encode_frames
    from carta1_tpu.io import aea
    from carta1_tpu.io.bitstream_np import pack_frames, unpack_frames
    from carta1_tpu.io.wav import float_to_int16
    from carta1_tpu.pipeline.decoder import decode_frames
    from carta1_tpu.processor import decode_units, encode_pcm, pcm_to_frames

    report: dict = {"platform": platform, "device": str(devices[0]), "checks": {}}

    # ---- 1. golden fixture decode: bit-exact --------------------------------
    fixtures = os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests", "fixtures")
    _, units = aea.read_aea(os.path.join(fixtures, "golden.aea"))
    fd = _pad_fd(unpack_frames(units), DECODE_CHUNK)
    t0 = time.time()
    pcm, st = _device_decode_chunked(fd, decode_frames)
    gpcm, gst = gold_decode_frames(fd)
    f32_mism = int((~((pcm.view(np.int32) == gpcm.view(np.int32)) | ((pcm == 0) & (gpcm == 0)))).sum())
    d16 = np.abs(
        float_to_int16(pcm.reshape(-1)).astype(np.int32) - float_to_int16(gpcm.reshape(-1)).astype(np.int32)
    )
    state_ok = all(bool((np.asarray(st[k]) == np.asarray(gst[k])).all()) for k in gst)
    report["checks"]["golden_decode"] = {
        "f32_bitwise_mismatches": f32_mism,
        "int16_max_diff": int(d16.max()),
        "stream_state_bitwise_equal": state_ok,
        "seconds": round(time.time() - t0, 1),
        "decode_chunk": DECODE_CHUNK,
    }
    assert f32_mism == 0, "golden decode not f32-bitwise"
    assert int(d16.max()) == 0, "golden decode not int16-exact"
    assert state_ok, "stream state diverged"
    print("golden decode: BIT-EXACT (f32 + int16 + state)", flush=True)

    # ---- 2. randomized stream, chunked decode with state carry --------------
    # 3 * DECODE_CHUNK frames so real material (incl. transient bursts that
    # land in the short-block partition) crosses two chunk boundaries with
    # carried stream state — same single compiled decode shape as part 1
    n2 = 3 * DECODE_CHUNK * 512
    rng = np.random.default_rng(99)
    sig = 0.4 * np.sin(2 * np.pi * 440 * np.arange(n2) / 44100.0) + 0.15 * rng.standard_normal(n2)
    for pos in range(40960, n2 - 2048, 44100):  # scattered transients
        sig[pos:pos + 256] += 0.5
    sig = np.clip(sig, -1, 1).astype(np.float32)
    frames = pcm_to_frames(sig)
    fd2, _ = gold_encode_frames(frames)
    g2, _ = gold_decode_frames(fd2)
    p2, _ = _device_decode_chunked(fd2, decode_frames)
    mism2 = int((~((p2.view(np.int32) == g2.view(np.int32)) | ((p2 == 0) & (g2 == 0)))).sum())
    report["checks"]["random_stream_chunked"] = {"f32_bitwise_mismatches": mism2, "frames": int(fd2.num_frames)}
    assert mism2 == 0, "chunked random-stream decode not bitwise"
    print("random chunked decode: BIT-EXACT", flush=True)

    # ---- 3. per-signal-class encode quality: PSNR(tpu) >= PSNR(gold) --------
    classes = {}
    for name, sig in _signal_classes(44100).items():
        tpu_units = encode_pcm(sig[None, :], engine="tpu")
        gold_units = encode_pcm(sig[None, :], engine="exact")
        tpu_pcm = decode_units(tpu_units, 1, engine="exact")[0]
        gold_pcm = decode_units(gold_units, 1, engine="exact")[0]
        p_tpu = _psnr(sig, tpu_pcm)
        p_gold = _psnr(sig, gold_pcm)
        classes[name] = {"psnr_tpu_db": round(p_tpu, 3), "psnr_gold_db": round(p_gold, 3), "delta_db": round(p_tpu - p_gold, 3)}
        print(f"encode quality {name:16s} tpu {p_tpu:7.2f} dB  gold {p_gold:7.2f} dB  delta {p_tpu - p_gold:+.3f}", flush=True)
    report["checks"]["encode_quality"] = classes
    worst = min(v["delta_db"] for v in classes.values())
    report["checks"]["encode_quality_worst_delta_db"] = worst
    assert worst >= 0.0, f"TPU encoder below gold quality by {worst} dB"

    report["verdict"] = "PASS"
    with open(out_path, "w") as f:
        json.dump(report, f, indent=2)
    print(f"wrote {out_path}: PASS", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
