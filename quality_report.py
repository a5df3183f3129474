"""Encode-quality evidence: round-trip PSNR of the TPU engine vs the
reference encoder (gold engine, bit-faithful to aynik/carta1) across signal
classes.

The BASELINE contract is "round-trip PSNR >= the reference JS encoder on the
same WAV"; this harness produces the numbers.  Decoding always uses the
exact engine so only encoder decisions are compared.

Usage: python quality_report.py [--platform cpu]
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def signals(seconds: float = 3.0) -> dict[str, np.ndarray]:
    n = int(44100 * seconds)
    t = np.arange(n) / 44100.0
    rng = np.random.default_rng(7)
    out = {}
    out["sine_440"] = 0.7 * np.sin(2 * np.pi * 440 * t)
    out["sine_mix"] = (
        0.4 * np.sin(2 * np.pi * 220 * t)
        + 0.25 * np.sin(2 * np.pi * 3000 * t)
        + 0.15 * np.sin(2 * np.pi * 9500 * t)
    )
    out["chirp"] = 0.6 * np.sin(2 * np.pi * (50 * t + (8000 - 50) * t * t / (2 * seconds)))
    noise = rng.standard_normal(n)
    out["white_noise"] = 0.3 * noise
    transient = 0.5 * np.sin(2 * np.pi * 500 * t)
    for pos in range(4410, n, 11025):
        transient[pos:pos + 300] += 0.4 * np.hanning(min(300, n - pos))
    out["transients"] = transient
    lp = np.convolve(noise, np.ones(32) / 32, mode="same")
    out["pink_ish"] = 0.5 * lp / np.abs(lp).max()
    return {k: np.clip(v, -1, 1).astype(np.float32) for k, v in out.items()}


def psnr(ref: np.ndarray, out: np.ndarray, delay: int = 266) -> float:
    n = len(ref) - delay
    err = out[delay:delay + n].astype(np.float64) - ref[:n].astype(np.float64)
    return float(10 * np.log10(1.0 / max(np.mean(err**2), 1e-30)))  # vs full scale


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default="")
    args = ap.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from carta1_tpu.gold import gold_decode_frames, gold_encode_frames
    from carta1_tpu.io.bitstream_np import pack_frames_fast, unpack_frames_fast
    from carta1_tpu.pipeline import encode_frames
    from carta1_tpu.processor import pcm_to_frames

    rows = []
    for name, sig in signals().items():
        frames = pcm_to_frames(sig)
        fd_ref, _ = gold_encode_frames(frames)
        fd_tpu, _ = encode_frames(frames)
        # both decode through the exact engine (bitstream round trip included)
        out_ref, _ = gold_decode_frames(unpack_frames_fast(pack_frames_fast(fd_ref)))
        out_tpu, _ = gold_decode_frames(unpack_frames_fast(pack_frames_fast(fd_tpu.to_numpy())))
        p_ref = psnr(sig, out_ref.reshape(-1))
        p_tpu = psnr(sig, np.asarray(out_tpu).reshape(-1))
        rows.append({
            "signal": name,
            "psnr_reference_encoder_db": round(p_ref, 2),
            "psnr_tpu_encoder_db": round(p_tpu, 2),
            "delta_db": round(p_tpu - p_ref, 3),
        })
        print(json.dumps(rows[-1]))
    worst = min(r["delta_db"] for r in rows)
    print(json.dumps({"summary": "tpu_minus_reference_worst_delta_db", "value": worst}))


if __name__ == "__main__":
    main()
