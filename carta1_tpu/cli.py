"""carta1_tpu command-line interface (parity: bin/cli.js).

Same operations and flags as the reference CLI:
  --encode / --decode / --json, --quiet, --force, --title, --bias
plus engine selection (--engine tpu|exact) and chunk sizing.

Usage:
  python -m carta1_tpu.cli --encode in.wav out.aea
  python -m carta1_tpu.cli --decode in.aea out.wav
  python -m carta1_tpu.cli --json in.aea dump.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

from carta1_tpu import constants as C
from carta1_tpu.io import aea
from carta1_tpu.io.bitstream_np import unpack_frames_fast as unpack_frames
from carta1_tpu.options import EncoderOptions
from carta1_tpu.processor import decode_file, encode_file


def _format_time(seconds: float) -> str:
    m, s = divmod(int(seconds), 60)
    return f"{m:02d}:{s:02d}"


def validate_title(title: str) -> None:
    """ASCII-only, max 255 chars (bin/cli.js:57-83)."""
    for i, ch in enumerate(title):
        if ord(ch) > 127:
            raise ValueError(f'Title contains non-ASCII character at position {i}: "{ch}"')
    if len(title) > C.AEA_TITLE_SIZE - 1:
        raise ValueError(
            f"Title is too long ({len(title)} chars). Maximum allowed: {C.AEA_TITLE_SIZE - 1} characters"
        )


class Progress:
    """Frames/s + real-time-multiple readout (bin/cli.js:95-152)."""

    def __init__(self, operation: str, quiet: bool):
        self.operation = operation
        self.quiet = quiet
        self.start = time.perf_counter()

    def __call__(self, done: int, total: int) -> None:
        if self.quiet:
            return
        elapsed = max(time.perf_counter() - self.start, 1e-9)
        fps = done / elapsed
        rt = fps * C.SAMPLES_PER_FRAME / C.SAMPLE_RATE
        pct = 100.0 * done / max(total, 1)
        sys.stderr.write(
            f"\r{self.operation} {pct:5.1f}% | {done}/{total} frames | "
            f"{fps:8.0f} frames/s | RT: {rt:7.1f}x"
        )
        if done >= total:
            sys.stderr.write("\n")
        sys.stderr.flush()


def dump_json(input_aea: str, output_json: str, quiet: bool) -> None:
    """AEA structure dump (bin/cli.js:503-613) -- the de-facto inspection and
    cross-validation tool; field names match the reference output."""
    size = os.path.getsize(input_aea)
    with open(input_aea, "rb") as f:
        header = f.read(C.AEA_HEADER_SIZE)
    meta = aea.parse_header(header)
    _, units = aea.read_aea(input_aea)
    # the reference dump iterates the HEADER's frame count and records an
    # error entry for every unit the file can't actually supply
    # (deserializeFrame throws on short reads, cli.js:581-593); read_aea
    # already dropped trailing partials, so those indexes become errors
    frame_count = max(meta.frame_count, units.shape[0]) if meta.frame_count else units.shape[0]
    available = units.shape[0]

    dump = {
        "file": {
            "path": input_aea,
            "size": size,
            "headerSize": C.AEA_HEADER_SIZE,
            "dataSize": size - C.AEA_HEADER_SIZE,
            "expectedDataSize": frame_count * C.SOUND_UNIT_SIZE,
            "sizeDifference": size - C.AEA_HEADER_SIZE - frame_count * C.SOUND_UNIT_SIZE,
        },
        "header": {
            "magic": " ".join(f"{b:02x}" for b in header[:4]),
            "title": meta.title,
            "frameCount": meta.frame_count,
            "channelCount": meta.channel_count,
            "framesPerChannel": meta.frame_count / max(meta.channel_count, 1),
            "duration": (meta.frame_count / max(meta.channel_count, 1)) * 512 / 44100,
        },
        "frames": [],
    }

    fd = unpack_frames(units)
    sizes = C.SPECS_PER_BFU
    # structural-overrun extension: the reference's bit reader silently
    # truncates fields at the unit boundary (bitstream.js:24,55); flag units
    # whose declared layout doesn't fit the 1696-bit sound unit
    wl_bits = C.WORD_LENGTH_BITS[fd.word_lengths]
    declared_bits = (
        C.FRAME_HEADER_BITS
        + 10 * fd.n_bfu
        + (wl_bits * sizes[None, :]).sum(axis=1)
    )
    overrun = declared_bits > C.FRAME_BITS
    for i in range(frame_count):
        if i >= available:
            dump["frames"].append({
                "index": i,
                "offset": C.AEA_HEADER_SIZE + i * C.SOUND_UNIT_SIZE,
                "offsetHex": hex(C.AEA_HEADER_SIZE + i * C.SOUND_UNIT_SIZE),
                "error": f"Frame must be {C.SOUND_UNIT_SIZE} bytes",
            })
            continue
        n = int(fd.n_bfu[i])
        sf = fd.scale_factors[i, :n]
        wl = fd.word_lengths[i, :n]
        info = {
            "index": i,
            "offset": C.AEA_HEADER_SIZE + i * C.SOUND_UNIT_SIZE,
            "offsetHex": hex(C.AEA_HEADER_SIZE + i * C.SOUND_UNIT_SIZE),
            "nBfu": n,
            "blockModes": fd.block_modes[i].tolist(),
            "scaleFactorIndices": sf.tolist(),
            "wordLengthIndices": wl.tolist(),
            "hasNonZeroScaleFactors": bool((sf > 0).any()),
            "hasNonZeroWordLengths": bool((wl > 0).any()),
            "hasCoefficients": bool((fd.quantized[i] != 0).any()),
        }
        if overrun[i]:
            # extension over the reference (whose reader truncates silently):
            # the declared layout doesn't fit the sound unit
            info["error"] = (
                f"Coefficient data overruns sound unit "
                f"({int(declared_bits[i])} > {C.FRAME_BITS} bits)"
            )
        if i < 3 or i == frame_count - 1:
            info["quantizedCoefficients"] = [
                fd.quantized[i, b, : sizes[b]].tolist() for b in range(n)
            ]
        dump["frames"].append(info)

    # summary filters exactly like the reference (cli.js:599-609)
    errors = sum(1 for fr in dump["frames"] if fr.get("error"))
    silent = sum(
        1
        for fr in dump["frames"]
        if not fr.get("error")
        and not fr["hasNonZeroScaleFactors"]
        and not fr["hasNonZeroWordLengths"]
    )
    dump["summary"] = {
        "totalFrames": frame_count,
        "validFrames": frame_count - errors,
        "errorFrames": errors,
        "silentFrames": silent,
        "activeFrames": frame_count - errors - silent,
    }
    from carta1_tpu.profiling import stream_stats

    dump["stats"] = stream_stats(fd)
    with open(output_json, "w") as f:
        json.dump(dump, f, indent=2)
    if not quiet:
        print(f"{input_aea} (AEA) -> {output_json} (JSON)")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="carta1", description="ATRAC1 Audio Codec (TPU-native)")
    p.add_argument("-e", "--encode", action="store_true", help="Encode WAV to AEA")
    p.add_argument("-d", "--decode", action="store_true", help="Decode AEA to WAV")
    p.add_argument("-j", "--json", action="store_true", help="Dump AEA file structure to JSON")
    p.add_argument("-q", "--quiet", action="store_true", help="Suppress all output except errors")
    p.add_argument("-f", "--force", action="store_true", help="Overwrite output file if it exists")
    p.add_argument("-t", "--title", help="Custom title for AEA file metadata (encoding only)")
    p.add_argument("-b", "--bias", type=float, help="Bit allocation bias (default: 1.0)")
    p.add_argument(
        "--threshold-low", type=float, metavar="X",
        help="Transient threshold, low band (default 1.0; the reference applies "
        "this one to ALL bands unless --per-band-thresholds)",
    )
    p.add_argument("--threshold-mid", type=float, metavar="X", help="Transient threshold, mid band (default 1.5)")
    p.add_argument("--threshold-high", type=float, metavar="X", help="Transient threshold, high band (default 2.0)")
    p.add_argument(
        "--per-band-thresholds", action="store_true",
        help="Extension: honor the mid/high thresholds instead of the reference "
        "quirk of applying the low threshold to every band (encoder.js:134)",
    )
    p.add_argument(
        "--allocator", choices=("rdo", "reference"), default="rdo",
        help="Bit allocator: 'rdo' prices word-length steps by measured "
        "quantization error (better quality than the reference on every "
        "measured signal); 'reference' replicates the reference heap's "
        "scale-factor proxy for output comparability",
    )
    p.add_argument("--engine", choices=("tpu", "exact"), default="tpu", help="Codec engine (default: tpu)")
    p.add_argument(
        "--platform",
        default=os.environ.get("CARTA1_PLATFORM", ""),
        help="Force a JAX platform (e.g. cpu); default: autodetect",
    )
    p.add_argument("--chunk-frames", type=int, default=8192, help="Frames per device batch")
    p.add_argument(
        "--checkpoint",
        metavar="PATH",
        help="Mid-stream checkpoint file: progress + codec state are snapshotted "
        "atomically during transcode, and an interrupted run resumes from it "
        "with byte-identical output",
    )
    p.add_argument("--profile", metavar="DIR", help="Capture a jax.profiler device trace into DIR")
    p.add_argument("--debug-nans", action="store_true", help="Raise on any NaN produced in the device pipeline")
    p.add_argument("input", help="Input file path")
    p.add_argument("output", help="Output file path")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    if args.debug_nans:
        from carta1_tpu.profiling import enable_nan_debugging

        enable_nan_debugging()
    modes = [args.encode, args.decode, args.json]
    if sum(modes) == 0:
        print("Error: Must specify one of --encode, --decode, or --json", file=sys.stderr)
        return 1
    if sum(modes) > 1:
        print("Error: Cannot specify multiple operation modes", file=sys.stderr)
        return 1
    if os.path.exists(args.output) and not args.force:
        print(
            f"Error: Output file '{args.output}' already exists. Use --force to overwrite.",
            file=sys.stderr,
        )
        return 1

    profile_ctx = None
    if args.profile:
        from carta1_tpu.profiling import trace

        profile_ctx = trace(args.profile)
        profile_ctx.__enter__()
    try:
        if args.encode:
            options = EncoderOptions(allocator=args.allocator)
            if args.bias is not None:
                options = options.replace(allocation_bias=args.bias)
            if args.threshold_low is not None:
                options = options.replace(transient_threshold_low=args.threshold_low)
            if args.threshold_mid is not None:
                options = options.replace(transient_threshold_mid=args.threshold_mid)
            if args.threshold_high is not None:
                options = options.replace(transient_threshold_high=args.threshold_high)
            if args.per_band_thresholds:
                options = options.replace(per_band_thresholds=True)
            title = args.title or os.path.splitext(os.path.basename(args.output))[0]
            validate_title(title)
            from carta1_tpu.io.streams import WavStreamReader  # header-only check

            info = WavStreamReader(args.input).info
            if info.sample_rate != C.SAMPLE_RATE and not args.quiet:
                print(
                    f"Warning: Input sample rate {info.sample_rate}Hz, expected {C.SAMPLE_RATE}Hz"
                )
            t0 = time.perf_counter()
            result = encode_file(
                args.input,
                args.output,
                options=options,
                engine=args.engine,
                title=title,
                chunk_frames=args.chunk_frames,
                on_progress=Progress("Encoding", args.quiet),
                checkpoint=args.checkpoint,
            )
            if not args.quiet:
                bitrate = round(C.BITRATE_PER_CHANNEL * result.channels / 1000)
                elapsed = time.perf_counter() - t0
                print(
                    f"{args.input} (WAV 44100Hz {result.channels}ch "
                    f"{_format_time(result.duration)}) -> {args.output} (AEA {bitrate}kbps) "
                    f"in {elapsed:.2f}s ({result.duration / elapsed:.1f}x realtime)"
                )
        elif args.decode:
            t0 = time.perf_counter()
            result = decode_file(
                args.input,
                args.output,
                engine=args.engine,
                chunk_frames=args.chunk_frames,
                on_progress=Progress("Decoding", args.quiet),
                checkpoint=args.checkpoint,
            )
            if not args.quiet:
                bitrate = round(C.BITRATE_PER_CHANNEL * result.channels / 1000)
                elapsed = time.perf_counter() - t0
                print(
                    f"{args.input} (AEA {bitrate}kbps {result.channels}ch "
                    f"{_format_time(result.duration)}) -> {args.output} (WAV 44100Hz) "
                    f"in {elapsed:.2f}s ({result.duration / elapsed:.1f}x realtime)"
                )
        else:
            dump_json(args.input, args.output, args.quiet)
    except FileNotFoundError as e:
        print(f"Error: File not found - {e.filename}", file=sys.stderr)
        return 1
    except (ValueError, OSError) as e:
        print(f"Error: {e}", file=sys.stderr)
        return 1
    finally:
        if profile_ctx is not None:
            profile_ctx.__exit__(None, None, None)
    return 0


if __name__ == "__main__":
    sys.exit(main())
