"""Distributed corpus transcoding with checkpoint/resume and failure
recovery.

The TPU-native replacement for the reference's one-file-at-a-time CLI loop:
a corpus of WAV (or AEA) files is striped across JAX processes
(`process_index`-striped file assignment over the DCN, SURVEY §2.3); each
process batches its files through the local chip.  Transcoding is stateless
above the file level, so recovery is re-dispatch: a failed or interrupted
file is simply retried, and a checkpoint file records completed outputs so a
10-hour job resumes where it stopped (SURVEY §5 checkpoint/resume).
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
import traceback
from typing import Callable, Sequence

from carta1_tpu.options import EncoderOptions
from carta1_tpu.processor import DEFAULT_CHUNK_FRAMES, decode_file, encode_file


@dataclasses.dataclass
class CorpusResult:
    completed: list[str]
    failed: dict[str, str]          # input path -> error
    skipped: list[str]              # already done per checkpoint
    frames: int
    elapsed: float

    @property
    def realtime_multiple(self) -> float:
        audio_seconds = self.frames * 512 / 44100
        return audio_seconds / max(self.elapsed, 1e-9)


class Checkpoint:
    """Crash-safe progress record: one JSON file, atomically replaced."""

    def __init__(self, path: str | None):
        self.path = path
        self.done: set[str] = set()
        if path and os.path.exists(path):
            try:
                with open(path) as f:
                    self.done = set(json.load(f).get("done", []))
            except (OSError, json.JSONDecodeError):
                self.done = set()

    def mark(self, key: str) -> None:
        self.done.add(key)
        if self.path:
            tmp = self.path + ".tmp"
            with open(tmp, "w") as f:
                json.dump({"done": sorted(self.done)}, f)
            os.replace(tmp, self.path)


def _assigned(items: Sequence, process_index: int, process_count: int) -> list:
    return list(items[process_index::process_count])


def transcode_corpus(
    jobs: Sequence[tuple[str, str]],
    mode: str = "encode",
    options: EncoderOptions | None = None,
    engine: str = "tpu",
    chunk_frames: int = DEFAULT_CHUNK_FRAMES,
    checkpoint_path: str | None = None,
    process_index: int | None = None,
    process_count: int | None = None,
    max_retries: int = 1,
    on_file_done: Callable[[str, int], None] | None = None,
    mesh="auto",
) -> CorpusResult:
    """Transcode a corpus of (input, output) jobs.

    mode: "encode" (WAV->AEA) or "decode" (AEA->WAV).
    process_index/count default to jax.process_index()/process_count() so a
    multi-host launch automatically stripes files; single host == 1 process.

    mesh: file striping (across processes) COMPOSES with frame sharding
    (across this process's local devices): "auto" builds a mesh over
    jax.local_devices() when more than one is present, so every file's
    frames spread over the local chips while the corpus spreads over hosts.
    Pass an explicit jax.sharding.Mesh, or None to keep single-device
    compute.
    """
    if process_index is None or process_count is None:
        try:
            import jax

            process_index = jax.process_index()
            process_count = jax.process_count()
        except Exception:
            process_index, process_count = 0, 1

    if mesh == "auto":
        mesh = None
        if engine == "tpu":
            try:
                import jax

                local = jax.local_devices()
                if len(local) > 1:
                    from carta1_tpu.parallel.sharding import make_mesh

                    mesh = make_mesh(local)
            except Exception:
                mesh = None

    ckpt = Checkpoint(checkpoint_path)
    my_jobs = _assigned(list(jobs), process_index, process_count)
    completed: list[str] = []
    failed: dict[str, str] = {}
    skipped: list[str] = []
    frames = 0
    t0 = time.perf_counter()

    for input_path, output_path in my_jobs:
        if input_path in ckpt.done and os.path.exists(output_path):
            skipped.append(input_path)
            continue
        last_err = None
        for _attempt in range(max_retries + 1):
            try:
                if mode == "encode":
                    result = encode_file(
                        input_path, output_path, options=options, engine=engine,
                        title=os.path.splitext(os.path.basename(output_path))[0],
                        chunk_frames=chunk_frames, mesh=mesh,
                    )
                elif mode == "decode":
                    result = decode_file(
                        input_path, output_path, engine=engine, chunk_frames=chunk_frames,
                        mesh=mesh,
                    )
                else:
                    raise ValueError(f"Unknown mode: {mode}")
                frames += result.frames
                completed.append(input_path)
                ckpt.mark(input_path)
                if on_file_done:
                    on_file_done(input_path, result.frames)
                last_err = None
                break
            except Exception as e:  # noqa: BLE001 -- per-file isolation is the point
                last_err = f"{type(e).__name__}: {e}\n{traceback.format_exc(limit=3)}"
        if last_err is not None:
            failed[input_path] = last_err
            # a partial output from a failed attempt must not look complete
            if os.path.exists(output_path):
                try:
                    os.remove(output_path)
                except OSError:
                    pass

    return CorpusResult(
        completed=completed,
        failed=failed,
        skipped=skipped,
        frames=frames,
        elapsed=time.perf_counter() - t0,
    )
