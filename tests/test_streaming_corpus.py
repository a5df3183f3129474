"""Streaming scan mode + corpus driver (checkpoint/resume, failure
recovery)."""

import json
import os

import numpy as np
import pytest

from carta1_tpu.framedata import FrameData
from carta1_tpu.io.wav import read_wav, write_wav
from carta1_tpu.parallel.corpus import transcode_corpus
from carta1_tpu.pipeline import decode_frames, encode_frames
from carta1_tpu.pipeline.streaming import (
    chunk_frames_array,
    decode_stream,
    encode_stream,
)

from signals import frames, sine, white_noise


def test_scan_streaming_equals_batched():
    pcm = frames(white_noise(11, 512 * 12))
    chunks, nvalid = chunk_frames_array(pcm, 4)
    fds, _ = encode_stream(chunks)
    fd_scan = FrameData(*(np.asarray(x).reshape((-1,) + x.shape[2:]) for x in
                          (fds.n_bfu, fds.block_modes, fds.scale_factors,
                           fds.word_lengths, fds.quantized)))
    fd_batch, _ = encode_frames(pcm)
    fd_batch = fd_batch.to_numpy()
    assert np.array_equal(fd_scan.block_modes[:nvalid], fd_batch.block_modes)
    assert np.array_equal(fd_scan.scale_factors[:nvalid], fd_batch.scale_factors)
    qd = np.abs(fd_scan.quantized[:nvalid] - fd_batch.quantized)
    assert qd.max() <= 1 and (qd != 0).mean() < 1e-3  # XLA shape-dependent ULP

    pcm_chunks, _ = decode_stream(fds)
    want, _ = decode_frames(fd_batch)
    got = np.asarray(pcm_chunks).reshape(-1, 512)[:nvalid]
    np.testing.assert_allclose(got, np.asarray(want), atol=1e-5)

    # decode of the SAME frame data must be bitwise shape-invariant:
    # scan-over-chunks == one batch (PERF.md "chunked == batched, bitwise")
    chunked_fd = FrameData(*(np.asarray(x).reshape((3, 4) + x.shape[1:]) for x in
                             (fd_batch.n_bfu, fd_batch.block_modes,
                              fd_batch.scale_factors, fd_batch.word_lengths,
                              fd_batch.quantized)))
    scan_pcm, _ = decode_stream(chunked_fd)
    a = np.asarray(scan_pcm).reshape(-1, 512)
    b = np.asarray(want)
    assert ((a.view(np.int32) == b.view(np.int32)) | ((a == 0) & (b == 0))).all()


def _make_corpus(tmp_path, n=4):
    jobs = []
    for i in range(n):
        wav_path = str(tmp_path / f"in{i}.wav")
        sig = (sine(200 + 100 * i, length=4096) * 0.5)[None, :].astype(np.float32)
        write_wav(wav_path, sig)
        jobs.append((wav_path, str(tmp_path / f"out{i}.aea")))
    return jobs


def test_corpus_encode_all(tmp_path):
    jobs = _make_corpus(tmp_path)
    res = transcode_corpus(jobs, engine="exact", process_index=0, process_count=1)
    assert len(res.completed) == 4 and not res.failed
    for _, out in jobs:
        assert os.path.exists(out)
    assert res.frames == 4 * 8  # 4096 samples -> 8 frames each


def test_corpus_process_striping(tmp_path):
    jobs = _make_corpus(tmp_path)
    r0 = transcode_corpus(jobs, engine="exact", process_index=0, process_count=2)
    r1 = transcode_corpus(jobs, engine="exact", process_index=1, process_count=2)
    assert sorted(r0.completed + r1.completed) == sorted(j[0] for j in jobs)
    assert set(r0.completed).isdisjoint(r1.completed)


def test_corpus_checkpoint_resume(tmp_path):
    jobs = _make_corpus(tmp_path)
    ckpt = str(tmp_path / "ckpt.json")
    r1 = transcode_corpus(jobs[:2], engine="exact", checkpoint_path=ckpt,
                          process_index=0, process_count=1)
    assert len(r1.completed) == 2
    # resume over the full corpus: first two skipped
    r2 = transcode_corpus(jobs, engine="exact", checkpoint_path=ckpt,
                          process_index=0, process_count=1)
    assert sorted(r2.skipped) == sorted(j[0] for j in jobs[:2])
    assert len(r2.completed) == 2
    done = json.load(open(ckpt))["done"]
    assert len(done) == 4


def test_corpus_failure_recovery(tmp_path):
    jobs = _make_corpus(tmp_path, 2)
    bad = str(tmp_path / "missing.wav")
    jobs.append((bad, str(tmp_path / "bad.aea")))
    res = transcode_corpus(jobs, engine="exact", process_index=0, process_count=1)
    assert len(res.completed) == 2
    assert bad in res.failed and "FileNotFoundError" in res.failed[bad]
    assert not os.path.exists(str(tmp_path / "bad.aea"))


def test_corpus_decode_mode(tmp_path):
    jobs = _make_corpus(tmp_path, 2)
    transcode_corpus(jobs, engine="exact", process_index=0, process_count=1)
    djobs = [(out, str(tmp_path / f"rt{i}.wav")) for i, (_, out) in enumerate(jobs)]
    res = transcode_corpus(djobs, mode="decode", engine="exact",
                           process_index=0, process_count=1)
    assert len(res.completed) == 2 and not res.failed
    info, pcm = read_wav(djobs[0][1])
    assert info.channels == 1 and pcm.shape[1] == 8 * 512


def test_encode_clips_batched_equals_individual():
    """Config 4: many ragged clips in one vmapped batch == encoding each
    clip alone (padding frames must not leak across clips)."""
    from carta1_tpu.processor import encode_clips, encode_pcm

    rng = np.random.default_rng(5)
    clips = [
        (sine(300 + 100 * i, length=512 * (2 + i)) * 0.5).astype(np.float32)
        for i in range(4)
    ]
    clips.append((rng.standard_normal(1000) * 0.2).astype(np.float32))  # ragged tail
    batched = encode_clips(clips)
    for clip, units in zip(clips, batched):
        solo = encode_pcm(clip[None, :], engine="tpu")
        assert units.shape == solo.shape
        # ULP wobble across batch shapes may flip rare quantizer boundaries
        assert (units != solo).mean() < 0.01


def test_encode_clips_stereo_and_mixed():
    """Config 4 with stereo clips: [2, N] clips interleave L,R like the
    reference's stereo stream; mono and stereo mix in one batch."""
    from carta1_tpu.processor import encode_clips, encode_pcm

    rng = np.random.default_rng(11)
    stereo = np.stack([
        (sine(440, length=512 * 3) * 0.5).astype(np.float32),
        (rng.standard_normal(512 * 3) * 0.2).astype(np.float32),
    ])
    mono = (sine(700, length=512 * 2) * 0.4).astype(np.float32)
    out_stereo, out_mono = encode_clips([stereo, mono])
    assert out_stereo.shape == (2 * 3, 212) and out_mono.shape == (2, 212)
    solo = encode_pcm(stereo, engine="tpu")  # interleaved stereo reference path
    assert out_stereo.shape == solo.shape
    assert (out_stereo != solo).mean() < 0.01
    solo_m = encode_pcm(mono[None], engine="tpu")
    assert (out_mono != solo_m).mean() < 0.01
