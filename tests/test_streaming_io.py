"""Bounded-memory streaming host IO + mid-stream checkpoint/resume.

Pins: streaming encode/decode produce byte-identical output to the
in-memory paths; a transcode killed mid-file resumes from its checkpoint
with byte-identical output; the streaming reader never materializes the
file (memmap + per-chunk conversion)."""

import os

import numpy as np
import pytest

from carta1_tpu import processor
from carta1_tpu.io import aea, wav
from carta1_tpu.io.streams import (
    AeaStreamReader,
    AeaStreamWriter,
    StreamCheckpoint,
    WavStreamReader,
    WavStreamWriter,
)

from signals import sine, white_noise

CHUNK = 64  # small chunks -> several checkpoints over a 2 s file


def _make_wav(path, seconds=2.0, channels=2):
    n = int(44100 * seconds)
    chans = []
    for ch in range(channels):
        sig = 0.4 * sine(300 + 150 * ch, length=n) + 0.1 * white_noise(ch + 1, n)
        sig[n // 3 : n // 3 + 400] += 0.35
        chans.append(np.clip(sig, -1, 1))
    wav.write_wav(path, np.stack(chans).astype(np.float32))
    return path


def test_wav_stream_reader_matches_read_wav(tmp_path):
    p = _make_wav(str(tmp_path / "in.wav"))
    info, full = wav.read_wav(p)
    r = WavStreamReader(p)
    assert r.info == info
    got = np.concatenate(
        [r.read_frames(s, 13) for s in range(0, r.num_frames, 13)], axis=1
    )[:, : info.num_samples]
    assert np.array_equal(got, full)


def test_wav_stream_writer_matches_write_wav(tmp_path):
    _, pcm = wav.read_wav(_make_wav(str(tmp_path / "in.wav")))
    ref = str(tmp_path / "ref.wav")
    wav.write_wav(ref, pcm)
    out = str(tmp_path / "out.wav")
    w = WavStreamWriter(out, channels=pcm.shape[0])
    for s in range(0, pcm.shape[1], 7000):
        w.append(pcm[:, s : s + 7000])
    w.close()
    assert open(out, "rb").read() == open(ref, "rb").read()


def test_streaming_encode_matches_in_memory(tmp_path):
    p = _make_wav(str(tmp_path / "in.wav"))
    out = str(tmp_path / "out.aea")
    processor.encode_file(p, out, engine="exact", title="t", chunk_frames=CHUNK)
    # in-memory reference with identical chunking (chunk boundaries are part
    # of the stream semantics: state carries across them)
    info, pcm = wav.read_wav(p)
    units = processor.encode_pcm(pcm, engine="exact", chunk_frames=CHUNK)
    meta, got = aea.read_aea(out)
    assert meta.channel_count == 2 and meta.frame_count == got.shape[0]
    assert np.array_equal(got, units)


def test_streaming_decode_matches_in_memory(tmp_path):
    p = _make_wav(str(tmp_path / "in.wav"), channels=1)
    aea_path = str(tmp_path / "a.aea")
    processor.encode_file(p, aea_path, engine="exact", chunk_frames=CHUNK)
    out = str(tmp_path / "round.wav")
    processor.decode_file(aea_path, out, engine="exact", chunk_frames=CHUNK)
    meta, units = aea.read_aea(aea_path)
    pcm = processor.decode_units(units, 1, engine="exact", chunk_frames=CHUNK)
    ref = str(tmp_path / "ref.wav")
    wav.write_wav(ref, pcm)
    assert open(out, "rb").read() == open(ref, "rb").read()


class _KillAt:
    """Progress callback that raises after a set number of calls."""

    def __init__(self, after):
        self.after = after
        self.calls = 0

    def __call__(self, done, total):
        self.calls += 1
        if self.calls >= self.after:
            raise KeyboardInterrupt("simulated kill")


@pytest.mark.parametrize("mode", ["encode", "decode"])
def test_kill_and_resume_byte_identical(tmp_path, mode):
    p = _make_wav(str(tmp_path / "in.wav"))
    aea_ref = str(tmp_path / "ref.aea")
    processor.encode_file(p, aea_ref, engine="exact", chunk_frames=CHUNK)

    if mode == "encode":
        src, ref_out, run = p, aea_ref, processor.encode_file
        kwargs = dict(engine="exact", chunk_frames=CHUNK)
    else:
        wav_ref = str(tmp_path / "ref.wav")
        processor.decode_file(aea_ref, wav_ref, engine="exact", chunk_frames=CHUNK)
        src, ref_out, run = aea_ref, wav_ref, processor.decode_file
        kwargs = dict(engine="exact", chunk_frames=CHUNK)

    out = str(tmp_path / f"resumed.{mode}")
    ck = str(tmp_path / "ck.npz")
    with pytest.raises(KeyboardInterrupt):
        run(src, out, on_progress=_KillAt(2), checkpoint=ck, checkpoint_every=1, **kwargs)
    assert os.path.exists(ck), "checkpoint must survive the kill"
    # resume to completion
    run(src, out, checkpoint=ck, checkpoint_every=1, **kwargs)
    assert not os.path.exists(ck), "checkpoint removed after success"
    assert open(out, "rb").read() == open(ref_out, "rb").read()


def test_aea_stream_writer_resume_truncates(tmp_path):
    path = str(tmp_path / "x.aea")
    w = AeaStreamWriter(path, channel_count=1)
    w.append(np.full((5, 212), 7, np.uint8))
    w.close()
    w2 = AeaStreamWriter(path, channel_count=1, resume_at_frame=3)
    w2.append(np.full((2, 212), 9, np.uint8))
    w2.close()
    r = AeaStreamReader(path)
    assert r.num_units == 5 and r.meta.frame_count == 5
    assert (r.read_units(0, 3) == 7).all() and (r.read_units(3, 2) == 9).all()


def test_checkpoint_atomic_roundtrip(tmp_path):
    ck = StreamCheckpoint(str(tmp_path / "c.npz"))
    state = [{"a": np.arange(4, dtype=np.float32)}, {"a": np.ones(4, np.float32)}]
    ck.save(123, state, {"input": "/x"})
    off, st, meta = ck.load()
    assert off == 123 and meta["input"] == "/x"
    assert np.array_equal(st[0]["a"], state[0]["a"]) and np.array_equal(st[1]["a"], state[1]["a"])
    ck.remove()
    assert ck.load() is None
