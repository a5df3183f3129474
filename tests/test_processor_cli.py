"""High-level processor + CLI round trips (parity: tests/processor.test.js
and the reference CLI behaviors)."""

import json
import os

import numpy as np
import pytest

from carta1_tpu.constants import AEA_HEADER_SIZE, CODEC_DELAY, SOUND_UNIT_SIZE
from carta1_tpu.io import aea
from carta1_tpu.io.wav import read_wav, write_wav
from carta1_tpu.processor import decode_units, encode_pcm

from signals import sine, white_noise


@pytest.fixture(params=["exact", "tpu"])
def engine(request):
    return request.param


def test_mono_roundtrip(engine, tmp_path):
    sig = sine(440, length=44100)[None, :] * 0.8
    units = encode_pcm(sig.astype(np.float32), engine=engine)
    assert units.shape == (-(-44100 // 512), SOUND_UNIT_SIZE)
    pcm = decode_units(units, 1, engine=engine)
    assert pcm.shape[0] == 1
    n = sig.shape[1] - CODEC_DELAY
    err = np.abs(pcm[0, CODEC_DELAY:sig.shape[1]] - sig[0, :n])
    assert err.mean() < 0.01


def test_stereo_roundtrip_interleave(engine):
    left = sine(440, length=512 * 6) * 0.5
    right = sine(880, length=512 * 6) * 0.5
    pcm_in = np.stack([left, right]).astype(np.float32)
    units = encode_pcm(pcm_in, engine=engine)
    assert units.shape[0] == 12  # L,R interleaved
    pcm = decode_units(units, 2, engine=engine)
    assert pcm.shape[0] == 2
    # channels must decode independently: energy at each tone stays in its own
    # channel after delay compensation
    for ch, freq in ((0, 440), (1, 880)):
        out = pcm[ch, CODEC_DELAY:512 * 6]
        src = np.sin(2 * np.pi * freq * np.arange(len(out)) / 44100) * 0.5
        err = np.abs(out - src.astype(np.float32))
        assert err.mean() < 0.02


def test_stereo_odd_frames_dummy_padding(engine):
    units = encode_pcm(np.zeros((2, 512 * 3), np.float32), engine=engine)
    # drop the final R frame to simulate the odd-count case
    pcm = decode_units(units[:-1], 2, engine=engine)
    assert pcm.shape == (2, 512 * 3)


def test_chunked_equals_unchunked(engine):
    sig = (white_noise(3, 512 * 10) * 0.4)[None, :].astype(np.float32)
    whole = encode_pcm(sig, engine=engine, chunk_frames=4096)
    chunked = encode_pcm(sig, engine=engine, chunk_frames=3)
    if engine == "exact":
        assert np.array_equal(whole, chunked)
    else:
        # XLA: ULP wobble across batch shapes may flip a rounding boundary
        assert (whole != chunked).mean() < 0.01


def test_cli_encode_decode_json(tmp_path):
    from carta1_tpu.cli import main

    wav_in = str(tmp_path / "in.wav")
    aea_out = str(tmp_path / "out.aea")
    wav_out = str(tmp_path / "out.wav")
    json_out = str(tmp_path / "dump.json")

    sig = (sine(440, length=22050) * 0.7)[None, :].astype(np.float32)
    write_wav(wav_in, sig)

    assert main(["--encode", wav_in, aea_out, "--quiet", "--title", "t", "--engine", "exact"]) == 0
    assert os.path.getsize(aea_out) == AEA_HEADER_SIZE + SOUND_UNIT_SIZE * -(-22050 // 512)
    assert main(["--decode", aea_out, wav_out, "--quiet", "--engine", "exact"]) == 0
    assert main(["--json", aea_out, json_out, "--quiet", "--force"]) == 0

    dump = json.load(open(json_out))
    assert dump["header"]["title"] == "t"
    assert dump["summary"]["totalFrames"] == -(-22050 // 512)
    assert dump["frames"][0]["nBfu"] == 52
    assert "quantizedCoefficients" in dump["frames"][0]

    info, pcm = read_wav(wav_out)
    assert info.channels == 1


def test_cli_refuses_overwrite(tmp_path):
    from carta1_tpu.cli import main

    wav_in = str(tmp_path / "in.wav")
    out = str(tmp_path / "out.aea")
    write_wav(wav_in, np.zeros((1, 1024), np.float32))
    open(out, "w").write("x")
    assert main(["--encode", wav_in, out, "--quiet"]) == 1  # exists, no --force


def test_cli_mode_validation(tmp_path):
    from carta1_tpu.cli import main

    assert main(["a", "b"]) == 1
    assert main(["--encode", "--decode", "a", "b"]) == 1


def test_cli_title_validation():
    from carta1_tpu.cli import validate_title

    validate_title("ok title")
    with pytest.raises(ValueError):
        validate_title("café")
    with pytest.raises(ValueError):
        validate_title("x" * 256)


def test_cli_json_error_frames(tmp_path):
    """Per-frame error records + real errorFrames counts (reference
    cli.js:581-609): a truncated trailing unit becomes an error entry, and
    a structurally-overrunning unit is flagged (extension)."""
    import json as _json

    from carta1_tpu.cli import main
    from carta1_tpu.io.bitstream_np import pack_frames
    from carta1_tpu.framedata import FrameData
    from carta1_tpu.io import aea as _aea

    # 3 valid silent frames + 1 overrunning unit, then truncate a 5th
    fd = FrameData.zeros(3)
    units = pack_frames(fd)
    bad = np.zeros((1, SOUND_UNIT_SIZE), np.uint8)
    bad[0, 0] = 0x00
    bad[0, 1] = 0xFF  # bfuIdx=7 -> nBfu 52
    bad[0, 2:28] = 0xFF  # word lengths all 15 -> coeff bits overrun the unit
    all_units = np.concatenate([units, bad])
    path = str(tmp_path / "x.aea")
    _aea.write_aea(path, all_units, channel_count=1)
    # declare 5 frames but only supply 4.5: header count = 5, partial tail
    raw = bytearray(open(path, "rb").read())
    raw[260:264] = (5).to_bytes(4, "little")
    raw += b"\x01" * 100  # partial trailing unit
    open(path, "wb").write(bytes(raw))

    out = str(tmp_path / "d.json")
    assert main(["--json", path, out, "--quiet"]) == 0
    dump = _json.load(open(out))
    assert dump["summary"]["totalFrames"] == 5
    assert dump["summary"]["errorFrames"] == 2  # overrun + short unit
    assert dump["summary"]["validFrames"] == 3
    assert dump["summary"]["silentFrames"] == 3
    errs = [f for f in dump["frames"] if f.get("error")]
    assert len(errs) == 2
    assert any("212 bytes" in f["error"] for f in errs)
    assert any("overruns" in f["error"] for f in errs)
    assert all("offsetHex" in f for f in errs)
