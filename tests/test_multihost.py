"""Two-process jax.distributed smoke test (multi-host path on CPU).

Launches two real processes that initialize jax.distributed against a local
coordinator and run the striped corpus driver -- the same code path a pod
slice uses over DCN, minus the hardware."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from carta1_tpu.io.wav import write_wav

from signals import sine

_WORKER = r"""
import sys, json
import jax
jax.config.update("jax_platforms", "cpu")
coordinator, pid, jobs_path, out_dir = sys.argv[1:5]
jax.distributed.initialize(coordinator_address=coordinator, num_processes=2, process_id=int(pid))
from carta1_tpu.parallel.corpus import transcode_corpus
jobs = json.load(open(jobs_path))
res = transcode_corpus([tuple(j) for j in jobs], engine="exact")
print(json.dumps({"pid": jax.process_index(), "n": jax.process_count(),
                  "completed": sorted(res.completed), "failed": list(res.failed)}))
"""


@pytest.mark.skipif(os.environ.get("CARTA1_SKIP_MULTIPROC") == "1", reason="multiproc disabled")
def test_two_process_distributed_corpus(tmp_path):
    jobs = []
    for i in range(4):
        wav_path = str(tmp_path / f"in{i}.wav")
        write_wav(wav_path, (sine(200 + 50 * i, length=2048) * 0.5)[None, :].astype(np.float32))
        jobs.append([wav_path, str(tmp_path / f"out{i}.aea")])
    jobs_path = str(tmp_path / "jobs.json")
    json.dump(jobs, open(jobs_path, "w"))

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coordinator = f"127.0.0.1:{port}"

    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
        + env.get("PYTHONPATH", "").split(os.pathsep)
    )
    env.pop("XLA_FLAGS", None)  # plain 1-device CPU per process
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, coordinator, str(pid), jobs_path, str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=240)
        assert p.returncode == 0, f"worker failed: {err[-2000:]}"
        outs.append(json.loads(out.strip().splitlines()[-1]))

    assert {o["pid"] for o in outs} == {0, 1}
    assert all(o["n"] == 2 for o in outs)
    assert all(not o["failed"] for o in outs)
    done0, done1 = outs[0]["completed"], outs[1]["completed"]
    assert sorted(done0 + done1) == sorted(j[0] for j in jobs)
    assert set(done0).isdisjoint(done1)
    for _, out_path in jobs:
        assert os.path.exists(out_path)


_WORKER_SHARDED = r"""
import os, sys, json
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
coordinator, pid, jobs_path, out_dir = sys.argv[1:5]
jax.distributed.initialize(coordinator_address=coordinator, num_processes=2, process_id=int(pid))
from carta1_tpu.parallel.corpus import transcode_corpus
from carta1_tpu.parallel.sharding import make_mesh
mesh = make_mesh(jax.local_devices())   # 4 virtual CPU devices per process
assert mesh.devices.size == 4, mesh.devices
jobs = json.load(open(jobs_path))
res = transcode_corpus([tuple(j) for j in jobs], engine="tpu", mesh=mesh, chunk_frames=16)
print(json.dumps({"pid": jax.process_index(), "n": jax.process_count(),
                  "devices": mesh.devices.size,
                  "completed": sorted(res.completed), "failed": list(res.failed)}))
"""


@pytest.mark.skipif(os.environ.get("CARTA1_SKIP_MULTIPROC") == "1", reason="multiproc disabled")
def test_striping_composed_with_sharding(tmp_path):
    """VERDICT item 5: file striping across 2 processes AND frame sharding
    across 4 virtual devices per process, both active in the production
    corpus driver (chunked streaming encode with 2-frame state carry)."""
    jobs = []
    for i in range(4):
        wav_path = str(tmp_path / f"in{i}.wav")
        write_wav(wav_path, (sine(200 + 70 * i, length=24 * 512) * 0.5)[None, :].astype(np.float32))
        jobs.append([wav_path, str(tmp_path / f"out{i}.aea")])
    jobs_path = str(tmp_path / "jobs.json")
    json.dump(jobs, open(jobs_path, "w"))

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coordinator = f"127.0.0.1:{port}"

    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
        + env.get("PYTHONPATH", "").split(os.pathsep)
    )
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER_SHARDED, coordinator, str(pid), jobs_path, str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=1500)
        assert p.returncode == 0, f"worker failed: {err[-2000:]}"
        outs.append(json.loads(out.strip().splitlines()[-1]))

    assert all(o["devices"] == 4 for o in outs)
    assert all(o["n"] == 2 for o in outs)
    assert all(not o["failed"] for o in outs)
    done0, done1 = outs[0]["completed"], outs[1]["completed"]
    assert sorted(done0 + done1) == sorted(j[0] for j in jobs)
    assert set(done0).isdisjoint(done1)
    # outputs decodable and quality-sane via the gold engine
    from carta1_tpu.io import aea as _aea
    from carta1_tpu.gold import gold_decode_frames
    from carta1_tpu.io.bitstream_np import unpack_frames as _unpack
    for inp, outp in jobs:
        meta, units = _aea.read_aea(outp)
        assert units.shape[0] == 24
        pcm, _ = gold_decode_frames(_unpack(units))
        assert np.isfinite(pcm).all() and (np.abs(pcm) > 1e-4).any()
