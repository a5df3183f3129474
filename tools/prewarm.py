"""Regenerate / verify the committed `.jax_prewarm/` compile-cache seed.

The driver's multichip gate runs `__graft_entry__.dryrun_multichip(8)` on a
virtual 8-device XLA:CPU mesh; the sharded exact-decode programs there cost
minutes to compile cold (PERF.md "Compile time as a metric").  `.jax_prewarm/`
holds exactly those compiled programs, committed, and is seeded into the live
cache at jaxsetup time (read-only — the runtime never writes it).

  python tools/prewarm.py --check   # dryrun against the committed seed ONLY;
                                    # fail listing any program that missed
  python tools/prewarm.py --regen   # cold-compile the dryrun shapes into a
                                    # fresh cache and replace .jax_prewarm/

Run --check after any jaxpr-affecting change (it is cheap when green); run
--regen + commit when it fails.  This automates VERDICT r3 item 5: the gate
that once timed out (r2 rc:124) can no longer silently drift from the seed.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PREWARM = os.path.join(REPO, ".jax_prewarm")


def _run_dryrun(cache_dir: str, seed: bool) -> None:
    env = dict(os.environ)
    env["CARTA1_JAX_CACHE"] = cache_dir
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env["JAX_PLATFORMS"] = "cpu"
    # programs near the default 5 s record threshold get cached in one run
    # and not the next (compile-time jitter), making --check flaky; record
    # everything >= 1 s so regen and check agree on the program set
    env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "1"
    if not seed:
        env["CARTA1_NO_PREWARM_SEED"] = "1"
    r = subprocess.run(
        [sys.executable, "-c", "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=3600,
    )
    sys.stdout.write(r.stdout)
    if r.returncode != 0:
        sys.stderr.write(r.stderr[-4000:])
        raise SystemExit(f"dryrun failed rc={r.returncode}")


def check() -> int:
    """Dryrun with ONLY the committed seed available; any new cache entry is
    a program that missed (compiles >= 5 s are recorded by the cache)."""
    with tempfile.TemporaryDirectory() as d:
        for name in sorted(os.listdir(PREWARM)) if os.path.isdir(PREWARM) else []:
            src = os.path.join(PREWARM, name)
            if os.path.isfile(src):
                try:
                    os.link(src, os.path.join(d, name))
                except OSError:  # tempdir on another fs (tmpfs): EXDEV
                    shutil.copy2(src, os.path.join(d, name))
        before = set(os.listdir(d))
        _run_dryrun(d, seed=False)
        new = sorted(set(os.listdir(d)) - before)
    if new:
        print("PREWARM STALE — programs missed the committed seed:")
        for n in new:
            print("  " + n)
        print("run: python tools/prewarm.py --regen  (then commit .jax_prewarm/)")
        return 1
    print("PREWARM OK — every dryrun program was served by the committed seed.")
    return 0


def regen() -> int:
    with tempfile.TemporaryDirectory() as d:
        _run_dryrun(d, seed=False)
        entries = sorted(os.listdir(d))
        if not entries:
            raise SystemExit("dryrun produced no cache entries — nothing to commit")
        if os.path.isdir(PREWARM):
            shutil.rmtree(PREWARM)
        os.makedirs(PREWARM)
        for name in entries:
            shutil.copy2(os.path.join(d, name), os.path.join(PREWARM, name))
    print(f"regenerated {PREWARM} with {len(entries)} entries:")
    for n in entries:
        print("  " + n)
    return 0


if __name__ == "__main__":
    if "--regen" in sys.argv:
        raise SystemExit(regen())
    raise SystemExit(check())
