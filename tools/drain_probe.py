"""Measure the end-of-stream drain's (k, ahead) surface on the live relay.

The corpus metric is dominated by one deferred device->host download of
~41.7 MB of sound units (12 spooled [2, 8192, 212] chunks).  The r3 relay
study measured a ~30-40 MB/s plateau for k=8 sliced concurrent copies of
ONE buffer; the r4 drain (serial fetch per chunk) ran at ~7.4 MB/s and
the r5 pipelined drain's first sample at 5.2 MB/s — so either the
overlap shape is wrong or the plateau moves with relay weather.  This
probe answers which: same process, same buffers-worth of traffic, every
(k, ahead) config timed back to back (D2H throughput does not depend on
the H2D poisoning state, so in-process comparison is fair; fresh device
buffers per config because a fetched jax.Array caches its host copy).

Usage: python tools/drain_probe.py [--chunks 12] [--repeat 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CONFIGS = [(8, 1), (8, 2), (8, 0), (4, 2), (4, 4), (2, 4), (1, 8), (1, 2), (16, 1)]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunks", type=int, default=12)
    ap.add_argument("--repeat", type=int, default=2)
    args = ap.parse_args()

    import jax

    from carta1_tpu.jaxtools import fetch_many

    shape = (2, 8192, 212)  # the corpus spool chunk
    nbytes = int(np.prod(shape))
    host = np.arange(nbytes, dtype=np.uint8).reshape(shape)
    results = []
    for rep in range(args.repeat):
        for k, ahead in CONFIGS:
            bufs = [jax.device_put(host) for _ in range(args.chunks)]
            jax.block_until_ready(bufs)
            t0 = time.perf_counter()
            total = 0
            for out in fetch_many(bufs, k=k, ahead=ahead):
                total += out.nbytes
            dt = time.perf_counter() - t0
            del bufs
            r = {"k": k, "ahead": ahead, "rep": rep,
                 "mbps": round(total / dt / 1e6, 1), "seconds": round(dt, 2)}
            results.append(r)
            print(json.dumps(r), flush=True)
    best = max(results, key=lambda r: r["mbps"])
    out = {
        "note": (
            "In-process D2H drain throughput per (k slices, ahead buffers) config, "
            "fresh device buffers per config, 12x3.47 MB chunks (the corpus spool). "
            "The first row of rep 0 absorbs the process's first-D2H setup cost. "
            "Read ACROSS configs within a rep AND across reps: weather dominates."
        ),
        "best": best,
        "results": results,
    }
    path = os.path.join(REPO, "DRAIN_PROBE_r05.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"best": best, "n_results": len(results), "artifact": path}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
