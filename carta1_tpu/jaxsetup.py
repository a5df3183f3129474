"""Process-level JAX configuration for the carta1_tpu engines.

Called once from every entry module that uses JAX (pipeline, processor,
CLI, parallel drivers) before the first backend use.  Two concerns:

1. **Persistent compilation cache.**  The bit-exact decoder compiles large
   programs (~1-7 min cold per shape, per backend); the cache makes every
   later process start fast.  Off only with CARTA1_NO_JAX_SETUP=1; location
   overridable with CARTA1_JAX_CACHE.  Default resolution order:
   a repo-local pre-warmed cache directory `.jax_prewarm/` next to the
   package (committed to the repo so fresh environments skip the
   multi-minute cold compiles for the standard gate/test shapes), else
   ~/.cache/carta1_tpu/jax.

2. **XLA:CPU FMA-contraction guard.**  The x86 backend contracts mul+add
   into FMA at instruction selection (AVX2+) even for strict IR, which
   silently corrupts the error-free float transformations the exact decoder
   is built on (measured; see ops/df.py and tests/test_df.py).  Pinning
   --xla_cpu_max_isa=SSE4_2 removes FMA from the ISA.  This costs CPU-only
   throughput (narrower vectors) but the CPU backend is a correctness /
   test target, not the production one.  TPU backends are unaffected.
"""

from __future__ import annotations

import os

_done = False


def setup() -> None:
    global _done
    if _done or os.environ.get("CARTA1_NO_JAX_SETUP"):
        _done = True
        return
    _done = True

    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_cpu_max_isa" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_cpu_max_isa=SSE4_2").strip()

    import jax

    if jax.config.jax_compilation_cache_dir is None:
        prewarm = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_prewarm"
        )
        default = (
            prewarm
            if os.path.isdir(prewarm)
            else os.path.join(os.path.expanduser("~"), ".cache", "carta1_tpu", "jax")
        )
        cache = os.environ.get("CARTA1_JAX_CACHE", default)
        try:
            os.makedirs(cache, exist_ok=True)
        except OSError:
            return
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
