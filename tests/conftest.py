"""Test configuration: force JAX onto a virtual 8-device CPU mesh so the
multi-chip sharding paths are exercised without TPU hardware.

Note: the axon TPU plugin in this environment ignores the JAX_PLATFORMS
environment variable, so we must set the config programmatically before any
backend is initialized."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# XLA:CPU's x86 backend contracts mul+add into FMA at instruction selection
# (AVX2+) even for strict HLO/LLVM IR, which silently corrupts the error-free
# transformations the bit-exact decoder is built on (ops/df.py).  Pinning the
# ISA below FMA support makes the CPU backend arithmetically faithful; the
# TPU backend needs no such guard (verified on-chip, tests/test_df.py).
if "xla_cpu_max_isa" not in flags:
    flags = (flags + " --xla_cpu_max_isa=SSE4_2").strip()
os.environ["XLA_FLAGS"] = flags

import jax

jax.config.update("jax_platforms", "cpu")

# The exact decoder compiles large programs (~5 min cold on XLA:CPU); the
# persistent cache makes every suite run after the first fast.
_cache = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
# keep cache keys independent of the cache dir's own path (see jaxsetup.py)
jax.config.update("jax_persistent_cache_enable_xla_caches", "none")


# ---------------------------------------------------------------------------
# Whole-suite stability: one pytest process accumulates ~130+ compiled
# XLA:CPU executables (several exact-decoder programs among them) and the
# run then aborts (SIGABRT, no diagnostic) inside backend_compile_and_load
# at the NEXT big compile — reproduced at tests/test_tpu_engine.py:239 with
# 125 GB free RAM and a 20k fd limit, so it is JIT-internal state, not a
# resource we can raise.  Dropping live executables between modules keeps
# the resident-program count bounded; the persistent disk cache makes the
# reloads cheap.
import pytest


@pytest.fixture(autouse=True, scope="module")
def _bounded_live_executables():
    yield
    jax.clear_caches()
