"""Transfer-aware JAX utilities for the tunneled device runtime.

The IFRT-proxy relay this environment runs JAX through has two measured
pathologies (see PERF.md "Relay transfer pathology" for the full study):

1. **Device->host copies are slow and poisonous.**  D2H runs at
   ~16-40 MB/s regardless of size, and the FIRST D2H in a process
   permanently degrades every later host->device copy from ~1.4 GB/s to
   ~20-30 MB/s.  ``np.asarray`` on ANY device array — even a 28-byte
   state vector — trips it.  Rules: never download what you don't need,
   defer every download to the last possible moment, and make the
   downloads you must do k-way concurrent (``fetch``, ~2x).

2. **Programs with embedded array constants correlate with the same
   degradation.**  ``hoisted_jit`` traces the function to a jaxpr, pulls
   out ``closed_jaxpr.consts`` (exactly the array literals XLA would have
   embedded), uploads them once, and evaluates the jaxpr with them as
   leading arguments.  Bitwise semantics are unchanged — the same jaxpr
   runs on the same values; XLA simply receives them as parameters it
   cannot fold.  It also shrinks executables, which this runtime re-ships
   over the relay.

Neither transform changes any computed bit; both are no-ops in spirit on
a directly-attached TPU (PCIe/ICI hosts measure GB/s both ways).
"""

from __future__ import annotations

import functools

import jax
import numpy as np


def hoisted_jit(fn, donate_argnums: tuple[int, ...] = ()):
    """jax.jit(fn) with all array constants passed as runtime arguments.

    fn must be a pure function of array pytrees (no static/python args —
    close over those first).  donate_argnums refers to fn's own positional
    arguments, as with jax.jit.
    """
    sig_cache: dict = {}

    def _signature(args):
        leaves, treedef = jax.tree.flatten(args)
        return (
            treedef,
            tuple((np.shape(l), np.result_type(l).str) for l in leaves),
        )

    @functools.wraps(fn)
    def call(*args):
        key = _signature(args)
        entry = sig_cache.get(key)
        if entry is None:
            closed, out_shape = jax.make_jaxpr(fn, return_shape=True)(*args)
            out_treedef = jax.tree.structure(out_shape)
            jaxpr = closed.jaxpr
            consts = tuple(jax.device_put(c) for c in closed.consts)

            def run(consts, *args):
                flat, _ = jax.tree.flatten(args)
                out_flat = jax.core.eval_jaxpr(jaxpr, consts, *flat)
                return jax.tree.unflatten(out_treedef, out_flat)

            jfn = jax.jit(run, donate_argnums=tuple(d + 1 for d in donate_argnums))
            entry = (jfn, consts)
            sig_cache[key] = entry
        jfn, consts = entry
        return jfn(consts, *args)

    return call


@functools.lru_cache(maxsize=None)
def _flat_split(k: int):
    import jax.numpy as jnp

    return hoisted_jit(lambda v: tuple(jnp.array_split(v.reshape(-1), k)))


def fetch(x, k: int = 8) -> np.ndarray:
    """Device -> host copy, k-way sliced for the relay's slow D2H path.

    The relay transfers each buffer serially at ~16 MB/s; k concurrent
    slice copies overlap to ~38 MB/s (measured plateau — higher k loses it
    again).  Small arrays (<1 MB) go straight through.  NOTE: any D2H —
    including this one — permanently degrades later H2D in this process
    (see module docstring); callers sequence all uploads first."""
    if not isinstance(x, jax.Array):
        return np.asarray(x)
    if x.nbytes < (1 << 20) or k <= 1:
        return np.asarray(x)
    parts = _flat_split(k)(x)
    for p in parts:
        p.copy_to_host_async()
    return np.concatenate([np.asarray(p) for p in parts]).reshape(x.shape)


def _start_copy(x, k: int):
    """Begin an async D2H of x (k-sliced when large); returns a handle."""
    if not isinstance(x, jax.Array):
        return ("host", x)
    if x.nbytes < (1 << 20) or k <= 1:
        x.copy_to_host_async()
        return ("whole", x)
    parts = _flat_split(k)(x)
    for p in parts:
        p.copy_to_host_async()
    return ("parts", parts, x.shape)


def _finish_copy(handle) -> np.ndarray:
    if handle[0] == "parts":
        return np.concatenate([np.asarray(p) for p in handle[1]]).reshape(handle[2])
    return np.asarray(handle[1])


def fetch_many(arrays, k: int | None = None, ahead: int | None = None):
    """Ordered D2H of a sequence of device arrays, pipelined ACROSS arrays.

    ``fetch`` overlaps the k slice copies within one buffer, but a loop of
    fetch() calls still serializes across buffers: buffer i+1's transfer
    cannot start until buffer i is fully on host AND the caller's
    host-side work on it is done.  The r4 corpus drain paid exactly that
    (measured ~7.4 MB/s against the ~30-40 MB/s k-sliced relay plateau,
    VERDICT r4 item 2).  This generator keeps the NEXT `ahead` buffers'
    slice copies in flight while the current one is materialized and
    consumed, so the relay pipe stays busy through host-side writes.

    `k` / `ahead` default to CARTA1_DRAIN_K / CARTA1_DRAIN_AHEAD (8 / 2).
    tools/drain_probe.py measured the (k, ahead) surface on the live
    relay (r5): throughput is dominated by relay WEATHER, not shape —
    1.8 to 62 MB/s for identical configs within one process over ~30 s;
    with >= 8 slices in flight all shapes sit within noise of each other
    in a steady window.  (8, 2) took the best fast-window sample.
    Yields numpy arrays in input order."""
    import os

    if k is None:
        k = int(os.environ.get("CARTA1_DRAIN_K", "8"))
    if ahead is None:
        ahead = int(os.environ.get("CARTA1_DRAIN_AHEAD", "2"))
    arrays = list(arrays)
    n = len(arrays)
    handles: dict[int, tuple] = {}
    for i in range(n):
        for j in range(i, min(n, i + ahead + 1)):
            if j not in handles:
                handles[j] = _start_copy(arrays[j], k)
        yield _finish_copy(handles.pop(i))


def zeros_like_tree(tree):
    """Host (numpy) zero pytree with the template's shapes/dtypes.

    Reads only metadata — never downloads device leaves (a ``np.asarray``
    on a 46-float delay line is exactly the poisonous D2H above)."""
    return jax.tree.map(
        lambda l: np.zeros(np.shape(l), np.result_type(l)), tree
    )
