"""Profiling helpers — the aux-tracing analog of stenos::timer (SURVEY §5).

The reference exposes a nanosecond timer through its C API
(stenos.h:258-288) and benches with best-of-N walls; on TPU the equivalents
are (a) relay-safe wall timing (this module) and (b) jax.profiler traces for
kernel-level inspection.
"""

import contextlib
import time

import jax
import jax.numpy as jnp


def checksum_forced(fn, *args):
    """Run fn(*args) and force completion through a device-side checksum
    fetched as a scalar. On relays where block_until_ready returns early
    (NOTES.md) this is the only trustworthy timing barrier."""
    out = fn(*args)
    leaves = jax.tree_util.tree_leaves(out)
    chk = sum(jnp.sum(x.astype(jnp.int64) if x.dtype != jnp.bool_ else x)
              for x in leaves if hasattr(x, "dtype"))
    int(chk)
    return out


def timed(fn, *args, reps: int = 3):
    """Best-of-N wall time of a checksum-forced call -> (seconds, result)."""
    checksum_forced(fn, *args)  # warm / compile
    best = float("inf")
    out = None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = checksum_forced(fn, *args)
        best = min(best, time.perf_counter() - t0)
    return best, out


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace context (view with tensorboard / xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
