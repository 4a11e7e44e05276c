"""Host<->device bus health probe.

This environment's relay degrades D2H to ~0.05 GB/s with a ~150 ms fixed
cost (and H2D drops likewise after the first D2H — NOTES.md "H2D
poisoning"). Pipelines that round-trip bulk data through the host (device
match candidates are 4x the input) are only worth dispatching when the bus
is healthy; on a poisoned bus the host-side native path wins by orders of
magnitude. The probe measures ONE 4 MiB D2H fetch per process and caches
the rate; `auto` routers read it instead of assuming either environment.
"""

import time

_STATE: dict = {}

PROBE_BYTES = 4 * 1024 * 1024


def d2h_gbps() -> float:
    """Measured device->host bandwidth (GB/s), cached per process. Returns
    inf when no accelerator is present (host arrays: memcpy-speed)."""
    if "d2h" in _STATE:
        return _STATE["d2h"]
    import jax
    import jax.numpy as jnp
    import numpy as np

    if jax.default_backend() == "cpu":
        _STATE["d2h"] = float("inf")
        return _STATE["d2h"]
    try:
        arr = jnp.zeros(PROBE_BYTES, jnp.uint8) + 1
        jax.block_until_ready(arr)
        t0 = time.perf_counter()
        np.asarray(arr)
        dt = time.perf_counter() - t0
        _STATE["d2h"] = PROBE_BYTES / dt / 1e9
    except Exception:
        _STATE["d2h"] = 0.0
    return _STATE["d2h"]
