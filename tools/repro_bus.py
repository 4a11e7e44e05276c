#!/usr/bin/env python
"""Minimal reproducer for the relay H2D poisoning (NOTES.md): pure jax,
no stenos code. Measures H2D before any D2H, performs ONE scalar D2H,
then measures H2D again. On a healthy PCIe host the two H2D rates match;
on this axon relay the second drops ~30x permanently.

Usage: python tools/repro_bus.py [--mb 64]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _h2d_rate(mb: int) -> float:
    import jax
    import numpy as np

    buf = np.random.default_rng(0).integers(
        0, 256, mb << 20, dtype=np.uint8)
    dev = jax.devices()[0]
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        a = jax.device_put(buf, dev)
        jax.block_until_ready(a)
        dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best
    return mb * 2**20 / best / 1e9


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=64)
    args = ap.parse_args()
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    pre = _h2d_rate(args.mb)
    # ONE scalar device->host fetch — the poisoning trigger
    t0 = time.perf_counter()
    val = int(jnp.sum(jnp.ones(1024, jnp.int32)))
    d2h_first = time.perf_counter() - t0
    post = _h2d_rate(args.mb)
    out = {
        "device": str(dev),
        "h2d_gbps_before_any_d2h": round(pre, 3),
        "first_scalar_d2h_s": round(d2h_first, 3),
        "h2d_gbps_after_one_d2h": round(post, 3),
        "poisoning_factor": round(pre / max(post, 1e-9), 1),
        "checksum": val,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
