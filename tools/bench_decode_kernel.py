#!/usr/bin/env python
"""Focused decode-kernel microbench: v2 / v3 / v4 compiled on the TPU.

Device-resident inputs, checksum-forced timing (the relay reports arrays
ready before execution finishes — NOTES.md). Run when iterating on the
kernel so bench.py's full pipeline doesn't get in the way.

Usage: python tools/bench_decode_kernel.py [--streams 64] [--reps 5]
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=64)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--versions", type=str, default="2,3,4")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from stenos_tpu.entropy.huff_decode_pallas import (
        STREAM, anchors_host, decode_streams_device, decode_tables)
    from stenos_tpu.entropy.huffman import build_ctable, code_lengths
    from stenos_tpu.entropy.zstd_frame import huf_encode_stream

    dev = jax.devices()[0]
    print(f"device: {dev}")
    rng = np.random.default_rng(3)
    ns = args.streams
    raw, anchs, tabs = [], [], []
    rmax = 0
    for i in range(ns):
        if i % 3 == 0:
            d = rng.normal(128, 20, STREAM).clip(0, 255).astype(np.uint8)
        elif i % 3 == 1:
            d = rng.zipf(1.3, STREAM).clip(1, 255).astype(np.uint8)
        else:
            d = (rng.integers(0, 16, STREAM) * 16).astype(np.uint8)
        counts = np.bincount(d, minlength=256)
        lens = code_lengths(counts)
        codes, lens = build_ctable(lens)
        enc = huf_encode_stream(d, codes, lens)
        raw.append(d)
        anchs.append(anchors_host(d, np.asarray(lens)))
        tabs.append(decode_tables(lens)[0])
        rmax = max(rmax, (len(enc) + 127) // 128)
        if i == 0:
            enc0 = enc
    sb = np.zeros((ns, rmax * 128), np.uint8)
    for i, d in enumerate(raw):
        counts = np.bincount(d, minlength=256)
        lens = code_lengths(counts)
        codes, lens = build_ctable(lens)
        enc = huf_encode_stream(d, codes, lens)
        sb[i, : len(enc)] = np.frombuffer(enc, np.uint8)
    s_d = jax.device_put(sb, dev)
    a_d = jax.device_put(np.stack(anchs).astype(np.int32), dev)
    t_d = jax.device_put(np.stack(tabs), dev)
    jax.block_until_ready([s_d, a_d, t_d])
    want = np.stack(raw).astype(np.int32)

    total = ns * STREAM
    from functools import partial

    for v in (int(x) for x in args.versions.split(",")):

        @partial(jax.jit, static_argnames=("vv",))
        def run(s, a, t, vv=2):
            w = decode_streams_device(s, a, t, v=vv)
            return w, jnp.sum(w)

        t0 = time.perf_counter()
        w, chk = run(s_d, a_d, t_d, vv=v)
        int(chk)
        compile_s = time.perf_counter() - t0
        ok = np.array_equal(np.asarray(w).reshape(ns, STREAM), want)
        best = None
        for _ in range(args.reps):
            t0 = time.perf_counter()
            int(run(s_d, a_d, t_d, vv=v)[1])
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        print(f"v{v}: {total / best / 1e9:6.2f} GB/s  "
              f"(best {best * 1e3:.1f} ms over {args.reps}, "
              f"compile {compile_s:.0f}s, correct={ok})")


if __name__ == "__main__":
    main()
