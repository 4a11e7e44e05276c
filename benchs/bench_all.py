#!/usr/bin/env python
"""Level sweep benchmark — the bench_all protocol (reference:
benchs/bench_all.cpp:177-313) on synthetic stands-ins for the stenos_dataset
families (text, uint16 images, float3/float4 meshes, double time series).

Prints a ms/ratio table per (dataset, level); pass --oracle to also run the
C++ reference (when /root/reference is present) and report size parity.

Usage: python benchs/bench_all.py [--mb 4] [--levels 1 2 5 9] [--oracle]
       [--engine host|jax]
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import stenos_tpu as st


def datasets(mb: int, rng):
    n = mb * 1024 * 1024

    # realistic corpus families (frozen real text excerpt + matched-
    # statistics image/mesh/timeseries — see benchs/datasets.py)
    from datasets import families

    for name, bpp, data in families(n):
        yield name, bpp, data

    # sorted int32 (BASELINE config)
    ni = n // 4
    yield "sorted i32", 4, np.sort(
        rng.integers(0, 1 << 30, ni, dtype=np.int64).astype("<u4")).tobytes()

    # repeated records (period-64 LZ matches: the sequences-path family)
    rec = rng.integers(0, 256, 64).astype(np.uint8)
    recs = np.tile(rec, n // 64)
    recs[rng.integers(0, len(recs), len(recs) // 64)] = rng.integers(
        0, 256, len(recs) // 64)
    yield "records u8", 1, recs.tobytes()

    # byte runs (offset-1 matches / repcode family)
    runs = []
    t = 0
    while t < n:
        ln = int(rng.integers(4, 200))
        runs.append(np.full(ln, rng.integers(0, 256), np.uint8))
        t += ln
    yield "runs u8", 1, np.concatenate(runs)[:n].tobytes()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=2)
    ap.add_argument("--levels", type=int, nargs="*", default=[1, 2, 5, 9])
    ap.add_argument("--oracle", action="store_true")
    ap.add_argument("--engine", choices=["host", "jax"], default="host")
    ap.add_argument("--csv", action="store_true",
                    help="CSV output, best-of-N timing "
                         "(bench_to_csv protocol, reference "
                         "benchs/bench_to_csv.cpp:97-137)")
    ap.add_argument("--best-of", type=int, default=5)
    args = ap.parse_args()

    engine = None
    if args.engine == "jax":
        from stenos_tpu.engine_jax import JaxEngine

        engine = JaxEngine()

    oracle = None
    if args.oracle:
        sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))
        import _oracle as oracle  # noqa

    rng = np.random.default_rng(7)
    reps = args.best_of if args.csv else 1
    if args.csv:
        hdr = "dataset,bpp,level,enc_ms_best,dec_ms_best,enc_gbps,dec_gbps,ratio"
        if oracle:
            hdr += ",ref_ratio,bytes_eq_ref"
    else:
        hdr = (f"{'dataset':>16} {'bpp':>3} {'lvl':>3} {'enc ms':>8} "
               f"{'dec ms':>8} {'ratio':>7}")
        if oracle:
            hdr += f" {'ref ratio':>9} {'bytes==ref':>10}"
    print(hdr)
    for name, bpp, data in datasets(args.mb, rng):
        for level in args.levels:
            enc_ms = dec_ms = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                frame = st.compress(data, bpp, level, engine=engine)
                enc_ms = min(enc_ms, (time.perf_counter() - t0) * 1000)
                t0 = time.perf_counter()
                out = st.decompress(frame, bpp, engine=engine)
                dec_ms = min(dec_ms, (time.perf_counter() - t0) * 1000)
            assert out.tobytes() == data, (name, level)
            ratio = len(data) / len(frame)
            if args.csv:
                line = (f"{name},{bpp},{level},{enc_ms:.2f},{dec_ms:.2f},"
                        f"{len(data)/enc_ms/1e6:.3f},"
                        f"{len(data)/dec_ms/1e6:.3f},{ratio:.3f}")
                if oracle:
                    ref = oracle.compress(data, bpp, level)
                    line += f",{len(data)/len(ref):.3f},{int(frame == ref)}"
            else:
                line = (f"{name:>16} {bpp:>3} {level:>3} {enc_ms:>8.1f} "
                        f"{dec_ms:>8.1f} {ratio:>7.2f}")
                if oracle:
                    ref = oracle.compress(data, bpp, level)
                    line += (f" {len(data)/len(ref):>9.2f}"
                             f" {str(frame == ref):>10}")
            print(line)


if __name__ == "__main__":
    main()
