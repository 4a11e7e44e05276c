#!/usr/bin/env python
"""CompressedArray ops benchmark — the bench_cvector protocol (reference:
benchs/bench_cvector.cpp:144-673): push_back/extend, random index, iterate,
bulk apply, shuffle->sort ratio tracking vs plain numpy."""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from stenos_tpu.container import CompressedArray


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--level", type=int, default=1)
    args = ap.parse_args()

    rng = np.random.default_rng(3)
    data = np.sort(rng.integers(0, 1 << 30, args.n).astype(np.int32))

    def t(label, fn):
        t0 = time.perf_counter()
        r = fn()
        print(f"{label:>28}: {(time.perf_counter()-t0)*1000:9.1f} ms")
        return r

    v = CompressedArray(np.int32, block_shift=4, level=args.level)
    t("extend (bulk append)", lambda: v.extend(data))
    print(f"{'compression ratio':>28}: {v.current_compression_ratio():9.2f}")

    idx = rng.integers(0, args.n, 10000)
    t("10k random reads", lambda: [v[int(i)] for i in idx[:10000]])
    t("bulk apply (sum)", lambda: v.apply(lambda c: None))
    t("to_numpy", v.to_numpy)

    # shuffle -> ratio degrades -> sort -> ratio recovers (bench_cvector.cpp)
    shuffled = data.copy()
    rng.shuffle(shuffled)
    w = CompressedArray(np.int32, block_shift=4, level=args.level)
    w.extend(shuffled)
    w.serialize()
    print(f"{'ratio after shuffle':>28}: {w.current_compression_ratio():9.2f}")
    w2 = CompressedArray(np.int32, block_shift=4, level=args.level)
    w2.extend(np.sort(shuffled))
    w2.serialize()
    print(f"{'ratio after sort':>28}: {w2.current_compression_ratio():9.2f}")

    blob = t("serialize", v.serialize)
    print(f"{'serialized bytes':>28}: {len(blob):9d}")
    t("deserialize (adopt)", lambda: CompressedArray.deserialize(
        blob, np.int32, level=args.level))

    # const_apply (read-only scan: no recompression on eviction)
    t("const_apply (scan)", lambda: v.const_apply(lambda c: None))

    # eviction churn: tight resident pool + strided reads force an eviction
    # per access — O(1) LRU bookkeeping must keep this flat in bucket count
    # (the cvector free-context-list analog, cvector.hpp:1700-1800)
    ev = CompressedArray(np.int32, block_shift=4, level=args.level,
                         max_raw_buckets=2)
    ev.extend(data)
    nb = max(len(ev._buckets), 1)
    stride = max(nb // 4096, 1) * ev.chunk_elems + ev.chunk_elems // 2
    hits = [(i * stride) % args.n for i in range(4096)]
    t(f"4k evicting reads ({nb} bkt)", lambda: [ev[h] for h in hits])
    # structural edits (chunk-streamed O(distance-to-end))
    t("insert 1k mid", lambda: v.insert(args.n // 2,
                                        np.arange(1000, dtype=np.int32)))
    t("erase 1k mid", lambda: v.erase(args.n // 2, args.n // 2 + 1000))

    # ---- DeviceCompressedArray (HBM-resident mode) ----------------------
    try:
        import jax

        from stenos_tpu.device_container import DeviceCompressedArray

        print(f"\n  DeviceCompressedArray ({jax.devices()[0]}):")
        d = t("from_array (encode+index)",
              lambda: DeviceCompressedArray.from_array(data))
        print(f"{'effective ratio (w/ index)':>28}: "
              f"{d.current_compression_ratio():9.2f}")
        t("to_array (device decode)", d.to_array)
        t("100 slab reads", lambda: [
            jax.block_until_ready(d.slab(int(i) % max(d.n_slabs, 1)))
            for i in range(100)])
        e = t("from_array entropy=True",
              lambda: DeviceCompressedArray.from_array(data, entropy=True))
        print(f"{'entropy stage engaged':>28}: "
              f"{str(e._entropy is not None):>9}")
        print(f"{'effective ratio':>28}: "
              f"{e.current_compression_ratio():9.2f}")
    except Exception as ex:  # no accelerator: host modes only
        print(f"  (device container skipped: {type(ex).__name__})")


if __name__ == "__main__":
    main()
