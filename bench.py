#!/usr/bin/env python
"""stenos-tpu benchmark. Prints ONE JSON line with the headline metric.

Headline: block-codec encode GB/s per chip on the BASELINE config (sorted
int32, level-1/2 block path) with data device-resident — the apples-to-apples
counterpart of the reference's RAM-to-RAM single-thread numbers
(~2 GB/s encode / ~3 GB/s decode, README.md:12 of the reference). Encode runs
the Pallas mega-kernel (analysis + emission + compaction in VMEM) over
STENOS_BENCH_MB of data; decode-kernel GB/s, host parse rate and compression
parity are extra fields (measured on a smaller slice until the decode
mega-kernel lands).

Timing integrity: this environment's relay reports arrays "ready" before the
computation finished, and each jit dispatch costs ~27 ms round-trip; every
timed call is forced through a device-side checksum whose scalar is fetched
to the host — nothing can be skipped — and the input is sized to amortize
the dispatch latency.
"""

import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_compilation"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

MB = int(os.environ.get("STENOS_BENCH_MB", "256"))
PARITY_MB = int(os.environ.get("STENOS_BENCH_PARITY_MB", "16"))
BPP = 4
SB = 131072
REPS = int(os.environ.get("STENOS_BENCH_REPS", "3"))


def _timed(fn):
    t = time.perf_counter()
    fn()
    return time.perf_counter() - t


def main():
    from stenos_tpu.engine_jax import (
        _encode_with_headers_jit,
        decode_rows_batched_jit,
        _bucket,
    )
    import stenos_tpu as st
    from stenos_tpu.native import lib as native

    rng = np.random.default_rng(42)
    nbytes = MB * 1024 * 1024
    n_sb = nbytes // SB
    nb = SB // (256 * BPP)
    data = np.sort(
        rng.integers(0, 1 << 30, nbytes // BPP, dtype=np.int64).astype(np.uint32)
    )
    raw = data.view(np.uint8)
    batch = raw.reshape(n_sb, SB)

    dev = jax.devices()[0]
    batch_dev = jax.device_put(batch, dev)
    jax.block_until_ready(batch_dev)

    # --- encode kernel (device-resident frame rows + sizes), checksum-forced
    @jax.jit
    def enc_forced(x):
        rows, sizes, offs = _encode_with_headers_jit(x, BPP, 1)
        chk = (jnp.sum(rows[:, :64].astype(jnp.uint32)) + jnp.sum(sizes)
               + jnp.sum(offs))
        return rows, sizes, chk

    rows, sizes, chk = enc_forced(batch_dev)
    int(chk)  # warm + force
    t_enc = min(
        _timed(lambda: int(enc_forced(batch_dev)[2])) for _ in range(REPS)
    )
    enc_gbps = nbytes / t_enc / 1e9

    sizes_h = np.asarray(sizes)
    ratio = nbytes / (8 + int(sizes_h.sum()))

    # --- parity + decode on a smaller slice (host oracle is 1-core python)
    pbytes = PARITY_MB * 1024 * 1024
    pn_sb = pbytes // SB
    praw = raw[:pbytes]
    host_frame = st.compress(praw, BPP, 1)
    rows_h = np.asarray(rows[:pn_sb])
    frame = bytearray()
    frame += host_frame[:8]
    for i in range(pn_sb):
        frame += bytes(rows_h[i][: sizes_h[i]])
    frame = bytes(frame)
    parity = frame == host_frame

    dec_kernel_gbps = 0.0
    host_parse_gbps = 0.0
    ok_decode = False
    if native is not None:
        pos = 8
        bufs, poffs, rels, hdrs, mns = [], [], [], [], []
        t0 = time.perf_counter()
        while pos < len(frame):
            csize = int.from_bytes(frame[pos + 1 : pos + 4], "little")
            payload = frame[pos + 4 : pos + 4 + csize]
            vbuf, po, rel, rh, rm, tail, _ = native.parse_rows(
                payload, BPP, SB)
            bufs.append(vbuf)
            poffs.append(po)
            rels.append(rel)
            hdrs.append(rh)
            mns.append(rm)
            pos += 4 + csize
        t_parse = time.perf_counter() - t0
        host_parse_gbps = pbytes / t_parse / 1e9

        bucket = _bucket(max(len(b) for b in bufs))
        vbufs = np.zeros((pn_sb, bucket), np.uint8)
        for i, b in enumerate(bufs):
            vbufs[i, : len(b)] = b
        args = [
            jax.device_put(x, dev)
            for x in (vbufs, np.stack(poffs), np.stack(rels),
                      np.stack(hdrs), np.stack(mns))
        ]
        jax.block_until_ready(args)
        Pn = nb * BPP

        @jax.jit
        def dec_forced(vb, po, rel, rh, rm):
            planes = decode_rows_batched_jit(vb, po, rel, rh, rm, Pn)
            return planes, jnp.sum(planes.astype(jnp.uint32))

        planes, chk = dec_forced(*args)
        int(chk)
        t_dec = min(
            _timed(lambda: int(dec_forced(*args)[1])) for _ in range(REPS)
        )
        dec_kernel_gbps = pbytes / t_dec / 1e9
        out = np.asarray(planes).reshape(pn_sb * nb, BPP, 256)
        out = out.transpose(0, 2, 1).reshape(-1)
        ok_decode = out.tobytes() == praw.tobytes()

    print(json.dumps({
        "metric": "block codec encode GB/s per chip (sorted int32, "
                  "device-resident, bit-exact stenos frames)",
        "value": round(enc_gbps, 3),
        "unit": "GB/s",
        "vs_baseline": round(enc_gbps / 2.0, 3),
        "extra": {
            "decode_kernel_gbps": round(dec_kernel_gbps, 3),
            "decode_kernel_vs_baseline_3gbps": round(dec_kernel_gbps / 3.0, 3),
            "host_parse_gbps": round(host_parse_gbps, 3),
            "compression_ratio": round(ratio, 3),
            "frame_equals_reference_bitexact_path": bool(parity),
            "decode_roundtrip_ok": bool(ok_decode),
            "input_mb": MB,
            "parity_slice_mb": PARITY_MB,
            "device": str(jax.devices()[0]),
            "timing": "checksum-forced (relay-async-safe)",
        },
    }))


if __name__ == "__main__":
    main()
