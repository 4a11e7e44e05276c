#!/usr/bin/env python
"""stenos-tpu benchmark. Prints ONE JSON line with the headline metric.

Headline: block-codec encode GB/s per chip on the BASELINE config (sorted
int32, level-2 block path) with data device-resident — the apples-to-apples
counterpart of the reference's RAM-to-RAM single-thread numbers
(~2 GB/s encode / ~3 GB/s decode, README.md:12). Extra keys report the
decode kernel, end-to-end (incl. relay transfers) and compression parity.

Note on this environment: the TPU is reached through a loopback relay whose
D2H path measures ~50 MB/s (H2D ~1.5 GB/s) — orders of magnitude below a
real host<->TPU PCIe link — so device-resident kernel throughput is the
meaningful per-chip number; end-to-end figures are reported but are
relay-bound, not codec-bound.
"""

import json
import os
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_compilation"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

MB = int(os.environ.get("STENOS_BENCH_MB", "16"))
BPP = 4
SB = 131072  # level-2 superblock for bpp=4
REPS = int(os.environ.get("STENOS_BENCH_REPS", "5"))


def timed(fn, reps=REPS):
    fn()  # warmup (compile)
    best = float("inf")
    for _ in range(reps):
        t = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t)
    return best


def main():
    from stenos_tpu.engine_jax import (
        compress_frame_device_jit,
        decode_blocks_jit,
        decompress_frame_batched,
    )
    import stenos_tpu as st
    from stenos_tpu.native import lib as native

    rng = np.random.default_rng(42)
    nbytes = MB * 1024 * 1024
    n_sb = nbytes // SB
    data = np.sort(
        rng.integers(0, 1 << 30, nbytes // BPP, dtype=np.int64).astype(np.uint32)
    )
    raw = data.view(np.uint8)
    batch = raw.reshape(n_sb, SB)

    dev = jax.devices()[0]
    batch_dev = jax.device_put(batch, dev)
    jax.block_until_ready(batch_dev)

    # --- encode kernel (device-resident frame out)
    def enc():
        f, l = compress_frame_device_jit(batch_dev, BPP, 1)
        jax.block_until_ready((f, l))
        return f, l

    t_enc = timed(enc)
    enc_gbps = nbytes / t_enc / 1e9

    frame_dev, frame_len = compress_frame_device_jit(batch_dev, BPP, 1)
    frame = bytes(np.asarray(frame_dev)[: int(frame_len)])

    # parity: device frame must equal the host/reference-bit-exact frame
    host_frame = st.compress(raw, BPP, 1)
    parity = frame == host_frame
    ratio = nbytes / len(frame)

    # --- decode kernel (device-resident out), host parse excluded/included
    dec_kernel_gbps = dec_e2e_gbps = 0.0
    if native is not None:
        # pre-parse all superblocks once (host, C++), then time kernel alone
        from stenos_tpu.frame import get_info

        _, sb, pos = get_info(frame, BPP)
        bufs, offs, kinds, vals = [], [], [], []
        base = 0
        t_parse = time.perf_counter()
        while pos < len(frame):
            csize = int.from_bytes(frame[pos + 1 : pos + 4], "little")
            payload = frame[pos + 4 : pos + 4 + csize]
            po, pk, pv, patch, _, _, _ = native.parse_index(payload, BPP, sb)
            buf = np.concatenate([np.frombuffer(payload, np.uint8), patch])
            bufs.append(buf)
            offs.append(po.astype(np.int64) + base)
            kinds.append(pk)
            vals.append(pv)
            base += len(buf)
            pos += 4 + csize
        t_parse = time.perf_counter() - t_parse
        allbuf = np.concatenate(bufs)
        po = np.concatenate(offs).astype(np.int32)
        pk = np.concatenate(kinds)
        pv = np.concatenate(vals)
        nb_total = n_sb * (SB // (256 * BPP))
        allbuf_dev = jax.device_put(allbuf, dev)
        po_d, pk_d, pv_d = (jax.device_put(x, dev) for x in (po, pk, pv))
        jax.block_until_ready((allbuf_dev, po_d, pk_d, pv_d))

        def dec():
            out = decode_blocks_jit(allbuf_dev, po_d, pk_d, pv_d, BPP, nb_total)
            jax.block_until_ready(out)
            return out

        t_dec = timed(dec)
        dec_kernel_gbps = nbytes / t_dec / 1e9
        out = dec()
        ok_decode = np.asarray(out).tobytes() == raw.tobytes()

        def dec_e2e():
            r = decompress_frame_batched(frame, BPP)
            jax.block_until_ready(r) if r is not None else None
            return r

        t_e2e = timed(dec_e2e, reps=2)
        dec_e2e_gbps = nbytes / t_e2e / 1e9
    else:
        ok_decode = False
        t_parse = 0.0

    value = enc_gbps
    print(json.dumps({
        "metric": "block codec encode GB/s per chip (sorted int32, "
                  "device-resident, bit-exact stenos frames)",
        "value": round(value, 3),
        "unit": "GB/s",
        "vs_baseline": round(value / 2.0, 3),
        "extra": {
            "decode_kernel_gbps": round(dec_kernel_gbps, 3),
            "decode_kernel_vs_baseline": round(dec_kernel_gbps / 3.0, 3),
            "decode_e2e_gbps_relay_bound": round(dec_e2e_gbps, 3),
            "host_parse_gbps": round(nbytes / t_parse / 1e9, 3) if t_parse else 0,
            "compression_ratio": round(ratio, 3),
            "frame_equals_reference_bitexact_path": bool(parity),
            "decode_roundtrip_ok": bool(ok_decode),
            "input_mb": MB,
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
