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

MB = int(os.environ.get("STENOS_BENCH_MB", "512"))
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
        _bucket125,
        _parse_bufs,
    )
    from stenos_tpu.ops.decode_pallas import decode_slabs_jit
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

    # --- parity on a smaller slice (host oracle is 1-core python)
    pbytes = PARITY_MB * 1024 * 1024
    pn_sb = pbytes // SB
    praw = raw[:pbytes]
    host_frame = st.compress(praw, BPP, 1)
    rows_h = np.asarray(rows[:pn_sb])
    pframe = bytearray()
    pframe += host_frame[:8]
    for i in range(pn_sb):
        pframe += bytes(rows_h[i][: sizes_h[i]])
    parity = bytes(pframe) == host_frame

    # --- decode over the FULL input: materialize the frame from the device
    # rows (cheap host concat), batch-parse, run the Pallas decode kernel
    dec_kernel_gbps = 0.0
    dec_e2e_gbps = 0.0
    host_parse_gbps = 0.0
    ok_decode = False
    if native is not None:
        rows_all = np.asarray(rows)
        frame = bytearray()
        frame += host_frame[:8]
        offs, csizes = [], []
        pos = 8
        for i in range(n_sb):
            sz = int(sizes_h[i])
            frame += bytes(rows_all[i][:sz])
            offs.append(pos + 4)
            csizes.append(sz - 4)
            pos += sz
        frame = bytes(frame)

        row_bytes = _bucket125(max(csizes) + 512)
        # warm ALL page-cached parse buffer slots (they rotate), then time
        for _ in range(5):
            native.parse_rows_batch(
                frame, BPP, SB, offs, csizes, row_bytes,
                bufs=_parse_bufs(n_sb, row_bytes, SB // 256))
        t0 = time.perf_counter()
        pr = native.parse_rows_batch(frame, BPP, SB, offs, csizes, row_bytes,
                                     bufs=_parse_bufs(n_sb, row_bytes,
                                                      SB // 256))
        t_parse = time.perf_counter() - t0
        host_parse_gbps = nbytes / t_parse / 1e9
        vbufs, plane_off, rowtab, _vlens = pr
        args = [jax.device_put(x, dev) for x in pr[:3]]
        jax.block_until_ready(args)

        @jax.jit
        def dec_forced(vb, po, rt):
            words = decode_slabs_jit(vb, po, rt, BPP, nb)
            return words, jnp.sum(words)

        words, chk = dec_forced(*args)
        int(chk)
        t_dec = min(
            _timed(lambda: int(dec_forced(*args)[1])) for _ in range(REPS)
        )
        dec_kernel_gbps = nbytes / t_dec / 1e9

        def e2e():
            pr = native.parse_rows_batch(
                frame, BPP, SB, offs, csizes, row_bytes,
                bufs=_parse_bufs(n_sb, row_bytes, SB // 256))
            a = [jax.device_put(x, dev) for x in pr[:3]]
            return int(dec_forced(*a)[1])
        e2e()
        t_e2e = min(_timed(e2e) for _ in range(REPS))
        dec_e2e_gbps = nbytes / t_e2e / 1e9

        out = np.ascontiguousarray(np.asarray(words)).view(np.uint8)
        ok_decode = out.reshape(-1).tobytes() == raw.tobytes()

    # --- device-resident closed loop (encode+index -> decode, no host)
    rt_gbps = 0.0
    rt_ok = False
    try:
        from stenos_tpu.engine_jax import roundtrip_device

        rtb = min(nbytes, 128 * 1024 * 1024)
        rt_in = batch_dev[: rtb // SB]

        def rt_once(rb=None):
            w, rws, tt = roundtrip_device(rt_in, BPP, 2, rb=rb)
            return w, int(jnp.sum(w)), tt

        # warm once (rb=None syncs totals — the container-construction
        # analog); steady-state reps reuse the known slice width, so the
        # closed loop is encode -> decode -> checksum with no mid-loop D2H
        w, _, tt = rt_once()
        from stenos_tpu.engine_jax import _bucket125 as _b125
        rb_static = _b125(int(np.asarray(tt).max()) + 512)
        rt_once(rb_static)
        t_rt = min(_timed(lambda: rt_once(rb_static)[1]) for _ in range(REPS))
        rt_gbps = rtb / t_rt / 1e9
        rt_ok = (np.ascontiguousarray(np.asarray(w)).view(np.uint8)
                 .reshape(-1).tobytes() == raw[:rtb].tobytes())
    except Exception:
        pass

    # --- entropy stage kernels (device zstd huffman coder), 64MB slice
    ent_hist_gbps = 0.0
    ent_enc_gbps = 0.0
    ent_ok = False
    try:
        from stenos_tpu.entropy.huff_pallas import (encode_streams_device,
                                                    histogram_device)
        from stenos_tpu.entropy.huffman import (build_ctables_batch,
                                                code_lengths_batch)
        from stenos_tpu.entropy.zstd_frame import encode_frame_device
        from stenos_tpu.host import zstd as zstd_host

        ebytes = min(nbytes, 64 * 1024 * 1024)
        nblk = ebytes // 131072
        noisy = np.cumsum(
            rng.normal(0, 300, ebytes // 4)).astype("<i4").view(np.uint8)
        blocks = jax.device_put(noisy.reshape(nblk, 131072), dev)
        jax.block_until_ready(blocks)

        @jax.jit
        def hist_f(x):
            h = histogram_device(x)
            return h, jnp.sum(h)

        h, chk = hist_f(blocks)
        int(chk)
        t_h = min(_timed(lambda: int(hist_f(blocks)[1])) for _ in range(REPS))
        ent_hist_gbps = ebytes / t_h / 1e9

        hist_h = np.asarray(h)
        lens_all = code_lengths_batch(hist_h)
        codes_all = build_ctables_batch(lens_all)
        luts = np.repeat(
            codes_all.astype(np.int32) | (lens_all.astype(np.int32) << 11),
            4, axis=0)
        streams = jax.device_put(noisy.reshape(nblk * 4, 32768), dev)
        luts_d = jax.device_put(luts, dev)
        jax.block_until_ready([streams, luts_d])

        @jax.jit
        def ent_f(s, l):
            w, sz = encode_streams_device(s, l)
            return jnp.sum(w) + jnp.sum(sz)

        int(ent_f(streams, luts_d))
        t_e = min(_timed(lambda: int(ent_f(streams, luts_d)))
                  for _ in range(REPS))
        ent_enc_gbps = ebytes / t_e / 1e9

        fsmall = encode_frame_device(noisy[: 2 * 131072 + 999])
        back = zstd_host.decompress(fsmall, 2 * 131072 + 999 + 16)
        ent_ok = back == noisy[: 2 * 131072 + 999].tobytes()
    except Exception:
        pass

    # --- entropy DECODE kernel (anchored huffman, device-resident)
    ent_dec_gbps = 0.0
    ent_dec_ok = False
    try:
        from stenos_tpu.entropy.device_decode import (_parse_device_block,
                                                      decode_payload_device)
        from stenos_tpu.entropy.huff_decode_pallas import (
            decode_streams_device, decode_tables)
        from stenos_tpu.entropy.sidecar import split_sidecar
        from stenos_tpu.entropy.zstd_parse import parse_frame

        ebytes = min(nbytes, 64 * 1024 * 1024)
        nblk2 = ebytes // 131072
        # iid skewed bytes: Huffman-compressible (~6 bits/sym) but match-
        # free, so the matchiness router keeps every block literals-only
        # and the metric times the anchored decode KERNEL (the cumsum data
        # used through r2 now routes to the sequence encoder)
        noisy2 = rng.integers(0, 64, ebytes).astype(np.uint8)
        noisy2[rng.integers(0, ebytes, ebytes // 16)] = rng.integers(
            0, 256, ebytes // 16)
        fbig = encode_frame_device(noisy2[: nblk2 * 131072])
        frame_end, entries = split_sidecar(fbig)
        content, blocks, _ = parse_frame(fbig, frame_end)
        sbuf, anch, tabs, border = [], [], [], []
        for bi, (spec, ent) in enumerate(zip(blocks, entries)):
            if ent is None:  # host-fallback block (runny): not kernel work
                continue
            pb = _parse_device_block(fbig, spec.start, spec.size)
            if pb is None:
                continue
            regen, spans = pb
            tab = decode_tables(ent[0])
            border.append(bi)
            for s, (off, ln) in enumerate(spans):
                sbuf.append((off, ln))
                anch.append(ent[1][s])
                tabs.append(tab[0])
        eb = -(-max(ln for _, ln in sbuf) // 128) * 128
        sarr = np.zeros((len(sbuf), eb), np.uint8)
        pv = np.frombuffer(fbig, np.uint8)
        for i, (off, ln) in enumerate(sbuf):
            sarr[i, :ln] = pv[off : off + ln]
        s_d = jax.device_put(sarr, dev)
        a_d = jax.device_put(np.stack(anch).astype(np.int32), dev)
        t_d = jax.device_put(np.stack(tabs), dev)
        jax.block_until_ready([s_d, a_d, t_d])

        ent_dec_v = {}
        got = None
        for kv in (2, 3, 4):
            from functools import partial

            @partial(jax.jit, static_argnames=("v",))
            def dec_ent(s, a, t, v=2):
                w = decode_streams_device(s, a, t, v=v)
                return w, jnp.sum(w)

            try:
                w, chk = dec_ent(s_d, a_d, t_d, v=kv)
                int(chk)
                t_d2 = min(
                    _timed(lambda: int(dec_ent(s_d, a_d, t_d, v=kv)[1]))
                    for _ in range(REPS))
                gbps = (len(border) * 131072) / t_d2 / 1e9
                g2 = np.asarray(w).astype(np.uint8).reshape(-1, 131072)
                want = noisy2[: nblk2 * 131072].reshape(
                    nblk2, 131072)[border]
                if g2.tobytes() == want.tobytes():
                    ent_dec_v[kv] = gbps
                    if gbps >= ent_dec_gbps:
                        ent_dec_gbps = gbps
                        ent_dec_ok = True
            except Exception:
                pass
    except Exception:
        ent_dec_v = {}

    # --- sequences path: device sort candidates + native walk/encoder
    seq_enc_mbps = 0.0
    seq_ok = False
    seq_vs_zstd = 0.0
    try:
        import zstandard

        from stenos_tpu.entropy.zstd_frame import (
            encode_frame_device as _efd)

        sbytes = min(nbytes, 16 * 1024 * 1024)
        rec = rng.integers(0, 256, 64).astype(np.uint8)
        md = np.tile(rec, sbytes // 64)
        md[rng.integers(0, sbytes, sbytes // 64)] = rng.integers(
            0, 256, sbytes // 64)
        _efd(md[: 4 * 131072], sidecar=False)  # warm compiles
        t0 = time.perf_counter()
        fseq = _efd(md, sidecar=False)
        t_s = time.perf_counter() - t0
        seq_enc_mbps = sbytes / t_s / 1e6
        back = zstandard.ZstdDecompressor().decompress(
            fseq, max_output_size=sbytes + 16)
        seq_ok = back == md.tobytes()
        zs = len(zstandard.ZstdCompressor(level=3).compress(md.tobytes()))
        seq_vs_zstd = len(fseq) / zs
    except Exception:
        pass

    print(json.dumps({
        "metric": "block codec encode GB/s per chip (sorted int32, "
                  "device-resident, bit-exact stenos frames)",
        "value": round(enc_gbps, 3),
        "unit": "GB/s",
        "vs_baseline": round(enc_gbps / 2.0, 3),
        "extra": {
            "decode_kernel_gbps": round(dec_kernel_gbps, 3),
            "decode_kernel_vs_baseline_3gbps": round(dec_kernel_gbps / 3.0, 3),
            "decode_e2e_hostframe_gbps": round(dec_e2e_gbps, 3),
            "decode_e2e_note": "relay H2D degrades to 0.05 GB/s after any "
                               "D2H fetch (NOTES.md); e2e here is relay-"
                               "bound, not codec-bound",
            "host_parse_gbps": round(host_parse_gbps, 3),
            "device_roundtrip_gbps": round(rt_gbps, 3),
            "device_roundtrip_ok": bool(rt_ok),
            "entropy_hist_kernel_gbps": round(ent_hist_gbps, 3),
            "entropy_huffman_kernel_gbps": round(ent_enc_gbps, 3),
            "entropy_decode_kernel_gbps": round(ent_dec_gbps, 3),
            "entropy_decode_kernel_ok": bool(ent_dec_ok),
            "entropy_decode_kernel_by_version": {
                str(k): round(v, 3) for k, v in ent_dec_v.items()},
            "sequences_encode_mbps": round(seq_enc_mbps, 1),
            "sequences_encode_ok": bool(seq_ok),
            "sequences_size_vs_libzstd3": round(seq_vs_zstd, 3),
            "entropy_frames_decode_via_libzstd": bool(ent_ok),
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
