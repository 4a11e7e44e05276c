#!/usr/bin/env python
"""stenos-tpu benchmark. Prints progressive JSON lines; the LAST line is the
most complete snapshot (parse the last JSON-parseable stdout line).

Headline: block-codec encode GB/s per chip on the BASELINE config (sorted
int32, level-1/2 block path) with data device-resident — the apples-to-apples
counterpart of the reference's RAM-to-RAM single-thread numbers
(~2 GB/s encode / ~3 GB/s decode, README.md:12 of the reference).

Delivery protocol (VERDICT r3 item 1): a full snapshot line is printed and
flushed after EVERY section, so a hung/slow section can never zero out the
whole artifact; each section's exception or budget-skip is recorded in
extra.sections instead of being swallowed; tools/warm_cache.py pre-populates
the persistent jax compile cache so kernel compiles never count against the
driver's window.

Timing integrity: this environment's relay reports arrays "ready" before the
computation finished, and each jit dispatch costs ~27 ms round-trip; every
timed call is forced through a device-side checksum whose scalar is fetched
to the host — nothing can be skipped — and the input is sized to amortize
the dispatch latency.
"""

import json
import os
import time
import traceback

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
# soft wall-clock budget: optional sections are skipped (and say so) once
# total elapsed passes this; mandatory core sections always run
BUDGET_S = float(os.environ.get("STENOS_BENCH_BUDGET_S", "3000"))

T0 = time.perf_counter()


def _timed(fn):
    t = time.perf_counter()
    fn()
    return time.perf_counter() - t


class Bench:
    def __init__(self):
        self.extra = {
            "input_mb": MB,
            "parity_slice_mb": PARITY_MB,
            "device": str(jax.devices()[0]),
            "timing": "checksum-forced (relay-async-safe)",
        }
        self.sections = {}  # name -> "ok"/"error: ..."/"skipped: ..."
        self.secs = {}
        self.enc_gbps = 0.0

    def emit(self):
        self.extra["sections"] = self.sections
        self.extra["section_secs"] = {k: round(v, 1)
                                      for k, v in self.secs.items()}
        self.extra["total_secs"] = round(time.perf_counter() - T0, 1)
        print(json.dumps({
            "metric": "block codec encode GB/s per chip (sorted int32, "
                      "device-resident, bit-exact stenos frames)",
            "value": round(self.enc_gbps, 3),
            "unit": "GB/s",
            "vs_baseline": round(self.enc_gbps / 2.0, 3),
            "extra": self.extra,
        }), flush=True)

    def run(self, name, fn, optional=True):
        elapsed = time.perf_counter() - T0
        if optional and elapsed > BUDGET_S:
            self.sections[name] = f"skipped: budget ({elapsed:.0f}s elapsed)"
            self.emit()
            return
        t = time.perf_counter()
        try:
            fn(self)
            self.sections[name] = "ok"
        except Exception as e:
            tb = traceback.format_exc(limit=3).replace("\n", " | ")
            self.sections[name] = f"error: {type(e).__name__}: {e} [{tb}]"[:500]
        self.secs[name] = time.perf_counter() - t
        self.emit()


def sec_encode(b):
    from stenos_tpu.engine_jax import _encode_with_headers_jit
    import stenos_tpu as st

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
    b.enc_gbps = nbytes / t_enc / 1e9

    sizes_h = np.asarray(sizes)
    b.extra["compression_ratio"] = round(nbytes / (8 + int(sizes_h.sum())), 3)

    b.rng, b.nbytes, b.n_sb, b.raw = rng, nbytes, n_sb, raw
    b.batch_dev, b.rows, b.sizes_h, b.dev = batch_dev, rows, sizes_h, dev
    b.st = st


def sec_parity(b):
    pbytes = PARITY_MB * 1024 * 1024
    pn_sb = pbytes // SB
    host_frame = b.st.compress(b.raw[:pbytes], BPP, 1)
    rows_h = np.asarray(b.rows[:pn_sb])
    pframe = bytearray()
    pframe += host_frame[:8]
    for i in range(pn_sb):
        pframe += bytes(rows_h[i][: b.sizes_h[i]])
    b.extra["frame_equals_reference_bitexact_path"] = (
        bytes(pframe) == host_frame)
    b.host_frame = host_frame


def sec_decode(b):
    from stenos_tpu.engine_jax import _bucket125, _parse_bufs
    from stenos_tpu.native import lib as native
    from stenos_tpu.ops.decode_pallas import decode_slabs_jit

    if native is None:
        raise RuntimeError("native runtime unavailable")
    nb = SB // (256 * BPP)
    rows_all = np.asarray(b.rows)
    frame = bytearray()
    frame += b.host_frame[:8]
    offs, csizes = [], []
    pos = 8
    for i in range(b.n_sb):
        sz = int(b.sizes_h[i])
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
            bufs=_parse_bufs(b.n_sb, row_bytes, SB // 256))
    t0 = time.perf_counter()
    pr = native.parse_rows_batch(frame, BPP, SB, offs, csizes, row_bytes,
                                 bufs=_parse_bufs(b.n_sb, row_bytes,
                                                  SB // 256))
    t_parse = time.perf_counter() - t0
    b.extra["host_parse_gbps"] = round(b.nbytes / t_parse / 1e9, 3)
    args = [jax.device_put(x, b.dev) for x in pr[:3]]
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
    b.extra["decode_kernel_gbps"] = round(b.nbytes / t_dec / 1e9, 3)
    b.extra["decode_kernel_vs_baseline_3gbps"] = round(
        b.nbytes / t_dec / 1e9 / 3.0, 3)

    def e2e():
        pr = native.parse_rows_batch(
            frame, BPP, SB, offs, csizes, row_bytes,
            bufs=_parse_bufs(b.n_sb, row_bytes, SB // 256))
        a = [jax.device_put(x, b.dev) for x in pr[:3]]
        return int(dec_forced(*a)[1])
    e2e()
    t_e2e = min(_timed(e2e) for _ in range(REPS))
    b.extra["decode_e2e_hostframe_gbps"] = round(b.nbytes / t_e2e / 1e9, 3)
    b.extra["decode_e2e_note"] = (
        "relay H2D degrades to 0.05 GB/s after any D2H fetch (NOTES.md); "
        "e2e here is relay-bound, not codec-bound")

    out = np.ascontiguousarray(np.asarray(words)).view(np.uint8)
    b.extra["decode_roundtrip_ok"] = (
        out.reshape(-1).tobytes() == b.raw.tobytes())


def sec_roundtrip(b):
    from stenos_tpu.engine_jax import _bucket125, roundtrip_device

    # full input: each timed call pays ~24 ms of relay dispatch (NOTES.md
    # round-4), so small slices measure the dispatch, not the loop
    rtb = min(b.nbytes, 512 * 1024 * 1024)
    rt_in = b.batch_dev[: rtb // SB]

    def rt_once(rb=None):
        w, rws, tt = roundtrip_device(rt_in, BPP, 2, rb=rb)
        return w, int(jnp.sum(w)), tt

    # warm once (rb=None syncs totals — the container-construction analog);
    # steady-state reps reuse the known slice width, so the closed loop is
    # encode -> decode -> checksum with no mid-loop D2H
    w, _, tt = rt_once()
    rb_static = _bucket125(int(np.asarray(tt).max()) + 512)
    rt_once(rb_static)
    t_rt = min(_timed(lambda: rt_once(rb_static)[1]) for _ in range(REPS))
    b.extra["device_roundtrip_gbps"] = round(rtb / t_rt / 1e9, 3)
    b.extra["device_roundtrip_ok"] = bool(
        np.ascontiguousarray(np.asarray(w)).view(np.uint8)
        .reshape(-1).tobytes() == b.raw[:rtb].tobytes())


def sec_entropy_encode(b):
    from stenos_tpu.entropy.huff_pallas import (encode_streams_device,
                                                histogram_device)
    from stenos_tpu.entropy.huffman import (build_ctables_batch,
                                            code_lengths_batch)
    from stenos_tpu.entropy.zstd_frame import encode_frame_device
    from stenos_tpu.host import zstd as zstd_host

    ebytes = min(b.nbytes, 64 * 1024 * 1024)
    nblk = ebytes // 131072
    noisy = np.cumsum(
        b.rng.normal(0, 300, ebytes // 4)).astype("<i4").view(np.uint8)
    blocks = jax.device_put(noisy.reshape(nblk, 131072), b.dev)
    jax.block_until_ready(blocks)

    @jax.jit
    def hist_f(x):
        h = histogram_device(x)
        return h, jnp.sum(h)

    h, chk = hist_f(blocks)
    int(chk)
    t_h = min(_timed(lambda: int(hist_f(blocks)[1])) for _ in range(REPS))
    b.extra["entropy_hist_kernel_gbps"] = round(ebytes / t_h / 1e9, 3)

    hist_h = np.asarray(h)
    lens_all = code_lengths_batch(hist_h)
    codes_all = build_ctables_batch(lens_all)
    luts = np.repeat(
        codes_all.astype(np.int32) | (lens_all.astype(np.int32) << 11),
        4, axis=0)
    streams = jax.device_put(noisy.reshape(nblk * 4, 32768), b.dev)
    luts_d = jax.device_put(luts, b.dev)
    jax.block_until_ready([streams, luts_d])

    @jax.jit
    def ent_f(s, l):
        w, sz = encode_streams_device(s, l)
        return jnp.sum(w) + jnp.sum(sz)

    int(ent_f(streams, luts_d))
    t_e = min(_timed(lambda: int(ent_f(streams, luts_d)))
              for _ in range(REPS))
    b.extra["entropy_huffman_kernel_gbps"] = round(ebytes / t_e / 1e9, 3)

    fsmall = encode_frame_device(noisy[: 2 * 131072 + 999])
    back = zstd_host.decompress(fsmall, 2 * 131072 + 999 + 16)
    b.extra["entropy_frames_decode_via_libzstd"] = (
        back == noisy[: 2 * 131072 + 999].tobytes())


def sec_entropy_decode(b):
    from functools import partial

    from stenos_tpu.entropy.device_decode import _parse_device_block
    from stenos_tpu.entropy.huff_decode_pallas import (decode_streams_device,
                                                       decode_tables)
    from stenos_tpu.entropy.sidecar import split_sidecar
    from stenos_tpu.entropy.zstd_frame import encode_frame_device
    from stenos_tpu.entropy.zstd_parse import parse_frame

    ebytes = min(b.nbytes, 128 * 1024 * 1024)
    nblk2 = ebytes // 131072
    # iid skewed bytes: Huffman-compressible (~6 bits/sym) but match-free,
    # so the matchiness router keeps every block literals-only and the
    # metric times the anchored decode KERNEL. 128 MB input: every timed
    # call pays a ~24 ms relay dispatch round-trip (NOTES.md round-4);
    # smaller inputs measure the dispatch, not the kernel.
    noisy2 = b.rng.integers(0, 64, ebytes).astype(np.uint8)
    noisy2[b.rng.integers(0, ebytes, ebytes // 16)] = b.rng.integers(
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
    s_d = jax.device_put(sarr, b.dev)
    a_d = jax.device_put(np.stack(anch).astype(np.int32), b.dev)
    t_d = jax.device_put(np.stack(tabs), b.dev)
    jax.block_until_ready([s_d, a_d, t_d])

    ent_dec_v = {}
    best = 0.0
    ok = False
    want = noisy2[: nblk2 * 131072].reshape(nblk2, 131072)[border]
    versions = os.environ.get("STENOS_BENCH_HUF_VERSIONS", "2,5,6")
    for kv in (int(x) for x in versions.split(",")):

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
            if g2.tobytes() == want.tobytes():
                ent_dec_v[str(kv)] = round(gbps, 3)
                if gbps >= best:
                    best = gbps
                    ok = True
            else:
                ent_dec_v[str(kv)] = "wrong-output"
        except Exception as e:
            ent_dec_v[str(kv)] = f"error: {type(e).__name__}: {e}"[:200]
    b.extra["entropy_decode_kernel_gbps"] = round(best, 3)
    b.extra["entropy_decode_kernel_ok"] = ok
    b.extra["entropy_decode_kernel_by_version"] = ent_dec_v

    # steady-state pipelined throughput: 4 async dispatches forced through
    # ONE checksum — how a serving loop drives the chip (per-call host
    # sync is a benchmark artifact of this relay, not a codec property)
    try:
        import os as _os

        vbest = int(_os.environ.get("STENOS_HUF_DECODE_V", "6"))

        NROLL = 16  # dispatches per host sync (the ~24 ms relay dispatch
        #             floor is per SYNC; a serving loop enqueues
        #             continuously, so deeper pipelines are MORE
        #             steady-state-like, not less)

        @partial(jax.jit, static_argnames=("v",))
        def decn(s, a, t, v=vbest):
            # batch rolled per call: NROLL DISTINCT computations (XLA
            # would CSE identical ones into a single kernel launch)
            tot = jnp.zeros((), jnp.int32)
            w = None
            for i in range(NROLL):
                w = decode_streams_device(
                    jnp.roll(s, i, axis=0), jnp.roll(a, i, axis=0),
                    jnp.roll(t, i, axis=0), v=v)
                tot = tot + jnp.sum(w.astype(jnp.int32))
            return w, tot

        int(decn(s_d, a_d, t_d)[1])
        t_p = min(_timed(lambda: int(decn(s_d, a_d, t_d)[1]))
                  for _ in range(REPS))
        b.extra["entropy_decode_kernel_steady_gbps"] = round(
            NROLL * len(border) * 131072 / t_p / 1e9, 3)
        b.extra["entropy_decode_steady_sync_mb"] = round(
            NROLL * len(border) * 131072 / 2**20)
    except Exception as e:
        b.extra["entropy_decode_kernel_steady_gbps"] = \
            f"error: {type(e).__name__}"[:80]


def sec_sequences(b):
    import zstandard

    from stenos_tpu.entropy.zstd_frame import encode_frame_device as _efd

    sbytes = min(b.nbytes, 16 * 1024 * 1024)
    rec = b.rng.integers(0, 256, 64).astype(np.uint8)
    md = np.tile(rec, sbytes // 64)
    md[b.rng.integers(0, sbytes, sbytes // 64)] = b.rng.integers(
        0, 256, sbytes // 64)
    _efd(md[: 4 * 131072], sidecar=False)  # warm compiles
    fseq = _efd(md, sidecar=False)  # warm allocators/page cache
    t_s = min(_timed(lambda: _efd(md, sidecar=False))
              for _ in range(max(REPS - 1, 1)))
    b.extra["sequences_encode_mbps"] = round(sbytes / t_s / 1e6, 1)
    back = zstandard.ZstdDecompressor().decompress(
        fseq, max_output_size=sbytes + 16)
    b.extra["sequences_encode_ok"] = back == md.tobytes()
    zs = len(zstandard.ZstdCompressor(level=3).compress(md.tobytes()))
    b.extra["sequences_size_vs_libzstd3"] = round(len(fseq) / zs, 3)


def main():
    b = Bench()
    b.run("encode", sec_encode, optional=False)
    b.run("parity", sec_parity, optional=False)
    b.run("decode", sec_decode, optional=False)
    b.run("roundtrip", sec_roundtrip)
    b.run("entropy_encode", sec_entropy_encode)
    b.run("entropy_decode", sec_entropy_decode)
    b.run("sequences", sec_sequences)


if __name__ == "__main__":
    main()
