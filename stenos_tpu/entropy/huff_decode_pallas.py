"""Device (Pallas) Huffman literal DECODE with anchor sidecars.

The zstd literals bitstream is a backward-read prefix code — inherently
sequential. The reference decodes it with per-thread libzstd on the host
(stenos.cpp:681-753); on a TPU host (1 core) that is the decompress
bottleneck, and worse, the data leaves HBM. This kernel keeps entropy-coded
data device-resident: ANCHORS (the bit offset of every K=128th symbol,
emitted for free by the encode kernel — its per-row inclusive prefix sums
ARE the anchors) make segments independent, so 256 segments per 32 KiB
stream decode in parallel across lanes while each runs the canonical-code
state machine sequentially:

  1. window gather: each segment's <= 192 stream bytes fetched as three
     128-byte rows via the one-hot bf16 MXU matmul + 7-roll alignment
     (the decode_pallas.py stage-1 pattern).
  2. K sequential steps, all segments in parallel: extract the 11-bit
     lookahead (3 dynamic byte selects over the window), determine the code
     length by ranging the left-aligned window against the canonical
     per-length bases (11 compares), advance the bit cursor.
  3. symbol materialization: ranks -> symbols via a 256-select over the
     (length-desc, symbol-asc) sorted table, vectorized over all K*S
     positions at once.

Canonical convention matches huffman.build_ctable: codes dealt from 0
upward starting at the LONGEST length; for length l the codes occupy
[base_l, base_l + n_l) and left-aligned 11-bit windows tile [0, 2^11).
"""

from functools import lru_cache

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .huffman import MAX_BITS


def anchors_host(data: np.ndarray, lens_lut: np.ndarray) -> np.ndarray:
    """Host reference for the encode kernel's anchor output: data (32768,)
    symbols, lens_lut (256,) code lengths -> (256,) int32 bit read
    positions (anchors[g] = position of symbol g*K, counting from the
    stream bottom; anchors[0] = total bits)."""
    lens_em = lens_lut[np.asarray(data)[::-1]].astype(np.int64)
    incl = np.cumsum(lens_em)
    return incl[127::128][::-1].astype(np.int32)


K = 128            # symbols per segment (anchor spacing)
SEGS = 256         # segments per 32 KiB stream
STREAM = K * SEGS  # 32768 symbols
WB = 384           # gathered window bytes per segment (3 x 128)


def _iota(shape, dim):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim)


def decode_tables(lengths: np.ndarray):
    """lengths (256,) -> packed (1, 304) int32 decode table:
    [base(12) | n(12) | offset(12) | pad(4) | sorted_syms(256) | pad(8)].

    offset_l = rank of the first length-l code in the (length desc, symbol
    asc) sorted symbol list; base_l = first canonical code value of length
    l (0 when none)."""
    lengths = np.asarray(lengths, np.int32)
    base = np.zeros(12, np.int64)
    n = np.zeros(12, np.int64)
    off = np.zeros(12, np.int64)
    sorted_syms = []
    code = 0
    prev = MAX_BITS
    for ln in range(MAX_BITS, 0, -1):
        code >>= (prev - ln)
        prev = ln
        syms = np.nonzero(lengths == ln)[0]
        base[ln] = code
        n[ln] = len(syms)
        off[ln] = len(sorted_syms)
        sorted_syms.extend(int(s) for s in syms)
        code += len(syms)
    syms = np.zeros(256, np.int64)
    syms[: len(sorted_syms)] = sorted_syms
    out = np.zeros(304, np.int32)
    out[0:12] = base
    out[12:24] = n
    out[24:36] = off
    out[40:296] = syms
    return out.reshape(1, 304)


def make_decode_kernel(R: int):
    """Grid step = one 32 KiB stream. R = stream byte rows (R*128 bytes)."""
    S = SEGS

    def kernel(sb_ref, anch_ref, tab_ref, out_ref):
        r0 = anch_ref[0]               # (S, 1) segment read positions
        tab = tab_ref[0]               # (1, 304)

        # ---- 1. window gather (MXU one-hot + rotate) ---------------------
        # window covers bits [r - 11*K, r): start byte w0 = max(r-1408,0)/8
        rcol = r0                      # (S, 1) read positions (bits)
        lob = jnp.maximum(rcol - 11 * K, 0) >> 3  # first byte needed
        ridx = (lob >> 7) + _iota((S, 1, 3), 2).reshape(S, 3)
        ridx = jnp.minimum(ridx, R - 1)
        oh = (_iota((S, 3, R), 2) == ridx[:, :, None]).reshape(
            S * 3, R).astype(jnp.bfloat16)
        vbf = sb_ref[0].astype(jnp.int32).astype(jnp.bfloat16)  # (R, 128)
        g = jax.lax.dot_general(
            oh, vbf, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        win = g.astype(jnp.int32).reshape(S, WB)
        rot = lob & 127
        for k in range(7):
            bit = 1 << k
            rolled = pltpu.roll(win, WB - bit, axis=1)
            win = jnp.where((rot & bit) != 0, rolled, win)
        win = win[:, :192]             # bits live in the first 192 bytes

        # ---- 2. sequential canonical decode, segments in lanes -----------
        # a fori_loop (not an unrolled python loop): Mosaic reuses one
        # iteration's VMEM instead of live-ranging 128 copies of the
        # (S, 192) fetch masks (which blew past the 128 MiB capacity)
        base = [tab[0, l] for l in range(1, 12)]
        nl = [tab[0, 12 + l] for l in range(1, 12)]
        off = [tab[0, 24 + l] for l in range(1, 12)]
        sub = _iota((S, 192), 1)
        kcol = _iota((S, K), 1)
        rloc0 = rcol - (lob << 3)      # bit cursor local to window (S, 1)

        # GROUP symbols: every 16 symbols a 32-byte LOCAL chunk is rotated
        # out of the 192-byte window (16 symbols span <= 187 bits), so the
        # per-symbol dynamic byte reads reduce over 32 lanes, not 192 —
        # the bulk of the state machine's vector cost
        GROUP = 16
        CW = 32
        sub32 = _iota((S, CW), 1)

        def one(rloc, chunk, cb):
            # lookahead window may hang below bit 0 near the stream bottom:
            # clamp and LEFT-align so the code's MSB always sits at bit 10
            lo = jnp.maximum(rloc - 11, 0)
            bidx = jnp.clip((lo >> 3) - cb, 0, CW - 3)
            sh = lo & 7
            b0 = jnp.sum(jnp.where(sub32 == bidx, chunk, 0), axis=1,
                         keepdims=True)
            b1 = jnp.sum(jnp.where(sub32 == bidx + 1, chunk, 0), axis=1,
                         keepdims=True)
            b2 = jnp.sum(jnp.where(sub32 == bidx + 2, chunk, 0), axis=1,
                         keepdims=True)
            v = b0 | (b1 << 8) | (b2 << 16)
            W = ((v >> sh) << jnp.maximum(11 - rloc, 0)) & 0x7FF
            ln_v = jnp.zeros((S, 1), jnp.int32)
            idx_v = jnp.zeros((S, 1), jnp.int32)
            for l in range(1, 12):
                cand = W >> (11 - l)
                hit = (cand >= base[l - 1]) & (cand < base[l - 1] + nl[l - 1])
                fresh = hit & (ln_v == 0)
                ln_v = jnp.where(fresh, l, ln_v)
                idx_v = jnp.where(fresh, off[l - 1] + cand - base[l - 1],
                                  idx_v)
            return ln_v, idx_v

        def step(g, carry):
            rloc, ranks = carry
            # chunk start byte: covers bits [rloc - 187, rloc) with slack
            cb = jnp.clip((rloc - 187) >> 3, 0, 192 - CW)  # (S, 1)
            rot = win
            for kbit in range(8):
                bit = 1 << kbit
                rolled = pltpu.roll(rot, 192 - bit, axis=1)
                rot = jnp.where((cb & bit) != 0, rolled, rot)
            chunk = rot[:, :CW]
            for u in range(GROUP):
                ln_v, idx_v = one(rloc, chunk, cb)
                ranks = jnp.where(kcol == g * GROUP + u, idx_v, ranks)
                rloc = rloc - ln_v
            return rloc, ranks

        _, ranks = jax.lax.fori_loop(
            0, K // GROUP, step, (rloc0, jnp.zeros((S, K), jnp.int32)))

        # ---- 3. ranks -> symbols (256-select, bulk) ----------------------
        out = jnp.zeros((S, K), jnp.int32)
        for s in range(256):
            out = jnp.where(ranks == s, tab[0, 40 + s], out)
        out_ref[0] = out

    return kernel


def make_decode_kernel_v2(R: int, unroll: bool = True):
    """Transposed, register-refill decoder — the vector-op-count-bound v1
    redesigned (NOTES.md round-3 item 1, built):

    - segments live on the LANE axis: every per-segment state op is a
      (1, S) vector at full lane utilization;
    - each segment keeps a 64-bit lookahead register pair (lo, hi) over an
      aligned word window, refilled ONE word per <= 2 symbols (a single
      sublane select-reduce) instead of three dynamic byte reads per
      symbol;
    - code lengths come from counting 11 scalar canonical end-boundaries
      (len = 11 - #(W >= E_l)) instead of a first-hit select chain.
    """
    S = SEGS

    def kernel(sb_ref, anch_ref, tab_ref, out_ref):
        tab = tab_ref[0]               # (1, 304)
        r_abs = anch_ref[0].T          # (1, S) absolute bit positions

        # ---- window gather: 3 row-aligned 128-byte rows per segment ------
        lob = jnp.maximum(r_abs.T - 11 * K, 0) >> 3     # (S, 1) low byte
        row0 = lob >> 7
        ridx = row0 + _iota((S, 1, 3), 2).reshape(S, 3)
        ridx = jnp.minimum(ridx, R - 1)
        oh = (_iota((S, 3, R), 2) == ridx[:, :, None]).reshape(
            S * 3, R).astype(jnp.bfloat16)
        vbf = sb_ref[0].astype(jnp.int32).astype(jnp.bfloat16)  # (R, 128)
        g = jax.lax.dot_general(
            oh, vbf, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        win = g.astype(jnp.int32).reshape(S, WB)  # row-aligned: no rotate
        wv = win.T                                 # (384, S) bytes
        v4 = wv.reshape(96, 4, S)
        w32 = (v4[:, 0, :] | (v4[:, 1, :] << 8) | (v4[:, 2, :] << 16)
               | (v4[:, 3, :] << 24))              # (96, S) LE32 words

        ws8 = (row0.T << 10)                       # (1, S) window start bits
        r = r_abs - ws8                            # window-local bit cursor
        wsub = _iota((96, S), 0)

        def fetch(widx):
            """word at per-lane index widx (1, S) from w32."""
            return jnp.sum(jnp.where(wsub == widx, w32, 0), axis=0,
                           keepdims=True)

        # initial registers: words [pb, pb+2) cover bits [32pb, 32pb+64)
        pb = jnp.maximum(-(-(r - 64) // 32), 0)
        lo = fetch(pb)
        hi = fetch(jnp.minimum(pb + 1, 95))

        # canonical decode scalars
        E = []      # end boundary of each length's left-aligned region
        D = []      # off_l - base_l
        for l in range(1, 12):
            base_l = tab[0, l]
            n_l = tab[0, 12 + l]
            off_l = tab[0, 24 + l]
            E.append((base_l + n_l) << (11 - l))
            D.append(off_l - base_l)

        def one(r, pb, lo, hi):
            s = r - 11 - (pb << 5)     # lookahead low-bit offset in reg
            sc = jnp.clip(s, 0, 53)
            Wn = jnp.where(
                sc >= 32, hi >> (sc - 32),
                (jax.lax.shift_right_logical(lo, sc)
                 | ((hi << (31 - sc)) << 1)))
            rc = jnp.clip(r, 0, 11)
            Wb = (lo & ((1 << rc) - 1)) << (11 - rc)  # bottom: left-align
            W = jnp.where(r >= 11, Wn, Wb) & 0x7FF
            cnt = jnp.zeros((1, S), jnp.int32)
            for l in range(11):
                cnt = cnt + (W >= E[l]).astype(jnp.int32)
            ln = 11 - cnt
            cand = W >> (11 - ln)
            dd = jnp.zeros((1, S), jnp.int32)
            for l in range(11):
                dd = jnp.where(ln == l + 1, D[l], dd)
            return ln, cand + dd

        def pair(carry):
            """two symbols + one refill check (symbols consume <= 22 bits,
            the register holds >= 33 after a refill)."""
            r, pb, lo, hi = carry
            need = (pb > 0) & ((pb << 5) > r - 33)
            pbn = pb - 1
            nlo = fetch(jnp.maximum(pbn, 0))
            pb = jnp.where(need, pbn, pb)
            hi = jnp.where(need, lo, hi)
            lo = jnp.where(need, nlo, lo)
            ln0, idx0 = one(r, pb, lo, hi)
            r = r - ln0
            ln1, idx1 = one(r, pb, lo, hi)
            r = r - ln1
            return (r, pb, lo, hi), idx0, idx1

        if unroll:
            # fully unrolled: per-symbol state is a handful of (1, S)
            # vectors, so (unlike v1's (S, 192) masks) the live set stays
            # small and every ranks write is a static concat row
            cols = []
            carry = (r, pb, lo, hi)
            for k in range(K // 2):
                carry, idx0, idx1 = pair(carry)
                cols += [idx0, idx1]
            ranks = jnp.concatenate(cols, axis=0)  # (K, S)
        else:
            # fori variant: fast to trace/compile (interpret-mode tests)
            kcol = _iota((K, S), 0)

            def step(k2, st):
                carry, ranks = st
                carry, idx0, idx1 = pair(carry)
                ranks = jnp.where(kcol == 2 * k2, idx0, ranks)
                ranks = jnp.where(kcol == 2 * k2 + 1, idx1, ranks)
                return carry, ranks

            _, ranks = jax.lax.fori_loop(
                0, K // 2, step,
                ((r, pb, lo, hi), jnp.zeros((K, S), jnp.int32)))

        # ---- ranks -> symbols (256-select, bulk) -------------------------
        out = jnp.zeros((K, S), jnp.int32)
        for sym in range(256):
            out = jnp.where(ranks == sym, tab[0, 40 + sym], out)
        out_ref[0] = out.T

    return kernel


def make_decode_kernel_v3(R: int, G: int = 8, unroll: bool = False,
                          two_level: bool = False):
    """v2 with G streams batched per grid step — the sublane fix.

    v2's per-symbol state ops are (1, S) vectors: one sublane of the
    (8, 128) vreg carries data, 12.5% utilization. Here G=8 streams run
    together, so every state vector is (G, S) = a fully-packed vreg pair;
    the same op chain decodes 8x the bytes. The window gather is also
    restructured transpose-free: one batched MXU dot_general produces
    byte-major rows, and the word view comes from slice+concat only.
    """
    S = SEGS

    def kernel(sb_ref, anch_ref, tab_ref, out_ref):
        tab = tab_ref[:, 0, :]                    # (G, 304)
        r_abs = anch_ref[:, :, 0]                 # (G, S) bit positions

        # ---- window gather: x[g, b, t*S+s] = stream byte b of window row t
        # of segment s. One one-hot block per window row, concatenated on
        # the LANE axis: Mosaic rejects the (G, S, 3) -> (G, 1, S*3) shape
        # cast (lane-dim reshape), and aligned lane slices at multiples of
        # S are free.
        lob = jnp.maximum(r_abs - 11 * K, 0) >> 3           # (G, S)
        row0 = lob >> 7
        oh = jnp.concatenate(
            [(_iota((G, R, S), 1)
              == jnp.minimum(row0 + t, R - 1)[:, None, :]).astype(
                  jnp.bfloat16) for t in range(3)],
            axis=2)                               # (G, R, 3S)
        vbf = sb_ref[...].astype(jnp.int32).astype(jnp.bfloat16)  # (G,R,128)
        x = jax.lax.dot_general(
            vbf, oh, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)   # (G, 128, 3S)
        xi = x.astype(jnp.int32)
        rows = []
        for t in range(3):
            xt = xi[:, :, t * S : (t + 1) * S].reshape(G, 32, 4, S)
            rows.append(xt[:, :, 0] | (xt[:, :, 1] << 8)
                        | (xt[:, :, 2] << 16) | (xt[:, :, 3] << 24))
        w32 = jnp.concatenate(rows, axis=1)       # (G, 96, S) word-major

        ws8 = row0 << 10                          # (G, S) window start bits
        r = r_abs - ws8                           # window-local bit cursor
        wsub = _iota((1, 96, 1), 1)

        def fetch(widx):
            """word at per-(stream, segment) index widx (G, S) from w32."""
            return jnp.sum(
                jnp.where(wsub == widx[:, None, :], w32, 0), axis=1)

        pb = jnp.maximum(-(-(r - 64) // 32), 0)
        lo = fetch(pb)
        hi = fetch(jnp.minimum(pb + 1, 95))

        # canonical decode per-stream scalars -> (G, 1) columns
        E = []
        D = []
        for l in range(1, 12):
            base_l = tab[:, l : l + 1]
            n_l = tab[:, 12 + l : 13 + l]
            off_l = tab[:, 24 + l : 25 + l]
            E.append((base_l + n_l) << (11 - l))
            D.append(off_l - base_l)

        def one(r, pb, lo, hi):
            s = r - 11 - (pb << 5)
            sc = jnp.clip(s, 0, 53)
            Wn = jnp.where(
                sc >= 32, hi >> (sc - 32),
                (jax.lax.shift_right_logical(lo, sc)
                 | ((hi << (31 - sc)) << 1)))
            rc = jnp.clip(r, 0, 11)
            Wb = (lo & ((1 << rc) - 1)) << (11 - rc)
            W = jnp.where(r >= 11, Wn, Wb) & 0x7FF
            cnt = jnp.zeros((G, S), jnp.int32)
            for l in range(11):
                cnt = cnt + (W >= E[l]).astype(jnp.int32)
            ln = 11 - cnt
            cand = W >> (11 - ln)
            dd = jnp.zeros((G, S), jnp.int32)
            for l in range(11):
                dd = jnp.where(ln == l + 1, D[l], dd)
            return ln, cand + dd

        def make_pair(fetch_fn):
            def pair(carry):
                r, pb, lo, hi = carry
                need = (pb > 0) & ((pb << 5) > r - 33)
                pbn = pb - 1
                nlo = fetch_fn(jnp.maximum(pbn, 0))
                pb = jnp.where(need, pbn, pb)
                hi = jnp.where(need, lo, hi)
                lo = jnp.where(need, nlo, lo)
                ln0, idx0 = one(r, pb, lo, hi)
                r = r - ln0
                ln1, idx1 = one(r, pb, lo, hi)
                r = r - ln1
                return (r, pb, lo, hi), idx0, idx1
            return pair

        if two_level:
            # ---- two-level fetch: refills read a 16-word ALIGNED working
            # set (two 8-word groups straddling the cursor), refreshed every
            # 16 symbols — a one-of-12 group select per 16 symbols plus a
            # one-of-16 select per refill, instead of one-of-96 every two
            # symbols (the dominant v3 cost). 16 symbols consume <= 176
            # bits < the >= 8-word (256-bit) cover below the start group.
            wg = w32.reshape(G, 12, 8, S)
            gsub = _iota((1, 12, 1, 1), 1)
            kcol = _iota((1, K, S), 1)

            def refresh(pb):
                a = pb >> 3                       # current 8-word group
                abase = jnp.maximum(a - 1, 0)
                g_hi = jnp.sum(
                    jnp.where(gsub == a[:, None, None, :], wg, 0), axis=1)
                g_lo = jnp.sum(
                    jnp.where(gsub == abase[:, None, None, :], wg, 0),
                    axis=1)
                ws = jnp.concatenate([g_lo, g_hi], axis=1)  # (G, 16, S)
                return ws, abase << 3

            wssub = _iota((1, 16, 1), 1)

            def step(k16, st):
                carry, ranks = st
                r, pb, lo, hi = carry
                ws, wb = refresh(pb)

                def fetch_ws(widx):
                    loc = (widx - wb)[:, None, :]
                    return jnp.sum(jnp.where(wssub == loc, ws, 0), axis=1)

                pair = make_pair(fetch_ws)
                carry = (r, pb, lo, hi)
                for u in range(8):
                    carry, idx0, idx1 = pair(carry)
                    kk = k16 * 16 + 2 * u
                    ranks = jnp.where(kcol == kk, idx0[:, None, :], ranks)
                    ranks = jnp.where(kcol == kk + 1, idx1[:, None, :],
                                      ranks)
                return carry, ranks

            _, ranks = jax.lax.fori_loop(
                0, K // 16, step,
                ((r, pb, lo, hi), jnp.zeros((G, K, S), jnp.int32)))
        elif unroll:
            pair = make_pair(fetch)
            cols = []
            carry = (r, pb, lo, hi)
            for _ in range(K // 2):
                carry, idx0, idx1 = pair(carry)
                cols += [idx0[:, None, :], idx1[:, None, :]]
            ranks = jnp.concatenate(cols, axis=1)  # (G, K, S)
        else:
            pair = make_pair(fetch)
            kcol = _iota((1, K, S), 1)

            def step(k2, st):
                carry, ranks = st
                carry, idx0, idx1 = pair(carry)
                ranks = jnp.where(kcol == 2 * k2, idx0[:, None, :], ranks)
                ranks = jnp.where(kcol == 2 * k2 + 1, idx1[:, None, :],
                                  ranks)
                return carry, ranks

            _, ranks = jax.lax.fori_loop(
                0, K // 2, step,
                ((r, pb, lo, hi), jnp.zeros((G, K, S), jnp.int32)))

        out = jnp.zeros((G, K, S), jnp.int32)
        for sym in range(256):
            out = jnp.where(ranks == sym, tab[:, 40 + sym][:, None, None],
                            out)
        out_ref[...] = out.transpose(0, 2, 1)

    return kernel


def make_decode_kernel_v5(R: int, G: int = 8):
    """v2's exact per-stream body — all (1, S)/(K, S) shapes, the layout
    Mosaic executes at full rate — python-unrolled over G streams per grid
    step, writing uint8.

    Round-4 hardware ablation findings (tools/ablate_hufdec.py) behind
    this design:
      - every pallas dispatch on this relay costs ~24 ms BEFORE the kernel
        runs; all round-3 per-variant numbers were dispatch-dominated;
      - v2's true kernel time was ~14 ms / 17 MB, of which the (K, S)
        masked ranks-writes were 61% — grouping G=8 streams per grid step
        restructures those to ~nothing (8.4 ms / 17 MB measured);
      - v3/v4's batched (G, S) state ops lower catastrophically (a (4,256)
        `one()` costs ~10x a (1,256) one) — multi-stream batching must be
        SEQUENTIAL per stream, not shape-batched;
      - the window gather (one-hot MXU dot + transpose + byte-combine) is
        ~free (<1 ms / 17 MB): not worth redesigning;
      - uint8 output quarters the out-DMA for free (symbols are bytes).
    """
    S = SEGS

    def body(sb, anch, tab):
        r_abs = anch.T                          # (1, S)
        lob = jnp.maximum(r_abs.T - 11 * K, 0) >> 3
        row0 = lob >> 7
        ridx = row0 + _iota((S, 1, 3), 2).reshape(S, 3)
        ridx = jnp.minimum(ridx, R - 1)
        oh = (_iota((S, 3, R), 2) == ridx[:, :, None]).reshape(
            S * 3, R).astype(jnp.bfloat16)
        vbf = sb.astype(jnp.int32).astype(jnp.bfloat16)
        g = jax.lax.dot_general(
            oh, vbf, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        win = g.astype(jnp.int32).reshape(S, WB)
        wv = win.T
        v4 = wv.reshape(96, 4, S)
        w32 = (v4[:, 0, :] | (v4[:, 1, :] << 8) | (v4[:, 2, :] << 16)
               | (v4[:, 3, :] << 24))
        ws8 = (row0.T << 10)
        r = r_abs - ws8
        wsub = _iota((96, S), 0)

        def fetch(widx):
            return jnp.sum(jnp.where(wsub == widx, w32, 0), axis=0,
                           keepdims=True)

        pb = jnp.maximum(-(-(r - 64) // 32), 0)
        lo = fetch(pb)
        hi = fetch(jnp.minimum(pb + 1, 95))

        E, D = [], []
        for l in range(1, 12):
            base_l = tab[0, l]
            n_l = tab[0, 12 + l]
            off_l = tab[0, 24 + l]
            E.append((base_l + n_l) << (11 - l))
            D.append(off_l - base_l)

        def one(r, pb, lo, hi):
            s = r - 11 - (pb << 5)
            sc = jnp.clip(s, 0, 53)
            Wn = jnp.where(
                sc >= 32, hi >> (sc - 32),
                (jax.lax.shift_right_logical(lo, sc)
                 | ((hi << (31 - sc)) << 1)))
            rc = jnp.clip(r, 0, 11)
            Wb = (lo & ((1 << rc) - 1)) << (11 - rc)
            W = jnp.where(r >= 11, Wn, Wb) & 0x7FF
            # telescoped rank delta: the SAME compare mask drives the
            # length count AND the dd accumulation (dd ends at D[ln-1]
            # because the satisfied boundaries telescope D[10] down) —
            # replaces the 11-select D chain (exact; ~10% kernel time)
            cnt = jnp.zeros((1, S), jnp.int32)
            dd = jnp.full((1, S), D[10], jnp.int32)
            for l in range(11):
                m = (W >= E[l]).astype(jnp.int32)
                cnt = cnt + m
                if l >= 1:
                    dd = dd - m * (D[l] - D[l - 1])
            ln = 11 - cnt
            cand = W >> (11 - ln)
            return ln, cand + dd

        def pair(carry):
            r, pb, lo, hi = carry
            need = (pb > 0) & ((pb << 5) > r - 33)
            pbn = pb - 1
            nlo = fetch(jnp.maximum(pbn, 0))
            pb = jnp.where(need, pbn, pb)
            hi = jnp.where(need, lo, hi)
            lo = jnp.where(need, nlo, lo)
            ln0, idx0 = one(r, pb, lo, hi)
            r = r - ln0
            ln1, idx1 = one(r, pb, lo, hi)
            r = r - ln1
            return (r, pb, lo, hi), idx0, idx1

        kcol = _iota((K, S), 0)

        def step(k2, st):
            carry, ranks = st
            carry, idx0, idx1 = pair(carry)
            ranks = jnp.where(kcol == 2 * k2, idx0, ranks)
            ranks = jnp.where(kcol == 2 * k2 + 1, idx1, ranks)
            return carry, ranks

        _, ranks = jax.lax.fori_loop(
            0, K // 2, step,
            ((r, pb, lo, hi), jnp.zeros((K, S), jnp.int32)))

        out = jnp.zeros((K, S), jnp.int32)
        for sym in range(256):
            out = jnp.where(ranks == sym, tab[0, 40 + sym], out)
        return out.T

    def kernel(sb_ref, anch_ref, tab_ref, out_ref):
        for g in range(G):
            out_ref[g] = body(sb_ref[g], anch_ref[g],
                              tab_ref[g]).astype(jnp.uint8)

    return kernel


def make_decode_kernel_v6(R: int, G: int = 8):
    """v5 with the three op-count cuts of the round-5 plan (VERDICT r4
    next-step 3 — attack the remaining vector-op count):

    - ranks land in a VMEM scratch ref via dynamic-sublane ROW stores
      (one (1, S) store per symbol — the fse_pallas-validated primitive)
      instead of v5's per-symbol (K, S) masked wheres, which were the
      single largest cost in the round-4 ablation;
    - a 22-bit lookahead serves TWO symbols per extraction: symbol 1's
      window is one shift+mask of the same register read instead of a
      second full window assembly;
    - the bulk rank->symbol translation packs the sorted symbol table 4
      per word: a 64-way select + per-element byte extract replaces the
      256-way select chain (31% of v2's kernel time in the ablation).
    """
    S = SEGS

    def body(sb, anch, tab, rref):
        r_abs = anch.T                          # (1, S)
        lob = jnp.maximum(r_abs.T - 11 * K, 0) >> 3
        row0 = lob >> 7
        ridx = row0 + _iota((S, 1, 3), 2).reshape(S, 3)
        ridx = jnp.minimum(ridx, R - 1)
        oh = (_iota((S, 3, R), 2) == ridx[:, :, None]).reshape(
            S * 3, R).astype(jnp.bfloat16)
        vbf = sb.astype(jnp.int32).astype(jnp.bfloat16)
        g = jax.lax.dot_general(
            oh, vbf, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        win = g.astype(jnp.int32).reshape(S, WB)
        wv = win.T
        v4 = wv.reshape(96, 4, S)
        w32 = (v4[:, 0, :] | (v4[:, 1, :] << 8) | (v4[:, 2, :] << 16)
               | (v4[:, 3, :] << 24))
        ws8 = (row0.T << 10)
        r = r_abs - ws8
        wsub = _iota((96, S), 0)

        def fetch(widx):
            return jnp.sum(jnp.where(wsub == widx, w32, 0), axis=0,
                           keepdims=True)

        pb = jnp.maximum(-(-(r - 64) // 32), 0)
        lo = fetch(pb)
        hi = fetch(jnp.minimum(pb + 1, 95))

        E, D = [], []
        for l in range(1, 12):
            base_l = tab[0, l]
            n_l = tab[0, 12 + l]
            off_l = tab[0, 24 + l]
            E.append((base_l + n_l) << (11 - l))
            D.append(off_l - base_l)

        def classify(W):
            """left-aligned 11-bit window -> (len, rank); telescoped rank
            delta exactly as v5."""
            cnt = jnp.zeros((1, S), jnp.int32)
            dd = jnp.full((1, S), D[10], jnp.int32)
            for l in range(11):
                m = (W >= E[l]).astype(jnp.int32)
                cnt = cnt + m
                if l >= 1:
                    dd = dd - m * (D[l] - D[l - 1])
            ln = 11 - cnt
            cand = W >> (11 - ln)
            return ln, cand + dd

        def pair(carry):
            """one 22-bit register read serves both symbols (<= 22 bits
            consumed; the refill keeps >= 33 available)."""
            r, pb, lo, hi = carry
            need = (pb > 0) & ((pb << 5) > r - 33)
            pbn = pb - 1
            nlo = fetch(jnp.maximum(pbn, 0))
            pb = jnp.where(need, pbn, pb)
            hi = jnp.where(need, lo, hi)
            lo = jnp.where(need, nlo, lo)
            s = r - 22 - (pb << 5)
            sc = jnp.clip(s, 0, 42)
            Wn = jnp.where(
                sc >= 32, hi >> (sc - 32),
                (jax.lax.shift_right_logical(lo, sc)
                 | ((hi << (31 - sc)) << 1)))
            rc = jnp.clip(r, 0, 22)
            Wb = (lo & ((1 << rc) - 1)) << (22 - rc)
            W22 = jnp.where(r >= 22, Wn, Wb) & 0x3FFFFF
            ln0, idx0 = classify(W22 >> 11)
            ln1, idx1 = classify((W22 >> (11 - ln0)) & 0x7FF)
            return (r - ln0 - ln1, pb, lo, hi), idx0, idx1

        def step(k2, carry):
            carry, idx0, idx1 = pair(carry)
            rref[pl.ds(2 * k2, 1), :] = idx0
            rref[pl.ds(2 * k2 + 1, 1), :] = idx1
            return carry

        jax.lax.fori_loop(0, K // 2, step, (r, pb, lo, hi))

        # bulk rank -> symbol: 4-packed words, 64-way select + byte extract
        w4 = []
        for i in range(64):
            w4.append(tab[0, 40 + 4 * i]
                      | (tab[0, 41 + 4 * i] << 8)
                      | (tab[0, 42 + 4 * i] << 16)
                      | (tab[0, 43 + 4 * i] << 24))
        ranks = rref[...]
        rhi = ranks >> 2
        word = jnp.zeros((K, S), jnp.int32)
        for i in range(64):
            word = jnp.where(rhi == i, w4[i], word)
        sym = jax.lax.shift_right_logical(
            word, (ranks & 3) << 3) & 255
        return sym.T

    def kernel(sb_ref, anch_ref, tab_ref, out_ref, rref):
        for g in range(G):
            out_ref[g] = body(sb_ref[g], anch_ref[g],
                              tab_ref[g], rref).astype(jnp.uint8)

    return kernel


DECODE_G = 8  # streams per v3/v5 grid step


@lru_cache(maxsize=16)
def _decode_call(ns: int, R: int, interpret: bool, v: int = 1):
    # unroll=False everywhere: measured identical to the full unroll on
    # TPU (the remaining cost is the per-symbol op chain), and the fori
    # form traces/compiles an order of magnitude faster
    if v in (5, 6):
        G = DECODE_G
        kernel = (make_decode_kernel_v6(R, G) if v == 6
                  else make_decode_kernel_v5(R, G))
        return pl.pallas_call(
            kernel,
            grid=(ns // G,),
            in_specs=[
                pl.BlockSpec((G, R, 128), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((G, SEGS, 1), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((G, 1, 304), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((G, SEGS, K), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((ns, SEGS, K), jnp.uint8),
            interpret=interpret,
            scratch_shapes=([pltpu.VMEM((K, SEGS), jnp.int32)]
                            if v == 6 else []),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )
    if v in (3, 4):
        G = DECODE_G
        kernel = make_decode_kernel_v3(R, G, unroll=False,
                                       two_level=(v == 4))
        return pl.pallas_call(
            kernel,
            grid=(ns // G,),
            in_specs=[
                pl.BlockSpec((G, R, 128), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((G, SEGS, 1), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((G, 1, 304), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((G, SEGS, K), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((ns, SEGS, K), jnp.int32),
            interpret=interpret,
            # the G=8 batch carries multi-MB live state per grid step (the
            # (G, K, S) ranks carry alone is 1 MiB; the fori body's window
            # words, masks and temporaries multiply that) — past the 16 MiB
            # default scoped-vmem cap. The 100 MiB limit assumes a >=128 MiB
            # VMEM part (TPU v5e, this target); on smaller-VMEM generations
            # the v3/v4 opt-in path may fail to compile, which the shape-
            # failure cache demotes to v2 (the safe default).
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )
    kernel = make_decode_kernel_v2(R, unroll=False) if v == 2 \
        else make_decode_kernel(R)
    return pl.pallas_call(
        kernel,
        grid=(ns,),
        in_specs=[
            pl.BlockSpec((1, R, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SEGS, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 304), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, SEGS, K), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ns, SEGS, K), jnp.int32),
        interpret=interpret,
    )


def decode_streams_device(stream_bytes, anchors, tables,
                          interpret: bool = False, v: int | None = None):
    """stream_bytes (ns, R*128) uint8 (huffman bitstreams, zero-padded);
    anchors (ns, 256) int32 — bit read-position of segment g's first symbol
    (anchors[g] = incl_bits at emission index STREAM-1-g*K; the encoder's
    per-row prefix column reversed); tables (ns, 304) int32 from
    decode_tables. Returns (ns, 32768) int32 symbols.

    v: kernel version (2 = per-stream, 3 = 8-stream batched, 4 = 3 +
    two-level refill, 5 = per-stream body x8 per grid step + uint8 out,
    6 = 5 + scratch-row rank stores, 22-bit pair lookahead and the packed
    64-way symbol select — the round-5 op-count cuts); None reads
    STENOS_HUF_DECODE_V so hardware A/B needs no code edits. v5/v6 return
    uint8 (symbols are bytes); other versions return int32."""
    if v is None:
        import os

        v = int(os.environ.get("STENOS_HUF_DECODE_V", "6"))
    import jax.numpy as _jnp

    ns = stream_bytes.shape[0]
    R = stream_bytes.shape[1] // 128
    if v in (3, 4, 5, 6) and ns % DECODE_G:
        # pad the stream batch to the v3 group size (padding decodes to
        # discarded garbage; anchors 0 keep every cursor in-bounds)
        pad = DECODE_G - ns % DECODE_G
        stream_bytes = _jnp.concatenate(
            [stream_bytes,
             _jnp.zeros((pad, R * 128), stream_bytes.dtype)], axis=0)
        anchors = _jnp.concatenate(
            [anchors, _jnp.zeros((pad, SEGS), anchors.dtype)], axis=0)
        tables = _jnp.concatenate(
            [tables, _jnp.zeros((pad, 304), tables.dtype)], axis=0)
    nsp = stream_bytes.shape[0]
    call = _decode_call(nsp, R, interpret, v)
    out = call(
        stream_bytes.reshape(nsp, R, 128),
        anchors.reshape(nsp, SEGS, 1),
        tables.reshape(nsp, 1, 304),
    )
    return out.reshape(nsp, STREAM)[:ns]
