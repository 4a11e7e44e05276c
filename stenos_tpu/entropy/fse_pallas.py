"""Device (Pallas) FSE sequence-bitstream encoder (VERDICT r3 item 4).

The reference runs the zstd sequence stage (FSE-interleaved LL/OF/ML
states + extra bits) inside libzstd on the host (zstd_wrapper.h:59-90).
Here the whole bitstream materializes ON DEVICE, tpu-first:

- lanes = BLOCKS: one grid step encodes 128 blocks' sequence sections
  side by side; each lane runs its own three FSE state machines with its
  own (custom or predefined) tables — the tables are (rows, L) arrays, so
  per-lane tables cost the same selects as shared ones.
- the sequential state walk (t = 1..T-1, reverse sequence order) does
  per-channel table transitions via one-of-64 (symbolTT) and one-of-512
  (stateTable) sublane selects on (rows, 128) arrays — the 2D shape class
  Mosaic executes at full rate (NOTES.md round-4) — and writes each
  emitted (value, nbits) state chunk into a scratch row with a dynamic
  sublane store (O(1) per chunk; validated on hardware).
- EXTRA-bit chunks never depend on state, so the host prefills them into
  the chunk arrays; the device only computes the state chunks and the
  three flush chunks.
- bit assembly is scatter-free and PER COLUMN (each lane an independent
  stream): exclusive cumsum of nbits down the rows, (lo, hi) word parts,
  a log-doubling segmented OR over rows sharing a word, and a variable-
  distance log-shift compaction to word order — the huff_pallas assembly
  pattern with the axes transposed (no flat cross-lane carries at all).

The host keeps O(nseq) metadata only: code/extra splitting, repcode
recoding, table normalization + NCount headers, section splicing —
mirroring how the frame layer keeps method selection host-side. Output
bits are exactly BitWriter order (fse.py): tests pin byte-identity
against encode_sequences.
"""

from functools import lru_cache

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

L = 128          # blocks (lanes) per grid step
NSYM = 64        # symbolTT rows per channel (LL 36 / ML 53 / OF <= 32)
STT = 512        # stateTable rows per channel (table_log <= 9)


def _iota(shape, dim):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim)


def rows_for(T: int) -> int:
    """Chunk rows for T sequences: 3 init extras + 6 per step + 3 flush +
    1 terminator, padded to a multiple of 8 sublanes."""
    r = 3 + 6 * (T - 1) + 3 + 1
    return -(-r // 8) * 8


def _roll_down(x, k):
    """out[r] = x[r-k] (zero-fill above)."""
    if k == 0:
        return x
    R = x.shape[0]
    y = pltpu.roll(x, k % R, axis=0)
    return jnp.where(_iota(x.shape, 0) >= k, y, 0)


def _roll_up(x, k):
    """out[r] = x[r+k] (zero-fill below)."""
    if k == 0:
        return x
    R = x.shape[0]
    y = pltpu.roll(x, (R - k) % R, axis=0)
    return jnp.where(_iota(x.shape, 0) < R - k, y, 0)


def make_fse_kernel(T: int, W: int):
    """T = max sequences per block; W = output words per lane."""
    R = rows_for(T)

    def kernel(sym_ref, tabs_ref, nseq_ref, cval_ref, cnb_ref,
               words_ref, bits_ref, vref, nref):
        # ---- phase A: three per-lane state machines ---------------------
        # sym rows: [ll 0:T | ml T:2T | of 2T:3T], reversed order
        # tabs rows: per channel ch: dnb NSYM | dfs NSYM | stt STT
        # chunk row layout: 0..2 init extras (host), then per step t>=1:
        #   base = 3 + 6*(t-1): [of_s, ml_s, ll_s, ll_x, ml_x, of_x]
        #   (x rows host-prefilled), then [ml_f, of_f, ll_f], terminator.
        vref[...] = cval_ref[0]
        nref[...] = cnb_ref[0]
        nseq = nseq_ref[0, 0:1, :]                      # (1, L)
        CH = NSYM * 2 + STT

        # table blocks hoisted out of the loop (static row slices)
        sub_n = _iota((NSYM, L), 0)
        sub_s = _iota((STT, L), 0)
        DNB, DFS, ST = [], [], []
        for ch in range(3):
            DNB.append(tabs_ref[0, ch * CH : ch * CH + NSYM, :])
            DFS.append(tabs_ref[0, ch * CH + NSYM : ch * CH + 2 * NSYM, :])
            ST.append(tabs_ref[0, ch * CH + 2 * NSYM : (ch + 1) * CH, :])

        def sel_n(blk, idx):
            return jnp.sum(jnp.where(sub_n == idx, blk, 0), axis=0,
                           keepdims=True)

        def sel_s(blk, idx):
            return jnp.sum(jnp.where(sub_s == idx, blk, 0), axis=0,
                           keepdims=True)

        def init_state(ch, sym):
            dnb = sel_n(DNB[ch], sym)
            dfs = sel_n(DFS[ch], sym)
            nb0 = (dnb + (1 << 15)) >> 16
            v = (nb0 << 16) - dnb
            return sel_s(ST[ch],
                         jax.lax.shift_right_logical(v, nb0) + dfs)

        def sym_at(ch, t):
            return sym_ref[0, pl.ds(ch * T + t, 1), :]

        # init from the LAST sequence's codes (sym row t=0)
        s_ll = init_state(0, sym_at(0, 0))
        s_ml = init_state(1, sym_at(1, 0))
        s_of = init_state(2, sym_at(2, 0))

        def step(t, st):
            s_ll, s_ml, s_of = st
            active = (t <= nseq - 1).astype(jnp.int32)
            base = 3 + 6 * (t - 1)

            def enc(ch, state, slot):
                sym = sym_at(ch, t)
                dnb = sel_n(DNB[ch], sym)
                dfs = sel_n(DFS[ch], sym)
                nb = (state + dnb) >> 16
                vref[pl.ds(base + slot, 1), :] = state
                nref[pl.ds(base + slot, 1), :] = nb * active
                nstate = sel_s(ST[ch],
                               jax.lax.shift_right_logical(state, nb)
                               + dfs)
                return jnp.where(active == 1, nstate, state)

            # emission order per host loop: OF state, ML state, LL state
            s_of = enc(2, s_of, 0)
            s_ml = enc(1, s_ml, 1)
            s_ll = enc(0, s_ll, 2)
            return s_ll, s_ml, s_of

        s_ll, s_ml, s_of = jax.lax.fori_loop(
            1, T, step, (s_ll, s_ml, s_of))

        # flush rows (ml, of, ll) — nbits prefilled by host (= table_log)
        fb = 3 + 6 * (T - 1)
        vref[pl.ds(fb, 1), :] = s_ml
        vref[pl.ds(fb + 1, 1), :] = s_of
        vref[pl.ds(fb + 2, 1), :] = s_ll

        # ---- phase B: per-column scatter-free bit assembly --------------
        val = vref[...]
        nb = nref[...]
        # exclusive cumsum of nbits down the rows
        incl = nb
        k = 1
        while k < R:
            incl = incl + _roll_down(incl, k)
            k <<= 1
        off = incl - nb
        bits_ref[0] = jnp.max(incl, axis=0, keepdims=True)

        sh = off & 31
        w0 = off >> 5
        mask = jax.lax.shift_left(jnp.int32(1), nb) - 1  # nb <= 31
        v = val & mask
        lo = jax.lax.shift_left(v, sh)
        hi = jax.lax.shift_right_logical(
            jax.lax.shift_right_logical(v, 1), 31 - sh)

        # segmented OR: combine all rows sharing a word (runs can be long:
        # zero-bit chunks share their word with many neighbors)
        acc_lo, acc_hi = lo, hi
        k = 1
        while k < R:
            same = _roll_down(w0, k) == w0
            # also require the rolled row to exist (roll_down zero-fills
            # w0 to 0 above; row < k never matches unless w0 == 0, which
            # is correct for the stream head)
            acc_lo = acc_lo | jnp.where(same, _roll_down(acc_lo, k), 0)
            acc_hi = acc_hi | jnp.where(same, _roll_down(acc_hi, k), 0)
            k <<= 1
        rowi = _iota((R, L), 0)
        nxt = _roll_up(w0, 1)
        islast = (nxt != w0) | (rowi == R - 1)

        # compaction: the last row of each word-group moves UP to row w0
        shift = jnp.where(islast, rowi - w0, 0)
        ctrl = jnp.where(islast, shift, -1)
        vlo = jnp.where(islast, acc_lo, 0)
        vhi = jnp.where(islast, acc_hi, 0)
        kk = 1
        while kk < R:
            cm = _roll_up(ctrl, kk)
            lm = _roll_up(vlo, kk)
            hm = _roll_up(vhi, kk)
            # rolled-in rows beyond the array carry ctrl 0 from zero-fill:
            # treat only ctrl > 0 rows as movable (-1 = empty)
            arrive = (cm > 0) & ((cm & kk) == kk)
            stay = (ctrl >= 0) & ((ctrl & kk) == 0)
            ctrl = jnp.where(arrive, cm - kk, jnp.where(stay, ctrl, -1))
            vlo = jnp.where(arrive, lm, jnp.where(stay, vlo, 0))
            vhi = jnp.where(arrive, hm, jnp.where(stay, vhi, 0))
            kk <<= 1
        vhi1 = _roll_down(vhi, 1)
        words = vlo | vhi1
        words_ref[0] = words[:W]

    return kernel


@lru_cache(maxsize=16)
def _fse_call(nb_grid: int, T: int, W: int, interpret: bool):
    R = rows_for(T)
    kernel = make_fse_kernel(T, W)
    return pl.pallas_call(
        kernel,
        grid=(nb_grid,),
        in_specs=[
            pl.BlockSpec((1, 3 * T, L), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * (2 * NSYM + STT), L),
                         lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, L), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, L), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, L), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, W, L), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, L), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nb_grid, W, L), jnp.int32),
            jax.ShapeDtypeStruct((nb_grid, 1, L), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((R, L), jnp.int32),
                        pltpu.VMEM((R, L), jnp.int32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )


def _bucket_T(n: int) -> int:
    # 2560 is the VMEM ceiling: phase B's unrolled log-shift stages over
    # (6T+7, L) rows spill past the 128 MiB VMEM at T = 4096 (measured:
    # 206 MB of register spill slots) — denser blocks use the native host
    # FSE writer, which the e2e router prefers on this relay anyway
    for t in (64, 256, 1024, 2560):
        if n <= t:
            return t
    return -1  # beyond the device bucket: caller falls back to host


def encode_seq_bitstreams_device(blocks, interpret: bool = False):
    """blocks: list of per-block dicts from prep_block() (None entries
    are skipped). Returns list of bytes|None — each the block's complete
    sequence BITSTREAM (BitWriter-identical, terminator + padding
    included); None where the device bucket was exceeded."""
    idx = [i for i, b in enumerate(blocks) if b is not None]
    out = [None] * len(blocks)
    if not idx:
        return out
    Tmax = max(blocks[i]["nseq"] for i in idx)
    T = _bucket_T(Tmax)
    if T < 0:
        return out
    R = rows_for(T)
    Lb = L
    nbat = -(-len(idx) // Lb)
    sym = np.zeros((nbat, 3 * T, Lb), np.int32)
    tabs = np.zeros((nbat, 3 * (2 * NSYM + STT), Lb), np.int32)
    nseq = np.zeros((nbat, 1, Lb), np.int32)
    cval = np.zeros((nbat, R, Lb), np.int32)
    cnb = np.zeros((nbat, R, Lb), np.int32)
    CH = 2 * NSYM + STT
    for j, bi in enumerate(idx):
        g, lane = divmod(j, Lb)
        b = blocks[bi]
        n = b["nseq"]
        nseq[g, 0, lane] = n
        for ch, key in enumerate(("ll", "ml", "of")):
            syms = b[f"{key}_sym"]  # (n,) codes in NATURAL order
            sym[g, ch * T : ch * T + n, lane] = syms[::-1]
            dnb, dfs, stt, tlog = b[f"{key}_tab"]
            tabs[g, ch * CH : ch * CH + len(dnb), lane] = dnb
            tabs[g, ch * CH + NSYM : ch * CH + NSYM + len(dfs), lane] = dfs
            tabs[g, ch * CH + 2 * NSYM : ch * CH + 2 * NSYM + len(stt),
                 lane] = stt
        # extras prefill (init + per step) + flush nbits + terminator
        ll_v, ll_nb = b["ll_x"]       # (n,) natural order
        ml_v, ml_nb = b["ml_x"]
        of_v, of_nb = b["of_x"]
        cval[g, 0, lane] = ll_v[n - 1]
        cnb[g, 0, lane] = ll_nb[n - 1]
        cval[g, 1, lane] = ml_v[n - 1]
        cnb[g, 1, lane] = ml_nb[n - 1]
        cval[g, 2, lane] = of_v[n - 1]
        cnb[g, 2, lane] = of_nb[n - 1]
        if n > 1:
            rows = 6 + 6 * np.arange(n - 1)   # 3 + 6*(t-1) + 3, t=1..n-1
            rev = np.arange(n - 2, -1, -1)    # i = n-1-t
            cval[g, rows, lane] = ll_v[rev]
            cnb[g, rows, lane] = ll_nb[rev]
            cval[g, rows + 1, lane] = ml_v[rev]
            cnb[g, rows + 1, lane] = ml_nb[rev]
            cval[g, rows + 2, lane] = of_v[rev]
            cnb[g, rows + 2, lane] = of_nb[rev]
        fb = 3 + 6 * (T - 1)
        cnb[g, fb, lane] = b["ml_tab"][3]
        cnb[g, fb + 1, lane] = b["of_tab"][3]
        cnb[g, fb + 2, lane] = b["ll_tab"][3]
        cval[g, fb + 3, lane] = 1   # stream terminator bit
        cnb[g, fb + 3, lane] = 1
    # static word capacity: per-lane host-known bits (extras + flush +
    # terminator are prefilled in cnb) + a 9-bit/state bound for the
    # device-computed state chunks, bucketed for compile-count
    host_bits = cnb.sum(axis=1)                       # (nbat, L)
    state_bound = 27 * np.maximum(nseq[:, 0, :] - 1, 0)
    max_bits = int((host_bits + state_bound).max())
    W = -(-max_bits // 32)
    W = -(-W // 128) * 128
    call = _fse_call(nbat, T, W, interpret)
    words, bits = call(jnp.asarray(sym), jnp.asarray(tabs),
                       jnp.asarray(nseq), jnp.asarray(cval),
                       jnp.asarray(cnb))
    words = np.ascontiguousarray(np.asarray(words))
    bits = np.asarray(bits)
    for j, bi in enumerate(idx):
        g, lane = divmod(j, Lb)
        nbits = int(bits[g, 0, lane])
        nbytes = (nbits + 7) // 8
        out[bi] = words[g, :, lane].astype("<u4").tobytes()[:nbytes]
    return out


def _chan_prep(syms, default_norm, default_log, max_log):
    """-> (mode, header_bytes, (dnb, dfs, stt, tlog)) for one channel.
    syms: plain code array (vectorized — no per-sequence python pairs)."""
    from .sequences import _channel_plan_syms, _RleEncoder

    mode, hdr, fac = _channel_plan_syms(syms, default_norm, default_log,
                                        max_log)
    enc = fac()
    if isinstance(enc, _RleEncoder):
        z = np.zeros(1, np.int64)
        return mode, hdr, (z, z, np.zeros(1, np.int64), 0)
    return mode, hdr, (np.asarray(enc.dnb, np.int64),
                       np.asarray(enc.dfs, np.int64),
                       np.asarray(enc.state_table, np.int64),
                       enc.table_log)


def prep_block(seqs, reps=(1, 4, 8)):
    """Mirror encode_sequences up to (but excluding) the bitstream:
    returns (prefix_bytes, prep_dict) — prefix = nseq header + SCM byte +
    NCount descriptions; prep_dict feeds encode_seq_bitstreams_device.

    Fully vectorized host prep (VERDICT r4 item 6): seqs may be a list of
    (ll, offset_value, ml) tuples or an (n, 3) array; the only sequential
    piece — the repeat-offset register chain — runs in native C++
    (stn_recode_reps_enc), everything else is numpy array math. The
    round-4 measurement had this loop at 872 ms vs a 454 ms device step;
    vectorized it is O(nseq) numpy + one native call."""
    from ..native import lib
    from .sequences import (LL_DEFAULT, LL_LOG, ML_DEFAULT, ML_LOG,
                            OF_DEFAULT, OF_LOG, _recode_repeat_offsets)

    arr = np.asarray(seqs, np.int64).reshape(-1, 3)
    n = len(arr)
    out = bytearray()
    if n < 128:
        out.append(n)
    elif n < 0x7F00:
        out.append((n >> 8) + 128)
        out.append(n & 255)
    else:
        out += bytes([255, (n - 0x7F00) & 255, (n - 0x7F00) >> 8])
    if n == 0:
        return bytes(out), None

    lls = arr[:, 0]
    mls = arr[:, 2]
    if lib is not None and hasattr(lib, "recode_reps_enc"):
        ofs = lib.recode_reps_enc(
            lls, arr[:, 1], np.asarray(reps, np.int64).copy())
        if isinstance(ofs, int):
            raise ValueError(f"bad offset_value stream ({ofs})")
        ofs = ofs.astype(np.int64)
    else:
        recoded, _ = _recode_repeat_offsets(
            [tuple(map(int, t)) for t in arr], reps)
        ofs = np.asarray([s[1] for s in recoded], np.int64)
    ll_sym, ll_nb = _ll_codes_np(lls)
    ml_sym, ml_nb = _ml_codes_np(mls)
    # of_code: code = highbit(offset_value); frexp is exact below 2^53
    of_sym = (np.frexp(ofs.astype(np.float64))[1] - 1).astype(np.int64)
    of_x = ofs - (np.int64(1) << of_sym)
    of_nb = of_sym

    ll_m, ll_h, ll_t = _chan_prep(ll_sym, LL_DEFAULT, LL_LOG, 9)
    of_m, of_h, of_t = _chan_prep(of_sym, OF_DEFAULT, OF_LOG, 8)
    ml_m, ml_h, ml_t = _chan_prep(ml_sym, ML_DEFAULT, ML_LOG, 9)
    out.append((ll_m << 6) | (of_m << 4) | (ml_m << 2))
    out += ll_h + of_h + ml_h

    prep = {
        "nseq": n,
        "ll_sym": ll_sym.astype(np.int32),
        "ml_sym": ml_sym.astype(np.int32),
        "of_sym": of_sym.astype(np.int32),
        "ll_x": (lls.astype(np.int32), ll_nb.astype(np.int32)),
        "ml_x": ((mls - 3).astype(np.int32), ml_nb.astype(np.int32)),
        "of_x": (of_x.astype(np.int32), of_nb.astype(np.int32)),
        "ll_tab": ll_t,
        "ml_tab": ml_t,
        "of_tab": of_t,
    }
    return bytes(out), prep


def _ll_codes_np(lls):
    """Vectorized ll_code: (n,) -> (codes, extra_nbits)."""
    from .sequences import LL_TABLE

    codes = np.where(lls < 16, lls, 0)
    nbs = np.zeros_like(lls)
    big = lls >= 16
    if big.any():
        bases = np.asarray([b for b, _ in LL_TABLE], np.int64)
        nbt = np.asarray([nb for _, nb in LL_TABLE], np.int64)
        ends = bases + (np.int64(1) << nbt)
        idx = np.searchsorted(ends, lls[big], side="right")
        codes[big] = 16 + idx
        nbs[big] = nbt[idx]
    return codes, nbs


def _ml_codes_np(mls):
    """Vectorized ml_code: (n,) -> (codes, extra_nbits)."""
    from .sequences import ML_TABLE

    codes = np.where(mls < 35, mls - 3, 0)
    nbs = np.zeros_like(mls)
    big = mls >= 35
    if big.any():
        bases = np.asarray([b for b, _ in ML_TABLE], np.int64)
        nbt = np.asarray([nb for _, nb in ML_TABLE], np.int64)
        ends = bases + (np.int64(1) << nbt)
        idx = np.searchsorted(ends, mls[big], side="right")
        codes[big] = 32 + idx
        nbs[big] = nbt[idx]
    return codes, nbs


def encode_sequences_device_batch(seq_blocks, reps_list,
                                  interpret: bool = False):
    """Batched device twin of sequences.encode_sequences: seq_blocks is a
    list of sequence lists (or None to skip); reps_list the running
    repeat-offset registers at each block's entry. Returns a list of
    section bytes (byte-identical to the host encoder — tested) with None
    at skipped/out-of-bucket positions (caller falls back to host)."""
    prefixes = [None] * len(seq_blocks)
    preps = [None] * len(seq_blocks)
    for i, (seqs, reps) in enumerate(zip(seq_blocks, reps_list)):
        if seqs is None:
            continue
        prefixes[i], preps[i] = prep_block(seqs, reps)
    streams = encode_seq_bitstreams_device(preps, interpret)
    out = [None] * len(seq_blocks)
    for i, s in enumerate(streams):
        if s is not None:
            out[i] = prefixes[i] + s
        elif prefixes[i] is not None and preps[i] is None:
            out[i] = prefixes[i]  # zero sequences: header only
    return out
