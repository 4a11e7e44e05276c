"""Single-pass Pallas decode kernel: stream -> superblock bytes in VMEM.

Counterpart of encode_pallas.py for method-BLOCK payloads
(block_decompress_sse, block_compress.h:2088-2175 — redesigned, not
translated). Two index modes feed the same byte-moving stages:

  explicit  — the host C++ parser (stn_parse_rows*) walks the header bytes
              and emits, per plane, a start offset and 16 packed row
              records (rel | hdr<<10 | min<<14).
  derive    — the kernel receives ONLY plane offsets (with the 2-bit plane
              code packed in bits 24-25) and derives the row records from
              the stream's own header bytes in VMEM: header nibbles from
              the first 8 window bytes, mins from the (plain or
              RLE-decoded) mins section, row offsets by a 16-step chain
              with dynamic mask reads for RLE rows. This shrinks a
              container's random-access index from 3 B per (row, plane)
              record (18.75% of raw) to plane offsets only (1.6%).

Stages (all bpp, 1..16):

  1. plane-window fetch: each plane's payload (<= 314 B) is gathered as four
     128-byte rows via a one-hot bf16 matmul on the MXU (exact for bytes)
     and aligned with a variable lane-rotate (7 conditional rolls) — no
     element gathers, which XLA lowers to ~0.05 GB/s on TPU.
  2. row expansion: within each 512-byte plane window, rows move to fixed
     24-byte slots by an order-preserving log-shift (the mirror image of the
     encoder's compaction; same collision-freedom argument).
  3. dense reconstruction: bit-unpack / RLE fill-left / delta prefix-sums as
     pure VPU math, the cross-row carry as a 16-step affine chain.
  4. regroup: planes -> LE32 words of the natural byte order (free shifts),
     one int32 transpose back. plane_order 'bj' = stream order
     (p = block*bpp + plane, the host parser contract); 'jb' = encoder
     order (p = plane*nb + block, what encode_slabs_index emits natively —
     avoids minor-dim XLA transposes between the kernels).

Bit-exactness enforced by tests/test_decode_pallas.py.
"""

from functools import lru_cache

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WROW = 18   # per-row window slot (max row payload: RLE mask 2 + 16 bytes)
WPLANE = 512  # gathered plane window (4 x 128; coverage >= 385 > 282 max)
WEXP = 320    # stage-2 working rows: DOFF + 16*WROW = 320 <= coverage


def _iota(shape, dim):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim)


def _cumsum_mid(v, n=16):
    k = 1
    mid = _iota(v.shape, 1)
    while k < n:
        t = pltpu.roll(v, k, axis=1)
        v = v + jnp.where(mid >= k, t, 0)
        k <<= 1
    return v


_PACK_MAPS = {}


def _pack_maps(b):
    if b not in _PACK_MAPS:
        ks = np.arange(2 * b)
        ms = np.arange(8)
        g = ks // b
        kk = ks % b
        bit = kk[:, None] * 8 + ms[None, :]
        j = g[:, None] * 8 + bit // b
        p = bit % b
        inv_byte = np.zeros((16, b), np.int64)
        inv_bit = np.zeros((16, b), np.int64)
        for k in range(2 * b):
            for m in range(8):
                inv_byte[j[k, m], p[k, m]] = k
                inv_bit[j[k, m], p[k, m]] = m
        _PACK_MAPS[b] = (j, p, inv_byte, inv_bit)
    return _PACK_MAPS[b]


def _roll_rows(v, k):
    """Shift rows DOWN by k along axis 0 with zero fill (row i <- row i-k)."""
    rolled = pltpu.roll(v, k, axis=0)
    return jnp.where(_iota(v.shape, 0) < k, 0, rolled)


def _cumsum_rows(v):
    """Inclusive prefix sum along axis 0 (log-step rolls; n rows)."""
    n = v.shape[0]
    k = 1
    while k < n:
        v = v + _roll_rows(v, k)
        k <<= 1
    return v


def _fill_left_rows(values, have):
    """Propagate the nearest HAVE value upward-to-downward along axis 0
    (row r takes the closest row <= r with have=1; zero seed)."""
    v = values
    hv = have
    k = 1
    while k < values.shape[0]:
        pv = _roll_rows(v, k)
        ph = _roll_rows(hv, k)
        v = jnp.where(hv == 1, v, jnp.where(ph == 1, pv, v))
        hv = hv | ph
        k <<= 1
    return v, hv


def _popcount16(m):
    m = (m & 0x5555) + ((m >> 1) & 0x5555)
    m = (m & 0x3333) + ((m >> 2) & 0x3333)
    m = (m & 0x0F0F) + ((m >> 4) & 0x0F0F)
    return (m & 0x00FF) + ((m >> 8) & 0x00FF)


def make_decode_kernel(bpp: int, nb: int, R: int, derive: bool = False,
                       plane_order: str = "bj"):
    """Kernel body. P = nb*bpp planes; vbuf is (R, 128) payload rows."""
    P = nb * bpp
    Sw = 64 * bpp  # output words per block

    def derive_records(wt, code):
        """Row records from the stream's own bytes (parse_plane_rows_packed
        semantics, stenos_native.cpp:1071-1112). wt: (WPLANE, P) window
        transposed; code: (1, P) plane code 0..3.
        Returns (rel, hdr, minv), each (16, P)."""
        rows16 = _iota((16, P), 0)
        # header nibbles from window bytes 0..7 (NORMAL planes)
        hb = wt[0:8]                      # (8, P)
        h_nib = jnp.stack([hb & 15, (hb >> 4) & 15], axis=1).reshape(16, P)
        hdr = jnp.where(code == 0, 0, jnp.where(code == 1, 15, h_nib))

        # ---- mins section ------------------------------------------------
        el = (h_nib != 6) & (h_nib != 7) & (h_nib != 15)
        eli = el.astype(jnp.int32)
        el_excl = _cumsum_rows(eli) - eli  # #eligible before row r
        n_el = jnp.sum(eli, axis=0, keepdims=True)  # (1, P)
        ms_plain = wt[8:24]               # (16, P) plain mins candidates
        mins_plain = jnp.zeros((16, P), jnp.int32)
        for k in range(16):
            mins_plain = jnp.where(el & (el_excl == k), ms_plain[k : k + 1],
                                   mins_plain)
        # RLE-coded mins (code 3): 2-byte mask at 8, literals follow;
        # bit r set -> copy previous (seed 0), else next literal
        mmask = wt[8:9] | (wt[9:10] << 8)          # (1, P)
        mbit = (mmask >> rows16) & 1               # (16, P)
        is_lit = mbit == 0
        liti = is_lit.astype(jnp.int32)
        lit_excl = _cumsum_rows(liti) - liti
        n_lit = jnp.sum(liti, axis=0, keepdims=True)
        lits = wt[10:26]                           # (16, P)
        placed = jnp.zeros((16, P), jnp.int32)
        for k in range(16):
            placed = jnp.where(is_lit & (lit_excl == k), lits[k : k + 1],
                               placed)
        mins_rle, _ = _fill_left_rows(placed, liti)
        mins_n = jnp.where(code == 3, mins_rle, mins_plain)
        minv = jnp.where(code == 0, wt[0:1],       # ALL_SAME: payload byte
                         jnp.where(code == 1, 0, mins_n))

        # ---- rel chain ---------------------------------------------------
        base = jnp.where(code == 3, 10 + n_lit, 8 + n_el)  # (1, P)
        # static per-header sizes; RLE rows (6/7) resolved by mask reads
        lut = jnp.where(h_nib == 15, 16,
                        jnp.where(h_nib >= 8, 2 * (h_nib - 8), 2 * h_nib))
        is_rle_row = (h_nib == 6) | (h_nib == 7)
        # masks live at rel <= 8 + 18 + 15*16 + 16 = 282: slicing the
        # window to 304 rows cuts the 16-step chain's reduction cost ~40%
        WCH = 304
        wch = wt[:WCH]
        sub = _iota((WCH, P), 0)
        rel_rows = []
        rel = base
        for r in range(16):
            rel_rows.append(rel)
            # dynamic 2-byte read at rel (the RLE mask); uniform lane work
            m0 = sub == rel
            m1 = sub == rel + 1
            b0 = jnp.sum(jnp.where(m0, wch, 0), axis=0, keepdims=True)
            b1 = jnp.sum(jnp.where(m1, wch, 0), axis=0, keepdims=True)
            rmask = b0 | (b1 << 8)
            rle_sz = 2 + 16 - _popcount16(rmask)
            sz = jnp.where(is_rle_row[r : r + 1], rle_sz, lut[r : r + 1])
            rel = rel + sz
        rel_n = jnp.concatenate(rel_rows, axis=0)  # (16, P)
        rel = jnp.where(code == 0, 1,
                        jnp.where(code == 1, rows16 * 16, rel_n))
        return rel, hdr, minv

    def kernel(vb_ref, po_ref, *refs):
        out_ref = refs[-1]
        po_packed = po_ref[0]  # (1, P) offsets (derive: | code << 24)
        po = po_packed & 0xFFFFFF

        # ---- 1. plane windows: MXU one-hot row gather + lane rotate ------
        poc = po.T  # (P, 1)
        ridx = (poc >> 7)[:, :, None] + _iota((P, 1, 4), 2)  # (P, 1, 4)
        ridx = jnp.minimum(ridx, R - 1)
        oh3 = (_iota((P, 4, R), 2)
               == ridx.reshape(P, 4)[:, :, None])  # (P, 4, R)
        onehot = oh3.reshape(P * 4, R).astype(jnp.bfloat16)
        # bytes are exact in bf16; Mosaic lacks a u8->bf16 cast, hop via i32
        vbf = vb_ref[0].astype(jnp.int32).astype(jnp.bfloat16)  # (R, 128)
        g = jax.lax.dot_general(
            onehot, vbf, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        win = g.astype(jnp.int32).reshape(P, WPLANE)
        rot = poc & 127  # (P, 1)
        for k in range(7):
            bit = 1 << k
            rolled = pltpu.roll(win, WPLANE - bit, axis=1)
            win = jnp.where((rot & bit) != 0, rolled, win)

        # every byte the expansion/derivation touches sits below WEXP=320
        # (max plane span 282, dest slots end at 320): slicing before the
        # transpose cuts the per-stage tensor cost by ~40%
        wt = win[:, :WEXP].T  # (WEXP, P)

        # ---- row records: derived in-kernel or from the parser's rowtab --
        if derive:
            code = (po_packed >> 24) & 3  # (1, P)
            rel, hdr, minv = derive_records(wt, code)
        else:
            rt = refs[0][0]   # (16, P) packed rel | hdr<<10 | min<<14
            rel = rt & 1023
            hdr = (rt >> 10) & 15
            minv = (rt >> 14) & 255

        # ---- 2. row expansion: (P, 320) -> 16 x 18-byte slots ------------
        j = _iota((WEXP, P), 0)
        owner = jnp.full((WEXP, P), -1, jnp.int32)
        start_of = jnp.zeros((WEXP, P), jnp.int32)
        for r in range(16):
            relr = rel[r : r + 1, :]  # (1, P)
            started = j >= relr
            owner = owner + started.astype(jnp.int32)
            start_of = jnp.where(started, relr, start_of)
        inwin = j - start_of
        ok = (owner >= 0) & (inwin < WROW)
        # dest slots live INSIDE the working window at offset DOFF: row r's
        # bytes all get shift = DOFF + WROW*r - rel_r, which is >= 6 (rel_r
        # <= 26 + 16r) and non-decreasing across rows (row payloads are
        # <= 16 < WROW bytes) — collision-freedom as in ops/compact.py
        DOFF = 32
        dest = DOFF + owner * WROW + inwin
        shift = jnp.where(ok, dest - j, 0)
        w = jnp.where(ok, (wt & 255) | (shift << 8) | (1 << 30), 0)
        sub = _iota((WEXP, P), 0)
        K = (DOFF + 16 * WROW - 1).bit_length()
        for k in reversed(range(K)):
            step = 1 << k
            moved = pltpu.roll(w, step, axis=0)
            moved = jnp.where(sub < step, 0, moved)
            arrive = (moved != 0) & ((((moved >> 8) >> k) & 1) == 1)
            stay = (w != 0) & ((((w >> 8) >> k) & 1) == 0)
            w = jnp.where(arrive, moved - (step << 8),
                          jnp.where(stay, w, 0))
        W3 = (w[DOFF : DOFF + 16 * WROW] & 255).reshape(16, WROW, P)

        # ---- 3. dense reconstruction (mirrors engine_jax._decode_rows_body)
        h = hdr[:, None, :]  # (16, 1, P) per-row header
        mins = minv[:, None, :]

        # RLE: mask -> literal placement + fill-left
        rmask = W3[:, 0, :] | (W3[:, 1, :] << 8)  # (16, P)
        rbit = (rmask[:, None, :] >> _iota((16, 16, P), 1)) & 1
        lit = rbit == 0
        litc = _cumsum_mid(lit.astype(jnp.int32))
        kept = jnp.concatenate(
            [W3[:, 2 + t, :][:, None, :] for t in range(16)], axis=1)
        placed = _expand_literals_mid(kept, lit, litc)
        rle_vals, have = _fill_left_mid(placed, lit)
        rle_bflag = (~have).astype(jnp.int32)

        # bit-packed values
        bitpack = ((h >= 1) & (h <= 5)) | ((h >= 9) & (h <= 14))
        bwidth = jnp.where(bitpack, h % 8, 0)
        vals = jnp.zeros((16, 16, P), jnp.int32)
        for b in range(1, 7):
            _, _, inv_byte, inv_bit = _pack_maps(b)
            cols = []
            for c in range(16):
                v = jnp.zeros((16, P), jnp.int32)
                for q in range(b):
                    v = v | (((W3[:, int(inv_byte[c, q]), :]
                               >> int(inv_bit[c, q])) & 1) << q)
                cols.append(v[:, None, :])
            vals = jnp.where(bwidth == b, jnp.concatenate(cols, axis=1), vals)

        direct_a = (vals + mins) & 255
        delta_a = _cumsum_mid(vals + mins) & 255
        drle_a = _cumsum_mid(rle_vals) & 255
        raw16 = jnp.concatenate(
            [W3[:, t, :][:, None, :] for t in range(16)], axis=1)
        a = jnp.where(h == 15, raw16, direct_a)
        a = jnp.where((h >= 8) & (h <= 14), delta_a, a)
        a = jnp.where(h == 6, drle_a, a)
        a = jnp.where(h == 7, rle_vals, a)
        bflag = jnp.zeros((16, 16, P), jnp.int32)
        bflag = jnp.where((h >= 8) & (h <= 14), 1, bflag)
        bflag = jnp.where(h == 6, 1, bflag)
        bflag = jnp.where(h == 7, rle_bflag, bflag)

        # affine cross-row chain: out = a + bflag * prev_last (mod 256)
        a15 = a[:, 15, :]        # (16, P)
        bf15 = bflag[:, 15, :]   # (16, P)
        pls = [jnp.zeros((1, P), jnp.int32)]
        for r in range(15):
            nxt = (a15[r : r + 1, :] + bf15[r : r + 1, :] * pls[-1]) & 255
            pls.append(nxt)
        plmat = jnp.concatenate(
            [p.reshape(1, 1, P) for p in pls], axis=0)  # (16, 1, P)
        planes = (a + bflag * plmat) & 255  # (16, 16, P)

        # ---- 4. regroup planes -> natural-order LE32 words (any bpp) -----
        # Keep bpp out of the LANE-minor position at every step (a (..., 4)
        # lane dim pads 32x and blew scoped VMEM); bpp only ever appears as
        # a sublane-adjacent axis (pads to 8 at worst).
        flat = planes.reshape(256, P).T          # (P, 256)
        if plane_order == "jb":
            # encoder-native ordering p = plane*nb + block: no transpose
            pb = flat.reshape(bpp, nb, 256)
        else:
            p3 = flat.reshape(nb, bpp, 256)
            pb = jnp.transpose(p3, (1, 0, 2))    # (bpp, nb, 256)
        pc = jnp.transpose(pb, (0, 2, 1))        # (bpp, 256, nb)
        nat = jnp.transpose(pc, (1, 0, 2))       # (256, bpp, nb)
        x_nat = nat.reshape(256 * bpp, nb)       # natural bytes (s, b)
        v4 = x_nat.reshape(64 * bpp, 4, nb)
        wds = (v4[:, 0, :] | (v4[:, 1, :] << 8) | (v4[:, 2, :] << 16)
               | (v4[:, 3, :] << 24))            # (Sw, nb)
        out_ref[0] = wds.T

    return kernel


def _expand_literals_mid(kept, lit, litc):
    """Spread consecutive kept bytes to literal positions along axis=1."""
    pos = _iota(kept.shape, 1)
    shift = jnp.where(lit, pos - (litc - 1), 0)
    # compact destination shifts to the source side (16-wide, along mid)
    keep = lit.astype(jnp.int32)
    incl = _cumsum_mid(keep)
    cshift = jnp.where(lit, pos - (incl - 1), 0)
    wsh = jnp.where(lit, (shift & 0xFFFF) | (cshift << 16) | (1 << 30), 0)
    n = 16
    for k in (1, 2, 4, 8):
        moved = pltpu.roll(wsh, n - k, axis=1)
        moved = jnp.where(pos < n - k, moved, 0)
        arrive = (moved != 0) & ((((moved >> 16) >> _lg(k)) & 1) == 1)
        stay = (wsh != 0) & ((((wsh >> 16) >> _lg(k)) & 1) == 0)
        wsh = jnp.where(arrive, moved - (k << 16), jnp.where(stay, wsh, 0))
    dshift = wsh & 0xFFFF  # shift for kept byte t, at mid position t
    nlit = _cumsum_mid(lit.astype(jnp.int32))[:, 15:16, :]
    valid = pos < nlit
    w = jnp.where(valid, (kept & 255) | (dshift << 8) | (1 << 30), 0)
    for k in reversed((1, 2, 4, 8)):
        moved = pltpu.roll(w, k, axis=1)
        moved = jnp.where(pos < k, 0, moved)
        arrive = (moved != 0) & ((((moved >> 8) >> _lg(k)) & 1) == 1)
        stay = (w != 0) & ((((w >> 8) >> _lg(k)) & 1) == 0)
        w = jnp.where(arrive, moved - (k << 8), jnp.where(stay, w, 0))
    return w & 255


def _fill_left_mid(values, have):
    """Propagate nearest value to the LEFT along axis=1 into empty lanes.

    `have` is carried as int32 — Mosaic cannot roll i1 vectors."""
    v = values
    hv = have.astype(jnp.int32)
    pos = _iota(values.shape, 1)
    k = 1
    while k < 16:
        pv = pltpu.roll(v, k, axis=1)
        ph = pltpu.roll(hv, k, axis=1)
        ph = jnp.where(pos < k, 0, ph)
        v = jnp.where(hv == 1, v, jnp.where(ph == 1, pv, v))
        hv = hv | ph
        k <<= 1
    return v, hv == 1


def _lg(k):
    return k.bit_length() - 1


@lru_cache(maxsize=64)
def _build_call(n_sb: int, bpp: int, nb: int, R: int, interpret: bool,
                derive: bool = False, plane_order: str = "bj"):
    kernel = make_decode_kernel(bpp, nb, R, derive, plane_order)
    P = nb * bpp
    Sw = 64 * bpp
    in_specs = [
        pl.BlockSpec((1, R, 128), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, P), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if not derive:
        in_specs.append(pl.BlockSpec((1, 16, P), lambda i: (i, 0, 0),
                                     memory_space=pltpu.VMEM))
    return pl.pallas_call(
        kernel,
        grid=(n_sb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, nb, Sw), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_sb, nb, Sw), jnp.int32),
        interpret=interpret,
    )


from functools import partial


@partial(jax.jit, static_argnames=("bpp", "nb", "interpret"))
def decode_slabs_jit(vbufs, plane_off, rowtab, bpp: int, nb: int,
                     interpret: bool = False):
    return decode_slabs_body(vbufs, plane_off, rowtab, bpp, nb, interpret)


def _nb_pad_dec(nb: int) -> int | None:
    """Mirror of encode_pallas._nb_pad for the decode kernels: odd sublane
    counts are padded to even by REPLICATING the last block's index entries
    (the duplicate block re-decodes real data and is sliced off), so P and
    nb stay Mosaic-friendly. STENOS_NB_PAD=0 disables."""
    import os

    if os.environ.get("STENOS_NB_PAD", "1") in ("0", "false"):
        return None
    if nb > 1 and nb % 2:
        return nb + 1
    return None


def decode_slabs_body(vbufs, plane_off, rowtab, bpp: int, nb: int,
                      interpret: bool = False):
    """vbufs (n_sb, R*128) uint8 virtual payloads; plane_off (n_sb, P) i32;
    rowtab (n_sb, 16, P) i32 packed rel|hdr<<10|min<<14.
    Returns (n_sb, nb*256*bpp) decoded bytes as an int32 word view
    (n_sb, nb, 64*bpp) — callers .view(uint8) on the host."""
    n_sb = vbufs.shape[0]
    R = vbufs.shape[1] // 128
    nbp = _nb_pad_dec(nb)
    if nbp is not None:
        # 'bj' order (p = block*bpp + plane): replicate the last block
        po = plane_off.reshape(n_sb, nb, bpp)
        po = jnp.concatenate([po, po[:, -1:, :]], axis=1)
        rt = rowtab.reshape(n_sb, 16, nb, bpp)
        rt = jnp.concatenate([rt, rt[:, :, -1:, :]], axis=2)
        call = _build_call(n_sb, bpp, nbp, R, interpret)
        out = call(vbufs.reshape(n_sb, R, 128),
                   po.reshape(n_sb, 1, nbp * bpp),
                   rt.reshape(n_sb, 16, nbp * bpp))
        return out[:, :nb]
    call = _build_call(n_sb, bpp, nb, R, interpret)
    return call(
        vbufs.reshape(n_sb, R, 128),
        plane_off.reshape(n_sb, 1, nb * bpp),
        rowtab,
    )


@partial(jax.jit, static_argnames=("bpp", "nb", "plane_order", "interpret"))
def decode_slabs_derive_jit(vbufs, plane_off, bpp: int, nb: int,
                            plane_order: str = "bj",
                            interpret: bool = False):
    return decode_slabs_derive_body(vbufs, plane_off, bpp, nb, plane_order,
                                    interpret)


def decode_slabs_derive_body(vbufs, plane_off, bpp: int, nb: int,
                             plane_order: str = "bj",
                             interpret: bool = False):
    """Derive-index decode: plane_off (n_sb, P) i32 packed off | code<<24;
    the kernel reconstructs the row records from the stream bytes — no
    rowtab sidecar. plane_order: 'bj' (host parser / stream order) or 'jb'
    (encoder order, p = plane*nb + block)."""
    n_sb = vbufs.shape[0]
    R = vbufs.shape[1] // 128
    nbp = _nb_pad_dec(nb)
    if nbp is not None:
        if plane_order == "jb":
            po = plane_off.reshape(n_sb, bpp, nb)
            po = jnp.concatenate([po, po[:, :, -1:]], axis=2)
        else:
            po3 = plane_off.reshape(n_sb, nb, bpp)
            po = jnp.concatenate([po3, po3[:, -1:, :]], axis=1)
        call = _build_call(n_sb, bpp, nbp, R, interpret, True, plane_order)
        out = call(vbufs.reshape(n_sb, R, 128),
                   po.reshape(n_sb, 1, nbp * bpp))
        return out[:, :nb]
    call = _build_call(n_sb, bpp, nb, R, interpret, True, plane_order)
    return call(
        vbufs.reshape(n_sb, R, 128),
        plane_off.reshape(n_sb, 1, nb * bpp),
    )
