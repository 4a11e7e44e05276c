"""Single-pass Pallas encode kernel: analysis + emission + compaction in VMEM.

The XLA pipeline in engine_jax.py materializes every stage to HBM and keeps
tensors in (..., 16, 16) shapes whose minor dim of 16 wastes 7/8 of each
128-wide vector tile. This kernel is the TPU-native formulation: one grid
step per superblock, blocks of the superblock mapped to the LANE axis, all of
analysis (find_pack_bits_params, block_compress.h:385-535), section emission
(encode16x16_generic, block_compress.h:739-806) and the order-preserving
log-shift compaction executed in VMEM with zero HBM round-trips between
stages.

Layout per superblock (bpp, nb = blocks/superblock):
  input  (nb, 64*bpp) int32      the superblock's natural bytes as LE32
                                 words (a free host/device view); the
                                 byte-plane split to X (bpp*256, nb) happens
                                 in-kernel (shifts + Mosaic transposes)
  scratch S' (V, nb) int32       per-block padded section layout: position q
                                 of block b holds value | valid<<8; static
                                 section offsets (hdr4 | block hdr | per plane
                                 headA(8) minsec(18) rows(16x18))
  stream W (nb, V)               = S'.T; flat row-major order IS the stream
                                 order; exclusive prefix-sum of valid gives
                                 compaction targets; K=ceil(log2(nb*V))
                                 masked-roll stages move every byte home.

Output rows are [method(1) csize(3) payload...] — the exact superblock record
of the frame format (stenos.cpp:591-602), so the frame assembler can DMA them
in place without any further host pass.

Bit-exactness: reproduces codec/analyze.py + codec/emit.py (themselves
bit-exact vs the C++ reference) — enforced by tests/test_encode_pallas.py.
"""

from functools import lru_cache, partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import RAW_DIFF

PLANE_SPAN = 314  # 8 headA + 18 minsec + 16*18 rows


def _iota(shape, dim):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim)


def _width_of(v):
    """bit_length with 7 bumped to 8 (block_compress.h:334-352)."""
    w = jnp.zeros_like(v)
    for b in range(1, 9):
        w = jnp.where(v >= (1 << (b - 1)), b, w)
    return jnp.where(w == 7, 8, w)


def _cumsum_mid(v, n=16):
    """Inclusive cumsum along axis=1 of (A, n, nb) via masked doubling rolls."""
    k = 1
    mid = _iota(v.shape, 1)
    while k < n:
        t = pltpu.roll(v, k, axis=1)
        v = v + jnp.where(mid >= k, t, 0)
        k <<= 1
    return v


def _sum_mid(v):
    return jnp.sum(v, axis=1)


def _mask16_mid(eq):
    """(A, 16, nb) bits -> (A, nb) LE16 mask."""
    w = 1 << _iota(eq.shape, 1)
    return _sum_mid(eq.astype(jnp.int32) * w)


def _compact16_mid(vals, keep):
    """Order-preserving front-pack of kept lanes along axis=1 (16)."""
    keep = keep.astype(jnp.int32)
    incl = _cumsum_mid(keep)
    pos = _iota(vals.shape, 1)
    shift = jnp.where(keep.astype(bool), pos - (incl - 1), 0)
    w = jnp.where(keep.astype(bool),
                  (vals & 255) | (shift << 8) | (1 << 30), 0)
    n = vals.shape[1]
    for k in (1, 2, 4, 8):
        if k >= n:
            break
        moved = pltpu.roll(w, n - k, axis=1)
        moved = jnp.where(pos < n - k, moved, 0)
        arrive = (moved != 0) & ((((moved >> 8) >> _log2(k)) & 1) == 1)
        stay = (w != 0) & ((((w >> 8) >> _log2(k)) & 1) == 0)
        w = jnp.where(arrive, moved - (k << 8), jnp.where(stay, w, 0))
    return w & 255


def _log2(k):
    return k.bit_length() - 1


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
        _PACK_MAPS[b] = (j, p)
    return _PACK_MAPS[b]


def _pack16_mid(v, b):
    """(G, 16, nb) values at width b -> (G, 2b, nb) bytes (write_16 layout)."""
    j, p = _pack_maps(b)
    outs = []
    for k in range(2 * b):
        byte = jnp.zeros(v.shape[:1] + v.shape[2:], jnp.int32)
        for m in range(8):
            byte = byte | (((v[:, int(j[k, m]), :] >> int(p[k, m])) & 1) << m)
        outs.append(byte.reshape(v.shape[0], 1, v.shape[2]))
    return jnp.concatenate(outs, axis=1)


def _roll2_18(body16, b0, b1):
    """[b0, b1, body16...] as an (A, 18, nb) tensor."""
    z2 = jnp.zeros(body16.shape[:1] + (2,) + body16.shape[2:], jnp.int32)
    v18 = jnp.concatenate([body16, z2], axis=1)
    rolled = pltpu.roll(v18, 2, axis=1)
    mid = _iota(v18.shape, 1)
    out = jnp.where(mid == 0, b0[:, None, :], rolled)
    return jnp.where(mid == 1, b1[:, None, :], out)


def _flat_roll_left(w, step, V, nb):
    """Roll (nb, V) left by `step` along flat row-major order, zero-fill."""
    u, t = divmod(step, V)
    sub = _iota(w.shape, 0)
    lane = _iota(w.shape, 1)

    def rows_up(x, n):
        if n == 0:
            return x
        if n >= nb:
            return jnp.zeros_like(x)
        x = pltpu.roll(x, nb - n, axis=0)
        return jnp.where(sub < nb - n, x, 0)

    if t == 0:
        return rows_up(w, u)
    A = rows_up(w, u)
    B = rows_up(w, u + 1)
    At = pltpu.roll(A, V - t, axis=1)
    Bt = pltpu.roll(B, V - t, axis=1)
    return jnp.where(lane < V - t, At, Bt)


def _lane_cumsum(v, V):
    """Inclusive cumsum along axis=1 (V lanes) via masked doubling rolls."""
    lane = _iota(v.shape, 1)
    k = 1
    while k < V:
        t = pltpu.roll(v, k, axis=1)
        v = v + jnp.where(lane >= k, t, 0)
        k <<= 1
    return v


def _sub_cumsum(v, n):
    """Inclusive cumsum along axis=0 (n sublanes)."""
    sub = _iota(v.shape, 0)
    k = 1
    while k < n:
        t = pltpu.roll(v, k, axis=0)
        v = v + jnp.where(sub >= k, t, 0)
        k <<= 1
    return v


def make_encode_kernel(bpp: int, nb: int, block_level: int,
                       mode: str = "xposed", with_index: bool = False,
                       nb_real: int | None = None, Gb: int = 1):
    """Kernel body (closure over static config).

    nb_real: when set (< nb), lanes [nb_real, nb) are zero-filled dummy
    blocks whose emission is fully masked (their valid bits are zeroed), so
    the compacted stream is byte-identical to an nb_real-lane kernel. Used
    to pad awkward odd sublane counts (e.g. bpp=13's nb=39, the nb=147
    shape) up to even ones that Mosaic lays out without exploding.

    mode='words': input block is (1, nb, 64*bpp) int32 — the superblock's
    natural bytes viewed as little-endian 32-bit words (a FREE host/device
    view; a 256-element block is always a whole number of words, any bpp).
    The byte-plane split costs one in-VMEM int32 transpose, shifts, and a
    Mosaic-native leading-axes transpose — replacing the XLA byte transpose
    that dominated the runtime (~29 ms of 30 ms for 16 MB).
    mode='xposed': input is the (1, bpp*256, nb) uint8 pre-transposed plane
    layout (kept for reference/debugging).
    """
    S = bpp * 256
    G = bpp * 16
    hdr_w = (bpp + 1) // 2
    span_real = 4 + hdr_w + bpp * PLANE_SPAN
    V = -(-span_real // 128) * 128
    has_rle = block_level >= 1
    target = 256 - RAW_DIFF[block_level]
    K = max(1, (nb * V - 1).bit_length())
    import os as _os  # ablation knob: clamp compaction stages (timing only,
    # output WRONG when clamped below the real K — never set in production)
    K = min(K, int(_os.environ.get("STENOS_ENC_KMAX", "99")))

    def build_X_from_words(words):
        """words (nb, 64*bpp) int32 (natural LE32 view of the superblock)
        -> X (S, nb) plane-major bytes, for ANY bpp: one int32 transpose,
        free byte shifts, and a leading-axes transpose (Mosaic-native)."""
        Wt = words.T  # (Sw = 64*bpp, nb)
        n = Wt.shape[-1]
        Sw = 64 * bpp
        planes4 = jnp.concatenate(
            [((Wt >> (8 * j)) & 255)[:, None, :] for j in range(4)], axis=1)
        x_nat = planes4.reshape(4 * Sw, n)  # natural byte order (rc*bpp + j)
        xpm = x_nat.reshape(256, bpp, n).transpose(1, 0, 2)
        return xpm.reshape(S, n)

    def _one(g, t_ref, out_ref, bsz_ref, fsz_ref, idx_refs, sp_ref):
        if mode == "words":
            X = build_X_from_words(t_ref[g])  # (S, nb)
        else:
            X = t_ref[g].astype(jnp.int32)  # (S, nb)
        si = _iota((S, nb), 0)
        prev = pltpu.roll(X, 1, axis=0)
        prev = jnp.where(si % 256 == 0, 0, prev)
        d = (X - prev) & 255

        X3 = X.reshape(G, 16, nb)
        d3 = d.reshape(G, 16, nb)
        xs = ((X3 + 128) & 255) - 128
        ds = ((d3 + 128) & 255) - 128
        rng = jnp.max(xs, axis=1) - jnp.min(xs, axis=1)
        rng_d = jnp.max(ds, axis=1) - jnp.min(ds, axis=1)
        mn = jnp.min(xs, axis=1)
        mnd = jnp.min(ds, axis=1)

        bits0 = _width_of(rng)
        bits0 = jnp.where(bits0 == 6, 8, bits0)  # 6 reserved for delta-RLE
        bits1 = _width_of(rng_d)
        bits = jnp.minimum(bits0, bits1)
        t0 = bits0 == bits  # direct wins ties
        minbytes = jnp.where(t0, mn, mnd) & 255
        sizes = 2 * bits + (bits != 8).astype(jnp.int32)

        eq3 = (X == prev).reshape(G, 16, nb)
        dprev = pltpu.roll(d, 1, axis=0)
        dprev = jnp.where(si % 16 == 0, 0, dprev)
        deq3 = (d == dprev).reshape(G, 16, nb)

        if has_rle:
            rle_size = (16 - _sum_mid(eq3.astype(jnp.int32))) + 2
            use_rle = rle_size < sizes
            sizes = jnp.minimum(sizes, rle_size)
            drle_size = (16 - _sum_mid(deq3.astype(jnp.int32))) + 2
            use_drle = drle_size < sizes
            sizes = jnp.minimum(sizes, drle_size)
        else:
            use_rle = jnp.zeros(bits.shape, bool)
            use_drle = use_rle
        all_rle = use_rle | use_drle

        h_direct = jnp.where(bits0 == 8, 15, bits0)
        h_delta = jnp.where(bits1 == 8, 7, bits1) + 8
        h = jnp.where(t0, h_direct, h_delta)
        h = jnp.where(use_rle & ~use_drle, 7, h)
        h = jnp.where(use_drle, 6, h)

        Xp = X.reshape(bpp, 256, nb)
        first = Xp[:, 0:1, :]  # (bpp, 1, nb)
        all_same = jnp.all(Xp == first, axis=1)  # (bpp, nb)

        mb4 = minbytes.reshape(bpp, 16, nb)
        mprev = pltpu.roll(mb4, 1, axis=1)
        mprev = jnp.where(_iota(mb4.shape, 1) == 0, 0, mprev)
        meq = mb4 == mprev

        sizes4 = sizes.reshape(bpp, 16, nb)
        if has_rle:
            bits_8 = (~all_rle) & (bits == 8)
            count8 = (_sum_mid(bits_8.reshape(bpp, 16, nb).astype(jnp.int32))
                      + _sum_mid(all_rle.reshape(bpp, 16, nb)
                                 .astype(jnp.int32)))
            mins_rle_size = (16 - _sum_mid(meq.astype(jnp.int32))) + 2
            normal_rle = mins_rle_size < (16 - count8)
            plane_size = (8 + _sum_mid(sizes4)
                          - jnp.where(normal_rle,
                                      (16 - count8) - mins_rle_size, 0))
            drop = (normal_rle[:, None, :]
                    & ~bits_8.reshape(bpp, 16, nb)
                    & ~all_rle.reshape(bpp, 16, nb))
            sizes4 = sizes4 - drop.astype(jnp.int32)
        else:
            normal_rle = jnp.zeros(all_same.shape, bool)
            plane_size = 8 + _sum_mid(sizes4)

        raw = (~all_same) & (plane_size > target)
        codes = jnp.where(all_same, 0,
                          jnp.where(raw, 1, jnp.where(normal_rle, 3, 2)))
        psizes = jnp.where(all_same, 1, jnp.where(raw, 256, plane_size))
        normal = (codes == 2) | (codes == 3)

        # ---- emission values -------------------------------------------
        h4 = h.reshape(bpp * 8, 2, nb)
        hdr8 = (h4[:, 0, :] | (h4[:, 1, :] << 4)).reshape(bpp, 8, nb)
        midA = _iota((bpp, 8, nb), 1)
        first_col = jnp.where(midA == 0, jnp.broadcast_to(first[:, 0:1, :],
                                                          (bpp, 8, nb)), 0)
        headA = jnp.where((codes == 0)[:, None, :], first_col, hdr8)
        lenA = jnp.where(codes == 0, 1, jnp.where(normal, 8, 0))

        el3 = ((h != 6) & (h != 7) & (h != 15)).reshape(bpp, 16, nb)
        plain16 = _compact16_mid(mb4, el3)
        n_eligible = _sum_mid(el3.astype(jnp.int32))
        mmask = _mask16_mid(meq)
        rle_mins = _compact16_mid(mb4, ~meq)
        n_kept = _sum_mid((~meq).astype(jnp.int32))
        z2p = jnp.zeros((bpp, 2, nb), jnp.int32)
        plainB = jnp.concatenate([plain16, z2p], axis=1)
        rleB = _roll2_18(rle_mins, mmask & 255, mmask >> 8)
        is_rle = codes == 3
        minsec = jnp.where(is_rle[:, None, :], rleB, plainB)
        lenB = jnp.where(normal,
                         jnp.where(is_rle, 2 + n_kept, n_eligible), 0)

        bitpack = ((h >= 1) & (h <= 5)) | ((h >= 9) & (h <= 14))
        b = jnp.where(bitpack, h % 8, 0)
        sub = jnp.where((h < 8)[:, None, :], X3, d3)
        v = (sub - minbytes[:, None, :]) & 255
        out12 = jnp.zeros((G, 12, nb), jnp.int32)
        mid12 = _iota((G, 12, nb), 1)
        for bb in range(1, 7):
            if _os.environ.get("STENOS_ENC_NOPACK") == "1":
                break  # ablation: skip the bit-pack emission (wrong output)
            pk = _pack16_mid(v, bb)  # (G, 2bb, nb)
            if 2 * bb < 12:
                pk = jnp.concatenate(
                    [pk, jnp.zeros((G, 12 - 2 * bb, nb), jnp.int32)], axis=1)
            out12 = jnp.where((b == bb)[:, None, :], pk, out12)
        z6 = jnp.zeros((G, 6, nb), jnp.int32)
        rows18 = jnp.concatenate([out12, z6], axis=1)
        z2g = jnp.zeros((G, 2, nb), jnp.int32)
        rawrows = jnp.concatenate([X3, z2g], axis=1)
        rows18 = jnp.where((h == 15)[:, None, :], rawrows, rows18)
        lenR = 2 * b
        lenR = jnp.where(h == 15, 16, lenR)
        for hh, src3, keepmask in ((7, X3, eq3), (6, d3, deq3)):
            m = _mask16_mid(keepmask)
            body = _compact16_mid(src3, ~keepmask)
            cand = _roll2_18(body, m & 255, m >> 8)
            rows18 = jnp.where((h == hh)[:, None, :], cand, rows18)
            lenR = jnp.where(
                h == hh,
                2 + _sum_mid((~keepmask).astype(jnp.int32)), lenR)
        # plane-level gates: RAW planes emit 16 raw 16-byte chunks; non-normal
        # non-raw planes emit nothing
        code_row = jnp.broadcast_to(codes[:, None, :],
                                    (bpp, 16, nb)).reshape(G, nb)
        normal_row = jnp.broadcast_to(normal[:, None, :],
                                      (bpp, 16, nb)).reshape(G, nb)
        rows18 = jnp.where((code_row == 1)[:, None, :], rawrows, rows18)
        lenR = jnp.where(code_row == 1, 16,
                         jnp.where(normal_row, lenR, 0))

        if nb_real is not None and nb_real < nb:
            # dummy pad lanes emit nothing: zero every per-lane length so
            # packv's valid bits (and hence the flat compaction and csize)
            # exclude them entirely
            okP = _iota((bpp, nb), 1) < nb_real
            okG = _iota((G, nb), 1) < nb_real
            lenA = jnp.where(okP, lenA, 0)
            lenB = jnp.where(okP, lenB, 0)
            lenR = jnp.where(okG, lenR, 0)

        if with_index:
            # decode index emitted AT ENCODE TIME: plane offsets with the
            # 2-bit plane code packed in bits 24-25 — everything else the
            # decoder needs it derives from the stream's own header bytes
            # (decode_pallas derive mode), so the random-access index costs
            # 4 B per 256-byte plane (1.6%) instead of a rowtab sidecar.
            # Written BEFORE the S' assembly so analysis temps die early
            # (Mosaic scoped-VMEM packing).
            po_ref = idx_refs[0]
            plane_len_i = lenA + lenB + _sum_mid(lenR.reshape(bpp, 16, nb))
            bsize_i = hdr_w + jnp.sum(plane_len_i, axis=0)
            pl_excl = _sub_cumsum(plane_len_i, bpp) - plane_len_i
            b_excl = _lane_cumsum(bsize_i[None, :], nb) - bsize_i[None, :]
            po_ref[g] = (4 + b_excl + hdr_w + pl_excl) | (codes << 24)

        # ---- S' assembly: value | valid<<8 at static offsets ------------
        def packv(vals, lens):
            validm = _iota(vals.shape, 1) < lens[:, None, :]
            return (vals & 255) | (validm.astype(jnp.int32) << 8)

        cpad = codes
        if bpp % 2:
            cpad = jnp.concatenate(
                [codes, jnp.zeros((1, nb), jnp.int32)], axis=0)
        c2 = cpad.reshape(hdr_w, 2, nb)
        bhdr = c2[:, 0, :] | (c2[:, 1, :] << 4)
        if nb_real is not None and nb_real < nb:
            okH = _iota((hdr_w, nb), 1) < nb_real
            bhdr = bhdr | jnp.where(okH, 1 << 8, 0)
        else:
            bhdr = bhdr | (1 << 8)
        sp_ref[4:4 + hdr_w, :] = bhdr

        headA_p = packv(headA, lenA)
        minsec_p = packv(minsec, lenB)
        rows18_p = packv(rows18, lenR)
        base0 = 4 + hdr_w
        for j in range(bpp):
            base = base0 + j * PLANE_SPAN
            sp_ref[base:base + 8, :] = headA_p[j]
            sp_ref[base + 8:base + 26, :] = minsec_p[j]
            sp_ref[base + 26:base + PLANE_SPAN, :] = (
                rows18_p[j * 16:(j + 1) * 16].reshape(288, nb))
        if V > span_real:
            sp_ref[span_real:V, :] = jnp.zeros((V - span_real, nb), jnp.int32)

        body_total = jnp.sum(sp_ref[4:V, :] >> 8)
        csize = body_total
        hvals = jnp.where(_iota((4, nb), 0) == 0, 1, 0)
        hvals = jnp.where(_iota((4, nb), 0) == 1, csize & 255, hvals)
        hvals = jnp.where(_iota((4, nb), 0) == 2, (csize >> 8) & 255, hvals)
        hvals = jnp.where(_iota((4, nb), 0) == 3, (csize >> 16) & 255, hvals)
        lane0 = _iota((4, nb), 1) == 0
        sp_ref[0:4, :] = jnp.where(lane0, hvals | (1 << 8), 0)

        # ---- per-block sizes (host LZ-patch / abort checks) -------------
        plane_len = lenA + lenB + _sum_mid(lenR.reshape(bpp, 16, nb))
        bsize = hdr_w + jnp.sum(plane_len, axis=0)
        bsz_ref[g, 0, :] = bsize
        fsz_ref[g, 0, :] = jnp.sum(psizes, axis=0)


        # ---- transpose + flat compaction ---------------------------------
        W0 = sp_ref[:, :].T  # (nb, V)
        val = W0 & 255
        validb = (W0 >> 8) & 1
        lane = _iota((nb, V), 1)
        subl = _iota((nb, V), 0)
        incl = _lane_cumsum(validb, V)
        rt = incl[:, V - 1:V]  # (nb, 1)
        rt_incl = _sub_cumsum(rt, nb)  # inclusive over rows
        rows_excl = rt_incl - rt  # exclusive row carry (nb, 1)
        prefix_incl = incl + rows_excl
        prefix_excl = prefix_incl - validb
        flatpos = subl * V + lane
        shift = jnp.where(validb == 1, flatpos - prefix_excl, 0)
        w = jnp.where(validb == 1, val | (shift << 8) | (1 << 30), 0)
        for k in range(K):
            step = 1 << k
            moved = _flat_roll_left(w, step, V, nb)
            arrive = (moved != 0) & ((((moved >> 8) >> k) & 1) == 1)
            stay = (w != 0) & ((((w >> 8) >> k) & 1) == 0)
            w = jnp.where(arrive, moved - (step << 8),
                          jnp.where(stay, w, 0))
        out_ref[g] = (w & 255).astype(jnp.uint8)

    def kernel(t_ref, out_ref, bsz_ref, fsz_ref, *extra):
        # Gb superblocks per grid step, each in the proven per-superblock
        # 2D shapes (python-unrolled — the v5 decode-kernel lesson: batch
        # by looping bodies, never by widening state shapes); amortizes
        # the ~5 us/grid-step floor and the small-block DMA latency
        idx_refs = extra[:-1] if with_index else ()
        sp_ref = extra[-1]
        for g in range(Gb):
            _one(g, t_ref, out_ref, bsz_ref, fsz_ref, idx_refs, sp_ref)

    return kernel, V


@lru_cache(maxsize=64)
def _build_call(n_sb: int, bpp: int, nb: int, block_level: int,
                interpret: bool, mode: str = "xposed",
                with_index: bool = False, nb_real: int | None = None,
                Gb: int = 1):
    kernel, V = make_encode_kernel(bpp, nb, block_level, mode, with_index,
                                   nb_real, Gb)
    if mode == "words":
        in_spec = pl.BlockSpec((Gb, nb, 64 * bpp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)
    else:
        in_spec = pl.BlockSpec((Gb, bpp * 256, nb), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)
    out_specs = [
        pl.BlockSpec((Gb, nb, V), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((Gb, 1, nb), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((Gb, 1, nb), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((n_sb, nb, V), jnp.uint8),
        jax.ShapeDtypeStruct((n_sb, 1, nb), jnp.int32),
        jax.ShapeDtypeStruct((n_sb, 1, nb), jnp.int32),
    ]
    if with_index:
        out_specs += [
            pl.BlockSpec((Gb, bpp, nb), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_shape += [
            jax.ShapeDtypeStruct((n_sb, bpp, nb), jnp.int32),
        ]
    params = {}
    if with_index:
        # the index outputs push Mosaic's conservative 16M scoped-vmem
        # default; the hardware has headroom
        params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024)
    return pl.pallas_call(
        kernel,
        grid=(n_sb // Gb,),
        in_specs=[in_spec],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[pltpu.VMEM((V, nb), jnp.int32)],
        interpret=interpret,
        **params,
    ), V


def _enc_g(n_sb: int) -> int:
    """Superblocks per encode grid step: STENOS_ENC_G (default 1; 'auto'
    = 4 when it divides the batch). TPU-measured round 4: G=1/4/8 are
    within noise at 512 MB (3.03/2.99/3.04 GB/s) — the encode grid's
    per-step DMA already pipelines, unlike the decode kernel's tiny
    anchor/table blocks — so the default stays 1; the knob remains for
    other generations."""
    import os

    v = os.environ.get("STENOS_ENC_G", "1")
    g = 4 if v == "auto" else max(1, int(v))
    while n_sb % g:
        g >>= 1
    return max(g, 1)


def _nb_pad(nb: int) -> int | None:
    """Padded lane count for awkward sublane shapes, or None to run as-is.

    Odd nb (bpp=13's nb=39, the nb=147 superblock) makes Mosaic's scoped-
    VMEM packing/relayouts explode (NOTES.md); one zero dummy block rounds
    the sublane axis up to even and its emission is fully masked, so the
    stream stays byte-identical. STENOS_NB_PAD=0 disables (hardware A/B)."""
    import os

    if os.environ.get("STENOS_NB_PAD", "1") in ("0", "false"):
        return None
    if nb > 1 and nb % 2:
        return nb + 1
    return None


def _pad_blocks(data, n_sb: int, nb: int, nbp: int, block_size: int):
    blocks = data.reshape(n_sb, nb, block_size)
    return jnp.pad(blocks, ((0, 0), (0, nbp - nb), (0, 0))).reshape(
        n_sb, nbp * block_size)


def encode_slabs_body(data, bpp: int, block_level: int,
                      interpret: bool = False):
    """data (n_sb, sbytes=nb*256*bpp) uint8 ->
    (rows (n_sb, nb*V) uint8, totals (n_sb,), bsizes, fsizes).

    rows[i][:totals[i]] = [method=1, csize u24, block stream] — a complete
    frame superblock record. totals include the 4 header bytes.
    """
    n_sb, sbytes = data.shape
    block_size = 256 * bpp
    nb = sbytes // block_size
    nbp = _nb_pad(nb)
    nb_real = None
    if nbp is not None:
        data = _pad_blocks(data, n_sb, nb, nbp, block_size)
        nb_real, nb = nb, nbp
    # FREE reinterpret: bytes -> LE32 words; the plane split happens
    # in-kernel (one VMEM transpose + shifts + a leading-axes transpose)
    # instead of an XLA byte transpose (which ran at ~0.55 GB/s and
    # dominated everything). Works for every bpp: a 256-element block is
    # always a whole number of 32-bit words.
    words = jax.lax.bitcast_convert_type(
        data.reshape(n_sb, nb, 64 * bpp, 4), jnp.int32)
    call, V = _build_call(n_sb, bpp, nb, block_level, interpret, "words",
                          False, nb_real, _enc_g(n_sb))
    out, bsizes, fsizes = call(words)
    bsizes = bsizes[:, 0, :]
    fsizes = fsizes[:, 0, :]
    if nb_real is not None:
        bsizes = bsizes[:, :nb_real]
        fsizes = fsizes[:, :nb_real]
    rows = out.reshape(n_sb, nb * V)
    totals = 4 + jnp.sum(bsizes, axis=-1)
    return rows, totals, bsizes, fsizes


encode_slabs_jit = partial(
    jax.jit, static_argnames=("bpp", "block_level", "interpret")
)(encode_slabs_body)


def encode_slabs_index_body(data, bpp: int, block_level: int,
                            interpret: bool = False):
    """Like encode_slabs_body, but the kernel also emits the DECODE INDEX:
    plane offsets with the plane code packed in bits 24-25, in the
    encoder-native 'jb' plane order (p = plane*nb + block — NO transposes),
    so device-resident round trips need no host parsing at all: rows feed
    ops/decode_pallas.decode_slabs_derive_body directly as vbufs with
    plane_order='jb'.

    Returns (rows, totals, bsizes, fsizes,
    plane_off (n_sb, P) i32 packed off | code<<24)."""
    n_sb, sbytes = data.shape
    block_size = 256 * bpp
    nb = sbytes // block_size
    nbp = _nb_pad(nb)
    nb_real = None
    if nbp is not None:
        data = _pad_blocks(data, n_sb, nb, nbp, block_size)
        nb_real, nb = nb, nbp
    words = jax.lax.bitcast_convert_type(
        data.reshape(n_sb, nb, 64 * bpp, 4), jnp.int32)
    call, V = _build_call(n_sb, bpp, nb, block_level, interpret, "words",
                          True, nb_real, _enc_g(n_sb))
    out, bsizes, fsizes, po_raw = call(words)
    bsizes = bsizes[:, 0, :]
    fsizes = fsizes[:, 0, :]
    if nb_real is not None:
        bsizes = bsizes[:, :nb_real]
        fsizes = fsizes[:, :nb_real]
        po_raw = po_raw[:, :, :nb_real]
    rows = out.reshape(n_sb, nb * V)
    totals = 4 + jnp.sum(bsizes, axis=-1)
    # 'jb' order, free reshape (pad lanes already sliced off)
    plane_off = po_raw.reshape(n_sb, -1)
    return rows, totals, bsizes, fsizes, plane_off


encode_slabs_index_jit = partial(
    jax.jit, static_argnames=("bpp", "block_level", "interpret")
)(encode_slabs_index_body)


MAX_SLAB_NB = 192  # VMEM budget gate: blocks per kernel invocation


def slab_nb(nb: int):
    """Blocks per slab: the whole superblock when small enough, else the
    largest divisor <= MAX_SLAB_NB (block streams concatenate freely —
    no cross-block state in the format, block_compress.h:1152-1275)."""
    if nb <= MAX_SLAB_NB:
        return nb
    for s in range(MAX_SLAB_NB, 15, -1):
        if nb % s == 0:
            return s
    return None
