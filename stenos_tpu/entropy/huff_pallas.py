"""Device (Pallas) Huffman literal encoding for the zstd entropy stage.

The bulk work of HUF_compress4X reimagined for the TPU's vector model
(SURVEY.md §7 step 4): per 32 KiB stream, symbols are reversed via
anti-identity MXU matmuls (huff0 emits symbols back-to-front), codes come
from a 256-pass select LUT, bit offsets from a flat prefix-sum of code
lengths, and the bitstream materializes scatter-free: each code contributes
(lo, hi) parts to two 32-bit words, per-word totals form by a short
segmented OR (segments <= 32 by the 1-bit minimum code length), and the
boundary values compact to word order with the same masked-roll log-shift
used everywhere else in this framework. Streams are bit-identical to the
host reference encoder (tests/test_entropy_pallas.py).

Host keeps the tiny per-block metadata: histogram -> length-limited Huffman
table -> FSE-compressed tree description (huffman.py / fse.py), mirroring
how the frame layer keeps method selection on the host.
"""

from functools import lru_cache

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

STREAM = 32768          # bytes per huffman stream (128 KiB block / 4)
RS = STREAM // 128      # 256 sublanes
WOUT_ROWS = 96          # output words rows: >= ceil((11*32768+2)/32)/128
BLOCK = 4 * STREAM


def _iota(shape, dim):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim)


def _flat_roll_right(w, k):
    """out[p] = w[p-k] over flat row-major (RS, 128); zero-fill. k < 128."""
    sub = _iota(w.shape, 0)
    lane = _iota(w.shape, 1)
    B = pltpu.roll(w, 1, axis=0)
    B = jnp.where(sub == 0, 0, B)
    At = pltpu.roll(w, k, axis=1)
    Bt = pltpu.roll(B, k, axis=1)
    return jnp.where(lane >= k, At, Bt)


def _flat_roll_left(w, step, R):
    """out[p] = w[p+step]; zero-fill past the end."""
    u, t = divmod(step, 128)
    sub = _iota(w.shape, 0)
    lane = _iota(w.shape, 1)

    def rows_up(x, n):
        if n == 0:
            return x
        if n >= R:
            return jnp.zeros_like(x)
        x = pltpu.roll(x, R - n, axis=0)
        return jnp.where(sub < R - n, x, 0)

    if t == 0:
        return rows_up(w, u)
    A = rows_up(w, u)
    B = rows_up(w, u + 1)
    At = pltpu.roll(A, 128 - t, axis=1)
    Bt = pltpu.roll(B, 128 - t, axis=1)
    return jnp.where(lane < 128 - t, At, Bt)


def _flat_cumsum(v, R):
    lane = _iota(v.shape, 1)
    k = 1
    while k < 128:
        t = pltpu.roll(v, k, axis=1)
        v = v + jnp.where(lane >= k, t, 0)
        k <<= 1
    rt = v[:, 127:128]
    sub = _iota((R, 1), 0)
    k = 1
    rts = rt
    while k < R:
        t = pltpu.roll(rts, k, axis=0)
        rts = rts + jnp.where(sub >= k, t, 0)
        k <<= 1
    return v + (rts - rt)


def make_stream_kernel():
    def kernel(x_ref, lut_ref, jl_ref, jr_ref, out_ref, size_ref, anch_ref):
        X = x_ref[0].astype(jnp.int32)  # (RS, 128) natural order
        # reverse to encoding order (huff0 emits the last symbol first)
        xb = X.astype(jnp.bfloat16)
        lr = jax.lax.dot_general(
            xb, jl_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        rb = jax.lax.dot_general(
            jr_ref[:], lr.astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        xe = rb.astype(jnp.int32)

        # 256-pass LUT: acc = code | len<<11
        acc = jnp.zeros((RS, 128), jnp.int32)
        for s in range(256):
            acc = jnp.where(xe == s, lut_ref[0, 0, s], acc)
        lens = acc >> 11
        code = acc & 2047

        incl = _flat_cumsum(lens, RS)
        total = incl[RS - 1, 127]
        # decode anchors for free: the per-row inclusive prefix column IS
        # the bit read-position of every 128th ORIGINAL symbol (reversed) —
        # anchors[g] = incl_em[(255-g)*128+127] (huff_decode_pallas.py)
        anch_ref[0] = incl[:, 127:128]
        off = incl - lens
        w0 = off >> 5
        sh = off & 31
        lo = code << sh
        hi = (code >> 1) >> (31 - sh)

        # segmented OR by word (segments <= 32: min code length is 1 bit)
        acc_lo, acc_hi = lo, hi
        for k in (1, 2, 4, 8, 16):
            pk = _flat_roll_right(w0, k)
            same = pk == w0
            pl_ = _flat_roll_right(acc_lo, k)
            ph_ = _flat_roll_right(acc_hi, k)
            acc_lo = acc_lo | jnp.where(same, pl_, 0)
            acc_hi = acc_hi | jnp.where(same, ph_, 0)
        nxt = _flat_roll_left(w0, 1, RS)
        pos = _iota((RS, 128), 0) * 128 + _iota((RS, 128), 1)
        islast = (nxt != w0) | (pos == STREAM - 1)

        # compact boundary (word-total) values to word order: the rank of a
        # boundary IS its word index (every 32-bit word contains a symbol
        # start, since code lengths are >= 1 bit), so dest = w0 directly
        shift = jnp.where(islast, pos - w0, 0)
        ctrl = jnp.where(islast, shift | (1 << 30), 0)
        vlo = jnp.where(islast, acc_lo, 0)
        vhi = jnp.where(islast, acc_hi, 0)
        for k in range(15):
            step = 1 << k
            cm = _flat_roll_left(ctrl, step, RS)
            lm = _flat_roll_left(vlo, step, RS)
            hm = _flat_roll_left(vhi, step, RS)
            arrive = (cm != 0) & (((cm >> k) & 1) == 1)
            stay = (ctrl != 0) & (((ctrl >> k) & 1) == 0)
            ctrl = jnp.where(arrive, cm - step, jnp.where(stay, ctrl, 0))
            vlo = jnp.where(arrive, lm, jnp.where(stay, vlo, 0))
            vhi = jnp.where(arrive, hm, jnp.where(stay, vhi, 0))
        # hi parts belong to the NEXT word
        vhi1 = _flat_roll_right(vhi, 1)
        words = vlo | vhi1
        mw = total >> 5
        mbit = jax.lax.shift_left(jnp.int32(1), total & 31)
        words = jnp.where(pos == mw, words | mbit, words)
        out_ref[0] = words[:WOUT_ROWS]
        # scalar VMEM stores are unsupported: write the size as a full row
        size_ref[0] = jnp.full((1, 128), (total + 1 + 7) >> 3, jnp.int32)

    return kernel


@lru_cache(maxsize=8)
def _stream_call(ns: int, interpret: bool):
    kernel = make_stream_kernel()
    return pl.pallas_call(
        kernel,
        grid=(ns,),
        in_specs=[
            pl.BlockSpec((1, RS, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 256), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RS, RS), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, WOUT_ROWS, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RS, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((ns, WOUT_ROWS, 128), jnp.int32),
            jax.ShapeDtypeStruct((ns, 1, 128), jnp.int32),
            jax.ShapeDtypeStruct((ns, RS, 1), jnp.int32),
        ),
        interpret=interpret,
    )


_J_CACHE = {}


def _anti_identities():
    if not _J_CACHE:
        _J_CACHE["jl"] = np.eye(128, dtype=np.float32)[::-1].astype(
            jnp.bfloat16)
        _J_CACHE["jr"] = np.eye(RS, dtype=np.float32)[::-1].astype(
            jnp.bfloat16)
    return _J_CACHE["jl"], _J_CACHE["jr"]


def encode_streams_device(streams, luts, interpret: bool = False,
                          with_anchors: bool = False):
    """streams (ns, 32768) uint8; luts (ns, 256) int32 (code | len<<11).
    -> (words (ns, WOUT_ROWS*128) int32 LE bitstreams, sizes (ns,) bytes
    [, anchors (ns, 256) int32 — decode read positions, already reversed to
    segment order for huff_decode_pallas])."""
    ns = streams.shape[0]
    call = _stream_call(ns, interpret)
    jl, jr = _anti_identities()
    words, sizes, anch = call(
        streams.reshape(ns, RS, 128), luts.reshape(ns, 1, 256), jl, jr)
    if with_anchors:
        return (words.reshape(ns, WOUT_ROWS * 128), sizes[:, 0, 0],
                anch[:, ::-1, 0])
    return words.reshape(ns, WOUT_ROWS * 128), sizes[:, 0, 0]


@lru_cache(maxsize=8)
def _hist_call(nblk: int, interpret: bool):
    def kernel(x_ref, h_ref):
        X = x_ref[0].astype(jnp.int32)  # (1024, 128)
        acc = jnp.zeros((1, 256), jnp.int32)
        li = _iota((1, 256), 1)
        for s in range(256):
            c = jnp.sum((X == s).astype(jnp.int32))
            acc = jnp.where(li == s, c, acc)
        h_ref[0] = acc

    return pl.pallas_call(
        kernel,
        grid=(nblk,),
        in_specs=[pl.BlockSpec((1, BLOCK // 128, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, 256), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nblk, 1, 256), jnp.int32),
        interpret=interpret,
    )


def histogram_device(blocks, interpret: bool = False):
    """blocks (nblk, 131072) uint8 -> (nblk, 256) int32."""
    nblk = blocks.shape[0]
    call = _hist_call(nblk, interpret)
    return call(blocks.reshape(nblk, BLOCK // 128, 128))[:, 0, :]
