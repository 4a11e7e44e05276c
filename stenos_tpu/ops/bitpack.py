"""Vectorized 16-value bit packing/unpacking (write_16/read_16_bits layout).

Layout (block_compress.h:562-601): 16 values at b bits are stored as two
groups of 8 values, each group LE-packed into b bytes (value j of a group
occupies bits [j*b, (j+1)*b) of the group's little-endian bit stream).

Works with numpy or jax.numpy via the `xp` module argument; everything is
int32, fixed shapes, so XLA lowers it to pure VPU code.
"""


def _pack_maps(b):
    # For output byte k of 2*b (group g = k // b, byte kk = k % b) and bit m:
    # global bit = kk*8 + m -> value j = g*8 + bit//b, bit position p = bit % b.
    import numpy as np

    ks = np.arange(2 * b)
    ms = np.arange(8)
    g = ks // b
    kk = ks % b
    bit = kk[:, None] * 8 + ms[None, :]
    j = g[:, None] * 8 + bit // b
    p = bit % b
    return j, p


_PACK_CACHE = {}


def pack16(xp, values, b):
    """Pack (..., 16) values at b bits (1..6) -> (..., 2*b) bytes."""
    if b not in _PACK_CACHE:
        _PACK_CACHE[b] = _pack_maps(b)
    j, p = _PACK_CACHE[b]
    j = xp.asarray(j)
    p = xp.asarray(p)
    bits = (values[..., j] >> p) & 1  # (..., 2b, 8)
    weights = 1 << xp.arange(8, dtype=xp.int32)
    return xp.sum(bits * weights, axis=-1).astype(xp.int32)


def pack16_any(xp, values, bits):
    """Pack (..., 16) values at per-row widths `bits` (...,) into (..., 12)
    padded byte buffers (max payload = 2*6). Rows with bits==0 or 8 produce
    zeros (callers handle 0/raw separately)."""
    import numpy as _np

    out = xp.zeros(values.shape[:-1] + (12,), dtype=xp.int32)
    if xp is _np:  # host fast path: only pack rows of each present width
        for b in _np.unique(bits):
            b = int(b)
            if not 1 <= b <= 6:
                continue
            sel = bits == b
            out[sel, : 2 * b] = pack16(_np, values[sel], b)
        return out
    for b in range(1, 7):
        packed = pack16(xp, values, b)
        pad = xp.zeros(values.shape[:-1] + (12 - 2 * b,), dtype=xp.int32)
        cand = xp.concatenate([packed, pad], axis=-1)
        out = xp.where((bits == b)[..., None], cand, out)
    return out


def unpack16(xp, data, b):
    """Unpack (..., 2*b) bytes at width b (1..6) -> (..., 16) values."""
    if b not in _PACK_CACHE:
        _PACK_CACHE[b] = _pack_maps(b)
    j, p = _PACK_CACHE[b]
    # Invert: value j bit q comes from byte k, bit m where j,p maps say so.
    import numpy as np

    jj, pp = _PACK_CACHE[b]
    src_byte = np.zeros((16, b), dtype=np.int64)
    src_bit = np.zeros((16, b), dtype=np.int64)
    for k in range(2 * b):
        for m in range(8):
            src_byte[jj[k, m], pp[k, m]] = k
            src_bit[jj[k, m], pp[k, m]] = m
    src_byte = xp.asarray(src_byte)
    src_bit = xp.asarray(src_bit)
    bits = (data[..., src_byte] >> src_bit) & 1  # (..., 16, b)
    weights = 1 << xp.arange(b, dtype=xp.int32)
    return xp.sum(bits * weights, axis=-1).astype(xp.int32)
