"""JAX/TPU engine: device-side block-codec encode (and decode driver).

TPU-first structure (SURVEY.md §7): the whole batch of superblocks is
analyzed at once as a (n_sb, nb, bpp, 16, 16) tensor — pure VPU reductions —
then emission is a size→prefix-sum→scatter pipeline instead of the
reference's sequential pointer-walking writers. Sequential/host-only pieces
(intra-block LZ attempts, zstd entropy stage, lz4-dry estimates, frame
assembly) stay on the host runtime, operating on the device results.

Reference parity: byte-identical output to codec/encode_np.py (itself
bit-exact vs the C++ library) — enforced by tests/test_engine_jax.py.
"""

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from .codec.analyze import analyze_planes, plane_kinds
from .codec.emit import block_header_bytes, plane_sections
from .constants import BLOCK_LZ, BLOCK_PARTIAL, ERROR_DST_OVERFLOW
from .codec.lz_np import lz_compress_block
from .codec.encode_np import encode_partial


def encode_superblocks_body(data, bpp: int, block_level: int):
    """Encode the full blocks of a batch of superblocks on device.

    data: (n_sb, sbytes) uint8 with sbytes % (256*bpp) == 0.
    Returns (out, total, block_sizes, full_sizes):
      out         (n_sb, max_out) uint8 padded block streams
      total       (n_sb,) stream length
      block_sizes (n_sb, nb) compressed size per block (for abort checks)
      full_sizes  (n_sb, nb) sum of plane sizes (for LZ candidacy)
    """
    n_sb, sbytes = data.shape
    block_size = 256 * bpp
    nb = sbytes // block_size
    hdr_w = (bpp + 1) // 2

    el = data.reshape(n_sb, nb, 256, bpp).astype(jnp.int32)
    x = el.transpose(0, 1, 3, 2).reshape(n_sb, nb, bpp, 16, 16)
    firsts = el[:, :, 0, :]

    info = analyze_planes(jnp, x, firsts, block_level >= 1)
    codes, psizes = plane_kinds(jnp, info, block_level)
    full_sizes = psizes.sum(axis=-1)

    sec = plane_sections(jnp, x, info, codes, firsts)
    bhdr = block_header_bytes(jnp, codes, bpp)

    is_raw = codes == 1
    lenA = jnp.where(is_raw, 256, sec["lenA"])

    # Section lens per block: [bhdr][A B r0..r15]*bpp
    plane_lens = jnp.concatenate(
        [lenA[..., None], sec["lenB"][..., None], sec["lenR"]], axis=-1
    )  # (n_sb, nb, bpp, 18)
    lens = jnp.concatenate(
        [
            jnp.full((n_sb, nb, 1), hdr_w, jnp.int32),
            plane_lens.reshape(n_sb, nb, bpp * 18),
        ],
        axis=-1,
    )  # (n_sb, nb, 1 + 18*bpp)
    block_sizes = lens.sum(axis=-1)

    flat = lens.reshape(n_sb, -1)
    offs = jnp.cumsum(flat, axis=-1) - flat  # exclusive
    total = offs[:, -1] + flat[:, -1]
    offs = offs.reshape(lens.shape)

    max_out = sbytes + nb * hdr_w
    out = jnp.zeros((n_sb, max_out), jnp.uint8)
    rows_idx = jnp.arange(n_sb)[:, None]

    def scatter(out, off, content, length, width):
        """off (..., ), content (..., width), length (...,)."""
        cols = jnp.arange(width, dtype=jnp.int32)
        idx = off[..., None] + cols
        idx = jnp.where(cols < length[..., None], idx, max_out)
        flat_idx = idx.reshape(n_sb, -1)
        flat_val = content.astype(jnp.uint8).reshape(n_sb, -1)
        return out.at[rows_idx, flat_idx].set(flat_val, mode="drop")

    plane_offs = offs[..., 1:].reshape(n_sb, nb, bpp, 18)

    out = scatter(out, offs[..., 0], bhdr,
                  jnp.full((n_sb, nb), hdr_w, jnp.int32), hdr_w)
    # slot A: hdr8/SAME for non-raw planes
    out = scatter(out, plane_offs[..., 0], sec["headA"],
                  jnp.where(is_raw, 0, sec["lenA"]), 8)
    # raw planes (256 bytes of the shuffled plane)
    out = scatter(out, plane_offs[..., 0], x.reshape(n_sb, nb, bpp, 256),
                  jnp.where(is_raw, 256, 0), 256)
    out = scatter(out, plane_offs[..., 1], sec["minsec"], sec["lenB"], 18)
    out = scatter(out, plane_offs[..., 2:], sec["rows"], sec["lenR"], 18)

    return out, total, block_sizes, full_sizes


encode_superblocks_jit = partial(
    jax.jit, static_argnames=("bpp", "block_level")
)(encode_superblocks_body)


class JaxEngine:
    """Engine adapter for frame.py: device compute + host patch-up."""

    def __init__(self, device=None):
        self.device = device

    def encode_batch(self, data: np.ndarray, bpp: int, sb: int,
                     block_level: int = 2):
        """One jit call over all full superblocks; returns per-superblock
        precomputed results for finish_block_stream (None entries fall back
        to the per-chunk path)."""
        nbytes = len(data)
        n_sb = -(-nbytes // sb)
        n_full = nbytes // sb
        block_size = 256 * bpp
        if n_full == 0 or sb % block_size:
            return [None] * n_sb
        batch = np.asarray(data[: n_full * sb]).reshape(n_full, sb)
        out, total, bsizes, fsizes = encode_superblocks_jit(
            batch, bpp, block_level)
        out = np.asarray(out)
        total = np.asarray(total)
        bsizes = np.asarray(bsizes)
        fsizes = np.asarray(fsizes)
        pre = [
            (out[i], int(total[i]), bsizes[i], fsizes[i])
            for i in range(n_full)
        ]
        pre += [None] * (n_sb - n_full)
        return pre

    def finish_block_stream(self, pre, chunk, bpp, budget, target_ratio,
                            block_level: int = 2):
        """Host patch-up (LZ splice, abort/budget checks) of a precomputed
        device-encoded full superblock."""
        if pre is None:
            return self.encode_block_stream(chunk, bpp, budget, target_ratio,
                                            block_level)
        stream, total, bsizes, fsizes = pre
        nbytes = len(chunk)
        block_size = 256 * bpp
        nb = nbytes // block_size
        body = self._patch_lz(stream[:total], chunk, bpp, nb, bsizes, fsizes,
                              block_level)
        if target_ratio is not None:
            ends = np.cumsum(self._sizes_after_lz)
            cp = (nbytes // 16 + block_size - 1) // block_size - 1
            cp = max(cp, 0)
            if cp < nb and ((cp + 1) * block_size) / ends[cp] < target_ratio:
                return ERROR_DST_OVERFLOW
        if len(body) + 16 > budget or len(body) > budget:
            return ERROR_DST_OVERFLOW
        return body

    def encode_block_stream(self, chunk: np.ndarray, bpp: int, budget: int,
                            target_ratio=None, block_level: int = 2):
        nbytes = len(chunk)
        if nbytes == 0:
            return b""
        block_size = 256 * bpp
        nb = nbytes // block_size
        body = b""
        if nb:
            full = np.asarray(chunk[: nb * block_size]).reshape(1, -1)
            out, total, bsizes, fsizes = encode_superblocks_jit(
                full, bpp, block_level
            )
            out = np.asarray(out[0])
            total = int(total[0])
            bsizes = np.asarray(bsizes[0])
            fsizes = np.asarray(fsizes[0])
            body = self._patch_lz(
                out[:total], chunk, bpp, nb, bsizes, fsizes, block_level
            )
            if target_ratio is not None:
                # abort check (block_compress.h:1267-1274) on the (possibly
                # LZ-patched) sizes
                ends = np.cumsum(self._sizes_after_lz)
                cp = None
                for i in range(nb):
                    if (i + 1) * block_size >= nbytes // 16:
                        cp = i
                        break
                if cp is not None:
                    if ((cp + 1) * block_size) / ends[cp] < target_ratio:
                        return ERROR_DST_OVERFLOW
            if len(body) + 16 > budget:
                return ERROR_DST_OVERFLOW

        rem = nbytes - nb * block_size
        if rem:
            tail = encode_partial(np.asarray(chunk[nb * block_size:]), bpp)
            if len(body) + 1 + len(tail) + 8 > budget:
                return ERROR_DST_OVERFLOW
            body = body + bytes([BLOCK_PARTIAL]) + tail
        if len(body) > budget:
            return ERROR_DST_OVERFLOW
        return body

    def _patch_lz(self, stream, chunk, bpp, nb, bsizes, fsizes, block_level):
        """Host-side intra-block LZ attempts + splice (rare path)."""
        self._sizes_after_lz = bsizes.copy()
        if not (block_level == 2 and bpp % 4 == 0):
            return bytes(stream)
        block_size = 256 * bpp
        cand = np.nonzero(fsizes * 3 > block_size)[0]
        if not len(cand):
            return bytes(stream)
        budget = len(chunk)
        starts = np.zeros(nb + 1, dtype=np.int64)
        np.cumsum(bsizes, out=starts[1:])
        pieces = []
        pos = 0
        shrink = 0
        chunk = np.asarray(chunk)
        for i in cand:
            p = starts[i] - shrink
            if budget > p + fsizes[i] + bpp * 8 + 2:
                payload = lz_compress_block(
                    chunk[i * block_size : (i + 1) * block_size], bpp,
                    int(fsizes[i]))
                if payload is not None:
                    pieces.append(bytes(stream[pos : starts[i]]))
                    pieces.append(bytes([BLOCK_LZ]))
                    pieces.append(payload)
                    pos = starts[i + 1]
                    shrink += bsizes[i] - (1 + len(payload))
                    self._sizes_after_lz[i] = 1 + len(payload)
        pieces.append(bytes(stream[pos:]))
        return b"".join(pieces)

    def decode_block_stream(self, payload, bpp, nbytes):
        """Decode via host parse-index + device parallel kernel; falls back
        to the host decoder when the native parser is unavailable."""
        from .native import lib as native

        payload = bytes(memoryview(np.asarray(payload)))
        block_size = 256 * bpp
        nb = 1 if nbytes == block_size else nbytes // block_size
        if native is None or nb == 0:
            from .codec.decode_np import block_codec_decode

            return block_codec_decode(payload, bpp, nbytes)
        parsed = native.parse_index(payload, bpp, nbytes)
        if isinstance(parsed, int):
            return parsed
        plane_off, plane_kind, plane_val, patch, tail_off, tail_len, _ = parsed
        buf = np.concatenate([np.frombuffer(payload, np.uint8), patch])
        # pad to a bucket so jit shapes are reused across superblocks
        bucket = _bucket(len(buf))
        buf = np.pad(buf, (0, bucket - len(buf)))
        out = decode_blocks_jit(buf, plane_off, plane_kind, plane_val, bpp, nb)
        out = np.asarray(out)
        if tail_len:
            out = np.concatenate(
                [out, patch[tail_off - len(payload):
                            tail_off - len(payload) + tail_len]]
            )
        return out[:nbytes]


def decompress_frame_batched(frame: bytes, bpp: int, engine=None):
    """Decode a whole frame with ONE device call when every superblock is
    method BLOCK with the same decoded size (the level-1/2 typed-array fast
    path): parse all superblocks on the host (C++ index builder), concatenate
    payload+patches, and run a single decode_blocks_jit over all blocks.

    Returns a numpy array, or None when the frame shape doesn't fit the fast
    path (caller falls back to frame.decompress).
    """
    from .frame import get_info
    from .native import lib as native

    if native is None:
        return None
    frame = bytes(frame)
    dsize_total, sb, pos = get_info(frame, bpp)
    block_size = 256 * bpp
    if dsize_total == 0 or sb % block_size or dsize_total % sb:
        return None
    n_sb = dsize_total // sb
    nb = sb // block_size

    bufs, offs, kinds, vals = [], [], [], []
    base = 0
    for _ in range(n_sb):
        code = frame[pos]
        csize = int.from_bytes(frame[pos + 1 : pos + 4], "little")
        if code != 1:
            return None
        payload = frame[pos + 4 : pos + 4 + csize]
        parsed = native.parse_index(payload, bpp, sb)
        if isinstance(parsed, int):
            return None
        po, pk, pv, patch, t_off, t_len, _ = parsed
        if t_len:
            return None
        buf = np.concatenate([np.frombuffer(payload, np.uint8), patch])
        bufs.append(buf)
        offs.append(po.astype(np.int64) + base)
        kinds.append(pk)
        vals.append(pv)
        base += len(buf)
        pos += 4 + csize
    allbuf = np.concatenate(bufs)
    bucket = _bucket(len(allbuf))
    allbuf = np.pad(allbuf, (0, bucket - len(allbuf)))
    out = decode_blocks_jit(
        allbuf,
        np.concatenate(offs).astype(np.int32),
        np.concatenate(kinds),
        np.concatenate(vals),
        bpp,
        nb * n_sb,
    )
    return np.asarray(out)


@partial(jax.jit, static_argnames=("bpp", "level"))
def compress_frame_device_jit(data, bpp: int, level: int):
    """Fully device-resident level-1 frame compression (method BLOCK).

    data: (n_sb, sb) uint8 (whole input, sb | len). Returns (frame, size):
    frame stays in HBM — the TPU-native equivalent of the reference's
    RAM-to-RAM compress path.
    """
    n_sb, sb = data.shape
    out, total, _, _ = encode_superblocks_jit(data, bpp, 2)
    max_out = out.shape[1]
    nbytes = n_sb * sb

    sb_sizes = total + 4
    sb_offs = 8 + jnp.cumsum(sb_sizes) - sb_sizes
    frame_len = 8 + jnp.sum(sb_sizes)

    cap = 8 + n_sb * 4 + n_sb * max_out
    frame = jnp.zeros(cap, jnp.uint8)
    # frame header: shift 0 + u56 size (static)
    hdr = np.zeros(8, np.uint8)
    hdr[0] = 0
    hdr[1:8] = np.frombuffer(int(nbytes).to_bytes(7, "little"), np.uint8)
    frame = frame.at[:8].set(jnp.asarray(hdr))
    # superblock headers: method 1 + u24 size
    shdr = jnp.stack(
        [
            jnp.full(n_sb, 1, jnp.uint8),
            (total & 255).astype(jnp.uint8),
            ((total >> 8) & 255).astype(jnp.uint8),
            ((total >> 16) & 255).astype(jnp.uint8),
        ],
        axis=-1,
    )
    hidx = sb_offs[:, None] + jnp.arange(4)
    frame = frame.at[hidx.reshape(-1)].set(shdr.reshape(-1), mode="drop")
    # payloads
    cols = jnp.arange(max_out)
    pidx = jnp.where(cols < total[:, None], sb_offs[:, None] + 4 + cols, cap)
    frame = frame.at[pidx.reshape(-1)].set(out.reshape(-1), mode="drop")
    return frame, frame_len


def _bucket(n: int) -> int:
    b = 4096
    while b < n:
        b *= 2
    return b


_ROW_SIZE_LUT = np.array(
    [0, 2, 4, 6, 8, 10, 0, 0, 0, 2, 4, 6, 8, 10, 12, 16], dtype=np.int32
)


@partial(jax.jit, static_argnames=("bpp", "nb"))
def decode_blocks_jit(buf, plane_off, plane_kind, plane_val, bpp: int, nb: int):
    """Fully-parallel decode of nb full blocks from a parsed index.

    TPU-first structure: every sequential dependency of the format collapses
    to either a 16-step vectorized scan (row offsets within a plane) or an
    affine recurrence out_row = a + b*prev_last (mod 256) solved in one
    16-step loop over rows — everything else is gathers + VPU math across all
    planes at once.
    """
    P = nb * bpp
    i32 = jnp.int32
    L = buf.shape[0]
    po = plane_off.astype(i32)

    def gat(idx):
        return buf[jnp.clip(idx, 0, L - 1)].astype(i32)

    # --- plane row headers (nibbles)
    hdr8 = gat(po[:, None] + jnp.arange(8))
    h = jnp.stack([hdr8 & 15, hdr8 >> 4], axis=-1).reshape(P, 16)

    # --- mins (plain compacted or RLE16)
    eligible = (h != 6) & (h != 7) & (h != 15)
    ecum = jnp.cumsum(eligible.astype(i32), axis=-1)
    mins_plain = jnp.where(
        eligible, gat(po[:, None] + 8 + (ecum - 1)), 0
    )
    plain_end = po + 8 + ecum[:, -1]

    mmask = gat(po + 8) | (gat(po + 9) << 8)
    mbits = (mmask[:, None] >> jnp.arange(16)) & 1
    mkeep = 1 - mbits
    mc = jnp.cumsum(mkeep, axis=-1)
    mins_rle = jnp.where(mc >= 1, gat(po[:, None] + 10 + (mc - 1)), 0)
    rle_end = po + 10 + mc[:, -1]

    is_rle_mins = plane_kind == 1
    mins = jnp.where(is_rle_mins[:, None], mins_rle, mins_plain)
    mins_end = jnp.where(is_rle_mins, rle_end, plain_end)

    # --- row offsets: 16-step scan (RLE rows read their 2-byte mask)
    size_lut = jnp.asarray(_ROW_SIZE_LUT)
    static_sizes = size_lut[h]
    is_rle_row = (h == 6) | (h == 7)

    def off_step(cur, r):
        m = gat(cur) | (gat(cur + 1) << 8)
        rle_size = 2 + 16 - jnp.bitwise_count(m.astype(jnp.uint16)).astype(i32)
        size = jnp.where(is_rle_row[:, r], rle_size, static_sizes[:, r])
        return cur + size, cur

    _, row_off = jax.lax.scan(off_step, mins_end, jnp.arange(16))
    row_off = row_off.T  # (P, 16)

    # --- row payload windows
    W = gat(row_off[:, :, None] + jnp.arange(18))  # (P,16,18)

    # RLE reconstruction (shared by h==7 rows, h==6 delta rows, mins)
    rmask = W[..., 0] | (W[..., 1] << 8)
    rbit = (rmask[..., None] >> jnp.arange(16)) & 1
    rkeep = 1 - rbit
    rc = jnp.cumsum(rkeep, axis=-1)
    kept = jnp.take_along_axis(W, 2 + jnp.clip(rc - 1, 0, 15), axis=-1)
    rle_vals = jnp.where(rc >= 1, kept, 0)  # leading repeats -> prev (b flag)

    # bit-packed values
    from .ops.bitpack import unpack16

    bitpack_row = ((h >= 1) & (h <= 5)) | ((h >= 9) & (h <= 14))
    bwidth = jnp.where(bitpack_row, h % 8, 0)
    vals = jnp.zeros((P, 16, 16), i32)
    for b in range(1, 7):
        vals = jnp.where(
            (bwidth == b)[..., None], unpack16(jnp, W[..., :12], b), vals
        )

    # per-row (a, bflag): out = (a + bflag * prev_last) & 255
    h3 = h[..., None]
    direct_a = (vals + mins[..., None]) & 255
    delta_a = jnp.cumsum(vals + mins[..., None], axis=-1) & 255
    drle_a = jnp.cumsum(rle_vals, axis=-1) & 255
    a = jnp.where(h3 == 15, W[..., :16], direct_a)
    a = jnp.where((h3 >= 8) & (h3 <= 14), delta_a, a)
    a = jnp.where(h3 == 6, drle_a, a)
    a = jnp.where(h3 == 7, rle_vals, a)
    bflag = jnp.zeros((P, 16, 16), i32)
    bflag = jnp.where((h3 >= 8) & (h3 <= 14), 1, bflag)
    bflag = jnp.where(h3 == 6, 1, bflag)
    bflag = jnp.where(h3 == 7, (rc == 0).astype(i32), bflag)

    # --- affine chain across rows (prev_last)
    def chain_step(pl, r):
        nxt = (a[:, r, 15] + bflag[:, r, 15] * pl) & 255
        return nxt, pl

    _, pls = jax.lax.scan(chain_step, jnp.zeros(P, i32), jnp.arange(16))
    pls = pls.T  # (P,16): prev_last entering each row
    planes = (a + bflag * pls[:, :, None]) & 255  # (P,16,16)
    planes = planes.reshape(P, 256)

    # --- plane kind select
    same_fill = jnp.broadcast_to(plane_val.astype(i32)[:, None], (P, 256))
    raw_bytes = gat(po[:, None] + jnp.arange(256))
    planes = jnp.where((plane_kind == 2)[:, None], same_fill, planes)
    planes = jnp.where((plane_kind == 3)[:, None], raw_bytes, planes)

    # --- unshuffle blocks: (nb, bpp, 256) -> (nb, 256, bpp)
    out = planes.reshape(nb, bpp, 256).transpose(0, 2, 1)
    return out.reshape(nb * 256 * bpp).astype(jnp.uint8)
