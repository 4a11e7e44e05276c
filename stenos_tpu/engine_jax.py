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


@partial(jax.jit, static_argnames=("bpp", "block_level"))
def encode_superblocks_jit(data, bpp: int, block_level: int):
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


class JaxEngine:
    """Engine adapter for frame.py: device compute + host patch-up."""

    def __init__(self, device=None):
        self.device = device

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
        from .codec.decode_np import block_codec_decode

        return block_codec_decode(bytes(memoryview(np.asarray(payload))), bpp,
                                  nbytes)
