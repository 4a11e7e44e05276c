"""Host (numpy/python) decoder for the stenos block-codec stream.

Sequential reference decoder used for tests, interop validation and the CPU
fallback; the device decoder (decode_jax.py) implements the same semantics as
an offset-parse scan + parallel payload pass. See SPEC.md §3 and
block_compress.h:1553-1880 (scalar) / :1888-2175 (flat+unshuffle variant —
the structure followed here).
"""

import numpy as np

from ..constants import (
    BLOCK_COPY,
    BLOCK_LZ,
    BLOCK_PARTIAL,
    ERROR_INVALID_INPUT,
    ERROR_SRC_OVERFLOW,
)
from ..ops.bitpack import unpack16
from .lz_np import lz_decompress_block

_BIT_COUNT = [0, 1, 2, 3, 4, 5, 6, 8, 0, 1, 2, 3, 4, 5, 6, 8]


def _decode_rle(src, pos, n, prev):
    """Returns (row16 list, new_pos) or (None, 0)."""
    if pos + 2 > n:
        return None, 0
    mask = src[pos] | (src[pos + 1] << 8)
    pos += 2
    out = [0] * 16
    for i in range(16):
        if (mask >> i) & 1:
            out[i] = prev
        else:
            if pos >= n:
                return None, 0
            out[i] = src[pos]
            pos += 1
        prev = out[i]
    return out, pos


def _decode_plane(src, pos, n, lines, rle_mins):
    """Decode one NORMAL/NORMAL_RLE plane -> (plane bytes (16*lines,), pos)."""
    hdr_len = lines // 2 + (lines & 1)
    if pos + hdr_len > n:
        return None, 0
    headers = []
    for i in range(hdr_len):
        b = src[pos + i]
        headers.append(b & 15)
        headers.append(b >> 4)
    headers = headers[:lines]
    pos += hdr_len

    mins = [0] * lines
    if rle_mins:
        m, pos = _decode_rle(src, pos, n, 0)
        if m is None:
            return None, 0
        mins = m
    else:
        for i, h in enumerate(headers):
            if h not in (6, 7, 15):
                if pos >= n:
                    return None, 0
                mins[i] = src[pos]
                pos += 1

    out = np.zeros(16 * lines, dtype=np.int32)
    for r, h in enumerate(headers):
        prev_last = int(out[r * 16 - 1]) if r else 0
        dst = out[r * 16 : (r + 1) * 16]
        if h == 6:
            tmp, pos = _decode_rle(src, pos, n, 0)
            if tmp is None:
                return None, 0
            acc = prev_last
            for c in range(16):
                acc = (acc + tmp[c]) & 255
                dst[c] = acc
        elif h == 7:
            tmp, pos = _decode_rle(src, pos, n, prev_last)
            if tmp is None:
                return None, 0
            dst[:] = tmp
        elif h == 15:
            if pos + 16 > n:
                return None, 0
            dst[:] = np.frombuffer(src[pos : pos + 16], dtype=np.uint8)
            pos += 16
        else:
            cnt = _BIT_COUNT[h]
            minb = mins[r]
            if cnt == 8:
                return None, 0  # impossible (maps to 15)
            if cnt:
                if pos + cnt * 2 > n:
                    return None, 0
                raw = np.frombuffer(src[pos : pos + cnt * 2], dtype=np.uint8)
                vals = unpack16(np, raw.astype(np.int32), cnt)
                pos += cnt * 2
            else:
                vals = np.zeros(16, dtype=np.int32)
            if h < 8:
                dst[:] = (vals + minb) & 255
            else:
                acc = prev_last
                for c in range(16):
                    acc = (acc + int(vals[c]) + minb) & 255
                    dst[c] = acc
    return out.astype(np.uint8), pos


def block_codec_decode(src: bytes, bpp: int, nbytes: int):
    """Decode a block-codec stream into nbytes bytes; returns array or error."""
    if nbytes == 0 or len(src) == 0:
        return np.zeros(0, dtype=np.uint8)
    src = memoryview(bytes(src))
    n = len(src)
    pos = 0
    hdr_w = (bpp + 1) // 2
    block_size = 256 * bpp
    nb = 1 if nbytes == block_size else nbytes // block_size
    out = np.empty(nbytes, dtype=np.uint8)

    for b in range(nb):
        if pos >= n:
            return ERROR_SRC_OVERFLOW
        marker = src[pos]
        dst = out[b * block_size : (b + 1) * block_size]
        if marker == BLOCK_COPY:
            pos += 1
            if pos + block_size > n:
                return ERROR_SRC_OVERFLOW
            dst[:] = np.frombuffer(src[pos : pos + block_size], np.uint8)
            pos += block_size
            continue
        if marker == BLOCK_LZ:
            pos += 1
            block, consumed = lz_decompress_block(src[pos:], bpp)
            if block is None:
                return ERROR_INVALID_INPUT
            dst[:] = np.frombuffer(block, np.uint8)
            pos += consumed
            continue
        if pos + hdr_w >= n:
            return ERROR_SRC_OVERFLOW
        codes = []
        for p in range(bpp):
            codes.append((src[pos + (p >> 1)] >> (4 * (p & 1))) & 15)
        pos += hdr_w
        planes = np.empty((bpp, 256), dtype=np.uint8)
        for p in range(bpp):
            c = codes[p]
            if c == 0:  # ALL_SAME
                if pos >= n:
                    return ERROR_SRC_OVERFLOW
                planes[p] = src[pos]
                pos += 1
            elif c == 1:  # ALL_RAW
                if pos + 256 > n:
                    return ERROR_SRC_OVERFLOW
                planes[p] = np.frombuffer(src[pos : pos + 256], np.uint8)
                pos += 256
            elif c in (2, 3):
                plane, pos = _decode_plane(src, pos, n, 16, c == 3)
                if plane is None:
                    return ERROR_SRC_OVERFLOW
                planes[p] = plane
            else:
                return ERROR_INVALID_INPUT
        # unshuffle block
        dst[:] = planes.T.reshape(-1)

    rem = nbytes - nb * block_size
    if rem:
        if pos == n:
            return ERROR_SRC_OVERFLOW
        if src[pos] != BLOCK_PARTIAL:
            return ERROR_INVALID_INPUT
        pos += 1
        r = _decode_partial(src, pos, n, bpp, rem, out[nb * block_size :])
        if isinstance(r, int) and r < 0:
            return r
        pos = r
    return out


def _decode_partial(src, pos, n, bpp, rbytes, dst):
    line_size = 16 * bpp
    lines = rbytes // line_size
    hdr_w = (bpp + 1) // 2
    if lines:
        if pos + hdr_w >= n:
            return ERROR_SRC_OVERFLOW
        codes = []
        for p in range(bpp):
            codes.append((src[pos + (p >> 1)] >> (4 * (p & 1))) & 15)
        pos += hdr_w
        planes = np.empty((bpp, 16 * lines), dtype=np.uint8)
        for p in range(bpp):
            c = codes[p]
            if c == 0:
                if pos >= n:
                    return ERROR_SRC_OVERFLOW
                planes[p] = src[pos]
                pos += 1
            elif c == 2:
                plane, pos = _decode_plane(src, pos, n, lines, False)
                if plane is None:
                    return ERROR_SRC_OVERFLOW
                planes[p] = plane
            else:
                return ERROR_INVALID_INPUT
        dst[: lines * line_size] = planes.T.reshape(-1)
    rem = rbytes - lines * line_size
    if rem:
        if pos + rem > n:
            return ERROR_SRC_OVERFLOW
        dst[lines * line_size :] = np.frombuffer(src[pos : pos + rem], np.uint8)
        pos += rem
    return pos
