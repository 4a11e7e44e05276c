"""RFC 8878 zstd frame assembly with Huffman-compressed literals.

Host/numpy reference implementation of the TPU entropy stage's format layer
(the device kernel in huff_pallas.py produces the same bitstreams for the
bulk path). No sequences yet — every block is literals-only — so output is
plain standard zstd, decodable by libzstd and by the C++ reference's
decompressor (zstd_wrapper.h), at entropy-only compression ratios.
"""

import numpy as np

from .fse import BitWriter, fse_compress
from .huffman import build_ctable, code_lengths, weights_of

BLOCK_MAX = 128 * 1024
HUF_WEIGHT_TABLELOG = 6


def huffman_tree_description(lengths: np.ndarray) -> bytes | None:
    """Serialized Huffman tree (RFC 8878 §4.2.1.1): FSE-compressed weights,
    falling back to direct 4-bit weights for small alphabets."""
    weights, _ = weights_of(lengths)
    used = np.nonzero(weights)[0]
    last = int(used[-1])
    transmitted = weights[:last]  # last used symbol's weight is implicit
    comp = fse_compress(transmitted, 11, HUF_WEIGHT_TABLELOG) \
        if len(transmitted) else None
    if comp is not None and len(comp) < 128 and len(comp) < (
            len(transmitted) + 1) // 2 + 1:
        return bytes([len(comp)]) + comp
    if last <= 127:
        out = bytearray([127 + len(transmitted)])
        for i in range(0, len(transmitted), 2):
            hi = int(transmitted[i])
            lo = int(transmitted[i + 1]) if i + 1 < len(transmitted) else 0
            out.append((hi << 4) | lo)
        return bytes(out)
    if comp is not None and len(comp) < 128:
        return bytes([len(comp)]) + comp
    return None


def huf_encode_stream(data: np.ndarray, codes, lens) -> bytes:
    """One Huffman bitstream: symbols emitted in reverse order, stream read
    backward by the decoder."""
    bw = BitWriter()
    for s in data[::-1]:
        bw.add(int(codes[s]), int(lens[s]))
    return bw.close()


def compress_literals(data: np.ndarray):
    """-> (literals_section bytes, ok). data: uint8 array (<= BLOCK_MAX)."""
    n = len(data)
    if n < 64:
        return None
    counts = np.bincount(data, minlength=256)
    lens = code_lengths(counts)
    if int((lens > 0).sum()) < 2:
        return None  # RLE/raw territory
    codes, lens = build_ctable(lens)
    tree = huffman_tree_description(lens)
    if tree is None:
        return None
    s1 = (n + 3) // 4
    streams = [data[:s1], data[s1:2 * s1], data[2 * s1:3 * s1],
               data[3 * s1:]]
    encoded = [huf_encode_stream(s, codes, lens) for s in streams]
    if any(len(e) > 0xFFFF for e in encoded[:3]):
        return None
    jump = b"".join(len(e).to_bytes(2, "little") for e in encoded[:3])
    payload = tree + jump + b"".join(encoded)
    csize = len(payload)
    if csize >= n:
        return None
    # literals section header: type=2 (Compressed), size_format=3
    # (4 streams, 18-bit sizes, 5-byte header)
    hdr = 2 | (3 << 2) | (n << 4) | (csize << 22)
    return hdr.to_bytes(5, "little") + payload


def encode_block(data: np.ndarray, last: bool) -> bytes:
    n = len(data)
    if n and (data == data[0]).all():
        bh = int(last) | (1 << 1) | (n << 3)
        return bh.to_bytes(3, "little") + bytes([int(data[0])])
    lit = compress_literals(data)
    if lit is None:
        bh = int(last) | (0 << 1) | (n << 3)
        return bh.to_bytes(3, "little") + data.tobytes()
    content = lit + b"\x00"  # sequences section: 0 sequences
    if len(content) >= n:
        bh = int(last) | (0 << 1) | (n << 3)
        return bh.to_bytes(3, "little") + data.tobytes()
    bh = int(last) | (2 << 1) | (len(content) << 3)
    return bh.to_bytes(3, "little") + content


def encode_frame_host(data) -> bytes:
    """data: bytes / uint8 array -> a standard zstd frame (single segment,
    4-byte content size, literals-only blocks)."""
    data = np.frombuffer(bytes(data), np.uint8) if not isinstance(
        data, np.ndarray) else np.asarray(data, np.uint8)
    n = len(data)
    out = bytearray()
    out += (0xFD2FB528).to_bytes(4, "little")
    out += bytes([0xA0])  # FCS 4 bytes, single segment
    out += n.to_bytes(4, "little")
    if n == 0:
        out += (1 | (0 << 1) | (0 << 3)).to_bytes(3, "little")
        return bytes(out)
    pos = 0
    while pos < n:
        chunk = data[pos : pos + BLOCK_MAX]
        pos += len(chunk)
        out += encode_block(chunk, pos >= n)
    return bytes(out)
