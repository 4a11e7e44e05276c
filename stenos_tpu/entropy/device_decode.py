"""Device-side decompression of sidecar-equipped zstd entropy payloads.

Covers the entropy half of methods ZSTD / TRANSPOSED_ZSTD /
TRANSPOSED_DELTA_ZSTD for payloads produced by encode_frame_device with
the anchor sidecar: the host walks only the frame/block/section HEADERS
(O(metadata)), the huffman bitstreams decode on the TPU
(huff_decode_pallas), and the result stays in HBM for the follow-on device
unshuffle / delta_inv. Payloads without a sidecar (libzstd-produced,
sequence blocks, tail blocks) return None and the caller falls back to
host libzstd — the graceful-degradation ladder of stenos.cpp:681-753.
"""

import numpy as np

from .sidecar import split_sidecar

BLOCK_MAX = 131072


def _parse_blocks(payload: bytes, frame_end: int):
    """Walk the zstd frame headers -> per-block descriptors."""
    if len(payload) < 9 or payload[:4] != (0xFD2FB528).to_bytes(4, "little"):
        return None
    if payload[4] != 0xA0:  # FCS 4 bytes, single segment (our writer)
        return None
    content = int.from_bytes(payload[5:9], "little")
    p = 9
    blocks = []
    last = False
    while not last and p + 3 <= frame_end:
        bh = int.from_bytes(payload[p : p + 3], "little")
        last = bool(bh & 1)
        btype = (bh >> 1) & 3
        bsize = bh >> 3
        p += 3
        blocks.append((btype, p, bsize))
        if btype == 1:  # RLE: 1 byte payload
            p += 1
        else:
            p += bsize
    if not last or p > frame_end:
        return None
    return content, blocks


def _parse_device_block(payload: bytes, start: int, bsize: int):
    """Our device block layout: 5-byte literals header (type 2, sf 3),
    tree desc, 6-byte jump table, 4 streams, 1 zero sequences byte.
    Returns (regenerated, [4 stream byte spans]) or None."""
    end = start + bsize
    h = int.from_bytes(payload[start : start + 5], "little")
    if (h & 3) != 2 or ((h >> 2) & 3) != 3:
        return None
    regenerated = (h >> 4) & 0x3FFFF
    csize = (h >> 22) & 0x3FFFF
    p = start + 5
    tb = payload[p]
    if tb < 128:
        tree_len = 1 + tb
    else:
        tree_len = 1 + ((tb - 127) + 1) // 2
    lit_end = p + csize
    p += tree_len
    if p + 6 > lit_end or lit_end > end:
        return None
    j1 = int.from_bytes(payload[p : p + 2], "little")
    j2 = int.from_bytes(payload[p + 2 : p + 4], "little")
    j3 = int.from_bytes(payload[p + 4 : p + 6], "little")
    p += 6
    s4 = lit_end - (p + j1 + j2 + j3)
    if s4 <= 0:
        return None
    spans = [(p, j1), (p + j1, j2), (p + j1 + j2, j3),
             (p + j1 + j2 + j3, s4)]
    if payload[lit_end:end] != b"\x00":  # zero sequences only
        return None
    return regenerated, spans


def decode_payload_device(payload, dsize: int, interpret: bool = False):
    """payload: method-2/3/4 superblock payload (zstd frame [+ sidecar]).
    Returns a device (dsize,) uint8 array, or None when the payload isn't
    fully device-decodable."""
    import jax
    import jax.numpy as jnp

    from .huff_decode_pallas import decode_streams_device, decode_tables

    payload = bytes(payload)
    frame_end, entries = split_sidecar(payload)
    if entries is None:
        return None
    parsed = _parse_blocks(payload, frame_end)
    if parsed is None:
        return None
    content, blocks = parsed
    if content != dsize or len(blocks) != len(entries):
        return None
    nfull = 0
    specs = []
    for (btype, start, bsize), ent in zip(blocks, entries):
        if ent is None:
            return None  # v1: all blocks must be device blocks
        if btype != 2:
            return None
        pb = _parse_device_block(payload, start, bsize)
        if pb is None or pb[0] != BLOCK_MAX:
            return None
        specs.append((pb[1], ent))
        nfull += 1
    if nfull * BLOCK_MAX != dsize:
        return None

    ns = nfull * 4
    eb = max(max(ln for spans, _ in specs for (_, ln) in spans), 1)
    eb = -(-(eb) // 128) * 128
    sb = np.zeros((ns, eb), np.uint8)
    anch = np.zeros((ns, 256), np.int32)
    tabs = np.zeros((ns, 304), np.int32)
    pv = np.frombuffer(payload, np.uint8)
    for b, (spans, (lens, anchors)) in enumerate(specs):
        tab = decode_tables(lens)
        for s, (off, ln) in enumerate(spans):
            sb[4 * b + s, :ln] = pv[off : off + ln]
            anch[4 * b + s] = anchors[s]
            tabs[4 * b + s] = tab[0]
    dev = jax.devices()[0]
    out = decode_streams_device(
        jax.device_put(jnp.asarray(sb), dev),
        jax.device_put(jnp.asarray(anch), dev),
        jax.device_put(jnp.asarray(tabs), dev), interpret)
    return out.reshape(dsize).astype(jnp.uint8)
