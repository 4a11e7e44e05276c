"""Native zstd block machinery vs libzstd (reference: zstd_wrapper.h:59-90,
stenos.cpp:694-753 — every method-2/3/4/5 payload decodes through full zstd).

decode_frame_native runs the clean-room host primitives (stn_huf_lits,
stn_zstd_seqs) over frames produced by libzstd at several levels and by our
own encoders, so the FSE/Huffman/sequence layers are pinned bit-exact before
the device executor builds on them.
"""

import numpy as np
import pytest
import zstandard as zstd

from stenos_tpu.entropy.zstd_frame import encode_frame_host
from stenos_tpu.entropy.zstd_parse import decode_frame_native, parse_frame
from stenos_tpu.native import lib

pytestmark = pytest.mark.skipif(lib is None, reason="native runtime missing")


def _families(rng):
    text = (b"the quick brown fox jumps over the lazy dog " * 4000)
    return {
        "text": text,
        "rand": rng.integers(0, 256, 100_000, np.uint8).tobytes(),
        "runs": np.repeat(rng.integers(0, 8, 4000, np.uint8),
                          rng.integers(1, 60, 4000)).tobytes(),
        "ts": np.cumsum(rng.integers(-3, 4, 300_000)).astype(np.int16)
              .tobytes(),
        "small": b"hello world",
        "empty": b"",
    }


@pytest.mark.parametrize("level", [1, 3, 9, 19])
def test_libzstd_frames_decode(level):
    rng = np.random.default_rng(0)
    for name, data in _families(rng).items():
        c = zstd.ZstdCompressor(level=level).compress(data)
        assert decode_frame_native(c) == data, (name, level)


@pytest.mark.parametrize("checksum", [False, True])
def test_multiblock_and_checksum(checksum):
    rng = np.random.default_rng(7)
    for n in (131_072, 131_073, 400_000):
        data = np.repeat(rng.integers(0, 40, n // 17 + 1, np.uint8),
                         17)[:n].tobytes()
        c = zstd.ZstdCompressor(level=3, write_checksum=checksum)\
            .compress(data)
        assert decode_frame_native(c) == data


def test_own_host_encoder_frames():
    rng = np.random.default_rng(3)
    for n in (0, 100, 131_072, 400_000):
        data = np.repeat(rng.integers(0, 40, n // 9 + 1, np.uint8), 9)[:n]
        f = encode_frame_host(data)
        assert decode_frame_native(f) == data.tobytes()


def test_parse_frame_rejects_garbage():
    assert parse_frame(b"") is None
    assert parse_frame(b"\x00" * 16) is None
    c = zstd.ZstdCompressor(level=3).compress(b"x" * 1000)
    assert parse_frame(c[:-2]) is None  # truncated last block


def test_seq_ops_program_overlap():
    """The W-chunked op builder replicates overlapping matches correctly
    when executed with the ordered-overwrite rule."""
    lib_ = lib
    W = 16
    # literal "abc", then match off=3 len=20 (period-3 replication), then
    # literal "XY": abcabcabc...XY
    ll = np.array([3, 2], np.int32)
    ml = np.array([20, 0], np.int32)
    off = np.array([3, 1], np.int64)
    # zstd spec: a sequence always has ml >= 3; emulate the tail literal
    # via trailing instead
    ll = ll[:1]
    ml = ml[:1]
    off = off[:1]
    lits = np.frombuffer(b"abcXY", np.uint8)
    total = 3 + 20 + 2
    ops = lib_.seq_ops(ll, ml, off, 0, 0, trailing=2, out_limit=total, W=W)
    assert not isinstance(ops, int)
    out = np.zeros(total + W, np.uint8)
    litbuf = np.zeros(len(lits) + W, np.uint8)
    litbuf[: len(lits)] = lits
    for dst, src, flag in ops:
        src_buf = litbuf if flag else out
        out[dst : dst + W] = src_buf[src : src + W]
    assert out[:total].tobytes() == (b"abc" * 8)[:23] + b"XY"


def test_seq_ops_bounds():
    ll = np.array([0], np.int32)
    ml = np.array([8], np.int32)
    off = np.array([4], np.int64)  # offset into nothing: invalid
    r = lib.seq_ops(ll, ml, off, 0, 0, 0, 100, W=16)
    assert isinstance(r, int) and r < 0


def test_huf_tree_lens_matches_rebuild():
    """stn_huf_tree_lens must return EXACTLY the code lengths the section
    was encoded with (== the deterministic rebuild from the histogram,
    compress_literals); drives the sequence-block anchor sidecar."""
    from stenos_tpu.entropy.huffman import build_ctable, code_lengths
    from stenos_tpu.entropy.zstd_frame import compress_literals

    rng = np.random.default_rng(9)
    for hi, n in ((8, 20000), (40, 5003), (200, 70001), (255, 131072),
                  (16, 64)):
        data = rng.integers(0, hi, n).astype(np.uint8)
        sec = compress_literals(data)
        if sec is None:
            continue
        lens_ref = code_lengths(np.bincount(data, minlength=256))
        _, lens_ref = build_ctable(lens_ref)
        r = lib.huf_tree_lens(sec[5:])
        assert not isinstance(r, int), (hi, n, r)
        lens, desc_len = r
        assert 0 < desc_len <= 129
        assert (lens.astype(np.int64)
                == np.asarray(lens_ref, np.int64)).all(), (hi, n)
