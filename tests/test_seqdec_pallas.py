"""Device FSE sequence-section decode (entropy/seqdec_pallas.py) pinned
against the host C++ twin (stn_zstd_seqs) — raw values, resolved repeat
offsets, and cross-block Repeat_Mode table chaining. Reference behavior:
the uniform zstd decode of every method-2/3/4/5 payload
(/root/reference/stenos/internal/stenos.cpp:694-753, zstd_wrapper.h:59-90);
RFC 8878 §3.1.1.3.2."""

import os

import numpy as np
import pytest
import zstandard as zstd

FULL = bool(os.environ.get("STENOS_FULL_GRID"))

from stenos_tpu.entropy.seqdec_pallas import (decode_sections_device,
                                              prep_section)
from stenos_tpu.entropy.zstd_parse import parse_frame
from stenos_tpu.native import lib

pytestmark = pytest.mark.skipif(lib is None, reason="native runtime missing")


def _families(rng):
    return {
        "text": (b"the quick brown fox jumps over a lazy dog; " * 1500),
        "mixed": bytes(rng.integers(0, 256, 15_000, np.uint8))
                 + b"abcdefgh" * 3000
                 + bytes(rng.integers(0, 8, 20_000, np.uint8)),
        "runs": np.repeat(rng.integers(0, 6, 2000, np.uint8),
                          rng.integers(1, 90, 2000)).tobytes(),
        "ts": np.cumsum(rng.integers(-4, 5, 30_000)).astype(np.int16)
              .tobytes(),
        "near_random": bytes(rng.integers(0, 256, 60_000, np.uint8)),
    }


def _sections(frame: bytes):
    parsed = parse_frame(frame, len(frame))
    assert parsed is not None
    _, blocks, _ = parsed
    out = []
    for spec in blocks:
        if spec.btype != 2 or spec.seq_len == 0:
            continue
        if frame[spec.seq_off] == 0:  # nseq == 0: no bitstream to decode
            continue
        out.append(frame[spec.seq_off : spec.seq_off + spec.seq_len])
    return out


def _check_frame(frame: bytes):
    """Every sequence section of the frame decodes on device to the same
    (ll, ml, resolved off) triples as the host twin, with reps chained
    across blocks in both pipelines."""
    secs = _sections(frame)
    if not secs:
        return 0
    # host twin chain
    ctx_h = lib.zstd_ctx()
    reps_h = np.array([1, 4, 8], np.int64)
    want = []
    for sec in secs:
        r = lib.zstd_seqs(sec, reps_h, ctx_h)
        assert not isinstance(r, int), r
        want.append(r)
    # device chain: O(table) host prep, batched kernel, host rep resolution
    # (out-of-bucket sections take the host RAW walk, same resolve pass)
    ctx_d = lib.zstd_ctx()
    preps, raws = [], []
    for sec in secs:
        p = prep_section(sec, ctx_d)
        raw = None
        if p == -1000:
            raw = lib.zstd_seqs_raw(sec, ctx_d)
            assert not isinstance(raw, int), raw
            p = None
        else:
            assert isinstance(p, dict), p
        preps.append(p)
        raws.append(raw)
    got = decode_sections_device(preps, interpret=True)
    got = [g if g is not None else r for g, r in zip(got, raws)]
    reps_d = np.array([1, 4, 8], np.int64)
    nseq_total = 0
    for (ll_w, ml_w, off_w), g in zip(want, got):
        assert g is not None, "kernel flagged an error"
        ll_d, ml_d, ofv_d = g
        assert (ll_d == ll_w).all()
        assert (ml_d == ml_w).all()
        off_d = lib.resolve_reps(ll_d, ofv_d, reps_d)
        assert not isinstance(off_d, int), off_d
        assert (off_d == off_w).all()
        nseq_total += len(ll_d)
    assert (reps_d == reps_h).all()
    return nseq_total


@pytest.mark.parametrize("level", [1, 3, 9, 19] if FULL else [1, 19])
def test_libzstd_frames_all_families(level):
    rng = np.random.default_rng(7)
    total = 0
    for name, data in _families(rng).items():
        frame = zstd.ZstdCompressor(level=level).compress(data)
        total += _check_frame(frame)
    assert total > 100  # the grid actually exercised sequences


def test_multiblock_repeat_mode_chain():
    """A multi-block frame where later blocks use Repeat_Mode tables and
    repcodes referencing earlier blocks — the cross-block ctx + reps
    chain."""
    rng = np.random.default_rng(3)
    piece = (b"abcdefgh" * 5000 + bytes(rng.integers(0, 16, 40_000,
                                                     np.uint8)))
    data = piece * 4  # > 128 KiB -> several blocks
    frame = zstd.ZstdCompressor(level=7).compress(data)
    assert len(_sections(frame)) > 1
    assert _check_frame(frame) > 8


def test_native_encoder_frames():
    """Sections produced by OUR encoder (entropy/zstd_frame) decode the
    same way — both twins, byte-level contract."""
    from stenos_tpu.entropy.zstd_frame import encode_frame_device

    rng = np.random.default_rng(11)
    recs = rng.integers(0, 50, (3000, 3)).astype(np.uint8)
    recs[:, 0] = np.arange(3000) % 97
    data = recs.tobytes() * 30
    frame = encode_frame_device(np.frombuffer(data, np.uint8),
                                interpret=True, sidecar=False)
    assert zstd.ZstdDecompressor().decompress(
        bytes(frame), max_output_size=len(data) + 1) == data
    _check_frame(bytes(frame))


def test_rle_and_predefined_channels():
    """Force tiny sequence counts (predefined tables) and RLE channels."""
    for data in (b"abcabcabcXY" * 40, b"z" * 4000 + b"q" * 4000):
        frame = zstd.ZstdCompressor(level=1).compress(data)
        _check_frame(frame)


def test_raw_walk_twin():
    """The host RAW walk (stn_zstd_seqs_raw, the out-of-bucket fallback)
    produces the same values the device kernel would: raw triples +
    resolve_reps == stn_zstd_seqs."""
    rng = np.random.default_rng(5)
    data = (bytes(rng.integers(0, 256, 8000, np.uint8))
            + b"qrstuv" * 4000)
    frame = zstd.ZstdCompressor(level=5).compress(data)
    for sec in _sections(frame):
        ctx1, ctx2 = lib.zstd_ctx(), lib.zstd_ctx()
        reps1 = np.array([1, 4, 8], np.int64)
        reps2 = np.array([1, 4, 8], np.int64)
        ll_w, ml_w, off_w = lib.zstd_seqs(sec, reps1, ctx1)
        ll_r, ml_r, ofv_r = lib.zstd_seqs_raw(sec, ctx2)
        off_r = lib.resolve_reps(ll_r, ofv_r, reps2)
        assert (ll_r == ll_w).all() and (ml_r == ml_w).all()
        assert (off_r == off_w).all() and (reps1 == reps2).all()


def test_corrupt_section_flags_error():
    """A truncated bitstream must trip the consumed-exactly check, not
    return wrong values silently."""
    data = b"the quick brown fox jumps over a lazy dog; " * 2000
    frame = zstd.ZstdCompressor(level=3).compress(data)
    sec = _sections(frame)[0]
    ctx = lib.zstd_ctx()
    p = prep_section(sec, ctx)
    assert isinstance(p, dict)
    # corrupt: claim one more sequence than the stream encodes
    p2 = dict(p)
    p2["nseq"] = p["nseq"] + 1
    got = decode_sections_device([p2], interpret=True)
    assert got[0] is None
