"""Device match-candidate pipeline + native block-encoder fast path.

Covers VERDICT r2 items 7 (device match finding) and weak-4 (per-block
host python): the sort-based candidate kernel's guarantees, the native
C++ twins' byte-identity against the python references, and frame-level
decodability through libzstd (reference behavior: zstd_wrapper.h:59-90).
"""

import numpy as np
import pytest

from stenos_tpu.entropy.match_device import (CAND_DIST_MASK, _parse_py,
                                             match_candidates, matchiness,
                                             parse_from_candidates)
from stenos_tpu.entropy.zstd_frame import encode_block

N = 16384  # small block keeps the CPU-XLA sort chain quick


def _families(rng, n):
    rec = rng.integers(0, 256, 64).astype(np.uint8)
    records = np.tile(rec, n // 64 + 1)[:n].copy()
    records[rng.integers(0, n, n // 64)] = rng.integers(0, 256, n // 64)
    words = [rng.integers(65, 90, rng.integers(3, 10)).astype(np.uint8)
             for _ in range(120)]
    text = np.concatenate(
        [words[i] for i in rng.integers(0, 120, n)])[:n].copy()
    runs = []
    t = 0
    while t < n:
        ln = int(rng.integers(4, 200))
        runs.append(np.full(ln, rng.integers(0, 256), np.uint8))
        t += ln
    runs = np.concatenate(runs)[:n]
    rand = rng.integers(0, 256, n).astype(np.uint8)
    return {"records": records, "text": text, "runs": runs, "random": rand}


@pytest.fixture(scope="module")
def fams():
    return _families(np.random.default_rng(11), N)


def test_candidate_guarantees(fams):
    blocks = np.stack(list(fams.values()))
    cand = match_candidates(blocks)
    rng = np.random.default_rng(0)
    for bi, blk in enumerate(blocks):
        pos = np.flatnonzero(cand[bi])
        if not len(pos):
            continue
        for p in pos[rng.integers(0, len(pos), 200)]:
            c = int(cand[bi][p])
            d = c & CAND_DIST_MASK
            ln = 1 << (c >> 24)
            assert d > 0 and p - d >= 0 and p + ln <= N
            assert np.array_equal(blk[p : p + ln], blk[p - d : p - d + ln])


def test_matchiness_routing(fams):
    frac = matchiness(np.stack(list(fams.values())))
    by = dict(zip(fams.keys(), frac))
    assert by["records"] > 0.5 and by["text"] > 0.5 and by["runs"] > 0.5
    assert by["random"] < 0.01


def test_native_cand_walk_matches_python(fams):
    for blk in fams.values():
        cand = match_candidates(blk)[0]
        r_nat = parse_from_candidates(blk, cand)
        r_py = _parse_py(blk, cand)
        assert (r_nat is None) == (r_py is None)
        if r_nat is not None:
            assert r_nat[0] == [tuple(t) for t in r_py[0]]
            assert np.array_equal(r_nat[1], r_py[1])


def test_native_encode_block_byte_identical(fams):
    from stenos_tpu.native import lib as native

    if native is None or not hasattr(native, "encode_block"):
        pytest.skip("native runtime unavailable")
    for name, blk in fams.items():
        for n in (64, 300, 5000, N):
            d = blk[:n]
            for last in (False, True):
                b_py, r_py = encode_block(d, last, _force_py=True)
                b_nat, r_nat = encode_block(d, last)
                assert b_py == b_nat, (name, n, last)
                assert tuple(r_py) == tuple(r_nat), (name, n, last)


def test_native_reps_chain_across_blocks(fams):
    from stenos_tpu.native import lib as native

    if native is None or not hasattr(native, "encode_block"):
        pytest.skip("native runtime unavailable")
    d = np.concatenate([fams["records"], fams["runs"], fams["text"]])
    step = 8192
    reps_py = reps_nat = None
    for s in range(0, len(d), step):
        c = d[s : s + step]
        last = s + step >= len(d)
        b_py, reps_py = encode_block(c, last, reps_py, _force_py=True)
        b_nat, reps_nat = encode_block(c, last, reps_nat)
        assert b_py == b_nat and tuple(reps_py) == tuple(reps_nat)


def test_cand_blocks_decode_via_libzstd(fams):
    import zstandard

    from stenos_tpu.entropy.zstd_frame import encode_frame_host

    for name, blk in fams.items():
        frame = encode_frame_host(blk)
        back = zstandard.ZstdDecompressor().decompress(
            frame, max_output_size=2 * N)
        assert back == blk.tobytes(), name
        # sequence path must not LOSE to literals-only on matchy families
        if name != "random":
            cand = match_candidates(blk)[0]
            b_seq, _ = encode_block(blk, True, cand=cand)
            b_host, _ = encode_block(blk, True)
            assert len(b_seq) <= int(len(b_host) * 1.05), name
