"""Bit-exact parity and interop vs the C++ reference (oracle).

Mirrors the reference codec sweep (tests_comp_decomp.cpp) with the added
requirement that compressed frames are byte-identical, and both decoders
accept each other's frames.
"""

import numpy as np
import pytest

import stenos_tpu as st
import _oracle as oracle
from conftest import gen_elements


# full element-size sweep like the reference (tests_comp_decomp.cpp:181-216
# sweeps 1-15; we add 16): the format's interesting corners live at the odd
# widths (5,6,7,9,10,11,13,14,15)
ALL_BPP = list(range(1, 17))


@pytest.mark.parametrize("kind", ["sorted", "random", "same", "rle", "smallrange"])
@pytest.mark.parametrize("bpp", ALL_BPP)
def test_frame_bit_exact(rng, kind, bpp):
    for ne in [0, 1, 100, 5000, 70001]:
        for level in [0, 1, 2, 5, 9]:
            data = gen_elements(rng, bpp, ne, kind)
            ref = oracle.compress(data, bpp, level)
            mine = st.compress(data, bpp, level)
            assert mine == ref, (kind, bpp, ne, level)
            assert st.decompress(ref, bpp).tobytes() == data
            assert oracle.decompress(mine, bpp, len(data)) == data


@pytest.mark.parametrize("level", [3, 4, 6, 7, 8])
@pytest.mark.parametrize("bpp", ALL_BPP)
def test_frame_bit_exact_mid_levels(rng, level, bpp):
    """Mid levels exercise the superblock shift growth, the transposed-LZ
    estimators and the higher zstd levels of the decision tree."""
    for kind in ["sorted", "random", "rle"]:
        for ne in [5000, 70001]:
            data = gen_elements(rng, bpp, ne, kind)
            ref = oracle.compress(data, bpp, level)
            mine = st.compress(data, bpp, level)
            assert mine == ref, (kind, bpp, ne, level)
            assert st.decompress(ref, bpp).tobytes() == data
            assert oracle.decompress(mine, bpp, len(data)) == data


def test_exact_superblock_multiple_decodes(rng):
    """The reference decoder rejects exact superblock multiples
    (stenos.cpp:1131 latent bug); our decoder must handle them."""
    data = gen_elements(rng, 4, 131072 // 4, "sorted")
    assert len(data) == 131072
    frame = st.compress(data, 4, 1)
    assert st.decompress(frame, 4).tobytes() == data
    # two full superblocks
    data2 = gen_elements(rng, 4, 262144 // 4, "sorted")
    frame2 = st.compress(data2, 4, 2)
    assert st.decompress(frame2, 4).tobytes() == data2


def test_get_info(rng):
    data = gen_elements(rng, 4, 100000, "sorted")
    frame = st.compress(data, 4, 3)
    dsize, sb, hlen = st.get_info(frame, 4)
    assert dsize == len(data)
    assert hlen == 8
    assert sb == st.super_block_size(1024) << 1  # level 3 -> shift 1


def test_bound():
    for n in [0, 1, 1000, 65792, 65793, 10**7]:
        assert st.compress_bound(n) == oracle.bound(n)


def test_lz_table_persists_across_blocks():
    """Match-rich data whose LZ escapes depend on the hash table carrying
    over BETWEEN blocks — and, at level 1, between SUPERBLOCKS: the
    reference's table is a per-iteration stack slot that survives its
    block loop (block_compress.h:1211) and, single-threaded at level 1,
    the whole frame (found by tools/fuzz_parity.py; NOTES.md). The table
    is frame-scoped at level 1 here, so multi-superblock frames must be
    bit-exact too."""
    rng = np.random.default_rng(5262529557974360290)
    pool = rng.integers(0, 64, (37, 64), np.uint8)
    for bpp, n_sb in ((4, 1), (8, 1), (16, 3)):
        sb = st.super_block_size(256 * bpp)
        n = sb * n_sb + 1792
        idx = rng.integers(0, 37, n // 64 + 1)
        data = pool[idx].reshape(-1)[:n].tobytes()
        mine = st.compress(np.frombuffer(data, np.uint8), bpp, 1)
        ref = oracle.compress(data, bpp, 1)
        assert mine == ref, (bpp, len(mine), len(ref))
        assert st.decompress(mine, bpp).tobytes() == data


def test_lz_budget_covers_partial_tail():
    """A short superblock (one full block + partial tail): the LZ escape's
    dst-room precondition must budget the SUPERBLOCK's total input size
    (the reference passes it as dst_size, stenos.cpp:547) — budgeting only
    the full-block region suppressed the attempt and the frame fell back
    to COPY, 8% larger than the reference (fuzz seed 3428548311448695019)."""
    rng = np.random.default_rng(3428548311448695019)
    pool = rng.integers(0, 64, (37, 64), np.uint8)
    bpp = 16
    n = 4096 + 1792  # 1 full block + partial, < one superblock
    idx = rng.integers(0, 37, n // 64 + 1)
    data = pool[idx].reshape(-1)[:n].tobytes()
    mine = st.compress(np.frombuffer(data, np.uint8), bpp, 1)
    ref = oracle.compress(data, bpp, 1)
    assert mine == ref, (len(mine), len(ref))
    assert mine[8] == 1, "expected method BLOCK, not COPY"
    assert st.decompress(mine, bpp).tobytes() == data
