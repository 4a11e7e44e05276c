"""Large-bytesoftype coverage (VERDICT r4 missing 6).

The reference supports bytesoftype up to STENOS_MAX_BYTESOFTYPE =
(2^24-1)/256 = 65535 (stenos.h:57-65); element widths past the specialized
shuffle kernels take the generic/fallback ladder (shuffle-generic.h:33-75,
method 2/3/4 zstd paths). Spot checks at bpp 24 / 64 / 300 pin our
fallback ladder: self round-trip across levels, byte-identical frames vs
the C++ oracle, and the MAX_BYTESOFTYPE boundary error.
"""

import numpy as np
import pytest

import stenos_tpu as st
from stenos_tpu.constants import MAX_BYTESOFTYPE
from stenos_tpu.frame import StenosError
from conftest import gen_elements


@pytest.mark.parametrize("bpp", [24, 64, 300])
@pytest.mark.parametrize("dist", ["sorted", "random", "same"])
def test_large_bpp_roundtrip(rng, bpp, dist):
    for level in (0, 1, 2, 5):
        # ~1.5 superblocks of elements plus a partial tail element chunk
        n = bpp * 700 + bpp // 3
        data = gen_elements(rng, 1, n, dist)
        frame = st.compress(data, bpp, level)
        assert st.decompress(frame, bpp).tobytes() == data
        if dist == "same" and level >= 1:
            assert len(frame) < len(data) // 4


@pytest.mark.parametrize("bpp", [24, 64, 300])
def test_large_bpp_oracle_parity(rng, bpp):
    """Byte-identity vs the reference at bpp > 16.

    Element counts are multiples of 256 here because the reference has a
    heap overflow at bytesoftype >= 20 whenever a PARTIAL block exists:
    compression_buffer_size (block_compress.h:328) allots partial_buffer
    only 256 bytes, but block_compress_partial memcpy+memsets 256 *
    bytesoftype bytes into it (block_compress.h:965-966; the comment at
    :311 says 'size 256*BPP'). For bpp <= 19 the overflow lands inside
    the same allocation's packs/firsts slack; at bpp >= 20 it corrupts
    the heap (reproduced: malloc 'invalid size (unsorted)' aborts).
    Partial-block behavior at large bpp is covered by our own round-trip
    test above; see NOTES.md, reference bugs."""
    _oracle = pytest.importorskip("_oracle")
    try:
        _oracle.get_lib()
    except Exception:
        pytest.skip("reference oracle unavailable")
    for level in (1, 2, 5):
        data = gen_elements(rng, 1, bpp * 512, "sorted")
        ours = st.compress(data, bpp, level)
        ref = _oracle.compress(data, bpp, level)
        assert ours == ref, (bpp, level, len(ours), len(ref))
        assert st.decompress(ref, bpp).tobytes() == data
        # reference-decodes-ours: at bpp 300 a superblock is exactly ONE
        # block (76800 B), so every full-block input is an exact
        # superblock multiple — which the reference REJECTS by its own
        # last-superblock bug (stenos.cpp:1131; tests/test_frame_parity
        # pins it). There is no bpp-300 size that avoids both reference
        # bugs, so that direction is skipped there.
        if bpp * 512 % ((131072 // (bpp * 256)) * bpp * 256 or bpp * 256):
            assert _oracle.decompress(ours, bpp, len(data)) == data


def test_max_bytesoftype_boundary(rng):
    # bpp = MAX-1 is legal (one 256-element block is ~16.7 MB; use a
    # 4-element input so the partial/fallback path carries it)
    bpp = MAX_BYTESOFTYPE - 1
    data = gen_elements(rng, 1, bpp * 4, "same")
    frame = st.compress(data, bpp, 1)
    assert st.decompress(frame, bpp).tobytes() == data
    # bpp >= MAX (and 0) are rejected like the reference (stenos.cpp:119)
    for bad in (0, MAX_BYTESOFTYPE, MAX_BYTESOFTYPE + 7):
        with pytest.raises(StenosError) as e:
            st.compress(data, bad, 1)
        assert e.value.code == -7  # STENOS_ERROR_INVALID_BYTESOFTYPE
        with pytest.raises(StenosError):
            st.decompress(frame, bad)
