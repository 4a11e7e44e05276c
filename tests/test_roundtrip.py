"""Self round-trip tests including the shrinking-destination sweep
(tests_comp_decomp.cpp:115-176 behavior)."""

import numpy as np
import pytest

import stenos_tpu as st
from stenos_tpu.frame import StenosError
from conftest import gen_elements


def test_shrinking_dst(rng):
    data = gen_elements(rng, 4, 40000, "sorted")
    full = st.compress(data, 4, 2)
    bound = st.compress_bound(len(data))
    # from bound down: either a valid (decodable) frame or DST_OVERFLOW
    for dst_size in list(range(len(full) + 8, len(full) - 20, -1)) + [
        len(full) // 2, 16, 8, 4, 1, 0,
    ]:
        try:
            frame = st.compress(data, 4, 2, dst_size=dst_size)
        except StenosError as e:
            assert e.code == -6  # DST_OVERFLOW
            continue
        assert len(frame) <= max(dst_size, 0)
        assert st.decompress(frame, 4).tobytes() == data


def test_all_levels_roundtrip(rng):
    for bpp in [1, 2, 4, 8, 16]:
        data = gen_elements(rng, bpp, 33000, "sorted")
        for level in range(10):
            frame = st.compress(data, bpp, level)
            assert st.decompress(frame, bpp).tobytes() == data


def test_empty_and_tiny(rng):
    for n in [0, 1, 2, 3, 17]:
        data = gen_elements(rng, 1, n, "random")
        frame = st.compress(data, 1, 2)
        assert st.decompress(frame, 1).tobytes() == data


def test_custom_blocksize_shift(rng):
    from stenos_tpu.frame import compress

    data = gen_elements(rng, 4, 30000, "sorted")
    frame = compress(data, 4, 2, custom_shift=3)
    assert frame[0] == 255
    dsize, sb, hlen = st.get_info(frame, 4)
    assert sb == 1024 << 3 and hlen == 12
    assert st.decompress(frame, 4).tobytes() == data
