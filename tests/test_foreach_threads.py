"""Element-wise for_each contract (cvector.hpp:2283-2312) and host-thread
fan-out (stenos.cpp:909-1016)."""

import numpy as np
import pytest

import stenos_tpu as st
from stenos_tpu.container import CompressedArray


def _arr(n=5000, seed=0):
    rng = np.random.default_rng(seed)
    a = CompressedArray(dtype=np.int32, level=1)
    vals = rng.integers(0, 1000, n).astype(np.int32)
    a.extend(vals)
    return a, vals


def test_for_each_visits_all_and_counts():
    a, vals = _arr()
    seen = []
    n = a.const_for_each(lambda x: seen.append(int(x)) or True)
    assert n == len(vals)
    assert seen == [int(v) for v in vals]


def test_for_each_void_functor_continues():
    # a visitor returning None must visit everything (the reference's
    # eval_functor void dispatch)
    a, vals = _arr(n=700)
    seen = []
    n = a.const_for_each(lambda x: seen.append(int(x)))
    assert n == len(vals) == len(seen)


def test_for_each_early_stop_excludes_failing_element():
    a, vals = _arr()
    stop_at = 1234  # stop once this many elements accepted
    box = [0]

    def fn(x):
        if box[0] == stop_at:
            return False
        box[0] += 1
        return True

    n = a.const_for_each(fn)
    assert n == stop_at  # failing element NOT counted


def test_for_each_range_and_backward():
    a, vals = _arr()
    seen = []
    n = a.const_for_each(lambda x: seen.append(int(x)), start=100, stop=300)
    assert n == 200
    assert seen == [int(v) for v in vals[100:300]]
    seen_b = []
    a.const_for_each_backward(lambda x: seen_b.append(int(x)),
                              start=100, stop=300)
    assert seen_b == [int(v) for v in vals[100:300][::-1]]


@pytest.mark.parametrize("level", [1, 2, 3])
def test_threaded_compress_roundtrips(level):
    rng = np.random.default_rng(7)
    data = np.cumsum(rng.normal(0, 80, 300_000)).astype("<i4").view(np.uint8)
    f1 = st.compress(data, 4, level)
    f4 = st.frame.compress(data, 4, level, threads=4)
    # threaded frames are valid stenos frames that decode identically
    assert bytes(st.decompress(f4, 4, len(data))) == data.tobytes()
    # and the 1-thread frame stays the parity oracle
    assert bytes(st.decompress(f1, 4, len(data))) == data.tobytes()


def test_threaded_compress_single_superblock_matches_serial():
    rng = np.random.default_rng(8)
    data = rng.integers(0, 50, 65536).astype(np.uint8)
    f1 = st.compress(data, 1, 2)
    f4 = st.frame.compress(data, 1, 2, threads=8)
    assert f1 == f4  # <= 1 superblock: fan-out path not taken
