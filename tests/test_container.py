"""CompressedArray (cvector equivalent) tests, mirroring
tests/test_cvector.cpp behaviors: STL-parity ops, serialize/deserialize
(incl. interop with plain stenos_decompress via the C++ oracle), bulk
apply, metrics."""

import numpy as np
import pytest

import stenos_tpu as st
from stenos_tpu.container import CompressedArray
import _oracle as oracle


def test_append_index_roundtrip(rng):
    v = CompressedArray(np.int32, level=2)
    ref = []
    for x in rng.integers(0, 1 << 30, 5000):
        v.append(x)
        ref.append(int(x))
    assert len(v) == 5000
    assert v[0] == ref[0] and v[-1] == ref[-1]
    idx = rng.integers(0, 5000, 200)
    for i in idx:
        assert v[int(i)] == ref[int(i)]
    assert (v.to_numpy() == np.array(ref, np.int32)).all()


def test_extend_slices_setitem(rng):
    data = np.sort(rng.integers(0, 1 << 40, 70001)).astype(np.int64)
    v = CompressedArray(np.int64, block_shift=2, level=1)
    v.extend(data)
    assert (v[100:200] == data[100:200]).all()
    assert (v[::777] == data[::777]).all()
    v[5:10] = np.arange(5, dtype=np.int64)
    data[5:10] = np.arange(5)
    v[70000] = -1
    data[70000] = -1
    assert (v.to_numpy() == data).all()


def test_apply_and_early_stop(rng):
    data = rng.integers(0, 100, 10000).astype(np.int32)
    v = CompressedArray(np.int32)
    v.extend(data)

    def double(chunk):
        chunk *= 2

    visited = v.apply(double, 100, 5000)
    data[100:5000] *= 2
    # apply works at chunk granularity within [start, stop)
    assert (v.to_numpy()[100:5000] == data[100:5000]).all()
    assert visited == 4900

    count = [0]

    def stop_early(chunk):
        count[0] += 1
        return False

    v.apply(stop_early)
    assert count[0] == 1


def test_serialize_interop_with_reference(rng):
    data = np.sort(rng.integers(0, 1 << 30, 33000)).astype(np.uint32)
    v = CompressedArray(np.uint32, block_shift=3, level=2)
    v.extend(data)
    blob = v.serialize()
    # plain stenos_decompress (C++ reference) must accept the frame
    out = oracle.decompress(blob, 4, data.nbytes)
    assert out == data.tobytes()
    # and our own decompress
    assert st.decompress(blob, 4).tobytes() == data.tobytes()
    # deserialize adopts buckets without decompressing
    w = CompressedArray.deserialize(blob, np.uint32, level=2)
    assert len(w) == len(data)
    assert (w.to_numpy() == data).all()
    assert w[12345] == data[12345]


def test_reference_cvector_frames_decode(rng):
    """A frame produced via our custom-shift compress (what cvector writes)
    round-trips through deserialize."""
    data = rng.integers(0, 1 << 16, 10000).astype(np.uint16)
    frame = st.compress(data.tobytes(), 2, 1, custom_shift=4)
    w = CompressedArray.deserialize(frame, np.uint16)
    assert (w.to_numpy() == data).all()


def test_metrics(rng):
    data = np.sort(rng.integers(0, 1000, 100000)).astype(np.int32)
    v = CompressedArray(np.int32, level=2)
    v.extend(data)
    v.serialize()
    assert v.memory_footprint() > 0
    assert v.current_compression_ratio() > 1.0


def test_eviction_bounded(rng):
    data = rng.integers(0, 1 << 20, 300000).astype(np.int32)
    v = CompressedArray(np.int32, max_raw_buckets=3)
    v.extend(data)
    assert v._raw_count <= 4
    # random access still correct under eviction pressure
    for i in rng.integers(0, len(data), 50):
        assert v[int(i)] == data[int(i)]
