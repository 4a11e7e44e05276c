"""Device-resident compressed array (cvector TPU mode)."""

import numpy as np
import pytest

import stenos_tpu as st
from stenos_tpu.device_container import DeviceCompressedArray

from conftest import gen_elements


@pytest.mark.parametrize("kind", ["sorted", "random", "rle"])
def test_roundtrip_and_access(rng, kind):
    # small slabs (nb=4 blocks) keep interpret-free CPU XLA fast
    a = np.frombuffer(gen_elements(rng, 4, 3000, kind), "<u4")
    arr = DeviceCompressedArray.from_array(a, slab_elems=1024)
    assert len(arr) == len(a)
    assert (arr.to_array() == a).all()
    assert arr[0] == a[0]
    assert arr[len(a) - 1] == a[-1]
    assert arr[17] == a[17]
    assert (arr[100:200] == a[100:200]).all()
    assert arr.memory_footprint() > 0
    # slab() returns the raw bytes of one slab
    got = np.asarray(arr.slab(0)).view("<u4")
    assert (got == a[:1024]).all()


def test_serialize_is_standard_frame(rng):
    a = np.frombuffer(gen_elements(rng, 4, 5000, "sorted"), "<u4")
    arr = DeviceCompressedArray.from_array(a, slab_elems=1024)
    frame = arr.serialize()
    back = st.decompress(frame, 4)
    assert bytes(back) == a.tobytes()


def test_deserialize_adopts_foreign_frame(rng):
    a = np.frombuffer(gen_elements(rng, 4, 4096, "sorted"), "<u4")
    # a frame produced by the plain compressor with a custom blocksize
    from stenos_tpu import frame as fr

    frame = fr.compress(a.view(np.uint8), 4, 1, custom_shift=2)
    arr = DeviceCompressedArray.deserialize(frame, "<u4")
    assert (arr.to_array() == a).all()
    # and round again
    assert bytes(st.decompress(arr.serialize(), 4)) == a.tobytes()


def test_compression_happens(rng):
    # default (128-block) slabs amortize the bucket padding; the index costs
    # a fixed 18.75% of raw (see the class docstring)
    a = np.frombuffer(gen_elements(rng, 4, 96 * 1024, "smallrange"), "<u4")
    arr = DeviceCompressedArray.from_array(a)
    assert arr.current_compression_ratio() > 2.0
