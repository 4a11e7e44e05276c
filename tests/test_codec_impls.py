"""Cross-checks between the three block-stream decoder implementations
(python, native C++, device JAX) — any frame must decode identically."""

import numpy as np
import pytest

import stenos_tpu as st
from stenos_tpu.codec.decode_np import block_codec_decode
from stenos_tpu.codec.encode_np import block_codec_encode
from stenos_tpu.native import lib as native
from conftest import gen_elements


@pytest.mark.parametrize("kind", ["sorted", "random", "rle", "same"])
def test_python_vs_native_decoder(rng, kind):
    assert native is not None
    for bpp in [1, 3, 4, 8]:
        for ne in [256, 5000, 20001]:
            data = gen_elements(rng, bpp, ne, kind)
            arr = np.frombuffer(data, np.uint8)
            stream = block_codec_encode(arr.copy(), bpp, 2 * len(arr) + 1024)
            assert not isinstance(stream, int)
            py = block_codec_decode(stream, bpp, len(arr))
            nat = native.block_decode(stream, bpp, len(arr))
            assert not isinstance(py, int) and not isinstance(nat, int)
            assert (py == arr).all()
            assert (nat == arr).all()


def test_decoders_reject_truncation(rng):
    data = gen_elements(rng, 4, 5000, "sorted")
    arr = np.frombuffer(data, np.uint8)
    stream = block_codec_encode(arr.copy(), 4, 2 * len(arr) + 1024)
    # cut == 0 is not an error per reference semantics (block_decompress
    # returns 0 consumed for size==0; the frame layer catches the size
    # mismatch) — start at 1.
    for cut in [1, len(stream) // 2, len(stream) - 1]:
        py = block_codec_decode(stream[:cut], 4, len(arr))
        nat = native.block_decode(stream[:cut], 4, len(arr))
        assert isinstance(py, int) and py < 0
        assert isinstance(nat, int) and nat < 0
