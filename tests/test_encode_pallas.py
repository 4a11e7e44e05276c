"""Pallas encode mega-kernel parity vs the XLA pipeline (interpret mode).

The XLA pipeline (encode_superblocks_body) is itself bit-exact vs the C++
reference (tests/test_engine_jax.py, tests/test_frame_parity.py); this locks
the Pallas kernel to the same bytes. Small shapes only — interpret mode is
slow; the driver's TPU bench covers the compiled path at scale.
"""

import numpy as np
import pytest

import jax

from stenos_tpu.engine_jax import encode_superblocks_body
from stenos_tpu.ops.encode_pallas import encode_slabs_body, slab_nb

from conftest import gen_elements


@pytest.mark.parametrize("bpp", [2, 3, 4, 8])
@pytest.mark.parametrize("kind", ["sorted", "random", "rle"])
def test_kernel_matches_xla(rng, bpp, kind):
    for nb, level in ((1, 2), (3, 1), (8, 2)):
        sbytes = nb * 256 * bpp
        n_sb = 2
        raw = np.frombuffer(
            gen_elements(rng, bpp, (n_sb * sbytes) // bpp + 1, kind), np.uint8
        )[: n_sb * sbytes]
        batch = raw.reshape(n_sb, sbytes)
        out0, tot0, bs0, fs0 = encode_superblocks_body(
            jax.numpy.asarray(batch), bpp, level)
        out0, tot0 = np.asarray(out0), np.asarray(tot0)
        bs0, fs0 = np.asarray(bs0), np.asarray(fs0)
        rows, tot1, bs1, fs1 = encode_slabs_body(
            jax.numpy.asarray(batch), bpp, level, interpret=True)
        rows, tot1 = np.asarray(rows), np.asarray(tot1)
        assert (np.asarray(bs1) == bs0).all()
        assert (np.asarray(fs1) == fs0).all()
        for i in range(n_sb):
            want = (bytes([1]) + int(tot0[i]).to_bytes(3, "little")
                    + bytes(out0[i][: tot0[i]]))
            got = bytes(rows[i][: tot1[i]])
            assert want == got, (bpp, kind, nb, level, i)


def test_slab_nb():
    assert slab_nb(128) == 128
    assert slab_nb(192) == 192
    assert slab_nb(256) == 128
    assert slab_nb(512) == 128
    assert slab_nb(170) == 170
    assert slab_nb(340) == 170
