"""Odd-nb lane padding: byte-identity of the padded kernels (interpret).

Odd sublane counts (bpp=13's nb=39 superblock, the nb=147 shape) make
Mosaic's scoped-VMEM packing/relayouts explode (NOTES.md); the kernels pad
them to even — encode with fully-masked dummy blocks, decode by replicating
the last block's index entries — so the emitted stream and the decoded
bytes must be IDENTICAL to the unpadded (STENOS_NB_PAD=0) path.

Reference behavior: the C++ block codec has no shape constraint at all
(block_compress.h:1099-1302); padding is purely a TPU layout concern and
must never leak into the format.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from stenos_tpu.ops.encode_pallas import (encode_slabs_body,
                                          encode_slabs_index_body)
from stenos_tpu.ops.decode_pallas import decode_slabs_derive_body

from conftest import gen_elements


@pytest.mark.parametrize("bpp,nb", [(1, 9), (3, 7), (4, 5)])
def test_padded_encode_identical_and_decodes(rng, bpp, nb):
    sbytes = nb * 256 * bpp
    n_sb = 2
    raw = np.frombuffer(
        gen_elements(rng, bpp, (n_sb * sbytes) // bpp + 1, "random"),
        np.uint8)[: n_sb * sbytes]
    batch = jnp.asarray(raw.reshape(n_sb, sbytes))

    old = os.environ.get("STENOS_NB_PAD")
    try:
        os.environ["STENOS_NB_PAD"] = "0"
        r0, t0, b0, f0 = encode_slabs_body(batch, bpp, 2, interpret=True)
        r0, t0 = np.asarray(r0), np.asarray(t0)
        b0, f0 = np.asarray(b0), np.asarray(f0)
    finally:
        if old is None:
            os.environ.pop("STENOS_NB_PAD", None)
        else:
            os.environ[
                "STENOS_NB_PAD"] = old

    r1, t1, b1, f1, po = encode_slabs_index_body(batch, bpp, 2,
                                                 interpret=True)
    r1, t1, po = np.asarray(r1), np.asarray(t1), np.asarray(po)
    assert (t0 == t1).all()
    assert (np.asarray(b1) == b0).all()
    assert (np.asarray(f1) == f0).all()
    assert po.shape == (n_sb, bpp * nb)
    for i in range(n_sb):
        assert bytes(r0[i, : t0[i]]) == bytes(r1[i, : t1[i]])

    rb = min(-(-int(t1.max() + 512) // 128) * 128, r1.shape[1])
    words = decode_slabs_derive_body(
        jnp.asarray(r1[:, :rb]), jnp.asarray(po), bpp, nb, "jb",
        interpret=True)
    got = np.ascontiguousarray(np.asarray(words)).view(np.uint8)
    assert got.reshape(n_sb, sbytes).tobytes() == raw.tobytes()
