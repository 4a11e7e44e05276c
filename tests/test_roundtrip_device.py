"""Zero-host device round trip: encode kernel emits the decode index."""

import numpy as np
import pytest

import jax

import pytest as _pytest
pytestmark = _pytest.mark.usefixtures("no_persistent_cache")

from stenos_tpu.engine_jax import roundtrip_device

from conftest import gen_elements


@pytest.mark.parametrize("bpp", [2, 3, 4, 8])
@pytest.mark.parametrize("kind", ["sorted", "random", "same", "rle"])
def test_roundtrip_device(rng, bpp, kind):
    nb, n_sb = 4, 2
    sbytes = nb * 256 * bpp
    raw = np.frombuffer(
        gen_elements(rng, bpp, (n_sb * sbytes) // bpp, kind), np.uint8
    )[: n_sb * sbytes]
    batch = raw.reshape(n_sb, sbytes)
    words, rows, totals = roundtrip_device(
        jax.numpy.asarray(batch), bpp, 2, interpret=True)
    out = np.ascontiguousarray(np.asarray(words)).view(np.uint8)
    assert out.reshape(n_sb, sbytes).tobytes() == raw.tobytes(), (bpp, kind)
    # the emitted rows are also real frame records: host-decode one
    from stenos_tpu import frame as fr

    rec = bytes(np.asarray(rows[0])[: int(totals[0])])
    hdr = bytes([0]) + sbytes.to_bytes(7, "little")
    assert bytes(fr.decompress(hdr + rec, bpp)) == raw[:sbytes].tobytes()
