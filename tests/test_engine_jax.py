"""Device (JAX) engine must produce byte-identical frames to the host path
(which is itself bit-exact vs the C++ reference)."""

import numpy as np
import pytest

import stenos_tpu as st
from stenos_tpu.engine_jax import JaxEngine
from conftest import gen_elements


@pytest.mark.parametrize("kind", ["sorted", "random", "rle", "smallrange", "same"])
@pytest.mark.parametrize("bpp", [1, 2, 4, 8, 3, 12])
def test_jax_engine_matches_host(rng, kind, bpp):
    eng = JaxEngine()
    for ne in [1, 300, 5000, 70001]:
        for level in [1, 2, 5]:
            data = gen_elements(rng, bpp, ne, kind)
            host_frame = st.compress(data, bpp, level)
            dev_frame = st.compress(data, bpp, level, engine=eng)
            assert dev_frame == host_frame, (kind, bpp, ne, level)
            assert st.decompress(dev_frame, bpp, engine=eng).tobytes() == data
