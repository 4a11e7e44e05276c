import os

# Tests run the JAX engine on a virtual 8-device CPU mesh; the driver benches
# on real TPU separately. The environment force-registers the axon TPU plugin
# via sitecustomize, so the env var alone is not enough — override via
# jax.config before any backend initialization.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "parallel_codegen" not in flags:
    # long cold-cache suite runs intermittently segfault inside XLA:CPU's
    # parallel LLVM codegen (observed on the pallas-interpret kernels);
    # single-threaded codegen trades a little compile time for determinism
    flags = (flags + " --xla_cpu_parallel_codegen_split_count=1").strip()
os.environ["XLA_FLAGS"] = flags
# The device FSE sequence-decode route (STENOS_DEVICE_SEQS=auto) would run
# interpret-mode seqdec kernels inside EVERY tier-2 payload decode across
# the suite (~minutes each on big frames). Default the suite to the host
# twin; the dedicated files (test_seqdec_pallas.py, test_seq_device_decode
# .py) opt back in and cover the device route end-to-end.
os.environ.setdefault("STENOS_DEVICE_SEQS", "0")

import jax

jax.config.update("jax_platforms", "cpu")
# CPU XLA compiles of the unrolled log-shift graphs are slow; persist them.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.expanduser("~/.cache/jax_compilation_cpu"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(12345)


def gen_elements(rng, bpp, nelem, kind):
    """Data generators mirroring tests_comp_decomp.cpp:37-85 plus extras."""
    hi = 1 << min(8 * bpp - 1, 60)
    if kind == "sorted":
        a = np.sort(rng.integers(0, hi, nelem))
    elif kind == "random":
        a = rng.integers(0, hi, nelem)
    elif kind == "same":
        a = np.full(nelem, 123456789 % hi)
    elif kind == "rle":
        a = np.repeat(rng.integers(0, 255, max(1, nelem // 37) + 1), 37)[:nelem]
    elif kind == "smallrange":
        a = rng.integers(1000, 1032, nelem)
    else:
        raise ValueError(kind)
    if bpp in (1, 2, 4, 8):
        return a.astype(f"<u{bpp}").tobytes()
    return b"".join(int(v).to_bytes(16, "little")[:bpp] for v in a)


@pytest.fixture
def gen():
    return gen_elements


@pytest.fixture
def no_persistent_cache():
    """Serializing some interpret-mode Pallas executables into the
    persistent compilation cache segfaults inside the (de)serializer
    (observed repeatedly for the derive-index decode kernel in long suite
    runs). Tests that compile those kernels opt out of persistence; the
    compiles are small."""
    old = jax.config.jax_persistent_cache_min_compile_time_secs
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1e9)
    yield
    jax.config.update("jax_persistent_cache_min_compile_time_secs", old)
