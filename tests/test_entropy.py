"""Entropy stage: zstd frames (huffman-literals) must decode via libzstd."""

import numpy as np
import pytest

from stenos_tpu.entropy import encode_frame_host
from stenos_tpu.host import zstd as zstd_host


def _libzstd_ok():
    try:
        zstd_host.compress(b"x" * 100, 200, 1)
        return True
    except Exception:
        return False


pytestmark = pytest.mark.skipif(not _libzstd_ok(), reason="no libzstd")


def cases(rng):
    yield "skewed", rng.choice(
        256, 60_000, p=np.random.default_rng(1).dirichlet(np.ones(256) * .1))
    yield "gauss", rng.normal(128, 12, 150_000).clip(0, 255)
    yield "uniform", rng.integers(0, 256, 140_000)
    yield "text", np.frombuffer(b"entropy stage round trip " * 5000, np.uint8)
    yield "fewsyms", rng.integers(0, 5, 200_000)
    yield "same", np.full(5000, 42)
    yield "tiny", np.arange(20) % 7
    yield "empty", np.zeros(0)
    yield "block-crossing", rng.integers(0, 40, 150_000)


def test_frames_decode_with_libzstd(rng):
    for name, a in cases(rng):
        a = a.astype(np.uint8)
        frame = encode_frame_host(a)
        back = zstd_host.decompress(frame, len(a) + 16)
        assert back is not None and back == a.tobytes(), name


def test_compression_actually_happens(rng):
    a = rng.integers(0, 5, 200_000).astype(np.uint8)
    frame = encode_frame_host(a)
    assert len(frame) < len(a) // 2  # ~2.3 bits/symbol on 5-symbol data
