"""Device FSE sequence-bitstream encoder (entropy/fse_pallas.py): sections
must be BYTE-IDENTICAL to sequences.encode_sequences (which libzstd and the
C++ reference decode — zstd_wrapper.h:59-90, RFC 8878 §3.1.1.3.2)."""

import numpy as np
import pytest
import zstandard as zstd

from stenos_tpu.entropy.fse_pallas import (_bucket_T,
                                           encode_sequences_device_batch)
from stenos_tpu.entropy.sequences import FRESH_REPS, encode_sequences


def _mk(rng, n, style):
    seqs = []
    for i in range(n):
        ll = int(rng.integers(0, 20)) if style != "ll0" else 0
        of = 64 if style == "rep" and i % 3 else int(rng.integers(1, 60000))
        ml = int(rng.integers(3, 200))
        seqs.append((ll, of + 3, ml))
    return seqs


@pytest.mark.parametrize("n,style", [
    (1, "x"), (2, "rep"), (63, "ll0"), (129, "x"), (550, "rep"),
    (1024, "x"), (2201, "rep"), (2560, "x")])
def test_sections_byte_identical(n, style):
    rng = np.random.default_rng(n)
    seqs = _mk(rng, n, style)
    got = encode_sequences_device_batch([seqs], [FRESH_REPS],
                                        interpret=True)[0]
    assert got == encode_sequences(seqs, reps=FRESH_REPS)


def test_batch_mixed_sizes_and_skips():
    rng = np.random.default_rng(9)
    blocks = [_mk(rng, 7, "x"), None, _mk(rng, 333, "rep"),
              _mk(rng, 100, "ll0"), None]
    reps = [FRESH_REPS, None, (64, 1, 4), (7, 64, 1), None]
    got = encode_sequences_device_batch(blocks, reps, interpret=True)
    for i, seqs in enumerate(blocks):
        if seqs is None:
            assert got[i] is None
        else:
            assert got[i] == encode_sequences(seqs, reps=reps[i])


def test_nonfresh_reps_threading():
    """Registers at block entry change the recoding — sections must match
    the host with the same registers."""
    rng = np.random.default_rng(3)
    seqs = _mk(rng, 97, "rep")
    reps = (64, 128, 4)
    got = encode_sequences_device_batch([seqs], [reps], interpret=True)[0]
    assert got == encode_sequences(seqs, reps=reps)


def test_oversize_block_falls_back():
    rng = np.random.default_rng(4)
    seqs = _mk(rng, _bucket_T(2560) + 1, "x")
    got = encode_sequences_device_batch([seqs], [FRESH_REPS],
                                        interpret=True)
    assert got[0] is None  # caller must use the host encoder


def test_full_block_decodes_via_libzstd():
    """A complete zstd frame whose sequence section came from the device
    encoder must round-trip through libzstd."""
    from stenos_tpu.entropy.match import greedy_parse
    from stenos_tpu.entropy.sequences import _recode_repeat_offsets
    from stenos_tpu.entropy.zstd_frame import (compress_literals,
                                               raw_literals_section)

    rng = np.random.default_rng(11)
    rec = rng.integers(0, 256, 64).astype(np.uint8)
    data = np.tile(rec, 2048)
    data[rng.integers(0, len(data), 2048)] = rng.integers(0, 256, 2048)

    seqs, lits = greedy_parse(data)
    lsec = compress_literals(lits)
    if lsec is None:
        lsec = raw_literals_section(lits)
    ss = encode_sequences_device_batch([seqs], [FRESH_REPS],
                                       interpret=True)[0]
    content = lsec + ss
    bh = 1 | (2 << 1) | (len(content) << 3)
    frame = ((0xFD2FB528).to_bytes(4, "little") + bytes([0xA0])
             + len(data).to_bytes(4, "little")
             + bh.to_bytes(3, "little") + content)
    back = zstd.ZstdDecompressor().decompress(
        frame, max_output_size=len(data) + 16)
    assert back == data.tobytes()
