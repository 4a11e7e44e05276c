"""End-to-end multi-chip frame compression.

The public sharded path: superblocks shard over the mesh, each chip runs
the Pallas encode mega-kernel locally, compressed sizes are combined with
an all-gather + cumsum (the collective replacement for the reference's
serial offset fix-up, stenos.cpp:977-990), the padded row records are
all-gathered over ICI, and the ordered-DMA frame assembler writes the
final contiguous frame in HBM (the parallel-memcpy round,
stenos.cpp:992-1004). Output is byte-identical to the single-chip device
path (engine_jax.compress_frame_device_jit) and decodes with
frame.decompress / the C++ reference.

Multi-host: the same shard_map runs under jax.distributed with a global
mesh (tests/test_distributed.py drives a 2-process CPU cluster).
"""

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .sharding import make_mesh


def _sharded_encode_gather(mesh: Mesh, data, bpp: int, block_level: int,
                           axis: str, interpret: bool):
    from ..ops.encode_pallas import encode_slabs_body

    def step(chunk):
        rows, totals, _, _ = encode_slabs_body(chunk, bpp, block_level,
                                               interpret=interpret)
        sizes = jax.lax.all_gather(totals, axis, tiled=True)
        offs = 8 + jnp.cumsum(sizes) - sizes
        rows_g = jax.lax.all_gather(rows, axis, tiled=True)
        return rows_g, sizes, offs.astype(jnp.int32)

    f = jax.shard_map(
        step, mesh=mesh, in_specs=P(axis), out_specs=(P(), P(), P()),
        check_vma=False,
    )
    sharding = NamedSharding(mesh, P(axis))
    data = jax.device_put(data, sharding)
    return jax.jit(f)(data)


def compress_device_sharded(data, bpp: int, level: int = 1,
                            mesh: Mesh | None = None, axis: str = "chunks",
                            interpret: bool = False):
    """Sharded device-resident frame compression.

    data: (n_sb, sb) uint8 with n_sb a multiple of the mesh size (sb | the
    chosen superblock size). Returns (frame uint8 HBM array, frame_len) —
    same contract as engine_jax.compress_frame_device_jit, which this
    matches byte-for-byte (same kernel, same assembler).
    """
    from ..engine_jax import _frame_assemble, frame_header_bytes

    n_sb, sb = data.shape
    mesh = mesh if mesh is not None else make_mesh()
    nd = mesh.devices.size
    if n_sb % nd:
        raise ValueError(f"n_sb={n_sb} not a multiple of mesh size {nd}")
    rows, sizes, offs = _sharded_encode_gather(
        mesh, data, bpp, 2 if level else 0, axis, interpret)
    nbytes = n_sb * sb
    hdr = frame_header_bytes(nbytes, sb, bpp, level)
    base = len(hdr)
    cap = base + n_sb * rows.shape[1]
    dev = mesh.devices.reshape(-1)[0]
    frame = _frame_assemble(jax.device_put(rows, dev),
                            jax.device_put(offs + (base - 8), dev),
                            jax.device_put(jnp.asarray(hdr), dev), cap)
    return frame, base + jnp.sum(sizes)


def compress_sharded(data, bpp: int, level: int = 1,
                     mesh: Mesh | None = None,
                     interpret: bool | None = None) -> bytes:
    """Whole-input sharded compress -> complete frame bytes on host.

    data: 1-D bytes/uint8 array. Superblock sizing follows the frame layer
    (levels map to the standard shift, frame.py _superblock_params); the
    trailing partial superblock (and any superblocks beyond the sharded
    grid) are compressed on host and appended — byte-compatible with the
    single-chip frame for block-method superblocks.
    """
    from .. import frame as fr

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if isinstance(data, (bytes, bytearray, memoryview)):
        data = np.frombuffer(bytes(data), np.uint8)
    data = np.ascontiguousarray(data).view(np.uint8).reshape(-1)
    nbytes = len(data)
    mesh = mesh if mesh is not None else make_mesh()
    nd = mesh.devices.size
    sb, shift = fr._superblock_params(bpp, nbytes, level)
    n_full = nbytes // sb
    n_shard = (n_full // nd) * nd
    if n_shard == 0 or level == 0:
        return fr.compress(data, bpp, level)
    batch = data[: n_shard * sb].reshape(n_shard, sb)
    frame_dev, flen = compress_device_sharded(batch, bpp, level, mesh,
                                              interpret=interpret)
    flen = int(flen)
    out = bytearray(np.asarray(frame_dev)[:flen].tobytes())
    # the device header covered only the sharded slice; the frame's
    # decompressed-size field spans the appended tail records too
    out[1:8] = nbytes.to_bytes(7, "little")
    # tail superblocks (the non-multiple remainder + partial) via the host
    # frame layer, same method selection
    pos = n_shard * sb
    while pos < nbytes:
        chunk = data[pos : pos + sb]
        out += fr.compress_superblock(chunk, bpp, level,
                                      fr.compress_bound(len(chunk)) + 16)
        pos += len(chunk)
    return bytes(out)
