"""Chunk-data-parallel compression over a device mesh.

The reference's only parallelism is a host thread pool over independent
superblocks (tiny_pool.h, stenos.cpp:909-1016). The TPU-native equivalent
shards the superblock batch across chips with shard_map over a 1-D mesh:
each chip block-compresses its superblocks locally (pure local VPU work),
then the variable-length results are combined with XLA collectives — a
prefix-sum over compressed sizes replacing the reference's serial offset
walk, and an all-gather of the (padded) streams riding the ICI.

Multi-host: the same code runs under jax.distributed with a global mesh; the
frame layer only consumes the gathered sizes/streams on host 0.
"""

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..engine_jax import encode_superblocks_body, decode_rows_jit


def make_mesh(n_devices: int | None = None, axis: str = "chunks") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def encode_superblocks_sharded(mesh: Mesh, data, bpp: int,
                               block_level: int = 2, axis: str = "chunks"):
    """Shard (n_sb, sb) superblocks over the mesh and encode locally.

    Returns (streams, totals, block_sizes, full_sizes) with the same global
    shapes as the single-chip encoder; XLA keeps them sharded until consumed.
    """

    def local(chunk):
        return encode_superblocks_body(chunk, bpp, block_level)

    f = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=P(axis),
        out_specs=(P(axis), P(axis), P(axis), P(axis)),
    )
    sharding = NamedSharding(mesh, P(axis))
    data = jax.device_put(data, sharding)
    return jax.jit(f)(data)


def decode_slabs_sharded(mesh: Mesh, vbufs, plane_off, rowtab, bpp: int,
                         snb: int, axis: str = "chunks",
                         interpret: bool = False):
    """Mesh-parallel slab decode: shard the (n_rows, row_bytes) virtual
    payloads (from the C++ batch row parser) over the mesh and run the
    decode kernel locally on each chip's slice — the decompression fan-out
    of the reference's thread pool (stenos.cpp:1151-1202). n_rows must be a
    multiple of the mesh size (callers pad by repeating the last row).

    Returns the decoded words with the same global leading axis, sharded
    until consumed."""
    from ..ops.decode_pallas import decode_slabs_body

    def local(vb, po, rt):
        return decode_slabs_body(vb, po, rt, bpp, snb, interpret)

    f = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )
    sharding = NamedSharding(mesh, P(axis))
    args = [jax.device_put(np.ascontiguousarray(x), sharding)
            for x in (vbufs, plane_off, rowtab)]
    return jax.jit(f)(*args)


def encode_slabs_sharded(mesh: Mesh, data, bpp: int, block_level: int = 2,
                         axis: str = "chunks", interpret: bool = False):
    """Pallas mega-kernel under shard_map: each chip runs the VMEM-resident
    encode kernel on its local superblocks; outputs stay sharded. This is
    the production multi-chip path (the XLA pipeline variant above remains
    for CPU meshes and parity tests)."""
    from ..ops.encode_pallas import encode_slabs_body

    def local(chunk):
        return encode_slabs_body(chunk, bpp, block_level, interpret=interpret)

    f = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=P(axis),
        out_specs=(P(axis), P(axis), P(axis), P(axis)),
        check_vma=False,  # pallas_call outputs don't carry vma metadata
    )
    sharding = NamedSharding(mesh, P(axis))
    data = jax.device_put(data, sharding)
    return jax.jit(f)(data)


def sharded_compress_step(mesh: Mesh, data, bpp: int, axis: str = "chunks"):
    """One full sharded compress 'step' (used by dryrun_multichip and the
    scaling bench): local block-encode + collective size prefix-sum +
    all-gather of the padded streams — the TPU translation of the
    reference's serial offset fix-up + parallel memcpy (stenos.cpp:977-1004).

    Returns (gathered_streams, totals, offsets) replicated on all devices.
    """

    def step(chunk):
        out, total, bsizes, fsizes = encode_superblocks_body(chunk, bpp, 2)
        # global ordered offsets of every superblock: ragged sizes -> psum /
        # cumsum over the gathered size vector (all_gather rides ICI)
        all_totals = jax.lax.all_gather(total, axis, tiled=True)
        frame_sizes = all_totals + 4
        offsets = 8 + jnp.cumsum(frame_sizes) - frame_sizes
        gathered = jax.lax.all_gather(out, axis, tiled=True)
        return gathered, all_totals, offsets

    f = jax.shard_map(
        step,
        mesh=mesh,
        in_specs=P(axis),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    sharding = NamedSharding(mesh, P(axis))
    data = jax.device_put(data, sharding)
    return jax.jit(f)(data)
