from .api import (
    ShardedEngine,
    compress_device_sharded,
    compress_sharded,
    decompress_sharded,
)
from .sharding import (
    make_mesh,
    encode_slabs_sharded,
    encode_superblocks_sharded,
    decode_slabs_sharded,
    sharded_compress_step,
)

__all__ = [
    "make_mesh",
    "ShardedEngine",
    "compress_device_sharded",
    "compress_sharded",
    "decompress_sharded",
    "encode_slabs_sharded",
    "encode_superblocks_sharded",
    "decode_slabs_sharded",
    "sharded_compress_step",
]
