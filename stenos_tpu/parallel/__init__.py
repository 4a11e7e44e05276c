from .api import compress_device_sharded, compress_sharded
from .sharding import (
    make_mesh,
    encode_slabs_sharded,
    encode_superblocks_sharded,
    decode_blocks_sharded,
    sharded_compress_step,
)

__all__ = [
    "make_mesh",
    "compress_device_sharded",
    "compress_sharded",
    "encode_slabs_sharded",
    "encode_superblocks_sharded",
    "decode_blocks_sharded",
    "sharded_compress_step",
]
