"""stenos-tpu: a TPU-native lossless codec framework for binary structured
data, format-compatible with the C++ `stenos` library.

Public API mirrors stenos.h: `compress`, `decompress`, `get_info`,
`compress_bound`, plus the array-level `CompressedArray` container (cvector
equivalent) and device/sharded engines under `stenos_tpu.engine_jax` /
`stenos_tpu.parallel`.
"""

from .constants import compress_bound, super_block_size
from .context import Context
from .frame import (
    StenosError,
    compress,
    compress_generic,
    decompress,
    get_info,
)

__version__ = "0.1.0"

__all__ = [
    "compress",
    "decompress",
    "get_info",
    "compress_bound",
    "super_block_size",
    "StenosError",
    "__version__",
]
