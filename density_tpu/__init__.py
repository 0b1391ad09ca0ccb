"""density-tpu: TPU-native lossless compression framework.

Implements the three density block formats (Chameleon, Cheetah, Lion)
as JAX/XLA/Pallas array programs with bit-exact wire compatibility with
the reference implementation, plus a framed multi-stream container that
shards across TPU meshes.
"""

import os

# Persistent compilation cache: the codec kernels are compiled per
# shape-bucket; cache them across processes.
_cache_dir = os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax  # noqa: E402

if _cache_dir:  # empty = explicitly disabled (tests run hermetic)
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from density_tpu.api import (  # noqa: E402,F401
    encode_raw, decode_raw, safe_encode_buffer_size)
from density_tpu.constants import SPECS, CodecSpec  # noqa: E402,F401
from density_tpu.errors import (  # noqa: E402,F401
    DensityError, EncodeError, DecodeError)
