"""libsrcnn_tpu -- a TPU-native single-image super-resolution framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
rageworx/libsrcnn (SRCNN 9-1-5 super-resolution with classical
interpolation upscaling), built for TPU: the whole pipeline is one jitted
XLA program per shape, the conv stack runs on the MXU (optionally via fused
Pallas kernels), and large frames / batches shard across a device mesh with
ICI halo exchange.
"""

import os as _os

# Persistent XLA compilation cache: first compile of each shape costs
# 10-40 s through the remote TPU compiler; cache unless the user already
# configured one (opt out with LIBSRCNN_TPU_NO_CACHE=1).  Set via
# jax.config because the env var is only read at jax import time and this
# container's sitecustomize imports jax before any user package.
if not _os.environ.get("LIBSRCNN_TPU_NO_CACHE"):
    import jax as _jax

    if not _os.environ.get("JAX_COMPILATION_CACHE_DIR") and not (
            _jax.config.jax_compilation_cache_dir):
        _jax.config.update(
            "jax_compilation_cache_dir",
            _os.path.expanduser("~/.cache/libsrcnn_tpu_xla"))

from .config import DEFAULT_CONFIG, FilterType, SRCNNConfig
from .api import configure_filter_srcnn, process_srcnn, upscale
from .chunked import upscale_chunked

#: mirrors the reference's version constant era (`libsrcnn.h:34-35`) --
#: behavior parity target is libsrcnn 0.1.10.40.
__version__ = "0.1.0"
REFERENCE_PARITY_VERSION = "0.1.10.40"
SRCNN_VERSION = 0x00010A28  # the reference's numeric macro (`libsrcnn.h:35`)

__all__ = [
    "DEFAULT_CONFIG",
    "FilterType",
    "SRCNNConfig",
    "configure_filter_srcnn",
    "process_srcnn",
    "upscale",
    "upscale_chunked",
    "__version__",
]
