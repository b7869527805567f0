"""Test harness setup: hermetic CPU-only JAX with an 8-device virtual mesh.

The container boots with an axon TPU plugin force-registered via
sitecustomize (PALLAS_AXON_POOL_IPS), which both hijacks platform selection
and takes ~100 s to initialize.  Tests must be fast and deterministic, so if
the axon env is present we re-exec pytest once with the plugin disabled and
JAX pinned to CPU with 8 virtual devices (the standard JAX trick for
testing multi-chip sharding without hardware, per SURVEY.md section 4).
"""

import os
import sys

if os.environ.get("PALLAS_AXON_POOL_IPS") and not os.environ.get("_LIBSRCNN_TPU_REEXEC"):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    env["_LIBSRCNN_TPU_REEXEC"] = "1"
    os.execve(sys.executable, [sys.executable, "-m", "pytest"] + sys.argv[1:], env)

os.environ.setdefault("JAX_PLATFORMS", "cpu")
if "host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()

# repo root on sys.path so `tests.oracle` and `libsrcnn_tpu` import from source
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
