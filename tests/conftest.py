"""Test harness setup: hermetic CPU-only JAX with an 8-device virtual mesh.

The container boots with an axon TPU plugin force-registered via
sitecustomize (PALLAS_AXON_POOL_IPS), which hijacks platform selection and
takes ~100 s to initialize.  Tests must be fast and deterministic, so we pin
JAX to CPU *in-process* before any backend initializes, with 8 virtual
devices -- the standard JAX trick for testing multi-chip sharding without
hardware (SURVEY.md section 4).
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402  (sitecustomize may have imported it already)

jax.config.update("jax_platforms", "cpu")

# repo root on sys.path so `oracle` and `libsrcnn_tpu` import from source
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
