"""Generalized SRCNN family: configurable f1-n1-f2-n2-f3 variants.

The reference ships exactly one architecture (9-1-5 with 64/32 filters,
baked into `convdata.h`).  Dong et al. also evaluate 9-5-5 and 9-3-5 and
wider/narrower filter banks; this module makes the family a config so the
training subsystem can explore it:

>>> spec = ModelSpec(f1=9, n1=64, f2=5, n2=32, f3=5)        # SRCNN 9-5-5
>>> params = init_params(jax.random.key(0), spec)
>>> y_sr = forward_y(params, y, spec)

Semantics generalize the reference's: replicate ("edge") padding on every
spatial conv, ReLU after layers 1 and 2, clamp [0,255] at the end.  The
pre-trained 9-1-5 weights load through :func:`from_pretrained`.  The fused
Pallas kernel is specialized to 9-1-5; other specs run the XLA path.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from . import srcnn


@dataclasses.dataclass(frozen=True)
class ModelSpec:
    f1: int = 9   # layer-1 kernel size (patch extraction)
    n1: int = 64  # layer-1 filters
    f2: int = 1   # layer-2 kernel size (non-linear mapping)
    n2: int = 32  # layer-2 filters
    f3: int = 5   # layer-3 kernel size (reconstruction)

    @property
    def name(self) -> str:
        return f"srcnn-{self.f1}{self.f2}{self.f3}-{self.n1}x{self.n2}"

    def param_count(self) -> int:
        return (self.f1**2 * self.n1 + self.n1
                + self.f2**2 * self.n1 * self.n2 + self.n2
                + self.f3**2 * self.n2 + 1)


SRCNN_915 = ModelSpec()
SRCNN_955 = ModelSpec(f2=5)
SRCNN_935 = ModelSpec(f2=3)


def init_params(key: jax.Array, spec: ModelSpec = SRCNN_915,
                dtype=jnp.float32) -> dict:
    """Gaussian init (std 1e-3), zero biases -- the paper's scheme."""
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "w1": jax.random.normal(k1, (spec.f1, spec.f1, 1, spec.n1), dtype) * 1e-3,
        "b1": jnp.zeros((spec.n1,), dtype),
        "w2": jax.random.normal(k2, (spec.f2, spec.f2, spec.n1, spec.n2), dtype) * 1e-3,
        "b2": jnp.zeros((spec.n2,), dtype),
        "w3": jax.random.normal(k3, (spec.f3, spec.f3, spec.n2, 1), dtype) * 1e-3,
        "b3": jnp.zeros((1,), dtype),
    }


def from_pretrained(spec: ModelSpec = SRCNN_915, dtype=jnp.float32) -> dict:
    if spec != SRCNN_915:
        raise ValueError(f"pre-trained weights exist only for 9-1-5, not {spec.name}")
    return srcnn.load_params(dtype=dtype)


def spec_of(params: dict) -> ModelSpec:
    """Recover the ModelSpec from a params pytree's shapes."""
    w1 = np.asarray(params["w1"])
    w2 = np.asarray(params["w2"])
    w3 = np.asarray(params["w3"])
    return ModelSpec(f1=w1.shape[0], n1=w1.shape[3],
                     f2=w2.shape[0], n2=w2.shape[3], f3=w3.shape[0])


def forward_y(params: dict, y: jnp.ndarray, spec: ModelSpec | None = None,
              *, clamp: bool = True) -> jnp.ndarray:
    """Generic 3-layer forward on [H, W] or [N, H, W] planes."""
    if spec is None:
        spec = spec_of(params)
    squeeze = y.ndim == 2
    if squeeze:
        y = y[None]
    x = y[..., None].astype(params["w1"].dtype)

    def pad(t, k):
        p = k // 2
        return srcnn.edge_pad(t, p) if p else t

    h = srcnn._conv(pad(x, spec.f1), params["w1"]) + params["b1"]
    h = jnp.maximum(h, 0.0)
    h = srcnn._conv(pad(h, spec.f2), params["w2"]) + params["b2"]
    h = jnp.maximum(h, 0.0)
    h = srcnn._conv(pad(h, spec.f3), params["w3"]) + params["b3"]
    out = h[..., 0].astype(jnp.float32)
    if clamp:
        out = jnp.clip(out, 0.0, 255.0)
    return out[0] if squeeze else out
