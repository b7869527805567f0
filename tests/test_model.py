"""SRCNN 9-1-5 stack parity vs the loop-level oracle convs."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from libsrcnn_tpu.models import srcnn
import oracle


@pytest.fixture(scope="module")
def params():
    return srcnn.load_params()


@pytest.fixture(scope="module")
def y():
    return np.random.default_rng(4).uniform(0, 255, (21, 18)).astype(np.float32)


def test_param_shapes(params):
    assert params["w1"].shape == (9, 9, 1, 64)
    assert params["w2"].shape == (1, 1, 64, 32)
    assert params["w3"].shape == (5, 5, 32, 1)
    total = sum(int(np.prod(v.shape)) for v in params.values())
    assert total == 8129  # convdata.h float count (SURVEY section 2.7)


def test_forward_matches_oracle(params, y):
    got = np.asarray(srcnn.forward_y(params, jnp.asarray(y)))
    want = oracle.srcnn_y(y, {k: np.asarray(v) for k, v in params.items()})
    np.testing.assert_allclose(got, want, atol=5e-3)


def test_conv3_orientation(params, y):
    """The conv3 kernel is spatially transposed in the reference
    (`libsrcnn.cpp:506-512`); using the wrong orientation shows up as a
    large error, so assert tightly via the oracle's conv55."""
    np_params = {k: np.asarray(v) for k, v in params.items()}
    c1 = oracle.conv99(y, np_params["w1"], np_params["b1"])
    c2 = oracle.conv11(c1, np_params["w2"], np_params["b2"])
    b3 = float(np_params["b3"][0])
    want = oracle.conv55(c2, np_params["w3"], b3)
    # swap orientation -> must NOT match
    w3_t = np.transpose(np_params["w3"], (1, 0, 2, 3))
    wrong = oracle.conv55(c2, w3_t, b3)
    assert np.abs(want - wrong).max() > 0.5


def test_batched_forward(params):
    ys = np.random.default_rng(5).uniform(0, 255, (3, 16, 16)).astype(np.float32)
    got = np.asarray(srcnn.forward_y(params, jnp.asarray(ys)))
    assert got.shape == (3, 16, 16)
    for i in range(3):
        one = np.asarray(srcnn.forward_y(params, jnp.asarray(ys[i])))
        np.testing.assert_allclose(got[i], one, atol=1e-4)


def test_clamp_range(params, y):
    out = np.asarray(srcnn.forward_y(params, jnp.asarray(y)))
    assert out.min() >= 0.0 and out.max() <= 255.0


def test_noclamp_for_training(params, y):
    out = srcnn.forward_y(params, jnp.asarray(y), clamp=False)
    assert np.asarray(out).dtype == np.float32  # no clamp applied; raw range


def test_init_params_trainable():
    p = srcnn.init_params(jax.random.key(0))
    assert p["w1"].shape == (9, 9, 1, 64)
    assert float(jnp.std(p["w1"])) > 0
