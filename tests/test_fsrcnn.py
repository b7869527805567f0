"""FSRCNN model family: forward geometry, training, batching."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from libsrcnn_tpu.models import fsrcnn
from libsrcnn_tpu.train import Trainer


@pytest.fixture(scope="module")
def spec():
    return fsrcnn.FSRCNNSpec(scale=2, d=16, s=8, m=2)


@pytest.fixture(scope="module")
def params(spec):
    return fsrcnn.init_params(jax.random.key(0), spec)


def test_forward_geometry(params, spec):
    lr = np.random.default_rng(70).uniform(0, 255, (12, 14)).astype(np.float32)
    out = np.asarray(fsrcnn.forward_lr(params, jnp.asarray(lr), spec))
    assert out.shape == (24, 28)
    assert out.min() >= 0 and out.max() <= 255

    x3 = fsrcnn.FSRCNNSpec(scale=3, d=16, s=8, m=2)
    p3 = fsrcnn.init_params(jax.random.key(1), x3)
    out3 = np.asarray(fsrcnn.forward_lr(p3, jnp.asarray(lr), x3))
    assert out3.shape == (36, 42)


def test_forward_batched(params, spec):
    lrs = np.random.default_rng(71).uniform(0, 255, (3, 8, 8)).astype(np.float32)
    out = np.asarray(fsrcnn.forward_lr(params, jnp.asarray(lrs), spec))
    assert out.shape == (3, 16, 16)
    one = np.asarray(fsrcnn.forward_lr(params, jnp.asarray(lrs[2]), spec))
    np.testing.assert_allclose(out[2], one, atol=1e-5)


def test_training_reduces_loss(spec):
    imgs = []
    for _ in range(2):
        g = np.linspace(0, 255, 64)[:, None] + np.linspace(0, 128, 64)[None, :]
        imgs.append(np.clip(g / 2, 0, 255).astype(np.uint8)[..., None].repeat(3, -1))
    params = fsrcnn.init_params(jax.random.key(2), spec)
    tr = Trainer(params=params, learning_rate=2e-3,
                 forward=fsrcnn.make_loss_forward(spec))
    batches = [fsrcnn.make_lr_patch_batch(imgs, 8, patch=12, spec=spec, seed=s)
               for s in range(25)]
    losses = tr.fit(batches)
    assert losses[-1] < losses[0] * 0.5


def test_patch_batch_shapes(spec):
    imgs = [np.zeros((40, 40, 3), np.uint8)]
    lr, hr = fsrcnn.make_lr_patch_batch(imgs, 4, patch=10, spec=spec)
    assert lr.shape == (4, 10, 10) and hr.shape == (4, 20, 20)
    with pytest.raises(ValueError):
        fsrcnn.make_lr_patch_batch(imgs, 2, patch=32, spec=spec)
