"""Train a custom SRCNN-family variant and compare against the pre-trained
9-1-5 on a held-out crop."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import numpy as np
import jax

from libsrcnn_tpu.io import load_image
from libsrcnn_tpu.models import ModelSpec, srcnn, srcnn_generic
from libsrcnn_tpu.train import Trainer, make_patch_batch, synthesize_pair
from libsrcnn_tpu.train.trainer import loss_fn, save_checkpoint

hr = load_image("/root/reference/Pictures/butterfly.png")[..., :3]
train_img, eval_img = hr[:, :192], hr[:, 192:]

spec = ModelSpec(f1=5, n1=24, f2=3, n2=12, f3=3)  # a small fast variant
print(f"training {spec.name} ({spec.param_count()} params)")

forward = functools.partial(srcnn_generic.forward_y, spec=spec)
trainer = Trainer(params=srcnn_generic.init_params(jax.random.key(0), spec),
                  learning_rate=5e-4, forward=forward)
batches = (make_patch_batch([train_img], 16, patch=24, seed=s)
           for s in range(200))
losses = trainer.fit(batches, log_every=50)
save_checkpoint("variant.npz", trainer.params, trainer.step)

lr_y, hr_y = synthesize_pair(eval_img, 2.0)
import jax.numpy as jnp

mse_variant = float(loss_fn(trainer.params, jnp.asarray(lr_y),
                            jnp.asarray(hr_y), forward))
mse_915 = float(loss_fn(srcnn.load_params(), jnp.asarray(lr_y),
                        jnp.asarray(hr_y)))
mse_interp = float(np.mean((lr_y - hr_y) ** 2))
print(f"held-out MSE: interpolation {mse_interp:.1f} | "
      f"{spec.name} {mse_variant:.1f} | pre-trained 9-1-5 {mse_915:.1f}")
