"""Training CLI: fine-tune / retrain SRCNN on a directory of images.

``python -m libsrcnn_tpu.train.cli <image-dir> [--steps=N] [--batch=B]
[--patch=P] [--scale=F] [--lr=LR] [--from-pretrained] [--ckpt=path.npz]
[--mesh=data,row,col]``

The reference has no training at all; this reproduces the SRCNN paper's
patch-training recipe with the framework's own resampler and a sharded
train step.
"""

from __future__ import annotations

import sys

import numpy as np


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    steps, batch, patch, scale, lr = 100, 16, 32, 2.0, 1e-4
    from_pretrained = False
    ckpt = "srcnn_trained.npz"
    mesh_spec = None
    path = None
    for a in argv:
        if a.startswith("--steps="):
            steps = int(a[8:])
        elif a.startswith("--batch="):
            batch = int(a[8:])
        elif a.startswith("--patch="):
            patch = int(a[8:])
        elif a.startswith("--scale="):
            scale = float(a[8:])
        elif a.startswith("--lr="):
            lr = float(a[5:])
        elif a == "--from-pretrained":
            from_pretrained = True
        elif a.startswith("--ckpt="):
            ckpt = a[7:]
        elif a.startswith("--mesh="):
            mesh_spec = [int(x) for x in a[7:].split(",")]
        else:
            path = a
    if path is None:
        raise SystemExit(main.__doc__ or "usage: train.cli <image-dir>")

    import os

    from ..io import load_image
    from ..models import srcnn
    from .data import make_patch_batch
    from .trainer import Trainer, save_checkpoint

    files = ([path] if os.path.isfile(path) else sorted(
        os.path.join(path, f) for f in os.listdir(path)
        if f.lower().endswith((".png", ".jpg", ".jpeg", ".bmp"))))
    images = [load_image(f)[..., :3] for f in files]
    print(f"training on {len(images)} images, {steps} steps, "
          f"batch {batch}x{patch}x{patch}, x{scale}")

    mesh = None
    if mesh_spec:
        from ..parallel.mesh import make_mesh

        mesh = make_mesh({"data": mesh_spec[0], "row": mesh_spec[1],
                          "col": mesh_spec[2]})

    params = srcnn.load_params() if from_pretrained else None
    trainer = Trainer(params=params, learning_rate=lr, mesh=mesh)
    batches = (make_patch_batch(images, batch, patch=patch, scale=scale, seed=s)
               for s in range(steps))
    losses = trainer.fit(batches, log_every=max(1, steps // 10))
    save_checkpoint(ckpt, trainer.params, trainer.step)
    print(f"final loss {losses[-1]:.3f} (first {losses[0]:.3f}); "
          f"saved {ckpt}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
