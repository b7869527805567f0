"""Model zoo: upscale the same image with all three families and compare.

SRCNN (the reference's model) interpolates first and convolves at high
resolution; FSRCNN and ESPCN run at low resolution with learned upscale
heads (deconv / sub-pixel shuffle) -- scale^2 fewer conv FLOPs, and both
ship x2 weights trained by tools/train_{fsrcnn,espcn}.py with the
framework's own degradation model.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np

from libsrcnn_tpu import SRCNNConfig, upscale
from libsrcnn_tpu.eval import psnr, ssim

rng = np.random.default_rng(0)
# synthetic test image: smooth gradients + structure so PSNR is meaningful
y, x = np.mgrid[0:128, 0:128]
img = np.stack([
    (127 + 90 * np.sin(x / 9.0) * np.cos(y / 13.0)),
    (127 + 80 * np.cos((x + y) / 11.0)),
    (127 + 70 * np.sin(x * y / 700.0)),
], -1).clip(0, 255).astype(np.uint8)

outs = {}
for model in ("srcnn", "fsrcnn", "espcn"):
    cfg = SRCNNConfig(model=model)
    t0 = time.perf_counter()
    out = upscale(img, 2.0, cfg)
    dt = (time.perf_counter() - t0) * 1000
    outs[model] = out
    print(f"{model:8s} -> {out.shape}  first-call {dt:6.0f} ms "
          f"(includes compile)")

ref = outs["srcnn"]
for model in ("fsrcnn", "espcn"):
    print(f"{model} vs srcnn: PSNR {psnr(outs[model], ref):.1f} dB, "
          f"SSIM {ssim(outs[model], ref):.4f}")
