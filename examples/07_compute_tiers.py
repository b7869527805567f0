"""The srcnn compute-tier ladder: one flag, four speed/exactness points.

Every tier runs the same fused Pallas kernel on TPU; only the MXU GEMM
strategy changes (kernels/fused_conv._dot, measured story in PERF.md):

  float32        exact -- Mosaic's 3-pass f32 algorithm; this is the tier
                 the golden gate holds to <=1 u8 LSB vs the reference
                 binary (the library default).
  bfloat16       split-bf16x2 -- activations split hi+lo into TWO native
                 MXU passes, bf16 weights; only weight rounding remains.
  bfloat16_fast  ONE MXU pass per conv -- adds activation rounding;
                 the throughput champion (806 MP/s device at 2048^2-out,
                 ~3.3x the exact tier).
  int8           quantized draft -- measured NOT faster than bfloat16_fast
                 on this stack (PERF.md "int8 tier"); kept as the measured
                 answer to "wouldn't int8 be faster?".

``use_pallas=True`` is set explicitly so the ladder is demonstrated on
every backend: on CPU the kernel runs in interpreter mode (slow but
numerically identical -- without the flag, CPU would take the XLA path
where the two bf16 tiers are the same computation).  Run on a TPU host
for the speed column to mean something.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np

from libsrcnn_tpu import SRCNNConfig, upscale
from libsrcnn_tpu.eval import psnr, ssim

rng = np.random.default_rng(0)
y, x = np.mgrid[0:96, 0:96]
img = np.stack([
    (127 + 90 * np.sin(x / 9.0) * np.cos(y / 13.0)),
    (127 + 80 * np.cos((x + y) / 11.0)),
    (127 + 70 * np.sin(x * y / 700.0)),
], -1).clip(0, 255).astype(np.uint8)

exact = upscale(img, 2.0, SRCNNConfig(use_pallas=True))
print(f"{'tier':15s} {'ms':>8s} {'max u8':>7s} {'PSNR':>7s} {'SSIM':>8s}"
      f"   (vs the exact tier)")
for tier in ("float32", "bfloat16", "bfloat16_fast", "int8"):
    cfg = SRCNNConfig(compute_dtype=tier, use_pallas=True)
    out = upscale(img, 2.0, cfg)  # warm / compile
    t0 = time.perf_counter()
    out = upscale(img, 2.0, cfg)
    ms = (time.perf_counter() - t0) * 1e3
    d = int(np.abs(out.astype(int) - exact.astype(int)).max())
    print(f"{tier:15s} {ms:8.1f} {d:7d} {psnr(out, exact):7.2f} "
          f"{ssim(out, exact):8.5f}")
