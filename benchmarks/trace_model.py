#!/usr/bin/env python3
"""Device trace of a full model-zoo pipeline pass: per-op breakdown.

Companion to trace_kernel.py (which traces the fused SRCNN kernel in
isolation); this traces `pipeline.run_pass` for any family so the zoo's
XLA conv stacks can be checked against their lane-ceiling rooflines
(PERF.md "VDSR roofline" methodology).

Run (real chip):
  python benchmarks/trace_model.py --model espcn --size 1024 --dtype bfloat16
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from trace_kernel import report  # noqa: E402  (same xplane parsing)


def capture(model: str, size: int, scale: float, dtype: str,
            iters: int, lane_pack, use_pallas: bool = False) -> tuple[str, float]:
    import jax
    import tempfile

    from libsrcnn_tpu import SRCNNConfig, pipeline

    cfg = SRCNNConfig(model=model, compute_dtype=dtype,
                      use_pallas=use_pallas, lane_pack=lane_pack)
    params = pipeline.load_model_params(cfg, scale)
    rng = np.random.default_rng(0)
    imgs = [jax.device_put(rng.integers(0, 256, (size, size, 3), np.uint8))
            for _ in range(iters)]

    out = pipeline.run_pass(imgs[0], params, scale, cfg)
    np.asarray(out[0][0, 0])  # warm-up + true sync through the relay

    tmp = tempfile.mkdtemp(prefix=f"srcnn_trace_{model}_")
    with jax.profiler.trace(tmp):
        for im in imgs:
            out = pipeline.run_pass(im, params, scale, cfg)
        np.asarray(out[0][0, 0])
    o = out[0]
    return tmp, o.shape[0] * o.shape[1] / 1e6


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="espcn")
    ap.add_argument("--size", type=int, default=1024, help="input H=W")
    ap.add_argument("--scale", type=float, default=2.0)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=("float32", "bfloat16", "bfloat16_fast"))
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--pallas", action="store_true",
                    help="srcnn only: trace the FULL pipeline through the "
                         "fused Pallas kernel (resize gather -> kernel -> "
                         "merge) instead of the XLA conv stack")
    ap.add_argument("--lane-pack", default="auto",
                    choices=("auto", "0", "1"),
                    help="'0' traces the DIRECT conv stack (the PERF.md "
                         "roofline methodology); 'auto' follows the "
                         "config default (packed on TPU for families)")
    args = ap.parse_args()

    lane_pack = {"auto": None, "0": False, "1": True}[args.lane_pack]
    trace_dir, out_mp = capture(args.model, args.size, args.scale,
                                args.dtype, args.iters, lane_pack,
                                args.pallas)
    print(f"trace: {trace_dir}")
    report(trace_dir, args.iters, out_mp)


if __name__ == "__main__":
    main()
