#!/usr/bin/env python3
"""Throughput-tier mode x tile-height sweep for the fused kernel.

Round-2's precision table (PERF.md) measured "1-pass" variants that stored
the im2col scratch in bf16 -- which pays Mosaic's packed-sublane RMW
penalty on the 81 tap stores (the same physics that sank the int8 tier's
scratch).  The BF16X1 mode keeps the f32 scratch and bulk-casts the GEMM
operands instead, so it isolates the actual question: what does dropping
the split-bf16x2 lo-pass buy?

Also sweeps tile height: th=40 is the EXACT tier's VMEM cap (3-pass GEMMs
keep hi/lo operand splits live); the 1-pass and 2-pass bf16 modes have
smaller live sets, so taller tiles may fit -- fewer tiles means less
window over-fetch (EW=384 lanes is fixed per tile).

Interleaved repeats in ONE process (the axon relay's run-to-run variance
swamps sequential A/B, DESIGN.md section 6).

Run on the real chip: python benchmarks/bf16_mode_sweep.py --size=2048
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

STREAM = 16


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=2048)
    ap.add_argument("--ths", type=str, default="40,48,64,80")
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    import jax

    from libsrcnn_tpu.models import srcnn
    from libsrcnn_tpu.kernels import fused_conv

    size = args.size
    ths = [int(t) for t in args.ths.split(",")]
    params = jax.device_put(srcnn.load_params())
    rng = np.random.default_rng(0)
    ys = [jax.device_put(rng.uniform(0, 255, (size, size)).astype(np.float32))
          for _ in range(STREAM)]
    out_mp = size * size / 1e6

    exact = np.asarray(fused_conv.forward_y(
        params, ys[0], precision=jax.lax.Precision.HIGHEST))

    modes = {
        "split": (jax.lax.Precision.DEFAULT, False),
        "bf16x1": (fused_conv.BF16X1, False),
        # i32-packed bf16 tap pairs in the im2col scratch (round 4): the
        # formulation that halves the tap-store traffic WITHOUT sub-word
        # stores (full 32-bit words; bitcast unpacks before the GEMM)
        "bf16x1pk": (fused_conv.BF16X1, True),
        # hi/lo-packed split (round 4): each tap's hi/lo bf16 halves in
        # one i32 word -- the decomposition runs once on the window, and
        # conv1 is ONE 162-row GEMM instead of two 81-row passes
        "splitpk": (jax.lax.Precision.DEFAULT, True),
    }
    fns = {}
    for mode, (prec, pk) in modes.items():
        for th in ths:
            def fn(y, th=th, prec=prec, pk=pk):
                return fused_conv.forward_y(params, y, tile_h=th,
                                            precision=prec, pack_im2col=pk)
            try:
                out = np.asarray(fn(ys[0]))  # compile + correctness probe
            except Exception as e:
                print(f"{mode} th={th}: FAILED "
                      f"({type(e).__name__}: {str(e)[:140]})")
                continue
            d = float(np.abs(out - exact).max())
            fns[(mode, th)] = (fn, d)

    results = {k: [] for k in fns}
    for _ in range(args.rounds):
        for key, (fn, _) in fns.items():      # interleaved
            last = None
            for y in ys:
                last = fn(y)
            np.asarray(last[0, :1])           # sync stream
            t0 = time.perf_counter()
            for y in ys:
                last = fn(y)
            np.asarray(last[0, :1])
            results[key].append((time.perf_counter() - t0) / STREAM)

    print(f"throughput-mode sweep @{size}^2 (stream {STREAM}, "
          f"{args.rounds} interleaved rounds, median ms | MP/s | "
          f"maxdiff vs exact):")
    for (mode, th), ts in results.items():
        ms = float(np.median(ts)) * 1e3
        d = fns[(mode, th)][1]
        print(f"  {mode:7s} th={th:<4d} {ms:7.2f} ms   "
              f"{out_mp / (ms / 1e3):7.1f} MP/s   maxdiff {d:.3f}")


if __name__ == "__main__":
    main()
