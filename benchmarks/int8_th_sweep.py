#!/usr/bin/env python3
"""Tile-height sweep for the fused int8 kernel.

The exact (f32/HIGHEST) kernel is VMEM-capped at th=40 because the 3-pass
GEMMs keep hi/lo operand splits live (PERF.md).  The int8 kernel has no
splits and an int8 scratch, so taller tiles fit -- fewer tiles means less
window over-fetch (EW=384 lanes per tile is fixed) and fewer lane rolls.
This sweeps th in ONE process with interleaved repeats (the axon relay's
run-to-run variance swamps sequential A/B, DESIGN.md section 6).

Run on the real chip: python benchmarks/int8_th_sweep.py --size=2048
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
    ap.add_argument("--ths", type=str, default="40,80,120")
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    import jax

    from libsrcnn_tpu.models import srcnn_int8
    from libsrcnn_tpu.kernels import fused_conv

    size = args.size
    ths = [int(t) for t in args.ths.split(",")]
    params = jax.device_put(srcnn_int8.load_params())
    rng = np.random.default_rng(0)
    ys = [jax.device_put(rng.uniform(0, 255, (size, size)).astype(np.float32))
          for _ in range(STREAM)]
    out_mp = size * size / 1e6

    fns = {}
    for th in ths:
        def fn(y, th=th):
            return fused_conv.forward_y_int8(params, y, tile_h=th)
        try:
            ref = np.asarray(fn(ys[0]))  # compile + correctness probe
        except Exception as e:
            print(f"th={th}: FAILED ({type(e).__name__}: {str(e)[:120]})")
            continue
        if th == ths[0]:
            base = ref
        else:
            d = np.abs(np.floor(ref) - np.floor(base)).max()
            assert d <= 1, f"th={th} diverges from th={ths[0]}: {d}"
        fns[th] = fn

    results = {th: [] for th in fns}
    for _ in range(args.rounds):
        for th, fn in fns.items():          # interleaved
            last = None
            for y in ys:
                last = fn(y)
            np.asarray(last[0, :1])          # sync stream
            t0 = time.perf_counter()
            for y in ys:
                last = fn(y)
            np.asarray(last[0, :1])
            results[th].append((time.perf_counter() - t0) / STREAM)

    print(f"int8 kernel th sweep @{size}^2 (stream {STREAM}, "
          f"{args.rounds} interleaved rounds, median ms | MP/s):")
    for th, ts in results.items():
        ms = float(np.median(ts)) * 1e3
        print(f"  th={th:<4d} {ms:7.2f} ms   {out_mp / (ms / 1e3):7.1f} MP/s")


if __name__ == "__main__":
    main()
