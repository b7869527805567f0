#!/usr/bin/env python3
"""Capture a jax.profiler device trace of the fused kernel and print the
per-op time breakdown (device-side timings from the TPU's own trace
plane, immune to the relay's host-sync quirks -- DESIGN.md section 6).

Run (real chip):  python benchmarks/trace_kernel.py --size 2048 --mode exact
Modes: exact (precision=HIGHEST 3-pass f32) | split (split-bf16x2).

The xplane is parsed with jax.profiler.ProfileData; the "XLA Ops" line of
the TPU device plane carries one event per executed HLO op with true
device durations, so the fused pallas custom-call is measured directly
rather than inferred from host-side stream timing.
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def capture(size: int, mode: str, iters: int = 4,
            th: int | None = None) -> str:
    import jax
    import jax.numpy as jnp

    from libsrcnn_tpu.models import srcnn
    from libsrcnn_tpu.kernels import fused_conv

    if mode == "int8":
        from libsrcnn_tpu.models import srcnn_int8

        params = jax.device_put(srcnn_int8.load_params())
    else:
        dtype = jnp.float32 if mode == "exact" else jnp.bfloat16
        params = jax.device_put(srcnn.load_params(dtype=dtype))
    pack = mode in ("bf16x1pk", "splitpk", "bf16x1nw")
    band = {"bf16x1band": "unroll", "bf16x1bandf": "fori"}.get(mode)
    geom = fused_conv.NARROW if mode == "bf16x1nw" else fused_conv.WIDE
    base_mode = {"bf16x1pk": "bf16x1", "splitpk": "split",
                 "bf16x1nw": "bf16x1",
                 "bf16x1band": "bf16x1", "bf16x1bandf": "bf16x1"}.get(mode,
                                                                     mode)
    prec = fused_conv.MODE_PRECISIONS.get(base_mode)
    if th is None:
        # the mode's PRODUCTION tile height, so traces measure what the
        # pipeline actually runs (band modes: sweep th explicitly)
        th = (fused_conv.INT8_TH if mode == "int8"
              else 64 if band
              else fused_conv.tile_h_for(prec))
    need_h, need_w = fused_conv.padded_geometry(size, size, th=th, geom=geom)
    rng = np.random.default_rng(0)
    ys = [jax.device_put(rng.uniform(0, 255, (need_h, need_w))
                         .astype(np.float32)) for _ in range(iters)]

    if mode == "int8":
        fn = jax.jit(lambda p, x: fused_conv.forward_y_int8(
            p, x, tile_h=th, full_pad_shape=(size, size)))
    elif band:
        fn = jax.jit(lambda p, x: fused_conv.forward_y_band(
            p, x, tile_h=th, full_pad_shape=(size, size), band_impl=band))
    else:
        fn = jax.jit(lambda p, x: fused_conv.forward_y(
            p, x, tile_h=th, precision=prec, full_pad_shape=(size, size),
            pack_im2col=pack, geom=geom))
    out = fn(params, ys[0])
    np.asarray(out[0, :1])  # warm-up + true sync through the relay

    tmp = tempfile.mkdtemp(prefix="srcnn_trace_")
    with jax.profiler.trace(tmp):
        for y in ys:
            out = fn(params, y)
        np.asarray(out[0, :1])
    return tmp


def report(trace_dir: str, iters: int, out_mp: float) -> None:
    from jax.profiler import ProfileData

    (path,) = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                        recursive=True)
    pd = ProfileData.from_file(path)
    dev = next(p for p in pd.planes if p.name.startswith("/device:TPU"))
    ops = collections.defaultdict(lambda: [0.0, 0])
    modules_ns = 0.0
    for line in dev.lines:
        if line.name == "XLA Ops":
            for e in line.events:
                key = e.name.split(" = ", 1)[0].lstrip("%")
                # strip the per-instance suffix: %fusion.3 -> fusion
                base = key.rstrip("0123456789").rstrip(".")
                ops[base][0] += e.duration_ns
                ops[base][1] += 1
        elif line.name == "XLA Modules":
            for e in line.events:
                if "dynamic_slice" not in e.name and "squeeze" not in e.name:
                    modules_ns += e.duration_ns

    total_ms = modules_ns / iters / 1e6
    print(f"\nper-iteration module total: {total_ms:.2f} ms "
          f"({out_mp / (total_ms / 1e3):.0f} MP/s device-side)")
    print(f"{'op':32s} {'ms/iter':>8s} {'%':>6s} {'count':>6s}")
    rows = sorted(ops.items(), key=lambda kv: -kv[1][0])
    for name, (ns, cnt) in rows:
        ms = ns / iters / 1e6
        if ms < 0.005:
            continue
        print(f"{name:32s} {ms:8.3f} {100 * ns / modules_ns:5.1f}% "
              f"{cnt // iters:6d}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=2048)
    ap.add_argument("--mode", choices=("exact", "split", "bf16x1",
                                       "bf16x1pk", "splitpk", "int8",
                                       "bf16x1nw",
                                       "bf16x1band", "bf16x1bandf"),
                    default="exact")
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--th", type=int, default=None,
                    help="tile height (default: the mode's default)")
    args = ap.parse_args()

    trace_dir = capture(args.size, args.mode, args.iters, args.th)
    print(f"trace: {trace_dir}")
    report(trace_dir, args.iters, args.size * args.size / 1e6)


if __name__ == "__main__":
    main()
