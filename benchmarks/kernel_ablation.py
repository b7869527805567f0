#!/usr/bin/env python3
"""Attribute fused-kernel (v2) time to its internal phases (real-TPU tool).

The fused Pallas kernel (kernels/fused_conv.py) is one opaque op in any
profiler trace, so this tool times ABLATED variants -- same Element-window
tiling, same pipeline structure, later pieces replaced by cheap stand-ins
-- and reports the cumulative deltas:

  dma        window-block reads + output writes, zeroed compute
  +roll      the dynamic lane rotate undoing the 128-lane block alignment
  +im2col    all 81 tap stores into the [ch, 81, 128] scratch
  +conv1     [ch*128, 81] x [81, 64] HIGHEST GEMM + bias/relu
  +conv2     [ch*128, 64] x [64, 32] HIGHEST GEMM + bias/relu
  full       the production kernel (adds conv3 tap-GEMM + rolls + border
             clamps + epilogue)

Ablated kernels compute WRONG image results by design; `full` is
`fused_conv.forward_y` itself.  Timings use the stream-dispatch +
final-sync discipline (see bench.py): the axon relay's
block_until_ready can return early.

Round-2 measured numbers live in PERF.md.
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from libsrcnn_tpu.kernels import fused_conv as fc


def build_ablated(stage: str, th: int = fc.DEFAULT_TH, mode: str = "exact"):
    """Jitted y-plane runner with phases after ``stage`` stubbed out."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HALO, TW, CW, EW = fc.HALO, fc.TW, fc.CW, fc.EW
    precision = fc.MODE_PRECISIONS[mode]

    def kern(w1r, b1r, w2r, b2r, w3r, b3r, fl, win, out, q_scr):
        j = pl.program_id(1)
        ch = th + 4
        ext = win[:]                               # [rb, 1, EW]
        if stage == "dma":
            out[0, :, 0] = ext[0:th, :, 0:CW] * 0.0
            return
        shift = j * TW - (j * TW) // 128 * 128
        ext = pltpu.roll(ext, (EW - shift) % EW, axis=2)
        if stage == "roll":
            out[0, :, 0] = ext[0:th, :, 0:CW]
            return
        for dy in range(9):
            for dx in range(9):
                k = dy * 9 + dx
                q_scr[:, k:k + 1, :] = ext[dy:dy + ch, :, dx:dx + CW]
        q = q_scr[:]
        if stage == "im2col":
            out[0, :, 0] = q[0:th, 0:1, :]
            return
        h1 = fc._dot(q, w1r[:], (((1,), (0,)), ((), ())), precision)
        h1 = jnp.maximum(h1 + b1r[:], 0.0)
        if stage == "conv1":
            out[0, :, 0] = h1[0:th, :, 0:1].swapaxes(1, 2)
            return
        h2 = fc._dot(h1, w2r[:], (((2,), (0,)), ((), ())), precision)
        c2 = jnp.maximum(h2 + b2r[:], 0.0)
        out[0, :, 0] = c2[0:th, :, 0:1].swapaxes(1, 2)   # stage == "conv2"

    @jax.jit
    def run(y, w1, b1, w2, b2, w3, b3):
        h, w = y.shape
        gh, gw = -(-h // th), -(-w // TW)
        hp, wp = gh * th, gw * TW
        rb = fc._round8(th + 2 * HALO)
        need_h = (gh - 1) * th + rb
        need_w = (gw - 1) * TW + EW
        ypad = jnp.pad(y, ((0, hp - h), (0, wp - w)), mode="edge")
        yext = jnp.pad(ypad, ((HALO, need_h - hp - HALO),
                              (HALO, need_w - wp - HALO)),
                       mode="edge")[:, None, :]
        out4 = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((gh, th, gw, 1, CW), jnp.float32),
            grid=(gh, gw),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6 + [
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((pl.Element(rb), pl.Element(1), pl.Element(EW)),
                             lambda i, j: (i * th, 0, (j * TW) // 128 * 128),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, th, 1, 1, CW),
                                   lambda i, j: (i, 0, j, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((th + 4, 81, CW), jnp.float32)],
        )(w1, b1, w2, b2, w3, b3, jnp.ones((4,), jnp.int32), yext)
        return out4.reshape(hp, gw, CW)[:, :, :TW].reshape(hp, gw * TW)[:h, :w]

    return run


def main(size=2048, mode="exact", th=None):
    import jax
    import jax.numpy as jnp

    from libsrcnn_tpu.models import srcnn

    precision = fc.MODE_PRECISIONS[mode]
    if th is None:
        th = fc.tile_h_for(precision)

    p = srcnn.load_params()
    w1 = np.asarray(p["w1"]).reshape(81, 64).astype(np.float32)
    b1 = np.asarray(p["b1"]).astype(np.float32)
    w2 = np.asarray(p["w2"]).reshape(64, 32).astype(np.float32)
    b2 = np.asarray(p["b2"]).astype(np.float32)
    # [25, 32] tap-major, k = 5*dx + dy (fused_conv layout)
    w3 = np.asarray(p["w3"])[:, :, :, 0].transpose(1, 0, 2).reshape(25, 32)
    b3 = np.asarray(p["b3"]).reshape(1).astype(np.float32)
    args = [jax.device_put(jnp.asarray(a))
            for a in (w1, b1, w2, b2, w3.astype(np.float32), b3)]

    rng = np.random.default_rng(0)
    y = jax.device_put(jnp.asarray(
        rng.uniform(0, 255, (size, size)).astype(np.float32)))

    def stream_time(fn, n=8):
        r = fn()
        jax.block_until_ready(r)
        np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[0])
        t0 = time.perf_counter()
        for _ in range(n):
            r = fn()
        np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[0])
        return (time.perf_counter() - t0) / n * 1000.0

    mp = size * size / 1e6
    print(f"fused-kernel v2 ablation @ {size}x{size} Y plane ({mp:.2f} MP), "
          f"mode={mode} th={th}, backend={jax.default_backend()}")
    prev = None
    for stage in ("dma", "roll", "im2col", "conv1", "conv2"):
        run = build_ablated(stage, th=th, mode=mode)
        ms = stream_time(lambda: run(y, *args))
        delta = "" if prev is None else f"  (+{ms - prev:6.2f})"
        print(f"  {stage:8s} {ms:8.2f} ms{delta}  {mp / (ms / 1e3):7.1f} MP/s",
              flush=True)
        prev = ms
    real = stream_time(lambda: fc.forward_y(p, y, tile_h=th,
                                            precision=precision))
    print(f"  full     {real:8.2f} ms  (+{real - prev:6.2f})  "
          f"{mp / (real / 1e3):7.1f} MP/s   <- production forward_y "
          f"(conv3 + border + epilogue)")
    return real


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("size", type=int, nargs="?", default=2048)
    ap.add_argument("--mode", choices=("exact", "split", "bf16x1"),
                    default="exact")
    ap.add_argument("--th", type=int, default=None)
    a = ap.parse_args()
    main(a.size, a.mode, a.th)
