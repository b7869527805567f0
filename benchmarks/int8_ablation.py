#!/usr/bin/env python3
"""Attribute fused int8-kernel time to its internal phases (real-TPU tool).

Same cumulative-ablation discipline as kernel_ablation.py, for the int8
variant (`fused_conv._kernel_int8`).  Stages:

  dma        window-block reads + output writes, zeroed compute
  +roll      dynamic lane rotate (f32 -- Mosaic's rotate is 32-bit-only)
  +quant     once-per-tile window quantization f32 -> int8 codes
  +im2col    81 tap stores into the int8 [ch, 81, 128] scratch
  +conv1     int8 GEMM [ch*128, 81] x [81, 64] -> int32, folded epilogue
  +conv2     int8 GEMM x [64, 32] + border clamps + folded epilogue
  +conv3g    conv3 swapaxes + batched tap GEMM (no roll-reduce)
  full       production forward_y_int8

Ablated kernels compute WRONG image results by design.  Run on the real
chip: python benchmarks/int8_ablation.py [size] [th]
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from libsrcnn_tpu.kernels import fused_conv as fc

STAGES = ("dma", "roll", "quant", "im2col", "conv1", "conv2", "conv3g")


def build_ablated(stage: str, th: int):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HALO, TW, CW, EW = fc.HALO, fc.TW, fc.CW, fc.EW

    def kern(w1r, s1r, t1r, w2r, s2r, t2r, w3r, d3r, b3r, fl, win, out,
             q_scr):
        i = pl.program_id(0)
        j = pl.program_id(1)
        ch = th + 4
        ext = win[:]                               # [rb, 1, EW] f32
        if stage == "dma":
            out[0, :, 0] = ext[0:th, :, 0:CW] * 0.0
            return
        shift = j * TW - (j * TW) // 128 * 128
        ext = pltpu.roll(ext, (EW - shift) % EW, axis=2)
        if stage == "roll":
            out[0, :, 0] = ext[0:th, :, 0:CW]
            return
        extq = jnp.clip(jnp.round(ext * (127.0 / 255.0)),
                        0, 127).astype(jnp.int8)
        if stage == "quant":
            out[0, :, 0] = extq[0:th, :, 0:CW].astype(jnp.float32)
            return
        for dy in range(9):
            for dx in range(9):
                k = dy * 9 + dx
                q_scr[:, k:k + 1, :] = extq[dy:dy + ch, :, dx:dx + CW]
        xq = q_scr[:]
        if stage == "im2col":
            out[0, :, 0] = xq[0:th, 0:1, :].astype(jnp.float32)
            return
        acc1 = jax.lax.dot_general(xq, w1r[:], (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32)
        h1q = jnp.clip(jnp.round(acc1.astype(jnp.float32) * s1r[:]
                                 + t1r[:]), 0, 127).astype(jnp.int8)
        if stage == "conv1":
            out[0, :, 0] = h1q[0:th, :, 0:1].swapaxes(1, 2).astype(jnp.float32)
            return
        acc2 = jax.lax.dot_general(h1q, w2r[:], (((2,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32)
        gh = gw = 2 ** 30  # border clamps never taken in ablation (i,j < gh)
        row_idx = jax.lax.broadcasted_iota(jnp.int32, (ch, 1, 1), 0)
        col_idx = jax.lax.broadcasted_iota(jnp.int32, (1, CW, 1), 1)
        acc2 = jnp.where((fl[0] == 1) & (i == 0) & (row_idx < 2),
                         acc2[2:3], acc2)
        acc2 = jnp.where((fl[2] == 1) & (j == 0) & (col_idx < 2),
                         acc2[:, 2:3, :], acc2)
        c2q = jnp.clip(jnp.round(acc2.astype(jnp.float32) * s2r[:]
                                 + t2r[:]), 0, 127).astype(jnp.int8)
        if stage == "conv2":
            out[0, :, 0] = c2q[0:th, :, 0:1].swapaxes(1, 2).astype(jnp.float32)
            return
        c2t = jnp.swapaxes(c2q, 1, 2)              # [ch, 32, CW] int8
        wb = jnp.broadcast_to(w3r[:], (ch, 25, 32))
        g = jax.lax.dot_general(
            wb, c2t, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32)      # [ch, 25, CW]
        # stage == "conv3g": skip the roll-reduce, emit one tap row
        out[0, :, 0] = g[0:th, 0:1, :].astype(jnp.float32) * d3r[0] + b3r[0]

    @jax.jit
    def run(y, *args):
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
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 9 + [
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((pl.Element(rb), pl.Element(1), pl.Element(EW)),
                             lambda i, j: (i * th, 0, (j * TW) // 128 * 128),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, th, 1, 1, CW),
                                   lambda i, j: (i, 0, j, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((th + 4, 81, CW), jnp.int8)],
        )(*args, jnp.ones((4,), jnp.int32), yext)
        return out4.reshape(hp, gw, CW)[:, :, :TW].reshape(hp, gw * TW)[:h, :w]

    return run


def main(size=2048, th=80):
    import jax
    import jax.numpy as jnp

    from libsrcnn_tpu.models import srcnn_int8

    qp = srcnn_int8.load_params()
    keys = ("w1q", "s1", "t1", "w2q", "s2", "t2", "w3q", "d3", "b3")
    args = [jax.device_put(jnp.asarray(qp[k])) for k in keys]

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
    print(f"fused int8-kernel ablation @ {size}x{size} Y plane "
          f"({mp:.2f} MP), th={th}, backend={jax.default_backend()}")
    prev = None
    for stage in STAGES:
        run = build_ablated(stage, th)
        ms = stream_time(lambda: run(y, *args))
        delta = "" if prev is None else f"  (+{ms - prev:6.2f})"
        print(f"  {stage:8s} {ms:8.2f} ms{delta}  {mp / (ms / 1e3):7.1f} MP/s",
              flush=True)
        prev = ms
    real = stream_time(lambda: fc.forward_y_int8(qp, y, tile_h=th))
    print(f"  full     {real:8.2f} ms  (+{real - prev:6.2f})  "
          f"{mp / (real / 1e3):7.1f} MP/s   <- production forward_y_int8 "
          f"(+ conv3 roll-reduce + true borders)")
    return real


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 2048,
         int(sys.argv[2]) if len(sys.argv) > 2 else 80)
