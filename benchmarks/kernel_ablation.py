#!/usr/bin/env python3
"""Attribute fused-kernel time to its internal phases (real-TPU tool).

The fused Pallas kernel (kernels/fused_conv.py) is one opaque op in any
profiler trace, so this tool times ABLATED variants -- same tiling, same
pipeline structure, pieces replaced by cheap stand-ins -- and reports the
deltas:

  tiles       XLA overlapping-window construction alone
  floor       pallas pipeline floor: 1 im2col store, no GEMMs, cheap out
  +im2col     all 81 tap stores, no GEMMs           -> im2col store cost
  +gemms      im2col + conv1/conv2 MXU GEMMs        -> GEMM cost
  +border     ... + border masking                  -> select cost
  full        the real kernel                       -> conv3 FMA cost

Ablated kernels compute WRONG image results by design; only `full` is the
production path.  Timings use the stream-dispatch + final-sync discipline
(see bench.py) because the axon relay's block_until_ready returns early.
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from libsrcnn_tpu.kernels import fused_conv as fc


def _kernel_ablate(w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref, flags_ref,
                   win_ref, out_ref, q_scr, *, th, a_hi, s_hi, gh, gw,
                   precision, dtype, mode):
    """fused_conv._kernel with later phases replaced by cheap stand-ins."""
    import jax
    import jax.numpy as jnp

    i = fc.pl.program_id(0)
    j = fc.pl.program_id(1)
    ch = th + 4
    CW = fc.CW
    ext = win_ref[0, 0]

    n_taps = 81 if mode != "floor" else 1
    for dy in range(9):
        for dx in range(9):
            k = dy * 9 + dx
            if k >= n_taps:
                break
            q_scr[:, k:k + 1, :] = ext[dy:dy + ch, :, dx:dx + CW].astype(dtype)
        if 9 * dy >= n_taps:
            break
    q = q_scr[:]

    if mode in ("floor", "im2col"):
        # stand-in output with no MXU work: one sublane of q
        out_ref[0, 0] = q[2:2 + th, 40:41, :].astype(jnp.float32)
        return

    h1 = jax.lax.dot_general(q, w1_ref[:],
                             dimension_numbers=(((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=precision)
    h1 = jnp.maximum(h1 + b1_ref[:], 0.0).astype(dtype)
    h2 = jax.lax.dot_general(h1, w2_ref[:],
                             dimension_numbers=(((2,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=precision)
    c2 = jnp.maximum(h2 + b2_ref[:], 0.0)

    if mode == "gemms":
        out_ref[0, 0] = c2[2:2 + th, :, 0:1].swapaxes(1, 2)
        return

    row_idx = jax.lax.broadcasted_iota(jnp.int32, (ch, 1, 1), 0)
    col_idx = jax.lax.broadcasted_iota(jnp.int32, (1, CW, 1), 1)
    c2 = jnp.where((flags_ref[0] == 1) & (i == 0) & (row_idx < 2), c2[2:3], c2)
    c2 = jnp.where((flags_ref[1] == 1) & (i == gh - 1) & (row_idx > a_hi),
                   c2[a_hi:a_hi + 1], c2)
    c2 = jnp.where((flags_ref[2] == 1) & (j == 0) & (col_idx < 2),
                   c2[:, 2:3, :], c2)
    c2 = jnp.where((flags_ref[3] == 1) & (j == gw - 1) & (col_idx > s_hi),
                   c2[:, s_hi:s_hi + 1, :], c2)

    if mode == "border":
        out_ref[0, 0] = c2[2:2 + th, :, 0:1].swapaxes(1, 2)
        return

    c2t = fc.jnp.swapaxes(c2, 1, 2)
    c2t = fc.jnp.pad(c2t, ((0, 0), (0, 0), (0, 4)))
    acc = fc.jnp.zeros((th, 32, CW), fc.jnp.float32)
    for dy in range(5):
        for dx in range(5):
            k = dy * 5 + dx
            acc = acc + c2t[dy:dy + th, :, dx:dx + CW] * w3_ref[:, :, k:k + 1]
    red = fc.jnp.sum(acc, axis=1, keepdims=True)
    out_ref[0, 0] = fc.jnp.clip(red + b3_ref[0], 0.0, 255.0)


def build_ablated(mode: str):
    """Return a jitted y-plane runner for one ablation mode (or 'tiles')."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HALO, TW, CW, EW = fc.HALO, fc.TW, fc.CW, fc.EW
    th = 48
    precision = jax.lax.Precision.HIGHEST
    dtype = jnp.float32

    @functools.partial(jax.jit, static_argnames=("only_tiles",))
    def run(y, w1, b1, w2, b2, w3, b3, only_tiles=False):
        h, w = y.shape
        gh, gw = -(-h // th), -(-w // TW)
        hp, wp = gh * th, gw * TW
        rb = fc._round8(th + 2 * HALO)
        ypad = jnp.pad(y, ((0, hp - h), (0, wp - w)), mode="edge")
        yext = jnp.pad(ypad, ((HALO, HALO + (rb - th - 2 * HALO) + 8),
                              (HALO, HALO + 4 + 8)), mode="edge")
        tiles = jnp.stack([
            jnp.stack([yext[i * th:i * th + rb, j * TW:j * TW + EW]
                       for i in range(gh)], 0)
            for j in range(gw)
        ], 0)[:, :, :, None, :]
        if only_tiles:
            return tiles

        a_hi = (h - 1) - (gh - 1) * th + 2
        s_hi = (w - 1) - (gw - 1) * TW + 2
        out5 = pl.pallas_call(
            functools.partial(_kernel_ablate, th=th, a_hi=a_hi, s_hi=s_hi,
                              gh=gh, gw=gw, precision=precision, dtype=dtype,
                              mode=mode),
            out_shape=jax.ShapeDtypeStruct((gh, gw, th, 1, CW), jnp.float32),
            grid=(gh, gw),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6 + [
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, rb, 1, EW), lambda i, j: (j, i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, th, 1, CW),
                                   lambda i, j: (i, j, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((th + 4, 81, CW), dtype)],
        )(w1, b1, w2, b2, w3, b3, jnp.ones((4,), jnp.int32), tiles)
        out = out5[:, :, :, 0, :TW].transpose(0, 2, 1, 3).reshape(hp, gw * TW)
        return out[:h, :w]

    return run


def main(size=2048):
    import jax
    import jax.numpy as jnp

    from libsrcnn_tpu.models import srcnn

    p = srcnn.load_params()
    w1 = np.asarray(p["w1"]).reshape(81, 64).astype(np.float32)
    b1 = np.asarray(p["b1"]).astype(np.float32)
    w2 = np.asarray(p["w2"]).reshape(64, 32).astype(np.float32)
    b2 = np.asarray(p["b2"]).astype(np.float32)
    w3 = np.asarray(p["w3"])[:, :, :, 0].reshape(25, 32).T[None].astype(np.float32)
    b3 = np.asarray(p["b3"]).reshape(1).astype(np.float32)
    args = [jax.device_put(jnp.asarray(a)) for a in (w1, b1, w2, b2, w3, b3)]

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
    print(f"fused-kernel ablation @ {size}x{size} Y plane ({mp:.2f} MP), "
          f"backend={jax.default_backend()}")
    results = {}
    run_tiles = build_ablated("floor")
    results["tiles"] = stream_time(
        lambda: run_tiles(y, *args, only_tiles=True))
    for mode in ("floor", "im2col", "gemms", "border", "full"):
        run = build_ablated(mode)
        results[mode] = stream_time(lambda: run(y, *args))
    prev = None
    for name, ms in results.items():
        delta = "" if prev is None or name == "floor" else f"  (+{ms - prev:6.2f})"
        print(f"  {name:8s} {ms:8.2f} ms{delta}  {mp / (ms / 1e3):7.1f} MP/s")
        if name != "tiles":
            prev = ms
    # reference production numbers
    real = stream_time(lambda: fc.forward_y(p, y))
    print(f"  prod fused_conv.forward_y: {real:8.2f} ms "
          f"({mp / (real / 1e3):7.1f} MP/s)")
    return results


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 2048)
