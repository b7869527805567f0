#!/usr/bin/env python3
"""Numerical feasibility study: Winograd F(m, 9) for the SRCNN conv1.

NEXT.md item: "Winograd conv1 (4x multiply reduction) -- only useful if
it can hold the <=1 LSB gate; f32 Winograd error analysis needed first."
This script IS that analysis; it needs no TPU (the question is float
conditioning, not speed).

Method: build 1-D Winograd transforms for F(m, r=9) from Vandermonde
matrices over n = m+r-1 interpolation nodes (the standard Toom-Cook /
Winograd construction; nodes from the usual small-rational ladder).
Apply to the REAL conv1 rows (srcnn_915.npz, 64x9x9 -> 576 distinct
9-tap filters) against [0,255]-domain signals, in f32, and compare to
the f64 direct convolution.  The fused kernel's exact mode measures
1.4e-4 max abs vs exact XLA (PERF.md); a replacement must stay at that
scale for the 23-config <=1 u8 LSB golden gate to survive.

Run: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python benchmarks/winograd_study.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

R = 9  # conv1 tap count per axis


def winograd_matrices(m: int, nodes):
    """A^T, G, B^T for F(m, r) over the given n-1 finite nodes (+ the
    point at infinity), float64.  Standard Toom-Cook construction:
      Y = A^T [ (G g) * (B^T d) ]
    with g the r-tap filter, d the (m+r-1)-sample input tile."""
    n = m + R - 1
    assert len(nodes) == n - 1, (len(nodes), n)
    a = np.asarray(nodes, np.float64)

    # Vandermonde over the finite nodes (plus infinity handled by the
    # last row/col conventions below).
    V = np.vander(a, n, increasing=True)            # [n-1, n]

    # G: evaluate the filter polynomial at each node -> [n, r]
    G = np.zeros((n, R))
    G[:-1] = np.vander(a, R, increasing=True)
    G[-1, -1] = 1.0                                  # infinity -> leading coeff

    # B^T: evaluate the data polynomial -> [n, n]
    BT = np.zeros((n, n))
    BT[:-1] = V
    BT[-1, -1] = 1.0

    # A^T solves the interpolation back to the m output taps:
    # output poly coeffs c satisfy  M c = values; we need the m low-order
    # convolution outputs.  Build via the inverse Vandermonde.
    M = np.zeros((n, n))
    M[:-1] = np.vander(a, n, increasing=True)
    M[-1, -1] = 1.0
    Minv = np.linalg.inv(M)
    AT = Minv[:m, :]                                 # first m coefficients
    return AT, G, BT


NODE_LADDER = [0.0, 1.0, -1.0, 0.5, -0.5, 2.0, -2.0, 0.25, -0.25,
               4.0, -4.0, 1.5, -1.5, 3.0, -3.0, 0.75, -0.75]


def winograd_conv_f32(g, d, m):
    """1-D F(m, 9) in float32 over a long signal d (valid conv)."""
    n = m + R - 1
    AT, G, BT = winograd_matrices(m, NODE_LADDER[:n - 1])
    AT32, G32, BT32 = (x.astype(np.float32) for x in (AT, G, BT))
    g32 = g.astype(np.float32)
    d32 = d.astype(np.float32)
    gw = (G32 @ g32)                                 # [n]
    L = (len(d) - R + 1) // m * m
    out = np.empty(L, np.float32)
    for s in range(0, L, m):
        tile = d32[s:s + n]
        out[s:s + m] = AT32 @ (gw * (BT32 @ tile))
    return out


def main() -> None:
    wpath = os.path.join(os.path.dirname(__file__), "..", "libsrcnn_tpu",
                         "models", "weights", "srcnn_915.npz")
    w1 = np.load(wpath)["w1"]                        # [9, 9, 1, 64]
    rows = w1[:, :, 0, :].transpose(2, 0, 1).reshape(-1, R)  # 576 filters

    rng = np.random.default_rng(0)
    d = rng.uniform(0.0, 255.0, 4096).astype(np.float64)

    print(f"conv1 rows: {rows.shape[0]} 9-tap filters; signal [0,255] "
          f"uniform, {len(d)} samples; reference = f64 direct conv")
    print(f"{'variant':14s} {'cond(AT)':>10s} {'max abs err':>12s} "
          f"{'rel to direct-f32':>18s}")

    # baseline: direct f32 conv error vs f64
    ref = np.stack([np.convolve(d, g[::-1], "valid") for g in rows])
    direct32 = np.stack([np.convolve(d.astype(np.float32),
                                     g.astype(np.float32)[::-1],
                                     "valid").astype(np.float64)
                         for g in rows])
    base_err = np.abs(direct32 - ref).max()
    print(f"{'direct f32':14s} {'-':>10s} {base_err:12.3e} {1.0:18.1f}")

    for m in (2, 3, 4):
        n = m + R - 1
        AT, G, BT = winograd_matrices(m, NODE_LADDER[:n - 1])
        errs = []
        for g in rows[:64]:                          # 64 filters suffice
            wout = winograd_conv_f32(g, d, m)
            L = len(wout)
            # np.convolve 'valid' with reversed kernel == correlation
            refc = np.convolve(d, g[::-1], "valid")[:L]
            errs.append(np.abs(wout.astype(np.float64) - refc).max())
        err = float(np.max(errs))
        print(f"F({m},9) 1-D   {np.linalg.cond(AT):10.1e} {err:12.3e} "
              f"{err / base_err:18.1f}")
    print("\n2-D nesting squares the transform error factor; the golden "
          "gate needs <=~1e-3 abs.")


if __name__ == "__main__":
    main()
