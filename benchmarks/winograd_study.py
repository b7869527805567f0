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
    point at infinity), float64, such that

      y = A^T [ (G g) * (B^T d) ]

    computes the m-output valid CORRELATION of the n-sample tile d with
    the r-tap filter g.  Construction by Tellegen transposition of the
    minimal (m x r -> n)-coefficient polynomial MULTIPLICATION
    algorithm  w = P^{-1} [(Q u) * (R v)]  (Q, R point-evaluation
    Vandermondes, P the n-point interpolation matrix): correlation is
    the transpose of multiplication in the data argument, so

      A^T = Q^T  (m-side evaluations, transposed),
      G   = R    (r-side evaluations),
      B^T = P^{-T}.

    Verified exact in f64 by the self-test in main() before any f32
    conclusion is drawn.
    """
    n = m + R - 1
    assert len(nodes) == n - 1, (len(nodes), n)
    a = np.asarray(nodes, np.float64)

    # Q: evaluate the (deg m-1) polynomial at the nodes + infinity
    Q = np.zeros((n, m))
    Q[:-1] = np.vander(a, m, increasing=True)
    Q[-1, -1] = 1.0                                  # infinity -> leading coeff

    # R == G: evaluate the (deg r-1) filter polynomial
    G = np.zeros((n, R))
    G[:-1] = np.vander(a, R, increasing=True)
    G[-1, -1] = 1.0

    # P: n-point interpolation (values -> n product coefficients)
    P = np.zeros((n, n))
    P[:-1] = np.vander(a, n, increasing=True)
    P[-1, -1] = 1.0
    BT = np.linalg.inv(P).T
    return Q.T, G, BT


NODE_LADDER = [0.0, 1.0, -1.0, 0.5, -0.5, 2.0, -2.0, 0.25, -0.25,
               4.0, -4.0, 1.5, -1.5, 3.0, -3.0, 0.75, -0.75]


def winograd_conv(g, d, m, dtype):
    """1-D F(m, 9) over a long signal d (valid correlation), computed
    with the transform matrices and arithmetic cast to ``dtype``."""
    n = m + R - 1
    AT, G, BT = (x.astype(dtype)
                 for x in winograd_matrices(m, NODE_LADDER[:n - 1]))
    g = g.astype(dtype)
    d = d.astype(dtype)
    gw = G @ g                                       # [n]
    L = (len(d) - R + 1) // m * m
    out = np.empty(L, dtype)
    for s in range(0, L, m):
        tile = d[s:s + n]
        out[s:s + m] = AT @ (gw * (BT @ tile))
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

    # correctness self-test: the construction must be exact (up to f64
    # interpolation conditioning) BEFORE any f32 conclusion is drawn
    for m in (2, 3, 4):
        g = rows[7]
        wout = winograd_conv(g, d, m, np.float64)
        refc = np.convolve(d, g[::-1], "valid")[:len(wout)]
        err64 = np.abs(wout - refc).max()
        assert err64 < 1e-4, (m, err64)  # algebra check (f64 cond only)

    print(f"{'variant':14s} {'cond(B^T)':>10s} {'f64 err':>10s} "
          f"{'f32 max abs err':>16s} {'rel to direct-f32':>18s}")

    # baseline: direct f32 conv error vs f64
    ref = np.stack([np.convolve(d, g[::-1], "valid") for g in rows])
    direct32 = np.stack([np.convolve(d.astype(np.float32),
                                     g.astype(np.float32)[::-1],
                                     "valid").astype(np.float64)
                         for g in rows])
    base_err = np.abs(direct32 - ref).max()
    print(f"{'direct f32':14s} {'-':>10s} {'-':>10s} {base_err:16.3e} "
          f"{1.0:18.1f}")

    for m in (2, 3, 4):
        n = m + R - 1
        _, _, BT = winograd_matrices(m, NODE_LADDER[:n - 1])
        errs64, errs32 = [], []
        for g in rows[:64]:                          # 64 filters suffice
            refc = np.convolve(d, g[::-1], "valid")
            w64 = winograd_conv(g, d, m, np.float64)
            w32 = winograd_conv(g, d, m, np.float32)
            errs64.append(np.abs(w64 - refc[:len(w64)]).max())
            errs32.append(np.abs(w32.astype(np.float64)
                                 - refc[:len(w32)]).max())
        print(f"F({m},9) 1-D   {np.linalg.cond(BT):10.1e} "
              f"{max(errs64):10.1e} {max(errs32):16.3e} "
              f"{max(errs32) / base_err:18.1f}")
    print("\n2-D nesting squares the transform error factor; the golden "
          "gate needs <=~1e-3 abs.")


if __name__ == "__main__":
    main()
