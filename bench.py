#!/usr/bin/env python3
"""Headline benchmark: megapixels/sec/chip at x2 SRCNN upscale.

Matches the reference's headline scenario (SURVEY.md section 6): RGB u8
frame -> x2 bicubic + SRCNN 9-1-5 -> RGB u8, measured as OUTPUT megapixels
per second on one chip, steady state (inputs device-resident; host PNG I/O
excluded on both sides of the comparison).

All three compute tiers are measured in one process and reported in the
one JSON line:

* ``value`` (the headline) is the FASTEST tier passing the quality bar:
  the BASELINE.json target is ">=50x CPU at >=0.99 SSIM vs the
  reference", and the tiers' SSIM vs the bit-exact tier is MEASURED in
  this run (on one of the benchmark frames) and reported as
  ``ssim_vs_exact``; if the bf16x1 tier ever fell below 0.99 the
  headline would fall back to the split tier automatically.  (The
  reference itself ships with `-ffast-math -O3`; bit-identity to IEEE
  f32 is not part of its contract either.)  Tiers, fastest first:
  ``bfloat16_fast`` (single-pass bf16 MXU GEMMs), ``bfloat16``
  (split-bf16x2: exact activations, two passes), both in PERF.md.
* ``exact_mp_per_sec`` is the EXACT tier (multi-pass f32 GEMMs), the
  library default, which the golden gate holds to <=1 u8 LSB against the
  reference binary on 29 configs; it is precision-algorithm-bound at
  ~49% MXU (3 passes mandated -- PERF.md roofline).

Measurement notes for the axon-tunneled chip: a device->host sync costs a
fixed ~30 ms relay roundtrip and block_until_ready() can return early, so
we dispatch a stream of frames with DISTINCT inputs back-to-back and sync
once on the last result via a 1-element fetch (device stream execution is
serialized, so this bounds the whole stream).  Device-side profiler
traces (benchmarks/trace_kernel.py, PERF.md) show the modules executing
back-to-back with zero gaps, so the one ~30 ms sync is the only non-chip
term; STREAM=96 amortizes it to ~0.3 ms/frame.

Baseline: the reference (OpenMP CPU build, this machine, BASELINE.md)
achieves 0.174 MP/s at 256->512 and 0.022 MP/s at 1024->2048.  We compare
against its BEST number (0.174).

Prints one JSON line:
  {"metric": "mp_per_sec_x2_srcnn", "value": N, "unit": "MP/s", "vs_baseline": N, ...}
"""

import json
import os
import socket
import sys
import time

import numpy as np

BASELINE_MP_S = 0.174  # reference OpenMP CPU, best case (BASELINE.md)
SIZE = 1024            # input HxW; output is 2048x2048 = 4.19 MP
SCALE = 2.0
STREAM = 96            # frames per timed stream (amortizes the one sync;
                       # 96 distinct 1024^2 inputs + retained outputs fit
                       # comfortably in HBM at ~1.8 GB)
TRIALS = 3


def _relay_preflight() -> None:
    """Fail fast if the TPU tunnel is down instead of hanging in init.

    The axon PJRT client retries refused connections forever (observed:
    a dead relay looks like an infinite silent hang).  When the env asks
    for the tunneled chip, require at least one relay port to accept a
    TCP connection before importing jax.
    """
    if not os.environ.get("PALLAS_AXON_POOL_IPS"):
        return  # CPU/other backend: nothing to check
    # A relay flap at bench time would cost the whole round's artifact,
    # so poll for a bounded window before giving up (0 disables the wait).
    wait_s = float(os.environ.get("BENCH_RELAY_WAIT_S", "600"))
    deadline = time.monotonic() + wait_s
    announced = False
    while True:
        for port in (8082, 8083, 8087, 8092):
            try:
                socket.create_connection(("127.0.0.1", port),
                                         timeout=3).close()
                return
            except OSError:
                continue
        if time.monotonic() >= deadline:
            break
        if not announced:
            print(f"bench.py: TPU relay down; retrying for up to "
                  f"{wait_s:.0f}s before giving up", file=sys.stderr)
            announced = True
        time.sleep(15)
    print("bench.py: TPU relay unreachable (all probe ports refused) -- "
          "refusing to hang in axon init", file=sys.stderr)
    raise SystemExit(3)


def main() -> None:
    _relay_preflight()

    import jax
    import jax.numpy as jnp

    from libsrcnn_tpu import SRCNNConfig
    from libsrcnn_tpu.eval import metrics
    from libsrcnn_tpu import pipeline

    # use_pallas=None auto-selects the fused Pallas kernel on TPU;
    # BENCH_PALLAS=0 forces the XLA path for comparison runs.
    use_pallas = False if os.environ.get("BENCH_PALLAS") == "0" else None
    modes = {
        "fast": SRCNNConfig(use_pallas=use_pallas,
                            compute_dtype="bfloat16_fast"),
        "split": SRCNNConfig(use_pallas=use_pallas,
                             compute_dtype="bfloat16"),
        "exact": SRCNNConfig(use_pallas=use_pallas),
    }

    rng = np.random.default_rng(0)
    imgs = [
        jax.device_put(jnp.asarray(rng.integers(0, 256, (SIZE, SIZE, 3), np.uint8)))
        for _ in range(STREAM)
    ]

    def run_stream(params, cfg):
        last = None
        for im in imgs:
            last = pipeline.run_pass(im, params, SCALE, cfg)
        np.asarray(last[0][0, 0])  # data-dependent sync through the relay
        return last

    results = {}
    outs = {}
    mp = None
    for name in ("fast", "split", "exact"):
        cfg = modes[name]
        params = jax.device_put(pipeline.load_model_params(cfg, SCALE))
        try:
            last = run_stream(params, cfg)  # compile + warmup
        except Exception:
            # pallas path (explicit True or auto-resolved on TPU) failed on
            # this backend: fall back to the XLA convs
            if pipeline.resolve_pallas(cfg.use_pallas):
                cfg = SRCNNConfig(use_pallas=False,
                                  compute_dtype=cfg.compute_dtype)
                last = run_stream(params, cfg)
            else:
                raise
        run_stream(params, cfg)
        times = []
        for _ in range(TRIALS):
            t0 = time.perf_counter()
            last = run_stream(params, cfg)
            times.append((time.perf_counter() - t0) / STREAM)
        out = last[0]
        mp = out.shape[0] * out.shape[1] / 1e6
        results[name] = mp / float(np.median(times))
        outs[name] = np.asarray(out)

    # Quality gate, measured in this run (worst-case content: the frames
    # are uniform noise): headline = fastest tier with SSIM >= 0.99 vs
    # the exact (golden-gated) tier; if BOTH bf16 tiers ever regressed
    # below the bar, the exact tier itself (SSIM 1 by construction)
    # becomes the headline rather than publishing a failing tier.
    ssim = {n: metrics.ssim(outs[n], outs["exact"]) for n in ("fast", "split")}
    ssim["exact"] = 1.0
    head = next(n for n in ("fast", "split", "exact") if ssim[n] >= 0.99)
    mode_desc = {"fast": "bf16x1 single-pass", "split": "split-bf16x2",
                 "exact": "exact f32 (bf16 tiers failed the 0.99 gate)"}[head]
    print(json.dumps({
        "metric": "mp_per_sec_x2_srcnn",
        "value": round(results[head], 2),
        "unit": "MP/s",
        "vs_baseline": round(results[head] / BASELINE_MP_S, 1),
        "mode": (f"{mode_desc} (measured SSIM {ssim[head]:.5f} vs exact "
                 f"tier; >=0.99 required)"),
        "ssim_vs_exact": round(ssim[head], 5),
        "split_mp_per_sec": round(results["split"], 2),
        "exact_mp_per_sec": round(results["exact"], 2),
        "exact_vs_baseline": round(results["exact"] / BASELINE_MP_S, 1),
    }))


if __name__ == "__main__":
    main()
