#!/usr/bin/env python3
"""On-device validation sweep: run every golden config through the REAL
TPU (auto path = fused Pallas kernel) and compare against the reference
binary outputs.  The CPU test suite covers the XLA path; this checks the
chip's compiled kernels end-to-end.

Also cross-checks the model zoo on-chip: each family's lane-packed
formulation (the TPU default, ops/packed_conv.py) against its direct
conv stack -- same MACs, different reduction order, so the u8 outputs
must agree within 1 LSB.

Usage: python tools/tpu_validate.py [N]       # first N configs (default all)
       python tools/tpu_validate.py --zoo     # only the zoo cross-check
       python tools/tpu_validate.py --chunked # only the out-of-core check
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from libsrcnn_tpu import FilterType, SRCNNConfig, upscale
from libsrcnn_tpu.eval import psnr, ssim


def validate_zoo() -> int:
    """Packed vs direct on-chip for every family with shipped weights."""
    fails = 0
    img = np.load("tests/goldens/goldens.npz")["in_butterfly64"]
    for model in ("fsrcnn", "espcn", "vdsr"):
        for dtype in ("float32", "bfloat16"):
            outs = {}
            for pack in (False, True):
                cfg = SRCNNConfig(model=model, compute_dtype=dtype,
                                  lane_pack=pack)
                try:
                    outs[pack] = upscale(img, 2.0, cfg)
                except FileNotFoundError:
                    print(f"--- {model}: no shipped weights, skipped")
                    outs = None
                    break
            if not outs:
                break
            d = int(np.abs(outs[True].astype(int)
                           - outs[False].astype(int)).max())
            ok = d <= 1
            fails += 0 if ok else 1
            print(f"{'OK ' if ok else 'BAD'} zoo {model:7s} {dtype:9s} "
                  f"packed-vs-direct maxdiff {d}", flush=True)
    return fails


def validate_chunked() -> int:
    """Out-of-core band streaming on-chip: bit-identical to the one-shot
    pipeline at the same tier.  This is also the only single-chip
    exercise of the fused kernel's pad_mode="halo" body on real hardware
    (the mesh paths that share it need >1 device).  Also checks the
    HR-family banding (vdsr, spec-derived halo plan, direct convs), the
    LR-family banding (fsrcnn/espcn, crop-after-halo-extend on whole LR
    rows), and the band-wise flip ensemble against their api-level
    twins."""
    from libsrcnn_tpu import upscale_chunked

    fails = 0
    img = np.load("tests/goldens/goldens.npz")["in_butterfly64"]
    for dtype in ("float32", "bfloat16", "bfloat16_fast"):
        cfg = SRCNNConfig(compute_dtype=dtype, use_pallas=True)
        ref, refc = upscale(img, 2.0, cfg, return_conv_map=True)
        out, conv = upscale_chunked(img, 2.0, cfg, band_rows=48)
        d = int(np.abs(out.astype(int) - np.asarray(ref, int)).max())
        dc = int(np.abs(conv.astype(int) - np.asarray(refc, int)).max())
        ok = d == 0 and dc == 0
        fails += 0 if ok else 1
        print(f"{'OK ' if ok else 'BAD'} chunked srcnn {dtype:13s} "
              f"vs one-shot maxdiff {d} conv {dc}", flush=True)
    for model, dtype, ens in (("vdsr", "float32", False),
                              ("vdsr", "bfloat16", False),
                              ("vdsr", "float32", True),
                              ("srcnn", "float32", True),
                              ("fsrcnn", "float32", False),
                              ("fsrcnn", "float32", True),
                              ("espcn", "bfloat16", False)):
        # direct convs on both sides: the lane-packed reduction order is
        # plane-shape-dependent, so banding pins lane_pack=False
        cfg = SRCNNConfig(model=model, compute_dtype=dtype,
                          lane_pack=False, self_ensemble=ens)
        try:
            ref = upscale(img, 2.0, cfg)
        except FileNotFoundError:
            print(f"--- chunked {model}: no shipped weights, skipped")
            continue
        out, _ = upscale_chunked(img, 2.0, cfg, band_rows=48)
        d = int(np.abs(out.astype(int) - np.asarray(ref, int)).max())
        ok = d == 0
        fails += 0 if ok else 1
        tag = f"{model}+ens" if ens else model
        print(f"{'OK ' if ok else 'BAD'} chunked {tag:9s} {dtype:9s} "
              f"vs one-shot maxdiff {d}", flush=True)
    return fails


def main() -> int:
    import bench
    bench._relay_preflight()  # dead tunnel -> exit 3, not a silent hang

    if "--zoo" in sys.argv:
        fails = validate_zoo()
        print(f"zoo cross-check failures: {fails}")
        return 1 if fails else 0
    if "--chunked" in sys.argv:
        fails = validate_chunked()
        print(f"chunked cross-check failures: {fails}")
        return 1 if fails else 0

    limit = int(sys.argv[1]) if len(sys.argv) > 1 else 10**9
    z = np.load("tests/goldens/goldens.npz")
    cases = [m.split(",") for m in z["meta"]][:limit]
    worst = 0
    fails = 0
    for key, name, mult, filt, step, _ms in cases:
        img = z[f"in_{name}"]
        cfg = SRCNNConfig(filter=FilterType(int(filt)), step_scale=bool(int(step)))
        out, conv = upscale(img, float(mult), cfg, return_conv_map=True)
        gout, gconv = z[f"out_{key}"], z[f"conv_{key}"]
        d = int(np.abs(out.astype(int) - gout.astype(int)).max())
        dc = int(np.abs(conv.astype(int) - gconv.astype(int)).max())
        s = ssim(out, gout)
        ok = d <= 1 and dc <= 1 and s >= 0.999
        worst = max(worst, d, dc)
        fails += 0 if ok else 1
        print(f"{'OK ' if ok else 'BAD'} {key:32s} maxdiff {d} conv {dc} "
              f"ssim {s:.6f} psnr {psnr(out, gout):5.1f}", flush=True)
    fails += validate_zoo()
    fails += validate_chunked()
    print(f"\n{len(cases)} configs, worst u8 diff {worst}, failures {fails}")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
